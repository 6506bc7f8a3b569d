"""The flagship crawl used by the driver contract and the mirror-
consuming pipelines: a deterministic synthetic corpus sized from the
documents table of an sf dir, crawled through the STREAMING output
path (per-wave parquet partitions — docs never accumulate on the
driver), memoized per process so every consumer (crawl_mirror,
crawl_spans, crawl_pagerank, entry()) shares one crawl."""

from __future__ import annotations

import os

import ray.data as rd

from suckit_ray.pipelines.formats import _scratch

_CRAWL_OUT_CACHE: dict[str, str] = {}  # sf_dir → flagship output dir


def corpus_for(sf_dir: str):
    """Deterministic synthetic crawl corpus sized from the documents
    table of the given sf dir (no external data)."""
    import pyarrow.parquet as pq

    from suckit_ray.sources.pagestore import SyntheticCorpus

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    # ext_links=False: a URL first discovered via a depth-GATED external
    # link is inserted into the seen-map before gating and poisons later
    # internal discoveries (reference parity, src/scraper.rs:202-215;
    # pinned by tests/test_frontier.py) — the SQL reachability oracle
    # models the clean internal closure, so the oracle corpus omits
    # cross-host links.
    return SyntheticCorpus(
        n_hosts=8, n_docs=n_docs, fanout=4, n_assets_per_host=16, ext_links=False
    )


def crawl_docs(sf_dir: str) -> rd.Dataset:
    """Lazy Dataset over the flagship crawl's streamed output."""
    from suckit_ray.config import CrawlConfig
    from suckit_ray.pipelines.crawl import crawl
    from suckit_ray.sources.pagestore import SyntheticPageStore

    if sf_dir not in _CRAWL_OUT_CACHE:
        corpus = corpus_for(sf_dir)
        out = _scratch("suckit_flagship_")
        crawl(
            CrawlConfig(origin=corpus.page_url(0, 0)),
            SyntheticPageStore(corpus),
            seeds=corpus.seeds(),
            num_shards=4,
            output_dir=out,
            delta_hashes=True,
            collect=False,
        )
        _CRAWL_OUT_CACHE[sf_dir] = out
    return rd.read_parquet(os.path.join(_CRAWL_OUT_CACHE[sf_dir], "docs"))


def crawl_hoststats(sf_dir: str) -> rd.Dataset:
    """(host, n_pages, n_assets, n_outlinks, n_spans): per-host mirror
    aggregates over the flagship crawl — the operational per-domain
    report a crawl at 10^10-URL scale is monitored by (coverage per
    host, asset ratio, outlink mass). Consumes the STREAMED per-wave
    parquet (no driver materialization); one bucketed groupby on host,
    which is also the frontier's shard key, so at scale this aggregation
    aligns with the crawl's own partitioning."""
    import pandas as pd
    import pyarrow as pa

    from suckit_ray.stages.agg import bucketed_groupby_agg

    def per_doc(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_html = t.column("is_html")
        return pa.table(
            {
                "host": t.column("host"),
                "is_page": pc.cast(is_html, pa.int64()),
                "is_asset": pc.cast(pc.invert(is_html), pa.int64()),
                "n_outlinks": pc.cast(t.column("n_outlinks"), pa.int64()),
                "n_spans": pc.cast(
                    pc.list_value_length(t.column("spans")), pa.int64()
                ),
            }
        )

    ds = crawl_docs(sf_dir).map_batches(per_doc, batch_format="pyarrow")
    agg = bucketed_groupby_agg(
        ds,
        keys=["host"],
        aggs={
            "n_pages": ("is_page", "sum"),
            "n_assets": ("is_asset", "sum"),
            "n_outlinks": ("n_outlinks", "sum"),
            "n_spans": ("n_spans", "sum"),
        },
    )

    def order_cols(df: pd.DataFrame) -> pd.DataFrame:
        return df[["host", "n_pages", "n_assets", "n_outlinks", "n_spans"]]

    return agg.map_batches(order_cols, batch_format="pandas")


_CRAWL_V2_CACHE: dict[str, str] = {}  # sf_dir → v2 (re-crawl) output dir


def corpus_for_v2(sf_dir: str):
    """The 'later' version of the synthetic web for incremental-crawl
    operators: 25% MORE pages but one host GONE (site shut down).
    Growing m changes every surviving page's mod-m link targets, so
    the recrawl sees new pages (added), pages whose outlinks moved
    (changed), pages whose span sequence is m-invariant (same), and
    the dead host's pages (removed) — all four diff statuses are
    exercised by construction."""
    import pyarrow.parquet as pq

    from suckit_ray.sources.pagestore import SyntheticCorpus

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return SyntheticCorpus(
        n_hosts=7,
        n_docs=n_docs + n_docs // 4,
        fanout=4,
        n_assets_per_host=16,
        ext_links=False,
    )


def crawl_docs_v2(sf_dir: str) -> rd.Dataset:
    """Lazy Dataset over the RE-crawl (v2 corpus) — memoized like the
    flagship crawl so diff consumers share one recrawl per process."""
    from suckit_ray.config import CrawlConfig
    from suckit_ray.pipelines.crawl import crawl
    from suckit_ray.sources.pagestore import SyntheticPageStore

    if sf_dir not in _CRAWL_V2_CACHE:
        corpus = corpus_for_v2(sf_dir)
        out = _scratch("suckit_flagship_v2_")
        crawl(
            CrawlConfig(origin=corpus.page_url(0, 0)),
            SyntheticPageStore(corpus),
            seeds=corpus.seeds(),
            num_shards=4,
            output_dir=out,
            delta_hashes=True,
            collect=False,
        )
        _CRAWL_V2_CACHE[sf_dir] = out
    return rd.read_parquet(os.path.join(_CRAWL_V2_CACHE[sf_dir], "docs"))


def _page_sigs(ds: rd.Dataset, side: str) -> rd.Dataset:
    """(doc_id, side, sig) for every HTML page of a crawled mirror.
    sig = md5 of the NON-TEXT span sequence 'kind:media_ref|...' —
    the rewritten link/media targets in document order, i.e. the
    BASELINE.json row invariant reduced to one hash. Text paragraphs
    are page-local (m-invariant), so sig equality across crawls is
    exactly 'this page's links did not move'."""
    import hashlib

    import pyarrow as pa

    def sig_batch(t: pa.Table) -> pa.Table:
        doc_ids, sigs = [], []
        for doc_id, is_html, spans in zip(
            t.column("doc_id").to_pylist(),
            t.column("is_html").to_pylist(),
            t.column("spans").to_pylist(),
        ):
            if not is_html:
                continue
            parts = [
                f"{s['kind']}:{s['media_ref']}"
                for s in spans
                if s["kind"] != "text"
            ]
            doc_ids.append(doc_id)
            sigs.append(hashlib.md5("|".join(parts).encode()).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.string()),
                "side": pa.array([side] * len(doc_ids), pa.string()),
                "sig": pa.array(sigs, pa.string()),
            }
        )

    return ds.map_batches(sig_batch, batch_format="pyarrow")


def crawl_diff(sf_dir: str) -> rd.Dataset:
    """(doc_id, status) incremental-crawl diff between the flagship
    mirror and the v2 recrawl: 'added' (only in v2), 'removed' (only
    in v1), 'changed' (both, link spans moved), 'same' (both,
    identical span sequence).

    Scale shape: both mirrors stay as streamed parquet; the diff is a
    tagged union of (doc_id, side, sig) rows — 3 short string columns
    — into ONE bucketed groupby on doc_id hash. No join actors, no
    driver state; at 10^10 URLs this is the same single-exchange shape
    as exact dedup."""
    import pandas as pd

    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()
    both = _page_sigs(crawl_docs(sf_dir), "a").union(
        _page_sigs(crawl_docs_v2(sf_dir), "b")
    )

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df["doc_id"], index=False).astype("uint64")
        return df.assign(bucket=(h % B).astype("int64"))

    def diff_group(g: pd.DataFrame) -> pd.DataFrame:
        p = g.pivot_table(
            index="doc_id", columns="side", values="sig", aggfunc="first"
        )
        a = p["a"] if "a" in p else pd.Series(index=p.index, dtype="object")
        b = p["b"] if "b" in p else pd.Series(index=p.index, dtype="object")
        status = pd.Series("same", index=p.index, dtype="object")
        status[a.isna()] = "added"
        status[b.isna()] = "removed"
        status[a.notna() & b.notna() & (a != b)] = "changed"
        return pd.DataFrame(
            {"doc_id": p.index.astype(str), "status": status.to_numpy()}
        )

    return (
        both.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(diff_group, batch_format="pandas")
    )


def crawl_media_manifest(sf_dir: str) -> rd.Dataset:
    """(host, media_ref, n_refs): per-asset reference counts across the
    mirror's HTML pages — the media-side accounting of the interleaved
    corpus (which binary objects exist per host and how many documents
    embed each; the input to media dedup / hot-asset caching at scale).
    media_ref is the REWRITTEN relative target exactly as stored in the
    span sequence, so the manifest keys match the mirror layout.

    Scale shape: one flat_map of media spans off the streamed mirror
    (2 short string columns) into one bucketed count — the same
    single-exchange shape as exact dedup, keyed on (host, ref) whose
    host prefix matches the frontier's shard key."""
    import pandas as pd
    import pyarrow as pa

    from suckit_ray.stages.agg import bucketed_groupby_agg

    def media_rows(t: pa.Table) -> pa.Table:
        hosts, refs = [], []
        for host, is_html, spans in zip(
            t.column("host").to_pylist(),
            t.column("is_html").to_pylist(),
            t.column("spans").to_pylist(),
        ):
            if not is_html:
                continue
            for s in spans:
                if s["kind"] == "media":
                    hosts.append(host)
                    refs.append(s["media_ref"])
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "media_ref": pa.array(refs, pa.string()),
            }
        )

    ds = crawl_docs(sf_dir).map_batches(media_rows, batch_format="pyarrow")
    agg = bucketed_groupby_agg(
        ds,
        keys=["host", "media_ref"],
        aggs={"n_refs": ("media_ref", "count")},
    )

    def order_cols(df: pd.DataFrame) -> pd.DataFrame:
        return df[["host", "media_ref", "n_refs"]]

    return agg.map_batches(order_cols, batch_format="pandas")


def crawl_media_features(sf_dir: str) -> rd.Dataset:
    """(doc_id, width, height, channels, format, n_bytes, feat_fp):
    the multimodal stage family run over the mirror's ASSET rows —
    actor-pool decode + feature extraction (suckit_ray.stages.media)
    reduced to a flat integer/string table: feat_fp is the md5-low-60
    fingerprint of the feature vector's bytes, so the whole decode →
    feature path is pinned by value without floats in the output.

    This query runs the deterministic FAKE kernels unconditionally:
    the synthetic corpus's asset bytes are filler, not decodable
    images, so the real-codec path would fail even where PIL exists.
    Pipelines over real crawls opt into the real kernels with
    ``media_pipeline(docs, fake=False)`` (tests/test_media.py covers
    that path, skipping unless the codec imports).

    Full SQL oracle (sixteenth session): the synthetic corpus serves
    ONE shared asset body, so the oracle emits the closed-form
    constant feature row (88×95×3 fake-decode raster, 90 bytes,
    fixed feat_fp) for exactly the downloaded-asset set — pinning
    byte-determinism of the actor-pool decode stage. The engineered
    multi-body determinism invariants remain pinned in tests."""
    import hashlib

    import pyarrow as pa

    from suckit_ray.stages.media import media_pipeline

    feats = media_pipeline(crawl_docs(sf_dir), concurrency=2, batch_size=32)

    def flatten(t: pa.Table) -> pa.Table:
        metas = t.column("media_meta").to_pylist()
        vecs = t.column("features").to_pylist()
        fps = [
            int(
                hashlib.md5(
                    b"".join(float(x).hex().encode() for x in v)
                ).hexdigest()[:15],
                16,
            )
            for v in vecs
        ]
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "width": pa.array([m["width"] for m in metas], pa.int64()),
                "height": pa.array([m["height"] for m in metas], pa.int64()),
                "channels": pa.array([m["channels"] for m in metas], pa.int64()),
                "format": pa.array([m["format"] for m in metas], pa.string()),
                "n_bytes": pa.array([m["n_bytes"] for m in metas], pa.int64()),
                "feat_fp": pa.array(fps, pa.int64()),
            }
        )

    return feats.map_batches(flatten, batch_format="pyarrow")


def crawl_text_extract(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_text_spans, n_chars, text): plain TRAINING TEXT from
    the interleaved representation — concatenate ``kind == 'text'``
    spans in offset order, strip tags, collapse whitespace. This is
    the bridge from the crawl's interleaved docs to every
    documents-table operator (dedup / quality / LM scoring run
    downstream of exactly this output at corpus scale).

    Full SQL oracle (sixteenth session): the synthetic renderer's
    visible text is regenerated string-for-string from the reach
    closure, so any splice/ordering/rewrite defect breaks the hash.
    The spans-vs-body cross-representation pin remains in tests: the
    visible text reassembled from the SPANS must equal the visible
    text of the independently stored original BODY bytes.
    One map_batches over the streamed mirror; no shuffle."""
    import re

    import pandas as pd

    tag_re = re.compile(r"<[^>]*>")
    ws_re = re.compile(r"\s+")

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        doc_ids, n_spans, n_chars, texts = [], [], [], []
        for d, is_html, spans in zip(df["doc_id"], df["is_html"], df["spans"]):
            if not is_html:
                continue
            parts = sorted(spans, key=lambda s: s["offset"])
            raw = "".join(s["text"] for s in parts if s["kind"] == "text")
            clean = ws_re.sub(" ", tag_re.sub(" ", raw)).strip()
            doc_ids.append(d)
            n_spans.append(sum(1 for s in parts if s["kind"] == "text"))
            n_chars.append(len(clean))
            texts.append(clean)
        return pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="object"),
                "n_text_spans": pd.Series(n_spans, dtype="int64"),
                "n_chars": pd.Series(n_chars, dtype="int64"),
                "text": pd.Series(texts, dtype="object"),
            }
        )

    return crawl_docs(sf_dir).map_batches(extract, batch_format="pandas")


PACK_MM_SEQ_LEN = 64   # tokens per packed multimodal training sequence
MEDIA_TOKENS = 16      # fixed token cost of a media span / asset doc
LINK_TOKENS = 1        # anchor-token cost of a rewritten link span


def crawl_pack_multimodal(sf_dir: str, seq_len: int = PACK_MM_SEQ_LEN) -> rd.Dataset:
    """(doc_id, n_tokens, start_off, first_seq, last_seq): pack the
    INTERLEAVED mirror into fixed-length multimodal training sequences
    — the step that turns the crawl's text+media documents into a
    dataloader-ready epoch. Per-doc token cost prices each modality:
    text spans cost their visible whitespace-token count (tags
    stripped, the ``crawl_text_extract`` cleaning), media spans and
    asset docs cost ``MEDIA_TOKENS`` placeholder tokens, rewritten
    link spans cost ``LINK_TOKENS`` anchor token. Docs are packed in
    deterministic md5('pack:'+doc_id) order — the seeded-shuffle epoch
    order of ``docs_global_shuffle`` composed with the
    ``docs_pack_sequences`` scan, i.e. exactly what a training
    dataloader does (shuffle, then pack).

    Scale shape: md5 uniformity makes FIXED 32-bit range buckets
    balanced by construction (no sampling pass); per-bucket token
    totals → one O(buckets) driver prefix → one range-bucketed
    co-group assigns offsets. Span text never shuffles — the exchange
    carries (doc_id, n_tokens, hkey, kb). Full SQL oracle (sixteenth
    session): the md5 epoch order and constant per-modality pricing
    replay as one window cumulative sum; the pandas reference scan and
    abutting-offset invariants remain in tests/test_round3b_ops.py."""
    import hashlib
    import re

    import numpy as np
    import pandas as pd
    import ray

    from suckit_ray.stages.agg import bucket_prefix_bases, default_buckets

    B = default_buckets()
    tag_re = re.compile(r"<[^>]*>")
    ws_re = re.compile(r"\s+")

    def cost_batch(df: pd.DataFrame) -> pd.DataFrame:
        doc_ids, toks, hkeys = [], [], []
        for d, is_html, spans in zip(df["doc_id"], df["is_html"], df["spans"]):
            if is_html:
                parts = sorted(spans, key=lambda s: s["offset"])
                raw = "".join(s["text"] for s in parts if s["kind"] == "text")
                clean = ws_re.sub(" ", tag_re.sub(" ", raw)).strip()
                n = len(clean.split()) if clean else 0
                n += sum(
                    MEDIA_TOKENS if s["kind"] == "media" else LINK_TOKENS
                    for s in parts
                    if s["kind"] != "text"
                )
            else:
                n = MEDIA_TOKENS
            doc_ids.append(d)
            toks.append(n)
            hkeys.append(
                int(hashlib.md5(f"pack:{d}".encode()).hexdigest()[:8], 16)
            )
        hk = np.asarray(hkeys, dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="object"),
                "n_tokens": pd.Series(toks, dtype="int64"),
                "hkey": hk,
                "kb": (hk * B) >> 32,
            }
        )

    costed = (
        crawl_docs(sf_dir)
        .map_batches(cost_batch, batch_format="pandas")
        .materialize()  # feeds the count pass AND the final co-group
    )
    base_ref = bucket_prefix_bases(costed, "kb", weight_col="n_tokens")

    def offset_group(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.array([], dtype="str"),
                    "n_tokens": pd.array([], dtype="int64"),
                    "start_off": pd.array([], dtype="int64"),
                    "first_seq": pd.array([], dtype="int64"),
                    "last_seq": pd.array([], dtype="int64"),
                }
            )
        base = int(ray.get(base_ref)[int(g["kb"].iloc[0])])
        g = g.sort_values(["hkey", "doc_id"]).reset_index(drop=True)
        n = g["n_tokens"].to_numpy()
        off = base + np.concatenate(([0], n.cumsum()[:-1]))
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                "n_tokens": g["n_tokens"].astype("int64"),
                "start_off": pd.Series(off, dtype="int64"),
                "first_seq": pd.Series(
                    np.where(n > 0, off // seq_len, -1), dtype="int64"
                ),
                "last_seq": pd.Series(
                    np.where(n > 0, (off + n - 1) // seq_len, -1), dtype="int64"
                ),
            }
        )

    return costed.groupby("kb").map_groups(offset_group, batch_format="pandas")


def crawl_depths(sf_dir: str) -> rd.Dataset:
    """(doc_id, depth): the frontier wave at which each document was
    fetched. Under the flagship budget (no politeness caps, delay=0)
    a wave IS a BFS level, so hash-equality against the min-depth
    recursive-CTE oracle pins the frontier's wave SCHEDULING end to
    end — crawl_mirror proves the engine fetched the right SET,
    crawl_depths proves it fetched everything at the EARLIEST wave
    the link graph allows (a seen-set admitting a URL late, a wave
    releasing early, or an asset queued before its page would all
    shift a depth and break the hash). Pages take their BFS distance
    from the host seed; an asset lands one wave after the first page
    that references it."""
    import pyarrow as pa

    def proj(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "depth": pc.cast(t.column("wave"), pa.int64()),
            }
        )

    return crawl_docs(sf_dir).map_batches(proj, batch_format="pyarrow")


def crawl_docs_compacted(sf_dir: str) -> rd.Dataset:
    """Flagship docs after a ``sinks.compact_parquet`` pass (memoized
    per process like the crawl itself). Small target_bytes on the test
    corpus so the pass genuinely coalesces multiple wave files."""
    crawl_docs(sf_dir)  # ensure the crawl ran and cached its output
    key = sf_dir + "#compacted"
    if key not in _CRAWL_OUT_CACHE:
        from suckit_ray.sinks import compact_parquet

        src = os.path.join(_CRAWL_OUT_CACHE[sf_dir], "docs")
        out = os.path.join(_scratch("suckit_compact_"), "docs")
        compact_parquet(src, out, target_bytes=64 * 1024 * 1024)
        _CRAWL_OUT_CACHE[key] = out
    return rd.read_parquet(_CRAWL_OUT_CACHE[key])


def crawl_revisit_plan(sf_dir: str) -> rd.Dataset:
    """(url, changes, intervals, rate_micro): the adaptive-revisit
    change-rate table over the flagship mirror and its v2 recrawl —
    ``pipelines.revisit.revisit_stats`` fed by the two runs' delta
    fingerprints (both flagship crawls record ``hashes_parts``).
    Full SQL oracle (sixteenth session): the crawl_diff closures
    extended with the Laplace rate arithmetic — a page's body moves
    iff its link-target sequence moves under the grown m. Also pinned
    in tests/test_revisit.py by cross-checking
    against ``crawl_diff`` statuses — a 'same' page must show 0
    changes, a 'changed' page exactly 1, and single-snapshot pages
    (added/removed) 0 intervals."""
    from suckit_ray.pipelines.revisit import revisit_stats

    crawl_docs(sf_dir)
    crawl_docs_v2(sf_dir)
    return revisit_stats(
        [_CRAWL_OUT_CACHE[sf_dir], _CRAWL_V2_CACHE[sf_dir]]
    )


def crawl_media_dedup(sf_dir: str) -> rd.Dataset:
    """(doc_id, canonical_id, n_copies): exact payload-level dedup of
    the mirror's downloaded media assets — group by a content digest
    of the stored bytes, canonical = smallest doc_id, every member
    reported with its cluster's canonical and size. The binary-side
    sibling of ``exact_dedup`` (which hashes text): at 100 TB the same
    logo/tracking-pixel is stored once and aliased, and this table IS
    the alias map.

    Scale shape: one map over the streamed mirror computes
    blake2b-16-hex digests straight off the Arrow binary buffer
    (bodies never leave the task; only 2 short string columns
    shuffle), then one digest-bucketed co-group emits members with
    their group min + count. The synthetic corpus serves ONE shared
    asset body by construction, so the oracle's closed form is the
    full downloaded-asset set under a single canonical — the
    engineered test covers digest discrimination between distinct
    bodies."""
    import hashlib

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def digest_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = t.filter(pc.invert(t.column("is_html").combine_chunks()))
        ids = keep.column("doc_id").to_pylist()
        digests = [
            hashlib.blake2b(b, digest_size=16).hexdigest()
            for b in keep.column("body").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.string()),
                "digest": pa.array(digests, pa.string()),
            }
        )

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df["digest"], index=False).astype("uint64")
        return df.assign(bucket=(h % B).astype("int64"))

    def members(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("digest")["doc_id"].agg(["min", "size"])
        j = g.merge(agg, left_on="digest", right_index=True)
        return pd.DataFrame(
            {
                "doc_id": j["doc_id"],
                "canonical_id": j["min"],
                "n_copies": j["size"].astype("int64"),
            }
        )

    return (
        crawl_docs(sf_dir)
        .map_batches(digest_rows, batch_format="pyarrow")
        .map_batches(bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(members, batch_format="pandas")
    )


def crawl_wave_skew(sf_dir: str) -> rd.Dataset:
    """(depth, n_docs, n_hosts, top_share_pct): the frontier
    SCHEDULING-SKEW audit — per BFS wave, how many documents were
    fetched, how many hosts were active, and the hottest host's share
    in integer pct-of-10⁴. This is the table that tells an operator
    whether per-host caps / politeness budgets are needed BEFORE a
    hot host serializes a wave (a wave whose top_share approaches
    10⁴ is bottlenecked on one host's politeness budget at scale).

    Plan: one pass over the streamed mirror emits per-(wave, host)
    partial counts (a combiner — rows per batch ≤ waves×hosts); one
    bucketed aggregation; the per-wave rollup groups O(waves×hosts)
    tiny rows. Full SQL oracle: the crawl_depths closure grouped per
    depth."""
    import numpy as np
    import pandas as pd

    from suckit_ray.stages.agg import bucketed_groupby_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(["wave", "host"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        out["n"] = out["n"].astype("int64")
        out["wave"] = out["wave"].astype("int64")
        return out

    per_host = bucketed_groupby_agg(
        crawl_docs(sf_dir).map_batches(partial, batch_format="pandas"),
        ["wave", "host"],
        {"n": ("n", "sum")},
    )

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        n = g["n"].to_numpy().astype(np.int64)
        total = int(n.sum())
        return pd.DataFrame(
            {
                "depth": pd.array([int(g["wave"].iloc[0])], dtype="int64"),
                "n_docs": pd.array([total], dtype="int64"),
                "n_hosts": pd.array([len(g)], dtype="int64"),
                "top_share_pct": pd.array(
                    [(10000 * int(n.max())) // total], dtype="int64"
                ),
            }
        )

    return per_host.groupby("wave").map_groups(rollup, batch_format="pandas")
