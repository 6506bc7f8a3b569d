"""HTML-processing stage — handle_html/handle_url as a ``map_batches``
stage (reference src/scraper.rs:145-293).

Per fetched row: charset handling, link extraction + rewriting, span
assembly (HTML), or single-media-span wrapping (assets). Discovered
outlink candidates and fetch-ledger rows are pushed to the owning
frontier shard actors from INSIDE the task (hash-partitioned by host)
— the engine's only wide exchange, replacing the reference's global
mutex. The task ray.gets the acks so the wave's candidate ingestion is
complete when the Dataset finishes executing.
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa

import ray
from suckit_ray import htmlproc
from suckit_ray.config import CrawlConfig
from suckit_ray.state.frontier import (
    CAND_SCHEMA,
    HASH_SCHEMA,
    LEDGER_SCHEMA,
    rows_to_table,
    shard_of,
    shard_of_url,
)
from suckit_ray.urlkit import parse_url, to_path


_SENT_DELAYS: dict[str, dict[str, int]] = {}  # crawl-run → host → ms sent


def body_hash(body: bytes) -> int:
    """63-bit blake2b content fingerprint (int64-safe, vectorizable
    enough: one C call per body). Collision ⇒ a missed re-process in a
    delta recrawl — at 2^-63 per pair, negligible against fetch-level
    noise."""
    import hashlib

    return int.from_bytes(
        hashlib.blake2b(body, digest_size=8).digest(), "big"
    ) & ((1 << 63) - 1)

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
SPAN_LIST = pa.list_(SPAN_STRUCT)

DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("url", pa.string()),
        ("host", pa.string()),
        ("wave", pa.int32()),
        ("seq", pa.int64()),
        ("status", pa.int32()),
        ("data_type", pa.string()),
        ("charset", pa.string()),
        ("is_html", pa.bool_()),
        ("filename", pa.string()),  # Content-Disposition alias (S5 symlink column)
        ("downloaded", pa.bool_()),
        ("n_outlinks", pa.int32()),
        ("spans", SPAN_LIST),
        ("body", pa.binary()),
        ("error", pa.string()),
    ]
)


_ROBOTS_CACHE: dict = {}


def _robots_for(store_ref, user_agent: str, tries: int = 1):
    import ray as _ray

    from suckit_ray.robots import RobotsCache
    from suckit_ray.stages.fetch import _get_store

    key = (
        store_ref.hex() if isinstance(store_ref, _ray.ObjectRef) else id(store_ref),
        user_agent,
        tries,
    )
    if key not in _ROBOTS_CACHE:
        # single-slot: each crawl() puts a fresh store ref; keeping old
        # crawls' RobotsCache (and their store copies) alive would grow
        # worker RSS linearly across crawl invocations in one session
        _ROBOTS_CACHE.clear()
        _ROBOTS_CACHE[key] = RobotsCache(_get_store(store_ref), user_agent, tries)
    return _ROBOTS_CACHE[key]


def make_process_fn(
    config: CrawlConfig,
    shard_handles: list,
    wave: int,
    store_ref=None,
    delta_hashes: bool = False,
):
    """Build the per-batch HTML/asset processing function for one wave.

    With ``config.respect_robots`` (and a store to fetch robots.txt
    from), discovered candidates whose host's robots rules disallow the
    path are dropped before they reach the frontier — one robots fetch
    per (worker, host), cached.

    ``delta_hashes`` (delta recrawl): every fetched body is
    fingerprinted and the (url, hash) rows ship to the url's owner
    shard; rows whose wave entry carries a matching ``prev_hash`` (the
    prior run's fingerprint, attached at release) SKIP parsing, span
    assembly, candidate emission and the doc row entirely — the docs
    output becomes a DELTA (changed + new pages only) while the ledger
    still records every fetch. Discovery stays correct because a
    recrawl seeds from the prior ledger: an unchanged page's outlinks
    are by definition already in that seed set."""

    cfg = config.resolved()
    num_shards = len(shard_handles)
    route_by_host = cfg.politeness_on  # politeness requires host co-location
    canonicalize = cfg.canonicalize_urls
    # delta recrawls on the delete-capable cuckoo seen set retire
    # previously-alive urls that error this run (the crawl_diff
    # status='removed' set): the shard unlearns them, so a later
    # rediscovery refetches instead of being first-wins blocked.
    # Bloom runs never retire (append-only; reference parity).
    retire_removed = delta_hashes and cfg.seen_filter == "cuckoo"
    honor_nofollow = cfg.honor_nofollow
    follow_meta_refresh = cfg.follow_meta_refresh
    if canonicalize:
        from suckit_ray.urlkit import canonical_url as _canon

    def process_batch(batch: pa.Table) -> pa.Table:
        include_visit, exclude_visit = cfg.visit_filters()
        include_download, exclude_download = cfg.download_filters()
        robots = (
            _robots_for(store_ref, cfg.user_agent, cfg.tries)
            if (cfg.respect_robots and store_ref is not None)
            else None
        )

        cols = {name: batch.column(name).to_pylist() for name in batch.schema.names}
        n = len(cols["url"])

        out = {name: [] for name in DOC_SCHEMA.names}
        cand_by_shard: dict[int, list[tuple]] = defaultdict(list)
        ledger_by_shard: dict[int, list[tuple]] = defaultdict(list)
        hash_by_shard: dict[int, list[tuple]] = defaultdict(list)
        retire_by_shard: dict[int, list[str]] = defaultdict(list)
        host_delays: dict[str, int] = {}  # robots Crawl-delay, ms
        prev_hashes = cols.get("prev_hash")  # wave column (delta recrawl)
        cashes = cols.get("cash")  # wave column (OPIC; all-0.0 when off)

        for i in range(n):
            url = cols["url"][i]
            seq = cols["seq"][i]
            body = cols["body"][i] or b""
            is_html = cols["is_html"][i]
            status = cols["status"][i]
            err = cols["fetch_error"][i]

            parsed = parse_url(url)
            doc_id = to_path(parsed, with_fragment=False)
            host = parsed.host or ""
            if delta_hashes:
                # errored fetches record hash 0 (never matches) so the
                # NEXT recrawl's seed set still covers them for retry.
                # The fused crawl stage precomputes digests (shared
                # with the WARC revisit decision); standalone callers
                # hash here.
                pre = cols.get("body_digest")
                if pre is not None:
                    bh = int(pre[i])
                elif err is not None:
                    bh = 0
                elif (
                    status == 304
                    and prev_hashes is not None
                    and prev_hashes[i]
                ):
                    # conditional revalidation answered without a body:
                    # the digest IS the validated prior fingerprint
                    # (standalone-stage path; the fused stage precomputes)
                    bh = int(prev_hashes[i])
                else:
                    bh = body_hash(body)
                hash_by_shard[
                    shard_of_url(url, host, num_shards, route_by_host)
                ].append((url, bh, cols["depth"][i], cols["ext_depth"][i]))
                if (
                    retire_removed
                    and prev_hashes is not None
                    and prev_hashes[i]
                    and status in (404, 410)
                ):
                    # previously alive, deliberately GONE this run —
                    # the crawl_diff status='removed' semantics.
                    # Transient failures (transport errors, 5xx,
                    # status 0) do NOT retire: a flaky-but-present
                    # page must not be refetched per rediscovery
                    # (review finding: duplicate doc rows per wave)
                    retire_by_shard[
                        shard_of_url(url, host, num_shards, route_by_host)
                    ].append(url)
                if err is None and prev_hashes is not None and prev_hashes[i] == bh:
                    # unchanged since the prior run: ledger only — no
                    # parse, no doc row, no candidates (the recrawl's
                    # seed set already covers this page's outlinks)
                    ledger_by_shard[shard_of(host, num_shards)].append(
                        (url, doc_id, status, wave, bool(is_html), False, 0, None)
                    )
                    continue
            # download filter runs on the full URL; the page is fetched
            # and parsed REGARDLESS so links are discovered
            # (reference src/scraper.rs:238-241, M15). Transport-failure
            # rows (fetch_error set) are never "downloaded": the
            # reference's Err arm saves nothing (src/scraper.rs:275-282)
            # — without this a failed fetch leaves a zero-byte file in
            # the mirror.
            downloaded = bool(
                err is None
                and include_download.search(url)
                and not exclude_download.search(url)
            )

            charset = cols["charset"][i]
            spans: list[dict] = []
            body_out = body
            n_outlinks = 0

            if err is None and is_html:
                res = htmlproc.process_html(
                    parsed, doc_id, body, charset, include_visit,
                    exclude_visit, honor_nofollow=honor_nofollow,
                    follow_meta_refresh=follow_meta_refresh,
                )
                body_out = res.body
                spans = res.spans
                n_outlinks = len(res.outlinks)
                charset = res.charset
                if res.errors:
                    err = "; ".join(res.errors)
                row_cands = []
                for o in res.outlinks:
                    # nofollow candidates are rewritten in the mirror
                    # but never enqueued; like robots-dropped links
                    # they get no OPIC cash share
                    if o.nofollow:
                        continue
                    if robots is not None:
                        ok, delay_ms = robots.allows_and_delay_ms(o.url)
                        if not ok:
                            continue
                        if delay_ms > host_delays.get(o.host, 0):
                            host_delays[o.host] = delay_ms
                    # route by the CANONICAL key when on: two variants
                    # of one page must land on the same owner shard or
                    # first-wins dedup silently splits
                    rk = _canon(o.url) if canonicalize else o.url
                    row_cands.append((o, rk))
                # OPIC: the page's cash splits evenly over its EMITTED
                # candidates (robots-dropped links get no share). Cash
                # reaching a dead end — assets, errored fetches, pages
                # with zero emitted links — RETIRES rather than
                # recirculating (the paper's virtual-node feedback is
                # deliberately omitted: for a one-shot crawl the
                # ordering signal is relative cash among live pending
                # urls, which uniform decay does not change). 0.0 when
                # opic is off.
                share = (
                    cashes[i] / len(row_cands)
                    if cashes is not None and row_cands and cashes[i] > 0.0
                    else 0.0
                )
                for o, rk in row_cands:
                    cand_by_shard[
                        shard_of_url(rk, o.host, num_shards, route_by_host)
                    ].append(
                        (
                            seq,
                            o.ordinal,
                            o.url,
                            o.host,
                            o.is_external,
                            cols["depth"][i],
                            cols["ext_depth"][i],
                            share,
                        )
                    )
            elif err is None:
                spans = htmlproc.media_spans_for_asset(doc_id)

            ledger_by_shard[shard_of(host, num_shards)].append(
                (url, doc_id, status, wave, bool(is_html), downloaded, n_outlinks, err)
            )

            out["doc_id"].append(doc_id)
            out["url"].append(url)
            out["host"].append(host)
            out["wave"].append(wave)
            out["seq"].append(seq)
            out["status"].append(status)
            out["data_type"].append(cols["data_type"][i])
            out["charset"].append(charset)
            out["is_html"].append(bool(is_html))
            out["filename"].append(cols["filename"][i])
            out["downloaded"].append(downloaded)
            out["n_outlinks"].append(n_outlinks)
            out["spans"].append(spans)
            out["body"].append(body_out)
            out["error"].append(err)

        # ship candidates + ledger to their owning shards as Arrow
        # tables (zero-copy object-store transfer — never pickled tuple
        # lists); await acks so ingestion is complete when this task
        # (and the wave) finishes
        acks = []
        for sid, cands in cand_by_shard.items():
            acks.append(
                shard_handles[sid].add_candidates.remote(rows_to_table(cands, CAND_SCHEMA))
            )
        for sid, rows in ledger_by_shard.items():
            acks.append(
                shard_handles[sid].add_ledger.remote(rows_to_table(rows, LEDGER_SCHEMA))
            )
        for sid, hrows in hash_by_shard.items():
            acks.append(
                shard_handles[sid].add_hashes.remote(
                    rows_to_table(hrows, HASH_SCHEMA)
                )
            )
        for sid, rurls in retire_by_shard.items():
            acks.append(shard_handles[sid].retire_seen.remote(rurls))
        if host_delays:
            # Crawl-delay directives go to EVERY shard (max-merged,
            # idempotent): without politeness host-routing a host's
            # entries may live on any shard. A worker-local sent-cache
            # suppresses the rebroadcast every later batch of a
            # delayed host would otherwise trigger (an O(num_shards)
            # RPC fan-out per batch on the hot path).
            sent = _SENT_DELAYS.setdefault(repr(shard_handles[0]), {})
            fresh = {
                h: ms for h, ms in host_delays.items() if ms > sent.get(h, 0)
            }
            if fresh:
                sent.update(fresh)
                for sh in shard_handles:
                    acks.append(sh.add_host_delays.remote(fresh))
        if acks:
            ray.get(acks)

        return pa.Table.from_pydict(
            {name: pa.array(out[name], type=DOC_SCHEMA.field(name).type) for name in DOC_SCHEMA.names},
            schema=DOC_SCHEMA,
        )

    return process_batch
