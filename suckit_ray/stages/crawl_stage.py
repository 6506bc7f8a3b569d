"""Fused fetch+process stage — one ``map_batches`` doing HTTP fetch,
HTML handling, span assembly, and frontier/ledger shipping per batch.

The crawl driver runs one Dataset per BFS wave; with two separate
stages each wave pays two task rounds and ships page bodies through
the object store between them. Fusing halves the per-wave fixed cost
and keeps bodies task-local; the separate stages (stages/fetch.py,
stages/html_stage.py) remain for pipelines that need the intermediate
fetched-pages table.

``warc_dir`` hooks the WARC archive between fetch and process — WARC
semantically stores WIRE bytes, so records capture the raw fetched
body BEFORE link rewriting (re-crawling the archive is then a true
fixed point; archiving the rewritten mirror bodies instead would turn
cross-host rewritten hrefs into phantom internal URLs).
"""

from __future__ import annotations

import pyarrow as pa

from suckit_ray.config import CrawlConfig
from suckit_ray.stages.fetch import make_fetch_fn
from suckit_ray.stages.html_stage import make_process_fn


def make_warc_stage(warc_dir: str, delta: bool = False):
    """Archive a FETCH-output batch (raw bodies) as one WARC segment;
    passes the batch through unchanged. With ``delta`` (a delta
    recrawl), pages whose body fingerprint matches the wave's
    ``prev_hash`` archive as WARC REVISIT records — headers + payload
    digest pointing at the prior capture, no body — so an incremental
    archive stores bytes only for changed/new pages, exactly like the
    skip decision stores docs only for them (Common Crawl's dedupe
    convention, ISO 28500 revisit profile)."""

    def warc_stage(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from suckit_ray.sources.warc import write_warc_batch

        # the archive is RAW WIRE TRUTH: transport-failure rows
        # (fetch_error set, status 0, empty body) never touched the
        # wire, and archiving them would make recrawl-from-archive
        # serve fabricated status-0 pages instead of missing (refetch)
        batch = batch.filter(pc.is_null(batch.column("fetch_error")))
        if (
            delta
            and batch.num_rows
            and "prev_hash" in batch.schema.names
            and "body_digest" in batch.schema.names
        ):
            # digests were computed ONCE in crawl_batch; revisit iff
            # the prior run recorded the same non-zero fingerprint
            rev = [
                int(ph) != 0 and int(d) == int(ph)
                for ph, d in zip(
                    batch.column("prev_hash").to_pylist(),
                    batch.column("body_digest").to_pylist(),
                )
            ]
            batch = batch.append_column(
                pa.field("warc_revisit", pa.bool_()),
                pa.array(rev, pa.bool_()),
            )
        if batch.num_rows:
            # reconstruct the on-the-wire content type from the parsed
            # (data_type, charset) pair — parse_content_type is
            # idempotent over this shape
            ctypes = [
                (f"{dt}; charset={cs}" if cs else dt)
                for dt, cs in zip(
                    batch.column("data_type").to_pylist(),
                    batch.column("charset").to_pylist(),
                )
            ]
            write_warc_batch(
                batch.set_column(
                    batch.schema.get_field_index("data_type"),
                    pa.field("data_type", pa.string()),
                    pa.array(ctypes, pa.string()),
                ),
                warc_dir,
                revisit_col="warc_revisit" if delta else None,
            )
        if "warc_revisit" in batch.schema.names:
            batch = batch.drop_columns(["warc_revisit"])
        return batch

    return warc_stage


def make_crawl_fn(
    store_ref,
    config: CrawlConfig,
    shard_handles: list,
    wave: int,
    warc_dir: str | None = None,
    delta_hashes: bool = False,
):
    fetch = make_fetch_fn(store_ref, config)
    process = make_process_fn(
        config, shard_handles, wave, store_ref=store_ref,
        delta_hashes=delta_hashes,
    )
    warc = make_warc_stage(warc_dir, delta=delta_hashes) if warc_dir else None

    def crawl_batch(batch: pa.Table) -> pa.Table:
        fetched = fetch(batch)
        if delta_hashes:
            # one blake2b per body, shared by the WARC revisit
            # decision AND html_stage's skip/record path (review r3:
            # the naive wiring hashed unchanged bodies three times)
            from suckit_ray.stages.html_stage import body_hash

            # a 304 (conditional revalidation) PROVES the content still
            # matches the presented fingerprint — the digest is the
            # prev_hash by definition (no body arrived to hash)
            prevs = (
                fetched.column("prev_hash").to_pylist()
                if "prev_hash" in fetched.schema.names
                else None
            )
            sts = fetched.column("status").to_pylist()
            digs = [
                0
                if err is not None
                else (
                    int(prevs[i])
                    if (prevs is not None and sts[i] == 304 and prevs[i])
                    else body_hash(b or b"")
                )
                for i, (err, b) in enumerate(
                    zip(
                        fetched.column("fetch_error").to_pylist(),
                        fetched.column("body").to_pylist(),
                    )
                )
            ]
            fetched = fetched.append_column(
                pa.field("body_digest", pa.int64()),
                pa.array(digs, pa.int64()),
            )
        if warc is not None:
            warc(fetched)
        return process(fetched)

    return crawl_batch
