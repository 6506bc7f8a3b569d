"""The flagship crawl used by the driver contract and the mirror-
consuming pipelines: a deterministic synthetic corpus sized from the
documents table of an sf dir, crawled through the STREAMING output
path (per-wave parquet partitions — docs never accumulate on the
driver), memoized per process so every consumer (crawl_mirror,
crawl_spans, crawl_pagerank, entry()) shares one crawl."""

from __future__ import annotations

import os
import tempfile

import ray.data as rd

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
        out = tempfile.mkdtemp(prefix="suckit_flagship_")
        crawl(
            CrawlConfig(origin=corpus.page_url(0, 0)),
            SyntheticPageStore(corpus),
            seeds=corpus.seeds(),
            num_shards=4,
            output_dir=out,
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
