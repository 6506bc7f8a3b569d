"""Fused fetch+process stage — one ``map_batches`` doing HTTP fetch,
HTML handling, span assembly, and frontier/ledger shipping per batch.

The crawl driver runs one Dataset per BFS wave; with two separate
stages each wave pays two task rounds and ships page bodies through
the object store between them. Fusing halves the per-wave fixed cost
and keeps bodies task-local; the separate stages (stages/fetch.py,
stages/html_stage.py) remain for pipelines that need the intermediate
fetched-pages table.
"""

from __future__ import annotations

import pyarrow as pa

from suckit_ray.config import CrawlConfig
from suckit_ray.stages.fetch import make_fetch_fn
from suckit_ray.stages.html_stage import make_process_fn


def make_crawl_fn(store_ref, config: CrawlConfig, shard_handles: list, wave: int):
    fetch = make_fetch_fn(store_ref, config)
    process = make_process_fn(config, shard_handles, wave, store_ref=store_ref)

    def crawl_batch(batch: pa.Table) -> pa.Table:
        return process(fetch(batch))

    return crawl_batch
