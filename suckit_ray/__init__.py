"""suckit_ray — a Ray-Data-native recursive website-mirroring engine.

A from-scratch rebuild of the crawl semantics of Skallwar/suckit
(reference at /root/reference, v0.2.0) on top of ``ray.data.Dataset``
pipelines: wave-based BFS frontier, actor-pool fetch + sharded URL-seen
dedup, HTML link extraction/rewriting as vectorized ``map_batches``
stages over Arrow batches, and interleaved text+media span documents
(``doc_id``, ``spans: list<struct<kind,text,media_ref,offset>>``) as the
sink, written as partitioned, resumable Parquet.

This is NOT a port of the reference's thread/channel architecture — the
unbounded MPMC channel (reference src/scraper.rs:40-41) becomes a
deterministic loop-until-empty wave driver, and the process-global
``Mutex<HashMap>`` URL-seen map (src/scraper.rs:44) becomes a pool of
hash-partitioned frontier/dedup shard actors.
"""

from suckit_ray.config import CrawlConfig
from suckit_ray.urlkit import ParsedUrl, parse_url, to_path, normalize_url

__all__ = [
    "CrawlConfig",
    "ParsedUrl",
    "parse_url",
    "to_path",
    "normalize_url",
]

__version__ = "0.1.0"
