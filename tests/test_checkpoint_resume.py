"""Kill-and-resume: a crawl stopped after wave 0 resumes from its
checkpoint and produces exactly the uninterrupted crawl's document set
(exact resume per north_rule)."""

import pytest

from suckit_ray.config import CrawlConfig
from suckit_ray.pipelines.crawl import crawl
from suckit_ray.sources.pagestore import fixture_pages

ORIGIN = "http://site.test/"


@pytest.mark.usefixtures("ray_session")
def test_resume_completes_crawl(tmp_path):
    ckpt = str(tmp_path / "ckpt")

    full = crawl(CrawlConfig(origin=ORIGIN), fixture_pages(), num_shards=2)
    full_ids = set(full.docs.column("doc_id").to_pylist())

    # "crash" after one wave: wave 0 docs collected, wave-1 frontier
    # snapshotted but unfetched
    part1 = crawl(
        CrawlConfig(origin=ORIGIN),
        fixture_pages(),
        num_shards=2,
        checkpoint_dir=ckpt,
        max_waves=1,
    )
    ids1 = set(part1.docs.column("doc_id").to_pylist())
    assert ids1 == {"site.test/index.html"}

    part2 = crawl(
        CrawlConfig(origin=ORIGIN),
        fixture_pages(),
        num_shards=2,
        checkpoint_dir=ckpt,
        resume=True,
    )
    ids2 = set(part2.docs.column("doc_id").to_pylist())
    assert ids1 | ids2 == full_ids
    assert ids1.isdisjoint(ids2)
    # the restored ledger carries the pre-crash visits too
    assert set(part2.ledger.column("url").to_pylist()) == set(
        full.ledger.column("url").to_pylist()
    )
