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


@pytest.mark.usefixtures("ray_session")
def test_resume_with_mirror_is_idempotent(tmp_path):
    from suckit_ray.sources.pagestore import SyntheticCorpus, SyntheticPageStore

    corpus = SyntheticCorpus(n_hosts=2, n_docs=40, fanout=3, n_assets_per_host=4)
    store = SyntheticPageStore(corpus)
    ckpt, mirror = str(tmp_path / "ck"), str(tmp_path / "mir")
    cfg = CrawlConfig(origin=corpus.page_url(0, 0))

    crawl(cfg, store, seeds=corpus.seeds(), num_shards=2,
          checkpoint_dir=ckpt, mirror_dir=mirror, max_waves=2)
    part2 = crawl(cfg, store, seeds=corpus.seeds(), num_shards=2,
                  checkpoint_dir=ckpt, mirror_dir=mirror, resume=True)
    import os

    files = []
    for root, _dirs, names in os.walk(mirror):
        files += [os.path.join(root, n) for n in names if n.endswith(".html")]
    # mirror file set equals the union ledger (pages are never duplicated)
    html_docs = {
        r for r, h in zip(part2.ledger.column("doc_id").to_pylist(),
                          part2.ledger.column("is_html").to_pylist()) if h
    }
    assert len(files) == len(html_docs)


@pytest.mark.usefixtures("ray_session")
def test_politeness_rate_budget():
    import time

    from suckit_ray.sources.pagestore import SyntheticCorpus, SyntheticPageStore

    # single host chain: with delay=0.3 a host is fetched at most once
    # per 0.3s (budget-equivalence with the reference's per-worker sleep)
    corpus = SyntheticCorpus(n_hosts=1, n_docs=4, fanout=1, n_assets_per_host=1)
    t0 = time.perf_counter()
    res = crawl(
        CrawlConfig(origin=corpus.page_url(0, 0), delay=0.3),
        SyntheticPageStore(corpus),
        seeds=corpus.seeds(),
        num_shards=1,
    )
    wall = time.perf_counter() - t0
    n_waves = res.waves
    assert n_waves >= 4  # max_per_host=1 serializes the host
    assert wall >= 0.3 * (n_waves - 1)


@pytest.mark.usefixtures("ray_session")
def test_resume_streaming_output_with_spilled_tiers(tmp_path):
    """Exact resume through the STREAMING path with every frontier tier
    spilling: kill after wave 1, resume with output_dir parquet, and
    the union of wave partitions equals the uninterrupted crawl."""
    import os

    import pyarrow.parquet as pq

    from suckit_ray.sources.pagestore import SyntheticCorpus, SyntheticPageStore

    corpus = SyntheticCorpus(n_hosts=2, n_docs=80, fanout=3, n_assets_per_host=4)
    store = SyntheticPageStore(corpus)
    cfg = CrawlConfig(origin=corpus.page_url(0, 0))
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    spill = dict(spill_threshold=16, pending_mem_limit=8, ledger_mem_rows=8)

    full = crawl(cfg, store, seeds=corpus.seeds(), num_shards=2)
    full_ids = sorted(full.docs.column("doc_id").to_pylist())

    crawl(cfg, store, seeds=corpus.seeds(), num_shards=2,
          checkpoint_dir=ckpt, output_dir=out, collect=False,
          max_waves=2, **spill)
    part2 = crawl(cfg, store, seeds=corpus.seeds(), num_shards=2,
                  checkpoint_dir=ckpt, output_dir=out, collect=False,
                  resume=True, **spill)

    docs_root = os.path.join(out, "docs")
    waves = sorted(os.listdir(docs_root))
    tables = [
        pq.read_table(os.path.join(docs_root, w)) for w in waves
    ]
    streamed_ids = sorted(
        d for t in tables for d in t.column("doc_id").to_pylist()
    )
    assert streamed_ids == full_ids  # no loss, no duplicates
    assert part2.ledger.num_rows == full.ledger.num_rows
    # per-shard ledger partitions exist (scale path)
    assert sorted(os.listdir(os.path.join(out, "ledger_parts"))) == [
        "shard_0000.parquet", "shard_0001.parquet",
    ]
