"""Capstone integration: one crawl with EVERY subsystem enabled at
once — politeness delay, robots.txt, mirror tree, per-wave parquet,
WARC archive, checkpointing, and all spill tiers overflowing — must
complete and leave mutually consistent artifacts."""

import os

import pytest

from suckit_ray.config import CrawlConfig
from suckit_ray.pipelines.crawl import crawl
from suckit_ray.sources.pagestore import SyntheticCorpus, SyntheticPageStore


@pytest.mark.usefixtures("ray_session")
def test_everything_on(tmp_path):
    import pyarrow.parquet as pq

    from suckit_ray.sources.warc import read_warc

    corpus = SyntheticCorpus(n_hosts=3, n_docs=60, fanout=3, n_assets_per_host=3)
    store = SyntheticPageStore(corpus)
    cfg = CrawlConfig(
        origin=corpus.page_url(0, 0), delay=0.01, respect_robots=True
    )
    out = str(tmp_path / "pq")
    res = crawl(
        cfg,
        store,
        seeds=corpus.seeds(),
        num_shards=2,
        mirror_dir=str(tmp_path / "mirror"),
        output_dir=out,
        warc_dir=str(tmp_path / "warc"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        collect=False,
        spill_threshold=16,
        pending_mem_limit=8,
        ledger_mem_rows=8,
    )
    assert res.metrics["pages"] > 30 and res.waves > 3

    # parquet docs == ledger rows (every fetch produced a doc row)
    docs_root = os.path.join(out, "docs")
    n_docs = sum(
        pq.read_table(os.path.join(docs_root, w)).num_rows
        for w in os.listdir(docs_root)
    )
    assert n_docs == res.ledger.num_rows

    # WARC archive covers exactly the ledger's URL set
    warc_urls = set(read_warc(str(tmp_path / "warc")).to_pandas()["url"])
    assert warc_urls == set(res.ledger.column("url").to_pylist())

    # mirror tree holds one file per downloaded html/asset doc_id
    n_mirror = sum(len(fs) for _, _, fs in os.walk(tmp_path / "mirror"))
    n_downloaded = sum(1 for d in res.ledger.column("downloaded").to_pylist() if d)
    assert n_mirror >= n_downloaded  # + ledger.parquet etc.

    # checkpoint manifest points past the final wave
    import json

    manifest = json.load(open(tmp_path / "ckpt" / "MANIFEST.json"))
    assert manifest["num_shards"] == 2

    # a fresh identical crawl (no sinks) agrees on the doc set
    res2 = crawl(cfg, store, seeds=corpus.seeds(), num_shards=2)
    assert sorted(res2.docs.column("url").to_pylist()) == sorted(
        res.ledger.column("url").to_pylist()
    )
