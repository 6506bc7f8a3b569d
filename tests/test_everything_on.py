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


@pytest.mark.usefixtures("ray_session")
def test_round3_features_compose(tmp_path):
    """Sitemap seeding + URL canonicalization + delta recrawl in ONE
    crawl pair: the island page is reached via the sitemap, query
    variants dedup to one fetch, and the unchanged rerun emits an
    empty delta while still covering the full url set."""
    from suckit_ray.sources.pagestore import PageRecord, TablePageStore

    recs = [
        PageRecord(
            "http://site.test/",
            b'<a href="p.html?b=2&a=1">one</a>'
            b'<a href="p.html?a=1&b=2&utm_source=m">two</a>',
            "text/html",
        ),
        PageRecord("http://site.test/p.html?b=2&a=1", b"P", "text/html"),
        PageRecord(
            "http://site.test/p.html?a=1&b=2&utm_source=m", b"P", "text/html"
        ),
        PageRecord("http://site.test/island.html", b"I", "text/html"),
        PageRecord(
            "http://site.test/sitemap.xml",
            b"<urlset><url><loc>http://site.test/island.html</loc></url>"
            b"</urlset>",
            "text/xml",
        ),
    ]
    store = TablePageStore.from_records(recs)
    cfg = CrawlConfig(
        origin="http://site.test/",
        use_sitemaps=True,
        canonicalize_urls=True,
    )
    out1 = str(tmp_path / "r1")
    res1 = crawl(
        cfg, store, num_shards=2, output_dir=out1,
        delta_hashes=True, collect=True,
    )
    urls1 = set(res1.ledger.column("url").to_pylist())
    assert "http://site.test/island.html" in urls1  # sitemap reach
    assert len([u for u in urls1 if "p.html" in u]) == 1  # canonical dedup
    assert len(urls1) == 3  # root + one variant + island

    res2 = crawl(
        cfg, store, num_shards=2, output_dir=str(tmp_path / "r2"),
        recrawl_from=out1, collect=True,
    )
    assert res2.ledger.num_rows == 3  # full coverage re-fetched
    assert res2.docs.num_rows == 0   # empty delta: nothing changed
