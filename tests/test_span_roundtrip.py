"""Closing the input_hint loop: the interleaved-span documents table is
both the crawl's OUTPUT and a valid INPUT. A crawl's documents table,
served back through SpanTableStore, re-crawls to the SAME table (span
sequences, doc ids, bodies) — the fixed-point property of the
representation."""

import pytest

from suckit_ray.config import CrawlConfig
from suckit_ray.htmlproc import reassemble_spans
from suckit_ray.pipelines.crawl import crawl
from suckit_ray.sources.pagestore import (
    SpanTableStore,
    SyntheticCorpus,
    SyntheticPageStore,
)


@pytest.mark.usefixtures("ray_session")
def test_spans_reassemble_to_body():
    corpus = SyntheticCorpus(n_hosts=2, n_docs=30, fanout=3, n_assets_per_host=2)
    res = crawl(
        CrawlConfig(origin=corpus.page_url(0, 0)),
        SyntheticPageStore(corpus),
        seeds=corpus.seeds(),
        num_shards=1,
    )
    checked = 0
    for row in res.docs.to_pylist():
        if not row["is_html"]:
            continue
        assert reassemble_spans(row["spans"]).encode("utf-8") == row["body"], row["doc_id"]
        checked += 1
    assert checked > 20


@pytest.mark.usefixtures("ray_session")
def test_crawl_of_own_output_is_fixed_point():
    # ext_links=False: cross-host links rewrite to ../host… paths which a
    # mirror RE-crawl resolves inside the crawled host (faithful but not
    # a fixed point); same-host graphs are closed under rewriting
    corpus = SyntheticCorpus(
        n_hosts=2, n_docs=24, fanout=3, n_assets_per_host=2, ext_links=False
    )
    first = crawl(
        CrawlConfig(origin=corpus.page_url(0, 0)),
        SyntheticPageStore(corpus),
        seeds=corpus.seeds(),
        num_shards=1,
    )
    # serve the FIRST crawl's documents table as the web
    store2 = SpanTableStore(first.docs)
    seeds = [f"http://host{h:04d}.test/p0.html" for h in range(2)]
    second = crawl(
        CrawlConfig(origin=seeds[0]), store2, seeds=seeds, num_shards=1
    )

    def key(t):
        return sorted(
            (r["doc_id"], [
                (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
            ])
            for r in t.to_pylist()
            if r["is_html"]
        )

    assert key(second.docs) == key(first.docs)
    # bodies byte-identical too (all links already relative → stable)
    b1 = {r["doc_id"]: r["body"] for r in first.docs.to_pylist() if r["is_html"]}
    b2 = {r["doc_id"]: r["body"] for r in second.docs.to_pylist() if r["is_html"]}
    assert b1 == b2
