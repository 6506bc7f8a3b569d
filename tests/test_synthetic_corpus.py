"""Seed-list crawl over the deterministic synthetic corpus: span-sequence
invariant against independently-computed expectations, determinism
across runs, and skew handling."""

import pytest

from suckit_ray.config import CrawlConfig
from suckit_ray.pipelines.crawl import crawl
from suckit_ray.sources.pagestore import SyntheticCorpus, SyntheticPageStore
from suckit_ray.urlkit import parse_url, relative_rewrite, to_path


def expected_media_refs(corpus: SyntheticCorpus, h: int, j: int) -> list[str]:
    """Independently compute the rewritten media_ref sequence for page
    (h, j) from the corpus link structure + the pure path kernels."""
    source_path = to_path(parse_url(corpus.page_url(h, j)), False)
    out = []
    for _attr, cand in corpus.links_of(h, j):
        if cand.startswith("http"):
            target = parse_url(cand)
        else:
            target = parse_url(f"http://{corpus.host_name(h)}/{cand}")
        out.append(relative_rewrite(source_path, to_path(target, True)))
    return out


@pytest.mark.usefixtures("ray_session")
def test_corpus_crawl_spans_and_determinism():
    corpus = SyntheticCorpus(n_hosts=3, n_docs=45, fanout=3, n_assets_per_host=4)
    store = SyntheticPageStore(corpus)
    cfg = CrawlConfig(origin=corpus.page_url(0, 0))

    res = crawl(cfg, store, seeds=corpus.seeds(), num_shards=2)
    docs = res.docs
    assert docs.num_rows == res.ledger.num_rows
    assert set(docs.column("status").to_pylist()) == {200}

    ids = docs.column("doc_id").to_pylist()
    spans_col = docs.column("spans").to_pylist()
    checked = 0
    for i, doc_id in enumerate(ids):
        if not docs.column("is_html").to_pylist()[i]:
            continue
        # doc_id = host{h}.test//p{j}.html (root-file double-slash quirk)
        hostpart, fname = doc_id.split("/", 1)[0], doc_id.rsplit("/", 1)[1]
        h = int(hostpart[4:8])
        j = int(fname[1:].split(".")[0])
        refs = [s["media_ref"] for s in spans_col[i] if s["kind"] != "text"]
        assert refs == expected_media_refs(corpus, h, j), doc_id
        checked += 1
    assert checked > 10

    # determinism: identical seq assignment + doc set across runs
    res2 = crawl(cfg, store, seeds=corpus.seeds(), num_shards=2)
    key = lambda t: sorted(zip(t.column("doc_id").to_pylist(), t.column("seq").to_pylist()))
    assert key(docs) == key(res2.docs)


@pytest.mark.usefixtures("ray_session")
def test_hot_host_skew_completes():
    corpus = SyntheticCorpus(n_hosts=4, n_docs=60, fanout=2, hot_share=0.5)
    store = SyntheticPageStore(corpus)
    res = crawl(
        CrawlConfig(origin=corpus.page_url(0, 0)),
        store,
        seeds=corpus.seeds(),
        num_shards=3,
    )
    hosts = res.docs.column("host").to_pylist()
    assert hosts.count("host0000.test") > 10  # hot host crawled
    assert res.metrics["seen_urls"] >= res.docs.num_rows


@pytest.mark.usefixtures("ray_session")
def test_crawl_with_spilled_seen_set():
    """End-to-end crawl with a tiny spill threshold: the frozen digest
    tier must preserve exact first-wins dedup (same doc set as the
    in-RAM run)."""
    corpus = SyntheticCorpus(n_hosts=2, n_docs=120, fanout=3, n_assets_per_host=4)
    store = SyntheticPageStore(corpus)
    cfg = CrawlConfig(origin=corpus.page_url(0, 0))
    base = crawl(cfg, store, seeds=corpus.seeds(), num_shards=2)
    spilled = crawl(cfg, store, seeds=corpus.seeds(), num_shards=2, spill_threshold=10)
    assert sorted(base.docs.column("doc_id").to_pylist()) == sorted(
        spilled.docs.column("doc_id").to_pylist()
    )
    assert spilled.metrics["dup_urls"] == base.metrics["dup_urls"]


@pytest.mark.usefixtures("ray_session")
def test_crawl_with_spilled_pending_and_ledger():
    """End-to-end crawl with tiny pending/ledger memory limits: every
    frontier tier overflows to disk chunks mid-crawl and the result is
    identical to the all-in-RAM run (VERDICT r1 items 4/6)."""
    corpus = SyntheticCorpus(n_hosts=2, n_docs=120, fanout=3, n_assets_per_host=4)
    store = SyntheticPageStore(corpus)
    cfg = CrawlConfig(origin=corpus.page_url(0, 0))
    base = crawl(cfg, store, seeds=corpus.seeds(), num_shards=2)
    spilled = crawl(
        cfg,
        store,
        seeds=corpus.seeds(),
        num_shards=2,
        spill_threshold=16,
        pending_mem_limit=8,
        ledger_mem_rows=8,
    )
    key = lambda t: sorted(
        zip(t.column("doc_id").to_pylist(), t.column("seq").to_pylist())
    )
    assert key(base.docs) == key(spilled.docs)
    assert sorted(base.ledger.column("url").to_pylist()) == sorted(
        spilled.ledger.column("url").to_pylist()
    )
    assert spilled.metrics["dup_urls"] == base.metrics["dup_urls"]


@pytest.mark.usefixtures("ray_session")
def test_politeness_crawl_with_spilled_pending():
    """Per-host release caps must hold across pending spill chunks."""
    corpus = SyntheticCorpus(n_hosts=3, n_docs=90, fanout=3, n_assets_per_host=2)
    store = SyntheticPageStore(corpus)
    cfg = CrawlConfig(origin=corpus.page_url(0, 0), delay=0.01)
    base = crawl(cfg, store, seeds=corpus.seeds(), num_shards=2)
    spilled = crawl(
        cfg, store, seeds=corpus.seeds(), num_shards=2, pending_mem_limit=4
    )
    assert sorted(base.docs.column("doc_id").to_pylist()) == sorted(
        spilled.docs.column("doc_id").to_pylist()
    )


@pytest.mark.usefixtures("ray_session")
def test_priority_crawl_same_set_html_first():
    """Priority queues (north_rule): with release precedence for .html,
    the crawl SET equals the FIFO run's (priority only re-times
    fetches), and within the capped sub-wave schedule every HTML page
    is fetched no later than the first asset of a later wave."""
    corpus = SyntheticCorpus(n_hosts=2, n_docs=60, fanout=3, n_assets_per_host=6)
    store = SyntheticPageStore(corpus)
    base = crawl(
        CrawlConfig(origin=corpus.page_url(0, 0)),
        store, seeds=corpus.seeds(), num_shards=2,
    )
    prio = crawl(
        CrawlConfig(
            origin=corpus.page_url(0, 0),
            priority_patterns=(r"\.html",),
        ),
        store, seeds=corpus.seeds(), num_shards=2,
        max_wave_entries=16, pending_mem_limit=8,
    )
    assert sorted(base.docs.column("doc_id").to_pylist()) == sorted(
        prio.docs.column("doc_id").to_pylist()
    )
    # per (shard-)wave: html entries appear before non-html within every
    # released wave batch (level 0 drains first)
    import collections
    by_wave = collections.defaultdict(list)
    for doc_id, seq, is_html in zip(
        prio.docs.column("doc_id").to_pylist(),
        prio.docs.column("seq").to_pylist(),
        prio.docs.column("is_html").to_pylist(),
    ):
        wave = seq >> 44  # _SEQ_SHARD_BITS + _SEQ_IDX_BITS
        by_wave[wave].append((seq, is_html))
    mixed = 0
    for wave, rows in by_wave.items():
        rows.sort()
        kinds = [h for _, h in rows]
        # once a wave's release hits level-1 entries, no level-0 (html)
        # entry may follow WITHIN the same shard's release sequence
        shard_rows = collections.defaultdict(list)
        for seq, h in rows:
            shard_rows[(seq >> 34) & 0x3FF].append(h)
        for ks in shard_rows.values():
            if False in ks and True in ks:
                mixed += 1
                assert ks == sorted(ks, reverse=True), (wave, ks)
    # the corpus layout must actually exercise mixed waves
    assert mixed > 0 or len(by_wave) > 1
