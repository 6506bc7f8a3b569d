"""Cuckoo-filter pre-screen for the URL-seen set: filter-level
contracts (no false negatives, bounded FPP, delete, determinism,
checkpoint round-trip) and SpillableSet integration (bloom-parity
membership, growth rebuild, recrawl retirement surviving rebuilds)."""

import random

import numpy as np
import pytest

from suckit_ray.state.cuckoo import CuckooFilter
from suckit_ray.state.seenset import SpillableSet, url_digest128


def _digests(urls):
    d = [url_digest128(u) for u in urls]
    return (
        np.array([x[0] for x in d], dtype=np.uint64),
        np.array([x[1] for x in d], dtype=np.uint64),
    )


def test_filter_no_false_negatives_and_bounded_fpp():
    n = 50_000
    members = [f"https://h{i % 97}.test/p{i}.html" for i in range(n)]
    lo, hi = _digests(members)
    f = CuckooFilter(n)
    assert f.insert_many(lo, hi)
    # zero false negatives
    assert all(f.contains_digest(int(a), int(b)) for a, b in zip(lo, hi))
    # false-positive rate on disjoint URLs stays near the 2·b·2^-f bound
    others = [f"https://other{i}.test/x{i}.html" for i in range(n)]
    olo, ohi = _digests(others)
    fp = sum(f.contains_digest(int(a), int(b)) for a, b in zip(olo, ohi))
    assert fp / n < 0.01, f"FPP {fp/n:.4%}"


def test_filter_delete_and_determinism():
    urls = [f"https://d.test/{i}" for i in range(5_000)]
    lo, hi = _digests(urls)
    f1, f2 = CuckooFilter(5_000), CuckooFilter(5_000)
    assert f1.insert_many(lo, hi) and f2.insert_many(lo, hi)
    # same insert sequence -> identical table (no RNG)
    assert np.array_equal(f1.table, f2.table)
    # delete half, the rest stays, deleted are gone
    for a, b in zip(lo[:2_500], hi[:2_500]):
        assert f1.delete_digest(int(a), int(b))
    assert all(
        f1.contains_digest(int(a), int(b))
        for a, b in zip(lo[2_500:], hi[2_500:])
    )
    assert f1.count == 2_500
    # state round-trip preserves everything including the kick pointer
    g = CuckooFilter.from_state(f1.state())
    assert np.array_equal(g.table, f1.table) and g.count == f1.count


def test_spillable_set_cuckoo_parity_with_bloom():
    rng = random.Random(7)
    urls = [f"https://p{rng.randrange(400)}.test/{rng.randrange(3000)}" for _ in range(8_000)]
    a = SpillableSet(spill_threshold=500)
    b = SpillableSet(spill_threshold=500, filter_kind="cuckoo")
    for u in urls:
        assert a.insert_if_absent(u) == b.insert_if_absent(u)
    assert len(a) == len(b)
    assert b.frozen_lo, "spill threshold never crossed"
    probe = urls[::17] + [f"https://never{i}.test/" for i in range(200)]
    for u in probe:
        assert (u in a) == (u in b)


def test_spillable_set_cuckoo_growth_rebuild_and_retirement():
    s = SpillableSet(spill_threshold=100, filter_kind="cuckoo")
    waves = [
        [f"https://w{w}.test/p{i}" for i in range(100)] for w in range(6)
    ]
    for wave in waves:
        for u in wave:
            assert s.insert_if_absent(u)
    # 600 inserts through a filter first sized for ~200: the growth
    # rebuild ran; membership is still exact
    assert s.cuckoo is not None and s.cuckoo.count >= 500
    assert all(u in s for wave in waves for u in wave)

    # retire a frozen wave + some active URLs; membership flips off
    dead = waves[0] + waves[-1][:10]
    gone = s.retire_batch(dead)
    assert gone == len(dead)
    assert not any(u in s for u in dead)
    assert all(u in s for u in waves[1])
    # retired URLs can be re-learned (fresh insert accepted)
    assert s.insert_if_absent(dead[0])

    # retirement survives a filter rebuild (more freezes force growth)
    for w in range(6, 14):
        for i in range(100):
            s.insert_if_absent(f"https://w{w}.test/p{i}")
    assert not any(u in s for u in dead[1:])

    # checkpoint round-trip preserves kind, filter and retirements
    st = s.state()
    r = SpillableSet.from_state(st)
    assert r.filter_kind == "cuckoo"
    assert not any(u in r for u in dead[1:])
    assert all(u in r for u in waves[1])


def test_bloom_retire_frozen_raises():
    s = SpillableSet(spill_threshold=10)
    for i in range(25):
        s.insert_if_absent(f"https://b.test/{i}")
    assert s.frozen_lo
    # active-tier retirement is fine even on bloom
    s2 = SpillableSet(spill_threshold=1000)
    s2.insert_if_absent("https://b.test/x")
    assert s2.retire_batch(["https://b.test/x"]) == 1
    with pytest.raises(ValueError):
        s.retire_batch(["https://b.test/3"])


def test_frontier_shard_cuckoo_retire_then_recrawl():
    """A cuckoo-backed shard unlearns retired URLs: after retire_seen,
    the same URL is accepted as a fresh candidate again — the
    incremental-recrawl path for crawl_diff status='removed'."""
    from suckit_ray.state.frontier import FrontierShard

    sh = FrontierShard(0, 1, spill_threshold=5, seen_filter="cuckoo")

    def cand(seq, ordinal, url):
        return (seq, ordinal, url, "h.test", False, 0, 0)

    urls = [f"http://h.test/p{i}.html" for i in range(20)]
    sh.add_candidates([cand(1, i, u) for i, u in enumerate(urls)])
    sh.finalize_wave(1, max_depth=-1, max_ext_depth=0)
    assert sh.seen_count() == 20
    # re-adding is deduped
    sh.add_candidates([cand(2, 0, urls[3])])
    sh.finalize_wave(2, max_depth=-1, max_ext_depth=0)
    assert sh.seen_count() == 20

    assert sh.retire_seen(urls[:4]) == 4
    assert sh.seen_count() == 16
    # retired URLs are crawlable again; survivors stay deduped
    n_before = sh.released_count()
    sh.add_candidates([cand(3, 0, urls[0]), cand(3, 1, urls[10])])
    sh.finalize_wave(3, max_depth=-1, max_ext_depth=0)
    assert sh.seen_count() == 17
    assert sh.released_count() >= n_before


def test_retire_exact_under_fingerprint_collision():
    """The fingerprint delete alone can be masked by another live URL
    sharing the retired URL's (bucket, 16-bit fingerprint); the exact
    128-bit tombstone must make retirement a definite NO anyway."""
    # find two URLs colliding in (bucket, fp) for the nb=512 table a
    # 2-entry freeze builds (capacity max(4, 1024) -> 512 buckets)
    nb = 512
    seen: dict[tuple[int, int], str] = {}
    pair = None
    i = 0
    while pair is None:
        u = f"https://c.test/p{i}"
        lo, hi = url_digest128(u)
        key = (lo & (nb - 1), (hi % 0xFFFF) + 1)
        if key in seen and seen[key] != u:
            pair = (seen[key], u)
        seen[key] = u
        i += 1
        assert i < 500_000, "no collision found (unexpected)"

    u1, u2 = pair
    s = SpillableSet(spill_threshold=10**9, filter_kind="cuckoo")
    assert s.insert_if_absent(u1) and s.insert_if_absent(u2)
    s.state()  # forces the freeze: both URLs now live in the filter
    assert s.cuckoo is not None and s.cuckoo.nbuckets == nb
    assert u1 in s and u2 in s

    assert s.retire_batch([u1]) == 1
    assert u1 not in s, "collision masked the retirement"
    assert u2 in s, "collider was retired collaterally"
    # the retired URL is re-learnable, the collider stays deduped
    assert s.insert_if_absent(u1)
    assert not s.insert_if_absent(u2)


def test_insert_failure_rolls_back_eviction_chain():
    """A failed insert must leave the table exactly as it was — no
    member fingerprint may be dropped (no-false-negative contract)."""
    f = CuckooFilter(16, max_kicks=8)
    urls = [f"https://full.test/{i}" for i in range(2_000)]
    inserted = []
    failed_at = None
    for u in urls:
        lo, hi = url_digest128(u)
        before = f.table.copy()
        if f.insert_digest(lo, hi):
            inserted.append((lo, hi))
        else:
            failed_at = (lo, hi, before)
            break
    assert failed_at is not None, "filter never filled (unexpected)"
    # the failed insert changed NOTHING
    assert np.array_equal(f.table, failed_at[2])
    # and every previously inserted member is still present
    assert all(f.contains_digest(a, b) for a, b in inserted)


@pytest.mark.usefixtures("ray_session")
def test_crawl_with_cuckoo_seen_filter_matches_bloom():
    """Full crawl through the engine with seen_filter='cuckoo': the
    mirrored doc set must equal the default-bloom crawl exactly."""

    from suckit_ray.config import CrawlConfig
    from suckit_ray.pipelines.crawl import crawl
    from suckit_ray.sources.pagestore import SyntheticCorpus, SyntheticPageStore

    corpus = SyntheticCorpus(n_hosts=3, n_docs=600, fanout=4)
    res = {}
    for kind in ("bloom", "cuckoo"):
        r = crawl(
            CrawlConfig(origin=corpus.page_url(0, 0), seen_filter=kind),
            SyntheticPageStore(corpus),
            seeds=corpus.seeds(),
            num_shards=3,
            spill_threshold=50,  # force the frozen tier + filter
        )
        res[kind] = {
            "pages": r.metrics["pages"],
            "seen": r.metrics["seen_urls"],
            "docs": sorted(r.docs.to_pandas()["doc_id"]),
        }
    assert res["bloom"] == res["cuckoo"]
    assert res["bloom"]["pages"] > 0
