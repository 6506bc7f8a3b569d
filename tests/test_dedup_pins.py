"""Pinned-rows regression for the deterministic-but-approximate
operators: sf0.001 output pinned by md5 of the sorted row tuples.
Round 3 gave minhash/simhash full DuckDB oracles (md5-derived hashes,
checked at sf0.01 by the driver); these pins remain as fast
regressions at sf0.001. The MINHASH pin survived the crc32→md5 hash
swap unchanged — the verified output is the true-Jaccard pair set
(string-shingle math, hash-independent) intersected with the banding
candidates, and banding catches all 28 pairs under both hash
families. The SIMHASH pin is the fingerprint itself, regenerated for
the md5 token hash."""

import hashlib

import pytest

SF = "/root/testdata/sf0.001"

MINHASH_PIN = (28, "fbeaebb93539c5b7739e97223d15467d")
IVF_PIN = (100, "459f6de7074f64c0721af3b356ea694a")
SIMHASH_PIN = (500, "06418ec9105ee43e0b00e25f114f8c29")


def _pin(tbl) -> tuple[int, str]:
    rows = sorted(tuple(r.values()) for r in tbl.to_pylist())
    return len(rows), hashlib.md5(str(rows).encode()).hexdigest()


@pytest.mark.usefixtures("ray_session")
def test_minhash_lsh_pairs_pinned():
    from suckit_ray.pipelines import dedup

    assert _pin(dedup.minhash_lsh_pairs(SF)) == MINHASH_PIN


@pytest.mark.usefixtures("ray_session")
def test_ivf_topk_pinned():
    from suckit_ray.pipelines import ann

    assert _pin(ann.ivf_topk(SF)) == IVF_PIN


@pytest.mark.usefixtures("ray_session")
def test_simhash_pinned():
    import pyarrow as pa

    from suckit_ray.pipelines import dedup

    tbl = pa.Table.from_pandas(dedup.simhash(SF).to_pandas())
    assert _pin(tbl) == SIMHASH_PIN


@pytest.mark.usefixtures("ray_session")
def test_simhash_dup_pairs_equals_brute_force():
    """Pigeonhole guarantee: the 4x16-bit multi-table LSH candidate
    generation is EXACT for hamming <= 3, so the distributed result
    must equal the O(n^2) brute force."""
    import numpy as np

    from suckit_ray.pipelines import dedup

    got = [
        (r["a_id"], r["b_id"], r["hamming"])
        for r in dedup.simhash_dup_pairs(SF).to_pylist()
    ]

    sig = dedup.simhash(SF).to_pandas().sort_values("doc_id")
    ids = sig["doc_id"].to_numpy()
    sh = sig["simhash"].to_numpy(dtype=np.int64).view(np.uint64)
    ii, jj = np.triu_indices(len(ids), k=1)
    ham = dedup._popcount64(sh[ii] ^ sh[jj])
    keep = ham <= dedup.HAMMING_K
    want = sorted(
        (int(ids[i]), int(ids[j]), int(h))
        for i, j, h in zip(ii[keep], jj[keep], ham[keep])
    )
    assert got == want


def _global_cosine_pairs(sf_dir, threshold):
    """O(n²) brute-force reference: ALL pairs with cosine ≥ threshold,
    regardless of label or cell."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.array(t.column("vec_id").to_pylist())
    m = np.stack([np.array(e) for e in t.column("embedding").to_pylist()]).astype(
        np.float64
    )
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    mn = m / n[:, None]
    cos = mn @ mn.T
    ii, jj = np.triu_indices(len(ids), k=1)
    keep = cos[ii, jj] >= threshold
    return set(zip(ids[ii[keep]].tolist(), ids[jj[keep]].tolist()))


@pytest.mark.usefixtures("ray_session")
def test_embedding_ivf_recall_and_precision():
    """Multi-probe quantizer-cell blocking: precision 1.0 by
    construction (cells only limit which pairs are compared), recall
    vs GLOBAL brute force ≥ 0.7 at the default nprobe=3 (measured
    0.83 on this corpus; single-cell assignment measures 0.27)."""
    from suckit_ray.pipelines import dedup

    global_pairs = _global_cosine_pairs(SF, dedup.COSINE_THRESHOLD)
    assert global_pairs
    ivf = set(
        map(
            tuple,
            dedup.embedding_dup_pairs_ivf(SF)
            .to_pandas()[["a_id", "b_id"]]
            .values.tolist(),
        )
    )
    assert ivf <= global_pairs  # no false positives
    assert len(ivf & global_pairs) / len(global_pairs) >= 0.7


@pytest.mark.usefixtures("ray_session")
def test_minhash_shuffled_variant_equals_broadcast():
    """The zero-driver-state shuffle-join verify must produce exactly
    the broadcast path's pairs (hash-set vs string-set Jaccard only
    diverges under crc32 collisions, absent here)."""
    from suckit_ray.pipelines import dedup

    shuffled = dedup.minhash_lsh_pairs_shuffled(SF)
    assert dedup.minhash_lsh_pairs(SF).to_pylist() == shuffled.to_pylist()
    assert _pin(shuffled) == MINHASH_PIN
    # auto-cutover (round 3): broadcast_limit=0 forces the runtime
    # route to the shuffled verify — same output, one code path chosen
    # on candidate count instead of by docstring
    assert dedup.minhash_lsh_pairs(SF, broadcast_limit=0).to_pylist() == (
        shuffled.to_pylist()
    )


@pytest.mark.usefixtures("ray_session")
def test_hll_distinct_error_bound():
    """HLL sketch distinct counts stay within 3x the p=12 standard
    error (~1.6%) of the exact two-phase distinct."""
    from suckit_ray.pipelines import relops

    exact = {
        r["event_type"]: r["n_users"]
        for r in relops.events_distinct_users(SF).to_pandas().to_dict("records")
    }
    est = {
        r["event_type"]: r["n_users_est"]
        for r in relops.events_distinct_users_hll(SF).to_pylist()
    }
    assert set(exact) == set(est)
    for et, n in exact.items():
        assert abs(est[et] - n) / max(1, n) <= 0.05, (et, n, est[et])


def test_hll_kernel_accuracy():
    """Pure-kernel check on a known cardinality, incl. merge."""
    import numpy as np

    from suckit_ray.stages.sketch import hll_estimate, hll_merge, hll_partial

    vals = np.arange(100_000, dtype=np.uint64)
    a = hll_partial(vals[:60_000])
    b = hll_partial(vals[40_000:])  # overlap: merge must not double-count
    est = hll_estimate(hll_merge([a.tobytes(), b.tobytes()]))
    assert abs(est - 100_000) / 100_000 < 0.05


def test_cc_labels_distributed_equals_union_find():
    """Round-3: near_dup_clusters' connected components run as
    distributed min-label propagation (_cc_labels) — verify against a
    driver union-find on a graph with a diameter-3 chain (multiple
    propagation rounds), a clique, an isolated edge, and on the real
    sf0.001 near-dup pair graph."""
    import pyarrow as pa

    import ray.data as rd
    from suckit_ray.pipelines.dedup import (
        _cc_labels,
        near_dup_clusters,
        ngram_jaccard_pairs,
    )

    edges = pa.table(
        {
            "a_id": pa.array([2, 3, 4, 10, 10, 11, 20], pa.int64()),
            "b_id": pa.array([1, 2, 3, 11, 12, 12, 21], pa.int64()),
        }
    )
    labels = _cc_labels(rd.from_arrow(edges)).to_pandas()
    got = dict(zip(labels["node"], labels["label"]))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    # empty edge set → empty labels (all-singleton assignment downstream)
    empty = pa.table(
        {"a_id": pa.array([], pa.int64()), "b_id": pa.array([], pa.int64())}
    )
    assert _cc_labels(rd.from_arrow(empty)).count() == 0

    # real pair graph, BOTH cutover routes (late round 3: pair counts
    # under CC_DRIVER_PAIR_LIMIT take a bounded driver union-find, the
    # propagation path stays the scale route) == reference union-find
    out = near_dup_clusters(SF).to_pandas()  # driver route at sf0.001
    out_prop = near_dup_clusters(SF, cc_driver_limit=0).to_pandas()
    assert sorted(map(tuple, out.to_numpy())) == sorted(
        map(tuple, out_prop.to_numpy())
    )
    pairs = ngram_jaccard_pairs(SF)
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs.column("a_id").to_pylist(), pairs.column("b_id").to_pylist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    assert dict(zip(out["doc_id"], out["cluster_id"])) == {
        int(d): find(int(d)) for d in out["doc_id"]
    }
    assert (out["doc_id"] != out["cluster_id"]).sum() > 0  # corpus has dups


def test_cms_kernel_overestimate_bound():
    """CMS point estimates never underestimate, and overestimate by at
    most e/width * N for every key (deterministic seeded hashing)."""
    import numpy as np

    from suckit_ray.stages.sketch import CMS_W, cms_estimate, cms_merge, cms_partial

    rng = np.random.RandomState(3)
    keys = rng.zipf(1.5, size=20000).astype(np.uint64)  # skewed stream
    half = len(keys) // 2
    reg = cms_merge(
        [cms_partial(keys[:half]).tobytes(), cms_partial(keys[half:]).tobytes()]
    )
    uniq, true = np.unique(keys, return_counts=True)
    est = cms_estimate(reg, uniq)
    assert (est >= true).all()  # never under
    assert (est - true).max() <= np.e / CMS_W * len(keys) * 2  # ε bound (2x slack)


def test_events_top_users_cms_vs_exact():
    """The CMS heavy-hitter path must (a) never under-count, and
    (b) recover most of the exact top-k set."""
    import numpy as np

    from suckit_ray.pipelines.relops import events_top_users, events_top_users_cms

    exact = events_top_users(SF).to_pandas()
    approx = events_top_users_cms(SF).to_pandas()
    true_counts = dict(zip(exact["user_id"], exact["n_events"]))
    est_counts = dict(zip(approx["user_id"], approx["n_events_est"]))
    for u, n in true_counts.items():
        if u in est_counts:
            assert est_counts[u] >= n  # CMS never underestimates
    overlap = len(set(exact["user_id"]) & set(approx["user_id"])) / len(exact)
    assert overlap >= 0.6, overlap


def test_ann_lsh_recall_vs_brute_force():
    from suckit_ray.pipelines.ann import brute_force_topk, lsh_topk

    exact = brute_force_topk(SF).to_pandas()
    approx = lsh_topk(SF).to_pandas()
    # precision 1.0 by construction (LSH only limits which rows are
    # scored); recall vs the exact baseline must clear the bar
    exact_pairs = set(zip(exact["query_id"], exact["neighbor_id"]))
    got_pairs = set(zip(approx["query_id"], approx["neighbor_id"]))
    recall = len(exact_pairs & got_pairs) / len(exact_pairs)
    assert recall >= 0.7, recall  # measured 0.83 at 8 planes × 16 tables
    # determinism
    again = lsh_topk(SF).to_pandas()
    assert again.equals(approx)


def test_cc_labels_pointer_jumping_on_long_chain():
    """Adversarial chain components: after jump_after propagation
    rounds, pointer-jumping (label(n) <- label(label(n))) kicks in and
    convergence becomes O(log d) instead of O(d) rounds."""
    import pyarrow as pa

    import ray.data as rd
    from suckit_ray.pipelines.dedup import _cc_labels

    N = 41  # path graph 0-1-...-40, diameter 40
    edges = pa.table(
        {
            "a_id": pa.array(list(range(1, N)), pa.int64()),
            "b_id": pa.array(list(range(0, N - 1)), pa.int64()),
        }
    )
    stats: dict = {}
    labels = _cc_labels(rd.from_arrow(edges), stats=stats).to_pandas()
    assert (labels["label"] == 0).all()
    assert stats["rounds"] <= 12, stats  # plain propagation would need 40

    # clique-ish components never pay the jump shuffle
    cl = pa.table(
        {"a_id": pa.array([10, 10, 11], pa.int64()), "b_id": pa.array([11, 12, 12], pa.int64())}
    )
    s2: dict = {}
    _cc_labels(rd.from_arrow(cl), stats=s2)
    assert s2["rounds"] <= 2


@pytest.mark.usefixtures("ray_session")
def test_cc_labels_path_graph_converges_past_noop_jump():
    """Regression: a diameter-5 path whose propagation still changes
    labels in the round where the pointer-jump is a no-op — the jump
    phase's reduce_min used to overwrite the propagation's chg flags,
    terminating one round early and splitting the component."""
    import pyarrow as pa

    import ray.data as rd
    from suckit_ray.pipelines.dedup import _cc_labels

    edges = pa.table(
        {
            "a_id": pa.array([0, 5, 6, 7, 8], pa.int64()),
            "b_id": pa.array([5, 6, 7, 8, 1], pa.int64()),
        }
    )
    labels = _cc_labels(rd.from_arrow(edges)).to_pandas()
    got = dict(zip(labels["node"], labels["label"]))
    assert got == {0: 0, 1: 0, 5: 0, 6: 0, 7: 0, 8: 0}


def test_incremental_dedup_engineered_duplicates(tmp_path):
    # the sf corpora have no exact duplicates, so the oracle alone
    # never exercises the anti-join — engineer all three cases:
    # new-dup-of-old (drop), new-dup-within-new (keep min), unique new
    import pyarrow as pa
    import pyarrow.parquet as pq

    from suckit_ray.pipelines import dedup

    rows = [
        (0, "shared old/new"),     # old
        (2, "old only"),           # old
        (1, "shared old/new"),     # new, dup of old -> dropped
        (3, "twin"),               # new, min of the twins -> kept
        (5, "twin"),               # new, dup within new -> dropped
        (7, "fresh"),              # unique new -> kept
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array(["en"] * len(rows)),
                "source": pa.array(["t"] * len(rows)),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = dedup.docs_incremental_dedup(str(tmp_path)).to_pandas()
    assert sorted(out["doc_id"]) == [3, 7]
