"""Twelfth-session operator pins: Holt linear-trend smoothing,
Benford first-digit audit, per-host closeness centrality,
resource-allocation link prediction, exact k-NN graph."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _write_events(tmp_path, days, values, etype="a"):
    n = len(days)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [d * 86_400_000_000 for d in days], pa.timestamp("us")
            ),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array([etype] * n, pa.string()),
            "value": pa.array(values, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")


@pytest.mark.usefixtures("ray_session")
class TestHolt:
    def test_linear_ramp_tracks_trend(self, tmp_path):
        """x_t = 100 + 200t cents: Holt's forecast converges onto the
        ramp (level ≈ x, trend ≈ 200) — replay the recursion literally
        and assert frame equality plus the convergence property."""
        from suckit_ray.pipelines.relops import events_holt

        days = list(range(12))
        _write_events(tmp_path, days, [1.0 + 2.0 * d for d in days])
        got = (
            events_holt(str(tmp_path))
            .to_pandas()
            .sort_values("day")
            .reset_index(drop=True)
        )

        def tdiv(a, b):
            q = a // b
            if q < 0 and q * b != a:
                q += 1
            return q

        lev = trend = 0
        for i, d in enumerate(days):
            x = 100 + 200 * d
            if i == 0:
                lev, trend = x, 0
            else:
                prev = lev
                lev = tdiv(x + lev + trend, 2)
                trend = tdiv((lev - prev) + trend, 2)
            row = got.iloc[i]
            assert (row["x_cents"], row["level_c"], row["trend_c"]) == (
                x,
                lev,
                trend,
            )
            assert row["forecast_c"] == lev + trend
        # converged: by the end the trend sits near the true slope
        # (truncation in both recursions biases it a few cents low)
        assert abs(got.iloc[-1]["trend_c"] - 200) <= 5

    def test_declining_series_negative_trend_truncates(self, tmp_path):
        """A falling series drives trend negative — the division must
        truncate toward zero (DuckDB //), not floor: engineered so a
        negative odd numerator appears in the trend recursion."""
        from suckit_ray.pipelines.relops import events_holt

        days = [0, 1, 2]
        # x = 1000, 3, 3 cents: l1=501 (trunc of 1003/2), trend1 =
        # trunc((501-1000)+0)/2 = trunc(-499/2) = -249 (floor is -250)
        _write_events(tmp_path, days, [10.0, 0.03, 0.03])
        got = (
            events_holt(str(tmp_path))
            .to_pandas()
            .sort_values("day")
            .reset_index(drop=True)
        )
        assert got.iloc[1]["level_c"] == 501
        assert got.iloc[1]["trend_c"] == -249  # -250 would mean floor


@pytest.mark.usefixtures("ray_session")
class TestBenford:
    def test_hand_counts_and_zero_digits(self, tmp_path):
        """All observations start with digit 1 (n=4): the other eight
        digits still contribute (0 − nP)² — exact terms by hand."""
        from suckit_ray.pipelines.relops import _BENFORD_NANO, events_benford

        _write_events(tmp_path, [0, 1, 2, 3], [1.0, 1.5, 0.1, 1999.99])
        got = (
            events_benford(str(tmp_path))
            .to_pandas()
            .sort_values("digit")
            .reset_index(drop=True)
        )
        assert list(got["digit"]) == list(range(1, 10))
        assert list(got["n_obs"]) == [4] + [0] * 8
        n = 4
        terms = {}
        for d, p in _BENFORD_NANO.items():
            o = 4 if d == 1 else 0
            terms[d] = ((o * 10**9 - n * p) ** 2 * 10**6) // (
                n * p * 10**9
            )
        assert list(got["term_micro"]) == [terms[d] for d in range(1, 10)]
        assert (got["chi2_micro"] == sum(terms.values())).all()

    def test_nonpositive_cents_excluded(self, tmp_path):
        """value rounding to 0 cents is not a significant digit."""
        from suckit_ray.pipelines.relops import events_benford

        _write_events(tmp_path, [0, 1], [0.001, 2.0])
        got = events_benford(str(tmp_path)).to_pandas()
        assert got["n_obs"].sum() == 1

    def test_benford_distributed_corpus_small_chi2(self, tmp_path):
        """A corpus whose digits follow Benford closely: chi2 far
        below the all-ones corpus' (sanity of the statistic)."""
        from suckit_ray.pipelines.relops import _BENFORD_NANO, events_benford

        vals = []
        for d, p in _BENFORD_NANO.items():
            vals += [float(d)] * max(1, round(p / 1e9 * 100))
        _write_events(tmp_path, list(range(len(vals))), vals)
        got = events_benford(str(tmp_path)).to_pandas()
        assert got["chi2_micro"].iloc[0] < 5_000_000  # chi2 < 5.0


def _page(host, j, targets):
    return {
        "doc_id": f"{host}//p{j}.html",
        "host": host,
        "is_html": True,
        "spans": [
            {"kind": "link", "text": "", "media_ref": f"p{t}.html", "offset": i}
            for i, t in enumerate(targets)
        ],
    }


@pytest.mark.usefixtures("ray_session")
class TestCloseness:
    def test_path_cycle_and_isolated(self):
        """Path host (exact hand distances, isolated page scores 0)
        and a 3-cycle host (self excluded even though reachable)."""
        import ray.data as rd

        from suckit_ray.pipelines.graph import closeness_from_docs

        rows = [
            _page("h", 0, [1]),
            _page("h", 1, [2]),
            _page("h", 2, [3]),
            _page("h", 3, []),
            _page("h", 4, []),  # isolated
        ]
        rows += [_page("g", j, [(j + 1) % 3]) for j in range(3)]
        got = (
            closeness_from_docs(rd.from_items(rows).repartition(3))
            .to_pandas()
            .set_index(["host", "page"])
            .sort_index()
        )
        # host h (m=5): 0 reaches {1,2,3} at d 1,2,3
        assert tuple(got.loc[("h", 0)]) == (3, 6, (9 * 10**6) // (6 * 4))
        assert tuple(got.loc[("h", 1)]) == (2, 3, (4 * 10**6) // (3 * 4))
        assert tuple(got.loc[("h", 2)]) == (1, 1, (1 * 10**6) // (1 * 4))
        assert tuple(got.loc[("h", 3)]) == (0, 0, 0)
        assert tuple(got.loc[("h", 4)]) == (0, 0, 0)
        # host g 3-cycle: each reaches the 2 OTHERS (d=1,2); the
        # length-3 cycle back to self does NOT count
        for j in range(3):
            assert tuple(got.loc[("g", j)]) == (2, 3, (4 * 10**6) // (3 * 2))


@pytest.mark.usefixtures("ray_session")
class TestResourceAllocation:
    def test_star_with_one_edge_closed(self):
        """Star 0—{1,2,3} plus edge 1→2: pair (1,2) has a common
        neighbor but IS an edge → dropped; (1,3) and (2,3) score
        1e9 // deg(0) = 1e9 // 3."""
        import ray.data as rd

        from suckit_ray.pipelines.graph import resource_allocation_from_docs

        rows = [
            _page("h", 0, [1, 2, 3]),
            _page("h", 1, [2]),
            _page("h", 2, []),
            _page("h", 3, []),
        ]
        got = (
            resource_allocation_from_docs(
                rd.from_items(rows).repartition(2), min_common=1
            )
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        assert [tuple(r) for r in got[["a", "b", "n_common", "ra_nano"]].to_numpy()] == [
            (1, 3, 1, 333_333_333),
            (2, 3, 1, 333_333_333),
        ]

    def test_shared_hub_degree_weights(self):
        """Two hubs of different degree: RA distinguishes them where
        a common-neighbor count cannot. z=0 (deg 4) and z=5 (deg 2)
        both connect 1 and 2 → ra = 1e9//4 + 1e9//2."""
        import ray.data as rd

        from suckit_ray.pipelines.graph import resource_allocation_from_docs

        rows = [
            _page("h", 0, [1, 2, 3, 4]),
            _page("h", 5, [1, 2]),
            _page("h", 1, []),
            _page("h", 2, []),
            _page("h", 3, []),
            _page("h", 4, []),
        ]
        got = (
            resource_allocation_from_docs(
                rd.from_items(rows).repartition(2), min_common=2
            )
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        # (1,2) via hubs {0 (deg 4), 5 (deg 2)}; (0,5) via leaves
        # {1, 2} (deg 2 each) — the non-adjacent hub pair scores too
        assert [
            tuple(r) for r in got[["a", "b", "n_common", "ra_nano"]].to_numpy()
        ] == [
            (0, 5, 2, 10**9 // 2 + 10**9 // 2),
            (1, 2, 2, 10**9 // 4 + 10**9 // 2),
        ]


@pytest.mark.usefixtures("ray_session")
class TestBetweenness:
    def test_path_and_diamond(self):
        """Path 0→1→2: bc(1) = 1e6 (the one (0,2) pair). Diamond
        0→{1,2}→3: σ_03 = 2, each middle node carries one path →
        (1·1e6)//2 each — the per-pair floor is visible."""
        import ray.data as rd

        from suckit_ray.pipelines.graph import betweenness_from_docs

        rows = [
            _page("p", 0, [1]),
            _page("p", 1, [2]),
            _page("p", 2, []),
            _page("d", 0, [1, 2]),
            _page("d", 1, [3]),
            _page("d", 2, [3]),
            _page("d", 3, []),
        ]
        got = (
            betweenness_from_docs(rd.from_items(rows).repartition(3))
            .to_pandas()
            .set_index(["host", "page"])["bc_micro"]
            .to_dict()
        )
        assert got == {
            ("p", 0): 0,
            ("p", 1): 1_000_000,
            ("p", 2): 0,
            ("d", 0): 0,
            ("d", 1): 500_000,
            ("d", 2): 500_000,
            ("d", 3): 0,
        }

    def test_cycle_symmetry(self):
        """Directed 4-cycle: node v is interior to the 3 ordered
        pairs whose unique shortest path crosses it (for v=1:
        (0,2), (0,3), (3,2)) → bc = 3e6 each, by symmetry."""
        import ray.data as rd

        from suckit_ray.pipelines.graph import betweenness_from_docs

        rows = [_page("c", j, [(j + 1) % 4]) for j in range(4)]
        got = betweenness_from_docs(rd.from_items(rows)).to_pandas()
        assert (got["bc_micro"] == 3_000_000).all()


@pytest.mark.usefixtures("ray_session")
class TestWalkCorpus:
    def test_deterministic_valid_walks(self):
        """Flagship sf0.001: 2 walks per page, every consecutive pair
        a real edge, full length (the formulaic graph has no dead
        ends), and bit-identical across runs."""
        from suckit_ray.pipelines.graph import crawl_walk_corpus

        got = (
            crawl_walk_corpus(SF)
            .to_pandas()
            .sort_values(["anchor", "walk_idx"])
            .reset_index(drop=True)
        )
        got2 = (
            crawl_walk_corpus(SF)
            .to_pandas()
            .sort_values(["anchor", "walk_idx"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, got2)
        assert len(got) == 1000  # 500 pages x 2 walks
        assert (got["n_steps"] == 4).all()
        # edge validity against the formulaic link set
        n_docs = 500
        sizes = [n_docs // 8 + (1 if h < n_docs % 8 else 0) for h in range(8)]
        ok = 0
        for _, r in got.iterrows():
            hops = r["path"].split(">")
            assert len(hops) == 5
            host = hops[0].split("/")[0]
            h = int(host[4:8])
            m = sizes[h]
            for x, y in zip(hops, hops[1:]):
                j = int(x.rsplit("/p", 1)[1].split(".")[0])
                k = int(y.rsplit("/p", 1)[1].split(".")[0])
                assert k in {
                    (2 * j + 1) % m,
                    (2 * j + 2) % m,
                    (5 * j + 3) % m,
                    (5 * j + 10) % m,
                }
                ok += 1
        assert ok == 4000

    def test_dead_end_stops(self):
        """Walks from a sink stay length 0; others stop at the sink."""
        import ray.data as rd

        from suckit_ray.pipelines.graph import walk_corpus_from_docs

        rows = [_page("h", 0, [1]), _page("h", 1, [])]
        got = walk_corpus_from_docs(
            rd.from_items(rows), walks_per_node=2, walk_len=3
        ).to_pandas()
        assert len(got) == 4
        by = got.set_index(["anchor", "walk_idx"])
        assert (by.loc[("h/p1.html",)]["n_steps"] == 0).all()
        assert (by.loc[("h/p0.html",)]["n_steps"] == 1).all()
        assert (
            by.loc[("h/p0.html",)]["path"] == "h/p0.html>h/p1.html"
        ).all()


@pytest.mark.usefixtures("ray_session")
class TestHardNegatives:
    def test_hand_triplets(self, tmp_path):
        """Four 2-d vectors, two labels: bests and the margin flag by
        hand; a label-singleton anchor drops out (no positive)."""
        import os

        from suckit_ray.pipelines import ann

        tbl = pa.table(
            {
                "vec_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                "embedding": pa.array(
                    [
                        [1.0, 0.0],        # L0
                        [1.0, 0.1],        # L0: pos of 0 (cos~0.995)
                        [1.0, 0.05],       # L1: hard neg of 0 (cos~0.9988)
                        [0.0, 1.0],        # L1
                        [-1.0, 0.0],       # L2 singleton -> dropped
                    ],
                    pa.list_(pa.float64()),
                ),
                "label": pa.array([0, 0, 1, 1, 2], pa.int64()),
            }
        )
        pq.write_table(tbl, os.path.join(tmp_path, "embeddings.parquet"))
        got = (
            ann.embeddings_hard_negatives(str(tmp_path), num_buckets=3)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        assert list(got["vec_id"]) == [0, 1, 2, 3]  # 4 dropped
        r0 = got.iloc[0]
        assert (r0["pos_id"], r0["neg_id"]) == (1, 2)
        # neg (0.9988) beats pos (0.9950) -> violation even at margin 0
        assert r0["neg_cos"] > r0["pos_cos"] and r0["violation"] == 1
        r3 = got.iloc[3]  # vec 3: pos=2 (cos~0.05), neg: best of L0/L2
        assert r3["pos_id"] == 2
        assert r3["violation"] == 1  # neg cos ~0.0999 > pos cos + margin


@pytest.mark.usefixtures("ray_session")
class TestSimrank:
    def test_hand_arithmetic(self):
        """Sibling pair under one parent: s = (4·1e6)//5 = 800000 at
        every iteration. Unbalanced in-sets: I(2)={0,1}, I(3)={0} →
        s = (4·1e6)//(5·2·1) = 400000 (parent 0 has no in-links, so
        deeper terms stay 0). Pairs with empty in-sets never appear."""
        import ray.data as rd

        from suckit_ray.pipelines.graph import simrank_from_docs

        rows = [
            _page("h", 0, [1, 2]),
            _page("h", 1, []),
            _page("h", 2, []),
            _page("g", 0, [2, 3]),
            _page("g", 1, [2]),
            _page("g", 2, []),
            _page("g", 3, []),
        ]
        got = (
            simrank_from_docs(rd.from_items(rows).repartition(2))
            .to_pandas()
            .set_index(["host", "a", "b"])["sim_micro"]
            .to_dict()
        )
        assert got == {("h", 1, 2): 800_000, ("g", 2, 3): 400_000}


@pytest.mark.usefixtures("ray_session")
class TestNeighborhoodHll:
    def test_small_graph_near_exact(self):
        """Path + star: tiny true balls — linear counting recovers
        them within ±1 and the run is deterministic."""
        import ray.data as rd

        from suckit_ray.pipelines.graph import neighborhood_from_docs

        rows = [_page("h", j, [j + 1] if j < 5 else []) for j in range(6)]
        rows += [_page("s", 0, [1, 2, 3, 4, 5])] + [
            _page("s", j, []) for j in range(1, 6)
        ]
        got = (
            neighborhood_from_docs(rd.from_items(rows), radius=4)
            .to_pandas()
            .set_index("node")["ball_est"]
            .to_dict()
        )
        got2 = (
            neighborhood_from_docs(rd.from_items(rows), radius=4)
            .to_pandas()
            .set_index("node")["ball_est"]
            .to_dict()
        )
        assert got == got2  # deterministic
        # true ≤4-hop ball sizes (incl. self): path 0..5 -> 5,5,4,3,2,1
        true = {
            "h.test/p0.html": 5,
            "h.test/p1.html": 5,
            "h.test/p2.html": 4,
            "h.test/p3.html": 3,
            "h.test/p4.html": 2,
            "h.test/p5.html": 1,
            "s.test/p0.html": 6,
        }
        for j in range(1, 6):
            true[f"s.test/p{j}.html"] = 1
        # compare by (host, page index) — independent of doc_id form
        by_host = {}
        for k, v in got.items():
            h2, p = k.rsplit("/p", 1)
            by_host[(h2.rstrip("/"), int(p.split(".")[0]))] = v
        want = {
            ("h", 0): 5,
            ("h", 1): 5,
            ("h", 2): 4,
            ("h", 3): 3,
            ("h", 4): 2,
            ("h", 5): 1,
            ("s", 0): 6,
            ("s", 1): 1,
            ("s", 2): 1,
            ("s", 3): 1,
            ("s", 4): 1,
            ("s", 5): 1,
        }
        for key, tv in want.items():
            assert abs(by_host[key] - tv) <= 1, (key, by_host[key], tv)

    def test_flagship_error_bound(self):
        """sf0.001: mean relative error vs the EXACT ≤4-hop ball
        (closure BFS on the formulaic per-host graph) within 3×SE."""
        from collections import deque

        from suckit_ray.pipelines.graph import crawl_neighborhood_est

        got = crawl_neighborhood_est(SF).to_pandas()
        # exact balls: 8 hosts, m pages each, links j->(2j+1,2j+2,
        # 5j+3,5j+10) mod m
        n_docs = 500
        sizes = [n_docs // 8 + (1 if h < n_docs % 8 else 0) for h in range(8)]
        exact = {}
        for h, m in enumerate(sizes):
            adj = [
                sorted({(2 * j + 1) % m, (2 * j + 2) % m,
                        (5 * j + 3) % m, (5 * j + 10) % m} - {j})
                for j in range(m)
            ]
            for s in range(m):
                dist = {s: 0}
                q = deque([s])
                while q:
                    u = q.popleft()
                    if dist[u] == 4:
                        continue
                    for v in adj[u]:
                        if v not in dist:
                            dist[v] = dist[u] + 1
                            q.append(v)
                exact[(f"host{h:04d}.test", s)] = len(dist)
        rel = []
        for _, r in got.iterrows():
            hpart, p = r["node"].rsplit("/p", 1)
            key = (hpart.split("/")[0], int(p.split(".")[0]))
            rel.append(abs(r["ball_est"] - exact[key]) / exact[key])
        assert len(rel) == 500
        assert float(np.mean(rel)) < 0.20  # 3x the 6.5% SE


@pytest.mark.usefixtures("ray_session")
class TestDistanceStats:
    def test_path_host_hand_values(self):
        """Path 0→1→2→3: 6 ordered pairs at distances 1,1,1,2,2,3 —
        median (2·cum ≥ 6) = 1, eff90 (10·cum ≥ 54) = 3, diameter 3."""
        import ray.data as rd

        from suckit_ray.pipelines.graph import distance_stats_from_docs

        rows = [_page("h", j, [j + 1] if j < 3 else []) for j in range(4)]
        got = distance_stats_from_docs(rd.from_items(rows)).to_pandas()
        r = got.iloc[0]
        assert (
            r["n_pages"],
            r["n_pairs"],
            r["median_dist"],
            r["eff_diameter_90"],
            r["diameter"],
        ) == (4, 6, 1, 3, 3)


@pytest.mark.usefixtures("ray_session")
class TestOpenBacklog:
    def test_hand_intervals(self, tmp_path):
        """Two orders: A open days [0,2] (ships d2), B open [1,1] —
        running count at delta days 0,1,2,3."""
        import pyarrow as pa
        import pyarrow.parquet as pq_

        from suckit_ray.pipelines.relops import orders_open_backlog

        DAY = 86_400_000_000
        pq_.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([1, 2], pa.int64()),
                    "o_custkey": pa.array([1, 1], pa.int64()),
                    "o_orderstatus": pa.array(["O", "O"], pa.string()),
                    "o_totalprice": pa.array([1.0, 1.0], pa.float64()),
                    "o_orderdate": pa.array([0, DAY], pa.timestamp("us")),
                    "o_orderpriority": pa.array(["1", "1"], pa.string()),
                }
            ),
            tmp_path / "orders.parquet",
        )
        pq_.write_table(
            pa.table(
                {
                    "l_orderkey": pa.array([1, 1, 2], pa.int64()),
                    "l_shipdate": pa.array(
                        [DAY, 2 * DAY, DAY], pa.timestamp("us")
                    ),
                }
            ),
            tmp_path / "lineitem.parquet",
        )
        got = (
            orders_open_backlog(str(tmp_path))
            .to_pandas()
            .sort_values("day")
            .reset_index(drop=True)
        )
        assert [tuple(r) for r in got.to_numpy()] == [
            (0, 1),
            (1, 2),
            (2, 1),
            (3, 0),
        ]


@pytest.mark.usefixtures("ray_session")
class TestKnnGraph:
    def _brute(self, ids, m, k):
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = 1.0
        mm = m / n[:, None]
        pct = np.floor(mm @ mm.T * 10_000).astype(np.int64)
        rows = []
        for i, v in enumerate(ids):
            cand = sorted(
                ((int(pct[i, j]), int(ids[j])) for j in range(len(ids)) if j != i),
                key=lambda t: (-t[0], t[1]),
            )[:k]
            rows += [(v, r + 1, nb, c) for r, (c, nb) in enumerate(cand)]
        return sorted(rows)

    def test_matches_brute_force_many_buckets(self):
        """num_buckets > sqrt(n) stresses the per-group prune: the
        union of per-pair-group top-k must still contain the global
        top-k (candidate-superset property)."""
        from suckit_ray.pipelines.ann import embeddings_knn_graph

        got = (
            embeddings_knn_graph(SF, k=3, num_buckets=11)
            .to_pandas()
            .sort_values(["vec_id", "rank"])
        )
        emb = pd.read_parquet(f"{SF}/embeddings.parquet")
        ids = emb["vec_id"].to_numpy().astype(np.int64)
        m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
        want = self._brute(ids, m, 3)
        assert [tuple(map(int, r)) for r in got.to_numpy()] == want

    def test_tiny_corpus_fewer_than_k(self):
        """n − 1 < k: every vector lists all others, ranks dense."""
        import ray.data as rd

        from suckit_ray.pipelines.ann import embeddings_knn_graph  # noqa: F401
        from suckit_ray.pipelines import ann

        # drive through the internal entry on a 3-row table
        import pyarrow as pa
        import pyarrow.parquet as pq_
        import tempfile, os

        d = tempfile.mkdtemp()
        tbl = pa.table(
            {
                "vec_id": pa.array([0, 1, 2], pa.int64()),
                "embedding": pa.array(
                    [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]],
                    pa.list_(pa.float64()),
                ),
                "label": pa.array([0, 0, 0], pa.int64()),
            }
        )
        pq_.write_table(tbl, os.path.join(d, "embeddings.parquet"))
        got = (
            ann.embeddings_knn_graph(d, k=5, num_buckets=4)
            .to_pandas()
            .sort_values(["vec_id", "rank"])
            .reset_index(drop=True)
        )
        assert len(got) == 6  # 3 vectors x 2 others
        # vec 0: cos(0,2)=0.7071 -> 7071, cos(0,1)=0 -> rank order 2,1
        v0 = got[got["vec_id"] == 0]
        assert list(v0["neighbor_id"]) == [2, 1]
        assert list(v0["cos_pct"]) == [7071, 0]
