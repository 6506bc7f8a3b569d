"""Fifteenth-session operator pins: grouped OLS, ABC classification,
Mann-Whitney rank-sum drift, Kaplan-Meier retention survival, Haar
multi-resolution decomposition, vocabulary growth, directed triangle
motifs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _write_events(tmp_path, rows, users=None):
    """rows: list of (day:int, etype:str, value:float)."""
    n = len(rows)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [d * 86_400_000_000 for d, _, _ in rows], pa.timestamp("us")
            ),
            "user_id": pa.array(
                users if users is not None else [1] * n, pa.int64()
            ),
            "event_type": pa.array([t for _, t, _ in rows], pa.string()),
            "value": pa.array([v for _, _, v in rows], pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")


@pytest.mark.usefixtures("ray_session")
class TestGroupRegression:
    def test_two_point_exact_line(self, tmp_path):
        """x=[0,10] percent units, y=[1.00, 3.00] dollars: slope
        20 c/unit (micro 20e6), intercept 100 c — exact closed form."""
        tbl = pa.table(
            {
                "l_returnflag": pa.array(["A", "A"], pa.string()),
                "l_linestatus": pa.array(["F", "F"], pa.string()),
                "l_discount": pa.array([0.00, 0.10], pa.float64()),
                "l_extendedprice": pa.array([1.00, 3.00], pa.float64()),
            }
        )
        pq.write_table(tbl, tmp_path / "lineitem.parquet")
        from suckit_ray.pipelines.relops import lineitem_group_regression

        got = lineitem_group_regression(str(tmp_path)).to_pandas()
        assert len(got) == 1
        assert int(got["n"].iloc[0]) == 2
        assert int(got["slope_micro"].iloc[0]) == 20_000_000
        assert int(got["intercept_c"].iloc[0]) == 100

    def test_constant_x_degenerate(self, tmp_path):
        tbl = pa.table(
            {
                "l_returnflag": pa.array(["A"] * 3, pa.string()),
                "l_linestatus": pa.array(["F"] * 3, pa.string()),
                "l_discount": pa.array([0.05] * 3, pa.float64()),
                "l_extendedprice": pa.array([1.0, 2.0, 3.0], pa.float64()),
            }
        )
        pq.write_table(tbl, tmp_path / "lineitem.parquet")
        from suckit_ray.pipelines.relops import lineitem_group_regression

        got = lineitem_group_regression(str(tmp_path)).to_pandas()
        assert int(got["slope_micro"].iloc[0]) == 0
        assert int(got["intercept_c"].iloc[0]) == 0

    def test_matches_float_replay_on_sf(self):
        from suckit_ray.pipelines.relops import lineitem_group_regression

        got = (
            lineitem_group_regression(SF)
            .to_pandas()
            .set_index(["l_returnflag", "l_linestatus"])
        )
        li = pd.read_parquet(
            f"{SF}/lineitem.parquet",
            columns=[
                "l_returnflag",
                "l_linestatus",
                "l_discount",
                "l_extendedprice",
            ],
        )
        li["x"] = (li["l_discount"] * 100).round().astype("int64")
        li["y"] = (li["l_extendedprice"] * 100).round().astype("int64")
        for (f, s), g in li.groupby(["l_returnflag", "l_linestatus"]):
            n = len(g)
            sx, sy = int(g["x"].sum()), int(g["y"].sum())
            sxy = int((g["x"] * g["y"]).sum())
            sxx = int((g["x"] ** 2).sum())
            den = n * sxx - sx * sx
            num = n * sxy - sx * sy
            want = (1 if num >= 0 else -1) * (abs(num) * 1_000_000 // den)
            assert int(got.loc[(f, s), "slope_micro"]) == want
            # floored-integer slope within 1 micro of the float fit
            beta = num / den
            assert abs(int(got.loc[(f, s), "slope_micro"]) - beta * 1e6) <= 1


@pytest.mark.usefixtures("ray_session")
class TestAbcClass:
    def _orders(self, tmp_path, rows):
        """rows: (orderkey, custkey, totalprice)."""
        tbl = pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
                "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
                "o_orderdate": pa.array(
                    [0] * len(rows), pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(
                    ["1-URGENT"] * len(rows), pa.string()
                ),
            }
        )
        pq.write_table(tbl, tmp_path / "orders.parquet")

    def test_threshold_boundaries_inclusive(self, tmp_path):
        """cum shares land EXACTLY on 80% and 95%: both inclusive."""
        self._orders(
            tmp_path, [(1, 10, 0.80), (2, 11, 0.15), (3, 12, 0.05)]
        )
        from suckit_ray.pipelines.relops import orders_abc_class

        got = (
            orders_abc_class(str(tmp_path))
            .to_pandas()
            .sort_values("rn")
            .reset_index(drop=True)
        )
        assert list(got["custkey"]) == [10, 11, 12]
        assert list(got["abc_class"]) == ["A", "B", "C"]
        assert list(got["cum_c"]) == [80, 95, 100]

    def test_ties_break_on_custkey(self, tmp_path):
        self._orders(
            tmp_path, [(1, 20, 1.0), (2, 7, 1.0), (3, 13, 1.0)]
        )
        from suckit_ray.pipelines.relops import orders_abc_class

        got = (
            orders_abc_class(str(tmp_path))
            .to_pandas()
            .sort_values("rn")
            .reset_index(drop=True)
        )
        assert list(got["custkey"]) == [7, 13, 20]
        assert list(got["rn"]) == [1, 2, 3]

    def test_matches_pandas_replay_on_sf(self):
        from suckit_ray.pipelines.relops import orders_abc_class

        got = (
            orders_abc_class(SF)
            .to_pandas()
            .sort_values("rn")
            .reset_index(drop=True)
        )
        od = pd.read_parquet(
            f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        od["rev"] = (od["o_totalprice"] * 100).round().astype("int64")
        r = (
            od.groupby("o_custkey", as_index=False)["rev"]
            .sum()
            .sort_values(["rev", "o_custkey"], ascending=[False, True])
            .reset_index(drop=True)
        )
        tot = int(r["rev"].sum())
        cum = r["rev"].cumsum()
        want_cls = np.where(
            100 * cum <= 80 * tot,
            "A",
            np.where(100 * cum <= 95 * tot, "B", "C"),
        )
        assert list(got["custkey"]) == list(r["o_custkey"])
        assert list(got["cum_c"]) == list(cum)
        assert list(got["abc_class"]) == list(want_cls)
        # every class present and monotone A..C in rank order
        s = "".join(got["abc_class"])
        assert s == "".join(sorted(s))


@pytest.mark.usefixtures("ray_session")
class TestScd2:
    def test_engineered_history(self, tmp_path):
        """User 1: A,A,B,A — three islands; user 2: single open C."""
        rows = [
            (0, "A", 1.0),
            (1, "A", 1.0),
            (2, "B", 1.0),
            (3, "A", 1.0),
            (5, "C", 1.0),
        ]
        _write_events(tmp_path, rows, users=[1, 1, 1, 1, 2])
        from suckit_ray.pipelines.relops import events_scd2

        got = (
            events_scd2(str(tmp_path))
            .to_pandas()
            .sort_values(["user_id", "version"])
            .reset_index(drop=True)
        )
        D = 86_400_000_000
        exp = pd.DataFrame(
            {
                "user_id": [1, 1, 1, 2],
                "version": [1, 2, 3, 1],
                "event_type": ["A", "B", "A", "C"],
                "valid_from_us": [0, 2 * D, 3 * D, 5 * D],
                "valid_to_us": [2 * D, 3 * D, -1, -1],
            }
        )
        pd.testing.assert_frame_equal(got.astype(exp.dtypes), exp)

    def test_same_ts_tiebreak_on_event_id(self, tmp_path):
        """Two events at the SAME timestamp: event_id orders them, so
        the type at the higher event_id starts the later island."""
        rows = [(0, "A", 1.0), (0, "B", 1.0)]
        _write_events(tmp_path, rows, users=[1, 1])
        from suckit_ray.pipelines.relops import events_scd2

        got = (
            events_scd2(str(tmp_path))
            .to_pandas()
            .sort_values("version")
            .reset_index(drop=True)
        )
        assert list(got["event_type"]) == ["A", "B"]
        assert list(got["valid_to_us"]) == [0, -1]

    def test_intervals_partition_user_history_on_sf(self):
        """On the real table: per user, intervals abut exactly (each
        valid_to equals the next valid_from), versions are 1..k, and
        exactly one open record exists per user."""
        from suckit_ray.pipelines.relops import events_scd2

        got = events_scd2(SF).to_pandas()
        for uid, g in got.groupby("user_id"):
            g = g.sort_values("version").reset_index(drop=True)
            assert list(g["version"]) == list(range(1, len(g) + 1))
            assert (g["valid_to_us"].iloc[-1]) == -1
            assert (g["valid_to_us"].iloc[:-1] >= 0).all()
            assert (
                g["valid_to_us"].iloc[:-1].to_numpy()
                == g["valid_from_us"].iloc[1:].to_numpy()
            ).all()
            # consecutive records always change type (islands maximal)
            et = g["event_type"].to_numpy()
            assert (et[1:] != et[:-1]).all()


@pytest.mark.usefixtures("ray_session")
class TestBootstrapCi:
    def test_matches_pure_python_replay(self):
        import hashlib

        import duckdb

        from suckit_ray.pipelines.relops import (
            BOOTSTRAP_B,
            events_bootstrap_ci,
        )

        got = events_bootstrap_ci(SF).to_pandas().set_index("b")["mean_c"]
        daily = (
            duckdb.sql(
                f"""
                SELECT epoch_us(ts) // 86400000000 AS day,
                       SUM(CAST(round(value * 100) AS BIGINT)) AS t
                FROM read_parquet('{SF}/events.parquet')
                GROUP BY 1 ORDER BY 1
                """
            )
            .df()["t"]
            .astype("int64")
            .tolist()
        )
        n = len(daily)
        for b in (1, 7, BOOTSTRAP_B):
            s = sum(
                daily[
                    int(
                        hashlib.md5(f"{b}:{j}".encode()).hexdigest()[:15],
                        16,
                    )
                    % n
                ]
                for j in range(n)
            )
            assert int(got[b]) == s // n  # positive sums: floor==trunc

    def test_ci_brackets_point_estimate(self):
        """The empirical 5–95% band of the bootstrap means contains
        the full-sample mean (it must, for an unskewed resample)."""
        import duckdb

        from suckit_ray.pipelines.relops import events_bootstrap_ci

        means = sorted(events_bootstrap_ci(SF).to_pandas()["mean_c"])
        point = int(
            duckdb.sql(
                f"""
                WITH d AS (
                  SELECT epoch_us(ts) // 86400000000 AS day,
                         SUM(CAST(round(value * 100) AS BIGINT)) AS t
                  FROM read_parquet('{SF}/events.parquet') GROUP BY 1
                )
                SELECT SUM(t) // COUNT(*) FROM d
                """
            ).fetchone()[0]
        )
        lo = means[(5 * (len(means) - 1)) // 100]
        hi = means[(95 * (len(means) - 1)) // 100]
        assert lo <= point <= hi
        assert lo < hi  # non-degenerate distribution

    def test_empty_table(self, tmp_path):
        _write_events(tmp_path, [])
        from suckit_ray.pipelines.relops import events_bootstrap_ci

        got = events_bootstrap_ci(str(tmp_path))
        assert got.num_rows == 0


@pytest.mark.usefixtures("ray_session")
class TestSilhouette:
    def test_matches_numpy_reference(self):
        from suckit_ray.pipelines.ann import embeddings_silhouette

        got = (
            embeddings_silhouette(SF)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        tb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
        m = np.stack(tb["embedding"].to_numpy()).astype(np.float64)
        q = np.floor(m * 1_000_000).astype(np.int64)
        lab = tb["label"].astype("int64").to_numpy()
        labels = sorted(set(lab.tolist()))

        def tdiv(a, b):
            r = a // b
            if r < 0 and r * b != a:
                r += 1
            return r

        C = np.stack(
            [
                np.array(
                    [
                        tdiv(int(s), int((lab == l).sum()))
                        for s in q[lab == l].sum(axis=0)
                    ]
                )
                for l in labels
            ]
        )
        tb = tb.sort_values("vec_id").reset_index(drop=True)
        order = np.argsort(
            pq.read_table(f"{SF}/embeddings.parquet")
            .to_pandas()["vec_id"]
            .to_numpy()
        )
        q, lab = q[order], lab[order]
        for i in range(0, len(q), 97):  # sampled rows, exact replay
            d = ((q[i][None, :] - C) ** 2).sum(axis=1)
            own_i = labels.index(int(lab[i]))
            a = int(d[own_i])
            b, bo = min(
                (int(d[j]), labels[j])
                for j in range(len(labels))
                if j != own_i
            )
            mx = max(a, b)
            sil = (
                0
                if mx == 0
                else (1 if b >= a else -1) * ((10**6 * abs(b - a)) // mx)
            )
            row = got.iloc[i]
            assert int(row["label"]) == int(lab[i])
            assert int(row["best_other"]) == bo
            assert int(row["sil_micro"]) == sil

    def test_separated_clusters_score_positive(self, tmp_path):
        """Two tight, well-separated clusters: every silhouette is
        strongly positive; a point planted AT the other centroid
        scores negative."""
        vecs = (
            [[1.0, 0.0, 0.0]] * 4
            + [[0.9, 0.1, 0.0]] * 4
            + [[0.0, 1.0, 0.0]] * 8
            + [[0.0, 1.0, 0.0]]  # label-0 traitor at cluster 1's mean
        )
        labs = [0] * 8 + [1] * 8 + [0]
        tbl = pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(
                    vecs, pa.list_(pa.float32())
                ),
                "label": pa.array(labs, pa.int32()),
            }
        )
        pq.write_table(tbl, tmp_path / "embeddings.parquet")
        from suckit_ray.pipelines.ann import embeddings_silhouette

        got = (
            embeddings_silhouette(str(tmp_path))
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        assert (got["sil_micro"].iloc[:16] > 0).all()
        assert int(got["sil_micro"].iloc[16]) < 0
        assert int(got["best_other"].iloc[16]) == 1


@pytest.mark.usefixtures("ray_session")
class TestMannWhitney:
    def test_matches_pandas_average_ranks(self):
        """Replay U with pandas rank(method='average') on the real
        table — doubled to compare against the integer u2."""
        import duckdb

        from suckit_ray.pipelines.relops import events_mannwhitney

        got = events_mannwhitney(SF).to_pandas()
        ev = duckdb.sql(
            f"""SELECT event_type, CAST(round(value*100) AS BIGINT) v
                FROM read_parquet('{SF}/events.parquet')"""
        ).df()
        for _, row in got.iterrows():
            a = ev[ev["event_type"] == row["type_a"]]["v"]
            b = ev[ev["event_type"] == row["type_b"]]["v"]
            merged = pd.concat([a, b], ignore_index=True)
            ranks = merged.rank(method="average")
            ra = float(ranks.iloc[: len(a)].sum())
            u_a = ra - len(a) * (len(a) + 1) / 2
            assert int(row["n_a"]) == len(a)
            assert int(row["n_b"]) == len(b)
            assert int(row["u2_a"]) == int(round(2 * u_a))
            assert int(row["u2_a"]) + int(row["u2_b"]) == 2 * len(a) * len(b)

    def test_disjoint_distributions_hit_extremes(self, tmp_path):
        """All of A below all of B → U_a = 0, U_b = n_a·n_b."""
        rows = [(0, "A", 1.0)] * 3 + [(0, "B", 9.0)] * 4
        _write_events(tmp_path, rows, users=list(range(7)))
        from suckit_ray.pipelines.relops import events_mannwhitney

        got = events_mannwhitney(str(tmp_path)).to_pandas()
        assert len(got) == 1
        assert int(got["u2_a"].iloc[0]) == 0
        assert int(got["u2_b"].iloc[0]) == 2 * 3 * 4

    def test_all_ties_split_evenly(self, tmp_path):
        """Identical values: U_a = U_b = n_a·n_b/2 (doubled: n_a·n_b)."""
        rows = [(0, "A", 5.0)] * 2 + [(0, "B", 5.0)] * 3
        _write_events(tmp_path, rows, users=list(range(5)))
        from suckit_ray.pipelines.relops import events_mannwhitney

        got = events_mannwhitney(str(tmp_path)).to_pandas()
        assert int(got["u2_a"].iloc[0]) == 2 * 3
        assert int(got["u2_b"].iloc[0]) == 2 * 3


@pytest.mark.usefixtures("ray_session")
class TestKmSurvival:
    def test_engineered_curve(self, tmp_path):
        """5 users: conversions at t=0 (×2), t=1, t=3; one censored
        (purchase at t=5 > horizon 3 → censored at 3, never an event).
        S(0)=10^6·3/5, S(1)=·2/3, S(3)=·1/2 with per-step floors."""
        rows = [
            # user 0: first evt day 0, purchase day 0 -> t=0
            (0, "view", 1.0), (0, "purchase", 1.0),
            # user 1: t=0
            (2, "purchase", 1.0),
            # user 2: first day 1, purchase day 2 -> t=1
            (1, "view", 1.0), (2, "purchase", 1.0),
            # user 3: first day 0, purchase day 3 -> t=3
            (0, "click", 1.0), (3, "purchase", 1.0),
            # user 4: first day 0, purchase day 5 -> censored at 3
            (0, "view", 1.0), (5, "purchase", 1.0),
        ]
        users = [0, 0, 1, 2, 2, 3, 3, 4, 4]
        _write_events(tmp_path, rows, users=users)
        from suckit_ray.pipelines.relops import events_km_survival

        got = events_km_survival(str(tmp_path)).to_pandas()
        s1 = (1_000_000 * 3) // 5          # t=0: n=5, d=2
        s2 = (s1 * 2) // 3                 # t=1: n=3, d=1
        s3 = (s2 * 1) // 2                 # t=3: n=2, d=1 (censored
        exp = pd.DataFrame(                #      user still at risk)
            {
                "t_days": [0, 1, 3],
                "n_risk": [5, 3, 2],
                "d_events": [2, 1, 1],
                "s_micro": [s1, s2, s3],
            }
        )
        pd.testing.assert_frame_equal(got.astype(exp.dtypes), exp)

    def test_monotone_and_bounded_on_sf(self):
        from suckit_ray.pipelines.relops import events_km_survival

        got = events_km_survival(SF).to_pandas()
        assert len(got) >= 1
        s = got["s_micro"].to_numpy()
        assert (np.diff(s) <= 0).all()
        assert (s >= 0).all() and (s <= 1_000_000).all()
        assert (np.diff(got["t_days"].to_numpy()) > 0).all()
        # at-risk counts strictly decrease across steps
        assert (np.diff(got["n_risk"].to_numpy()) < 0).all()


@pytest.mark.usefixtures("ray_session")
class TestHaar:
    def test_perfect_reconstruction(self):
        """Invert the unnormalized transform level by level and
        recover the gap-filled zero-padded daily series exactly."""
        import duckdb

        from suckit_ray.pipelines.relops import events_haar

        got = events_haar(SF).to_pandas()
        daily = duckdb.sql(
            f"""SELECT epoch_us(ts)//86400000000 AS day,
                       SUM(CAST(round(value*100) AS BIGINT)) AS t
                FROM read_parquet('{SF}/events.parquet')
                GROUP BY 1 ORDER BY 1"""
        ).df()
        lo, hi = int(daily["day"].min()), int(daily["day"].max())
        n = hi - lo + 1
        padded = ((n + 7) // 8) * 8
        x = np.zeros(padded, dtype="int64")
        x[daily["day"].to_numpy() - lo] = daily["t"].to_numpy()
        # top-down inversion: e = (a+d)/2, o = (a-d)/2 (always even)
        a = got[got["lvl"] == 3].sort_values("i")["approx_c"].to_numpy()
        for lvl in (3, 2, 1):
            d = got[got["lvl"] == lvl].sort_values("i")["detail_c"].to_numpy()
            assert ((a + d) % 2 == 0).all()
            e, o = (a + d) // 2, (a - d) // 2
            a = np.empty(2 * len(e), dtype="int64")
            a[0::2], a[1::2] = e, o
        assert (a == x).all()

    def test_level_sizes_and_total_energy(self):
        from suckit_ray.pipelines.relops import events_haar

        got = events_haar(SF).to_pandas()
        n1 = (got["lvl"] == 1).sum()
        assert (got["lvl"] == 2).sum() == n1 // 2
        assert (got["lvl"] == 3).sum() == n1 // 4
        # level-3 approx sums = grand total of the series
        import duckdb

        tot = int(
            duckdb.sql(
                f"""SELECT SUM(CAST(round(value*100) AS BIGINT))
                    FROM read_parquet('{SF}/events.parquet')"""
            ).fetchone()[0]
        )
        assert int(got[got["lvl"] == 3]["approx_c"].sum()) == tot


def _page(host, j, link_targets):
    spans = [
        {"kind": "link", "text": "", "media_ref": t, "offset": k}
        for k, t in enumerate(link_targets)
    ]
    return {
        "doc_id": f"{host}//p{j}.html",
        "host": host,
        "is_html": True,
        "spans": spans,
    }


@pytest.mark.usefixtures("ray_session")
class TestMotifs:
    def test_pure_cycle(self):
        import ray.data as rd

        from suckit_ray.pipelines.graph import motifs_from_docs

        rows = [
            _page("hosta.test", 0, ["p1.html"]),
            _page("hosta.test", 1, ["p2.html"]),
            _page("hosta.test", 2, ["p0.html"]),
        ]
        got = motifs_from_docs(
            rd.from_arrow(pa.Table.from_pylist(rows))
        ).to_pandas()
        assert len(got) == 1
        assert int(got["ffl"].iloc[0]) == 0
        assert int(got["cycles"].iloc[0]) == 1

    def test_pure_feed_forward(self):
        import ray.data as rd

        from suckit_ray.pipelines.graph import motifs_from_docs

        rows = [
            _page("hosta.test", 0, ["p1.html", "p2.html"]),
            _page("hosta.test", 1, ["p2.html"]),
            _page("hosta.test", 2, []),
        ]
        got = motifs_from_docs(
            rd.from_arrow(pa.Table.from_pylist(rows))
        ).to_pandas()
        assert len(got) == 1
        assert int(got["ffl"].iloc[0]) == 1
        assert int(got["cycles"].iloc[0]) == 0

    def test_bidirectional_k3_counts_embeddings(self):
        """Complete mutual K3: every ordered triple is an FFL (6) and
        both orientations are cycles (2) — the embedding convention."""
        import ray.data as rd

        from suckit_ray.pipelines.graph import motifs_from_docs

        rows = [
            _page("hosta.test", 0, ["p1.html", "p2.html"]),
            _page("hosta.test", 1, ["p0.html", "p2.html"]),
            _page("hosta.test", 2, ["p0.html", "p1.html"]),
        ]
        got = motifs_from_docs(
            rd.from_arrow(pa.Table.from_pylist(rows))
        ).to_pandas()
        assert int(got["ffl"].iloc[0]) == 6
        assert int(got["cycles"].iloc[0]) == 2

    def test_matches_brute_force_on_flagship(self):
        import posixpath
        import re

        from suckit_ray.pipelines.flagship import crawl_docs
        from suckit_ray.pipelines.graph import motifs_from_docs, resolve_link

        docs = crawl_docs(SF).materialize()
        got = (
            motifs_from_docs(docs)
            .to_pandas()
            .sort_values("host")
            .reset_index(drop=True)
        )
        page_re = re.compile(r"/p(\d+)\.html$")
        edges: dict = {}
        for row in docs.iter_rows():
            if not row["is_html"]:
                continue
            m = page_re.search(posixpath.normpath(row["doc_id"]))
            if not m:
                continue
            j, host = int(m.group(1)), row["host"]
            for s in row["spans"]:
                if s["kind"] != "link":
                    continue
                tgt = resolve_link(row["doc_id"], s["media_ref"])
                mt = page_re.search(tgt)
                if not mt or tgt.split("/", 1)[0] != host:
                    continue
                k = int(mt.group(1))
                if k != j:
                    edges.setdefault(host, set()).add((j, k))
        ref = {}
        for host, es in edges.items():
            out: dict = {}
            for a, b in es:
                out.setdefault(a, set()).add(b)
            ffl = cyc = 0
            for a, b in es:
                for c in out.get(b, ()):
                    if c == a:
                        continue
                    if (a, c) in es:
                        ffl += 1
                    if (c, a) in es:
                        cyc += 1
            if ffl or cyc:
                ref[host] = (ffl, cyc // 3)
        assert {
            r["host"]: (int(r["ffl"]), int(r["cycles"]))
            for _, r in got.iterrows()
        } == ref


@pytest.mark.usefixtures("ray_session")
class TestVocabGrowth:
    def test_engineered_deciles(self, tmp_path):
        """10 docs, one per decile: doc 0 brings {common, t0}; every
        later doc brings exactly one new term."""
        n = 10
        texts = [f"common t{d}" for d in range(n)]
        tbl = pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        )
        pq.write_table(tbl, tmp_path / "documents.parquet")
        from suckit_ray.pipelines.textops import docs_vocab_growth

        got = docs_vocab_growth(str(tmp_path)).to_pandas()
        assert list(got["decile"]) == list(range(10))
        assert list(got["new_terms"]) == [2] + [1] * 9
        assert list(got["vocab_cum"]) == [2 + i for i in range(10)]

    def test_matches_pandas_replay_on_sf(self):
        from suckit_ray.pipelines.textops import docs_vocab_growth

        got = docs_vocab_growth(SF).to_pandas()
        docs = pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas()
        n = len(docs)
        firsts: dict = {}
        for doc_id, text in zip(
            docs["doc_id"].astype("int64"), docs["text"]
        ):
            for t in set(text.lower().split()):
                if t not in firsts or doc_id < firsts[t]:
                    firsts[t] = int(doc_id)
        import collections

        per = collections.Counter((fd * 10) // n for fd in firsts.values())
        assert list(got["new_terms"]) == [per.get(d, 0) for d in range(10)]
        assert int(got["vocab_cum"].iloc[-1]) == len(firsts)
        # growth curve is monotone, concave-ish head: first decile is
        # the largest single contributor on a shared-vocab corpus
        assert int(got["new_terms"].iloc[0]) == got["new_terms"].max()


@pytest.mark.usefixtures("ray_session")
class TestOhlc:
    def test_engineered_candle(self, tmp_path):
        """One day, one type: open/close picked by (ts, event_id)
        order, including a same-timestamp tie at the close."""
        rows = [
            (0, "A", 5.0),   # event_id 0: open
            (0, "A", 9.0),   # high
            (0, "A", 1.0),   # low
            (0, "A", 7.0),   # event_id 3: same ts as 2 -> close
        ]
        _write_events(tmp_path, rows, users=[1, 2, 3, 4])
        from suckit_ray.pipelines.relops import events_ohlc

        got = events_ohlc(str(tmp_path)).to_pandas()
        assert len(got) == 1
        r = got.iloc[0]
        assert (
            int(r["open_c"]),
            int(r["high_c"]),
            int(r["low_c"]),
            int(r["close_c"]),
            int(r["n"]),
        ) == (500, 900, 100, 700, 4)

    def test_matches_pandas_replay_on_sf(self):
        from suckit_ray.pipelines.relops import events_ohlc, to_cents

        got = (
            events_ohlc(SF)
            .to_pandas()
            .sort_values(["event_type", "day"])
            .reset_index(drop=True)
        )
        ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
        us = ev["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        ev = pd.DataFrame(
            {
                "event_type": ev["event_type"],
                "day": us // 86_400_000_000,
                "us": us,
                "event_id": ev["event_id"],
                "v": to_cents(ev["value"]),
            }
        ).sort_values(["event_type", "day", "us", "event_id"])
        ref = (
            ev.groupby(["event_type", "day"], as_index=False)
            .agg(
                open_c=("v", "first"),
                high_c=("v", "max"),
                low_c=("v", "min"),
                close_c=("v", "last"),
                n=("v", "count"),
            )
            .sort_values(["event_type", "day"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, ref.astype(got.dtypes))


@pytest.mark.usefixtures("ray_session")
class TestDispersion:
    def test_constant_daily_counts_give_zero(self, tmp_path):
        """Same count every day -> variance 0 -> VMR 0."""
        rows = [(d, "A", 1.0) for d in range(5) for _ in range(3)]
        _write_events(tmp_path, rows, users=list(range(15)))
        from suckit_ray.pipelines.relops import events_dispersion

        got = events_dispersion(str(tmp_path)).to_pandas()
        assert int(got["vmr_micro"].iloc[0]) == 0

    def test_gap_days_count_zero(self, tmp_path):
        """Type B fires once in a 5-day span: counts (1,0,0,0,0) ->
        mean 1/5, var 4/25, VMR = 4/5 exactly 800000."""
        rows = [(0, "A", 1.0), (4, "A", 1.0), (0, "B", 1.0)]
        _write_events(tmp_path, rows, users=[1, 2, 3])
        from suckit_ray.pipelines.relops import events_dispersion

        got = events_dispersion(str(tmp_path)).to_pandas()
        b = got[got["event_type"] == "B"].iloc[0]
        assert int(b["n_days"]) == 5
        assert int(b["vmr_micro"]) == 800_000

    def test_nonnegative_on_sf(self):
        from suckit_ray.pipelines.relops import events_dispersion

        got = events_dispersion(SF).to_pandas()
        assert len(got) == 5
        assert (got["vmr_micro"] >= 0).all()
        # cross-check one type against numpy on the dense grid
        r = got.iloc[0]
        n, s, s2 = int(r["n_days"]), int(r["sum_c"]), int(r["sum_sq"])
        assert int(r["vmr_micro"]) == (1_000_000 * (n * s2 - s * s)) // (
            n * s
        )


@pytest.mark.usefixtures("ray_session")
class TestSimpsonDiversity:
    def test_engineered_mixes(self, tmp_path):
        """Source m: monolingual -> 0. Source e: 2+2 split of 4 ->
        1 - (2·1+2·1)/(4·3) = 2/3."""
        langs = ["en", "en", "en", "en", "de", "de"]
        srcs = ["m", "m", "e", "e", "e", "e"]
        tbl = pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "text": pa.array(["x"] * 6, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(srcs, pa.string()),
                "n_chars": pa.array([1] * 6, pa.int64()),
            }
        )
        pq.write_table(tbl, tmp_path / "documents.parquet")
        from suckit_ray.pipelines.textops import docs_simpson_diversity

        got = (
            docs_simpson_diversity(str(tmp_path))
            .to_pandas()
            .set_index("source")
        )
        assert int(got.loc["m", "d_micro"]) == 0
        assert int(got.loc["e", "d_micro"]) == (1_000_000 * 8) // 12

    def test_bounds_on_sf(self):
        from suckit_ray.pipelines.textops import docs_simpson_diversity

        got = docs_simpson_diversity(SF).to_pandas()
        assert len(got) >= 1
        assert (got["d_micro"] >= 0).all()
        assert (got["d_micro"] < 1_000_000).all()


@pytest.mark.usefixtures("ray_session")
class TestReciprocity:
    def test_engineered_mutual_and_oneway(self):
        """Edges 0↔1 (mutual) and 0→2 (one-way): 2 of 3 edges
        mutual -> recip 2/3."""
        import ray.data as rd

        from suckit_ray.pipelines.graph import reciprocity_from_docs

        rows = [
            _page("hosta.test", 0, ["p1.html", "p2.html"]),
            _page("hosta.test", 1, ["p0.html"]),
            _page("hosta.test", 2, []),
        ]
        got = reciprocity_from_docs(
            rd.from_arrow(pa.Table.from_pylist(rows))
        ).to_pandas()
        assert len(got) == 1
        r = got.iloc[0]
        assert (int(r["n_edges"]), int(r["n_mutual"])) == (3, 2)
        assert int(r["recip_micro"]) == (1_000_000 * 2) // 3

    def test_matches_brute_force_on_flagship(self):
        import posixpath
        import re

        from suckit_ray.pipelines.flagship import crawl_docs
        from suckit_ray.pipelines.graph import (
            reciprocity_from_docs,
            resolve_link,
        )

        docs = crawl_docs(SF).materialize()
        got = (
            reciprocity_from_docs(docs)
            .to_pandas()
            .sort_values("host")
            .reset_index(drop=True)
        )
        page_re = re.compile(r"/p(\d+)\.html$")
        edges: dict = {}
        for row in docs.iter_rows():
            if not row["is_html"]:
                continue
            m = page_re.search(posixpath.normpath(row["doc_id"]))
            if not m:
                continue
            j, host = int(m.group(1)), row["host"]
            for s in row["spans"]:
                if s["kind"] != "link":
                    continue
                tgt = resolve_link(row["doc_id"], s["media_ref"])
                mt = page_re.search(tgt)
                if not mt or tgt.split("/", 1)[0] != host:
                    continue
                k = int(mt.group(1))
                if k != j:
                    edges.setdefault(host, set()).add((j, k))
        for _, r in got.iterrows():
            es = edges[r["host"]]
            mut = sum(1 for a, b in es if (b, a) in es)
            assert int(r["n_edges"]) == len(es)
            assert int(r["n_mutual"]) == mut


@pytest.mark.usefixtures("ray_session")
class TestZipfSlope:
    def test_matches_float_ols_replay(self):
        """The integer closed form tracks a float OLS over the same
        quantized points to within 2 micro (one floor each side)."""
        import math

        from suckit_ray.pipelines.textops import ZIPF_TOP_K, docs_zipf_slope

        got = docs_zipf_slope(SF).to_pandas()
        docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
        from collections import Counter

        c: Counter = Counter()
        for t in docs["text"]:
            c.update(t.lower().split())
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_TOP_K]
        # the sf0.001 word-soup vocabulary is smaller than the cap
        assert int(got["k"].iloc[0]) == min(ZIPF_TOP_K, len(top))
        xs = np.array(
            [math.floor(math.log(r + 1) * 1e6) for r in range(len(top))]
        )
        ys = np.array([math.floor(math.log(n) * 1e6) for _, n in top])
        slope_f, inter_f = np.polyfit(xs.astype(float), ys.astype(float), 1)
        assert abs(int(got["slope_micro"].iloc[0]) - slope_f * 1e6) <= 2e6
        assert abs(int(got["intercept_micro"].iloc[0]) - inter_f) <= 2
        # natural-ish text: slope strictly negative
        assert int(got["slope_micro"].iloc[0]) < 0

    def test_exact_geometric_counts(self, tmp_path):
        """Counts 8,4,2,1 over ranks 1..4: the exact integer solve on
        hand-quantized points — replayed literally."""
        import math

        texts = (
            ["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"]
        )  # one term per doc
        n = len(texts)
        tbl = pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(["s"] * n, pa.string()),
                "n_chars": pa.array([1] * n, pa.int64()),
            }
        )
        pq.write_table(tbl, tmp_path / "documents.parquet")
        from suckit_ray.pipelines.textops import docs_zipf_slope

        got = docs_zipf_slope(str(tmp_path)).to_pandas()
        xs = [math.floor(math.log(r) * 1e6) for r in (1, 2, 3, 4)]
        ys = [math.floor(math.log(v) * 1e6) for v in (8, 4, 2, 1)]
        k = 4
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        den = k * sxx - sx * sx
        num_s = k * sxy - sx * sy
        exp = (1 if num_s >= 0 else -1) * ((abs(num_s) * 10**6) // den)
        assert int(got["slope_micro"].iloc[0]) == exp
        assert int(got["k"].iloc[0]) == 4
        assert int(got["n"].iloc[0]) == 15


@pytest.mark.usefixtures("ray_session")
class TestDbscanAllCore:
    def test_all_core_no_borders_regression(self):
        """eps loose enough that EVERY point is core: the border
        candidate set is EMPTY, which used to crash Ray's hash-shuffle
        Dataset.join (an all-empty side loses its schema and the key
        FieldRef can't bind) — the exact shape embeddings_dbscan hits
        at sf0.1. The guarded plan must return all-core, no-noise."""
        from suckit_ray.pipelines.ann import embeddings_dbscan

        got = embeddings_dbscan(SF, eps=0.05, min_pts=2).to_pandas()
        assert len(got) == 500
        assert got["is_core"].all()
        assert (got["cluster"] >= 0).all()

    def test_empty_edge_set_is_all_noise(self):
        """eps so tight no pair qualifies: the edge set itself is
        empty (the other all-empty-join shape) — everything noise."""
        from suckit_ray.pipelines.ann import embeddings_dbscan

        got = embeddings_dbscan(SF, eps=0.9999, min_pts=2).to_pandas()
        assert len(got) == 500
        assert (~got["is_core"]).all()
        assert (got["cluster"] == -1).all()


@pytest.mark.usefixtures("ray_session")
class TestForecastEval:
    def test_replays_holt_recursion(self):
        """Cross-check against events_holt's own output: the summed
        |x_t − LAG(forecast)| must equal the eval's sum_abs_err."""
        from suckit_ray.pipelines.relops import (
            events_forecast_eval,
            events_holt,
        )

        ev = events_forecast_eval(SF).to_pandas().set_index("event_type")
        holt = events_holt(SF).to_pandas()
        for etype, g in holt.groupby("event_type"):
            g = g.sort_values("day").reset_index(drop=True)
            err = (
                (g["x_cents"].iloc[1:].to_numpy()
                 - g["forecast_c"].iloc[:-1].to_numpy())
            )
            naive = np.diff(g["x_cents"].to_numpy())
            r = ev.loc[etype]
            assert int(r["sum_abs_err"]) == int(np.abs(err).sum())
            assert int(r["sum_abs_naive"]) == int(np.abs(naive).sum())
            assert int(r["n_eval"]) == len(g) - 1
            assert int(r["mase_micro"]) == (
                10**6 * int(np.abs(err).sum())
            ) // int(np.abs(naive).sum())

    def test_perfect_linear_series_beats_naive(self, tmp_path):
        """On x_t = 100·t the Holt trend converges and the model error
        drops below naive persistence (constant 100/day error)."""
        rows = [(d, "A", float(d)) for d in range(1, 30)]
        _write_events(tmp_path, rows, users=list(range(29)))
        from suckit_ray.pipelines.relops import events_forecast_eval

        got = events_forecast_eval(str(tmp_path)).to_pandas()
        assert len(got) == 1
        assert int(got["mase_micro"].iloc[0]) < 1_000_000

    def test_single_day_type_dropped(self, tmp_path):
        rows = [(0, "A", 1.0), (1, "A", 2.0), (0, "B", 1.0)]
        _write_events(tmp_path, rows, users=[1, 2, 3])
        from suckit_ray.pipelines.relops import events_forecast_eval

        got = events_forecast_eval(str(tmp_path)).to_pandas()
        assert list(got["event_type"]) == ["A"]


@pytest.mark.usefixtures("ray_session")
class TestAbsorption:
    def test_engineered_chain(self, tmp_path):
        """view -> click -> purchase deterministic chain per user:
        q(click)=10^6 (1 step), q(view)=10^6 (2 steps), purchase
        pinned; the dst-only dead end stays 0."""
        rows = []
        users = []
        for u in range(3):
            rows += [(0, "view", 1.0), (1, "click", 1.0),
                     (2, "purchase", 1.0)]
            users += [u, u, u]
        # one user ends on a dead-end type (dst-only, never a src)
        rows += [(0, "view", 1.0), (1, "dead", 1.0)]
        users += [9, 9]
        _write_events(tmp_path, rows, users=users)
        from suckit_ray.pipelines.relops import events_absorption

        got = (
            events_absorption(str(tmp_path))
            .to_pandas()
            .set_index("event_type")
        )
        assert int(got.loc["purchase", "p4_micro"]) == 1_000_000
        assert int(got.loc["click", "p4_micro"]) == 1_000_000
        # view: 3/4 of transitions go to click(→purchase), 1/4 to dead
        assert int(got.loc["view", "p4_micro"]) == (
            3 * 1_000_000
        ) // 4
        assert int(got.loc["dead", "p4_micro"]) == 0
        assert int(got.loc["dead", "n_out"]) == 0

    def test_probability_bounds_and_monotone_on_sf(self):
        """0 ≤ p ≤ 10^6 everywhere; with every type reaching purchase
        in the dense sf log, all sources score > 0."""
        from suckit_ray.pipelines.relops import events_absorption

        got = events_absorption(SF).to_pandas()
        assert (got["p4_micro"] >= 0).all()
        assert (got["p4_micro"] <= 1_000_000).all()
        src = got[got["n_out"] > 0]
        assert (src["p4_micro"] > 0).all()


@pytest.mark.usefixtures("ray_session")
class TestPriceIndex:
    def _write_lineitem(self, tmp_path, rows):
        """rows: (year, partkey, qty, extendedprice)."""
        import datetime

        tbl = pa.table(
            {
                "l_orderkey": pa.array(range(len(rows)), pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
                "l_suppkey": pa.array([1] * len(rows), pa.int64()),
                "l_linenumber": pa.array([1] * len(rows), pa.int32()),
                "l_quantity": pa.array(
                    [float(r[2]) for r in rows], pa.float64()
                ),
                "l_extendedprice": pa.array(
                    [float(r[3]) for r in rows], pa.float64()
                ),
                "l_discount": pa.array([0.0] * len(rows), pa.float64()),
                "l_tax": pa.array([0.0] * len(rows), pa.float64()),
                "l_returnflag": pa.array(["N"] * len(rows), pa.string()),
                "l_linestatus": pa.array(["O"] * len(rows), pa.string()),
                "l_shipdate": pa.array(
                    [
                        datetime.datetime(r[0], 6, 15)
                        for r in rows
                    ],
                    pa.timestamp("us"),
                ),
            }
        )
        pq.write_table(tbl, tmp_path / "lineitem.parquet")

    def test_uniform_doubling(self, tmp_path):
        """Every unit price doubles year 2024→2025, same basket:
        both indices read exactly 2.0 (2e6 micro)."""
        rows = [
            (2024, 1, 2, 10.0),  # unit 500c
            (2024, 2, 4, 40.0),  # unit 1000c
            (2025, 1, 3, 30.0),  # unit 1000c
            (2025, 2, 1, 20.0),  # unit 2000c
        ]
        self._write_lineitem(tmp_path, rows)
        from suckit_ray.pipelines.relops import lineitem_price_index

        got = lineitem_price_index(str(tmp_path)).to_pandas()
        assert len(got) == 1
        r = got.iloc[0]
        assert int(r["year"]) == 2025
        assert int(r["n_parts"]) == 2
        assert int(r["lasp_micro"]) == 2_000_000
        assert int(r["paasche_micro"]) == 2_000_000

    def test_unmatched_part_excluded(self, tmp_path):
        """A part sold only in 2025 is not in the matched basket."""
        rows = [
            (2024, 1, 1, 10.0),
            (2025, 1, 1, 10.0),
            (2025, 99, 1, 999.0),  # new product: excluded
        ]
        self._write_lineitem(tmp_path, rows)
        from suckit_ray.pipelines.relops import lineitem_price_index

        got = lineitem_price_index(str(tmp_path)).to_pandas()
        assert int(got["n_parts"].iloc[0]) == 1
        assert int(got["lasp_micro"].iloc[0]) == 1_000_000

    def test_matches_pandas_replay_on_sf(self):
        from suckit_ray.pipelines.relops import (
            lineitem_price_index,
            round_half_away,
            to_cents,
        )

        got = lineitem_price_index(SF).to_pandas()
        li = pq.read_table(
            f"{SF}/lineitem.parquet",
            columns=[
                "l_shipdate",
                "l_partkey",
                "l_extendedprice",
                "l_quantity",
            ],
        ).to_pandas()
        df = pd.DataFrame(
            {
                "year": li["l_shipdate"].dt.year,
                "part": li["l_partkey"],
                "ep": to_cents(li["l_extendedprice"]),
                "q": round_half_away(li["l_quantity"]),
            }
        )
        py = df.groupby(["year", "part"], as_index=False).sum()
        py["u"] = py["ep"] // py["q"]
        base = int(py["year"].min())
        b = py[py["year"] == base].set_index("part")[["u", "q"]]
        for _, r in got.iterrows():
            yr = int(r["year"])
            m = py[py["year"] == yr].merge(
                b, left_on="part", right_index=True,
                suffixes=("", "0"),
            )
            ln = int((m["u"] * m["q0"]).sum())
            ld = int((m["u0"] * m["q0"]).sum())
            assert int(r["n_parts"]) == len(m)
            assert int(r["lasp_micro"]) == (1_000_000 * ln) // ld


@pytest.mark.usefixtures("ray_session")
class TestLorenz:
    def test_matches_pandas_replay(self):
        from suckit_ray.pipelines.relops import events_lorenz, to_cents

        got = events_lorenz(SF).to_pandas()
        ev = pq.read_table(
            f"{SF}/events.parquet", columns=["user_id", "value"]
        ).to_pandas()
        ev["t"] = to_cents(ev["value"])
        u = (
            ev.groupby("user_id", as_index=False)["t"]
            .sum()
            .sort_values(["t", "user_id"])
            .reset_index(drop=True)
        )
        n, k = len(u), 10
        sizes = [n // k + (1 if i < n % k else 0) for i in range(k)]
        total = int(u["t"].sum())
        pos = ncum = vcum = 0
        for d, sz in enumerate(sizes, start=1):
            ncum += sz
            vcum += int(u["t"].iloc[pos:pos + sz].sum())
            pos += sz
            row = got[got["decile"] == d].iloc[0]
            assert int(row["n_users_cum"]) == ncum
            assert int(row["value_cum_c"]) == vcum
            assert int(row["share_micro"]) == (1_000_000 * vcum) // total
        # curve properties: monotone, convex-ish end at 10^6
        assert int(got["share_micro"].iloc[-1]) == 1_000_000
        assert (np.diff(got["share_micro"].to_numpy()) > 0).all()


@pytest.mark.usefixtures("ray_session")
class TestKeyness:
    def test_matches_python_replay(self):
        import math
        from collections import Counter

        from suckit_ray.pipelines.textops import (
            KEYNESS_POOL_K,
            KEYNESS_TOP,
            docs_keyness_llr,
        )

        got = docs_keyness_llr(SF).to_pandas()
        docs = pq.read_table(
            f"{SF}/documents.parquet", columns=["lang", "text"]
        ).to_pandas()
        lt: Counter = Counter()
        for lang, text in zip(docs["lang"], docs["text"]):
            for t, n in Counter(text.lower().split()).items():
                lt[(lang, t)] += n
        term_tot: Counter = Counter()
        lang_tot: Counter = Counter()
        for (lang, t), n in lt.items():
            term_tot[t] += n
            lang_tot[lang] += n
        pool = sorted(term_tot.items(), key=lambda kv: (-kv[1], kv[0]))[
            :KEYNESS_POOL_K
        ]
        N = sum(lang_tot.values())

        def xlx(x):
            return 0 if x <= 0 else math.floor(x * math.log(x) * 1e6)

        for lang in lang_tot:
            scored = []
            for term, tn in pool:
                a = lt.get((lang, term), 0)
                b, c = tn - a, lang_tot[lang] - a
                d = N - lang_tot[lang] - b
                g2 = 2 * (
                    xlx(a) + xlx(b) + xlx(c) + xlx(d) + xlx(N)
                    - xlx(a + b) - xlx(c + d) - xlx(a + c) - xlx(b + d)
                )
                scored.append((-g2, term, a, b))
            scored.sort()
            sub = got[got["lang"] == lang].sort_values("rank")
            assert len(sub) == KEYNESS_TOP
            for row, (ng2, term, a, b) in zip(
                sub.itertuples(), scored[:KEYNESS_TOP]
            ):
                assert row.term == term
                assert int(row.g2_micro) == -ng2
                assert int(row.n_in) == a

    def test_exclusive_term_tops_its_lang(self, tmp_path):
        """A term occurring ONLY in lang X (and frequently) must rank
        first for X — the defining keyness behavior."""
        texts = (
            ["shared words here xonly xonly xonly"] * 5
            + ["shared words here common text"] * 5
        )
        langs = ["xx"] * 5 + ["yy"] * 5
        tbl = pa.table(
            {
                "doc_id": pa.array(range(10), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(["s"] * 10, pa.string()),
                "n_chars": pa.array([1] * 10, pa.int64()),
            }
        )
        pq.write_table(tbl, tmp_path / "documents.parquet")
        from suckit_ray.pipelines.textops import docs_keyness_llr

        got = docs_keyness_llr(str(tmp_path)).to_pandas()
        xx1 = got[(got["lang"] == "xx") & (got["rank"] == 1)].iloc[0]
        assert xx1["term"] == "xonly"
        assert int(xx1["n_out"]) == 0
        assert int(xx1["g2_micro"]) > 0


@pytest.mark.usefixtures("ray_session")
class TestStatProperties:
    """Hypothesis property pins for the session's statistics — random
    engineered event tables, engine vs brute-force invariants."""

    def test_mannwhitney_complement_and_bruteforce(self, tmp_path):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from suckit_ray.pipelines.relops import events_mannwhitney

        @given(
            a=st.lists(
                st.integers(min_value=0, max_value=6),
                min_size=1, max_size=12,
            ),
            b=st.lists(
                st.integers(min_value=0, max_value=6),
                min_size=1, max_size=12,
            ),
        )
        @settings(max_examples=12, deadline=None)
        def check(a, b):
            import shutil
            import uuid

            d = tmp_path / uuid.uuid4().hex
            d.mkdir()
            rows = [(0, "A", float(v)) for v in a] + [
                (0, "B", float(v)) for v in b
            ]
            _write_events(d, rows, users=list(range(len(rows))))
            got = events_mannwhitney(str(d)).to_pandas().iloc[0]
            # brute force with half-rank ties, doubled
            u2a = 0
            for x in a:
                for y in b:
                    u2a += 2 if x > y else (1 if x == y else 0)
            assert int(got["u2_a"]) == u2a
            assert int(got["u2_a"]) + int(got["u2_b"]) == 2 * len(a) * len(b)
            shutil.rmtree(d)

        check()

    def test_scd2_partition_property(self, tmp_path):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from suckit_ray.pipelines.relops import events_scd2

        @given(
            stream=st.lists(
                st.tuples(
                    st.integers(min_value=0, max_value=2),   # user
                    st.integers(min_value=0, max_value=3),   # day
                    st.sampled_from(["A", "B", "C"]),
                ),
                min_size=1, max_size=20,
            )
        )
        @settings(max_examples=12, deadline=None)
        def check(stream):
            import shutil
            import uuid

            d = tmp_path / uuid.uuid4().hex
            d.mkdir()
            rows = [(day, et, 1.0) for _, day, et in stream]
            users = [u for u, _, _ in stream]
            _write_events(d, rows, users=users)
            got = events_scd2(str(d)).to_pandas()
            # reference replay: order by (us, event_id) per user,
            # collapse runs
            ref = {}
            order = sorted(
                range(len(stream)),
                key=lambda i: (stream[i][0], stream[i][1], i),
            )
            for i in order:
                u, day, et = stream[i]
                ref.setdefault(u, [])
                if not ref[u] or ref[u][-1][0] != et:
                    ref[u].append([et, day * 86_400_000_000])
            for u, g in got.groupby("user_id"):
                g = g.sort_values("version")
                exp = ref[int(u)]
                assert list(g["event_type"]) == [e[0] for e in exp]
                assert list(g["valid_from_us"]) == [e[1] for e in exp]
                assert int(g["valid_to_us"].iloc[-1]) == -1
            assert set(got["user_id"]) == set(ref)
            shutil.rmtree(d)

        check()


@pytest.mark.usefixtures("ray_session")
class TestAnova:
    def test_identical_groups_give_zero_f(self, tmp_path):
        """Same latency distribution in every priority: SSB'=0."""
        import datetime

        n = 12
        tbl_o = pa.table(
            {
                "o_orderkey": pa.array(range(n), pa.int64()),
                "o_custkey": pa.array([1] * n, pa.int64()),
                "o_orderstatus": pa.array(["O"] * n, pa.string()),
                "o_totalprice": pa.array([1.0] * n, pa.float64()),
                "o_orderdate": pa.array(
                    [datetime.datetime(2024, 1, 1)] * n, pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(
                    ["1-URGENT", "2-HIGH", "3-MEDIUM"] * 4, pa.string()
                ),
            }
        )
        pq.write_table(tbl_o, tmp_path / "orders.parquet")
        # every order ships exactly 5 days later
        tbl_l = pa.table(
            {
                "l_orderkey": pa.array(range(n), pa.int64()),
                "l_shipdate": pa.array(
                    [datetime.datetime(2024, 1, 6)] * n, pa.timestamp("us")
                ),
            }
        )
        pq.write_table(tbl_l, tmp_path / "lineitem.parquet")
        from suckit_ray.pipelines.relops import orders_latency_anova

        got = orders_latency_anova(str(tmp_path)).to_pandas()
        assert int(got["ssb_q"].iloc[0]) == 0
        assert int(got["f_micro"].iloc[0]) == 0

    def test_matches_sufficient_stats_replay_on_sf(self):
        import duckdb

        from suckit_ray.pipelines.relops import (
            _trunc_div,
            orders_latency_anova,
        )

        got = orders_latency_anova(SF).to_pandas().iloc[0]
        g = duckdb.sql(
            f"""
            WITH ship AS (
              SELECT l_orderkey AS okey,
                     MAX(epoch_us(l_shipdate) // 86400000000) AS cd
              FROM read_parquet('{SF}/lineitem.parquet') GROUP BY 1
            )
            SELECT o.o_orderpriority AS pr,
                   COUNT(*) AS n, SUM(s.cd - epoch_us(o.o_orderdate)
                     // 86400000000) AS s1,
                   SUM((s.cd - epoch_us(o.o_orderdate) // 86400000000)
                       * (s.cd - epoch_us(o.o_orderdate)
                          // 86400000000)) AS s2
            FROM read_parquet('{SF}/orders.parquet') o
            JOIN ship s ON s.okey = o.o_orderkey GROUP BY 1
            """
        ).df()
        k, n = len(g), int(g["n"].sum())
        S = int(g["s1"].sum())
        m = _trunc_div(S, n)
        ssb = ssw = 0
        for _, r in g.iterrows():
            ng, sg, qg = int(r["n"]), int(r["s1"]), int(r["s2"])
            mg = _trunc_div(sg, ng)
            ssb += ng * (mg - m) ** 2
            ssw += qg - 2 * mg * sg + ng * mg * mg
        assert int(got["k_groups"]) == k
        assert int(got["ssb_q"]) == ssb
        assert int(got["ssw_q"]) == ssw


@pytest.mark.usefixtures("ray_session")
class TestMmr:
    def test_matches_python_replay_on_sf(self):
        from suckit_ray.pipelines.ann import (
            MMR_LAMBDA10,
            _normalize,
            brute_force_topk,
            mmr_topk,
        )

        got = mmr_topk(SF).to_pandas()
        cand = brute_force_topk(SF, k=50).to_pandas()
        emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
        vm = _normalize(
            np.stack(emb["embedding"].to_numpy()).astype(np.float64)
        )
        row = {int(v): i for i, v in enumerate(emb["vec_id"])}
        for qid, g in cand.groupby("query_id"):
            g = g.sort_values("rank")
            ids = [int(v) for v in g["neighbor_id"]]
            rel = {
                int(v): int(p)
                for v, p in zip(g["neighbor_id"], g["cos_pct"])
            }
            sub = vm[[row[v] for v in ids]]
            sim = np.floor((sub @ sub.T) * 10000).astype(np.int64)
            pos = {v: i for i, v in enumerate(ids)}
            sel, rem = [], set(ids)
            while rem and len(sel) < 10:
                best = None
                for v in sorted(rem):
                    ms = (
                        max(int(sim[pos[v], pos[s]]) for s in sel)
                        if sel
                        else 0
                    )
                    sc = MMR_LAMBDA10 * rel[v] - (10 - MMR_LAMBDA10) * ms
                    if best is None or sc > best[0]:
                        best = (sc, v)
                sel.append(best[1])
                rem.discard(best[1])
            sub_got = got[got["query_id"] == qid].sort_values("rank")
            assert list(sub_got["neighbor_id"]) == sel

    def test_planted_duplicate_is_demoted(self, tmp_path):
        """Vectors 1 and 2 are identical near-perfect matches; 3 is a
        diverse moderate match. Plain top-3 ranks (1,2,3); MMR must
        pick the diverse 3 before the duplicate 2."""
        # rel(1)=rel(2)=0.90 but mutually identical (sim 1.0);
        # rel(3)=0.85 with sim(3,1)≈0.54: MMR scores
        # 7·9000−3·10000=33000 for the duplicate vs
        # 7·8500−3·5360≈43420 for the diverse hit
        vecs = [
            [1.0, 0.0, 0.0],            # 0: the query
            [0.9, 0.43589, 0.0],        # 1: best match
            [0.9, 0.43589, 0.0],        # 2: its duplicate
            [0.85, -0.52678, 0.0],      # 3: diverse, decent
            [0.0, 1.0, 0.0],            # 4: irrelevant
        ]
        tbl = pa.table(
            {
                "vec_id": pa.array(range(5), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([0] * 5, pa.int32()),
            }
        )
        pq.write_table(tbl, tmp_path / "embeddings.parquet")
        from suckit_ray.pipelines.ann import mmr_topk

        got = (
            mmr_topk(str(tmp_path), k=3, pool=4)
            .to_pandas()
            .sort_values(["query_id", "rank"])
        )
        q0 = got[got["query_id"] == 0]
        assert list(q0["neighbor_id"])[:3] == [1, 3, 2]


@pytest.mark.usefixtures("ray_session")
class TestWdsExport:
    def test_crawl_to_webdataset_roundtrip(self, tmp_path):
        """Flagship-style synthetic crawl with --parquet-out, exported
        to WebDataset shards: sample count equals downloaded pages and
        a page's body + metadata round-trip byte-exactly."""
        import hashlib
        import json

        import ray.data  # noqa: F401

        from suckit_ray.config import CrawlConfig
        from suckit_ray.pipelines.crawl import crawl
        from suckit_ray.sources.pagestore import (
            SyntheticCorpus,
            SyntheticPageStore,
        )
        from suckit_ray.sources.wds import (
            export_docs_webdataset,
            read_webdataset,
        )

        corpus = SyntheticCorpus(n_hosts=2, n_docs=60, fanout=3)
        pq_out = str(tmp_path / "pq")
        crawl(
            CrawlConfig(origin=corpus.page_url(0, 0)),
            SyntheticPageStore(corpus),
            seeds=corpus.seeds(),
            num_shards=2,
            output_dir=pq_out,
            collect=False,
        )
        wds_out = str(tmp_path / "wds")
        n = export_docs_webdataset(pq_out, wds_out)
        import glob

        docs = ray.data.read_parquet(
            sorted(glob.glob(f"{pq_out}/docs/wave-*/*.parquet"))
        ).to_pandas()
        assert n == len(docs)

        back = read_webdataset(wds_out).to_pandas()
        # reader explodes per member: bin + json per sample
        assert len(back) == 2 * n
        assert back["key"].nunique() == n
        # pick one page and verify byte-exact body + metadata
        doc = docs.iloc[0]
        key = hashlib.blake2s(
            doc["doc_id"].encode("utf-8")
        ).hexdigest()[:16]
        sub = back[back["key"] == key].set_index("ext")["data"]
        assert bytes(sub["bin"]) == bytes(doc["body"])
        meta = json.loads(bytes(sub["json"]).decode("utf-8"))
        assert meta["url"] == doc["url"]
        assert meta["doc_id"] == doc["doc_id"]


@pytest.mark.usefixtures("ray_session")
class TestValueMode:
    def test_tie_goes_to_smallest_value(self, tmp_path):
        rows = [(0, "A", 2.0), (0, "A", 2.0), (0, "A", 1.0), (0, "A", 1.0)]
        _write_events(tmp_path, rows, users=[1, 2, 3, 4])
        from suckit_ray.pipelines.relops import events_value_mode

        got = events_value_mode(str(tmp_path)).to_pandas()
        assert int(got["mode_c"].iloc[0]) == 100
        assert int(got["n_mode"].iloc[0]) == 2

    def test_matches_counter_on_sf(self):
        from collections import Counter

        from suckit_ray.pipelines.relops import events_value_mode, to_cents

        got = events_value_mode(SF).to_pandas().set_index("event_type")
        ev = pq.read_table(
            f"{SF}/events.parquet", columns=["event_type", "value"]
        ).to_pandas()
        ev["c"] = to_cents(ev["value"])
        for t, g in ev.groupby("event_type"):
            cnt = Counter(g["c"])
            best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
            assert int(got.loc[t, "mode_c"]) == best[0]
            assert int(got.loc[t, "n_mode"]) == best[1]


@pytest.mark.usefixtures("ray_session")
class TestLangidConfusion:
    def test_matches_langid_composition(self):
        """The matrix must equal lang_id's output joined to the true
        labels — pins the shared prediction logic."""
        from suckit_ray.pipelines.textops import (
            docs_langid_confusion,
            lang_id,
        )

        got = docs_langid_confusion(SF).to_pandas()
        preds = lang_id(SF).to_pandas()
        actual = pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id", "lang"]
        ).to_pandas()
        ref = (
            preds.merge(actual, on="doc_id")
            .groupby(["lang", "pred_lang"], as_index=False)
            .size()
            .rename(columns={"lang": "actual_lang", "size": "n"})
            .sort_values(["actual_lang", "pred_lang"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), ref.astype(got.dtypes)
        )
        # matrix totals = corpus size
        assert int(got["n"].sum()) == len(actual)


class TestNativeImageCodecs:
    """Spec-driven pins for the codec-free BMP/PNG paths: payloads are
    hand-built byte-by-byte per the format specs (not by our own
    encoders), so the decoders are validated externally."""

    def test_bmp_hand_built_bytes(self):
        import struct

        from suckit_ray.stages.media import _parse_bmp

        # 2x2 24-bit bottom-up BMP. Rows padded to 4 bytes (2*3=6 -> 8).
        # Bottom row first in file; pixels stored BGR.
        px = {
            (0, 0): (255, 0, 0),   # top-left red
            (0, 1): (0, 255, 0),   # top-right green
            (1, 0): (0, 0, 255),   # bottom-left blue
            (1, 1): (255, 255, 255),
        }
        def bgr(rgb):
            return bytes([rgb[2], rgb[1], rgb[0]])
        row_bottom = bgr(px[(1, 0)]) + bgr(px[(1, 1)]) + b"\x00\x00"
        row_top = bgr(px[(0, 0)]) + bgr(px[(0, 1)]) + b"\x00\x00"
        body = row_bottom + row_top
        off = 54
        data = (
            b"BM"
            + struct.pack("<IHHI", off + len(body), 0, 0, off)
            + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0,
                          len(body), 0, 0, 0, 0)
            + body
        )
        meta, arr = _parse_bmp(data)
        assert (meta["width"], meta["height"], meta["channels"]) == (2, 2, 3)
        assert tuple(arr[0, 0]) == (255, 0, 0)
        assert tuple(arr[0, 1]) == (0, 255, 0)
        assert tuple(arr[1, 0]) == (0, 0, 255)
        assert tuple(arr[1, 1]) == (255, 255, 255)

    def test_png_hand_built_all_filters(self):
        import struct
        import zlib

        from suckit_ray.stages.media import _parse_png

        # 3x5 grayscale image exercising filters 0,1,2,3,4 one per row.
        truth = np.array(
            [[10, 20, 30],
             [15, 25, 35],
             [20, 30, 40],
             [25, 35, 45],
             [30, 40, 50]], dtype=np.int32)
        scan = bytearray()
        prior = np.zeros(3, dtype=np.int32)
        for y, f in enumerate([0, 1, 2, 3, 4]):
            rec = truth[y]
            raw = []
            for x in range(3):
                a = int(rec[x - 1]) if x >= 1 else 0
                b = int(prior[x])
                c = int(prior[x - 1]) if x >= 1 else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else (
                        b if pb_ <= pc_ else c)
                raw.append((int(rec[x]) - pred) & 0xFF)
            scan.append(f)
            scan.extend(raw)
            prior = rec

        def chunk(typ, payload):
            crc = zlib.crc32(typ + payload) & 0xFFFFFFFF
            return (struct.pack(">I", len(payload)) + typ + payload
                    + struct.pack(">I", crc))

        data = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 5, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(scan)))
            + chunk(b"IEND", b"")
        )
        meta, arr = _parse_png(data)
        assert (meta["width"], meta["height"], meta["channels"]) == (3, 5, 1)
        assert (arr[:, :, 0] == truth.astype(np.uint8)).all()

    def test_png_palette_and_rgba(self):
        import struct
        import zlib

        from suckit_ray.stages.media import _parse_png

        def chunk(typ, payload):
            crc = zlib.crc32(typ + payload) & 0xFFFFFFFF
            return (struct.pack(">I", len(payload)) + typ + payload
                    + struct.pack(">I", crc))

        # 2x1 palette image: indices 1, 0 over a 2-entry palette
        plte = bytes([10, 20, 30, 200, 210, 220])
        scan = zlib.compress(bytes([0, 1, 0]))
        data = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0))
            + chunk(b"PLTE", plte)
            + chunk(b"IDAT", scan)
            + chunk(b"IEND", b"")
        )
        meta, arr = _parse_png(data)
        assert meta["channels"] == 3
        assert tuple(arr[0, 0]) == (200, 210, 220)
        assert tuple(arr[0, 1]) == (10, 20, 30)

        # RGBA roundtrip through our encoder (self-consistency)
        from suckit_ray.stages.media import _encode_png

        rgba = np.arange(2 * 2 * 4, dtype=np.uint8).reshape(2, 2, 4)
        meta2, back = _parse_png(_encode_png(rgba))
        assert meta2["channels"] == 4
        assert (back == rgba).all()

    def test_bmp_roundtrip_and_resize_stage(self):
        from suckit_ray.stages.media import (
            _encode_bmp,
            _parse_bmp,
            ResizeImage,
            ExtractImageFeatures,
            DecodeImage,
        )

        rgb = np.zeros((4, 4, 3), dtype=np.uint8)
        rgb[:2, :2] = (255, 0, 0)
        rgb[2:, 2:] = (0, 0, 255)
        data = _encode_bmp(rgb)
        meta, back = _parse_bmp(data)
        assert (back == rgb).all()

        batch = pa.table({"body": pa.array([data], pa.binary())})
        dec = DecodeImage(fake=False)(batch)
        m = dec.column("media_meta").to_pylist()[0]
        assert (m["width"], m["height"], m["format"]) == (4, 4, "bmp")

        rs = ResizeImage(2, 2, fake=False)
        out = rs._real_resize(data)
        meta2, arr2 = _parse_bmp(out)
        assert (meta2["width"], meta2["height"]) == (2, 2)

        feats = ExtractImageFeatures(fake=False)._real_features(data)
        assert feats.shape == (64,)
        assert float(np.abs(feats).sum()) > 0

    def test_png_resize_stage_roundtrip(self):
        from suckit_ray.stages.media import (
            _encode_png,
            _parse_png,
            ResizeImage,
        )

        g = np.arange(64, dtype=np.uint8).reshape(8, 8, 1)
        data = _encode_png(g)
        out = ResizeImage(4, 4, fake=False)._real_resize(data)
        meta, arr = _parse_png(out)
        assert (meta["width"], meta["height"], meta["channels"]) == (4, 4, 1)


class TestNativeCodecReviewFixes:
    def test_unsupported_variants_fall_through_to_none(self):
        """Interlaced PNG and core-header BMP must return None from
        the native dispatch (PIL fallback reachable), not raise."""
        import struct
        import zlib

        from suckit_ray.stages.media import (
            _image_meta_native,
            _parse_image_native,
        )

        def chunk(typ, payload):
            crc = zlib.crc32(typ + payload) & 0xFFFFFFFF
            return (struct.pack(">I", len(payload)) + typ + payload
                    + struct.pack(">I", crc))

        interlaced = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1))
            + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
            + chunk(b"IEND", b"")
        )
        assert _parse_image_native(interlaced) is None

        core_bmp = (
            b"BM" + struct.pack("<IHHI", 26 + 12, 0, 0, 26)
            + struct.pack("<IHHHH", 12, 2, 2, 1, 24) + b"\x00" * 24
        )
        assert _parse_image_native(core_bmp) is None
        assert _image_meta_native(core_bmp) is None

    def test_alpha_excluded_from_luminance(self):
        from suckit_ray.stages.media import _netpbm_gray

        ga = np.zeros((2, 2, 2), dtype=np.uint8)
        ga[:, :, 0] = 100   # gray
        ga[:, :, 1] = 255   # alpha
        assert (_netpbm_gray(ga) == 100.0).all()
        rgba = np.zeros((2, 2, 4), dtype=np.uint8)
        rgba[:, :, 3] = 255  # transparent black
        assert (_netpbm_gray(rgba) == 0.0).all()

    def test_32bit_bmp_alpha_roundtrip(self):
        from suckit_ray.stages.media import _encode_bmp, _parse_bmp

        rgba = np.arange(2 * 2 * 4, dtype=np.uint8).reshape(2, 2, 4)
        data = _encode_bmp(rgba)
        meta, back = _parse_bmp(data)
        assert meta["channels"] == 4
        assert (back == rgba).all()


@pytest.mark.usefixtures("ray_session")
class TestCompactCli:
    def test_crawl_then_compact_flag_path(self, tmp_path):
        """The --compact-out composition: crawl with per-wave parquet,
        compact, and verify lossless row counts + fewer files."""
        import glob

        import ray.data

        from suckit_ray.config import CrawlConfig
        from suckit_ray.pipelines.crawl import crawl
        from suckit_ray.sinks import compact_parquet
        from suckit_ray.sources.pagestore import (
            SyntheticCorpus,
            SyntheticPageStore,
        )

        corpus = SyntheticCorpus(n_hosts=2, n_docs=60, fanout=3)
        pq_out = str(tmp_path / "pq")
        crawl(
            CrawlConfig(origin=corpus.page_url(0, 0)),
            SyntheticPageStore(corpus),
            seeds=corpus.seeds(),
            num_shards=2,
            output_dir=pq_out,
            collect=False,
        )
        src_files = glob.glob(f"{pq_out}/docs/wave-*/*.parquet")
        n_rows = ray.data.read_parquet(sorted(src_files)).count()
        out = str(tmp_path / "compacted")
        manifest = compact_parquet(
            f"{pq_out}/docs", out, target_bytes=64 * 1024 * 1024
        )
        assert manifest["n_rows"] == n_rows
        assert manifest["out_files"] <= len(src_files)
        assert ray.data.read_parquet(out).count() == n_rows


@pytest.mark.usefixtures("ray_session")
class TestRunsTest:
    def test_engineered_alternation_and_trend(self, tmp_path):
        """Zigzag series = max runs; monotone series = 1 run."""
        from suckit_ray.pipelines.relops import events_runs_test

        zig = [(d, "A", float(10 if d % 2 else 20)) for d in range(8)]
        _write_events(tmp_path / "z" if False else tmp_path, zig,
                      users=list(range(8)))
        got = events_runs_test(str(tmp_path)).to_pandas().iloc[0]
        assert int(got["n_moves"]) == 7
        assert int(got["n_runs"]) == 7  # every move flips sign

    def test_monotone_single_run(self, tmp_path):
        from suckit_ray.pipelines.relops import events_runs_test

        up = [(d, "A", float(d + 1)) for d in range(6)]
        _write_events(tmp_path, up, users=list(range(6)))
        got = events_runs_test(str(tmp_path)).to_pandas().iloc[0]
        assert int(got["n_runs"]) == 1
        assert int(got["n_minus"]) == 0
        # E[R] with nm=0 is exactly 1
        assert int(got["expected_micro"]) == 1_000_000

    def test_zero_changes_excluded(self, tmp_path):
        """A flat middle day contributes no move."""
        from suckit_ray.pipelines.relops import events_runs_test

        rows = [(0, "A", 1.0), (1, "A", 1.0), (2, "A", 5.0)]
        _write_events(tmp_path, rows, users=[1, 2, 3])
        got = events_runs_test(str(tmp_path)).to_pandas().iloc[0]
        assert int(got["n_moves"]) == 1  # day0->1 flat, day1->2 up
        assert int(got["n_plus"]) == 1


@pytest.mark.usefixtures("ray_session")
class TestMannKendall:
    def test_monotone_series_hits_max_s(self, tmp_path):
        from suckit_ray.pipelines.relops import events_mann_kendall

        rows = [(d, "A", float(d + 1)) for d in range(6)]
        _write_events(tmp_path, rows, users=list(range(6)))
        got = events_mann_kendall(str(tmp_path)).to_pandas().iloc[0]
        assert int(got["s_stat"]) == 15  # C(6,2), all concordant
        assert int(got["n_neg"]) == 0 and int(got["n_tie"]) == 0

    def test_pair_identity_on_sf(self):
        from suckit_ray.pipelines.relops import events_mann_kendall

        got = events_mann_kendall(SF).to_pandas().iloc[0]
        n = int(got["n_days"])
        assert (
            int(got["n_pos"]) + int(got["n_neg"]) + int(got["n_tie"])
            == n * (n - 1) // 2
        )
        assert int(got["s_stat"]) == int(got["n_pos"]) - int(got["n_neg"])
