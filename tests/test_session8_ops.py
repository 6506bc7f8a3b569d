"""Independent reference pins for the eighth-session operators —
each oracle-backed query also gets a from-first-principles Python
reference (the repo convention: the SQL oracle pins engine-vs-DuckDB,
these pin both against a third, hand-rolled implementation)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
class TestPartSkyline:
    def _mine(self):
        from suckit_ray.pipelines import relops

        return (
            relops.part_skyline(SF)
            .to_pandas()
            .sort_values("p_partkey")
            .reset_index(drop=True)
        )

    def test_vs_brute_force_dominance(self):
        """O(n²) literal dominance scan — no sorting tricks shared
        with the engine's lexsort implementation."""
        from suckit_ray.pipelines import relops

        part = pd.read_parquet(f"{SF}/part.parquet")
        price = relops.to_cents(part["p_retailprice"]).to_numpy()
        size = part["p_size"].to_numpy().astype("int64")
        keep = []
        for i in range(len(part)):
            dominated = np.any(
                (price <= price[i])
                & (size >= size[i])
                & ((price < price[i]) | (size > size[i]))
            )
            if not dominated:
                keep.append(i)
        ref = (
            pd.DataFrame(
                {
                    "p_partkey": part["p_partkey"].to_numpy()[keep],
                    "price_c": price[keep],
                    "p_size": size[keep],
                }
            )
            .sort_values("p_partkey")
            .reset_index(drop=True)
        )
        mine = self._mine()
        pd.testing.assert_frame_equal(
            mine.astype("int64"), ref.astype("int64")
        )

    def test_extremes_present(self):
        """The cheapest part and the largest part are always Pareto
        points (ties resolved: at least one of each group survives)."""
        from suckit_ray.pipelines import relops

        part = pd.read_parquet(f"{SF}/part.parquet")
        price = relops.to_cents(part["p_retailprice"]).to_numpy()
        size = part["p_size"].to_numpy().astype("int64")
        mine = self._mine()
        assert (mine["price_c"] == price.min()).any()
        assert (mine["p_size"] == size.max()).any()

    def test_ties_survive_together(self):
        """Equal (price, size) duplicates never dominate each other:
        a synthetic frame with a duplicated frontier point keeps both."""
        from suckit_ray.pipelines.relops import _skyline_2d

        df = pd.DataFrame(
            {
                "p_partkey": [1, 2, 3, 4],
                "price_c": [100, 100, 50, 200],
                "p_size": [9, 9, 3, 9],
            }
        )
        out = _skyline_2d(df)
        # (100,9) twice: both kept; (50,3) kept (cheapest);
        # (200,9) dominated by (100,9)
        assert sorted(out["p_partkey"].tolist()) == [1, 2, 3]


@pytest.mark.usefixtures("ray_session")
class TestNewVsReturning:
    def test_vs_pandas_reference(self):
        from suckit_ray.pipelines import relops

        ev = pd.read_parquet(f"{SF}/events.parquet")
        us = ev["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        day = us // 86_400_000_000
        day = day + ((us < 0) & (day * 86_400_000_000 != us))
        du = (
            pd.DataFrame({"u": ev["user_id"].astype("int64"), "day": day})
            .drop_duplicates()
        )
        first = du.groupby("u")["day"].transform("min")
        ref = (
            pd.DataFrame(
                {
                    "day": du["day"],
                    "active_users": 1,
                    "new_users": (du["day"] == first).astype("int64"),
                }
            )
            .groupby("day", as_index=False)
            .sum()
            .sort_values("day")
            .reset_index(drop=True)
        )
        ref["returning_users"] = ref["active_users"] - ref["new_users"]
        ref["cum_users"] = ref["new_users"].cumsum()
        mine = relops.events_new_vs_returning(SF).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            mine.astype("int64"), ref.astype("int64")
        )

    def test_invariants(self):
        from suckit_ray.pipelines import relops

        out = relops.events_new_vs_returning(SF)
        # day 1 of the corpus: everyone active is new
        assert out.iloc[0]["new_users"] == out.iloc[0]["active_users"]
        assert out.iloc[0]["returning_users"] == 0
        # cumulative distinct users ends at the true distinct count
        ev = pd.read_parquet(f"{SF}/events.parquet")
        assert out.iloc[-1]["cum_users"] == ev["user_id"].nunique()
        # cum is nondecreasing; active = new + returning everywhere
        assert (np.diff(out["cum_users"]) >= 0).all()
        assert (
            out["active_users"]
            == out["new_users"] + out["returning_users"]
        ).all()


@pytest.mark.usefixtures("ray_session")
class TestTrailing7dUsers:
    def test_vs_brute_force_window(self):
        """Literal per-day distinct scan over the raw events — no
        interval/sweep machinery shared with the engine."""
        from suckit_ray.pipelines import relops

        ev = pd.read_parquet(f"{SF}/events.parquet")
        us = ev["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        day = us // 86_400_000_000
        day = day + ((us < 0) & (day * 86_400_000_000 != us))
        du = pd.DataFrame(
            {"u": ev["user_id"].astype("int64"), "day": day}
        ).drop_duplicates()
        lo, hi = int(du["day"].min()), int(du["day"].max())
        ref = pd.DataFrame(
            {
                "day": range(lo, hi + 1),
                "n_users": [
                    du.loc[du["day"].between(d - 6, d), "u"].nunique()
                    for d in range(lo, hi + 1)
                ],
            }
        )
        mine = relops.events_trailing_7d_users(SF).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            mine.astype("int64"), ref.astype("int64")
        )

    def test_gap_days_report_zero(self):
        """A hand-built parquet with a >7-day silence must report 0
        for the uncovered middle days (the diff-array's zero plateau)."""
        import tempfile, os

        from suckit_ray.pipelines import relops

        with tempfile.TemporaryDirectory() as td:
            ts = pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-01-20"], utc=False
            )
            pd.DataFrame(
                {
                    "event_id": [1, 2, 3],
                    "ts": ts,
                    "user_id": [7, 8, 7],
                    "event_type": ["a"] * 3,
                    "value": [1.0] * 3,
                    "props": ["{}"] * 3,
                }
            ).to_parquet(os.path.join(td, "events.parquet"))
            out = relops.events_trailing_7d_users(td)
        d0 = int(out["day"].min())
        by_day = dict(zip(out["day"], out["n_users"]))
        assert by_day[d0] == 1  # day 1: user 7
        assert by_day[d0 + 1] == 2  # day 2: users 7+8
        assert by_day[d0 + 7] == 1  # day 2's window end for user 8
        assert by_day[d0 + 10] == 0  # silence
        assert by_day[d0 + 19] == 1  # user 7 returns
        assert len(out) == 20


@pytest.mark.usefixtures("ray_session")
class TestInvertedIndex:
    def test_vs_dict_reference(self):
        """Plain dict-of-sets postings build."""
        from suckit_ray.pipelines import textops

        docs = pd.read_parquet(f"{SF}/documents.parquet")
        post: dict[str, set[int]] = {}
        for doc_id, text in zip(docs["doc_id"], docs["text"]):
            for t in set(text.lower().split()):
                post.setdefault(t, set()).add(int(doc_id))
        ref = (
            pd.DataFrame(
                {
                    "term": list(post.keys()),
                    "df": [len(v) for v in post.values()],
                    "postings": [
                        ",".join(map(str, sorted(v)[:20]))
                        for v in post.values()
                    ],
                }
            )
            .sort_values("term")
            .reset_index(drop=True)
        )
        mine = (
            textops.docs_inverted_index(SF)
            .to_pandas()
            .sort_values("term")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            mine.astype(str), ref.astype(str), check_dtype=False
        )


@pytest.mark.usefixtures("ray_session")
class TestEditdistPairs:
    def test_vs_brute_force_dp(self):
        """Full O(n²) pairs with a textbook DP — no deletion-
        neighborhood or splice shortcut shared with the engine."""
        from suckit_ray.pipelines import relops

        def dp(a: str, b: str) -> int:
            prev = list(range(len(b) + 1))
            for i, x in enumerate(a, 1):
                cur = [i]
                for j, y in enumerate(b, 1):
                    cur.append(
                        min(
                            prev[j] + 1,
                            cur[j - 1] + 1,
                            prev[j - 1] + (x != y),
                        )
                    )
                prev = cur
            return prev[-1]

        cust = pd.read_parquet(f"{SF}/customer.parquet")
        rows = []
        recs = list(zip(cust["c_custkey"], cust["c_name"]))
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                (ka, na), (kb, nb) = recs[i], recs[j]
                a, b = (ka, kb) if ka < kb else (kb, ka)
                d = dp(na, nb)
                if d <= 1:
                    rows.append((min(ka, kb), max(ka, kb), d))
        ref = (
            pd.DataFrame(
                rows, columns=["a_custkey", "b_custkey", "dist"]
            )
            .sort_values(["a_custkey", "b_custkey"])
            .reset_index(drop=True)
        )
        mine = (
            relops.customer_editdist_pairs(SF)
            .to_pandas()
            .sort_values(["a_custkey", "b_custkey"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            mine.astype("int64"), ref.astype("int64")
        )

    def test_indel_and_duplicate_names(self):
        """TPC-H names are fixed-length (substitution-only), so a
        hand-built parquet pins the insert/delete and distance-0
        branches plus the ("ab","ba") FastSS false positive."""
        import os
        import tempfile

        from suckit_ray.pipelines import relops

        with tempfile.TemporaryDirectory() as td:
            pd.DataFrame(
                {
                    "c_custkey": [1, 2, 3, 4, 5, 6],
                    "c_name": ["cust", "cust1", "cst", "cust", "ab", "ba"],
                    "c_nationkey": [0] * 6,
                    "c_acctbal": [0.0] * 6,
                    "c_mktsegment": ["X"] * 6,
                }
            ).to_parquet(os.path.join(td, "customer.parquet"))
            out = (
                relops.customer_editdist_pairs(td)
                .to_pandas()
                .sort_values(["a_custkey", "b_custkey"])
                .reset_index(drop=True)
            )
        got = set(map(tuple, out.to_numpy()))
        assert got == {
            (1, 2, 1),  # insert '1'
            (1, 3, 1),  # delete 'u'
            (1, 4, 0),  # duplicate name
            (2, 4, 1),
            (3, 4, 1),
            # (5, 6) shares deletion variants but ed=2: verify kills it
        }


@pytest.mark.usefixtures("ray_session")
class TestEntityClusters:
    def test_transitive_chain_merges(self):
        """ed("cust","cust12")=2, but the chain cust ~ cust1 ~ cust12
        merges all three into one entity — clustering is transitive
        over pairs, not pairwise-bounded."""
        import os
        import tempfile

        from suckit_ray.pipelines import relops

        with tempfile.TemporaryDirectory() as td:
            pd.DataFrame(
                {
                    "c_custkey": [10, 11, 12, 99],
                    "c_name": ["cust", "cust1", "cust12", "other"],
                    "c_nationkey": [0] * 4,
                    "c_acctbal": [0.0] * 4,
                    "c_mktsegment": ["X"] * 4,
                }
            ).to_parquet(os.path.join(td, "customer.parquet"))
            out = (
                relops.customer_entity_clusters(td)
                .to_pandas()
                .set_index("c_custkey")["canon_key"]
            )
        assert out[10] == out[11] == out[12] == 10
        assert out[99] == 99

    def test_vs_independent_union_find(self):
        """Union-find over brute-force DP pairs — shares neither the
        blocking nor the cluster machinery with the engine."""
        from suckit_ray.pipelines import relops

        cust = pd.read_parquet(f"{SF}/customer.parquet")
        names = dict(zip(cust["c_custkey"], cust["c_name"]))

        def dp(a, b):
            prev = list(range(len(b) + 1))
            for i, x in enumerate(a, 1):
                cur = [i]
                for j, y in enumerate(b, 1):
                    cur.append(
                        min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (x != y))
                    )
                prev = cur
            return prev[-1]

        parent = {k: k for k in names}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        keys = sorted(names)
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                if dp(names[keys[i]], names[keys[j]]) <= 1:
                    ra, rb = find(keys[i]), find(keys[j])
                    if ra != rb:
                        lo, hi = min(ra, rb), max(ra, rb)
                        parent[hi] = lo
        ref = {k: find(k) for k in keys}
        mine = (
            relops.customer_entity_clusters(SF)
            .to_pandas()
            .set_index("c_custkey")["canon_key"]
            .to_dict()
        )
        assert mine == ref


@pytest.mark.usefixtures("ray_session")
class TestWinsorized:
    def test_vs_pandas_reference(self):
        from suckit_ray.pipelines import relops

        ev = pd.read_parquet(f"{SF}/events.parquet")
        v = relops.to_cents(ev["value"])
        rows = []
        for t, g in v.groupby(ev["event_type"]):
            s = np.sort(g.to_numpy())
            n = len(s)
            lo = int(s[max(1, int(np.ceil(0.05 * n))) - 1])
            hi = int(s[max(1, int(np.ceil(0.95 * n))) - 1])
            rows.append((t, n, lo, hi, int(np.clip(s, lo, hi).sum())))
        ref = (
            pd.DataFrame(
                rows,
                columns=[
                    "event_type", "n", "p05_cents", "p95_cents", "sum_wins_c"
                ],
            )
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        mine = relops.events_value_winsorized(SF).to_pandas()
        pd.testing.assert_frame_equal(
            mine.astype(str), ref.astype(str), check_dtype=False
        )

    def test_outlier_insensitivity(self):
        """One enormous outlier moves the plain sum but barely the
        winsorized sum — the property the operator exists for."""
        import os
        import tempfile

        from suckit_ray.pipelines import relops

        base = {
            "event_id": range(100),
            "ts": pd.to_datetime(["2024-01-01"] * 100),
            "user_id": [1] * 100,
            "event_type": ["x"] * 100,
            "props": ["{}"] * 100,
        }
        with tempfile.TemporaryDirectory() as t1:
            pd.DataFrame({**base, "value": [1.0] * 100}).to_parquet(
                os.path.join(t1, "events.parquet")
            )
            plain = relops.events_value_winsorized(t1).to_pandas()
        with tempfile.TemporaryDirectory() as t2:
            pd.DataFrame(
                {**base, "value": [1.0] * 99 + [1_000_000.0]}
            ).to_parquet(os.path.join(t2, "events.parquet"))
            spiked = relops.events_value_winsorized(t2).to_pandas()
        # the spike is clipped down to P95 = 100 cents
        assert int(plain["sum_wins_c"][0]) == 100 * 100
        assert int(spiked["sum_wins_c"][0]) == 100 * 100
