"""Thirteenth-session operator pins: Gini concentration, weekday
seasonality chi-square, per-nation HHI, two-sample KS drift."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _write_events(tmp_path, rows):
    """rows: list of (day:int, etype:str, value:float)."""
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                [d * 86_400_000_000 for d, _, _ in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([t for _, t, _ in rows], pa.string()),
            "value": pa.array([v for _, _, v in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")


@pytest.mark.usefixtures("ray_session")
class TestGini:
    def test_equal_values_gini_zero(self, tmp_path):
        _write_events(tmp_path, [(d, "eq", 3.5) for d in range(8)])
        from suckit_ray.pipelines.relops import events_gini

        got = events_gini(str(tmp_path)).to_pandas()
        assert got.iloc[0]["gini_micro"] == 0
        assert got.iloc[0]["n"] == 8
        assert got.iloc[0]["total_c"] == 8 * 350

    def test_monopoly_approaches_one(self, tmp_path):
        # 9 near-zero cents + one holding the mass: G = (n-1)/n - eps
        rows = [(d, "mono", 0.01) for d in range(9)] + [(9, "mono", 999.91)]
        _write_events(tmp_path, rows)
        from suckit_ray.pipelines.relops import events_gini

        got = events_gini(str(tmp_path)).to_pandas().iloc[0]
        # exact closed form: sorted cents [1]*9 + [99991]
        v = [1] * 9 + [99991]
        n, tot = 10, sum(v)
        wsum = sum((i + 1) * x for i, x in enumerate(v))
        expect = (1_000_000 * (2 * wsum - (n + 1) * tot)) // (n * tot)
        assert got["gini_micro"] == expect
        assert got["gini_micro"] > 890_000  # dominated by the monopolist

    def test_matches_python_replay_random(self, tmp_path):
        rng = np.random.RandomState(13)
        vals = (rng.randint(1, 5000, size=200) / 100.0).tolist()
        _write_events(
            tmp_path,
            [(i % 30, "a" if i % 3 else "b", v) for i, v in enumerate(vals)],
        )
        from suckit_ray.pipelines.relops import events_gini, to_cents

        got = (
            events_gini(str(tmp_path))
            .to_pandas()
            .set_index("event_type")
        )
        df = pd.DataFrame(
            {
                "t": ["a" if i % 3 else "b" for i in range(len(vals))],
                "c": to_cents(pd.Series(vals)),
            }
        )
        for t, sub in df.groupby("t"):
            v = sorted(int(x) for x in sub["c"])
            n, tot = len(v), sum(v)
            wsum = sum((i + 1) * x for i, x in enumerate(v))
            expect = (1_000_000 * (2 * wsum - (n + 1) * tot)) // (n * tot)
            assert got.loc[t, "gini_micro"] == expect
            assert got.loc[t, "n"] == n


@pytest.mark.usefixtures("ray_session")
class TestSeasonality:
    def test_all_mondays_closed_form(self, tmp_path):
        # day 4 = 1970-01-05 is a Monday (isodow 1)
        days = [4 + 7 * k for k in range(6)]
        _write_events(tmp_path, [(d, "m", 1.0) for d in days])
        from suckit_ray.pipelines.relops import events_seasonality

        got = events_seasonality(str(tmp_path)).to_pandas().iloc[0]
        n = len(days)
        assert got["cnt_d1"] == n
        assert all(got[f"cnt_d{d}"] == 0 for d in range(2, 8))
        # chi2 = (1e6 * (36n^2 + 6n^2)) // (7n) = 6e6 * n
        assert got["chi2_uniform_micro"] == 6_000_000 * n

    def test_uniform_week_is_zero(self, tmp_path):
        _write_events(
            tmp_path, [(d, "u", 1.0) for d in range(14)]
        )  # two full weeks, every weekday twice
        from suckit_ray.pipelines.relops import events_seasonality

        got = events_seasonality(str(tmp_path)).to_pandas().iloc[0]
        assert got["chi2_uniform_micro"] == 0
        assert all(got[f"cnt_d{d}"] == 2 for d in range(1, 8))


@pytest.mark.usefixtures("ray_session")
class TestCustomerHHI:
    def _write(self, tmp_path, cust_nation, order_cents):
        """cust_nation: {custkey: nationkey}; order_cents: list of
        (custkey, cents)."""
        pq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array(
                        list(cust_nation), pa.int64()
                    ),
                    "c_nationkey": pa.array(
                        [cust_nation[k] for k in cust_nation], pa.int64()
                    ),
                }
            ),
            tmp_path / "customer.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "o_custkey": pa.array(
                        [c for c, _ in order_cents], pa.int64()
                    ),
                    "o_totalprice": pa.array(
                        [c / 100.0 for _, c in order_cents], pa.float64()
                    ),
                }
            ),
            tmp_path / "orders.parquet",
        )
        pq.write_table(
            pa.table(
                {
                    "n_nationkey": pa.array([0, 1], pa.int64()),
                    "n_name": pa.array(["ALPHA", "BETA"], pa.string()),
                }
            ),
            tmp_path / "nation.parquet",
        )

    def test_monopoly_and_duopoly(self, tmp_path):
        self._write(
            tmp_path,
            {1: 0, 2: 1, 3: 1, 4: 1},
            [(1, 5000), (2, 700), (3, 700), (2, 0)],
        )
        from suckit_ray.pipelines.relops import customer_hhi

        got = customer_hhi(str(tmp_path)).to_pandas().set_index("n_name")
        assert got.loc["ALPHA", "hhi_micro"] == 1_000_000  # monopoly
        assert got.loc["ALPHA", "n_customers"] == 1
        # two equal customers: HHI = 1/2; customer 4 never ordered
        assert got.loc["BETA", "hhi_micro"] == 500_000
        assert got.loc["BETA", "n_customers"] == 2
        assert got.loc["BETA", "total_c"] == 1400

    def test_matches_python_replay(self, tmp_path):
        rng = np.random.RandomState(7)
        cust = {k: int(k % 2) for k in range(1, 40)}
        orders = [
            (int(rng.randint(1, 40)), int(rng.randint(100, 10_000)))
            for _ in range(300)
        ]
        self._write(tmp_path, cust, orders)
        from suckit_ray.pipelines.relops import customer_hhi

        got = customer_hhi(str(tmp_path)).to_pandas().set_index("n_name")
        tot = {}
        for c, cents in orders:
            tot[c] = tot.get(c, 0) + cents
        for nk, name in [(0, "ALPHA"), (1, "BETA")]:
            xs = [v for c, v in tot.items() if cust[c] == nk and v > 0]
            T = sum(xs)
            expect = (1_000_000 * sum(x * x for x in xs)) // (T * T)
            assert got.loc[name, "hhi_micro"] == expect
            assert got.loc[name, "n_customers"] == len(xs)


@pytest.mark.usefixtures("ray_session")
class TestKSTest:
    def test_disjoint_supports_ks_one(self, tmp_path):
        rows = [(d, "a", 1.0) for d in range(5)] + [
            (d, "b", 2.0) for d in range(7)
        ]
        _write_events(tmp_path, rows)
        from suckit_ray.pipelines.relops import events_ks_test

        got = events_ks_test(str(tmp_path)).to_pandas().iloc[0]
        assert (got["type_a"], got["type_b"]) == ("a", "b")
        assert (got["n_a"], got["n_b"]) == (5, 7)
        assert got["ks_micro"] == 1_000_000

    def test_identical_distributions_ks_zero(self, tmp_path):
        rows = [(d, t, float(1 + d % 3)) for d in range(12) for t in "ab"]
        _write_events(tmp_path, rows)
        from suckit_ray.pipelines.relops import events_ks_test

        got = events_ks_test(str(tmp_path)).to_pandas().iloc[0]
        assert got["ks_micro"] == 0

    def test_matches_scipy_style_replay(self, tmp_path):
        rng = np.random.RandomState(99)
        rows = []
        for i in range(150):
            rows.append((i % 20, "a", float(rng.randint(1, 50)) / 10))
        for i in range(100):
            rows.append((i % 20, "b", float(rng.randint(20, 70)) / 10))
        _write_events(tmp_path, rows)
        from suckit_ray.pipelines.relops import events_ks_test, to_cents

        got = events_ks_test(str(tmp_path)).to_pandas().iloc[0]
        a = np.sort(
            to_cents(pd.Series([v for _, t, v in rows if t == "a"]))
        )
        b = np.sort(
            to_cents(pd.Series([v for _, t, v in rows if t == "b"]))
        )
        grid = np.unique(np.concatenate([a, b]))
        cum_a = np.searchsorted(a, grid, side="right")
        cum_b = np.searchsorted(b, grid, side="right")
        ks_num = int(
            np.abs(
                len(b) * cum_a.astype(object) - len(a) * cum_b.astype(object)
            ).max()
        )
        expect = (1_000_000 * ks_num) // (len(a) * len(b))
        assert got["ks_micro"] == expect
        assert (got["n_a"], got["n_b"]) == (len(a), len(b))


@pytest.mark.usefixtures("ray_session")
class TestAssocRules:
    def _write_lineitem(self, tmp_path, baskets):
        """baskets: {orderkey: [partkeys]}."""
        ok, pk = [], []
        for o, parts in baskets.items():
            for p in parts:
                ok.append(o)
                pk.append(p)
        pq.write_table(
            pa.table(
                {
                    "l_orderkey": pa.array(ok, pa.int64()),
                    "l_partkey": pa.array(pk, pa.int64()),
                }
            ),
            tmp_path / "lineitem.parquet",
        )

    def test_confidence_is_directional(self, tmp_path):
        # A appears in 4 baskets, B in 2; {A,B} co-occur in 2.
        self._write_lineitem(
            tmp_path,
            {1: [10, 20], 2: [10, 20], 3: [10], 4: [10], 5: [99]},
        )
        from suckit_ray.pipelines.relops import lineitem_assoc_rules

        got = (
            lineitem_assoc_rules(str(tmp_path))
            .to_pandas()
            .set_index(["antecedent", "consequent"])
        )
        assert got.loc[(10, 20), "conf_micro"] == 500_000  # 2/4
        assert got.loc[(20, 10), "conf_micro"] == 1_000_000  # 2/2
        # lift symmetric: 1e6 * 5 * 2 // (4 * 2)
        assert got.loc[(10, 20), "lift_micro"] == 1_250_000
        assert got.loc[(20, 10), "lift_micro"] == 1_250_000
        assert len(got) == 2

    def test_rules_superset_of_pairs(self, tmp_path):
        rng = np.random.RandomState(3)
        baskets = {
            o: list({int(rng.randint(1, 12)) for _ in range(4)})
            for o in range(40)
        }
        self._write_lineitem(tmp_path, baskets)
        from suckit_ray.pipelines.relops import (
            lineitem_assoc_rules,
            lineitem_frequent_pairs,
        )

        pairs = lineitem_frequent_pairs(str(tmp_path)).to_pandas()
        rules = lineitem_assoc_rules(str(tmp_path)).to_pandas()
        assert len(rules) == 2 * len(pairs)
        merged = rules.merge(
            pairs,
            left_on=["antecedent", "consequent"],
            right_on=["part_a", "part_b"],
            how="inner",
        )
        assert len(merged) == len(pairs)
        assert (merged["support_x"] == merged["support_y"]).all()
        assert (merged["lift_micro_x"] == merged["lift_micro_y"]).all()


@pytest.mark.usefixtures("ray_session")
class TestCohortRetention:
    def test_triangle_counts(self, tmp_path):
        # cust 1: Jan+Feb 1995; cust 2: Jan only; cust 3: Feb+Apr.
        rows = [
            (1, "1995-01-05"),
            (1, "1995-01-20"),  # same month, dedup
            (1, "1995-02-01"),
            (2, "1995-01-09"),
            (3, "1995-02-14"),
            (3, "1995-04-30"),
        ]
        pq.write_table(
            pa.table(
                {
                    "o_custkey": pa.array([c for c, _ in rows], pa.int64()),
                    "o_orderdate": pa.array(
                        [np.datetime64(d, "us") for _, d in rows],
                        pa.timestamp("us"),
                    ),
                }
            ),
            tmp_path / "orders.parquet",
        )
        from suckit_ray.pipelines.relops import orders_cohort_retention

        got = (
            orders_cohort_retention(str(tmp_path))
            .to_pandas()
            .set_index(["cohort_month", "month_offset"])["n_customers"]
        )
        assert got[("1995-01", 0)] == 2
        assert got[("1995-01", 1)] == 1
        assert got[("1995-02", 0)] == 1
        assert got[("1995-02", 2)] == 1
        assert len(got) == 4


@pytest.mark.usefixtures("ray_session")
class TestTheilSen:
    def test_exact_ramp_slope(self, tmp_path):
        # y = 100 + 250t cents/day: every pairwise slope is 250 cents
        _write_events(
            tmp_path, [(d, "r", 1.0 + 2.5 * d) for d in range(10)]
        )
        from suckit_ray.pipelines.relops import events_theilsen

        got = events_theilsen(str(tmp_path)).to_pandas().iloc[0]
        assert got["slope_micro"] == 250_000_000
        assert got["n_days"] == 10
        assert got["n_pairs"] == 45

    def test_outlier_immunity_and_negative_trunc(self, tmp_path):
        # declining ramp with one wild outlier: the median slope stays
        # on the ramp; negative slopes exercise trunc-vs-floor
        rows = [(d, "n", 50.0 - 0.33 * d) for d in range(15)]
        rows[7] = (7, "n", 5000.0)
        _write_events(tmp_path, rows)
        from suckit_ray.pipelines.relops import events_theilsen, to_cents

        got = events_theilsen(str(tmp_path)).to_pandas().iloc[0]
        y = [int(x) for x in to_cents(pd.Series([v for _, _, v in rows]))]

        def tdiv(a, b):
            q = a // b
            if q < 0 and q * b != a:
                q += 1
            return q

        slopes = sorted(
            tdiv(1_000_000 * (y[j] - y[i]), j - i)
            for i in range(15)
            for j in range(i + 1, 15)
        )
        expect = slopes[(len(slopes) - 1) // 2]
        assert got["slope_micro"] == expect
        assert -34_000_000 < got["slope_micro"] < -32_000_000


@pytest.mark.usefixtures("ray_session")
class TestC4Filter:
    DOCS = [
        # 0: clean page, 6 sentences across kept lines -> keep
        "The quick brown fox jumps. It runs far! Does it rest? Yes.\n"
        "Another fine line with words. And one more here.",
        # 1: terminal-punct rule: middle line dropped (no terminal)
        "First sentence is here. Second one too! A third? A 4th. A 5th.\n"
        "this line has no terminal punctuation\n"
        'He said "stop there."',
        # 2: <3 words per line: dropped lines
        "Hi.\nNo!\nThis line has enough words. One. Two. Three. Four!",
        # 3: javascript line dropped
        "Please enable JavaScript to continue.\n"
        "Real content sentence one. Two. Three. Four. Five. Six.",
        # 4: lorem ipsum page -> drop whole page
        "Lorem ipsum dolor sit amet. Real text. More. And. More. Yes.",
        # 5: curly brace page -> drop
        "function() { return 1; } Fine sentences. One. Two. Three. Four.",
        # 6: fewer than 5 sentences after cleaning -> drop
        "Only two sentences here. That is all!",
        # 7: trailing whitespace before terminal still kept
        "Ends with spaces after period.   \nSecond line counts too! "
        "Third. Fourth? Fifth. Sixth.",
        # 8: unicode closing quote terminal
        "She replied “fine then.” More words follow. One. Two. Three. Four?",
    ]

    def _write(self, tmp_path):
        n = len(self.DOCS)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(n), pa.int64()),
                    "text": pa.array(self.DOCS, pa.string()),
                    "lang": pa.array(["en"] * n, pa.string()),
                    "source": pa.array(["t"] * n, pa.string()),
                    "n_chars": pa.array(
                        [len(d) for d in self.DOCS], pa.int64()
                    ),
                }
            ),
            tmp_path / "documents.parquet",
        )

    def test_rules_and_oracle_parity(self, tmp_path):
        import duckdb

        import __ray_entry__
        from suckit_ray.pipelines.textops import docs_c4_filter

        self._write(tmp_path)
        got = (
            docs_c4_filter(str(tmp_path))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # rule-by-rule expectations
        g = got.set_index("doc_id")
        assert bool(g.loc[0, "keep"]) and g.loc[0, "n_kept"] == 2
        assert g.loc[1, "n_kept"] == 2  # middle line dropped
        assert g.loc[2, "n_kept"] == 1  # two short lines dropped
        assert g.loc[3, "n_kept"] == 1  # javascript line dropped
        assert not bool(g.loc[4, "keep"])  # lorem ipsum
        assert not bool(g.loc[5, "keep"])  # curly brace
        assert not bool(g.loc[6, "keep"])  # < 5 sentences
        assert bool(g.loc[7, "keep"])  # trailing-space terminal kept
        assert g.loc[7, "n_kept"] == 2
        assert bool(g.loc[8, "keep"])  # unicode closing quote
        assert "\n" not in g.loc[3, "kept_text"]
        # byte-for-byte oracle parity on the adversarial corpus
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')"
        )
        odf = (
            con.execute(__ray_entry__.oracle_sql()["docs_c4_filter"])
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for c in ["n_lines", "n_kept", "n_sentences", "kept_text", "keep"]:
            assert (got[c].values == odf[c].values).all(), c
