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
