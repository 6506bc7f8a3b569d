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
