"""Independent references for the third TPC-H batch
(suckit_ray/pipelines/tpch2.py — the adapted partsupp family): each
query re-derived with plain pandas joins — no co-groups, no
broadcasts, no predicate pushdown — so a shared misreading of the
adapted spec can't pass both this and the DuckDB oracle."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from suckit_ray.pipelines import tpch2
from suckit_ray.pipelines.relops import to_cents

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.usefixtures("ray_session")


def cents(s: pd.Series) -> np.ndarray:
    # the engine's own half-away-from-zero idiom (floor(x+0.5) is
    # subtly wrong near representation boundaries — see to_cents)
    return to_cents(s).to_numpy()


def _tables(*names):
    return [pq.read_table(f"{SF}/{t}.parquet").to_pandas() for t in names]


def test_q2_matches_pandas_reference():
    li, part, supp, nat, reg = _tables(
        "lineitem", "part", "supplier", "nation", "region"
    )
    li = li.copy()
    li["cost"] = cents(li["l_extendedprice"])
    cost = li.groupby(["l_partkey", "l_suppkey"], as_index=False).agg(
        cost=("cost", "min")
    )
    m = (
        cost.merge(part, left_on="l_partkey", right_on="p_partkey")
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
        .merge(nat, left_on="s_nationkey", right_on="n_nationkey")
        .merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    )
    m = m[
        (m["r_name"] == tpch2.Q2_REGION)
        & (m["p_size"] <= tpch2.Q2_SIZE_LE)
        & (m["p_type"] == tpch2.Q2_TYPE)
    ].copy()
    mn = m.groupby("p_partkey")["cost"].transform("min")
    want = (
        m[m["cost"] == mn][
            ["p_partkey", "s_suppkey", "s_name", "n_name", "cost"]
        ]
        .rename(columns={"cost": "cost_c"})
        .sort_values(["p_partkey", "s_suppkey"])
        .reset_index(drop=True)
    )
    got = tpch2.q2_min_cost_supplier(SF).to_pandas()
    assert len(want) > 0  # the filter actually selects parts
    pd.testing.assert_frame_equal(
        got.astype({"p_partkey": "int64", "s_suppkey": "int64"}),
        want.astype({"p_partkey": "int64", "s_suppkey": "int64"}),
    )


def test_q9_matches_pandas_reference():
    li, part, supp, nat, orders = _tables(
        "lineitem", "part", "supplier", "nation", "orders"
    )
    m = (
        li.merge(part, left_on="l_partkey", right_on="p_partkey")
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
        .merge(nat, left_on="s_nationkey", right_on="n_nationkey")
        .merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    )
    m = m[m["p_name"].str.contains(tpch2.Q9_NAME_CONTAINS, regex=False)].copy()
    m["profit"] = cents(m["l_extendedprice"]) * (
        100 - cents(m["l_discount"])
    ) - m["l_quantity"].astype("int64") * cents(m["p_retailprice"]) * 100
    m["o_year"] = m["o_orderdate"].dt.year.astype("int64")
    want = (
        m.groupby(["n_name", "o_year"], as_index=False)
        .agg(profit_i4=("profit", "sum"))
        .sort_values(["n_name", "o_year"])
        .reset_index(drop=True)
    )
    got = (
        tpch2.q9_product_profit(SF)
        .to_pandas()
        .sort_values(["n_name", "o_year"])
        .reset_index(drop=True)
    )
    assert len(want) > 0
    pd.testing.assert_frame_equal(
        got.astype({"profit_i4": "int64"}),
        want.astype({"profit_i4": "int64"}),
    )


def test_q11_matches_pandas_reference():
    li, supp, nat = _tables("lineitem", "supplier", "nation")
    m = li.merge(supp, left_on="l_suppkey", right_on="s_suppkey").merge(
        nat, left_on="s_nationkey", right_on="n_nationkey"
    )
    m = m[m["n_name"] == tpch2.Q11_NATION].copy()
    m["value_c"] = cents(m["l_extendedprice"])
    v = m.groupby("l_partkey", as_index=False).agg(value_c=("value_c", "sum"))
    total = int(v["value_c"].sum())
    want = (
        v[v["value_c"] * tpch2.Q11_FRACTION_DEN > total]
        .sort_values("l_partkey")
        .reset_index(drop=True)
    )
    got = (
        tpch2.q11_important_stock(SF)
        .to_pandas()
        .sort_values("l_partkey")
        .reset_index(drop=True)
    )
    assert len(want) > 0
    assert len(want) < len(v)  # the threshold actually prunes
    pd.testing.assert_frame_equal(
        got.astype({"l_partkey": "int64", "value_c": "int64"}),
        want.astype({"l_partkey": "int64", "value_c": "int64"}),
    )


def test_q12_matches_pandas_reference():
    li, orders = _tables("lineitem", "orders")
    m = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    m = m[
        (m["l_shipdate"] >= pd.Timestamp(tpch2.Q12_SHIP_LO))
        & (m["l_shipdate"] < pd.Timestamp(tpch2.Q12_SHIP_HI))
        & (
            m["l_shipdate"]
            > m["o_orderdate"] + pd.Timedelta(days=tpch2.Q12_LATE_DAYS)
        )
    ].copy()
    m["high"] = m["o_orderpriority"].isin(tpch2.Q12_HIGH).astype(int)
    want = (
        m.groupby("l_returnflag", as_index=False)
        .agg(
            high_line_count=("high", "sum"),
            low_line_count=("high", lambda s: int((1 - s).sum())),
        )
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    got = tpch2.q12_shipmode_priority(SF).to_pandas()
    assert len(want) > 0
    pd.testing.assert_frame_equal(
        got.astype({"high_line_count": "int64", "low_line_count": "int64"}),
        want.astype({"high_line_count": "int64", "low_line_count": "int64"}),
    )


def test_q16_matches_pandas_reference():
    li, part, supp = _tables("lineitem", "part", "supplier")
    ps = li[["l_partkey", "l_suppkey"]].drop_duplicates()
    bad = set(supp.loc[supp["s_acctbal"] < 0, "s_suppkey"].astype(int))
    m = ps.merge(part, left_on="l_partkey", right_on="p_partkey")
    m = m[
        (m["p_brand"] != tpch2.Q16_BRAND_NOT)
        & (m["p_type"] != tpch2.Q16_TYPE_NOT)
        & m["p_size"].isin(tpch2.Q16_SIZES)
        & ~m["l_suppkey"].isin(bad)
    ]
    want = (
        m.groupby(["p_brand", "p_type", "p_size"], as_index=False)
        .agg(supplier_cnt=("l_suppkey", "nunique"))
        .sort_values(["p_brand", "p_type", "p_size"])
        .reset_index(drop=True)
    )
    want["p_size"] = want["p_size"].astype("int64")
    got = (
        tpch2.q16_supplier_part_count(SF)
        .to_pandas()
        .sort_values(["p_brand", "p_type", "p_size"])
        .reset_index(drop=True)
    )
    assert len(want) > 0
    pd.testing.assert_frame_equal(
        got.astype({"supplier_cnt": "int64"}),
        want.astype({"supplier_cnt": "int64"}),
    )


def test_q20_matches_pandas_reference():
    li, part, supp, nat = _tables("lineitem", "part", "supplier", "nation")
    m = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    m = m[
        m["p_name"].str.startswith(tpch2.Q20_NAME_PREFIX)
        & (m["l_shipdate"] >= pd.Timestamp(tpch2.Q20_SHIP_LO))
        & (m["l_shipdate"] < pd.Timestamp(tpch2.Q20_SHIP_HI))
    ].copy()
    m["qty"] = m["l_quantity"].astype("int64")
    q = m.groupby(["l_partkey", "l_suppkey"], as_index=False).agg(
        qty=("qty", "sum")
    )
    tot = q.groupby("l_partkey")["qty"].transform("sum")
    q = q[q["qty"] * 2 > tot]
    nkeys = set(
        nat.loc[nat["n_name"] == tpch2.Q20_NATION, "n_nationkey"].astype(int)
    )
    nation_supp = set(
        supp.loc[supp["s_nationkey"].isin(nkeys), "s_suppkey"].astype(int)
    )
    win = sorted(set(q["l_suppkey"].astype(int)) & nation_supp)
    want = (
        supp[supp["s_suppkey"].isin(win)][["s_suppkey", "s_name"]]
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )
    got = tpch2.q20_promo_suppliers(SF).to_pandas()
    assert len(want) > 0  # the dominating-share filter selects someone
    pd.testing.assert_frame_equal(
        got.astype({"s_suppkey": "int64"}), want.astype({"s_suppkey": "int64"})
    )


def test_q2_empty_qualification_is_well_formed():
    # point the part filter at an impossible slice via monkeypatched
    # constants: the co-group plan must return an EMPTY typed table,
    # not raise on zero qualifying rows
    orig = tpch2.Q2_TYPE
    tpch2.Q2_TYPE = "NO_SUCH_TYPE"
    try:
        got = tpch2.q2_min_cost_supplier(SF).to_pandas()
        assert len(got) == 0
        assert list(got.columns) == [
            "p_partkey", "s_suppkey", "s_name", "n_name", "cost_c",
        ]
    finally:
        tpch2.Q2_TYPE = orig


def test_q20_empty_qualification_is_well_formed():
    orig = tpch2.Q20_NAME_PREFIX
    tpch2.Q20_NAME_PREFIX = "no such prefix "
    try:
        got = tpch2.q20_promo_suppliers(SF).to_pandas()
        assert len(got) == 0
        assert list(got.columns) == ["s_suppkey", "s_name"]
    finally:
        tpch2.Q20_NAME_PREFIX = orig
