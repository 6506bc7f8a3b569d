"""Independent references for the second TPC-H batch
(suckit_ray/pipelines/tpch.py): each query re-derived with plain
pandas joins — no co-groups, no broadcasts, no predicate pushdown —
plus empty-qualification guards for the co-group plans. The DuckDB
oracles in __ray_entry__ check engine-vs-SQL; these check
engine-vs-an-independent-python-derivation, so a shared misreading of
the spec can't pass both."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from suckit_ray.pipelines import tpch
from suckit_ray.pipelines.relops import to_cents

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.usefixtures("ray_session")


def cents(s: pd.Series) -> np.ndarray:
    # the engine's own half-away-from-zero idiom (floor(x+0.5) is
    # subtly wrong near representation boundaries — see to_cents)
    return to_cents(s).to_numpy()


def _tables(*names):
    return [pq.read_table(f"{SF}/{t}.parquet").to_pandas() for t in names]


def test_q6_matches_pandas_reference():
    (li,) = _tables("lineitem")
    d = li[
        (li["l_shipdate"] >= pd.Timestamp(tpch.Q6_YEAR_LO))
        & (li["l_shipdate"] < pd.Timestamp(tpch.Q6_YEAR_HI))
    ].copy()
    dc = cents(d["l_discount"])
    keep = (
        (dc >= tpch.Q6_DISC_LO_C)
        & (dc <= tpch.Q6_DISC_HI_C)
        & (d["l_quantity"].to_numpy() < tpch.Q6_QTY_LT)
    )
    want_rev = int((cents(d["l_extendedprice"])[keep] * dc[keep]).sum())
    got = tpch.q6_forecast_revenue(SF).to_pandas()
    assert int(got["n_lines"][0]) == int(keep.sum())
    assert int(got["revenue_i4"][0]) == want_rev
    assert int(keep.sum()) > 0  # the window actually selects rows


def test_q5_matches_pandas_reference():
    cust, orders, li, supp, nat, reg = _tables(
        "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    m = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
        .merge(nat, left_on="c_nationkey", right_on="n_nationkey")
        .merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    )
    m = m[
        (m["r_name"] == tpch.Q5_REGION)
        & (m["c_nationkey"] == m["s_nationkey"])
        & (m["o_orderdate"] >= pd.Timestamp(tpch.Q5_DATE_LO))
        & (m["o_orderdate"] < pd.Timestamp(tpch.Q5_DATE_HI))
    ].copy()
    m["rev"] = cents(m["l_extendedprice"]) * (100 - cents(m["l_discount"]))
    want = (
        m.groupby("n_name", as_index=False)
        .agg(sum_rev=("rev", "sum"), n_lines=("rev", "size"))
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    got = (
        tpch.q5_local_supplier_volume(SF)
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    assert list(got["n_name"]) == list(want["n_name"])
    assert list(got["sum_rev"]) == list(want["sum_rev"])
    assert list(got["n_lines"]) == list(want["n_lines"])
    assert len(got) > 0


def test_q7_matches_pandas_reference():
    cust, orders, li, supp, nat = _tables(
        "customer", "orders", "lineitem", "supplier", "nation"
    )
    name_of = dict(zip(nat["n_nationkey"], nat["n_name"]))
    m = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    )
    m["supp_nation"] = m["s_nationkey"].map(name_of)
    m["cust_nation"] = m["c_nationkey"].map(name_of)
    pair = {tpch.Q7_NATION_A, tpch.Q7_NATION_B}
    m = m[
        m["supp_nation"].isin(pair)
        & m["cust_nation"].isin(pair)
        & (m["supp_nation"] != m["cust_nation"])
        & (m["l_shipdate"] >= pd.Timestamp(tpch.Q7_SHIP_LO))
        & (m["l_shipdate"] < pd.Timestamp(tpch.Q7_SHIP_HI))
    ].copy()
    m["rev"] = cents(m["l_extendedprice"]) * (100 - cents(m["l_discount"]))
    m["l_year"] = m["l_shipdate"].dt.year.astype("int64")
    want = (
        m.groupby(["supp_nation", "cust_nation", "l_year"], as_index=False)
        .agg(revenue_i4=("rev", "sum"))
        .sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)
    )
    got = (
        tpch.q7_volume_shipping(SF)
        .to_pandas()
        .sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0


def test_q15_matches_pandas_reference():
    li, supp = _tables("lineitem", "supplier")
    d = li[
        (li["l_shipdate"] >= pd.Timestamp(tpch.Q15_SHIP_LO))
        & (li["l_shipdate"] < pd.Timestamp(tpch.Q15_SHIP_HI))
    ].copy()
    d["rev"] = cents(d["l_extendedprice"]) * (100 - cents(d["l_discount"]))
    tot = d.groupby("l_suppkey", as_index=False).agg(total=("rev", "sum"))
    best = tot[tot["total"] == tot["total"].max()].merge(
        supp, left_on="l_suppkey", right_on="s_suppkey"
    ).sort_values("s_suppkey")
    got = tpch.q15_top_supplier(SF).to_pandas()
    assert list(got["s_suppkey"]) == list(best["s_suppkey"])
    assert list(got["s_name"]) == list(best["s_name"])
    assert list(got["total_revenue_i4"]) == list(best["total"])
    assert len(got) >= 1


def test_q18_matches_pandas_reference():
    li, orders, cust = _tables("lineitem", "orders", "customer")
    tot = (
        li.assign(q=li["l_quantity"].astype("int64"))
        .groupby("l_orderkey", as_index=False)
        .agg(sum_qty=("q", "sum"))
    )
    tot = tot[tot["sum_qty"] > tpch.Q18_QTY_GT]
    m = tot.merge(
        orders, left_on="l_orderkey", right_on="o_orderkey"
    ).merge(cust, left_on="o_custkey", right_on="c_custkey")
    m["total_cents"] = cents(m["o_totalprice"])
    m = m.sort_values(
        ["total_cents", "o_orderkey"], ascending=[False, True]
    ).reset_index(drop=True)
    got = tpch.q18_large_volume_customers(SF).to_pandas()
    assert list(got["o_orderkey"]) == list(m["o_orderkey"])
    assert list(got["c_custkey"]) == list(m["c_custkey"])
    assert list(got["c_name"]) == list(m["c_name"])
    assert list(got["sum_qty"]) == list(m["sum_qty"])
    assert list(got["total_cents"]) == list(m["total_cents"])
    want_us = (
        m["o_orderdate"].to_numpy().astype("datetime64[us]").astype("int64")
    )
    assert list(got["odate_us"]) == list(want_us)
    assert len(got) > 0  # threshold sits inside the tail, not past it


def test_q19_matches_pandas_reference():
    li, part = _tables("lineitem", "part")
    m = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    hit = np.zeros(len(m), dtype=bool)
    for brand, slo, shi, qlo, qhi in tpch.Q19_WINDOWS:
        hit |= (
            (m["p_brand"] == brand)
            & (m["p_size"] >= slo) & (m["p_size"] <= shi)
            & (m["l_quantity"] >= qlo) & (m["l_quantity"] <= qhi)
        ).to_numpy()
    d = m.loc[hit]
    want_rev = int(
        (cents(d["l_extendedprice"]) * (100 - cents(d["l_discount"]))).sum()
    )
    got = tpch.q19_discounted_revenue(SF).to_pandas()
    assert int(got["n_lines"][0]) == int(hit.sum())
    assert int(got["revenue_i4"][0]) == want_rev
    assert int(hit.sum()) > 0


def test_q21_matches_pandas_reference():
    li, orders, supp = _tables("lineitem", "orders", "supplier")
    m = li.merge(
        orders[orders["o_orderstatus"] == "F"],
        left_on="l_orderkey",
        right_on="o_orderkey",
    ).copy()
    late = (
        m["l_shipdate"]
        > m["o_orderdate"] + pd.Timedelta(days=tpch.Q21_LATE_DAYS)
    )
    m["late"] = late
    # per-line qualification, exactly the EXISTS/NOT-EXISTS semantics
    nsupp = m.groupby("l_orderkey")["l_suppkey"].transform("nunique")
    nlate = m["l_orderkey"].map(
        m.loc[m["late"], ["l_orderkey", "l_suppkey"]]
        .drop_duplicates()
        .groupby("l_orderkey")
        .size()
    ).fillna(0)
    q = m[m["late"] & (nsupp >= 2) & (nlate == 1)]
    want = (
        q.groupby("l_suppkey", as_index=False)
        .size()
        .rename(columns={"size": "numwait"})
        .sort_values(["numwait", "l_suppkey"], ascending=[False, True])
        .head(tpch.Q21_TOPK)
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    )
    got = tpch.q21_suppliers_kept_waiting(SF).to_pandas()
    assert list(got["s_suppkey"]) == list(want["s_suppkey"])
    assert list(got["s_name"]) == list(want["s_name"])
    assert list(got["numwait"]) == list(want["numwait"])
    assert len(got) > 0


def test_cogroup_queries_empty_qualification(tmp_path):
    """All facts filtered out → empty results with stable schemas, no
    crash in any tagged-union co-group (Ray hands back column-less
    empty frames; the drains must rebuild the schema)."""
    cust, orders, li, supp, nat, reg, part = _tables(
        "customer", "orders", "lineitem", "supplier", "nation", "region",
        "part",
    )
    # push every order/shipment outside all the query windows and make
    # every order single-line (kills q18's threshold and q21's EXISTS)
    orders = orders.iloc[:50].copy()
    orders["o_orderdate"] = pd.Timestamp("1970-01-01")
    orders["o_orderstatus"] = "O"
    li = li.drop_duplicates("l_orderkey").iloc[:50].copy()
    li["l_shipdate"] = pd.Timestamp("1970-01-01")
    li["l_quantity"] = 1.0
    li["l_discount"] = 0.0
    for name, df in [
        ("customer", cust), ("orders", orders), ("lineitem", li),
        ("supplier", supp), ("nation", nat), ("region", reg),
        ("part", part),
    ]:
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            str(tmp_path / f"{name}.parquet"),
        )
    sf = str(tmp_path)
    assert len(tpch.q5_local_supplier_volume(sf).to_pandas()) == 0
    assert len(tpch.q7_volume_shipping(sf).to_pandas()) == 0
    assert len(tpch.q15_top_supplier(sf).to_pandas()) == 0
    assert len(tpch.q18_large_volume_customers(sf).to_pandas()) == 0
    assert len(tpch.q21_suppliers_kept_waiting(sf).to_pandas()) == 0
    g6 = tpch.q6_forecast_revenue(sf).to_pandas()
    assert int(g6["n_lines"][0]) == 0 and int(g6["revenue_i4"][0]) == 0
