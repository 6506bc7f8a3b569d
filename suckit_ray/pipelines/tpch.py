"""TPC-H-shaped relational pipelines, batch two.

The first TPC-H batch (q3/q4/q8/q10/q13/q14/q17/q22) lives in
``relops.py``; this module adds the classic shapes feasible over the
driver's tables directly (q19/q21 are ADAPTED — same logical shape,
predicates re-expressed over the columns that exist, mirrored verbatim
in the oracles). The partsupp-dependent family (q2/q9/q11/q16/q20)
plus q12 is adapted the same way in ``tpch2.py``, completing all 22
shapes. This batch:

- q6_forecast_revenue      — scalar filter-aggregate, full read pushdown
- q5_local_supplier_volume — the classic 6-table join with the
                             c_nationkey = s_nationkey correlation
- q7_volume_shipping       — nation-pair revenue flows by ship year
- q15_top_supplier         — argmax-with-ties over a derived aggregate
- q18_large_volume_customers — groupby-HAVING semi-join
- q19_discounted_revenue   — OR-of-conjunctions multi-predicate join
- q21_suppliers_kept_waiting — the EXISTS / NOT-EXISTS double
                             correlated subquery, fully group-local

Shared plan vocabulary (see relops.py for the rationale and the
measured tradeoffs): money is exact integer cents via ``to_cents``
(revenue products are 10^-4 dollars, ``*_i4``), dimension tables
(nation/region/supplier/part-slice/customer-map) broadcast once via
``ray.put``, big⋈big joins run as ONE tagged-union co-group on
``orderkey % default_buckets()``, and every parquet read prunes
columns plus pushes row filters (``filter=`` / ``filters=``) into the
scan. At full TPC-H scale the customer→nation broadcast would take
the same custkey co-group as revenue_by_nation documents; nation,
region and supplier are genuinely dimension-sized forever.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from suckit_ray.pipelines.relops import round_half_away, to_cents
from suckit_ray.stages.agg import default_buckets

# ---------------------------------------------------------------------------
# q6 — forecast revenue change (scalar filter-aggregate)
# ---------------------------------------------------------------------------

Q6_YEAR_LO = "1996-01-01"
Q6_YEAR_HI = "1997-01-01"
Q6_DISC_LO_C = 3  # discount cents window, inclusive
Q6_DISC_HI_C = 5
Q6_QTY_LT = 24


def q6_forecast_revenue(sf_dir: str) -> pa.Table:
    """(n_lines, revenue_i4): revenue that would be gained by
    eliminating small discounts — the TPC-H-Q6 shape: a pure scalar
    filter-aggregate where the entire answer is two numbers.

    Plan: the shipdate window is pushed into the parquet read (whole
    row groups outside 1996 never leave storage); the discount/quantity
    predicates and the partial sum are one vectorized pandas pass per
    block; the driver reduces O(blocks) partial rows. Revenue here is
    price × discount (the discount AMOUNT, per TPC-H Q6), i.e.
    price-cents × discount-cents = integer 10^-4 dollars."""
    import pyarrow.dataset as pds

    def block_partial(df: pd.DataFrame) -> pd.DataFrame:
        disc_c = to_cents(df["l_discount"])
        keep = (
            (disc_c >= Q6_DISC_LO_C)
            & (disc_c <= Q6_DISC_HI_C)
            & (df["l_quantity"].to_numpy() < Q6_QTY_LT)
        )
        rev = to_cents(df["l_extendedprice"])[keep] * disc_c[keep]
        return pd.DataFrame(
            {"n": [int(keep.sum())], "rev": [int(rev.sum())]}
        )

    parts = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_shipdate", "l_discount", "l_quantity", "l_extendedprice",
            ],
            filter=(
                (pds.field("l_shipdate") >= pds.scalar(pd.Timestamp(Q6_YEAR_LO)))
                & (pds.field("l_shipdate") < pds.scalar(pd.Timestamp(Q6_YEAR_HI)))
            ),
        )
        .map_batches(block_partial, batch_format="pandas")
        .to_pandas()  # O(blocks) rows of two ints
    )
    if "n" not in parts.columns:  # pushdown eliminated every row group
        parts = pd.DataFrame({"n": [0], "rev": [0]})
    return pa.table(
        {
            "n_lines": pa.array([int(parts["n"].sum())], pa.int64()),
            "revenue_i4": pa.array([int(parts["rev"].sum())], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# q5 — local supplier volume (6-table join, nation-correlated)
# ---------------------------------------------------------------------------

Q5_REGION = "ASIA"
Q5_DATE_LO = "1996-01-01"
Q5_DATE_HI = "1997-01-01"


def q5_local_supplier_volume(sf_dir: str) -> rd.Dataset:
    """(n_name, sum_rev, n_lines): revenue per nation from orders
    where the CUSTOMER and the LINEITEM'S SUPPLIER share that nation —
    TPC-H Q5, the classic 6-table join whose distinguishing feature is
    the c_nationkey = s_nationkey correlation (the join graph is not a
    tree; the equality can only be tested where an order's customer
    nation meets its lineitems' supplier nations).

    Plan: nation⋈region prunes to the region's nationkeys (25 rows
    forever); supplier→nationkey and custkey→nationkey become broadcast
    maps RESTRICTED to region nations (the dimension-side reduction —
    out-of-region rows die at the map stage, before the shuffle).
    Date-filtered orders carry their customer's nation, lineitems carry
    their supplier's nation plus per-(orderkey, nation) revenue
    partials; ONE tagged-union co-group on ``orderkey % B`` joins them
    and keeps matching-nation rows group-locally. The driver combines
    ≤ B × |nations| partial rows. Revenue is integer 10^-4 dollars:
    price-cents × (100 − discount-percent)."""
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq_
    import ray

    B = default_buckets()

    nat = pq_.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq_.read_table(f"{sf_dir}/region.parquet").to_pandas()
    nat = nat.merge(
        reg[reg["r_name"] == Q5_REGION],
        left_on="n_regionkey",
        right_on="r_regionkey",
    )
    region_keys = set(int(k) for k in nat["n_nationkey"])
    name_of = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    supp = pq_.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    supp = supp[supp["s_nationkey"].isin(region_keys)]
    supp_nat_ref = ray.put(
        dict(zip(supp["s_suppkey"].astype(int), supp["s_nationkey"].astype(int)))
    )
    cust = pq_.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    cust = cust[cust["c_nationkey"].isin(region_keys)]
    cust_nat_ref = ray.put(
        dict(zip(cust["c_custkey"].astype(int), cust["c_nationkey"].astype(int)))
    )

    def order_rows(df: pd.DataFrame) -> pd.DataFrame:
        nat_ = df["o_custkey"].map(ray.get(cust_nat_ref))
        d = df.loc[nat_.notna()]
        p = pd.DataFrame(
            {
                "orderkey": d["o_orderkey"].astype("int64"),
                "side": "o",
                "nat": nat_[nat_.notna()].astype("int64"),
                "rev": 0,
                "n": 0,
            }
        )
        p["bucket"] = (p["orderkey"] % B).astype("int64")
        return p

    def line_partial(df: pd.DataFrame) -> pd.DataFrame:
        nat_ = df["l_suppkey"].map(ray.get(supp_nat_ref))
        d = df.loc[nat_.notna()]
        rev = to_cents(d["l_extendedprice"]) * (
            100 - to_cents(d["l_discount"])
        )
        p = (
            pd.DataFrame(
                {
                    "orderkey": d["l_orderkey"].astype("int64"),
                    "nat": nat_[nat_.notna()].astype("int64"),
                    "rev": rev,
                }
            )
            .groupby(["orderkey", "nat"], as_index=False)
            .agg(rev=("rev", "sum"), n=("rev", "size"))
        )
        p["side"] = "l"
        p["bucket"] = (p["orderkey"] % B).astype("int64")
        return p[["orderkey", "side", "nat", "rev", "n", "bucket"]]

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(
            (pds.field("o_orderdate") >= pds.scalar(pd.Timestamp(Q5_DATE_LO)))
            & (pds.field("o_orderdate") < pds.scalar(pd.Timestamp(Q5_DATE_HI)))
        ),
    ).map_batches(order_rows, batch_format="pandas")
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(line_partial, batch_format="pandas")

    def bucket_join(g: pd.DataFrame) -> pd.DataFrame:
        li = g[g["side"] == "l"][["orderkey", "nat", "rev", "n"]]
        od = g[g["side"] == "o"][["orderkey", "nat"]].rename(
            columns={"nat": "cnat"}
        )
        m = li.merge(od, on="orderkey")
        m = m[m["nat"] == m["cnat"]]  # the Q5 correlation, group-local
        if not len(m):
            return pd.DataFrame({"nat": [], "rev": [], "n": []})
        return m.groupby("nat", as_index=False).agg(
            rev=("rev", "sum"), n=("n", "sum")
        )

    parts = (
        lines.union(orders)
        .groupby("bucket")
        .map_groups(bucket_join, batch_format="pandas")
        .to_pandas()  # ≤ B × |region nations| tiny rows
    )
    if not len(parts):
        return rd.from_pandas(
            pd.DataFrame(
                {
                    "n_name": pd.array([], dtype="str"),
                    "sum_rev": pd.array([], dtype="int64"),
                    "n_lines": pd.array([], dtype="int64"),
                }
            )
        )
    out = parts.groupby("nat", as_index=False).agg(
        sum_rev=("rev", "sum"), n_lines=("n", "sum")
    )
    out["n_name"] = out["nat"].astype(int).map(name_of)
    out = out.astype({"sum_rev": "int64", "n_lines": "int64"})
    return rd.from_pandas(out[["n_name", "sum_rev", "n_lines"]])


# ---------------------------------------------------------------------------
# q7 — volume shipping between two nations, by ship year
# ---------------------------------------------------------------------------

Q7_NATION_A = "NATION_3"
Q7_NATION_B = "NATION_7"
Q7_SHIP_LO = "1996-01-01"
Q7_SHIP_HI = "1998-01-01"


def q7_volume_shipping(sf_dir: str) -> rd.Dataset:
    """(supp_nation, cust_nation, l_year, revenue_i4): trade volume
    between two nations per ship year, both directions — TPC-H Q7.
    Like Q5 the supplier and customer nations meet at the order, but
    here the predicate is INEQUALITY (goods crossing the border) and
    the group key includes a column derived from the lineitem side
    (ship year), so the revenue partial must be keyed by (orderkey,
    supp_nation, year) before the exchange.

    Plan: the two nations' suppkey→name and custkey→name broadcast maps
    pre-filter both fact streams to candidate rows (everything else
    dies before the shuffle); the shipdate window is pushed into the
    lineitem read. One orderkey co-group pairs lineitem partials with
    their order's customer nation and keeps cross-nation rows; the
    driver combines ≤ B × 2 × |years| partials."""
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq_
    import ray

    B = default_buckets()

    nat = pq_.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    two = nat[nat["n_name"].isin([Q7_NATION_A, Q7_NATION_B])]
    name_of = dict(zip(two["n_nationkey"].astype(int), two["n_name"]))

    supp = pq_.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    supp = supp[supp["s_nationkey"].isin(name_of)]
    supp_ref = ray.put(
        {
            int(k): name_of[int(v)]
            for k, v in zip(supp["s_suppkey"], supp["s_nationkey"])
        }
    )
    cust = pq_.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    cust = cust[cust["c_nationkey"].isin(name_of)]
    cust_ref = ray.put(
        {
            int(k): name_of[int(v)]
            for k, v in zip(cust["c_custkey"], cust["c_nationkey"])
        }
    )

    def line_partial(df: pd.DataFrame) -> pd.DataFrame:
        snat = df["l_suppkey"].map(ray.get(supp_ref))
        d = df.loc[snat.notna()]
        rev = to_cents(d["l_extendedprice"]) * (
            100 - to_cents(d["l_discount"])
        )
        p = (
            pd.DataFrame(
                {
                    "orderkey": d["l_orderkey"].astype("int64"),
                    "nat": snat[snat.notna()],
                    "year": d["l_shipdate"].dt.year.astype("int64"),
                    "rev": rev,
                }
            )
            .groupby(["orderkey", "nat", "year"], as_index=False)
            .agg(rev=("rev", "sum"))
        )
        p["side"] = "l"
        p["bucket"] = (p["orderkey"] % B).astype("int64")
        return p[["orderkey", "side", "nat", "year", "rev", "bucket"]]

    def order_rows(df: pd.DataFrame) -> pd.DataFrame:
        cnat = df["o_custkey"].map(ray.get(cust_ref))
        d = df.loc[cnat.notna()]
        p = pd.DataFrame(
            {
                "orderkey": d["o_orderkey"].astype("int64"),
                "side": "o",
                "nat": cnat[cnat.notna()],
                "year": 0,
                "rev": 0,
            }
        )
        p["bucket"] = (p["orderkey"] % B).astype("int64")
        return p

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
            "l_shipdate",
        ],
        filter=(
            (pds.field("l_shipdate") >= pds.scalar(pd.Timestamp(Q7_SHIP_LO)))
            & (pds.field("l_shipdate") < pds.scalar(pd.Timestamp(Q7_SHIP_HI)))
        ),
    ).map_batches(line_partial, batch_format="pandas")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(order_rows, batch_format="pandas")

    def bucket_join(g: pd.DataFrame) -> pd.DataFrame:
        li = g[g["side"] == "l"][["orderkey", "nat", "year", "rev"]]
        od = g[g["side"] == "o"][["orderkey", "nat"]].rename(
            columns={"nat": "cnat"}
        )
        m = li.merge(od, on="orderkey")
        m = m[m["nat"] != m["cnat"]]  # goods cross the border
        if not len(m):
            return pd.DataFrame(
                {"nat": [], "cnat": [], "year": [], "rev": []}
            )
        return m.groupby(["nat", "cnat", "year"], as_index=False).agg(
            rev=("rev", "sum")
        )

    parts = (
        lines.union(orders)
        .groupby("bucket")
        .map_groups(bucket_join, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts):
        return rd.from_pandas(
            pd.DataFrame(
                {
                    "supp_nation": pd.array([], dtype="str"),
                    "cust_nation": pd.array([], dtype="str"),
                    "l_year": pd.array([], dtype="int64"),
                    "revenue_i4": pd.array([], dtype="int64"),
                }
            )
        )
    out = parts.groupby(["nat", "cnat", "year"], as_index=False).agg(
        revenue_i4=("rev", "sum")
    )
    out = out.rename(
        columns={"nat": "supp_nation", "cnat": "cust_nation", "year": "l_year"}
    ).astype({"l_year": "int64", "revenue_i4": "int64"})
    return rd.from_pandas(
        out[["supp_nation", "cust_nation", "l_year", "revenue_i4"]]
    )


# ---------------------------------------------------------------------------
# q15 — top supplier (argmax with ties over a derived aggregate)
# ---------------------------------------------------------------------------

Q15_SHIP_LO = "1996-01-01"
Q15_SHIP_HI = "1996-04-01"


def q15_top_supplier(sf_dir: str) -> pa.Table:
    """(s_suppkey, s_name, total_revenue_i4): the supplier(s) with
    maximum revenue in one quarter — TPC-H Q15's shape: an aggregate
    over a derived view compared against that view's own global MAX
    (ties all returned).

    Plan: the shipdate window is pushed into the read; per-block
    (suppkey, rev) partials flow into one suppkey co-group whose
    buckets emit only their LOCAL max rows (ties kept) — the global
    max is among bucket maxima by definition, so the driver sees
    ≤ ties × B rows, takes the true max, and resolves names with a
    predicate-pushdown supplier read over the (sparse) winner keys."""
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq_

    B = default_buckets()

    def line_partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = to_cents(df["l_extendedprice"]) * (
            100 - to_cents(df["l_discount"])
        )
        p = (
            pd.DataFrame(
                {"suppkey": df["l_suppkey"].astype("int64"), "rev": rev}
            )
            .groupby("suppkey", as_index=False)
            .agg(rev=("rev", "sum"))
        )
        p["bucket"] = (p["suppkey"] % B).astype("int64")
        return p

    def bucket_max(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("suppkey", as_index=False).agg(rev=("rev", "sum"))
        return tot[tot["rev"] == tot["rev"].max()]

    tops = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate",
            ],
            filter=(
                (pds.field("l_shipdate") >= pds.scalar(pd.Timestamp(Q15_SHIP_LO)))
                & (pds.field("l_shipdate") < pds.scalar(pd.Timestamp(Q15_SHIP_HI)))
            ),
        )
        .map_batches(line_partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(bucket_max, batch_format="pandas")
        .to_pandas()  # ≤ ties × B rows
    )
    if not len(tops):
        return pa.table(
            {
                "s_suppkey": pa.array([], pa.int64()),
                "s_name": pa.array([], pa.string()),
                "total_revenue_i4": pa.array([], pa.int64()),
            }
        )
    win = tops[tops["rev"] == tops["rev"].max()].sort_values("suppkey")
    names = pq_.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in", [int(k) for k in win["suppkey"]])],
    ).to_pandas()
    m = win.merge(names, left_on="suppkey", right_on="s_suppkey")
    return pa.table(
        {
            "s_suppkey": pa.array(m["suppkey"].astype("int64"), pa.int64()),
            "s_name": pa.array(m["s_name"], pa.string()),
            "total_revenue_i4": pa.array(m["rev"].astype("int64"), pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# q18 — large-volume customers (groupby-HAVING semi-join)
# ---------------------------------------------------------------------------

Q18_QTY_GT = 300


def q18_large_volume_customers(sf_dir: str) -> pa.Table:
    """(c_custkey, c_name, o_orderkey, odate_us, total_cents, sum_qty):
    orders whose total quantity exceeds the threshold, with their
    customer — TPC-H Q18: a HAVING filter over a big aggregate that
    SEMI-JOINs back to the fact tables.

    Plan: per-block (orderkey, qty) partials meet the orders stream in
    one orderkey co-group; the HAVING filter runs group-locally, so
    only qualifying orders (sparse by construction — the threshold
    sits in the distribution tail) reach the driver, which resolves
    customer names with a predicate-pushdown read over the qualifying
    custkeys. Output ordered (total_cents DESC, o_orderkey ASC)."""
    import pyarrow.parquet as pq_

    B = default_buckets()

    def line_partial(df: pd.DataFrame) -> pd.DataFrame:
        p = (
            pd.DataFrame(
                {
                    "orderkey": df["l_orderkey"].astype("int64"),
                    "qty": round_half_away(df["l_quantity"]),
                }
            )
            .groupby("orderkey", as_index=False)
            .agg(qty=("qty", "sum"))
        )
        p["side"] = "l"
        p["custkey"] = -1
        p["odate_us"] = 0
        p["total_c"] = 0
        p["bucket"] = (p["orderkey"] % B).astype("int64")
        return p[
            ["orderkey", "side", "qty", "custkey", "odate_us", "total_c",
             "bucket"]
        ]

    def order_rows(df: pd.DataFrame) -> pd.DataFrame:
        p = pd.DataFrame(
            {
                "orderkey": df["o_orderkey"].astype("int64"),
                "side": "o",
                "qty": 0,
                "custkey": df["o_custkey"].astype("int64"),
                "odate_us": df["o_orderdate"]
                .to_numpy()
                .astype("datetime64[us]")
                .astype("int64"),
                "total_c": to_cents(df["o_totalprice"]),
            }
        )
        p["bucket"] = (p["orderkey"] % B).astype("int64")
        return p

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    ).map_batches(line_partial, batch_format="pandas")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    ).map_batches(order_rows, batch_format="pandas")

    def bucket_having(g: pd.DataFrame) -> pd.DataFrame:
        tot = (
            g[g["side"] == "l"]
            .groupby("orderkey", as_index=False)
            .agg(sum_qty=("qty", "sum"))
        )
        tot = tot[tot["sum_qty"] > Q18_QTY_GT]
        od = g[g["side"] == "o"][
            ["orderkey", "custkey", "odate_us", "total_c"]
        ]
        return tot.merge(od, on="orderkey")

    hits = (
        lines.union(orders)
        .groupby("bucket")
        .map_groups(bucket_having, batch_format="pandas")
        .to_pandas()  # sparse: tail-of-distribution orders only
    )
    if not len(hits):
        return pa.table(
            {
                "c_custkey": pa.array([], pa.int64()),
                "c_name": pa.array([], pa.string()),
                "o_orderkey": pa.array([], pa.int64()),
                "odate_us": pa.array([], pa.int64()),
                "total_cents": pa.array([], pa.int64()),
                "sum_qty": pa.array([], pa.int64()),
            }
        )
    names = pq_.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name"],
        filters=[
            ("c_custkey", "in", sorted(set(int(k) for k in hits["custkey"])))
        ],
    ).to_pandas()
    m = hits.merge(names, left_on="custkey", right_on="c_custkey")
    m = m.sort_values(
        ["total_c", "orderkey"], ascending=[False, True]
    ).reset_index(drop=True)
    return pa.table(
        {
            "c_custkey": pa.array(m["custkey"].astype("int64"), pa.int64()),
            "c_name": pa.array(m["c_name"], pa.string()),
            "o_orderkey": pa.array(m["orderkey"].astype("int64"), pa.int64()),
            "odate_us": pa.array(m["odate_us"].astype("int64"), pa.int64()),
            "total_cents": pa.array(m["total_c"].astype("int64"), pa.int64()),
            "sum_qty": pa.array(m["sum_qty"].astype("int64"), pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# q19 — discounted revenue (OR-of-conjunctions predicate join)
# ---------------------------------------------------------------------------

# (brand, size_lo, size_hi, qty_lo, qty_hi) — the reference Q19 windows
# re-expressed over the columns this part table has (no containers or
# ship modes exist here; the OR-of-conjunctions SHAPE is the point).
Q19_WINDOWS = (
    ("Brand#1", 1, 15, 1, 20),
    ("Brand#2", 10, 30, 10, 30),
    ("Brand#3", 20, 50, 20, 40),
)


def q19_discounted_revenue(sf_dir: str) -> pa.Table:
    """(n_lines, revenue_i4): revenue from lineitems matching ANY of
    three (brand, size-window, quantity-window) conjunctions — the
    TPC-H-Q19 shape: a fact⋈dimension join whose predicate is a
    disjunction of multi-column conjunctions spanning BOTH tables.

    Plan: the part slice for the three candidate brands is pruned at
    the read (``filters=``) and broadcast as partkey→(brand_idx, size)
    maps; lineitem streams once, evaluates the whole disjunction
    vectorized per block (numpy window tests over the mapped columns),
    and emits O(1) partial sums; the driver reduces O(blocks) rows."""
    import pyarrow.parquet as pq_
    import ray

    brands = [w[0] for w in Q19_WINDOWS]
    part = pq_.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_size"],
        filters=[("p_brand", "in", brands)],
    ).to_pandas()
    bidx = {b: i for i, b in enumerate(brands)}
    brand_ref = ray.put(
        dict(zip(part["p_partkey"].astype(int), part["p_brand"].map(bidx)))
    )
    size_ref = ray.put(
        dict(zip(part["p_partkey"].astype(int), part["p_size"].astype(int)))
    )

    def block_partial(df: pd.DataFrame) -> pd.DataFrame:
        bi = df["l_partkey"].map(ray.get(brand_ref))
        sz = df["l_partkey"].map(ray.get(size_ref))
        keep = bi.notna()
        if not keep.any():
            return pd.DataFrame({"n": [0], "rev": [0]})
        bi = bi[keep].to_numpy(dtype="int64")
        sz = sz[keep].to_numpy(dtype="int64")
        qty = df.loc[keep, "l_quantity"].to_numpy(dtype="int64")
        hit = np.zeros(len(bi), dtype=bool)
        for i, (_, slo, shi, qlo, qhi) in enumerate(Q19_WINDOWS):
            hit |= (
                (bi == i)
                & (sz >= slo) & (sz <= shi)
                & (qty >= qlo) & (qty <= qhi)
            )
        d = df.loc[keep].loc[hit]
        rev = to_cents(d["l_extendedprice"]) * (
            100 - to_cents(d["l_discount"])
        )
        return pd.DataFrame({"n": [int(hit.sum())], "rev": [int(rev.sum())]})

    parts = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_partkey", "l_quantity", "l_extendedprice", "l_discount",
            ],
        )
        .map_batches(block_partial, batch_format="pandas")
        .to_pandas()
    )
    if "n" not in parts.columns:  # zero-block input
        parts = pd.DataFrame({"n": [0], "rev": [0]})
    return pa.table(
        {
            "n_lines": pa.array([int(parts["n"].sum())], pa.int64()),
            "revenue_i4": pa.array([int(parts["rev"].sum())], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# q21 — suppliers who kept orders waiting (EXISTS / NOT EXISTS)
# ---------------------------------------------------------------------------

Q21_LATE_DAYS = 60
Q21_TOPK = 20
_US_PER_DAY = 86_400_000_000


def q21_suppliers_kept_waiting(sf_dir: str) -> pa.Table:
    """(s_suppkey, s_name, numwait): suppliers who were the SOLE late
    supplier on multi-supplier finished orders, counted per late line —
    the TPC-H-Q21 shape: a double correlated subquery (EXISTS another
    supplier on the order; NOT EXISTS another LATE supplier). The
    reference's lateness predicate (receiptdate > commitdate) has no
    columns here, so lateness is ADAPTED to ``l_shipdate >
    o_orderdate + 60 days`` — the correlation structure, which is the
    hard part, is unchanged and the oracle mirrors the adaptation.

    Plan: both EXISTS tests are order-local, so one orderkey co-group
    answers them with no further exchange: lineitem pre-shrinks to
    (orderkey, suppkey, ship_us, n) line-count partials, status-F
    orders are pruned at the read and carry their date; per bucket a
    vectorized pass computes each order's distinct-supplier count and
    late-supplier count via transforms and emits per-supplier numwait
    partials. Supplier space is dimension-sized, so the driver combine
    is O(suppliers); names resolve via a pushdown read of the top-k."""
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq_

    B = default_buckets()
    late_us = Q21_LATE_DAYS * _US_PER_DAY

    def line_partial(df: pd.DataFrame) -> pd.DataFrame:
        p = (
            pd.DataFrame(
                {
                    "orderkey": df["l_orderkey"].astype("int64"),
                    "suppkey": df["l_suppkey"].astype("int64"),
                    "ship_us": df["l_shipdate"]
                    .to_numpy()
                    .astype("datetime64[us]")
                    .astype("int64"),
                }
            )
            .groupby(["orderkey", "suppkey", "ship_us"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        p["side"] = "l"
        p["bucket"] = (p["orderkey"] % B).astype("int64")
        return p[["orderkey", "side", "suppkey", "ship_us", "n", "bucket"]]

    def order_rows(df: pd.DataFrame) -> pd.DataFrame:
        p = pd.DataFrame(
            {
                "orderkey": df["o_orderkey"].astype("int64"),
                "side": "o",
                "suppkey": -1,
                "ship_us": df["o_orderdate"]
                .to_numpy()
                .astype("datetime64[us]")
                .astype("int64"),
                "n": 0,
            }
        )
        p["bucket"] = (p["orderkey"] % B).astype("int64")
        return p

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    ).map_batches(line_partial, batch_format="pandas")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_orderdate"],
        filter=pds.field("o_orderstatus") == pds.scalar("F"),
    ).map_batches(order_rows, batch_format="pandas")

    def bucket_waits(g: pd.DataFrame) -> pd.DataFrame:
        li = g[g["side"] == "l"][["orderkey", "suppkey", "ship_us", "n"]]
        od = g[g["side"] == "o"][["orderkey", "ship_us"]].rename(
            columns={"ship_us": "odate_us"}
        )
        m = li.merge(od, on="orderkey")  # inner: status-F orders only
        if not len(m):
            return pd.DataFrame({"suppkey": [], "numwait": []})
        m["late"] = m["ship_us"] > m["odate_us"] + late_us
        grp = m.groupby("orderkey")
        nsupp = grp["suppkey"].transform("nunique")
        # distinct late suppliers per order, mapped back to rows
        late_supp = (
            m.loc[m["late"], ["orderkey", "suppkey"]]
            .drop_duplicates()
            .groupby("orderkey")
            .size()
        )
        nlate = m["orderkey"].map(late_supp).fillna(0).astype(int)
        qualify = m["late"] & (nsupp >= 2) & (nlate == 1)
        if not qualify.any():
            return pd.DataFrame({"suppkey": [], "numwait": []})
        return (
            m.loc[qualify]
            .groupby("suppkey", as_index=False)
            .agg(numwait=("n", "sum"))
        )

    parts = (
        lines.union(orders)
        .groupby("bucket")
        .map_groups(bucket_waits, batch_format="pandas")
        .to_pandas()  # ≤ B × |suppliers| partials; suppliers are a dimension
    )
    if not len(parts):
        return pa.table(
            {
                "s_suppkey": pa.array([], pa.int64()),
                "s_name": pa.array([], pa.string()),
                "numwait": pa.array([], pa.int64()),
            }
        )
    tot = parts.groupby("suppkey", as_index=False).agg(
        numwait=("numwait", "sum")
    )
    tot = tot.sort_values(
        ["numwait", "suppkey"], ascending=[False, True]
    ).head(Q21_TOPK)
    names = pq_.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in", [int(k) for k in tot["suppkey"]])],
    ).to_pandas()
    m = tot.merge(names, left_on="suppkey", right_on="s_suppkey")
    m = m.sort_values(["numwait", "suppkey"], ascending=[False, True])
    return pa.table(
        {
            "s_suppkey": pa.array(m["suppkey"].astype("int64"), pa.int64()),
            "s_name": pa.array(m["s_name"], pa.string()),
            "numwait": pa.array(m["numwait"].astype("int64"), pa.int64()),
        }
    )
