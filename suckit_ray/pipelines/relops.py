"""Relational operators over the TPC-H-ish test tables — grouped
aggregates with partial pre-aggregation, windowed event aggregation,
and a broadcast-join top-k. These demonstrate the engine's generic
wide-operation shapes; money/quantity values are carried as integer
cents so oracle hashes are exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum


def lineitem_agg(sf_dir: str) -> rd.Dataset:
    """TPC-H Q1-shaped aggregate: per (l_returnflag, l_linestatus),
    integer-cent sums. Pre-aggregates inside map_batches so the shuffle
    moves one row per (batch × group) instead of every lineitem row."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            qty_c=(df["l_quantity"] * 100).round().astype("int64"),
            price_c=(df["l_extendedprice"] * 100).round().astype("int64"),
            disc_c=(df["l_discount"] * 100).round().astype("int64"),
            one=1,
        )
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .agg(
                sum_qty_cents=("qty_c", "sum"),
                sum_price_cents=("price_c", "sum"),
                sum_disc_cents=("disc_c", "sum"),
                n_rows=("one", "sum"),
            )
        )
        return g

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(partial, batch_format="pandas")
    return ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty_cents", alias_name="sum_qty_cents"),
        Sum("sum_price_cents", alias_name="sum_price_cents"),
        Sum("sum_disc_cents", alias_name="sum_disc_cents"),
        Sum("n_rows", alias_name="n_rows"),
    )


def events_windowed(sf_dir: str) -> rd.Dataset:
    """Tumbling 1-hour window per user over the events stream table:
    (user_id, hour_id, n_events, sum_value_cents). hour_id =
    floor(epoch seconds / 3600) — integer window key."""

    def win(df: pd.DataFrame) -> pd.DataFrame:
        hour_id = pd.Series(
            df["ts"].to_numpy().astype("datetime64[s]").astype("int64") // 3600,
            index=df.index,
        )
        return pd.DataFrame(
            {
                "user_id": df["user_id"],
                "hour_id": hour_id,
                "value_c": (df["value"] * 100).round().astype("int64"),
                "one": 1,
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    ).map_batches(win, batch_format="pandas")
    return ds.groupby(["user_id", "hour_id"]).aggregate(
        Sum("one", alias_name="n_events"),
        Sum("value_c", alias_name="sum_value_cents"),
    )


def top_customers(sf_dir: str, k: int = 10) -> pa.Table:
    """Top-k customers by total order value: distributed partial
    aggregation over orders, then a BROADCAST lookup of customer names
    (small dimension table via ray.put — no shuffle join), deterministic
    (total desc, custkey asc) ranking."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(total_c=(df["o_totalprice"] * 100).round().astype("int64"), one=1)
        return df.groupby("o_custkey", as_index=False).agg(
            total_cents=("total_c", "sum"), n_orders=("one", "sum")
        )

    agg = (
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
        .map_batches(partial, batch_format="pandas")
        .groupby("o_custkey")
        .aggregate(
            Sum("total_cents", alias_name="total_cents"),
            Sum("n_orders", alias_name="n_orders"),
        )
        .to_pandas()
    )
    agg = agg.sort_values(
        ["total_cents", "o_custkey"], ascending=[False, True]
    ).head(k)

    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).to_pandas()
    name_of = dict(zip(cust["c_custkey"], cust["c_name"]))

    return pa.table(
        {
            "c_custkey": pa.array([int(x) for x in agg["o_custkey"]], pa.int64()),
            "c_name": pa.array([name_of.get(int(x)) for x in agg["o_custkey"]], pa.string()),
            "total_cents": pa.array([int(x) for x in agg["total_cents"]], pa.int64()),
            "n_orders": pa.array([int(x) for x in agg["n_orders"]], pa.int64()),
        }
    )
