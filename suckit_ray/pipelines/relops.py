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

import ray.data as rd
from suckit_ray.stages.agg import bucketed_groupby_agg


def to_cents(s: pd.Series) -> pd.Series:
    """float money → int64 cents, rounding half AWAY FROM ZERO to
    match DuckDB's round() (pandas .round() is half-to-even: 0.125
    would become 12 here but 13 in the oracle). The generators avoid
    exact half-cents, but threshold ops (events_outliers) flip set
    membership on a 1-cent shift, so the idiom must match exactly."""
    x = s.to_numpy(dtype="float64") * 100.0
    # NOT floor(x+0.5): for x just below k+0.5 (e.g.
    # 0.49999999999999994) the ADDITION itself rounds up to k+1 and
    # floor then overshoots C round(). frac = x − floor(x) is exact
    # for |x| < 2^53 (the low mantissa bits), so comparing it to 0.5
    # replicates half-away-from-zero bit-exactly.
    fl = np.floor(x)
    ce = np.ceil(x)
    return pd.Series(
        np.where(
            x >= 0, fl + ((x - fl) >= 0.5), ce - ((ce - x) >= 0.5)
        ).astype("int64"),
        index=s.index,
    )


def round_half_away(s: pd.Series) -> pd.Series:
    """float → int64, half away from zero — the unit-scale sibling of
    ``to_cents`` for quantity columns, matching DuckDB's ``round()``
    (NOT its plain CAST: ``CAST(2.5e0 AS BIGINT)`` is half-to-EVEN
    → 2, so every quantity oracle spells ``CAST(round(l_quantity) AS
    BIGINT)``). The generators emit integral quantities, but
    .astype('int64') TRUNCATES (12.5 → 12 where round() says 13), so
    any engine site the oracle rounds must use this."""
    x = s.to_numpy(dtype="float64")
    fl = np.floor(x)
    ce = np.ceil(x)
    return pd.Series(
        np.where(
            x >= 0, fl + ((x - fl) >= 0.5), ce - ((ce - x) >= 0.5)
        ).astype("int64"),
        index=s.index,
    )


def lineitem_agg(sf_dir: str) -> rd.Dataset:
    """TPC-H Q1-shaped aggregate: per (l_returnflag, l_linestatus),
    integer-cent sums. Pre-aggregates inside map_batches so the shuffle
    moves one row per (batch × group) instead of every lineitem row."""

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "l_linestatus": df["l_linestatus"],
                "qty_c": to_cents(df["l_quantity"]),
                "price_c": to_cents(df["l_extendedprice"]),
                "disc_c": to_cents(df["l_discount"]),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(cents, batch_format="pandas")
    return bucketed_groupby_agg(
        ds,
        keys=["l_returnflag", "l_linestatus"],
        aggs={
            "sum_qty_cents": ("qty_c", "sum"),
            "sum_price_cents": ("price_c", "sum"),
            "sum_disc_cents": ("disc_c", "sum"),
            "n_rows": ("qty_c", "count"),
        },
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
                "value_c": to_cents(df["value"]),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    ).map_batches(win, batch_format="pandas")
    return bucketed_groupby_agg(
        ds,
        keys=["user_id", "hour_id"],
        aggs={
            "n_events": ("value_c", "count"),
            "sum_value_cents": ("value_c", "sum"),
        },
    )


def top_customers(sf_dir: str, k: int = 10) -> pa.Table:
    """Top-k customers by total order value: distributed partial
    aggregation over orders, per-block top-k (the driver merges at most
    k rows per block, never the full per-customer table), then a name
    lookup pruned to the k winners at the parquet read — no shuffle
    join, deterministic (total desc, custkey asc) ranking."""

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_custkey": df["o_custkey"],
                "total_c": to_cents(df["o_totalprice"]),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(cents, batch_format="pandas")
    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["total_cents", "o_custkey"], ascending=[False, True]
        ).head(k)

    agg = (
        bucketed_groupby_agg(
            ds,
            keys=["o_custkey"],
            aggs={"total_cents": ("total_c", "sum"), "n_orders": ("total_c", "count")},
        )
        .map_batches(block_topk, batch_format="pandas")
        .to_pandas()  # ≤ k rows per bucket block reach the driver
    )
    agg = agg.sort_values(
        ["total_cents", "o_custkey"], ascending=[False, True]
    ).head(k)

    import pyarrow.parquet as pq

    winners = [int(x) for x in agg["o_custkey"]]
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name"],
        filters=[("c_custkey", "in", winners)],  # prune at the read
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


SESSION_GAP_US = 1800 * 1_000_000  # 30 min, in integer microseconds


def events_sessionize(sf_dir: str) -> rd.Dataset:
    """Gap-based session windows per user (new session when >30 min
    passes between events): (user_id, session_id, n_events, start_us,
    end_us). Users are bucketed for the shuffle; the per-user
    sort + gap/cumsum sessionization is vectorized pandas inside each
    bucket. Timestamps are integer microseconds end to end so the
    DuckDB oracle hashes exactly."""

    from suckit_ray.stages.agg import default_buckets

    n_buckets = default_buckets()  # cluster-scaled (result-invariant)

    def to_us(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"],
                "ts_us": df["ts"].to_numpy().astype("datetime64[us]").astype("int64"),
                "bucket": (df["user_id"] % n_buckets).astype("int64"),
            }
        )

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us"], kind="mergesort")
        new_user = g["user_id"].ne(g["user_id"].shift())
        gap = g["ts_us"].diff() > SESSION_GAP_US
        brk = (new_user | gap).cumsum()
        out = g.groupby(["user_id", brk], as_index=False).agg(
            n_events=("ts_us", "size"), start_us=("ts_us", "min"), end_us=("ts_us", "max")
        )
        out = out.sort_values(["user_id", "start_us"], kind="mergesort")
        out["session_id"] = out.groupby("user_id").cumcount().astype("int64")
        return out[["user_id", "session_id", "n_events", "start_us", "end_us"]]

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"]).map_batches(
        to_us, batch_format="pandas"
    )
    return ds.groupby("bucket").map_groups(sessionize, batch_format="pandas")


SLIDE_S = 900          # 15-min slide
WINDOW_SLOTS = 4       # 4 slides = 1-hour window


def events_sliding(sf_dir: str) -> rd.Dataset:
    """Sliding-window aggregate per event_type: 1-hour windows sliding
    every 15 min. Each event replicates into its 4 covering slots (a
    vectorized flat-map), then a bucketed groupby — the standard
    replicate-then-aggregate plan for sliding windows; no cross-batch
    state needed. (event_type, slot_id, n_events, sum_value_cents);
    window slot s covers [s*900, s*900+3600) epoch seconds."""
    import numpy as np

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ts_s = df["ts"].to_numpy().astype("datetime64[s]").astype("int64")
        base = ts_s // SLIDE_S
        v = to_cents(df["value"]).to_numpy()
        et = df["event_type"].to_numpy()
        n = len(df)
        ks = np.repeat(np.arange(WINDOW_SLOTS), n)
        return pd.DataFrame(
            {
                "event_type": np.tile(et, WINDOW_SLOTS),
                "slot_id": np.tile(base, WINDOW_SLOTS) - ks,
                "value_c": np.tile(v, WINDOW_SLOTS),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    ).map_batches(explode, batch_format="pandas")
    return bucketed_groupby_agg(
        ds,
        keys=["event_type", "slot_id"],
        aggs={"n_events": ("value_c", "count"), "sum_value_cents": ("value_c", "sum")},
    )


def events_distinct_users(sf_dir: str) -> rd.Dataset:
    """(event_type, n_users): EXACT distinct count, two-phase — each
    batch drops its local duplicates, the bucketed groupby co-locates
    the distinct (event_type, user_id) pairs exactly once, and the
    count aggregates per type. The shuffle carries one row per distinct
    pair (not per event)."""
    from suckit_ray.stages.agg import bucketed_groupby_agg

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    ).map_batches(
        lambda df: df.drop_duplicates(["event_type", "user_id"]),
        batch_format="pandas",
    )
    pairs = bucketed_groupby_agg(
        ds,
        keys=["event_type", "user_id"],
        aggs={"c": ("user_id", "count")},
    )
    return bucketed_groupby_agg(
        pairs,
        keys=["event_type"],
        aggs={"n_users": ("user_id", "count")},
    )


def events_distinct_users_hll(sf_dir: str) -> "pa.Table":
    """(event_type, n_users_est): HyperLogLog distinct count — the
    sketch path for 100 TB-scale cardinalities. Each batch emits one
    4 KB register blob per event_type; the groupby moves blobs (not
    values) and the merge is an elementwise max. Rows-only operator
    (±1.04/√4096 ≈ 1.6% standard error — relative-error bound pinned
    vs the exact count in tests)."""
    import numpy as np
    import pyarrow as pa

    from suckit_ray.stages.sketch import hll_estimate, hll_merge, hll_partial

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        types, blobs = [], []
        for et, g in df.groupby("event_type"):
            types.append(et)
            blobs.append(hll_partial(g["user_id"].to_numpy(np.uint64)).tobytes())
        return pd.DataFrame({"event_type": types, "reg": blobs})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        reg = hll_merge(list(g["reg"]))
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_users_est": pd.array([hll_estimate(reg)], dtype="int64"),
            }
        )

    out = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
        .map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"].tolist(), pa.string()),
            "n_users_est": pa.array(out["n_users_est"].tolist(), pa.int64()),
        }
    )


QUANTILE_PCTS = (25, 50, 75, 90, 99)


def events_value_quantiles(sf_dir: str) -> "pa.Table":
    """(event_type, q_pct, value_cents): EXACT discrete quantiles of the
    integer-cent event values per type, computed as a two-phase
    HISTOGRAM aggregation — the scale shape for quantiles over bounded-
    resolution values: each batch pre-counts its (type, cent) pairs, the
    bucketed groupby moves one row per distinct pair (not per event),
    and the per-type quantile walk runs over the compact sorted
    histogram inside map_groups. Matches DuckDB ``quantile_disc``
    exactly (1-based rank ceil(q*n)); a 100 TB stream with continuous
    values would swap the histogram for a mergeable t-digest/KLL sketch
    at the same pipeline shape."""
    import numpy as np

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "value_c": to_cents(df["value"]),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    ).map_batches(cents, batch_format="pandas")
    hist = bucketed_groupby_agg(
        ds,
        keys=["event_type", "value_c"],
        aggs={"n": ("value_c", "count")},
    )

    def type_quantiles(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("value_c")
        counts = g["n"].to_numpy()
        values = g["value_c"].to_numpy()
        cum = counts.cumsum()
        n = int(cum[-1])
        out = []
        for pct in QUANTILE_PCTS:
            rank = max(1, int(np.ceil(pct / 100.0 * n)))  # quantile_disc
            out.append((g["event_type"].iloc[0], pct, int(values[np.searchsorted(cum, rank)])))
        return pd.DataFrame(out, columns=["event_type", "q_pct", "value_cents"])

    out = (
        hist.groupby("event_type")
        .map_groups(type_quantiles, batch_format="pandas")
        .to_pandas()
        .sort_values(["event_type", "q_pct"])
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"].tolist(), pa.string()),
            "q_pct": pa.array(out["q_pct"].tolist(), pa.int64()),
            "value_cents": pa.array(out["value_cents"].tolist(), pa.int64()),
        }
    )


TOP_USERS_K = 20


def events_top_users(sf_dir: str, k: int = TOP_USERS_K) -> pa.Table:
    """Top-k users by event count — exact heavy hitters via the same
    plan as top_customers: two-phase count per user, per-block top-k
    (the driver merges at most k rows per bucket block, never the full
    per-user table), deterministic (count desc, user_id asc) ranking."""

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    agg = bucketed_groupby_agg(
        ds,
        keys=["user_id"],
        aggs={"n_events": ("user_id", "count")},
    )

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["n_events", "user_id"], ascending=[False, True]
        ).head(k)

    out = (
        agg.map_batches(block_topk, batch_format="pandas")
        .to_pandas()
        .sort_values(["n_events", "user_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = range(1, len(out) + 1)
    return pa.table(
        {
            "rank": pa.array(out["rank"].tolist(), pa.int64()),
            "user_id": pa.array([int(x) for x in out["user_id"]], pa.int64()),
            "n_events": pa.array([int(x) for x in out["n_events"]], pa.int64()),
        }
    )


def events_top_users_cms(sf_dir: str, k: int = TOP_USERS_K) -> pa.Table:
    """Top-k users by event count via a Count-Min Sketch — the sketch
    path for heavy hitters when the per-key table itself is too wide to
    aggregate exactly: each batch emits ONE (depth × width) count blob
    plus its local candidate top-k rows; blobs merge by elementwise sum
    and the merged sketch scores the candidate union. Rows-only
    operator (CMS overestimates by ≤ εN with ε = e/width; the top-k
    overlap vs the exact operator is pinned in tests)."""
    import numpy as np

    from suckit_ray.stages.sketch import cms_estimate, cms_merge, cms_partial

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        users = df["user_id"].to_numpy(np.uint64)
        blob = cms_partial(users).tobytes()
        # local candidates: this batch's top-k users by local count
        vc = df["user_id"].value_counts()
        cand = vc.index.to_numpy()[: 4 * k]
        return pd.DataFrame(
            {
                "kind": ["cms"] + ["cand"] * len(cand),
                "payload": [blob] + [int(u).to_bytes(8, "little") for u in cand],
            }
        )

    parts = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
    )  # one 64 KB blob + ≤4k tiny candidate rows per batch reach the driver
    sketch = cms_merge(list(parts.loc[parts["kind"] == "cms", "payload"]))
    cands = sorted(
        {
            int.from_bytes(p, "little")
            for p in parts.loc[parts["kind"] == "cand", "payload"]
        }
    )
    est = cms_estimate(sketch, np.array(cands, dtype=np.uint64))
    order = sorted(zip(cands, est), key=lambda t: (-t[1], t[0]))[:k]
    return pa.table(
        {
            "rank": pa.array(range(1, len(order) + 1), pa.int64()),
            "user_id": pa.array([u for u, _ in order], pa.int64()),
            "n_events_est": pa.array([int(c) for _, c in order], pa.int64()),
        }
    )


def events_asof_join(sf_dir: str) -> "rd.Dataset":
    """AS-OF JOIN (an operator Ray Data lacks natively): every
    'purchase' event matched to the same user's most recent 'click' at
    or before it. Composition: filter both sides in one scan → bucket
    by user (the partitioning assumption: BOTH sides of a user land in
    one bucket — same key, same hash) → vectorized ``pandas.merge_asof``
    inside each bucket (sorted backward search, ties broken toward the
    larger event_id by sort order). No-match rows carry -1 sentinels so
    the oracle hash stays integer-exact. Returns
    (event_id, user_id, ts_us, click_event_id, click_ts_us)."""
    from suckit_ray.stages.agg import default_buckets

    n_buckets = default_buckets()

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(["purchase", "click"])]
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "ts_us": df["ts"].to_numpy().astype("datetime64[us]").astype("int64"),
                "is_left": (df["event_type"] == "purchase").astype("int64"),
                "bucket": (df["user_id"] % n_buckets).astype("int64"),
            }
        )

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["is_left"] == 1].sort_values(["ts_us", "event_id"], kind="mergesort")
        right = (
            g[g["is_left"] == 0]
            .sort_values(["ts_us", "event_id"], kind="mergesort")
            .rename(columns={"event_id": "click_event_id"})
        )
        right["click_ts_us"] = right["ts_us"]
        if len(left) == 0:
            # typed empty block: an object-dtype empty frame would
            # degrade the union'd Dataset schema
            return pd.DataFrame(
                {
                    c: pd.array([], dtype="int64")
                    for c in [
                        "event_id", "user_id", "ts_us",
                        "click_event_id", "click_ts_us",
                    ]
                }
            )
        m = pd.merge_asof(
            left[["event_id", "user_id", "ts_us"]],
            right[["user_id", "ts_us", "click_event_id", "click_ts_us"]],
            on="ts_us",
            by="user_id",
            direction="backward",
        )
        m["click_event_id"] = m["click_event_id"].fillna(-1).astype("int64")
        m["click_ts_us"] = m["click_ts_us"].fillna(-1).astype("int64")
        return m[["event_id", "user_id", "ts_us", "click_event_id", "click_ts_us"]]

    # per-purchase rows stream out as a Dataset — O(events) results
    # never land on the driver
    return (
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
        )
        .map_batches(prep, batch_format="pandas")
        .groupby("bucket")
        .map_groups(asof, batch_format="pandas")
    )


RANGE_JOIN_WINDOW_US = 3600 * 1_000_000  # 1 hour


def events_range_join(sf_dir: str) -> "rd.Dataset":
    """RANGE JOIN: for every 'purchase' event, how many of the same
    user's 'click' events fall in the hour AFTER it
    (ts in (purchase_ts, purchase_ts + 1h]). Same bucketed-by-user
    co-group shape as the as-of join; the per-bucket kernel is two
    vectorized ``searchsorted`` passes over each user's sorted click
    timestamps (never a per-row scan, never an exploded cross
    product). Returns (event_id, user_id, ts_us, n_clicks_1h)."""
    import numpy as np

    from suckit_ray.stages.agg import default_buckets

    n_buckets = default_buckets()

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(["purchase", "click"])]
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "ts_us": df["ts"].to_numpy().astype("datetime64[us]").astype("int64"),
                "is_left": (df["event_type"] == "purchase").astype("int64"),
                "bucket": (df["user_id"] % n_buckets).astype("int64"),
            }
        )

    def count_in_range(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["is_left"] == 1]
        out = []
        for uid, lg in left.groupby("user_id"):
            clicks = np.sort(
                g.loc[(g["is_left"] == 0) & (g["user_id"] == uid), "ts_us"].to_numpy()
            )
            ts = lg["ts_us"].to_numpy()
            lo = np.searchsorted(clicks, ts, side="right")        # strictly after
            hi = np.searchsorted(clicks, ts + RANGE_JOIN_WINDOW_US, side="right")
            out.append(
                pd.DataFrame(
                    {
                        "event_id": lg["event_id"].to_numpy(),
                        "user_id": lg["user_id"].to_numpy(),
                        "ts_us": ts,
                        "n_clicks_1h": (hi - lo).astype("int64"),
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                {
                    c: pd.array([], dtype="int64")
                    for c in ["event_id", "user_id", "ts_us", "n_clicks_1h"]
                }
            )
        return pd.concat(out, ignore_index=True)

    # per-purchase rows stream out as a Dataset — O(events) results
    # never land on the driver
    return (
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
        )
        .map_batches(prep, batch_format="pandas")
        .groupby("bucket")
        .map_groups(count_in_range, batch_format="pandas")
    )


RATE_WINDOW_US = 86_400 * 1_000_000  # 24 h sliding window
RATE_LIMIT = 6  # max events allowed inside any window


def events_rate_limit(
    sf_dir: str,
    window_us: int = RATE_WINDOW_US,
    limit: int = RATE_LIMIT,
) -> "rd.Dataset":
    """(event_id, user_id, ts_us, n_in_window, violation): the
    sliding-window RATE-LIMITER audit — for every event, how many of
    the same user's events (itself included) fall in the trailing
    window ``(ts − W, ts]``, and whether that exceeds ``limit`` (the
    abuse/scraper-detection pass any ingestion pipeline runs; the
    same kernel is a crawler's own politeness self-audit). Exact
    integers throughout (µs timestamps), so the SQL window oracle
    (``RANGE BETWEEN W−1 PRECEDING AND CURRENT ROW`` — integer µs
    make the half-open bound exact) hashes bit for bit; equal
    timestamps are peers in both engines (``searchsorted
    side='right'`` ≡ RANGE's tie semantics).

    Scale shape: the range-join bucketed-by-user co-group — one
    scan, one user-hash exchange, two vectorized ``searchsorted``
    passes per user over its sorted timestamps, O(events) output
    streaming out as a Dataset."""
    import numpy as np

    from suckit_ray.stages.agg import default_buckets

    n_buckets = default_buckets()

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "ts_us": df["ts"].to_numpy().astype("datetime64[us]").astype("int64"),
                "bucket": (df["user_id"] % n_buckets).astype("int64"),
            }
        )

    def count_window(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for uid, ug in g.groupby("user_id"):
            ts_sorted = np.sort(ug["ts_us"].to_numpy())
            ts = ug["ts_us"].to_numpy()
            hi = np.searchsorted(ts_sorted, ts, side="right")
            lo = np.searchsorted(ts_sorted, ts - window_us, side="right")
            n = (hi - lo).astype("int64")
            out.append(
                pd.DataFrame(
                    {
                        "event_id": ug["event_id"].to_numpy(),
                        "user_id": ug["user_id"].to_numpy(),
                        "ts_us": ts,
                        "n_in_window": n,
                        "violation": n > limit,
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                {
                    "event_id": pd.array([], dtype="int64"),
                    "user_id": pd.array([], dtype="int64"),
                    "ts_us": pd.array([], dtype="int64"),
                    "n_in_window": pd.array([], dtype="int64"),
                    "violation": pd.array([], dtype="bool"),
                }
            )
        return pd.concat(out, ignore_index=True)

    return (
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
        )
        .map_batches(prep, batch_format="pandas")
        .groupby("bucket")
        .map_groups(count_window, batch_format="pandas")
    )


TOPK_PER_USER = 3


def events_top_k_per_user(sf_dir: str, k: int = TOPK_PER_USER) -> rd.Dataset:
    """(user_id, event_id, rnk): each user's top-k events by value —
    the grouped top-k window (SQL's row_number() OVER (PARTITION BY
    user_id ORDER BY value DESC, event_id)) Ray Data has no native
    operator for. Deterministic: ties on value break on event_id.

    Scale shape: per-BLOCK partial top-k per user first (sort +
    groupby-head is vectorized pandas; the final per-user top-k is a
    subset of the union of per-block top-ks), so the exchange carries
    at most k rows per (user, block) instead of every event; then one
    bucketed groupby on user hash finishes the rank inside each
    bucket. Skewed users cost k rows per block, not their full event
    history."""

    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "value"]
    )

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        p = df.sort_values(
            ["user_id", "value", "event_id"], ascending=[True, False, True]
        ).groupby("user_id", as_index=False).head(k)
        p = p.assign(bucket=(p["user_id"] % B).astype("int64"))
        return p

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(
            ["user_id", "value", "event_id"], ascending=[True, False, True]
        )
        s = s.groupby("user_id", as_index=False).head(k)
        rnk = s.groupby("user_id").cumcount() + 1
        return pd.DataFrame(
            {
                "user_id": s["user_id"].astype("int64"),
                "event_id": s["event_id"].astype("int64"),
                "rnk": rnk.astype("int64"),
            }
        )

    return (
        ds.map_batches(block_topk, batch_format="pandas")
        .groupby("bucket")
        .map_groups(finish, batch_format="pandas")
    )


FUNNEL_STEPS = ("view", "click", "purchase")


def events_funnel(sf_dir: str, window_us: int | None = None) -> rd.Dataset:
    """(user_id, stage): how far each user progressed through the
    ordered view → click → purchase funnel — stage 1 requires a view,
    stage 2 a click STRICTLY AFTER that first view, stage 3 a purchase
    strictly after that first qualifying click (the classic ordered-
    sequence conversion, which plain groupby counts get wrong: a
    purchase BEFORE the first view must not count).

    Scale shape: one bucketed groupby on user hash; inside each bucket
    the three steps are vectorized pandas passes (per-user min-ts of
    step k events gated on the step k-1 timestamp via a map join) —
    no per-user Python loop, no global sort."""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
    )

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(bucket=(df["user_id"] % B).astype("int64"))

    w = np.timedelta64(window_us, "us") if window_us is not None else None

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        users = g["user_id"].unique()
        prev = None  # per-user gate timestamp from the previous step
        stage = pd.Series(0, index=users, dtype="int64")
        for i, step in enumerate(FUNNEL_STEPS, start=1):
            ev = g[g["event_type"] == step]
            if prev is not None:
                gate = ev["user_id"].map(prev)
                ok = gate.notna() & (ev["ts"] > gate)
                if w is not None:  # per-step conversion window
                    ok &= ev["ts"] <= gate + w
                ev = ev[ok]
            cur = ev.groupby("user_id")["ts"].min()
            stage.loc[stage.index.isin(cur.index)] = i
            prev = cur
        return pd.DataFrame(
            {"user_id": stage.index.astype("int64"), "stage": stage.to_numpy()}
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(funnel, batch_format="pandas")
    )


def revenue_by_nation(sf_dir: str) -> rd.Dataset:
    """(nation, sum_rev, n_lines): TPC-H-Q5-shaped revenue rollup —
    the BIG ⋈ BIG equi-join shape (lineitem ⋈ orders on order key;
    at 100 TB BOTH sides are too large to broadcast) the other
    relational queries don't exercise.

    Plan: lineitem pre-aggregates per (batch, orderkey) inside
    map_batches (revenue in integer 10^-4 dollars: price-cents ×
    (100 − discount-percent), exact in int64 and mirrored by the
    oracle), then both tables stream into ONE tagged-union bucketed
    co-group on ``orderkey % B`` — each bucket holds every row of its
    orderkeys from both sides, so the within-bucket join is one
    vectorized pandas merge. customer→nation is the dimension-side
    broadcast (at full TPC-H scale customer would take the same
    co-group pattern on custkey; nation is 25 rows forever). The
    final per-nation rollup is the usual two-phase bucketed agg."""
    import ray

    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    cust = pd.merge(
        rd.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        ).to_pandas(),
        rd.read_parquet(
            f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
        ).to_pandas(),
        left_on="c_nationkey",
        right_on="n_nationkey",
    )
    nation_of = dict(zip(cust["c_custkey"].astype(int), cust["n_name"]))
    nation_ref = ray.put(nation_of)

    def line_partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = to_cents(df["l_extendedprice"]) * (
            100 - to_cents(df["l_discount"])
        )
        p = (
            pd.DataFrame({"orderkey": df["l_orderkey"].astype("int64"), "rev": rev})
            .groupby("orderkey", as_index=False)
            .agg(rev=("rev", "sum"), n=("rev", "size"))
        )
        p["custkey"] = -1
        p["side"] = "l"
        p["bucket"] = (p["orderkey"] % B).astype("int64")
        return p[["orderkey", "side", "custkey", "rev", "n", "bucket"]]

    def order_rows(df: pd.DataFrame) -> pd.DataFrame:
        p = pd.DataFrame(
            {
                "orderkey": df["o_orderkey"].astype("int64"),
                "side": "o",
                "custkey": df["o_custkey"].astype("int64"),
                "rev": 0,
                "n": 0,
            }
        )
        p["bucket"] = (p["orderkey"] % B).astype("int64")
        return p

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(line_partial, batch_format="pandas")
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(order_rows, batch_format="pandas")

    def bucket_join(g: pd.DataFrame) -> pd.DataFrame:
        nation_ = ray.get(nation_ref)
        li = g[g["side"] == "l"][["orderkey", "rev", "n"]]
        od = g[g["side"] == "o"][["orderkey", "custkey"]]
        m = li.merge(od, on="orderkey")
        if not len(m):
            return pd.DataFrame({"nation": [], "rev": [], "n": []})
        m["nation"] = m["custkey"].map(nation_)
        return m.groupby("nation", as_index=False).agg(
            rev=("rev", "sum"), n=("n", "sum")
        )

    joined = (
        lines.union(orders)
        .groupby("bucket")
        .map_groups(bucket_join, batch_format="pandas")
    )
    # Final rollup: bucket_join already reduced each bucket to per-nation
    # partials, so what's left is ≤ B × |nations| rows (nation is 25 rows
    # forever; B caps at 4096 → ≤ 102k tiny rows at the largest cluster).
    # A driver-side combine here is the bounded-result pattern
    # (top_customers-style) — a second sort-shuffle through
    # bucketed_groupby_agg costs a full all-to-all for a kilobyte-scale
    # input (measured: ~3.5 s of the query's 11 s at sf0.1/32 cpus).
    parts = joined.to_pandas()
    out = (
        parts.groupby("nation", as_index=False)
        .agg(sum_rev=("rev", "sum"), n_lines=("n", "sum"))
        .astype({"sum_rev": "int64", "n_lines": "int64"})
    )
    return rd.from_pandas(out[["nation", "sum_rev", "n_lines"]])


RANK_SPLIT_PER_BLOCK = 64  # split-training rows kept per block
# (hash-min selection: order-independent, so value-correlated file
# layouts can't starve the sample the way a head-of-file limit()
# would; the driver sees O(64 × blocks) values — shrink per-block K
# or add a second-level subsample as block count grows)


def _train_rank_splits(
    ds: rd.Dataset, B: int, id_col: str = "event_id",
    value_col: str = "value",
):
    """Quantile split points for the range partitioner, trained on a
    per-block hash-min sample of ``value_col`` (order-independent —
    robust to value-correlated file layouts). None for an empty
    table."""
    import numpy as np

    def sample_rows(df: pd.DataFrame) -> pd.DataFrame:
        h = (
            df[id_col].to_numpy().astype(np.uint64)
            * np.uint64(2654435761)
        ) & np.uint64(0xFFFFFFFF)
        idx = np.argsort(h, kind="stable")[:RANK_SPLIT_PER_BLOCK]
        return pd.DataFrame({"value": df[value_col].to_numpy()[idx]})

    sample = ds.map_batches(sample_rows, batch_format="pandas").to_pandas()
    if len(sample) == 0:
        return None
    qs = np.linspace(0.0, 1.0, B + 1)[1:-1]
    return np.unique(
        np.quantile(sample["value"].to_numpy(), qs, method="lower")
    )


def events_value_rank(sf_dir: str) -> rd.Dataset:
    """(event_id, rnk): GLOBAL rank of every event by (value,
    event_id) — ``ROW_NUMBER() OVER (ORDER BY value, event_id)`` —
    via the distributed-sort recipe: a sample-trained RANGE
    partitioner plus the prefix-sum scan.

    Scale shape: split points come from quantiles of a bounded
    per-block hash-min sample (broadcast once — the skew-aware part:
    splits follow the data distribution across the WHOLE table, so
    hot or drifting value ranges spread across buckets up to tie
    granularity; a head-of-file ``limit()`` would degenerate on
    time-ordered data whose values drift); every row buckets by
    ``searchsorted`` (order-preserving: bucket i's values all ≤
    bucket i+1's); per-bucket counts — O(buckets), not O(rows) —
    take one exclusive prefix on the driver exactly like
    ``docs_pack_sequences``; one range-bucketed co-group sorts
    locally and adds its bucket's base. ONE shuffle carrying
    (event_id, value, bucket); ranks never require a global sort
    materialization."""
    import numpy as np
    import ray

    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "value"])

    splits = _train_rank_splits(ds, B)
    if splits is None:  # empty table → empty result, same schema
        return rd.from_arrow(
            pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "rnk": pa.array([], pa.int64()),
                }
            )
        )
    splits_ref = ray.put(splits)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        sp = ray.get(splits_ref)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "value": df["value"].astype("float64"),
                "vb": np.searchsorted(
                    sp, df["value"].to_numpy(), side="left"
                ).astype("int64"),
            }
        )

    # materialize: bk feeds BOTH the count pass and the final
    # co-group — without this the read + bucketize lineage re-executes
    # for the second consumer (lazy datasets are not cached)
    bk = ds.map_batches(bucketize, batch_format="pandas").materialize()

    from suckit_ray.stages.agg import bucket_prefix_bases

    base_ref = bucket_prefix_bases(bk, "vb")

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(columns=["event_id", "rnk"]).astype("int64")
        base = int(ray.get(base_ref)[int(g["vb"].iloc[0])])
        g = g.sort_values(["value", "event_id"]).reset_index(drop=True)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].astype("int64"),
                "rnk": (np.arange(len(g), dtype=np.int64) + base + 1),
            }
        )

    return bk.groupby("vb").map_groups(rank_group, batch_format="pandas")


US_PER_DAY = 86_400_000_000  # epoch-us → epoch-day divisor (mirrored in SQL)


def events_retention(sf_dir: str) -> rd.Dataset:
    """(cohort_day, day_offset, n_users): classic cohort retention —
    users grouped by their FIRST-event day, counted on each later
    active day. The per-key-anchor + join-back shape: every row's
    contribution depends on an aggregate (the user's min day) computed
    across the whole table.

    Scale shape: one USER-hash co-group does everything per-user —
    cohort (min day), distinct active days, and the (cohort, offset)
    pairs — because all of a user's rows co-locate under the user key;
    each batch pre-shrinks to distinct (user_id, day) first so the
    shuffle carries distinct pairs, not raw events. The co-group emits
    partial (cohort, offset, n) counts, and one bucketed aggregate
    sums them — two exchanges total, both carrying small int rows.
    Day arithmetic is pure TRUNCATING integer division on epoch-µs
    (DuckDB's `//` semantics, emulated sign-exactly on the numpy
    side) — no timezone/calendar dependency."""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def user_days(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        # TRUNCATING division to mirror DuckDB's integer `//` exactly:
        # numpy // floors, so pre-epoch (negative) timestamps with a
        # remainder need +1 to land on the same day as the oracle
        day = us // US_PER_DAY
        day = day + ((us < 0) & (day * US_PER_DAY != us))
        out = pd.DataFrame(
            {"user_id": df["user_id"].astype("int64"), "day": day}
        ).drop_duplicates()
        out["ub"] = (out["user_id"] % B).astype("int64")
        return out

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    ).map_batches(user_days, batch_format="pandas")

    def cohortize(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "cohort_day": pd.array([], dtype="int64"),
                    "day_offset": pd.array([], dtype="int64"),
                    "n": pd.array([], dtype="int64"),
                }
            )
        g = g.drop_duplicates(["user_id", "day"])
        cohort = g.groupby("user_id")["day"].transform("min")
        part = pd.DataFrame(
            {
                "cohort_day": cohort.astype("int64"),
                "day_offset": (g["day"] - cohort).astype("int64"),
            }
        )
        # distinct days per user ⇒ one row per (user, cohort, offset):
        # counting rows counts users
        return part.groupby(
            ["cohort_day", "day_offset"], as_index=False
        ).agg(n=("day_offset", "size"))

    partials = ds.groupby("ub").map_groups(cohortize, batch_format="pandas")
    agg = bucketed_groupby_agg(
        partials,
        keys=["cohort_day", "day_offset"],
        aggs={"n_users": ("n", "sum")},
    )

    def order_cols(df: pd.DataFrame) -> pd.DataFrame:
        return df[["cohort_day", "day_offset", "n_users"]]

    return agg.map_batches(order_cols, batch_format="pandas")


def events_outliers(sf_dir: str) -> rd.Dataset:
    """(event_id, user_id, value_cents): events more than 3 population
    standard deviations from their USER's mean value — per-entity
    anomaly flagging, with the σ-threshold done in EXACT integer
    algebra: |v − S1/n| > 3σ with σ² = (n·S2 − S1²)/n² is equivalent
    to (n·v − S1)² > 9·(n·S2 − S1²) over integer cents, so no float σ
    ever exists and both engines compare the same integers. The
    products exceed int64 for plausible inputs (n=10^4 events at
    v≈10^5 cents puts 9·n·S2 past 2^63), so the SQL side computes in
    HUGEINT and this side runs a vectorized float64 prefilter with an
    error margin, resolving only margin-ambiguous rows with exact
    Python ints — the hot path stays numpy, the exact path touches
    ~0 rows.

    Scale shape: one USER-hash co-group computes (n, S1, S2) where
    the user's rows already are and flags group-locally — no stats
    broadcast (O(users) at web scale) and no join; batches pre-shrink
    nothing (every event is a candidate), so the single exchange
    carries (event_id, user_id, v)."""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        v = to_cents(df["value"])
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "v": v,
                "ub": (df["user_id"] % B).astype("int64"),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    ).map_batches(cents, batch_format="pandas")

    def flag_group(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.array([], dtype="int64"),
                    "user_id": pd.array([], dtype="int64"),
                    "value_cents": pd.array([], dtype="int64"),
                }
            )
        v = g["v"].to_numpy()
        uid_np = g["user_id"].to_numpy()
        grp = g.groupby("user_id")["v"]
        n = grp.transform("size").to_numpy().astype("int64")
        # BOTH prefilter sums run in float64: an int64 transform sum
        # would WRAP for a user with Σv ≥ 2^63 and push the wrapped
        # value confidently OUTSIDE the ambiguity band (the exact
        # path never fires on values it never sees). Float sums don't
        # wrap; their rounding error is what the margin's n factor
        # covers. v and v² themselves stay inside float64's 53-bit
        # exact-integer range (v ≤ ~10^7 cents → v² ≤ 10^14).
        vf = v.astype("float64")
        s1f = (
            pd.Series(vf, index=g.index)
            .groupby(uid_np)
            .transform("sum")
            .to_numpy()
        )
        s2f = (
            pd.Series(vf * vf, index=g.index)
            .groupby(uid_np)
            .transform("sum")
            .to_numpy()
        )
        nf = n.astype("float64")
        devf = nf * vf - s1f
        lhs = devf * devf
        rhs = 9.0 * (nf * s2f - s1f * s1f)
        # the rounding error scales with the PRE-cancellation
        # intermediates (n·S2 and S1² can be ~1e22 while their
        # difference is ~1e13 for low-variance high-mean users), and
        # s2f is a float sum of n terms (error ∝ n·2^-53·ΣvI²) — so
        # the margin must carry both the intermediate magnitudes and
        # an n factor, not max(|lhs|,|rhs|)
        margin = (
            (nf + 1024.0)
            * 2.0**-50
            * (np.abs(lhs) + 9.0 * (nf * s2f + s1f * s1f))
            + 1.0
        )
        keep = lhs > rhs + margin
        amb = np.flatnonzero(
            ~keep & ~(lhs < rhs - margin)
        )  # |lhs−rhs| inside the error band: settle with exact ints
        if len(amb) > 0:
            exact: dict[int, tuple[int, int]] = {}
            for i in amb:
                u = int(uid_np[i])
                if u not in exact:
                    uv = v[uid_np == u]
                    # Python-int sums: this path exists to be exact
                    exact[u] = (
                        sum(int(x) for x in uv),
                        sum(int(x) * int(x) for x in uv),
                    )
                s1i, s2i = exact[u]
                ni, vi = int(n[i]), int(v[i])
                d = ni * vi - s1i
                keep[i] = d * d > 9 * (ni * s2i - s1i * s1i)
        out = g.loc[keep]
        return pd.DataFrame(
            {
                "event_id": out["event_id"].astype("int64"),
                "user_id": out["user_id"].astype("int64"),
                "value_cents": out["v"].astype("int64"),
            }
        )

    return ds.groupby("ub").map_groups(flag_group, batch_format="pandas")


Q3_CUTOFF = "1998-06-01"     # orders strictly before, shipments after
Q3_SEGMENT = "BUILDING"
Q3_TOPK = 10


def q3_shipping_priority(sf_dir: str, k: int = Q3_TOPK) -> "pa.Table":
    """TPC-H-Q3-shaped pipeline: top-k unshipped orders by revenue for
    one market segment — customer(filter) ⋈ orders(filter) ⋈
    lineitem(filter), group by order, ORDER BY revenue DESC LIMIT k.
    Exercises the filtered THREE-table join shape with predicate
    pushdown the other relational queries don't: both date filters run
    INSIDE the parquet read (pyarrow row-group filter via
    ``filter=``), so non-qualifying rows never leave storage.

    Plan: the segment's custkeys are a broadcast membership set (the
    one dimension-side reduction; at full TPC-H scale customer⋈orders
    would take the same orderkey-style co-group on custkey — the
    revenue_by_nation tradeoff, same documentation). Qualifying
    orders and per-order lineitem revenue partials stream into ONE
    tagged-union co-group on ``orderkey % B``; per-bucket top-k, then
    a ≤ k·B-row driver merge (the top_customers idiom). Revenue is
    integer 10^-4 dollars: price-cents × (100 − discount-percent),
    exact in int64 and mirrored by the oracle."""
    import pyarrow.dataset as pds
    import ray

    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()
    cutoff = pd.Timestamp(Q3_CUTOFF)

    import pyarrow.parquet as pq_

    cust = pq_.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey"],
        filters=[("c_mktsegment", "=", Q3_SEGMENT)],  # prune at read
    )
    seg_custkeys = set(cust["c_custkey"].to_pylist())
    seg_ref = ray.put(seg_custkeys)

    def order_rows(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["o_custkey"].isin(ray.get(seg_ref))
        d = df.loc[keep]
        p = pd.DataFrame(
            {
                "orderkey": d["o_orderkey"].astype("int64"),
                "side": "o",
                "odate_us": d["o_orderdate"]
                .to_numpy()
                .astype("datetime64[us]")
                .astype("int64"),
                "priority": d["o_orderpriority"],
                "rev": pd.Series(0, index=d.index, dtype="int64"),
            }
        )
        p["bucket"] = (p["orderkey"] % B).astype("int64")
        return p

    def line_partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = to_cents(df["l_extendedprice"]) * (
            100 - to_cents(df["l_discount"])
        )
        p = (
            pd.DataFrame(
                {"orderkey": df["l_orderkey"].astype("int64"), "rev": rev}
            )
            .groupby("orderkey", as_index=False)
            .agg(rev=("rev", "sum"))
        )
        p["side"] = "l"
        p["odate_us"] = pd.Series(0, index=p.index, dtype="int64")
        p["priority"] = ""
        p["bucket"] = (p["orderkey"] % B).astype("int64")
        return p[["orderkey", "side", "odate_us", "priority", "rev", "bucket"]]

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=pds.field("o_orderdate") < pds.scalar(cutoff),
    ).map_batches(order_rows, batch_format="pandas")
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=pds.field("l_shipdate") > pds.scalar(cutoff),
    ).map_batches(line_partial, batch_format="pandas")

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        li = (
            g[g["side"] == "l"]
            .groupby("orderkey", as_index=False)
            .agg(revenue=("rev", "sum"))
        )
        od = g[g["side"] == "o"][["orderkey", "odate_us", "priority"]]
        m = li.merge(od, on="orderkey")
        if not len(m):
            return pd.DataFrame(
                {
                    "orderkey": pd.array([], dtype="int64"),
                    "revenue": pd.array([], dtype="int64"),
                    "odate_us": pd.array([], dtype="int64"),
                    "priority": pd.array([], dtype="str"),
                }
            )
        m = m.sort_values(
            ["revenue", "orderkey"], ascending=[False, True]
        ).head(k)
        return m[["orderkey", "revenue", "odate_us", "priority"]]

    merged = (
        orders.union(lines)
        .groupby("bucket")
        .map_groups(bucket_topk, batch_format="pandas")
        .to_pandas()  # ≤ k rows per bucket reach the driver
    )
    if "revenue" not in merged.columns:
        # nothing qualified: Ray returns a COLUMN-LESS empty frame
        merged = pd.DataFrame(
            {
                "orderkey": pd.array([], dtype="int64"),
                "revenue": pd.array([], dtype="int64"),
                "odate_us": pd.array([], dtype="int64"),
                "priority": pd.array([], dtype="str"),
            }
        )
    merged = (
        merged.sort_values(["revenue", "orderkey"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "o_orderkey": pa.array(
                merged["orderkey"].astype("int64"), pa.int64()
            ),
            "revenue": pa.array(merged["revenue"].astype("int64"), pa.int64()),
            "odate_us": pa.array(
                merged["odate_us"].astype("int64"), pa.int64()
            ),
            "o_orderpriority": pa.array(merged["priority"], pa.string()),
        }
    )


ANTI_CUTOFF = "1997-01-01"


def orders_unshipped(sf_dir: str) -> rd.Dataset:
    """(o_orderkey, o_custkey, total_cents): orders with NO lineitem
    shipped before the cutoff — the distributed ANTI-JOIN (NOT
    EXISTS) shape. decontamination does this over broadcast n-grams;
    this is the big-big variant where NEITHER side broadcasts.

    Plan: the lineitem side is filtered at the parquet read (pyarrow
    row-group filter) and pre-shrunk inside map_batches to its
    DISTINCT orderkeys, so the shuffle carries ~|qualifying orders|
    rows, not lineitems. One tagged-union co-group on orderkey % B
    subtracts the ship-side keys from the order side group-locally —
    no driver state, no broadcast."""
    import pyarrow.dataset as pds

    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()
    cutoff = pd.Timestamp(ANTI_CUTOFF)

    def order_rows(df: pd.DataFrame) -> pd.DataFrame:
        p = pd.DataFrame(
            {
                "orderkey": df["o_orderkey"].astype("int64"),
                "side": "o",
                "custkey": df["o_custkey"].astype("int64"),
                "total_c": to_cents(df["o_totalprice"]),
            }
        )
        p["bucket"] = (p["orderkey"] % B).astype("int64")
        return p

    def shipped_keys(df: pd.DataFrame) -> pd.DataFrame:
        u = df["l_orderkey"].drop_duplicates().astype("int64")
        p = pd.DataFrame(
            {
                "orderkey": u,
                "side": "l",
                "custkey": pd.Series(-1, index=u.index, dtype="int64"),
                "total_c": pd.Series(0, index=u.index, dtype="int64"),
            }
        )
        p["bucket"] = (p["orderkey"] % B).astype("int64")
        return p

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(order_rows, batch_format="pandas")
    shipped = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate"],
        filter=pds.field("l_shipdate") < pds.scalar(cutoff),
    ).map_batches(shipped_keys, batch_format="pandas")

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        od = g[g["side"] == "o"]
        hit = set(g.loc[g["side"] == "l", "orderkey"])
        keep = od[~od["orderkey"].isin(hit)]
        return pd.DataFrame(
            {
                "o_orderkey": keep["orderkey"].astype("int64"),
                "o_custkey": keep["custkey"].astype("int64"),
                "total_cents": keep["total_c"].astype("int64"),
            }
        )

    return (
        orders.union(shipped)
        .groupby("bucket")
        .map_groups(anti, batch_format="pandas")
    )


Q17_BRAND = "Brand#4"


def q17_small_qty_revenue(sf_dir: str, brand: str = Q17_BRAND) -> pa.Table:
    """TPC-H-Q17-shaped: total revenue from 'small-quantity' orders —
    lineitems of one brand's parts whose quantity is below 20% of
    that part's average order quantity. One row:
    (n_small, total_cents, avg_yearly_milli).

    The correlated-AVG-subquery shape: each row's filter threshold is
    an aggregate over the SAME rows, so rows and their group
    statistic must meet once. Plan: the brand's partkeys come from a
    parquet read with the brand filter pushed into the row-group scan
    and broadcast via ``ray.put`` (dimension side; at a hotter
    selectivity the part rows would ride the co-group as a tagged
    union instead, the q3 tradeoff). The lineitem side pre-aggregates
    per (partkey, qty) INSIDE map_batches — quantity has a bounded
    integer domain, so this is a true combiner: the exchange carries
    at most |parts|×|qty domain| rows per block, never raw lineitems.
    Within each partkey-hash group the threshold test is exact
    integer math: qty < 0.2·avg ⇔ 5·qty·n < sum_qty (strict
    inequality preserved; no floats anywhere). avg_yearly_milli =
    total_cents·1000 // 7 mirrors the oracle's floor division."""
    import pyarrow.parquet as pq_
    import ray

    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    parts = pq_.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey"],
        filters=[("p_brand", "=", brand)],
    )
    keys_ref = ray.put(set(parts["p_partkey"].to_pylist()))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.loc[df["l_partkey"].isin(ray.get(keys_ref))]
        p = (
            pd.DataFrame(
                {
                    "partkey": d["l_partkey"].astype("int64"),
                    # DuckDB CAST(double AS BIGINT) ROUNDS — match it
                    # (quantities are integral today, but truncation
                    # here would silently diverge on fractional input)
                    "qty": round_half_away(d["l_quantity"]),
                    "price_c": to_cents(d["l_extendedprice"]),
                }
            )
            .groupby(["partkey", "qty"], as_index=False)
            .agg(n=("price_c", "size"), price_c=("price_c", "sum"))
        )
        p["bucket"] = (p["partkey"] % B).astype("int64")
        return p

    def small_sum(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby(["partkey", "qty"], as_index=False).agg(
            n=("n", "sum"), price_c=("price_c", "sum")
        )
        a["qn"] = a["qty"] * a["n"]
        stats = a.groupby("partkey", as_index=False).agg(
            sum_qty=("qn", "sum"), n_tot=("n", "sum")
        )
        m = a.merge(stats, on="partkey")
        small = m[5 * m["qty"] * m["n_tot"] < m["sum_qty"]]
        return pd.DataFrame(
            {
                "n_small": [int(small["n"].sum())],
                "total_cents": [int(small["price_c"].sum())],
            }
        )

    per_bucket = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(small_sum, batch_format="pandas")
        .to_pandas()  # one row per bucket reaches the driver
    )
    n_small = int(per_bucket["n_small"].sum()) if len(per_bucket) else 0
    total = int(per_bucket["total_cents"].sum()) if len(per_bucket) else 0
    return pa.table(
        {
            "n_small": pa.array([n_small], pa.int64()),
            "total_cents": pa.array([total], pa.int64()),
            "avg_yearly_milli": pa.array([total * 1000 // 7], pa.int64()),
        }
    )


Q13_EXCLUDE_PRIORITY = "1-URGENT"


def q13_order_histogram(sf_dir: str) -> pa.Table:
    """TPC-H-Q13-shaped: distribution of customers by order count,
    excluding one order priority — (c_count, custdist) sorted by
    custdist DESC, c_count DESC, including the zero-order bucket that
    Q13 gets from its LEFT OUTER JOIN.

    Plan: NO join at all — per-batch partial counts by custkey feed
    one custkey-hash groupby for exact per-customer counts; each
    group emits its count-of-counts histogram plus its distinct-
    customer total, and those ≤ max-orders-per-customer rows merge on
    the driver. The zero bucket is total customers (parquet metadata,
    zero rows scanned) minus customers that ordered — the outer-join-
    free formulation, exact because o_custkey is a foreign key into
    customer. At 10^10 customers the same plan holds: the exchange
    carries one row per (custkey, block) and the driver merge stays
    bounded by the histogram domain × buckets."""
    import pyarrow.parquet as pq_

    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df.loc[df["o_orderpriority"] != Q13_EXCLUDE_PRIORITY]
        p = (
            pd.DataFrame({"custkey": d["o_custkey"].astype("int64")})
            .groupby("custkey", as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        p["bucket"] = (p["custkey"] % B).astype("int64")
        return p

    def hist(g: pd.DataFrame) -> pd.DataFrame:
        per_cust = g.groupby("custkey")["n"].sum()
        h = per_cust.value_counts()
        return pd.DataFrame(
            {
                "bucket": np.repeat(
                    np.int64(g["bucket"].iat[0] if len(g) else -1), len(h)
                ),
                "c_count": h.index.astype("int64"),
                "custdist": h.to_numpy().astype("int64"),
                # group-local distinct customers, summable on the
                # driver because buckets partition custkeys
                "n_cust": np.repeat(np.int64(len(per_cust)), len(h)),
            }
        )

    parts = (
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderpriority"],
        )
        .map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(hist, batch_format="pandas")
        .to_pandas()  # ≤ histogram-domain rows per bucket
    )
    n_customers = pq_.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    if len(parts):
        ordered = int(parts.drop_duplicates("bucket")["n_cust"].sum())
        final = (
            parts.groupby("c_count", as_index=False)["custdist"]
            .sum()
        )
    else:
        ordered = 0
        final = pd.DataFrame(
            {
                "c_count": pd.array([], dtype="int64"),
                "custdist": pd.array([], dtype="int64"),
            }
        )
    zero = n_customers - ordered
    if zero > 0:
        final = pd.concat(
            [final, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
            ignore_index=True,
        )
    final = final.sort_values(
        ["custdist", "c_count"], ascending=[False, False]
    ).reset_index(drop=True)
    return pa.table(
        {
            "c_count": pa.array(final["c_count"].astype("int64"), pa.int64()),
            "custdist": pa.array(
                final["custdist"].astype("int64"), pa.int64()
            ),
        }
    )


Q8_REGION = "ASIA"
Q8_NATION = "NATION_12"
Q8_YEARS = (1996, 1997)


def q8_market_share(
    sf_dir: str, region: str = Q8_REGION, nation: str = Q8_NATION
) -> pa.Table:
    """TPC-H-Q8-shaped market share: of all revenue from orders placed
    by customers in one REGION during two years, the fraction
    supplied by one NATION, per order year — (o_year, nation_rev,
    total_rev, share_micro). Revenue is integer 10^-4 dollars
    (price-cents × (100−discount-percent)); share_micro is
    floor(10^6·nation/total) taken in unbounded integers on both
    sides (the oracle goes through HUGEINT — at corpus scale
    10^6·revenue overflows int64, so neither engine multiplies in
    64-bit).

    The five-table join collapses to ONE big-big co-group: region ⋈
    nation resolves to a nationkey set driver-side (25-row tables),
    the region's custkeys and the supplier→nationkey map broadcast
    via ``ray.put`` (dimension sides, the q3/top_customers tradeoff —
    at a scale where customer can't broadcast, custkey becomes a
    second co-group exactly like this one). Orders carry (orderkey,
    year) after a read-pushed date filter; lineitems pre-reduce to
    per-(orderkey, is-target-nation) revenue partials inside
    map_batches. The orderkey-hash co-group emits per-year partial
    sums — four int64s per bucket reach the driver."""
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq_
    import ray

    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    nat = pq_.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    ).to_pandas()
    reg = pq_.read_table(f"{sf_dir}/region.parquet").to_pandas()
    region_keys = set(
        nat.merge(
            reg[reg["r_name"] == region], left_on="n_regionkey",
            right_on="r_regionkey",
        )["n_nationkey"]
    )
    target_keys = set(nat.loc[nat["n_name"] == nation, "n_nationkey"])

    cust = pq_.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    ck = cust.to_pandas()
    cust_ref = ray.put(
        set(ck.loc[ck["c_nationkey"].isin(region_keys), "c_custkey"])
    )
    sup = pq_.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    target_supp_ref = ray.put(
        set(sup.loc[sup["s_nationkey"].isin(target_keys), "s_suppkey"])
    )

    lo = pd.Timestamp(f"{Q8_YEARS[0]}-01-01")
    hi = pd.Timestamp(f"{Q8_YEARS[1] + 1}-01-01")

    def order_rows(df: pd.DataFrame) -> pd.DataFrame:
        d = df.loc[df["o_custkey"].isin(ray.get(cust_ref))]
        p = pd.DataFrame(
            {
                "orderkey": d["o_orderkey"].astype("int64"),
                "side": 0,
                "year": pd.DatetimeIndex(d["o_orderdate"]).year.astype(
                    "int64"
                ),
                "rev": pd.Series(0, index=d.index, dtype="int64"),
                "is_nat": pd.Series(0, index=d.index, dtype="int64"),
            }
        )
        p["bucket"] = (p["orderkey"] % B).astype("int64")
        return p

    def line_partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = to_cents(df["l_extendedprice"]) * (
            100 - to_cents(df["l_discount"])
        )
        is_nat = (
            df["l_suppkey"].isin(ray.get(target_supp_ref)).astype("int64")
        )
        p = (
            pd.DataFrame(
                {
                    "orderkey": df["l_orderkey"].astype("int64"),
                    "is_nat": is_nat,
                    "rev": rev,
                }
            )
            .groupby(["orderkey", "is_nat"], as_index=False)
            .agg(rev=("rev", "sum"))
        )
        p["side"] = 1
        p["year"] = pd.Series(0, index=p.index, dtype="int64")
        p["bucket"] = (p["orderkey"] % B).astype("int64")
        return p[["orderkey", "side", "year", "rev", "is_nat", "bucket"]]

    def per_year(g: pd.DataFrame) -> pd.DataFrame:
        od = g[g["side"] == 0][["orderkey", "year"]]
        li = g[g["side"] == 1][["orderkey", "rev", "is_nat"]]
        m = li.merge(od, on="orderkey")
        if not len(m):
            return pd.DataFrame(
                {
                    "year": pd.array([], dtype="int64"),
                    "nat_rev": pd.array([], dtype="int64"),
                    "tot_rev": pd.array([], dtype="int64"),
                }
            )
        m["nat_rev"] = m["rev"].where(m["is_nat"] == 1, 0)
        out = m.groupby("year", as_index=False).agg(
            nat_rev=("nat_rev", "sum"), tot_rev=("rev", "sum")
        )
        return out[["year", "nat_rev", "tot_rev"]].astype("int64")

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pds.field("o_orderdate") >= pds.scalar(lo))
        & (pds.field("o_orderdate") < pds.scalar(hi)),
    ).map_batches(order_rows, batch_format="pandas")
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(line_partial, batch_format="pandas")

    merged = (
        orders.union(lines)
        .groupby("bucket")
        .map_groups(per_year, batch_format="pandas")
        .to_pandas()  # ≤ 2 rows per bucket reach the driver
    )
    years, nats, tots, shares = [], [], [], []
    for y in Q8_YEARS:
        sel = merged[merged["year"] == y] if len(merged) else merged
        nat_rev = int(sel["nat_rev"].sum()) if len(sel) else 0
        tot_rev = int(sel["tot_rev"].sum()) if len(sel) else 0
        years.append(y)
        nats.append(nat_rev)
        tots.append(tot_rev)
        # Python ints: exact at any magnitude, mirrors HUGEINT
        shares.append((1_000_000 * nat_rev) // tot_rev if tot_rev else 0)
    return pa.table(
        {
            "o_year": pa.array(years, pa.int64()),
            "nation_rev": pa.array(nats, pa.int64()),
            "total_rev": pa.array(tots, pa.int64()),
            "share_micro": pa.array(shares, pa.int64()),
        }
    )


def events_markov(sf_dir: str) -> pa.Table:
    """First-order Markov transition matrix over per-user event
    streams: (src, dst, n_pair, prob_micro) for every observed
    consecutive event-type pair, prob_micro =
    floor(10^6·c(src→dst)/Σ_d c(src→d)) — the user-behavior-model /
    session-language-model estimation shape.

    Plan: the ONLY wide step is the sessionize-style user-hash
    co-group (consecutive pairs need each user's events totally
    ordered in one place; ties broken by event_id exactly as the
    oracle's window ORDER BY does). Each group reduces to its local
    (src, dst) pair counts — at most |event types|² rows — so the
    driver merge is bounded by the type-domain, not the corpus. The
    division happens once on ≤25 merged rows in unbounded Python
    ints (oracle: HUGEINT)."""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def to_us(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "ts_us": df["ts"]
                .to_numpy()
                .astype("datetime64[us]")
                .astype("int64"),
                "event_id": df["event_id"].astype("int64"),
                "event_type": df["event_type"],
                "bucket": (df["user_id"] % B).astype("int64"),
            }
        )

    def pair_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["user_id", "ts_us", "event_id"], kind="mergesort"
        )
        same_user = g["user_id"].eq(g["user_id"].shift(-1))
        src = g["event_type"]
        dst = g["event_type"].shift(-1)
        p = (
            pd.DataFrame({"src": src[same_user], "dst": dst[same_user]})
            .groupby(["src", "dst"], as_index=False)
            .size()
            .rename(columns={"size": "n_pair"})
        )
        p["n_pair"] = p["n_pair"].astype("int64")
        return p

    parts = (
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id", "event_type"],
        )
        .map_batches(to_us, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pair_counts, batch_format="pandas")
        .to_pandas()  # ≤ |types|² rows per bucket reach the driver
    )
    if not len(parts) or "src" not in parts.columns:
        return pa.table(
            {
                "src": pa.array([], pa.string()),
                "dst": pa.array([], pa.string()),
                "n_pair": pa.array([], pa.int64()),
                "prob_micro": pa.array([], pa.int64()),
            }
        )
    agg = parts.groupby(["src", "dst"], as_index=False)["n_pair"].sum()
    tot = agg.groupby("src")["n_pair"].sum().to_dict()
    agg = agg.sort_values(["src", "dst"]).reset_index(drop=True)
    prob = [
        (1_000_000 * int(n)) // int(tot[s])
        for s, n in zip(agg["src"], agg["n_pair"])
    ]
    return pa.table(
        {
            "src": pa.array(agg["src"], pa.string()),
            "dst": pa.array(agg["dst"], pa.string()),
            "n_pair": pa.array(agg["n_pair"].astype("int64"), pa.int64()),
            "prob_micro": pa.array(prob, pa.int64()),
        }
    )


Q22_LAPSE_CUTOFF = "1999-01-01"


def q22_global_sales_opportunity(sf_dir: str) -> pa.Table:
    """TPC-H-Q22-shaped: per nation, count and total balance of
    customers with an above-average account balance and NO order
    since the lapse cutoff — (c_nationkey, numcust,
    totacctbal_cents). The scalar-subquery + anti-join shape: a
    corpus-wide aggregate gates a row filter, then NOT EXISTS against
    a second big table (Q22 proper anti-joins all orders; this corpus
    gives every customer at least one lifetime order, so the lapse
    cutoff keeps the anti-join non-vacuous AND pushes a date filter
    into the orders read).

    Plan: the global average is a two-phase reduction (per-batch
    (sum_cents, n) partials, driver-merged to two ints — no shuffle)
    broadcast back into the filter, which keeps the comparison exact:
    bal_cents·n > sum_cents avoids the division both engines would
    round differently. The anti-join is the orders_unshipped co-group
    on custkey-hash: qualifying customers and order custkeys meet in
    one exchange; per-nation partials then merge on the driver
    (≤ |nations| rows per bucket)."""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )

    def bal_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = to_cents(df["c_acctbal"])
        pos = c[c > 0]
        return pd.DataFrame(
            {"sum_c": [int(pos.sum())], "n": [int(len(pos))]}
        )

    stats = cust.map_batches(bal_partial, batch_format="pandas").to_pandas()
    sum_c, n_pos = int(stats["sum_c"].sum()), int(stats["n"].sum())

    def cust_rows(df: pd.DataFrame) -> pd.DataFrame:
        c = to_cents(df["c_acctbal"])
        # bal > avg ⇔ bal·n > sum (ints exact; avg of the POSITIVE
        # balances, the Q22 convention)
        keep = (c * n_pos) > sum_c
        d = df.loc[keep]
        p = pd.DataFrame(
            {
                "custkey": d["c_custkey"].astype("int64"),
                "side": 0,
                "nationkey": d["c_nationkey"].astype("int64"),
                "bal_c": c[keep].astype("int64"),
            }
        )
        p["bucket"] = (p["custkey"] % B).astype("int64")
        return p

    def order_keys(df: pd.DataFrame) -> pd.DataFrame:
        p = pd.DataFrame(
            {"custkey": df["o_custkey"].unique().astype("int64")}
        )
        p["side"] = 1
        p["nationkey"] = pd.Series(0, index=p.index, dtype="int64")
        p["bal_c"] = pd.Series(0, index=p.index, dtype="int64")
        p["bucket"] = (p["custkey"] % B).astype("int64")
        return p[["custkey", "side", "nationkey", "bal_c", "bucket"]]

    def anti_agg(g: pd.DataFrame) -> pd.DataFrame:
        cs = g[g["side"] == 0]
        ordered = set(g.loc[g["side"] == 1, "custkey"])
        keep = cs[~cs["custkey"].isin(ordered)]
        if not len(keep):
            return pd.DataFrame(
                {
                    "c_nationkey": pd.array([], dtype="int64"),
                    "numcust": pd.array([], dtype="int64"),
                    "totacctbal_cents": pd.array([], dtype="int64"),
                }
            )
        out = keep.groupby("nationkey", as_index=False).agg(
            numcust=("custkey", "size"), totacctbal_cents=("bal_c", "sum")
        )
        return pd.DataFrame(
            {
                "c_nationkey": out["nationkey"].astype("int64"),
                "numcust": out["numcust"].astype("int64"),
                "totacctbal_cents": out["totacctbal_cents"].astype("int64"),
            }
        )

    import pyarrow.dataset as pds

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"],
        filter=pds.field("o_orderdate")
        >= pds.scalar(pd.Timestamp(Q22_LAPSE_CUTOFF)),
    ).map_batches(order_keys, batch_format="pandas")
    parts = (
        cust.map_batches(cust_rows, batch_format="pandas")
        .union(orders)
        .groupby("bucket")
        .map_groups(anti_agg, batch_format="pandas")
        .to_pandas()  # ≤ |nations| rows per bucket reach the driver
    )
    if not len(parts) or "c_nationkey" not in parts.columns:
        return pa.table(
            {
                "c_nationkey": pa.array([], pa.int64()),
                "numcust": pa.array([], pa.int64()),
                "totacctbal_cents": pa.array([], pa.int64()),
            }
        )
    final = parts.groupby("c_nationkey", as_index=False).agg(
        numcust=("numcust", "sum"),
        totacctbal_cents=("totacctbal_cents", "sum"),
    )
    return pa.table(
        {
            "c_nationkey": pa.array(
                final["c_nationkey"].astype("int64"), pa.int64()
            ),
            "numcust": pa.array(final["numcust"].astype("int64"), pa.int64()),
            "totacctbal_cents": pa.array(
                final["totacctbal_cents"].astype("int64"), pa.int64()
            ),
        }
    )


def lineitem_rollup(sf_dir: str) -> pa.Table:
    """GROUP BY ROLLUP(l_returnflag, l_linestatus) over lineitem —
    (lvl, l_returnflag, l_linestatus, n_rows, sum_qty,
    sum_price_cents) with subtotal rows per flag and a grand total
    (lvl = number of rolled-up columns; NULL group values carried as
    '' so the hash compare is stable).

    Plan: the ROLLUP levels are DERIVED, not re-scanned — one
    two-phase aggregation produces the finest grain (≤ |flags|×
    |status| rows after per-batch combiners), and the coarser levels
    are arithmetic over that tiny frame on the driver. At any corpus
    size the wide work is identical to lineitem_agg; rollup adds zero
    exchanges — the point of the operator."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        p = (
            pd.DataFrame(
                {
                    "l_returnflag": df["l_returnflag"],
                    "l_linestatus": df["l_linestatus"],
                    "qty": round_half_away(df["l_quantity"]),
                    "price_c": to_cents(df["l_extendedprice"]),
                }
            )
            .groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .agg(
                n_rows=("qty", "size"),
                sum_qty=("qty", "sum"),
                sum_price_cents=("price_c", "sum"),
            )
        )
        return p

    fine = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()  # ≤ flag×status rows per block reach the driver
        .groupby(["l_returnflag", "l_linestatus"], as_index=False)
        .agg(
            n_rows=("n_rows", "sum"),
            sum_qty=("sum_qty", "sum"),
            sum_price_cents=("sum_price_cents", "sum"),
        )
    )
    fine["lvl"] = 0
    sub = fine.groupby("l_returnflag", as_index=False).agg(
        n_rows=("n_rows", "sum"),
        sum_qty=("sum_qty", "sum"),
        sum_price_cents=("sum_price_cents", "sum"),
    )
    sub["l_linestatus"] = ""
    sub["lvl"] = 1
    tot = pd.DataFrame(
        {
            "l_returnflag": [""],
            "l_linestatus": [""],
            "n_rows": [int(fine["n_rows"].sum())],
            "sum_qty": [int(fine["sum_qty"].sum())],
            "sum_price_cents": [int(fine["sum_price_cents"].sum())],
            "lvl": [2],
        }
    )
    cols = ["lvl", "l_returnflag", "l_linestatus", "n_rows", "sum_qty",
            "sum_price_cents"]
    out = pd.concat([fine[cols], sub[cols], tot[cols]], ignore_index=True)
    return pa.table(
        {
            "lvl": pa.array(out["lvl"].astype("int64"), pa.int64()),
            "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
            "l_linestatus": pa.array(out["l_linestatus"], pa.string()),
            "n_rows": pa.array(out["n_rows"].astype("int64"), pa.int64()),
            "sum_qty": pa.array(out["sum_qty"].astype("int64"), pa.int64()),
            "sum_price_cents": pa.array(
                out["sum_price_cents"].astype("int64"), pa.int64()
            ),
        }
    )


def events_running_total(sf_dir: str) -> rd.Dataset:
    """(user_id, event_id, run_total_cents): per-user running sum of
    event values in time order — the cumulative window-function shape
    (SUM OVER PARTITION BY ... ORDER BY ... ROWS UNBOUNDED
    PRECEDING). One user-hash co-group totally orders each user's
    events in one place; the cumsum inside the group is one
    vectorized pandas pass, and ties break on event_id exactly as the
    oracle's window ORDER BY. Unlike docs_pack_sequences (a GLOBAL
    prefix sum needing a two-stage offset exchange), a PARTITIONED
    prefix sum needs no cross-group communication at all — the
    co-group IS the whole plan, which is why output rows never
    converge on the driver (the result stays a Dataset)."""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "event_id": df["event_id"].astype("int64"),
                "ts_us": df["ts"]
                .to_numpy()
                .astype("datetime64[us]")
                .astype("int64"),
                "value_c": to_cents(df["value"]),
                "bucket": (df["user_id"] % B).astype("int64"),
            }
        )

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["user_id", "ts_us", "event_id"], kind="mergesort"
        )
        out = pd.DataFrame(
            {
                "user_id": g["user_id"],
                "event_id": g["event_id"],
                "run_total_cents": g.groupby("user_id")["value_c"]
                .cumsum()
                .astype("int64"),
            }
        )
        return out

    return (
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_id", "ts", "value"],
        )
        .map_batches(prep, batch_format="pandas")
        .groupby("bucket")
        .map_groups(running, batch_format="pandas")
    )


def events_value_quantiles_kll(sf_dir: str) -> pa.Table:
    """(event_type, q_pct, value_cents): APPROXIMATE per-type
    quantiles via mergeable KLL sketches — the scale path named by
    ``events_value_quantiles``' docstring for when the value domain
    stops being bounded and a histogram row per distinct value is no
    longer small. Each batch folds its values into one sketch per
    type (a few KB), the event_type groupby moves blobs instead of
    values, and the merged sketch answers all percentiles at once.
    No SQL oracle (sketch answers are approximate and fold-order
    dependent); tests/test_round3b_ops.py pins the rank error of
    every answer against the exact data."""
    from suckit_ray.stages.sketch import KLLSketch

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = to_cents(df["value"]).to_numpy()
        types, blobs = [], []
        for t, idx in df.groupby("event_type", sort=False).indices.items():
            s = KLLSketch()
            s.add(c[idx])
            types.append(t)
            blobs.append(s.to_bytes())
        return pd.DataFrame(
            {
                "event_type": pd.Series(types, dtype="object"),
                "blob": pd.Series(blobs, dtype="object"),
            }
        )

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        s = KLLSketch.from_bytes(g["blob"].iloc[0])
        for b in g["blob"].iloc[1:]:
            s.merge(KLLSketch.from_bytes(b))
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]] * len(QUANTILE_PCTS),
                "q_pct": pd.Series(QUANTILE_PCTS, dtype="int64"),
                "value_cents": pd.Series(
                    [s.quantile(p / 100.0) for p in QUANTILE_PCTS],
                    dtype="int64",
                ),
            }
        )

    merged = (
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
        .map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .map_groups(merge_group, batch_format="pandas")
        .to_pandas()  # |types| × |pcts| rows
    )
    merged = merged.sort_values(["event_type", "q_pct"]).reset_index(
        drop=True
    )
    return pa.table(
        {
            "event_type": pa.array(merged["event_type"], pa.string()),
            "q_pct": pa.array(merged["q_pct"].astype("int64"), pa.int64()),
            "value_cents": pa.array(
                merged["value_cents"].astype("int64"), pa.int64()
            ),
        }
    )


PIVOT_PRIORITIES = (
    ("1-URGENT", "n_urgent"),
    ("2-HIGH", "n_high"),
    ("3-MEDIUM", "n_medium"),
    ("4-NOT SPECIFIED", "n_not_specified"),
    ("5-LOW", "n_low"),
)


def orders_priority_pivot(sf_dir: str) -> pa.Table:
    """(o_year, n_urgent, ..., n_low, total): order counts pivoted to
    one column per priority — the reshape/crosstab operator. The wide
    work is ONE two-phase count over (year, priority) (per-batch
    combiners, then the bucketed groupby); the pivot itself touches
    only the ≤ |years|·|priorities| aggregated rows on the driver, so
    the reshape is free at any corpus size — the point of pivoting
    AFTER aggregation rather than carrying wide rows through the
    exchange."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        p = (
            pd.DataFrame(
                {
                    "o_year": pd.DatetimeIndex(df["o_orderdate"]).year.astype(
                        "int64"
                    ),
                    "priority": df["o_orderpriority"],
                }
            )
            .groupby(["o_year", "priority"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        p["n"] = p["n"].astype("int64")
        return p

    counts = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderdate", "o_orderpriority"],
        ).map_batches(partial, batch_format="pandas"),
        keys=["o_year", "priority"],
        aggs={"n": ("n", "sum")},
    ).to_pandas()  # ≤ |years|·|priorities| rows

    wide = (
        counts.pivot_table(
            index="o_year", columns="priority", values="n",
            aggfunc="sum", fill_value=0,
        )
        .reset_index()
        .sort_values("o_year")
    )
    cols = {"o_year": pa.array(wide["o_year"].astype("int64"), pa.int64())}
    total = np.zeros(len(wide), dtype="int64")
    for prio, name in PIVOT_PRIORITIES:
        v = (
            wide[prio].to_numpy().astype("int64")
            if prio in wide.columns
            else np.zeros(len(wide), dtype="int64")
        )
        cols[name] = pa.array(v, pa.int64())
        total += v
    cols["total"] = pa.array(total, pa.int64())
    return pa.table(cols)


def events_cube(sf_dir: str) -> pa.Table:
    """GROUP BY CUBE(event_type, weekday) over events — (lvl,
    event_type, weekday, n_events, sum_value_cents) with all four
    grouping levels: finest grain, per-type, per-weekday, grand
    total (lvl = GROUPING bitmask: bit 0 = weekday rolled up, bit 1
    = event_type rolled up; rolled-up strings carried as '' and
    weekday as -1 so hashes are stable).

    Same discipline as ``lineitem_rollup``: ONE two-phase exchange
    computes the finest grain (bounded by |types|·7 after per-batch
    combiners) and every coarser level is arithmetic over that tiny
    frame on the driver — CUBE adds zero exchanges."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy().astype("datetime64[us]")
        # days since epoch → weekday, epoch day 0 = Thursday = ISO 3
        days = ts.astype("datetime64[D]").astype("int64")
        weekday = (days + 3) % 7  # 0 = Monday … 6 = Sunday
        p = (
            pd.DataFrame(
                {
                    "event_type": df["event_type"],
                    "weekday": weekday.astype("int64"),
                    "value_c": to_cents(df["value"]),
                }
            )
            .groupby(["event_type", "weekday"], as_index=False)
            .agg(n_events=("value_c", "size"), sum_value_cents=("value_c", "sum"))
        )
        return p

    fine = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
        ).map_batches(partial, batch_format="pandas"),
        keys=["event_type", "weekday"],
        aggs={
            "n_events": ("n_events", "sum"),
            "sum_value_cents": ("sum_value_cents", "sum"),
        },
    ).to_pandas()  # ≤ |types|·7 rows
    if not len(fine):
        # CUBE over an empty table still yields the () grouping set:
        # one grand-total row with count 0 and a NULL sum.
        return pa.table(
            {
                "lvl": pa.array([3], pa.int64()),
                "event_type": pa.array([""], pa.string()),
                "weekday": pa.array([-1], pa.int64()),
                "n_events": pa.array([0], pa.int64()),
                "sum_value_cents": pa.array([None], pa.int64()),
            }
        )
    fine = fine.astype({"weekday": "int64", "n_events": "int64",
                        "sum_value_cents": "int64"})
    fine["lvl"] = 0
    by_type = fine.groupby("event_type", as_index=False).agg(
        n_events=("n_events", "sum"), sum_value_cents=("sum_value_cents", "sum")
    )
    by_type["weekday"] = -1
    by_type["lvl"] = 1
    by_day = fine.groupby("weekday", as_index=False).agg(
        n_events=("n_events", "sum"), sum_value_cents=("sum_value_cents", "sum")
    )
    by_day["event_type"] = ""
    by_day["lvl"] = 2
    tot = pd.DataFrame(
        {
            "event_type": [""],
            "weekday": [-1],
            "n_events": [int(fine["n_events"].sum())],
            "sum_value_cents": [int(fine["sum_value_cents"].sum())],
            "lvl": [3],
        }
    )
    cols = ["lvl", "event_type", "weekday", "n_events", "sum_value_cents"]
    out = pd.concat(
        [fine[cols], by_type[cols], by_day[cols], tot[cols]],
        ignore_index=True,
    )
    return pa.table(
        {
            "lvl": pa.array(out["lvl"].astype("int64"), pa.int64()),
            "event_type": pa.array(out["event_type"], pa.string()),
            "weekday": pa.array(out["weekday"].astype("int64"), pa.int64()),
            "n_events": pa.array(out["n_events"].astype("int64"), pa.int64()),
            "sum_value_cents": pa.array(
                out["sum_value_cents"].astype("int64"), pa.int64()
            ),
        }
    )


Q4_LO, Q4_HI = "1997-01-01", "1997-04-01"


def q4_order_priority(sf_dir: str) -> pa.Table:
    """TPC-H-Q4-shaped: (o_orderpriority, n_orders) for one quarter's
    orders that had at least one lineitem shipped AFTER the order
    date — the distributed SEMI-JOIN (EXISTS) shape, the complement
    of orders_unshipped's anti-join. The correlated predicate
    (l_shipdate > o_orderdate) collapses to a per-order aggregate:
    EXISTS(ship > odate) ⇔ max(ship) > odate, and max is a perfect
    combiner — each lineitem batch pre-reduces to one
    (orderkey, max_ship) row, so the co-group never carries raw
    lineitems. Orders are date-filtered AT THE READ; the final
    priority histogram is ≤ |priorities| rows per bucket merged on
    the driver."""
    import pyarrow.dataset as pds

    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()
    lo, hi = pd.Timestamp(Q4_LO), pd.Timestamp(Q4_HI)

    def order_rows(df: pd.DataFrame) -> pd.DataFrame:
        p = pd.DataFrame(
            {
                "orderkey": df["o_orderkey"].astype("int64"),
                "side": 0,
                "odate_us": df["o_orderdate"]
                .to_numpy()
                .astype("datetime64[us]")
                .astype("int64"),
                "priority": df["o_orderpriority"],
            }
        )
        p["bucket"] = (p["orderkey"] % B).astype("int64")
        return p

    def line_partial(df: pd.DataFrame) -> pd.DataFrame:
        p = (
            pd.DataFrame(
                {
                    "orderkey": df["l_orderkey"].astype("int64"),
                    "odate_us": df["l_shipdate"]
                    .to_numpy()
                    .astype("datetime64[us]")
                    .astype("int64"),
                }
            )
            .groupby("orderkey", as_index=False)
            .agg(odate_us=("odate_us", "max"))  # max-ship combiner
        )
        p["side"] = 1
        p["priority"] = ""
        p["bucket"] = (p["orderkey"] % B).astype("int64")
        return p[["orderkey", "side", "odate_us", "priority", "bucket"]]

    def semi(g: pd.DataFrame) -> pd.DataFrame:
        od = g[g["side"] == 0]
        ms = (
            g[g["side"] == 1]
            .groupby("orderkey", as_index=False)
            .agg(max_ship=("odate_us", "max"))
        )
        m = od.merge(ms, on="orderkey")
        keep = m[m["max_ship"] > m["odate_us"]]
        out = (
            keep.groupby("priority", as_index=False)
            .size()
            .rename(columns={"size": "n_orders"})
        )
        out["n_orders"] = out["n_orders"].astype("int64")
        return out

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=(pds.field("o_orderdate") >= pds.scalar(lo))
        & (pds.field("o_orderdate") < pds.scalar(hi)),
    ).map_batches(order_rows, batch_format="pandas")
    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(line_partial, batch_format="pandas")

    parts = (
        orders.union(lines)
        .groupby("bucket")
        .map_groups(semi, batch_format="pandas")
        .to_pandas()  # ≤ |priorities| rows per bucket
    )
    if not len(parts) or "priority" not in parts.columns:
        return pa.table(
            {
                "o_orderpriority": pa.array([], pa.string()),
                "n_orders": pa.array([], pa.int64()),
            }
        )
    final = (
        parts.groupby("priority", as_index=False)["n_orders"]
        .sum()
        .sort_values("priority")
    )
    return pa.table(
        {
            "o_orderpriority": pa.array(final["priority"], pa.string()),
            "n_orders": pa.array(final["n_orders"].astype("int64"), pa.int64()),
        }
    )


Q14_MONTH_LO, Q14_MONTH_HI = "1997-06-01", "1997-07-01"
Q14_PROMO_TYPE = "PROMO"


def q14_promo_revenue(sf_dir: str) -> pa.Table:
    """TPC-H-Q14-shaped: one row (promo_rev, total_rev, promo_micro)
    — the share of one month's shipped revenue coming from parts of
    the PROMO type, promo_micro = floor(10^6·promo/total) in
    unbounded integers (HUGEINT in the oracle). The conditional-
    aggregation-over-a-join shape: the part side reduces to a
    broadcast promo-partkey set (read with the type filter pushed
    down; at part cardinalities beyond broadcast this becomes the q17
    partkey co-group), the lineitem side is date-filtered at the read
    and pre-reduces per batch to TWO int64 partial sums — nothing
    else moves."""
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq_
    import ray

    lo, hi = pd.Timestamp(Q14_MONTH_LO), pd.Timestamp(Q14_MONTH_HI)
    promo = pq_.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey"],
        filters=[("p_type", "=", Q14_PROMO_TYPE)],
    )
    promo_ref = ray.put(set(promo["p_partkey"].to_pylist()))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = to_cents(df["l_extendedprice"]) * (
            100 - to_cents(df["l_discount"])
        )
        is_promo = df["l_partkey"].isin(ray.get(promo_ref))
        return pd.DataFrame(
            {
                "promo_rev": [int(rev[is_promo].sum())],
                "total_rev": [int(rev.sum())],
            }
        )

    parts = (
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_extendedprice", "l_discount",
                     "l_shipdate"],
            filter=(pds.field("l_shipdate") >= pds.scalar(lo))
            & (pds.field("l_shipdate") < pds.scalar(hi)),
        )
        .map_batches(partial, batch_format="pandas")
        .to_pandas()  # one row per block
    )
    promo_rev = int(parts["promo_rev"].sum()) if len(parts) else 0
    total_rev = int(parts["total_rev"].sum()) if len(parts) else 0
    share = (1_000_000 * promo_rev) // total_rev if total_rev else 0
    return pa.table(
        {
            "promo_rev": pa.array([promo_rev], pa.int64()),
            "total_rev": pa.array([total_rev], pa.int64()),
            "promo_micro": pa.array([share], pa.int64()),
        }
    )


def events_daily_gapfill(sf_dir: str) -> rd.Dataset:
    """(event_type, day, n_events, sum_value_cents) for EVERY day in
    the corpus's [min, max] span — the densification / gap-fill shape
    (time-series features need explicit zero rows for silent days;
    a groupby alone can't produce rows for data that isn't there).

    Plan: the same two-phase (type, day) count every windowed query
    uses, plus a driver-held pair of scalars (global min/max day,
    reduced from O(blocks) partials) broadcast into the per-type
    groups, where a vectorized reindex fills the holes with zeros.
    The grid is emitted INSIDE the per-type groups — the driver never
    holds a row of it; at web scale the group key would widen to
    (type, year) to keep any one group's slice of the grid bounded."""
    import numpy as np
    import ray

    from suckit_ray.stages.agg import bucketed_groupby_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        # TRUNCATING division mirroring DuckDB's `//` (same idiom as
        # events_retention): numpy floors, so negative (pre-epoch)
        # timestamps with a remainder need +1 to match the oracle.
        day = us // US_PER_DAY
        day = day + ((us < 0) & (day * US_PER_DAY != us))
        p = (
            pd.DataFrame(
                {
                    "event_type": df["event_type"],
                    "day": day.astype("int64"),
                    "value_c": to_cents(df["value"]),
                }
            )
            .groupby(["event_type", "day"], as_index=False)
            .agg(n_events=("value_c", "size"), sum_value_cents=("value_c", "sum"))
        )
        return p

    counts = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
        ).map_batches(partial, batch_format="pandas"),
        keys=["event_type", "day"],
        aggs={
            "n_events": ("n_events", "sum"),
            "sum_value_cents": ("sum_value_cents", "sum"),
        },
    ).materialize()  # feeds the bounds scan AND the gap-fill groups

    span = _global_day_span(counts)
    if span is None:
        return rd.from_arrow(
            pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "day": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "sum_value_cents": pa.array([], pa.int64()),
                }
            )
        )
    span_ref = ray.put(span)

    def gap_fill(g: pd.DataFrame) -> pd.DataFrame:
        lo_, hi_ = ray.get(span_ref)
        days = np.arange(lo_, hi_ + 1, dtype="int64")
        idx = g.set_index("day").reindex(days)
        return pd.DataFrame(
            {
                "event_type": g["event_type"].iloc[0],
                "day": days,
                "n_events": idx["n_events"].fillna(0).astype("int64").to_numpy(),
                "sum_value_cents": idx["sum_value_cents"]
                .fillna(0)
                .astype("int64")
                .to_numpy(),
            }
        )

    return counts.groupby("event_type").map_groups(
        gap_fill, batch_format="pandas"
    )


MOVAVG_WINDOW = 3  # current row + 2 preceding


def events_moving_avg(sf_dir: str) -> rd.Dataset:
    """(user_id, event_id, mov_avg_milli): per-user moving average of
    the last 3 event values in time order — the BOUNDED-frame window
    shape (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), complementing
    ``events_running_total``'s unbounded frame. Same single user-hash
    co-group; the rolling sum inside each group is one vectorized
    pandas pass, and the average is integer-divided in milli-cents
    with DuckDB's TRUNCATING `//` semantics emulated sign-exactly
    (sum·1000 // frame_rows — DuckDB's AVG would be float; pandas //
    floors, so negative window sums need the +1 correction)."""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "event_id": df["event_id"].astype("int64"),
                "ts_us": df["ts"]
                .to_numpy()
                .astype("datetime64[us]")
                .astype("int64"),
                "value_c": to_cents(df["value"]),
                "bucket": (df["user_id"] % B).astype("int64"),
            }
        )

    def rolling(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["user_id", "ts_us", "event_id"], kind="mergesort"
        )
        grp = g.groupby("user_id")["value_c"]
        rsum = grp.rolling(MOVAVG_WINDOW, min_periods=1).sum().reset_index(
            level=0, drop=True
        )
        rcnt = grp.rolling(MOVAVG_WINDOW, min_periods=1).count().reset_index(
            level=0, drop=True
        )
        num = rsum.astype("int64") * 1000
        den = rcnt.astype("int64")
        q = num // den  # pandas floors; correct to DuckDB's truncation
        q = q + ((num < 0) & (q * den != num))
        return pd.DataFrame(
            {
                "user_id": g["user_id"],
                "event_id": g["event_id"],
                "mov_avg_milli": q.astype("int64"),
            }
        )

    return (
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_id", "ts", "value"],
        )
        .map_batches(prep, batch_format="pandas")
        .groupby("bucket")
        .map_groups(rolling, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# bloom-prefiltered distributed join (TPC-H-Q10-shaped)
# ---------------------------------------------------------------------------

Q10_LO, Q10_HI = "1997-01-01", "1997-04-01"
Q10_TOPK = 20
BLOOM_BITS = 1 << 20   # 128 KB bitmap; ~10 bits/key up to ~10^5 keys
BLOOM_HASHES = 4


def _bloom_positions(keys: "np.ndarray", m_bits: int, k: int):
    """k probe positions per key via double hashing over two
    splitmix64-style avalanche mixes — vectorized, no Python loop.
    Yields k arrays of bit indices in [0, m_bits)."""
    import numpy as np

    x = keys.astype(np.uint64)
    with np.errstate(over="ignore"):
        h1 = x * np.uint64(0x9E3779B97F4A7C15)
        h1 ^= h1 >> np.uint64(32)
        h1 *= np.uint64(0xBF58476D1CE4E5B9)
        h1 ^= h1 >> np.uint64(29)
        h2 = (x + np.uint64(0x94D049BB133111EB)) * np.uint64(0xD6E8FEB86659FD93)
        h2 ^= h2 >> np.uint64(31)
        h2 |= np.uint64(1)  # odd stride
        for i in range(k):
            yield ((h1 + np.uint64(i) * h2) % np.uint64(m_bits)).astype(
                np.int64
            )


def q10_returned_revenue(sf_dir: str, k: int = Q10_TOPK) -> "pa.Table":
    """TPC-H-Q10-shaped: top-k customers by revenue from RETURNED
    lineitems (l_returnflag = 'R') whose order landed in one quarter
    — the BLOOM-PREFILTERED distributed join. The quarter's orderkeys
    build a Bloom bitmap (per-block partial bitmaps OR-merged — a
    mergeable sketch, like the HLL registers), the bitmap broadcasts
    once via ``ray.put``, and every lineitem batch probes it
    VECTORIZED before the shuffle — so the orderkey exchange carries
    ~selectivity·|lineitem| rows instead of all of them. False
    positives are harmless: the per-bucket merge is an exact join and
    drops them; the result is exact, the bloom only saves shuffle
    bytes. At 100 TB the bitmap for 10^8 quarter-orders at 10
    bits/key is ~125 MB — broadcast once per node (and the driver
    OR-merge of O(blocks) partials becomes a ray-task tree reduce;
    here O(blocks)·128 KB is trivial). Revenue is integer 10^-4
    dollars (cents × (100 − discount-percent)) exactly as q3; final
    name lookup reads ≤ k customer rows by predicate pushdown."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq_
    import ray

    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()
    lo, hi = pd.Timestamp(Q10_LO), pd.Timestamp(Q10_HI)

    import pyarrow.dataset as pds

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pds.field("o_orderdate") >= pds.scalar(lo))
        & (pds.field("o_orderdate") < pds.scalar(hi)),
    ).materialize()  # consumed twice: bloom build + join side

    # --- distributed bloom build: one partial bitmap per block, OR-merged
    def bitmap_partial(t: pa.Table) -> pa.Table:
        bm = np.zeros(BLOOM_BITS // 8, dtype=np.uint8)
        keys = t.column("o_orderkey").to_numpy()
        for pos in _bloom_positions(keys, BLOOM_BITS, BLOOM_HASHES):
            np.bitwise_or.at(bm, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    bloom = np.zeros(BLOOM_BITS // 8, dtype=np.uint8)
    for part in orders.map_batches(
        bitmap_partial, batch_format="pyarrow"
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        for blob in part.column("bm").to_pylist():
            bloom |= np.frombuffer(blob, dtype=np.uint8)
    bloom_ref = ray.put(bloom)

    def order_rows(df: pd.DataFrame) -> pd.DataFrame:
        p = pd.DataFrame(
            {
                "orderkey": df["o_orderkey"].astype("int64"),
                "custkey": df["o_custkey"].astype("int64"),
                "rev": pd.Series(0, index=df.index, dtype="int64"),
                "side": "o",
            }
        )
        p["bucket"] = (p["orderkey"] % B).astype("int64")
        return p

    def line_partial(df: pd.DataFrame) -> pd.DataFrame:
        keys = df["l_orderkey"].to_numpy().astype("int64")
        bm = ray.get(bloom_ref)
        keep = np.ones(len(keys), dtype=bool)
        for pos in _bloom_positions(keys, BLOOM_BITS, BLOOM_HASHES):
            keep &= (bm[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1 > 0
        d = df.loc[keep]
        rev = to_cents(d["l_extendedprice"]) * (100 - to_cents(d["l_discount"]))
        p = (
            pd.DataFrame(
                {"orderkey": d["l_orderkey"].astype("int64"), "rev": rev}
            )
            .groupby("orderkey", as_index=False)
            .agg(rev=("rev", "sum"))
        )
        p["custkey"] = pd.Series(0, index=p.index, dtype="int64")
        p["side"] = "l"
        p["bucket"] = (p["orderkey"] % B).astype("int64")
        return p[["orderkey", "custkey", "rev", "side", "bucket"]]

    lines = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pds.field("l_returnflag") == pds.scalar("R"),
    ).map_batches(line_partial, batch_format="pandas")

    def bucket_join(g: pd.DataFrame) -> pd.DataFrame:
        li = (
            g[g["side"] == "l"]
            .groupby("orderkey", as_index=False)
            .agg(rev=("rev", "sum"))
        )
        od = g[g["side"] == "o"][["orderkey", "custkey"]]
        m = li.merge(od, on="orderkey")  # exact join: bloom FPs die here
        if not len(m):
            return pd.DataFrame(
                {
                    "custkey": pd.array([], dtype="int64"),
                    "rev": pd.array([], dtype="int64"),
                    "cb": pd.array([], dtype="int64"),
                }
            )
        p = m.groupby("custkey", as_index=False).agg(rev=("rev", "sum"))
        p["cb"] = (p["custkey"] % B).astype("int64")
        return p[["custkey", "rev", "cb"]]

    def cust_topk(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "custkey": pd.array([], dtype="int64"),
                    "revenue": pd.array([], dtype="int64"),
                }
            )
        p = g.groupby("custkey", as_index=False).agg(revenue=("rev", "sum"))
        return p.sort_values(
            ["revenue", "custkey"], ascending=[False, True]
        ).head(k)

    merged = (
        orders.map_batches(order_rows, batch_format="pandas")
        .union(lines)
        .groupby("bucket")
        .map_groups(bucket_join, batch_format="pandas")
        .groupby("cb")
        .map_groups(cust_topk, batch_format="pandas")
        .to_pandas()  # ≤ k rows per bucket reach the driver
    )
    if "revenue" not in merged.columns:
        merged = pd.DataFrame(
            {
                "custkey": pd.array([], dtype="int64"),
                "revenue": pd.array([], dtype="int64"),
            }
        )
    merged = (
        merged.sort_values(["revenue", "custkey"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    # name lookup: ≤ k keys, predicate pushdown — never a shuffle join
    want = merged["custkey"].astype("int64").tolist()
    names = (
        pq_.read_table(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_name"],
            filters=[("c_custkey", "in", want)] if want else None,
        ).to_pandas()
        if want
        else pd.DataFrame({"c_custkey": pd.array([], dtype="int64"),
                           "c_name": pd.array([], dtype="str")})
    )
    out = merged.merge(
        names, left_on="custkey", right_on="c_custkey", how="left"
    )
    return pa.table(
        {
            "c_custkey": pa.array(out["custkey"].astype("int64"), pa.int64()),
            "c_name": pa.array(out["c_name"].astype("str"), pa.string()),
            "revenue": pa.array(out["revenue"].astype("int64"), pa.int64()),
        }
    )


def events_interarrival(sf_dir: str) -> rd.Dataset:
    """(user_id, event_id, gap_us): time since the user's PREVIOUS
    event — the LAG window shape (LAG(ts) OVER (PARTITION BY user_id
    ORDER BY ts, event_id)), completing the window-function family
    (rank, running total, bounded frame, session, sliding). Each
    user's first event has no predecessor and is omitted, keeping the
    output all-int64.

    Scale shape: the same single user-hash co-group every per-user
    window uses — all of a user's rows co-locate, one mergesort +
    vectorized groupby-diff per bucket, the shuffle carries three
    int64 columns."""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "event_id": df["event_id"].astype("int64"),
                "ts_us": df["ts"]
                .to_numpy()
                .astype("datetime64[us]")
                .astype("int64"),
                "bucket": (df["user_id"] % B).astype("int64"),
            }
        )

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        gap = g.groupby("user_id")["ts_us"].diff()
        keep = gap.notna()
        return pd.DataFrame(
            {
                "user_id": g.loc[keep, "user_id"],
                "event_id": g.loc[keep, "event_id"],
                "gap_us": gap[keep].astype("int64"),
            }
        )

    return (
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
        )
        .map_batches(prep, batch_format="pandas")
        .groupby("bucket")
        .map_groups(gaps, batch_format="pandas")
    )


def events_props_hist(sf_dir: str) -> rd.Dataset:
    """(event_type, k_bin, n_events): histogram of the JSON ``props``
    payload's ``k`` field binned by decile — the SEMI-STRUCTURED
    extraction shape (JSON column → typed value → relational
    aggregate). The corpus's props are flat single-key objects, so
    extraction is one VECTORIZED regex capture per batch (the
    generic-JSON fallback would be an actor-pool stage with a real
    parser — same pipeline shape, slower kernel); the oracle extracts
    with DuckDB's json_extract, so a Ray-side parse slip can't hide.
    Two-phase bucketed aggregate as every counting query — the
    shuffle carries (type, bin, partial-count) rows only."""
    from suckit_ray.stages.agg import bucketed_groupby_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = df["props"].str.extract(r'"k":\s*(-?\d+)', expand=False)
        assert not k.isna().any(), "unexpected props shape"
        kv = k.astype("int64").to_numpy()
        kb = kv // 10  # pandas floors; correct to DuckDB's truncation
        kb = kb + ((kv < 0) & (kb * 10 != kv))
        p = (
            pd.DataFrame(
                {
                    "event_type": df["event_type"],
                    "k_bin": kb.astype("int64"),
                }
            )
            .groupby(["event_type", "k_bin"], as_index=False)
            .agg(n_events=("k_bin", "size"))
        )
        return p

    return bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "props"]
        ).map_batches(partial, batch_format="pandas"),
        keys=["event_type", "k_bin"],
        aggs={"n_events": ("n_events", "sum")},
    )


def customer_order_paths(sf_dir: str) -> rd.Dataset:
    """(c_custkey, n_orders, path): each customer's order priorities
    concatenated in (o_orderdate, o_orderkey) order — the ORDERED
    STRING AGGREGATION / sequence-assembly shape (the input form for
    journey mining; the Markov op consumes pairs, this emits whole
    per-entity sequences).

    Scale shape: one custkey-hash co-group; each batch pre-projects
    to 3 small columns, the group kernel is one mergesort + one
    vectorized join per customer via pandas groupby-agg. Path length
    is bounded by orders-per-customer (TPC-H ~10; a web-scale
    sessions table would cap or bucket the sequence)."""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": df["o_custkey"].astype("int64"),
                "okey": df["o_orderkey"].astype("int64"),
                "odate_us": df["o_orderdate"]
                .to_numpy()
                .astype("datetime64[us]")
                .astype("int64"),
                "prio": df["o_orderpriority"],
                "bucket": (df["o_custkey"] % B).astype("int64"),
            }
        )

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "c_custkey": pd.array([], dtype="int64"),
                    "n_orders": pd.array([], dtype="int64"),
                    "path": pd.array([], dtype="str"),
                }
            )
        g = g.sort_values(["c_custkey", "odate_us", "okey"], kind="mergesort")
        out = g.groupby("c_custkey").agg(
            n_orders=("prio", "size"), path=("prio", ">".join)
        )
        return out.reset_index().astype({"n_orders": "int64"})

    return (
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"],
        )
        .map_batches(prep, batch_format="pandas")
        .groupby("bucket")
        .map_groups(assemble, batch_format="pandas")
    )


def orders_priority_unpivot(sf_dir: str) -> pa.Table:
    """(o_year, o_orderpriority, n_orders): the INVERSE reshape of
    ``orders_priority_pivot`` — melt the wide year×priority crosstab
    back to tall rows (UNPIVOT). Like the pivot, the reshape touches
    only the ≤ |years|·|priorities| aggregated rows; the oracle is the
    direct GROUP BY, so the melt is checked to be lossless (pivot
    then unpivot == the original aggregation, zero-count cells
    dropped like rows absent from the groupby)."""
    wide = orders_priority_pivot(sf_dir).to_pandas()
    slug_to_name = {name: prio for prio, name in PIVOT_PRIORITIES}
    tall = wide.melt(
        id_vars=["o_year"],
        value_vars=list(slug_to_name),
        var_name="prio_col",
        value_name="n_orders",
    )
    # zero-count cells drop — the direct GROUP BY has no such rows
    tall = tall[tall["n_orders"] > 0]
    tall["o_orderpriority"] = tall["prio_col"].map(slug_to_name)
    tall = tall.sort_values(["o_year", "o_orderpriority"]).reset_index(drop=True)
    return pa.table(
        {
            "o_year": pa.array(tall["o_year"].astype("int64"), pa.int64()),
            "o_orderpriority": pa.array(tall["o_orderpriority"], pa.string()),
            "n_orders": pa.array(tall["n_orders"].astype("int64"), pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# argmin/argmax-by-ordering aggregations: first/last value per group and
# CDC-style last-write-wins compaction
# ---------------------------------------------------------------------------


def events_first_last(sf_dir: str) -> rd.Dataset:
    """(user_id, first_value_c, last_value_c, n_events): each user's
    first and last event VALUE by (ts, event_id) order — the
    argmin-by-key aggregation shape (the aggregate returns a column
    OTHER than the one being ordered on, so min/max combiners must
    carry the full ordering key + payload).

    Plan: per-block partials keep each user's local argmin/argmax row
    (ordering key = (ts_us, event_id) — event_id breaks timestamp
    ties deterministically) plus a count; one user-bucket co-group
    finishes with the same comparison. The shuffle carries ≤ 2 rows ×
    4 ints per (block × user). Values are exact integer cents."""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "ts_us": df["ts"].to_numpy().astype("datetime64[us]").astype("int64"),
                "event_id": df["event_id"].astype("int64"),
                "value_c": to_cents(df["value"]),
            }
        )
        d = d.sort_values(["ts_us", "event_id"], kind="mergesort")
        g = d.groupby("user_id")
        first = g.head(1).rename(
            columns={"ts_us": "a_ts", "event_id": "a_id", "value_c": "a_val"}
        )
        last = g.tail(1).rename(
            columns={"ts_us": "z_ts", "event_id": "z_id", "value_c": "z_val"}
        )
        n = g.size().rename("n").reset_index()
        p = first.merge(last, on="user_id").merge(n, on="user_id")
        p["bucket"] = (p["user_id"] % B).astype("int64")
        return p

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["a_ts", "a_id"], kind="mergesort")
        first = g.groupby("user_id", as_index=False).first()[
            ["user_id", "a_val"]
        ]
        g2 = g.sort_values(["z_ts", "z_id"], kind="mergesort")
        last = g2.groupby("user_id", as_index=False).last()[
            ["user_id", "z_val"]
        ]
        n = g.groupby("user_id", as_index=False).agg(n_events=("n", "sum"))
        out = first.merge(last, on="user_id").merge(n, on="user_id")
        return out.rename(
            columns={"a_val": "first_value_c", "z_val": "last_value_c"}
        ).astype(
            {
                "first_value_c": "int64",
                "last_value_c": "int64",
                "n_events": "int64",
            }
        )

    return (
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id", "value"],
        )
        .map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(final, batch_format="pandas")
    )


def events_latest_state(sf_dir: str) -> rd.Dataset:
    """(user_id, event_type, last_ts_us, last_value_c): the LATEST
    record per (user, event_type) by (ts, event_id) — CDC / upsert
    log compaction: the table a changelog stream collapses to. Same
    argmax-by-key plan as events_first_last with a composite group
    key; at changelog scale this is the standard "compact the log
    into current state" pass, one partial per block then one
    co-group on the group-key hash."""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "event_type": df["event_type"],
                "ts_us": df["ts"].to_numpy().astype("datetime64[us]").astype("int64"),
                "event_id": df["event_id"].astype("int64"),
                "value_c": to_cents(df["value"]),
            }
        )
        d = d.sort_values(["ts_us", "event_id"], kind="mergesort")
        p = d.groupby(["user_id", "event_type"], as_index=False).tail(1)
        h = pd.util.hash_pandas_object(
            p["event_type"], index=False
        ).astype("uint64")
        p = p.copy()
        p["bucket"] = (
            (p["user_id"].to_numpy().astype("uint64") * np.uint64(1000003) + h.to_numpy())
            % np.uint64(B)
        ).astype("int64")
        return p

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts_us", "event_id"], kind="mergesort")
        out = g.groupby(["user_id", "event_type"], as_index=False).tail(1)
        return pd.DataFrame(
            {
                "user_id": out["user_id"].astype("int64"),
                "event_type": out["event_type"],
                "last_ts_us": out["ts_us"].astype("int64"),
                "last_value_c": out["value_c"].astype("int64"),
            }
        )

    return (
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_type", "ts", "event_id", "value"],
        )
        .map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(final, batch_format="pandas")
    )


def events_peak_concurrency(sf_dir: str) -> "pa.Table":
    """(max_concurrent, first_peak_us): the maximum number of
    simultaneously-active sessions (inclusive [start_us, end_us]
    intervals from ``events_sessionize``) and the earliest instant it
    is reached — the interval-stabbing / sweep-line shape: +1/−1
    endpoint deltas, one GLOBAL ordered prefix sum, max of the
    running count.

    Plan: session endpoints become (ts_us, ±1) rows; a sample-trained
    range partitioner (the ``events_value_rank`` recipe) buckets them
    order-preservingly; per-bucket delta TOTALS — O(buckets) ints —
    take one exclusive prefix on the driver, giving each bucket the
    concurrency ENTERING it; each bucket then sorts locally by
    (ts, +1-before-−1) and scans. The driver reduces ≤ B (max, ts)
    partials. Ties at one instant count as overlapping (a session
    starting exactly when another ends sees it still active)."""
    import numpy as np
    import ray

    from suckit_ray.stages.agg import bucket_prefix_bases, default_buckets

    B = default_buckets()
    sessions = events_sessionize(sf_dir)

    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "ts_us": np.concatenate(
                    [df["start_us"].to_numpy(), df["end_us"].to_numpy()]
                ).astype("int64"),
                "d": np.concatenate(
                    [
                        np.ones(len(df), dtype="int64"),
                        -np.ones(len(df), dtype="int64"),
                    ]
                ),
            }
        )

    pts = sessions.map_batches(endpoints, batch_format="pandas")
    splits = _train_rank_splits(pts, B, id_col="ts_us", value_col="ts_us")
    if splits is None:
        return pa.table(
            {
                "max_concurrent": pa.array([], pa.int64()),
                "first_peak_us": pa.array([], pa.int64()),
            }
        )
    splits_ref = ray.put(splits)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        sp = ray.get(splits_ref)
        out = df.copy()
        out["bucket"] = np.searchsorted(
            sp, df["ts_us"].to_numpy(), side="right"
        ).astype("int64")
        return out

    bucketed = pts.map_batches(bucketize, batch_format="pandas").materialize()
    bases_ref = bucket_prefix_bases(bucketed, "bucket", weight_col="d")

    def bucket_peak(g: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(bases_ref).get(int(g["bucket"].iloc[0]), 0)
        g = g.sort_values(
            ["ts_us", "d"], ascending=[True, False], kind="mergesort"
        )
        run = base + g["d"].cumsum().to_numpy()
        mx = int(run.max())
        first_ts = int(g["ts_us"].to_numpy()[run == mx][0])
        return pd.DataFrame({"max_c": [mx], "at_us": [first_ts]})

    peaks = (
        bucketed.groupby("bucket")
        .map_groups(bucket_peak, batch_format="pandas")
        .to_pandas()  # ≤ B rows
    )
    mx = int(peaks["max_c"].max())
    first = int(peaks.loc[peaks["max_c"] == mx, "at_us"].min())
    return pa.table(
        {
            "max_concurrent": pa.array([mx], pa.int64()),
            "first_peak_us": pa.array([first], pa.int64()),
        }
    )


WATERMARK_JITTER_US = 172_800_000_000   # arrival = event time ± 1 day
WATERMARK_LATENESS_US = 129_600_000_000  # 36 h allowed lateness
_DAY_US_WM = 86_400_000_000


def events_watermark_agg(sf_dir: str) -> rd.Dataset:
    """(event_type, day_us, n_accepted, sum_value_c): per-type daily
    aggregates of the events a STREAMING ingester would accept under
    a watermark — the late-data semantics every streaming pipeline
    needs: events arrive out of order (arrival = event time plus a
    deterministic md5-derived ±1-day skew, SQL-reproducible), the
    watermark is the running max event time seen so far minus a 36 h
    allowed lateness, and an event older than the watermark AT ITS
    ARRIVAL is dropped (≈20% of the synthetic table — non-degenerate).

    Plan: the running max over arrival order is a prefix SCAN — the
    same sample-trained range-partitioner recipe as
    ``events_value_rank``, but with an exclusive prefix MAX of
    per-bucket maxima (O(buckets) ints on the driver) instead of a
    prefix sum: each bucket seeds its local cummax with the max of
    all earlier buckets, judges its rows locally, and emits
    (type, day) partials into the shared bucketed aggregation. The
    watermark state a real stream would carry actor-side is exactly
    this per-range maximum."""
    import numpy as np
    import ray

    from suckit_ray.pipelines.dedup import _md5h60
    from suckit_ray.stages.agg import bucketed_groupby_agg, default_buckets

    B = default_buckets()

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        jit = np.fromiter(
            (_md5h60(str(int(i))) for i in df["event_id"]),
            dtype=np.int64,
            count=len(df),
        )
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "ts_us": ts_us,
                "arr": ts_us
                + jit % WATERMARK_JITTER_US
                - WATERMARK_JITTER_US // 2,
                "event_type": df["event_type"],
                "v": to_cents(df["value"]),
            }
        )

    ds = (
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "event_type", "value"],
        )
        .map_batches(prep, batch_format="pandas")
        .materialize()  # consumed twice: split training + bucketize
    )
    splits = _train_rank_splits(ds, B, id_col="event_id", value_col="arr")
    if splits is None:
        return rd.from_pandas(
            pd.DataFrame(
                {
                    "event_type": pd.array([], dtype="str"),
                    "day_us": pd.array([], dtype="int64"),
                    "n_accepted": pd.array([], dtype="int64"),
                    "sum_value_c": pd.array([], dtype="int64"),
                }
            )
        )
    splits_ref = ray.put(splits)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        sp = ray.get(splits_ref)
        out = df.copy()
        out["bucket"] = np.searchsorted(
            sp, df["arr"].to_numpy(), side="right"
        ).astype("int64")
        return out

    bucketed = ds.map_batches(bucketize, batch_format="pandas").materialize()

    # exclusive running MAX of per-bucket event-time maxima: the
    # watermark each bucket's first row sees
    per_bucket = (
        bucketed.map_batches(
            lambda df: df.groupby("bucket", as_index=False).agg(
                m=("ts_us", "max")
            ),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby("bucket", as_index=False)
        .agg(m=("m", "max"))
        .sort_values("bucket")
    )
    maxes = per_bucket["m"].to_numpy()
    # sentinel −2^62, NOT int64 min: the scan subtracts the lateness
    # from it, and int64-min − L would wrap around
    bases = np.concatenate(
        ([-(1 << 62)], np.maximum.accumulate(maxes)[:-1])
    )
    bases_ref = ray.put(
        dict(zip(per_bucket["bucket"].tolist(), [int(b) for b in bases]))
    )

    def accept_and_partial(g: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(bases_ref).get(int(g["bucket"].iloc[0]))
        g = g.sort_values(["arr", "event_id"], kind="mergesort")
        ts = g["ts_us"].to_numpy()
        # exclusive prefix max seeded with the prior buckets' max
        pm = np.maximum.accumulate(np.concatenate(([base], ts[:-1])))
        ok = ts >= pm - WATERMARK_LATENESS_US
        d = g.loc[ok]
        day = (d["ts_us"].to_numpy() // _DAY_US_WM) * _DAY_US_WM
        return (
            pd.DataFrame(
                {"event_type": d["event_type"], "day_us": day, "v": d["v"]}
            )
            .groupby(["event_type", "day_us"], as_index=False)
            .agg(n_accepted=("v", "size"), sum_value_c=("v", "sum"))
        )

    partials = bucketed.groupby("bucket").map_groups(
        accept_and_partial, batch_format="pandas"
    )
    return bucketed_groupby_agg(
        partials,
        keys=["event_type", "day_us"],
        aggs={
            "n_accepted": ("n_accepted", "sum"),
            "sum_value_c": ("sum_value_c", "sum"),
        },
    )


TRAILING_WINDOW_US = 7 * 86_400_000_000  # 7-day RANGE frame


def events_trailing_7d(sf_dir: str) -> rd.Dataset:
    """(event_id, trail_n, trail_sum_c): for EVERY event, the count
    and value sum of the same user's events in the trailing 7-day
    RANGE window (inclusive of the current row's instant) — the
    variable-width RANGE frame, a different shape from the fixed
    ROWS frame of events_moving_avg: each row's window is found by
    VALUE, not position.

    Plan: user-bucketed co-group (each user's history is one group);
    inside a group, sort by (ts, event_id), take one prefix-sum pass,
    and find each row's window start with ``searchsorted(ts − 7d)``
    — O(n log n) per user, fully vectorized, no per-row loops. Ties
    at the window edge: RANGE semantics include ALL rows at the
    boundary instant, which searchsorted('left') reproduces."""
    import numpy as np

    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def to_rows(df: pd.DataFrame) -> pd.DataFrame:
        p = pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "event_id": df["event_id"].astype("int64"),
                "ts_us": df["ts"].to_numpy().astype("datetime64[us]").astype("int64"),
                "v": to_cents(df["value"]),
            }
        )
        p["bucket"] = (p["user_id"] % B).astype("int64")
        return p

    def trail(g: pd.DataFrame) -> pd.DataFrame:
        out_frames = []
        for _, u in g.groupby("user_id"):
            u = u.sort_values(["ts_us", "event_id"], kind="mergesort")
            ts = u["ts_us"].to_numpy()
            v = u["v"].to_numpy()
            csum = np.concatenate(([0], np.cumsum(v)))
            # RANGE frame: rows with ts' in [ts_i − 7d, ts_i]. The
            # upper edge must include ALL rows at the current instant
            # (even those ordered after by event_id) — that is RANGE,
            # not ROWS: use searchsorted right/left on the VALUES.
            lo = np.searchsorted(ts, ts - TRAILING_WINDOW_US, side="left")
            hi = np.searchsorted(ts, ts, side="right")
            out_frames.append(
                pd.DataFrame(
                    {
                        "event_id": u["event_id"].to_numpy(),
                        "trail_n": (hi - lo).astype("int64"),
                        "trail_sum_c": (csum[hi] - csum[lo]).astype("int64"),
                    }
                )
            )
        if not out_frames:
            return pd.DataFrame(
                {
                    "event_id": pd.array([], dtype="int64"),
                    "trail_n": pd.array([], dtype="int64"),
                    "trail_sum_c": pd.array([], dtype="int64"),
                }
            )
        return pd.concat(out_frames, ignore_index=True)

    return (
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_id", "ts", "value"],
        )
        .map_batches(to_rows, batch_format="pandas")
        .groupby("bucket")
        .map_groups(trail, batch_format="pandas")
    )


RFM_TILES = 4


def _ntile_assign(ds: rd.Dataset, value_col: str, n_rows: int, k: int,
                  id_col: str = "cust") -> rd.Dataset:
    """(id, tile): exact SQL NTILE(k) over ORDER BY (value, id) for a
    Dataset of unique ids — the distributed-sort recipe again: range
    partition on value, per-bucket counts → exclusive prefix (the
    bucket's global base rank), then the in-bucket scan converts each
    row's global rank to its tile with DuckDB's remainder rule (the
    first n%k tiles get one extra row)."""
    import numpy as np
    import ray

    from suckit_ray.stages.agg import bucket_prefix_bases, default_buckets

    B = default_buckets()
    splits = _train_rank_splits(ds, B, id_col=id_col, value_col=value_col)
    if splits is None:
        return rd.from_pandas(
            pd.DataFrame(
                {id_col: pd.array([], dtype="int64"),
                 "tile": pd.array([], dtype="int64")}
            )
        )
    splits_ref = ray.put(splits)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        sp = ray.get(splits_ref)
        out = df[[id_col, value_col]].copy()
        out["bucket"] = np.searchsorted(
            sp, df[value_col].to_numpy(), side="right"
        ).astype("int64")
        return out

    bucketed = ds.map_batches(bucketize, batch_format="pandas").materialize()
    bases_ref = bucket_prefix_bases(bucketed, "bucket")
    q, r = divmod(n_rows, k)

    def to_tiles(g: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(bases_ref).get(int(g["bucket"].iloc[0]), 0)
        g = g.sort_values([value_col, id_col], kind="mergesort")
        rank = base + np.arange(1, len(g) + 1)  # global 1-based rank
        # DuckDB/SQL NTILE remainder rule: tiles 1..r hold q+1 rows
        cut = r * (q + 1)
        tile = np.where(
            rank <= cut,
            (rank - 1) // (q + 1) + 1,
            r + (rank - 1 - cut) // max(q, 1) + 1,
        )
        return pd.DataFrame(
            {id_col: g[id_col].to_numpy(), "tile": tile.astype("int64")}
        )

    return bucketed.groupby("bucket").map_groups(
        to_tiles, batch_format="pandas"
    )


def customer_rfm(sf_dir: str) -> rd.Dataset:
    """(c_custkey, r_tile, f_tile, m_tile): the classic RFM
    segmentation — every customer WITH orders quartiled independently
    on Recency (last order date), Frequency (order count) and
    Monetary (total spend, exact cents), each an EXACT SQL
    NTILE(4) OVER (ORDER BY metric, c_custkey).

    Plan: one custkey co-group builds the O(customers) aggregate
    (max date, count, cent sum) from the orders stream; three
    ``_ntile_assign`` passes (range partition + prefix base + local
    scan — never a global sort materialization) tile the three
    metrics; one final custkey co-group zips the tiles back
    together. Ties inside a metric break by custkey, making every
    tile assignment deterministic and oracle-exact including
    NTILE's first-tiles-get-the-remainder rule."""
    from suckit_ray.stages.agg import bucketed_groupby_agg, default_buckets

    B = default_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "cust": df["o_custkey"].astype("int64"),
                    "r_us": df["o_orderdate"]
                    .to_numpy()
                    .astype("datetime64[us]")
                    .astype("int64"),
                    "m_c": to_cents(df["o_totalprice"]),
                }
            )
            .groupby("cust", as_index=False)
            .agg(r_us=("r_us", "max"), f=("r_us", "size"), m_c=("m_c", "sum"))
        )

    agg = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderdate", "o_totalprice"],
        ).map_batches(partial, batch_format="pandas"),
        keys=["cust"],
        aggs={"r_us": ("r_us", "max"), "f": ("f", "sum"), "m_c": ("m_c", "sum")},
    ).materialize()
    n = agg.count()

    tiles = {
        "r_tile": _ntile_assign(agg, "r_us", n, RFM_TILES),
        "f_tile": _ntile_assign(agg, "f", n, RFM_TILES),
        "m_tile": _ntile_assign(agg, "m_c", n, RFM_TILES),
    }

    def tag(name):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {
                    "cust": df["cust"].astype("int64"),
                    "r_tile": 0, "f_tile": 0, "m_tile": 0,
                }
            )
            out[name] = df["tile"].astype("int64")
            out["bucket"] = (out["cust"] % B).astype("int64")
            return out

        return f

    def zip_tiles(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("cust", as_index=False).agg(
            r_tile=("r_tile", "max"),
            f_tile=("f_tile", "max"),
            m_tile=("m_tile", "max"),
        )
        return out.rename(columns={"cust": "c_custkey"})

    streams = [
        ds.map_batches(tag(name), batch_format="pandas")
        for name, ds in tiles.items()
    ]
    return (
        streams[0]
        .union(streams[1])
        .union(streams[2])
        .groupby("bucket")
        .map_groups(zip_tiles, batch_format="pandas")
    )


def part_type_price_stats(sf_dir: str) -> rd.Dataset:
    """(p_type, n, sum_c, sumsq_c2): MERGEABLE SUFFICIENT STATISTICS
    for per-type price mean/variance — the scale-honest form of
    distributed moments: count, integer-cent sum, and integer
    sum-of-squares combine associatively across any partitioning, so
    the variance ((n·Σx² − (Σx)²) / n²) is derivable exactly
    downstream without a second pass. Emitting the statistics rather
    than the float moments keeps the result hash-exact (a float
    variance would be reduction-order-dependent). Squares stay well
    inside int64 here (10^10 per row); a corpus where Σx² approaches
    2^63 would shard the accumulator or move to HUGEINT-style
    two-limb sums — the oracle's BIGINT would overflow LOUDLY, not
    silently, at the same point."""
    from suckit_ray.stages.agg import bucketed_groupby_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = to_cents(df["p_retailprice"])
        return pd.DataFrame(
            {
                "p_type": df["p_type"],
                "n": 1,
                "sum_c": c,
                "sumsq_c2": c * c,
            }
        )

    return bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/part.parquet", columns=["p_type", "p_retailprice"]
        ).map_batches(partial, batch_format="pandas"),
        keys=["p_type"],
        aggs={
            "n": ("n", "sum"),
            "sum_c": ("sum_c", "sum"),
            "sumsq_c2": ("sumsq_c2", "sum"),
        },
    )


# ---------------------------------------------------------------------------
# skyline (Pareto frontier)
# ---------------------------------------------------------------------------

def _skyline_2d(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized 2D skyline of (price_c MINimized, p_size MAXimized):
    keep p iff no q has (price ≤, size ≥) with one strict. Sorted by
    price ascending, p survives iff its size equals the max size at
    its exact price AND strictly exceeds the max size over all
    strictly-cheaper prices — equal (price, size) duplicates neither
    dominate each other and all survive, matching the NOT EXISTS
    oracle. One lexsort + two grouped maxes + one running max."""
    if len(df) == 0:
        return df[["p_partkey", "price_c", "p_size"]]
    d = df[["p_partkey", "price_c", "p_size"]].sort_values(
        ["price_c", "p_size", "p_partkey"], ascending=[True, False, True]
    )
    codes = pd.factorize(d["price_c"], sort=False)[0]  # ascending groups
    sz = d["p_size"].to_numpy()
    gmax = pd.Series(sz).groupby(codes).transform("max").to_numpy()
    permax = pd.Series(sz).groupby(codes).max().to_numpy()
    incl = np.maximum.accumulate(permax)
    prior = np.concatenate(([np.iinfo(np.int64).min], incl[:-1]))
    keep = (sz == gmax) & (sz > prior[codes])
    return d[keep]


def part_skyline(sf_dir: str) -> rd.Dataset:
    """(p_partkey, price_c, p_size): the Pareto frontier of parts —
    cheapest-for-their-size / biggest-for-their-price, no part both
    cheaper-or-equal AND bigger-or-equal (one strict) exists. The
    multi-objective NOT EXISTS shape none of the other queries cover.

    Scale shape: skyline(S) = skyline(∪ skyline(blocks)) — every
    block-local non-skyline row is dominated by a row of the same
    block, so a per-block vectorized skyline prunes the corpus down to
    the union of local frontiers BEFORE the only exchange, and one
    single-group map_groups pass computes the final frontier from that
    union. For independent dims a block skyline is ~O(ln block) rows
    (expected), so the exchange carries near-nothing; an adversarial
    fully-anti-correlated corpus degrades the prune, not correctness —
    the documented fallback is a second recursive merge level."""

    def local(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "p_partkey": pd.array([], dtype="int64"),
                    "price_c": pd.array([], dtype="int64"),
                    "p_size": pd.array([], dtype="int64"),
                    "b": pd.array([], dtype="int64"),
                }
            )
        out = _skyline_2d(
            pd.DataFrame(
                {
                    "p_partkey": df["p_partkey"].astype("int64"),
                    "price_c": to_cents(df["p_retailprice"]),
                    "p_size": df["p_size"].astype("int64"),
                }
            )
        ).copy()
        out["b"] = 0
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return _skyline_2d(g)[["p_partkey", "price_c", "p_size"]]

    return (
        rd.read_parquet(
            f"{sf_dir}/part.parquet",
            columns=["p_partkey", "p_retailprice", "p_size"],
        )
        .map_batches(local, batch_format="pandas")
        .groupby("b")
        .map_groups(final, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# growth accounting: daily new vs returning users
# ---------------------------------------------------------------------------

def events_new_vs_returning(sf_dir: str) -> pd.DataFrame:
    """(day, active_users, new_users, returning_users, cum_users):
    per-day growth accounting — distinct active users, first-ever-day
    (new) users, returning = active − new, and the cumulative distinct
    user count to date (= running sum of new, since each user is new
    exactly once). The per-key-anchor shape (retention's min-day) fused
    with a global running total.

    Scale shape: batches pre-shrink to distinct (user, day); ONE
    user-hash co-group computes each user's first day where their rows
    already co-locate and emits per-day (active, new) partial counts;
    one bucketed sum by day leaves O(days) rows, whose cumulative sum
    is a driver-side numpy pass over that bounded frame (days, not
    users — the watermark/prefix recipe's O(buckets) driver state)."""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def user_days(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        day = us // US_PER_DAY
        day = day + ((us < 0) & (day * US_PER_DAY != us))
        out = pd.DataFrame(
            {"user_id": df["user_id"].astype("int64"), "day": day}
        ).drop_duplicates()
        out["ub"] = (out["user_id"] % B).astype("int64")
        return out

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    ).map_batches(user_days, batch_format="pandas")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "day": pd.array([], dtype="int64"),
                    "active_n": pd.array([], dtype="int64"),
                    "new_n": pd.array([], dtype="int64"),
                }
            )
        g = g.drop_duplicates(["user_id", "day"])
        first = g.groupby("user_id")["day"].transform("min")
        part = pd.DataFrame(
            {
                "day": g["day"].astype("int64"),
                "active_n": 1,
                "new_n": (g["day"] == first).astype("int64"),
            }
        )
        return part.groupby("day", as_index=False).agg(
            active_n=("active_n", "sum"), new_n=("new_n", "sum")
        )

    partials = ds.groupby("ub").map_groups(per_user, batch_format="pandas")
    agg = bucketed_groupby_agg(
        partials,
        keys=["day"],
        aggs={
            "active_users": ("active_n", "sum"),
            "new_users": ("new_n", "sum"),
        },
    )
    out = agg.to_pandas().sort_values("day").reset_index(drop=True)
    out["returning_users"] = out["active_users"] - out["new_users"]
    out["cum_users"] = out["new_users"].cumsum()
    return out[
        ["day", "active_users", "new_users", "returning_users", "cum_users"]
    ].astype("int64")


def events_trailing_7d_users(sf_dir: str) -> pd.DataFrame:
    """(day, n_users): for EVERY calendar day in the corpus's range,
    the count of distinct users active in the trailing 7-day window
    [day−6, day] — the sliding-window DISTINCT shape, which no prefix
    sum can produce directly (distinct counts don't subtract).

    Scale shape: the interval-union sweep — batches pre-shrink to
    distinct (user, day); one USER-hash co-group turns each user's
    sorted active days into DISJOINT coverage intervals
    [dᵢ, min(dᵢ+6, dᵢ₊₁−1)] (each user contributes exactly once to
    every day they cover, so summing interval indicators counts
    distinct users) and emits ±1 boundary deltas; a bucketed sum
    leaves O(distinct boundary days) rows, and the driver expands the
    running sum across the calendar with one searchsorted — driver
    state is O(calendar span), never O(users)."""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()
    W = 7  # trailing window, days

    def user_days(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        day = us // US_PER_DAY
        day = day + ((us < 0) & (day * US_PER_DAY != us))
        out = pd.DataFrame(
            {"user_id": df["user_id"].astype("int64"), "day": day}
        ).drop_duplicates()
        out["ub"] = (out["user_id"] % B).astype("int64")
        return out

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    ).map_batches(user_days, batch_format="pandas")

    def deltas(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "day": pd.array([], dtype="int64"),
                    "delta": pd.array([], dtype="int64"),
                    "act": pd.array([], dtype="int64"),
                }
            )
        g = (
            g.drop_duplicates(["user_id", "day"])
            .sort_values(["user_id", "day"])
            .reset_index(drop=True)
        )
        d = g["day"].to_numpy()
        same_user = (
            g["user_id"].to_numpy()[1:] == g["user_id"].to_numpy()[:-1]
        )
        nxt = np.empty_like(d)
        nxt[:-1] = np.where(same_user, d[1:] - 1, np.iinfo(np.int64).max)
        nxt[-1] = np.iinfo(np.int64).max
        end = np.minimum(d + (W - 1), nxt)
        # act marks true ACTIVE days (starts), so the driver can clip
        # the report range to the observed calendar — coverage past
        # the last active day is real but out of range
        part = pd.DataFrame(
            {
                "day": np.concatenate([d, end + 1]),
                "delta": np.concatenate(
                    [np.ones(len(d), "int64"), -np.ones(len(d), "int64")]
                ),
                "act": np.concatenate(
                    [np.ones(len(d), "int64"), np.zeros(len(d), "int64")]
                ),
            }
        )
        return part.groupby("day", as_index=False).agg(
            delta=("delta", "sum"), act=("act", "max")
        )

    partials = ds.groupby("ub").map_groups(deltas, batch_format="pandas")
    agg = (
        bucketed_groupby_agg(
            partials,
            keys=["day"],
            aggs={"delta": ("delta", "sum"), "act": ("act", "max")},
        )
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    bdays = agg["day"].to_numpy()
    run = np.cumsum(agg["delta"].to_numpy())
    active = agg.loc[agg["act"] > 0, "day"]
    lo, hi = int(active.min()), int(active.max())
    days = np.arange(lo, hi + 1, dtype="int64")
    idx = np.searchsorted(bdays, days, side="right") - 1
    n = np.where(idx >= 0, run[idx], 0)
    return pd.DataFrame({"day": days, "n_users": n.astype("int64")})


def _ed_le_1(a: str, b: str) -> int | None:
    """Exact edit distance when ≤ 1, else None — the O(len) verify for
    deletion-neighborhood candidates (full DP never runs): equal →
    0; equal length → exactly one substitution; length ±1 → one
    indel found by the first-mismatch splice check."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return None
    if la == lb:
        diff = sum(1 for x, y in zip(a, b) if x != y)
        return 1 if diff == 1 else None
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return 1 if a[i:] == b[i + 1 :] else None


def customer_editdist_pairs(sf_dir: str) -> rd.Dataset:
    """(a_custkey, b_custkey, dist): every customer-name pair with
    Levenshtein distance ≤ 1 (a < b) — the string-similarity SELF-JOIN,
    entity-resolution's blocking+verify shape, solved WITHOUT the O(n²)
    cross join the SQL oracle runs.

    Scale shape: FastSS deletion neighborhoods (Bocek et al. 2007,
    public) — ed(a,b) ≤ 1 implies a and b share a member of
    {s} ∪ {s minus one char}, so each name explodes into ≤ len+1
    variant keys (the only corpus-scale exchange; rows are short
    strings), one VARIANT-hash co-group emits same-variant candidate
    pairs via a vectorized self-merge, and a second pair-keyed
    co-group dedups candidates found under several variants and runs
    the O(len) ≤1-verify — candidates are sparse by construction
    (names sharing a deletion variant), never all-pairs. The verify
    kills FastSS false positives like ("ab","ba") which share
    variants but sit at distance 2."""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def variants(df: pd.DataFrame) -> pd.DataFrame:
        vks: list[str] = []
        cks: list[int] = []
        nms: list[str] = []
        for ck, nm in zip(df["c_custkey"], df["c_name"]):
            seen = {nm}
            for i in range(len(nm)):
                seen.add(nm[:i] + nm[i + 1 :])
            for v in seen:
                vks.append(v)
                cks.append(int(ck))
                nms.append(nm)
        out = pd.DataFrame(
            {
                "vk": pd.array(vks, dtype="object"),
                "ck": pd.array(cks, dtype="int64"),
                "nm": pd.array(nms, dtype="object"),
            }
        )
        out["vb"] = (
            pd.util.hash_pandas_object(out["vk"], index=False).astype(
                "uint64"
            )
            % B
        ).astype("int64")
        return out

    ds = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).map_batches(variants, batch_format="pandas")

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        cols = {
            "a_ck": pd.array([], dtype="int64"),
            "b_ck": pd.array([], dtype="int64"),
            "a_nm": pd.array([], dtype="object"),
            "b_nm": pd.array([], dtype="object"),
            "pb": pd.array([], dtype="int64"),
        }
        if len(g) == 0:
            return pd.DataFrame(cols)
        g = g.drop_duplicates(["vk", "ck"])
        m = g.merge(g, on="vk", suffixes=("_a", "_b"))
        m = m[m["ck_a"] < m["ck_b"]]
        if len(m) == 0:
            return pd.DataFrame(cols)
        out = pd.DataFrame(
            {
                "a_ck": m["ck_a"].astype("int64"),
                "b_ck": m["ck_b"].astype("int64"),
                "a_nm": m["nm_a"],
                "b_nm": m["nm_b"],
            }
        ).drop_duplicates(["a_ck", "b_ck"])
        out["pb"] = ((out["a_ck"] * 1000003 + out["b_ck"]) % B).astype(
            "int64"
        )
        return out

    cand = ds.groupby("vb").map_groups(candidates, batch_format="pandas")

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "a_custkey": pd.array([], dtype="int64"),
                    "b_custkey": pd.array([], dtype="int64"),
                    "dist": pd.array([], dtype="int64"),
                }
            )
        g = g.drop_duplicates(["a_ck", "b_ck"])
        dists = [_ed_le_1(a, b) for a, b in zip(g["a_nm"], g["b_nm"])]
        keep = [d is not None for d in dists]
        return pd.DataFrame(
            {
                "a_custkey": g["a_ck"][keep].astype("int64"),
                "b_custkey": g["b_ck"][keep].astype("int64"),
                "dist": pd.array(
                    [d for d in dists if d is not None], dtype="int64"
                ),
            }
        )

    return cand.groupby("pb").map_groups(verify, batch_format="pandas")


def customer_entity_clusters(sf_dir: str) -> rd.Dataset:
    """(c_custkey, canon_key): entity resolution end-to-end — the
    ed≤1 name-similarity pairs become an undirected match graph whose
    connected components are entities; canon_key = min custkey of the
    component (singletons map to themselves). The blocking+verify+
    cluster composition every record-linkage pipeline runs.

    Scale shape: pairs come from the fully distributed
    ``customer_editdist_pairs``; components use the shared cutover —
    a bounded pair set union-finds on the driver
    (dedup._cc_union_find), larger graphs run the zero-driver
    min-label propagation (dedup._cc_labels) — and only the sparse
    non-root map broadcasts for the assignment pass (the
    near_dup_clusters shape)."""
    import pyarrow as pa

    import ray
    from suckit_ray.pipelines.dedup import (
        CC_DRIVER_PAIR_LIMIT,
        _cc_labels,
        _cc_union_find,
    )

    pairs = (
        customer_editdist_pairs(sf_dir)
        .map_batches(
            lambda df: pd.DataFrame(
                {
                    "a_id": df["a_custkey"].astype("int64"),
                    "b_id": df["b_custkey"].astype("int64"),
                }
            ),
            batch_format="pandas",
        )
        .materialize()
    )
    n_pairs = pairs.count()
    if n_pairs == 0:
        comp: dict[int, int] = {}
    elif n_pairs <= CC_DRIVER_PAIR_LIMIT:
        comp = _cc_union_find(
            pa.Table.from_pandas(pairs.to_pandas(), preserve_index=False)
        )
    else:
        labels = _cc_labels(pairs)
        comp = {}
        for part in labels.iter_batches(
            batch_size=None, batch_format="pyarrow"
        ):
            for n, l in zip(
                part.column("node").to_pylist(),
                part.column("label").to_pylist(),
            ):
                if n != l:
                    comp[n] = l
    comp_ref = ray.put(comp)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        comp_ = ray.get(comp_ref)
        ids = df["c_custkey"].astype("int64")
        return pd.DataFrame(
            {
                "c_custkey": ids,
                "canon_key": pd.array(
                    [comp_.get(int(i), int(i)) for i in ids], dtype="int64"
                ),
            }
        )

    return rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).map_batches(assign, batch_format="pandas")


def events_value_winsorized(sf_dir: str) -> "pa.Table":
    """(event_type, n, p05_cents, p95_cents, sum_wins_c): per-type
    WINSORIZED sum — values clipped to the exact [P5, P95]
    quantile_disc bounds before summing, the robust-statistics
    pre-step that kills outlier influence without dropping rows.

    Scale shape: ONE pass — the same two-phase (type, cent) histogram
    the exact-quantile op builds also yields the winsorized sum
    group-locally (clip the histogram's value column against the
    walk's own bounds and dot it with the counts), so no second scan
    of the events table and no bounds broadcast; the exchange carries
    one row per distinct (type, cent) pair."""
    import numpy as np

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "value_c": to_cents(df["value"]),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    ).map_batches(cents, batch_format="pandas")
    hist = bucketed_groupby_agg(
        ds,
        keys=["event_type", "value_c"],
        aggs={"n": ("value_c", "count")},
    )

    def type_wins(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("value_c")
        counts = g["n"].to_numpy()
        values = g["value_c"].to_numpy()
        cum = counts.cumsum()
        n = int(cum[-1])
        # 1-based rank ceil(q*n): the quantile_disc rule shared with
        # events_value_quantiles
        lo = int(values[np.searchsorted(cum, max(1, int(np.ceil(0.05 * n))))])
        hi = int(values[np.searchsorted(cum, max(1, int(np.ceil(0.95 * n))))])
        s = int((np.clip(values, lo, hi) * counts).sum())
        return pd.DataFrame(
            [(g["event_type"].iloc[0], n, lo, hi, s)],
            columns=[
                "event_type", "n", "p05_cents", "p95_cents", "sum_wins_c"
            ],
        )

    out = (
        hist.groupby("event_type")
        .map_groups(type_wins, batch_format="pandas")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"].tolist(), pa.string()),
            "n": pa.array([int(x) for x in out["n"]], pa.int64()),
            "p05_cents": pa.array(
                [int(x) for x in out["p05_cents"]], pa.int64()
            ),
            "p95_cents": pa.array(
                [int(x) for x in out["p95_cents"]], pa.int64()
            ),
            "sum_wins_c": pa.array(
                [int(x) for x in out["sum_wins_c"]], pa.int64()
            ),
        }
    )


def events_user_overlap(sf_dir: str) -> pa.Table:
    """(a, b, n_users): EXACT distinct-user intersection for every
    event-type pair a<b — the set-operation shape (audience overlap /
    cohort intersection). Plan: batch-local (event_type, user_id)
    dedup, then ONE user-hash co-group — all of a user's types land
    together, a vectorized self-merge emits the user's type pairs, and
    the group reduces to its local pair counts, so the exchange
    carries one row per distinct (type, user) and the driver merge is
    bounded by |types|² (same contract as ``events_markov``)."""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def dedup_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates(["event_type", "user_id"]).copy()
        out["ub"] = (out["user_id"].astype("int64") % B).astype("int64")
        return out

    def pair_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["event_type", "user_id"])
        m = g.merge(g, on="user_id", suffixes=("_x", "_y"))
        m = m[m["event_type_x"] < m["event_type_y"]]
        p = (
            pd.DataFrame({"a": m["event_type_x"], "b": m["event_type_y"]})
            .groupby(["a", "b"], as_index=False)
            .size()
            .rename(columns={"size": "n_users"})
        )
        p["n_users"] = p["n_users"].astype("int64")
        return p

    parts = (
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
        )
        .map_batches(dedup_bucket, batch_format="pandas")
        .groupby("ub")
        .map_groups(pair_counts, batch_format="pandas")
        .to_pandas()  # ≤ |types|² rows per bucket reach the driver
    )
    if not len(parts) or "a" not in parts.columns:
        return pa.table(
            {
                "a": pa.array([], pa.string()),
                "b": pa.array([], pa.string()),
                "n_users": pa.array([], pa.int64()),
            }
        )
    agg = (
        parts.groupby(["a", "b"], as_index=False)["n_users"]
        .sum()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "a": pa.array(agg["a"], pa.string()),
            "b": pa.array(agg["b"], pa.string()),
            "n_users": pa.array(agg["n_users"].astype("int64"), pa.int64()),
        }
    )


def events_user_overlap_theta(sf_dir: str, k: int | None = None) -> pa.Table:
    """(a, b, n_users_est): KMV/theta-sketch estimate of the same
    type-pair user intersections — the 100 TB set-ops path. Each batch
    emits one ≤8 KB blob of k-minimum user-id hashes per type; the
    groupby moves blobs, merge is union-truncate, and the PAIRING runs
    on ≤|types| merged sketches driver-side (the only all-pairs step —
    O(types²·k), corpus-independent). Rows-only operator; relative
    error vs the exact intersection is pinned in tests (~1/√k when the
    sketches truncate, exact below k)."""
    import numpy as np

    from suckit_ray.stages.sketch import (
        KMV_K,
        kmv_intersection_estimate,
        kmv_merge,
        kmv_partial,
    )

    kk = KMV_K if k is None else k

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        types, blobs = [], []
        for et, g in df.groupby("event_type"):
            types.append(et)
            blobs.append(
                kmv_partial(g["user_id"].to_numpy(np.uint64), k=kk).tobytes()
            )
        return pd.DataFrame({"event_type": types, "blob": blobs})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "blob": [kmv_merge(list(g["blob"]), k=kk).tobytes()],
            }
        )

    sk = (
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
        )
        .map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .map_groups(merge, batch_format="pandas")
        .to_pandas()  # one row per event type
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    sketches = [
        (et, np.frombuffer(b, dtype=np.uint64))
        for et, b in zip(sk["event_type"], sk["blob"])
    ]
    a_, b_, est_ = [], [], []
    for i in range(len(sketches)):
        for j in range(i + 1, len(sketches)):
            a_.append(sketches[i][0])
            b_.append(sketches[j][0])
            est_.append(
                kmv_intersection_estimate(sketches[i][1], sketches[j][1], k=kk)
            )
    return pa.table(
        {
            "a": pa.array(a_, pa.string()),
            "b": pa.array(b_, pa.string()),
            "n_users_est": pa.array(est_, pa.int64()),
        }
    )


# minute index of the 2024-01-01T00:00:00Z anchor: regression x-values
# are whole minutes since this epoch, keeping every moment (x², x·y and
# their sums) comfortably inside int64 partials at sf-scale row counts
REGRESSION_ANCHOR_MIN = 1_704_067_200_000_000 // 60_000_000


def _trunc_div(num: int, den: int) -> int:
    """Integer division truncating toward zero — DuckDB's ``//`` —
    from Python's flooring ``//`` (they differ on negative quotients)."""
    q = num // den
    if q < 0 and q * den != num:
        q += 1
    return q


def events_regression(sf_dir: str) -> pa.Table:
    """(event_type, n, sum_x, sum_y, slope_nano, intercept_nano):
    per-type ordinary-least-squares fit of value (cents) against event
    time (whole minutes since 2024-01-01) — the trend-estimation shape,
    computed ENTIRELY from mergeable sufficient statistics: each batch
    contributes per-type (n, Σx, Σy, Σx², Σxy) int64 partials that sum
    associatively across any partitioning (the two-column extension of
    ``part_type_price_stats``), so the only exchange carries five
    integers per (batch, type) and the closed-form solve runs on
    ≤|types| rows of exact Python ints. slope = Sxy/Sxx and intercept =
    (Σy·Sxx − Sxy·Σx)/(n·Sxx) in nano units with division truncating
    toward zero (DuckDB ``//`` on HUGEINT — the floor/trunc difference
    bites on negative slopes). x is floored to minutes BEFORE the
    anchor subtraction (epoch_us is nonnegative, so floor == trunc
    there); a zero-x-variance group raises loudly on both sides."""
    from suckit_ray.stages.agg import bucketed_groupby_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = (
            df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            // 60_000_000
            - REGRESSION_ANCHOR_MIN
        )
        y = to_cents(df["value"]).to_numpy()
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "n": 1,
                "sum_x": x,
                "sum_y": y,
                "sum_xx": x * x,
                "sum_xy": x * y,
            }
        )

    stats = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
        ).map_batches(partial, batch_format="pandas"),
        keys=["event_type"],
        aggs={
            "n": ("n", "sum"),
            "sum_x": ("sum_x", "sum"),
            "sum_y": ("sum_y", "sum"),
            "sum_xx": ("sum_xx", "sum"),
            "sum_xy": ("sum_xy", "sum"),
        },
    ).to_pandas()  # ≤ |types| rows
    stats = stats.sort_values("event_type").reset_index(drop=True)
    slopes, intercepts = [], []
    for _, r in stats.iterrows():
        n, sx, sy = int(r["n"]), int(r["sum_x"]), int(r["sum_y"])
        sxx, sxy = int(r["sum_xx"]), int(r["sum_xy"])
        s_xy = n * sxy - sx * sy
        s_xx = n * sxx - sx * sx
        slopes.append(_trunc_div(s_xy * 10**9, s_xx))
        intercepts.append(_trunc_div((sy * s_xx - s_xy * sx) * 10**9, n * s_xx))
    return pa.table(
        {
            "event_type": pa.array(stats["event_type"], pa.string()),
            "n": pa.array(stats["n"].astype("int64"), pa.int64()),
            "sum_x": pa.array(stats["sum_x"].astype("int64"), pa.int64()),
            "sum_y": pa.array(stats["sum_y"].astype("int64"), pa.int64()),
            "slope_nano": pa.array(slopes, pa.int64()),
            "intercept_nano": pa.array(intercepts, pa.int64()),
        }
    )


def _global_day_span(daily: rd.Dataset) -> "tuple[int, int] | None":
    """Global [min, max] day of a (…, day, …) dataset as two driver
    ints — an O(blocks) partial-reduce scan (per-block min/max rows,
    tiny driver fold). None on an empty dataset. The shared bounds
    step of every dense-daily-grid operator (gapfill, CUSUM)."""
    bounds = daily.map_batches(
        lambda df: pd.DataFrame(
            {"lo": [int(df["day"].min())], "hi": [int(df["day"].max())]}
        )
        if len(df)
        else pd.DataFrame(
            {"lo": pd.array([], dtype="int64"), "hi": pd.array([], dtype="int64")}
        ),
        batch_format="pandas",
    ).to_pandas()
    if not len(bounds):
        return None
    return int(bounds["lo"].min()), int(bounds["hi"].max())


def events_cusum(sf_dir: str) -> rd.Dataset:
    """(event_type, day, cusum): one-sided upper CUSUM changepoint
    statistic per type over the gap-filled daily value series — the
    drift/mean-shift monitor a continuous-ingest pipeline runs over
    its own volume metrics (Page 1954, public). The recursion
    S_t = max(0, S_{t-1} + (x_t − k)) looks inherently sequential,
    but with P_t = Σ_{i≤t}(x_i − k) it closes to
    S_t = P_t − min(0, min_{j≤t} P_j) — a prefix sum and a running
    min, both SQL-window-expressible AND one vectorized numpy pass
    per group, which is what makes an exact oracle possible.

    Plan: the ``events_daily_gapfill`` recipe verbatim — two-phase
    (type, day) cent sums, O(blocks) global day bounds on the driver,
    dense per-type series emitted inside ``map_groups`` — then the
    closed form per group. Reference k per type = total // n_days
    (DuckDB ``//`` truncates toward zero; ``_trunc_div`` mirrors it),
    so everything is exact integers and the hash pins the whole
    series. Per-group state is O(span days), the same bound gapfill
    already accepts; at web scale the key widens to (type, year)."""
    import ray

    from suckit_ray.stages.agg import bucketed_groupby_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        day = us // US_PER_DAY
        day = day + ((us < 0) & (day * US_PER_DAY != us))  # trunc like //
        return (
            pd.DataFrame(
                {
                    "event_type": df["event_type"],
                    "day": day.astype("int64"),
                    "x": to_cents(df["value"]),
                }
            )
            .groupby(["event_type", "day"], as_index=False)
            .agg(x=("x", "sum"))
        )

    daily = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
        ).map_batches(partial, batch_format="pandas"),
        keys=["event_type", "day"],
        aggs={"x": ("x", "sum")},
    ).materialize()  # feeds the bounds scan AND the per-type groups

    span = _global_day_span(daily)
    if span is None:
        return rd.from_arrow(
            pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "day": pa.array([], pa.int64()),
                    "cusum": pa.array([], pa.int64()),
                }
            )
        )
    span_ref = ray.put(span)

    def cusum_group(g: pd.DataFrame) -> pd.DataFrame:
        lo, hi = ray.get(span_ref)
        days = np.arange(lo, hi + 1, dtype="int64")
        xs = (
            g.set_index("day")["x"].reindex(days).fillna(0).astype("int64").to_numpy()
        )
        k = _trunc_div(int(xs.sum()), len(days))
        pre = np.cumsum(xs - k)  # int64: |daily cents| ≪ 2^63/span
        runmin = np.minimum.accumulate(pre)
        cusum = pre - np.minimum(runmin, 0)
        return pd.DataFrame(
            {
                "event_type": g["event_type"].iloc[0],
                "day": days,
                "cusum": cusum.astype("int64"),
            }
        )

    return daily.groupby("event_type").map_groups(cusum_group, batch_format="pandas")


def events_seq_support(sf_dir: str) -> pa.Table:
    """(type_a, type_b, n_users): SEQUENCE support — for every ordered
    type pair, the number of users with at least one ``type_a`` event
    STRICTLY BEFORE some ``type_b`` event (min_ts(a) < max_ts(b) per
    user) — sequential-pattern mining's length-2 support count
    (Agrawal & Srikant 1995, public): the funnel family's
    order-sensitive sibling of ``events_user_overlap`` (which counts
    co-occurrence regardless of order; the gap between the two
    measures directionality).

    Plan: per-batch combiner shrinks to per-(user, type) min/max
    timestamps (two int64s per pair — mergeable extrema, the
    sufficient statistic for EVERY ordered comparison); ONE user-hash
    co-group merges them and evaluates all O(types²) pairs where the
    user's rows already are, emitting bounded per-batch pair partials;
    a driver fold sums O(types²) rows. No broadcast, nothing
    O(users) leaves the co-group."""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        p = (
            pd.DataFrame(
                {
                    "user_id": df["user_id"].astype("int64"),
                    "event_type": df["event_type"],
                    "mn": us,
                    "mx": us,
                }
            )
            .groupby(["user_id", "event_type"], as_index=False)
            .agg(mn=("mn", "min"), mx=("mx", "max"))
        )
        p["bucket"] = (p["user_id"] % B).astype("int64")
        return p

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["user_id", "event_type"], as_index=False).agg(
            mn=("mn", "min"), mx=("mx", "max")
        )
        rows: dict[tuple[str, str], int] = {}
        for _, sub in m.groupby("user_id"):
            ts = list(
                zip(sub["event_type"], sub["mn"].astype("int64"),
                    sub["mx"].astype("int64"))
            )
            for ta, mna, _ in ts:
                for tb, _, mxb in ts:
                    if ta != tb and mna < mxb:
                        rows[(ta, tb)] = rows.get((ta, tb), 0) + 1
        return pd.DataFrame(
            [(a, b, n) for (a, b), n in rows.items()],
            columns=["type_a", "type_b", "n_users"],
        )

    parts = (
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_type", "ts"],
        )
        .map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(bucket_fold, batch_format="pandas")
        .to_pandas()
    )
    out = (
        parts.groupby(["type_a", "type_b"], as_index=False)["n_users"]
        .sum()
        .sort_values(["type_a", "type_b"])
        .reset_index(drop=True)
        if len(parts)
        else pd.DataFrame(columns=["type_a", "type_b", "n_users"])
    )
    return pa.table(
        {
            "type_a": pa.array(out["type_a"].tolist(), pa.string()),
            "type_b": pa.array(out["type_b"].tolist(), pa.string()),
            "n_users": pa.array(
                out["n_users"].astype("int64") if len(out) else [],
                pa.int64(),
            ),
        }
    )


def events_kendall_tau(sf_dir: str) -> pa.Table:
    """(event_type, n_days, concordant, discordant, tau2_micro):
    Kendall's τ-b rank concordance between each type's daily event
    COUNT and daily cent SUM over the gap-filled day grid — the
    nonparametric does-volume-track-value dependence audit (Kendall
    1938, public; the pair-counting sibling of events_spearman's
    rank-covariance). τ-b needs √((n0−t_x)(n0−t_y)), so the reported
    statistic is the SIGNED SQUARED τ in micro units (the
    acf/spearman idiom — floor == trunc on the squared numerator):

        tau2_micro = sign(C−D) · ((C−D)² · 1e6) // ((n0−tx)·(n0−ty))

    with C/D the concordant/discordant pair counts, n0 = n(n−1)/2,
    and tx/ty the tied-pair counts per variable. Zero denominator
    (a constant series) → 0.

    Plan: ONE two-phase (type, day) aggregation carries both metrics;
    the per-type pair scan is O(span²) bounded by the CALENDAR, not
    the corpus (the theilsen precedent), vectorized as numpy
    sign-outer-products. The oracle replays the same pairs with a
    day < day self-join."""
    import ray

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        day = us // US_PER_DAY
        day = day + ((us < 0) & (day * US_PER_DAY != us))  # trunc like //
        return (
            pd.DataFrame(
                {
                    "event_type": df["event_type"],
                    "day": day.astype("int64"),
                    "x": np.ones(len(df), dtype="int64"),
                    "y": to_cents(df["value"]),
                }
            )
            .groupby(["event_type", "day"], as_index=False)
            .agg(x=("x", "sum"), y=("y", "sum"))
        )

    daily = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
        ).map_batches(partial, batch_format="pandas"),
        keys=["event_type", "day"],
        aggs={"x": ("x", "sum"), "y": ("y", "sum")},
    ).materialize()

    empty_cols = {
        "event_type": pa.array([], pa.string()),
        "n_days": pa.array([], pa.int64()),
        "concordant": pa.array([], pa.int64()),
        "discordant": pa.array([], pa.int64()),
        "tau2_micro": pa.array([], pa.int64()),
    }
    span = _global_day_span(daily)
    # a single-day span has no pairs — the oracle's day<day join is
    # empty, so the engine must be too
    if span is None or span[0] == span[1]:
        return pa.table(empty_cols)
    span_ref = ray.put(span)

    def tau_group(g: pd.DataFrame) -> pd.DataFrame:
        lo, hi = ray.get(span_ref)
        days = np.arange(lo, hi + 1, dtype="int64")
        gi = g.set_index("day")
        xs = gi["x"].reindex(days).fillna(0).astype("int64").to_numpy()
        ys = gi["y"].reindex(days).fillna(0).astype("int64").to_numpy()
        n = len(days)
        iu = np.triu_indices(n, k=1)
        sx = np.sign(np.subtract.outer(xs, xs))[iu]
        sy = np.sign(np.subtract.outer(ys, ys))[iu]
        prod = sx * sy
        conc = int((prod > 0).sum())
        disc = int((prod < 0).sum())
        n0 = n * (n - 1) // 2
        tx = int((sx == 0).sum())
        ty = int((sy == 0).sum())
        den = (n0 - tx) * (n0 - ty)
        d = conc - disc
        tau2 = (
            0
            if den == 0
            else (1 if d >= 0 else -1) * ((d * d * 1_000_000) // den)
        )
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_days": [n],
                "concordant": [conc],
                "discordant": [disc],
                "tau2_micro": [tau2],
            }
        )

    out = (
        daily.groupby("event_type")
        .map_groups(tau_group, batch_format="pandas")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"].tolist(), pa.string()),
            "n_days": pa.array(out["n_days"].astype("int64"), pa.int64()),
            "concordant": pa.array(
                out["concordant"].astype("int64"), pa.int64()
            ),
            "discordant": pa.array(
                out["discordant"].astype("int64"), pa.int64()
            ),
            "tau2_micro": pa.array(
                out["tau2_micro"].astype("int64"), pa.int64()
            ),
        }
    )


def events_changepoint(sf_dir: str) -> rd.Dataset:
    """(event_type, split_day, gain_micro, mean_left_c, mean_right_c):
    OFFLINE single-changepoint detection per type over the gap-filled
    daily cent sums — binary segmentation's first split (Scott &
    Knott 1974, public), the retrospective sibling of the CUSUM
    monitor (which tracks drift online). The split at prefix length t
    maximizes the between-segment SSE reduction, which closes to the
    exact rational

        gain(t) = (n·P_t − t·P_n)² / (t·(n−t)·n)

    over prefix sums P — so the argmax runs on floored micro-unit
    integer keys identical in both engines (ORDER BY gain DESC, t:
    first-best-t wins ties of the FLOORED key, deterministically,
    even where the exact rationals differ past the floor).

    Plan: the CUSUM recipe verbatim (two-phase (type, day) cent sums,
    O(blocks) day bounds, dense series per group) + an O(span)
    python-int scan per type — exact squares past int64, bounded by
    the calendar, not the corpus. Types vanish when the global span
    has < 2 days (no valid split), mirroring the oracle's t < n."""
    import ray

    from suckit_ray.stages.agg import bucketed_groupby_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        day = us // US_PER_DAY
        day = day + ((us < 0) & (day * US_PER_DAY != us))  # trunc like //
        return (
            pd.DataFrame(
                {
                    "event_type": df["event_type"],
                    "day": day.astype("int64"),
                    "x": to_cents(df["value"]),
                }
            )
            .groupby(["event_type", "day"], as_index=False)["x"]
            .sum()
        )

    daily = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
        ).map_batches(partial, batch_format="pandas"),
        keys=["event_type", "day"],
        aggs={"x": ("x", "sum")},
    ).materialize()  # feeds the bounds scan AND the per-type groups

    empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "split_day": pa.array([], pa.int64()),
            "gain_micro": pa.array([], pa.int64()),
            "mean_left_c": pa.array([], pa.int64()),
            "mean_right_c": pa.array([], pa.int64()),
        }
    )
    span = _global_day_span(daily)
    if span is None or span[0] == span[1]:
        return rd.from_arrow(empty)
    span_ref = ray.put(span)

    def cp_group(g: pd.DataFrame) -> pd.DataFrame:
        lo, hi = ray.get(span_ref)
        days = np.arange(lo, hi + 1, dtype="int64")
        xs = (
            g.set_index("day")["x"]
            .reindex(days)
            .fillna(0)
            .astype("int64")
            .to_numpy()
        )
        n = len(days)
        tot = int(xs.sum())
        best = None
        pre = 0
        for t in range(1, n):
            pre += int(xs[t - 1])
            gain = (1_000_000 * (n * pre - t * tot) ** 2) // (
                t * (n - t) * n
            )
            if best is None or gain > best[0]:
                best = (gain, t, pre)
        gain, t, pre = best
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "split_day": [int(days[t - 1])],
                "gain_micro": [gain],
                "mean_left_c": [pre // t],
                "mean_right_c": [(tot - pre) // (n - t)],
            }
        )

    return daily.groupby("event_type").map_groups(
        cp_group, batch_format="pandas"
    )


AUDIT_RULES = [
    "customers_without_orders",
    "lineitem_discount_out_of_range",
    "lineitem_nonpositive_quantity",
    "lineitems_orphaned",
    "orders_nonpositive_total",
    "orders_orphaned_customer",
    "orders_without_lineitems",
]


def referential_audit(sf_dir: str) -> pa.Table:
    """(rule, n_violations) over seven data-quality constraints — the
    pre-ingest validation stage every pipeline runs before trusting a
    snapshot: referential integrity in BOTH directions across
    customer↔orders and orders↔lineitem, plus row-level range checks.
    Zero counts are part of the contract (they prove the rule ran).

    Plan — each table read ONCE, ONE exchange: every source's
    map_batches emits rows in a shared (key, side, cnt, bucket)
    schema, pre-shrunk to per-key counts (the orderkey rows never
    carry lineitems) with the scalar range rules folded in as
    per-batch partial counts in their own key space. The bucket id
    encodes the key space — custkey groups, orderkey groups, and
    scalar partials ride ONE union through ONE groupby, and the group
    fn dispatches on the space tag. ≤ (2·B + 3) groups × ≤ 2 rows
    reach the driver. (First version read orders 3× / lineitem 2×
    through two exchanges.)"""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()
    # bucket layout: [0, B) custkey space · [B, 2B) orderkey space ·
    # [2B, 2B+3) scalar rules
    SC_QTY, SC_DISC, SC_TOTAL = 2 * B, 2 * B + 1, 2 * B + 2

    def from_customer(df: pd.DataFrame) -> pd.DataFrame:
        k = df["c_custkey"].astype("int64")
        return pd.DataFrame(
            {"key": k, "side": "c", "cnt": 1, "bucket": (k % B).astype("int64")}
        )

    def from_orders(df: pd.DataFrame) -> pd.DataFrame:
        gc = df.groupby(df["o_custkey"].astype("int64")).size()
        cust = pd.DataFrame(
            {"key": gc.index.to_numpy(), "side": "o", "cnt": gc.to_numpy(),
             "bucket": gc.index.to_numpy() % B}
        )
        ok = df["o_orderkey"].astype("int64")
        orders = pd.DataFrame(
            {"key": ok, "side": "o", "cnt": 1,
             "bucket": B + (ok % B).to_numpy()}
        )
        scalar = pd.DataFrame(
            {"key": [0], "side": "s",
             "cnt": [int((df["o_totalprice"].to_numpy() <= 0).sum())],
             "bucket": [SC_TOTAL]}
        )
        return pd.concat([cust, orders, scalar], ignore_index=True)

    def from_lineitem(df: pd.DataFrame) -> pd.DataFrame:
        gl = df.groupby(df["l_orderkey"].astype("int64")).size()
        items = pd.DataFrame(
            {"key": gl.index.to_numpy(), "side": "l", "cnt": gl.to_numpy(),
             "bucket": B + gl.index.to_numpy() % B}
        )
        q = df["l_quantity"].to_numpy()
        d = df["l_discount"].to_numpy()
        scalar = pd.DataFrame(
            {"key": [0, 0], "side": "s",
             "cnt": [int((q <= 0).sum()), int(((d < 0) | (d > 0.5)).sum())],
             "bucket": [SC_QTY, SC_DISC]}
        )
        return pd.concat([items, scalar], ignore_index=True)

    def rules(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["bucket"].iloc[0])
        if b >= 2 * B:  # scalar partial sums
            rule = {
                SC_QTY: "lineitem_nonpositive_quantity",
                SC_DISC: "lineitem_discount_out_of_range",
                SC_TOTAL: "orders_nonpositive_total",
            }[b]
            return pd.DataFrame({"rule": [rule], "n": [int(g["cnt"].sum())]})
        per = g.pivot_table(
            index="key", columns="side", values="cnt", aggfunc="sum", fill_value=0
        )
        zeros = pd.Series(0, index=per.index)
        if b < B:  # custkey space: customer presence vs order counts
            o = per["o"] if "o" in per else zeros
            c = per["c"] if "c" in per else zeros
            return pd.DataFrame(
                {
                    "rule": ["customers_without_orders", "orders_orphaned_customer"],
                    "n": [int(((c > 0) & (o == 0)).sum()),
                          int(o[c == 0].sum())],
                }
            )
        o = per["o"] if "o" in per else zeros  # orderkey space
        l = per["l"] if "l" in per else zeros
        return pd.DataFrame(
            {
                "rule": ["orders_without_lineitems", "lineitems_orphaned"],
                "n": [int(((o > 0) & (l == 0)).sum()), int(l[o == 0].sum())],
            }
        )

    parts = (
        rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
        .map_batches(from_customer, batch_format="pandas")
        .union(
            rd.read_parquet(
                f"{sf_dir}/orders.parquet",
                columns=["o_orderkey", "o_custkey", "o_totalprice"],
            ).map_batches(from_orders, batch_format="pandas")
        )
        .union(
            rd.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_orderkey", "l_quantity", "l_discount"],
            ).map_batches(from_lineitem, batch_format="pandas")
        )
        .groupby("bucket")
        .map_groups(rules, batch_format="pandas")
        .to_pandas()
    )
    total = parts.groupby("rule", as_index=False)["n"].sum()
    total = (
        total.set_index("rule").reindex(AUDIT_RULES, fill_value=0).reset_index()
    )  # every rule appears, even at zero violations / empty tables
    return pa.table(
        {
            "rule": pa.array(total["rule"], pa.string()),
            "n_violations": pa.array(total["n"].astype("int64"), pa.int64()),
        }
    )


def orders_yoy_growth(sf_dir: str) -> pa.Table:
    """(year, month, rev_cents, prev_rev_cents, growth_micro):
    year-over-year monthly revenue growth — the seasonality-aware
    trend report (a month compares against the SAME month last year,
    not the previous month). Months without a prior-year counterpart
    are omitted. growth_micro = (rev − prev)·10^6 // prev with
    division truncating toward zero (negative growth exists by
    construction in any declining month — ``_trunc_div`` mirrors
    DuckDB ``//``).

    Plan: one two-phase (year, month) cent aggregation; the YoY join
    runs on the O(months) driver rows (a 100-year corpus is 1,200
    rows — never a distributed concern)."""
    from suckit_ray.stages.agg import bucketed_groupby_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["o_orderdate"].to_numpy().astype("datetime64[M]")
        y = ts.astype("datetime64[Y]").astype("int64") + 1970
        m = ts.astype("int64") % 12 + 1
        return (
            pd.DataFrame({"year": y, "month": m, "rev": to_cents(df["o_totalprice"])})
            .groupby(["year", "month"], as_index=False)
            .agg(rev=("rev", "sum"))
        )

    monthly = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
        ).map_batches(partial, batch_format="pandas"),
        keys=["year", "month"],
        aggs={"rev": ("rev", "sum")},
    ).to_pandas()  # O(months)

    prev = monthly.rename(columns={"rev": "prev_rev"}).assign(
        year=lambda d: d["year"] + 1
    )
    j = monthly.merge(prev, on=["year", "month"], how="inner")
    j = j[j["prev_rev"] > 0].sort_values(["year", "month"])
    growth = [
        _trunc_div((int(r) - int(p)) * 10**6, int(p))
        for r, p in zip(j["rev"], j["prev_rev"])
    ]
    return pa.table(
        {
            "year": pa.array(j["year"].astype("int64"), pa.int64()),
            "month": pa.array(j["month"].astype("int64"), pa.int64()),
            "rev_cents": pa.array(j["rev"].astype("int64"), pa.int64()),
            "prev_rev_cents": pa.array(j["prev_rev"].astype("int64"), pa.int64()),
            "growth_micro": pa.array(growth, pa.int64()),
        }
    )


TOPK_TIES_K = 5


def part_price_topk_ties(sf_dir: str, k: int = TOPK_TIES_K) -> rd.Dataset:
    """(p_type, p_partkey, price_cents, rnk): per-type top-k priciest
    parts INCLUDING ties — RANK() ≤ k, so the result widens wherever
    the kth price repeats (the part table has 2 rows per distinct
    price by construction). The ties-exact two-phase: a per-block
    RANK ≤ k prefilter is a correct candidate superset (≥ k
    strictly-greater rows in ONE block already force global rank > k),
    and — because every row strictly greater than a survivor also
    survives — the exact global rank is recomputable among candidates
    alone. One tiny per-type co-group finishes. Ranking runs on CENTS
    on both sides so no double-vs-cent ordering divergence exists. At
    web scale a near-constant price column degenerates the candidate
    bound (ties at the kth value all ship); that is inherent to
    ties-inclusive semantics, not the plan."""

    def block_filter(df: pd.DataFrame) -> pd.DataFrame:
        p = pd.DataFrame(
            {
                "p_type": df["p_type"],
                "p_partkey": df["p_partkey"].astype("int64"),
                "price_cents": to_cents(df["p_retailprice"]),
            }
        )
        r = p.groupby("p_type")["price_cents"].rank(method="min", ascending=False)
        return p[r <= k]

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        r = g["price_cents"].rank(method="min", ascending=False).astype("int64")
        out = g.assign(rnk=r)
        out = out[out["rnk"] <= k].sort_values(["rnk", "p_partkey"])
        return pd.DataFrame(
            {
                "p_type": out["p_type"],
                "p_partkey": out["p_partkey"].astype("int64"),
                "price_cents": out["price_cents"].astype("int64"),
                "rnk": out["rnk"],
            }
        )

    return (
        rd.read_parquet(
            f"{sf_dir}/part.parquet",
            columns=["p_type", "p_partkey", "p_retailprice"],
        )
        .map_batches(block_filter, batch_format="pandas")
        .groupby("p_type")
        .map_groups(finish, batch_format="pandas")
    )


K_ANONYMITY = 10


def customer_k_anonymity(sf_dir: str, k: int = K_ANONYMITY) -> rd.Dataset:
    """(c_nationkey, c_mktsegment, group_size): quasi-identifier
    combinations whose equivalence class is SMALLER than k — the
    k-anonymity audit (Sweeney 2002, public) a pipeline runs before
    releasing a table: any listed combination re-identifies members to
    fewer than k candidates and must be suppressed or generalized.
    Complements ``docs_redact_pii`` (which removes direct identifiers;
    this catches identifying COMBINATIONS of innocent columns).

    Plan: the standard two-phase count (per-batch partial sums, one
    small bucketed exchange keyed on the quasi-identifier tuple), then
    the < k filter in the same final tasks — identical scale shape to
    ``docs_by_lang``."""
    from suckit_ray.stages.agg import bucketed_groupby_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.assign(n=1)
            .groupby(["c_nationkey", "c_mktsegment"], as_index=False)["n"]
            .sum()
        )

    agg = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_mktsegment"]
        ).map_batches(partial, batch_format="pandas"),
        keys=["c_nationkey", "c_mktsegment"],
        aggs={"n": ("n", "sum")},
    )

    def risky(df: pd.DataFrame) -> pd.DataFrame:
        out = df[df["n"] < k]
        return pd.DataFrame(
            {
                "c_nationkey": out["c_nationkey"].astype("int64"),
                "c_mktsegment": out["c_mktsegment"],
                "group_size": out["n"].astype("int64"),
            }
        )

    return agg.map_batches(risky, batch_format="pandas")


STATS_TABLES = {
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "orders": [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
}


def _stats_value_hash(s: pd.Series) -> np.ndarray:
    """Deterministic 63-bit value hash for NDV counting — vectorized
    ``pd.util.hash_pandas_object`` (fixed default key, so hashes are
    stable across processes/machines): equal values within a column
    hash equal, distinct ones collide with probability ~n²/2^63.
    Cross-COLUMN collisions don't exist structurally — every column
    owns its own bucket key space in ``table_stats``. (First version
    was a per-row Python md5 loop — the exact hot-path anti-pattern
    this repo bans.)"""
    h = pd.util.hash_pandas_object(s, index=False).to_numpy().astype("uint64")
    return (h & np.uint64((1 << 63) - 1)).astype("int64")


def table_stats(sf_dir: str) -> pa.Table:
    """(tbl, col, n_rows, n_null, n_distinct): the ANALYZE pass — the
    optimizer/planner statistics (cardinalities, null fractions, exact
    NDV) an engine gathers before planning joins, and the profile a
    data pipeline publishes with every snapshot. Exact NDV (matching
    SQL ``count(DISTINCT col)``), not a sketch — the HLL estimate
    lives in ``events_distinct_users_hll``.

    Plan — one read and ONE exchange per table, all tables sharing the
    final exchange: each batch pre-shrinks every column to its
    DISTINCT value hashes (the batch-local combiner that makes exact
    distributed NDV affordable) plus an O(1) (rows, nulls) partial;
    rows ride a (tbl, col, h, bucket) union where bucket encodes
    (table, column, h%B), so per-group distinct counting is local.
    NULLs are excluded from NDV (SQL semantics) and counted by the
    scalar partial."""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()
    names = sorted(
        (t, c) for t, cols in STATS_TABLES.items() for c in cols
    )
    space = {tc: i for i, tc in enumerate(names)}

    def make_partial(tbl: str):
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            frames = []
            for col in STATS_TABLES[tbl]:
                s = df[col]
                nn = s.dropna()
                h = np.unique(_stats_value_hash(nn)) if len(nn) else np.array([], "int64")
                base = space[(tbl, col)] * (B + 1)
                frames.append(
                    pd.DataFrame(
                        {
                            "h": h,
                            "n_rows": 0,
                            "n_null": 0,
                            "bucket": base + 1 + (h % B),
                        }
                    )
                )
                frames.append(
                    pd.DataFrame(
                        {
                            "h": [-1],
                            "n_rows": [len(s)],
                            "n_null": [int(s.isna().sum())],
                            "bucket": [base],  # scalar partials slot
                        }
                    )
                )
            return pd.concat(frames, ignore_index=True)

        return partial

    def reduce_group(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["bucket"].iloc[0])
        idx, off = divmod(b, B + 1)
        tbl, col = names[idx]
        if off == 0:  # scalar partials
            return pd.DataFrame(
                {
                    "tbl": [tbl],
                    "col": [col],
                    "n_rows": [int(g["n_rows"].sum())],
                    "n_null": [int(g["n_null"].sum())],
                    "n_distinct": [0],
                }
            )
        return pd.DataFrame(
            {
                "tbl": [tbl],
                "col": [col],
                "n_rows": [0],
                "n_null": [0],
                "n_distinct": [int(g["h"].nunique())],
            }
        )

    ds = None
    for tbl in sorted(STATS_TABLES):
        part = rd.read_parquet(
            f"{sf_dir}/{tbl}.parquet", columns=STATS_TABLES[tbl]
        ).map_batches(make_partial(tbl), batch_format="pandas")
        ds = part if ds is None else ds.union(part)

    out = (
        ds.groupby("bucket")
        .map_groups(reduce_group, batch_format="pandas")
        .to_pandas()
        .groupby(["tbl", "col"], as_index=False)
        .sum()
        .sort_values(["tbl", "col"])
    )
    return pa.table(
        {
            "tbl": pa.array(out["tbl"], pa.string()),
            "col": pa.array(out["col"], pa.string()),
            "n_rows": pa.array(out["n_rows"].astype("int64"), pa.int64()),
            "n_null": pa.array(out["n_null"].astype("int64"), pa.int64()),
            "n_distinct": pa.array(out["n_distinct"].astype("int64"), pa.int64()),
        }
    )


def events_welch_t(sf_dir: str) -> pa.Table:
    """(type_a, type_b, n_a, n_b, t2_micro): Welch's two-sample t²
    statistic between every pair of event types' cent-value
    distributions — the mean-shift drift monitor that complements the
    KS shape test (Welch 1947, public). Carried EXACTLY: with
    per-type sufficient statistics (n, S1=Σx, S2=Σx²),

        t² = (m_a − m_b)² / (v_a/n_a + v_b/n_b),   m = S1/n,
        v = (n·S2 − S1²) / (n·(n−1))

    clears every denominator by cross-multiplication into one integer
    quotient:

        D = S1a·n_b − S1b·n_a
        X = (n_a·S2a − S1a²)·n_b²·(n_b−1) + (n_b·S2b − S1b²)·n_a²·(n_a−1)
        t2_micro = (1e6 · D² · (n_a−1)·(n_b−1)) // X

    so the single final floor is the only rounding in either engine
    (zero pooled variance → −1 sentinel). Python ints carry the
    engine side at any scale; the oracle's HUGEINT holds through
    sf0.01's magnitudes (documented bound: D²·1e6·n² < 1.7e38).

    Scale shape: per-batch partial (n, S1, S2) triples per type — S2
    rides as a decimal STRING so the merge stays exact past int64
    (the customer_hhi idiom) — one tiny per-type co-group folds them,
    and the O(types²) pairing is driver arithmetic over O(types)
    rows. ONE pass over events, no broadcast, no histogram."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = to_cents(df["value"])
        g = pd.DataFrame({"event_type": df["event_type"], "c": c}).groupby(
            "event_type"
        )["c"]
        rows = []
        for t, s in g:
            xs = s.to_numpy().astype(object)  # python ints: exact squares
            rows.append((t, len(s), int(s.sum()), str(sum(x * x for x in xs))))
        return pd.DataFrame(rows, columns=["event_type", "n", "s1", "sq_str"])

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            [
                (
                    g["event_type"].iloc[0],
                    int(g["n"].sum()),
                    int(g["s1"].sum()),
                    str(sum(int(s) for s in g["sq_str"])),
                )
            ],
            columns=["event_type", "n", "s1", "sq_str"],
        )

    stats = (
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
        .map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )

    rows = []
    for i in range(len(stats)):
        for j in range(i + 1, len(stats)):
            ta, na, s1a, sqa = stats.iloc[i]
            tb, nb, s1b, sqb = stats.iloc[j]
            na, nb = int(na), int(nb)
            s1a, s1b = int(s1a), int(s1b)
            s2a, s2b = int(sqa), int(sqb)
            d = s1a * nb - s1b * na
            x = (na * s2a - s1a * s1a) * nb * nb * (nb - 1) + (
                nb * s2b - s1b * s1b
            ) * na * na * (na - 1)
            t2 = (
                -1
                if x == 0
                else (1_000_000 * d * d * (na - 1) * (nb - 1)) // x
            )
            rows.append((ta, tb, na, nb, t2))
    return pa.table(
        {
            "type_a": pa.array([r[0] for r in rows], pa.string()),
            "type_b": pa.array([r[1] for r in rows], pa.string()),
            "n_a": pa.array([r[2] for r in rows], pa.int64()),
            "n_b": pa.array([r[3] for r in rows], pa.int64()),
            "t2_micro": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


# functional-dependency candidates for table_fds: (table, determinant
# columns, dependent column). Mix of by-construction keys (PKs — the
# FD holds) and plausible-but-false dependencies (the violation
# counts are the interesting profiling output).
FD_CANDIDATES: list[tuple[str, tuple[str, ...], str]] = [
    ("customer", ("c_custkey",), "c_nationkey"),
    ("customer", ("c_nationkey",), "c_mktsegment"),
    ("documents", ("doc_id",), "lang"),
    ("documents", ("lang",), "source"),
    ("events", ("event_id",), "user_id"),
    ("events", ("user_id",), "event_type"),
    ("lineitem", ("l_orderkey",), "l_partkey"),
    ("lineitem", ("l_orderkey", "l_linenumber"), "l_partkey"),
    ("orders", ("o_custkey",), "o_orderpriority"),
    ("orders", ("o_orderkey",), "o_custkey"),
    ("part", ("p_brand",), "p_type"),
    ("part", ("p_partkey",), "p_brand"),
]


def _fd_row_hash(df: pd.DataFrame) -> np.ndarray:
    """63-bit row hash over one or more columns — the composite-key
    sibling of ``_stats_value_hash`` (same fixed-key
    ``hash_pandas_object``, which combines a DataFrame's columns into
    one per-row hash)."""
    h = pd.util.hash_pandas_object(df, index=False).to_numpy().astype("uint64")
    return (h & np.uint64((1 << 63) - 1)).astype("int64")


def table_fds(sf_dir: str) -> pa.Table:
    """(tbl, det, dep, n_det, n_pairs, n_violations, holds): the
    functional-dependency audit over ``FD_CANDIDATES`` — does
    determinant A fix dependent B? ``n_det`` = exact distinct A,
    ``n_pairs`` = exact distinct (A, B); the FD holds iff they are
    equal, and ``n_violations`` = n_pairs − n_det counts the extra
    (A, B) combinations (the data-profiling / schema-discovery pass:
    key validation before ingest, FD mining for normalization).

    Plan — the ``table_stats`` shared-exchange idiom extended to row
    hashes: ONE read per table evaluates all of its candidates in one
    ``map_batches`` (each batch pre-shrinks to its distinct
    (h(A), h(A,B)) pairs — the batch-local combiner), and all tables
    share ONE exchange whose bucket encodes (candidate, h(A) % B), so
    every occurrence of a determinant value co-locates and both
    distinct counts are exact group-locally. The driver folds
    O(candidates × B) partial rows. NULLs don't occur in the audited
    columns; a NULL-bearing determinant would hash like any value
    (pandas semantics), documented rather than SQL-mimicked."""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    by_table: dict[str, list[tuple[int, tuple[str, ...], str]]] = {}
    for i, (tbl, det, dep) in enumerate(FD_CANDIDATES):
        by_table.setdefault(tbl, []).append((i, det, dep))

    def make_partial(tbl: str):
        cands = by_table[tbl]

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            frames = []
            for idx, det, dep in cands:
                ha = _fd_row_hash(df[list(det)])
                hab = _fd_row_hash(df[list(det) + [dep]])
                sub = pd.DataFrame({"ha": ha, "hab": hab}).drop_duplicates()
                sub["bucket"] = (idx * B + (sub["ha"] % B)).astype("int64")
                frames.append(sub[["bucket", "ha", "hab"]])
            return pd.concat(frames, ignore_index=True)

        return partial

    def reduce_group(g: pd.DataFrame) -> pd.DataFrame:
        idx = int(g["bucket"].iloc[0]) // B
        # hab embeds the determinant, so distinct hab == distinct pairs
        return pd.DataFrame(
            {
                "fd": [idx],
                "n_det": [int(g["ha"].nunique())],
                "n_pairs": [int(g["hab"].nunique())],
            }
        )

    ds = None
    for tbl in sorted(by_table):
        cols = sorted(
            {c for _, det, dep in by_table[tbl] for c in (*det, dep)}
        )
        part = rd.read_parquet(
            f"{sf_dir}/{tbl}.parquet", columns=cols
        ).map_batches(make_partial(tbl), batch_format="pandas")
        ds = part if ds is None else ds.union(part)

    parts = (
        ds.groupby("bucket")
        .map_groups(reduce_group, batch_format="pandas")
        .to_pandas()
        .groupby("fd", as_index=False)
        .sum()
    )

    rows = []
    for i, (tbl, det, dep) in enumerate(FD_CANDIDATES):
        sub = parts[parts["fd"] == i]
        n_det = int(sub["n_det"].sum())
        n_pairs = int(sub["n_pairs"].sum())
        rows.append(
            (
                tbl,
                ",".join(det),
                dep,
                n_det,
                n_pairs,
                n_pairs - n_det,
                1 if n_pairs == n_det else 0,
            )
        )
    rows.sort()
    return pa.table(
        {
            "tbl": pa.array([r[0] for r in rows], pa.string()),
            "det": pa.array([r[1] for r in rows], pa.string()),
            "dep": pa.array([r[2] for r in rows], pa.string()),
            "n_det": pa.array([r[3] for r in rows], pa.int64()),
            "n_pairs": pa.array([r[4] for r in rows], pa.int64()),
            "n_violations": pa.array([r[5] for r in rows], pa.int64()),
            "holds": pa.array([r[6] for r in rows], pa.int64()),
        }
    )


def events_value_mad(sf_dir: str) -> pa.Table:
    """(event_type, n, median_cents, mad_cents): per-type median and
    MEDIAN ABSOLUTE DEVIATION — the robust dispersion estimate
    (breakdown point 50%, vs 0% for the σ the outliers query
    prefilters with). Both medians are exact ``quantile_disc``
    discrete quantiles on cents.

    Scale shape: the winsorized op's ONE-pass trick goes further —
    the same two-phase (type, cent) histogram yields the median AND
    the deviation-multiset median group-locally (deviations are a
    permutation of the histogram rows: |v − med| with the same
    counts, re-sorted and re-walked), so the events table is scanned
    once and nothing broadcasts."""

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"event_type": df["event_type"], "value_c": to_cents(df["value"])}
        )

    hist = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        ).map_batches(cents, batch_format="pandas"),
        keys=["event_type", "value_c"],
        aggs={"n": ("value_c", "count")},
    )

    def type_mad(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("value_c")
        counts = g["n"].to_numpy()
        values = g["value_c"].to_numpy()
        cum = counts.cumsum()
        n = int(cum[-1])
        rank = max(1, int(np.ceil(0.5 * n)))  # quantile_disc rule
        med = int(values[np.searchsorted(cum, rank)])
        dev = np.abs(values - med)
        order = np.argsort(dev, kind="stable")
        cum2 = counts[order].cumsum()
        mad = int(dev[order][np.searchsorted(cum2, rank)])
        return pd.DataFrame(
            [(g["event_type"].iloc[0], n, med, mad)],
            columns=["event_type", "n", "median_cents", "mad_cents"],
        )

    out = (
        hist.groupby("event_type")
        .map_groups(type_mad, batch_format="pandas")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"].tolist(), pa.string()),
            "n": pa.array([int(x) for x in out["n"]], pa.int64()),
            "median_cents": pa.array([int(x) for x in out["median_cents"]], pa.int64()),
            "mad_cents": pa.array([int(x) for x in out["mad_cents"]], pa.int64()),
        }
    )


def orders_pareto(sf_dir: str) -> pa.Table:
    """(n_customers, n_top_for_80pct, top20_share_micro): revenue
    concentration — how many top customers cover 80% of revenue, and
    what share the top 20% of customers hold (the 80/20 report). All
    comparisons exact integers (5·cum ≥ 4·total; share in micro by
    floor division), ordered by (revenue DESC, custkey) so ties are
    deterministic.

    Plan: the O(customers) revenue table comes from one custkey
    co-group; the descending cumulative scan uses the shared
    range-partition recipe (sample-trained splits on the negated
    revenue → per-bucket (count, sum) partials → O(buckets) driver
    exclusive prefixes → bucket-LOCAL sorted scans), so no global sort
    ever materializes and each bucket emits at most two scalar
    answers. Same machinery class as ``events_peak_concurrency``."""
    import ray

    from suckit_ray.stages.agg import bucketed_groupby_agg

    rev = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        ).map_batches(
            lambda df: pd.DataFrame(
                {
                    "cust": df["o_custkey"].astype("int64"),
                    "rev": to_cents(df["o_totalprice"]),
                }
            )
            .groupby("cust", as_index=False)
            .agg(rev=("rev", "sum")),
            batch_format="pandas",
        ),
        keys=["cust"],
        aggs={"rev": ("rev", "sum")},
    ).map_batches(
        lambda df: df.assign(negrev=-df["rev"].to_numpy()), batch_format="pandas"
    )

    splits = _train_rank_splits(rev, 32, id_col="cust", value_col="negrev")
    if splits is None:
        return pa.table(
            {
                "n_customers": pa.array([0], pa.int64()),
                "n_top_for_80pct": pa.array([0], pa.int64()),
                "top20_share_micro": pa.array([0], pa.int64()),
            }
        )
    splits_ref = ray.put(splits)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        sp = ray.get(splits_ref)
        return df.assign(
            bucket=np.searchsorted(sp, df["negrev"].to_numpy(), side="right").astype(
                "int64"
            )
        )

    bucketed = rev.map_batches(bucketize, batch_format="pandas").materialize()
    parts = (
        bucketed.map_batches(
            lambda df: df.groupby("bucket", as_index=False).agg(
                n=("cust", "size"), s=("rev", "sum")
            ),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby("bucket")
        .sum()
        .sort_index()
    )
    total = int(parts["s"].sum())
    n_cust = int(parts["n"].sum())
    base_n = (parts["n"].cumsum() - parts["n"]).to_dict()  # exclusive prefixes
    base_s = (parts["s"].cumsum() - parts["s"]).to_dict()
    k20 = max(1, int(np.ceil(0.2 * n_cust)))
    bases_ref = ray.put((base_n, base_s, total, k20))

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        bn, bs, tot, k = ray.get(bases_ref)
        b = int(g["bucket"].iloc[0])
        g = g.sort_values(["negrev", "cust"], kind="mergesort")
        cum = int(bs.get(b, 0)) + g["rev"].cumsum().to_numpy()
        rank = int(bn.get(b, 0)) + np.arange(1, len(g) + 1)
        out = []
        hit = np.nonzero(5 * cum >= 4 * tot)[0]
        if len(hit):  # first qualifying rank in this bucket
            out.append(("n80", int(rank[hit[0]])))
        pos = np.nonzero(rank == k)[0]
        if len(pos):  # the k20-th customer's cumulative revenue
            out.append(("cum20", int(cum[pos[0]])))
        return pd.DataFrame(out, columns=["kind", "val"])

    found = (
        bucketed.groupby("bucket")
        .map_groups(scan, batch_format="pandas")
        .to_pandas()
    )
    n80 = int(found.loc[found["kind"] == "n80", "val"].min())
    cum20 = int(found.loc[found["kind"] == "cum20", "val"].iloc[0])
    return pa.table(
        {
            "n_customers": pa.array([n_cust], pa.int64()),
            "n_top_for_80pct": pa.array([n80], pa.int64()),
            "top20_share_micro": pa.array([cum20 * 1_000_000 // total], pa.int64()),
        }
    )


def events_value_entropy(sf_dir: str) -> pa.Table:
    """(event_type, n, n_distinct, entropy_micronats): Shannon entropy
    of each type's value distribution — the dispersion/anomaly profile
    a monitoring pipeline tracks per metric (a collapsing distribution
    is a broken producer). From the exact (type, cent) histogram:
    H = Σ (c/n)·ln(n/c), carried as the order-free integer
    Σ c·floor(10^6·ln(n/c)) then // n — the ``docs_dsir_weights``
    micronat idiom, which is what lets a float-log quantity hash-match
    SQL (both sides floor the SAME double ln before any summation).

    Scale shape: the one-exchange histogram every quantile op shares;
    entropy closes group-locally."""

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"event_type": df["event_type"], "value_c": to_cents(df["value"])}
        )

    hist = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        ).map_batches(cents, batch_format="pandas"),
        keys=["event_type", "value_c"],
        aggs={"n": ("value_c", "count")},
    )

    def type_entropy(g: pd.DataFrame) -> pd.DataFrame:
        c = g["n"].to_numpy().astype("int64")
        n = int(c.sum())
        terms = np.floor(1e6 * np.log(n / c.astype("float64"))).astype("int64")
        numer = int((c * terms).sum())
        return pd.DataFrame(
            [(g["event_type"].iloc[0], n, len(c), numer // n)],
            columns=["event_type", "n", "n_distinct", "entropy_micronats"],
        )

    out = (
        hist.groupby("event_type")
        .map_groups(type_entropy, batch_format="pandas")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"].tolist(), pa.string()),
            "n": pa.array([int(x) for x in out["n"]], pa.int64()),
            "n_distinct": pa.array([int(x) for x in out["n_distinct"]], pa.int64()),
            "entropy_micronats": pa.array(
                [int(x) for x in out["entropy_micronats"]], pa.int64()
            ),
        }
    )


FREQUENT_PAIR_MINSUP = 2


def _basket_counts(sf_dir: str) -> tuple[rd.Dataset, int, dict[int, int]]:
    """Shared A-priori count pass for the market-basket family
    (``lineitem_frequent_pairs`` / ``lineitem_assoc_rules``): returns
    the materialized (part_a, part_b, support) count Dataset — with
    per-part sentinels at ``part_b = -1`` and the basket total at
    ``(-2, -2)`` — plus the driver-side N_orders scalar and the
    O(parts) bounded-dimension item-count map (the q17 idiom)."""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates(["l_orderkey", "l_partkey"])
        return pd.DataFrame(
            {
                "orderkey": out["l_orderkey"].astype("int64"),
                "partkey": out["l_partkey"].astype("int64"),
                "bucket": (out["l_orderkey"] % B).astype("int64"),
            }
        )

    def basket_partials(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["orderkey", "partkey"])
        # pair partials: vectorized self-merge per basket (a < b)
        m = g.merge(g, on="orderkey", suffixes=("_a", "_b"))
        m = m[m["partkey_a"] < m["partkey_b"]]
        pairs = (
            m.groupby(["partkey_a", "partkey_b"], as_index=False)
            .size()
            .rename(
                columns={
                    "partkey_a": "part_a",
                    "partkey_b": "part_b",
                    "size": "n",
                }
            )
        )
        # per-part basket partials (part_b = -1) for c(A), c(B)
        items = (
            g.groupby("partkey", as_index=False)
            .size()
            .rename(columns={"partkey": "part_a", "size": "n"})
        )
        items["part_b"] = -1
        # one basket-count row (-2, -2) per group for N_orders
        tot = pd.DataFrame(
            {"part_a": [-2], "part_b": [-2], "n": [g["orderkey"].nunique()]}
        )
        out = pd.concat(
            [pairs, items[["part_a", "part_b", "n"]], tot], ignore_index=True
        )
        out["n"] = out["n"].astype("int64")
        return out[["part_a", "part_b", "n"]]

    counts = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
        )
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(basket_partials, batch_format="pandas"),
        keys=["part_a", "part_b"],
        aggs={"support": ("n", "sum")},
    ).materialize()  # two consumers: the sentinel collect + the pair pass

    def sentinels_only(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["part_b"] < 0]

    side = counts.map_batches(
        sentinels_only, batch_format="pandas"
    ).to_pandas()  # O(parts) + 1 rows — a bounded dimension, q17-style
    n_orders = int(side.loc[side["part_a"] == -2, "support"].sum())
    item_counts = dict(
        zip(
            side.loc[side["part_a"] >= 0, "part_a"].astype("int64"),
            side.loc[side["part_a"] >= 0, "support"].astype("int64"),
        )
    )
    return counts, n_orders, item_counts


def lineitem_frequent_pairs(
    sf_dir: str, minsup: int = FREQUENT_PAIR_MINSUP
) -> rd.Dataset:
    """Market-basket frequent-pair mining (the A-priori second pass,
    Agrawal & Srikant 1994): every part pair co-occurring in >= minsup
    orders, with its support count and lift in integer micro-units —
    lift_micro = floor(10^6 · N_orders · c(A,B) / (c(A)·c(B))), the
    association-strength signal a recommender / co-purchase report
    reads off the basket table.

    Plan: ONE orderkey-hash co-group brings each basket's rows
    together (dedup of repeated parts inside an order happens there,
    where the rows already are) and emits three partial-count row
    kinds through one shared (part_a, part_b) key space — pair
    partials, per-part basket partials tagged ``part_b = -1``, and a
    per-group basket-count row tagged ``(-2, -2)`` (the
    referential_audit "bucket id encodes the key space" idiom). Pair
    fan-out is bounded by the basket size (TPC-H baskets are <= 7
    items, so <= 21 pair rows per order; a retail-scale basket cap
    would ride the same group pass). ONE bucketed sum finishes all
    three; item counts are an O(parts) bounded-dimension broadcast
    (the q17 per-part idiom), and lift closes over the already-sparse
    thresholded pairs in exact Python ints (oracle: HUGEINT)."""
    counts, n_orders, item_counts = _basket_counts(sf_dir)

    def close_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["part_b"] >= 0) & (df["support"] >= minsup)]
        # exact integer lift over the sparse thresholded result only
        lift = [
            (1_000_000 * n_orders * int(s))
            // (item_counts[int(a)] * item_counts[int(b)])
            for a, b, s in zip(df["part_a"], df["part_b"], df["support"])
        ]
        return pd.DataFrame(
            {
                "part_a": df["part_a"].astype("int64").to_numpy(),
                "part_b": df["part_b"].astype("int64").to_numpy(),
                "support": df["support"].astype("int64").to_numpy(),
                "lift_micro": pd.array(lift, dtype="int64"),
            }
        )

    return counts.map_batches(close_pairs, batch_format="pandas")


def events_mutual_information(sf_dir: str) -> pa.Table:
    """One-row (n, n_types, n_days, mi_micronats): mutual information
    between event type and day-of-week — the categorical-dependence /
    feature-selection check (MI ~ 0 says the type mix is stationary
    across the week; a spike says a producer is time-skewed). MI =
    Σ (c_xy/N)·ln(N·c_xy/(c_x·c_y)), carried as the order-free integer
    Σ c_xy·floor(10^6·ln(·)) then trunc-divided by N (the dsir/entropy
    micronat idiom; final division mirrors DuckDB's truncating ``//``
    since floor terms can sum negative).

    Scale shape: batch-local (type, dow) partial counts through one
    bucketed sum — the contingency table is bounded by the category
    domain (|types|×7), so marginals and the closing sum are an
    O(domain) driver fold, never an O(rows) structure."""

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        dow = (
            df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            // 86_400_000_000
        ) % 7
        return pd.DataFrame({"x": df["event_type"], "y": dow.astype("int64")})

    cont = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
        ).map_batches(prep, batch_format="pandas"),
        keys=["x", "y"],
        aggs={"n": ("x", "count")},
    ).to_pandas()  # ≤ |types|·7 rows — bounded by the category domain

    n = int(cont["n"].sum())
    cx = cont.groupby("x")["n"].sum()
    cy = cont.groupby("y")["n"].sum()
    cxy = cont["n"].to_numpy().astype("int64")
    mx = cx.loc[cont["x"]].to_numpy().astype("int64")
    my = cy.loc[cont["y"]].to_numpy().astype("int64")
    terms = np.floor(
        1e6 * np.log(np.float64(n) * cxy / (mx * my))
    ).astype("int64")
    numer = int((cxy * terms).sum())
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "n_types": pa.array([len(cx)], pa.int64()),
            "n_days": pa.array([len(cy)], pa.int64()),
            "mi_micronats": pa.array([_trunc_div(numer, n)], pa.int64()),
        }
    )


def events_ab_test(sf_dir: str) -> pa.Table:
    """One-row A/B experiment readout: users split into deterministic
    arms by user_id parity, conversion = HEAVY BUYER (>= 14 'purchase'
    events — the >=1 definition is degenerate on this corpus: every
    user purchases), and the Pearson chi-square statistic of the 2×2
    table carried EXACTLY — chi2 = N·(ad−bc)²/((a+b)(c+d)(a+c)(b+d))
    as one trunc-division in unbounded Python ints (oracle: HUGEINT;
    (ad−bc)² alone overflows int64 at ~50k users/cell). chi2_micro >=
    3.841e6 rejects independence at p < 0.05 (1 dof).

    Plan: batches pre-shrink to per-user purchase-count partials, ONE
    user-hash co-group sums each user's count and counts its local
    (arm, conv) cells — the exchange carries two small ints per
    (user, batch), the driver folds O(buckets·4) cell partials."""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()
    HEAVY = 14

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            pd.DataFrame(
                {
                    "user_id": df["user_id"].astype("int64"),
                    "purch": (df["event_type"] == "purchase").astype(
                        "int64"
                    ),
                }
            )
            .groupby("user_id", as_index=False)["purch"]
            .sum()
        )
        out["bucket"] = (out["user_id"] % B).astype("int64")
        return out

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        u = g.groupby("user_id", as_index=False)["purch"].sum()
        u["arm"] = (u["user_id"] % 2).astype("int64")
        u["conv"] = (u["purch"] >= HEAVY).astype("int64")
        c = u.groupby(["arm", "conv"], as_index=False).size()
        c["n"] = c["size"].astype("int64")
        return c[["arm", "conv", "n"]]

    parts = (
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
        )
        .map_batches(partials, batch_format="pandas")
        .groupby("bucket")
        .map_groups(cells, batch_format="pandas")
        .to_pandas()  # O(buckets·4) cell partials
    )
    tot = parts.groupby(["arm", "conv"])["n"].sum()
    a = int(tot.get((0, 1), 0))  # arm A converted
    b = int(tot.get((0, 0), 0))  # arm A not
    c = int(tot.get((1, 1), 0))  # arm B converted
    d = int(tot.get((1, 0), 0))  # arm B not
    n = a + b + c + d
    den = (a + b) * (c + d) * (a + c) * (b + d)
    chi2 = (
        _trunc_div(1_000_000 * n * (a * d - b * c) ** 2, den) if den else 0
    )
    return pa.table(
        {
            "users_a": pa.array([a + b], pa.int64()),
            "conv_a": pa.array([a], pa.int64()),
            "users_b": pa.array([c + d], pa.int64()),
            "conv_b": pa.array([c], pa.int64()),
            "chi2_micro": pa.array([chi2], pa.int64()),
        }
    )


USER_PATHS_K = 20
USER_PATHS_MAXLEN = 8


def events_user_paths(
    sf_dir: str, k: int = USER_PATHS_K, maxlen: int = USER_PATHS_MAXLEN
) -> pa.Table:
    """(path, n): the top-k most frequent user JOURNEYS — each
    (user, day)'s first ``maxlen`` event types in (ts, event_id) order
    joined with '>' — the path-analysis readout behind funnel design
    ("what do users actually do?"). The cap bounds the string per
    session deterministically (mirrored as ROW_NUMBER <= maxlen in the
    oracle), the scale guard a power-user day needs.

    Plan: ONE user-hash co-group (a user's rows co-locate; day split,
    sort, head-cap and join happen group-locally), one bucketed count
    per path, then per-block top-k — each path's group is complete
    inside its bucket, so a block's local top-k is a superset of its
    contribution to the global top-k and the driver merges <= k·blocks
    rows. Order (n DESC, path ASC) makes the cut deterministic."""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        return pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "day": (ts_us // 86_400_000_000).astype("int64"),
                "ts_us": ts_us,
                "event_id": df["event_id"].astype("int64"),
                "event_type": df["event_type"],
                "bucket": (df["user_id"] % B).astype("int64"),
            }
        )

    def paths(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "day", "ts_us", "event_id"], kind="mergesort")
        g = g.groupby(["user_id", "day"], as_index=False).head(maxlen)
        p = g.groupby(["user_id", "day"], as_index=False).agg(
            path=("event_type", lambda s: ">".join(s))
        )
        return p[["path"]]

    counted = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id", "event_type"],
        )
        .map_batches(prep, batch_format="pandas")
        .groupby("bucket")
        .map_groups(paths, batch_format="pandas"),
        keys=["path"],
        aggs={"n": ("path", "count")},
    )

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["n", "path"], ascending=[False, True], kind="mergesort"
        ).head(k)

    merged = (
        counted.map_batches(block_topk, batch_format="pandas")
        .to_pandas()  # <= k rows per block reach the driver
        .sort_values(["n", "path"], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "path": pa.array(merged["path"].tolist(), pa.string()),
            "n": pa.array([int(x) for x in merged["n"]], pa.int64()),
        }
    )


def events_ewma(sf_dir: str) -> rd.Dataset:
    """(event_type, day, x_cents, ewma_cents): integer α=1/2
    exponentially-weighted moving average over each type's daily cent
    sums — e_0 = x_0, e_t = (x_t + e_{t−1}) // 2 — the smoothed
    monitoring series. Unlike every other scan in the repo (prefix
    sums, running max, CUSUM — all closable to order-free forms), the
    FLOOR inside each step makes this fold genuinely sequential: no
    prefix identity exists, so the honest plan is a per-KEY ordered
    replay. That is exactly the one shape where per-group sequential
    work is scale-correct: the series length is bounded by the
    CALENDAR (days observed), not the corpus, and each type's days
    co-locate in one group.

    Plan: the two-phase (type, day) cent-sum every windowed query
    uses, then ONE type-hash co-group runs the bounded ordered fold.
    Division truncates like DuckDB ``//`` (sums here are positive, so
    floor == trunc; _trunc_div keeps it honest for negative
    corpora)."""
    from suckit_ray.stages.agg import bucketed_groupby_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        day = us // 86_400_000_000
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "day": day.astype("int64"),
                "cents": to_cents(df["value"]),
            }
        )

    daily = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
        ).map_batches(partial, batch_format="pandas"),
        keys=["event_type", "day"],
        aggs={"x_cents": ("cents", "sum")},
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for etype, grp in g.groupby("event_type"):
            grp = grp.sort_values("day", kind="mergesort")
            e = 0
            es = []
            for i, x in enumerate(grp["x_cents"].astype("int64")):
                e = int(x) if i == 0 else _trunc_div(int(x) + e, 2)
                es.append(e)
            out.append(
                pd.DataFrame(
                    {
                        "event_type": etype,
                        "day": grp["day"].astype("int64").to_numpy(),
                        "x_cents": grp["x_cents"].astype("int64").to_numpy(),
                        "ewma_cents": pd.array(es, dtype="int64"),
                    }
                )
            )
        return (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame(
                columns=["event_type", "day", "x_cents", "ewma_cents"]
            )
        )

    return daily.groupby("event_type").map_groups(fold, batch_format="pandas")


def events_holt(sf_dir: str) -> rd.Dataset:
    """(event_type, day, x_cents, level_c, trend_c, forecast_c):
    integer Holt LINEAR-TREND smoothing (α=β=1/2) over each type's
    daily cent sums — the trend-aware sibling of ``events_ewma``:

        l_1 = x_1,  b_1 = 0
        l_t = (x_t + (l_{t-1} + b_{t-1})) / 2      (truncating)
        b_t = ((l_t − l_{t-1}) + b_{t-1}) / 2      (truncating)
        forecast_c = l_t + b_t   (the one-step-ahead forecast)

    Holt 1957 / Winters 1960 (public). Like EWMA, the truncation
    inside each step has no prefix-closed identity, so the honest
    plan is the bounded per-KEY ordered replay: series length is
    calendar-bounded (days observed), each type's days co-locate in
    one group, and the shuffle carries only (type, day, cents). The
    trend term goes NEGATIVE on declining series, so every division
    is ``_trunc_div`` — DuckDB's toward-zero ``//``, not Python's
    flooring one (they differ on negative quotients)."""
    from suckit_ray.stages.agg import bucketed_groupby_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "day": (us // 86_400_000_000).astype("int64"),
                "cents": to_cents(df["value"]),
            }
        )

    daily = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
        ).map_batches(partial, batch_format="pandas"),
        keys=["event_type", "day"],
        aggs={"x_cents": ("cents", "sum")},
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for etype, grp in g.groupby("event_type"):
            grp = grp.sort_values("day", kind="mergesort")
            lev = trend = 0
            levs, trends = [], []
            for i, x in enumerate(grp["x_cents"].astype("int64")):
                x = int(x)
                if i == 0:
                    lev, trend = x, 0
                else:
                    prev = lev
                    lev = _trunc_div(x + (lev + trend), 2)
                    trend = _trunc_div((lev - prev) + trend, 2)
                levs.append(lev)
                trends.append(trend)
            out.append(
                pd.DataFrame(
                    {
                        "event_type": etype,
                        "day": grp["day"].astype("int64").to_numpy(),
                        "x_cents": grp["x_cents"].astype("int64").to_numpy(),
                        "level_c": pd.array(levs, dtype="int64"),
                        "trend_c": pd.array(trends, dtype="int64"),
                        "forecast_c": pd.array(
                            [a + b for a, b in zip(levs, trends)],
                            dtype="int64",
                        ),
                    }
                )
            )
        return (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame(
                columns=[
                    "event_type",
                    "day",
                    "x_cents",
                    "level_c",
                    "trend_c",
                    "forecast_c",
                ]
            )
        )

    return daily.groupby("event_type").map_groups(fold, batch_format="pandas")


def events_holtwinters(sf_dir: str) -> rd.Dataset:
    """(event_type, day, x_cents, level_c, trend_c, season_c,
    forecast_c): additive HOLT-WINTERS smoothing (α=β=γ=1/2, weekly
    season m=7) over each type's GAP-FILLED daily cent sums — the
    seasonal member of the EWMA → Holt ladder (Winters 1960, public).
    The state is (level, trend, rotating 7-slot seasonal queue); per
    step with s = queue head (the seasonal for this day):

        l' = (x − s + l + b) / 2          (truncating)
        b' = (l' − l + b) / 2             (truncating)
        s' = (x − l' + s) / 2             (truncating; re-enqueued)
        forecast = l' + b' + next head    (one-step-ahead)

    init: l₁ = x₁, b₁ = 0, queue all-zero. Like EWMA/Holt, the
    truncation has no prefix identity, so the honest plan is the
    calendar-bounded per-type ordered replay over the dense series
    (the CUSUM gap-fill recipe — seasonality needs CONSECUTIVE
    calendar days, unlike Holt's observed-day fold); the oracle is a
    recursive CTE carrying the seven seasonal slots as columns and
    rotating them each step. Divisions go negative on declining
    series → ``_trunc_div`` / DuckDB ``//`` toward-zero parity."""
    import ray

    from suckit_ray.stages.agg import bucketed_groupby_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        day = us // US_PER_DAY
        day = day + ((us < 0) & (day * US_PER_DAY != us))  # trunc like //
        return (
            pd.DataFrame(
                {
                    "event_type": df["event_type"],
                    "day": day.astype("int64"),
                    "x": to_cents(df["value"]),
                }
            )
            .groupby(["event_type", "day"], as_index=False)["x"]
            .sum()
        )

    daily = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
        ).map_batches(partial, batch_format="pandas"),
        keys=["event_type", "day"],
        aggs={"x": ("x", "sum")},
    ).materialize()

    cols = [
        "event_type",
        "day",
        "x_cents",
        "level_c",
        "trend_c",
        "season_c",
        "forecast_c",
    ]
    span = _global_day_span(daily)
    if span is None:
        return rd.from_arrow(
            pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    **{
                        c: pa.array([], pa.int64())
                        for c in cols[1:]
                    },
                }
            )
        )
    span_ref = ray.put(span)

    def hw_group(g: pd.DataFrame) -> pd.DataFrame:
        lo, hi = ray.get(span_ref)
        days = np.arange(lo, hi + 1, dtype="int64")
        xs = (
            g.set_index("day")["x"]
            .reindex(days)
            .fillna(0)
            .astype("int64")
            .to_numpy()
        )
        lev = trend = 0
        queue = [0] * 7
        out = []
        for i, x in enumerate(xs):
            x = int(x)
            s = queue.pop(0)
            if i == 0:
                lev, trend = x, 0
            else:
                prev = lev
                lev = _trunc_div(x - s + lev + trend, 2)
                trend = _trunc_div(lev - prev + trend, 2)
            snew = _trunc_div(x - lev + s, 2)
            queue.append(snew)
            out.append((x, lev, trend, snew, lev + trend + queue[0]))
        return pd.DataFrame(
            {
                "event_type": g["event_type"].iloc[0],
                "day": days,
                "x_cents": pd.array([o[0] for o in out], dtype="int64"),
                "level_c": pd.array([o[1] for o in out], dtype="int64"),
                "trend_c": pd.array([o[2] for o in out], dtype="int64"),
                "season_c": pd.array([o[3] for o in out], dtype="int64"),
                "forecast_c": pd.array([o[4] for o in out], dtype="int64"),
            }
        )

    return daily.groupby("event_type").map_groups(
        hw_group, batch_format="pandas"
    )


def orders_open_backlog(sf_dir: str) -> rd.Dataset:
    """(day, n_open): the daily open-order backlog — orders counted
    from their order day through the day their LAST lineitem ships
    (inclusive), evaluated at every day where the count changes. The
    interval-sweep shape (+1 at open, −1 past close, running sum) the
    peak-concurrency query uses, lifted from timestamps to the order
    lifecycle across TWO tables.

    Plan: batch-local partial MAX of ship-day per order (combiner —
    the exchange carries one row per (batch, order), not per
    lineitem), one orderkey-hash co-group joins the order-date leg
    and finishes the max, emits the two delta rows per order; one
    bucketed per-day sum; then the global running total is a
    CALENDAR-BOUNDED ordered fold in a single group (the
    ewma/CUSUM argument: days, not orders, bound the series)."""
    from suckit_ray.stages.agg import bucketed_groupby_agg, default_buckets

    B = default_buckets()
    DAY_US = 86_400_000_000

    def order_rows(df: pd.DataFrame) -> pd.DataFrame:
        day = (
            df["o_orderdate"].to_numpy().astype("datetime64[us]").astype("int64")
            // DAY_US
        )
        return pd.DataFrame(
            {
                "okey": df["o_orderkey"].astype("int64"),
                "day": day.astype("int64"),
                "is_open": np.ones(len(df), dtype="int64"),
                "bucket": (df["o_orderkey"] % B).astype("int64"),
            }
        )

    def ship_partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (
            df["l_shipdate"].to_numpy().astype("datetime64[us]").astype("int64")
            // DAY_US
        )
        p = (
            pd.DataFrame(
                {"okey": df["l_orderkey"].astype("int64"), "day": day}
            )
            .groupby("okey", as_index=False)["day"]
            .max()
        )
        p["is_open"] = np.int64(0)
        p["bucket"] = (p["okey"] % B).astype("int64")
        return p

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(order_rows, batch_format="pandas")
    ships = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(ship_partial, batch_format="pandas")

    def deltas(g: pd.DataFrame) -> pd.DataFrame:
        close = (
            g[g["is_open"] == 0].groupby("okey", as_index=False)["day"].max()
        ).rename(columns={"day": "close_day"})
        iv = g[g["is_open"] == 1][["okey", "day"]].merge(close, on="okey")
        return pd.DataFrame(
            {
                "day": np.concatenate(
                    [iv["day"].to_numpy(), iv["close_day"].to_numpy() + 1]
                ).astype("int64"),
                "d": np.concatenate(
                    [
                        np.ones(len(iv), dtype="int64"),
                        -np.ones(len(iv), dtype="int64"),
                    ]
                ),
            }
        )

    byday = bucketed_groupby_agg(
        orders.union(ships).groupby("bucket").map_groups(
            deltas, batch_format="pandas"
        ),
        keys=["day"],
        aggs={"d": ("d", "sum")},
    )

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("day", kind="mergesort")
        return pd.DataFrame(
            {
                "day": g["day"].astype("int64"),
                "n_open": g["d"].cumsum().astype("int64"),
            }
        )

    return (
        byday.map_batches(
            lambda df: df.assign(one=np.int64(0)), batch_format="pandas"
        )
        .groupby("one")
        .map_groups(
            lambda g: running(g.drop(columns=["one"])), batch_format="pandas"
        )
    )


def _order_latencies(sf_dir: str) -> rd.Dataset:
    """(priority, lat): one row per order — fulfillment latency in
    days (order date → LAST lineitem ship day) with its priority, via
    the backlog-style orderkey co-group (order-date leg + batch-local
    partial ship-max leg). Shared producer of
    ``orders_fulfillment_latency`` and ``orders_latency_anova`` so the
    day arithmetic and the co-group live in ONE place."""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()
    DAY_US = 86_400_000_000

    def order_rows(df: pd.DataFrame) -> pd.DataFrame:
        day = (
            df["o_orderdate"].to_numpy().astype("datetime64[us]").astype("int64")
            // DAY_US
        )
        return pd.DataFrame(
            {
                "okey": df["o_orderkey"].astype("int64"),
                "day": day.astype("int64"),
                "priority": df["o_orderpriority"],
                "is_open": np.ones(len(df), dtype="int64"),
                "bucket": (df["o_orderkey"] % B).astype("int64"),
            }
        )

    def ship_partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (
            df["l_shipdate"].to_numpy().astype("datetime64[us]").astype("int64")
            // DAY_US
        )
        p = (
            pd.DataFrame(
                {"okey": df["l_orderkey"].astype("int64"), "day": day}
            )
            .groupby("okey", as_index=False)["day"]
            .max()
        )
        p["priority"] = ""
        p["is_open"] = np.int64(0)
        p["bucket"] = (p["okey"] % B).astype("int64")
        return p[["okey", "day", "priority", "is_open", "bucket"]]

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(order_rows, batch_format="pandas")
    ships = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(ship_partial, batch_format="pandas")

    def latencies(g: pd.DataFrame) -> pd.DataFrame:
        close = (
            g[g["is_open"] == 0].groupby("okey", as_index=False)["day"].max()
        ).rename(columns={"day": "close_day"})
        iv = g[g["is_open"] == 1][["okey", "day", "priority"]].merge(
            close, on="okey"
        )
        return pd.DataFrame(
            {
                "priority": iv["priority"],
                "lat": (iv["close_day"] - iv["day"]).astype("int64"),
            }
        )

    return (
        orders.union(ships)
        .groupby("bucket")
        .map_groups(latencies, batch_format="pandas")
    )


def orders_fulfillment_latency(sf_dir: str) -> rd.Dataset:
    """(priority, n_orders, p50_days, p90_days, max_days): order
    fulfillment latency — days from order date to the LAST lineitem
    ship date — summarized per order priority with the repo's integer
    rank rules (p50: smallest v with 2·cum ≥ n; p90: smallest v with
    10·cum ≥ 9·n — no interpolation, so the oracle mirrors exactly).

    Plan: the backlog query's orderkey co-group (order-date leg +
    batch-local partial ship-max leg) emits one (priority, latency)
    row per order; one bucketed (priority, latency) HISTOGRAM
    exchange; the per-priority rank walk runs over the tiny histogram
    group — the one-pass histogram shape the quantile/MAD family
    established."""
    from suckit_ray.stages.agg import bucketed_groupby_agg

    hist = bucketed_groupby_agg(
        _order_latencies(sf_dir),
        keys=["priority", "lat"],
        aggs={"c": ("lat", "count")},
    )


    def walk(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for pr, grp in g.groupby("priority"):
            grp = grp.sort_values("lat", kind="mergesort")
            c = grp["c"].astype("int64").to_numpy()
            lat = grp["lat"].astype("int64").to_numpy()
            cum = np.cumsum(c)
            n = int(cum[-1])
            p50 = int(lat[np.searchsorted(cum * 2, n, side="left")])
            p90 = int(lat[np.searchsorted(cum * 10, 9 * n, side="left")])
            out.append((pr, n, p50, p90, int(lat[-1])))
        return pd.DataFrame(
            out,
            columns=["priority", "n_orders", "p50_days", "p90_days", "max_days"],
        ).astype(
            {
                "n_orders": "int64",
                "p50_days": "int64",
                "p90_days": "int64",
                "max_days": "int64",
            }
        )

    return hist.groupby("priority").map_groups(walk, batch_format="pandas")


# floor(log10(1 + 1/d) * 1e9) for d = 1..9 — Benford's law (Newcomb
# 1881 / Benford 1938, public) first-digit probabilities in exact
# nano units, verified against 40-digit Decimal ln; the SAME literals
# are inlined in the SQL oracle so no float log appears on either side
_BENFORD_NANO = {
    1: 301_029_995,
    2: 176_091_259,
    3: 124_938_736,
    4: 96_910_013,
    5: 79_181_246,
    6: 66_946_789,
    7: 57_991_946,
    8: 51_152_522,
    9: 45_757_490,
}


def events_benford(sf_dir: str) -> rd.Dataset:
    """(event_type, digit, n_obs, term_micro, chi2_micro): Benford
    first-significant-digit audit of each type's cent values — the
    fraud/data-quality screen: observed digit histogram vs the Benford
    expectation, per-digit chi-square contribution and the per-type
    chi-square statistic, ALL in exact integer arithmetic:

        term = ((n_obs·1e9 − n·P_nano)² · 1e6) / (n·P_nano·1e9)

    truncated per digit then summed (numerator is a square, so floor
    == trunc and DuckDB ``//`` agrees). Digits with zero observations
    still contribute (0 − nP)² — the 9-digit support is materialized
    per type. The engine folds in unbounded Python ints; the oracle's
    HUGEINT holds to ~4e11 events per type, far past test scale.

    Plan: one vectorized first-digit partial per batch, one bucketed
    (type, digit) count — at most 9·|types| rows leave the exchange —
    then a per-type group computes the constants fold."""
    from suckit_ray.stages.agg import bucketed_groupby_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = to_cents(df["value"])
        m = c > 0
        return pd.DataFrame(
            {
                "event_type": df["event_type"][m],
                "digit": c[m].astype(str).str[0].astype("int64"),
            }
        )

    obs = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        ).map_batches(partial, batch_format="pandas"),
        keys=["event_type", "digit"],
        aggs={"n_obs": ("digit", "count")},
    )

    def chi2(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for etype, grp in g.groupby("event_type"):
            have = dict(
                zip(grp["digit"].astype("int64"), grp["n_obs"].astype("int64"))
            )
            n = int(sum(have.values()))
            terms = {}
            for d, p in _BENFORD_NANO.items():
                o = int(have.get(d, 0))
                num = (o * 10**9 - n * p) ** 2 * 10**6
                terms[d] = num // (n * p * 10**9) if n else 0
            tot = sum(terms.values())
            out.append(
                pd.DataFrame(
                    {
                        "event_type": etype,
                        "digit": pd.array(sorted(terms), dtype="int64"),
                        "n_obs": pd.array(
                            [int(have.get(d, 0)) for d in sorted(terms)],
                            dtype="int64",
                        ),
                        "term_micro": pd.array(
                            [terms[d] for d in sorted(terms)], dtype="int64"
                        ),
                        "chi2_micro": pd.array(
                            [tot] * len(terms), dtype="int64"
                        ),
                    }
                )
            )
        return (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame(
                columns=[
                    "event_type",
                    "digit",
                    "n_obs",
                    "term_micro",
                    "chi2_micro",
                ]
            )
        )

    return obs.groupby("event_type").map_groups(chi2, batch_format="pandas")


ATTRIBUTION_WINDOW_US = 7 * 86_400_000_000


def events_attribution(sf_dir: str) -> rd.Dataset:
    """(day, n_purchases, n_attributed): LAST-TOUCH attribution — a
    purchase counts as attributed when the same user's most recent
    prior 'click' (strictly before in (ts, event_id) order) happened
    within a 7-day window. The marketing-analytics shape that
    completes funnel/retention/markov/paths: per-row state from a
    different row TYPE in the same ordered stream.

    Plan: ONE user-hash co-group — inside it the running
    last-click timestamp is a grouped cummax of click-masked
    timestamps shifted by one (both C-speed pandas grouped kernels,
    exactly the oracle's MAX ... ROWS UNBOUNDED PRECEDING AND 1
    PRECEDING frame) — then per-day partials and one bucketed sum.
    Integer microsecond arithmetic end to end."""
    from suckit_ray.stages.agg import bucketed_groupby_agg, default_buckets

    B = default_buckets()

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        return pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "ts_us": ts_us,
                "event_id": df["event_id"].astype("int64"),
                "event_type": df["event_type"],
                "bucket": (df["user_id"] % B).astype("int64"),
            }
        )

    def attribute(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        click_ts = g["ts_us"].where(g["event_type"] == "click")
        # cummax leaves NaN at non-click rows — grouped ffill turns it
        # into the running last-click, shift(1) makes it strictly prior
        by_user = lambda s: s.groupby(g["user_id"])  # noqa: E731
        last_click = by_user(
            by_user(click_ts).cummax().groupby(g["user_id"]).ffill()
        ).shift(1)
        purch = g["event_type"] == "purchase"
        attr = (
            purch
            & last_click.notna()
            & (g["ts_us"] - last_click <= ATTRIBUTION_WINDOW_US)
        )
        out = pd.DataFrame(
            {
                "day": (g.loc[purch, "ts_us"] // 86_400_000_000).astype(
                    "int64"
                ),
                "attr": attr[purch].astype("int64"),
            }
        )
        p = out.groupby("day", as_index=False).agg(
            n_purchases=("attr", "size"), n_attributed=("attr", "sum")
        )
        p["n_purchases"] = p["n_purchases"].astype("int64")
        p["n_attributed"] = p["n_attributed"].astype("int64")
        return p

    return bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id", "event_type"],
        )
        .map_batches(prep, batch_format="pandas")
        .groupby("bucket")
        .map_groups(attribute, batch_format="pandas"),
        keys=["day"],
        aggs={
            "n_purchases": ("n_purchases", "sum"),
            "n_attributed": ("n_attributed", "sum"),
        },
    )


def _rank_assign(
    ds: rd.Dataset, value_col: str, id_col: str
) -> rd.Dataset:
    """(id, rank): exact ROW_NUMBER() OVER (ORDER BY value, id) for a
    Dataset of unique ids — ``_ntile_assign`` minus the tile fold:
    range partition on value, per-bucket counts → exclusive prefix
    bases, in-bucket stable sort adds the offset. Never a global sort
    materialization."""
    import numpy as np
    import ray

    from suckit_ray.stages.agg import bucket_prefix_bases, default_buckets

    B = default_buckets()
    splits = _train_rank_splits(ds, B, id_col=id_col, value_col=value_col)
    if splits is None:
        return rd.from_pandas(
            pd.DataFrame(
                {
                    id_col: pd.array([], dtype="int64"),
                    "rank": pd.array([], dtype="int64"),
                }
            )
        )
    splits_ref = ray.put(splits)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        sp = ray.get(splits_ref)
        out = df[[id_col, value_col]].copy()
        out["bucket"] = np.searchsorted(
            sp, df[value_col].to_numpy(), side="right"
        ).astype("int64")
        return out

    bucketed = ds.map_batches(bucketize, batch_format="pandas").materialize()
    bases_ref = bucket_prefix_bases(bucketed, "bucket")

    def to_ranks(g: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(bases_ref).get(int(g["bucket"].iloc[0]), 0)
        g = g.sort_values([value_col, id_col], kind="mergesort")
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                "rank": (base + np.arange(1, len(g) + 1)).astype("int64"),
            }
        )

    return bucketed.groupby("bucket").map_groups(
        to_ranks, batch_format="pandas"
    )


def events_spearman(sf_dir: str) -> pa.Table:
    """One-row (n_users, rho_micro): Spearman rank correlation between
    each user's event COUNT and total VALUE — the monotone-dependence
    check (Pearson on ranks; robust to the value distribution's
    shape). Ranks are ROW_NUMBER over (metric, user_id) — the
    deterministic tie-break sidesteps fractional tie-averaging, and
    rho = 1 − 6Σd²/(n(n²−1)) becomes ONE trunc-division in unbounded
    Python ints (oracle: HUGEINT — Σd² alone passes int64 near 2M
    users).

    Plan: one user-hash co-group builds the O(users) aggregate, two
    ``_rank_assign`` passes (range partition + prefix bases — never a
    global sort materialization), one user co-group zips the ranks
    and folds per-bucket Σd² partials as decimal strings (exact past
    int64), the driver sums O(buckets) ints."""
    from suckit_ray.stages.agg import bucketed_groupby_agg, default_buckets

    B = default_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "user": df["user_id"].astype("int64"),
                    "c": to_cents(df["value"]),
                }
            )
            .groupby("user", as_index=False)
            .agg(n_ev=("c", "size"), sum_c=("c", "sum"))
        )

    agg = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "value"]
        ).map_batches(partial, batch_format="pandas"),
        keys=["user"],
        aggs={"n_ev": ("n_ev", "sum"), "sum_c": ("sum_c", "sum")},
    ).materialize()  # two rank passes consume it

    rx = _rank_assign(agg, "n_ev", id_col="user")
    ry = _rank_assign(agg, "sum_c", id_col="user")

    def tag(rank_ds: rd.Dataset, which: int) -> rd.Dataset:
        def f(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user": df["user"].astype("int64"),
                    "which": np.full(len(df), which, dtype="int64"),
                    "rank": df["rank"].astype("int64"),
                    "ub": (df["user"].astype("int64") % B).astype("int64"),
                }
            )

        return rank_ds.map_batches(f, batch_format="pandas")

    def d2_partial(g: pd.DataFrame) -> pd.DataFrame:
        w = g.pivot(index="user", columns="which", values="rank")
        d = w[0].to_numpy().astype(object) - w[1].to_numpy().astype(object)
        s = sum(int(x) * int(x) for x in d)  # exact past int64
        return pd.DataFrame({"n": [len(w)], "d2": [str(s)]})

    parts = (
        tag(rx, 0)
        .union(tag(ry, 1))
        .groupby("ub")
        .map_groups(d2_partial, batch_format="pandas")
        .to_pandas()  # O(buckets) rows
    )
    n = int(parts["n"].sum()) if len(parts) else 0
    d2 = sum(int(x) for x in parts["d2"]) if len(parts) else 0
    den = n * (n * n - 1)
    rho = _trunc_div(1_000_000 * (den - 6 * d2), den) if den else 0
    return pa.table(
        {
            "n_users": pa.array([n], pa.int64()),
            "rho_micro": pa.array([rho], pa.int64()),
        }
    )


def events_value_median_cont(sf_dir: str) -> pa.Table:
    """(event_type, n, median_halfcents): per-type INTERPOLATED median
    (SQL PERCENTILE_CONT(0.5) / quantile_cont) carried exactly — the
    midpoint of the two middle cents is an integer in HALF-cent units
    (2·quantile_cont is exactly representable: cent sums sit far below
    2^53, and /2 is a power-of-two float division), so the
    interpolation rank rule gets its own oracle next to the
    quantile_disc family.

    Scale shape: the shared one-exchange (type, cent) histogram;
    the rank walk closes group-locally."""
    import numpy as np

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"event_type": df["event_type"], "value_c": to_cents(df["value"])}
        )

    hist = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        ).map_batches(cents, batch_format="pandas"),
        keys=["event_type", "value_c"],
        aggs={"n": ("value_c", "count")},
    )

    def type_median(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("value_c")
        counts = g["n"].to_numpy().astype("int64")
        values = g["value_c"].to_numpy().astype("int64")
        cum = np.cumsum(counts)
        n = int(cum[-1])
        if n % 2 == 1:
            lo = hi = int(values[np.searchsorted(cum, (n + 1) // 2)])
        else:
            lo = int(values[np.searchsorted(cum, n // 2)])
            hi = int(values[np.searchsorted(cum, n // 2 + 1)])
        return pd.DataFrame(
            [(g["event_type"].iloc[0], n, lo + hi)],
            columns=["event_type", "n", "median_halfcents"],
        )

    out = (
        hist.groupby("event_type")
        .map_groups(type_median, batch_format="pandas")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"].tolist(), pa.string()),
            "n": pa.array([int(x) for x in out["n"]], pa.int64()),
            "median_halfcents": pa.array(
                [int(x) for x in out["median_halfcents"]], pa.int64()
            ),
        }
    )


BURST_GAMMA_MICRO = 1_000_000  # 0->1 transition cost (ln-space micronats)


def events_bursts(sf_dir: str) -> rd.Dataset:
    """(event_type, day, x, burst): Kleinberg-style burst detection
    (Kleinberg KDD'02, public — the 2-state batch automaton) over each
    type's gap-filled daily event counts: state 0 emits at the base
    rate λ₀ = total/ndays, state 1 at λ₁ = 2λ₀, entering the burst
    state costs γ. The optimal state path is a MIN-PLUS VITTERBI —
    the dynamic-programming shape nothing else in the repo exercises
    (scans close to prefix forms; EWMA is a fold; this needs argmin
    BACKTRACE through stored decisions).

    Exactness: Poisson negative log-likelihoods lose their
    state-independent ln(x!) term, so per-day costs are the integers
    A_s − x·B_s with A_s = floor(10⁶·λ_s), B_s = floor(10⁶·ln λ_s) —
    both floors of the SAME double expression in both engines — and
    the whole DP is integer min-plus with ties preferring state 0.
    The oracle replays the forward pass in a recursive CTE that
    accumulates the backpointer string, then a second recursive CTE
    walks the string backwards — the full Viterbi in SQL.

    Scale shape: the gapfill/CUSUM recipe — two-phase daily counts,
    O(blocks) day bounds, per-type series bounded by the CALENDAR;
    the per-group DP loop is O(span days), the honestly-sequential
    class events_ewma established."""
    import math

    import ray

    from suckit_ray.stages.agg import bucketed_groupby_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        day = us // US_PER_DAY
        day = day + ((us < 0) & (day * US_PER_DAY != us))  # trunc like //
        return (
            pd.DataFrame({"event_type": df["event_type"], "day": day})
            .groupby(["event_type", "day"], as_index=False)
            .size()
            .rename(columns={"size": "x"})
        )

    daily = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
        ).map_batches(partial, batch_format="pandas"),
        keys=["event_type", "day"],
        aggs={"x": ("x", "sum")},
    ).materialize()  # feeds the bounds scan AND the per-type groups

    span = _global_day_span(daily)
    if span is None:
        return rd.from_arrow(
            pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "day": pa.array([], pa.int64()),
                    "x": pa.array([], pa.int64()),
                    "burst": pa.array([], pa.int64()),
                }
            )
        )
    span_ref = ray.put(span)

    def viterbi_group(g: pd.DataFrame) -> pd.DataFrame:
        lo, hi = ray.get(span_ref)
        days = np.arange(lo, hi + 1, dtype="int64")
        xs = (
            g.set_index("day")["x"]
            .reindex(days)
            .fillna(0)
            .astype("int64")
            .to_numpy()
        )
        n = len(days)
        total = int(xs.sum())
        lam0 = float(total) / n  # CAST(total AS DOUBLE)/ndays, verbatim
        lam1 = 2.0 * lam0
        A0, B0 = math.floor(1e6 * lam0), math.floor(1e6 * math.log(lam0))
        A1, B1 = math.floor(1e6 * lam1), math.floor(1e6 * math.log(lam1))
        G = BURST_GAMMA_MICRO
        c0 = A0 - int(xs[0]) * B0
        c1 = G + A1 - int(xs[0]) * B1
        bps: list[tuple[int, int]] = []
        for t in range(1, n):
            bp0 = 0 if c0 <= c1 else 1
            bp1 = 0 if c0 + G <= c1 else 1
            n0 = (A0 - int(xs[t]) * B0) + min(c0, c1)
            n1 = (A1 - int(xs[t]) * B1) + min(c0 + G, c1)
            bps.append((bp0, bp1))
            c0, c1 = n0, n1
        s = 0 if c0 <= c1 else 1
        states = [s]
        for t in range(n - 1, 0, -1):
            s = bps[t - 1][s]
            states.append(s)
        states.reverse()
        return pd.DataFrame(
            {
                "event_type": g["event_type"].iloc[0],
                "day": days,
                "x": xs,
                "burst": pd.array(states, dtype="int64"),
            }
        )

    return daily.groupby("event_type").map_groups(
        viterbi_group, batch_format="pandas"
    )


ACF_MAX_LAG = 7  # lags 1..7 — one week of daily autocorrelation


def events_acf(sf_dir: str) -> rd.Dataset:
    """(event_type, lag, n_days, acf2_micro): the autocorrelation
    function of each type's GAP-FILLED daily event counts at lags
    1..7 — the seasonality probe (a weekly cycle shows as a lag-7
    peak) every forecasting stage (ewma/holt/bursts) sits on top of.

    Exactness: Pearson r needs a square root, which no integer
    algebra reproduces — so the reported statistic is the SIGNED
    SQUARED correlation in micro units,

        acf2_micro = sign(num) · (num² · 1e6) // (denx · deny)
        num  = n·Σxy − Σx·Σy
        denx = n·Σx² − (Σx)²,  deny = n·Σy² − (Σy)²

    (x = counts[:-lag], y = counts[lag:]): the numerator square makes
    floor == trunc, so Python `//` and DuckDB `//` agree, and the
    whole closed form is exact in unbounded Python ints / HUGEINT
    (the oracle holds to ~1e9 events/day × 1e3 days; the engine is
    unbounded). Constant or too-short series → 0. The same
    sign·square trick events_regression/spearman use.

    Plan: the gapfill two-phase (type, day) count; the global day
    span broadcast; each type's series folds group-locally (the
    calendar-bounded-series argument of ewma/holt/bursts — days, not
    events, bound the group)."""
    import ray

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        day = us // US_PER_DAY
        day = day + ((us < 0) & (day * US_PER_DAY != us))
        return (
            pd.DataFrame(
                {"event_type": df["event_type"], "day": day.astype("int64")}
            )
            .groupby(["event_type", "day"], as_index=False)
            .agg(n=("day", "size"))
        )

    daily = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
        ).map_batches(partial, batch_format="pandas"),
        keys=["event_type", "day"],
        aggs={"n": ("n", "sum")},
    ).materialize()  # feeds the bounds scan AND the per-type groups

    span = _global_day_span(daily)
    empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "lag": pa.array([], pa.int64()),
            "n_days": pa.array([], pa.int64()),
            "acf2_micro": pa.array([], pa.int64()),
        }
    )
    if span is None:
        return rd.from_arrow(empty)
    span_ref = ray.put(span)

    def acf_group(g: pd.DataFrame) -> pd.DataFrame:
        lo, hi = ray.get(span_ref)
        days = np.arange(lo, hi + 1, dtype="int64")
        x = (
            g.set_index("day")["n"]
            .reindex(days)
            .fillna(0)
            .astype("int64")
            .to_numpy()
        )
        T = len(x)
        lags, ns, vals = [], [], []
        for k in range(1, ACF_MAX_LAG + 1):
            n = T - k
            if n < 1:
                continue  # no pairs exist — the oracle emits no row
            a, b = x[:n], x[k:]
            sx, sy = int(a.sum()), int(b.sum())
            sxy = int((a * b).sum())
            sxx = int((a * a).sum())
            syy = int((b * b).sum())
            num = n * sxy - sx * sy
            den = (n * sxx - sx * sx) * (n * syy - sy * sy)
            r2 = 0 if den == 0 else (
                (-1 if num < 0 else 1) * ((num * num * 1_000_000) // den)
            )
            lags.append(k)
            ns.append(n)
            vals.append(r2)
        return pd.DataFrame(
            {
                "event_type": g["event_type"].iloc[0],
                "lag": pd.array(lags, dtype="int64"),
                "n_days": pd.array(ns, dtype="int64"),
                "acf2_micro": pd.array(vals, dtype="int64"),
            }
        )

    return daily.groupby("event_type").map_groups(
        acf_group, batch_format="pandas"
    )


def events_ks_test(sf_dir: str) -> rd.Dataset:
    """(type_a, type_b, n_a, n_b, ks_micro): the two-sample
    Kolmogorov–Smirnov statistic between every PAIR of event types'
    cent-value distributions — the distribution-drift monitor a
    training-data pipeline runs between snapshots/sources before
    mixing them. Carried exactly: on the merged value grid,

        ks_num   = max_v |n_b·cum_a(v) − n_a·cum_b(v)|
        ks_micro = (1e6 · ks_num) // (n_a · n_b)

    — cross-multiplying the two ECDFs clears both denominators, so
    the max runs over integers and the single final division is the
    only floor (int64 holds to ~3e9 events per pair at micro scale;
    the oracle's HUGEINT far beyond).

    Plan: the ONE (type, cent) histogram exchange the whole
    quantile/MAD/winsorize family shares; the tiny distinct-type set
    (O(types), the mutual-information idiom) broadcasts; each
    histogram row replicates to its type's pairs (|types|−1 copies of
    a HISTOGRAM row, never an event row); one pair-bucketed co-group
    pivots the merged grid and takes the max in one vectorized
    cumsum pass."""
    import ray

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"event_type": df["event_type"], "value_c": to_cents(df["value"])}
        )

    hist = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        ).map_batches(cents, batch_format="pandas"),
        keys=["event_type", "value_c"],
        aggs={"n": ("value_c", "count")},
    ).materialize()  # feeds the type scan AND the pair groups

    types = sorted(
        r["event_type"]
        for r in bucketed_groupby_agg(
            hist.map_batches(
                lambda df: df[["event_type"]], batch_format="pandas"
            ),
            keys=["event_type"],
            aggs={"n": ("event_type", "count")},
        ).iter_rows()
    )
    empty = pa.table(
        {
            "type_a": pa.array([], pa.string()),
            "type_b": pa.array([], pa.string()),
            "n_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
            "ks_micro": pa.array([], pa.int64()),
        }
    )
    if len(types) < 2:
        return rd.from_arrow(empty)
    types_ref = ray.put(types)

    def replicate(df: pd.DataFrame) -> pd.DataFrame:
        ts = ray.get(types_ref)
        outs = []
        for u in ts:
            m = df[df["event_type"] != u]
            if not len(m):
                continue
            t = m["event_type"].to_numpy()
            first = t < u
            outs.append(
                pd.DataFrame(
                    {
                        "type_a": np.where(first, t, u),
                        "type_b": np.where(first, u, t),
                        "value_c": m["value_c"].astype("int64"),
                        "na": np.where(first, m["n"].astype("int64"), 0),
                        "nb": np.where(first, 0, m["n"].astype("int64")),
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {
                    "type_a": pd.array([], dtype="object"),
                    "type_b": pd.array([], dtype="object"),
                    "value_c": pd.array([], dtype="int64"),
                    "na": pd.array([], dtype="int64"),
                    "nb": pd.array([], dtype="int64"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    def ks_group(g: pd.DataFrame) -> pd.DataFrame:
        ta, tb = g["type_a"].iloc[0], g["type_b"].iloc[0]
        h = (
            g.groupby("value_c", as_index=False)
            .agg(na=("na", "sum"), nb=("nb", "sum"))
            .sort_values("value_c")
        )
        cuma = h["na"].to_numpy().astype("int64").cumsum()
        cumb = h["nb"].to_numpy().astype("int64").cumsum()
        n_a, n_b = int(cuma[-1]), int(cumb[-1])
        ks_num = int(np.abs(n_b * cuma - n_a * cumb).max())
        return pd.DataFrame(
            {
                "type_a": [ta],
                "type_b": [tb],
                "n_a": pd.array([n_a], dtype="int64"),
                "n_b": pd.array([n_b], dtype="int64"),
                "ks_micro": pd.array(
                    [(1_000_000 * ks_num) // (n_a * n_b)], dtype="int64"
                ),
            }
        )

    return (
        hist.map_batches(replicate, batch_format="pandas")
        .groupby(["type_a", "type_b"])
        .map_groups(ks_group, batch_format="pandas")
    )


def events_gini(sf_dir: str) -> pa.Table:
    """(event_type, n, total_c, gini_micro): Gini coefficient of each
    event type's cent-value distribution — the inequality/concentration
    audit a data pipeline runs per metric (a metric whose mass collapses
    onto a few events is a skew hazard for any per-key shuffle). From
    the exact (type, cent) histogram, with values sorted ascending and
    1-indexed positions, the classic

        G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx)

    is carried exactly: within a run of c tied values starting after
    cumulative count s, Σ i·x over the run is v·(c·s + c(c+1)/2) —
    order within ties cancels, so the statistic is well defined on the
    histogram. One final floored division to micro units mirrors
    DuckDB ``//`` (python ints in the fold; the oracle uses HUGEINT).

    Scale shape: the ONE (type, cent) histogram exchange the whole
    quantile/entropy/MAD family shares; the per-type fold is
    O(distinct cents), never O(events)."""

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"event_type": df["event_type"], "value_c": to_cents(df["value"])}
        )

    hist = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        ).map_batches(cents, batch_format="pandas"),
        keys=["event_type", "value_c"],
        aggs={"n": ("value_c", "count")},
    )

    def type_gini(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("value_c")
        v = [int(x) for x in g["value_c"]]
        c = [int(x) for x in g["n"]]
        n = sum(c)
        tot = sum(vi * ci for vi, ci in zip(v, c))
        s = 0
        wsum = 0
        for vi, ci in zip(v, c):
            wsum += vi * (ci * s + ci * (ci + 1) // 2)
            s += ci
        gini = (
            (1_000_000 * (2 * wsum - (n + 1) * tot)) // (n * tot) if tot else 0
        )
        return pd.DataFrame(
            [(g["event_type"].iloc[0], n, tot, gini)],
            columns=["event_type", "n", "total_c", "gini_micro"],
        )

    out = (
        hist.groupby("event_type")
        .map_groups(type_gini, batch_format="pandas")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"].tolist(), pa.string()),
            "n": pa.array([int(x) for x in out["n"]], pa.int64()),
            "total_c": pa.array([int(x) for x in out["total_c"]], pa.int64()),
            "gini_micro": pa.array(
                [int(x) for x in out["gini_micro"]], pa.int64()
            ),
        }
    )


def events_seasonality(sf_dir: str) -> pa.Table:
    """(event_type, n, cnt_d1..cnt_d7, chi2_uniform_micro): the ISO-
    weekday seasonality profile per event type plus Pearson's
    chi-square against a uniform weekday law — the day-of-week
    periodicity audit run before treating a stream as stationary.
    With o_d the count on isodow d (zero-observation days INCLUDED)
    and e = n/7, the statistic

        chi2 = Σ_d (o_d − e)²/e  =  Σ_d (7·o_d − n)² / (7·n)

    is cleared to integers by cross-multiplying, so the sum runs over
    exact squares and the single floored division to micro units is
    the only rounding (mirrors DuckDB ``//``; HUGEINT oracle).

    Scale shape: per-batch partial (type, isodow) counts collapse the
    exchange to ≤ 7·|types| rows per block — the mutual-information
    contingency idiom; the fold is driver-free via one tiny groupby."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        p = (
            pd.DataFrame(
                {
                    "event_type": df["event_type"],
                    "isodow": (df["ts"].dt.dayofweek + 1).astype("int64"),
                }
            )
            .groupby(["event_type", "isodow"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return p

    cnt = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
        ).map_batches(partial, batch_format="pandas"),
        keys=["event_type", "isodow"],
        aggs={"n": ("n", "sum")},
    )

    def type_profile(g: pd.DataFrame) -> pd.DataFrame:
        o = [0] * 7
        for d, c in zip(g["isodow"], g["n"]):
            o[int(d) - 1] = int(c)
        n = sum(o)
        chi_num = sum((7 * od - n) ** 2 for od in o)
        row = {
            "event_type": g["event_type"].iloc[0],
            "n": n,
            **{f"cnt_d{d}": o[d - 1] for d in range(1, 8)},
            "chi2_uniform_micro": (1_000_000 * chi_num) // (7 * n) if n else 0,
        }
        return pd.DataFrame([row])

    out = (
        cnt.groupby("event_type")
        .map_groups(type_profile, batch_format="pandas")
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    cols = {"event_type": pa.array(out["event_type"].tolist(), pa.string())}
    for c in ["n", *[f"cnt_d{d}" for d in range(1, 8)], "chi2_uniform_micro"]:
        cols[c] = pa.array([int(x) for x in out[c]], pa.int64())
    return pa.table(cols)


def customer_hhi(sf_dir: str) -> pa.Table:
    """(n_name, n_customers, total_c, hhi_micro): Herfindahl–Hirschman
    revenue-concentration index per nation over customers with at
    least one order — the market-concentration audit (HHI → 1e6/n for
    a perfectly even market, → 1e6 for a monopoly). With x_i the
    integer-cent order total of customer i and T = Σx,

        HHI_micro = floor(1e6 · Σ x_i² / T²)

    carried in python ints (Σx² overflows int64 at scale; the oracle
    uses HUGEINT) with ONE final floored division mirroring ``//``.

    Plan: per-batch partial custkey totals feed the custkey-hash
    bucketed co-group that ALSO receives the customer table's
    (custkey, nationkey) rows — the shuffle-join-free idiom q13 uses,
    exact because o_custkey is a foreign key; each bucket emits
    per-nation partial (Σx², Σx, count) triples as decimal STRINGS so
    the tiny per-nation merge stays exact; the 25-row nation name map
    attaches driver-side."""
    import pyarrow.parquet as pq_

    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def order_partial(df: pd.DataFrame) -> pd.DataFrame:
        p = (
            pd.DataFrame(
                {
                    "custkey": df["o_custkey"].astype("int64"),
                    "cents": to_cents(df["o_totalprice"]),
                }
            )
            .groupby("custkey", as_index=False)["cents"]
            .sum()
        )
        p["nationkey"] = np.int64(-1)
        p["bucket"] = (p["custkey"] % B).astype("int64")
        return p[["bucket", "custkey", "cents", "nationkey"]]

    def cust_partial(df: pd.DataFrame) -> pd.DataFrame:
        p = pd.DataFrame(
            {
                "custkey": df["c_custkey"].astype("int64"),
                "cents": np.zeros(len(df), dtype="int64"),
                "nationkey": df["c_nationkey"].astype("int64"),
            }
        )
        p["bucket"] = (p["custkey"] % B).astype("int64")
        return p[["bucket", "custkey", "cents", "nationkey"]]

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("custkey").agg(
            cents=("cents", "sum"), nationkey=("nationkey", "max")
        )
        per = per[per["cents"] > 0]
        rows = []
        for nk, sub in per.groupby("nationkey"):
            xs = [int(x) for x in sub["cents"]]
            rows.append(
                (
                    int(nk),
                    str(sum(x * x for x in xs)),
                    str(sum(xs)),
                    len(xs),
                )
            )
        return pd.DataFrame(
            rows, columns=["nationkey", "sq_str", "tot_str", "n_cust"]
        )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(order_partial, batch_format="pandas")
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(cust_partial, batch_format="pandas")

    parts = (
        orders.union(cust)
        .groupby("bucket")
        .map_groups(bucket_fold, batch_format="pandas")
        .to_pandas()
    )

    names = {
        int(k): str(v)
        for k, v in zip(
            *(
                pq_.read_table(
                    f"{sf_dir}/nation.parquet",
                    columns=["n_nationkey", "n_name"],
                )
                .to_pydict()
                .values()
            )
        )
    }
    rows = []
    for nk, sub in parts.groupby("nationkey"):
        sq = sum(int(s) for s in sub["sq_str"])
        tot = sum(int(s) for s in sub["tot_str"])
        rows.append(
            (
                names[int(nk)],
                int(sub["n_cust"].sum()),
                tot,
                (1_000_000 * sq) // (tot * tot) if tot else 0,
            )
        )
    rows.sort()
    return pa.table(
        {
            "n_name": pa.array([r[0] for r in rows], pa.string()),
            "n_customers": pa.array([r[1] for r in rows], pa.int64()),
            "total_c": pa.array([r[2] for r in rows], pa.int64()),
            "hhi_micro": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def lineitem_assoc_rules(
    sf_dir: str, minsup: int = FREQUENT_PAIR_MINSUP
) -> rd.Dataset:
    """(antecedent, consequent, support, conf_micro, lift_micro):
    directed association rules over the frequent pairs — the A-priori
    rule-generation pass (Agrawal & Srikant 1994): each qualifying
    unordered pair {A,B} emits BOTH A→B and B→A with

        conf_micro = floor(10^6 · c(A,B) / c(antecedent))
        lift_micro = floor(10^6 · N_orders · c(A,B) / (c(A)·c(B)))

    (lift is direction-symmetric; confidence is not — that asymmetry
    is the whole point of the rule form). Exact python-int closes over
    the sparse thresholded pairs only; oracle in HUGEINT.

    Plan: shares ``_basket_counts``'s single orderkey co-group +
    bucketed sum with ``lineitem_frequent_pairs``; the rule close is
    a per-batch map over already-thresholded pairs."""
    counts, n_orders, item_counts = _basket_counts(sf_dir)

    def close_rules(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["part_b"] >= 0) & (df["support"] >= minsup)]
        rows = []
        for a, b, s in zip(df["part_a"], df["part_b"], df["support"]):
            a, b, s = int(a), int(b), int(s)
            lift = (1_000_000 * n_orders * s) // (
                item_counts[a] * item_counts[b]
            )
            for ant, con in ((a, b), (b, a)):
                rows.append(
                    (ant, con, s, (1_000_000 * s) // item_counts[ant], lift)
                )
        return pd.DataFrame(
            rows,
            columns=[
                "antecedent",
                "consequent",
                "support",
                "conf_micro",
                "lift_micro",
            ],
        ).astype("int64")

    return counts.map_batches(close_rules, batch_format="pandas")


def orders_cohort_retention(sf_dir: str) -> rd.Dataset:
    """(cohort_month, month_offset, n_customers): the classic cohort
    retention triangle — customers grouped by their FIRST order month,
    counted in every later month they ordered again (offset 0 row =
    cohort size). The churn/stickiness readout every growth dashboard
    opens with; counts are exact integers so the frame hash-matches
    SQL directly.

    Plan: per-batch partial dedup to (custkey, month) rows, then ONE
    custkey-hash co-group per customer computes its first month and
    month offsets group-locally ((year·12+month) arithmetic — no
    calendar library), emitting (cohort_month, offset) partials; one
    bucketed sum finishes. The exchange carries at most one row per
    (custkey, active month) — already-aggregated, never event rows."""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["o_orderdate"]
        out = pd.DataFrame(
            {
                "custkey": df["o_custkey"].astype("int64"),
                "moidx": (ts.dt.year * 12 + (ts.dt.month - 1)).astype(
                    "int64"
                ),
            }
        ).drop_duplicates()
        out["bucket"] = (out["custkey"] % B).astype("int64")
        return out

    def per_customer(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["custkey", "moidx"])
        first = g.groupby("custkey")["moidx"].transform("min")
        cohort = first.to_numpy().astype("int64")
        off = (g["moidx"].to_numpy().astype("int64") - cohort).astype(
            "int64"
        )
        out = (
            pd.DataFrame({"cohort_moidx": cohort, "month_offset": off})
            .groupby(["cohort_moidx", "month_offset"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        out["n"] = out["n"].astype("int64")
        return out

    agg = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
        )
        .map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(per_customer, batch_format="pandas"),
        keys=["cohort_moidx", "month_offset"],
        aggs={"n_customers": ("n", "sum")},
    )

    def fmt(df: pd.DataFrame) -> pd.DataFrame:
        mi = df["cohort_moidx"].to_numpy().astype("int64")
        return pd.DataFrame(
            {
                "cohort_month": [
                    f"{y}-{m:02d}" for y, m in zip(mi // 12, mi % 12 + 1)
                ],
                "month_offset": df["month_offset"].astype("int64").to_numpy(),
                "n_customers": df["n_customers"].astype("int64").to_numpy(),
            }
        )

    return agg.map_batches(fmt, batch_format="pandas")


def events_theilsen(sf_dir: str) -> rd.Dataset:
    """(event_type, n_days, n_pairs, slope_micro): the Theil–Sen
    robust trend estimator over each type's daily cent sums — the
    outlier-immune alternative to ``events_regression``'s OLS slope
    (breakdown point 29%; Theil 1950 / Sen 1968, public). Defined
    here EXACTLY as the lower median of the per-pair truncated micro
    slopes:

        s_ij = trunc(10^6 · (y_j − y_i) / (day_j − day_i)),  i < j
        slope_micro = the rank-⌈k/2⌉ order statistic of {s_ij}

    — each pairwise division truncates toward zero exactly as DuckDB
    ``//`` does (slopes go negative on declining series), and the
    lower-median rank rule keeps the result an integer, so the frame
    hash-matches SQL.

    Plan: the daily (type, day, cents) sums are the one shared
    exchange of the ewma/holt/acf family; the O(d²) pair sweep runs
    group-locally per type over CALENDAR-BOUNDED series (d days —
    ~10³ days even at decade scale → ≤5·10⁵ pairs, vectorized
    int64 numpy), never over events."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "day": (us // 86_400_000_000).astype("int64"),
                "cents": to_cents(df["value"]),
            }
        )

    daily = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
        ).map_batches(partial, batch_format="pandas"),
        keys=["event_type", "day"],
        aggs={"x_cents": ("cents", "sum")},
    )

    def ts_group(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for etype, grp in g.groupby("event_type"):
            grp = grp.sort_values("day", kind="mergesort")
            d = grp["day"].to_numpy().astype("int64")
            y = grp["x_cents"].to_numpy().astype("int64")
            i, j = np.triu_indices(len(d), k=1)
            if len(i) == 0:
                out.append(
                    pd.DataFrame(
                        [(etype, len(d), 0, 0)],
                        columns=[
                            "event_type",
                            "n_days",
                            "n_pairs",
                            "slope_micro",
                        ],
                    )
                )
                continue
            num = 1_000_000 * (y[j] - y[i])
            den = d[j] - d[i]
            q = num // den
            # numpy // floors; DuckDB // truncates toward zero
            q[(q < 0) & (q * den != num)] += 1
            q.sort()
            med = int(q[(len(q) - 1) // 2])
            out.append(
                pd.DataFrame(
                    [(etype, len(d), len(q), med)],
                    columns=[
                        "event_type",
                        "n_days",
                        "n_pairs",
                        "slope_micro",
                    ],
                )
            )
        return pd.concat(out, ignore_index=True)

    return daily.groupby("event_type").map_groups(
        ts_group, batch_format="pandas"
    )


def lineitem_group_regression(sf_dir: str) -> pa.Table:
    """(l_returnflag, l_linestatus, n, slope_micro, intercept_c):
    per-group ordinary-least-squares fit of extended price (cents, y)
    on discount (percent units, x) — the grouped-regression shape a
    pipeline runs to audit pricing linearity per segment (the GROUPED
    sibling of ``events_regression``'s single global fit). Exact in
    both engines: the closed forms

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)

    are carried as integer cross-products; the single division per
    statistic is floored on |num| with the sign applied after (the
    acf/spearman idiom — matches DuckDB's truncating ``//``), scaled
    micro for the slope and plain cents for the intercept. Degenerate
    groups (constant x) report 0/0.

    Plan: ONE two-phase (flag, status) aggregation carries all five
    sufficient statistics as int64 partials (x ≤ 10 keeps Σxy far
    from overflow at any SF); the ≤ R×S closed-form evaluations run
    driver-side on Python ints, so n·Σxy never touches int64."""
    agg = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_returnflag",
                "l_linestatus",
                "l_discount",
                "l_extendedprice",
            ],
        ).map_batches(
            lambda df: pd.DataFrame(
                {
                    "l_returnflag": df["l_returnflag"],
                    "l_linestatus": df["l_linestatus"],
                    "n": np.ones(len(df), dtype="int64"),
                    "sx": to_cents(df["l_discount"]),
                    "sy": to_cents(df["l_extendedprice"]),
                    "sxy": to_cents(df["l_discount"])
                    * to_cents(df["l_extendedprice"]),
                    "sxx": to_cents(df["l_discount"]) ** 2,
                }
            )
            .groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .sum(),
            batch_format="pandas",
        ),
        keys=["l_returnflag", "l_linestatus"],
        aggs={
            "n": ("n", "sum"),
            "sx": ("sx", "sum"),
            "sy": ("sy", "sum"),
            "sxy": ("sxy", "sum"),
            "sxx": ("sxx", "sum"),
        },
    )

    rows = sorted(
        agg.iter_rows(),
        key=lambda r: (r["l_returnflag"], r["l_linestatus"]),
    )
    flags, stats, ns, slopes, inters = [], [], [], [], []
    for r in rows:
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        sxy, sxx = int(r["sxy"]), int(r["sxx"])
        den = n * sxx - sx * sx
        num_s = n * sxy - sx * sy
        num_i = sy * sxx - sx * sxy
        slope = (
            0
            if den == 0
            else (1 if num_s >= 0 else -1) * ((abs(num_s) * 1_000_000) // den)
        )
        inter = (
            0
            if den == 0
            else (1 if num_i >= 0 else -1) * (abs(num_i) // den)
        )
        flags.append(r["l_returnflag"])
        stats.append(r["l_linestatus"])
        ns.append(n)
        slopes.append(slope)
        inters.append(inter)
    return pa.table(
        {
            "l_returnflag": pa.array(flags, pa.string()),
            "l_linestatus": pa.array(stats, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "slope_micro": pa.array(slopes, pa.int64()),
            "intercept_c": pa.array(inters, pa.int64()),
        }
    )


def orders_abc_class(sf_dir: str) -> rd.Dataset:
    """(custkey, revenue_c, rn, cum_c, abc_class): ABC inventory-style
    classification of customers by revenue — class A while the
    running revenue share (ordered revenue DESC, custkey ASC) stays
    ≤ 80%, B through 95%, C beyond; the per-entity assignment the
    80/20 REPORT (``orders_pareto``) summarizes. Thresholds compare
    exact integers (100·cum ≤ 80·total / ≤ 95·total) — no share is
    ever materialized as a float.

    Plan — the shared range-partition recipe (``orders_pareto`` /
    ``events_value_rank``): per-custkey revenue from one bucketed
    co-group; sample-trained splits on the NEGATED revenue range-
    partition the customers; per-bucket (count, sum) partials give
    O(buckets) driver exclusive prefixes; each bucket then labels its
    rows with one local sorted cumsum on top of its bases. No global
    sort materializes and the output stays a Dataset — rows never
    converge on the driver. Equal revenues always land in one bucket
    (split points are values), so the (rev DESC, custkey) tie order
    is globally exact."""
    import ray

    rev = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        ).map_batches(
            lambda df: pd.DataFrame(
                {
                    "cust": df["o_custkey"].astype("int64"),
                    "rev": to_cents(df["o_totalprice"]),
                }
            )
            .groupby("cust", as_index=False)
            .agg(rev=("rev", "sum")),
            batch_format="pandas",
        ),
        keys=["cust"],
        aggs={"rev": ("rev", "sum")},
    ).map_batches(
        lambda df: df.assign(negrev=-df["rev"].to_numpy()),
        batch_format="pandas",
    )

    empty = pa.table(
        {
            "custkey": pa.array([], pa.int64()),
            "revenue_c": pa.array([], pa.int64()),
            "rn": pa.array([], pa.int64()),
            "cum_c": pa.array([], pa.int64()),
            "abc_class": pa.array([], pa.string()),
        }
    )
    splits = _train_rank_splits(rev, 32, id_col="cust", value_col="negrev")
    if splits is None:
        return rd.from_arrow(empty)
    splits_ref = ray.put(splits)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        sp = ray.get(splits_ref)
        return df.assign(
            bucket=np.searchsorted(
                sp, df["negrev"].to_numpy(), side="right"
            ).astype("int64")
        )

    bucketed = rev.map_batches(bucketize, batch_format="pandas").materialize()
    parts = (
        bucketed.map_batches(
            lambda df: df.groupby("bucket", as_index=False).agg(
                n=("cust", "size"), s=("rev", "sum")
            ),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby("bucket")
        .sum()
        .sort_index()
    )
    total = int(parts["s"].sum())
    base_n = (parts["n"].cumsum() - parts["n"]).to_dict()  # exclusive
    base_s = (parts["s"].cumsum() - parts["s"]).to_dict()
    bases_ref = ray.put((base_n, base_s, total))

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        bn, bs, tot = ray.get(bases_ref)
        b = int(g["bucket"].iloc[0])
        g = g.sort_values(["negrev", "cust"], kind="mergesort")
        n = len(g)
        rn = int(bn[b]) + np.arange(1, n + 1, dtype="int64")
        # int64 cumsum: total cents ~2e13 at SF1; the oracle's HUGEINT
        # and a Python-int fold cover the scales beyond
        cum = int(bs[b]) + g["rev"].to_numpy().cumsum()
        cls = np.where(
            100 * cum <= 80 * tot, "A", np.where(100 * cum <= 95 * tot, "B", "C")
        )
        return pd.DataFrame(
            {
                "custkey": g["cust"].to_numpy(),
                "revenue_c": g["rev"].to_numpy(),
                "rn": rn,
                "cum_c": cum.astype("int64"),
                "abc_class": cls,
            }
        )

    return bucketed.groupby("bucket").map_groups(scan, batch_format="pandas")


def events_scd2(sf_dir: str) -> rd.Dataset:
    """(user_id, version, event_type, valid_from_us, valid_to_us): a
    Slowly-Changing-Dimension TYPE 2 build from the event log — each
    user's event_type stream, ordered by (ts, event_id), collapses
    consecutive equal values into validity intervals [valid_from,
    valid_to) with the open (current) record carrying valid_to = -1.
    This is the dimension-table maintenance pass a warehouse runs over
    a CDC feed: ``events_latest_state`` keeps only the last record;
    SCD2 keeps the full history as non-overlapping intervals.

    Shape: gaps-and-islands (change-flag cumsum) chained into a LEAD —
    both evaluated GROUP-LOCALLY inside one user-hash co-group, fully
    vectorized (shift-compare island starts, cumsum versions, shift(-1)
    interval ends). ONE shuffle carrying four small columns; nothing
    per-user reaches the driver."""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        return pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "event_type": df["event_type"],
                "us": us,
                "event_id": df["event_id"].astype("int64"),
                "bucket": (df["user_id"].astype("int64") % B),
            }
        )

    def build(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "version": pd.Series([], dtype="int64"),
                    "event_type": pd.Series([], dtype="str"),
                    "valid_from_us": pd.Series([], dtype="int64"),
                    "valid_to_us": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values(
            ["user_id", "us", "event_id"], kind="mergesort"
        ).reset_index(drop=True)
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        new_user = np.empty(len(g), dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        start = new_user.copy()
        start[1:] |= et[1:] != et[:-1]
        # version = per-user running count of island starts
        gstart = start.astype("int64").cumsum()
        base = np.maximum.accumulate(
            np.where(new_user, gstart - 1, 0)
        )  # gstart value just before each user's first island
        ver = gstart - base
        runs = g.loc[start, ["user_id", "event_type", "us"]].copy()
        runs["version"] = ver[start]
        vf = runs["us"].to_numpy()
        ru = runs["user_id"].to_numpy()
        vt = np.full(len(runs), -1, dtype="int64")
        if len(runs) > 1:
            same = ru[:-1] == ru[1:]
            vt[:-1] = np.where(same, vf[1:], -1)
        return pd.DataFrame(
            {
                "user_id": runs["user_id"].astype("int64").to_numpy(),
                "version": runs["version"].astype("int64").to_numpy(),
                "event_type": runs["event_type"].to_numpy(),
                "valid_from_us": vf,
                "valid_to_us": vt,
            }
        )

    return (
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_type", "ts", "event_id"],
        )
        .map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(build, batch_format="pandas")
    )


BOOTSTRAP_B = 200


def events_bootstrap_ci(sf_dir: str) -> pa.Table:
    """(b, mean_c): the DETERMINISTIC bootstrap distribution of the
    mean daily revenue — resample b (1..200) redraws n days (with
    replacement) from the n observed daily cent totals, picking index
    md5h60(f"{{b}}:{{j}}") % n for draw j, and reports the resampled
    mean in cents (truncating division, DuckDB ``//``). Empirical
    quantiles of this 200-row table ARE the bootstrap confidence
    interval (Efron 1979, public) — md5-derived draws make both
    engines sample identically, the ``docs_global_shuffle`` /
    ``docs_weighted_sample`` seeded-randomness trick applied to
    statistical inference.

    Plan: the daily totals come from one two-phase (day) aggregation;
    the resampling then runs on the O(days) calendar-bounded vector
    driver-side (the acf/theilsen/holt precedent — B·n index hashes
    over ≤ a few hundred days, never over events)."""
    import hashlib

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        return pd.DataFrame(
            {
                "day": (us // 86_400_000_000).astype("int64"),
                "cents": to_cents(df["value"]),
            }
        )

    daily = bucketed_groupby_agg(
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])
        .map_batches(partial, batch_format="pandas"),
        keys=["day"],
        aggs={"t": ("cents", "sum")},
    ).to_pandas()  # O(days) — calendar-bounded

    if not len(daily):
        return pa.table(
            {"b": pa.array([], pa.int64()), "mean_c": pa.array([], pa.int64())}
        )
    daily = daily.sort_values("day", kind="mergesort")
    t = daily["t"].to_numpy().astype("int64")
    n = len(t)
    bs, means = [], []
    for b in range(1, BOOTSTRAP_B + 1):
        picks = np.array(
            [
                int(hashlib.md5(f"{b}:{j}".encode()).hexdigest()[:15], 16) % n
                for j in range(n)
            ],
            dtype="int64",
        )
        s = int(t[picks].sum())
        means.append(_trunc_div(s, n))
        bs.append(b)
    return pa.table(
        {
            "b": pa.array(bs, pa.int64()),
            "mean_c": pa.array(means, pa.int64()),
        }
    )


def events_mannwhitney(sf_dir: str) -> rd.Dataset:
    """(type_a, type_b, n_a, n_b, u2_a, u2_b): the Mann-Whitney U
    rank-sum statistic between every pair of event types' cent-value
    distributions (Mann & Whitney 1947, public) — the nonparametric
    drift test that catches location shifts the KS max-gap statistic
    is less sensitive to. Ties carried EXACTLY via average ranks in
    HALF units: on the merged value grid with per-value counts c_v,
    the doubled average rank is R2_v = 2·cum_v − c_v + 1 (an integer),
    so the doubled rank-sum S2_a = Σ na_v·R2_v and

        u2_a = S2_a − n_a·(n_a + 1),   u2_b = 2·n_a·n_b − u2_a

    are exact int64 end to end (no halves ever materialize; int64
    holds to ~10^9 events per pair, the ks_test bound).

    Plan: IDENTICAL wiring to ``events_ks_test`` — the shared
    (type, cent) histogram exchange, O(types) broadcast, histogram
    rows replicated per pair, one pair co-group doing a vectorized
    cumsum — only the group fold differs."""
    import ray

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"event_type": df["event_type"], "value_c": to_cents(df["value"])}
        )

    hist = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        ).map_batches(cents, batch_format="pandas"),
        keys=["event_type", "value_c"],
        aggs={"n": ("value_c", "count")},
    ).materialize()  # feeds the type scan AND the pair groups

    types = sorted(
        r["event_type"]
        for r in bucketed_groupby_agg(
            hist.map_batches(
                lambda df: df[["event_type"]], batch_format="pandas"
            ),
            keys=["event_type"],
            aggs={"n": ("event_type", "count")},
        ).iter_rows()
    )
    empty = pa.table(
        {
            "type_a": pa.array([], pa.string()),
            "type_b": pa.array([], pa.string()),
            "n_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
            "u2_a": pa.array([], pa.int64()),
            "u2_b": pa.array([], pa.int64()),
        }
    )
    if len(types) < 2:
        return rd.from_arrow(empty)
    types_ref = ray.put(types)

    def replicate(df: pd.DataFrame) -> pd.DataFrame:
        ts = ray.get(types_ref)
        outs = []
        for u in ts:
            m = df[df["event_type"] != u]
            if not len(m):
                continue
            t = m["event_type"].to_numpy()
            first = t < u
            outs.append(
                pd.DataFrame(
                    {
                        "type_a": np.where(first, t, u),
                        "type_b": np.where(first, u, t),
                        "value_c": m["value_c"].astype("int64"),
                        "na": np.where(first, m["n"].astype("int64"), 0),
                        "nb": np.where(first, 0, m["n"].astype("int64")),
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {
                    "type_a": pd.array([], dtype="object"),
                    "type_b": pd.array([], dtype="object"),
                    "value_c": pd.array([], dtype="int64"),
                    "na": pd.array([], dtype="int64"),
                    "nb": pd.array([], dtype="int64"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    def mw_group(g: pd.DataFrame) -> pd.DataFrame:
        ta, tb = g["type_a"].iloc[0], g["type_b"].iloc[0]
        h = (
            g.groupby("value_c", as_index=False)
            .agg(na=("na", "sum"), nb=("nb", "sum"))
            .sort_values("value_c")
        )
        na = h["na"].to_numpy().astype("int64")
        nb = h["nb"].to_numpy().astype("int64")
        c = na + nb
        cum = c.cumsum()
        r2 = 2 * cum - c + 1  # doubled average rank, exact integer
        n_a, n_b = int(na.sum()), int(nb.sum())
        s2a = int((na * r2).sum())
        u2_a = s2a - n_a * (n_a + 1)
        u2_b = 2 * n_a * n_b - u2_a
        return pd.DataFrame(
            {
                "type_a": [ta],
                "type_b": [tb],
                "n_a": pd.array([n_a], dtype="int64"),
                "n_b": pd.array([n_b], dtype="int64"),
                "u2_a": pd.array([u2_a], dtype="int64"),
                "u2_b": pd.array([u2_b], dtype="int64"),
            }
        )

    return (
        hist.map_batches(replicate, batch_format="pandas")
        .groupby(["type_a", "type_b"])
        .map_groups(mw_group, batch_format="pandas")
    )


KM_HORIZON_DAYS = 3
_KM_NEVER = 1 << 62  # min-mergeable "no purchase yet" sentinel


def events_km_survival(sf_dir: str) -> pa.Table:
    """(t_days, n_risk, d_events, s_micro): the Kaplan-Meier survival
    curve for TIME TO FIRST PURCHASE (Kaplan & Meier 1958, public) —
    per user, t = first-purchase day − first-event day, right-CENSORED
    at a fixed ``KM_HORIZON_DAYS`` observation horizon (users who
    convert later, or never, are censored at the horizon: the textbook
    incomplete-observation setup). The estimator is the per-step
    integer recursion

        S_0 = 10^6;  S_i = (S_{i−1} · (n_i − d_i)) // n_i

    over ascending distinct conversion times t_i with n_i = users
    whose (event-or-censor) time ≥ t_i — censored users count while
    at risk, the deaths-before-censorings tie rule. The per-step floor
    has no closed prefix form, so like ``events_ewma`` the honest plan
    is an ordered replay over the BOUNDED distinct-time axis, and the
    oracle is a recursive CTE.

    Plan: one user-hash co-group shrinks events to per-user (first
    day, first purchase day) pairs — both are min-mergeable, with a
    large sentinel standing in for "never purchased" so batch partials
    stay a plain min; a (t, event) histogram aggregation bounds what
    the driver folds to O(horizon) rows."""
    from suckit_ray.stages.agg import bucketed_groupby_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        day = us // 86_400_000_000
        p = np.where(
            df["event_type"].to_numpy() == "purchase", day, _KM_NEVER
        )
        return (
            pd.DataFrame(
                {"user_id": df["user_id"].astype("int64"), "f": day, "p": p}
            )
            .groupby("user_id", as_index=False)
            .agg(f=("f", "min"), p=("p", "min"))
        )

    users = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
        ).map_batches(partial, batch_format="pandas"),
        keys=["user_id"],
        aggs={"f": ("f", "min"), "p": ("p", "min")},
    )

    def lifetimes(df: pd.DataFrame) -> pd.DataFrame:
        raw = (df["p"] - df["f"]).astype("int64")
        ev = (raw <= KM_HORIZON_DAYS).astype("int64")
        t = np.minimum(raw.to_numpy(), KM_HORIZON_DAYS)
        return (
            pd.DataFrame({"t": t, "ev": ev, "n": 1})
            .groupby(["t", "ev"], as_index=False)["n"]
            .sum()
        )

    hist = (
        bucketed_groupby_agg(
            users.map_batches(lifetimes, batch_format="pandas"),
            keys=["t", "ev"],
            aggs={"n": ("n", "sum")},
        )
        .to_pandas()  # O(horizon) rows
        .sort_values("t")
    )
    cols = {
        "t_days": pa.array([], pa.int64()),
        "n_risk": pa.array([], pa.int64()),
        "d_events": pa.array([], pa.int64()),
        "s_micro": pa.array([], pa.int64()),
    }
    if not len(hist):
        return pa.table(cols)
    # at-risk at t = users with event-or-censor time >= t,
    # deaths at t = conversions at exactly t
    all_t = hist.groupby("t", as_index=False)["n"].sum()
    tv = all_t["t"].to_numpy()
    suffix = all_t["n"].to_numpy()[::-1].cumsum()[::-1]
    deaths = (
        hist[hist["ev"] == 1].set_index("t")["n"].astype("int64").to_dict()
    )
    s = 1_000_000
    rows = []
    for t, at_risk in zip(tv.tolist(), suffix.tolist()):
        d = deaths.get(int(t), 0)
        if d == 0:
            continue  # KM steps only at event (conversion) times
        s = (s * (int(at_risk) - d)) // int(at_risk)
        rows.append((int(t), int(at_risk), d, s))
    return pa.table(
        {
            "t_days": pa.array([r[0] for r in rows], pa.int64()),
            "n_risk": pa.array([r[1] for r in rows], pa.int64()),
            "d_events": pa.array([r[2] for r in rows], pa.int64()),
            "s_micro": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


HAAR_LEVELS = 3


def events_haar(sf_dir: str) -> pa.Table:
    """(lvl, i, approx_c, detail_c): a 3-level UNNORMALIZED integer
    Haar wavelet decomposition of the gap-filled global daily cent
    sums (Haar 1910, public) — the multi-resolution view a
    forecasting/compression pass takes of a traffic series: level-k
    coefficients summarize 2^k-day windows, approx = pairwise sums,
    detail = pairwise differences (lossless over the integers, so NO
    division/floor enters and the transform is bit-exact in any
    engine; the orthonormal 1/√2 scaling is a display concern).

    The series pads with zeros to a multiple of 2^levels, missing
    calendar days count 0 (the ``events_daily_gapfill`` convention,
    via the shared ``_global_day_span`` scan). Level k emits
    ceil(n/2^k) rows: approx_c[i] = a_{k−1}[2i] + a_{k−1}[2i+1],
    detail_c[i] = a_{k−1}[2i] − a_{k−1}[2i+1].

    Plan: one two-phase (day) aggregation; the transform itself runs
    on the O(span) calendar-bounded vector driver-side (the
    acf/theilsen/bootstrap precedent)."""
    from suckit_ray.stages.agg import bucketed_groupby_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        return pd.DataFrame(
            {
                "day": (us // 86_400_000_000).astype("int64"),
                "cents": to_cents(df["value"]),
            }
        )

    daily = bucketed_groupby_agg(
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])
        .map_batches(partial, batch_format="pandas"),
        keys=["day"],
        aggs={"t": ("cents", "sum")},
    )
    span = _global_day_span(daily)
    cols = {
        "lvl": pa.array([], pa.int64()),
        "i": pa.array([], pa.int64()),
        "approx_c": pa.array([], pa.int64()),
        "detail_c": pa.array([], pa.int64()),
    }
    if span is None:
        return pa.table(cols)
    lo, hi = span
    d = daily.to_pandas()  # O(span) — calendar-bounded
    n = hi - lo + 1
    block = 1 << HAAR_LEVELS
    padded = ((n + block - 1) // block) * block
    if padded > 131072:
        # the oracle's constant generate_series grid tops out here
        # (generate_series takes no subquery bound); ~359 years of
        # days — fail loudly rather than silently diverge
        raise ValueError(
            f"events_haar: padded day span {padded} exceeds the "
            "131072-day oracle grid"
        )
    x = np.zeros(padded, dtype="int64")
    x[d["day"].to_numpy() - lo] = d["t"].to_numpy().astype("int64")

    lvls, idxs, apx, det = [], [], [], []
    a = x
    for lvl in range(1, HAAR_LEVELS + 1):
        e, o = a[0::2], a[1::2]
        a, dd = e + o, e - o
        lvls.extend([lvl] * len(a))
        idxs.extend(range(len(a)))
        apx.extend(a.tolist())
        det.extend(dd.tolist())
    return pa.table(
        {
            "lvl": pa.array(lvls, pa.int64()),
            "i": pa.array(idxs, pa.int64()),
            "approx_c": pa.array(apx, pa.int64()),
            "detail_c": pa.array(det, pa.int64()),
        }
    )


def events_ohlc(sf_dir: str) -> rd.Dataset:
    """(event_type, day, open_c, high_c, low_c, close_c, n): the
    OHLC candlestick rollup — per (type, day), the first value by
    (ts, event_id), the extremes, and the last — the market-data
    window aggregate whose combiner must carry the full ordering key
    with each endpoint (the windowed sibling of
    ``events_first_last``).

    Plan: each batch pre-reduces to one row per (type, day) carrying
    (open key, open, close key, close, hi, lo, n) — all mergeable —
    and ONE bucketed co-group folds partials group-locally via a
    vectorized sort (first/last rows win on the carried keys). The
    shuffle moves one 9-column row per (batch, type, day)."""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        d = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "day": (us // 86_400_000_000).astype("int64"),
                "us": us,
                "event_id": df["event_id"].astype("int64"),
                "v": to_cents(df["value"]),
            }
        ).sort_values(["event_type", "day", "us", "event_id"], kind="mergesort")
        g = d.groupby(["event_type", "day"], as_index=False).agg(
            ok_us=("us", "first"),
            ok_id=("event_id", "first"),
            open_c=("v", "first"),
            ck_us=("us", "last"),
            ck_id=("event_id", "last"),
            close_c=("v", "last"),
            high_c=("v", "max"),
            low_c=("v", "min"),
            n=("v", "count"),
        )
        g["bucket"] = (
            pd.util.hash_pandas_object(
                g["event_type"].astype("str") + ":" + g["day"].astype("str"),
                index=False,
            ).astype("int64")
            % B
        )
        return g

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        first = (
            g.sort_values(
                ["event_type", "day", "ok_us", "ok_id"], kind="mergesort"
            )
            .groupby(["event_type", "day"], as_index=False)
            .agg(open_c=("open_c", "first"))
        )
        last = (
            g.sort_values(
                ["event_type", "day", "ck_us", "ck_id"], kind="mergesort"
            )
            .groupby(["event_type", "day"], as_index=False)
            .agg(close_c=("close_c", "last"))
        )
        ext = g.groupby(["event_type", "day"], as_index=False).agg(
            high_c=("high_c", "max"), low_c=("low_c", "min"), n=("n", "sum")
        )
        out = first.merge(last, on=["event_type", "day"]).merge(
            ext, on=["event_type", "day"]
        )
        return out[
            [
                "event_type",
                "day",
                "open_c",
                "high_c",
                "low_c",
                "close_c",
                "n",
            ]
        ].astype(
            {
                "day": "int64",
                "open_c": "int64",
                "high_c": "int64",
                "low_c": "int64",
                "close_c": "int64",
                "n": "int64",
            }
        )

    return (
        rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_type", "ts", "event_id", "value"],
        )
        .map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
    )


def events_dispersion(sf_dir: str) -> pa.Table:
    """(event_type, n_days, sum_c, sum_sq, vmr_micro): the Poisson
    overdispersion audit — per type, the variance-to-mean ratio (Fisher
    dispersion index) of DAILY EVENT COUNTS over the gap-filled global
    calendar span (missing days count 0, the gapfill convention; a
    Poisson process has VMR 1, clumped traffic > 1). Exact integers by
    cross-multiplication:

        vmr_micro = (10^6 · (n·Σc² − S²)) // (n · S),   S = Σc

    (population variance over mean; S > 0 whenever the type exists).

    Plan: one two-phase (type, day) count aggregation; the shared
    ``_global_day_span`` scan supplies n; per-type Σc/Σc² fold over
    O(types × observed days) rows driver-side (zero days contribute
    nothing to either sum)."""
    from suckit_ray.stages.agg import bucketed_groupby_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "day": (us // 86_400_000_000).astype("int64"),
                "c": np.ones(len(df), dtype="int64"),
            }
        )

    daily = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
        ).map_batches(partial, batch_format="pandas"),
        keys=["event_type", "day"],
        aggs={"c": ("c", "sum")},
    )
    span = _global_day_span(daily)
    cols = {
        "event_type": pa.array([], pa.string()),
        "n_days": pa.array([], pa.int64()),
        "sum_c": pa.array([], pa.int64()),
        "sum_sq": pa.array([], pa.int64()),
        "vmr_micro": pa.array([], pa.int64()),
    }
    if span is None:
        return pa.table(cols)
    n = span[1] - span[0] + 1
    d = daily.to_pandas()  # O(types × observed days)
    rows = []
    for t, g in d.groupby("event_type"):
        c = g["c"].to_numpy().astype("int64")
        s, s2 = int(c.sum()), int((c * c).sum())
        vmr = (1_000_000 * (n * s2 - s * s)) // (n * s)
        rows.append((t, n, s, s2, vmr))
    rows.sort()
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "n_days": pa.array([r[1] for r in rows], pa.int64()),
            "sum_c": pa.array([r[2] for r in rows], pa.int64()),
            "sum_sq": pa.array([r[3] for r in rows], pa.int64()),
            "vmr_micro": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


def events_forecast_eval(sf_dir: str) -> pa.Table:
    """(event_type, n_eval, sum_abs_err, sum_abs_naive, mae_c,
    mase_micro): a walk-forward BACKTEST of the ``events_holt``
    forecaster — at every observed day after the first, the one-step-
    ahead Holt forecast (level + trend through the PREVIOUS observed
    day) is scored against the actual daily cent sum, and compared to
    the naive last-value forecast:

        mae_c      = Σ|x_t − f_{t-1}|  //  n_eval
        mase_micro = (10^6 · Σ|x_t − f_{t-1}|) // Σ|x_t − x_{t-1}|

    (the Mean-Absolute-Scaled-Error shape, Hyndman & Koehler 2006,
    public — < 10^6 means the model beats naive persistence). Types
    with fewer than two observed days, or a zero naive denominator,
    are dropped. Runs the SAME integer recursion as ``events_holt``
    (every division ``_trunc_div``), so the whole audit is exact in
    both engines and the oracle just extends the holt recursive CTE
    with a LAG and two sums.

    Plan: identical wiring to ``events_holt`` — one two-phase
    (type, day) aggregation, bounded per-type ordered replay."""
    from suckit_ray.stages.agg import bucketed_groupby_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "day": (us // 86_400_000_000).astype("int64"),
                "cents": to_cents(df["value"]),
            }
        )

    daily = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
        ).map_batches(partial, batch_format="pandas"),
        keys=["event_type", "day"],
        aggs={"x_cents": ("cents", "sum")},
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for etype, grp in g.groupby("event_type"):
            grp = grp.sort_values("day", kind="mergesort")
            xs = [int(v) for v in grp["x_cents"]]
            if len(xs) < 2:
                continue
            lev = trend = 0
            s_err = s_naive = 0
            for i, x in enumerate(xs):
                if i == 0:
                    lev, trend = x, 0
                    continue
                s_err += abs(x - (lev + trend))
                s_naive += abs(x - xs[i - 1])
                prev = lev
                lev = _trunc_div(x + (lev + trend), 2)
                trend = _trunc_div((lev - prev) + trend, 2)
            if s_naive == 0:
                continue
            n_eval = len(xs) - 1
            rows.append(
                (
                    etype,
                    n_eval,
                    s_err,
                    s_naive,
                    s_err // n_eval,
                    (1_000_000 * s_err) // s_naive,
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "event_type",
                "n_eval",
                "sum_abs_err",
                "sum_abs_naive",
                "mae_c",
                "mase_micro",
            ],
        )

    out = (
        daily.groupby("event_type")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    out = out.sort_values("event_type").reset_index(drop=True)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n_eval": pa.array(out["n_eval"].astype("int64"), pa.int64()),
            "sum_abs_err": pa.array(
                out["sum_abs_err"].astype("int64"), pa.int64()
            ),
            "sum_abs_naive": pa.array(
                out["sum_abs_naive"].astype("int64"), pa.int64()
            ),
            "mae_c": pa.array(out["mae_c"].astype("int64"), pa.int64()),
            "mase_micro": pa.array(
                out["mase_micro"].astype("int64"), pa.int64()
            ),
        }
    )


ABSORB_TARGET = "purchase"
ABSORB_STEPS = 4


def events_absorption(sf_dir: str) -> pa.Table:
    """(event_type, n_out, p4_micro): absorbing-Markov conversion
    analysis — the probability of reaching the absorbing
    ``ABSORB_TARGET`` state within ``ABSORB_STEPS`` transitions when
    starting from each event type, under the empirical first-order
    chain (the attribution-modeling primitive behind Markov
    removal-effect credit; Kemeny & Snell 1960, public). The target
    absorbs: its observed outgoing transitions are ignored and its
    value pins at 10^6. Exact integers: per step and state,

        q_t(s) = (Σ_d c(s,d) · q_{t-1}(d)) // n(s)

    with q(target) ≡ 10^6 at every LOOKUP — one floor per
    (step, state), mirrored by four chained CTE steps in the oracle.
    States seen only as destinations (never a source) stay 0.

    Plan: the transition counts are ``events_markov``'s verified
    co-group output (≤ |types|² rows); the K-step recursion runs on
    that tiny matrix driver-side."""
    counts = events_markov(sf_dir).to_pandas()
    cols = {
        "event_type": pa.array([], pa.string()),
        "n_out": pa.array([], pa.int64()),
        "p4_micro": pa.array([], pa.int64()),
    }
    if not len(counts):
        return pa.table(cols)
    c: dict[tuple[str, str], int] = {
        (r["src"], r["dst"]): int(r["n_pair"])
        for _, r in counts.iterrows()
    }
    states = sorted(
        set(counts["src"]).union(counts["dst"])
    )
    n_out = {
        s: sum(v for (a, _), v in c.items() if a == s) for s in states
    }

    def lookup(q: dict[str, int], s: str) -> int:
        return 1_000_000 if s == ABSORB_TARGET else q.get(s, 0)

    q: dict[str, int] = {}
    for _ in range(ABSORB_STEPS):
        q = {
            s: sum(
                c.get((s, d), 0) * lookup(q, d) for d in states
            )
            // n_out[s]
            for s in states
            if s != ABSORB_TARGET and n_out[s] > 0
        }
    return pa.table(
        {
            "event_type": pa.array(states, pa.string()),
            "n_out": pa.array(
                [n_out[s] for s in states], pa.int64()
            ),
            "p4_micro": pa.array(
                [
                    1_000_000
                    if s == ABSORB_TARGET
                    else q.get(s, 0)
                    for s in states
                ],
                pa.int64(),
            ),
        }
    )


def lineitem_price_index(sf_dir: str) -> pa.Table:
    """(year, n_parts, lasp_micro, paasche_micro): Laspeyres and
    Paasche price indices of each ship year against the BASE (first)
    year over the matched part basket (index-number theory, public) —
    the inflation audit run over transaction logs:

        lasp    = Σ_p u_t(p)·q_0(p)  /  Σ_p u_0(p)·q_0(p)
        paasche = Σ_p u_t(p)·q_t(p)  /  Σ_p u_0(p)·q_t(p)

    with unit prices u_y(p) = Σ extprice_c // Σ qty (TRUNC-DIV cents —
    quantized identically in both engines BEFORE any weighting, the
    silhouette-centroid idiom), quantities half-away-rounded, and each
    ratio floored to micro. A part enters year t's basket only if
    present in BOTH year t and the base year (matched basket — no
    imputation).

    Plan: one two-phase (year, part) aggregation → ONE part-hash
    co-group pairs every (part, year) with its part's base row
    group-locally and emits per-year integer partials → a tiny year
    aggregation; the driver sees O(years) rows. The base year is an
    O(blocks) min-reduce, not a driver scan."""
    from suckit_ray.stages.agg import bucketed_groupby_agg, default_buckets

    B = default_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        yr = (
            df["l_shipdate"].to_numpy().astype("datetime64[Y]").astype("int64")
            + 1970
        )
        return pd.DataFrame(
            {
                "year": yr,
                "part": df["l_partkey"].astype("int64"),
                "ep": to_cents(df["l_extendedprice"]),
                "q": round_half_away(df["l_quantity"]),
            }
        )

    py = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_shipdate", "l_partkey", "l_extendedprice", "l_quantity"],
        ).map_batches(partial, batch_format="pandas"),
        keys=["year", "part"],
        aggs={"ep": ("ep", "sum"), "q": ("q", "sum")},
    ).materialize()  # feeds the base-year reduce AND the co-group

    bounds = py.map_batches(
        lambda df: pd.DataFrame({"lo": [int(df["year"].min())]})
        if len(df)
        else pd.DataFrame({"lo": pd.array([], dtype="int64")}),
        batch_format="pandas",
    ).to_pandas()
    cols = {
        "year": pa.array([], pa.int64()),
        "n_parts": pa.array([], pa.int64()),
        "lasp_micro": pa.array([], pa.int64()),
        "paasche_micro": pa.array([], pa.int64()),
    }
    if not len(bounds):
        return pa.table(cols)
    base = int(bounds["lo"].min())

    def pair_partials(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        # unit price quantized FIRST (trunc — all values nonnegative)
        g["u"] = (
            g["ep"].astype("int64") // g["q"].astype("int64")
        ).astype("int64")
        b = g[g["year"] == base][["part", "u", "q"]].rename(
            columns={"u": "u0", "q": "q0"}
        )
        m = g[g["year"] != base].merge(b, on="part")
        out = []
        if len(m):
            m["ln"] = m["u"] * m["q0"]
            m["ld"] = m["u0"] * m["q0"]
            m["pn"] = m["u"] * m["q"]
            m["pd_"] = m["u0"] * m["q"]
            m["np"] = 1
            out.append(
                m.groupby("year", as_index=False)[
                    ["ln", "ld", "pn", "pd_", "np"]
                ].sum()
            )
        if not out:
            return pd.DataFrame(
                {
                    "year": pd.Series([], dtype="int64"),
                    "ln": pd.Series([], dtype="int64"),
                    "ld": pd.Series([], dtype="int64"),
                    "pn": pd.Series([], dtype="int64"),
                    "pd_": pd.Series([], dtype="int64"),
                    "np": pd.Series([], dtype="int64"),
                }
            )
        return pd.concat(out, ignore_index=True).astype("int64")

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["pb"] = (df["part"].astype("int64") % B).astype("int64")
        return df

    agg = bucketed_groupby_agg(
        py.map_batches(bucketize, batch_format="pandas")
        .groupby("pb")
        .map_groups(pair_partials, batch_format="pandas"),
        keys=["year"],
        aggs={
            "ln": ("ln", "sum"),
            "ld": ("ld", "sum"),
            "pn": ("pn", "sum"),
            "pd_": ("pd_", "sum"),
            "np": ("np", "sum"),
        },
    ).to_pandas()  # O(years)

    agg = agg[(agg["ld"] > 0) & (agg["pd_"] > 0)].sort_values("year")
    return pa.table(
        {
            "year": pa.array(agg["year"].astype("int64"), pa.int64()),
            "n_parts": pa.array(agg["np"].astype("int64"), pa.int64()),
            "lasp_micro": pa.array(
                [
                    (1_000_000 * int(n)) // int(d)
                    for n, d in zip(agg["ln"], agg["ld"])
                ],
                pa.int64(),
            ),
            "paasche_micro": pa.array(
                [
                    (1_000_000 * int(n)) // int(d)
                    for n, d in zip(agg["pn"], agg["pd_"])
                ],
                pa.int64(),
            ),
        }
    )


def events_lorenz(sf_dir: str) -> pa.Table:
    """(decile, n_users_cum, value_cum_c, share_micro): the Lorenz
    concentration curve of per-user value totals — users NTILE(10)'d
    ascending by (total, user_id), each decile reporting the
    cumulative user count, cumulative cent total, and exact cumulative
    share floor(10^6·cum/total) — the curve whose area the
    ``events_gini`` scalar summarizes (Lorenz 1905, public), read by
    capacity planners to see *where* the concentration lives.

    Plan: per-user totals from one user-hash aggregation (O(users)
    stays distributed); decile assignment via the shared
    ``_ntile_assign`` distributed-sort recipe (sample-trained range
    partition + per-bucket prefix bases — DuckDB's NTILE remainder
    rule exactly); one tiny (decile) aggregation and a 10-row driver
    cumsum finish."""
    from suckit_ray.stages.agg import bucketed_groupby_agg

    totals = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "value"]
        ).map_batches(
            lambda df: pd.DataFrame(
                {
                    "user_id": df["user_id"].astype("int64"),
                    "t": to_cents(df["value"]),
                }
            )
            .groupby("user_id", as_index=False)["t"]
            .sum(),
            batch_format="pandas",
        ),
        keys=["user_id"],
        aggs={"t": ("t", "sum")},
    ).materialize()  # feeds the count, the ntile pass, and the join

    n_users = totals.count()
    cols = {
        "decile": pa.array([], pa.int64()),
        "n_users_cum": pa.array([], pa.int64()),
        "value_cum_c": pa.array([], pa.int64()),
        "share_micro": pa.array([], pa.int64()),
    }
    if n_users == 0:
        return pa.table(cols)

    tiles = _ntile_assign(totals, "t", n_users, 10, id_col="user_id")

    # tiles back to totals WITHOUT Dataset.join (its hash shuffle
    # chokes on the schema-less empty blocks tiny bucket groups emit;
    # the tagged-union co-group is the repo's standard shape anyway)
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def tag_tot(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "decile": np.full(len(df), -1, dtype="int64"),
                "t": df["t"].astype("int64"),
                "ub": (df["user_id"].astype("int64") % B),
            }
        )

    def tag_tile(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "decile": df["tile"].astype("int64"),
                "t": np.zeros(len(df), dtype="int64"),
                "ub": (df["user_id"].astype("int64") % B),
            }
        )

    def zip_fold(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("user_id", as_index=False).agg(
            decile=("decile", "max"), t=("t", "sum")
        )
        out = m.groupby("decile", as_index=False).agg(
            n=("user_id", "count"), v=("t", "sum")
        )
        return out.astype("int64")

    per_tile = (
        bucketed_groupby_agg(
            totals.map_batches(tag_tot, batch_format="pandas")
            .union(tiles.map_batches(tag_tile, batch_format="pandas"))
            .groupby("ub")
            .map_groups(zip_fold, batch_format="pandas"),
            keys=["decile"],
            aggs={"n": ("n", "sum"), "v": ("v", "sum")},
        )
        .to_pandas()  # ≤ 10 rows
        .sort_values("decile")
    )
    total = int(per_tile["v"].sum())
    ncum = per_tile["n"].astype("int64").cumsum()
    vcum = per_tile["v"].astype("int64").cumsum()
    return pa.table(
        {
            "decile": pa.array(
                per_tile["decile"].astype("int64"), pa.int64()
            ),
            "n_users_cum": pa.array(ncum, pa.int64()),
            "value_cum_c": pa.array(vcum, pa.int64()),
            "share_micro": pa.array(
                [
                    (1_000_000 * int(v)) // total if total else 0
                    for v in vcum
                ],
                pa.int64(),
            ),
        }
    )


def orders_latency_anova(sf_dir: str) -> pa.Table:
    """(k_groups, n_total, ssb_q, ssw_q, f_micro): one-way ANOVA of
    order-fulfillment latency (days, the ``orders_fulfillment_latency``
    definition) ACROSS the five order priorities — the k-sample
    location test completing the 2-sample Welch t² family. To stay
    bit-exact in both engines the group means are QUANTIZED to
    trunc-div integers first (the silhouette-centroid idiom):

        m_g = S_g // n_g,  m = S // n          (trunc toward zero)
        SSB' = Σ_g n_g·(m_g − m)²
        SSW' = Σ_g (Q_g − 2·m_g·S_g + n_g·m_g²)   (Q_g = Σ x²)
        f_micro = (10^6 · SSB' · (n−k)) // (SSW' · (k−1))

    — a deterministic integer variant of Fisher's F (the decision
    ordering is preserved; the sub-day quantization error is
    irrelevant at day granularity). Degenerate inputs (k < 2 or
    SSW' = 0) report f_micro = 0.

    Plan: the fulfillment-latency orderkey co-group emits per-batch
    (priority, n, S, Q) partials; one tiny aggregation and an
    O(k) driver solve on Python ints."""
    from suckit_ray.stages.agg import bucketed_groupby_agg

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        lat = df["lat"].astype("int64")
        p = pd.DataFrame(
            {
                "priority": df["priority"],
                "n": np.ones(len(df), dtype="int64"),
                "s1": lat,
                "s2": lat * lat,
            }
        )
        return p.groupby("priority", as_index=False).sum()

    agg = bucketed_groupby_agg(
        _order_latencies(sf_dir).map_batches(
            stats, batch_format="pandas"
        ),
        keys=["priority"],
        aggs={"n": ("n", "sum"), "s1": ("s1", "sum"), "s2": ("s2", "sum")},
    ).to_pandas()  # O(priorities)
    cols = {
        "k_groups": pa.array([], pa.int64()),
        "n_total": pa.array([], pa.int64()),
        "ssb_q": pa.array([], pa.int64()),
        "ssw_q": pa.array([], pa.int64()),
        "f_micro": pa.array([], pa.int64()),
    }
    if not len(agg):
        return pa.table(cols)
    k = len(agg)
    n = int(agg["n"].sum())
    S = int(agg["s1"].sum())
    m = _trunc_div(S, n)
    ssb = ssw = 0
    for _, r in agg.iterrows():
        ng, sg, qg = int(r["n"]), int(r["s1"]), int(r["s2"])
        mg = _trunc_div(sg, ng)
        ssb += ng * (mg - m) ** 2
        ssw += qg - 2 * mg * sg + ng * mg * mg
    f = (
        0
        if k < 2 or ssw == 0
        else (1_000_000 * ssb * (n - k)) // (ssw * (k - 1))
    )
    return pa.table(
        {
            "k_groups": pa.array([k], pa.int64()),
            "n_total": pa.array([n], pa.int64()),
            "ssb_q": pa.array([ssb], pa.int64()),
            "ssw_q": pa.array([ssw], pa.int64()),
            "f_micro": pa.array([f], pa.int64()),
        }
    )


def events_value_mode(sf_dir: str) -> pa.Table:
    """(event_type, mode_c, n_mode): the exact MODE of each type's
    cent values — most frequent value, ties to the SMALLEST value (an
    explicit rule, since SQL ``mode()`` leaves ties undefined) —
    completing the location-statistics family (mean / median / MAD /
    winsorized / quantiles / mode) on the same one-pass (type, cent)
    histogram exchange."""
    from suckit_ray.stages.agg import bucketed_groupby_agg

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"event_type": df["event_type"], "value_c": to_cents(df["value"])}
        )

    hist = bucketed_groupby_agg(
        rd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        ).map_batches(cents, batch_format="pandas"),
        keys=["event_type", "value_c"],
        aggs={"n": ("value_c", "count")},
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for t, grp in g.groupby("event_type"):
            grp = grp.sort_values(
                ["n", "value_c"], ascending=[False, True], kind="mergesort"
            )
            out.append(
                (t, int(grp["value_c"].iloc[0]), int(grp["n"].iloc[0]))
            )
        return pd.DataFrame(
            out, columns=["event_type", "mode_c", "n_mode"]
        ).astype({"mode_c": "int64", "n_mode": "int64"})

    res = (
        hist.groupby("event_type")
        .map_groups(pick, batch_format="pandas")
        .to_pandas()
        .sort_values("event_type")
    )
    return pa.table(
        {
            "event_type": pa.array(res["event_type"], pa.string()),
            "mode_c": pa.array(res["mode_c"].astype("int64"), pa.int64()),
            "n_mode": pa.array(res["n_mode"].astype("int64"), pa.int64()),
        }
    )


def events_runs_test(sf_dir: str) -> pa.Table:
    """(n_moves, n_plus, n_minus, n_runs, expected_micro): the
    Wald-Wolfowitz RUNS test for randomness of the daily revenue
    direction (Wald & Wolfowitz 1940, public) — consecutive same-sign
    daily changes form runs; far fewer runs than expected means
    trending, far more means oscillation. Zero-change days are
    EXCLUDED (the standard treatment); with n = n_plus + n_minus
    moves the expected run count under randomness is

        E[R] = 1 + 2·n_plus·n_minus / n
        expected_micro = (10^6 · (n + 2·n_plus·n_minus)) // n

    — exact integers end to end (the observed n_runs is a plain
    count; the comparison against E[R] is the caller's inference).

    Plan: one two-phase (day) cent-sum aggregation; signs, runs and
    counts fold over the O(span) calendar-bounded day vector
    driver-side (the acf/bootstrap precedent). The gap-filled grid
    supplies zero days so a missing day contributes a CHANGE, exactly
    as the SQL window over the dense grid sees it."""
    from suckit_ray.stages.agg import bucketed_groupby_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        return pd.DataFrame(
            {
                "day": (us // 86_400_000_000).astype("int64"),
                "cents": to_cents(df["value"]),
            }
        )

    daily = bucketed_groupby_agg(
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])
        .map_batches(partial, batch_format="pandas"),
        keys=["day"],
        aggs={"t": ("cents", "sum")},
    )
    span = _global_day_span(daily)
    cols = {
        "n_moves": pa.array([], pa.int64()),
        "n_plus": pa.array([], pa.int64()),
        "n_minus": pa.array([], pa.int64()),
        "n_runs": pa.array([], pa.int64()),
        "expected_micro": pa.array([], pa.int64()),
    }
    if span is None:
        return pa.table(cols)
    lo, hi = span
    d = daily.to_pandas()  # O(span)
    x = np.zeros(hi - lo + 1, dtype="int64")
    x[d["day"].to_numpy() - lo] = d["t"].to_numpy().astype("int64")
    diff = np.diff(x)
    sign = np.sign(diff)
    sign = sign[sign != 0]
    n_plus = int((sign > 0).sum())
    n_minus = int((sign < 0).sum())
    n = n_plus + n_minus
    if n == 0:
        return pa.table(cols)
    n_runs = 1 + int((sign[1:] != sign[:-1]).sum())
    expected = (1_000_000 * (n + 2 * n_plus * n_minus)) // n
    return pa.table(
        {
            "n_moves": pa.array([n], pa.int64()),
            "n_plus": pa.array([n_plus], pa.int64()),
            "n_minus": pa.array([n_minus], pa.int64()),
            "n_runs": pa.array([n_runs], pa.int64()),
            "expected_micro": pa.array([expected], pa.int64()),
        }
    )


def events_mann_kendall(sf_dir: str) -> pa.Table:
    """(n_days, s_stat, n_pos, n_neg, n_tie): the Mann-Kendall trend
    TEST statistic over the observed daily cent sums (Mann 1945 /
    Kendall 1975, public) — S = Σ_{i<j} sign(x_j − x_i), the
    nonparametric monotone-trend detector whose slope-estimating
    sibling is ``events_theilsen`` (the pair a monitoring stack runs
    together: is there a trend, and how steep). Exact integers: S and
    the concordant/discordant/tie pair counts are plain sums over the
    O(days²) calendar-bounded pair set.

    Plan: one two-phase (day) aggregation; the pair fold runs on the
    O(days) driver vector (the theilsen precedent — pairs are bounded
    by the calendar, never the corpus)."""
    from suckit_ray.stages.agg import bucketed_groupby_agg

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        return pd.DataFrame(
            {
                "day": (us // 86_400_000_000).astype("int64"),
                "cents": to_cents(df["value"]),
            }
        )

    daily = (
        bucketed_groupby_agg(
            rd.read_parquet(
                f"{sf_dir}/events.parquet", columns=["ts", "value"]
            ).map_batches(partial, batch_format="pandas"),
            keys=["day"],
            aggs={"t": ("cents", "sum")},
        )
        .to_pandas()  # O(days)
        .sort_values("day")
    )
    cols = {
        "n_days": pa.array([], pa.int64()),
        "s_stat": pa.array([], pa.int64()),
        "n_pos": pa.array([], pa.int64()),
        "n_neg": pa.array([], pa.int64()),
        "n_tie": pa.array([], pa.int64()),
    }
    if not len(daily):
        return pa.table(cols)
    x = daily["t"].to_numpy().astype("int64")
    i, j = np.triu_indices(len(x), k=1)
    d = np.sign(x[j] - x[i])
    return pa.table(
        {
            "n_days": pa.array([len(x)], pa.int64()),
            "s_stat": pa.array([int(d.sum())], pa.int64()),
            "n_pos": pa.array([int((d > 0).sum())], pa.int64()),
            "n_neg": pa.array([int((d < 0).sum())], pa.int64()),
            "n_tie": pa.array([int((d == 0).sum())], pa.int64()),
        }
    )


FUNNEL_WINDOW_US = 7 * 86_400_000_000  # 7-day per-step conversion window


def events_funnel_windowed(
    sf_dir: str, window_us: int = FUNNEL_WINDOW_US
) -> rd.Dataset:
    """(user_id, stage): the ordered funnel with a per-step CONVERSION
    WINDOW — step k counts only when it lands strictly after the
    previous step's gate timestamp AND within ``window_us`` of it
    (product-analytics funnels are almost always windowed: a purchase
    months after the click is a new journey, not a conversion). A
    thin wrapper over ``events_funnel`` — one implementation, one
    extra vectorized comparison per step (review r4: the duplicated
    body was a divergence hazard); oracle = the funnel CTE chain with
    the window bound added to each step's join."""
    return events_funnel(sf_dir, window_us=window_us)


RAPID_REORDER_DAYS = 7


def orders_rapid_reorder(
    sf_dir: str, window_days: int = RAPID_REORDER_DAYS
) -> rd.Dataset:
    """(o_custkey, first_key, second_key, gap_days): pairs of orders
    from the SAME customer placed within ``window_days`` of each
    other — the rapid-repeat shape behind duplicate-submission
    detection, split-order reconciliation and velocity-based fraud
    flags. Pairs are unordered (first_key < second_key by orderkey);
    gap_days is the absolute date difference in whole days (dates
    carry no time component, so integer day arithmetic is exact on
    both engines).

    Scale shape: one custkey-hash co-group — every customer's orders
    co-locate, the within-group pairing is a vectorized self-merge
    bounded by per-customer order count (TPC-H ≤ ~41; a real
    power-law customer would ride the same per-key cap as the other
    per-entity pair ops), and only qualifying pairs leave the group.
    Full SQL oracle: the literal self-join."""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": df["o_orderkey"].astype("int64"),
                "cust": df["o_custkey"].astype("int64"),
                "day": (
                    df["o_orderdate"]
                    .to_numpy()
                    .astype("datetime64[D]")
                    .astype("int64")
                ),
                "bucket": (df["o_custkey"].astype("int64") % B),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="cust")
        m = m[m["key_x"] < m["key_y"]]
        gap = (m["day_x"] - m["day_y"]).abs()
        keep = gap <= window_days
        m, gap = m[keep], gap[keep]
        return pd.DataFrame(
            {
                "o_custkey": m["cust"].astype("int64"),
                "first_key": m["key_x"].astype("int64"),
                "second_key": m["key_y"].astype("int64"),
                "gap_days": gap.astype("int64"),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )
