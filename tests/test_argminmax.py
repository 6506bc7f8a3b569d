"""Tie-break pins for the argmin/argmax-by-ordering operators
(relops.events_first_last / events_latest_state): tied timestamps
must resolve by event_id on BOTH the engine and oracle side — the
synthetic events table rarely has exact ts collisions, so these feed
a hand-built parquet where every interesting case is a tie."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from suckit_ray.pipelines import relops

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture()
def tied_events(tmp_path):
    ts = pd.Timestamp("2024-01-01 00:00:00")
    df = pd.DataFrame(
        {
            "event_id": [5, 2, 9, 1, 7],
            "ts": [ts, ts, ts, ts + pd.Timedelta(hours=1), ts],
            "user_id": [1, 1, 1, 2, 2],
            "event_type": ["a", "a", "b", "a", "a"],
            "value": [1.10, 2.20, 3.30, 4.40, 5.50],
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_first_last_breaks_ts_ties_by_event_id(tied_events):
    out = (
        relops.events_first_last(tied_events)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    # user 1: all three events tie on ts → first = event_id 2 (220),
    # last = event_id 9 (330). user 2: event 7 ties-at-t0 precedes
    # event 1 at t0+1h despite the smaller event_id.
    assert out.to_dict("list") == {
        "user_id": [1, 2],
        "first_value_c": [220, 550],
        "last_value_c": [330, 440],
        "n_events": [3, 2],
    }


def test_latest_state_breaks_ts_ties_by_event_id(tied_events):
    out = (
        relops.events_latest_state(tied_events)
        .to_pandas()
        .sort_values(["user_id", "event_type"])
        .reset_index(drop=True)
    )
    t0 = 1_704_067_200_000_000  # 2024-01-01 in epoch us
    # user 1/a: ids 5 and 2 tie on ts → id 5 wins (110); user 2/a:
    # id 1 at t0+1h beats id 7 at t0 despite the smaller event_id
    assert out.to_dict("list") == {
        "user_id": [1, 1, 2],
        "event_type": ["a", "b", "a"],
        "last_ts_us": [t0, t0, t0 + 3_600_000_000],
        "last_value_c": [110, 330, 440],
    }


def test_peak_concurrency_counts_touching_intervals_as_overlap(tmp_path):
    # three users, single-session each: u1 [0min, 10min],
    # u2 [5min, 20min], u3 starts EXACTLY when u1 ends (10min) —
    # inclusive semantics: at t=10min all three are active
    t0 = pd.Timestamp("2024-06-01 12:00:00")
    rows = [
        (1, 1, t0), (2, 1, t0 + pd.Timedelta(minutes=10)),
        (3, 2, t0 + pd.Timedelta(minutes=5)),
        (4, 2, t0 + pd.Timedelta(minutes=20)),
        (5, 3, t0 + pd.Timedelta(minutes=10)),
        (6, 3, t0 + pd.Timedelta(minutes=15)),
    ]
    df = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [r[2] for r in rows],
            "user_id": [r[1] for r in rows],
            "event_type": ["a"] * len(rows),
            "value": [1.0] * len(rows),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "events.parquet"))
    out = relops.events_peak_concurrency(str(tmp_path)).to_pandas()
    assert out["max_concurrent"].tolist() == [3]
    peak_us = int((t0 + pd.Timedelta(minutes=10)).value // 1000)
    assert out["first_peak_us"].tolist() == [peak_us]


def test_watermark_actually_drops_late_events():
    # guard against the degenerate regression where the watermark
    # never advances (everything accepted = a plain groupby)
    import pyarrow.parquet as pq_

    sf = "/root/testdata/sf0.001"
    total = pq_.read_metadata(f"{sf}/events.parquet").num_rows
    out = relops.events_watermark_agg(sf).to_pandas()
    accepted = int(out["n_accepted"].sum())
    assert 0 < accepted < total  # some dropped, not all
    # and the dropped fraction is material, not rounding noise
    assert (total - accepted) / total > 0.05


def test_rfm_ntile_remainder_rule(tmp_path):
    # 7 customers → NTILE(4) tile sizes must be 2,2,2,1 (first n%k
    # tiles get the extra row) — the sf tables have customer counts
    # divisible by 4, so the oracle never exercises the remainder
    t0 = pd.Timestamp("2023-01-01")
    rows = []
    for c in range(1, 8):
        for j in range(c):  # frequency c, spend c*10, recency t0+c days
            rows.append((c, t0 + pd.Timedelta(days=c), 10.0))
    df = pd.DataFrame(
        {
            "o_orderkey": range(1, len(rows) + 1),
            "o_custkey": [r[0] for r in rows],
            "o_orderstatus": ["F"] * len(rows),
            "o_totalprice": [r[2] for r in rows],
            "o_orderdate": [r[1] for r in rows],
            "o_orderpriority": ["3-MEDIUM"] * len(rows),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "orders.parquet"))
    out = (
        relops.customer_rfm(str(tmp_path))
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    # all three metrics order customers 1..7 identically → identical
    # tiles; sizes 2,2,2,1 per the remainder rule
    want = [1, 1, 2, 2, 3, 3, 4]
    assert out["r_tile"].tolist() == want
    assert out["f_tile"].tolist() == want
    assert out["m_tile"].tolist() == want
