"""Thirteenth-session operator pins: daily-count autocorrelation,
link-graph degree assortativity, Arrow IPC round-trip."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _write_count_events(tmp_path, day_counts):
    """events.parquet where day i carries day_counts[i] rows (count
    series == day_counts; value irrelevant to the ACF)."""
    days = [d for d, c in enumerate(day_counts) for _ in range(c)]
    n = len(days)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [d * 86_400_000_000 for d in days], pa.timestamp("us")
            ),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["a"] * n, pa.string()),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")


def _acf_reference(x, max_lag=7):
    """Literal replay of the documented closed form in Python ints."""
    out = {}
    T = len(x)
    for k in range(1, max_lag + 1):
        n = T - k
        if n < 1:
            continue
        a, b = x[:n], x[k:]
        sx, sy = sum(a), sum(b)
        sxy = sum(p * q for p, q in zip(a, b))
        sxx = sum(p * p for p in a)
        syy = sum(q * q for q in b)
        num = n * sxy - sx * sy
        den = (n * sxx - sx * sx) * (n * syy - sy * sy)
        out[k] = (
            0
            if den == 0
            else (-1 if num < 0 else 1) * ((num * num * 1_000_000) // den)
        )
    return out


@pytest.mark.usefixtures("ray_session")
class TestAcf:
    def test_alternating_series_matches_reference(self, tmp_path):
        """Period-2 series: strong NEGATIVE lag-1, strong POSITIVE
        lag-2 autocorrelation; exact equality vs the Python replay."""
        from suckit_ray.pipelines.relops import events_acf

        counts = [9, 1, 9, 1, 9, 1, 9, 1, 9, 1, 9, 1]
        _write_count_events(tmp_path, counts)
        got = (
            events_acf(str(tmp_path))
            .to_pandas()
            .set_index("lag")["acf2_micro"]
            .to_dict()
        )
        ref = _acf_reference(counts)
        assert got == ref
        assert got[1] < 0 < got[2]
        assert got[2] > 900_000  # near-perfect period-2 signal

    def test_gap_days_count_as_zero(self, tmp_path):
        """Days with NO events must enter the series as zeros: events
        only on even days ⇒ the filled series alternates c,0,c,0,…
        and lag-2 correlation is strong positive."""
        from suckit_ray.pipelines.relops import events_acf

        # write rows on even days only; gapfill makes odd days zero
        days = [d for d in range(0, 12, 2) for _ in range(5)]
        n = len(days)
        tbl = pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(
                    [d * 86_400_000_000 for d in days], pa.timestamp("us")
                ),
                "user_id": pa.array([1] * n, pa.int64()),
                "event_type": pa.array(["a"] * n, pa.string()),
                "value": pa.array([1.0] * n, pa.float64()),
                "props": pa.array(["{}"] * n, pa.string()),
            }
        )
        pq.write_table(tbl, tmp_path / "events.parquet")
        got = (
            events_acf(str(tmp_path))
            .to_pandas()
            .set_index("lag")["acf2_micro"]
            .to_dict()
        )
        filled = [5, 0, 5, 0, 5, 0, 5, 0, 5, 0, 5]
        assert got == _acf_reference(filled)
        assert got[2] == 1_000_000  # perfectly periodic ⇒ r² = 1

    def test_constant_series_is_zero(self, tmp_path):
        """A constant series has zero variance at every lag ⇒ the
        den==0 guard yields 0 everywhere."""
        from suckit_ray.pipelines.relops import events_acf

        _write_count_events(tmp_path, [3] * 10)
        got = events_acf(str(tmp_path)).to_pandas()
        assert set(got["lag"]) == set(range(1, 8))
        assert (got["acf2_micro"] == 0).all()

    def test_sf_corpus_runs_and_is_bounded(self):
        from suckit_ray.pipelines.relops import events_acf

        got = events_acf(SF).to_pandas()
        # 5 types × 7 lags, |signed r²| ≤ 1e6 by construction
        assert len(got) == 35
        assert got["acf2_micro"].abs().max() <= 1_000_000


def _page(host, j, targets):
    return {
        "doc_id": f"{host}//p{j}.html",
        "host": host,
        "is_html": True,
        "spans": [
            {"kind": "link", "text": "", "media_ref": f"p{t}.html", "offset": i}
            for i, t in enumerate(targets)
        ],
    }


def _assort_reference(edges):
    """Literal out-in assortativity replay in Python ints."""
    from collections import Counter

    odeg = Counter(s for s, _ in edges)
    ideg = Counter(t for _, t in edges)
    xs = [odeg[s] for s, _ in edges]
    ys = [ideg[t] for _, t in edges]
    n = len(edges)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    num = n * sxy - sx * sy
    den = (n * sxx - sx * sx) * (n * syy - sy * sy)
    r2 = (
        0
        if den == 0
        else (-1 if num < 0 else 1) * ((num * num * 1_000_000) // den)
    )
    return n, r2


@pytest.mark.usefixtures("ray_session")
class TestAssortativity:
    def test_star_is_disassortative_and_matches_reference(self):
        """Hub star + tail chain: hub (high outdeg) cites leaves
        (indeg 1) ⇒ negative correlation; exact equality vs the
        Python replay. A 4-cycle host is perfectly regular ⇒ den==0
        guard yields 0."""
        import ray.data as rd

        from suckit_ray.pipelines.graph import assortativity_from_docs

        # hub 0 (outdeg 3) cites indeg-1 leaves; leaves 2,3 (outdeg 1)
        # cite the indeg-2 hub — perfect anti-correlation (r² = −1e6)
        star = [(0, 1), (0, 2), (0, 3), (2, 0), (3, 0)]
        rows = [
            _page("h", 0, [1, 2, 3]),
            _page("h", 2, [0]),
            _page("h", 3, [0]),
            _page("h", 1, []),
        ]
        rows += [_page("g", j, [(j + 1) % 4]) for j in range(4)]
        got = (
            assortativity_from_docs(rd.from_items(rows).repartition(3))
            .to_pandas()
            .set_index("host")
        )
        n, r2 = _assort_reference(star)
        assert tuple(got.loc["h"]) == (n, r2)
        assert r2 < 0  # hubs cite leaves: disassortative
        assert tuple(got.loc["g"]) == (4, 0)  # regular graph: den == 0

    def test_sf_corpus_bounded(self):
        from suckit_ray.pipelines.graph import crawl_assortativity

        got = crawl_assortativity(SF).to_pandas()
        assert len(got) == 8
        assert got["assort2_micro"].abs().max() <= 1_000_000
