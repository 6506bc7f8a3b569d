"""Fourteenth-session operator pins: local clustering coefficient,
functional-dependency audit, Welch t², offline changepoint, seasonal
Holt-Winters, Z-order layout."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _page(host, j, link_targets):
    spans = []
    for t in link_targets:
        spans.append(
            {"kind": "link", "text": "", "media_ref": t, "offset": len(spans)}
        )
    return {
        "doc_id": f"{host}//p{j}.html",
        "host": host,
        "is_html": True,
        "spans": spans,
    }


@pytest.mark.usefixtures("ray_session")
class TestClusteringCoeff:
    def test_triangle_plus_pendant(self):
        """K3 with a pendant at vertex 0: deg(0)=3 tri(0)=1 lcc=1/3;
        vertices 1,2: deg 2, tri 1, lcc=1; vertex 3: deg 1 (dropped)."""
        import ray.data as rd

        from suckit_ray.pipelines.graph import lcc_from_docs

        rows = [
            _page("hosta.test", 0, ["p1.html", "p2.html", "p3.html"]),
            _page("hosta.test", 1, ["p2.html"]),
            _page("hosta.test", 2, []),
            _page("hosta.test", 3, []),
        ]
        got = (
            lcc_from_docs(rd.from_arrow(pa.Table.from_pylist(rows)))
            .to_pandas()
            .sort_values("page")
            .reset_index(drop=True)
        )
        assert list(got["page"]) == [0, 1, 2]
        assert list(got["deg"]) == [3, 2, 2]
        assert list(got["tri"]) == [1, 1, 1]
        assert list(got["lcc_micro"]) == [
            2_000_000 * 1 // 6,
            1_000_000,
            1_000_000,
        ]

    def test_cross_host_links_do_not_count(self):
        """The cross-host guard from _host_page_edges carries through:
        a foreign p2 link must not close the 0-1-2 triangle."""
        import ray.data as rd

        from suckit_ray.pipelines.graph import lcc_from_docs

        rows = [
            _page("hosta.test", 0, ["p1.html", "../hostb.test/p2.html"]),
            _page("hosta.test", 1, ["p2.html"]),
            _page("hosta.test", 2, []),
            _page("hostb.test", 2, []),
        ]
        got = lcc_from_docs(
            rd.from_arrow(pa.Table.from_pylist(rows))
        ).to_pandas()
        # only vertex 1 has deg 2 (edges 0-1, 1-2); no triangles anywhere
        assert (got["tri"] == 0).all()
        assert (got["lcc_micro"] == 0).all()

    def test_matches_brute_force_on_flagship(self):
        """Per-vertex brute force over the real sf0.001 link graph."""
        from suckit_ray.pipelines.flagship import crawl_docs
        from suckit_ray.pipelines.graph import lcc_from_docs

        docs = crawl_docs(SF).materialize()
        got = (
            lcc_from_docs(docs)
            .to_pandas()
            .sort_values(["host", "page"])
            .reset_index(drop=True)
        )

        # independent adjacency build straight off the span rows
        import posixpath
        import re

        from suckit_ray.pipelines.graph import resolve_link

        page_re = re.compile(r"/p(\d+)\.html$")
        adj: dict = {}
        for row in docs.iter_rows():
            if not row["is_html"]:
                continue
            m = page_re.search(posixpath.normpath(row["doc_id"]))
            if not m:
                continue
            j, host = int(m.group(1)), row["host"]
            for s in row["spans"]:
                if s["kind"] != "link":
                    continue
                tgt = resolve_link(row["doc_id"], s["media_ref"])
                mt = page_re.search(tgt)
                if not mt or tgt.split("/", 1)[0] != host:
                    continue
                k = int(mt.group(1))
                if k != j:
                    adj.setdefault((host, j), set()).add(k)
                    adj.setdefault((host, k), set()).add(j)

        want = []
        for (host, v), nb in adj.items():
            if len(nb) < 2:
                continue
            tri = sum(
                1
                for a in nb
                for b in nb
                if a < b and b in adj.get((host, a), set())
            )
            d = len(nb)
            want.append((host, v, d, tri, 2_000_000 * tri // (d * (d - 1))))
        want.sort()
        assert (
            list(map(tuple, got.itertuples(index=False, name=None))) == want
        )
        assert sum(w[3] for w in want) > 0  # graph has closed wedges


@pytest.mark.usefixtures("ray_session")
class TestTableFds:
    def test_engineered_holds_and_violations(self, tmp_path):
        """Micro-tables where every candidate's verdict is known by
        construction, including the composite determinant."""
        import shutil

        for t in [
            "customer",
            "documents",
            "events",
            "part",
        ]:
            shutil.copy(f"{SF}/{t}.parquet", tmp_path / f"{t}.parquet")
        # orders: o_orderkey PK holds; custkey 7 has TWO priorities
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([1, 2, 3], pa.int64()),
                    "o_custkey": pa.array([7, 7, 8], pa.int64()),
                    "o_orderstatus": pa.array(["O"] * 3),
                    "o_totalprice": pa.array([1.0, 2.0, 3.0]),
                    "o_orderdate": pa.array(["1995-01-01"] * 3),
                    "o_orderpriority": pa.array(["1-URGENT", "2-HIGH", "2-HIGH"]),
                }
            ),
            tmp_path / "orders.parquet",
        )
        # lineitem: (orderkey, linenumber) PK holds; orderkey alone
        # maps to two parts -> exactly one violation row
        pq.write_table(
            pa.table(
                {
                    "l_orderkey": pa.array([1, 1, 2], pa.int64()),
                    "l_linenumber": pa.array([1, 2, 1], pa.int64()),
                    "l_partkey": pa.array([10, 11, 10], pa.int64()),
                }
            ),
            tmp_path / "lineitem.parquet",
        )
        from suckit_ray.pipelines.relops import table_fds

        got = table_fds(str(tmp_path)).to_pandas()
        g = got.set_index(["tbl", "det", "dep"])

        row = g.loc[("orders", "o_orderkey", "o_custkey")]
        assert (row["n_det"], row["n_pairs"], row["holds"]) == (3, 3, 1)
        row = g.loc[("orders", "o_custkey", "o_orderpriority")]
        assert (row["n_det"], row["n_pairs"], row["n_violations"]) == (2, 3, 1)
        row = g.loc[("lineitem", "l_orderkey,l_linenumber", "l_partkey")]
        assert (row["n_det"], row["n_pairs"], row["holds"]) == (3, 3, 1)
        row = g.loc[("lineitem", "l_orderkey", "l_partkey")]
        assert (row["n_det"], row["n_pairs"], row["holds"]) == (2, 3, 0)

    def test_matches_pandas_reference_on_sf(self):
        """Every candidate's counts equal a pandas drop_duplicates
        replay over the real sf0.001 tables."""
        from suckit_ray.pipelines.relops import FD_CANDIDATES, table_fds

        got = table_fds(SF).to_pandas().set_index(["tbl", "det", "dep"])
        for tbl, det, dep in FD_CANDIDATES:
            df = pq.read_table(
                f"{SF}/{tbl}.parquet", columns=sorted({*det, dep})
            ).to_pandas()
            n_det = len(df[list(det)].drop_duplicates())
            n_pairs = len(df[list(det) + [dep]].drop_duplicates())
            row = got.loc[(tbl, ",".join(det), dep)]
            assert (row["n_det"], row["n_pairs"]) == (n_det, n_pairs)
            assert row["n_violations"] == n_pairs - n_det
            assert row["holds"] == int(n_pairs == n_det)


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


def _write_typed_events(tmp_path, groups):
    """groups: dict type -> list of float values (one event per value,
    sequential days)."""
    rows = [(t, v) for t, vs in groups.items() for v in vs]
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                [i * 3_600_000_000 for i in range(len(rows))],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([t for t, _ in rows], pa.string()),
            "value": pa.array([v for _, v in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")


@pytest.mark.usefixtures("ray_session")
class TestWelchT:
    def test_hand_case_exact(self, tmp_path):
        """a = [1, 2, 3] dollars, b = [5, 6, 7, 8]: hand-derivable
        integers all the way through."""
        _write_typed_events(
            tmp_path, {"a": [1.0, 2.0, 3.0], "b": [5.0, 6.0, 7.0, 8.0]}
        )
        from suckit_ray.pipelines.relops import events_welch_t

        got = events_welch_t(str(tmp_path)).to_pandas()
        assert len(got) == 1
        row = got.iloc[0]
        # cents: a = [100,200,300] n=3 S1=600 S2=140000
        # b = [500,600,700,800]    n=4 S1=2600 S2=1740000
        d = 600 * 4 - 2600 * 3
        x = (3 * 140000 - 600 * 600) * 16 * 3 + (
            4 * 1740000 - 2600 * 2600
        ) * 9 * 2
        want = (1_000_000 * d * d * 2 * 3) // x
        assert (row["n_a"], row["n_b"]) == (3, 4)
        assert row["t2_micro"] == want
        # float cross-check: t^2 = (m1-m2)^2/(v1/n1+v2/n2)
        va = np.var([100, 200, 300], ddof=1)
        vb = np.var([500, 600, 700, 800], ddof=1)
        t2 = (200 - 650) ** 2 / (va / 3 + vb / 4)
        assert abs(row["t2_micro"] / 1e6 - t2) < 1e-3

    def test_zero_variance_sentinel(self, tmp_path):
        _write_typed_events(tmp_path, {"a": [2.0, 2.0], "b": [3.0, 3.0]})
        from suckit_ray.pipelines.relops import events_welch_t

        got = events_welch_t(str(tmp_path)).to_pandas()
        assert got.iloc[0]["t2_micro"] == -1

    def test_matches_float_welch_on_sf(self):
        """Every pair on the real sf0.001 table matches a numpy float
        Welch replay to within flooring error."""
        from suckit_ray.pipelines.relops import events_welch_t

        got = events_welch_t(SF).to_pandas()
        ev = pq.read_table(
            f"{SF}/events.parquet", columns=["event_type", "value"]
        ).to_pandas()
        ev["c"] = np.round(ev["value"] * 100).astype("int64")
        assert len(got) == 10  # C(5,2)
        for _, row in got.iterrows():
            a = ev.loc[ev["event_type"] == row["type_a"], "c"].to_numpy()
            b = ev.loc[ev["event_type"] == row["type_b"], "c"].to_numpy()
            t2 = (a.mean() - b.mean()) ** 2 / (
                a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
            )
            assert abs(row["t2_micro"] / 1e6 - t2) < 1e-2


@pytest.mark.usefixtures("ray_session")
class TestChangepoint:
    def test_detects_engineered_mean_shift(self, tmp_path):
        """10 days at $1 then 10 days at $9: the split must land on
        the boundary (last day of the low regime) with the segment
        means exact."""
        rows = [(d, "shift", 1.0) for d in range(10)] + [
            (d, "shift", 9.0) for d in range(10, 20)
        ]
        _write_events(tmp_path, rows)
        from suckit_ray.pipelines.relops import events_changepoint

        got = events_changepoint(str(tmp_path)).to_pandas().iloc[0]
        assert got["split_day"] == 9
        assert got["mean_left_c"] == 100
        assert got["mean_right_c"] == 900
        # exact gain at t=10, n=20: (20*1000 - 10*10000)^2 * 1e6
        #   // (10*10*20)
        want = (1_000_000 * (20 * 1000 - 10 * 10000) ** 2) // (10 * 10 * 20)
        assert got["gain_micro"] == want

    def test_matches_python_argmax_replay(self, tmp_path):
        """Random series: the floored-key argmax replayed literally."""
        rng = np.random.RandomState(14)
        vals = (rng.randint(0, 2000, size=60) / 100.0).tolist()
        _write_events(tmp_path, [(d, "r", v) for d, v in enumerate(vals)])
        from suckit_ray.pipelines.relops import events_changepoint

        got = events_changepoint(str(tmp_path)).to_pandas().iloc[0]
        xs = [int(round(v * 100)) for v in vals]
        n, tot = len(xs), sum(xs)
        best = None
        pre = 0
        for t in range(1, n):
            pre += xs[t - 1]
            gain = (1_000_000 * (n * pre - t * tot) ** 2) // (t * (n - t) * n)
            if best is None or gain > best[0]:
                best = (gain, t, pre)
        gain, t, pre = best
        assert got["split_day"] == t - 1
        assert got["gain_micro"] == gain
        assert got["mean_left_c"] == pre // t
        assert got["mean_right_c"] == (tot - pre) // (n - t)

    def test_single_day_span_yields_empty(self, tmp_path):
        _write_events(tmp_path, [(5, "a", 1.0), (5, "b", 2.0)])
        from suckit_ray.pipelines.relops import events_changepoint

        assert events_changepoint(str(tmp_path)).count() == 0


def _hw_replay(xs):
    """Literal python Holt-Winters replay (alpha=beta=gamma=1/2, m=7,
    truncating divisions)."""

    def td(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    lev = trend = 0
    queue = [0] * 7
    out = []
    for i, x in enumerate(xs):
        s = queue.pop(0)
        if i == 0:
            lev, trend = x, 0
        else:
            prev = lev
            lev = td(x - s + lev + trend, 2)
            trend = td(lev - prev + trend, 2)
        snew = td(x - lev + s, 2)
        queue.append(snew)
        out.append((x, lev, trend, snew, lev + trend + queue[0]))
    return out


@pytest.mark.usefixtures("ray_session")
class TestHoltWinters:
    def test_matches_python_replay_seasonal(self, tmp_path):
        """Four weekly cycles of a strong day-of-week pattern plus a
        declining drift (negative trend exercises the truncating
        division)."""
        pattern = [50.0, 1.0, 1.0, 1.0, 1.0, 1.0, 30.0]
        rows = []
        for d in range(28):
            rows.append((d, "hw", pattern[d % 7] * (1 - d * 0.02)))
        _write_events(tmp_path, rows)
        from suckit_ray.pipelines.relops import events_holtwinters

        got = (
            events_holtwinters(str(tmp_path))
            .to_pandas()
            .sort_values("day")
            .reset_index(drop=True)
        )
        xs = [int(round(pattern[d % 7] * (1 - d * 0.02) * 100)) for d in range(28)]
        want = _hw_replay(xs)
        assert list(got["x_cents"]) == [w[0] for w in want]
        assert list(got["level_c"]) == [w[1] for w in want]
        assert list(got["trend_c"]) == [w[2] for w in want]
        assert list(got["season_c"]) == [w[3] for w in want]
        assert list(got["forecast_c"]) == [w[4] for w in want]
        # after 3 cycles, the seasonal state must carry most of the
        # spike: the day-21 spike's seasonal exceeds the flat days'
        s21 = got.loc[got["day"] == 21, "season_c"].iloc[0]
        s22 = got.loc[got["day"] == 22, "season_c"].iloc[0]
        assert s21 > s22 + 500

    def test_gapfill_and_random_replay(self, tmp_path):
        """Sparse random days: missing days enter the recursion as
        zeros exactly like the oracle's dense grid."""
        rng = np.random.RandomState(41)
        days = sorted(rng.choice(40, size=17, replace=False).tolist())
        rows = [(d, "g", float(rng.randint(1, 900)) / 10) for d in days]
        _write_events(tmp_path, rows)
        from suckit_ray.pipelines.relops import events_holtwinters

        got = (
            events_holtwinters(str(tmp_path))
            .to_pandas()
            .sort_values("day")
            .reset_index(drop=True)
        )
        lo, hi = min(days), max(days)
        by_day = {d: int(round(v * 100)) for (d, _, v) in rows}
        xs = [by_day.get(d, 0) for d in range(lo, hi + 1)]
        want = _hw_replay(xs)
        assert list(got["day"]) == list(range(lo, hi + 1))
        assert list(got["forecast_c"]) == [w[4] for w in want]


@pytest.mark.usefixtures("ray_session")
class TestZorderLayout:
    def test_quadrant_locality_invariant(self):
        """THE data-skipping property: every partition's zone map
        spans at most a 4x4 quadrant of the (d1, d2) grid, so a
        range predicate on either dimension prunes partitions."""
        from suckit_ray.pipelines.textops import docs_zorder_layout

        got = docs_zorder_layout(SF).to_pandas()
        assert got["n_docs"].sum() == 500
        for _, r in got.iterrows():
            assert r["d1_max"] - r["d1_min"] <= 3
            assert r["d2_max"] - r["d2_min"] <= 3
            # zkey span stays inside the partition's 16-key block
            assert r["z_min"] // 16 == r["part"]
            assert r["z_max"] // 16 == r["part"]
            # and the quadrant is the one the partition id encodes:
            # top 4 bits = (d2b3, d1b3, d2b2, d1b2)
            p = int(r["part"])
            d1_hi = ((p >> 0) & 1) * 4 + ((p >> 2) & 1) * 8
            d2_hi = ((p >> 1) & 1) * 4 + ((p >> 3) & 1) * 8
            assert d1_hi <= r["d1_min"] and r["d1_max"] < d1_hi + 4
            assert d2_hi <= r["d2_min"] and r["d2_max"] < d2_hi + 4

    def test_matches_python_interleave(self):
        """Zone map equals a literal per-doc Morton replay."""
        import hashlib

        from suckit_ray.pipelines.textops import docs_zorder_layout

        docs = pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id", "n_chars"]
        ).to_pandas()

        def interleave(d1, d2):
            z = 0
            for i in range(4):
                z |= ((d1 >> i) & 1) << (2 * i)
                z |= ((d2 >> i) & 1) << (2 * i + 1)
            return z

        zone: dict = {}
        for _, row in docs.iterrows():
            d1 = min(15, int(row["n_chars"]) // 40)
            d2 = int(
                hashlib.md5(str(int(row["doc_id"])).encode()).hexdigest()[0],
                16,
            )
            zk = interleave(d1, d2)
            p = zk // 16
            cur = zone.setdefault(
                p, [0, 99, -1, 99, -1, 999, -1]
            )  # n, d1mn, d1mx, d2mn, d2mx, zmn, zmx
            cur[0] += 1
            cur[1], cur[2] = min(cur[1], d1), max(cur[2], d1)
            cur[3], cur[4] = min(cur[3], d2), max(cur[4], d2)
            cur[5], cur[6] = min(cur[5], zk), max(cur[6], zk)

        got = (
            docs_zorder_layout(SF)
            .to_pandas()
            .sort_values("part")
            .reset_index(drop=True)
        )
        assert list(got["part"]) == sorted(zone)
        for _, r in got.iterrows():
            n, d1mn, d1mx, d2mn, d2mx, zmn, zmx = zone[int(r["part"])]
            assert (
                r["n_docs"],
                r["d1_min"],
                r["d1_max"],
                r["d2_min"],
                r["d2_max"],
                r["z_min"],
                r["z_max"],
            ) == (n, d1mn, d1mx, d2mn, d2mx, zmn, zmx)


@pytest.mark.usefixtures("ray_session")
class TestKendallTau:
    def test_perfect_concordance(self, tmp_path):
        """Counts and values both strictly increasing by day: tau = 1
        exactly (signed square = 1e6). Build k+1 events on day k with
        value k+1 dollars each: count = k+1, sum = (k+1)^2 dollars."""
        rows = []
        for d in range(6):
            for _ in range(d + 1):
                rows.append((d, "up", float(d + 1)))
        _write_events(tmp_path, rows)
        from suckit_ray.pipelines.relops import events_kendall_tau

        got = events_kendall_tau(str(tmp_path)).to_pandas().iloc[0]
        n = 6
        n0 = n * (n - 1) // 2
        assert got["concordant"] == n0
        assert got["discordant"] == 0
        assert got["tau2_micro"] == 1_000_000

    def test_matches_python_pair_replay(self, tmp_path):
        rng = np.random.RandomState(7)
        rows = []
        for d in range(25):
            for _ in range(int(rng.randint(0, 5))):
                rows.append((d, "r", float(rng.randint(1, 500)) / 10))
        # guarantee both endpoints exist so the span is fixed
        rows.append((0, "r", 1.0))
        rows.append((24, "r", 1.0))
        _write_events(tmp_path, rows)
        from suckit_ray.pipelines.relops import events_kendall_tau

        got = events_kendall_tau(str(tmp_path)).to_pandas().iloc[0]
        xs = [0] * 25
        ys = [0] * 25
        for d, _, v in rows:
            xs[d] += 1
            ys[d] += int(round(v * 100))
        conc = disc = tx = ty = 0
        n0 = 0
        for i in range(25):
            for j in range(i + 1, 25):
                n0 += 1
                dx, dy = xs[i] - xs[j], ys[i] - ys[j]
                if dx * dy > 0:
                    conc += 1
                elif dx * dy < 0:
                    disc += 1
                if dx == 0:
                    tx += 1
                if dy == 0:
                    ty += 1
        den = (n0 - tx) * (n0 - ty)
        d_ = conc - disc
        want = (
            0
            if den == 0
            else (1 if d_ >= 0 else -1) * ((d_ * d_ * 1_000_000) // den)
        )
        assert (got["concordant"], got["discordant"]) == (conc, disc)
        assert got["tau2_micro"] == want

    def test_constant_series_zero(self, tmp_path):
        _write_events(tmp_path, [(d, "c", 5.0) for d in range(8)])
        from suckit_ray.pipelines.relops import events_kendall_tau

        got = events_kendall_tau(str(tmp_path)).to_pandas().iloc[0]
        assert got["tau2_micro"] == 0  # all pairs tied on both axes


@pytest.mark.usefixtures("ray_session")
class TestSeqSupport:
    def _write_user_events(self, tmp_path, rows):
        """rows: (user, ts_us, etype)."""
        tbl = pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([t for _, t, _ in rows], pa.timestamp("us")),
                "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
                "event_type": pa.array([e for _, _, e in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        pq.write_table(tbl, tmp_path / "events.parquet")

    def test_order_sensitivity(self, tmp_path):
        """user 1: a then b (a->b counts, b->a not); user 2: b then a
        (both directions? b->a counts; a's min > b's max so a->b not);
        user 3: a and b at the SAME instant (strictly-before: neither)."""
        self._write_user_events(
            tmp_path,
            [
                (1, 100, "a"),
                (1, 200, "b"),
                (2, 300, "b"),
                (2, 400, "a"),
                (3, 500, "a"),
                (3, 500, "b"),
            ],
        )
        from suckit_ray.pipelines.relops import events_seq_support

        got = events_seq_support(str(tmp_path)).to_pandas()
        d = {
            (r["type_a"], r["type_b"]): r["n_users"]
            for _, r in got.iterrows()
        }
        assert d == {("a", "b"): 1, ("b", "a"): 1}

    def test_matches_pandas_reference_on_sf(self):
        from suckit_ray.pipelines.relops import events_seq_support

        got = events_seq_support(SF).to_pandas()
        ev = pq.read_table(
            f"{SF}/events.parquet", columns=["user_id", "event_type", "ts"]
        ).to_pandas()
        m = ev.groupby(["user_id", "event_type"])["ts"].agg(["min", "max"])
        want: dict = {}
        for uid, sub in m.groupby(level=0):
            items = [
                (t, row["min"], row["max"])
                for (_, t), row in sub.iterrows()
            ]
            for ta, mna, _ in items:
                for tb, _, mxb in items:
                    if ta != tb and mna < mxb:
                        want[(ta, tb)] = want.get((ta, tb), 0) + 1
        gotd = {
            (r["type_a"], r["type_b"]): r["n_users"]
            for _, r in got.iterrows()
        }
        assert gotd == want
        # directionality exists: overlap counts both ways, sequence
        # support needn't be symmetric in general, but every pair must
        # be bounded by the co-occurrence count
        assert all(v > 0 for v in gotd.values())
