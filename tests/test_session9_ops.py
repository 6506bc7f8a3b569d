"""Ninth-session operator pins: KMV/theta set-intersection sketches
and the exact type-pair user-overlap they estimate."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


class TestKmvSketch:
    def test_merge_associative_and_order_insensitive(self):
        from suckit_ray.stages.sketch import kmv_merge, kmv_partial

        rng = np.random.default_rng(7)
        keys = rng.integers(0, 1 << 40, size=5000, dtype=np.int64)
        whole = kmv_partial(keys)
        parts = [kmv_partial(keys[i::4]).tobytes() for i in range(4)]
        assert np.array_equal(kmv_merge(parts), whole)
        assert np.array_equal(kmv_merge(parts[::-1]), whole)

    def test_exact_below_k(self):
        from suckit_ray.stages.sketch import (
            kmv_intersection_estimate,
            kmv_partial,
        )

        a = kmv_partial(np.arange(0, 400))
        b = kmv_partial(np.arange(250, 700))
        assert kmv_intersection_estimate(a, b) == 150

    def test_truncated_estimate_within_bound(self):
        """Overlapping integer ranges well past k: relative error of
        the theta intersection stays within ~4/√k of truth
        (deterministic — splitmix64 is seedless)."""
        from suckit_ray.stages.sketch import (
            kmv_intersection_estimate,
            kmv_partial,
        )

        k = 256
        bound = 4.0 / np.sqrt(k)  # 0.25
        for lo, n, true in [
            (1500, 3000, 1500),
            (2000, 7000, 1000),
            (500, 3000, 2500),
        ]:
            a = kmv_partial(np.arange(0, 3000), k=k)
            b = kmv_partial(np.arange(lo, lo + n), k=k)
            est = kmv_intersection_estimate(a, b, k=k)
            assert abs(est - true) / true <= bound, (lo, n, est)


@pytest.mark.usefixtures("ray_session")
class TestUserOverlap:
    def test_exact_matches_pandas_reference(self):
        from suckit_ray.pipelines.relops import events_user_overlap

        got = events_user_overlap(SF).to_pandas()
        ev = pq.read_table(
            f"{SF}/events.parquet", columns=["event_type", "user_id"]
        ).to_pandas()
        du = ev.drop_duplicates()
        m = du.merge(du, on="user_id", suffixes=("_x", "_y"))
        m = m[m["event_type_x"] < m["event_type_y"]]
        want = (
            m.groupby(["event_type_x", "event_type_y"])
            .size()
            .to_dict()
        )
        have = {
            (a, b): int(n)
            for a, b, n in zip(got["a"], got["b"], got["n_users"])
        }
        assert have == want and len(want) == 10

    def test_theta_exact_at_small_sf(self):
        """sf0.001 has 15 users per type — far below k, so every
        sketch is exact and the estimates EQUAL the exact overlap."""
        from suckit_ray.pipelines.relops import (
            events_user_overlap,
            events_user_overlap_theta,
        )

        exact = events_user_overlap(SF).to_pandas()
        est = events_user_overlap_theta(SF).to_pandas()
        e = dict(zip(zip(exact["a"], exact["b"]), exact["n_users"]))
        s = dict(zip(zip(est["a"], est["b"]), est["n_users_est"]))
        assert {k: int(v) for k, v in e.items()} == {
            k: int(v) for k, v in s.items()
        }

    def test_theta_error_bound_on_engineered_overlaps(self, tmp_path):
        """5000-user types with controlled partial overlaps, k=256 —
        the sketches truncate and the estimates must stay within
        4/√k of the exact intersections (and the overlap structure
        must be non-degenerate: three distinct truths)."""
        from suckit_ray.pipelines.relops import (
            events_user_overlap,
            events_user_overlap_theta,
        )

        rows = []
        for et, lo, n in [("A", 0, 5000), ("B", 3000, 5000), ("C", 4500, 5000)]:
            rows.append(
                pd.DataFrame({"event_type": et, "user_id": np.arange(lo, lo + n)})
            )
        df = pd.concat(rows, ignore_index=True)
        # scatter rows so batches interleave types
        df = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
        p = str(tmp_path / "events.parquet")
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), p)

        exact = events_user_overlap(str(tmp_path)).to_pandas()
        e = dict(zip(zip(exact["a"], exact["b"]), exact["n_users"]))
        assert e == {("A", "B"): 2000, ("A", "C"): 500, ("B", "C"): 3500}

        k = 256
        est = events_user_overlap_theta(str(tmp_path), k=k).to_pandas()
        s = dict(zip(zip(est["a"], est["b"]), est["n_users_est"]))
        bound = 4.0 / np.sqrt(k)
        for key, true in e.items():
            assert abs(int(s[key]) - int(true)) / int(true) <= bound, (
                key,
                s[key],
                true,
            )


@pytest.mark.usefixtures("ray_session")
class TestEventsRegression:
    def test_matches_numpy_polyfit(self):
        """Independent float check on real data: the integer nano
        slope/intercept agree with numpy's least-squares fit."""
        from suckit_ray.pipelines.relops import (
            REGRESSION_ANCHOR_MIN,
            events_regression,
            to_cents,
        )

        got = events_regression(SF).to_pandas()
        ev = pq.read_table(
            f"{SF}/events.parquet", columns=["event_type", "ts", "value"]
        ).to_pandas()
        ev["x"] = (
            ev["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            // 60_000_000
            - REGRESSION_ANCHOR_MIN
        )
        ev["y"] = to_cents(ev["value"])
        for _, r in got.iterrows():
            g = ev[ev["event_type"] == r["event_type"]]
            slope, intercept = np.polyfit(g["x"], g["y"], 1)
            assert abs(r["slope_nano"] / 1e9 - slope) < 1e-6
            assert abs(r["intercept_nano"] / 1e9 - intercept) < 1e-3

    def test_negative_slope_truncates_toward_zero(self, tmp_path):
        """x=[0,1,3], y=[10,9,2] cents → slope = −39/14, whose nano
        quotient differs between floor (−2785714286) and DuckDB's
        truncation (−2785714285); one ts carries a +30 s offset to pin
        the minute flooring. A second type guards group separation."""
        from suckit_ray.pipelines.relops import (
            REGRESSION_ANCHOR_MIN,
            events_regression,
        )

        anchor_us = REGRESSION_ANCHOR_MIN * 60_000_000
        rows = []
        for x, y, extra in [(0, 0.10, 0), (1, 0.09, 30_000_000), (3, 0.02, 0)]:
            rows.append(("neg", anchor_us + x * 60_000_000 + extra, y))
        for x, y in [(0, 0.01), (1, 0.02), (2, 0.03)]:
            rows.append(("pos", anchor_us + x * 60_000_000, y))
        df = pd.DataFrame(rows, columns=["event_type", "ts_us", "value"])
        df["ts"] = df["ts_us"].astype("datetime64[us]")
        pq.write_table(
            pa.Table.from_pandas(
                df[["event_type", "ts", "value"]], preserve_index=False
            ),
            str(tmp_path / "events.parquet"),
        )
        got = (
            events_regression(str(tmp_path))
            .to_pandas()
            .set_index("event_type")
        )
        assert got.loc["neg", "slope_nano"] == -2_785_714_285
        assert got.loc["neg", "intercept_nano"] == 10_714_285_714
        assert got.loc["pos", "slope_nano"] == 1_000_000_000
        assert got.loc["pos", "intercept_nano"] == 1_000_000_000


@pytest.mark.usefixtures("ray_session")
class TestPqTopk:
    def test_recall_vs_brute_force(self):
        from suckit_ray.pipelines.ann import brute_force_topk, pq_topk

        bf = brute_force_topk(SF).to_pandas()
        got = pq_topk(SF).to_pandas()
        recalls = []
        for q in bf["query_id"].unique():
            truth = set(bf[bf["query_id"] == q]["neighbor_id"])
            approx = set(got[got["query_id"] == q]["neighbor_id"])
            recalls.append(len(truth & approx) / len(truth))
        assert np.mean(recalls) >= 0.85 and min(recalls) >= 0.6

    def test_scores_exact_and_deterministic(self):
        """Re-ranked cos_pct must EQUAL brute force's for every
        neighbor PQ finds (the +R rescore is exact), and repeated
        runs must be identical (seeded codebooks, order-free merge)."""
        from suckit_ray.pipelines.ann import brute_force_topk, pq_topk

        bf = brute_force_topk(SF).to_pandas()
        got = pq_topk(SF).to_pandas()
        truth = {
            (q, n): p
            for q, n, p in zip(bf["query_id"], bf["neighbor_id"], bf["cos_pct"])
        }
        for q, n, p in zip(got["query_id"], got["neighbor_id"], got["cos_pct"]):
            if (q, n) in truth:
                assert truth[(q, n)] == p
        again = pq_topk(SF).to_pandas()
        pd.testing.assert_frame_equal(got, again)

    def test_codebook_roundtrip_reduces_error(self):
        """Encoding then reconstructing from codewords must be closer
        to the input than a zero reconstruction (codebooks learned
        something), and codes use the full uint8 range domain."""
        from suckit_ray.pipelines.ann import _pq_encode, _train_pq_codebooks

        rng = np.random.default_rng(5)
        x = rng.normal(size=(1500, 64))
        x /= np.linalg.norm(x, axis=1)[:, None]
        books = _train_pq_codebooks(x)
        codes = _pq_encode(x, books)
        m_sub, ks, sub = books.shape
        recon = np.concatenate(
            [books[s][codes[:, s]] for s in range(m_sub)], axis=1
        )
        err = np.linalg.norm(x - recon, axis=1).mean()
        assert err < np.linalg.norm(x, axis=1).mean() * 0.9
        assert codes.max() > 100  # ks=256 domain actually exercised


@pytest.mark.usefixtures("ray_session")
class TestEventsCusum:
    @staticmethod
    def _recursion(daily: pd.DataFrame) -> pd.DataFrame:
        """Independent reference: the literal S_t = max(0, S+(x−k))
        recursion over the dense global-span grid — pins the engine's
        closed-form (prefix sum − running min) rewrite."""
        from suckit_ray.pipelines.relops import _trunc_div

        lo, hi = int(daily["day"].min()), int(daily["day"].max())
        days = list(range(lo, hi + 1))
        out = []
        for t, g in daily.groupby("event_type"):
            xs = g.set_index("day")["x"].reindex(days).fillna(0).astype(int)
            k = _trunc_div(int(xs.sum()), len(days))
            s = 0
            for d in days:
                s = max(0, s + int(xs[d]) - k)
                out.append((t, d, s))
        return pd.DataFrame(out, columns=["event_type", "day", "cusum"])

    def test_closed_form_equals_recursion_on_real_data(self):
        from suckit_ray.pipelines.relops import US_PER_DAY, events_cusum, to_cents

        got = (
            events_cusum(SF)
            .to_pandas()
            .sort_values(["event_type", "day"])
            .reset_index(drop=True)
        )
        ev = pq.read_table(
            f"{SF}/events.parquet", columns=["event_type", "ts", "value"]
        ).to_pandas()
        us = ev["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        ev["day"] = us // US_PER_DAY  # sf data is post-epoch: floor == trunc
        ev["x"] = to_cents(ev["value"])
        daily = ev.groupby(["event_type", "day"], as_index=False).agg(x=("x", "sum"))
        want = (
            self._recursion(daily)
            .sort_values(["event_type", "day"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert (got["cusum"] >= 0).all()

    def test_mean_shift_pre_epoch_and_gap(self, tmp_path):
        """Engineered series: type 'a' holds 1.00/day for 4 days then
        jumps to 5.00/day — CUSUM must sit at/near zero through the
        quiet prefix and climb monotonically after the shift. One
        event sits BEFORE the epoch with a nonzero remainder, pinning
        the truncating day assignment (floor would shift it a day
        earlier and move the whole grid); day 1 is a silent gap that
        must still appear in the output."""
        from suckit_ray.pipelines.relops import US_PER_DAY, events_cusum

        rows = []
        # pre-epoch event: us = -0.5 day → truncating day 0 - 1?  No:
        # trunc(-0.5) = 0 ... make it unambiguous: -1.5 days → day -1.
        rows.append(("a", -int(1.5 * US_PER_DAY), 1.00))
        for d in [0, 2, 3]:  # day 1 is the gap
            rows.append(("a", d * US_PER_DAY + 7, 1.00))
        for d in [4, 5, 6]:
            rows.append(("a", d * US_PER_DAY + 7, 5.00))
        df = pd.DataFrame(rows, columns=["event_type", "us", "value"])
        df["ts"] = df["us"].astype("datetime64[us]")
        pq.write_table(
            pa.Table.from_pandas(
                df[["event_type", "ts", "value"]], preserve_index=False
            ),
            str(tmp_path / "events.parquet"),
        )
        got = (
            events_cusum(str(tmp_path))
            .to_pandas()
            .sort_values(["event_type", "day"])
            .reset_index(drop=True)
        )
        # truncating division puts the -1.5-day event on day -1
        assert got["day"].min() == -1
        assert got["day"].max() == 6
        assert len(got) == 8  # dense grid incl. the day-1 gap row
        # independent recursion over the same engineered daily sums
        us = df["us"].to_numpy()
        day = us // US_PER_DAY
        day = day + ((us < 0) & (day * US_PER_DAY != us))
        daily = pd.DataFrame(
            {"event_type": "a", "day": day, "x": (df["value"] * 100).astype(int)}
        ).groupby(["event_type", "day"], as_index=False).agg(x=("x", "sum"))
        want = (
            self._recursion(daily)
            .sort_values(["event_type", "day"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        tail = got[got["day"] >= 4]["cusum"].to_numpy()
        assert (np.diff(tail) > 0).all()  # climbs through the shift
        assert got[got["day"] < 4]["cusum"].max() <= got["cusum"].iloc[-1] // 3


@pytest.mark.usefixtures("ray_session")
class TestContainmentPairs:
    def test_subset_doc_caught_only_by_containment(self, tmp_path):
        """Doc 2 is doc 1 quoted whole inside ~4× more text: its
        shingle sets give containment 100% but Jaccard ≈ 0.26 — below
        the 0.5 dedup threshold. Containment must report the pair
        (cont_pct 10000) while the Jaccard query stays silent. An
        unrelated doc 3 must pair with neither."""
        from suckit_ray.pipelines.dedup import (
            ngram_containment_pairs,
            ngram_jaccard_pairs,
        )

        core = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(8))
        filler = " ".join(f"filler{i} pad{i} text{i}" for i in range(30))
        docs = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [core, core + " " + filler, "zeta eta theta iota kappa"],
            }
        )
        pq.write_table(
            pa.Table.from_pandas(docs, preserve_index=False),
            str(tmp_path / "documents.parquet"),
        )
        cont = ngram_containment_pairs(str(tmp_path)).to_pandas()
        jac = ngram_jaccard_pairs(str(tmp_path)).to_pandas()
        assert list(map(tuple, cont[["a_id", "b_id"]].to_numpy())) == [(1, 2)]
        assert cont["cont_pct"].tolist() == [10_000]
        assert len(jac) == 0

    def test_all_integer_threshold_boundary(self, tmp_path):
        """Pair engineered to sit EXACTLY at 80%: |A∩B| = 4 of A's 5
        shingles (min side). 100·4 ≥ 80·5 must keep it; one shingle
        fewer (60%) must drop it — pins the ≥ (not >) integer gate."""
        from suckit_ray.pipelines.dedup import ngram_containment_pairs

        # 7 tokens → 5 trigram shingles; doc 20 shares exactly 4 of
        # them (same first 6 tokens, different last), doc 30 shares 3.
        a = "t1 t2 t3 t4 t5 t6 t7"
        b = "t1 t2 t3 t4 t5 t6 X " + " ".join(f"p{i} q{i} r{i}" for i in range(10))
        c = "t1 t2 t3 t4 t5 Y Z " + " ".join(f"s{i} u{i} v{i}" for i in range(10))
        docs = pd.DataFrame({"doc_id": [10, 20, 30], "text": [a, b, c]})
        pq.write_table(
            pa.Table.from_pandas(docs, preserve_index=False),
            str(tmp_path / "documents.parquet"),
        )
        got = ngram_containment_pairs(str(tmp_path)).to_pandas()
        pairs = set(map(tuple, got[["a_id", "b_id"]].to_numpy()))
        assert (10, 20) in pairs  # 4/5 = 80% — boundary kept
        assert (10, 30) not in pairs  # 3/5 = 60% — dropped
        row = got.set_index(["a_id", "b_id"]).loc[(10, 20)]
        assert int(row["cont_pct"]) == 8_000


@pytest.mark.usefixtures("ray_session")
class TestReferentialAudit:
    def test_engineered_violations_all_fire(self, tmp_path):
        """One violation of each kind in a 4-customer micro-schema —
        including the orphan directions the synthetic corpus never
        exercises (its only natural violation is
        orders_without_lineitems)."""
        from suckit_ray.pipelines.relops import referential_audit

        pq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array([1, 2, 3], pa.int64()),
                    "c_name": ["a", "b", "c"],
                }
            ),
            str(tmp_path / "customer.parquet"),
        )
        # order 10→cust1 (has items), 11→cust2 (NO items),
        # 12→cust99 (orphan customer, has items); cust3 has no orders
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([10, 11, 12], pa.int64()),
                    "o_custkey": pa.array([1, 2, 99], pa.int64()),
                    "o_totalprice": pa.array([5.0, -2.0, 7.0], pa.float64()),
                }
            ),
            str(tmp_path / "orders.parquet"),
        )
        # two lineitems on order 10 (one bad qty, one bad discount),
        # one on orphan order 12, two on nonexistent order 77
        pq.write_table(
            pa.table(
                {
                    "l_orderkey": pa.array([10, 10, 12, 77, 77], pa.int64()),
                    "l_quantity": pa.array([-1.0, 2.0, 3.0, 1.0, 1.0]),
                    "l_discount": pa.array([0.1, 0.9, 0.0, 0.0, 0.0]),
                }
            ),
            str(tmp_path / "lineitem.parquet"),
        )
        got = (
            referential_audit(str(tmp_path))
            .to_pandas()
            .set_index("rule")["n_violations"]
        )
        assert got["customers_without_orders"] == 1  # cust 3
        assert got["orders_orphaned_customer"] == 1  # order 12
        assert got["orders_without_lineitems"] == 1  # order 11
        assert got["lineitems_orphaned"] == 2  # both rows on order 77
        assert got["lineitem_nonpositive_quantity"] == 1
        assert got["lineitem_discount_out_of_range"] == 1
        assert got["orders_nonpositive_total"] == 1

    def test_all_rules_present_at_zero(self, tmp_path):
        """A fully consistent micro-dataset must still emit all seven
        rules, each at zero — silence is not a pass."""
        from suckit_ray.pipelines.relops import AUDIT_RULES, referential_audit

        pq.write_table(
            pa.table({"c_custkey": pa.array([1], pa.int64()), "c_name": ["a"]}),
            str(tmp_path / "customer.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([10], pa.int64()),
                    "o_custkey": pa.array([1], pa.int64()),
                    "o_totalprice": pa.array([5.0], pa.float64()),
                }
            ),
            str(tmp_path / "orders.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "l_orderkey": pa.array([10], pa.int64()),
                    "l_quantity": pa.array([2.0]),
                    "l_discount": pa.array([0.1]),
                }
            ),
            str(tmp_path / "lineitem.parquet"),
        )
        got = referential_audit(str(tmp_path)).to_pandas()
        assert got["rule"].tolist() == AUDIT_RULES
        assert got["n_violations"].tolist() == [0] * 7


@pytest.mark.usefixtures("ray_session")
class TestEmbeddingsDrift:
    def test_known_mean_shift_and_missing_snapshot_label(self, tmp_path):
        """Label 0: snapshot means differ by exactly 1.0 in dims 1-2 of
        4 (quantized 10^6 each), so d2_num = 2·(n_a·n_b·10^6)² with
        n_a = n_b = 2. Label 1 exists only in snapshot A (odd ids
        missing) and must be dropped. Label 2 is identical across
        snapshots → d2 = 0."""
        from suckit_ray.pipelines.ann import embeddings_drift

        rows = []
        # label 0: even (snap A) at [1,1,0,0], odd (snap B) at [2,2,0,0]
        rows += [(0, 0, [1.0, 1.0, 0.0, 0.0]), (2, 0, [1.0, 1.0, 0.0, 0.0])]
        rows += [(1, 0, [2.0, 2.0, 0.0, 0.0]), (3, 0, [2.0, 2.0, 0.0, 0.0])]
        # label 1: only even ids
        rows += [(4, 1, [5.0, 0.0, 0.0, 0.0]), (6, 1, [5.0, 0.0, 0.0, 0.0])]
        # label 2: identical across the split
        rows += [(8, 2, [0.5, 0.5, 0.5, 0.5]), (9, 2, [0.5, 0.5, 0.5, 0.5])]
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                    "embedding": pa.array(
                        [r[2] for r in rows], pa.list_(pa.float32())
                    ),
                    "label": pa.array([r[1] for r in rows], pa.int32()),
                }
            ),
            str(tmp_path / "embeddings.parquet"),
        )
        got = embeddings_drift(str(tmp_path)).to_pandas().set_index("label")
        assert list(got.index) == [0, 2]  # label 1 dropped
        na, nb = 2, 2
        # per shifted dim: (s_a·n_b − s_b·n_a) = (2·10^6·2 − 4·10^6·2) = −4·10^6... 
        # computed literally below instead of in prose:
        sa, sb = 2 * 10**6, 2 * (2 * 10**6)
        d2 = 2 * (sa * nb - sb * na) ** 2
        assert got.loc[0, "d2_scaled"] == d2 // 10**12
        assert got.loc[0, "n_a"] == na and got.loc[0, "n_b"] == nb
        assert got.loc[2, "d2_scaled"] == 0


@pytest.mark.usefixtures("ray_session")
class TestYoyAndTopkTies:
    def test_yoy_negative_growth_truncates_toward_zero(self, tmp_path):
        """2023-01 rev 300, 2024-01 rev 100 → growth −2000000/3 micro:
        floor gives −666667, DuckDB truncation −666666 — pins the
        division convention. 2024-03 has no 2023-03 and must vanish."""
        from suckit_ray.pipelines.relops import orders_yoy_growth

        rows = [
            ("2023-01-15", 3.00),
            ("2024-01-20", 1.00),
            ("2023-02-01", 1.00),
            ("2024-02-01", 3.00),
            ("2024-03-01", 9.99),  # no prior-year month
        ]
        df = pd.DataFrame(rows, columns=["d", "o_totalprice"])
        df["o_orderdate"] = df["d"].astype("datetime64[us]")
        pq.write_table(
            pa.Table.from_pandas(
                df[["o_orderdate", "o_totalprice"]], preserve_index=False
            ),
            str(tmp_path / "orders.parquet"),
        )
        got = orders_yoy_growth(str(tmp_path)).to_pandas()
        got = got.set_index(["year", "month"])
        assert (2024, 3) not in got.index
        assert got.loc[(2024, 1), "growth_micro"] == -666_666
        assert got.loc[(2024, 2), "growth_micro"] == 2_000_000

    def test_topk_ties_widen_the_result(self, tmp_path):
        """Six parts of one type: prices 9,9,8,7,7,1 with k=5 → the
        two 7s share rank 4 and 1 takes rank 6 (excluded), so exactly
        5 rows with ranks [1,1,3,4,4] — RANK semantics, not
        ROW_NUMBER and not DENSE_RANK."""
        from suckit_ray.pipelines.relops import part_price_topk_ties

        pq.write_table(
            pa.table(
                {
                    "p_partkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                    "p_type": ["T"] * 6,
                    "p_retailprice": pa.array([9.0, 9.0, 8.0, 7.0, 7.0, 1.0]),
                }
            ),
            str(tmp_path / "part.parquet"),
        )
        got = (
            part_price_topk_ties(str(tmp_path))
            .to_pandas()
            .sort_values("p_partkey")
            .reset_index(drop=True)
        )
        assert got["p_partkey"].tolist() == [1, 2, 3, 4, 5]
        assert got["rnk"].tolist() == [1, 1, 3, 4, 4]


@pytest.mark.usefixtures("ray_session")
class TestMediaDedup:
    def test_digest_discriminates_distinct_bodies(self):
        """The synthetic corpus shares one asset body (single cluster —
        covered by the oracle); here distinct bodies must NOT merge:
        three assets, two identical, one different, plus an HTML row
        that must be ignored."""
        import ray.data as rd

        from suckit_ray.pipelines import flagship
        from suckit_ray.pipelines.flagship import crawl_media_dedup

        tbl = pa.table(
            {
                "doc_id": ["h.test//a.jpg", "h.test//b.jpg", "h.test//c.jpg",
                            "h.test/p.html"],
                "is_html": [False, False, False, True],
                "body": [b"\xff\xd8same", b"\xff\xd8same", b"\xff\xd8other",
                          b"<html>"],
            }
        )
        orig = flagship.crawl_docs
        flagship.crawl_docs = lambda sf: rd.from_arrow(tbl)
        try:
            got = (
                crawl_media_dedup("ignored")
                .to_pandas()
                .sort_values("doc_id")
                .set_index("doc_id")
            )
        finally:
            flagship.crawl_docs = orig
        assert list(got.index) == [
            "h.test//a.jpg", "h.test//b.jpg", "h.test//c.jpg"
        ]  # the HTML row is excluded
        assert got.loc["h.test//a.jpg", "canonical_id"] == "h.test//a.jpg"
        assert got.loc["h.test//b.jpg", "canonical_id"] == "h.test//a.jpg"
        assert got.loc["h.test//b.jpg", "n_copies"] == 2
        assert got.loc["h.test//c.jpg", "canonical_id"] == "h.test//c.jpg"
        assert got.loc["h.test//c.jpg", "n_copies"] == 1


@pytest.mark.usefixtures("ray_session")
class TestKAnonymity:
    def test_boundary_and_safe_groups(self, tmp_path):
        """Class of exactly k−1 is risky; class of exactly k is safe —
        pins the strict < k gate."""
        from suckit_ray.pipelines.relops import customer_k_anonymity

        rows = [(1, "A")] * 9 + [(2, "B")] * 10 + [(3, "C")] * 1
        pq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array(range(len(rows)), pa.int64()),
                    "c_nationkey": pa.array([r[0] for r in rows], pa.int32()),
                    "c_mktsegment": [r[1] for r in rows],
                }
            ),
            str(tmp_path / "customer.parquet"),
        )
        got = (
            customer_k_anonymity(str(tmp_path))
            .to_pandas()
            .sort_values("c_nationkey")
            .reset_index(drop=True)
        )
        assert list(map(tuple, got.to_numpy())) == [
            (1, "A", 9),
            (3, "C", 1),
        ]


@pytest.mark.usefixtures("ray_session")
class TestTableStats:
    def test_nulls_excluded_from_ndv_and_counted(self, tmp_path):
        """SQL count(DISTINCT) ignores NULLs; n_null counts them. Also
        pins the float-vs-int value-hash separation (1 and 1.0 in
        DIFFERENT columns don't interact) and duplicate collapse."""
        from suckit_ray.pipelines import relops
        from suckit_ray.pipelines.relops import table_stats

        pq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array([1, 2, 2, 3], pa.int64()),
                    "c_name": pa.array(["x", None, "x", None], pa.string()),
                    "c_nationkey": pa.array([7, 7, 7, 7], pa.int32()),
                    "c_acctbal": pa.array([1.0, 1.0, None, 2.5], pa.float64()),
                    "c_mktsegment": ["A", "B", "A", "B"],
                }
            ),
            str(tmp_path / "customer.parquet"),
        )
        orig = relops.STATS_TABLES
        relops.STATS_TABLES = {"customer": orig["customer"]}
        try:
            got = (
                table_stats(str(tmp_path))
                .to_pandas()
                .set_index("col")[["n_rows", "n_null", "n_distinct"]]
            )
        finally:
            relops.STATS_TABLES = orig
        assert got.loc["c_custkey"].tolist() == [4, 0, 3]
        assert got.loc["c_name"].tolist() == [4, 2, 1]
        assert got.loc["c_nationkey"].tolist() == [4, 0, 1]
        assert got.loc["c_acctbal"].tolist() == [4, 1, 2]
        assert got.loc["c_mktsegment"].tolist() == [4, 0, 2]


@pytest.mark.usefixtures("ray_session")
class TestEventsValueMad:
    def test_hand_values_and_outlier_insensitivity(self, tmp_path):
        """[1,2,3,4,100] dollars → median 300 cents (quantile_disc
        rank ceil(2.5)=3), deviations [200,100,0,100,9700] → MAD 100;
        the 100-dollar outlier moves neither (σ would explode)."""
        from suckit_ray.pipelines.relops import events_value_mad

        df = pd.DataFrame(
            {
                "event_type": ["t"] * 5,
                "value": [1.0, 2.0, 3.0, 4.0, 100.0],
            }
        )
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            str(tmp_path / "events.parquet"),
        )
        got = events_value_mad(str(tmp_path)).to_pandas().iloc[0]
        assert (got["n"], got["median_cents"], got["mad_cents"]) == (5, 300, 100)
        # even-n discrete rule: [1,2,3,4] → rank ceil(2)=2 → median 200
        df2 = df.iloc[:4]
        pq.write_table(
            pa.Table.from_pandas(df2, preserve_index=False),
            str(tmp_path / "events.parquet"),
        )
        got2 = events_value_mad(str(tmp_path)).to_pandas().iloc[0]
        assert (got2["median_cents"], got2["mad_cents"]) == (200, 100)


@pytest.mark.usefixtures("ray_session")
class TestChunkDedup:
    def test_reference_chunker_equality_and_locality(self):
        """The vectorized uint64 chunker equals a literal per-byte
        Horner reference (same base/window/masks), reassembles
        losslessly, and has the CDC property: a one-byte edit and a
        3-byte insertion each disturb O(1) chunks."""
        import random

        from suckit_ray.pipelines.dedup import (
            CDC_MASK_BITS,
            CDC_MAX,
            CDC_MIN,
            CDC_WINDOW,
            _CDC_BASE,
            cdc_chunks,
        )

        def reference(data):
            n, w = len(data), CDC_WINDOW
            if n == 0:
                return []
            if n <= w:
                return [data]
            cuts, prev = [], 0
            mask = (1 << CDC_MASK_BITS) - 1
            for i in range(n - w + 1):
                h = 0
                for b in data[i : i + w]:
                    h = (h * _CDC_BASE + b) % (1 << 64)
                end = i + w
                if (h & mask) == 0 and end < n and end - prev >= CDC_MIN:
                    cuts.append(end)
                    prev = end
            final, prev = [], 0
            for c in cuts + [n]:
                while c - prev > CDC_MAX:
                    prev += CDC_MAX
                    final.append(prev)
                if c < n:
                    final.append(c)
                prev = c
            out, prev = [], 0
            for c in final + [n]:
                if c > prev:
                    out.append(data[prev:c])
                    prev = c
            return out

        random.seed(11)
        data = bytes(random.randrange(256) for _ in range(8000))
        ch = cdc_chunks(data)
        assert ch == reference(data)
        assert b"".join(ch) == data
        assert all(len(c) <= 1024 for c in ch)
        edited = data[:4000] + bytes([data[4000] ^ 1]) + data[4001:]
        assert len(set(cdc_chunks(edited)) - set(ch)) <= 2
        inserted = data[:4000] + b"ins" + data[4000:]
        assert len(set(cdc_chunks(inserted)) - set(ch)) <= 2

    def test_stats_on_engineered_hosts(self):
        """Two hosts: host a stores the same body twice (dup ratio
        ~50%), host b stores two unrelated bodies (ratio ~0)."""
        import random

        import ray.data as rd

        from suckit_ray.pipelines.dedup import chunk_dedup_stats_from_docs

        random.seed(3)
        body1 = bytes(random.randrange(256) for _ in range(5000))
        body2 = bytes(random.randrange(256) for _ in range(5000))
        tbl = pa.table(
            {
                "host": ["a", "a", "b", "b"],
                "body": [body1, body1, body1, body2],
            }
        )
        got = (
            chunk_dedup_stats_from_docs(rd.from_arrow(tbl))
            .to_pandas()
            .set_index("host")
        )
        assert got.loc["a", "dup_byte_ratio_micro"] == 500_000
        assert got.loc["a", "bytes_total"] == 2 * got.loc["a", "bytes_unique"]
        assert got.loc["b", "dup_byte_ratio_micro"] < 20_000
        assert got.loc["b", "n_unique_chunks"] <= got.loc["b", "n_chunks"]


@pytest.mark.usefixtures("ray_session")
class TestDeltaBytes:
    def test_identical_zero_and_edit_locality(self):
        """v1==v2 → bytes_new 0; a small mid-page edit ships only the
        touched chunks (delta ≪ page size); an added page is excluded
        (crawl_diff's domain)."""
        import random

        import ray.data as rd

        from suckit_ray.pipelines import flagship
        from suckit_ray.pipelines.dedup import crawl_delta_bytes

        random.seed(5)
        body = bytes(random.randrange(256) for _ in range(8000))
        edited = body[:4000] + bytes([body[4000] ^ 1]) + body[4001:]

        def docs(bodies):
            return rd.from_arrow(
                pa.table(
                    {
                        "doc_id": [f"h.test/p{i}.html" for i in range(len(bodies))],
                        "host": ["h.test"] * len(bodies),
                        "body": bodies,
                    }
                )
            )

        orig1, orig2 = flagship.crawl_docs, flagship.crawl_docs_v2
        flagship.crawl_docs = lambda sf: docs([body, body])
        flagship.crawl_docs_v2 = lambda sf: docs([body, edited, b"new page"])
        try:
            got = crawl_delta_bytes("ignored").to_pandas().iloc[0]
        finally:
            flagship.crawl_docs, flagship.crawl_docs_v2 = orig1, orig2
        assert got["docs_both"] == 2  # the added page is excluded
        assert got["bytes_v2"] == 8000 + 8000  # one-byte REPLACE keeps length
        # unchanged doc ships nothing; the edited doc ships only the
        # chunks covering the flipped byte
        assert 0 < got["bytes_new"] <= 2 * 1024
        assert got["delta_ratio_micro"] < 150_000


@pytest.mark.usefixtures("ray_session")
class TestOrdersPareto:
    def test_hand_distribution(self, tmp_path):
        """Revenues [50,30,10,5,5] (one order each): total 100, 80%
        needs ranks 1-2 (50+30=80 → 5·80 ≥ 4·100 at rank 2); top 20%
        = ceil(1) = 1 customer holding 50% = 500000 micro."""
        from suckit_ray.pipelines.relops import orders_pareto

        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array(range(5), pa.int64()),
                    "o_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                    "o_totalprice": pa.array([50.0, 30.0, 10.0, 5.0, 5.0]),
                }
            ),
            str(tmp_path / "orders.parquet"),
        )
        got = orders_pareto(str(tmp_path)).to_pandas().iloc[0]
        assert got["n_customers"] == 5
        assert got["n_top_for_80pct"] == 2
        assert got["top20_share_micro"] == 500_000


@pytest.mark.usefixtures("ray_session")
class TestEventsValueEntropy:
    def test_uniform_constant_and_float_reference(self, tmp_path):
        """A constant column has entropy 0; four equiprobable values
        give ~ln 4; the micronat integer tracks the float formula
        within the per-term floor error (< 1 micronat per row)."""
        import math

        from suckit_ray.pipelines.relops import events_value_entropy

        df = pd.DataFrame(
            {
                "event_type": ["const"] * 4 + ["uni"] * 4,
                "value": [7.0] * 4 + [1.0, 2.0, 3.0, 4.0],
            }
        )
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False),
            str(tmp_path / "events.parquet"),
        )
        got = (
            events_value_entropy(str(tmp_path))
            .to_pandas()
            .set_index("event_type")
        )
        assert got.loc["const", "entropy_micronats"] == 0
        assert got.loc["const", "n_distinct"] == 1
        want = 1e6 * math.log(4)
        assert abs(got.loc["uni", "entropy_micronats"] - want) <= 1
