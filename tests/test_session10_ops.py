"""Tenth-session operator pins: market-basket frequent pairs,
categorical mutual information, link-structure similarity,
readability scoring."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
class TestFrequentPairs:
    def test_matches_pandas_reference(self):
        from suckit_ray.pipelines.relops import lineitem_frequent_pairs

        got = (
            lineitem_frequent_pairs(SF)
            .to_pandas()
            .sort_values(["part_a", "part_b"])
            .reset_index(drop=True)
        )

        li = pd.read_parquet(
            f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
        ).drop_duplicates()
        n_orders = li["l_orderkey"].nunique()
        item = li.groupby("l_partkey").size().to_dict()
        m = li.merge(li, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m["l_partkey_a"] < m["l_partkey_b"]]
        ref = (
            m.groupby(["l_partkey_a", "l_partkey_b"], as_index=False)
            .size()
            .rename(
                columns={
                    "l_partkey_a": "part_a",
                    "l_partkey_b": "part_b",
                    "size": "support",
                }
            )
        )
        ref = ref[ref["support"] >= 2].reset_index(drop=True)
        ref["lift_micro"] = [
            (1_000_000 * n_orders * int(s)) // (item[a] * item[b])
            for a, b, s in zip(ref["part_a"], ref["part_b"], ref["support"])
        ]
        ref = ref.sort_values(["part_a", "part_b"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype("int64"), ref.astype("int64")
        )

    def test_duplicate_parts_within_order_dedup(self, tmp_path):
        """An order listing the same part on two lines is ONE basket
        item: no self-pair, support counted once."""
        from suckit_ray.pipelines.relops import lineitem_frequent_pairs

        tbl = pa.table(
            {
                "l_orderkey": pa.array(
                    [1, 1, 1, 2, 2, 3, 3], pa.int64()
                ),
                "l_partkey": pa.array(
                    [10, 10, 20, 10, 20, 10, 20], pa.int64()
                ),
            }
        )
        pq.write_table(tbl, tmp_path / "lineitem.parquet")
        got = lineitem_frequent_pairs(str(tmp_path)).to_pandas()
        assert len(got) == 1
        row = got.iloc[0]
        assert (row["part_a"], row["part_b"], row["support"]) == (10, 20, 3)
        # lift = N*c(A,B)/(c(A)c(B)) = 3*3/(3*3) = 1.0 exactly
        assert row["lift_micro"] == 1_000_000


@pytest.mark.usefixtures("ray_session")
class TestMutualInformation:
    def test_matches_dict_counted_reference(self):
        import math

        from suckit_ray.pipelines.relops import events_mutual_information

        got = events_mutual_information(SF).to_pandas().iloc[0]

        ev = pd.read_parquet(
            f"{SF}/events.parquet", columns=["event_type", "ts"]
        )
        y = (
            ev["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            // 86_400_000_000
        ) % 7
        from collections import Counter

        cxy = Counter(zip(ev["event_type"], y))
        cx = Counter(ev["event_type"])
        cy = Counter(y)
        n = len(ev)
        numer = sum(
            c * math.floor(1e6 * math.log(float(n) * c / (cx[a] * cy[b])))
            for (a, b), c in cxy.items()
        )
        # trunc-division parity with DuckDB //
        want = numer // n if numer >= 0 else -((-numer) // n)
        assert int(got["n"]) == n
        assert int(got["mi_micronats"]) == want

    def _mi_of(self, types, days, tmp_path):
        from suckit_ray.pipelines.relops import events_mutual_information

        n = len(types)
        tbl = pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(
                    [d * 86_400_000_000 for d in days], pa.timestamp("us")
                ),
                "user_id": pa.array([1] * n, pa.int64()),
                "event_type": pa.array(types, pa.string()),
                "value": pa.array([1.0] * n, pa.float64()),
                "props": pa.array(["{}"] * n, pa.string()),
            }
        )
        pq.write_table(tbl, tmp_path / "events.parquet")
        return int(
            events_mutual_information(str(tmp_path))
            .to_pandas()
            .iloc[0]["mi_micronats"]
        )

    def test_independent_table_is_zero(self, tmp_path):
        """Perfectly independent type × day counts: every term's ln
        argument is exactly 1.0, so MI is exactly 0."""
        types = ["a", "a", "b", "b"]
        days = [0, 1, 0, 1]
        assert self._mi_of(types, days, tmp_path) == 0

    def test_fully_dependent_is_ln2(self, tmp_path):
        """Type determines day with two equal classes: MI = ln 2."""
        types = ["a", "a", "b", "b"]
        days = [0, 0, 1, 1]
        assert self._mi_of(types, days, tmp_path) == 693_147


@pytest.mark.usefixtures("ray_session")
class TestLinkJaccard:
    def test_matches_bruteforce_sets(self):
        """Brute-force all-pairs set Jaccard per host over the same
        extracted edge table must equal the 3-exchange plan."""
        from itertools import combinations

        from suckit_ray.pipelines.flagship import crawl_docs
        from suckit_ray.pipelines.graph import (
            _host_page_edges,
            link_jaccard_from_docs,
        )

        docs = crawl_docs(SF).materialize()
        got = (
            link_jaccard_from_docs(docs)
            .to_pandas()
            .sort_values(["host", "a", "b"])
            .reset_index(drop=True)
        )

        edges = _host_page_edges(docs).to_pandas()
        outs = {}
        for host, s, t in edges.itertuples(index=False):
            outs.setdefault(host, {}).setdefault(int(s), set()).add(int(t))
        rows = []
        for host, by_src in outs.items():
            for a, b in combinations(sorted(by_src), 2):
                inter = len(by_src[a] & by_src[b])
                union = len(by_src[a] | by_src[b])
                if inter and 3 * inter >= union:
                    rows.append(
                        (host, a, b, inter, (1_000_000 * inter) // union)
                    )
        ref = (
            pd.DataFrame(
                rows,
                columns=["host", "a", "b", "n_common", "jaccard_micro"],
            )
            .sort_values(["host", "a", "b"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, ref)
        assert len(ref) > 0


@pytest.mark.usefixtures("ray_session")
class TestReadability:
    def _run(self, texts, tmp_path):
        from suckit_ray.pipelines.textops import docs_readability

        tbl = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["t"] * len(texts), pa.string()),
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        )
        pq.write_table(tbl, tmp_path / "documents.parquet")
        return (
            docs_readability(str(tmp_path))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    def test_hand_counts(self, tmp_path):
        got = self._run(
            ["The cat sat. It ran!", "xyz crwth", ""], tmp_path
        )
        # doc 0: words 6 ("the cat sat it ran" -> 5? no: the,cat,sat,it,ran = 5)
        r0 = got.iloc[0]
        assert (r0["words"], r0["sentences"]) == (5, 2)
        # syllables: the(1) cat(1) sat(1) it(1) ran(1) = 5
        assert r0["syllables"] == 5
        # score = 206.835 - 1.015*(5/2) - 84.6*(5/5) = 119.6975
        assert r0["flesch_micro"] == 119_697_500
        # doc 1: two no-vowel words -> 1 syllable each; crwth has no
        # aeiouy... (w is not a vowel here); "xyz" has y: 1 vowel run
        r1 = got.iloc[1]
        assert (r1["words"], r1["sentences"], r1["syllables"]) == (2, 1, 2)
        # doc 2 (empty): guards words=1, sentences=1, syllables=0
        r2 = got.iloc[2]
        assert (r2["words"], r2["sentences"], r2["syllables"]) == (1, 1, 0)
        assert r2["flesch_micro"] == 205_820_000

    def test_negative_score_truncates_like_duckdb(self, tmp_path):
        """A pathological polysyllabic one-word text drives the score
        negative; division must truncate toward zero (DuckDB //), not
        floor."""
        import duckdb

        text = "aaa eee iii ooo uuu aaa eee iii ooo uuu."
        got = self._run([text], tmp_path).iloc[0]
        con = duckdb.connect()
        want = con.execute(
            """
            WITH c AS (
              SELECT greatest(1, len(regexp_extract_all(lower($1),
                       '[a-z]+'))) AS w,
                     len(regexp_extract_all(lower($1), '[a-z]+')) AS rw,
                     greatest(1, len(regexp_extract_all($1, '[.!?]+')))
                       AS s,
                     len(regexp_extract_all(lower($1), '[aeiouy]+'))
                       AS vr,
                     len(regexp_extract_all(lower($1),
                       '[a-z]*[aeiouy][a-z]*')) AS vw
            )
            SELECT CAST((206835000*s*w - 1015000*w*w
                         - 84600000*(vr+rw-vw)*s) // (s*w) AS BIGINT)
            FROM c
            """,
            [text],
        ).fetchone()[0]
        assert int(got["flesch_micro"]) == int(want)


@pytest.mark.usefixtures("ray_session")
class TestAbTest:
    def test_matches_scipy_free_reference(self):
        """Exact integer chi2 equals the float formula to float
        precision, and cells match a pandas reference."""
        from suckit_ray.pipelines.relops import events_ab_test

        got = events_ab_test(SF).to_pandas().iloc[0]
        ev = pd.read_parquet(
            f"{SF}/events.parquet", columns=["user_id", "event_type"]
        )
        u = (
            ev.assign(p=(ev["event_type"] == "purchase").astype(int))
            .groupby("user_id")["p"]
            .sum()
            .ge(14)
            .astype(int)
        )
        arm = u.index % 2
        a = int(((arm == 0) & (u == 1)).sum())
        b = int(((arm == 0) & (u == 0)).sum())
        c = int(((arm == 1) & (u == 1)).sum())
        d = int(((arm == 1) & (u == 0)).sum())
        assert (got["users_a"], got["conv_a"]) == (a + b, a)
        assert (got["users_b"], got["conv_b"]) == (c + d, c)
        # both conversion classes occur: the statistic is exercised
        assert 0 < a + c < a + b + c + d
        n = a + b + c + d
        chi2_f = (
            n * (a * d - b * c) ** 2
            / ((a + b) * (c + d) * (a + c) * (b + d))
        )
        assert abs(got["chi2_micro"] / 1e6 - chi2_f) < 1e-5

    def test_degenerate_arm_yields_zero(self, tmp_path):
        """All users in one arm: denominator 0 -> chi2 defined as 0."""
        from suckit_ray.pipelines.relops import events_ab_test

        tbl = pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array([0, 1], pa.timestamp("us")),
                "user_id": pa.array([2, 4], pa.int64()),  # both arm 0
                "event_type": pa.array(["purchase", "view"], pa.string()),
                "value": pa.array([1.0, 1.0], pa.float64()),
                "props": pa.array(["{}"] * 2, pa.string()),
            }
        )
        pq.write_table(tbl, tmp_path / "events.parquet")
        got = events_ab_test(str(tmp_path)).to_pandas().iloc[0]
        assert got["chi2_micro"] == 0
        assert (got["users_a"], got["users_b"]) == (2, 0)


@pytest.mark.usefixtures("ray_session")
class TestCompressionRatio:
    def test_matches_independent_reference(self):
        import zlib

        from suckit_ray.pipelines.textops import docs_compression_ratio

        got = (
            docs_compression_ratio(SF)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        docs = pd.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        ).sort_values("doc_id")
        for row, (_, doc) in zip(got.itertuples(index=False), docs.iterrows()):
            b = doc["text"].encode("utf-8")
            assert row.raw_bytes == len(b)
            assert row.zlib_bytes == len(zlib.compress(b, 6))
            assert row.ratio_micro == (1_000_000 * row.zlib_bytes) // max(
                1, len(b)
            )

    def test_repetitive_text_compresses_harder(self, tmp_path):
        from suckit_ray.pipelines.textops import docs_compression_ratio

        texts = ["spam " * 400, "", None]
        texts[2] = (
            "the quick brown fox jumps over the lazy dog while a "
            "zephyr quivers beyond jagged peaks and foxes examine "
            "quartz formations in dazzling light near withered oaks"
        )
        tbl = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 3, pa.string()),
                "source": pa.array(["t"] * 3, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        )
        pq.write_table(tbl, tmp_path / "documents.parquet")
        got = (
            docs_compression_ratio(str(tmp_path))
            .to_pandas()
            .set_index("doc_id")
        )
        assert got.loc[0, "ratio_micro"] < got.loc[2, "ratio_micro"]
        assert got.loc[1, "ratio_micro"] == 1_000_000  # empty guard


@pytest.mark.usefixtures("ray_session")
class TestUserPaths:
    def test_matches_pandas_reference(self):
        from suckit_ray.pipelines.relops import events_user_paths

        got = events_user_paths(SF).to_pandas()

        ev = pd.read_parquet(
            f"{SF}/events.parquet",
            columns=["user_id", "ts", "event_id", "event_type"],
        )
        ev["day"] = (
            ev["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            // 86_400_000_000
        )
        ev = ev.sort_values(["user_id", "day", "ts", "event_id"])
        capped = ev.groupby(["user_id", "day"]).head(8)
        paths = capped.groupby(["user_id", "day"])["event_type"].agg(
            ">".join
        )
        ref = (
            paths.value_counts()
            .rename_axis("path")
            .reset_index(name="n")
            .sort_values(["n", "path"], ascending=[False, True])
            .head(20)
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got.assign(n=got["n"].astype("int64")),
            ref.assign(n=ref["n"].astype("int64")),
        )

    def test_cap_and_order(self, tmp_path):
        """10 events in one user-day: path keeps the FIRST 8 in
        (ts, event_id) order, including the event_id tie-break."""
        from suckit_ray.pipelines.relops import events_user_paths

        types = list("abcdefghij")
        tbl = pa.table(
            {
                "event_id": pa.array([9, 8, 7, 6, 5, 4, 3, 2, 1, 0], pa.int64()),
                "ts": pa.array([0] * 10, pa.timestamp("us")),
                "user_id": pa.array([1] * 10, pa.int64()),
                "event_type": pa.array(types, pa.string()),
                "value": pa.array([1.0] * 10, pa.float64()),
                "props": pa.array(["{}"] * 10, pa.string()),
            }
        )
        pq.write_table(tbl, tmp_path / "events.parquet")
        got = events_user_paths(str(tmp_path)).to_pandas()
        # equal ts: event_id ascending wins -> j,i,h,g,f,e,d,c
        assert got.iloc[0]["path"] == "j>i>h>g>f>e>d>c"
        assert got.iloc[0]["n"] == 1


@pytest.mark.usefixtures("ray_session")
class TestEwma:
    def test_matches_sequential_reference(self):
        from suckit_ray.pipelines.relops import events_ewma, to_cents

        got = (
            events_ewma(SF)
            .to_pandas()
            .sort_values(["event_type", "day"])
            .reset_index(drop=True)
        )
        ev = pd.read_parquet(
            f"{SF}/events.parquet", columns=["event_type", "ts", "value"]
        )
        ev["day"] = (
            ev["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            // 86_400_000_000
        )
        ev["c"] = to_cents(ev["value"])
        daily = (
            ev.groupby(["event_type", "day"], as_index=False)["c"]
            .sum()
            .sort_values(["event_type", "day"])
        )
        rows = []
        for etype, grp in daily.groupby("event_type"):
            e = 0
            for i, (_, r) in enumerate(grp.iterrows()):
                x = int(r["c"])
                e = x if i == 0 else (x + e) // 2  # positive: floor==trunc
                rows.append((etype, int(r["day"]), x, e))
        ref = pd.DataFrame(
            rows, columns=["event_type", "day", "x_cents", "ewma_cents"]
        ).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref)

    def test_flat_series_converges_to_level(self, tmp_path):
        """Constant daily sums: EWMA equals the level from day 0 — and
        the floor never drifts it."""
        from suckit_ray.pipelines.relops import events_ewma

        days = list(range(10))
        tbl = pa.table(
            {
                "event_id": pa.array(range(10), pa.int64()),
                "ts": pa.array(
                    [d * 86_400_000_000 for d in days], pa.timestamp("us")
                ),
                "user_id": pa.array([1] * 10, pa.int64()),
                "event_type": pa.array(["a"] * 10, pa.string()),
                "value": pa.array([5.0] * 10, pa.float64()),
                "props": pa.array(["{}"] * 10, pa.string()),
            }
        )
        pq.write_table(tbl, tmp_path / "events.parquet")
        got = events_ewma(str(tmp_path)).to_pandas()
        assert (got["ewma_cents"] == 500).all()


@pytest.mark.usefixtures("ray_session")
class TestRake:
    def test_hand_example(self, tmp_path):
        """Two docs, classic RAKE arithmetic by hand."""
        from suckit_ray.pipelines.textops import docs_rake_topk

        texts = [
            "deep learning of deep models",
            "the deep models win",
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 2, pa.string()),
                "source": pa.array(["t"] * 2, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        )
        pq.write_table(tbl, tmp_path / "documents.parquet")
        got = docs_rake_topk(str(tmp_path)).to_pandas()
        # phrases: "deep learning" (of breaks), "deep models" x2
        #          ("the" breaks), "win"... wait: doc1 = "deep models win"
        # words doc0: deep learning | deep models ; doc1: deep models win
        # freq: deep=3 learning=1 models=2 win=1
        # deg: deep: 2+2+3=7, learning: 2, models: 2+3=5, win: 3
        ws = {
            "deep": (1_000_000 * 7) // 3,
            "learning": 2_000_000,
            "models": (1_000_000 * 5) // 2,
            "win": 3_000_000,
        }
        by_phrase = dict(zip(got["phrase"], got["score_micro"]))
        assert by_phrase["deep learning"] == ws["deep"] + ws["learning"]
        assert by_phrase["deep models win"] == (
            ws["deep"] + ws["models"] + ws["win"]
        )
        assert by_phrase["deep models"] == ws["deep"] + ws["models"]
        n_occ = dict(zip(got["phrase"], got["n_occ"]))
        assert n_occ["deep models"] == 1
        assert n_occ["deep models win"] == 1

    def test_all_stopword_doc_contributes_nothing(self, tmp_path):
        from suckit_ray.pipelines.textops import docs_rake_topk

        texts = ["the of and in a", "alpha beta"]
        tbl = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 2, pa.string()),
                "source": pa.array(["t"] * 2, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        )
        pq.write_table(tbl, tmp_path / "documents.parquet")
        got = docs_rake_topk(str(tmp_path)).to_pandas()
        assert list(got["phrase"]) == ["alpha beta"]


@pytest.mark.usefixtures("ray_session")
class TestWebdataset:
    def test_binary_and_unicode_members_roundtrip(self, tmp_path):
        import ray.data as rd

        from suckit_ray.sources.wds import (
            read_webdataset,
            write_webdataset,
        )

        rows = [
            {"key": "s0", "text": "héllo\nwörld \"quoted\"", "img": b"\x00\xff\x10JPEGish"},
            {"key": "s1", "text": "", "img": b""},
            {"key": "s2", "text": "plain", "img": None},  # missing member
        ]
        ds = rd.from_items(rows)
        n = write_webdataset(
            ds, str(tmp_path), key_col="key",
            ext_cols={"txt": "text", "img": "img"},
        )
        assert n == 3
        back = read_webdataset(str(tmp_path)).to_pandas()
        got = {
            (r["key"], r["ext"]): r["data"] for _, r in back.iterrows()
        }
        assert got[("s0", "txt")].decode() == rows[0]["text"]
        assert got[("s0", "img")] == rows[0]["img"]
        assert got[("s1", "img")] == b""
        assert ("s2", "img") not in got  # None member skipped
        assert got[("s2", "txt")] == b"plain"

    def test_shards_deterministic_and_idempotent(self, tmp_path):
        import ray.data as rd

        from suckit_ray.sources.wds import write_webdataset

        rows = [{"key": f"k{i}", "text": f"t{i}"} for i in range(10)]
        write_webdataset(rd.from_items(rows), str(tmp_path))
        import os

        first = sorted(os.listdir(str(tmp_path)))
        write_webdataset(rd.from_items(rows), str(tmp_path))
        assert sorted(os.listdir(str(tmp_path))) == first  # content-hash names

    def test_wds_to_real_image_stages_end_to_end(self, tmp_path):
        """The multimodal story composed: netpbm images in WebDataset
        shards -> streamed members -> actor-pool decode + features on
        the NATIVE real path (no codec library)."""
        import ray.data as rd

        from suckit_ray.sources.wds import (
            read_webdataset,
            write_webdataset,
        )
        from suckit_ray.stages.media import DecodeImage, ExtractImageFeatures

        def ppm(w, h, v):
            body = bytes([v]) * (w * h * 3)
            return b"P6\n%d %d\n255\n" % (w, h) + body

        rows = [
            {"key": f"img{i}", "img": ppm(8 + i, 4 + i, 30 * i)}
            for i in range(4)
        ]
        write_webdataset(
            rd.from_items(rows), str(tmp_path), key_col="key",
            ext_cols={"ppm": "img"},
        )
        samples = read_webdataset(str(tmp_path)).rename_columns(
            {"data": "body"}
        )
        out = samples.map_batches(
            DecodeImage(fake=False), batch_size=2, batch_format="pyarrow"
        ).map_batches(
            ExtractImageFeatures(fake=False), batch_size=2,
            batch_format="pyarrow",
        )
        got = out.to_pandas().set_index("key")
        for i in range(4):
            m = got.loc[f"img{i}", "media_meta"]
            assert (m["width"], m["height"], m["format"]) == (
                8 + i, 4 + i, "ppm",
            )
            feats = got.loc[f"img{i}", "features"]
            assert len(feats) == 64


@pytest.mark.usefixtures("ray_session")
class TestLogreg:
    def test_weights_match_numpy_reference(self):
        from suckit_ray.pipelines.ann import _logreg_weights, _read_embeddings

        ds = _read_embeddings(SF, with_label=True)
        got = _logreg_weights(ds, iters=15, eta=0.5)

        df = pd.read_parquet(f"{SF}/embeddings.parquet")
        X = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        X = np.hstack([X, np.ones((len(X), 1))])
        y = (df["label"].to_numpy().astype(np.int64) % 2).astype(np.float64)
        w = np.zeros(X.shape[1])
        for _ in range(15):
            p = 1.0 / (1.0 + np.exp(-(X @ w)))
            w = w - 0.5 * (X.T @ (p - y)) / len(X)
        assert np.allclose(got, w, atol=1e-8)

    def test_accuracy_above_majority(self):
        from suckit_ray.pipelines.ann import embeddings_logreg

        got = embeddings_logreg(SF).to_pandas().iloc[0]
        df = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["label"])
        y = df["label"].to_numpy() % 2
        majority = max((y == 1).mean(), (y == 0).mean())
        assert got["n"] == len(y)
        assert got["accuracy_micro"] / 1e6 >= majority


@pytest.mark.usefixtures("ray_session")
class TestAttribution:
    def test_window_edges(self, tmp_path):
        """Click exactly 7d before attributes; 7d+1us does not; a
        click AFTER the purchase never does; same-instant click with
        smaller event_id is 'prior' by the tie-break."""
        from suckit_ray.pipelines.relops import events_attribution

        D = 86_400_000_000
        rows = [
            # user 1: click at t0, purchase at exactly t0+7d -> attributed
            (1, 0, 1, "click"),
            (2, 7 * D, 1, "purchase"),
            # user 2: click at t0, purchase at 7d+1us -> NOT attributed
            (3, 0, 2, "click"),
            (4, 7 * D + 1, 2, "purchase"),
            # user 3: purchase BEFORE its only click -> not attributed
            (5, 0, 3, "purchase"),
            (6, 1, 3, "click"),
            # user 4: click and purchase same instant, click id smaller
            (7, 9 * D, 4, "click"),
            (8, 9 * D, 4, "purchase"),
        ]
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        pq.write_table(tbl, tmp_path / "events.parquet")
        got = (
            events_attribution(str(tmp_path))
            .to_pandas()
            .set_index("day")
            .sort_index()
        )
        assert got.loc[7, "n_attributed"] == 1  # exactly 7d: in
        assert got.loc[0, "n_attributed"] == 0  # purchase-before-click
        assert got.loc[9, "n_attributed"] == 1  # same instant, prior id
        assert int(got["n_purchases"].sum()) == 4
        assert int(got["n_attributed"].sum()) == 2


@pytest.mark.usefixtures("ray_session")
class TestSpearman:
    def test_matches_scipy_free_reference(self):
        from suckit_ray.pipelines.relops import events_spearman, to_cents

        got = events_spearman(SF).to_pandas().iloc[0]
        ev = pd.read_parquet(
            f"{SF}/events.parquet", columns=["user_id", "value"]
        )
        ev["c"] = to_cents(ev["value"])
        u = ev.groupby("user_id").agg(n_ev=("c", "size"), sum_c=("c", "sum"))
        u = u.reset_index()
        rx = (
            u.sort_values(["n_ev", "user_id"])
            .assign(r=range(1, len(u) + 1))
            .set_index("user_id")["r"]
        )
        ry = (
            u.sort_values(["sum_c", "user_id"])
            .assign(r=range(1, len(u) + 1))
            .set_index("user_id")["r"]
        )
        d2 = int(((rx - ry) ** 2).sum())
        n = len(u)
        den = n * (n * n - 1)
        num = 1_000_000 * (den - 6 * d2)
        want = num // den if num >= 0 else -((-num) // den)
        assert got["n_users"] == n
        assert got["rho_micro"] == want

    def test_perfect_and_inverse_correlation(self, tmp_path):
        from suckit_ray.pipelines.relops import events_spearman

        # users 1..5: count and value perfectly aligned -> rho = 1
        rows = []
        eid = 0
        for uid in range(1, 6):
            for _ in range(uid):
                rows.append((eid, 0, uid, "view", float(uid)))
                eid += 1
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        pq.write_table(tbl, tmp_path / "events.parquet")
        got = events_spearman(str(tmp_path)).to_pandas().iloc[0]
        assert got["rho_micro"] == 1_000_000

        # per-event value (10-uid)/uid makes each user's TOTAL value
        # 10-uid — strictly decreasing in event count -> rho = -1
        tbl2 = tbl.set_column(
            4,
            "value",
            pa.array(
                [(10.0 - r[2]) / r[2] for r in rows], pa.float64()
            ),
        )
        import shutil

        shutil.rmtree(tmp_path / "inv", ignore_errors=True)
        (tmp_path / "inv").mkdir()
        pq.write_table(tbl2, tmp_path / "inv" / "events.parquet")
        got2 = events_spearman(str(tmp_path / "inv")).to_pandas().iloc[0]
        assert got2["rho_micro"] == -1_000_000


@pytest.mark.usefixtures("ray_session")
class TestMedianCont:
    def test_even_n_interpolates(self, tmp_path):
        from suckit_ray.pipelines.relops import events_value_median_cont

        vals = [1.0, 2.0, 4.0, 10.0]  # median_cont = 3.0 -> 600 halfcents
        tbl = pa.table(
            {
                "event_id": pa.array(range(4), pa.int64()),
                "ts": pa.array([0] * 4, pa.timestamp("us")),
                "user_id": pa.array([1] * 4, pa.int64()),
                "event_type": pa.array(["a"] * 4, pa.string()),
                "value": pa.array(vals, pa.float64()),
                "props": pa.array(["{}"] * 4, pa.string()),
            }
        )
        pq.write_table(tbl, tmp_path / "events.parquet")
        got = events_value_median_cont(str(tmp_path)).to_pandas().iloc[0]
        assert got["median_halfcents"] == 600
        assert got["n"] == 4


@pytest.mark.usefixtures("ray_session")
class TestBursts:
    def _run(self, counts_by_day, tmp_path):
        from suckit_ray.pipelines.relops import events_bursts

        rows = []
        eid = 0
        for day, c in enumerate(counts_by_day):
            for _ in range(c):
                rows.append((eid, day * 86_400_000_000))
                eid += 1
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array(["a"] * len(rows), pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        pq.write_table(tbl, tmp_path / "events.parquet")
        return (
            events_bursts(str(tmp_path))
            .to_pandas()
            .sort_values("day")
            .reset_index(drop=True)
        )

    @staticmethod
    def _brute(xs, gamma=1_000_000):
        """Enumerate ALL 2^n state paths; lexicographically-smallest
        path among cost ties (state 0 preferred earlier) — matches the
        DP's tie rule."""
        import itertools
        import math

        n = len(xs)
        total = sum(xs)
        lam0 = float(total) / n
        A0, B0 = math.floor(1e6 * lam0), math.floor(1e6 * math.log(lam0))
        A1, B1 = (
            math.floor(1e6 * 2 * lam0),
            math.floor(1e6 * math.log(2 * lam0)),
        )
        best, best_path = None, None
        for path in itertools.product([0, 1], repeat=n):
            c, prev = 0, 0
            for s, x in zip(path, xs):
                if prev == 0 and s == 1:
                    c += gamma
                c += (A1 - x * B1) if s else (A0 - x * B0)
                prev = s
            if best is None or c < best or (c == best and path < best_path):
                best, best_path = c, path
        return list(best_path)

    def test_matches_bruteforce_all_paths(self, tmp_path):
        xs = [2, 1, 2, 9, 11, 8, 1, 2, 0, 2, 1, 12]
        got = self._run(xs, tmp_path)
        assert list(got["burst"]) == self._brute(xs)
        assert got["burst"].sum() > 0  # the burst window is detected

    def test_flat_series_never_bursts(self, tmp_path):
        got = self._run([3] * 10, tmp_path)
        assert got["burst"].sum() == 0
