"""Session-11 operators: hybrid RRF retrieval, Gopher quality filter,
DBSCAN over embeddings — each pinned against an independent pure-
Python/pandas reference implementation (not the engine's own code
paths)."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
class TestHybridRRF:
    @staticmethod
    def _reference(sf_dir, n_q=5, list_k=20, k=10):
        docs = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).to_pandas()
        emb = pq.read_table(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).to_pandas()

        def shingles(t):
            toks = t.split()
            return {
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            }

        sh = {int(r.doc_id): shingles(r.text) for r in docs.itertuples()}
        m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
        m = m / np.linalg.norm(m, axis=1)[:, None]
        vid = emb["vec_id"].to_numpy()
        scores = {}
        for q in range(n_q):
            # lexical leg (compute pct positively then negate:
            # -(a//b) != (-a)//b for python floor division)
            lex = []
            for d, s in sh.items():
                if d == q:
                    continue
                i = len(s & sh[q])
                if i:
                    pct = (10000 * i) // (len(s) + len(sh[q]) - i)
                    lex.append((-pct, d))
            lex.sort()
            # dense leg
            qv = m[vid == q][0]
            cos = np.floor(m @ qv * 10000).astype(np.int64)
            dense = sorted(
                (-int(c), int(d)) for c, d in zip(cos, vid) if d != q
            )
            for leg in (lex, dense):
                for rank, (_, d) in enumerate(leg[:list_k], 1):
                    scores[(q, d)] = (
                        scores.get((q, d), 0) + 1_000_000_000 // (60 + rank)
                    )
        rows = []
        for q in range(n_q):
            cand = sorted(
                (-s, d) for (qq, d), s in scores.items() if qq == q
            )[:k]
            for rnk, (neg_s, d) in enumerate(cand, 1):
                rows.append((q, rnk, d, -neg_s))
        return pd.DataFrame(rows, columns=["qid", "rnk", "doc_id", "rrf_score"])

    def test_matches_reference(self):
        from suckit_ray.pipelines.textops import docs_hybrid_rrf

        got = docs_hybrid_rrf(SF).to_pandas()
        ref = self._reference(SF)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), ref, check_dtype=False
        )

    def test_output_shape_invariants(self):
        from suckit_ray.pipelines.textops import docs_hybrid_rrf

        got = docs_hybrid_rrf(SF).to_pandas()
        assert (got["rnk"] >= 1).all() and (got["rnk"] <= 10).all()
        # scores non-increasing within each qid, ties broken by doc_id
        for _, g in got.groupby("qid"):
            g = g.sort_values("rnk")
            s = g["rrf_score"].to_numpy()
            assert (np.diff(s) <= 0).all()
            ties = g[g["rrf_score"].duplicated(keep=False)]
            for _, tg in ties.groupby("rrf_score"):
                assert tg.sort_values("rnk")["doc_id"].is_monotonic_increasing


@pytest.mark.usefixtures("ray_session")
class TestGopherFilter:
    """Engineered adversarial corpus: the sf word-soup is single-line
    and nearly stopword-free, so each rule gets a doc that fails it
    (and only it) here, cross-checked against the DuckDB oracle SQL
    run on the SAME parquet — full engine-vs-engine parity on inputs
    the driver corpus never exercises."""

    DOCS = [
        # 0: clean doc — every rule passes
        "the cat sat with all of them and that was fine . " * 6,
        # 1: too short (10 words)
        "the cat sat with all of them and that was",
        # 2: words too long (mean > 10)
        "the of " + " ".join(["extraordinarily"] * 58),
        # 3: symbol-heavy (11 hashes in 60 words)
        "the of " + "# " * 11 + "word " * 47,
        # 4: bullet-heavy (10/10 lines start with a bullet; the "-"
        # token itself is the only non-alpha word, 60/70 ≥ 80%)
        "\n".join(["- the item of note list here"] * 10),
        # 5: ellipsis-heavy (5/10 lines end with ...)
        "\n".join(
            ("the line of text %d trails off..." if i % 2 else "the line of text %d stays") % i
            for i in range(10)
        ),
        # 6: non-alpha words (21/60 pure digits)
        "the of " + "12345 " * 21 + "word " * 37,
        # 7: no stopwords at all
        "word " * 60,
        # 8: empty text
        "",
        # 9: unicode ellipsis line-ends + trailing tabs
        "\n".join(
            ("the line of text %d …\t" if i < 4 else "the line of text %d") % i
            for i in range(10)
        ),
    ]

    EXPECT_FAIL = {
        1: "r_words",
        2: "r_mean_len",
        3: "r_symbol",
        4: "r_bullet",
        5: "r_ellipsis",
        6: "r_alpha",
        7: "r_stop",
    }

    @pytest.fixture(scope="class")
    def corpus_dir(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("gopher")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(self.DOCS)), pa.int64()),
                    "text": pa.array(self.DOCS, pa.string()),
                }
            ),
            str(d / "documents.parquet"),
        )
        return str(d)

    def _ray_df(self, corpus_dir):
        from suckit_ray.pipelines.textops import docs_gopher_filter

        return (
            docs_gopher_filter(corpus_dir)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    def test_rule_flags(self, corpus_dir):
        df = self._ray_df(corpus_dir).set_index("doc_id")
        rules = [
            "r_words", "r_mean_len", "r_symbol", "r_bullet",
            "r_ellipsis", "r_alpha", "r_stop",
        ]
        assert bool(df.loc[0, "keep"])
        for doc, bad_rule in self.EXPECT_FAIL.items():
            for r in rules:
                assert bool(df.loc[doc, r]) == (r != bad_rule), (doc, r)
            assert not bool(df.loc[doc, "keep"])
        # empty text: fails word count, passes the vacuous rules
        assert not bool(df.loc[8, "r_words"])
        assert bool(df.loc[8, "r_mean_len"]) and bool(df.loc[8, "r_symbol"])
        # unicode-ellipsis ends (4/10 > 30%) counted like '...'
        assert not bool(df.loc[9, "r_ellipsis"])

    def test_oracle_parity_on_engineered_docs(self, corpus_dir):
        import duckdb

        import __ray_entry__ as entry

        sql = entry.oracle_sql()["docs_gopher_filter"]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{corpus_dir}/documents.parquet'"
        )
        want = con.execute(sql).df().sort_values("doc_id").reset_index(drop=True)
        got = self._ray_df(corpus_dir)
        pd.testing.assert_frame_equal(
            got.astype({c: "bool" for c in want.columns if c.startswith("r_") or c == "keep"}),
            want.astype(got.dtypes.to_dict()),
            check_dtype=False,
        )


@pytest.mark.usefixtures("ray_session")
class TestDBSCAN:
    """Pinned against an independent pure-numpy DBSCAN (same
    deterministic min-root border rule), not the engine's own plan."""

    @staticmethod
    def _reference(sf_dir, eps=0.30, min_pts=3):
        emb = pq.read_table(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).to_pandas()
        ids = emb["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        m = np.stack(emb["embedding"].to_numpy()[order]).astype(np.float64)
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = 1.0
        m = m / n[:, None]
        cos = m @ m.T
        np.fill_diagonal(cos, -2.0)
        adj = cos >= eps
        deg = adj.sum(1)
        core = deg >= min_pts
        # union-find over core-core edges
        parent = {int(i): int(i) for i in ids[core]}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        ci = np.nonzero(core)[0]
        for a in ci:
            for b in ci:
                if b > a and adj[a, b]:
                    ra, rb = find(int(ids[a])), find(int(ids[b]))
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        root = {x: find(x) for x in parent}
        # min-label roots: find() after full pass gives component rep;
        # make it the component MIN explicitly
        comp_min = {}
        for x, r in root.items():
            comp_min[r] = min(comp_min.get(r, x), x)
        root = {x: comp_min[r] for x, r in root.items()}
        out = {}
        for k, i in enumerate(ids):
            if core[k]:
                out[int(i)] = (True, root[int(i)])
            else:
                cn = [int(ids[j]) for j in np.nonzero(adj[k])[0] if core[j]]
                out[int(i)] = (
                    (False, min(root[c] for c in cn)) if cn else (False, -1)
                )
        return out

    def _check(self, eps, min_pts):
        from suckit_ray.pipelines.ann import embeddings_dbscan

        got = (
            embeddings_dbscan(SF, eps=eps, min_pts=min_pts)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        want = self._reference(SF, eps=eps, min_pts=min_pts)
        assert len(got) == len(want)
        for r in got.itertuples():
            w_core, w_cluster = want[int(r.vec_id)]
            assert bool(r.is_core) == w_core, r.vec_id
            assert int(r.cluster) == w_cluster, r.vec_id
        return got

    def test_matches_reference_default(self):
        # eps=0.30 percolates into one giant cluster — still exact
        got = self._check(0.30, 3)
        assert (got.cluster == -1).any()
        core_ids = set(got[got.is_core]["vec_id"])
        clusters = got[got.cluster >= 0]["cluster"].unique()
        assert all(int(c) in core_ids for c in clusters)

    def test_matches_reference_sparse_regime(self):
        # eps=0.35: few cores → multiple clusters, borders, and noise
        got = self._check(0.35, 3)
        clusters = got[got.cluster >= 0]["cluster"].unique()
        assert len(clusters) > 1
        assert (got.cluster == -1).any()
        # borders exist: clustered but not core
        assert ((got.cluster >= 0) & ~got.is_core).any()
