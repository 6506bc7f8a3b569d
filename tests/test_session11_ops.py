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
