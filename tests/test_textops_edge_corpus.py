"""Oracle-vs-Ray equality on an ADVERSARIAL documents corpus — the
synthetic sf tables never exercise empty texts, one-token docs, or
whole-doc duplicates, so the driver's sf0.01 parity check can't catch
an edge divergence there. Here the same DuckDB oracle SQL that the
driver runs is evaluated against a hand-built corpus of edge rows and
compared to the Ray operators on the same parquet file."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

EDGE_DOCS = [
    (0, ""),  # empty text
    (1, "solo"),  # single token: no bigram, no 4-gram, one segment
    (2, "a b"),  # one bigram, below 4-gram threshold
    (3, "x y x y x y x y x y"),  # intra-doc repetition only
    # exact whole-doc duplicates (12 tokens → 4-gram dups + shared
    # 8-word segment + every cut applied)
    (4, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
    (5, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
    # shares doc 4's first 4 tokens mid-doc (span, not whole doc)
    (6, "one two three alpha beta gamma delta four five six seven eight"),
    (7, "  a   b  "),  # messy whitespace: split() vs \s+ must agree
    # near-PII bodies: regex edge cases for docs_redact_pii (emails
    # with subdomains/specials, 1-char TLD non-match, >3-digit octet,
    # 1-2 digit phone country code boundary)
    (8, "mail a.b+c_d%e@sub.domain.co or me@@x.com or a@b.c now"),
    (9, "ip 999.1.2.3 then 1.2.3.4567 then 10.0.0.1 end"),
    (10, "+12-345-6789 call +1-23-4567 and +123-456-7890 stop"),
]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("edge_corpus"))
    tbl = pa.table(
        {
            "doc_id": pa.array([i for i, _ in EDGE_DOCS], pa.int64()),
            "text": pa.array([t for _, t in EDGE_DOCS], pa.string()),
            # source column for docs_domain_mix (weights 1+(idx%4))
            "source": pa.array(
                [f"src{i % 3}" for i, _ in EDGE_DOCS], pa.string()
            ),
        }
    )
    pq.write_table(tbl, os.path.join(d, "documents.parquet"))
    return d


def _oracle(edge_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(edge_dir, 'documents.parquet')}')"
    )
    return con.execute(sql).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize(
    "name",
    [
        "docs_dup_spans",
        "docs_cut_dup_spans",
        "docs_segment_dedup",
        "docs_lm_score",
        "docs_pack_sequences",
        "docs_redact_pii",
        "docs_tfidf_topk",
        "docs_global_shuffle",
        "docs_domain_mix",
        "docs_bm25_topk",  # no query term appears: empty both sides
        "docs_bpe_pairs",
        "docs_bpe_train",
        "docs_bpe_encode",
    ],
)
def test_edge_corpus_matches_oracle(edge_dir, name):
    import __ray_entry__ as entry

    got = entry.queries()[name](edge_dir)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    want = _oracle(edge_dir, entry.oracle_sql()[name])
    a, b = _norm(pd.DataFrame(got)), _norm(want)
    assert a.shape == b.shape, (name, a.shape, b.shape)
    assert (a.astype(str).values == b.astype(str).values).all(), (
        name,
        a.head(10),
        b.head(10),
    )


@pytest.mark.usefixtures("ray_session")
def test_edge_corpus_expected_semantics(edge_dir):
    """Spot semantics the corpus was built to trigger."""
    import __ray_entry__ as entry

    q = entry.queries()

    cut = q["docs_cut_dup_spans"](edge_dir).to_pandas().set_index("doc_id")
    # the exact-duplicate pair: one doc fully cut (second occurrence),
    # and the duplicated-span rule is symmetric so BOTH lose the text
    assert cut.loc[5, "n_cut"] == 12 and cut.loc[5, "text_clean"] == ""
    assert cut.loc[4, "n_cut"] == 12
    # empty + short docs pass through untouched
    assert cut.loc[0, "n_tokens"] == 0 and cut.loc[0, "text_clean"] == ""
    assert cut.loc[1, "n_cut"] == 0 and cut.loc[1, "text_clean"] == "solo"

    seg = q["docs_segment_dedup"](edge_dir).to_pandas()
    # doc 4's segments kept (first occurrence), doc 5's all dropped
    assert (seg[seg["doc_id"] == 4]["kept"] == 1).all()
    assert (seg[seg["doc_id"] == 5]["kept"] == 0).all()

    lm = q["docs_lm_score"](edge_dir).to_pandas().set_index("doc_id")
    # <2-token docs surface with the zero row, not dropped
    assert lm.loc[0, "n_bigrams"] == 0 and lm.loc[0, "avg_nll_micro"] == 0
    assert lm.loc[1, "n_bigrams"] == 0
    # the repeated bigram "x y" is the most predictable transition in
    # the corpus: doc 3 must score lower than the all-unique doc 4
    assert lm.loc[3, "avg_nll_micro"] < lm.loc[4, "avg_nll_micro"]


@pytest.mark.usefixtures("ray_session")
def test_pack_sequences_spans_multiple_scan_buckets(tmp_path):
    """doc_ids spread across several PACK_BUCKET ranges exercise the
    cross-bucket base-offset path (the sf tables are dense and land in
    ONE bucket, leaving the prefix broadcast untested there)."""
    import numpy as np

    from suckit_ray.pipelines import textops

    ids = [10, 4095, 4096, 8200, 8201]  # buckets 0, 0, 1, 2, 2
    texts = ["w " * k for k in (5, 40, 7, 0, 33)]
    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([t.strip() for t in texts], pa.string()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    got = (
        textops.docs_pack_sequences(d)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    n = pd.Series([5, 40, 7, 0, 33], dtype="int64")
    off = n.cumsum().shift(1, fill_value=0)
    S = textops.PACK_SEQ_LEN
    want = pd.DataFrame(
        {
            "doc_id": pd.Series(ids, dtype="int64"),
            "n_tokens": n,
            "start_off": off,
            "first_seq": (off // S).where(n > 0, -1),
            "last_seq": ((off + n - 1) // S).where(n > 0, -1),
        }
    ).astype("int64")
    pd.testing.assert_frame_equal(got, want)
