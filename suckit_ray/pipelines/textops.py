"""Text-analysis operators over a documents table — the language-ID /
quality-scoring / token-counting / fingerprinting stages a large-scale
training-data pipeline runs after a crawl.

All per-row math is vectorized pandas/numpy inside ``map_batches``;
outputs are integer counts / md5 hex strings so the DuckDB oracles in
__ray_entry__ hash-match exactly (no float drift).

Every constant here (token regex, stopword list, language markers,
punctuation class) is mirrored verbatim in the oracle SQL — the
contract is "same arithmetic, two engines".
"""

from __future__ import annotations

import pandas as pd

import ray.data as rd

TOKEN_RE = "[A-Za-z0-9_]+"
PUNCT_RE = r"[.,!?;:]"
STOPWORDS = ("the", "a", "of", "and", "in")

# marker words per language for the stopword-count language heuristic.
# The synthetic corpus shares one vocabulary, so the PREDICTION is not
# meaningful linguistics — the operator contract (deterministic argmax
# of marker counts, first-wins tie-break in LANG_ORDER) is what the
# oracle checks.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "data"),
    "es": ("line", "part", "value"),
    "de": ("group", "window", "stream"),
    "fr": ("sort", "merge", "filter"),
    "zh": ("hash", "join", "scan"),
}
LANG_ORDER = ("en", "es", "de", "fr", "zh")


def _alt(words: tuple[str, ...]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def _read_documents(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def token_count(sf_dir: str) -> rd.Dataset:
    """doc_id, n_tokens — regex word-token count."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_tokens": df["text"].str.count(TOKEN_RE).astype("int64"),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pandas"
    )


def quality_score(sf_dir: str) -> rd.Dataset:
    """doc_id, n_tokens, n_stopwords, n_punct, is_quality — integer
    length/stopword/punctuation quality signals."""

    stop_re = _alt(STOPWORDS)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        low = df["text"].str.lower()
        n_tokens = df["text"].str.count(TOKEN_RE).astype("int64")
        n_stop = low.str.count(stop_re).astype("int64")
        n_punct = df["text"].str.count(PUNCT_RE).astype("int64")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_tokens": n_tokens,
                "n_stopwords": n_stop,
                "n_punct": n_punct,
                "is_quality": (n_tokens >= 20) & (n_stop >= 1),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pandas"
    )


def lang_id(sf_dir: str) -> rd.Dataset:
    """doc_id, pred_lang — deterministic marker-count argmax (first-wins
    tie-break in LANG_ORDER)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        low = df["text"].str.lower()
        scores = {
            lang: low.str.count(_alt(LANG_MARKERS[lang])).astype("int64")
            for lang in LANG_ORDER
        }
        sc = pd.DataFrame(scores)
        best = sc.max(axis=1)
        pred = pd.Series("en", index=df.index)
        # first language in LANG_ORDER reaching the max wins
        assigned = pd.Series(False, index=df.index)
        for lang in LANG_ORDER:
            hit = (~assigned) & (sc[lang] == best)
            pred[hit] = lang
            assigned |= hit
        return pd.DataFrame({"doc_id": df["doc_id"], "pred_lang": pred})

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pandas"
    )


def fingerprint(sf_dir: str) -> rd.Dataset:
    """doc_id, fp — md5 hex of the whitespace-normalized, lowercased,
    trimmed text (document content fingerprint)."""
    import hashlib

    def f(df: pd.DataFrame) -> pd.DataFrame:
        norm = (
            df["text"]
            .str.lower()
            .str.replace(r"\s+", " ", regex=True)
            .str.strip()
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "fp": [hashlib.md5(t.encode("utf-8")).hexdigest() for t in norm],
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pandas"
    )


def docs_by_lang(sf_dir: str):
    """Per-language corpus stats: (lang, n_docs, sum_chars, min_doc_id)."""
    import ray.data as rd

    from suckit_ray.stages.agg import bucketed_groupby_agg

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "doc_id", "n_chars"])
    return bucketed_groupby_agg(
        ds,
        keys=["lang"],
        aggs={
            "n_docs": ("doc_id", "count"),
            "sum_chars": ("n_chars", "sum"),
            "min_doc_id": ("doc_id", "min"),
        },
        num_buckets=8,
    )


# BPE-ish pre-tokenization: letter runs | digit runs | single non-space
# symbol — the ASCII-stable core of GPT-2-style pretokenizers, chosen so
# Python re and DuckDB RE2 count identically.
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(sf_dir: str) -> rd.Dataset:
    """doc_id, n_bpe_tokens — BPE-ish pre-token count (letters/digits/
    symbol classes split separately, the way byte-pair tokenizers chunk
    input before merges)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_bpe_tokens": df["text"].str.count(BPE_RE).astype("int64"),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pandas"
    )


WINNOW_K = 8      # rolling-hash gram size (bytes)
WINNOW_W = 16     # winnowing window


def _rolling_hashes(data: bytes, k: int = WINNOW_K) -> "np.ndarray":
    """Rabin–Karp polynomial rolling hash over a byte string (base 257
    mod 2^61-1), one hash per k-gram — vectorized with numpy."""
    import numpy as np

    if len(data) < k:
        return np.zeros(0, dtype=np.uint64)
    b = np.frombuffer(data, dtype=np.uint8).astype(np.object_)
    # polynomial hash via cumulative evaluation in Python ints (exact)
    mod = (1 << 61) - 1
    base = 257
    h = 0
    out = []
    power = pow(base, k - 1, mod)
    for i, c in enumerate(data):
        h = (h * base + c) % mod
        if i >= k - 1:
            out.append(h)
            h = (h - data[i - k + 1] * power) % mod
    import numpy as np

    return np.array(out, dtype=np.uint64)


def winnow_fingerprint(sf_dir: str) -> rd.Dataset:
    """doc_id, n_grams, n_fps, min_fp — winnowing document fingerprints
    (Schleimer/Wilkerson/Aiken): the minimum rolling k-gram hash of each
    sliding window of W hashes, deduplicated. Deterministic; near-dup
    docs share fingerprint sets. Reported as summary stats per doc
    (full fingerprint sets feed a groupby at dedup time)."""
    import numpy as np

    def f(df: pd.DataFrame) -> pd.DataFrame:
        n_grams, n_fps, min_fp = [], [], []
        for text in df["text"]:
            h = _rolling_hashes(text.encode("utf-8"))
            if len(h) == 0:
                n_grams.append(0)
                n_fps.append(0)
                min_fp.append(0)
                continue
            if len(h) <= WINNOW_W:
                fps = {int(h.min())}
            else:
                sw = np.lib.stride_tricks.sliding_window_view(h, WINNOW_W)
                fps = set(sw.min(axis=1).tolist())
            n_grams.append(len(h))
            n_fps.append(len(fps))
            min_fp.append(int(np.int64(np.uint64(min(fps)).astype(np.int64))))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_grams": pd.array(n_grams, dtype="int64"),
                "n_fps": pd.array(n_fps, dtype="int64"),
                "min_fp": pd.array(min_fp, dtype="int64"),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pandas"
    )
