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

import os

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


def _predict_lang(text: "pd.Series") -> "pd.Series":
    """Marker-count argmax with the LANG_ORDER first-wins tie-break —
    the ONE prediction kernel shared by ``lang_id`` and
    ``docs_langid_confusion`` (and mirrored by the SQL score CTE)."""
    low = text.str.lower()
    scores = {
        lang: low.str.count(_alt(LANG_MARKERS[lang])).astype("int64")
        for lang in LANG_ORDER
    }
    sc = pd.DataFrame(scores)
    best = sc.max(axis=1)
    pred = pd.Series("en", index=text.index)
    assigned = pd.Series(False, index=text.index)
    for lang in LANG_ORDER:
        hit = (~assigned) & (sc[lang] == best)
        pred[hit] = lang
        assigned |= hit
    return pred


def lang_id(sf_dir: str) -> rd.Dataset:
    """doc_id, pred_lang — deterministic marker-count argmax (first-wins
    tie-break in LANG_ORDER) via the shared ``_predict_lang`` kernel."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "pred_lang": _predict_lang(df["text"])}
        )

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
    """Polynomial k-gram hashes over a byte string (base 257 mod
    2^61-1), one hash per k-gram: h_i = Σ_t b[i+t]·257^(k-1-t) mod p.

    Fully vectorized (round 2, VERDICT r1 item 5): k shifted views of
    the byte array, each multiplied by its power of the base with an
    exact uint64 Mersenne-mod trick — byte·P splits into hi/lo 32-bit
    halves, and hi·2^32 reduces via 2^61 ≡ 1 (mod p) without ever
    overflowing 64 bits. ~100-1000× the removed per-byte Python loop."""
    import numpy as np

    if len(data) < k:
        return np.zeros(0, dtype=np.uint64)
    mod = (1 << 61) - 1
    MOD = np.uint64(mod)
    M29 = np.uint64((1 << 29) - 1)
    b = (
        data.astype(np.uint64)
        if isinstance(data, np.ndarray)
        else np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    )
    n = len(data) - k + 1
    acc = np.zeros(n, dtype=np.uint64)
    for t in range(k):
        power = pow(257, k - 1 - t, mod)
        p_hi, p_lo = power >> 32, power & 0xFFFFFFFF
        x = b[t : t + n]
        # x·p_hi < 2^37; (y·2^32) mod p = (y>>29) + ((y & m29)<<32)  [2^61≡1]
        y = x * np.uint64(p_hi)
        term = ((y >> np.uint64(29)) + ((y & M29) << np.uint64(32))) % MOD
        term = (term + x * np.uint64(p_lo)) % MOD
        acc = (acc + term) % MOD
    return acc


def winnow_fingerprint(sf_dir: str) -> rd.Dataset:
    """doc_id, n_grams, n_fps, min_fp — winnowing document fingerprints
    (Schleimer/Wilkerson/Aiken): the minimum rolling k-gram hash of each
    sliding window of W hashes, deduplicated. Deterministic; near-dup
    docs share fingerprint sets. Reported as summary stats per doc
    (full fingerprint sets feed a groupby at dedup time)."""
    import numpy as np

    def f(df: pd.DataFrame) -> pd.DataFrame:
        # one flat hash pass over the whole batch (per-doc numpy calls
        # are overhead-bound at ~0.5 KB/doc); per-doc hashes are slices
        # of the flat array — a k-gram hash only reads bytes[i:i+k], so
        # positions that stay inside a doc are exact
        texts = [t.encode("utf-8") for t in df["text"]]
        lens = np.array([len(t) for t in texts], dtype=np.int64)
        flat = np.frombuffer(b"".join(texts), dtype=np.uint8)
        H = _rolling_hashes(flat) if len(flat) >= WINNOW_K else np.zeros(0, np.uint64)
        starts = np.zeros(len(texts), dtype=np.int64)
        if len(texts) > 1:
            starts[1:] = np.cumsum(lens)[:-1]

        n_grams, n_fps, min_fp = [], [], []
        for d in range(len(texts)):
            g = lens[d] - WINNOW_K + 1
            if g <= 0:
                n_grams.append(0)
                n_fps.append(0)
                min_fp.append(0)
                continue
            h = H[starts[d] : starts[d] + g]
            if g <= WINNOW_W:
                fps = np.array([h.min()])
            else:
                sw = np.lib.stride_tricks.sliding_window_view(h, WINNOW_W)
                fps = np.unique(sw.min(axis=1))
            n_grams.append(int(g))
            n_fps.append(len(fps))
            min_fp.append(int(fps.min().astype(np.int64)))
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


def gopher_repetition(sf_dir: str) -> rd.Dataset:
    """Gopher-style repetition/quality signals (Rae et al. 2021,
    "Scaling Language Models", §A1.1 quality heuristics) — the
    repetition filters a training-data pipeline runs after crawling:

    - ``n_words``            whitespace token count
    - ``mean_word_len_c``    floor(100 × mean token length)
    - ``top_word_pct``       floor(10000 × most-frequent-token share)
    - ``top_bigram_pct``     floor(10000 × most-frequent-bigram share)

    Integer-scaled so the DuckDB oracle hash-matches exactly. All
    per-doc work is batch-local (no shuffle)."""
    from collections import Counter

    def f(df: pd.DataFrame) -> pd.DataFrame:
        n_words, mwl, topw, topb = [], [], [], []
        for text in df["text"]:
            toks = text.split()
            n = len(toks)
            n_words.append(n)
            if n == 0:
                mwl.append(0)
                topw.append(0)
                topb.append(0)
                continue
            total_len = sum(len(t) for t in toks)
            mwl.append(100 * total_len // n)
            topw.append(10000 * max(Counter(toks).values()) // n)
            if n < 2:
                topb.append(0)
            else:
                bigrams = Counter(zip(toks, toks[1:]))
                topb.append(10000 * max(bigrams.values()) // (n - 1))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_words": pd.array(n_words, dtype="int64"),
                "mean_word_len_c": pd.array(mwl, dtype="int64"),
                "top_word_pct": pd.array(topw, dtype="int64"),
                "top_bigram_pct": pd.array(topb, dtype="int64"),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pandas"
    )


def training_corpus(sf_dir: str) -> rd.Dataset:
    """The end-to-end training-data curation pipeline, composed from
    the verified pieces: quality gate (token/stopword thresholds of
    ``quality_score``) ∧ near-dup removal (keep only each cluster's
    representative from ``near_dup_clusters`` — exact dups are J=1.0
    so they are subsumed) → per-language corpus accounting
    (lang, n_docs, sum_tokens).

    Scale shape: the cluster pass broadcasts only the DROPPED id set
    (non-representatives — sparse: one id per removed near-dup), the
    quality+token math is per-batch regex work, and the final
    aggregation is the bucketed two-phase plan. A doc survives iff
    is_quality AND cluster_id == doc_id (a filtered representative
    takes its whole cluster down with it — curation semantics)."""
    import ray

    from suckit_ray.pipelines.dedup import near_dup_clusters
    from suckit_ray.stages.agg import bucketed_groupby_agg

    clusters = near_dup_clusters(sf_dir)
    dropped = set()
    for part in clusters.iter_batches(batch_size=None, batch_format="pyarrow"):
        for d, c in zip(
            part.column("doc_id").to_pylist(), part.column("cluster_id").to_pylist()
        ):
            if d != c:
                dropped.add(d)
    dropped_ref = ray.put(frozenset(dropped))

    stop_re = _alt(STOPWORDS)

    def curate(df: pd.DataFrame) -> pd.DataFrame:
        dropped_ = ray.get(dropped_ref)
        n_tokens = df["text"].str.count(TOKEN_RE).astype("int64")
        n_stop = df["text"].str.lower().str.count(stop_re).astype("int64")
        keep = (
            (n_tokens >= 20)
            & (n_stop >= 1)
            & ~df["doc_id"].isin(dropped_)
        )
        return pd.DataFrame(
            {
                "lang": df.loc[keep, "lang"],
                "doc_id": df.loc[keep, "doc_id"],
                "n_tokens": n_tokens[keep],
            }
        )

    ds = _read_documents(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        curate, batch_format="pandas"
    )
    return bucketed_groupby_agg(
        ds,
        keys=["lang"],
        aggs={"n_docs": ("doc_id", "count"), "sum_tokens": ("n_tokens", "sum")},
    )


TOP_TERMS_K = 50


def docs_top_terms(sf_dir: str, k: int = TOP_TERMS_K) -> "pa.Table":
    """(rank, term, n_docs): the corpus's top-k terms by DOCUMENT
    frequency — the vocabulary/df statistic a tokenizer-training or
    idf-weighting pipeline needs. Plan: per batch, each doc dissolves
    into its distinct lowercased whitespace terms with per-batch
    partial df counts (the shuffle moves one row per distinct
    (batch, term), never per occurrence) → bucketed sum → per-block
    top-k → driver merge of ≤ k rows per block. Deterministic
    (n_docs desc, term asc) ranking; exact SQL oracle via
    regexp_split_to_array + unnest."""
    import pyarrow as pa

    from suckit_ray.stages.agg import bucketed_groupby_agg

    def explode_terms(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for text in df["text"]:
            c.update(set(text.lower().split()))
        return pd.DataFrame(
            {"term": list(c.keys()), "n": pd.array(list(c.values()), dtype="int64")}
        )

    ds = _read_documents(sf_dir, ["text"]).map_batches(
        explode_terms, batch_format="pandas"
    )
    agg = bucketed_groupby_agg(ds, keys=["term"], aggs={"n_docs": ("n", "sum")})

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n_docs", "term"], ascending=[False, True]).head(k)

    out = (
        agg.map_batches(block_topk, batch_format="pandas")
        .to_pandas()
        .sort_values(["n_docs", "term"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "rank": pa.array(range(1, len(out) + 1), pa.int64()),
            "term": pa.array(out["term"].tolist(), pa.string()),
            "n_docs": pa.array([int(x) for x in out["n_docs"]], pa.int64()),
        }
    )


SAMPLE_PCT = 10
_KNUTH = 2654435761  # Knuth multiplicative hash constant


def docs_stratified_sample(sf_dir: str, pct: int = SAMPLE_PCT) -> rd.Dataset:
    """Deterministic stratified sample: keep a ~pct% hash-slice of every
    language stratum — the reproducible down-sampling a corpus-ablation
    pipeline needs (same doc set on every run/cluster, no RNG state).
    Selection key: ((doc_id mod 2^31) * Knuth) mod 2^32 mod 100 < pct —
    exactly reproducible in SQL, and the pre-reduction keeps the
    product inside int64 at any doc_id (2^31 · Knuth < 2^63). Returns
    per-stratum accounting (lang, n_sampled, sum_chars) — a pure
    distributed filter + bucketed aggregate; no shuffle carries text."""
    from suckit_ray.stages.agg import bucketed_groupby_agg

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        keep = (df["doc_id"] % (1 << 31)) * _KNUTH % (1 << 32) % 100 < pct
        out = df.loc[keep]
        return pd.DataFrame(
            {
                "lang": out["lang"],
                "doc_id": out["doc_id"],
                "n_chars": out["text"].str.len().astype("int64"),
            }
        )

    ds = _read_documents(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        pick, batch_format="pandas"
    )
    return bucketed_groupby_agg(
        ds,
        keys=["lang"],
        aggs={"n_sampled": ("doc_id", "count"), "sum_chars": ("n_chars", "sum")},
    )


def quality_dedup_overlap(sf_dir: str) -> "pa.Table":
    """Set operations between two derived doc sets — the quality-gated
    docs (token/stopword thresholds of quality_score) and the exact-
    dedup survivors: |A∩B|, |A\\B|, |B\\A| as one row. Each side is a
    distributed id set (small int columns); the set algebra happens on
    sorted id arrays driver-side (both sets are already thresholded
    outputs — the same sparse shape every pair pipeline ends with)."""
    import numpy as np
    import pyarrow as pa

    from suckit_ray.pipelines.dedup import exact_dedup

    q = quality_score(sf_dir)

    def ids_only(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df.loc[df["is_quality"] == 1, "doc_id"]})

    a = np.sort(
        q.map_batches(ids_only, batch_format="pandas").to_pandas()["doc_id"].to_numpy()
    )
    b = np.sort(exact_dedup(sf_dir).to_pandas()["doc_id"].to_numpy())
    inter = np.intersect1d(a, b, assume_unique=True)
    return pa.table(
        {
            "n_quality": pa.array([len(a)], pa.int64()),
            "n_dedup_survivors": pa.array([len(b)], pa.int64()),
            "n_both": pa.array([len(inter)], pa.int64()),
            "n_quality_only": pa.array([len(a) - len(inter)], pa.int64()),
            "n_dedup_only": pa.array([len(b) - len(inter)], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap vs a broadcast eval set)
# ---------------------------------------------------------------------------

DECONTAM_K = 4          # word n-gram length for overlap matching
DECONTAM_EVAL_MOD = 23  # eval/benchmark docs: doc_id % MOD == 0


def _ngram_hashes(text: str, k: int) -> "np.ndarray":
    """Distinct word-k-gram hashes of a doc (md5-60-bit, the repo-wide
    SQL-reproducible hash — suckit_ray.pipelines.dedup._md5h60). Docs
    with fewer than k tokens yield NO grams — matching the SQL
    oracles' range() CTE exactly (no whole-text pseudo-gram fallback;
    a <k-token doc scores n_shared = 0 in decontamination and drops
    out of the dup-fraction table in BOTH engines)."""
    import numpy as np

    from suckit_ray.pipelines.dedup import _md5h60

    toks = text.split()
    grams = {" ".join(toks[i : i + k]) for i in range(max(0, len(toks) - k + 1))}
    return np.fromiter(
        (_md5h60(g) for g in grams), dtype=np.int64, count=len(grams)
    )


def docs_decontaminate(
    sf_dir: str, k: int = DECONTAM_K, eval_mod: int = DECONTAM_EVAL_MOD
) -> rd.Dataset:
    """(doc_id, n_shared, contaminated) for every TRAINING doc — the
    eval-set decontamination step of a training-data pipeline: a
    training doc is contaminated if it shares any word-k-gram with the
    benchmark/eval set (here the deterministic in-corpus slice
    doc_id % eval_mod == 0; in production, the held-out benchmark
    suite). n_shared = number of DISTINCT k-grams of the doc that also
    occur anywhere in the eval set.

    Scale shape: the eval side is small by nature (benchmarks are
    bounded, unlike the corpus), so this is the canonical broadcast
    anti-join — the eval k-gram hash set is computed distributed,
    collected once (sorted int64 array), ``ray.put`` once, and each
    training batch runs ONE vectorized ``np.isin`` against it; the
    O(corpus) side never shuffles. Hashing is md5-60-bit so the DuckDB
    oracle replays the overlap with string equality (collision odds
    ~2^-60 per gram pair)."""
    import numpy as np
    import ray

    def eval_grams(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df["doc_id"] % eval_mod == 0]
        hs = (
            np.unique(np.concatenate([_ngram_hashes(t, k) for t in sub["text"]]))
            if len(sub)
            else np.array([], dtype=np.int64)
        )
        return pd.DataFrame({"h": hs})

    eval_parts = _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        eval_grams, batch_format="pandas"
    )
    ev = np.unique(eval_parts.to_pandas()["h"].to_numpy())  # sorted
    ev_ref = ray.put(ev)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        ev_ = ray.get(ev_ref)
        sub = df[df["doc_id"] % eval_mod != 0]
        if not len(sub):
            return pd.DataFrame(
                {"doc_id": [], "n_shared": [], "contaminated": []}
            ).astype("int64")
        # one flat isin per batch: concatenate all docs' gram hashes,
        # then bincount the membership mask back per doc (robust to
        # gram-less short docs, unlike reduceat on their boundaries)
        grams = [_ngram_hashes(t, k) for t in sub["text"]]
        lens = np.array([len(g) for g in grams], dtype=np.int64)
        flat = np.concatenate(grams) if len(grams) else np.array([], dtype=np.int64)
        hit = np.isin(flat, ev_, assume_unique=False)
        doc_idx = np.repeat(np.arange(len(grams)), lens)
        n_shared = np.bincount(doc_idx[hit], minlength=len(grams)).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": sub["doc_id"].astype("int64"),
                "n_shared": n_shared.astype("int64"),
                "contaminated": (n_shared > 0).astype("int64"),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# corpus-wide duplicate n-gram fraction (exact-substring dup signal)
# ---------------------------------------------------------------------------

DUP_NGRAM_K = 4        # word n-gram length
DUP_NGRAM_MIN_DOCS = 2 # a gram is "duplicated" if it occurs in >= 2 docs


def docs_dup_ngram_fraction(sf_dir: str, k: int = DUP_NGRAM_K) -> rd.Dataset:
    """(doc_id, n_grams, n_dup, dup_pct): for each doc, how many of
    its DISTINCT word-k-grams occur in at least one OTHER doc —
    the corpus-level exact-substring duplication signal (the scalable
    stand-in for suffix-array substring dedup: a doc whose k-grams are
    mostly shared is a copy/template). dup_pct = floor(10000*n_dup/
    n_grams).

    Scale shape — two bounded shuffles, no driver state: explode docs
    to (doc_id, gram-hash, per-doc total) rows; groupby gram-hash
    bucket computes each gram's doc-frequency INSIDE the bucket
    (grams of one hash always co-locate) and emits per-(doc, bucket)
    partial dup counts; a bucketed per-doc aggregation sums the
    partials. Both exchanges carry 3 int64 columns."""
    import numpy as np

    from suckit_ray.stages.agg import bucketed_groupby_agg, default_buckets

    B = default_buckets()

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        doc_ids, hs, ns = [], [], []
        for d, t in zip(df["doc_id"], df["text"]):
            g = _ngram_hashes(t, k)
            doc_ids.extend([d] * len(g))
            hs.extend(g.tolist())
            ns.extend([len(g)] * len(g))
        out = pd.DataFrame(
            {"doc_id": doc_ids, "h": hs, "n": ns}, dtype="int64"
        )
        out["hb"] = (out["h"] % B).astype("int64")
        return out

    ds = _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        explode, batch_format="pandas"
    )

    def bucket_partial(g: pd.DataFrame) -> pd.DataFrame:
        freq = g.groupby("h")["doc_id"].transform("size")
        g = g.assign(dup=(freq >= DUP_NGRAM_MIN_DOCS).astype("int64"))
        return g.groupby("doc_id", as_index=False).agg(
            n_dup=("dup", "sum"), n_grams=("n", "max")
        )

    partials = ds.groupby("hb").map_groups(bucket_partial, batch_format="pandas")
    agg = bucketed_groupby_agg(
        partials,
        keys=["doc_id"],
        aggs={"n_dup": ("n_dup", "sum"), "n_grams": ("n_grams", "max")},
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_grams": df["n_grams"].astype("int64"),
                "n_dup": df["n_dup"].astype("int64"),
                "dup_pct": np.floor(
                    10000.0 * df["n_dup"] / df["n_grams"].clip(lower=1)
                ).astype("int64"),
            }
        )

    return agg.map_batches(finish, batch_format="pandas")


def _dup_positions(sf_dir: str, k: int) -> rd.Dataset:
    """(doc_id, pos, db) rows for every position whose word-k-gram
    occurs in ≥ DUP_NGRAM_MIN_DOCS distinct docs — the shared front of
    docs_dup_spans (islands) and docs_cut_dup_spans (masking): explode
    to (doc_id, pos, gram-hash) bucketed by hash (a gram's
    doc-frequency computes entirely inside its bucket); only the
    DUPLICATED positions — sparse on a healthy corpus — leave the
    group, pre-bucketed by doc for the consumer's co-group."""
    from suckit_ray.pipelines.dedup import _md5h60_memo
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        doc_ids, poss, hs = [], [], []
        # md5 once per DISTINCT gram in the batch, not per occurrence —
        # repetitive docs (these operators' very target) would
        # otherwise pay the digest per position
        h = _md5h60_memo()
        for d, t in zip(df["doc_id"], df["text"]):
            toks = t.split()
            n = len(toks) - k + 1
            if n <= 0:
                continue
            doc_ids.extend([d] * n)
            poss.extend(range(n))
            hs.extend(h(" ".join(toks[i : i + k])) for i in range(n))
        out = pd.DataFrame({"doc_id": doc_ids, "pos": poss, "h": hs}, dtype="int64")
        out["hb"] = (out["h"] % B).astype("int64")
        return out

    ds = _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        explode, batch_format="pandas"
    )

    def dup_positions(g: pd.DataFrame) -> pd.DataFrame:
        # distinct-DOC frequency (a gram repeating inside one doc is
        # not corpus duplication) — grams of one hash co-locate here
        df_docs = g.groupby("h")["doc_id"].transform("nunique")
        keep = g[df_docs >= DUP_NGRAM_MIN_DOCS]
        out = keep[["doc_id", "pos"]].copy()
        out["db"] = (out["doc_id"] % B).astype("int64")
        return out

    return ds.groupby("hb").map_groups(dup_positions, batch_format="pandas")


def docs_dup_spans(sf_dir: str, k: int = DUP_NGRAM_K) -> rd.Dataset:
    """(doc_id, start_pos, end_pos, n_grams): MAXIMAL runs of
    consecutive duplicated word-k-gram positions per doc — the span
    form of exact-substring duplication (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better": the
    actionable output is *which byte ranges* to cut, not just a
    fraction). A position is duplicated when its k-gram occurs in
    ≥ ``DUP_NGRAM_MIN_DOCS`` distinct docs; consecutive positions
    merge by the gaps-and-islands rule (pos − rank is constant within
    a run). ``start_pos``/``end_pos`` are 0-based positions of the
    run's first/last gram; the duplicated token range is
    [start_pos, end_pos + k - 1].

    Scale shape — two bounded shuffles, no driver state: explode to
    (doc_id, pos, gram-hash) rows bucketed by hash (a gram's
    doc-frequency computes entirely inside its bucket); only the
    DUPLICATED positions — sparse on a healthy corpus — ride the
    second shuffle, bucketed by doc, where the island merge is one
    sort + cumcount + groupby per doc. Both exchanges carry 3 int64
    columns."""
    dup = _dup_positions(sf_dir, k)

    def islands(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                columns=["doc_id", "start_pos", "end_pos", "n_grams"]
            ).astype("int64")
        g = g.sort_values(["doc_id", "pos"]).reset_index(drop=True)
        g["grp"] = g["pos"] - g.groupby("doc_id").cumcount()
        out = g.groupby(["doc_id", "grp"], as_index=False).agg(
            start_pos=("pos", "min"), end_pos=("pos", "max"), n_grams=("pos", "size")
        )
        return out[["doc_id", "start_pos", "end_pos", "n_grams"]].astype("int64")

    return dup.groupby("db").map_groups(islands, batch_format="pandas")


SEGMENT_W = 8  # words per dedup segment (CCNet dedups paragraphs;
# the synthetic docs are single-line, so fixed-width word windows
# stand in for paragraph boundaries)


def docs_segment_dedup(sf_dir: str, w: int = SEGMENT_W) -> rd.Dataset:
    """(doc_id, seg_idx, kept): corpus-wide exact SEGMENT dedup — the
    paragraph/line-level pass CCNet (Wenzek et al. 2020) runs before
    any fuzzy dedup: split every doc into fixed ``w``-word segments
    (last segment keeps the remainder), drop every segment whose exact
    text occurred earlier, where "earlier" is the deterministic
    (doc_id, seg_idx) order — first occurrence wins, matching
    ``ROW_NUMBER() OVER (PARTITION BY segment ORDER BY doc_id,
    seg_idx)`` in the oracle.

    Scale shape — ONE bounded shuffle, no driver state: explode to
    (doc_id, seg_idx, segment-hash) int64 rows bucketed by hash; all
    occurrences of a segment co-locate, so the keep/drop decision is a
    per-group sort + first-wins flag. The shuffle carries 3 int64
    columns regardless of segment text size."""
    import numpy as np

    from suckit_ray.pipelines.dedup import _md5h60_memo
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        doc_ids, idxs, hs = [], [], []
        h = _md5h60_memo()
        for d, t in zip(df["doc_id"], df["text"]):
            toks = t.split()
            for s in range((len(toks) + w - 1) // w):
                doc_ids.append(d)
                idxs.append(s)
                hs.append(h(" ".join(toks[s * w : (s + 1) * w])))
        out = pd.DataFrame(
            {"doc_id": doc_ids, "seg_idx": idxs, "h": hs}, dtype="int64"
        )
        out["hb"] = (out["h"] % B).astype("int64")
        return out

    ds = _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        explode, batch_format="pandas"
    )

    def first_wins(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(columns=["doc_id", "seg_idx", "kept"]).astype(
                "int64"
            )
        g = g.sort_values(["h", "doc_id", "seg_idx"]).reset_index(drop=True)
        kept = (g.groupby("h").cumcount() == 0).astype("int64")
        out = g[["doc_id", "seg_idx"]].copy()
        out["kept"] = np.asarray(kept, dtype="int64")
        return out

    return ds.groupby("hb").map_groups(first_wins, batch_format="pandas")


LM_NLL_SCALE = 1_000_000  # micronats: floor(-ln(p) * 1e6) as int64


def docs_lm_score(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_bigrams, nll_micro, avg_nll_micro): corpus-trained
    add-one-smoothed bigram language-model score per doc — the
    CCNet-style (Wenzek et al. 2020) perplexity quality signal, where
    high avg negative-log-likelihood marks gibberish/outlier docs.
    p(w2|w1) = (c(w1,w2) + 1) / (c(w1,·) + V) with V = corpus distinct
    tokens; each bigram contributes floor(-ln(p) × 1e6) MICRONATS, an
    int64 — quantizing per token BEFORE the reduction makes the float
    sum ORDER-FREE (the same trick the revenue rollup uses for
    money); cross-engine equality additionally needs libm's log and
    DuckDB's ln to agree at every floor boundary, a ~1e-9-per-bigram
    last-ULP risk the scalar-libm scoring below minimizes (and the
    fixed test corpora pin). avg_nll_micro = nll_micro // n_bigrams
    (0 for docs with < 2 tokens; those ride a zero-row stream that
    joins at the final per-doc sum, not through the hash co-groups).

    Scale shape — ONE count-and-attach co-group, ZERO driver model
    state: a broadcast bigram table is O(distinct corpus bigrams),
    which grows with corpus size at web scale, so instead both counts
    are computed where the rows already are. Bucketing by CONTEXT-WORD
    hash co-locates every occurrence of w1-as-context AND every
    occurrence of each w1-starting bigram, so c1 and c2 are two
    group-local sizes in a single shuffle; a bucketed per-doc sum
    finishes. V (exact distinct tokens) rides the SAME exchange:
    batch-distinct token rows bucket by their own hash and each
    group's marker row carries its local vocab count — no separate
    text scan (measured ~13% faster A/B under identical load).
    Known skew bound: the hottest context word's occurrences form one
    group (same bound the two-stage variant had) — at true web scale
    the standard configuration is instead a PRUNED/pretrained LM
    broadcast once (CCNet ships a fixed KenLM), which this co-group
    path deliberately avoids needing for the corpus-trained case."""
    import numpy as np

    from suckit_ray.pipelines.dedup import _md5h60_memo
    from suckit_ray.stages.agg import bucketed_groupby_agg, default_buckets

    B = default_buckets()

    # --- single pass: bigram occurrence rows (side 0) + per-batch
    # DISTINCT token rows (side 1, keyed by the token's own hash) in
    # one tagged frame. V = exact distinct tokens over all positions
    # used to be a SEPARATE full text scan + shuffle; the token rows
    # now ride the main exchange and each group's marker carries its
    # local vocab count (the docs_dsir_weights marker fusion).
    def explode(df: pd.DataFrame) -> pd.DataFrame:
        doc_ids, bghs, w1hs = [], [], []
        toks_seen: set[int] = set()
        h = _md5h60_memo()
        for d, t in zip(df["doc_id"], df["text"]):
            toks = t.split()
            for i in range(len(toks) - 1):
                doc_ids.append(d)
                bghs.append(h(toks[i] + " " + toks[i + 1]))
                w1hs.append(h(toks[i]))
            if toks:
                # every token at position < n−1 is a context hash
                # already in w1hs; only the final token is new
                toks_seen.add(h(toks[-1]))
        toks_seen.update(w1hs)
        vs = sorted(toks_seen)
        out = pd.DataFrame(
            {
                "doc_id": doc_ids + [-1] * len(vs),
                "bgh": bghs + [0] * len(vs),
                "w1h": w1hs + vs,
                "side": [0] * len(doc_ids) + [1] * len(vs),
            },
            dtype="int64",
        )
        out["cnt"] = (out["side"] == 0).astype("int64")
        # ONE co-group key: every occurrence of a bigram shares its
        # context word, so bucketing by w1h co-locates both the c1
        # population (all occurrences of w1-as-context) AND the c2
        # population (all occurrences of each w1-starting bigram) —
        # a separate bigram-hash co-group would be a second full
        # all-to-all for nothing. Token rows bucket by their own hash,
        # so group-local distinct counts sum to the global V.
        out["wb"] = (out["w1h"] % B).astype("int64")
        return out

    # per-doc zero rows ride straight to the FINAL per-doc sum —
    # they keep <2-token docs in the output with (0, 0, 0), mirroring
    # the oracle's LEFT JOIN, WITHOUT touching the hash co-group
    # (an earlier sentinel-row design put one row per document into
    # hash bucket −1 % B of the shuffles — an O(corpus-docs)
    # straggler group at scale)
    def zeros(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "nll": 0,
                "cnt": 0,
            }
        ).astype({"nll": "int64", "cnt": "int64"})

    ds = _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        explode, batch_format="pandas"
    )

    def group_counts(g: pd.DataFrame) -> pd.DataFrame:
        """Per-bigram-occurrence (doc_id, c2, c1) + ONE marker row
        (doc_id = −2) carrying the group's distinct-token count."""
        cols = ["doc_id", "c2", "c1"]
        if len(g) == 0:
            return pd.DataFrame(
                {c: pd.array([], dtype="int64") for c in cols}
            )
        b = g[g["side"] == 0]
        vocab_n = int(g.loc[g["side"] == 1, "w1h"].nunique())
        marker = pd.DataFrame(
            {"doc_id": [-2], "c2": [vocab_n], "c1": [0]}
        )
        if len(b) == 0:
            return marker.astype("int64")
        # both counts are group-local under the w1h bucketing above
        c1 = b.groupby("w1h")["cnt"].transform("sum").to_numpy()
        c2 = b.groupby("bgh")["cnt"].transform("sum").to_numpy()
        out = pd.DataFrame(
            {"doc_id": b["doc_id"].to_numpy(), "c2": c2, "c1": c1}
        )
        return pd.concat([out, marker], ignore_index=True).astype("int64")

    merged = (
        ds.groupby("wb")
        .map_groups(group_counts, batch_format="pandas")
        .materialize()  # feeds the V scan AND the factor map
    )

    marks = merged.map_batches(
        lambda d: d[d["doc_id"] < 0], batch_format="pandas"
    ).to_pandas()
    V = int(marks["c2"].sum()) if "c2" in marks.columns else 0
    Vf = float(V)

    def factors(d: pd.DataFrame) -> pd.DataFrame:
        import math

        d = d[d["doc_id"] >= 0]
        if len(d) == 0:
            return pd.DataFrame(columns=["doc_id", "nll", "cnt"]).astype(
                "int64"
            )
        # scalar libm log per DISTINCT (c2, c1) pair, gathered back:
        # counts are small ints so distinct pairs are few, and
        # math.log (libm) tracks DuckDB's ln closer than numpy's SIMD
        # float64 log — shrinking the (already ~1e-9/bigram) risk of a
        # last-ULP difference flipping a floor at an integer boundary
        pairs = np.stack([d["c2"].to_numpy(), d["c1"].to_numpy()], axis=1)
        uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
        nll_u = np.fromiter(
            (
                math.floor(-math.log((a + 1.0) / (b + Vf)) * LM_NLL_SCALE)
                for a, b in uniq
            ),
            dtype=np.int64,
            count=len(uniq),
        )
        return pd.DataFrame(
            {
                "doc_id": d["doc_id"].to_numpy(),
                "nll": nll_u[inv],
                "cnt": pd.Series(1, index=d.index, dtype="int64").to_numpy(),
            }
        )

    scored = merged.map_batches(factors, batch_format="pandas")

    agg = bucketed_groupby_agg(
        scored.union(
            _read_documents(sf_dir, ["doc_id"]).map_batches(
                zeros, batch_format="pandas"
            )
        ),
        keys=["doc_id"],
        aggs={"nll_micro": ("nll", "sum"), "n_bigrams": ("cnt", "sum")},
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_bigrams"].astype("int64")
        s = df["nll_micro"].astype("int64")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_bigrams": n,
                "nll_micro": s,
                "avg_nll_micro": (s // n.clip(lower=1)).astype("int64"),
            }
        )

    return agg.map_batches(finish, batch_format="pandas")


def docs_cut_dup_spans(sf_dir: str, k: int = DUP_NGRAM_K) -> rd.Dataset:
    """(doc_id, n_tokens, n_cut, text_clean): APPLY the duplicated-span
    cuts — the final step of exact-substring dedup (Lee et al. 2021):
    every token covered by a ``docs_dup_spans`` run (token range
    [start_pos, end_pos + k − 1]) is removed and the survivors are
    rejoined with single spaces. Docs with no duplicated spans pass
    through whole (whitespace-normalized by the same join).

    Scale shape — the span pipeline's two bounded shuffles plus ONE
    doc-bucketed co-group where the cut ranges meet their text: spans
    and documents stream in as a tagged union bucketed by doc, so each
    group holds a doc's text and all its ranges; masking is one numpy
    pass per doc. Text crosses the wire once. Feeding the co-group
    SPANS rather than raw duplicated positions is deliberate: the
    islands merge compresses a long duplicated run to one (start, end)
    row, so the doc shuffle carries O(runs), not O(duplicated grams) —
    an A/B against a position-fed variant measured 5.0 s vs 10.9 s at
    sf0.1/32 cpus, and the gap widens with duplication depth."""
    import numpy as np

    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()
    spans = docs_dup_spans(sf_dir, k)

    def tag_spans(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "a": df["start_pos"].astype("int64"),
                "b": (df["end_pos"] + (k - 1)).astype("int64"),
                "text": "",
            }
        )
        out["db"] = (out["doc_id"] % B).astype("int64")
        return out

    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "a": -1,
                "b": -1,
                "text": df["text"],
            }
        )
        out["db"] = (out["doc_id"] % B).astype("int64")
        return out

    tagged = spans.map_batches(tag_spans, batch_format="pandas").union(
        _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
            tag_docs, batch_format="pandas"
        )
    )

    def apply_cuts(g: pd.DataFrame) -> pd.DataFrame:
        docs = g[g["a"] < 0]
        cuts = g[g["a"] >= 0]
        ranges = {
            d: list(zip(sub["a"].to_numpy(), sub["b"].to_numpy()))
            for d, sub in cuts.groupby("doc_id")
        }
        doc_ids, n_toks, n_cuts, texts = [], [], [], []
        for d, t in zip(docs["doc_id"], docs["text"]):
            toks = t.split()
            mask = np.zeros(len(toks), dtype=bool)
            for a, b in ranges.get(d, ()):
                mask[a : b + 1] = True
            doc_ids.append(d)
            n_toks.append(len(toks))
            n_cuts.append(int(mask.sum()))
            texts.append(" ".join(tok for tok, m in zip(toks, mask) if not m))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "n_tokens": pd.Series(n_toks, dtype="int64"),
                "n_cut": pd.Series(n_cuts, dtype="int64"),
                "text_clean": pd.Series(texts, dtype="object"),
            }
        )

    return tagged.groupby("db").map_groups(apply_cuts, batch_format="pandas")


PACK_SEQ_LEN = 32     # tokens per packed training sequence
PACK_BUCKET = 4096    # doc_ids per scan bucket (driver prefix length
# = max_doc_id / PACK_BUCKET: 10^10 docs at 10^6-doc buckets → 10^4
# partials; raise it with corpus size to keep the prefix tiny)


def docs_pack_sequences(sf_dir: str, seq_len: int = PACK_SEQ_LEN) -> rd.Dataset:
    """(doc_id, n_tokens, start_off, first_seq, last_seq): SEQUENCE
    PACKING — the step that turns a curated corpus into fixed-length
    training examples: concatenate all docs in doc_id order and cut
    every ``seq_len`` tokens, so each doc lands in sequences
    [start_off // seq_len, (start_off + n − 1) // seq_len] where
    start_off is the doc's global token offset (−1/−1 for empty docs).

    This is the repo's distributed PREFIX SUM (scan) primitive — an
    inherently order-dependent quantity no single co-group can
    produce. Shape: (1) per-batch partial token sums per doc_id-range
    bucket (a combiner: one row per bucket per batch); (2) the
    BOUNDED per-bucket totals come to the driver — O(max_doc_id /
    PACK_BUCKET) ints, not O(docs) — for one numpy exclusive prefix,
    broadcast back via ``ray.put``; (3) one groupby co-group per
    bucket computes the within-bucket running sum on top of its
    bucket's base. One shuffle carrying 3 int64 columns; the driver
    holds only the bucket prefix."""
    import numpy as np
    import ray

    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        n = df["text"].str.split().str.len().fillna(0).astype("int64")
        out = pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"), "n": n}
        )
        out["kb"] = (out["doc_id"] // PACK_BUCKET).astype("int64")
        return out

    cnt = _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        counts, batch_format="pandas"
    )

    from suckit_ray.stages.agg import bucket_prefix_bases

    base_ref = bucket_prefix_bases(cnt, "kb", weight_col="n")

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                columns=["doc_id", "n_tokens", "start_off", "first_seq", "last_seq"]
            ).astype("int64")
        base = ray.get(base_ref)
        g = g.sort_values("doc_id").reset_index(drop=True)
        n = g["n"].to_numpy()
        off = int(base[int(g["kb"].iloc[0])]) + np.concatenate(
            ([0], np.cumsum(n)[:-1])
        )
        first = np.where(n > 0, off // seq_len, -1)
        last = np.where(n > 0, (off + n - 1) // seq_len, -1)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "n_tokens": n,
                "start_off": off.astype("int64"),
                "first_seq": first.astype("int64"),
                "last_seq": last.astype("int64"),
            }
        )

    # group key is the RANGE bucket itself: each group is one
    # contiguous doc_id range, so the within-group sort is the global
    # order restricted to the bucket
    return cnt.groupby("kb").map_groups(scan, batch_format="pandas")


# --- PII redaction (docs_redact_pii) --------------------------------
# Patterns are mirrored VERBATIM in the oracle SQL (RE2). RE2's \d/\b
# are ASCII; Python's default is Unicode (é counts as a word char, ١
# as a digit), so every Python application below passes re.ASCII —
# without it the match sets diverge on non-ASCII text near digits.
# Both engines are leftmost-first; no lookarounds (RE2 has none).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+\d{1,2}-\d{3}-\d{4}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def docs_redact_pii(sf_dir: str) -> rd.Dataset:
    """(doc_id, clean_text, n_emails, n_phones, n_ips): scrub
    email / phone / IPv4 literals from document text — the PII-removal
    pass a training-corpus pipeline runs before packing (cf. C4 /
    RefinedWeb postprocessing). The synthetic corpus carries no PII, so
    the harness first DERIVES a PII-bearing input deterministically
    from (text, doc_id) — the SAME derivation expression appears in the
    oracle SQL, making the redaction KERNEL (the three regexes, their
    application order, and the match counts) the thing under test.

    Scale shape: a pure ``map_batches`` stage — no shuffle, no state;
    all three substitutions and counts are vectorized pandas ``.str``
    kernels over the batch. At 100 TB this is embarrassingly parallel
    and I/O-bound.
    """

    def redact(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].astype("int64")
        # deterministic PII injection — mirrored in the oracle SQL
        pii = (
            df["text"].astype(str)
            + " Contact u"
            + d.astype(str)
            + "@ex"
            + (d % 7).astype(str)
            + ".com or +1-"
            + (100 + d % 900).astype(str)
            + "-"
            + (d % 10000).astype(str).str.zfill(4)
            + " from 10."
            + (d % 256).astype(str)
            + "."
            + (d * 7 % 256).astype(str)
            + "."
            + (d * 13 % 256).astype(str)
            + " now."
        )
        out = pd.DataFrame({"doc_id": d})
        import re

        A = re.ASCII
        out["n_emails"] = pii.str.count(EMAIL_RE, flags=A).astype("int64")
        out["n_phones"] = pii.str.count(PHONE_RE, flags=A).astype("int64")
        out["n_ips"] = pii.str.count(IPV4_RE, flags=A).astype("int64")
        clean = pii.str.replace(EMAIL_RE, "[EMAIL]", regex=True, flags=A)
        clean = clean.str.replace(PHONE_RE, "[PHONE]", regex=True, flags=A)
        clean = clean.str.replace(IPV4_RE, "[IP]", regex=True, flags=A)
        out["clean_text"] = clean
        return out[["doc_id", "clean_text", "n_emails", "n_phones", "n_ips"]]

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        redact, batch_format="pandas"
    )


# --- per-document TF-IDF top-k (docs_tfidf_topk) ---------------------
TFIDF_K = 3
IDF_MICRO = 1_000_000  # quantization unit; mirrored in the oracle


def docs_tfidf_topk(sf_dir: str, k: int = TFIDF_K) -> rd.Dataset:
    """(doc_id, rank, term, tf, df, tfidf_micro): each document's top-k
    terms by TF-IDF — the keyword/topic signal a corpus-indexing or
    domain-mixing pipeline derives per doc. tfidf_micro =
    tf × floor(ln(N/df) × 1e6): the idf is quantized to integer
    MICRO-nats per term BEFORE the multiply (the docs_lm_score trick),
    so the score is an exact int64 and ranking is bit-stable across
    engines; ties break (tfidf_micro desc, term asc).

    Scale shape — no broadcast vocabulary: (1) one streaming pass
    explodes distinct (doc, term, tf) rows (one row per distinct term
    per doc, never per occurrence); (2) a TERM-hash-bucketed co-group
    computes each term's df from group size and attaches idf where the
    rows already are (a broadcast DF table would be O(vocab), which at
    web scale is billions of entries); (3) a DOC-hash-bucketed group
    takes the per-doc top-k. Two bounded shuffles of narrow int/str
    rows; N comes from a streaming count.
    """
    import math

    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()
    N = _read_documents(sf_dir, ["doc_id"]).count()

    from suckit_ray.pipelines.dedup import _md5h60_memo

    import re

    # split on ASCII \s+ to mirror the oracle's RE2 split — Python's
    # argless split() is Unicode-whitespace and diverges on e.g. \xa0
    ws = re.compile(r"\s+", re.ASCII)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        h = _md5h60_memo()
        rows_d: list[int] = []
        rows_t: list[str] = []
        rows_tf: list[int] = []
        for d, t in zip(df["doc_id"], df["text"]):
            terms = Counter(tok for tok in ws.split(t.lower()) if tok)
            for term, tf in terms.items():
                rows_d.append(d)
                rows_t.append(term)
                rows_tf.append(tf)
        if not rows_d:
            return pd.DataFrame(
                {
                    "doc_id": pd.array([], dtype="int64"),
                    "term": pd.array([], dtype="str"),
                    "tf": pd.array([], dtype="int64"),
                    "tb": pd.array([], dtype="int64"),
                }
            )
        out = pd.DataFrame({"doc_id": rows_d, "term": rows_t, "tf": rows_tf})
        out["doc_id"] = out["doc_id"].astype("int64")
        out["tf"] = out["tf"].astype("int64")
        # term-hash bucket for the df co-group (python hash is not
        # stable across workers — use a stable digest)
        out["tb"] = out["term"].map(lambda s: h(s) % B).astype("int64")
        return out

    def attach_idf(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.array([], dtype="int64"),
                    "term": pd.array([], dtype="str"),
                    "tf": pd.array([], dtype="int64"),
                    "df": pd.array([], dtype="int64"),
                    "tfidf_micro": pd.array([], dtype="int64"),
                    "db": pd.array([], dtype="int64"),
                }
            )
        df_counts = g.groupby("term")["doc_id"].transform("size").astype("int64")
        g = g.assign(df=df_counts)
        # one libm call per DISTINCT df value, not per row (the
        # docs_lm_score idiom)
        idf_map = {
            int(v): math.floor(math.log(N / int(v)) * IDF_MICRO)
            for v in df_counts.unique()
        }
        idf = g["df"].map(idf_map).astype("int64")
        g = g.assign(tfidf_micro=(g["tf"] * idf).astype("int64"))
        g["db"] = (g["doc_id"] % B).astype("int64")
        return g[["doc_id", "term", "tf", "df", "tfidf_micro", "db"]]

    def per_doc_topk(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.array([], dtype="int64"),
                    "rank": pd.array([], dtype="int64"),
                    "term": pd.array([], dtype="str"),
                    "tf": pd.array([], dtype="int64"),
                    "df": pd.array([], dtype="int64"),
                    "tfidf_micro": pd.array([], dtype="int64"),
                }
            )
        g = g.sort_values(
            ["doc_id", "tfidf_micro", "term"], ascending=[True, False, True]
        )
        g = g.groupby("doc_id", sort=False).head(k).copy()
        g["rank"] = (g.groupby("doc_id", sort=False).cumcount() + 1).astype(
            "int64"
        )
        return g[["doc_id", "rank", "term", "tf", "df", "tfidf_micro"]]

    exploded = _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        explode, batch_format="pandas"
    )
    scored = exploded.groupby("tb").map_groups(attach_idf, batch_format="pandas")
    return scored.groupby("db").map_groups(per_doc_topk, batch_format="pandas")


# --- deterministic global shuffle (docs_global_shuffle) --------------
SHUFFLE_SEED = 42  # mirrored in the oracle SQL


def docs_zorder_layout(sf_dir: str) -> rd.Dataset:
    """(part, n_docs, d1_min, d1_max, d2_min, d2_max, z_min, z_max):
    Z-ORDER (Morton-curve) data-skipping layout of the corpus over two
    dimensions — d1 = length bucket ``min(15, n_chars // 40)``, d2 =
    4 md5 bits of the doc id (standing in for any second clustering
    dimension) — bit-interleaved into an 8-bit zkey whose top 4 bits
    are the partition. The point of the curve: every partition covers
    a 4×4 QUADRANT of the (d1, d2) grid, so its min/max zone-map
    bounds are tight in BOTH dimensions and a range predicate on
    either one prunes ~¾ of the partitions — the multi-dimensional
    layout pass (Delta/Iceberg ``OPTIMIZE ZORDER BY``) a 100 TB corpus
    runs before handing files to query engines. The per-partition
    (count, per-dim min/max, zkey span) rows ARE the zone map.

    Scale shape: one embarrassingly-parallel map computes keys
    (vectorized bit ops; the md5-per-doc-id loop is the
    ``docs_global_shuffle`` idiom — id strings are tiny), then ONE
    two-phase aggregation whose exchange carries ≤ 16 zone-map rows
    per batch. Rewriting the files themselves is
    ``sinks.compact_parquet`` composed with this key — the layout
    STATS are the verifiable part."""
    import hashlib

    import numpy as np

    from suckit_ray.stages.agg import bucketed_groupby_agg

    def zmap(df: pd.DataFrame) -> pd.DataFrame:
        d1 = np.minimum(15, df["n_chars"].astype("int64") // 40)
        d2 = np.fromiter(
            (
                int(hashlib.md5(str(int(d)).encode()).hexdigest()[0], 16)
                for d in df["doc_id"]
            ),
            dtype="int64",
            count=len(df),
        )
        zkey = (
            (d1 & 1)
            + (d2 & 1) * 2
            + (d1 & 2) * 2
            + (d2 & 2) * 4
            + (d1 & 4) * 4
            + (d2 & 4) * 8
            + (d1 & 8) * 8
            + (d2 & 8) * 16
        ).astype("int64")
        return pd.DataFrame(
            {
                "part": zkey // 16,
                "d1": d1.astype("int64"),
                "d2": d2,
                "zkey": zkey,
            }
        )

    keyed = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    ).map_batches(zmap, batch_format="pandas")
    return bucketed_groupby_agg(
        keyed,
        keys=["part"],
        aggs={
            "n_docs": ("zkey", "count"),
            "d1_min": ("d1", "min"),
            "d1_max": ("d1", "max"),
            "d2_min": ("d2", "min"),
            "d2_max": ("d2", "max"),
            "z_min": ("zkey", "min"),
            "z_max": ("zkey", "max"),
        },
    )


def docs_global_shuffle(sf_dir: str, seed: int = SHUFFLE_SEED) -> rd.Dataset:
    """(doc_id, key, pos): a DETERMINISTIC seeded global shuffle —
    every doc gets the position it holds under ``ORDER BY
    md5(seed || ':' || doc_id)`` — the reproducible corpus shuffle a
    training dataloader needs (same seed ⇒ same epoch order on any
    cluster size, resumable mid-epoch by position range).

    Scale shape — a distributed sort with NO sampling pass: md5 keys
    are uniform by construction, so FIXED range splits on the first
    32 key bits give balanced buckets (the sample-trained partitioner
    of ``events_value_rank`` exists for value distributions that are
    NOT uniform; here uniformity is cryptographic). Per-bucket counts
    (O(buckets)) take one driver prefix-sum, broadcast back; one
    range-bucketed co-group sorts locally and adds its base. ONE
    shuffle carrying (doc_id, key, bucket)."""
    import hashlib

    import numpy as np
    import ray

    from suckit_ray.stages.agg import bucket_prefix_bases, default_buckets

    B = default_buckets()
    pre = f"{seed}:"

    def keyize(df: pd.DataFrame) -> pd.DataFrame:
        keys = [
            hashlib.md5((pre + str(int(d))).encode()).hexdigest()
            for d in df["doc_id"]
        ]
        kb = [int(k[:8], 16) * B >> 32 for k in keys]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "key": pd.array(keys, dtype="str"),
                "kb": pd.array(kb, dtype="int64"),
            }
        )

    # materialize: feeds BOTH the count pass and the final co-group
    keyed = (
        _read_documents(sf_dir, ["doc_id"])
        .map_batches(keyize, batch_format="pandas")
        .materialize()
    )

    base_ref = bucket_prefix_bases(keyed, "kb")

    def position_group(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.array([], dtype="int64"),
                    "key": pd.array([], dtype="str"),
                    "pos": pd.array([], dtype="int64"),
                }
            )
        base = int(ray.get(base_ref)[int(g["kb"].iloc[0])])
        g = g.sort_values(["key", "doc_id"]).reset_index(drop=True)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].astype("int64"),
                "key": g["key"],
                "pos": (np.arange(len(g), dtype=np.int64) + base + 1),
            }
        )

    return keyed.groupby("kb").map_groups(position_group, batch_format="pandas")


# --- domain-mixture sampling (docs_domain_mix) ----------------------
MIX_PCT = 40        # share of total corpus tokens the mixture keeps
MIX_HASH_BUCKETS = 64  # hash-range sub-buckets per source for the scan


def docs_domain_mix(sf_dir: str, pct: int = MIX_PCT) -> rd.Dataset:
    """Budget-constrained domain mixing: keep docs per ``source`` until
    that source's token budget is spent — the mixture-reweighting step
    a training-data pipeline runs to hit a target domain composition
    (cf. The Pile / DoReMi-style mixing), here with deterministic
    integer weights ``1 + (src_index % 4)`` and selection in
    multiplicative-hash order (reproducible across runs/clusters, no
    RNG state).

    Each source's budget is ``w_s * T // sum(w)`` with
    ``T = total_tokens * pct // 100`` — all-integer arithmetic mirrored
    exactly in the SQL oracle. A doc is kept while the tokens consumed
    BEFORE it are under budget, so the doc that crosses the budget line
    is included (every source with a nonzero budget keeps ≥1 doc).

    Scale shape — a per-GROUP prefix-sum scan, the third member of the
    scan family (global: ``docs_pack_sequences``; value-ordered:
    ``events_value_rank``; this one: per-key ordered with a broadcast
    stop condition). Text is dropped at the read (shuffle carries 4 int
    cols + source); per-source totals are a bucketed aggregate
    (O(sources) rows to the driver); cumulative order within a source
    is split across MIX_HASH_BUCKETS hash-RANGE sub-buckets (hkey is
    multiplicative-hash-uniform, so fixed ranges are balanced by
    construction — the ``docs_global_shuffle`` argument), with the
    per-(source, sub-bucket) exclusive prefix computed from O(sources ×
    buckets) count rows on the driver. No group ever holds a whole
    source; no driver state is O(docs)."""
    import numpy as np
    import pyarrow as pa
    import ray

    def keyize(df: pd.DataFrame) -> pd.DataFrame:
        hkey = (
            (df["doc_id"].to_numpy().astype(np.int64) % (1 << 31)) * _KNUTH
        ) % (1 << 32)
        hb = (hkey * MIX_HASH_BUCKETS) // (1 << 32)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "source": df["source"],
                "n_toks": df["text"].str.count(TOKEN_RE).astype("int64"),
                "hkey": hkey.astype("int64"),
                "hb": hb.astype("int64"),
            }
        )

    keyed = (
        _read_documents(sf_dir, ["doc_id", "text", "source"])
        .map_batches(keyize, batch_format="pandas")
        .materialize()  # feeds the count pass AND the final co-group
    )

    # per-(source, hb) token sums — O(sources × MIX_HASH_BUCKETS) rows
    # to the driver; one pandas pass derives budgets AND exclusive
    # prefix bases, broadcast once
    parts = (
        keyed.map_batches(
            lambda df: df.groupby(["source", "hb"], as_index=False).agg(
                n=("n_toks", "sum")
            ),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby(["source", "hb"], as_index=False)
        .agg(n=("n", "sum"))
        .sort_values(["source", "hb"])
    )
    if len(parts) == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "source": pa.array([], pa.string()),
                    "n_toks": pa.array([], pa.int64()),
                    "cum_toks": pa.array([], pa.int64()),
                }
            )
        )
    src_tot = parts.groupby("source")["n"].sum()
    wgt = {s: 1 + (int(s[3:]) % 4) for s in src_tot.index}
    T = int(src_tot.sum()) * pct // 100
    all_w = sum(wgt.values())
    budgets = {s: wgt[s] * T // all_w for s in src_tot.index}
    bases: dict[tuple[str, int], int] = {}
    for s, grp in parts.groupby("source"):
        run = 0
        for hb, n in zip(grp["hb"], grp["n"]):
            bases[(s, int(hb))] = run
            run += int(n)
    ref = ray.put((budgets, bases))

    def pick_group(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": pd.array([], dtype="int64"),
                "source": pd.array([], dtype="str"),
                "n_toks": pd.array([], dtype="int64"),
                "cum_toks": pd.array([], dtype="int64"),
            }
        )
        if len(g) == 0:
            return empty
        budgets, bases = ray.get(ref)
        src = g["source"].iloc[0]
        base = bases[(src, int(g["hb"].iloc[0]))]
        if base >= budgets[src]:  # whole sub-bucket past the budget
            return empty
        g = g.sort_values(["hkey", "doc_id"]).reset_index(drop=True)
        cum = base + g["n_toks"].to_numpy().cumsum()
        keep = (cum - g["n_toks"].to_numpy()) < budgets[src]
        out = g.loc[keep]
        return pd.DataFrame(
            {
                "doc_id": out["doc_id"].astype("int64"),
                "source": out["source"],
                "n_toks": out["n_toks"].astype("int64"),
                "cum_toks": pd.Series(cum[keep], dtype="int64"),
            }
        )

    keyed = keyed.map_batches(
        lambda df: df.assign(sb=df["source"] + ":" + df["hb"].astype(str)),
        batch_format="pandas",
    )
    return keyed.groupby("sb").map_groups(pick_group, batch_format="pandas")


# --- sparse retrieval (docs_bm25_topk) ------------------------------
# Static query workload, mirrored as a VALUES list in the oracle SQL.
BM25_QUERIES: tuple[tuple[int, tuple[str, ...]], ...] = (
    (0, ("data", "stream")),
    (1, ("hash", "join")),
    (2, ("sort", "merge", "filter")),
    (3, ("window", "group")),
    (4, ("value", "part", "line")),
)
BM25_K = 5


def docs_bm25_topk(
    sf_dir: str, k: int = BM25_K
) -> "rd.Dataset | pd.DataFrame":
    """(qid, rnk, doc_id, score_micro): BM25 top-k retrieval for a
    fixed query workload — the SPARSE retrieval sibling of the dense
    ANN family (brute-force / IVF / LSH all exist over embeddings;
    this is the lexical side a training-data pipeline uses for
    targeted corpus slicing and decontamination lookups).

    Exactness contract: Okapi BM25 with k1 = 6/5 and b = 3/4 folded
    into ONE all-integer expression — with T = total corpus tokens,
    N = total docs, dl = doc length, the per-term score
    ``idf·tf·(k1+1) / (tf + k1·(1−b+b·dl·N/T))`` multiplied through
    by 20·T becomes
    ``44·idf_micro·tf·T // (20·T·tf + 6·T + 18·dl·N)``
    (idf quantized to integer micro-nats first, the lm_score/tfidf
    idiom; the Lucene-style ``ln(1+(N−df+½)/(df+½))`` idf keeps every
    operand positive so integer division is unambiguous in both
    engines). Python big-ints on the Ray side, HUGEINT in DuckDB.

    Scale shape: ONE pass over the text — each batch tokenizes
    locally and emits (doc_id, term, tf, dl) for the ~12 static query
    terms it contains (sparse by construction) plus one tagged
    (term='') combiner row carrying the batch's (n_docs, sum_dl)
    corpus stats, all materialized together so stats/df/scoring never
    rescan the corpus. df/idf is an O(terms) broadcast; scores
    pre-reduce batch-locally, then ONE bucketed (qid, doc) groupby is
    the query's only shuffle; per-block partial top-k bounds the
    driver-side final merge to ≤ k·qids·blocks rows (the
    top_customers idiom — no second shuffle for 25 output rows).
    Driver state: ~12 idf ints + 2 corpus ints + the top-k merge."""
    import math
    import re

    import pyarrow as pa
    import ray

    from suckit_ray.stages.agg import bucketed_groupby_agg

    qterms = sorted({t for _, terms in BM25_QUERIES for t in terms})
    term_qids: dict[str, list[int]] = {
        t: [qid for qid, terms in BM25_QUERIES if t in terms] for t in qterms
    }
    # token-equality as a vectorized count: lookaround-delimited exact
    # term (Python re has lookarounds; only the RE2 oracle mirrors this
    # as an explicit list_filter equality)
    term_res = {
        t: rf"(?<![A-Za-z0-9_]){re.escape(t)}(?![A-Za-z0-9_])" for t in qterms
    }

    def postings(df: pd.DataFrame) -> pd.DataFrame:
        low = df["text"].str.lower()
        dl = low.str.count(TOKEN_RE).astype("int64")
        # tagged stats row (term='') rides along with the postings so
        # the corpus never gets a second text scan
        parts = [
            pd.DataFrame(
                {
                    "doc_id": pd.Series([-1], dtype="int64"),
                    "term": pd.Series([""], dtype="object"),
                    "tf": pd.Series([len(df)], dtype="int64"),
                    "dl": pd.Series([int(dl.sum())], dtype="int64"),
                }
            )
        ]
        for t in qterms:
            tf = low.str.count(term_res[t]).astype("int64")
            hit = tf > 0
            if hit.any():
                parts.append(
                    pd.DataFrame(
                        {
                            "doc_id": df.loc[hit, "doc_id"].astype("int64"),
                            "term": t,
                            "tf": tf[hit],
                            "dl": dl[hit],
                        }
                    )
                )
        return pd.concat(parts, ignore_index=True)

    post = (
        _read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(postings, batch_format="pandas")
        .materialize()  # sparse; feeds stats/df pass AND scoring
    )

    # corpus stats + df per term in ONE tiny pass over the postings:
    # O(terms) rows per batch to the driver, idf broadcast once
    def meta_partial(d: pd.DataFrame) -> pd.DataFrame:
        s = d[d["term"] == ""]
        t = (
            d[d["term"] != ""]
            .groupby("term", as_index=False)
            .agg(df=("doc_id", "count"))
        )
        t["n_docs"] = 0
        t["sum_dl"] = 0
        return pd.concat(
            [
                pd.DataFrame(
                    {
                        "term": [""],
                        "df": [0],
                        "n_docs": [int(s["tf"].sum())],
                        "sum_dl": [int(s["dl"].sum())],
                    }
                ),
                t,
            ],
            ignore_index=True,
        )

    meta = post.map_batches(meta_partial, batch_format="pandas").to_pandas()
    N = int(meta["n_docs"].sum())
    T = int(meta["sum_dl"].sum())
    dfc = (
        meta[meta["term"] != ""]
        .groupby("term", as_index=False)
        .agg(df=("df", "sum"))
    )
    idf = {
        t: math.floor(math.log((2.0 * N + 2) / (2 * int(dfv) + 1)) * 1_000_000)
        for t, dfv in zip(dfc["term"], dfc["df"])
    }
    ref = ray.put((idf, term_qids, N, T))

    def score(d: pd.DataFrame) -> pd.DataFrame:
        # python big-ints on purpose: 44·idf·tf·T overflows int64 once
        # the corpus passes ~10^12 tokens; the loop is O(postings),
        # which is sparse by construction
        idf, term_qids, N, T = ray.get(ref)
        rows_q, rows_d, rows_s = [], [], []
        for doc, term, tf, dl in zip(d["doc_id"], d["term"], d["tf"], d["dl"]):
            if not term:
                continue
            tf, dl = int(tf), int(dl)
            s = (44 * idf[term] * tf * T) // (20 * T * tf + 6 * T + 18 * dl * N)
            for qid in term_qids[term]:
                rows_q.append(qid)
                rows_d.append(int(doc))
                rows_s.append(s)
        out = pd.DataFrame(
            {
                "qid": pd.Series(rows_q, dtype="int64"),
                "doc_id": pd.Series(rows_d, dtype="int64"),
                "score_micro": pd.Series(rows_s, dtype="int64"),
            }
        )
        # batch-local pre-reduce: a doc's terms usually co-reside, so
        # most (qid, doc) sums finish here and the shuffle shrinks
        return out.groupby(["qid", "doc_id"], as_index=False).agg(
            score_micro=("score_micro", "sum")
        )

    scored = bucketed_groupby_agg(
        post.map_batches(score, batch_format="pandas"),
        keys=["qid", "doc_id"],
        aggs={"score_micro": ("score_micro", "sum")},
    )

    def block_topk(d: pd.DataFrame) -> pd.DataFrame:
        return (
            d.sort_values(["qid", "score_micro", "doc_id"],
                          ascending=[True, False, True])
            .groupby("qid", as_index=False)
            .head(k)[["qid", "doc_id", "score_micro"]]
        )

    # ≤ k·qids·blocks partial rows: the final merge is a bounded
    # driver-side combine, not a second shuffle
    parts = scored.map_batches(block_topk, batch_format="pandas").to_pandas()
    if len(parts) == 0:
        # typed empty PANDAS frame (allowed by the driver contract):
        # an empty Ray Dataset loses its schema in to_pandas, so a
        # Dataset return could not carry the 4 columns to the compare
        return pd.DataFrame(
            {
                "qid": pd.array([], dtype="int64"),
                "rnk": pd.array([], dtype="int64"),
                "doc_id": pd.array([], dtype="int64"),
                "score_micro": pd.array([], dtype="int64"),
            }
        )
    top = (
        parts.sort_values(["qid", "score_micro", "doc_id"],
                          ascending=[True, False, True])
        .groupby("qid", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    top["rnk"] = top.groupby("qid").cumcount().astype("int64") + 1
    # back into a (single-block) Dataset: queries() uniformly returns
    # Dataset so consumers can .count()/.take()/.materialize() alike
    return rd.from_pandas(
        top[["qid", "rnk", "doc_id", "score_micro"]].astype("int64")
    )


# --- BPE-training pair counts (docs_bpe_pairs) ----------------------
# Oracle-parity note for the whole BPE family (and every oracle that
# pairs pandas .str.lower() with SQL lower()): Python lowercases with
# full Unicode SpecialCasing ('İ' → 'i' + combining dot) while DuckDB
# uses simple case mapping ('İ' → 'i'), so NON-ASCII UPPERCASE input
# can shift word boundaries differently in the two engines. The
# operator semantics are well-defined either way; only oracle
# bit-parity assumes effectively-ASCII casing (true of the test
# corpus, and of the reference's charset-transcoded output).
BPE_PAIRS_K = 20


def docs_bpe_pairs(sf_dir: str, k: int = BPE_PAIRS_K) -> rd.Dataset:
    """(rnk, pair, n): the top-k adjacent CHARACTER pairs across the
    lowercased corpus — the first iteration of BPE tokenizer training
    (Sennrich et al. 2016: count symbol pairs, merge the most
    frequent). ``bpe_token_count`` applies a tokenizer; this is the
    corpus-scale counting step that TRAINS one.

    Contract: words are maximal ``[a-z0-9_]+`` runs of the lowercased
    text; every adjacent character pair within a word counts once per
    occurrence. Rank by (count DESC, pair ASC).

    Scale shape: a word-char pair in the RAW text is exactly a pair of
    adjacent word bytes (words are maximal runs), so each batch counts
    pairs with one numpy byte mask + bincount over 2^16 codes — no
    tokenization loop, no per-word explode. The partial is ≤ 37² rows
    per batch (the word alphabet is 37 symbols); one bucketed groupby
    sums partials and the ≤ 37² totals rank on the driver. utf-8
    continuation bytes are non-word, so multi-byte characters break
    pairs exactly like the oracle's regex word extraction."""
    import numpy as np
    import pyarrow as pa

    from suckit_ray.stages.agg import bucketed_groupby_agg

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        blob = "\x00".join(df["text"].str.lower()).encode("utf-8")
        b = np.frombuffer(blob, dtype=np.uint8)
        if len(b) < 2:
            return pd.DataFrame(
                {
                    "pair": pd.array([], dtype="str"),
                    "n": pd.array([], dtype="int64"),
                }
            )
        is_word = (
            ((b >= 97) & (b <= 122))
            | ((b >= 48) & (b <= 57))
            | (b == 95)
        )
        ok = is_word[:-1] & is_word[1:]
        codes = b[:-1].astype(np.int32) * 256 + b[1:]
        cnt = np.bincount(codes[ok], minlength=1 << 16)
        nz = np.nonzero(cnt)[0]
        return pd.DataFrame(
            {
                "pair": [chr(c >> 8) + chr(c & 255) for c in nz],
                "n": cnt[nz].astype("int64"),
            }
        )

    parts = _read_documents(sf_dir, ["text"]).map_batches(
        pair_partial, batch_format="pandas"
    )
    agg = bucketed_groupby_agg(parts, keys=["pair"], aggs={"n": ("n", "sum")})

    # ≤ 37² total rows: rank on the driver
    tot = agg.to_pandas()
    if len(tot) == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "rnk": pa.array([], pa.int64()),
                    "pair": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        )
    top = (
        tot.sort_values(["n", "pair"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    top["rnk"] = pd.Series(range(1, len(top) + 1), dtype="int64")
    top["n"] = top["n"].astype("int64")
    return rd.from_pandas(top[["rnk", "pair", "n"]])


# --- iterative BPE training (docs_bpe_train) ------------------------
BPE_TRAIN_STEPS = 5
# (sf_dir, fingerprint, steps) → trained merge list; training is
# deterministic, so consumers (docs_bpe_encode, repeated bench/driver
# calls) reuse it — the flagship-crawl memoization pattern. The
# fingerprint (mtime+size of documents.parquet) invalidates the memo
# if the data at the same path is regenerated in-process.
_BPE_MERGES_CACHE: dict[tuple, list[tuple[int, str, int]]] = {}


def _docs_fingerprint(sf_dir: str) -> tuple:
    path = f"{sf_dir}/documents.parquet"
    try:
        st = os.stat(path)
        if os.path.isdir(path):
            tot_size = tot_mtime = 0
            for name in sorted(os.listdir(path)):
                s = os.stat(os.path.join(path, name))
                tot_size += s.st_size
                tot_mtime = max(tot_mtime, s.st_mtime_ns)
            return (tot_mtime, tot_size)
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        # a part file vanished mid-listing (concurrent regeneration —
        # the situation the fingerprint exists for): sentinel key,
        # the next call re-stats
        return (0, 0)


def docs_bpe_train(sf_dir: str, steps: int = BPE_TRAIN_STEPS) -> rd.Dataset:
    """(step, pair, n): ``steps`` iterations of BPE merge training
    (Sennrich et al. 2016) — per step, the corpus-wide most frequent
    adjacent symbol pair (count DESC, pair ASC tie-break) merges into
    a fresh surrogate symbol ``chr(0x100 + step)``, and counting
    repeats over the rewritten vocabulary. ``docs_bpe_pairs`` is one
    iteration over raw characters; this is the full training loop.

    Representation trick shared with the oracle: merged symbols are
    single surrogate CHARS, so a word stays a plain string and
    ``str.replace(pair, surrogate)`` IS the left-to-right
    non-overlapping merge in both engines (source words never contain
    surrogates, so no two distinct words collide after a merge — the
    vocabulary needs no re-grouping).

    Scale shape: BPE trains on the word VOCABULARY weighted by
    frequency, not the corpus — ONE corpus-scale word-count groupby
    up front, then every iteration touches only the hash-partitioned
    (word, freq) vocabulary: per-batch weighted pair counts (bounded
    by the symbol alphabet², ≤ (37+steps)² rows), a tiny driver
    argmax, one broadcast merge applied vectorized
    (``.str.replace``). Iterations cost O(vocab), not O(corpus)."""
    import pyarrow as pa

    from suckit_ray.stages.agg import bucketed_groupby_agg

    # fingerprint BEFORE reading: if the corpus is regenerated during
    # the multi-second training loop, the merges are recorded under
    # the data they (mostly) read, and the caller's key still resolves
    fp_key = (sf_dir, _docs_fingerprint(sf_dir), steps)

    def words(df: pd.DataFrame) -> pd.DataFrame:
        import re

        w = (
            df["text"]
            .str.lower()
            .str.findall(re.compile(r"[a-z0-9_]+"))
            .explode()
            .dropna()
        )
        return pd.DataFrame({"w": w.astype("object")})

    vocab = bucketed_groupby_agg(
        _read_documents(sf_dir, ["text"]).map_batches(
            words, batch_format="pandas"
        ),
        keys=["w"],
        aggs={"f": ("w", "count")},
    ).materialize()

    def pair_counts(d: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for w, f in zip(d["w"], d["f"]):
            f = int(f)
            for i in range(len(w) - 1):
                c[w[i : i + 2]] += f
        if not c:
            # typed empty frame (Ray's size estimator still logs one
            # benign vectorize line for any size-0 object column)
            return pd.DataFrame(
                {
                    "pair": pd.Series([], dtype="object"),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "pair": pd.Series(list(c.keys()), dtype="object"),
                "n": pd.Series(list(c.values()), dtype="int64"),
            }
        )

    merges: list[tuple[int, str, int]] = []
    for step in range(steps):
        pc = vocab.map_batches(pair_counts, batch_format="pandas").to_pandas()
        # an all-empty Dataset comes back as a COLUMN-LESS frame (Ray
        # drops the schema), so guard before the groupby — the pair
        # supply runs dry when every word is a single symbol
        if len(pc) == 0 or "pair" not in pc.columns:
            break
        tot = pc.groupby("pair", as_index=False).agg(n=("n", "sum"))
        if len(tot) == 0:
            break
        top = tot.sort_values(["n", "pair"], ascending=[False, True]).iloc[0]
        pair, n = str(top["pair"]), int(top["n"])
        merges.append((step, pair, n))
        mc = chr(0x100 + step)
        vocab = vocab.map_batches(
            lambda d, _p=pair, _m=mc: d.assign(
                w=d["w"].str.replace(_p, _m, regex=False)
            ),
            batch_format="pandas",
        ).materialize()

    # evict stale fingerprints for this (sf_dir, steps) so repeated
    # regenerations don't leak one merge list per rewrite
    for k in [
        k
        for k in _BPE_MERGES_CACHE
        if k[0] == sf_dir and k[2] == steps and k != fp_key
    ]:
        del _BPE_MERGES_CACHE[k]
    _BPE_MERGES_CACHE[fp_key] = list(merges)
    return rd.from_arrow(
        pa.table(
            {
                "step": pa.array([m[0] for m in merges], pa.int64()),
                "pair": pa.array([m[1] for m in merges], pa.string()),
                "n": pa.array([m[2] for m in merges], pa.int64()),
            }
        )
    )


def docs_bpe_encode(sf_dir: str, steps: int = BPE_TRAIN_STEPS) -> rd.Dataset:
    """(doc_id, n_symbols): encode the corpus with the BPE merges
    ``docs_bpe_train`` just learned — the apply side of tokenizer
    training (count → train → ENCODE closes the loop;
    ``bpe_token_count`` applies a fixed regex tokenizer instead).

    A merge pair never contains a non-word char, so every occurrence
    in the raw lowercased text lies within a word — the 5 merges
    apply as plain vectorized ``.str.replace`` over whole texts, no
    per-word loop. ``n_symbols`` counts remaining word-or-surrogate
    chars, i.e. the post-merge symbol count of every word summed.

    Scale shape: the trained merge list is O(steps) driver state
    (produced by the vocab-partitioned training pass, memoized per
    (sf_dir, steps)); encoding is one embarrassingly-parallel map
    over the corpus."""
    key = (sf_dir, _docs_fingerprint(sf_dir), steps)
    if key not in _BPE_MERGES_CACHE:
        # the training loop runs eagerly in the call (driver-side
        # argmax per round), filling the cache as a side effect;
        # re-fingerprint afterwards in case the corpus was rewritten
        # DURING training (train stores under its own start-of-run
        # key, which is the one that resolves)
        docs_bpe_train(sf_dir, steps)
        if key not in _BPE_MERGES_CACHE:
            # eviction keeps exactly one entry per (sf_dir, steps)
            key = next(
                k
                for k in _BPE_MERGES_CACHE
                if k[0] == sf_dir and k[2] == steps
            )
    pairs = [p for _, p, _n in _BPE_MERGES_CACHE[key]]
    hi = 0x100 + max(len(pairs), 1) - 1
    sym_re = rf"[a-z0-9_Ā-{chr(hi)}]"

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        low = df["text"].str.lower()
        for step, p in enumerate(pairs):
            low = low.str.replace(p, chr(0x100 + step), regex=False)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_symbols": low.str.count(sym_re).astype("int64"),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        encode, batch_format="pandas"
    )


# --- Naive Bayes lang classifier (docs_nb_classify) -----------------
NB_SCALE = 1_000_000  # micronat quantization, the lm_score idiom


def docs_nb_classify(sf_dir: str) -> rd.Dataset:
    """(doc_id, pred_lang, score_micro): multinomial Naive Bayes
    trained ON the corpus's lang labels and applied back to every doc
    — the fastText-style classifier stage (CCNet / Gopher pipelines
    gate corpora with exactly this shape of model: cheap linear
    text classifier, trained once, applied corpus-wide).

    Model: P(L|d) ∝ P(L)·Π P(w|L) with add-one smoothing
    P(w|L) = (c(w,L)+1)/(tok(L)+V); every factor is quantized to
    floor(ln·1e6) micronats BEFORE the reduction (order-free integer
    sums, bit-exact in DuckDB), prediction = argmax with
    (score DESC, lang ASC) tie-break.

    Scale shape — the ``docs_lm_score`` count-and-attach pattern,
    ZERO driver model state: a broadcast (word, lang) count table is
    O(vocab) at web scale, so c(w,L) is computed where the
    occurrence rows already are — ONE token-hash co-group co-locates
    every occurrence of w with its doc's label, emits the 5 per-lang
    micronat contributions per occurrence, and a bucketed per-doc
    sum + broadcast priors (O(langs) ints) finish. Zero-token docs
    ride a zeros stream straight to the final sum (prior-only
    prediction), mirroring the oracle's LEFT JOIN. The corpus text is
    scanned ONCE: the explode pre-collapses duplicate (doc, word)
    occurrences into counted rows, and V / per-lang token totals
    derive from the materialized postings, not extra text passes."""
    import math

    import numpy as np
    import ray

    from suckit_ray.pipelines.dedup import _md5h60_memo
    from suckit_ray.stages.agg import bucketed_groupby_agg, default_buckets

    B = default_buckets()

    # --- occurrence rows: (doc_id, wh, lang, cnt) by token hash ---
    def explode(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        h = _md5h60_memo()
        doc_ids, whs, lgs, cnts = [], [], [], []
        for d, t, lg in zip(df["doc_id"], df["text"], df["lang"]):
            for tok, c in Counter(t.split()).items():
                doc_ids.append(d)
                whs.append(h(tok))
                lgs.append(lg)
                cnts.append(c)
        out = pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "wh": pd.Series(whs, dtype="int64"),
                "lang": pd.Series(lgs, dtype="object"),
                "cnt": pd.Series(cnts, dtype="int64"),
            }
        )
        out["wb"] = (out["wh"] % B).astype("int64")
        return out

    occ = _read_documents(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        explode, batch_format="pandas"
    )

    # doc counts + the lang universe come from the pruned lang column
    # (docs with zero tokens have no postings but still count); known
    # BEFORE the shuffle because the co-group's output columns are
    # one per lang
    dlang = (
        _read_documents(sf_dir, ["lang"])
        .map_batches(
            lambda d: d.groupby("lang", as_index=False).agg(n=("lang", "size")),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby("lang", as_index=False)
        .agg(n=("n", "sum"))
        .sort_values("lang")
    )
    langs = list(dlang["lang"])
    docL = dict(zip(dlang["lang"], dlang["n"].astype(int)))
    N = int(dlang["n"].sum())
    ccol = [f"c_{i}" for i in range(len(langs))]
    scol = [f"s_{i}" for i in range(len(langs))]
    langs_ref = ray.put(langs)

    def group_counts(g: pd.DataFrame) -> pd.DataFrame:
        """Per-posting rows (doc_id, mult, c_0..c_L: the word's
        group-local per-lang counts) + ONE marker row (doc_id = −1,
        mult = group vocab size, c_i = group's per-lang token total)
        — V and tokL fall out of the SAME shuffle instead of separate
        smalls / distinct-count passes (the docs_dsir_weights marker
        fusion; dataset-execution count dominates the wall time)."""
        if len(g) == 0:
            return pd.DataFrame(
                {"doc_id": pd.array([], dtype="int64")}
                | {"mult": pd.array([], dtype="int64")}
                | {c: pd.array([], dtype="int64") for c in ccol}
            )
        langs = ray.get(langs_ref)
        out = pd.DataFrame(
            {
                "doc_id": g["doc_id"].astype("int64"),
                "mult": g["cnt"].astype("int64"),
            }
        )
        # c(w,L) is group-local: ONE pivot gives the per-lang counts
        # for every word in the group, gathered back per row
        cw = g.pivot_table(
            index="wh", columns="lang", values="cnt",
            aggfunc="sum", fill_value=0,
        )
        pos = cw.index.get_indexer(g["wh"])
        marker = {"doc_id": [-1], "mult": [int(g["wh"].nunique())]}
        for i, L in enumerate(langs):
            col = (
                cw[L].to_numpy()
                if L in cw.columns
                else np.zeros(len(cw), dtype="int64")
            )
            out[ccol[i]] = col[pos]
            marker[ccol[i]] = [int(col.sum())]
        return pd.concat(
            [out, pd.DataFrame(marker)], ignore_index=True
        ).astype({"doc_id": "int64", "mult": "int64"})

    merged = (
        occ.groupby("wb")
        .map_groups(group_counts, batch_format="pandas")
        .materialize()  # feeds the marker scan AND the factor map
    )

    marks = merged.map_batches(
        lambda d: d[d["doc_id"] < 0], batch_format="pandas"
    ).to_pandas()
    # an all-empty corpus yields a COLUMN-LESS frame (Ray drops the
    # schema of an empty Dataset) — no postings means V = tokL = 0
    V = int(marks["mult"].sum()) if "mult" in marks.columns else 0
    tokL = {
        L: (int(marks[ccol[i]].sum()) if ccol[i] in marks.columns else 0)
        for i, L in enumerate(langs)
    }

    priors = {
        L: math.floor(math.log(docL[L] / N) * NB_SCALE) for L in langs
    }
    ref = ray.put((langs, tokL, V, priors))

    def zeros(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"doc_id": df["doc_id"].astype("int64")})
        for c in scol:
            out[c] = pd.Series(0, index=out.index, dtype="int64")
        return out

    def factors(d: pd.DataFrame) -> pd.DataFrame:
        d = d[d["doc_id"] >= 0]
        if len(d) == 0:
            return pd.DataFrame(
                {"doc_id": pd.array([], dtype="int64")}
                | {c: pd.array([], dtype="int64") for c in scol}
            )
        langs, tokL, V, _ = ray.get(ref)
        out = pd.DataFrame({"doc_id": d["doc_id"].astype("int64")})
        mult = d["mult"].to_numpy()
        for i, L in enumerate(langs):
            row_c = d[ccol[i]].to_numpy()
            denom = tokL[L] + V
            # one libm call per DISTINCT count (lm_score idiom); each
            # collapsed row contributes cnt × the per-occurrence factor
            uniq, inv = np.unique(row_c, return_inverse=True)
            q = np.fromiter(
                (
                    math.floor(math.log((c + 1.0) / denom) * NB_SCALE)
                    for c in uniq
                ),
                dtype=np.int64,
                count=len(uniq),
            )
            out[scol[i]] = q[inv] * mult
        return out

    scored = merged.map_batches(factors, batch_format="pandas")
    zero_rows = _read_documents(sf_dir, ["doc_id"]).map_batches(
        zeros, batch_format="pandas"
    )
    per_doc = bucketed_groupby_agg(
        scored.union(zero_rows),
        keys=["doc_id"],
        aggs={c: (c, "sum") for c in scol},
    )

    def predict(df: pd.DataFrame) -> pd.DataFrame:
        langs, _, _, priors = ray.get(ref)
        m = df[scol].to_numpy(dtype="int64") + np.array(
            [priors[L] for L in langs], dtype="int64"
        )
        best = m.argmax(axis=1)  # argmax takes the FIRST max: lang ASC
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "pred_lang": pd.Series(
                    [langs[i] for i in best], dtype="object"
                ),
                "score_micro": pd.Series(
                    m[np.arange(len(m)), best], dtype="int64"
                ),
            }
        )

    return per_doc.map_batches(predict, batch_format="pandas")


def docs_dsir_weights(sf_dir: str, target_lang: str = "en") -> rd.Dataset:
    """(doc_id, weight_micro): DSIR-style importance weights — each
    doc scored by how much more likely its tokens are under the
    TARGET domain's unigram distribution than under the RAW corpus's
    (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling": hashed n-gram features, importance weight
    = log p_target(doc) − log p_raw(doc); resample raw data
    proportionally). The target domain here is the docs labelled
    ``target_lang`` — the realistic shape where a small trusted slice
    steers selection over the whole crawl.

    Both distributions use add-one smoothing over the shared vocab
    (p(w) = (c(w)+1)/(T+V)), and every per-occurrence factor is
    quantized BEFORE the reduction — floor(ln·1e6) micronats, the
    ``docs_nb_classify`` idiom — so the per-doc sum is an order-free
    integer both engines reproduce bit-exactly.

    Scale shape — ZERO driver model state (a broadcast unigram table
    is O(vocab)): ONE token-hash co-group co-locates every occurrence
    of a word with the target/raw labels and computes c_target(w),
    c_raw(w) group-locally; each group also emits ONE marker row with
    its vocab size and token totals, so V / T_target / T_raw fall out
    of the SAME shuffle (measured: folding the separate totals + V
    passes into the co-group cut the best-of-3 warm op 8.5 → 4.6 s at
    sf0.1/32 — dataset-execution count, not pandas time, dominates).
    A post-broadcast map turns counts into integer factor
    contributions cnt·(f_t − f_r); a bucketed per-doc sum finishes.
    Zero-token docs ride a zeros stream (weight 0), mirroring the
    oracle's LEFT JOIN. The corpus text is scanned once."""
    import math

    import numpy as np
    import ray

    from suckit_ray.pipelines.dedup import _md5h60_memo
    from suckit_ray.stages.agg import bucketed_groupby_agg, default_buckets

    B = default_buckets()

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        h = _md5h60_memo()
        doc_ids, whs, tgt, cnts = [], [], [], []
        for d, t, lg in zip(df["doc_id"], df["text"], df["lang"]):
            is_t = lg == target_lang
            for tok, c in Counter(t.split()).items():
                doc_ids.append(d)
                whs.append(h(tok))
                tgt.append(is_t)
                cnts.append(c)
        out = pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "wh": pd.Series(whs, dtype="int64"),
                "tgt": pd.Series(tgt, dtype="bool"),
                "cnt": pd.Series(cnts, dtype="int64"),
            }
        )
        out["wb"] = (out["wh"] % B).astype("int64")
        return out

    occ = _read_documents(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        explode, batch_format="pandas"
    )

    def group_counts(g: pd.DataFrame) -> pd.DataFrame:
        """Per-posting (doc_id, cnt, ct, cr) + ONE marker row
        (doc_id = −1) carrying the group's vocab size and token
        totals — words partition across groups by hash, so the
        global V / T_target / T_raw are plain sums of the markers."""
        cols = ["doc_id", "cnt", "ct", "cr"]
        if len(g) == 0:
            return pd.DataFrame(
                {c: pd.array([], dtype="int64") for c in cols}
            )
        # group-local corpus counts per word: every occurrence of a
        # word lands in this group by construction (wb = wh % B)
        grp = g.groupby("wh")["cnt"]
        cr = grp.transform("sum").to_numpy()
        ct = (
            g.assign(tc=g["cnt"].to_numpy() * g["tgt"].to_numpy())
            .groupby("wh")["tc"]
            .transform("sum")
            .to_numpy()
        )
        out = pd.DataFrame(
            {
                "doc_id": g["doc_id"].astype("int64").to_numpy(),
                "cnt": g["cnt"].to_numpy(),
                "ct": ct,
                "cr": cr,
            }
        )
        marker = pd.DataFrame(
            {
                "doc_id": [-1],
                "cnt": [int(g["wh"].nunique())],
                "ct": [int((g["cnt"].to_numpy() * g["tgt"].to_numpy()).sum())],
                "cr": [int(g["cnt"].sum())],
            }
        )
        return pd.concat([out, marker], ignore_index=True).astype("int64")

    merged = (
        occ.groupby("wb")
        .map_groups(group_counts, batch_format="pandas")
        .materialize()  # feeds the marker scan AND the factor map
    )

    marks = merged.map_batches(
        lambda d: d[d["doc_id"] < 0], batch_format="pandas"
    ).to_pandas()
    # column-less guard for an all-empty corpus (the NB idiom)
    V = int(marks["cnt"].sum()) if "cnt" in marks.columns else 0
    T_tgt = int(marks["ct"].sum()) if "ct" in marks.columns else 0
    T_raw = int(marks["cr"].sum()) if "cr" in marks.columns else 0

    ref = ray.put((T_tgt, T_raw, V))

    def factors(d: pd.DataFrame) -> pd.DataFrame:
        d = d[d["doc_id"] >= 0]
        if len(d) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.array([], dtype="int64"),
                    "w_part": pd.array([], dtype="int64"),
                }
            )
        T_tgt, T_raw, V = ray.get(ref)
        ct = d["ct"].to_numpy()
        cr = d["cr"].to_numpy()
        # the factor decomposes as f_t(ct) − f_r(cr): one libm call
        # per DISTINCT count on each side (the lm_score idiom), no
        # (ct, cr) pair packing that could overflow at corpus scale
        ut, it = np.unique(ct, return_inverse=True)
        ur, ir = np.unique(cr, return_inverse=True)
        ft = np.fromiter(
            (
                math.floor(math.log((c + 1.0) / (T_tgt + V)) * NB_SCALE)
                for c in ut
            ),
            dtype=np.int64,
            count=len(ut),
        )
        fr = np.fromiter(
            (
                math.floor(math.log((c + 1.0) / (T_raw + V)) * NB_SCALE)
                for c in ur
            ),
            dtype=np.int64,
            count=len(ur),
        )
        return pd.DataFrame(
            {
                "doc_id": d["doc_id"].astype("int64"),
                "w_part": (ft[it] - fr[ir]) * d["cnt"].to_numpy(),
            }
        )

    scored = merged.map_batches(factors, batch_format="pandas")

    def zeros(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "w_part": pd.Series(0, index=df.index, dtype="int64"),
            }
        )

    zero_rows = _read_documents(sf_dir, ["doc_id"]).map_batches(
        zeros, batch_format="pandas"
    )
    agg = bucketed_groupby_agg(
        scored.union(zero_rows),
        keys=["doc_id"],
        aggs={"weight_micro": ("w_part", "sum")},
    )

    def order_cols(df: pd.DataFrame) -> pd.DataFrame:
        return df[["doc_id", "weight_micro"]]

    return agg.map_batches(order_cols, batch_format="pandas")


def docs_nfc_normalize(sf_dir: str) -> rd.Dataset:
    """(doc_id, text_nfc, changed): Unicode NFC normalization of the
    corpus text — the canonical first step of any multilingual
    cleaning pipeline (decomposed é = e+◌́ vs precomposed é must
    collapse before dedup/hashing, or byte-identical texts hash
    apart). ``changed`` flags docs the normalization actually touched
    (1/0 as int64), so a downstream stage can count or isolate them.

    Fully vectorized: pandas ``.str.normalize('NFC')`` applies
    CPython's ``unicodedata`` (UCD tables) per batch with no
    Python-level row loop; embarrassingly parallel, no shuffle.
    Parity caveat: the DuckDB oracle normalizes via its bundled
    utf8proc — code points whose normalization changed between the
    two libraries' Unicode versions could diverge (none observed;
    the accents/jamo/singleton cases are pinned by test)."""

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        nfc = df["text"].str.normalize("NFC")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "text_nfc": nfc,
                "changed": (nfc != df["text"]).astype("int64"),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        norm, batch_format="pandas"
    )


WSAMPLE_K = 20
WSAMPLE_SCALE = 1_000_000_000  # nano-quantized priority keys
_WSAMPLE_DENOM = float(1 << 60)  # 60-bit hash → u ∈ (0, 1]


def _wsample_keys(df: pd.DataFrame):
    """(weight, key_micro) arrays for the A-ES draw — THE single
    definition of the jitter prefix, weight rule, and quantization
    shared by the global and per-stratum samplers (and mirrored by
    both SQL oracles): any tweak must land in all four places at
    once, so the Python side lives here alone."""
    import math

    import numpy as np

    from suckit_ray.pipelines.dedup import _md5h60

    wt = df["text"].str.count(r"\S+").astype("int64").to_numpy() + 1
    keys = np.fromiter(
        (
            math.floor(
                -math.log(
                    (float(_md5h60(f"ws|{d}")) + 1.0) / _WSAMPLE_DENOM
                )
                * WSAMPLE_SCALE
                / int(w)
            )
            for d, w in zip(df["doc_id"], wt)
        ),
        dtype=np.int64,
        count=len(df),
    )
    return wt, keys


def docs_weighted_sample(sf_dir: str, k: int = WSAMPLE_K) -> "pa.Table":
    """(rnk, doc_id, weight, key_micro): deterministic weighted
    sampling without replacement — the top-k docs by exponential-jitter
    priority (Efraimidis & Spirakis 2006 A-ES: priority u^(1/w), here
    as the equivalent key −ln(u)/w, smallest first). Weight = token
    count + 1, so longer docs are proportionally likelier; u is
    md5-derived from the doc_id, so the "randomness" is a pure
    function of the row and both engines draw the SAME sample — the
    seeded-shuffle trick applied to weighted selection.

    key_micro quantizes the priority to integer nanos the way every
    micronat op does: floor((−ln(u))·1e9 / w). Tie-break doc_id asc.

    Scale shape: per-block key computation + per-block top-k; the
    driver merges ≤ k rows per block (the ``top_customers`` idiom),
    never the full keyed table. One text scan, no shuffle."""
    import pyarrow as pa

    def keyed_topk(df: pd.DataFrame) -> pd.DataFrame:
        wt, keys = _wsample_keys(df)
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "weight": pd.Series(wt, index=df.index, dtype="int64"),
                "key_micro": pd.Series(keys, index=df.index, dtype="int64"),
            }
        )
        return out.sort_values(["key_micro", "doc_id"]).head(k)

    merged = (
        _read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(keyed_topk, batch_format="pandas")
        .to_pandas()  # ≤ k rows per block reach the driver
        .sort_values(["key_micro", "doc_id"])
        .head(k)
        .reset_index(drop=True)
    )
    merged["rnk"] = pd.Series(range(1, len(merged) + 1), dtype="int64")
    return pa.table(
        {
            "rnk": pa.array(merged["rnk"], pa.int64()),
            "doc_id": pa.array(merged["doc_id"], pa.int64()),
            "weight": pa.array(merged["weight"], pa.int64()),
            "key_micro": pa.array(merged["key_micro"], pa.int64()),
        }
    )


WSAMPLE_PER_STRATUM = 5


def docs_stratum_sample(
    sf_dir: str, k: int = WSAMPLE_PER_STRATUM
) -> rd.Dataset:
    """(lang, rnk, doc_id, weight, key_micro): per-STRATUM weighted
    sampling — the ``docs_weighted_sample`` A-ES draw run
    independently inside every lang, k winners each. This is the
    balanced-mixture builder's shape: a deterministic quota per
    stratum regardless of stratum skew (``docs_domain_mix`` budgets by
    token mass; this samples by per-doc weight within the stratum).

    Same md5 jitter / key quantization as the global variant, so a
    doc's key is stratum-independent; the tie-break and ranking are
    (key asc, doc_id asc) within lang.

    Scale shape: per-block per-lang top-k inside map_batches, then ONE
    tiny lang co-group merges ≤ k·blocks rows per lang and re-ranks —
    the shuffle carries only block winners, never the corpus."""

    def keyed_topk(df: pd.DataFrame) -> pd.DataFrame:
        wt, keys = _wsample_keys(df)
        out = pd.DataFrame(
            {
                "lang": df["lang"],
                "doc_id": df["doc_id"].astype("int64"),
                "weight": pd.Series(wt, index=df.index, dtype="int64"),
                "key_micro": pd.Series(keys, index=df.index, dtype="int64"),
            }
        )
        return (
            out.sort_values(["key_micro", "doc_id"])
            .groupby("lang", as_index=False, sort=False)
            .head(k)
        )

    def stratum_rank(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "lang": pd.array([], dtype="str"),
                    "rnk": pd.array([], dtype="int64"),
                    "doc_id": pd.array([], dtype="int64"),
                    "weight": pd.array([], dtype="int64"),
                    "key_micro": pd.array([], dtype="int64"),
                }
            )
        g = g.sort_values(["lang", "key_micro", "doc_id"])
        g = g.groupby("lang", as_index=False, sort=False).head(k).copy()
        g["rnk"] = (g.groupby("lang").cumcount() + 1).astype("int64")
        return g[["lang", "rnk", "doc_id", "weight", "key_micro"]]

    return (
        _read_documents(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(keyed_topk, batch_format="pandas")
        .groupby("lang")
        .map_groups(stratum_rank, batch_format="pandas")
    )


PMI_MIN_COUNT = 5
PMI_TOPK = 20


def docs_pmi_topk(
    sf_dir: str, k: int = PMI_TOPK, min_count: int = PMI_MIN_COUNT
) -> "pa.Table":
    """(rnk, w1, w2, n_pair, n_w1, n_w2, pmi_micro): top-k collocations
    — adjacent word pairs ranked by pointwise mutual information
    PMI = ln(N·c(a,b) / (c(a)·c(b))), count ≥ ``min_count`` (the
    classic Church & Hanks 1990 association measure; a tokenizer /
    phrase-mining pipeline's candidate stage). pmi_micro is
    floor(·1e6) with the products taken in float64 IDENTICALLY in
    both engines (N·c(a,b) can pass 2^63 at corpus scale, so neither
    side multiplies in integers).

    Scale shape — TWO bounded exchanges, no driver vocab state:
    exchange 1 co-locates each bigram with its FIRST word's unigram
    occurrences (the lm_score context-hash trick), so c(a,b) and c(a)
    are two group-local sums; the ``min_count`` filter prunes there,
    BEFORE anything wide. Exchange 2 ships the surviving bigrams to
    their SECOND word's bucket alongside the per-word count rows to
    attach c(b). N rides exchange-1 marker rows. The final ranking is
    per-block top-k + a ≤ k·blocks driver merge."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray

    from suckit_ray.pipelines.dedup import _md5h60_memo
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized: one exploded token Series; adjacent same-doc
        # positions form the bigrams (2.5× the per-doc Counter loop
        # at sf0.1 — this runs once per corpus row, the hot path)
        h = _md5h60_memo()
        tok = df["text"].str.split().explode().dropna()
        vals = tok.to_numpy()
        idx = tok.index.to_numpy()
        same = idx[:-1] == idx[1:]
        big = (
            pd.DataFrame({"w1": vals[:-1][same], "w2": vals[1:][same]})
            .groupby(["w1", "w2"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        big["side"] = 0
        uni = pd.Series(vals).value_counts()
        out = pd.concat(
            [
                big,
                pd.DataFrame(
                    {
                        "w1": uni.index.to_numpy(),
                        "w2": "",
                        "cnt": uni.to_numpy(),
                        "side": 1,
                    }
                ),
            ],
            ignore_index=True,
        )
        out["kb"] = pd.Series(
            [h(w) % B for w in out["w1"]], dtype="int64"
        )
        return out.astype({"cnt": "int64", "side": "int64"})[
            ["w1", "w2", "cnt", "side", "kb"]
        ]

    def attach_ca(g: pd.DataFrame) -> pd.DataFrame:
        """c(a,b), c(a) group-local; marker (side=2) carries the
        group's token total for N."""
        cols = ["w1", "w2", "cab", "ca", "side"]
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "w1": pd.array([], dtype="str"),
                    "w2": pd.array([], dtype="str"),
                    "cab": pd.array([], dtype="int64"),
                    "ca": pd.array([], dtype="int64"),
                    "side": pd.array([], dtype="int64"),
                }
            )
        uni = (
            g[g["side"] == 1]
            .groupby("w1", as_index=False)["cnt"]
            .sum()
            .rename(columns={"cnt": "ca"})
        )
        n_tok = int(uni["ca"].sum())
        big = (
            g[g["side"] == 0]
            .groupby(["w1", "w2"], as_index=False)["cnt"]
            .sum()
            .rename(columns={"cnt": "cab"})
        )
        big = big[big["cab"] >= min_count].merge(uni, on="w1")
        big["side"] = 0
        uni_rows = pd.DataFrame(
            {
                "w1": uni["w1"],
                "w2": "",
                "cab": uni["ca"].astype("int64"),
                "ca": 0,
                "side": 1,
            }
        )
        marker = pd.DataFrame(
            {"w1": [""], "w2": [""], "cab": [n_tok], "ca": [0], "side": [2]}
        )
        out = pd.concat([big, uni_rows, marker], ignore_index=True)
        return out[cols].astype(
            {"cab": "int64", "ca": "int64", "side": "int64"}
        )

    stage1 = (
        _read_documents(sf_dir, ["text"])
        .map_batches(explode, batch_format="pandas")
        .groupby("kb")
        .map_groups(attach_ca, batch_format="pandas")
        .materialize()  # feeds the N scan AND exchange 2
    )

    marks = stage1.map_batches(
        lambda d: d[d["side"] == 2], batch_format="pandas"
    ).to_pandas()
    N = int(marks["cab"].sum()) if "cab" in marks.columns else 0
    n_ref = ray.put(float(N))

    def rekey(df: pd.DataFrame) -> pd.DataFrame:
        h = _md5h60_memo()
        d = df[df["side"] != 2].copy()
        # bigrams route to their SECOND word's bucket; unigram count
        # rows to their own word's
        keyw = d["w2"].where(d["side"] == 0, d["w1"])
        d["kb"] = pd.Series(
            [h(w) % B for w in keyw], index=d.index, dtype="int64"
        )
        return d

    def attach_cb(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["w1", "w2", "cab", "ca", "cb"]
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "w1": pd.array([], dtype="str"),
                    "w2": pd.array([], dtype="str"),
                    "cab": pd.array([], dtype="int64"),
                    "ca": pd.array([], dtype="int64"),
                    "cb": pd.array([], dtype="int64"),
                }
            )
        uni = (
            g[g["side"] == 1]
            .groupby("w1", as_index=False)["cab"]
            .sum()
            .rename(columns={"w1": "w2", "cab": "cb"})
        )
        big = g[g["side"] == 0][["w1", "w2", "cab", "ca"]]
        out = big.merge(uni, on="w2")
        return out[cols]

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        n = ray.get(n_ref)
        pmi = np.fromiter(
            (
                math.floor(
                    math.log(
                        (n * int(cab)) / (float(ca) * int(cb))
                    )
                    * NB_SCALE
                )
                for cab, ca, cb in zip(df["cab"], df["ca"], df["cb"])
            ),
            dtype=np.int64,
            count=len(df),
        )
        out = df.copy()
        out["pmi_micro"] = pmi
        return out.sort_values(
            ["pmi_micro", "w1", "w2"], ascending=[False, True, True]
        ).head(k)

    merged = (
        stage1.map_batches(rekey, batch_format="pandas")
        .groupby("kb")
        .map_groups(attach_cb, batch_format="pandas")
        .map_batches(block_topk, batch_format="pandas")
        .to_pandas()  # ≤ k rows per block reach the driver
    )
    if "pmi_micro" not in merged.columns:
        merged = pd.DataFrame(
            {
                c: pd.array([], dtype="str" if c in ("w1", "w2") else "int64")
                for c in ["w1", "w2", "cab", "ca", "cb", "pmi_micro"]
            }
        )
    merged = (
        merged.sort_values(
            ["pmi_micro", "w1", "w2"], ascending=[False, True, True]
        )
        .head(k)
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "rnk": pa.array(range(1, len(merged) + 1), pa.int64()),
            "w1": pa.array(merged["w1"], pa.string()),
            "w2": pa.array(merged["w2"], pa.string()),
            "n_pair": pa.array(merged["cab"].astype("int64"), pa.int64()),
            "n_w1": pa.array(merged["ca"].astype("int64"), pa.int64()),
            "n_w2": pa.array(merged["cb"].astype("int64"), pa.int64()),
            "pmi_micro": pa.array(
                merged["pmi_micro"].astype("int64"), pa.int64()
            ),
        }
    )


SPLIT_TRAIN_PCT = 80


def docs_train_test_split(sf_dir: str) -> rd.Dataset:
    """(doc_id, split): deterministic hash-based corpus split — the
    canonical leakage-safe train/test assignment (membership is a
    pure function of doc_id, so re-runs, resharding and incremental
    additions never move a document across the boundary; contrast
    with docs_weighted_sample's rate-based A-ES draw). Embarrassingly
    parallel: one map_batches, no exchange at all; the md5 is the
    same batch-local digest loop exact_dedup uses, mirrored by the
    oracle's md5() so the assignment is hash-checkable."""
    import hashlib

    import numpy as np

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        buckets = np.fromiter(
            (
                int(
                    hashlib.md5(str(i).encode("utf-8")).hexdigest()[:8], 16
                )
                % 100
                for i in df["doc_id"]
            ),
            dtype=np.int64,
            count=len(df),
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "split": np.where(
                    buckets < SPLIT_TRAIN_PCT, "train", "test"
                ),
            }
        )

    return _read_documents(sf_dir, ["doc_id"]).map_batches(
        assign, batch_format="pandas"
    )


CCNET_BUCKETS = 3


def docs_ccnet_buckets(sf_dir: str) -> rd.Dataset:
    """(doc_id, avg_nll_micro, ccnet_bucket): the CCNet head/middle/
    tail split (Wenzek et al. 2020) — every document ranked by its
    bigram-LM average negative log-likelihood (``docs_lm_score``) and
    cut into thirds: bucket 0 = head (most fluent), 2 = tail.
    bucket = (rank−1)·3 // n with rank = ROW_NUMBER() over
    (avg_nll_micro, doc_id), all integers, so the cut is exact on
    both engines.

    Scale shape: the scores stream straight out of lm_score's
    exchanges into the distributed-sort recipe shared with
    ``events_value_rank`` — sample-trained range partitioner
    (hash-min per block, broadcast once), O(buckets) counts → one
    driver prefix, one range-bucketed co-group that sorts locally and
    adds its base. No global sort materialization; the driver never
    sees a score row."""
    import numpy as np
    import pyarrow as pa
    import ray

    from suckit_ray.pipelines.relops import _train_rank_splits
    from suckit_ray.stages.agg import bucket_prefix_bases, default_buckets

    B = default_buckets()
    # materialize: consumed twice (splits training + bucketize) — a lazy
    # dataset would re-execute lm_score's whole lineage per consumer
    scores = docs_lm_score(sf_dir).materialize()

    splits = _train_rank_splits(
        scores, B, id_col="doc_id", value_col="avg_nll_micro"
    )
    if splits is None:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "avg_nll_micro": pa.array([], pa.int64()),
                    "ccnet_bucket": pa.array([], pa.int64()),
                }
            )
        )
    splits_ref = ray.put(splits)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        sp = ray.get(splits_ref)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "avg": df["avg_nll_micro"].astype("int64"),
                "vb": np.searchsorted(
                    sp, df["avg_nll_micro"].to_numpy(), side="left"
                ).astype("int64"),
            }
        )

    bk = scores.map_batches(bucketize, batch_format="pandas").materialize()
    base_ref = bucket_prefix_bases(bk, "vb")
    n_docs = bk.count()

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                columns=["doc_id", "avg_nll_micro", "ccnet_bucket"]
            ).astype("int64")
        base = int(ray.get(base_ref)[int(g["vb"].iloc[0])])
        g = g.sort_values(["avg", "doc_id"]).reset_index(drop=True)
        rnk = np.arange(len(g), dtype=np.int64) + base  # 0-based rank
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].astype("int64"),
                "avg_nll_micro": g["avg"].astype("int64"),
                "ccnet_bucket": (rnk * CCNET_BUCKETS) // n_docs,
            }
        )

    return bk.groupby("vb").map_groups(rank_group, batch_format="pandas")


INVIDX_POSTINGS_CAP = 20


def docs_inverted_index(sf_dir: str) -> rd.Dataset:
    """(term, df, postings): the IR inverted-index build — every
    distinct lowercased whitespace term with its document frequency
    and the first ``INVIDX_POSTINGS_CAP`` doc_ids ascending as a
    comma-joined postings string (capped so output rows stay bounded
    regardless of how common a term is; df counts ALL docs).

    Scale shape: batches dissolve docs into distinct (term, doc_id)
    pairs — the only exchange carries one row per posting, never text
    — and ONE term-hash co-group builds df + the capped postings list
    where a term's postings already co-locate. Per-group work is a
    sorted head + a join over ≤cap ids; the per-term Python ','.join
    is O(vocab), not O(corpus)."""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def explode_pairs(df: pd.DataFrame) -> pd.DataFrame:
        terms: list[str] = []
        ids: list[int] = []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            for t in set(text.lower().split()):
                terms.append(t)
                ids.append(doc_id)
        out = pd.DataFrame(
            {"term": pd.array(terms, dtype="object"),
             "doc_id": pd.array(ids, dtype="int64")}
        )
        out["tb"] = (
            pd.util.hash_pandas_object(out["term"], index=False).astype(
                "uint64"
            )
            % B
        ).astype("int64")
        return out

    ds = _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        explode_pairs, batch_format="pandas"
    )

    def build(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "term": pd.array([], dtype="object"),
                    "df": pd.array([], dtype="int64"),
                    "postings": pd.array([], dtype="object"),
                }
            )
        g = g.drop_duplicates(["term", "doc_id"]).sort_values(
            ["term", "doc_id"]
        )
        dfc = g.groupby("term", as_index=False).agg(df=("doc_id", "size"))
        top = g.groupby("term").head(INVIDX_POSTINGS_CAP).copy()
        top["doc_str"] = top["doc_id"].astype(str)
        posts = top.groupby("term", as_index=False).agg(
            postings=("doc_str", ",".join)
        )
        out = dfc.merge(posts, on="term")
        out["df"] = out["df"].astype("int64")
        return out[["term", "df", "postings"]]

    return ds.groupby("tb").map_groups(build, batch_format="pandas")


def docs_readability(sf_dir: str) -> rd.Dataset:
    """(doc_id, words, sentences, syllables, flesch_micro): Flesch
    reading-ease (Flesch 1948, public) as an EXACT integer —
    score = 206.835 − 1.015·(W/S) − 84.6·(Sy/W) carried as the single
    trunc-division (206835000·S·W − 1015000·W² − 84600000·Sy·S) over
    (S·W), so the float never exists in either engine (negative
    scores make the division truncating, DuckDB ``//`` semantics).
    The readability gate a curation pipeline applies next to the
    Gopher/CCNet quality signals.

    Counting rules (regex-count parity with RE2 verified): words =
    maximal [a-z]+ runs of the lowercased text; sentences =
    max(1, [.!?]+ runs); syllables = vowel-group runs plus one for
    each word with no vowel (Σ max(1, vowel_groups(word)) without a
    per-word loop: a [a-z]*[aeiouy][a-z]* match consumes exactly the
    words that contain a vowel). W guards at 1 the same way S does.
    Embarrassingly parallel — one vectorized pandas pass, no
    shuffle."""
    import numpy as np

    def f(df: pd.DataFrame) -> pd.DataFrame:
        low = df["text"].str.lower()
        w = np.maximum(
            1, low.str.count(r"[a-z]+").to_numpy().astype("int64")
        )
        s = np.maximum(
            1, df["text"].str.count(r"[.!?]+").to_numpy().astype("int64")
        )
        vruns = low.str.count(r"[aeiouy]+").to_numpy().astype("int64")
        vwords = (
            low.str.count(r"[a-z]*[aeiouy][a-z]*").to_numpy().astype("int64")
        )
        raw_w = low.str.count(r"[a-z]+").to_numpy().astype("int64")
        syl = vruns + (raw_w - vwords)
        num = 206_835_000 * s * w - 1_015_000 * w * w - 84_600_000 * syl * s
        den = s * w
        micro = np.where(num >= 0, num // den, -((-num) // den))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "words": w,
                "sentences": s,
                "syllables": syl,
                "flesch_micro": micro.astype("int64"),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pandas"
    )


def docs_compression_ratio(sf_dir: str) -> rd.Dataset:
    """(doc_id, raw_bytes, zlib_bytes, ratio_micro): per-doc
    deflate compression ratio — the classic repetition/boilerplate
    quality signal (RefinedWeb / MassiveText-style filters drop docs
    whose text compresses too well: templated spam sits near
    ratio_micro ~ 100000, natural prose near ~ 400000+). zlib level 6
    output is fully determined by the DEFLATE spec + zlib's canonical
    implementation, so the signal is reproducible across runs and
    nodes; no SQL engine exposes deflate, so this is a rows-only
    query pinned against an independent per-doc reference in tests.

    Scale shape: embarrassingly parallel (one C-speed zlib call per
    doc inside map_batches, no shuffle); bytes never leave their
    batch."""
    import zlib

    def f(df: pd.DataFrame) -> pd.DataFrame:
        raw = [t.encode("utf-8") for t in df["text"]]
        comp = [len(zlib.compress(b, 6)) for b in raw]
        rawlen = pd.array([len(b) for b in raw], dtype="int64")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "raw_bytes": rawlen,
                "zlib_bytes": pd.array(comp, dtype="int64"),
                "ratio_micro": pd.array(
                    [
                        (1_000_000 * c) // r if r else 1_000_000
                        for c, r in zip(comp, rawlen)
                    ],
                    dtype="int64",
                ),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pandas"
    )


RAKE_TOPK = 20


def docs_rake_topk(sf_dir: str, k: int = RAKE_TOPK) -> "pa.Table":
    """(phrase, n_occ, score_micro): corpus top-k RAKE keyphrases
    (Rose et al. 2010, public) — candidate phrases are maximal runs of
    non-stopword words, word score = degree/frequency over phrase
    co-occurrence, phrase score = Σ word scores. Scores are integers:
    each word's score quantizes to (10^6·deg)//freq BEFORE the phrase
    sum (the lm_score micronat idiom), so the ranking is bit-exact in
    both engines. Boundary rule (documented simplification vs classic
    RAKE): only stopwords break phrases — words are [a-z]+ runs, so
    punctuation already never joins two words into one token.

    Plan — zero driver model state, the count-and-attach shape: (1)
    phrase extraction is batch-local (a doc's text lives in one row;
    per-doc work bounded by doc length, the gopher precedent), each
    phrase occurrence emitting its word rows keyed by a unique
    (doc, phrase-index) id; (2) ONE word-hash co-group computes
    freq/deg where each word's rows already co-locate and attaches the
    word score to every row — a broadcast word table would be
    O(vocab); (3) one bucketed sum per occurrence, one per-phrase
    aggregate, per-block top-k so the driver merges ≤ k·blocks rows
    with the deterministic (score DESC, phrase ASC) cut."""
    import re as _re

    import pyarrow as pa

    from suckit_ray.stages.agg import bucketed_groupby_agg, default_buckets

    B = default_buckets()
    stop = set(STOPWORDS)
    word_re = _re.compile(r"[a-z]+")

    def phrase_word_rows(df: pd.DataFrame) -> pd.DataFrame:
        ws, occs, phrases, plens = [], [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            words = word_re.findall((text or "").lower())
            cur: list[str] = []
            pi = 0
            # occurrence id: doc_id in the high bits, phrase index low
            # (20 bits ≈ 1M phrases/doc — beyond any real page; ids
            # stay < 2^63 for doc_id < 2^43)
            base = int(doc_id) << 20
            for w in words + [None]:  # sentinel flushes the tail run
                if w is None or w in stop:
                    if cur:
                        phrase = " ".join(cur)
                        for pw in cur:
                            ws.append(pw)
                            occs.append(base + pi)
                            phrases.append(phrase)
                            plens.append(len(cur))
                        pi += 1
                        cur = []
                else:
                    cur.append(w)
        out = pd.DataFrame(
            {
                "w": pd.array(ws, dtype="string"),
                "occ": pd.array(occs, dtype="int64"),
                "phrase": pd.array(phrases, dtype="string"),
                "plen": pd.array(plens, dtype="int64"),
            }
        )
        out["wb"] = (
            pd.util.hash_pandas_object(out["w"], index=False).to_numpy()
            % B
        ).astype("int64")
        return out

    def attach_word_scores(g: pd.DataFrame) -> pd.DataFrame:
        stats = g.groupby("w").agg(
            freq=("w", "size"), deg=("plen", "sum")
        )
        score = (1_000_000 * stats["deg"]) // stats["freq"]
        out = pd.DataFrame(
            {
                "occ": g["occ"].astype("int64"),
                "phrase": g["phrase"],
                "wscore": score.loc[g["w"]].to_numpy().astype("int64"),
            }
        )
        return out

    occ_scores = bucketed_groupby_agg(
        _read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(phrase_word_rows, batch_format="pandas")
        .groupby("wb")
        .map_groups(attach_word_scores, batch_format="pandas"),
        keys=["occ", "phrase"],
        aggs={"s": ("wscore", "sum")},
    )
    per_phrase = bucketed_groupby_agg(
        occ_scores,
        keys=["phrase"],
        aggs={"n_occ": ("occ", "count"), "score_micro": ("s", "min")},
    )

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["score_micro", "phrase"], ascending=[False, True], kind="mergesort"
        ).head(k)

    merged = (
        per_phrase.map_batches(block_topk, batch_format="pandas")
        .to_pandas()  # <= k rows per block reach the driver
        .sort_values(
            ["score_micro", "phrase"], ascending=[False, True], kind="mergesort"
        )
        .head(k)
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "phrase": pa.array(merged["phrase"].tolist(), pa.string()),
            "n_occ": pa.array([int(x) for x in merged["n_occ"]], pa.int64()),
            "score_micro": pa.array(
                [int(x) for x in merged["score_micro"]], pa.int64()
            ),
        }
    )


# --- hybrid retrieval (docs_hybrid_rrf) -----------------------------
RRF_K = 60                    # the standard RRF damping constant
RRF_SCALE = 1_000_000_000     # integer contribution = SCALE // (K + rank)
HYBRID_N_QUERIES = 5          # doc_id/vec_id < 5 are the anchor documents
HYBRID_LIST_K = 20            # per-leg candidate list depth
HYBRID_TOPK = 10


def docs_hybrid_rrf(
    sf_dir: str,
    n_queries: int = HYBRID_N_QUERIES,
    list_k: int = HYBRID_LIST_K,
    k: int = HYBRID_TOPK,
) -> pa.Table:
    """(qid, rnk, doc_id, rrf_score): hybrid similar-document search —
    for each anchor document (doc_id < n_queries, whose embedding is
    the matching vec_id row) rank the corpus by Reciprocal Rank Fusion
    (Cormack/Clarke/Buettcher SIGIR'09, public) of two top-``list_k``
    candidate lists: a DENSE leg (embedding cosine, the ann_topk
    contract: cos_pct = floor(cos*10000), ties to smaller id) and a
    LEXICAL leg (word-3-gram shingle Jaccard, the ngram_jaccard_pairs
    contract: jaccard_pct = (10000*inter)//union). The fusion is pure
    integer — each list-membership contributes RRF_SCALE//(RRF_K+rank)
    — so the SQL oracle replays it bit-exactly with two ROW_NUMBER
    windows and an integer-division sum. The curation use: "find more
    documents like these trusted seeds", where the dense leg catches
    paraphrase and the lexical leg catches verbatim reuse.

    Scale shape: a fixed anchor workload means ZERO shuffles — both
    legs broadcast O(n_queries) state once (``ray.put``: the anchor
    shingle sets / the normalized anchor matrix) and stream the corpus
    through one map_batches each, with per-block partial top-``list_k``
    bounding the driver merge to ≤ n_queries·list_k rows per block
    (the top_customers idiom). Self-matches are excluded; anchors may
    appear in each other's lists."""
    import heapq

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from suckit_ray.pipelines.ann import _normalize
    from suckit_ray.pipelines.dedup import _word_shingles

    # anchor state: predicate-pushdown point reads, broadcast once
    at = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filters=[("doc_id", "<", n_queries)],
    )
    anchor_sh = {
        int(d): frozenset(_word_shingles(t))
        for d, t in zip(
            at.column("doc_id").to_pylist(), at.column("text").to_pylist()
        )
    }
    et = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n_queries)],
    )
    ids = np.array(et.column("vec_id").to_pylist())
    order = np.argsort(ids)
    qm = _normalize(
        np.stack(
            [np.array(e, dtype=np.float64) for e in et.column("embedding").to_pylist()]
        )[order]
    )
    qids = ids[order]
    sh_ref = ray.put(anchor_sh)
    qm_ref = ray.put((qids, qm))

    def lex_partial(df: pd.DataFrame) -> pd.DataFrame:
        anc = ray.get(sh_ref)
        rows = []
        for d, txt in zip(df["doc_id"], df["text"]):
            s = set(_word_shingles(txt))
            n = len(s)
            for qid, qs in anc.items():
                if int(d) == qid:
                    continue
                i = len(s & qs)
                if i:
                    rows.append((qid, int(d), (10000 * i) // (n + len(qs) - i)))
        out = pd.DataFrame(rows, columns=["qid", "doc_id", "pct"]).astype("int64")
        return (
            out.sort_values(
                ["qid", "pct", "doc_id"], ascending=[True, False, True]
            )
            .groupby("qid")
            .head(list_k)
        )

    def dense_partial(df: pd.DataFrame) -> pd.DataFrame:
        qids_, qm_ = ray.get(qm_ref)
        ids_ = df["vec_id"].to_numpy()
        m = _normalize(np.stack(df["embedding"].to_numpy()).astype(np.float64))
        pct = np.floor((qm_ @ m.T) * 10000).astype(np.int64)
        rows = []
        for qi, qid in enumerate(qids_):
            mask = ids_ != qid
            cand, cp = ids_[mask], pct[qi][mask]
            idx = np.lexsort((cand, -cp))[:list_k]
            rows.extend((int(qid), int(cand[i]), int(cp[i])) for i in idx)
        return pd.DataFrame(rows, columns=["qid", "doc_id", "pct"]).astype("int64")

    lex = (
        _read_documents(sf_dir, ["doc_id", "text"])
        .map_batches(lex_partial, batch_format="pandas")
        .to_pandas()
    )
    dense = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .map_batches(dense_partial, batch_format="pandas", batch_size=4096)
        .to_pandas()
    )

    scores: dict[tuple[int, int], int] = {}
    for leg in (lex, dense):
        if leg.empty:
            continue
        for qid, g in leg.groupby("qid"):
            best = heapq.nsmallest(
                list_k,
                g.itertuples(index=False),
                key=lambda r: (-r.pct, r.doc_id),
            )
            for rank, r in enumerate(best, 1):
                key = (int(qid), int(r.doc_id))
                scores[key] = scores.get(key, 0) + RRF_SCALE // (RRF_K + rank)

    rows = []
    by_qid: dict[int, list[tuple[int, int]]] = {}
    for (qid, d), s in scores.items():
        by_qid.setdefault(qid, []).append((-s, d))
    for qid in sorted(by_qid):
        for rnk, (neg_s, d) in enumerate(sorted(by_qid[qid])[:k], 1):
            rows.append((qid, rnk, d, -neg_s))
    return pa.table(
        {
            "qid": pa.array([r[0] for r in rows], pa.int64()),
            "rnk": pa.array([r[1] for r in rows], pa.int64()),
            "doc_id": pa.array([r[2] for r in rows], pa.int64()),
            "rrf_score": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


# Gopher document-quality rule set (Rae et al. 2021, "Scaling Language
# Models: Methods, Analysis & Insights from Training Gopher", Table A1
# — public). Every count is a non-overlapping regex match count with
# RE2/`re` parity, and every threshold is an integer cross-multiplied
# inequality, so the DuckDB oracle hash-matches bit for bit.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def docs_gopher_filter(sf_dir: str) -> rd.Dataset:
    """The full Gopher quality filter as per-doc rule flags plus the
    conjunction — the gate a training-data pipeline applies right
    after crawling, before dedup:

    - ``r_words``     50 ≤ n_words ≤ 100,000 (whitespace tokens)
    - ``r_mean_len``  3 ≤ mean word length ≤ 10, exact as
                      ``3·n ≤ Σlen ≤ 10·n`` (no float ever exists)
    - ``r_symbol``    (#, ``...``, ``…``) ≤ 0.1 per word:
                      ``10·n_sym ≤ n_words``
    - ``r_bullet``    ≤ 90% of lines start with a bullet (-, *, •):
                      ``10·n_bullet ≤ 9·n_lines``
    - ``r_ellipsis``  ≤ 30% of lines end with an ellipsis:
                      ``10·n_ell_end ≤ 3·n_lines``
    - ``r_alpha``     ≥ 80% of words contain a letter:
                      ``5·n_alpha ≥ 4·n_words``
    - ``r_stop``      ≥ 2 distinct words from the 8-word stop list
    - ``keep``        AND of all seven

    Embarrassingly parallel: one vectorized pandas pass of regex
    counts per batch (every rule is a ``str.count``), no shuffle, no
    per-row Python loop — the shape that holds at 100 TB. The sf
    corpus is single-line word soup, so the line rules and the stop
    rule are exercised by engineered adversarial docs in
    ``tests/test_textops.py`` as well as the SQL oracle."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"]
        low = t.str.lower()
        n_words = t.str.count(r"\S+").to_numpy().astype("int64")
        total_len = t.str.count(r"\S").to_numpy().astype("int64")
        n_alpha = (
            t.str.count(r"\S*[A-Za-z]\S*").to_numpy().astype("int64")
        )
        n_sym = (
            t.str.count("#")
            + t.str.count(r"\.\.\.")
            + t.str.count("…")
        ).to_numpy().astype("int64")
        n_lines = (t.str.count("\n") + 1).to_numpy().astype("int64")
        n_bullet = (
            t.str.count(r"(?m)^[ \t]*[-*•]").to_numpy().astype("int64")
        )
        n_ell_end = (
            t.str.count(r"(?m)(?:\.\.\.|…)[ \t]*$")
            .to_numpy()
            .astype("int64")
        )
        n_stop = sum(
            low.str.count(rf"\b{w}\b").gt(0).astype("int64")
            for w in GOPHER_STOPWORDS
        ).to_numpy()

        r_words = (n_words >= 50) & (n_words <= 100_000)
        r_mean_len = (3 * n_words <= total_len) & (
            total_len <= 10 * n_words
        )
        r_symbol = 10 * n_sym <= n_words
        r_bullet = 10 * n_bullet <= 9 * n_lines
        r_ellipsis = 10 * n_ell_end <= 3 * n_lines
        r_alpha = 5 * n_alpha >= 4 * n_words
        r_stop = n_stop >= 2
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_words": n_words,
                "n_lines": n_lines,
                "n_stop_types": n_stop.astype("int64"),
                "r_words": r_words,
                "r_mean_len": r_mean_len,
                "r_symbol": r_symbol,
                "r_bullet": r_bullet,
                "r_ellipsis": r_ellipsis,
                "r_alpha": r_alpha,
                "r_stop": r_stop,
                "keep": r_words
                & r_mean_len
                & r_symbol
                & r_bullet
                & r_ellipsis
                & r_alpha
                & r_stop,
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pandas"
    )


def docs_c4_filter(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_lines, n_kept, n_sentences, kept_text, keep): the C4
    line-and-page cleaning pass (Raffel et al. 2020, §2.2 — public)
    that sits beside ``docs_gopher_filter`` in the pre-dedup gate:

    line KEPT iff  - it ends (after stripping trailing space/tab/CR)
                     in terminal punctuation ``. ! ?`` or a closing
                     quote ``" ”``
                   - it has ≥ 3 whitespace-delimited words
                   - it does not contain "javascript" (lowercased)
    page KEPT iff  - kept_text has ≥ 5 sentences (runs of ``[.!?]+``)
                   - the RAW page contains no "lorem ipsum" (lowercased)
                   - the RAW page contains no ``{``

    ``kept_text`` is the kept lines re-joined by newline in document
    order — the value a downstream tokenizer actually consumes, so it
    rides in the frame and the SQL oracle must reproduce it
    byte-for-byte (string_agg ORDER BY line index).

    Embarrassingly parallel: one explode-split pass per batch, all
    predicates vectorized ``.str`` kernels, the per-doc regroup stays
    inside the batch — zero shuffle, the shape that holds at 100 TB.
    The sf corpus is single-line word soup (everything drops), so an
    engineered adversarial corpus in tests exercises every rule."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("")
        ex = pd.DataFrame(
            {"doc_id": df["doc_id"], "line": t.str.split("\n")}
        ).explode("line")
        ln = ex["line"].fillna("")
        term = ln.str.rstrip(" \t\r").str.contains(r'[.!?"”]$', regex=True)
        words3 = ln.str.count(r"\S+") >= 3
        nojs = ~ln.str.lower().str.contains("javascript", regex=False)
        ex["keep_line"] = (term & words3 & nojs).to_numpy()
        kl = ex[ex["keep_line"]]
        kept = (
            kl.groupby("doc_id")["line"]
            .agg("\n".join)
            .rename("kept_text")
            .reset_index()
        )
        n_kept = kl.groupby("doc_id").size().rename("n_kept").reset_index()
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_lines": (t.str.count("\n") + 1).astype("int64").to_numpy(),
            }
        )
        out = out.merge(kept, on="doc_id", how="left").merge(
            n_kept, on="doc_id", how="left"
        )
        out["kept_text"] = out["kept_text"].fillna("")
        out["n_kept"] = out["n_kept"].fillna(0).astype("int64")
        out["n_sentences"] = (
            out["kept_text"].str.count(r"[.!?]+").astype("int64")
        )
        lorem = t.str.lower().str.contains("lorem ipsum", regex=False)
        brace = t.str.contains("{", regex=False)
        out["keep"] = (
            (out["n_sentences"].to_numpy() >= 5)
            & ~lorem.to_numpy()
            & ~brace.to_numpy()
        )
        return out[
            ["doc_id", "n_lines", "n_kept", "n_sentences", "kept_text", "keep"]
        ]

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pandas"
    )


def docs_vocab_growth(sf_dir: str) -> "pa.Table":
    """(decile, new_terms, vocab_cum): Heaps-law vocabulary growth —
    the corpus in doc_id order is cut into ten equal deciles, and each
    reports how many distinct (lowercased whitespace) terms FIRST
    appear there plus the cumulative vocabulary size so far (Heaps
    1978, public): the curve a tokenizer-budget or dedup-sizing pass
    reads to know whether vocabulary is saturating. doc_ids are dense
    0..n−1 in the test tables, so decile(term) = (min_doc·10) // n;
    both engines apply the same formula, so the pin is exact either
    way.

    Plan: per batch each doc dissolves into its DISTINCT terms with
    the batch-min doc_id (one row per (batch, term) moves, never per
    occurrence — the ``docs_top_terms`` shuffle bound); ONE term-hash
    bucketed groupby takes the global min; a second tiny aggregation
    reduces to ≤10 decile counts; the driver cumsums 10 ints. The
    corpus-scale axis (terms) never reaches the driver."""
    import pyarrow as pa

    from suckit_ray.stages.agg import bucketed_groupby_agg

    n = _read_documents(sf_dir, ["doc_id"]).count()
    if n == 0:
        # the oracle's generate_series grid still emits ten zero rows
        z = [0] * 10
        return pa.table(
            {
                "decile": pa.array(range(10), pa.int64()),
                "new_terms": pa.array(z, pa.int64()),
                "vocab_cum": pa.array(z, pa.int64()),
            }
        )

    def first_seen(df: pd.DataFrame) -> pd.DataFrame:
        firsts: dict[str, int] = {}
        for doc_id, text in zip(df["doc_id"].astype("int64"), df["text"]):
            d = int(doc_id)
            for t in set(text.lower().split()):
                prev = firsts.get(t)
                if prev is None or d < prev:
                    firsts[t] = d
        return pd.DataFrame(
            {
                "term": list(firsts.keys()),
                "fd": pd.array(list(firsts.values()), dtype="int64"),
            }
        )

    first = bucketed_groupby_agg(
        _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
            first_seen, batch_format="pandas"
        ),
        keys=["term"],
        aggs={"fd": ("fd", "min")},
    )

    def to_decile(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        return pd.DataFrame(
            {
                "decile": (df["fd"].astype("int64") * 10) // n,
                "cnt": np.ones(len(df), dtype="int64"),
            }
        )

    dec = (
        bucketed_groupby_agg(
            first.map_batches(to_decile, batch_format="pandas"),
            keys=["decile"],
            aggs={"new_terms": ("cnt", "sum")},
        )
        .to_pandas()  # ≤ 10 rows
        .set_index("decile")["new_terms"]
    )
    import numpy as np

    new = [int(dec.get(d, 0)) for d in range(10)]
    cum = np.cumsum(new)
    return pa.table(
        {
            "decile": pa.array(range(10), pa.int64()),
            "new_terms": pa.array(new, pa.int64()),
            "vocab_cum": pa.array(cum.tolist(), pa.int64()),
        }
    )


def docs_simpson_diversity(sf_dir: str) -> "pa.Table":
    """(source, n_docs, d_micro): Simpson's diversity index of the
    LANGUAGE mix within each source (Simpson 1949, public) — the
    probability two draws without replacement differ in lang,

        d_micro = (10^6 · (N(N−1) − Σ_i n_i(n_i−1))) // (N(N−1))

    — the balance audit a mixture builder runs per source before
    trusting ``docs_domain_mix`` weights (0 = monolingual,
    → 10^6 = evenly mixed). Exact integers throughout; sources with
    N ≤ 1 report 0 (no pair exists).

    Plan: one two-phase (source, lang) count aggregation; the
    O(sources × langs) result folds driver-side."""
    import numpy as np
    import pyarrow as pa

    from suckit_ray.stages.agg import bucketed_groupby_agg

    counts = bucketed_groupby_agg(
        _read_documents(sf_dir, ["source", "lang"]).map_batches(
            lambda df: pd.DataFrame(
                {
                    "source": df["source"],
                    "lang": df["lang"],
                    "c": np.ones(len(df), dtype="int64"),
                }
            )
            .groupby(["source", "lang"], as_index=False)["c"]
            .sum(),
            batch_format="pandas",
        ),
        keys=["source", "lang"],
        aggs={"c": ("c", "sum")},
    ).to_pandas()  # O(sources × langs)

    rows = []
    for s, g in counts.groupby("source"):
        ni = g["c"].to_numpy().astype("int64")
        n = int(ni.sum())
        if n <= 1:
            rows.append((s, n, 0))
            continue
        den = n * (n - 1)
        num = den - int((ni * (ni - 1)).sum())
        rows.append((s, n, (1_000_000 * num) // den))
    rows.sort()
    return pa.table(
        {
            "source": pa.array([r[0] for r in rows], pa.string()),
            "n_docs": pa.array([r[1] for r in rows], pa.int64()),
            "d_micro": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


ZIPF_TOP_K = 200


def docs_zipf_slope(sf_dir: str) -> "pa.Table":
    """(k, n, slope_micro, intercept_micro): the Zipf's-law fit of the
    corpus's rank-frequency curve (Zipf 1949, public) — an OLS of
    y = ln(freq) on x = ln(rank) over the top-``ZIPF_TOP_K`` terms by
    total OCCURRENCE count (rank ties broken term-asc), the corpus-
    health law a tokenizer/dedup pass checks (natural text slopes
    ≈ −1; templated or duplicated corpora flatten or step). Both logs
    are quantized floor(ln·1e6) micronats BEFORE the closed-form
    solve (the ``docs_lm_score`` idiom, via libm ``math.log`` which
    tracks DuckDB's ``ln``), and the slope/intercept divisions floor
    on |num| with the sign applied after (the
    ``lineitem_group_regression`` idiom) — exact integers end to end.

    Plan: occurrence counts from one term-hash aggregation (per-batch
    Counter partials — one row per (batch, term) moves); per-block
    top-k + a ≤ k·blocks driver merge bounds what leaves the
    aggregation (the ``docs_top_terms`` shape); the 2×2 solve runs on
    ≤ k rows of Python ints."""
    import math

    import pyarrow as pa

    from suckit_ray.stages.agg import bucketed_groupby_agg

    def occ_counts(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for text in df["text"]:
            c.update(text.lower().split())
        return pd.DataFrame(
            {
                "term": list(c.keys()),
                "n": pd.array(list(c.values()), dtype="int64"),
            }
        )

    agg = bucketed_groupby_agg(
        _read_documents(sf_dir, ["text"]).map_batches(
            occ_counts, batch_format="pandas"
        ),
        keys=["term"],
        aggs={"n": ("n", "sum")},
    )

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["n", "term"], ascending=[False, True]
        ).head(ZIPF_TOP_K)

    top = (
        agg.map_batches(block_topk, batch_format="pandas")
        .to_pandas()
        .sort_values(["n", "term"], ascending=[False, True])
        .head(ZIPF_TOP_K)
        .reset_index(drop=True)
    )
    cols = {
        "k": pa.array([], pa.int64()),
        "n": pa.array([], pa.int64()),
        "slope_micro": pa.array([], pa.int64()),
        "intercept_micro": pa.array([], pa.int64()),
    }
    if len(top) < 2:
        return pa.table(cols)
    xs = [
        math.floor(math.log(r + 1) * 1_000_000) for r in range(len(top))
    ]
    ys = [
        math.floor(math.log(int(v)) * 1_000_000)
        for v in top["n"]
    ]
    k = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    den = k * sxx - sx * sx
    num_s = k * sxy - sx * sy
    num_i = sy * sxx - sx * sxy
    slope = (1 if num_s >= 0 else -1) * (
        (abs(num_s) * 1_000_000) // den
    )
    inter = (1 if num_i >= 0 else -1) * (abs(num_i) // den)
    return pa.table(
        {
            "k": pa.array([k], pa.int64()),
            "n": pa.array([int(top["n"].sum())], pa.int64()),
            "slope_micro": pa.array([slope], pa.int64()),
            "intercept_micro": pa.array([inter], pa.int64()),
        }
    )


KEYNESS_POOL_K = 50  # candidate terms: top-K by corpus occurrences
KEYNESS_TOP = 10  # emitted per lang


def docs_keyness_llr(sf_dir: str) -> "pa.Table":
    """(lang, rank, term, n_in, n_out, g2_micro): corpus KEYNESS — for
    each lang, the top-10 of the 50 globally-most-frequent terms by
    Dunning's log-likelihood ratio G² against the rest of the corpus
    (Dunning 1993, public), the statistic corpus linguists and
    quality-slicing pipelines use to ask "which words characterize
    THIS slice". With the 2×2 occurrence table (a = term in lang,
    b = term elsewhere, c/d = other tokens) G² expands to a signed sum
    of x·ln(x) entropy terms over INTEGER counts only:

        G² = 2·[Σ_cell x ln x + N ln N − Σ_margin x ln x]

    Each x·ln(x) quantizes floor(x·ln(x)·10^6) (libm ``math.log``, the
    ``docs_lm_score`` idiom — tracks DuckDB ``ln``; x = 0 contributes
    0), so ranking and hash are exact in both engines.

    Plan: one (lang, term) occurrence aggregation (per-batch Counter
    partials); the 50-term candidate pool via per-block top-k + a tiny
    driver merge (the ``docs_top_terms`` bound); per-lang totals are
    O(langs); the ≤ langs×50 G² evaluations run on Python ints."""
    import math

    import numpy as np
    import pyarrow as pa

    from suckit_ray.stages.agg import bucketed_groupby_agg

    def occ(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        rows = []
        for lang, text in zip(df["lang"], df["text"]):
            c: Counter = Counter(text.lower().split())
            rows.extend((lang, t, n) for t, n in c.items())
        out = pd.DataFrame(rows, columns=["lang", "term", "n"])
        return (
            out.groupby(["lang", "term"], as_index=False)["n"].sum()
            if len(out)
            else pd.DataFrame(
                {
                    "lang": pd.Series([], dtype="object"),
                    "term": pd.Series([], dtype="object"),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        )

    lt = bucketed_groupby_agg(
        _read_documents(sf_dir, ["lang", "text"]).map_batches(
            occ, batch_format="pandas"
        ),
        keys=["lang", "term"],
        aggs={"n": ("n", "sum")},
    ).materialize()  # feeds the pool, the lang totals, and the filter

    pool = (
        bucketed_groupby_agg(
            lt.map_batches(
                lambda df: df[["term", "n"]], batch_format="pandas"
            ),
            keys=["term"],
            aggs={"n": ("n", "sum")},
        )
        .map_batches(
            lambda df: df.sort_values(
                ["n", "term"], ascending=[False, True]
            ).head(KEYNESS_POOL_K),
            batch_format="pandas",
        )
        .to_pandas()
        .sort_values(["n", "term"], ascending=[False, True])
        .head(KEYNESS_POOL_K)
    )
    cols = {
        "lang": pa.array([], pa.string()),
        "rank": pa.array([], pa.int64()),
        "term": pa.array([], pa.string()),
        "n_in": pa.array([], pa.int64()),
        "n_out": pa.array([], pa.int64()),
        "g2_micro": pa.array([], pa.int64()),
    }
    if not len(pool):
        return pa.table(cols)
    term_tot = {t: int(n) for t, n in zip(pool["term"], pool["n"])}

    lang_tot = (
        bucketed_groupby_agg(
            lt.map_batches(
                lambda df: df[["lang", "n"]], batch_format="pandas"
            ),
            keys=["lang"],
            aggs={"n": ("n", "sum")},
        ).to_pandas()
    )
    L = {l: int(n) for l, n in zip(lang_tot["lang"], lang_tot["n"])}
    N = sum(L.values())

    pool_terms = set(term_tot)
    in_counts = (
        lt.map_batches(
            lambda df: df[df["term"].isin(pool_terms)],
            batch_format="pandas",
        ).to_pandas()  # ≤ langs × 50 rows
    )
    a_of = {
        (l, t): int(n)
        for l, t, n in zip(
            in_counts["lang"], in_counts["term"], in_counts["n"]
        )
    }

    def xlx(x: int) -> int:
        return 0 if x <= 0 else math.floor(x * math.log(x) * 1_000_000)

    rows = []
    for lang in sorted(L):
        scored = []
        for term in pool_terms:
            a = a_of.get((lang, term), 0)
            b = term_tot[term] - a
            c = L[lang] - a
            d = N - L[lang] - b
            g2 = 2 * (
                xlx(a) + xlx(b) + xlx(c) + xlx(d) + xlx(N)
                - xlx(a + b) - xlx(c + d) - xlx(a + c) - xlx(b + d)
            )
            scored.append((-g2, term, a, b))
        scored.sort()
        for r, (ng2, term, a, b) in enumerate(
            scored[:KEYNESS_TOP], start=1
        ):
            rows.append((lang, r, term, a, b, -ng2))
    return pa.table(
        {
            "lang": pa.array([r[0] for r in rows], pa.string()),
            "rank": pa.array([r[1] for r in rows], pa.int64()),
            "term": pa.array([r[2] for r in rows], pa.string()),
            "n_in": pa.array([r[3] for r in rows], pa.int64()),
            "n_out": pa.array([r[4] for r in rows], pa.int64()),
            "g2_micro": pa.array([r[5] for r in rows], pa.int64()),
        }
    )


def docs_langid_confusion(sf_dir: str) -> "pa.Table":
    """(actual_lang, pred_lang, n): the CONFUSION MATRIX of the
    heuristic ``lang_id`` classifier against the corpus's true lang
    labels — the eval harness a pipeline runs before trusting a
    cheap classifier as a filter gate (per-class precision/recall
    fall straight out of the matrix rows/columns). Prediction logic
    is ``lang_id``'s verified marker-count argmax, re-applied in the
    SAME batch that already holds the true label, so the whole query
    is one map + one tiny (actual, pred) aggregation — no join, no
    second corpus pass.

    Zero cells are omitted (the oracle's GROUP BY shape)."""
    import numpy as np
    import pyarrow as pa

    from suckit_ray.stages.agg import bucketed_groupby_agg

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "actual_lang": df["lang"],
                    "pred_lang": _predict_lang(df["text"]),
                    "n": np.ones(len(df), dtype="int64"),
                }
            )
            .groupby(["actual_lang", "pred_lang"], as_index=False)["n"]
            .sum()
        )

    res = (
        bucketed_groupby_agg(
            _read_documents(sf_dir, ["doc_id", "lang", "text"]).map_batches(
                f, batch_format="pandas"
            ),
            keys=["actual_lang", "pred_lang"],
            aggs={"n": ("n", "sum")},
        )
        .to_pandas()  # ≤ langs² rows
        .sort_values(["actual_lang", "pred_lang"])
    )
    return pa.table(
        {
            "actual_lang": pa.array(res["actual_lang"], pa.string()),
            "pred_lang": pa.array(res["pred_lang"], pa.string()),
            "n": pa.array(res["n"].astype("int64"), pa.int64()),
        }
    )


def docs_curriculum_order(sf_dir: str, stages: int = 4) -> "rd.Dataset":
    """(doc_id, n_chars, stage, position): length-based CURRICULUM
    ordering of the training corpus (Bengio et al., "Curriculum
    Learning", ICML 2009 — public): short documents first, so
    position = ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) and
    stage = NTILE(stages) in the same order (SQL's
    first-tiles-get-the-remainder rule). A dataloader consumes the
    stages in order; ties break by doc_id so both engines rank
    identically.

    Plan: the distributed SCAN/RANK recipe (events_value_rank /
    customer_rfm): sample-trained RANGE partition on n_chars (hash-min
    per-block sample — order-independent), per-bucket counts → one
    O(buckets) exclusive prefix on the driver, then each bucket
    sorts locally and converts global rank to tile. No global sort
    materialization; text never moves — only (doc_id, n_chars)."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    import ray

    from suckit_ray.stages.agg import bucket_prefix_bases, default_buckets

    B = default_buckets()
    n_rows = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def sample(df: pd.DataFrame) -> pd.DataFrame:
        h = np.array(
            [
                int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16)
                for d in df["doc_id"]
            ]
        )
        idx = np.argsort(h, kind="stable")[:64]
        return pd.DataFrame({"v": df["n_chars"].to_numpy()[idx]})

    s = ds.map_batches(sample, batch_format="pandas").to_pandas()
    if len(s) == 0:
        # typed ARROW empty block: int64 doc_id matches the parquet
        # column type, and an Arrow block keeps its schema through the
        # Dataset round-trip where an empty pandas block loses it
        import pyarrow as pa

        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_chars": pa.array([], pa.int64()),
                    "stage": pa.array([], pa.int64()),
                    "position": pa.array([], pa.int64()),
                }
            )
        )
    qs = np.linspace(0.0, 1.0, B + 1)[1:-1]
    splits = np.unique(np.quantile(s["v"].to_numpy(), qs, method="lower"))
    splits_ref = ray.put(splits)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        sp = ray.get(splits_ref)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_chars": df["n_chars"].astype("int64"),
                "bucket": np.searchsorted(
                    sp, df["n_chars"].to_numpy(), side="right"
                ).astype("int64"),
            }
        )

    bucketed = ds.map_batches(bucketize, batch_format="pandas").materialize()
    bases_ref = bucket_prefix_bases(bucketed, "bucket")
    q, r = divmod(n_rows, stages)

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(bases_ref).get(int(g["bucket"].iloc[0]), 0)
        g = g.sort_values(["n_chars", "doc_id"], kind="mergesort")
        rank = base + np.arange(1, len(g) + 1)
        cut = r * (q + 1)
        stage = np.where(
            rank <= cut,
            (rank - 1) // (q + 1) + 1,
            r + (rank - 1 - cut) // max(q, 1) + 1,
        )
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                "n_chars": g["n_chars"],
                "stage": stage.astype("int64"),
                "position": rank.astype("int64"),
            }
        )

    return bucketed.groupby("bucket").map_groups(scan, batch_format="pandas")


def docs_semantic_decontaminate(
    sf_dir: str, threshold_pct: int = 3000
) -> "rd.Dataset":
    """(doc_id, max_test_cos_pct, contaminated): EMBEDDING-based
    benchmark decontamination — the semantic sibling of
    ``docs_decontaminate`` (which matches exact n-grams): training
    documents are scored by their maximum cosine similarity to the
    HELD-OUT test embeddings (vec_id < ann.N_QUERIES, the corpus's
    query rows), and ``contaminated`` flags everything at or above
    ``threshold_pct`` (units: floor(cos·10⁴)). Paraphrased test
    leakage that shares no 8-gram still lands near its source in
    embedding space — the reason modern LM data pipelines run both
    filters (e.g. the GPT-3/PaLM decontamination appendices describe
    the n-gram half; embedding-similarity dedup à la SemDeDup covers
    the rest).

    Scale shape: the test matrix broadcasts once (``ray.put``), one
    matmul per batch, three small columns leave each task — a single
    streaming pass, no shuffle (the brute_force_topk shape). Full SQL
    oracle: MAX over the cross join (floor is monotone, so
    max-of-floor ≡ floor-of-max pairwise quantization agrees)."""
    import numpy as np

    import ray

    from suckit_ray.pipelines.ann import (
        N_QUERIES,
        _load_queries,
        _normalize,
        _read_embeddings,
    )

    _qids, qm = _load_queries(sf_dir)
    q_ref = ray.put(qm)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        qm_ = ray.get(q_ref)
        ids = df["vec_id"].to_numpy().astype(np.int64)
        keep = ids >= N_QUERIES  # training split only
        if not keep.any():
            return pd.DataFrame(
                {
                    "doc_id": pd.array([], dtype="int64"),
                    "max_test_cos_pct": pd.array([], dtype="int64"),
                    "contaminated": pd.array([], dtype="bool"),
                }
            )
        m = _normalize(
            np.stack(df["embedding"].to_numpy()[keep]).astype(np.float64)
        )
        pct = np.floor((qm_ @ m.T) * 10000).astype(np.int64).max(axis=0)
        return pd.DataFrame(
            {
                "doc_id": ids[keep],
                "max_test_cos_pct": pct,
                "contaminated": pct >= threshold_pct,
            }
        )

    return _read_embeddings(sf_dir).map_batches(score, batch_format="pandas")


WINNOW_MIN_SHARED = 2   # pair reported at >= this many shared fps
WINNOW_MAX_DF = 50      # boilerplate guard: fps in more docs are dropped


def winnow_overlap_pairs(
    sf_dir: str,
    min_shared: int = WINNOW_MIN_SHARED,
    max_df: int = WINNOW_MAX_DF,
) -> "rd.Dataset":
    """(a_id, b_id, n_shared): document pairs sharing at least
    ``min_shared`` winnowing fingerprints — the MOSS detection step
    (Schleimer, Wilkerson & Aiken, "Winnowing: Local Algorithms for
    Document Fingerprinting", SIGMOD 2003, public) on top of
    ``winnow_fingerprint``'s per-doc sets: where minhash estimates
    WHOLE-document resemblance, shared winnow fingerprints localize
    COPIED PASSAGES (the guarantee: any shared run of ≥ k+w−1 chars
    yields a shared fingerprint). Fingerprints present in more than
    ``max_df`` documents are dropped before pairing — the standard
    boilerplate guard, mirrored by the oracle, which also bounds the
    per-fingerprint pair fan-out at scale (≤ max_df²/2 pairs per fp).

    Plan: one pass emits (fp, doc_id) rows; one fp-hash co-group
    pairs docs per surviving fingerprint; one pair-keyed bucketed
    aggregation sums shared counts; only thresholded pairs reach the
    driver. Full SQL oracle: the winnow replay CTE + self-join."""
    import numpy as np

    from suckit_ray.stages.agg import bucketed_groupby_agg, default_buckets

    B = default_buckets()

    def fp_rows(df: pd.DataFrame) -> pd.DataFrame:
        texts = [t.encode("utf-8") for t in df["text"]]
        lens = np.array([len(t) for t in texts], dtype=np.int64)
        flat = np.frombuffer(b"".join(texts), dtype=np.uint8)
        H = (
            _rolling_hashes(flat)
            if len(flat) >= WINNOW_K
            else np.zeros(0, np.uint64)
        )
        starts = np.zeros(len(texts), dtype=np.int64)
        if len(texts) > 1:
            starts[1:] = np.cumsum(lens)[:-1]
        out_doc, out_fp = [], []
        ids = df["doc_id"].to_numpy()
        for d in range(len(texts)):
            g = lens[d] - WINNOW_K + 1
            if g <= 0:
                continue
            h = H[starts[d] : starts[d] + g]
            if g <= WINNOW_W:
                fps = np.array([h.min()])
            else:
                sw = np.lib.stride_tricks.sliding_window_view(h, WINNOW_W)
                fps = np.unique(sw.min(axis=1))
            out_doc.extend([int(ids[d])] * len(fps))
            out_fp.extend(fps.astype(np.int64).tolist())
        fp = np.array(out_fp, dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": pd.array(out_doc, dtype="int64"),
                "fp": fp,
                "fb": (fp % B).astype("int64") if len(fp) else fp,
            }
        )

    def pair_per_fp(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby("fp")["doc_id"].transform("size")
        g = g[sizes <= max_df]
        m = g.merge(g, on="fp")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        out = (
            m.groupby(["doc_id_x", "doc_id_y"], as_index=False)
            .size()
            .rename(
                columns={"doc_id_x": "a_id", "doc_id_y": "b_id", "size": "n"}
            )
        )
        out["n"] = out["n"].astype("int64")
        return out

    partials = (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(fp_rows, batch_format="pandas")
        .groupby("fb")
        .map_groups(pair_per_fp, batch_format="pandas")
    )
    summed = bucketed_groupby_agg(
        partials, ["a_id", "b_id"], {"n_shared": ("n", "sum")}
    )
    # pair rows stream out as a Dataset (a template-heavy corpus can
    # make this super-linear in docs — never land it on the driver)
    def finish(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[df["n_shared"] >= min_shared]
        return pd.DataFrame(
            {
                "a_id": keep["a_id"].astype("int64"),
                "b_id": keep["b_id"].astype("int64"),
                "n_shared": keep["n_shared"].astype("int64"),
            }
        )

    return summed.map_batches(finish, batch_format="pandas")


READABLE_MIN_MICRO = 50_000_000  # Flesch >= 50.0


def docs_quality_report(sf_dir: str) -> "rd.Dataset":
    """(doc_id, gopher_keep, c4_keep, readable, keep, n_fail): the
    STACKED quality-gate audit — Gopher Table-A1, the C4 line rules,
    and a Flesch readability floor (≥ 50.0 in micro units) joined
    into one per-document failure profile. This is the table a
    curation pipeline actually consumes: ``keep`` is the conjunction,
    ``n_fail`` drives triage (docs failing ONE gate get re-reviewed
    before docs failing all three), and per-gate columns attribute
    the loss. NB on web-unlike corpora strict gates can reject
    everything — exactly what the report exists to reveal before a
    training run silently trains on nothing.

    Plan: the three existing gate pipelines run as-is (each a
    shuffle-free pass) and meet in two doc_id-keyed joins — audit
    tables are O(corpus) rows of booleans, the cheapest join in the
    repo. Full SQL oracle: the three gate oracles composed as
    subqueries (no CTE-name collisions — each WITH is scoped)."""
    gf = docs_gopher_filter(sf_dir).map_batches(
        lambda df: pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"),
             "gopher_keep": df["keep"].astype(bool)}
        ),
        batch_format="pandas",
    )
    cf = docs_c4_filter(sf_dir).map_batches(
        lambda df: pd.DataFrame(
            {"c_doc": df["doc_id"].astype("int64"),
             "c4_keep": df["keep"].astype(bool)}
        ),
        batch_format="pandas",
    )
    rf = docs_readability(sf_dir).map_batches(
        lambda df: pd.DataFrame(
            {"r_doc": df["doc_id"].astype("int64"),
             "readable": df["flesch_micro"] >= READABLE_MIN_MICRO}
        ),
        batch_format="pandas",
    )
    from suckit_ray.stages.agg import default_buckets

    P = max(2, default_buckets() // 4)  # cluster-scaled join fan-out
    joined = gf.join(cf, "inner", P, on=("doc_id",), right_on=("c_doc",)).join(
        rf, "inner", P, on=("doc_id",), right_on=("r_doc",)
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df["gopher_keep"].astype(bool)
        c = df["c4_keep"].astype(bool)
        r = df["readable"].astype(bool)
        n_fail = (
            (~g).astype("int64") + (~c).astype("int64") + (~r).astype("int64")
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "gopher_keep": g,
                "c4_keep": c,
                "readable": r,
                "keep": g & c & r,
                "n_fail": n_fail,
            }
        )

    return joined.map_batches(finish, batch_format="pandas")


def docs_token_entropy(sf_dir: str) -> "rd.Dataset":
    """(doc_id, n_tokens, n_types, ent_micro): per-document Shannon
    entropy of the TOKEN distribution in exact integer micronats —
    the gibberish/boilerplate detector that complements
    ``docs_compression_ratio`` (deflate measures STRING redundancy;
    token entropy measures VOCABULARY concentration — a page
    repeating one word to game length checks scores near 0 here while
    still compressing unremarkably at small sizes).

        H = ln N − (1/N)·Σ_t c_t·ln c_t
        ent_micro = (xlx(N) − Σ_t xlx(c_t)) // N,
        xlx(x) = floor(x·ln x·10⁶)

    — every term an int64 and the division a floor, so the oracle
    (which spells the same xlx quantizer) matches bit for bit; the
    lm_score/keyness micronat idiom. Token-less documents are
    omitted (no distribution to score), mirroring the oracle's inner
    unnest. One map_batches pass; nothing shuffles."""
    import math

    import numpy as np

    def ent(df: pd.DataFrame) -> pd.DataFrame:
        doc_ids, ns, types_, ents = [], [], [], []
        for d, t in zip(df["doc_id"], df["text"]):
            toks = t.split()
            if not toks:
                continue
            n = len(toks)
            counts: dict[str, int] = {}
            for tok in toks:
                counts[tok] = counts.get(tok, 0) + 1
            s = sum(
                math.floor(c * math.log(c) * 1_000_000)
                for c in counts.values()
                if c > 1
            )
            top = math.floor(n * math.log(n) * 1_000_000) if n > 1 else 0
            doc_ids.append(int(d))
            ns.append(n)
            types_.append(len(counts))
            ents.append((top - s) // n)
        return pd.DataFrame(
            {
                "doc_id": pd.array(doc_ids, dtype="int64"),
                "n_tokens": pd.array(ns, dtype="int64"),
                "n_types": pd.array(types_, dtype="int64"),
                "ent_micro": pd.array(ents, dtype="int64"),
            }
        )

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(ent, batch_format="pandas")
