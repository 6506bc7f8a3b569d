"""Winnowing fingerprint kernel: the vectorized Mersenne-mod rolling
hash must equal the exact per-byte polynomial hash, and the corpus must
stay ASCII (the DuckDB oracle's ord(substr) == utf-8-byte assumption)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from suckit_ray.pipelines.textops import WINNOW_K, _rolling_hashes


def _reference_hashes(data: bytes, k: int = WINNOW_K) -> np.ndarray:
    """Exact per-byte Rabin–Karp loop in Python ints (the round-1
    implementation, kept as the correctness reference)."""
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
    return np.array(out, dtype=np.uint64)


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=200, deadline=None)
def test_vectorized_hash_equals_reference(data):
    assert np.array_equal(_rolling_hashes(data), _reference_hashes(data))


def test_hash_values_below_mersenne():
    h = _rolling_hashes(bytes(range(256)) * 4)
    assert (h < np.uint64((1 << 61) - 1)).all()


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_corpus_is_ascii(sf):
    """The winnow oracle compares ord(substr(text,..)) against utf-8
    bytes — valid only while the synthetic corpus stays ASCII."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"/root/testdata/{sf}/documents.parquet", columns=["text"])
    assert all(x.isascii() for x in t.column("text").to_pylist())
