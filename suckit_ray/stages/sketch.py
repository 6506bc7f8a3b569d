"""Distributed sketches — mergeable summaries for wide aggregations.

HyperLogLog (Flajolet et al. 2007) distinct counting: each batch folds
its values into 2^p 6-bit-max registers per group (all numpy); the
shuffle then moves ONE small register blob per (batch, group) instead
of the raw values, and merging is an elementwise max — the canonical
sketch shape for 100 TB distinct-count queries where exact two-phase
distinct would shuffle every distinct value once.

Standard error ≈ 1.04/√(2^p): p=12 → ~1.6% at 4 KB per group.
"""

from __future__ import annotations

import numpy as np

HLL_P = 12
HLL_M = 1 << HLL_P
_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)  # bias constant for m >= 128


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64: 64-bit avalanche hash of uint64 keys."""
    x = x.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def hll_partial(values: np.ndarray) -> np.ndarray:
    """Fold integer keys into a fresh 2^p uint8 register array."""
    reg = np.zeros(HLL_M, dtype=np.uint8)
    if len(values) == 0:
        return reg
    h = _splitmix64(np.asarray(values, dtype=np.uint64))
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    w = h & np.uint64((1 << (64 - HLL_P)) - 1)
    # rho = position of the leftmost 1-bit in the (64-p)-bit suffix.
    # float64 log2 is EXACT here only because w < 2^(64-p) = 2^52 fits
    # float64's integer range; at p <= 11 the suffix would exceed 2^53
    # and values just under a power of two would round UP, understating
    # rho by 1 — guard the precondition rather than pay an integer
    # bit-twiddling path.
    assert 64 - HLL_P <= 52, "float64 log2 rho needs w within exact range"
    bits = np.zeros(len(w), dtype=np.int64)
    nz = w > 0
    bits[nz] = np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64) + 1
    rho = ((64 - HLL_P) - bits + 1).astype(np.uint8)  # w==0 → max rank
    np.maximum.at(reg, idx, rho)
    return reg


def hll_merge(blobs: list[bytes]) -> np.ndarray:
    """Elementwise-max merge of packed register blobs."""
    out = np.zeros(HLL_M, dtype=np.uint8)
    for b in blobs:
        np.maximum(out, np.frombuffer(b, dtype=np.uint8), out=out)
    return out


# ---------------------------------------------------------------------------
# Count-Min Sketch (Cormode & Muthukrishnan 2005) — mergeable frequency
# counts for heavy hitters: depth d rows × width w counters; point
# estimate = min over rows; overestimate ≤ e/w · N with prob 1-e^-d.
# Blobs are d·w int64 = 64 KB at the defaults; merging is elementwise
# sum, so partial sketches from every batch combine associatively.
# ---------------------------------------------------------------------------

CMS_D = 4
CMS_W = 2048
_CMS_SEEDS = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)


def _cms_indices(keys: np.ndarray) -> np.ndarray:
    """(d, n) column indices for uint64 keys: one seeded splitmix64
    per row."""
    keys = np.asarray(keys, dtype=np.uint64)
    return np.stack(
        [
            _splitmix64(keys ^ _CMS_SEEDS[d]) % np.uint64(CMS_W)
            for d in range(CMS_D)
        ]
    ).astype(np.int64)


def cms_partial(keys: np.ndarray) -> np.ndarray:
    """Fold integer keys into a fresh (d, w) int64 counter array."""
    reg = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    if len(keys) == 0:
        return reg
    idx = _cms_indices(keys)
    for d in range(CMS_D):
        np.add.at(reg[d], idx[d], 1)
    return reg


def cms_merge(blobs: list[bytes]) -> np.ndarray:
    """Elementwise-sum merge of packed counter blobs."""
    out = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for b in blobs:
        out += np.frombuffer(b, dtype=np.int64).reshape(CMS_D, CMS_W)
    return out


def cms_estimate(reg: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Point-estimate counts for uint64 keys (min over depth rows)."""
    if len(keys) == 0:
        return np.zeros(0, dtype=np.int64)
    idx = _cms_indices(keys)
    return np.min(
        np.stack([reg[d][idx[d]] for d in range(CMS_D)]), axis=0
    ).astype(np.int64)


def hll_estimate(reg: np.ndarray) -> int:
    """Cardinality estimate with the standard small-range correction."""
    est = _ALPHA * HLL_M * HLL_M / np.sum(np.power(2.0, -reg.astype(np.float64)))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * HLL_M and zeros:
        est = HLL_M * np.log(HLL_M / zeros)
    return int(round(est))


# ---------------------------------------------------------------------------
# KLL quantile sketch (Karnin, Lang & Liberty 2016, simplified) —
# mergeable streaming quantiles: level i holds items of weight 2^i;
# a full level sorts and promotes every other item. Rank error is
# O(1/k) with k=KLL_K items at the top level; blobs are a few KB, so
# the quantile exchange moves one small blob per (block, group)
# instead of a histogram row per distinct value — the scale path the
# exact events_value_quantiles histogram cannot take when the value
# domain stops being bounded (continuous payments, latencies).
# Compaction offsets come from a splitmix64 of (n, level): random
# enough for the error bound, reproducible for a given fold order.
# ---------------------------------------------------------------------------

KLL_K = 200


class KLLSketch:
    """Weighted multi-level sample over int64 values."""

    __slots__ = ("k", "levels", "n")

    def __init__(self, k: int = KLL_K):
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.int64)]
        self.n = 0

    def _capacity(self, lvl: int) -> int:
        # geometric schedule: deepest (highest-weight) levels get the
        # full k, shallow levels shrink by 2/3 per step below the top
        h = len(self.levels)
        return max(8, int(self.k * (2.0 / 3.0) ** (h - 1 - lvl)))

    def add(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.int64)
        if len(v) == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += len(v)
        self._compress()

    def merge(self, other: "KLLSketch") -> None:
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.int64))
        for i, arr in enumerate(other.levels):
            if len(arr):
                self.levels[i] = np.concatenate([self.levels[i], arr])
        self.n += other.n
        self._compress()

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            arr = self.levels[i]
            if len(arr) <= self._capacity(i):
                i += 1
                continue
            arr = np.sort(arr, kind="stable")
            off = int(
                _splitmix64(np.array([self.n ^ (i << 48)], dtype=np.uint64))[0]
                & np.uint64(1)
            )
            promote = arr[off::2]
            self.levels[i] = np.empty(0, dtype=np.int64)
            if i + 1 == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.int64))
            self.levels[i + 1] = np.concatenate(
                [self.levels[i + 1], promote]
            )
            i += 1

    def quantile(self, q: float) -> int:
        """Smallest sampled value whose cumulative weight reaches
        ceil(q·n) — the quantile_disc convention on the weighted
        sample."""
        vals = []
        wts = []
        for i, arr in enumerate(self.levels):
            if len(arr):
                vals.append(arr)
                wts.append(np.full(len(arr), 1 << i, dtype=np.int64))
        if not vals:
            raise ValueError("empty sketch")
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        cum = np.cumsum(w)
        target = max(1, int(np.ceil(q * cum[-1])))
        return int(v[np.searchsorted(cum, target)])

    def to_bytes(self) -> bytes:
        import pickle

        return pickle.dumps((self.k, self.n, self.levels), protocol=4)

    @classmethod
    def from_bytes(cls, b: bytes) -> "KLLSketch":
        import pickle

        k, n, levels = pickle.loads(b)
        s = cls(k)
        s.n = n
        s.levels = levels
        return s


# ---------------------------------------------------------------------------
# KMV / theta sketch (Bar-Yossef et al. 2002; Dasgupta et al. 2016) —
# mergeable distinct-count sketches that ALSO support set operations:
# keep the k smallest splitmix64 hashes of the keys; the retained
# minima are a uniform sample of the distinct-hash universe below a
# per-sketch threshold, so intersections between sketches estimate
# set overlaps — the capability HLL registers cannot provide.
# A sketch with fewer than k entries is EXACT (nothing was truncated;
# a merge of exact sketches below k stays exact, since any truncated
# input would already carry k entries).
# ---------------------------------------------------------------------------

KMV_K = 1024
_KMV_FULL = float(2**64)


def kmv_partial(values: np.ndarray, k: int = KMV_K) -> np.ndarray:
    """k smallest distinct hashes of integer keys, ascending uint64."""
    if len(values) == 0:
        return np.empty(0, dtype=np.uint64)
    h = np.unique(_splitmix64(np.asarray(values, dtype=np.uint64)))
    return h[:k]


def kmv_merge(blobs: list[bytes], k: int = KMV_K) -> np.ndarray:
    """Union-then-truncate merge — associative and order-insensitive."""
    arrs = [np.frombuffer(b, dtype=np.uint64) for b in blobs]
    if not arrs:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.concatenate(arrs))[:k]


def _kmv_theta(s: np.ndarray, k: int) -> float:
    """Exclusive hash-space threshold below which ``s`` retains every
    distinct hash: full range when exact, else just past the k-th
    minimum (the largest retained value)."""
    return _KMV_FULL if len(s) < k else float(s[k - 1]) + 1.0


def kmv_intersection_estimate(
    a: np.ndarray, b: np.ndarray, k: int = KMV_K
) -> int:
    """Estimated |A ∩ B|: count common retained hashes below the
    SMALLER threshold, scale by the sampled fraction of hash space.
    Exact (collisions aside) when both sketches are exact."""
    theta = min(_kmv_theta(a, k), _kmv_theta(b, k))
    common = np.intersect1d(a, b, assume_unique=True)
    s = int((common.astype(np.float64) < theta).sum())
    return int(round(s * (_KMV_FULL / theta)))
