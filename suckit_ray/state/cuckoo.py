"""Cuckoo filter — the delete-capable membership pre-screen for the
URL-seen set (partial-key cuckoo hashing, Fan et al., "Cuckoo Filter:
Practically Better Than Bloom", CoNEXT 2014 — public algorithm).

Role in the engine: `SpillableSet(filter_kind="cuckoo")` uses one of
these instead of the Bloom filter as the definite-NO pre-screen over
the frozen digest runs. Same exactness story (the frozen runs are the
truth; the filter only short-circuits misses); different trade-offs:

- **deletion**: a Bloom filter cannot unlearn. An incremental recrawl
  that retires dead URLs (`crawl_diff` status='removed') can delete
  their fingerprints here so the pre-screen stays tight as the web
  shrinks, instead of accreting stale positives until a full rebuild.
- **bounded FPP at high load**: 16-bit fingerprints in 4-slot buckets
  give ~2·b·2^-f ≈ 0.012% worst-case false-positive rate at 95%
  load — comparable space to the Bloom at this FPP, with O(1) delete.
- **cost**: inserts are sequential (eviction chains), so bulk build is
  a Python loop — the Bloom's vectorized build stays the default for
  pure-append crawls; choose cuckoo when retirement matters.

Determinism: no RNG — eviction victims rotate via a per-filter
counter, so the same insert sequence always yields the same table
(checkpoint/restore and replay stay bit-stable).
"""

from __future__ import annotations

import numpy as np

_EMPTY = 0  # fingerprint sentinel; real fingerprints are in [1, 2^16)


def _fingerprint(hi: int) -> int:
    """16-bit fingerprint from the high digest word, never _EMPTY."""
    return (hi % 0xFFFF) + 1


class CuckooFilter:
    def __init__(self, capacity: int, max_kicks: int = 500):
        # 4-slot buckets at ~95% target load; power-of-two bucket count
        # so the partial-key alternate index is a pure XOR
        nb = 1
        while nb * 4 * 95 // 100 < max(capacity, 4):
            nb <<= 1
        self.nbuckets = nb
        self.max_kicks = max_kicks
        self.table = np.zeros((nb, 4), dtype=np.uint16)
        self.count = 0
        self._kick_rot = 0  # deterministic eviction pointer

    # -- index math ----------------------------------------------------
    def _indices(self, lo: int, fp: int) -> tuple[int, int]:
        i1 = lo & (self.nbuckets - 1)
        # partial-key alternate: i2 = i1 XOR H(fp); splitmix-style mix
        # keeps H(fp) well spread across the (power-of-two) table
        h = (fp * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        i2 = (i1 ^ h) & (self.nbuckets - 1)
        return i1, i2

    # -- core ops (digest-level; SpillableSet feeds url_digest128) -----
    def insert_digest(self, lo: int, hi: int) -> bool:
        """Insert; False iff the table could not place the fingerprint
        within max_kicks evictions (caller should rebuild larger)."""
        fp = _fingerprint(hi)
        i1, i2 = self._indices(lo, fp)
        for i in (i1, i2):
            row = self.table[i]
            free = np.nonzero(row == _EMPTY)[0]
            if len(free):
                row[free[0]] = fp
                self.count += 1
                return True
        # eviction chain, deterministic victim rotation
        i = i1 if (self._kick_rot & 1) == 0 else i2
        self._kick_rot += 1
        cur = fp
        chain: list[tuple[int, int, int]] = []  # (bucket, slot, displaced)
        for _ in range(self.max_kicks):
            slot = self._kick_rot % 4
            self._kick_rot += 1
            victim = int(self.table[i, slot])
            chain.append((i, slot, victim))
            self.table[i, slot] = cur
            cur = victim
            h = (cur * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
            i = (i ^ h) & (self.nbuckets - 1)
            row = self.table[i]
            free = np.nonzero(row == _EMPTY)[0]
            if len(free):
                row[free[0]] = cur
                self.count += 1
                return True
        # unwind the chain so failure leaves the table EXACTLY as it
        # was (no member fingerprint may be dropped — the filter's
        # no-false-negative contract); the caller rebuilds larger
        for b, s, displaced in reversed(chain):
            self.table[b, s] = displaced
        return False

    def contains_digest(self, lo: int, hi: int) -> bool:
        fp = _fingerprint(hi)
        i1, i2 = self._indices(lo, fp)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def delete_digest(self, lo: int, hi: int) -> bool:
        """Remove ONE copy of the fingerprint; False if absent. Only
        delete items that were actually inserted (filter contract)."""
        fp = _fingerprint(hi)
        i1, i2 = self._indices(lo, fp)
        for i in (i1, i2):
            hits = np.nonzero(self.table[i] == fp)[0]
            if len(hits):
                self.table[i, hits[0]] = _EMPTY
                self.count -= 1
                return True
        return False

    # -- bulk + sizing -------------------------------------------------
    def insert_many(self, lo: np.ndarray, hi: np.ndarray) -> bool:
        """Sequential bulk insert; False on first placement failure
        (caller rebuilds at double capacity from the exact runs)."""
        for a, b in zip(lo.tolist(), hi.tolist()):
            if not self.insert_digest(a, b):
                return False
        return True

    @property
    def load(self) -> float:
        return self.count / (self.nbuckets * 4)

    # -- checkpoint support --------------------------------------------
    def state(self) -> dict:
        return {
            "nbuckets": self.nbuckets,
            "max_kicks": self.max_kicks,
            "table": self.table.copy(),
            "count": self.count,
            "kick_rot": self._kick_rot,
        }

    @classmethod
    def from_state(cls, st: dict) -> "CuckooFilter":
        f = cls.__new__(cls)
        f.nbuckets = st["nbuckets"]
        f.max_kicks = st["max_kicks"]
        # copy: a restored filter must not alias the checkpoint dict's
        # array (mirrors state()'s copy — same hazard seenset documents)
        f.table = st["table"].copy()
        f.count = st["count"]
        f._kick_rot = st["kick_rot"]
        return f
