"""Tiered exact URL-seen set — the scale rebuild of the reference's
single in-RAM ``Mutex<HashMap>`` (src/scraper.rs:44).

Design (SURVEY.md §7.5 item 5): each frontier shard owns a
``SpillableSet`` with three tiers:

1. **Bloom filter** (numpy bit array) over everything ever inserted —
   fast definite-NO for the overwhelmingly common novel-URL case.
2. **Active tier** — an exact Python set of recent URL strings.
3. **Frozen tier** — when the active tier exceeds ``spill_threshold``,
   its 128-bit blake2b digests are frozen into sorted numpy arrays
   (two uint64 columns) and the strings are dropped (optionally spilled
   to a sidecar file for audit). Membership = bloom says maybe →
   binary-search every frozen run → check active set.

128-bit digests make a false "seen" collision probability ~1e-18 at
10^10 URLs — exactness in practice, ~16 bytes/URL frozen instead of
~80+ for Python strings. At 10^10 URLs across 256 shards this is
~600 MB/shard frozen versus tens of GB of strings.
"""

from __future__ import annotations

import hashlib

import numpy as np


def url_digest128(url: str) -> tuple[int, int]:
    d = hashlib.blake2b(url.encode("utf-8"), digest_size=16).digest()
    return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little")


class SpillableSet:
    def __init__(self, spill_threshold: int = 2_000_000, bloom_bits: int = 1 << 23):
        self.spill_threshold = spill_threshold
        self.bloom_bits = bloom_bits
        self.bloom = np.zeros(bloom_bits // 8, dtype=np.uint8)
        self.active: set[str] = set()
        self.frozen_lo: list[np.ndarray] = []  # sorted by (hi, lo) via lexsort keys
        self.frozen_hi: list[np.ndarray] = []
        self.count = 0

    # -- bloom helpers (2 probes from the two digest halves) --
    def _bloom_positions(self, lo: int, hi: int) -> tuple[int, int]:
        return lo % self.bloom_bits, hi % self.bloom_bits

    def _bloom_set(self, lo: int, hi: int) -> None:
        for p in self._bloom_positions(lo, hi):
            self.bloom[p >> 3] |= 1 << (p & 7)

    def _bloom_maybe(self, lo: int, hi: int) -> bool:
        for p in self._bloom_positions(lo, hi):
            if not (self.bloom[p >> 3] >> (p & 7)) & 1:
                return False
        return True

    def _in_frozen(self, lo: int, hi: int) -> bool:
        for flo, fhi in zip(self.frozen_lo, self.frozen_hi):
            i = np.searchsorted(fhi, hi)
            j = np.searchsorted(fhi, hi, side="right")
            if i < j and lo in flo[i:j]:
                return True
        return False

    def insert_if_absent(self, url: str) -> bool:
        """First-wins insert (reference map_url_path, src/scraper.rs:76-85).
        Returns True iff the url was new."""
        lo, hi = url_digest128(url)
        if self._bloom_maybe(lo, hi):
            if url in self.active or self._in_frozen(lo, hi):
                return False
        self.active.add(url)
        self._bloom_set(lo, hi)
        self.count += 1
        if len(self.active) >= self.spill_threshold:
            self._freeze()
        return True

    def __contains__(self, url: str) -> bool:
        lo, hi = url_digest128(url)
        return self._bloom_maybe(lo, hi) and (
            url in self.active or self._in_frozen(lo, hi)
        )

    def _freeze(self) -> None:
        if not self.active:
            return
        digs = np.array(
            [url_digest128(u) for u in self.active], dtype=np.uint64
        )
        order = np.lexsort((digs[:, 0], digs[:, 1]))  # sort by hi then lo
        self.frozen_lo.append(np.ascontiguousarray(digs[order, 0]))
        self.frozen_hi.append(np.ascontiguousarray(digs[order, 1]))
        self.active = set()

    def __len__(self) -> int:
        return self.count

    # -- checkpoint support --
    def state(self) -> dict:
        self._freeze()
        return {
            "spill_threshold": self.spill_threshold,
            "bloom_bits": self.bloom_bits,
            "bloom": self.bloom,
            "frozen_lo": self.frozen_lo,
            "frozen_hi": self.frozen_hi,
            "count": self.count,
        }

    @classmethod
    def from_state(cls, st: dict) -> "SpillableSet":
        s = cls(st["spill_threshold"], st["bloom_bits"])
        s.bloom = st["bloom"]
        s.frozen_lo = list(st["frozen_lo"])
        s.frozen_hi = list(st["frozen_hi"])
        s.count = st["count"]
        return s
