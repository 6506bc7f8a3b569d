"""Tiered exact URL-seen set — the scale rebuild of the reference's
single in-RAM ``Mutex<HashMap>`` (src/scraper.rs:44).

Design (SURVEY.md §7.5 item 5): each frontier shard owns a
``SpillableSet`` with two regimes:

- **in-RAM regime** (no frozen runs yet): membership is a plain Python
  set — ~0.1 µs/op, no hashing overhead. This is the hot path for
  everything below ``spill_threshold`` URLs per shard.
- **spilled regime**: when the active set exceeds the threshold, its
  128-bit blake2b digests are frozen into sorted numpy arrays (two
  uint64 columns) and a Bloom filter over the frozen digests is
  (re)built; the strings are dropped. Membership = active set →
  bloom definite-NO → binary search per frozen run.

128-bit digests make a false "seen" collision probability ~1e-18 at
10^10 URLs — exactness in practice, ~16 bytes/URL frozen instead of
80+ for Python strings. At 10^10 URLs across 256 shards that is
~600 MB/shard frozen versus tens of GB of strings.
"""

from __future__ import annotations

import hashlib

import numpy as np


def url_digest128(url: str) -> tuple[int, int]:
    d = hashlib.blake2b(url.encode("utf-8"), digest_size=16).digest()
    return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little")


class SpillableSet:
    def __init__(
        self,
        spill_threshold: int = 2_000_000,
        bloom_bits: int = 1 << 23,
        filter_kind: str = "bloom",
    ):
        """``filter_kind`` selects the frozen-tier pre-screen:
        ``"bloom"`` (default — vectorized bulk build, append-only) or
        ``"cuckoo"`` (state/cuckoo.py — sequential build but
        delete-capable: ``retire_batch`` lets an incremental recrawl
        unlearn dead URLs, which a Bloom cannot). Membership semantics
        are identical; the frozen digest runs remain the truth."""
        if filter_kind not in ("bloom", "cuckoo"):
            raise ValueError(f"unknown filter_kind {filter_kind!r}")
        self.spill_threshold = spill_threshold
        self.bloom_bits = bloom_bits
        self.filter_kind = filter_kind
        self.bloom: np.ndarray | None = None  # built lazily at first freeze
        self.cuckoo = None  # CuckooFilter, built lazily at first freeze
        self.active: set[str] = set()
        self.frozen_lo: list[np.ndarray] = []
        self.frozen_hi: list[np.ndarray] = []
        # EXACT tombstones for retired frozen digests: the cuckoo
        # delete alone is not sufficient (another live URL sharing the
        # retired URL's (bucket, 16-bit fingerprint) keeps the
        # pre-screen positive ~0.012% of the time), so _in_frozen
        # consults this set for the definite answer
        self.retired: set[tuple[int, int]] = set()
        self.count = 0

    # -- frozen-regime helpers ---------------------------------------
    def _bloom_add(self, lo: np.ndarray, hi: np.ndarray) -> None:
        for pos in (lo % self.bloom_bits, hi % self.bloom_bits):
            idx = (pos >> 3).astype(np.int64)
            bits = np.uint8(1) << (pos & 7).astype(np.uint8)
            np.bitwise_or.at(self.bloom, idx, bits)

    def _bloom_maybe(self, lo: int, hi: int) -> bool:
        for p in (lo % self.bloom_bits, hi % self.bloom_bits):
            if not (self.bloom[p >> 3] >> (p & 7)) & 1:
                return False
        return True

    def _in_frozen(self, url: str) -> bool:
        lo, hi = url_digest128(url)
        if self.filter_kind == "cuckoo":
            if self.cuckoo is None or not self.cuckoo.contains_digest(lo, hi):
                return False
            if self.retired and (lo, hi) in self.retired:
                return False  # exact tombstone beats a filter collision
        elif not self._bloom_maybe(lo, hi):
            return False
        for flo, fhi in zip(self.frozen_lo, self.frozen_hi):
            i = np.searchsorted(fhi, hi)
            j = np.searchsorted(fhi, hi, side="right")
            if i < j and lo in flo[i:j]:
                return True
        return False

    def _cuckoo_add(self, lo: np.ndarray, hi: np.ndarray) -> None:
        """Insert a frozen run's digests; rebuild at double capacity on
        placement failure (rare below ~95% load — the exact digests in
        the frozen runs make a from-scratch rebuild always possible)."""
        from suckit_ray.state.cuckoo import CuckooFilter

        if self.cuckoo is None:
            self.cuckoo = CuckooFilter(max(len(lo) * 2, 1024))
        if self.cuckoo.insert_many(lo, hi):
            return
        # rebuild from scratch at growing capacity until every frozen
        # run fits (the exact digests make this always possible), then
        # re-apply retirements so deleted URLs stay deleted
        cap = self.cuckoo.nbuckets * 4 * 2
        while True:
            f = CuckooFilter(cap)
            if all(
                f.insert_many(flo, fhi)
                for flo, fhi in zip(self.frozen_lo, self.frozen_hi)
            ):
                for rlo, rhi in self.retired:
                    f.delete_digest(rlo, rhi)
                self.cuckoo = f
                return
            cap *= 2

    def retire_batch(self, urls: list[str]) -> int:
        """Unlearn URLs (incremental-recrawl retirement: crawl_diff
        status='removed'). Active-tier entries drop exactly; frozen
        entries drop their cuckoo fingerprint AND gain an exact
        128-bit tombstone (the fingerprint delete alone can be masked
        by a (bucket, fp) collision with a live URL), so membership is
        a definite NO afterwards. Returns how many were present.
        Requires filter_kind='cuckoo' once anything is frozen — a
        Bloom cannot unlearn."""
        gone = 0
        for u in urls:
            if u in self.active:
                self.active.discard(u)
                self.count -= 1
                gone += 1
                continue
            if not self.frozen_lo:
                continue
            if self.filter_kind != "cuckoo":
                raise ValueError(
                    "retire_batch over frozen entries needs "
                    "filter_kind='cuckoo' (bloom cannot delete)"
                )
            if self._in_frozen(u):
                lo, hi = url_digest128(u)
                # the delete keeps the filter tight; the tombstone is
                # what makes the retirement exact (filter-fp collision
                # with a live URL would otherwise mask it)
                self.cuckoo.delete_digest(lo, hi)
                self.retired.add((lo, hi))
                self.count -= 1
                gone += 1
        return gone

    # -- public API ----------------------------------------------------
    def insert_if_absent(self, url: str) -> bool:
        """First-wins insert (reference map_url_path, src/scraper.rs:76-85).
        Returns True iff the url was new."""
        if url in self.active:
            return False
        if self.frozen_lo and self._in_frozen(url):
            return False
        self.active.add(url)
        self.count += 1
        if len(self.active) >= self.spill_threshold:
            self._freeze()
        return True

    def insert_batch(self, urls: list[str]) -> list[bool]:
        """Vectorized first-wins insert of a batch that is already
        deduplicated within itself (caller keeps first occurrences).
        Returns one accepted-flag per url. Equivalent to calling
        ``insert_if_absent`` per url, but as one tight membership pass
        with a single bulk update + spill check."""
        active = self.active
        fresh = [u not in active for u in urls]
        if self.frozen_lo:
            fresh = [
                f and not self._in_frozen(u) for f, u in zip(fresh, urls)
            ]
        accepted = [u for u, f in zip(urls, fresh) if f]
        self.active.update(accepted)
        self.count += len(accepted)
        if len(self.active) >= self.spill_threshold:
            self._freeze()
        return fresh

    def __contains__(self, url: str) -> bool:
        return url in self.active or (bool(self.frozen_lo) and self._in_frozen(url))

    # compaction bound: checkpoints freeze the active tier every wave,
    # so without merging, a 1000-wave crawl accumulates ~1000 tiny runs
    # and membership pays ~1000 searchsorted calls per bloom-positive
    # URL. Above this many runs they merge into one sorted array (runs
    # are disjoint — membership is checked before insert — so a plain
    # concatenate+lexsort is a correct k-way merge).
    MAX_FROZEN_RUNS = 8

    def _freeze(self) -> None:
        if not self.active:
            return
        digs = np.array([url_digest128(u) for u in self.active], dtype=np.uint64)
        order = np.lexsort((digs[:, 0], digs[:, 1]))  # sort by hi then lo
        lo = np.ascontiguousarray(digs[order, 0])
        hi = np.ascontiguousarray(digs[order, 1])
        self.frozen_lo.append(lo)
        self.frozen_hi.append(hi)
        if self.filter_kind == "cuckoo":
            self._cuckoo_add(lo, hi)
        else:
            if self.bloom is None:
                self.bloom = np.zeros(self.bloom_bits // 8, dtype=np.uint8)
            self._bloom_add(lo, hi)
        self.active = set()
        if len(self.frozen_lo) > self.MAX_FROZEN_RUNS:
            all_lo = np.concatenate(self.frozen_lo)
            all_hi = np.concatenate(self.frozen_hi)
            order = np.lexsort((all_lo, all_hi))
            self.frozen_lo = [np.ascontiguousarray(all_lo[order])]
            self.frozen_hi = [np.ascontiguousarray(all_hi[order])]

    def __len__(self) -> int:
        return self.count

    # -- checkpoint support --
    def state(self) -> dict:
        self._freeze()
        return {
            "spill_threshold": self.spill_threshold,
            "bloom_bits": self.bloom_bits,
            "filter_kind": self.filter_kind,
            "bloom": self.bloom,
            "cuckoo": self.cuckoo.state() if self.cuckoo is not None else None,
            # list COPIES: the returned dict must not alias the live
            # run lists — a freeze after state() would otherwise mutate
            # a checkpoint that hasn't been pickled yet
            "frozen_lo": list(self.frozen_lo),
            "frozen_hi": list(self.frozen_hi),
            "retired": set(self.retired),
            "count": self.count,
        }

    @classmethod
    def from_state(cls, st: dict) -> "SpillableSet":
        s = cls(
            st["spill_threshold"],
            st["bloom_bits"],
            filter_kind=st.get("filter_kind", "bloom"),
        )
        s.bloom = st["bloom"]
        if st.get("cuckoo") is not None:
            from suckit_ray.state.cuckoo import CuckooFilter

            s.cuckoo = CuckooFilter.from_state(st["cuckoo"])
        s.frozen_lo = list(st["frozen_lo"])
        s.frozen_hi = list(st["frozen_hi"])
        s.retired = set(st.get("retired", ()))
        s.count = st["count"]
        return s
