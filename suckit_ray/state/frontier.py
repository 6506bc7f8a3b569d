"""Frontier/dedup shard actors — the distributed rebuild of the
reference's shared mutable state:

- ``Mutex<HashMap>`` url→path mirror map + first-wins dedup gate
  (reference src/scraper.rs:44,76-85,202)  → per-shard ``SpillableSet``
- unbounded MPMC work channel (src/scraper.rs:40-41,50) → per-shard
  pending queues drained in deterministic BFS waves
- write-only ``visited_urls`` (src/scraper.rs:43,284) → a real fetch
  ledger powering exact resume (north_rule)

Each URL is owned by exactly one shard — ``shard_of(host)`` hash
partitioning — so per-shard serial insert preserves linearizable
first-wins semantics without distributed locking, and politeness state
for a host is co-located with its URLs.

Determinism: candidates buffered during a wave are sorted by
``(parent_seq, ordinal, url)`` before the first-wins pass, so the
accepted set AND the ordering are reproducible regardless of task
interleaving — stronger than the reference, whose insertion order is
thread-timing-dependent at jobs>1 (SURVEY.md §7.5 item 3).
"""

from __future__ import annotations

import os
import pickle
import zlib
from collections import defaultdict

from suckit_ray.state.seenset import SpillableSet
from suckit_ray.urlkit import depth_gate

# frontier entry: (url, host, depth, ext_depth, seq)
# candidate:      (parent_seq, ordinal, url, host, is_external, parent_depth, parent_ext_depth)
# ledger row:     (url, doc_id, status, wave, is_html, downloaded, n_outlinks, error)


def shard_of(host: str, num_shards: int) -> int:
    return zlib.crc32(host.encode("utf-8")) % num_shards


def shard_of_url(url: str, host: str, num_shards: int, by_host: bool) -> int:
    """Dedup-shard routing. First-wins dedup only needs each URL owned
    by exactly ONE shard — any deterministic key works. Politeness needs
    a host's release budget in one place, so with a delay budget we
    route by host; otherwise we route by URL hash, which spreads a hot
    host's candidate stream over every shard (skew-aware repartitioning
    of hot domains, north_rule — a 25%-hot-host corpus otherwise funnels
    a quarter of all dedup work through one actor)."""
    if by_host:
        return zlib.crc32(host.encode("utf-8")) % num_shards
    return zlib.crc32(url.encode("utf-8")) % num_shards


def encode_seq(wave: int, shard_id: int, idx: int) -> int:
    """Deterministic discovery sequence number: (wave, shard, idx) packed
    into an int64. Orders frontier entries globally."""
    return (wave << 44) | (shard_id << 36) | idx


class FrontierShard:
    """One shard of the frontier + URL-seen set + ledger. Wrapped in a
    Ray actor by the crawl driver (``ray.remote(FrontierShard)``)."""

    def __init__(self, shard_id: int, num_shards: int, spill_threshold: int = 2_000_000):
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.seen = SpillableSet(spill_threshold=spill_threshold)
        self.pending: list[tuple[str, str, int, int]] = []  # (url, host, depth, ext)
        self.buffer: list[tuple] = []
        self.released: list[tuple] = []  # in-flight wave entries (resume)
        self.ledger: list[tuple] = []
        self.ledger_keys: set[str] = set()
        self.counters = defaultdict(int)

    # -- seeding ------------------------------------------------------
    def seed(self, entries: list[tuple[str, str]]) -> int:
        """entries: [(url, host)] at depth 0 (reference seeds the origin at
        depth 0 bypassing all filters, src/scraper.rs:298-302)."""
        n = 0
        for url, host in entries:
            if self.seen.insert_if_absent(url):
                self.pending.append((url, host, 0, 0))
                n += 1
        self.counters["seeded"] += n
        return n

    # -- wave ingestion ----------------------------------------------
    def add_candidates(self, cands: list[tuple]) -> int:
        self.buffer.extend(cands)
        self.counters["candidates_in"] += len(cands)
        return len(cands)

    def add_ledger(self, rows: list[tuple]) -> int:
        """Idempotent by URL: Ray may re-run a side-effecting task
        (speculative probes, task retries, wave re-run on resume), so
        duplicate ingestion must be a no-op."""
        added = 0
        for r in rows:
            if r[0] in self.ledger_keys:
                continue
            self.ledger_keys.add(r[0])
            self.ledger.append(r)
            added += 1
        self.counters["fetched"] += added
        return added

    # -- wave boundary ------------------------------------------------
    def finalize_wave(
        self,
        wave: int,
        max_depth: int,
        max_ext_depth: int,
        max_per_host: int | None = None,
    ) -> list[tuple]:
        """Dedup-gate the buffered candidates of the finished wave, then
        release the next wave's entries for this shard. ``max_per_host``
        caps per-host release (politeness/skew knob); the overflow stays
        pending for later waves."""
        self.buffer.sort(key=lambda c: (c[0], c[1], c[2]))
        prev_cand = None
        for cand in self.buffer:
            if cand == prev_cand:  # re-ingested duplicate (task re-run)
                continue
            prev_cand = cand
            parent_seq, ordinal, url, host, is_ext, pdepth, pext = cand
            if not self.seen.insert_if_absent(url):
                self.counters["dup_urls"] += 1
                continue
            self.counters["new_urls"] += 1
            ok, d, e = depth_gate(is_ext, pdepth, pext, max_depth, max_ext_depth)
            if ok:
                self.pending.append((url, host, d, e))
            else:
                self.counters["depth_gated"] += 1
        self.buffer.clear()

        if max_per_host is None:
            take, rest = self.pending, []
        else:
            per_host: dict[str, int] = defaultdict(int)
            take, rest = [], []
            for ent in self.pending:
                if per_host[ent[1]] < max_per_host:
                    per_host[ent[1]] += 1
                    take.append(ent)
                else:
                    rest.append(ent)
        self.pending = rest
        self.released = [
            (url, host, d, e, encode_seq(wave, self.shard_id, i))
            for i, (url, host, d, e) in enumerate(take)
        ]
        self.counters["released"] += len(self.released)
        return self.released

    def ack_wave(self) -> None:
        """The wave's documents are durably written; drop resume state."""
        self.released = []

    # -- introspection ------------------------------------------------
    def pending_count(self) -> int:
        return len(self.pending) + len(self.buffer)

    def seen_count(self) -> int:
        return len(self.seen)

    def get_counters(self) -> dict:
        return dict(self.counters)

    def get_ledger(self) -> list[tuple]:
        return self.ledger

    # -- checkpoint ----------------------------------------------------
    def snapshot(self, path: str, wave: int) -> str:
        """Write this shard's full state for exact resume (per-partition
        checkpoint + lineage epoch, north_rule). Atomic via tmp+rename."""
        st = {
            "shard_id": self.shard_id,
            "num_shards": self.num_shards,
            "wave": wave,
            "seen": self.seen.state(),  # freezes the active tier; neutral
            "pending": self.pending,
            "released": self.released,
            "ledger": self.ledger,
            "counters": dict(self.counters),
        }
        tmp = f"{path}.tmp"
        with open(tmp, "wb") as f:
            pickle.dump(st, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
        return path

    def restore(self, path: str) -> int:
        with open(path, "rb") as f:
            st = pickle.load(f)
        assert st["shard_id"] == self.shard_id and st["num_shards"] == self.num_shards
        self.seen = SpillableSet.from_state(st["seen"])
        self.pending = [tuple(p) for p in st["pending"]]
        self.released = [tuple(r) for r in st["released"]]
        self.ledger = [tuple(r) for r in st["ledger"]]
        self.ledger_keys = {r[0] for r in self.ledger}
        self.counters = defaultdict(int, st["counters"])
        return st["wave"]

    def get_released(self) -> list[tuple]:
        return self.released
