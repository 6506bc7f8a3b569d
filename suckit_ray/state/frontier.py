"""Frontier/dedup shard actors — the distributed rebuild of the
reference's shared mutable state:

- ``Mutex<HashMap>`` url→path mirror map + first-wins dedup gate
  (reference src/scraper.rs:44,76-85,202)  → per-shard ``SpillableSet``
- unbounded MPMC work channel (src/scraper.rs:40-41,50) → per-shard
  pending queues drained in deterministic BFS waves, optionally
  priority-bucketed (``priority_patterns``): level = first matching
  pattern, level-0 releases first under the shared per-host politeness
  budget — per-host politeness priority queues (north_rule)
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

Scale shape (round 2): every bulk exchange is Arrow, and every
unbounded collection has a spill tier —

- candidates/ledger arrive as **Arrow tables** (zero-copy through the
  object store), not pickled tuple lists;
- the released wave leaves as **ObjectRefs of Arrow table chunks**
  (``released_refs``) that the driver feeds straight to
  ``ray.data.from_arrow_refs`` — a 10^8-row wave never transits
  driver memory;
- ``pending`` overflows to FIFO pickle chunks on local disk, the
  ledger overflows to parquet runs, and the seen-set freezes to
  digest arrays (seenset.py) — actor RSS is bounded by the
  ``*_mem`` knobs regardless of frontier size (SURVEY §9 sizes a
  10^10-URL frontier at ~12 GB/wave).
"""

from __future__ import annotations

import os
import pickle
import shutil
import tempfile
import time
import zlib
from collections import defaultdict

import pyarrow as pa

from suckit_ray.state.seenset import SpillableSet
from suckit_ray.urlkit import UrlParseError, canonical_url, parse_url

# frontier entry: (url, host, depth, ext_depth, seq)
# candidate:      (parent_seq, ordinal, url, host, is_external, parent_depth, parent_ext_depth)
# ledger row:     (url, doc_id, status, wave, is_html, downloaded, n_outlinks, error)

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("ext_depth", pa.int32()),
        ("seq", pa.int64()),
        # delta recrawl: the url's body hash from the PRIOR run (0 =
        # new/unknown). Attached at release by the shard that owns the
        # url — the hash map is partitioned exactly like the frontier,
        # so no broadcast and no driver-side map.
        ("prev_hash", pa.int64()),
        # OPIC (Abiteboul/Preda/Cobena, WWW'03): the page's accumulated
        # cash at release. The process stage divides it among the
        # page's emitted outlink candidates; 0.0 when opic is off.
        ("cash", pa.float64()),
    ]
)

HASH_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("body_hash", pa.int64()),  # 0 = fetch errored (never matches)
        # the url's depth budget when fetched — a recrawl re-seeds at
        # these depths so --depth/--ext-depth gate exactly like a
        # fresh crawl of the same site would
        ("depth", pa.int32()),
        ("ext_depth", pa.int32()),
    ]
)

CAND_SCHEMA = pa.schema(
    [
        ("parent_seq", pa.int64()),
        ("ordinal", pa.int32()),
        ("url", pa.string()),
        ("host", pa.string()),
        ("is_external", pa.bool_()),
        ("parent_depth", pa.int32()),
        ("parent_ext_depth", pa.int32()),
        # OPIC cash share from the linking page (parent cash divided
        # among its emitted candidates); 0.0 when opic is off
        ("cash", pa.float64()),
    ]
)

LEDGER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("doc_id", pa.string()),
        ("status", pa.int32()),
        ("wave", pa.int32()),
        ("is_html", pa.bool_()),
        ("downloaded", pa.bool_()),
        ("n_outlinks", pa.int32()),
        ("error", pa.string()),
    ]
)


def rows_to_table(rows: list[tuple], schema: pa.Schema) -> pa.Table:
    cols = list(zip(*rows)) if rows else [[] for _ in schema.names]
    return pa.Table.from_arrays(
        [pa.array(list(c), type=f.type) for c, f in zip(cols, schema)], schema=schema
    )


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


# encode_seq packing widths: 10 bits of shard (<= 1024 shards), 34 bits
# of per-(wave, shard) index (<= 1.7e10 entries), the rest (19 bits of
# int63) for the wave. Validated at pack time — a silent overflow would
# collide seq values across shards/waves and break the deterministic
# first-wins ordering the module promises.
_SEQ_SHARD_BITS = 10
_SEQ_IDX_BITS = 34
MAX_SHARDS = 1 << _SEQ_SHARD_BITS


def encode_seq(wave: int, shard_id: int, idx: int) -> int:
    """Deterministic discovery sequence number: (wave, shard, idx) packed
    into an int64. Orders frontier entries globally."""
    if shard_id >= MAX_SHARDS or idx >= (1 << _SEQ_IDX_BITS):
        raise ValueError(
            f"seq overflow: shard_id={shard_id} (max {MAX_SHARDS - 1}), "
            f"idx={idx} (max {(1 << _SEQ_IDX_BITS) - 1})"
        )
    return (
        (wave << (_SEQ_SHARD_BITS + _SEQ_IDX_BITS))
        | (shard_id << _SEQ_IDX_BITS)
        | idx
    )


class FrontierShard:
    """One shard of the frontier + URL-seen set + ledger. Wrapped in a
    Ray actor by the crawl driver (``ray.remote(FrontierShard)``)."""

    def __init__(
        self,
        shard_id: int,
        num_shards: int,
        spill_threshold: int = 2_000_000,
        pending_mem_limit: int = 500_000,
        ledger_mem_rows: int = 500_000,
        priority_patterns: tuple[str, ...] = (),
        seen_filter: str = "bloom",
        host_error_budget: int | None = None,
        host_url_budget: int | None = None,
        canonicalize: bool = False,
        opic: bool = False,
    ):
        self.shard_id = shard_id
        self.num_shards = num_shards
        # seen_filter="cuckoo" swaps the frozen-tier pre-screen for the
        # delete-capable cuckoo filter (state/cuckoo.py) so incremental
        # recrawls can retire dead URLs via retire_batch
        self.seen = SpillableSet(
            spill_threshold=spill_threshold, filter_kind=seen_filter
        )
        # Per-host politeness PRIORITY queues (north_rule): pending is a
        # small fixed set of priority-bucketed FIFO chains, level =
        # index of the first matching pattern in ``priority_patterns``
        # (no match → lowest level). Releases drain level 0 first, so a
        # comparison-based heap over spilled data is never needed —
        # bucketed precedence is the scale-honest priority queue (each
        # level keeps the bounded FIFO spill machinery; cf. Heritrix
        # precedence queues). With no patterns there is one level and
        # behavior is exactly the round-2 FIFO — reference parity.
        import re as _re

        self.priority_patterns = tuple(priority_patterns)
        self._priority_res = [_re.compile(p) for p in self.priority_patterns]
        self.num_levels = len(self._priority_res) + 1
        L = self.num_levels
        # per level: (url, host, depth, ext) FIFO + spill chain
        self.pending: list[list[tuple[str, str, int, int]]] = [[] for _ in range(L)]
        self.pending_mem_limit = pending_mem_limit
        self._pending_files: list[list[str]] = [[] for _ in range(L)]
        # per-chunk metadata parallel to _pending_files[level]:
        # (n_entries, host→count | None). Lets a capped drain decide
        # WITHOUT loading whether a chunk contains any host with
        # remaining budget, and makes the post-drain spilled recount
        # pure arithmetic instead of re-unpickling every untouched file
        # (ADVICE r2). None host map = "too many distinct hosts to
        # summarize; must load to know".
        self._pending_meta: list[list[tuple[int, dict | None]]] = [[] for _ in range(L)]
        self._pending_spilled: list[int] = [0] * L
        self.buffer_tables: list[pa.Table] = []
        self.released_tbl: pa.Table | None = None  # in-flight wave (resume)
        self.ledger_tables: list[pa.Table] = []
        self._ledger_mem_rows = 0
        self.ledger_mem_rows = ledger_mem_rows
        self._ledger_files: list[str] = []  # parquet spill runs
        self.ledger_seen = SpillableSet(spill_threshold=spill_threshold)
        self.counters = defaultdict(int)
        self._spill_dir: str | None = None
        self._spill_seq = 0  # monotonic: spill filenames never collide
        # robots Crawl-delay support: host → delay (ms), fed by the
        # process stage (max-merged, idempotent), and host → shard-local
        # monotonic release deadline. Durations — never timestamps —
        # cross process boundaries, so this works multi-node; the clock
        # is an attribute so tests can inject a fake.
        self.host_delay_ms: dict[str, int] = {}
        self.host_next_allowed: dict[str, float] = {}
        self._clock = time.monotonic
        # delta recrawl: url → prior-run body hash (release-time
        # lookup), and this run's recorded hashes (flushed to a
        # per-shard parquet at crawl end). Per-shard memory is
        # O(shard urls) ≈ 15 MB at 10^10 urls / 16k shards — the same
        # class as the ledger tier.
        self.recrawl_hashes: dict[str, int] = {}
        self.recrawl_depths: dict[str, tuple[int, int]] = {}
        self.hash_tables: list[pa.Table] = []
        # per-host circuit breaker: consecutive transport-failure
        # counts tracked on the LEDGER-owning shard; the driver
        # collects newly tripped hosts each wave boundary and
        # broadcasts them to every shard (wave-synchronous, so the
        # drop set is deterministic). Open hosts' frontier entries are
        # DROPPED at release (counter: breaker_dropped).
        self.host_error_budget = host_error_budget
        # crawler-trap guard: total accepted-URL count per host on
        # THIS shard. Under url-hash routing a host's accepts split
        # ~uniformly across shards (crc32 of the url), so the driver
        # sums shard counts at the wave boundary and trips hosts over
        # the global budget — reusing the breaker's open-host drop
        # machinery. Exact under host routing; statistically tight
        # (binomial split) under url-hash routing.
        self.host_url_budget = host_url_budget
        self.host_accepts: dict[str, int] = {}
        self._wave_tally: dict[str, tuple[int, int]] = {}
        self.canonicalize = canonicalize
        # OPIC adaptive scheduling (opt-in): pending-URL cash accrued
        # from link sightings (seeds start at 1.0; each fetched page's
        # cash splits evenly over its emitted candidates). Releases
        # drain the in-memory tier highest-cash-first (stable, so FIFO
        # breaks ties) BEFORE spill chunks; spill chunks stay FIFO —
        # the cash map is a bounded HOT SET (_CASH_CAP), which is the
        # scale-honest shape: scheduler priority only ever matters at
        # the head of the queue, and overflow beyond the cap degrades
        # to the parity FIFO rather than growing shard RSS. Accrual
        # and ordering happen wave-synchronously in finalize_wave, so
        # the schedule is deterministic for a given corpus.
        self.opic = opic
        self.url_cash: dict[str, float] = {}
        self._host_consec_errors: dict[str, int] = {}
        self.open_hosts: set[str] = set()

    # -- spill plumbing ------------------------------------------------
    def _spill_path(self, kind: str, ext: str) -> str:
        if self._spill_dir is None:
            self._spill_dir = tempfile.mkdtemp(prefix=f"frontier{self.shard_id}_")
        self._spill_seq += 1
        return os.path.join(self._spill_dir, f"{kind}_{self._spill_seq:06d}.{ext}")

    _META_HOST_CAP = 10_000  # above this many distinct hosts, skip the summary
    _CASH_CAP = 500_000  # OPIC hot-set bound (same class as pending_mem_limit)

    @classmethod
    def _chunk_meta(cls, chunk: list[tuple]) -> tuple[int, dict | None]:
        hosts: dict[str, int] = {}
        for ent in chunk:
            hosts[ent[1]] = hosts.get(ent[1], 0) + 1
            if len(hosts) > cls._META_HOST_CAP:
                return (len(chunk), None)
        return (len(chunk), hosts)

    def _cash_key(self, url: str) -> str:
        """The url_cash key — the SEEN key, so sightings of canonical
        variants accrue to one pending entry when canonicalize is on."""
        return canonical_url(url) if self.canonicalize else url

    def _accrue_cash(self, key: str, amount: float, fresh: bool) -> None:
        """Add sighting cash. ``fresh`` (first acceptance) may create
        the entry (bounded by _CASH_CAP); duplicate sightings only
        accrue to urls still pending — cash aimed at already-crawled
        or capped-out urls is discarded (one-shot crawl semantics)."""
        if key in self.url_cash:
            self.url_cash[key] += amount
        elif fresh and len(self.url_cash) < self._CASH_CAP:
            self.url_cash[key] = amount

    def _priority_of(self, url: str) -> int:
        for i, rx in enumerate(self._priority_res):
            if rx.search(url):
                return i
        return self.num_levels - 1

    def _spill_pending(self, level: int) -> None:
        path = self._spill_path(f"pending{level}", "pkl")
        chain = self.pending[level]
        with open(path, "wb") as f:
            pickle.dump(chain, f, protocol=pickle.HIGHEST_PROTOCOL)
        self._pending_files[level].append(path)
        self._pending_meta[level].append(self._chunk_meta(chain))
        self._pending_spilled[level] += len(chain)
        self.pending[level] = []

    def _pending_append(self, ent: tuple, level: int | None = None) -> None:
        if level is None:
            level = self._priority_of(ent[0])
        self.pending[level].append(ent)
        if len(self.pending[level]) >= self.pending_mem_limit:
            self._spill_pending(level)

    def _spill_ledger(self) -> None:
        import pyarrow.parquet as pq

        path = self._spill_path("ledger", "parquet")
        pq.write_table(pa.concat_tables(self.ledger_tables), path)
        self._ledger_files.append(path)
        self.ledger_tables = []
        self._ledger_mem_rows = 0

    # -- seeding ------------------------------------------------------
    def seed(self, entries: list[tuple[str, str]]) -> int:
        """entries: [(url, host)] at depth 0 (reference seeds the origin at
        depth 0 bypassing all filters, src/scraper.rs:298-302)."""
        n = 0
        for url, host in entries:
            key = canonical_url(url) if self.canonicalize else url
            if self.seen.insert_if_absent(key):
                self._pending_append((url, host, 0, 0))
                if self.opic:
                    self._accrue_cash(key, 1.0, fresh=True)
                n += 1
                if self.host_url_budget is not None:
                    # seeds are fetched regardless (reference: the
                    # origin bypasses filters) but CONSUME the budget,
                    # so a sitemap-flooded host has no fresh allowance
                    # left for link-discovered accepts
                    self.host_accepts[host] = self.host_accepts.get(host, 0) + 1
        self.counters["seeded"] += n
        return n

    # -- wave ingestion ----------------------------------------------
    def add_candidates(self, cands) -> int:
        """``cands``: an Arrow table (CAND_SCHEMA — the process stage's
        zero-copy shipping format) or a list of candidate tuples (test
        convenience)."""
        if not isinstance(cands, pa.Table):
            # tolerate pre-cash 7-tuples (tests, older callers)
            if cands and len(cands[0]) == len(CAND_SCHEMA.names) - 1:
                cands = [c + (0.0,) for c in cands]
            cands = rows_to_table(cands, CAND_SCHEMA)
        if cands.num_rows:
            self.buffer_tables.append(cands)
        self.counters["candidates_in"] += cands.num_rows
        return cands.num_rows

    def add_host_delays(self, delays: dict[str, int]) -> int:
        """Merge robots Crawl-delay directives (host → ms) discovered by
        the process stage. Max-merge makes re-delivery (task retries,
        per-batch resends) idempotent."""
        for host, ms in delays.items():
            if ms > 0 and ms > self.host_delay_ms.get(host, 0):
                self.host_delay_ms[host] = int(ms)
        return len(self.host_delay_ms)

    def _host_delay_blocked(self, host: str, now_s: float | None) -> bool:
        if now_s is None or host not in self.host_delay_ms:
            return False
        return now_s < self.host_next_allowed.get(host, 0.0)

    def delay_block_info(self) -> tuple[int, float | None]:
        """(pending_count, seconds until the nearest delayed host may
        release — None when no host is deadline-blocked). The driver
        uses this to sleep-retry instead of terminating when a wave
        releases nothing but delayed work remains. Returns a DURATION
        on purpose: shard-local monotonic deadlines are meaningless off
        this node."""
        now = self._clock()
        waits = [t - now for t in self.host_next_allowed.values() if t > now]
        return self.pending_count(), (min(waits) if waits else None)

    def add_hashes(self, rows) -> int:
        """Record (url, body_hash) rows fetched this run (delta
        recrawl). Last-write-wins per url; re-delivery is idempotent."""
        if not isinstance(rows, pa.Table):
            rows = rows_to_table(rows, HASH_SCHEMA)
        if rows.num_rows:
            self.hash_tables.append(rows)
        return rows.num_rows

    def flush_hashes(self, path: str, carry_prior: bool = False) -> int:
        """Write this run's (url, body_hash) rows as one per-shard
        parquet — the artifact the NEXT recrawl's shard i loads
        directly (same layout → zero filtering).

        ``carry_prior``: also carry forward PRIOR-run hashes for urls
        this run did not fetch (at their recorded depths) — a BUDGETED
        revisit (depth=0 over a due-list) refreshes only its seeds, so
        without the carry the next increment would see every untouched
        url as brand new. Urls fetched this run always win."""
        import pyarrow.parquet as pq_

        tbl = (
            pa.concat_tables(self.hash_tables)
            if self.hash_tables
            else HASH_SCHEMA.empty_table()
        )
        if tbl.num_rows:
            # last-write-wins dedup by url (task re-runs)
            df = tbl.to_pandas().drop_duplicates("url", keep="last")
            tbl = pa.Table.from_pandas(df, preserve_index=False).cast(HASH_SCHEMA)
        if carry_prior and self.recrawl_hashes:
            fetched = set(tbl.column("url").to_pylist())
            extra = [u for u in self.recrawl_hashes if u not in fetched]
            if extra:
                carried = pa.table(
                    {
                        "url": pa.array(extra, pa.string()),
                        "body_hash": pa.array(
                            [self.recrawl_hashes[u] for u in extra],
                            pa.int64(),
                        ),
                        "depth": pa.array(
                            [
                                self.recrawl_depths.get(u, (0, 0))[0]
                                for u in extra
                            ],
                            pa.int32(),
                        ),
                        "ext_depth": pa.array(
                            [
                                self.recrawl_depths.get(u, (0, 0))[1]
                                for u in extra
                            ],
                            pa.int32(),
                        ),
                    }
                ).cast(HASH_SCHEMA)
                tbl = pa.concat_tables([tbl, carried])
        pq_.write_table(tbl, path)
        return tbl.num_rows

    def load_recrawl_hashes(
        self,
        paths: list[str],
        route_by_host: bool,
        verify_ownership: bool = True,
    ) -> int:
        """Load the PRIOR run's hash parts into the release-time
        lookup. ``verify_ownership=False`` is the same-layout fast
        path: part i was WRITTEN by shard i under identical
        (num_shards, routing, canonicalize), so every row is owned by
        construction and no per-url parse/hash runs. On any layout
        change the caller hands every part to every shard with
        ``verify_ownership=True`` and ownership is re-derived under
        the CURRENT routing (canonical key when ``canonicalize`` —
        the same key candidates route by, so a variant candidate and
        its prior-run original always meet on one shard)."""
        import pyarrow.parquet as pq_

        for p in paths:
            t = pq_.read_table(p)
            depths = (
                zip(
                    t.column("depth").to_pylist(),
                    t.column("ext_depth").to_pylist(),
                )
                if "depth" in t.schema.names
                else ((0, 0) for _ in range(t.num_rows))
            )
            for u, h, (d, e) in zip(
                t.column("url").to_pylist(),
                t.column("body_hash").to_pylist(),
                depths,
            ):
                if verify_ownership:
                    try:
                        host = parse_url(u).host or ""
                    except UrlParseError:
                        continue
                    rk = canonical_url(u) if self.canonicalize else u
                    if (
                        shard_of_url(rk, host, self.num_shards, route_by_host)
                        != self.shard_id
                    ):
                        continue
                self.recrawl_hashes[u] = h
                self.recrawl_depths[u] = (d, e)
        return len(self.recrawl_hashes)

    def seed_recrawl(self) -> int:
        """Enqueue every prior-run url this shard owns at its RECORDED
        (depth, ext_depth) — the recrawl's seed set. Depth budgets
        therefore gate exactly as a fresh crawl would: an external page
        fetched at ext-hop 1 re-enters at ext-hop 1, not 0. First-wins
        seen-dedup keeps explicitly-passed seeds (inserted first) at
        their own depths. Under ``canonicalize`` the seen KEY is the
        canonical form (matching candidate dedup), while the fetched
        url stays the prior run's recorded original."""
        n = 0
        for url, (d, e) in self.recrawl_depths.items():
            try:
                host = parse_url(url).host or ""
            except UrlParseError:
                continue
            key = canonical_url(url) if self.canonicalize else url
            if self.seen.insert_if_absent(key):
                self._pending_append((url, host, d, e))
                if self.opic:
                    self._accrue_cash(key, 1.0, fresh=True)
                n += 1
                if self.host_url_budget is not None:
                    self.host_accepts[host] = self.host_accepts.get(host, 0) + 1
        self.counters["seeded"] += n
        return n

    def add_ledger(self, rows) -> int:
        """Idempotent by URL: Ray may re-run a side-effecting task
        (speculative probes, task retries, wave re-run on resume), so
        duplicate ingestion must be a no-op. ``rows``: Arrow table
        (LEDGER_SCHEMA) or list of tuples."""
        if not isinstance(rows, pa.Table):
            rows = rows_to_table(rows, LEDGER_SCHEMA)
        keep = [
            i
            for i, url in enumerate(rows.column("url").to_pylist())
            if self.ledger_seen.insert_if_absent(url)
        ]
        if len(keep) != rows.num_rows:
            rows = rows.take(pa.array(keep, type=pa.int64()))
        if rows.num_rows:
            if self.host_error_budget is not None:
                # tally the WINDOW (between take_opened_breakers calls
                # = one wave); folding happens deterministically at the
                # wave boundary so parallel batch arrival order cannot
                # change whether a host trips. Host comes from the
                # doc_id prefix (to_path emits host + path) — no
                # re-parse on the shard's single-threaded hot path.
                for d, st in zip(
                    rows.column("doc_id").to_pylist(),
                    rows.column("status").to_pylist(),
                ):
                    h = (d or "").split("/", 1)[0]
                    if not h:
                        continue
                    ok, fail = self._wave_tally.get(h, (0, 0))
                    if st == 0:  # transport failure after full tries
                        self._wave_tally[h] = (ok, fail + 1)
                    else:
                        self._wave_tally[h] = (ok + 1, fail)
            self.ledger_tables.append(rows)
            self._ledger_mem_rows += rows.num_rows
            if self._ledger_mem_rows >= self.ledger_mem_rows:
                self._spill_ledger()
        self.counters["fetched"] += rows.num_rows
        return rows.num_rows

    def take_opened_breakers(self) -> list[str]:
        """Fold the window's per-host tallies into the consecutive
        counters (a window with ≥1 failure and NO success counts one
        step; any success resets) and return the hosts whose budget
        just tripped. Called by the driver at the wave boundary, so
        the fold — and therefore the drop set — is deterministic
        regardless of how parallel ledger batches interleaved."""
        out: list[str] = []
        for h in sorted(self._wave_tally):
            ok, fail = self._wave_tally[h]
            if ok > 0:
                self._host_consec_errors[h] = 0
            elif fail > 0:
                c = self._host_consec_errors.get(h, 0) + 1
                self._host_consec_errors[h] = c
                if c >= self.host_error_budget and h not in self.open_hosts:
                    out.append(h)
        self._wave_tally = {}
        return out

    def open_breakers(self, hosts: list[str]) -> int:
        self.open_hosts.update(hosts)
        return len(self.open_hosts)

    _ACCEPT_REPORT_CAP = 10_000  # top-K hosts per report: traps are by
    # definition high-count, so truncation cannot hide one; it bounds
    # the per-wave transfer when a tight budget forces min_count=1 on
    # a million-host crawl

    def host_accept_counts(self, min_count: int) -> dict[str, int]:
        """Per-host accepted-URL counts at or above ``min_count`` (the
        driver's phase-1 candidate filter), truncated to the top
        ``_ACCEPT_REPORT_CAP`` by count. Open hosts are excluded —
        already tripped. Phase-1 sums UNDERCOUNT (shards below
        min_count are missing); the driver resolves near-budget hosts
        with the exact ``host_counts_for`` second phase."""
        cand = [
            (h, c)
            for h, c in self.host_accepts.items()
            if c >= min_count and h not in self.open_hosts
        ]
        if len(cand) > self._ACCEPT_REPORT_CAP:
            cand.sort(key=lambda t: -t[1])
            cand = cand[: self._ACCEPT_REPORT_CAP]
        return dict(cand)

    def host_counts_for(self, hosts: list[str]) -> dict[str, int]:
        """EXACT counts for specific hosts (phase 2: resolves hosts
        whose phase-1 undercounted sum landed near the budget)."""
        return {h: self.host_accepts.get(h, 0) for h in hosts}

    # -- wave boundary ------------------------------------------------
    def finalize_wave(
        self,
        wave: int,
        max_depth: int,
        max_ext_depth: int,
        max_per_host: int | None = None,
        max_wave_entries: int | None = None,
    ) -> int:
        """Dedup-gate the buffered candidates of the finished wave, then
        release the next wave's entries for this shard. ``max_per_host``
        caps per-host release (politeness/skew knob); ``max_wave_entries``
        caps the TOTAL release for this shard — the wave-size bound that
        keeps ``released_tbl`` (and the in-flight wave Dataset) from
        growing with the frontier: a 10^8-entry BFS wave drains as
        bounded sub-waves while untouched spill chunks stay on disk
        (VERDICT r2 item 2). Overflow stays pending for later waves.
        Returns the released-entry count; the entries themselves leave
        via ``released_refs``."""
        if self.buffer_tables:
            import numpy as np
            import pandas as pd

            buf = pa.concat_tables(self.buffer_tables)
            self.buffer_tables = []
            buf = buf.sort_by(
                [("parent_seq", "ascending"), ("ordinal", "ascending"), ("url", "ascending")]
            )
            # vectorized gate (order-preserving, so identical to the
            # per-row loop): drop task-re-run duplicates (identical
            # sort-key triples), keep each url's FIRST discovery in the
            # wave, batch-insert those into the seen set, then run the
            # (cheap, accepted-only) depth gate loop
            df = buf.to_pandas()
            df = df.drop_duplicates(["parent_seq", "ordinal", "url"])
            if self.canonicalize:
                keys = df["url"].map(canonical_url)
            else:
                keys = df["url"]
            first = ~keys.duplicated()
            fresh = self.seen.insert_batch(keys.loc[first].tolist())
            n_new = int(np.count_nonzero(fresh))
            self.counters["new_urls"] += n_new
            self.counters["dup_urls"] += len(df) - n_new
            acc = df.loc[first].loc[np.asarray(fresh, dtype=bool)]
            cash_sums = None
            if self.opic and "cash" in df.columns:
                # wave-synchronous accrual over EVERY sighting (dups
                # included — that is the point of OPIC: each reference
                # contributes its share). df is sorted, groupby-sum is
                # order-fixed → deterministic float totals. Duplicate
                # sightings accrue to urls STILL PENDING here; fresh
                # entries are created further down, only for urls that
                # survive the depth/breaker/budget gates (otherwise the
                # hot set fills with entries that are never released).
                cash_sums = df.groupby(keys.values)["cash"].sum()
                for k, c in cash_sums.items():
                    if c > 0.0:
                        self._accrue_cash(k, float(c), fresh=False)
            # vectorized depth gate (same semantics as urlkit.depth_gate
            # row-by-row): internal links consume depth, external hops
            # freeze depth and consume ext_depth; -1 = infinite
            ext = acc["is_external"].to_numpy(dtype=bool)
            d = acc["parent_depth"].to_numpy()
            e = acc["parent_ext_depth"].to_numpy()
            ok = np.where(
                ext,
                (max_ext_depth == -1) | (e < max_ext_depth),
                (max_depth == -1) | (d < max_depth),
            )
            self.counters["depth_gated"] += int(np.count_nonzero(~ok))
            if self.open_hosts:
                hmask = ~acc["host"].isin(self.open_hosts).to_numpy()
                self.counters["breaker_dropped"] += int(
                    np.count_nonzero(ok & ~hmask)
                )
                ok = ok & hmask
            if self.host_url_budget is not None and np.count_nonzero(ok):
                # ACCEPT-TIME shard-local cap: without it a single wide
                # trap page (50k same-host links) sails through before
                # the wave-boundary trip can fire. One shard accepts at
                # most ``budget`` URLs per host — EXACT under politeness
                # host-routing (one shard owns the host), overshoot
                # bounded by shards×budget under url-hash routing, with
                # the wave-synchronous global trip mopping up the rest.
                hosts_all = pd.Series(acc["host"].to_numpy()[ok])
                prior = hosts_all.map(self.host_accepts).fillna(0).to_numpy()
                within = (
                    prior + hosts_all.groupby(hosts_all).cumcount().to_numpy()
                ) < self.host_url_budget
                if not within.all():
                    self.counters["breaker_dropped"] += int(
                        np.count_nonzero(~within)
                    )
                    ok_idx = np.flatnonzero(ok)
                    ok = ok.copy()
                    ok[ok_idx[~within]] = False
                vc = hosts_all[within].value_counts()
                for h_, c_ in vc.items():
                    self.host_accepts[h_] = self.host_accepts.get(h_, 0) + int(c_)
            dd = np.where(ext, d, d + 1)[ok].tolist()
            ee = np.where(ext, e + 1, e)[ok].tolist()
            urls_ok = acc["url"].to_numpy()[ok]
            hosts_ok = acc["host"].to_numpy()[ok]
            ents = list(zip(urls_ok, hosts_ok, dd, ee))
            if cash_sums is not None:
                # fresh cash entries for the urls that actually became
                # pending (their full wave sighting total)
                for k in keys.loc[acc.index].to_numpy()[ok]:
                    c = float(cash_sums.get(k, 0.0))
                    if c > 0.0:
                        self._accrue_cash(k, c, fresh=True)
            if self.num_levels > 1:
                # first-match-wins level per URL, vectorized: start at
                # the lowest level and claim still-unmatched URLs from
                # the LAST pattern backwards so earlier patterns win
                s = pd.Series(urls_ok, dtype=object)
                levels = np.full(len(ents), self.num_levels - 1, dtype=np.int64)
                for i in range(len(self._priority_res) - 1, -1, -1):
                    m = s.str.contains(self._priority_res[i], regex=True).to_numpy()
                    levels[m] = i
            else:
                levels = np.zeros(len(ents), dtype=np.int64)
            # bulk append per level with the same spill cadence as
            # _pending_append (FIFO within level preserved: stable order)
            for lvl in range(self.num_levels):
                lvl_ents = (
                    ents
                    if self.num_levels == 1
                    else [e for e, l in zip(ents, levels) if l == lvl]
                )
                pos = 0
                while pos < len(lvl_ents):
                    room = self.pending_mem_limit - len(self.pending[lvl])
                    self.pending[lvl].extend(lvl_ents[pos : pos + room])
                    pos += room
                    if len(self.pending[lvl]) >= self.pending_mem_limit:
                        self._spill_pending(lvl)

        take = self._drain_pending(
            max_per_host,
            max_wave_entries,
            now_s=self._clock() if self.host_delay_ms else None,
        )
        self.released_tbl = rows_to_table(
            [
                (
                    url,
                    host,
                    d,
                    e,
                    encode_seq(wave, self.shard_id, i),
                    self.recrawl_hashes.get(url, 0),
                    # released urls leave the cash hot set; their cash
                    # rides the wave row to be split among outlinks
                    self.url_cash.pop(self._cash_key(url), 0.0)
                    if self.opic
                    else 0.0,
                )
                for i, (url, host, d, e) in enumerate(take)
            ],
            FRONTIER_SCHEMA,
        )
        self.counters["released"] += len(take)
        return len(take)

    def _drain_pending(
        self,
        max_per_host: int | None,
        max_total: int | None = None,
        now_s: float | None = None,
    ) -> list[tuple]:
        """FIFO drain across spill chunks then memory; with a per-host
        cap (politeness) and/or a total cap (wave-size bound) the
        overflow is re-queued in order (untouched spill chunks stay on
        disk — a capped drain reads only as much as it must).

        ``now_s`` (shard-local monotonic) engages robots Crawl-delay
        gating: a host whose release deadline lies in the future is
        skipped (entries stay pending), and releasing a delayed host
        sets its next deadline — so a delayed host releases at most
        once per drain and consecutive releases are spaced >= its
        delay. Exact per-host spacing additionally needs politeness
        host-routing (all of a host's entries on one shard); without
        it the gate is shard-local best effort."""
        if self.opic and self.url_cash:
            # stable sort (FIFO breaks ties) puts the highest-cash
            # in-memory entries at the head of each level's hot tier;
            # skipped entirely when the hot set is empty (pure FIFO).
            # Cost: O(n log n) per wave over ≤ pending_mem_limit
            # entries, plus one canonical_url parse per entry under
            # --canonicalize — acceptable next to the release itself.
            for lvl in range(self.num_levels):
                if self.pending[lvl]:
                    self.pending[lvl].sort(
                        key=lambda e: -self.url_cash.get(self._cash_key(e[0]), 0.0)
                    )
        if (
            max_per_host is None
            and max_total is None
            and now_s is None
            and not self.open_hosts
        ):
            take: list[tuple] = []
            for lvl in range(self.num_levels):
                if self.opic:  # hot tier (cash-ordered) ahead of spill
                    take.extend(self.pending[lvl])
                    self.pending[lvl] = []
                for path in self._pending_files[lvl]:
                    with open(path, "rb") as f:
                        take.extend(pickle.load(f))
                    os.remove(path)
                self._pending_files[lvl] = []
                self._pending_meta[lvl] = []
                self._pending_spilled[lvl] = 0
                take.extend(self.pending[lvl])
                self.pending[lvl] = []
            return take

        # Capped drain, levels in priority order sharing one per-host/
        # total budget (level 0 claims host slots first — that IS the
        # priority-queue semantics under politeness). Per-chunk host
        # summaries decide without any IO whether a chunk can contribute
        # under the per-host cap — a head chunk dominated by one capped
        # host no longer starves other hosts in later chunks — and once
        # the total budget is spent the remaining chunks are never
        # touched at all (their counts live in _pending_meta). Leftovers
        # of a loaded chunk are re-spilled AT THE SAME POSITION, so FIFO
        # order within a level is preserved exactly.
        per_host: dict[str, int] = defaultdict(int)
        budget = max_total if max_total is not None else float("inf")
        take = []

        def scan_mem(lvl: int) -> None:
            # the in-memory pending is ALWAYS scanned (budget
            # permitting) — hosts that only appear here must not be
            # starved by saturated spill chunks. Under opic it runs
            # BEFORE the spill chunks (cash-ordered hot tier first).
            nonlocal budget
            mem_kept = []
            for ent in self.pending[lvl]:
                h = ent[1]
                if h in self.open_hosts:
                    self.counters["breaker_dropped"] += 1
                    if self.opic:  # dropped entries retire their cash
                        self.url_cash.pop(self._cash_key(ent[0]), None)
                    continue
                if (
                    budget > 0
                    and (max_per_host is None or per_host[h] < max_per_host)
                    and not self._host_delay_blocked(h, now_s)
                ):
                    per_host[h] += 1
                    budget -= 1
                    take.append(ent)
                    if now_s is not None and h in self.host_delay_ms:
                        self.host_next_allowed[h] = (
                            now_s + self.host_delay_ms[h] / 1000.0
                        )
                else:
                    mem_kept.append(ent)
            self.pending[lvl] = mem_kept

        for lvl in range(self.num_levels):
            new_files: list[str] = []
            new_meta: list[tuple[int, dict | None]] = []
            if self.opic:
                scan_mem(lvl)
            for path, meta in zip(self._pending_files[lvl], self._pending_meta[lvl]):
                hosts = meta[1]
                has_open = hosts is not None and any(
                    h in self.open_hosts for h in hosts
                )
                if not has_open and (
                    budget <= 0
                    or (
                        hosts is not None
                        and all(
                            (
                                max_per_host is not None
                                and per_host[h] >= max_per_host
                            )
                            or self._host_delay_blocked(h, now_s)
                            for h in hosts
                        )
                        and (max_per_host is not None or now_s is not None)
                    )
                ):
                    new_files.append(path)
                    new_meta.append(meta)
                    continue
                with open(path, "rb") as f:
                    chunk = pickle.load(f)
                kept = []
                for ent in chunk:
                    h = ent[1]
                    if h in self.open_hosts:
                        self.counters["breaker_dropped"] += 1
                        if self.opic:  # dropped entries retire their cash
                            self.url_cash.pop(self._cash_key(ent[0]), None)
                        continue
                    if (
                        budget > 0
                        and (max_per_host is None or per_host[h] < max_per_host)
                        and not self._host_delay_blocked(h, now_s)
                    ):
                        per_host[h] += 1
                        budget -= 1
                        take.append(ent)
                        if now_s is not None and h in self.host_delay_ms:
                            self.host_next_allowed[h] = (
                                now_s + self.host_delay_ms[h] / 1000.0
                            )
                    else:
                        kept.append(ent)
                if len(kept) == len(chunk):  # None-meta chunk, fully capped
                    new_files.append(path)
                    new_meta.append(meta)
                    continue
                os.remove(path)
                if kept:
                    repl = self._spill_path(f"pending{lvl}", "pkl")
                    with open(repl, "wb") as f:
                        pickle.dump(kept, f, protocol=pickle.HIGHEST_PROTOCOL)
                    new_files.append(repl)
                    new_meta.append(self._chunk_meta(kept))
            if not self.opic:
                scan_mem(lvl)
            self._pending_files[lvl] = new_files
            self._pending_meta[lvl] = new_meta
            self._pending_spilled[lvl] = sum(m[0] for m in new_meta)
        return take

    def released_count(self) -> int:
        return self.released_tbl.num_rows if self.released_tbl is not None else 0

    def released_refs(self, max_block_rows: int = 0) -> list:
        """The released wave as ObjectRefs of Arrow table chunks — the
        driver passes these straight to ``ray.data.from_arrow_refs`` so
        wave entries never transit driver memory."""
        import ray

        tbl = self.released_tbl
        if tbl is None or tbl.num_rows == 0:
            return []
        if max_block_rows and tbl.num_rows > max_block_rows:
            return [
                ray.put(tbl.slice(off, max_block_rows))
                for off in range(0, tbl.num_rows, max_block_rows)
            ]
        return [ray.put(tbl)]

    def released_entries(self) -> list[tuple]:
        """Released wave as tuples (tests / small-scale introspection)."""
        if self.released_tbl is None:
            return []
        names = [
            n
            for n in FRONTIER_SCHEMA.names
            if n in self.released_tbl.schema.names  # pre-prev_hash snapshots
        ]
        cols = [self.released_tbl.column(n).to_pylist() for n in names]
        return list(zip(*cols))

    def ack_wave(self) -> None:
        """The wave's documents are durably written; drop resume state."""
        self.released_tbl = None

    # -- introspection ------------------------------------------------
    def pending_count(self) -> int:
        return (
            sum(len(c) for c in self.pending)
            + sum(self._pending_spilled)
            + sum(t.num_rows for t in self.buffer_tables)
        )

    def seen_count(self) -> int:
        return len(self.seen)

    def retire_seen(self, urls: list[str]) -> int:
        """Unlearn URLs from this shard's seen set (incremental-recrawl
        retirement of crawl_diff status='removed' pages). Needs
        ``seen_filter='cuckoo'`` once the set has frozen runs — the
        default bloom pre-screen cannot delete. Caller routes each URL
        to its owner shard (same shard key as candidates); the
        canonical-key mapping the insert used is applied here, so
        callers pass raw urls."""
        keys = [
            canonical_url(u) if self.canonicalize else u for u in urls
        ]
        return self.seen.retire_batch(keys)

    def get_counters(self) -> dict:
        return dict(self.counters)

    def _ledger_parts(self) -> list[pa.Table]:
        import pyarrow.parquet as pq

        return [pq.read_table(p) for p in self._ledger_files] + self.ledger_tables

    def get_ledger(self) -> pa.Table:
        parts = self._ledger_parts()
        return pa.concat_tables(parts) if parts else LEDGER_SCHEMA.empty_table()

    def flush_ledger(self, path: str) -> int:
        """Write this shard's ledger partition straight to parquet —
        the scale path: the ledger never transits the driver."""
        import pyarrow.parquet as pq

        tbl = self.get_ledger()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        pq.write_table(tbl, path)
        return tbl.num_rows

    # -- checkpoint ----------------------------------------------------
    def snapshot(self, path: str, wave: int) -> str:
        """Write this shard's full state for exact resume (per-partition
        checkpoint + lineage epoch, north_rule). Atomic via tmp+rename.
        Spill chunks are copied alongside so the checkpoint is
        self-contained — under WAVE-STAMPED names ({path}.wNNNNN.pendKKKK)
        referenced by the pickle, so the copies belong to the atomic
        unit: a crash after writing wave N+1's copies but before the
        pickle's os.replace leaves wave N's pickle still referencing
        wave N's (untouched) copies. Prior waves' copies are
        garbage-collected only AFTER the rename (ADVICE r2 medium)."""
        spill_copies: list[list[str]] = []
        for lvl, files in enumerate(self._pending_files):
            lvl_copies = []
            for i, p in enumerate(files):
                dst = f"{path}.w{wave:05d}.pend{lvl:02d}_{i:04d}"
                shutil.copyfile(p, dst)
                lvl_copies.append(os.path.basename(dst))
            spill_copies.append(lvl_copies)
        ledger_copies = []
        for i, p in enumerate(self._ledger_files):
            dst = f"{path}.w{wave:05d}.ledg{i:04d}"
            shutil.copyfile(p, dst)
            ledger_copies.append(os.path.basename(dst))
        st = {
            "shard_id": self.shard_id,
            "num_shards": self.num_shards,
            "wave": wave,
            "seen": self.seen.state(),  # freezes the active tier; neutral
            "ledger_seen": self.ledger_seen.state(),
            "pending": self.pending,
            "pending_files": spill_copies,
            "priority_patterns": self.priority_patterns,
            "released": self.released_tbl,
            "ledger_tables": self.ledger_tables,
            "ledger_files": ledger_copies,
            "counters": dict(self.counters),
            "host_delay_ms": dict(self.host_delay_ms),
            "recrawl_hashes": self.recrawl_hashes,
            "hash_tables": self.hash_tables,
            "host_consec_errors": self._host_consec_errors,
            "host_accepts": self.host_accepts,
            "open_hosts": sorted(self.open_hosts),
            "canonicalize": self.canonicalize,
            "opic": self.opic,
            "url_cash": self.url_cash,
        }
        tmp = f"{path}.tmp"
        with open(tmp, "wb") as f:
            pickle.dump(st, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
        # GC spill copies of prior waves: once the rename landed, the
        # only referenced copies are this wave's. (A crash right here
        # leaves orphans from older waves — harmless, collected on the
        # next successful snapshot.)
        base_dir = os.path.dirname(path) or "."
        me = os.path.basename(path)
        keep_prefix = f"{me}.w{wave:05d}."
        for name in os.listdir(base_dir):
            if (
                name.startswith(f"{me}.w")
                and (".pend" in name or ".ledg" in name)
                and not name.startswith(keep_prefix)
            ):
                try:
                    os.remove(os.path.join(base_dir, name))
                except OSError:
                    pass
        return path

    def restore(self, path: str) -> int:
        with open(path, "rb") as f:
            st = pickle.load(f)
        if st["shard_id"] != self.shard_id or st["num_shards"] != self.num_shards:
            # explicit raise (python -O strips asserts): restoring the
            # wrong shard layout silently re-routes candidates and
            # drops frontier state
            raise ValueError(
                f"snapshot is shard {st['shard_id']}/{st['num_shards']}, "
                f"this actor is shard {self.shard_id}/{self.num_shards}"
            )
        pend = st["pending"]
        pfiles = st["pending_files"]
        if not pend or not isinstance(pend[0], list):
            # pre-priority (round ≤3 early) flat snapshot → level 0
            pend, pfiles = [list(pend)], [list(pfiles)]
        L = self.num_levels
        if len(pend) != L:
            raise ValueError(
                f"snapshot has {len(pend)} priority levels, this actor "
                f"is configured with {L} — resume must keep the same "
                "priority_patterns"
            )
        # Same COUNT is not enough: pending entries were bucketed by the
        # snapshot-time patterns, so resuming with different regexes of
        # equal count would silently apply the old precedence to old
        # entries and the new one to new entries. Snapshots that predate
        # pattern recording carry no key and skip the check.
        snap_pats = st.get("priority_patterns")
        if snap_pats is not None and tuple(snap_pats) != self.priority_patterns:
            raise ValueError(
                f"snapshot was taken with priority_patterns={tuple(snap_pats)!r}, "
                f"this actor is configured with {self.priority_patterns!r} — "
                "resume must keep the same priority_patterns"
            )
        snap_canon = st.get("canonicalize")
        if snap_canon is not None and snap_canon != self.canonicalize:
            raise ValueError(
                f"snapshot was taken with canonicalize={snap_canon}, "
                f"this actor is configured with {self.canonicalize} — "
                "toggling canonicalization mid-crawl would mix raw and "
                "canonical seen keys and flip shard routing"
            )
        snap_opic = st.get("opic")
        if snap_opic is not None and snap_opic != self.opic:
            raise ValueError(
                f"snapshot was taken with opic={snap_opic}, this actor "
                f"is configured with {self.opic} — toggling adaptive "
                "scheduling mid-crawl would change sub-wave membership "
                "and break the resumed run's determinism"
            )
        # ALL validation precedes ANY mutation: a rejected resume must
        # leave the shard exactly as it was (a caller catching the
        # ValueError may legitimately continue the current crawl)
        self.seen = SpillableSet.from_state(st["seen"])
        self.ledger_seen = SpillableSet.from_state(st["ledger_seen"])
        self.pending = [[tuple(p) for p in chain] for chain in pend]
        self._pending_files = [[] for _ in range(L)]
        self._pending_meta = [[] for _ in range(L)]
        self._pending_spilled = [0] * L
        base = os.path.dirname(path)
        for lvl in range(L):
            for name in pfiles[lvl]:
                dst = self._spill_path(f"pending{lvl}", "pkl")
                shutil.copyfile(os.path.join(base, name), dst)
                self._pending_files[lvl].append(dst)
                with open(dst, "rb") as f:
                    chunk = pickle.load(f)
                meta = self._chunk_meta(chunk)
                self._pending_meta[lvl].append(meta)
                self._pending_spilled[lvl] += meta[0]
        self.released_tbl = st["released"]
        self.ledger_tables = list(st["ledger_tables"])
        self._ledger_mem_rows = sum(t.num_rows for t in self.ledger_tables)
        self._ledger_files = []
        for name in st["ledger_files"]:
            dst = self._spill_path("ledger", "parquet")
            shutil.copyfile(os.path.join(base, name), dst)
            self._ledger_files.append(dst)
        self.counters = defaultdict(int, st["counters"])
        # Crawl-delay state: delays persist; deadlines are shard-local
        # monotonic and meaningless across process restarts, so they
        # reset — the first post-resume release per host may come
        # early, then spacing resumes (conservative, bounded breach).
        self.host_delay_ms = dict(st.get("host_delay_ms", {}))
        self.host_next_allowed = {}
        self.recrawl_hashes = dict(st.get("recrawl_hashes", {}))
        self.hash_tables = list(st.get("hash_tables", []))
        self._host_consec_errors = dict(st.get("host_consec_errors", {}))
        self.host_accepts = dict(st.get("host_accepts", {}))
        self.open_hosts = set(st.get("open_hosts", []))
        self.url_cash = dict(st.get("url_cash", {}))
        return st["wave"]
