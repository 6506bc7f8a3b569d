"""Unit tests for the seen-set tiers and frontier shard semantics
(first-wins dedup, deterministic finalize, politeness release caps)."""

from suckit_ray.state.frontier import FrontierShard, encode_seq, shard_of
from suckit_ray.state.seenset import SpillableSet


class TestSpillableSet:
    def test_insert_if_absent_first_wins(self):
        s = SpillableSet()
        assert s.insert_if_absent("http://a.test/")
        assert not s.insert_if_absent("http://a.test/")
        assert "http://a.test/" in s
        assert "http://b.test/" not in s
        assert len(s) == 1

    def test_spill_keeps_exactness(self):
        s = SpillableSet(spill_threshold=10)
        urls = [f"http://h.test/p{i}.html" for i in range(100)]
        for u in urls:
            assert s.insert_if_absent(u)
        assert s.frozen_lo, "spill should have triggered"
        for u in urls:
            assert u in s
            assert not s.insert_if_absent(u)
        assert "http://h.test/p100.html" not in s
        assert len(s) == 100

    def test_state_round_trip(self):
        s = SpillableSet(spill_threshold=5)
        for i in range(20):
            s.insert_if_absent(f"u{i}")
        s2 = SpillableSet.from_state(s.state())
        for i in range(20):
            assert not s2.insert_if_absent(f"u{i}")
        assert s2.insert_if_absent("fresh")


class TestFrontierShard:
    def cand(self, seq, ordinal, url, ext=False, d=0, e=0, host="h.test"):
        return (seq, ordinal, url, host, ext, d, e)

    def test_first_wins_and_depth_gate(self):
        sh = FrontierShard(0, 1)
        sh.add_candidates(
            [
                self.cand(1, 0, "http://h.test/a.html"),
                self.cand(1, 1, "http://h.test/a.html"),  # same wave dup
                self.cand(1, 2, "http://x.test/e.html", ext=True),  # ext_depth 0 → gated
            ]
        )
        sh.finalize_wave(1, max_depth=-1, max_ext_depth=0)
        rel = sh.released_entries()
        assert [r[0] for r in rel] == ["http://h.test/a.html"]
        assert rel[0][2] == 1  # depth bumped
        c = sh.get_counters()
        assert c["new_urls"] == 2 and c["dup_urls"] == 1 and c["depth_gated"] == 1

    def test_deterministic_order_regardless_of_arrival(self):
        a = [self.cand(5, 0, "http://h.test/z.html"), self.cand(5, 1, "http://h.test/y.html")]
        b = [self.cand(3, 0, "http://h.test/x.html")]
        sh1 = FrontierShard(0, 1)
        sh1.add_candidates(a)
        sh1.add_candidates(b)
        sh2 = FrontierShard(0, 1)
        sh2.add_candidates(b)
        sh2.add_candidates(a)
        sh1.finalize_wave(1, -1, 0)
        sh2.finalize_wave(1, -1, 0)
        r1, r2 = sh1.released_entries(), sh2.released_entries()
        assert r1 == r2
        assert [r[0] for r in r1] == [
            "http://h.test/x.html",
            "http://h.test/z.html",
            "http://h.test/y.html",
        ]  # parent_seq then ordinal order

    def test_max_per_host_release_cap(self):
        sh = FrontierShard(0, 1)
        sh.add_candidates(
            [self.cand(1, i, f"http://h.test/p{i}.html") for i in range(5)]
            + [self.cand(1, 9, "http://other.test/q.html", host="other.test")]
        )
        sh.finalize_wave(1, -1, 0, max_per_host=2)
        hosts = [r[1] for r in sh.released_entries()]
        assert hosts.count("h.test") == 2 and hosts.count("other.test") == 1
        assert sh.pending_count() == 3  # overflow stays queued
        assert sh.finalize_wave(2, -1, 0, max_per_host=2) == 2
        assert sh.finalize_wave(3, -1, 0, max_per_host=2) == 1

    def test_ledger_idempotent(self):
        sh = FrontierShard(0, 1)
        row = ("http://h.test/", "h.test/index.html", 200, 0, True, True, 3, None)
        assert sh.add_ledger([row]) == 1
        assert sh.add_ledger([row]) == 0  # task re-run is a no-op
        assert len(sh.get_ledger()) == 1

    def test_seq_encoding_orders_waves(self):
        assert encode_seq(1, 0, 0) > encode_seq(0, 255, 2**30)
        assert encode_seq(2, 3, 4) == (2 << 44) | (3 << 34) | 4
        # 10 bits of shard (round 3: was 8 — 512-shard scale runs
        # silently collided), 34 bits of idx, bounds validated
        assert encode_seq(0, 1023, 0) < encode_seq(1, 0, 0)
        import pytest as _pytest

        with _pytest.raises(ValueError):
            encode_seq(0, 1024, 0)
        with _pytest.raises(ValueError):
            encode_seq(0, 0, 1 << 34)

    def test_shard_of_stable(self):
        assert shard_of("site.test", 8) == shard_of("site.test", 8)
        assert 0 <= shard_of("anything", 5) < 5


class TestGatePoisoning:
    """Reference parity: map_url_path inserts BEFORE the depth gate
    (src/scraper.rs:202-215), so a URL first discovered via a
    depth-gated external link is never crawled even when an internal
    link to it arrives later. The rebuild preserves this first-
    discovery-wins quirk."""

    def test_gated_discovery_poisons_later_internal_link(self):
        sh = FrontierShard(0, 1)
        url = "http://b.test/x.html"
        # wave 1: external discovery, ext_depth budget 0 → gated
        sh.add_candidates([(1, 0, url, "b.test", True, 0, 0)])
        assert sh.finalize_wave(1, max_depth=-1, max_ext_depth=0) == 0
        assert sh.released_entries() == []
        # wave 2: internal discovery of the same URL → already seen
        sh.add_candidates([(2, 0, url, "b.test", False, 1, 0)])
        assert sh.finalize_wave(2, max_depth=-1, max_ext_depth=0) == 0
        assert sh.get_counters()["dup_urls"] == 1


class TestSpillTiers:
    """Round-2 scale hardening: pending queue and ledger overflow to
    disk chunks; actor memory stays bounded by the *_mem knobs while
    semantics (FIFO order, politeness caps, idempotence, checkpoint)
    are unchanged (VERDICT r1 items 4/6)."""

    def cand(self, seq, ordinal, url, host="h.test"):
        return (seq, ordinal, url, host, False, 0, 0)

    def test_pending_spill_round_trip_full_drain(self):
        sh = FrontierShard(0, 1, pending_mem_limit=10)
        sh.add_candidates(
            [self.cand(1, i, f"http://h.test/p{i:04d}.html") for i in range(55)]
        )
        sh.finalize_wave(1, -1, 0)
        # ingestion happens at finalize; pending spilled then drained
        rel = sh.released_entries()
        assert [r[0] for r in rel] == [
            f"http://h.test/p{i:04d}.html" for i in range(55)
        ]  # FIFO order across spill chunks

    def test_pending_spill_with_per_host_cap(self):
        sh = FrontierShard(0, 1, pending_mem_limit=8)
        cands = [
            self.cand(1, i, f"http://h{i % 3}.test/p{i:04d}.html", host=f"h{i % 3}.test")
            for i in range(30)
        ]
        sh.add_candidates(cands)
        released = []
        wave = 1
        while True:
            n = sh.finalize_wave(wave, -1, 0, max_per_host=2)
            if n == 0:
                break
            rel = sh.released_entries()
            hosts = [r[1] for r in rel]
            for h in set(hosts):
                assert hosts.count(h) <= 2
            released.extend(r[0] for r in rel)
            sh.ack_wave()
            wave += 1
        assert sorted(released) == sorted(c[2] for c in cands)
        assert sh.pending_count() == 0

    def test_ledger_spill_and_idempotence(self):
        sh = FrontierShard(0, 1, ledger_mem_rows=16)
        rows = [
            (f"http://h.test/p{i}", f"h.test/p{i}", 200, 0, True, True, 1, None)
            for i in range(100)
        ]
        assert sh.add_ledger(rows) == 100
        assert sh._ledger_files, "ledger should have spilled to parquet runs"
        assert sh.add_ledger(rows) == 0  # re-ingest is a no-op across spills
        led = sh.get_ledger()
        assert led.num_rows == 100
        assert sorted(led.column("url").to_pylist()) == sorted(r[0] for r in rows)

    def test_checkpoint_preserves_spilled_state(self, tmp_path):
        sh = FrontierShard(0, 1, pending_mem_limit=10, ledger_mem_rows=10)
        sh.add_candidates(
            [self.cand(1, i, f"http://h.test/p{i:04d}.html") for i in range(40)]
        )
        sh.add_ledger(
            [
                (f"http://h.test/l{i}", f"h.test/l{i}", 200, 0, True, True, 0, None)
                for i in range(30)
            ]
        )
        sh.finalize_wave(1, -1, 0, max_per_host=5)  # leaves spilled pending
        snap = str(tmp_path / "shard_0000.pkl")
        sh.snapshot(snap, 1)

        sh2 = FrontierShard(0, 1, pending_mem_limit=10, ledger_mem_rows=10)
        sh2.restore(snap)
        assert sh2.released_entries() == sh.released_entries()
        assert sh2.pending_count() == sh.pending_count()
        assert sh2.get_ledger().num_rows == 30
        # drain the rest from the restored shard: nothing lost, no dups
        seen_urls = {r[0] for r in sh2.released_entries()}
        wave = 2
        while sh2.finalize_wave(wave, -1, 0, max_per_host=5):
            for r in sh2.released_entries():
                assert r[0] not in seen_urls
                seen_urls.add(r[0])
            sh2.ack_wave()
            wave += 1
        assert len(seen_urls) == 40

    def test_max_wave_entries_bounds_release(self):
        """VERDICT r2 item 2: the total-release cap drains a big wave as
        bounded FIFO sub-waves; untouched spill chunks stay on disk and
        nothing is lost or reordered."""
        sh = FrontierShard(0, 1, pending_mem_limit=10)
        urls = [f"http://h.test/p{i:04d}.html" for i in range(40)]
        sh.add_candidates([self.cand(1, i, u) for i, u in enumerate(urls)])
        released = []
        wave = 1
        while True:
            n = sh.finalize_wave(wave, -1, 0, max_wave_entries=7)
            if n == 0:
                break
            assert n <= 7
            rel = sh.released_entries()
            assert len(rel) == n
            released.extend(r[0] for r in rel)
            sh.ack_wave()
            wave += 1
        assert released == urls  # exact FIFO order across sub-waves
        assert sh.pending_count() == 0

    def test_max_wave_entries_composes_with_per_host_cap(self):
        sh = FrontierShard(0, 1, pending_mem_limit=6)
        cands = [
            self.cand(1, i, f"http://h{i % 4}.test/p{i:04d}.html", host=f"h{i % 4}.test")
            for i in range(24)
        ]
        sh.add_candidates(cands)
        released = []
        wave = 1
        while True:
            n = sh.finalize_wave(wave, -1, 0, max_per_host=2, max_wave_entries=5)
            if n == 0:
                break
            rel = sh.released_entries()
            assert len(rel) <= 5
            hosts = [r[1] for r in rel]
            assert all(hosts.count(h) <= 2 for h in set(hosts))
            released.extend(r[0] for r in rel)
            sh.ack_wave()
            wave += 1
        assert sorted(released) == sorted(c[2] for c in cands)

    def test_snapshot_crash_between_spill_copies_and_rename(self, tmp_path, monkeypatch):
        """ADVICE r2 (medium): a crash AFTER writing the next wave's
        spill copies but BEFORE the pickle's os.replace must leave the
        previous snapshot fully intact — wave-stamped copy names keep
        the copies inside the atomic unit."""
        import os as _os

        sh = FrontierShard(0, 1, pending_mem_limit=10)
        sh.add_candidates(
            [self.cand(1, i, f"http://h.test/p{i:04d}.html") for i in range(40)]
        )
        sh.finalize_wave(1, -1, 0, max_per_host=5)  # spilled pending remains
        snap = str(tmp_path / "shard_0000.pkl")
        sh.snapshot(snap, 1)
        want_released = sh.released_entries()
        want_pending = sh.pending_count()

        # advance the crawl: drain more, new spill chunks with DIFFERENT
        # contents, then crash the wave-2 snapshot at the rename
        sh.ack_wave()
        sh.finalize_wave(2, -1, 0, max_per_host=5)
        real_replace = _os.replace

        def crash_replace(src, dst):
            raise OSError("simulated crash before rename")

        monkeypatch.setattr("suckit_ray.state.frontier.os.replace", crash_replace)
        try:
            sh.snapshot(snap, 2)
        except OSError:
            pass
        monkeypatch.setattr("suckit_ray.state.frontier.os.replace", real_replace)

        sh2 = FrontierShard(0, 1, pending_mem_limit=10)
        assert sh2.restore(snap) == 1  # still the wave-1 snapshot
        assert sh2.released_entries() == want_released
        assert sh2.pending_count() == want_pending
        # and a successful later snapshot garbage-collects stale copies
        sh2.finalize_wave(2, -1, 0, max_per_host=5)
        sh2.snapshot(snap, 2)
        stale = [
            n
            for n in _os.listdir(tmp_path)
            if ".w00001." in n or (".pend" in n and ".w" not in n)
        ]
        assert stale == []

    def test_capped_drain_does_not_starve_hosts_in_later_chunks(self):
        """ADVICE r2 (low): a head spill chunk saturated by one capped
        host must not block releases for other hosts living in later
        chunks or in memory."""
        sh = FrontierShard(0, 1, pending_mem_limit=5)
        # chunks 1+2: 10 urls of hot.test (chunk 2 will be FULLY capped
        # after chunk 1 releases one — the old code's saturation
        # short-circuit then skipped chunk 3 AND memory); chunk 3:
        # 5 urls of cold.test; memory: 3 urls of warm.test
        cands = (
            [self.cand(1, i, f"http://hot.test/p{i}.html", host="hot.test") for i in range(10)]
            + [self.cand(1, 10 + i, f"http://cold.test/p{i}.html", host="cold.test") for i in range(5)]
            + [self.cand(1, 20 + i, f"http://warm.test/p{i}.html", host="warm.test") for i in range(3)]
        )
        sh.add_candidates(cands)
        sh.finalize_wave(1, -1, 0, max_per_host=1)
        hosts = sorted({r[1] for r in sh.released_entries()})
        # one release per host — all three hosts progress in wave 1
        assert hosts == ["cold.test", "hot.test", "warm.test"]
        assert len(sh.released_entries()) == 3
        # per-host FIFO: the released hot url is the chunk-1 head
        rel_by_host = {r[1]: r[0] for r in sh.released_entries()}
        assert rel_by_host["hot.test"] == "http://hot.test/p0.html"
        # drain to completion: nothing lost, cap respected each wave
        seen = {r[0] for r in sh.released_entries()}
        wave = 2
        sh.ack_wave()
        while sh.finalize_wave(wave, -1, 0, max_per_host=1):
            rel = sh.released_entries()
            per = [r[1] for r in rel]
            assert all(per.count(h) <= 1 for h in set(per))
            seen.update(r[0] for r in rel)
            sh.ack_wave()
            wave += 1
        assert len(seen) == 18


class TestSeenSetCompaction:
    def test_frozen_runs_compact_and_state_does_not_alias(self):
        """Round-3 review fixes: per-checkpoint freezes must not grow
        the frozen-run list without bound (membership cost per URL is
        linear in runs), and state() must return run lists the live set
        can't mutate afterwards."""
        s = SpillableSet(spill_threshold=10**9)
        for r in range(30):  # 30 "checkpoints", a few URLs each
            for k in range(5):
                assert s.insert_if_absent(f"http://h.test/w{r}k{k}")
            st = s.state()  # freezes the active tier
        assert len(s.frozen_lo) <= SpillableSet.MAX_FROZEN_RUNS + 1
        # every URL is still a member after compaction
        for r in range(30):
            for k in range(5):
                assert f"http://h.test/w{r}k{k}" in s
                assert not s.insert_if_absent(f"http://h.test/w{r}k{k}")
        # state() snapshot is isolated from later freezes
        n_runs = len(st["frozen_lo"])
        s.insert_if_absent("http://h.test/new")
        s.state()
        assert len(st["frozen_lo"]) == n_runs
        # and a restore from it round-trips membership
        s2 = SpillableSet.from_state(st)
        assert "http://h.test/w29k4" in s2
        assert "http://h.test/never" not in s2


class TestPriorityQueues:
    """Round-3: per-host politeness PRIORITY queues (north_rule) —
    pending is priority-bucketed by first-matching pattern; releases
    drain level 0 first while keeping per-host caps, FIFO-within-level
    across spill chunks, checkpoint round-trip, and crawl-set
    equality with the FIFO frontier."""

    def cand(self, seq, ordinal, url, host="h.test"):
        return (seq, ordinal, url, host, False, 0, 0)

    def mixed_urls(self, n=30):
        exts = ["html", "css", "bin"]
        return [f"http://h.test/p{i:04d}.{exts[i % 3]}" for i in range(n)]

    def test_wave_cap_releases_high_priority_first(self):
        sh = FrontierShard(
            0, 1, pending_mem_limit=7,
            priority_patterns=(r"\.html", r"\.css"),
        )
        urls = self.mixed_urls(30)  # 10 html, 10 css, 10 bin
        sh.add_candidates([self.cand(1, i, u) for i, u in enumerate(urls)])
        waves = []
        wave, total = 1, 0
        while True:
            n = sh.finalize_wave(wave, -1, 0, max_wave_entries=10)
            if n == 0:
                break
            waves.append([r[0] for r in sh.released_entries()])
            total += n
            sh.ack_wave()
            wave += 1
        assert total == 30
        # sub-wave 1 = all html (level 0), 2 = all css, 3 = the rest
        assert all(u.endswith(".html") for u in waves[0]) and len(waves[0]) == 10
        assert all(u.endswith(".css") for u in waves[1]) and len(waves[1]) == 10
        assert all(u.endswith(".bin") for u in waves[2]) and len(waves[2]) == 10
        # FIFO preserved within each level across spill chunks
        for w in waves:
            assert w == sorted(w)

    def test_first_matching_pattern_wins(self):
        sh = FrontierShard(0, 1, priority_patterns=(r"alpha", r"a"))
        assert sh._priority_of("http://h.test/alpha.bin") == 0
        assert sh._priority_of("http://h.test/art.bin") == 1
        assert sh._priority_of("http://h.test/zz.bin") == 2

    def test_per_host_cap_spans_levels(self):
        """Level 0 claims a host's politeness slot first; the shared
        budget means a host never exceeds the cap per wave even when
        it has entries at several levels."""
        sh = FrontierShard(0, 1, priority_patterns=(r"\.html",))
        cands = [
            self.cand(1, i, f"http://h{i % 2}.test/p{i:04d}.{'html' if i < 6 else 'bin'}",
                      host=f"h{i % 2}.test")
            for i in range(12)
        ]
        sh.add_candidates(cands)
        released = []
        wave = 1
        while True:
            n = sh.finalize_wave(wave, -1, 0, max_per_host=2)
            if n == 0:
                break
            rel = sh.released_entries()
            hosts = [r[1] for r in rel]
            for h in set(hosts):
                assert hosts.count(h) <= 2
            # any html still pending must release before this wave's bin
            released.append([r[0] for r in rel])
            sh.ack_wave()
            wave += 1
        flat = [u for w in released for u in w]
        assert sorted(flat) == sorted(c[2] for c in cands)
        # all html released strictly before any bin for the same host
        for h in ("h0.test", "h1.test"):
            host_seq = [u for u in flat if f"//{h}/" in u]
            kinds = [u.rsplit(".", 1)[1] for u in host_seq]
            assert kinds == sorted(kinds, key=lambda k: k != "html")

    def test_checkpoint_round_trips_priority_chains(self, tmp_path):
        sh = FrontierShard(
            0, 1, pending_mem_limit=5,
            priority_patterns=(r"\.html",),
        )
        urls = self.mixed_urls(24)
        sh.add_candidates([self.cand(1, i, u) for i, u in enumerate(urls)])
        sh.finalize_wave(1, -1, 0, max_wave_entries=4)  # leaves spilled chains
        snap = str(tmp_path / "shard_0000.pkl")
        sh.snapshot(snap, 1)
        sh2 = FrontierShard(
            0, 1, pending_mem_limit=5, priority_patterns=(r"\.html",)
        )
        sh2.restore(snap)
        assert sh2.pending_count() == sh.pending_count()
        # identical continuation from the snapshot
        seen = [r[0] for r in sh2.released_entries()]
        wave = 2
        while sh2.finalize_wave(wave, -1, 0, max_wave_entries=4):
            seen.extend(r[0] for r in sh2.released_entries())
            sh2.ack_wave()
            wave += 1
        assert sorted(seen) == sorted(urls)
        html_last = max(i for i, u in enumerate(seen) if u.endswith(".html"))
        other_first = min(i for i, u in enumerate(seen) if not u.endswith(".html"))
        assert html_last < other_first

    def test_restore_rejects_mismatched_level_count(self, tmp_path):
        sh = FrontierShard(0, 1, priority_patterns=(r"\.html",))
        sh.seed([("http://h.test/a.html", "h.test")])
        snap = str(tmp_path / "shard_0000.pkl")
        sh.snapshot(snap, 0)
        import pytest

        sh2 = FrontierShard(0, 1)  # 1 level vs snapshot's 2
        with pytest.raises(ValueError, match="priority levels"):
            sh2.restore(snap)

    def test_restore_rejects_same_count_different_patterns(self, tmp_path):
        """Equal level COUNT with different regexes must still be
        rejected: pending entries were bucketed by the snapshot-time
        patterns, so accepting would silently invert precedence."""
        sh = FrontierShard(0, 1, priority_patterns=(r"\.css",))
        sh.seed([("http://h.test/a.css", "h.test")])
        snap = str(tmp_path / "shard_0000.pkl")
        sh.snapshot(snap, 0)
        import pytest

        sh2 = FrontierShard(0, 1, priority_patterns=(r"\.html",))
        sh2.seed([("http://other.test/x.html", "other.test")])
        before = (sh2.pending_count(), sh2.seen_count(), sh2.get_counters())
        with pytest.raises(ValueError, match="priority_patterns"):
            sh2.restore(snap)
        # a rejected resume must leave the shard exactly as it was
        assert (sh2.pending_count(), sh2.seen_count(), sh2.get_counters()) == before
        # identical patterns still round-trip
        sh3 = FrontierShard(0, 1, priority_patterns=(r"\.css",))
        assert sh3.restore(snap) == 0
