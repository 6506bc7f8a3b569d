"""robots.txt parsing + crawl integration (north_rule component;
opt-in, default off for reference parity)."""

import pytest

from suckit_ray.config import CrawlConfig
from suckit_ray.pipelines.crawl import crawl
from suckit_ray.robots import ALLOW_ALL, parse_robots
from suckit_ray.sources.pagestore import PageRecord, TablePageStore

ROBOTS = """
# comment
User-agent: evilbot
Disallow: /

User-agent: *
Disallow: /private/
Disallow: /tmp
Allow: /private/ok.html
"""


class TestParse:
    def test_wildcard_group(self):
        r = parse_robots(ROBOTS, "suckit")
        assert r.allows("/index.html")
        assert not r.allows("/private/secret.html")
        assert not r.allows("/tmp")
        assert not r.allows("/tmpfile")  # prefix semantics
        assert r.allows("/private/ok.html")  # Allow longest-match wins

    def test_specific_agent_beats_wildcard(self):
        r = parse_robots(ROBOTS, "evilbot/1.0")
        assert not r.allows("/anything")

    def test_empty_disallow_allows_all(self):
        r = parse_robots("User-agent: *\nDisallow:\n", "suckit")
        assert r.allows("/x")

    def test_allow_all_default(self):
        assert ALLOW_ALL.allows("/anything")


def _store(robots_body=ROBOTS.encode()):
    recs = [
        PageRecord(
            "http://site.test/",
            b'<a href="public.html">p</a><a href="private/secret.html">s</a>'
            b'<a href="private/ok.html">ok</a>',
            "text/html",
        ),
        PageRecord("http://site.test/public.html", b"pub", "text/html"),
        PageRecord("http://site.test/private/secret.html", b"sec", "text/html"),
        PageRecord("http://site.test/private/ok.html", b"ok", "text/html"),
    ]
    if robots_body is not None:
        recs.append(PageRecord("http://site.test/robots.txt", robots_body, "text/plain"))
    return TablePageStore.from_records(recs)


@pytest.mark.usefixtures("ray_session")
class TestCrawlIntegration:
    def test_respect_robots_filters_candidates(self):
        res = crawl(
            CrawlConfig(origin="http://site.test/", respect_robots=True),
            _store(),
            num_shards=1,
        )
        ids = set(res.docs.column("doc_id").to_pylist())
        assert "site.test//public.html" in ids
        assert "site.test/private/ok.html" in ids
        assert "site.test/private/secret.html" not in ids

    def test_default_ignores_robots_like_reference(self):
        res = crawl(
            CrawlConfig(origin="http://site.test/"), _store(), num_shards=1
        )
        ids = set(res.docs.column("doc_id").to_pylist())
        assert "site.test/private/secret.html" in ids

    def test_missing_robots_allows_all(self):
        res = crawl(
            CrawlConfig(origin="http://site.test/", respect_robots=True),
            _store(robots_body=None),
            num_shards=1,
        )
        ids = set(res.docs.column("doc_id").to_pylist())
        assert "site.test/private/secret.html" in ids


class TestRobotsFetchHardening:
    """Round-3 review fixes: robots.txt redirects are followed (the
    http→https hop is near-universal; a cached ALLOW_ALL on the 301
    made respect_robots a silent no-op on such hosts), and the cache
    keys on authority INCLUDING the port."""

    def test_redirecting_robots_is_followed(self):
        from suckit_ray.robots import RobotsCache

        recs = [
            PageRecord(
                "http://site.test/robots.txt", b"", None,
                location="https://site.test/robots.txt", status=301,
            ),
            PageRecord(
                "https://site.test/robots.txt",
                b"User-agent: *\nDisallow: /private/\n", "text/plain",
            ),
        ]
        cache = RobotsCache(TablePageStore.from_records(recs))
        assert not cache.allows("http://site.test/private/x.html")
        assert cache.allows("http://site.test/public.html")

    def test_port_is_part_of_the_robots_identity(self):
        from suckit_ray.robots import RobotsCache

        recs = [
            PageRecord(
                "http://site.test:8080/robots.txt",
                b"User-agent: *\nDisallow: /\n", "text/plain",
            ),
            # port 80 robots allows everything
            PageRecord(
                "http://site.test/robots.txt",
                b"User-agent: *\nDisallow:\n", "text/plain",
            ),
        ]
        cache = RobotsCache(TablePageStore.from_records(recs))
        assert not cache.allows("http://site.test:8080/x.html")
        assert cache.allows("http://site.test/x.html")


ROBOTS_DELAY = """
User-agent: evilbot
Crawl-delay: 30

User-agent: *
Crawl-delay: 0.2
Disallow: /private/secret.html
"""


class TestCrawlDelayParse:
    def test_delay_from_wildcard_group(self):
        r = parse_robots(ROBOTS_DELAY, "suckit")
        assert r.crawl_delay == 0.2

    def test_delay_specific_group_wins(self):
        r = parse_robots(ROBOTS_DELAY, "evilbot/2.0")
        assert r.crawl_delay == 30.0

    def test_absent_delay_is_none(self):
        assert parse_robots(ROBOTS, "suckit").crawl_delay is None
        assert ALLOW_ALL.crawl_delay is None

    def test_malformed_delay_ignored(self):
        r = parse_robots("User-agent: *\nCrawl-delay: soon\n", "suckit")
        assert r.crawl_delay is None
        r = parse_robots("User-agent: *\nCrawl-delay: -3\n", "suckit")
        assert r.crawl_delay is None

    def test_delay_starts_a_new_group_like_a_rule(self):
        # a User-agent line AFTER a crawl-delay begins a NEW group
        txt = "User-agent: a\nCrawl-delay: 5\nUser-agent: b\nDisallow: /x\n"
        assert parse_robots(txt, "a").crawl_delay == 5.0
        assert parse_robots(txt, "b").crawl_delay is None
        assert parse_robots(txt, "b").allows("/y")
        assert not parse_robots(txt, "b").allows("/x")


class TestCrawlDelayGating:
    """Deterministic shard-level gating with an injected clock."""

    def _shard(self):
        from suckit_ray.state.frontier import FrontierShard

        sh = FrontierShard(0, 1)
        self.t = [0.0]
        sh._clock = lambda: self.t[0]
        return sh

    def _cands(self, host, urls):
        return [
            (1, i, f"http://{host}/{u}", host, False, 0, 0)
            for i, u in enumerate(urls)
        ]

    def test_delayed_host_releases_one_per_drain_and_spaces(self):
        sh = self._shard()
        sh.add_host_delays({"a.test": 1000})
        sh.add_candidates(self._cands("a.test", ["1", "2", "3"]))
        sh.add_candidates(self._cands("b.test", ["1", "2"]))
        # t=0: host a releases ONE entry (deadline set), b releases all
        n = sh.finalize_wave(1, -1, 0)
        assert n == 3  # a/1 + b/1 + b/2
        # t=0.5: a still blocked
        self.t[0] = 0.5
        assert sh.finalize_wave(2, -1, 0) == 0
        pend, wait = sh.delay_block_info()
        assert pend == 2 and wait == pytest.approx(0.5, abs=1e-6)
        # t=1.01: next entry releases, deadline advances
        self.t[0] = 1.01
        assert sh.finalize_wave(3, -1, 0) == 1
        self.t[0] = 2.02
        assert sh.finalize_wave(4, -1, 0) == 1
        assert sh.pending_count() == 0

    def test_max_merge_and_snapshot_roundtrip(self, tmp_path):
        from suckit_ray.state.frontier import FrontierShard

        sh = self._shard()
        sh.add_host_delays({"a.test": 500})
        sh.add_host_delays({"a.test": 300})  # max-merge keeps 500
        assert sh.host_delay_ms["a.test"] == 500
        p = str(tmp_path / "snap.pkl")
        sh.snapshot(p, wave=1)
        sh2 = FrontierShard(0, 1)
        sh2.restore(p)
        assert sh2.host_delay_ms == {"a.test": 500}
        assert sh2.host_next_allowed == {}  # deadlines reset on resume


@pytest.mark.usefixtures("ray_session")
class TestCrawlDelayE2E:
    def test_crawl_completes_and_spaces_delayed_host(self):
        import time as _time

        store = _store(robots_body=ROBOTS_DELAY.encode())
        t0 = _time.perf_counter()
        res = crawl(
            CrawlConfig(origin="http://site.test/", respect_robots=True),
            store,
            num_shards=1,
        )
        wall = _time.perf_counter() - t0
        ids = set(res.docs.column("doc_id").to_pylist())
        # same SET as a robots run without the delay directive (minus
        # the disallowed page), just spaced out
        assert "site.test//public.html" in ids
        assert "site.test/private/ok.html" in ids
        assert "site.test/private/secret.html" not in ids
        # two discovered same-host pages at 0.2 s spacing: the second
        # waits for the first's deadline
        assert wall >= 0.2


class TestCrawlDelayClamp:
    def test_inf_and_huge_values_clamped(self):
        from suckit_ray.robots import CRAWL_DELAY_CAP_S

        assert (
            parse_robots("User-agent: *\nCrawl-delay: inf\n", "s").crawl_delay
            == CRAWL_DELAY_CAP_S
        )
        assert (
            parse_robots("User-agent: *\nCrawl-delay: 1e9\n", "s").crawl_delay
            == CRAWL_DELAY_CAP_S
        )
        assert parse_robots(
            "User-agent: *\nCrawl-delay: nan\n", "s"
        ).crawl_delay is None
        assert (
            parse_robots("User-agent: *\nCrawl-delay: 2.5\n", "s").crawl_delay
            == 2.5
        )


class TestHostBreakerShard:
    """Deterministic shard-level breaker semantics."""

    def test_trips_after_budget_and_drops_pending(self):
        """Wave-folded counting: a window (between take calls) with
        failures and NO success counts one step; ANY success in the
        window resets — deterministic regardless of how parallel
        ledger batches interleaved within the window."""
        from suckit_ray.state.frontier import FrontierShard

        sh = FrontierShard(0, 1, host_error_budget=2)
        row = lambda u, st: (u, f"bad.test/{u[-1]}", st, 1, True, False, 0, None)
        sh.add_ledger([row("http://bad.test/1", 0)])
        assert sh.take_opened_breakers() == []  # consec 1 < 2
        # a success ANYWHERE in the window resets, even alongside a
        # failure (arrival order within the window is irrelevant)
        sh.add_ledger([row("http://bad.test/2", 200)])
        sh.add_ledger([row("http://bad.test/3", 0)])
        assert sh.take_opened_breakers() == []  # reset → consec 0
        sh.add_ledger([row("http://bad.test/4", 0)])
        assert sh.take_opened_breakers() == []  # consec 1
        sh.add_ledger([row("http://bad.test/5", 0)])
        assert sh.take_opened_breakers() == ["bad.test"]  # consec 2: trip
        assert sh.take_opened_breakers() == []  # drained once
        sh.open_breakers(["bad.test"])
        sh.add_candidates(
            [
                (1, 0, "http://bad.test/x.html", "bad.test", False, 0, 0),
                (1, 1, "http://ok.test/y.html", "ok.test", False, 0, 0),
            ]
        )
        n = sh.finalize_wave(1, -1, 0)
        assert n == 1  # only the healthy host released
        assert sh.get_counters()["breaker_dropped"] == 1


@pytest.mark.usefixtures("ray_session")
class TestHostBreakerE2E:
    def test_dead_host_stops_after_budget(self):
        from suckit_ray.sources.pagestore import DeadHostPageStore

        base = _store(robots_body=None)
        recs = [
            PageRecord(
                "http://site.test/",
                b'<a href="http://down.test/a.html">a</a>'
                b'<a href="http://down.test/b.html">b</a>'
                b'<a href="http://down.test/c.html">c</a>'
                b'<a href="http://down.test/d.html">d</a>'
                b'<a href="public.html">p</a>',
                "text/html",
            ),
            PageRecord("http://site.test/public.html", b"pub", "text/html"),
        ]
        from suckit_ray.sources.pagestore import TablePageStore

        store = DeadHostPageStore(
            TablePageStore.from_records(recs), dead_hosts=("down.test",)
        )
        res = crawl(
            CrawlConfig(
                origin="http://site.test/",
                ext_depth=1,
                tries=1,
                continue_on_error=True,
                random_range=0.001,  # politeness on: 1 host-fetch/wave
                host_error_budget=2,
            ),
            store,
            num_shards=2,
        )
        bad_rows = [
            u
            for u in res.ledger.column("url").to_pylist()
            if u.startswith("http://down.test/")
        ]
        # budget=2 with 1 fetch/host/wave: exactly 2 attempts, the
        # remaining 2 frontier entries dropped by the breaker
        assert len(bad_rows) == 2
        assert res.metrics.get("breaker_dropped", 0) == 2
        # the healthy site is fully mirrored
        ids = set(res.docs.column("doc_id").to_pylist())
        assert "site.test//public.html" in ids


class TestWildcardRules:
    """REP wildcard extension (* and $) — Google's documented
    examples; plain-prefix rules keep the original fast path."""

    def test_star_and_anchor(self):
        r = parse_robots(
            "User-agent: *\nDisallow: /*.pdf$\nDisallow: /private*/x\n", "s"
        )
        assert not r.allows("/docs/report.pdf")
        assert r.allows("/docs/report.pdf?download=1")  # $ anchors END
        assert r.allows("/docs/report.pdfx")
        assert not r.allows("/private123/x")
        assert r.allows("/private123/y")

    def test_allow_wildcard_beats_shorter_disallow(self):
        r = parse_robots(
            "User-agent: *\nDisallow: /p\nAllow: /p*.html$\n", "s"
        )
        assert not r.allows("/page")
        assert r.allows("/page.html")  # longer Allow pattern wins

    def test_fishing_star_mid_pattern(self):
        r = parse_robots("User-agent: *\nDisallow: /fish*.php\n", "s")
        assert not r.allows("/fishheads/catfish.php?parameters")
        assert r.allows("/fish.html")

    def test_regex_metachars_in_rule_are_literal(self):
        r = parse_robots("User-agent: *\nDisallow: /a+b(c)\n", "s")
        assert not r.allows("/a+b(c)/d")
        assert r.allows("/aab(c)")


@pytest.mark.usefixtures("ray_session")
class TestHostUrlBudget:
    def test_trap_host_capped(self):
        """A 'trap' host generating endless pages is cut off at the
        budget (wave-synchronously) while the healthy site completes."""
        from suckit_ray.sources.pagestore import PageRecord, TablePageStore

        # trap.test: a chain where every page links to the next two —
        # without the budget the crawl fetches all 40
        recs = [
            PageRecord(
                "http://site.test/",
                b'<a href="http://trap.test/p0.html">t</a>'
                b'<a href="ok.html">ok</a>',
                "text/html",
            ),
            PageRecord("http://site.test/ok.html", b"OK", "text/html"),
        ]
        for i in range(40):
            recs.append(
                PageRecord(
                    f"http://trap.test/p{i}.html",
                    (
                        f'<a href="p{2 * i + 1}.html">a</a>'
                        f'<a href="p{2 * i + 2}.html">b</a>'
                    ).encode()
                    if 2 * i + 2 < 40
                    else b"leaf",
                    "text/html",
                )
            )
        store = TablePageStore.from_records(recs)
        res = crawl(
            CrawlConfig(
                origin="http://site.test/",
                ext_depth=-1,
                host_url_budget=6,
            ),
            store,
            num_shards=2,
        )
        trap_fetched = [
            u
            for u in res.ledger.column("url").to_pylist()
            if u.startswith("http://trap.test/")
        ]
        # wave-synchronous: the budget trips at a wave boundary, so a
        # small overshoot within the tripping wave is allowed — but the
        # 40-page trap must NOT be exhausted
        assert 0 < len(trap_fetched) < 20
        assert res.metrics.get("breaker_dropped", 0) > 0
        ids = set(res.docs.column("doc_id").to_pylist())
        assert "site.test//ok.html" in ids  # healthy site unaffected
