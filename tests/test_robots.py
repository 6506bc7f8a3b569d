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
