"""Sitemap seeding (rebuild-only, opt-in via use_sitemaps): robots
Sitemap: directives, urlset/sitemapindex recursion, gzip + plain-text
payloads, internal-only filtering, and the e2e unlinked-page reach."""

import gzip

import pytest

from suckit_ray.config import CrawlConfig
from suckit_ray.pipelines.crawl import crawl
from suckit_ray.sitemap import (
    gather_sitemap_seeds,
    parse_robots_sitemaps,
    parse_sitemap,
)
from suckit_ray.sources.pagestore import PageRecord, TablePageStore

URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://site.test/a.html</loc><lastmod>2024-01-01</lastmod></url>
  <url><loc> http://site.test/b.html?x=1&amp;y=2 </loc></url>
  <url><loc>http://other.test/evil.html</loc></url>
</urlset>
"""

INDEX = b"""<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://site.test/sm1.xml</loc></sitemap>
  <sitemap><loc>http://site.test/sm2.xml</loc></sitemap>
</sitemapindex>
"""


class TestParse:
    def test_urlset_locs_unescaped_and_trimmed(self):
        pages, children = parse_sitemap(URLSET)
        assert pages == [
            "http://site.test/a.html",
            "http://site.test/b.html?x=1&y=2",
            "http://other.test/evil.html",
        ]
        assert children == []

    def test_index_yields_children(self):
        pages, children = parse_sitemap(INDEX)
        assert pages == []
        assert children == [
            "http://site.test/sm1.xml",
            "http://site.test/sm2.xml",
        ]

    def test_gzip_sniffed(self):
        pages, _ = parse_sitemap(gzip.compress(URLSET))
        assert "http://site.test/a.html" in pages

    def test_plain_text_sitemap(self):
        body = b"http://site.test/x.html\nnot-a-url\nhttp://site.test/y.html\n"
        pages, children = parse_sitemap(body)
        assert pages == ["http://site.test/x.html", "http://site.test/y.html"]
        assert children == []

    def test_robots_directives_global(self):
        txt = (
            "User-agent: *\nDisallow: /x\n"
            "Sitemap: http://site.test/sm.xml\n"
            "User-agent: a\nSitemap: http://site.test/sm2.xml # c\n"
        )
        assert parse_robots_sitemaps(txt) == [
            "http://site.test/sm.xml",
            "http://site.test/sm2.xml",
        ]


def _store(records):
    return TablePageStore.from_records(records)


class TestGather:
    def test_robots_directive_else_convention(self):
        st = _store(
            [
                PageRecord(
                    "http://site.test/robots.txt",
                    b"Sitemap: http://site.test/special.xml\n",
                    "text/plain",
                ),
                PageRecord("http://site.test/special.xml", URLSET, "text/xml"),
            ]
        )
        seeds = gather_sitemap_seeds(st, "http://site.test/")
        # cross-domain entry dropped; same-domain kept in order
        assert seeds == [
            "http://site.test/a.html",
            "http://site.test/b.html?x=1&y=2",
        ]

    def test_conventional_path_and_index_recursion(self):
        st = _store(
            [
                PageRecord("http://site.test/sitemap.xml", INDEX, "text/xml"),
                PageRecord(
                    "http://site.test/sm1.xml",
                    b"<urlset><url><loc>http://site.test/p1.html</loc></url></urlset>",
                    "text/xml",
                ),
                PageRecord(
                    "http://site.test/sm2.xml",
                    b"<urlset><url><loc>http://site.test/p2.html</loc></url></urlset>",
                    "text/xml",
                ),
            ]
        )
        seeds = gather_sitemap_seeds(st, "http://site.test/")
        assert seeds == [
            "http://site.test/p1.html",
            "http://site.test/p2.html",
        ]

    def test_missing_sitemap_is_empty_not_error(self):
        st = _store([PageRecord("http://site.test/", b"x", "text/html")])
        assert gather_sitemap_seeds(st, "http://site.test/") == []


@pytest.mark.usefixtures("ray_session")
class TestCrawlIntegration:
    def _site(self):
        return _store(
            [
                PageRecord(
                    "http://site.test/",
                    b'<a href="linked.html">l</a>',
                    "text/html",
                ),
                PageRecord("http://site.test/linked.html", b"l", "text/html"),
                PageRecord("http://site.test/island.html", b"i", "text/html"),
                PageRecord(
                    "http://site.test/sitemap.xml",
                    b"<urlset><url><loc>http://site.test/island.html</loc>"
                    b"</url></urlset>",
                    "text/xml",
                ),
            ]
        )

    def test_sitemap_reaches_unlinked_island(self):
        res = crawl(
            CrawlConfig(origin="http://site.test/", use_sitemaps=True),
            self._site(),
            num_shards=1,
        )
        ids = set(res.docs.column("doc_id").to_pylist())
        assert "site.test//island.html" in ids
        assert "site.test//linked.html" in ids

    def test_default_off_misses_island(self):
        res = crawl(
            CrawlConfig(origin="http://site.test/"), self._site(), num_shards=1
        )
        ids = set(res.docs.column("doc_id").to_pylist())
        assert "site.test//island.html" not in ids
        assert "site.test//linked.html" in ids


class TestRedirects:
    def test_redirecting_sitemap_followed(self):
        # http→https hop on both robots.txt and the sitemap itself
        st = _store(
            [
                PageRecord(
                    "http://site.test/sitemap.xml", b"", None,
                    location="https://site.test/sitemap.xml", status=301,
                ),
                PageRecord(
                    "https://site.test/sitemap.xml",
                    b"<urlset><url><loc>http://site.test/p.html</loc></url></urlset>",
                    "text/xml",
                ),
            ]
        )
        assert gather_sitemap_seeds(st, "http://site.test/") == [
            "http://site.test/p.html"
        ]
