"""End-to-end crawl scenarios, re-expressing the reference's
integration suites table-natively (FIXTURES.md §5):

- filters.rs   → crawl-set equality per visit/download filter config
- external.rs  → depth/ext_depth budgets
- auth.rs      → basic-auth 401 behavior
- charset_*.rs → golden byte round-trips of the mirrored origin page

File-count assertions become row counts over the documents table;
byte-equality checks compare the ``body`` column; "never visited"
checks query the fetch ledger.
"""

import pytest

from suckit_ray.config import CrawlConfig
from suckit_ray.pipelines.crawl import crawl
from suckit_ray.sources.pagestore import (
    FIXTURE_W1252_BYTES,
    FIXTURE_W1252_NO_META_BYTES,
    fixture_pages,
)

ORIGIN = "http://site.test/"

ALL_DOCS = {
    "site.test/index.html",
    "site.test//jpeg.jpg",
    "site.test//mp3.mp3",
    "site.test//file.txt",
    "site.test//no_download_no_visit.html",
    "site.test//should_not_get_visited.html",
}


def run(config, store=None, **kw):
    return crawl(config, store or fixture_pages(), num_shards=2, **kw)


def saved_ids(res):
    return set(res.downloaded_docs().column("doc_id").to_pylist())


def visited_urls(res):
    return set(res.ledger.column("url").to_pylist())


@pytest.mark.usefixtures("ray_session")
class TestFilters:
    def test_default_crawls_everything(self):
        res = run(CrawlConfig(origin=ORIGIN))
        assert saved_ids(res) == ALL_DOCS
        assert res.metrics["depth_gated"] == 1  # google.com at ext_depth=0

    def test_visit_filter_is_download_filter(self):
        # tests/filters.rs:16-46
        res = run(
            CrawlConfig(
                origin=ORIGIN,
                exclude_download="no_download_no_visit.html",
                visit_filter_is_download_filter=True,
            )
        )
        assert "http://site.test/no_download_no_visit.html" not in visited_urls(res)
        assert "http://site.test/should_not_get_visited.html" not in visited_urls(res)
        assert saved_ids(res) == {
            "site.test/index.html",
            "site.test//jpeg.jpg",
            "site.test//mp3.mp3",
            "site.test//file.txt",
        }

    def test_include_visit_single(self):
        # tests/filters.rs:50-73 — seed bypasses link filters
        res = run(CrawlConfig(origin=ORIGIN, include_visit="mp[3-4]"))
        assert saved_ids(res) == {"site.test/index.html", "site.test//mp3.mp3"}

    def test_include_visit_multi(self):
        # tests/filters.rs:77-100
        res = run(CrawlConfig(origin=ORIGIN, include_visit="(mp[3-4])|(txt)"))
        assert saved_ids(res) == {
            "site.test/index.html",
            "site.test//mp3.mp3",
            "site.test//file.txt",
        }

    def test_exclude_visit(self):
        # tests/filters.rs:104-124
        res = run(CrawlConfig(origin=ORIGIN, exclude_visit="jpe?g"))
        assert saved_ids(res) == ALL_DOCS - {"site.test//jpeg.jpg"}

    def test_include_download_single(self):
        # tests/filters.rs:128-153 — everything visited, only mp3 saved
        res = run(CrawlConfig(origin=ORIGIN, include_download="mp[3-4]"))
        assert saved_ids(res) == {"site.test//mp3.mp3"}
        assert len(visited_urls(res)) == 6  # fetched regardless (M15)

    def test_include_download_multi(self):
        # tests/filters.rs:157-178
        res = run(CrawlConfig(origin=ORIGIN, include_download="(mp[3-4])|(txt)"))
        assert saved_ids(res) == {"site.test//mp3.mp3", "site.test//file.txt"}

    def test_exclude_download(self):
        # tests/filters.rs:182-202
        res = run(CrawlConfig(origin=ORIGIN, exclude_download="jpe?g"))
        assert saved_ids(res) == ALL_DOCS - {"site.test//jpeg.jpg"}
        assert len(visited_urls(res)) == 6


@pytest.mark.usefixtures("ray_session")
class TestExternal:
    def test_ext_depth_one(self):
        # tests/external.rs:16-39: -d 0 --ext-depth 1
        res = run(CrawlConfig(origin=ORIGIN, depth=0, ext_depth=1))
        assert saved_ids(res) == {"site.test/index.html", "google.com/index.html"}

    def test_ext_depth_zero(self):
        # tests/external.rs:42-62
        res = run(CrawlConfig(origin=ORIGIN, depth=0, ext_depth=0))
        assert saved_ids(res) == {"site.test/index.html"}


@pytest.mark.usefixtures("ray_session")
class TestAuth:
    def test_wrong_host_only_401_body_saved(self):
        # tests/auth.rs:14-40: creds bound to another host → 401 page only
        res = run(
            CrawlConfig(origin=ORIGIN, auth=("username", "password", "example.com")),
            store=fixture_pages(requires_auth=True),
        )
        docs = res.downloaded_docs()
        assert docs.num_rows == 1
        assert docs.column("status").to_pylist() == [401]
        assert docs.column("body").to_pylist()[0] == b"Invalid auth"

    def test_valid_creds_full_mirror(self):
        # tests/auth.rs:44-64: host defaults to origin
        res = run(
            CrawlConfig(origin=ORIGIN, auth=("username", "password")),
            store=fixture_pages(requires_auth=True),
        )
        assert saved_ids(res) == ALL_DOCS


@pytest.mark.usefixtures("ray_session")
class TestCharset:
    def origin_body(self, res):
        docs = res.downloaded_docs()
        idx = docs.column("doc_id").to_pylist().index("site.test/index.html")
        return docs.column("body").to_pylist()[idx]

    def test_meta_charset_round_trip(self):
        # tests/charset_html_found.rs — byte-identical mirror
        res = run(
            CrawlConfig(origin=ORIGIN), store=fixture_pages(page="charset_meta")
        )
        assert self.origin_body(res) == FIXTURE_W1252_BYTES

    def test_http_charset_round_trip(self):
        # tests/charset_http_found.rs — injected Content-Type header
        res = run(
            CrawlConfig(origin=ORIGIN),
            store=fixture_pages(
                page="charset_no_meta",
                extra_headers_content_type="charset=windows-1252",
            ),
        )
        assert self.origin_body(res) == FIXTURE_W1252_NO_META_BYTES

    def test_no_charset_info_bytes_differ(self):
        # tests/charset_{html,http}_not_found.rs — U+FFFD replacement
        res = run(
            CrawlConfig(origin=ORIGIN), store=fixture_pages(page="charset_no_meta")
        )
        assert self.origin_body(res) != FIXTURE_W1252_NO_META_BYTES


@pytest.mark.usefixtures("ray_session")
class TestDryRun:
    def test_dry_run_crawls_but_keeps_nothing(self):
        res = run(CrawlConfig(origin=ORIGIN, dry_run=True), collect=False)
        assert res.docs is None
        assert len(visited_urls(res)) == 6  # still crawled (S6)


@pytest.mark.usefixtures("ray_session")
class TestSpans:
    def test_origin_span_sequence(self):
        res = run(CrawlConfig(origin=ORIGIN))
        docs = res.downloaded_docs()
        ids = docs.column("doc_id").to_pylist()
        spans = docs.column("spans").to_pylist()[ids.index("site.test/index.html")]
        kinds = [s["kind"] for s in spans]
        assert kinds == ["text", "link"] * 5 + ["text"]
        assert [s["offset"] for s in spans] == list(range(11))
        assert [s["media_ref"] for s in spans if s["kind"] == "link"] == [
            "jpeg.jpg",
            "mp3.mp3",
            "file.txt",
            "../google.com/index.html",
            "no_download_no_visit.html",
        ]
        # asset rows carry a single media span
        jp = docs.column("spans").to_pylist()[ids.index("site.test//jpeg.jpg")]
        assert jp == [
            {"kind": "media", "text": "", "media_ref": "site.test//jpeg.jpg", "offset": 0}
        ]


@pytest.mark.usefixtures("ray_session")
class TestWaveCap:
    def test_max_wave_entries_preserves_crawl_set(self):
        """VERDICT r2 item 2: bounding the per-wave release (sub-wave
        drains) must not change the crawled set — only how it is sliced
        into waves — and every wave stays under the cap."""
        from suckit_ray.sources.pagestore import SyntheticCorpus, SyntheticPageStore

        corpus = SyntheticCorpus(n_hosts=2, n_docs=60, fanout=4, n_assets_per_host=4)
        store = SyntheticPageStore(corpus)
        cfg = CrawlConfig(origin=corpus.page_url(0, 0))
        full = crawl(cfg, store, seeds=corpus.seeds(), num_shards=2)
        capped = crawl(
            cfg, store, seeds=corpus.seeds(), num_shards=2,
            max_wave_entries=8, pending_mem_limit=5,
        )
        assert set(capped.ledger.column("url").to_pylist()) == set(
            full.ledger.column("url").to_pylist()
        )
        assert set(capped.docs.column("doc_id").to_pylist()) == set(
            full.docs.column("doc_id").to_pylist()
        )
        waves = capped.metrics["wave_stats"]
        assert len(waves) > len(full.metrics["wave_stats"])  # sub-waves happened
        assert all(w["entries"] <= 8 for w in waves)


@pytest.mark.usefixtures("ray_session")
class TestMaxPageBytes:
    def test_oversized_page_soft_skipped(self):
        from suckit_ray.sources.pagestore import PageRecord, TablePageStore

        recs = [
            PageRecord(
                "http://site.test/",
                b'<a href="big.html">b</a><a href="small.html">s</a>',
                "text/html",
            ),
            PageRecord(
                "http://site.test/big.html",
                b'<a href="hidden.html">h</a>' + b"x" * 5000,
                "text/html",
            ),
            PageRecord("http://site.test/small.html", b"ok", "text/html"),
            PageRecord("http://site.test/hidden.html", b"no", "text/html"),
        ]
        res = crawl(
            CrawlConfig(origin="http://site.test/", max_page_bytes=1000),
            TablePageStore.from_records(recs),
            num_shards=1,
        )
        led = {
            u: e
            for u, e in zip(
                res.ledger.column("url").to_pylist(),
                res.ledger.column("error").to_pylist(),
            )
        }
        assert "max_page_bytes" in (led["http://site.test/big.html"] or "")
        # oversized page: fetched but not stored, links NOT followed
        assert "http://site.test/hidden.html" not in led
        docs = {
            d: dl
            for d, dl in zip(
                res.docs.column("doc_id").to_pylist(),
                res.docs.column("downloaded").to_pylist(),
            )
        }
        assert docs["site.test//big.html"] is False  # error row, no body
        assert docs["site.test//small.html"] is True


@pytest.mark.usefixtures("ray_session")
class TestCanonicalize:
    def _site(self):
        from suckit_ray.sources.pagestore import PageRecord, TablePageStore

        return TablePageStore.from_records(
            [
                PageRecord(
                    "http://site.test/",
                    b'<a href="p.html?b=2&a=1">one</a>'
                    b'<a href="p.html?a=1&b=2&utm_source=mail">two</a>'
                    b'<a href="p.html?a=1&b=2#frag">three</a>',
                    "text/html",
                ),
                PageRecord("http://site.test/p.html?b=2&a=1", b"P", "text/html"),
                PageRecord("http://site.test/p.html?a=1&b=2", b"P", "text/html"),
                PageRecord(
                    "http://site.test/p.html?a=1&b=2&utm_source=mail",
                    b"P",
                    "text/html",
                ),
            ]
        )

    def test_variants_fetch_once_when_on(self):
        res = crawl(
            CrawlConfig(origin="http://site.test/", canonicalize_urls=True),
            self._site(),
            num_shards=2,
        )
        fetched = [
            u
            for u in res.ledger.column("url").to_pylist()
            if "p.html" in u
        ]
        assert len(fetched) == 1  # ONE fetch for the three variants
        assert fetched[0] == "http://site.test/p.html?b=2&a=1"  # first wins

    def test_parity_mode_fetches_variants(self):
        res = crawl(
            CrawlConfig(origin="http://site.test/"), self._site(), num_shards=2
        )
        fetched = {
            u
            for u in res.ledger.column("url").to_pylist()
            if "p.html" in u
        }
        assert len(fetched) == 3  # reference parity: raw-string dedup


def test_canonical_url_vectors():
    from suckit_ray.urlkit import canonical_url

    assert (
        canonical_url("HTTP://Site.Test:80/a?b=2&a=1&utm_source=x#f")
        == "http://site.test/a?a=1&b=2"
    )
    assert canonical_url("http://s.test/p?utm_source=x&gclid=1") == "http://s.test/p"
    assert canonical_url("http://s.test/p?") == "http://s.test/p"
    assert canonical_url("not a url") == "not a url"
    # non-tracking params survive, sorted, values intact
    assert (
        canonical_url("http://s.test/p?z=9&a=1&a=0")
        == "http://s.test/p?a=0&a=1&z=9"
    )
