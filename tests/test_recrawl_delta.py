"""Delta recrawl: body-fingerprint recording (hashes_parts), prior-
hash attachment at frontier release, unchanged-page skip, and new-page
discovery through changed pages only."""

import pyarrow.parquet as pq
import pytest

from suckit_ray.config import CrawlConfig
from suckit_ray.pipelines.crawl import crawl
from suckit_ray.sources.pagestore import PageRecord, TablePageStore


def _v1():
    return TablePageStore.from_records(
        [
            PageRecord(
                "http://site.test/",
                b'<a href="a.html">a</a><a href="b.html">b</a>',
                "text/html",
            ),
            PageRecord("http://site.test/a.html", b"version one", "text/html"),
            PageRecord("http://site.test/b.html", b"stable", "text/html"),
        ]
    )


def _v2():
    # a.html changed and now links to a NEW page; everything else same
    return TablePageStore.from_records(
        [
            PageRecord(
                "http://site.test/",
                b'<a href="a.html">a</a><a href="b.html">b</a>',
                "text/html",
            ),
            PageRecord(
                "http://site.test/a.html",
                b'version two <a href="new.html">n</a>',
                "text/html",
            ),
            PageRecord("http://site.test/b.html", b"stable", "text/html"),
            PageRecord("http://site.test/new.html", b"brand new", "text/html"),
        ]
    )


@pytest.mark.usefixtures("ray_session")
class TestDeltaRecrawl:
    def _first(self, tmp_path):
        out1 = str(tmp_path / "run1")
        res1 = crawl(
            CrawlConfig(origin="http://site.test/"),
            _v1(),
            num_shards=2,
            output_dir=out1,
            delta_hashes=True,
            collect=True,
        )
        return out1, res1

    def test_first_run_records_hashes(self, tmp_path):
        out1, res1 = self._first(tmp_path)
        parts = sorted((tmp_path / "run1" / "hashes_parts").glob("*.parquet"))
        assert len(parts) == 2
        rows = pq.read_table(str(parts[0])).num_rows + pq.read_table(
            str(parts[1])
        ).num_rows
        assert rows == res1.ledger.num_rows == 3

    def test_unchanged_rerun_yields_empty_delta(self, tmp_path):
        out1, _ = self._first(tmp_path)
        out2 = str(tmp_path / "run2")
        res2 = crawl(
            CrawlConfig(origin="http://site.test/"),
            _v1(),
            num_shards=2,
            output_dir=out2,
            recrawl_from=out1,
            collect=True,
        )
        # every page fetched (ledger), nothing re-emitted (docs delta)
        assert res2.ledger.num_rows == 3
        assert res2.docs.num_rows == 0
        # the fresh hashes still cover the full url set for the NEXT run
        rows = sum(
            pq.read_table(str(p)).num_rows
            for p in sorted((tmp_path / "run2" / "hashes_parts").glob("*.parquet"))
        )
        assert rows == 3

    def test_changed_page_and_new_discovery(self, tmp_path):
        out1, _ = self._first(tmp_path)
        out2 = str(tmp_path / "run2")
        res2 = crawl(
            CrawlConfig(origin="http://site.test/"),
            _v2(),
            num_shards=2,
            output_dir=out2,
            recrawl_from=out1,
            collect=True,
        )
        ids = set(res2.docs.column("doc_id").to_pylist())
        # delta = the changed page + the page it newly links to;
        # unchanged root and b.html are skipped
        assert ids == {"site.test//a.html", "site.test//new.html"}
        assert res2.ledger.num_rows == 4  # all fetched incl. the new page

    def test_different_shard_layout_falls_back(self, tmp_path):
        out1, _ = self._first(tmp_path)
        res2 = crawl(
            CrawlConfig(origin="http://site.test/"),
            _v2(),
            num_shards=3,  # != 2: every shard loads every part
            output_dir=str(tmp_path / "run2"),
            recrawl_from=out1,
            collect=True,
        )
        ids = set(res2.docs.column("doc_id").to_pylist())
        assert ids == {"site.test//a.html", "site.test//new.html"}


@pytest.mark.usefixtures("ray_session")
class TestDeltaDepthBudgets:
    """Recrawl seeds enter at their RECORDED depths: finite --depth /
    --ext-depth gate a recrawl exactly like a fresh crawl would."""

    def _chain(self, c_links_d=False):
        # root -> a -> b -> c ; with depth=2, c is gated in a fresh crawl
        recs = [
            PageRecord(
                "http://site.test/", b'<a href="a.html">a</a>', "text/html"
            ),
            PageRecord(
                "http://site.test/a.html", b'<a href="b.html">b</a>', "text/html"
            ),
            PageRecord(
                "http://site.test/b.html",
                b'stable v2 <a href="c.html">c</a>'
                if c_links_d
                else b'<a href="c.html">c</a>',
                "text/html",
            ),
            PageRecord("http://site.test/c.html", b"deep", "text/html"),
        ]
        return TablePageStore.from_records(recs)

    def test_recrawl_respects_finite_depth(self, tmp_path):
        out1 = str(tmp_path / "r1")
        res1 = crawl(
            CrawlConfig(origin="http://site.test/", depth=2),
            self._chain(),
            num_shards=2,
            output_dir=out1,
            delta_hashes=True,
            collect=True,
        )
        ids1 = set(res1.ledger.column("url").to_pylist())
        assert "http://site.test/c.html" not in ids1  # gated at depth 2
        # recrawl: b.html CHANGED and still links to c — a fresh crawl
        # of the same site still gates c at depth 2; the recrawl must
        # too (b re-enters at its recorded depth 2, not 0)
        res2 = crawl(
            CrawlConfig(origin="http://site.test/", depth=2),
            self._chain(c_links_d=True),
            num_shards=2,
            output_dir=str(tmp_path / "r2"),
            recrawl_from=out1,
            collect=True,
        )
        ids2 = set(res2.ledger.column("url").to_pylist())
        assert "http://site.test/c.html" not in ids2
        assert set(res2.docs.column("doc_id").to_pylist()) == {
            "site.test//b.html"
        }

    def test_delta_without_output_dir_raises(self):
        with pytest.raises(ValueError, match="output_dir"):
            crawl(
                CrawlConfig(origin="http://site.test/"),
                self._chain(),
                delta_hashes=True,
            )

    def test_politeness_toggle_keeps_skip_working(self, tmp_path):
        """Routing flip (url-hash -> host-hash) between runs: ownership
        is re-derived, so unchanged pages are still skipped."""
        out1 = str(tmp_path / "r1")
        crawl(
            CrawlConfig(origin="http://site.test/"),
            self._chain(),
            num_shards=2,
            output_dir=out1,
            delta_hashes=True,
            collect=True,
        )
        res2 = crawl(
            CrawlConfig(origin="http://site.test/", delay=0.01),  # politeness on
            self._chain(),
            num_shards=2,
            output_dir=str(tmp_path / "r2"),
            recrawl_from=out1,
            collect=True,
        )
        assert res2.docs.num_rows == 0  # every page detected unchanged


@pytest.mark.usefixtures("ray_session")
class TestCanonicalRecrawl:
    def test_canonicalize_recrawl_fetches_variants_once(self, tmp_path):
        """Canonical keys must govern BOTH the recrawl seed inserts
        and the hash-ownership routing, or a still-linked variant of
        an unchanged page re-fetches (review finding)."""
        recs = [
            PageRecord(
                "http://site.test/",
                b'<a href="p.html?b=2&a=1">one</a>'
                b'<a href="p.html?a=1&b=2&utm_source=mail">two</a>',
                "text/html",
            ),
            PageRecord("http://site.test/p.html?b=2&a=1", b"P", "text/html"),
            PageRecord(
                "http://site.test/p.html?a=1&b=2&utm_source=mail",
                b"P",
                "text/html",
            ),
        ]
        store = TablePageStore.from_records(recs)
        out1 = str(tmp_path / "r1")
        res1 = crawl(
            CrawlConfig(origin="http://site.test/", canonicalize_urls=True),
            store,
            num_shards=2,
            output_dir=out1,
            delta_hashes=True,
            collect=True,
        )
        assert res1.ledger.num_rows == 2  # root + ONE variant
        res2 = crawl(
            CrawlConfig(origin="http://site.test/", canonicalize_urls=True),
            store,
            num_shards=2,
            output_dir=str(tmp_path / "r2"),
            recrawl_from=out1,
            collect=True,
        )
        # unchanged: both pages skipped, no variant re-fetch
        assert res2.ledger.num_rows == 2
        assert res2.docs.num_rows == 0


@pytest.mark.usefixtures("ray_session")
def test_canonicalize_toggle_falls_back_to_verified_load(tmp_path):
    """Toggling --canonicalize between runs flips the routing key, so
    the same-layout fast path must NOT engage (META records it)."""
    recs = [
        PageRecord(
            "http://site.test/", b'<a href="a.html">a</a>', "text/html"
        ),
        PageRecord("http://site.test/a.html", b"A", "text/html"),
    ]
    store = TablePageStore.from_records(recs)
    out1 = str(tmp_path / "r1")
    crawl(
        CrawlConfig(origin="http://site.test/"),
        store,
        num_shards=2,
        output_dir=out1,
        delta_hashes=True,
        collect=True,
    )
    res2 = crawl(
        CrawlConfig(origin="http://site.test/", canonicalize_urls=True),
        store,
        num_shards=2,
        output_dir=str(tmp_path / "r2"),
        recrawl_from=out1,
        collect=True,
    )
    # verified fallback still detects both pages unchanged
    assert res2.docs.num_rows == 0
    assert res2.ledger.num_rows == 2


@pytest.mark.usefixtures("ray_session")
class TestDeltaWarcRevisit:
    def test_unchanged_pages_archive_as_revisit_records(self, tmp_path):
        from suckit_ray.sources.warc import count_warc_types, read_warc

        out1 = str(tmp_path / "run1")
        warc1 = str(tmp_path / "warc1")
        crawl(
            CrawlConfig(origin="http://site.test/"),
            _v1(),
            num_shards=2,
            output_dir=out1,
            warc_dir=warc1,
            delta_hashes=True,
            collect=True,
        )
        # first crawl: everything is new → all response records
        t1 = count_warc_types(warc1)
        assert t1.get("revisit", 0) == 0 and t1["response"] == 3

        out2 = str(tmp_path / "run2")
        warc2 = str(tmp_path / "warc2")
        crawl(
            CrawlConfig(origin="http://site.test/"),
            _v2(),
            num_shards=2,
            output_dir=out2,
            warc_dir=warc2,
            recrawl_from=out1,
            delta_hashes=True,
            collect=True,
        )
        # v2: index + b.html unchanged → revisit; a.html changed and
        # new.html discovered → full response records
        t2 = count_warc_types(warc2)
        assert t2 == {"revisit": 2, "response": 2}
        # read_warc over the delta archive yields only the full pages
        # (revisit pointers carry no payload to re-serve)
        urls = set(read_warc(warc2).to_pandas()["url"])
        assert urls == {
            "http://site.test/a.html",
            "http://site.test/new.html",
        }
