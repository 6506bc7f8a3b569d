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
        parts = sorted((tmp_path / "run1" / "hashes_parts").iterdir())
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
            for p in sorted((tmp_path / "run2" / "hashes_parts").iterdir())
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
