"""rel=nofollow / meta-robots-nofollow handling (--honor-nofollow,
rebuild-only, off by default for reference parity)."""

import pytest

from suckit_ray.htmlproc import page_meta_nofollow, scan_link_attributes


class TestScanner:
    def test_rel_nofollow_flags_href_only(self):
        refs = scan_link_attributes(
            '<a rel="nofollow" href="a.html">x</a>'
            '<img rel="nofollow" src="i.jpg">'
            '<a href="b.html" rel="ugc nofollow">y</a>'
            '<a href="c.html" rel="ugc sponsored">z</a>'
            '<a href="d.html">plain</a>'
        )
        flags = {r.value: r.nofollow for r in refs}
        assert flags["a.html"] is True
        assert flags["b.html"] is True  # rel after href, multi-token
        assert flags["c.html"] is False
        assert flags["d.html"] is False
        assert flags["i.jpg"] is False  # nofollow is a hyperlink notion

    def test_rel_comma_separated_and_case(self):
        refs = scan_link_attributes(
            "<a REL='UGC,NoFollow' href=e.html>e</a>"
        )
        assert refs[0].nofollow is True

    def test_meta_robots_variants(self):
        assert page_meta_nofollow(
            '<meta name="robots" content="noindex, nofollow">'
        )
        assert page_meta_nofollow("<meta content='none' name=robots>")
        assert page_meta_nofollow(
            '<META NAME="ROBOTS" CONTENT="NOFOLLOW">'
        )
        assert not page_meta_nofollow(
            '<meta name="robots" content="noindex">'
        )
        assert not page_meta_nofollow(
            '<meta name="viewport" content="nofollow-ish">'
        )
        assert not page_meta_nofollow("<p>no meta at all</p>")


@pytest.mark.usefixtures("ray_session")
class TestNofollowCrawl:
    def _store(self):
        from suckit_ray.sources.pagestore import PageRecord, TablePageStore

        H = "http://nf.test"
        pages = [
            PageRecord(
                url=f"{H}/",
                body=(
                    '<a rel="nofollow" href="spam.html">s</a>'
                    '<a href="good.html">g</a>'
                    '<a href="meta.html">m</a>'
                ).encode(),
                content_type="text/html",
            ),
            PageRecord(
                url=f"{H}/good.html",
                body=b"<p>fine</p>",
                content_type="text/html",
            ),
            PageRecord(
                url=f"{H}/meta.html",
                body=(
                    '<meta name="robots" content="nofollow">'
                    '<a href="hidden.html">h</a>'
                ).encode(),
                content_type="text/html",
            ),
            PageRecord(
                url=f"{H}/spam.html",
                body=b"<p>spam</p>",
                content_type="text/html",
            ),
            PageRecord(
                url=f"{H}/hidden.html",
                body=b"<p>hidden</p>",
                content_type="text/html",
            ),
        ]
        return TablePageStore.from_records(pages)

    def _crawl(self, tmp_path, sub, **cfg_kw):
        from suckit_ray.config import CrawlConfig
        from suckit_ray.pipelines.crawl import crawl

        res = crawl(
            CrawlConfig(
                origin="http://nf.test/", output=str(tmp_path / sub), **cfg_kw
            ),
            self._store(),
            num_shards=2,
        )
        docs = res.docs
        tbl = docs if hasattr(docs, "num_rows") else docs.to_arrow()
        return res, set(tbl.column("doc_id").to_pylist())

    def test_honor_nofollow_prunes_flagged_paths(self, tmp_path):
        res, ids = self._crawl(tmp_path, "on", honor_nofollow=True)
        assert "nf.test//spam.html" not in ids  # rel=nofollow link
        assert "nf.test//hidden.html" not in ids  # meta-nofollow page
        assert "nf.test//good.html" in ids
        assert "nf.test//meta.html" in ids
        # the flagged links are STILL rewritten in the mirror spans
        import pyarrow as pa  # noqa: F401

        docs = res.docs
        tbl = docs if hasattr(docs, "num_rows") else docs.to_arrow()
        spans_by_id = dict(
            zip(
                tbl.column("doc_id").to_pylist(),
                tbl.column("spans").to_pylist(),
            )
        )
        root_refs = [
            s["media_ref"]
            for s in spans_by_id["nf.test/index.html"]
            if s["kind"] == "link"
        ]
        assert "spam.html" in root_refs  # rendered, just not followed

    def test_default_crawl_follows_everything(self, tmp_path):
        _res, ids = self._crawl(tmp_path, "off")
        assert "nf.test//spam.html" in ids
        assert "nf.test//hidden.html" in ids


class TestMetaRefreshParse:
    def test_extracts_targets(self):
        from suckit_ray.htmlproc import meta_refresh_targets

        assert meta_refresh_targets(
            '<meta http-equiv="refresh" content="5; url=next.html">'
        ) == ["next.html"]
        assert meta_refresh_targets(
            "<meta content='0;URL=\"/abs/path\"' http-equiv=REFRESH>"
        ) == ["/abs/path"]
        assert meta_refresh_targets(
            '<meta http-equiv="refresh" content="30">'
        ) == []  # reload, no redirect
        assert meta_refresh_targets(
            '<meta name="refresh" content="5; url=x.html">'
        ) == []  # name= is not http-equiv=


@pytest.mark.usefixtures("ray_session")
class TestMetaRefreshCrawl:
    def _store(self):
        from suckit_ray.sources.pagestore import PageRecord, TablePageStore

        H = "http://mr.test"
        pages = [
            PageRecord(
                url=f"{H}/",
                body=(
                    '<meta http-equiv="refresh" content="0; url=moved.html">'
                    '<a href="normal.html">n</a>'
                ).encode(),
                content_type="text/html",
            ),
            PageRecord(
                url=f"{H}/moved.html",
                body=b"<p>landed</p>",
                content_type="text/html",
            ),
            PageRecord(
                url=f"{H}/normal.html",
                body=b"<p>n</p>",
                content_type="text/html",
            ),
        ]
        return TablePageStore.from_records(pages)

    def _ids(self, tmp_path, sub, **cfg_kw):
        from suckit_ray.config import CrawlConfig
        from suckit_ray.pipelines.crawl import crawl

        res = crawl(
            CrawlConfig(
                origin="http://mr.test/", output=str(tmp_path / sub), **cfg_kw
            ),
            self._store(),
            num_shards=2,
        )
        docs = res.docs
        tbl = docs if hasattr(docs, "num_rows") else docs.to_arrow()
        return set(tbl.column("doc_id").to_pylist())

    def test_follow_meta_refresh_reaches_target(self, tmp_path):
        ids = self._ids(tmp_path, "on", follow_meta_refresh=True)
        assert "mr.test//moved.html" in ids
        assert "mr.test//normal.html" in ids

    def test_default_ignores_meta_refresh(self, tmp_path):
        ids = self._ids(tmp_path, "off")
        assert "mr.test//moved.html" not in ids
        assert "mr.test//normal.html" in ids
