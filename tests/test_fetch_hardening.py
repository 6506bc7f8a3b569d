"""Regressions for the round-3 crawl-engine review fixes: redirect
cycles error like reqwest's 10-hop policy, a failed redirect hop does
not leave a stale 3xx as the final page, transport-failure rows are
never 'downloaded' (no zero-byte mirror files), error rows stay out of
the WARC archive, and politeness engages on random_range alone."""

import pyarrow as pa
import pytest

from suckit_ray.config import CrawlConfig
from suckit_ray.sources.pagestore import PageRecord, PageResponse, TablePageStore
from suckit_ray.stages.fetch import make_fetch_fn


def _batch(url: str) -> pa.Table:
    return pa.table(
        {
            "url": [url],
            "host": ["a.test"],
            "depth": [0],
            "ext_depth": [0],
            "seq": [0],
        }
    )


class _HopFailsStore:
    """First URL serves a 301; the redirect target always raises."""

    def __init__(self):
        self.calls = []

    def fetch(self, url, auth):
        self.calls.append(url)
        if url == "http://a.test/page.html":
            return PageResponse(301, None, None, b"", location="/land.html")
        raise OSError("connection reset")


@pytest.mark.usefixtures("ray_session")
class TestRedirectHardening:
    def test_failed_hop_raises_not_stale_3xx(self):
        cfg = CrawlConfig(origin="http://a.test/", tries=2)
        fn = make_fetch_fn(_HopFailsStore(), cfg)
        with pytest.raises(RuntimeError, match="Couldn't download"):
            fn(_batch("http://a.test/page.html"))

    def test_failed_hop_error_row_with_continue(self):
        cfg = CrawlConfig(origin="http://a.test/", tries=2, continue_on_error=True)
        out = make_fetch_fn(_HopFailsStore(), cfg)(_batch("http://a.test/page.html"))
        assert out.column("status").to_pylist() == [0]
        assert out.column("fetch_error").to_pylist()[0] is not None

    def test_redirect_cycle_errors(self):
        store = TablePageStore.from_records(
            [
                PageRecord(url="http://a.test/x.html", body=b"", location="/y.html"),
                PageRecord(url="http://a.test/y.html", body=b"", location="/x.html"),
            ]
        )
        cfg = CrawlConfig(origin="http://a.test/", tries=1, continue_on_error=True)
        out = make_fetch_fn(store, cfg)(_batch("http://a.test/x.html"))
        assert out.column("status").to_pylist() == [0]
        assert "redirect" in out.column("fetch_error").to_pylist()[0]


@pytest.mark.usefixtures("ray_session")
def test_failed_fetch_not_downloaded_and_not_in_warc(tmp_path):
    from suckit_ray.pipelines.crawl import crawl
    from suckit_ray.sources.warc import read_warc

    class _OneDeadStore:
        """index links to a page whose fetches always fail."""

        def fetch(self, url, auth):
            if url == "http://a.test/":
                return PageResponse(
                    200, "text/html; charset=utf-8", None,
                    b'<html><body><a href="dead.html">x</a></body></html>',
                )
            raise OSError("down")

    warc_dir = str(tmp_path / "warc")
    res = crawl(
        CrawlConfig(origin="http://a.test/", tries=2, continue_on_error=True),
        _OneDeadStore(),
        warc_dir=warc_dir,
    )
    rows = {r["url"]: r for r in res.docs.to_pylist()}
    assert rows["http://a.test/dead.html"]["downloaded"] is False
    assert rows["http://a.test/dead.html"]["error"] is not None
    assert rows["http://a.test/"]["downloaded"] is True
    # the archive holds only wire truth: the dead page never answered
    import ray.data as rd  # noqa: F401

    archived = read_warc(warc_dir).to_pandas()
    assert set(archived["url"]) == {"http://a.test/"}


def test_politeness_on_random_range_alone():
    assert not CrawlConfig(origin="http://a.test/").politeness_on
    assert CrawlConfig(origin="http://a.test/", delay=1.0).politeness_on
    assert CrawlConfig(origin="http://a.test/", random_range=2.0).politeness_on
