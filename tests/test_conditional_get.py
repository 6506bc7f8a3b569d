"""Conditional revalidation (--conditional-get): store-level 304
handshake, delta-recrawl equivalence with the unconditional path, and
the body-bytes saving it exists for."""

import pyarrow.parquet as pq
import pytest

from suckit_ray.config import CrawlConfig
from suckit_ray.pipelines.crawl import crawl
from suckit_ray.sources.pagestore import (
    CountingPageStore,
    PageRecord,
    TablePageStore,
    ValidatorOnlyPageStore,
)
from suckit_ray.stages.html_stage import body_hash


def _v1_records():
    return [
        PageRecord(
            "http://site.test/",
            b'<a href="a.html">a</a><a href="b.html">b</a>',
            "text/html",
        ),
        PageRecord("http://site.test/a.html", b"version one", "text/html"),
        PageRecord("http://site.test/b.html", b"stable", "text/html"),
    ]


def _v2_records():
    return [
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


class TestStoreLevel:
    def test_matching_digest_yields_304_no_body(self):
        store = TablePageStore.from_records(_v1_records())
        d = body_hash(b"version one")
        resp = store.fetch("http://site.test/a.html", None, if_digest=d)
        assert resp.status == 304
        assert resp.body == b""

    def test_mismatched_digest_yields_full_body(self):
        store = TablePageStore.from_records(_v1_records())
        resp = store.fetch("http://site.test/a.html", None, if_digest=12345)
        assert resp.status == 200
        assert resp.body == b"version one"

    def test_unconditional_fetch_unchanged(self):
        store = TablePageStore.from_records(_v1_records())
        resp = store.fetch("http://site.test/a.html", None)
        assert resp.status == 200
        assert resp.body == b"version one"

    def test_auth_gate_still_wins(self):
        store = TablePageStore.from_records(
            [
                PageRecord(
                    "http://site.test/p.html",
                    b"secret",
                    "text/html",
                    requires_auth=True,
                )
            ]
        )
        resp = store.fetch(
            "http://site.test/p.html", None, if_digest=body_hash(b"secret")
        )
        assert resp.status == 401  # 304 must never leak past auth


@pytest.mark.usefixtures("ray_session")
class TestConditionalRecrawl:
    def _first(self, tmp_path):
        out1 = str(tmp_path / "run1")
        crawl(
            CrawlConfig(origin="http://site.test/"),
            TablePageStore.from_records(_v1_records()),
            num_shards=2,
            output_dir=out1,
            delta_hashes=True,
            collect=True,
        )
        return out1

    def test_same_delta_as_unconditional(self, tmp_path):
        """The conditional recrawl's docs delta, ledger url set, and
        fresh fingerprint set all equal the unconditional recrawl's."""
        out1 = self._first(tmp_path)
        results = {}
        for cond in (False, True):
            out2 = str(tmp_path / f"run2_{cond}")
            res = crawl(
                CrawlConfig(
                    origin="http://site.test/", conditional_get=cond
                ),
                TablePageStore.from_records(_v2_records()),
                num_shards=2,
                output_dir=out2,
                recrawl_from=out1,
                collect=True,
            )
            hashes = {}
            for p in sorted(
                (tmp_path / f"run2_{cond}" / "hashes_parts").glob("*.parquet")
            ):
                t = pq.read_table(str(p))
                hashes.update(
                    zip(
                        t.column("url").to_pylist(),
                        t.column("body_hash").to_pylist(),
                    )
                )
            results[cond] = (
                sorted(res.docs.column("doc_id").to_pylist()),
                sorted(res.ledger.column("url").to_pylist()),
                hashes,
            )
        assert results[True][0] == results[False][0]  # changed+new only
        assert results[True][1] == results[False][1]
        assert results[True][2] == results[False][2]
        # and the delta is the expected one: a.html changed, new.html
        # new (root-level files keep to_path's host// double slash)
        assert results[True][0] == [
            "site.test//a.html",
            "site.test//new.html",
        ]

    def test_unchanged_bodies_never_leave_the_store(self, tmp_path):
        """An all-unchanged conditional recrawl serves ZERO full
        bodies: the store poisons unconditional fetches, so an empty
        docs delta proves every page revalidated via 304."""
        out1 = self._first(tmp_path)
        res = crawl(
            CrawlConfig(origin="http://site.test/", conditional_get=True),
            ValidatorOnlyPageStore(_v1_records()),
            num_shards=1,
            output_dir=str(tmp_path / "run2"),
            recrawl_from=out1,
            collect=True,
        )
        assert res.docs.num_rows == 0
        assert res.ledger.num_rows == 3
        # control: the SAME store without conditional_get sees the
        # poisoned bytes as changes on every page
        res2 = crawl(
            CrawlConfig(origin="http://site.test/"),
            ValidatorOnlyPageStore(_v1_records()),
            num_shards=1,
            output_dir=str(tmp_path / "run3"),
            recrawl_from=out1,
            collect=True,
        )
        assert res2.docs.num_rows == 3

    def test_store_304_path_exercised_directly(self):
        """The counting wrapper sees 304s when validators match."""
        store = CountingPageStore(_v1_records())
        d = body_hash(b"stable")
        r1 = store.fetch("http://site.test/b.html", None, if_digest=d)
        r2 = store.fetch("http://site.test/b.html", None)
        assert (r1.status, r2.status) == (304, 200)
        assert store.not_modified == 1 and store.full_bodies == 1
