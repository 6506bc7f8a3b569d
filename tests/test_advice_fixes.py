"""Round-2 parity/security fixes from ADVICE.md:

1. cross-host redirects must not carry the original host's Basic-auth
   credentials (reqwest strips Authorization on host change);
2. the >255 filename check is a BYTE length (Rust String::len);
3. special-scheme URLs without '//' still carry an authority
   (WHATWG special-authority-ignore-slashes, rust-url behavior);
4. robots.txt caching keys on (scheme, host) and honors the fetch
   retry budget;
plus the reference's reqwest cookie store + --disable-certs-checks
(VERDICT r1 'What's missing' items 2/3), exercised over a real
loopback HTTP server."""

import hashlib
import http.server
import threading

import pyarrow as pa
import pytest

from suckit_ray.config import CrawlConfig
from suckit_ray.sources.pagestore import PageRecord, PageResponse, TablePageStore
from suckit_ray.stages.fetch import make_fetch_fn
from suckit_ray.urlkit import parse_url, to_path


class RecordingStore:
    """Wraps a TablePageStore, recording (url, auth) per fetch call.
    Used directly (not via Ray), so a test-local class is safe."""

    def __init__(self, inner):
        self.inner = inner
        self.calls = []

    def fetch(self, url, auth):
        self.calls.append((url, auth))
        return self.inner.fetch(url, auth)


def _fetch_one(store, config, url):
    batch = pa.table(
        {
            "url": pa.array([url], pa.string()),
            "host": pa.array([parse_url(url).host or ""], pa.string()),
            "depth": pa.array([0], pa.int32()),
            "ext_depth": pa.array([0], pa.int32()),
            "seq": pa.array([0], pa.int64()),
        }
    )
    return make_fetch_fn(store, config)(batch)


class TestRedirectAuth:
    def _store(self, target_host):
        return RecordingStore(
            TablePageStore.from_records(
                [
                    PageRecord(
                        url="http://a.test/page.html",
                        body=b"",
                        location=f"http://{target_host}/land.html",
                    ),
                    PageRecord(
                        url=f"http://{target_host}/land.html",
                        body=b"<html>ok</html>",
                        content_type="text/html",
                    ),
                ],
                auth_user="u",
                auth_password="p",
            )
        )

    def test_cross_host_redirect_drops_auth(self):
        store = self._store("evil.test")
        cfg = CrawlConfig(origin="http://a.test/", auth=("u", "p", "a.test"), tries=1)
        out = _fetch_one(store, cfg, "http://a.test/page.html")
        assert out.column("status").to_pylist() == [200]
        assert store.calls[0] == ("http://a.test/page.html", ("u", "p"))
        # the redirect target is another host: credentials must NOT follow
        assert store.calls[1] == ("http://evil.test/land.html", None)

    def test_same_host_redirect_keeps_auth(self):
        store = self._store("a.test")
        cfg = CrawlConfig(origin="http://a.test/", auth=("u", "p", "a.test"), tries=1)
        _fetch_one(store, cfg, "http://a.test/page.html")
        assert store.calls[1] == ("http://a.test/land.html", ("u", "p"))

    def test_redirect_target_host_uses_its_own_creds(self):
        store = self._store("b.test")
        cfg = CrawlConfig(
            origin="http://a.test/",
            auth=("u", "p", "a.test", "u2", "p2", "b.test"),
            tries=1,
        )
        _fetch_one(store, cfg, "http://a.test/page.html")
        assert store.calls[1] == ("http://b.test/land.html", ("u2", "p2"))


class TestFilenameByteLength:
    def test_multibyte_filename_over_255_bytes_hashes(self):
        # 130 chars × 2 bytes = 260 utf-8 bytes but only 134 chars total:
        # Rust byte-length semantics must trigger the md5 fallback.
        # Since round 3 the parsed path is WHATWG percent-encoded the
        # way rust-url's .path() is, so the md5 input is the ENCODED
        # name — exactly what the reference hashes (url_helper.rs
        # receives url.path()).
        name = "é" * 130
        url = parse_url(f"http://h.test/{name}.txt")
        path = to_path(url, with_fragment=False)
        encoded = "%C3%A9" * 130
        assert url.path == f"/{encoded}.txt"
        expected = hashlib.md5(f"{encoded}.txt".encode("utf-8")).hexdigest() + ".html"
        # root-level files keep the reference's double-slash quirk
        assert path == f"h.test//{expected}"

    def test_ascii_255_char_filename_kept(self):
        name = "a" * 251  # + ".txt" = 255 bytes: at the limit, kept
        url = parse_url(f"http://h.test/{name}.txt")
        assert to_path(url, with_fragment=False) == f"h.test//{name}.txt"


class TestSpecialSchemeNoSlashes:
    def test_http_no_slash_gets_host(self):
        u = parse_url("http:page.html")
        assert u.host == "page.html" and u.path == "/"

    def test_https_single_slash_gets_host(self):
        u = parse_url("https:/example.com/x")
        assert u.host == "example.com" and u.path == "/x"

    def test_serialization_matches_whatwg(self):
        assert parse_url("http:example.com/a").as_str() == "http://example.com/a"

    def test_non_special_scheme_unchanged(self):
        u = parse_url("mailto:user@x.test")
        assert u.host is None and u.cannot_be_a_base

    def test_should_visit_now_keeps_special_no_slash(self):
        import re

        from suckit_ray.urlkit import should_visit

        inc, exc = re.compile(".*"), re.compile("$^")
        assert should_visit("http:page.html", inc, exc)


class FlakyRobotsStore:
    """Fails the first N robots.txt fetches, then serves rules."""

    def __init__(self, fail_times):
        self.fail_times = fail_times
        self.calls = 0

    def fetch(self, url, auth):
        if url.endswith("/robots.txt"):
            self.calls += 1
            if self.calls <= self.fail_times:
                raise ConnectionError("transient")
            return PageResponse(
                200, "text/plain", None, b"User-agent: *\nDisallow: /private/\n"
            )
        return PageResponse(404, None, None, b"")


class TestRobotsCacheFixes:
    def test_retry_budget_prevents_poisoned_allow_all(self):
        from suckit_ray.robots import RobotsCache

        cache = RobotsCache(FlakyRobotsStore(fail_times=1), "suckit", tries=3)
        assert not cache.allows("http://h.test/private/x.html")
        assert cache.allows("http://h.test/public/x.html")

    def test_no_retries_still_allows_all_on_failure(self):
        from suckit_ray.robots import RobotsCache

        cache = RobotsCache(FlakyRobotsStore(fail_times=5), "suckit", tries=1)
        assert cache.allows("http://h.test/private/x.html")

    def test_cache_keyed_by_scheme(self):
        from suckit_ray.robots import RobotsCache

        store = FlakyRobotsStore(fail_times=0)
        cache = RobotsCache(store, "suckit", tries=1)
        cache.rules_for("http", "h.test")
        cache.rules_for("https", "h.test")
        assert store.calls == 2  # one fetch per scheme, both cached
        cache.rules_for("http", "h.test")
        assert store.calls == 2


class _CookieHandler(http.server.BaseHTTPRequestHandler):
    def do_GET(self):
        if self.path == "/set":
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Set-Cookie", "sid=r2d2; Path=/")
            self.end_headers()
            self.wfile.write(b"<html>set</html>")
        else:
            body = f"cookie={self.headers.get('Cookie')}".encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.end_headers()
            self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture()
def cookie_server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _CookieHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


class TestHttpPageStoreSession:
    def test_set_cookie_persists_across_requests(self, cookie_server):
        from suckit_ray.sources.pagestore import HttpPageStore

        store = HttpPageStore()
        store.fetch(f"{cookie_server}/set", None)
        resp = store.fetch(f"{cookie_server}/check", None)
        assert b"sid=r2d2" in resp.body  # jar replayed the cookie

    def test_static_cookie_header_still_sent(self, cookie_server):
        from suckit_ray.sources.pagestore import HttpPageStore

        store = HttpPageStore(cookie="k=v")
        resp = store.fetch(f"{cookie_server}/check", None)
        assert b"k=v" in resp.body

    def test_pickle_drops_opener_but_keeps_flags(self):
        import pickle

        from suckit_ray.sources.pagestore import HttpPageStore

        store = HttpPageStore(disable_certs_checks=True)
        store._get_opener()
        clone = pickle.loads(pickle.dumps(store))
        assert clone._opener is None and clone.disable_certs_checks

    def test_disable_certs_checks_builds_insecure_context(self):
        import ssl
        import urllib.request

        from suckit_ray.sources.pagestore import HttpPageStore

        opener = HttpPageStore(disable_certs_checks=True)._get_opener()
        https = [
            h for h in opener.handlers if isinstance(h, urllib.request.HTTPSHandler)
        ]
        ctx = https[0]._context
        assert ctx.verify_mode == ssl.CERT_NONE and not ctx.check_hostname

    def test_default_store_verifies_certs(self):
        import urllib.request

        from suckit_ray.sources.pagestore import HttpPageStore

        opener = HttpPageStore()._get_opener()
        assert not any(
            isinstance(h, urllib.request.HTTPSHandler) and h._context is not None
            for h in opener.handlers
            if isinstance(h, urllib.request.HTTPSHandler)
        ) or all(
            h._context is None
            for h in opener.handlers
            if isinstance(h, urllib.request.HTTPSHandler)
        )


@pytest.mark.usefixtures("ray_session")
def test_curriculum_order_empty_corpus_schema(tmp_path):
    """Round-5 advice fix: the empty-corpus branch must emit doc_id as
    int64 (the parquet column type), not object — a schema-consistent
    empty result."""
    import pyarrow.parquet as pq

    from suckit_ray.pipelines.textops import docs_curriculum_order

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
                "source": pa.array([], pa.string()),
                "n_chars": pa.array([], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    ds = docs_curriculum_order(str(tmp_path))
    assert ds.count() == 0
    # Ray's to_pandas() drops the schema of a fully-empty dataset, so
    # pin the BLOCK schema (what a union/consumer would see)
    sch = ds.schema()
    types = dict(zip(sch.names, [str(t) for t in sch.types]))
    assert types["doc_id"] == "int64"
    assert types["stage"] == "int64"
