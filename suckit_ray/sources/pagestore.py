"""Page stores — what the fetch stage fetches from.

The reference fetches over live HTTP (reqwest client,
src/downloader.rs:116-171) and its tests stand up a local tiny_http
server over tests/fixtures/ (tests/fixtures/mod.rs:11-62). The rebuild
puts a store interface behind the fetch stage:

- ``TablePageStore``     — explicit url→record dict; replicates the
  reference's fixture server including basic-auth 401s and injected
  Content-Type headers.
- ``SyntheticPageStore`` — deterministic ON-DEMAND page renderer for
  benchmarks: page bytes are a pure function of the URL, so a 10^10-URL
  corpus needs O(1) memory per fetch worker and no corpus table ever
  materializes. This is the scale path: bodies exist only inside fetch
  batches streaming through the object store.
- ``HttpPageStore``      — real network via urllib (same interface);
  unused in this sandbox (no network) but keeps the fetch stage honest.

All stores are small picklable objects shipped to fetch workers once.
"""

from __future__ import annotations

import base64
from dataclasses import dataclass, field


@dataclass(frozen=True)
class PageResponse:
    status: int
    content_type: str | None
    content_disposition: str | None
    body: bytes
    location: str | None = None  # redirect target (3xx)


@dataclass(frozen=True)
class PageRecord:
    url: str
    body: bytes
    content_type: str | None = None
    content_disposition: str | None = None
    requires_auth: bool = False
    status: int = 200
    location: str | None = None  # serve a 3xx redirect to this URL


_401_BODY = b"Invalid auth"


def _body_digest63(body: bytes) -> int:
    """The delta-recrawl content fingerprint — MUST equal
    ``stages.html_stage.body_hash`` (one digest contract across the
    skip decision, the WARC revisit record, and conditional
    revalidation); imported lazily to keep sources/ free of a stages/
    dependency at module import time."""
    from suckit_ray.stages.html_stage import body_hash

    return body_hash(body)


@dataclass
class TablePageStore:
    """Dict-backed store; auth checked like the reference fixture server
    (tests/fixtures/mod.rs:28-32: exact basic credentials match).

    Supports CONDITIONAL revalidation (``if_digest``): when the caller
    presents the prior run's body fingerprint and the current content
    still matches, the store answers 304 with NO body — the
    If-None-Match/ETag handshake with the fingerprint as the
    validator. Digests are memoized per record (a recrawl revalidates
    every unchanged page once per wave batch)."""

    pages: dict[str, PageRecord] = field(default_factory=dict)
    auth_user: str = "username"
    auth_password: str = "password"
    supports_conditional: bool = True

    @classmethod
    def from_records(cls, records: list[PageRecord], **kw) -> "TablePageStore":
        return cls(pages={r.url: r for r in records}, **kw)

    def _digest_of(self, rec: PageRecord) -> int:
        cache = self.__dict__.setdefault("_digest_cache", {})
        d = cache.get(rec.url)
        if d is None:
            d = _body_digest63(rec.body)
            cache[rec.url] = d
        return d

    def fetch(
        self,
        url: str,
        auth: tuple[str, str | None] | None,
        if_digest: int | None = None,
    ) -> PageResponse:
        rec = self.pages.get(url)
        if rec is None:
            return PageResponse(404, None, None, b"")
        if rec.location is not None:
            return PageResponse(rec.status if rec.status >= 300 else 302,
                                None, None, b"", location=rec.location)
        if rec.requires_auth:
            ok = auth is not None and auth[0] == self.auth_user and (
                auth[1] or ""
            ) == self.auth_password
            if not ok:
                # tiny_http Response::from_string defaults to text/plain
                return PageResponse(401, "text/plain; charset=utf8", None, _401_BODY)
        if (
            if_digest is not None
            and rec.status == 200
            and self._digest_of(rec) == if_digest
        ):
            return PageResponse(304, None, None, b"")
        return PageResponse(rec.status, rec.content_type, rec.content_disposition, rec.body)


# ---------------------------------------------------------------------------
# Reference fixture site replica (tests/fixtures/*, FIXTURES.md §1)
# ---------------------------------------------------------------------------

FIXTURE_HOST = "site.test"

_INDEX_HTML = """<!DOCTYPE html>
<html lang="en">
<head>
    <meta charset="UTF-8">
    <meta name="viewport" content="width=device-width, initial-scale=1.0">
    <title>Test page for suckit</title>
</head>
<body>
    <a href="jpeg.jpg" download>JPG File</a>
    <a href="mp3.mp3" download="">MP3 File</a>
    <a href="file.txt" download="">Text File</a>
    <a href="https://google.com" download="">Google</a>
    <a href="no_download_no_visit.html">No download</a>
</body>
</html>
"""

_NO_DL_HTML = """<!DOCTYPE html>
<html lang="en">
<head></head>

<body>
  <a href="should_not_get_visited.html">Link</a>
</body>
</html>"""

_W1252_TEXT = (
    "<html><head>\n"
    '<meta content="text/html; charset=windows-1252" http-equiv="Content-Type">\n'
    "<title>Gamle Gjerpen - Ei Bygdebok for nett.</title>\n"
    "</head>\n\n<body>\n"
    "    <p>Gamle Valebø Redigering av sidene pågår.</p>\n"
    "</body></html>"
)

_W1252_NO_META_TEXT = (
    "<html><head>\n"
    "<title>Gamle Gjerpen - Ei Bygdebok for nett.</title>\n"
    "</head>\n\n<body>\n"
    "    <p>Gamle Valebø Redigering av sidene pågår.</p>\n"
    "</body></html>"
)

FIXTURE_W1252_BYTES = _W1252_TEXT.encode("cp1252")
FIXTURE_W1252_NO_META_BYTES = _W1252_NO_META_TEXT.encode("cp1252")
# deterministic fake binaries (reference uses a real jpg/mp3; bytes are opaque)
FIXTURE_JPEG = b"\xff\xd8\xff\xe0" + bytes(range(100)) + b"\xff\xd9"
FIXTURE_MP3 = b"ID3" + bytes(69)


def fixture_pages(
    host: str = FIXTURE_HOST,
    *,
    requires_auth: bool = False,
    extra_headers_content_type: str | None = None,
    page: str = "index",
) -> TablePageStore:
    """The reference fixture site as a table store.

    ``page`` selects the origin page family served at ``/``:
    "index" (filter/external/auth suites), "charset_meta",
    "charset_no_meta" (charset suites). ``extra_headers_content_type``
    replicates the injected Content-Type header of charset_http_*.rs.
    """
    base = f"http://{host}"
    ct_html = extra_headers_content_type
    records = [
        PageRecord(f"{base}/jpeg.jpg", FIXTURE_JPEG, "image/jpeg", requires_auth=requires_auth),
        PageRecord(f"{base}/mp3.mp3", FIXTURE_MP3, "audio/mpeg", requires_auth=requires_auth),
        PageRecord(f"{base}/file.txt", b"Hello", "text/plain", requires_auth=requires_auth),
        PageRecord(
            f"{base}/no_download_no_visit.html",
            _NO_DL_HTML.encode(),
            ct_html,
            requires_auth=requires_auth,
        ),
        PageRecord(
            f"{base}/should_not_get_visited.html", b"", ct_html, requires_auth=requires_auth
        ),
        PageRecord("https://google.com/", b"<html><body>external</body></html>", None),
    ]
    if page == "index":
        origin_body = _INDEX_HTML.encode()
    elif page == "charset_meta":
        origin_body = FIXTURE_W1252_BYTES
    elif page == "charset_no_meta":
        origin_body = FIXTURE_W1252_NO_META_BYTES
    else:
        raise ValueError(page)
    records.append(
        PageRecord(f"{base}/", origin_body, ct_html, requires_auth=requires_auth)
    )
    records.append(
        PageRecord(f"{base}/index.html", origin_body, ct_html, requires_auth=requires_auth)
    )
    return TablePageStore.from_records(records)


# ---------------------------------------------------------------------------
# Deterministic synthetic corpus (on-demand; the bench/scale store)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class SyntheticCorpus:
    """Parameters of a deterministic synthetic web.

    ``n_hosts`` hosts named host{h:04d}.test; host h serves
    ``docs_per_host(h)`` HTML pages p0..p{m-1} plus shared media assets.
    Page j links to ``fanout`` other pages of the SAME host
    ((j*MULT + k*STEP + 1) % m — an expander-ish graph so BFS waves grow
    fast), one shared image asset (dedup pressure), and an external link
    to another host (exercises the external classifier; only followed
    when ext_depth allows). ``hot_share``>0 makes host 0 hold that share
    of all docs — the skew knob.
    """

    n_hosts: int = 8
    n_docs: int = 1000
    fanout: int = 4
    hot_share: float = 0.0
    n_assets_per_host: int = 16
    text_repeat: int = 3  # filler paragraphs per page
    ext_links: bool = True  # emit one cross-host link per page

    def docs_per_host(self, h: int) -> int:
        if self.hot_share > 0.0:
            hot = int(self.n_docs * self.hot_share)
            rest = (self.n_docs - hot) // max(1, self.n_hosts - 1)
            return hot if h == 0 else rest
        base = self.n_docs // self.n_hosts
        return base + (1 if h < self.n_docs % self.n_hosts else 0)

    def host_name(self, h: int) -> str:
        return f"host{h:04d}.test"

    def page_url(self, h: int, j: int) -> str:
        return f"http://{self.host_name(h)}/p{j}.html"

    def asset_url(self, h: int, a: int) -> str:
        return f"http://{self.host_name(h)}/img{a}.jpg"

    def seeds(self, per_host: int = 1) -> list[str]:
        """Seed list: the first ``per_host`` pages of every host. More
        seeds shallow the BFS tree (waves ≈ log2(m/per_host)) — the
        bench uses this to keep per-wave fixed costs amortized."""
        return [
            self.page_url(h, j)
            for h in range(self.n_hosts)
            for j in range(min(per_host, self.docs_per_host(h)))
        ]

    def links_of(self, h: int, j: int) -> list[tuple[str, str]]:
        """[(attr, raw_candidate)] in document order for page (h, j).

        The first two internal links are the binary-tree children
        (2j+1, 2j+2) so every page of a host is reachable from page 0
        in ⌈log2 m⌉ BFS waves — frontier waves double until the host is
        covered, which is what a throughput benchmark needs (no long
        chains). Remaining links add graph density (dedup pressure)."""
        m = self.docs_per_host(h)
        out: list[tuple[str, str]] = []
        out.append(("src", f"img{(j * 13 + 7) % self.n_assets_per_host}.jpg"))
        tree = [(2 * j + 1) % m, (2 * j + 2) % m]
        filler = [(j * 5 + k * 7 + 3) % m for k in range(max(0, self.fanout - 2))]
        for t in (tree + filler)[: max(2, self.fanout)]:
            out.append(("href", f"p{t}.html"))
        ext_h = (h + 1 + j) % self.n_hosts
        if self.ext_links and ext_h != h:
            out.append(("href", self.page_url(ext_h, j % max(1, self.docs_per_host(ext_h)))))
        return out

    def render_page(self, h: int, j: int) -> bytes:
        paras = "\n".join(
            f"<p>host {h} doc {j} paragraph {p} — deterministic filler text "
            f"{(j * 2654435761 + p) % 100000}</p>"
            for p in range(self.text_repeat)
        )
        links = []
        for attr, cand in self.links_of(h, j):
            tag = "img" if attr == "src" else "a"
            body = "" if attr == "src" else f">link {cand}</a"
            links.append(f"<{tag} {attr}=\"{cand}\"{body}>")
        html = (
            "<!DOCTYPE html>\n<html><head><meta charset=\"UTF-8\">"
            f"<title>h{h} p{j}</title></head>\n<body>\n{paras}\n"
            + "\n".join(links)
            + "\n</body></html>\n"
        )
        return html.encode()


_ASSET_BODY = b"\xff\xd8\xff\xe0synthetic-jpeg-bytes" + bytes(64) + b"\xff\xd9"


@dataclass(frozen=True)
class SyntheticPageStore:
    """On-demand store over a ``SyntheticCorpus`` — page bytes are a pure
    function of the URL; nothing is precomputed or held in memory.
    Conditional revalidation renders the page and compares fingerprints
    (a real server would compare validators without re-reading the
    body; here rendering IS the read — the 304 still saves the body's
    trip through the batch/object store)."""

    corpus: SyntheticCorpus
    supports_conditional: bool = True

    def fetch(self, url: str, auth, if_digest: int | None = None) -> PageResponse:
        c = self.corpus
        try:
            hostpart, _, rest = url.partition("://")[2].partition("/")
            h = int(hostpart[4:8])
            if rest.startswith("img"):
                if if_digest is not None and _body_digest63(_ASSET_BODY) == if_digest:
                    return PageResponse(304, None, None, b"")
                return PageResponse(200, "image/jpeg", None, _ASSET_BODY)
            j = int(rest[1 : rest.index(".")])
            if h >= c.n_hosts or j >= c.docs_per_host(h):
                return PageResponse(404, None, None, b"")
            body = c.render_page(h, j)
            if if_digest is not None and _body_digest63(body) == if_digest:
                return PageResponse(304, None, None, b"")
            return PageResponse(200, "text/html; charset=utf-8", None, body)
        except (ValueError, IndexError):
            return PageResponse(404, None, None, b"")


class CountingPageStore(TablePageStore):
    """TablePageStore tallying full-body responses vs 304
    revalidations — test support (lives here so Ray workers can
    deserialize it; a test-module class hangs worker imports)."""

    def __init__(self, records: list[PageRecord]):
        super().__init__(pages={r.url: r for r in records})
        self.full_bodies = 0
        self.not_modified = 0

    def fetch(self, url, auth, if_digest: int | None = None) -> PageResponse:
        resp = super().fetch(url, auth, if_digest=if_digest)
        if resp.status == 304:
            self.not_modified += 1
        elif resp.status == 200 and resp.body:
            self.full_bodies += 1
        return resp


class ValidatorOnlyPageStore(TablePageStore):
    """Poisons every UNCONDITIONAL fetch with altered bytes — test
    support for conditional revalidation: a recrawl that fails to
    present validators sees every page 'changed', so a zero docs
    delta PROVES the 304 handshake fired for each page (worker-side
    behavior verified without cross-process counters)."""

    def __init__(self, records: list[PageRecord]):
        super().__init__(pages={r.url: r for r in records})

    def fetch(self, url, auth, if_digest: int | None = None) -> PageResponse:
        if if_digest is None:
            rec = self.pages.get(url)
            if (
                rec is not None
                and rec.location is None
                and not rec.requires_auth
            ):
                return PageResponse(
                    200,
                    rec.content_type,
                    rec.content_disposition,
                    rec.body + b"<!--poisoned-->",
                )
        return super().fetch(url, auth, if_digest=if_digest)


class HttpPageStore:
    """Real-network store (urllib), matching the reference's reqwest
    client build (src/downloader.rs:75-84): a cookie STORE — responses
    can Set-Cookie and later requests send the jar back
    (``.cookie_store(true)``) — plus optional TLS-verification bypass
    (``danger_accept_invalid_certs`` ⇔ ``--disable-certs-checks``).

    One jar per store instance; when the store is broadcast to Ray
    workers each worker process deserializes its own copy, so cookies
    are per-worker session state (same worker-local model as the auth
    map — the reference is single-process and has exactly one jar).
    The opener is built lazily because it is not picklable."""

    def __init__(
        self,
        user_agent: str = "suckit",
        cookie: str = "",
        timeout: float = 30.0,
        disable_certs_checks: bool = False,
    ):
        self.user_agent = user_agent
        self.cookie = cookie
        self.timeout = timeout
        self.disable_certs_checks = disable_certs_checks
        self._opener = None

    def __getstate__(self):
        d = self.__dict__.copy()
        d["_opener"] = None  # openers (and their jars) don't pickle
        return d

    def _get_opener(self):
        if self._opener is None:
            import http.cookiejar
            import urllib.request

            handlers = [
                urllib.request.HTTPCookieProcessor(http.cookiejar.CookieJar())
            ]
            if self.disable_certs_checks:
                import ssl

                ctx = ssl.create_default_context()
                ctx.check_hostname = False
                ctx.verify_mode = ssl.CERT_NONE
                handlers.append(urllib.request.HTTPSHandler(context=ctx))
            self._opener = urllib.request.build_opener(*handlers)
        return self._opener

    def fetch(self, url: str, auth: tuple[str, str | None] | None) -> PageResponse:
        import urllib.error
        import urllib.request

        headers = {"User-Agent": self.user_agent}
        if self.cookie:
            headers["Cookie"] = self.cookie
        if auth is not None:
            token = base64.b64encode(
                f"{auth[0]}:{auth[1] or ''}".encode()
            ).decode()
            headers["Authorization"] = f"Basic {token}"
        req = urllib.request.Request(url, headers=headers)
        try:
            with self._get_opener().open(req, timeout=self.timeout) as resp:
                return PageResponse(
                    resp.status,
                    resp.headers.get("Content-Type"),
                    resp.headers.get("Content-Disposition"),
                    resp.read(),
                )
        except urllib.error.HTTPError as e:
            return PageResponse(
                e.code,
                e.headers.get("Content-Type"),
                e.headers.get("Content-Disposition"),
                e.read(),
            )


@dataclass
class FlakyPageStore:
    """Chaos-testing wrapper: fail the first ``fail_times`` fetches of
    each URL with a transport error (exercises the fetch stage's
    ``tries`` retry budget and continue-on-error semantics). Failure
    counts are per worker process — deterministic because the retry
    loop retries within one task.

    NOTE: stores shipped to Ray workers must be importable there —
    define store classes in the library, not in test modules (a
    test-module class hangs deserialization in workers)."""

    inner: TablePageStore
    fail_times: int = 2
    counts: dict = field(default_factory=dict)

    def fetch(self, url: str, auth) -> PageResponse:
        n = self.counts.get(url, 0)
        self.counts[url] = n + 1
        if n < self.fail_times:
            raise ConnectionError(f"transient failure #{n} for {url}")
        return self.inner.fetch(url, auth)


@dataclass
class RestorablePageStore:
    """Chaos wrapper for the retire-and-rediscover path: urls in
    ``dead_until_flag`` answer 404 until ``flag_path`` exists on the
    (shared) filesystem; serving ``touch_flag_on`` creates that flag.
    Wave ordering makes the restoration deterministic without shared
    in-process state: put the flag-toucher deeper in the link chain
    than the dead url's first fetch, and re-link the dead url deeper
    still — the 404, the restoration, and the refetch then land in
    strictly increasing waves. Library-defined so Ray workers can
    deserialize it (see FlakyPageStore note)."""

    inner: TablePageStore
    dead_until_flag: tuple[str, ...] = ()
    touch_flag_on: str = ""
    flag_path: str = ""
    supports_conditional: bool = True

    def fetch(self, url: str, auth, if_digest: int | None = None) -> PageResponse:
        import os

        if url in self.dead_until_flag and not os.path.exists(self.flag_path):
            return PageResponse(404, None, None, b"")
        resp = self.inner.fetch(url, auth, if_digest=if_digest)
        if url == self.touch_flag_on and self.flag_path:
            with open(self.flag_path, "w") as f:
                f.write("restored")
        return resp


@dataclass
class DeadHostPageStore:
    """Chaos wrapper: every fetch to ``dead_hosts`` raises a transport
    error (exercises the per-host circuit breaker). Library-defined so
    Ray workers can deserialize it (see FlakyPageStore note)."""

    inner: TablePageStore
    dead_hosts: tuple[str, ...] = ()

    def fetch(self, url: str, auth) -> "PageResponse":
        from suckit_ray.urlkit import UrlParseError, parse_url

        try:
            h = parse_url(url).host or ""
        except UrlParseError:
            h = ""
        if h in self.dead_hosts:
            raise ConnectionError(f"host down: {h}")
        return self.inner.fetch(url, auth)


class SpanTableStore:
    """Serve an interleaved-span documents table (the BASELINE.json
    input_hint shape: doc_id + spans, optionally body/charset/data_type
    columns from a previous crawl) as a crawlable web — the engine's
    INPUT can be exactly the table shape it produces, closing the loop:
    crawl → documents table → SpanTableStore → crawl reproduces the
    same table (fixed point; see tests/test_span_roundtrip.py).

    URLs are derived from doc_id via the ``url_of_path`` inverse; bodies
    are the stored ``body`` bytes when present, else the reassembled
    span text encoded UTF-8.
    """

    def __init__(self, table):
        import pyarrow as pa  # noqa: F401

        from suckit_ray.htmlproc import reassemble_spans
        from suckit_ray.urlkit import url_of_path

        names = table.schema.names
        self.pages: dict[str, PageResponse] = {}
        bodies = table.column("body").to_pylist() if "body" in names else [None] * table.num_rows
        dtypes = (
            table.column("data_type").to_pylist() if "data_type" in names else [None] * table.num_rows
        )
        charsets = (
            table.column("charset").to_pylist() if "charset" in names else [None] * table.num_rows
        )
        for doc_id, spans, body, dt, cs in zip(
            table.column("doc_id").to_pylist(),
            table.column("spans").to_pylist(),
            bodies,
            dtypes,
            charsets,
        ):
            url = url_of_path(doc_id)
            if body is None:
                body = reassemble_spans(spans).encode("utf-8")
            ct = dt or "text/html"
            if cs and "charset" not in ct:
                ct = f"{ct}; charset={cs}"
            self.pages[url] = PageResponse(200, ct, None, body)

    def fetch(self, url: str, auth) -> PageResponse:
        rec = self.pages.get(url.split("#", 1)[0])
        if rec is None:
            return PageResponse(404, None, None, b"")
        return rec
