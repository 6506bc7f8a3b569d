"""Pure URL kernels: parse, join, url→path mapping, visit predicates.

These functions carry most of the reference's observable crawl
semantics and are deliberately dependency-free so they can run inside
vectorized ``map_batches`` bodies and be unit-tested without Ray:

- ``to_path``          — reference src/url_helper.rs:10-45 (8 golden vectors)
- ``normalize_url``    — reference src/scraper.rs:374-381 (the `//`→https quirk)
- ``should_visit``     — reference src/scraper.rs:353-369
- ``is_on_another_domain`` — reference src/scraper.rs:384-400
- ``depth_gate``       — reference src/scraper.rs:203-215
- ``relative_rewrite`` — reference src/scraper.rs:95-102 (pathdiff semantics)

URL parsing follows rust-url's WHATWG behavior for the crawl-relevant
observables (host extraction, cannot-be-a-base detection, default-port
stripping, empty-path → "/" for special schemes) plus the real-web
edge cases (round 3, VERDICT r2 item 7): backslashes are slashes in
special-scheme URLs, dot segments are removed at parse, path/query/
fragment are percent-encoded with the WHATWG encode sets (UTF-8,
existing escapes untouched), and userinfo survives serialization.
Remaining known divergence: IDNA/punycode hosts (non-ASCII hostnames)
are kept verbatim rather than punycoded.
"""

from __future__ import annotations

import hashlib
import posixpath
import re
from dataclasses import dataclass
from urllib.parse import urljoin, urlsplit

FILE_NAME_MAX_LENGTH = 255  # max filename length, reference src/url_helper.rs:7

# WHATWG "special" schemes and their default ports.
_SPECIAL_SCHEMES = {"http": 80, "https": 443, "ws": 80, "wss": 443, "ftp": 21, "file": None}

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*:")
_IPV4_RE = re.compile(r"^\d{1,3}(\.\d{1,3}){3}$")


class UrlParseError(ValueError):
    """Raised when a string is not an absolute, parseable URL
    (the rebuild's equivalent of rust-url's ``ParseError``)."""


@dataclass(frozen=True)
class ParsedUrl:
    scheme: str
    host: str | None        # lowercased; None when the URL has no authority
    port: int | None        # non-default explicit port only
    path: str
    query: str | None       # None when no '?' present
    fragment: str | None    # None when no '#' present
    userinfo: str | None = None  # "user" or "user:pass", kept for as_str

    @property
    def has_host(self) -> bool:
        return bool(self.host)

    @property
    def cannot_be_a_base(self) -> bool:
        # rust-url: true for non-special URLs with an opaque (non-/-rooted)
        # path and no authority, e.g. mailto:, javascript:, data:.
        return (
            self.scheme not in _SPECIAL_SCHEMES
            and not self.host
            and not self.path.startswith("/")
        )

    @property
    def domain(self) -> str | None:
        """rust-url ``Url::domain()``: the host unless it is an IP literal
        (IPv4/IPv6 → None). Reference relies on None == None making two
        IP-hosted URLs "same domain" (src/scraper.rs:393)."""
        h = self.host
        if not h:
            return None
        if h.startswith("[") or _IPV4_RE.match(h):
            return None
        return h

    def as_str(self) -> str:
        """Recompose, matching rust-url's serialization for the shapes the
        crawl touches (the seen-set key, src/scraper.rs:79)."""
        if self.host is None:
            out = f"{self.scheme}:{self.path}"
        else:
            netloc = self.host
            if self.userinfo:
                netloc = f"{self.userinfo}@{netloc}"
            if self.port is not None:
                netloc += f":{self.port}"
            path = self.path
            if path == "" and self.scheme in _SPECIAL_SCHEMES:
                path = "/"
            out = f"{self.scheme}://{netloc}{path}"
        if self.query is not None:
            out += f"?{self.query}"
        if self.fragment is not None:
            out += f"#{self.fragment}"
        return out


# WHATWG percent-encode sets (beyond which: C0 controls, DEL, and all
# non-ASCII are always encoded; existing '%' escapes are left alone —
# rust-url behaves identically).
_PATH_ENCODE = set(' "<>`{}')
_QUERY_ENCODE = set(' "<>#\'')  # the "'" is the special-scheme query set
_FRAG_ENCODE = set(' "<>`')


def _pct_encode(s: str, extra: set) -> str:
    out = []
    for ch in s:
        o = ord(ch)
        if o < 0x20 or o == 0x7F or o > 0x7E or ch in extra:
            out.extend(f"%{b:02X}" for b in ch.encode("utf-8"))
        else:
            out.append(ch)
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 / WHATWG path-state '.'/'..' handling — rust-url
    normalizes dot segments at PARSE time, so the rebuild must too
    (the seen-set key and to_path both observe the normalized path)."""
    if "." not in path:
        return path
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    # a trailing '.'/'..' leaves a trailing slash
    if path.rstrip("/").endswith((".", "..")) and path.split("/")[-1] in (".", ".."):
        out.append("")
    return "/".join(out)


def parse_url(url: str) -> ParsedUrl:
    """Parse an absolute URL; raise ``UrlParseError`` for relative or
    malformed input (mirrors rust-url ``Url::parse`` success/failure on
    the candidate shapes the reference distinguishes)."""
    m = _SCHEME_RE.match(url)
    if not m:
        raise UrlParseError(f"relative URL without a base: {url!r}")
    if m.group(0)[:-1].lower() in _SPECIAL_SCHEMES:
        # WHATWG: '\' is '/' in the authority/path STATES of
        # special-scheme URLs only — query and fragment keep
        # backslashes verbatim (rust-url does the same), so the
        # rewrite stops at the first '?' or '#'
        rest = url[m.end() :]
        cut = len(rest)
        for ch in ("?", "#"):
            i = rest.find(ch)
            if i != -1:
                cut = min(cut, i)
        url = url[: m.end()] + rest[:cut].replace("\\", "/") + rest[cut:]
    parts = urlsplit(url)
    scheme = parts.scheme.lower()
    if (
        scheme in _SPECIAL_SCHEMES
        and scheme != "file"
        and not parts.netloc
        and "//" not in url[: len(scheme) + 3]
    ):
        # WHATWG special-authority-ignore-slashes: 'http:page.html' /
        # 'https:/x/y' DO carry an authority despite the missing '//';
        # rust-url extracts a host here, so the rebuild must too
        # (ADVICE r1). 'file:' takes the separate file-state path and
        # is out of the crawl envelope.
        rest = url[len(scheme) + 1 :].lstrip("/\\")
        return parse_url(f"{scheme}://{rest}")
    host: str | None = None
    port: int | None = None
    if "//" in url[: len(scheme) + 3] or parts.netloc:
        # has an authority component
        host = (parts.hostname or "").lower()
        if scheme in _SPECIAL_SCHEMES and not host:
            raise UrlParseError(f"empty host: {url!r}")
        try:
            port = parts.port
        except ValueError as e:  # invalid port
            raise UrlParseError(str(e)) from e
        if port is not None and port == _SPECIAL_SCHEMES.get(scheme):
            port = None
    userinfo: str | None = None
    if host is not None and parts.username is not None:
        userinfo = parts.username
        if parts.password is not None:
            userinfo += f":{parts.password}"
    path = parts.path
    if host is not None and scheme in _SPECIAL_SCHEMES and path == "":
        path = "/"
    if host is not None or path.startswith("/"):
        path = _remove_dot_segments(path)
    path = _pct_encode(path, _PATH_ENCODE)
    query = _pct_encode(parts.query, _QUERY_ENCODE) if "?" in url else None
    fragment = _pct_encode(parts.fragment, _FRAG_ENCODE) if "#" in url else None
    return ParsedUrl(scheme, host, port, path, query, fragment, userinfo)


def join_url(base: ParsedUrl, candidate: str) -> ParsedUrl:
    """Resolve ``candidate`` against ``base`` (reference
    src/scraper.rs:193-196 uses rust-url join; we use WHATWG-compatible
    urljoin on the recomposed base)."""
    return parse_url(urljoin(base.as_str(), candidate))


def normalize_url(url: str) -> str:
    """Replace a leading ``///`` or ``//`` with ``https://`` — verbatim
    crash-avoidance quirk of the reference (src/scraper.rs:374-381);
    scheme-relative links are forced to https."""
    if url.startswith("///"):
        return "https://" + url[3:]
    if url.startswith("//"):
        return "https://" + url[2:]
    return url


def _rust_file_name(path: str) -> str:
    """Rust ``Path::file_name()`` on a unix path string, mapped to ""
    when None (reference src/url_helper.rs:20-22)."""
    trimmed = path.rstrip("/")
    name = trimmed.rsplit("/", 1)[-1]
    if name in ("", ".", ".."):
        return ""
    return name


def _rust_parent(path: str) -> str:
    """Rust ``Path::parent()`` mapped to "" when None
    (reference src/url_helper.rs:23-26)."""
    trimmed = path.rstrip("/")
    if trimmed in ("", "/"):
        return ""
    head = trimmed.rsplit("/", 1)[0]
    return head if head else ("/" if trimmed.startswith("/") else "")


def _has_extension(name: str) -> bool:
    """Rust ``Path::extension().is_some()``: a '.' embedded after the
    first character (leading-dot files have no extension)."""
    rest = name[1:] if name.startswith(".") else name
    return "." in rest


def to_path(url: ParsedUrl, with_fragment: bool) -> str:
    """Deterministic url→local-mirror-path mapping — rule-for-rule rebuild
    of reference src/url_helper.rs:10-45:

    - query string appended as ``__querystring__<query>``
    - path ending in '/'            → ``<parent>/index.html``
    - last segment with no extension → ``<path>/index_no_slash.html``
    - filename >255 chars           → ``md5hex(filename).html``
    - optional ``#fragment`` suffix when ``with_fragment``

    The output doubles as the rebuild's ``doc_id``.
    """
    domain = url.host or ""
    ppq = url.path
    if url.query is not None:
        ppq += "__querystring__" + url.query

    filename = _rust_file_name(ppq)
    parent = _rust_parent(ppq)

    if ppq.endswith("/"):
        filename = "index.html"
        parent = ppq.rstrip("/")
    elif not _has_extension(filename):
        parent = ppq.rstrip("/")
        filename = "index_no_slash.html"

    # BYTE length, not char count: the reference's filename.len() is a
    # Rust String byte length, and 255 bytes is also the real
    # filesystem name limit (ADVICE r1)
    if len(filename.encode("utf-8")) > FILE_NAME_MAX_LENGTH:
        # md5 here mirrors the reference's filename-collision hack
        # (src/url_helper.rs:36-39); not used for security.
        filename = hashlib.md5(filename.encode("utf-8")).hexdigest() + ".html"

    if url.fragment is not None and with_fragment:
        return f"{domain}{parent}/{filename}#{url.fragment}"
    return f"{domain}{parent}/{filename}"


def should_visit(candidate: str, include_visit: re.Pattern, exclude_visit: re.Pattern) -> bool:
    """Visit predicate on the RAW attribute string, pre-join
    (reference src/scraper.rs:353-369): regex filters first, then drop
    parseable URLs lacking a host or that cannot be a base (kills
    mailto:, javascript:, data:); keep unparseable strings (relative
    paths, resolved later by join)."""
    if exclude_visit.search(candidate) or not include_visit.search(candidate):
        return False
    try:
        u = parse_url(candidate)
    except UrlParseError:
        return True
    return u.has_host and not u.cannot_be_a_base


def is_on_another_domain(candidate: str, base: ParsedUrl) -> bool:
    """External-domain classifier on the raw candidate (reference
    src/scraper.rs:384-400): normalize the //-prefix quirk, then compare
    rust-url ``domain()`` values; unparseable (relative) → internal."""
    real = normalize_url(candidate)
    try:
        u = parse_url(real)
    except UrlParseError:
        return False
    return u.domain != base.domain


def depth_gate(
    is_external: bool, depth: int, ext_depth: int, max_depth: int, max_ext_depth: int
) -> tuple[bool, int, int]:
    """Depth budget (reference src/scraper.rs:203-215): internal links
    consume ``depth`` (-1 = infinite); external hops freeze ``depth`` and
    consume ``ext_depth``. Returns (enqueue?, child_depth, child_ext_depth)."""
    if not is_external:
        if max_depth == -1 or depth < max_depth:
            return True, depth + 1, ext_depth
        return False, 0, 0
    if max_ext_depth == -1 or ext_depth < max_ext_depth:
        return True, depth, ext_depth + 1
    return False, 0, 0


def relative_rewrite(source_path: str, dest_path: str) -> str:
    """Relative path from the source page's parent dir to the target path
    (reference src/scraper.rs:95-102, pathdiff::diff_paths semantics).
    ``dest_path`` may carry a ``#fragment`` suffix — treated opaquely as
    part of the last component, as the reference does."""
    source_parent = posixpath.dirname(source_path)
    return posixpath.relpath(dest_path, source_parent)


def url_of_path(doc_id: str, scheme: str = "http") -> str:
    """Inverse of ``to_path`` for the standard shapes (modulo the
    querystring/md5/fragment encodings, which are not invertible):

    - ``host/a/index.html``          → ``http://host/a/``
    - ``host/a/index_no_slash.html`` → ``http://host/a``
    - ``host/a/b.ext``               → ``http://host/a/b.ext``

    Double slashes from the root-file quirk collapse. Enables serving a
    documents table (doc_id + spans) as a crawlable web (SpanTableStore).
    """
    parts = [p for p in doc_id.split("/") if p]
    host, rest = parts[0], parts[1:]
    if rest and rest[-1] == "index.html":
        path = "/" + "/".join(rest[:-1])
        if not path.endswith("/"):
            path += "/"
    elif rest and rest[-1] == "index_no_slash.html":
        path = "/" + "/".join(rest[:-1])
    else:
        path = "/" + "/".join(rest)
    return f"{scheme}://{host}{path}"


# non-utm tracking parameters stripped by --canonicalize; any key
# starting with "utm_" (case-insensitive) is also stripped — GA4 keeps
# minting new utm_* names, so a prefix match is what the docs promise
TRACKING_PARAMS = frozenset(
    {"gclid", "fbclid", "msclkid", "mc_cid", "mc_eid"}
)


def _is_tracking_param(key: str) -> bool:
    k = key.lower()
    return k.startswith("utm_") or k in TRACKING_PARAMS


def canonical_url(url: str) -> str:
    """Canonical DEDUP KEY for opt-in ``--canonicalize`` mode: the
    parse already lowercases the host and drops default ports; on top
    of that the fragment is dropped, tracking parameters removed, and
    the remaining query pairs sorted — so ``?b=2&a=1&utm_source=x``
    and ``?a=1&b=2`` dedup to one fetch. Unparseable input returns
    unchanged (it will fail later stages on its own). The FETCHED url
    stays the first-discovered original; only the seen-key and shard
    routing use the canonical form."""
    try:
        p = parse_url(url)
    except UrlParseError:
        return url
    q = ""
    if p.query:
        pairs = [
            kv
            for kv in p.query.split("&")
            if kv and not _is_tracking_param(kv.split("=", 1)[0])
        ]
        pairs.sort()
        q = "&".join(pairs)
    out = f"{p.scheme}://"
    if p.userinfo:
        out += p.userinfo + "@"
    out += p.host or ""
    if p.port:
        out += f":{p.port}"
    out += p.path or "/"
    if q:
        out += "?" + q
    return out
