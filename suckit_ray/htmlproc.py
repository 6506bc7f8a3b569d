"""HTML link extraction, rewriting, and interleaved-span assembly.

The reference parses each page into a mutable DOM, rewrites every
``src``/``href`` attribute that passes the visit filter to a relative
local path, and re-serializes (reference src/dom.rs:35-53,
src/scraper.rs:145-228). This rebuild is **splice-based**: a single
linear scan locates attribute values in document order and rewrites them
in place, leaving every other byte of the page untouched. That is both
faster (no DOM materialization per page — pure string ops inside a
vectorized ``map_batches``) and makes the charset round-trip
byte-equality tests of the reference hold structurally
(tests/charset_*.rs: pages round-trip byte-identical when a charset is
known, and differ only through U+FFFD replacement when not).

Attribute traversal order mirrors kuchiki's ``[src],[href]`` selector
walk (reference src/dom.rs:7-8,43-50): elements in document order; for
each element ``src`` before ``href`` regardless of attribute order in
the markup; first occurrence wins on duplicates.

The per-document output is the engine's interleaved text+media span
sequence (BASELINE.json input_hint): alternating ``kind="text"`` spans
(markup, ``media_ref=""``) and ``kind="media"``(src)/``kind="link"``
(href) spans (``text=""``, ``media_ref=`` the rewritten relative path),
``offset`` = ordinal. Empty markup chunks between adjacent attributes
are not emitted.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from suckit_ray import textkit, urlkit
from suckit_ray.urlkit import ParsedUrl

# script/style are rawtext; title/textarea are RCDATA — html5ever parses
# none of their contents as tags, so neither do we
_RAWTEXT_TAGS = {"script", "style", "title", "textarea"}

_ATTR_RE = re.compile(
    r"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)         # attribute name
        (?:\s*=\s*
            ("([^"]*)"|'([^']*)'|([^\s>]*))  # "quoted" | 'quoted' | unquoted
        )?""",
    re.VERBOSE,
)

_TAG_NAME_RE = re.compile(r"<([a-zA-Z][-a-zA-Z0-9:]*)")


@dataclass(frozen=True)
class AttrRef:
    """A src/href attribute value located in the document text."""

    start: int      # absolute offset of the value (excluding quotes)
    end: int
    value: str
    attr: str       # "src" | "href"
    nofollow: bool = False  # tag carries rel~="nofollow" (href only)


# page-level <meta name="robots" content="...nofollow..."> — attribute
# order varies, so match the tag then read its content attr
_META_TAG_RE = re.compile(r"<meta\b[^>]*>", re.IGNORECASE)
_META_NAME_ROBOTS_RE = re.compile(
    r"""\bname\s*=\s*["']?robots["'\s>]""", re.IGNORECASE
)
_META_CONTENT_RE = re.compile(
    r"""\bcontent\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]*))""", re.IGNORECASE
)
_REL_SPLIT_RE = re.compile(r"[\s,]+")


_META_HTTP_EQUIV_REFRESH_RE = re.compile(
    r"""\bhttp-equiv\s*=\s*["']?refresh["'\s>]""", re.IGNORECASE
)
_REFRESH_URL_RE = re.compile(
    r"""^\s*\d*[\d.]*\s*(?:;|,)\s*url\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]*))""",
    re.IGNORECASE,
)


def meta_refresh_targets(text: str) -> list[str]:
    """URLs declared by <meta http-equiv=refresh content="N; url=...">
    — the client-side redirect real sites use instead of HTTP 3xx.
    Used only under ``follow_meta_refresh``: targets become frontier
    candidates (subject to the same visit/depth gates as markup
    links); the content attribute itself is NOT rewritten (there is no
    src/href to splice — the mirror keeps the original directive, as
    the reference's DOM walk would)."""
    out: list[str] = []
    for m in _META_TAG_RE.finditer(text):
        tag = m.group(0)
        if not _META_HTTP_EQUIV_REFRESH_RE.search(tag):
            continue
        c = _META_CONTENT_RE.search(tag)
        if not c:
            continue
        content = c.group(2) or c.group(3) or c.group(4) or ""
        u = _REFRESH_URL_RE.match(content)
        if u:
            target = u.group(2) or u.group(3) or u.group(4) or ""
            if target:
                out.append(target)
    return out


def page_meta_nofollow(text: str) -> bool:
    """True when the page declares <meta name=robots> with a nofollow
    token — the page-level form of rel=nofollow (robots exclusion
    protocol, public). Lightweight scan used only under
    ``honor_nofollow``; a meta tag inside a comment/rawtext block
    counts, which errs toward not crawling (the safe direction)."""
    for m in _META_TAG_RE.finditer(text):
        tag = m.group(0)
        if not _META_NAME_ROBOTS_RE.search(tag):
            continue
        c = _META_CONTENT_RE.search(tag)
        if not c:
            continue
        content = c.group(2) or c.group(3) or c.group(4) or ""
        toks = {t.lower() for t in _REL_SPLIT_RE.split(content) if t}
        if "nofollow" in toks or "none" in toks:
            return True
    return False


def scan_link_attributes(text: str) -> list[AttrRef]:
    """Locate every ``src``/``href`` attribute value in element document
    order, skipping comments, declarations, end tags, and the contents
    of <script>/<style>. Per element, ``src`` is reported before
    ``href`` (kuchiki CSS_ATTRIBUTES order, reference src/dom.rs:8)."""
    refs: list[AttrRef] = []
    pos = 0
    n = len(text)
    lower = text.lower()  # once: per-rawtext-tag lowering is O(n·tags)
    while pos < n:
        lt = text.find("<", pos)
        if lt < 0:
            break
        if text.startswith("<!--", lt):
            end = text.find("-->", lt + 4)
            pos = n if end < 0 else end + 3
            continue
        m = _TAG_NAME_RE.match(text, lt)
        if not m:
            # "</...", "<!...", "<?..." or stray "<": skip to next ">"
            gt = text.find(">", lt + 1)
            pos = n if gt < 0 else gt + 1
            continue
        tag_name = m.group(1).lower()
        # find the tag end, honoring quoted attribute values
        i = m.end()
        quote: str | None = None
        while i < n:
            c = text[i]
            if quote:
                if c == quote:
                    quote = None
            elif c in "\"'":
                quote = c
            elif c == ">":
                break
            i += 1
        tag_end = i  # index of '>' (or n)
        tag_body = text[m.end() : tag_end]
        found: dict[str, AttrRef] = {}
        rel_value: str | None = None
        for am in _ATTR_RE.finditer(tag_body):
            name = am.group(1).lower()
            if name == "rel" and rel_value is None and am.group(2) is not None:
                rel_value = am.group(3) or am.group(4) or am.group(5) or ""
                continue
            if name not in ("src", "href") or name in found or am.group(2) is None:
                continue
            if am.group(3) is not None:
                vstart, vend = am.start(3), am.end(3)
                value = am.group(3)
            elif am.group(4) is not None:
                vstart, vend = am.start(4), am.end(4)
                value = am.group(4)
            else:
                vstart, vend = am.start(5), am.end(5)
                value = am.group(5)
            found[name] = AttrRef(
                start=m.end() + vstart, end=m.end() + vend, value=value, attr=name
            )
        if (
            "href" in found
            and rel_value
            and "nofollow"
            in {t.lower() for t in _REL_SPLIT_RE.split(rel_value) if t}
        ):
            f = found["href"]
            found["href"] = AttrRef(
                start=f.start, end=f.end, value=f.value, attr=f.attr,
                nofollow=True,
            )
        for name in ("src", "href"):
            if name in found:
                refs.append(found[name])
        pos = tag_end + 1
        if tag_name in _RAWTEXT_TAGS and not tag_body.rstrip().endswith("/"):
            close = lower.find(f"</{tag_name}", pos)
            if close < 0:
                break
            gt = text.find(">", close)
            pos = n if gt < 0 else gt + 1
    return refs


@dataclass
class Outlink:
    ordinal: int            # document-order position among kept candidates
    raw: str                # raw attribute string
    url: str                # joined absolute URL (fragment-inclusive seen key)
    path: str               # to_path(joined, with_fragment=False) — the doc_id
    is_external: bool
    host: str
    nofollow: bool = False  # honor_nofollow: rewrite but never enqueue


@dataclass
class HtmlResult:
    body: bytes                     # rewritten, re-encoded page bytes
    spans: list[dict]               # interleaved text/media/link spans
    outlinks: list[Outlink]
    charset: str                    # resolved source charset label
    errors: list[str]


def process_html(
    page_url: ParsedUrl,
    source_path: str,
    raw: bytes,
    http_charset: str | None,
    include_visit: re.Pattern,
    exclude_visit: re.Pattern,
    honor_nofollow: bool = False,
    follow_meta_refresh: bool = False,
) -> HtmlResult:
    """Full HTML handling for one page — the rebuild of
    reference src/scraper.rs:145-228 (handle_html):

    1. charset sniff (meta > HTTP header > utf-8) and decode
    2. locate src/href candidates in document order
    3. filter with ``should_visit`` on the RAW string
    4. normalize → join → to_path; rewrite the attribute in place to the
       relative path from the source page's parent dir (fragment-preserving)
    5. emit outlinks (fragment-inclusive URL key + fragment-free path)
    6. re-encode to the source charset; assemble the span sequence
    """
    errors: list[str] = []

    charset_label = textkit.find_charset(raw, http_charset)
    if charset_label is None:
        charset_label = "utf-8"
    convert = textkit.needs_charset_conversion(charset_label)
    codec = textkit.resolve_encoding(charset_label)
    if codec is None:
        codec = "utf-8"
    text = textkit.decode_body(raw, codec if convert else "utf-8")

    refs = scan_link_attributes(text)
    # page-level meta robots nofollow poisons every href candidate;
    # rewriting is unaffected (the mirror still renders the anchors)
    page_nofollow = honor_nofollow and page_meta_nofollow(text)

    pieces: list[str] = []
    spans: list[dict] = []
    outlinks: list[Outlink] = []
    prev = 0
    ordinal = 0

    def emit_text(chunk: str) -> None:
        if chunk:
            spans.append(
                {"kind": "text", "text": chunk, "media_ref": "", "offset": len(spans)}
            )

    # Pass 1 in refs order — src-before-href per element (kuchiki
    # CSS_ATTRIBUTES order) — so OUTLINK ordinals keep reference
    # parity. The splice itself must run in ascending text position
    # (pass 2): a tag written `<a href=.. src=..>` otherwise rewinds
    # `prev` and duplicates page bytes into the output.
    kept: list[tuple[AttrRef, str]] = []
    for ref in refs:
        if not urlkit.should_visit(ref.value, include_visit, exclude_visit):
            continue
        normalized = urlkit.normalize_url(ref.value)
        try:
            joined = urlkit.join_url(page_url, normalized)
        except urlkit.UrlParseError as e:
            # reference panics on join failure (src/scraper.rs:195);
            # we record and leave the attribute untouched.
            errors.append(f"join failed for {ref.value!r}: {e}")
            continue
        path_with_frag = urlkit.to_path(joined, with_fragment=True)
        path_no_frag = urlkit.to_path(joined, with_fragment=False)
        external = urlkit.is_on_another_domain(ref.value, page_url)
        rewritten = urlkit.relative_rewrite(source_path, path_with_frag)

        outlinks.append(
            Outlink(
                ordinal=ordinal,
                raw=ref.value,
                url=joined.as_str(),
                path=path_no_frag,
                is_external=external,
                host=joined.host or "",
                nofollow=honor_nofollow
                and ref.attr == "href"
                and (ref.nofollow or page_nofollow),
            )
        )
        kept.append((ref, rewritten))
        ordinal += 1

    if follow_meta_refresh:
        # client-side redirects become candidates through the SAME
        # visit/normalize/join pipeline as markup links; no span, no
        # rewrite (nothing to splice), ordinals continue after markup
        for target in meta_refresh_targets(text):
            if not urlkit.should_visit(target, include_visit, exclude_visit):
                continue
            normalized = urlkit.normalize_url(target)
            try:
                joined = urlkit.join_url(page_url, normalized)
            except urlkit.UrlParseError as e:
                errors.append(f"join failed for {target!r}: {e}")
                continue
            outlinks.append(
                Outlink(
                    ordinal=ordinal,
                    raw=target,
                    url=joined.as_str(),
                    path=urlkit.to_path(joined, with_fragment=False),
                    is_external=urlkit.is_on_another_domain(
                        target, page_url
                    ),
                    host=joined.host or "",
                    nofollow=honor_nofollow and page_nofollow,
                )
            )
            ordinal += 1

    for ref, rewritten in sorted(kept, key=lambda kr: kr[0].start):
        emit_text(text[prev : ref.start])
        spans.append(
            {
                "kind": "media" if ref.attr == "src" else "link",
                "text": "",
                "media_ref": rewritten,
                "offset": len(spans),
            }
        )
        pieces.append(text[prev : ref.start])
        pieces.append(rewritten)
        prev = ref.end

    emit_text(text[prev:])
    pieces.append(text[prev:])
    out_text = "".join(pieces)

    out_bytes = (
        textkit.encode_body(out_text, codec) if convert else out_text.encode("utf-8")
    )
    return HtmlResult(
        body=out_bytes,
        spans=spans,
        outlinks=outlinks,
        charset=charset_label,
        errors=errors,
    )


def media_spans_for_asset(doc_id: str) -> list[dict]:
    """A non-HTML asset is one row with a single media span referencing
    its stored bytes (FIXTURES.md §3)."""
    return [{"kind": "media", "text": "", "media_ref": doc_id, "offset": 0}]


def reassemble_spans(spans: list[dict]) -> str:
    """Inverse of span assembly: concatenating text chunks and media
    refs in offset order reproduces the rewritten document text exactly
    (only EMPTY text chunks are ever omitted during assembly, so the
    concatenation is lossless). This is what makes the interleaved-span
    table a faithful document representation rather than a projection."""
    return "".join(
        s["text"] if s["kind"] == "text" else s["media_ref"]
        for s in sorted(spans, key=lambda s: s["offset"])
    )
