"""Charset sniffing/transcoding and Content-Type parsing kernels.

Rebuilds, with identical regexes and precedence:

- ``find_charset``       — reference src/scraper.rs:107-123 (meta regex,
  first match wins, falls back to the HTTP-header charset)
- ``resolve_encoding``   — reference src/scraper.rs:164-173
  (encoding_rs label lookup; unknown label → warn + UTF-8)
- ``decode_body`` / ``encode_body`` — reference src/scraper.rs:126-137 +
  the round-trip at :175-179 and :221-227. encoding_rs decodes with
  U+FFFD replacement and encodes unmappable characters as HTML numeric
  references — Python's errors="replace" / "xmlcharrefreplace" match.
- ``parse_content_type`` — reference src/downloader.rs:131-147
- ``is_html``            — reference src/downloader.rs:90-92
- ``extract_filename``   — reference src/downloader.rs:95-104
"""

from __future__ import annotations

import codecs
import re

# Exact regex of the reference (src/scraper.rs:110); applied to the raw
# bytes viewed as best-effort text, first match wins.
_META_CHARSET_RE = re.compile(r"""<meta.*charset\s*=\s*["']?([^"'\s;>]+).*>""")

# Exact regexes of the reference (src/downloader.rs:124-129).
_DATA_TYPE_RE = re.compile(r"^.*(\b[a-z]+/[a-z-+\.]+).*$")
_HDR_CHARSET_RE = re.compile(r"""^.*charset\s*=\s*["']?([^"'\s;]+).*$""")

# WHATWG encoding label → Python codec name, for the labels that differ
# from Python's own alias table (the WHATWG table folds the latin1/ascii
# family into windows-1252, which encoding_rs implements).
_WHATWG_LABEL_OVERRIDES = {
    "latin1": "cp1252",
    "latin-1": "cp1252",
    "iso-8859-1": "cp1252",
    "iso8859-1": "cp1252",
    "iso88591": "cp1252",
    "l1": "cp1252",
    "ascii": "cp1252",
    "us-ascii": "cp1252",
    "unicode-1-1-utf-8": "utf-8",
    "unicode11utf8": "utf-8",
    "unicode20utf8": "utf-8",
    "x-unicode20utf8": "utf-8",
}


def find_charset(data: bytes, http_charset: str | None) -> str | None:
    """Charset of an HTML page: first ``<meta ... charset=...>`` match in
    the raw bytes (viewed as latin-1 text so every byte round-trips, the
    analogue of the reference's unchecked-UTF-8 view), else the
    HTTP-header charset, else None. Lowercased."""
    text = data.decode("latin-1")
    m = _META_CHARSET_RE.search(text)
    if m:
        return m.group(1).lower()
    return http_charset


def needs_charset_conversion(charset_label: str) -> bool:
    """Reference src/scraper.rs:140-142: convert unless the label string
    is exactly "utf-8"."""
    return charset_label != "utf-8"


def resolve_encoding(label: str) -> str | None:
    """Map a charset label to a Python codec name; None when unsupported
    (caller warns and falls back to UTF-8, reference src/scraper.rs:164-173)."""
    key = label.strip().lower()
    if key in _WHATWG_LABEL_OVERRIDES:
        return _WHATWG_LABEL_OVERRIDES[key]
    try:
        return codecs.lookup(key).name
    except LookupError:
        return None


def decode_body(data: bytes, codec: str) -> str:
    """Decode with U+FFFD replacement (encoding_rs decode semantics)."""
    return data.decode(codec, errors="replace")


def encode_body(text: str, codec: str) -> bytes:
    """Encode, replacing unmappable characters with HTML numeric
    references (encoding_rs encode semantics)."""
    return text.encode(codec, errors="xmlcharrefreplace")


def is_html(content_type: str) -> bool:
    return "text/html" in content_type


def parse_content_type(header: str | None) -> tuple[str, str | None]:
    """Split a Content-Type header into (data_type, charset), defaulting
    to ("text/html", None) when the header is missing or unmatched —
    reference src/downloader.rs:131-147."""
    if header is None:
        return "text/html", None
    m = _DATA_TYPE_RE.match(header)
    data_type = m.group(1).lower() if m else "text/html"
    cm = _HDR_CHARSET_RE.match(header)
    charset = cm.group(1).lower() if cm else None
    return data_type, charset


def extract_filename(content_disposition: str | None) -> str | None:
    """Substring after the first '=' of a Content-Disposition header
    (reference src/downloader.rs:95-104). The reference panics when the
    header has no '='; we return None instead (continue-on-error
    semantics)."""
    if content_disposition is None:
        return None
    idx = content_disposition.find("=")
    if idx < 0:
        return None
    return content_disposition[idx + 1 :]
