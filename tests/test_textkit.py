"""Charset + Content-Type kernel vectors, from the reference's unit
tests (src/scraper.rs:467-489) and header-parsing semantics
(src/downloader.rs:124-147)."""

from suckit_ray import textkit


def test_find_charset_double_quotes():
    assert textkit.find_charset(b'<meta charset="UTF-8">', None) == "utf-8"
    assert (
        textkit.find_charset(b'<meta charset="windows-1252">', None) == "windows-1252"
    )


def test_find_charset_single_quotes():
    assert textkit.find_charset(b"<meta charset='UTF-8'>", None) == "utf-8"
    assert (
        textkit.find_charset(b"<meta charset='windows-1252'>", None) == "windows-1252"
    )


def test_find_charset_http_equiv_content_type():
    body = b'<meta content="text/html; charset=windows-1252" http-equiv="Content-Type">'
    assert textkit.find_charset(body, None) == "windows-1252"


def test_find_charset_precedence_meta_over_http():
    body = b'<meta charset="utf-8">'
    assert textkit.find_charset(body, "windows-1252") == "utf-8"
    assert textkit.find_charset(b"<p>nothing</p>", "windows-1252") == "windows-1252"
    assert textkit.find_charset(b"<p>nothing</p>", None) is None


def test_parse_content_type():
    assert textkit.parse_content_type("text/html; charset=utf-8") == ("text/html", "utf-8")
    assert textkit.parse_content_type("image/jpeg") == ("image/jpeg", None)
    assert textkit.parse_content_type(None) == ("text/html", None)
    # uppercase mime does not match the reference's [a-z] regex → default
    assert textkit.parse_content_type("TEXT/HTML")[0] == "text/html"
    # bare charset header (the charset_http_found.rs fixture injects
    # "Content-Type: charset=windows-1252"): no mime match → text/html
    assert textkit.parse_content_type("charset=windows-1252") == (
        "text/html",
        "windows-1252",
    )


def test_is_html():
    assert textkit.is_html("text/html")
    assert textkit.is_html("text/html; charset=utf-8")
    assert not textkit.is_html("image/jpeg")


def test_extract_filename():
    assert textkit.extract_filename("attachment; filename=report.pdf") == "report.pdf"
    assert textkit.extract_filename(None) is None
    assert textkit.extract_filename("attachment") is None


def test_needs_conversion():
    assert not textkit.needs_charset_conversion("utf-8")
    assert textkit.needs_charset_conversion("windows-1252")
    assert textkit.needs_charset_conversion("utf8")  # label-string compare, not resolved


def test_resolve_encoding_whatwg_labels():
    assert textkit.resolve_encoding("latin1") == "cp1252"
    assert textkit.resolve_encoding("iso-8859-1") == "cp1252"
    assert textkit.resolve_encoding("windows-1252") == "cp1252"
    assert textkit.resolve_encoding("UTF-8") == "utf-8"
    assert textkit.resolve_encoding("no-such-charset") is None


def test_windows_1252_round_trip():
    raw = "Gamle Valebø pågår".encode("cp1252")
    text = textkit.decode_body(raw, "cp1252")
    assert textkit.encode_body(text, "cp1252") == raw


def test_invalid_utf8_replacement_changes_bytes():
    # windows-1252 high bytes are invalid UTF-8 → U+FFFD on decode →
    # different bytes after re-encode (the charset_*_not_found behavior)
    raw = "Valebø".encode("cp1252")
    text = textkit.decode_body(raw, "utf-8")
    assert "�" in text
    assert text.encode("utf-8") != raw
