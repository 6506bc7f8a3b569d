"""HTML scan/rewrite/span-assembly tests, mirroring the reference's DOM
tests (src/dom.rs:56-76) and the handle_html semantics
(src/scraper.rs:145-228) on a replica of tests/fixtures/index.html."""

import re

from suckit_ray.htmlproc import process_html, scan_link_attributes, media_spans_for_asset
from suckit_ray.urlkit import parse_url

MATCH_ALL = re.compile(".*")
MATCH_NONE = re.compile("$^")

INDEX_HTML = """<!DOCTYPE html>
<html lang="en">
<head>
    <meta charset="UTF-8">
    <meta name="viewport" content="width=device-width, initial-scale=1.0">
    <title>Test page</title>
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


def test_scan_document_order_unquoted():
    # mirrors the reference's dom.rs find_urls_as_strings test
    url1 = "https://upload.wikimedia.org/wikipedia/commons/a%28b%29.jpg/800px.jpg"
    dom = f"<img src={url1}>\n            <img src=test>"
    refs = scan_link_attributes(dom)
    assert [r.value for r in refs] == [url1, "test"]


def test_scan_src_before_href_per_element():
    refs = scan_link_attributes('<a href="b.html" src="a.png">x</a>')
    assert [(r.attr, r.value) for r in refs] == [("src", "a.png"), ("href", "b.html")]


def test_scan_skips_comments_and_script():
    doc = (
        '<!-- <a href="ghost.html"> -->'
        '<script>var s = "<a href=\'ghost2.html\'>";</script>'
        '<a href="real.html">x</a>'
    )
    refs = scan_link_attributes(doc)
    assert [r.value for r in refs] == ["real.html"]


def test_scan_first_duplicate_attr_wins():
    refs = scan_link_attributes('<a href="one.html" href="two.html">x</a>')
    assert [r.value for r in refs] == ["one.html"]


def test_process_index_html_rewrites_and_outlinks():
    url = parse_url("http://site.test/")
    res = process_html(
        url, "site.test/index.html", INDEX_HTML.encode(), None, MATCH_ALL, MATCH_NONE
    )
    assert [o.raw for o in res.outlinks] == [
        "jpeg.jpg",
        "mp3.mp3",
        "file.txt",
        "https://google.com",
        "no_download_no_visit.html",
    ]
    assert [o.url for o in res.outlinks] == [
        "http://site.test/jpeg.jpg",
        "http://site.test/mp3.mp3",
        "http://site.test/file.txt",
        "https://google.com/",
        "http://site.test/no_download_no_visit.html",
    ]
    # root-level files carry the reference's double-slash parent quirk
    # (Rust Path::new("/jpeg.jpg").parent() == "/", src/url_helper.rs:23-26)
    assert [o.path for o in res.outlinks] == [
        "site.test//jpeg.jpg",
        "site.test//mp3.mp3",
        "site.test//file.txt",
        "google.com/index.html",
        "site.test//no_download_no_visit.html",
    ]
    assert [o.is_external for o in res.outlinks] == [False, False, False, True, False]

    out = res.body.decode()
    assert 'href="../google.com/index.html"' in out
    # sibling links rewrite to themselves → page is byte-stable
    assert 'href="jpeg.jpg"' in out
    assert res.body == INDEX_HTML.replace(
        "https://google.com", "../google.com/index.html"
    ).encode()


def test_process_index_html_spans_interleaved():
    url = parse_url("http://site.test/")
    res = process_html(
        url, "site.test/index.html", INDEX_HTML.encode(), None, MATCH_ALL, MATCH_NONE
    )
    kinds = [s["kind"] for s in res.spans]
    # alternating text / link spans: 5 href links on the page
    assert kinds == ["text", "link"] * 5 + ["text"]
    assert [s["offset"] for s in res.spans] == list(range(11))
    refs = [s["media_ref"] for s in res.spans if s["kind"] == "link"]
    assert refs == [
        "jpeg.jpg",
        "mp3.mp3",
        "file.txt",
        "../google.com/index.html",
        "no_download_no_visit.html",
    ]
    # reassembling text spans + media refs reproduces the rewritten page
    reassembled = "".join(
        s["text"] if s["kind"] == "text" else s["media_ref"] for s in res.spans
    )
    # spans drop the quotes around attribute values; compare via body round-trip
    assert reassembled.count("../google.com/index.html") == 1


def test_href_written_before_src_splices_in_text_order():
    """Round-3 review fix: a tag written `href=.. src=..` yields refs in
    kuchiki priority order (src first) but MUST splice in text position
    order — the old single-pass loop rewound `prev` and duplicated the
    bytes between the two attributes into the output."""
    url = parse_url("http://site.test/dir/page.html")
    doc = '<p>A</p><a href="one.html" src="two.png">x</a><p>B</p>'
    res = process_html(url, "site.test/dir/page.html", doc.encode(), None,
                       MATCH_ALL, MATCH_NONE)
    out = res.body.decode()
    # no duplicated markup: each literal chunk appears exactly once
    assert out.count("<p>A</p>") == 1
    assert out.count('">x</a>') == 1
    # rewritten values land in their own attribute slots
    href_val = re.search(r'href="([^"]*)"', out).group(1)
    src_val = re.search(r'src="([^"]*)"', out).group(1)
    assert href_val.endswith("one.html") and src_val.endswith("two.png")
    # ordinals keep kuchiki priority order: src outlink first
    assert [(o.ordinal, o.raw) for o in res.outlinks] == [
        (0, "two.png"), (1, "one.html")
    ]
    # spans are in text position order (href attr comes first in text)
    media_refs = [s["media_ref"] for s in res.spans if s["kind"] != "text"]
    assert media_refs == [href_val, src_val]
    kinds = [s["kind"] for s in res.spans]
    assert kinds == ["text", "link", "text", "media", "text"]


def test_visit_filter_leaves_attribute_untouched():
    url = parse_url("http://site.test/")
    include = re.compile(r"mp[3-4]")
    res = process_html(
        url, "site.test/index.html", INDEX_HTML.encode(), None, include, MATCH_NONE
    )
    assert [o.raw for o in res.outlinks] == ["mp3.mp3"]
    out = res.body.decode()
    assert 'href="jpeg.jpg"' in out  # untouched, still raw
    assert 'href="https://google.com"' in out


def test_charset_meta_round_trip_byte_identity():
    # windows-1252 page WITH meta charset → byte-identical mirror
    # (reference tests/charset_html_found.rs)
    body = (
        '<html><head>\n<meta content="text/html; charset=windows-1252" '
        'http-equiv="Content-Type">\n<title>T</title>\n</head>\n'
        "<body><p>Gamle Valebø pågår.</p></body></html>"
    ).encode("cp1252")
    res = process_html(
        parse_url("http://site.test/p.html"), "site.test/p.html", body, None,
        MATCH_ALL, MATCH_NONE,
    )
    assert res.charset == "windows-1252"
    assert res.body == body


def test_charset_http_header_round_trip():
    # no meta, charset from the HTTP header (reference tests/charset_http_found.rs)
    body = "<html><body><p>Valebø pågår</p></body></html>".encode("cp1252")
    res = process_html(
        parse_url("http://site.test/p.html"), "site.test/p.html", body,
        "windows-1252", MATCH_ALL, MATCH_NONE,
    )
    assert res.body == body


def test_charset_absent_bytes_differ():
    # no charset info at all → UTF-8 assumed → U+FFFD replacement →
    # mirrored bytes differ (reference tests/charset_*_not_found.rs)
    body = "<html><body><p>Valebø pågår</p></body></html>".encode("cp1252")
    res = process_html(
        parse_url("http://site.test/p.html"), "site.test/p.html", body, None,
        MATCH_ALL, MATCH_NONE,
    )
    assert res.charset == "utf-8"
    assert res.body != body


def test_asset_span():
    assert media_spans_for_asset("site.test/jpeg.jpg") == [
        {"kind": "media", "text": "", "media_ref": "site.test/jpeg.jpg", "offset": 0}
    ]


def test_scan_skips_rcdata_title_textarea():
    doc = (
        "<title>not <a href='ghost.html'> a link</title>"
        "<textarea><a href='ghost2.html'></textarea>"
        '<a href="real.html">x</a>'
    )
    assert [r.value for r in scan_link_attributes(doc)] == ["real.html"]
