"""Golden vectors for the URL kernels, ported from the reference's own
unit tests (src/url_helper.rs:52-126) plus predicate semantics from
src/scraper.rs:353-400."""

import re

import pytest

from suckit_ray import urlkit
from suckit_ray.urlkit import (
    ParsedUrl,
    UrlParseError,
    depth_gate,
    is_on_another_domain,
    join_url,
    normalize_url,
    parse_url,
    relative_rewrite,
    should_visit,
    to_path,
)

MATCH_ALL = re.compile(".*")
MATCH_NONE = re.compile("$^")


# --- to_path golden vectors (reference src/url_helper.rs:52-126) ---

LONG = "a" * 256 + ".html"

TO_PATH_VECTORS = [
    ("https://lwn.net/", False, "lwn.net/index.html"),
    ("https://lwn.net", False, "lwn.net/index.html"),
    ("https://lwn.net/Kernel/index.html", False, "lwn.net/Kernel/index.html"),
    ("https://lwn.net/Kernel/", False, "lwn.net/Kernel/index.html"),
    ("https://lwn.net/Kernel", False, "lwn.net/Kernel/index_no_slash.html"),
    ("https://lwn.net/Kernel/#fragment", True, "lwn.net/Kernel/index.html#fragment"),
    ("https://lwn.net/Kernel/#fragment", False, "lwn.net/Kernel/index.html"),
    (
        f"https://lwn.net/Kernel/{LONG}",
        False,
        "lwn.net/Kernel/5ca82767de71fe8930587e82bb994903.html",
    ),
    (
        "https://google.com/foobar/platform-redirect/?next=/configuration/releases/",
        False,
        "google.com/foobar/platform-redirect/__querystring__next=/configuration/releases/index.html",
    ),
]


@pytest.mark.parametrize("url,with_fragment,expected", TO_PATH_VECTORS)
def test_to_path_golden(url, with_fragment, expected):
    assert to_path(parse_url(url), with_fragment) == expected


def test_to_path_root_file_double_slash_quirk():
    # Rust Path::new("/index.html").parent() == Some("/") → the reference
    # produces a double slash for root-level files; preserved verbatim.
    assert to_path(parse_url("https://lwn.net/index.html"), False) == "lwn.net//index.html"


# --- parse_url / ParsedUrl ---

def test_parse_url_basics():
    u = parse_url("HTTP://Site.Test:80/a/b?q=1#frag")
    assert u.scheme == "http"
    assert u.host == "site.test"
    assert u.port is None  # default port stripped
    assert u.path == "/a/b"
    assert u.query == "q=1"
    assert u.fragment == "frag"
    assert u.as_str() == "http://site.test/a/b?q=1#frag"


def test_parse_url_empty_path_special_scheme():
    assert parse_url("http://site.test").as_str() == "http://site.test/"


def test_parse_url_relative_raises():
    for s in ["foo.html", "../x", "/abs/path", "foo/bar"]:
        with pytest.raises(UrlParseError):
            parse_url(s)


def test_cannot_be_a_base():
    assert parse_url("mailto:someone@x.test").cannot_be_a_base
    assert parse_url("javascript:void(0)").cannot_be_a_base
    assert parse_url("data:text/plain,hi").cannot_be_a_base
    assert not parse_url("https://x.test/a").cannot_be_a_base


def test_domain_ip_is_none():
    assert parse_url("http://0.0.0.0:4444/x").domain is None
    assert parse_url("http://site.test/x").domain == "site.test"


# --- normalize_url (reference src/scraper.rs:374-381) ---

def test_normalize_url():
    assert normalize_url("///site.test/") == "https://site.test/"
    assert normalize_url("//site.test/a") == "https://site.test/a"
    assert normalize_url("/rooted") == "/rooted"
    assert normalize_url("plain.html") == "plain.html"


# --- should_visit (reference src/scraper.rs:353-369) ---

def test_should_visit_pseudo_links_dropped():
    for bad in ["mailto:a@b.c", "javascript:void(0)", "data:text/plain,x"]:
        assert not should_visit(bad, MATCH_ALL, MATCH_NONE)


def test_should_visit_relative_kept():
    for ok in ["foo.html", "../up/x.jpg", "/rooted/y", "//scheme.relative/z"]:
        assert should_visit(ok, MATCH_ALL, MATCH_NONE)


def test_should_visit_absolute_kept():
    assert should_visit("https://google.com", MATCH_ALL, MATCH_NONE)


def test_should_visit_filters_on_raw_string():
    inc = re.compile(r"mp[3-4]")
    assert should_visit("mp3.mp3", inc, MATCH_NONE)
    assert not should_visit("jpeg.jpg", inc, MATCH_NONE)
    exc = re.compile(r"jpe?g")
    assert not should_visit("jpeg.jpg", MATCH_ALL, exc)
    assert should_visit("file.txt", MATCH_ALL, exc)


# --- is_on_another_domain (reference src/scraper.rs:384-400) ---

def test_is_external():
    base = parse_url("http://site.test/index.html")
    assert is_on_another_domain("https://google.com", base)
    assert not is_on_another_domain("other.html", base)  # relative → internal
    assert not is_on_another_domain("http://site.test/deep/x.html", base)
    # scheme-relative to another host is external (normalized to https)
    assert is_on_another_domain("//elsewhere.test/x", base)


def test_is_external_ip_hosts_match_as_none():
    # rust-url domain() is None for IP hosts on both sides → equal → internal
    base = parse_url("http://0.0.0.0:4444/index.html")
    assert not is_on_another_domain("http://0.0.0.0:4444/page.html", base)


# --- depth gate (reference src/scraper.rs:203-215) ---

def test_depth_gate_internal():
    assert depth_gate(False, 0, 0, -1, 0) == (True, 1, 0)
    assert depth_gate(False, 4, 0, 5, 0) == (True, 5, 0)
    assert depth_gate(False, 5, 0, 5, 0)[0] is False


def test_depth_gate_external():
    assert depth_gate(True, 3, 0, 5, 1) == (True, 3, 1)  # depth frozen
    assert depth_gate(True, 3, 1, 5, 1)[0] is False
    assert depth_gate(True, 3, 9, 5, -1) == (True, 3, 10)


# --- join + relative rewrite ---

def test_join_url():
    base = parse_url("http://site.test/a/index.html")
    assert join_url(base, "foo.html").as_str() == "http://site.test/a/foo.html"
    assert join_url(base, "../up.html").as_str() == "http://site.test/up.html"
    assert join_url(base, "https://google.com").as_str() == "https://google.com/"
    assert join_url(base, "#frag").as_str() == "http://site.test/a/index.html#frag"


def test_relative_rewrite():
    # sibling file: unchanged name
    assert relative_rewrite("site.test/index.html", "site.test/jpeg.jpg") == "jpeg.jpg"
    # across hosts: ../ to the other host dir
    assert (
        relative_rewrite("site.test/index.html", "google.com/index.html")
        == "../google.com/index.html"
    )
    # fragment preserved opaquely
    assert (
        relative_rewrite("site.test/a/index.html", "site.test/a/index.html#f")
        == "index.html#f"
    )
    # deeper source
    assert relative_rewrite("s.test/a/b/c.html", "s.test/x.html") == "../../x.html"


class TestWhatwgEdgeVectors:
    """Round-3 (VERDICT r2 item 7): real-web URL shapes the synthetic
    corpus never exercises, pinned as a vector table the way the 8
    reference url->path vectors are. Expected values match rust-url /
    WHATWG serialization."""

    PARSE_VECTORS = [
        # default-port normalization
        ("http://h.test:80/x", "http://h.test/x"),
        ("https://h.test:443/x", "https://h.test/x"),
        ("http://h.test:8080/x", "http://h.test:8080/x"),
        # userinfo survives serialization
        ("http://u:pw@h.test/x", "http://u:pw@h.test/x"),
        ("http://u@h.test/x", "http://u@h.test/x"),
        # WHATWG percent-encoding (UTF-8, existing escapes untouched)
        ("http://h.test/a b/é", "http://h.test/a%20b/%C3%A9"),
        ("http://h.test/%20x", "http://h.test/%20x"),
        ("http://h.test/p?q=a b#f g", "http://h.test/p?q=a%20b#f%20g"),
        ('http://h.test/a"b{c}', "http://h.test/a%22b%7Bc%7D"),
        # dot-segment removal at parse (rust-url parity)
        ("http://h.test/a/./b/../c", "http://h.test/a/c"),
        ("http://h.test/a/b/..", "http://h.test/a/"),
        ("http://h.test/..", "http://h.test/"),
        # backslashes are slashes in special-scheme URLs — but ONLY in
        # the authority/path states; query and fragment keep them
        # (percent-encoded on serialize), as rust-url does
        ("http:\\\\h.test\\x\\y", "http://h.test/x/y"),
        ("http://h.test\\x", "http://h.test/x"),
        ("http://h.test/p?a\\b", "http://h.test/p?a\\b"),
        ("http://h.test/p#f\\g", "http://h.test/p#f\\g"),
        ("http://h.test/p?x=1#\\q", "http://h.test/p?x=1#\\q"),
        # empty path -> "/"
        ("http://h.test", "http://h.test/"),
    ]

    def test_parse_vectors(self):
        from suckit_ray.urlkit import parse_url

        for raw, want in self.PARSE_VECTORS:
            assert parse_url(raw).as_str() == want, raw

    JOIN_VECTORS = [
        ("a\\b.html", "http://h.test/d/a/b.html"),
        ("..\\up.html", "http://h.test/up.html"),
        ("/root.html", "http://h.test/root.html"),
        ("?q=1", "http://h.test/d/page.html?q=1"),
        ("../../../over.html", "http://h.test/over.html"),
        ("sp ace.html", "http://h.test/d/sp%20ace.html"),
    ]

    def test_join_vectors(self):
        from suckit_ray.urlkit import join_url, parse_url

        base = parse_url("http://h.test/d/page.html")
        for cand, want in self.JOIN_VECTORS:
            assert join_url(base, cand).as_str() == want, cand

    def test_to_path_sees_normalized_path(self):
        from suckit_ray.urlkit import parse_url, to_path

        # the mirror path observes the WHATWG-normalized (encoded,
        # dot-free) path, like the reference's rust-url .path()
        assert to_path(parse_url("http://h.test/a b.html"), False) == (
            "h.test//a%20b.html"
        )
        assert to_path(parse_url("http://h.test/a/../b.html"), False) == (
            "h.test//b.html"
        )
