"""parse_auth vectors from the reference's unit tests
(src/downloader.rs:200-228)."""

import pytest

from suckit_ray.authkit import AuthParseError, build_auth_map, parse_auth_chunk
from suckit_ray.urlkit import parse_url

ORIGIN = parse_url("https://example.com/")


def test_empty_username_invalid():
    with pytest.raises(AuthParseError):
        parse_auth_chunk(["", "pw"], ORIGIN)


def test_username_only_defaults_host():
    assert parse_auth_chunk(["username"], ORIGIN) == ("username", None, "example.com")


def test_full_chunk_with_host():
    assert parse_auth_chunk(["un", "pw", "h", "t"], ORIGIN) == ("un", "pw", "h")


def test_user_pass_defaults_host():
    assert parse_auth_chunk(["un", "pw"], ORIGIN) == ("un", "pw", "example.com")


def test_empty_host_defaults_to_origin():
    assert parse_auth_chunk(["un", "pw", ""], ORIGIN) == ("un", "pw", "example.com")


def test_build_auth_map_chunks_of_three():
    m = build_auth_map(["u1", "p1", "h1", "u2", "p2", "h2"], ORIGIN)
    assert m == {"h1": ("u1", "p1"), "h2": ("u2", "p2")}


def test_build_auth_map_short_tail():
    m = build_auth_map(["u1", "p1"], ORIGIN)
    assert m == {"example.com": ("u1", "p1")}
