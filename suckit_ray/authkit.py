"""HTTP basic-auth credential parsing — reference src/downloader.rs:22-52.

The CLI-style auth list is chunked by 3 into (username, password, host)
with empty strings meaning None and the host defaulting to the origin's
host. The resulting host→(user, password) map is tiny and is broadcast
into every fetch actor (no shuffle join — reference J1 lookup,
src/downloader.rs:107-113).
"""

from __future__ import annotations

from suckit_ray.urlkit import ParsedUrl

AUTH_CHUNK_SIZE = 3


class AuthParseError(ValueError):
    pass


def parse_auth_chunk(
    chunk: list[str], origin: ParsedUrl
) -> tuple[str, str | None, str]:
    """One (username, password?, host?) chunk → (username, password, host).
    Empty strings → None; missing host → origin host. Invalid
    combinations (e.g. empty username) raise, as the reference errors."""
    vals: list[str | None] = [None if s == "" else s for s in chunk]
    origin_host = origin.host

    if len(vals) == 1 and vals[0] is not None and origin_host:
        return vals[0], None, origin_host
    if len(vals) == 2 and vals[0] is not None and origin_host:
        return vals[0], vals[1], origin_host
    if len(vals) >= 3 and vals[0] is not None:
        if vals[2] is None:
            if origin_host:
                return vals[0], vals[1], origin_host
        else:
            return vals[0], vals[1], vals[2]
    raise AuthParseError("Invalid arguments supplied to auth")


def build_auth_map(
    auth: tuple[str, ...] | list[str], origin: ParsedUrl
) -> dict[str, tuple[str, str | None]]:
    """host → (username, password) from the flat auth token list,
    chunked by 3 (reference src/downloader.rs:66-71)."""
    auth_map: dict[str, tuple[str, str | None]] = {}
    auth = list(auth)
    for i in range(0, len(auth), AUTH_CHUNK_SIZE):
        username, password, host = parse_auth_chunk(auth[i : i + AUTH_CHUNK_SIZE], origin)
        auth_map[host] = (username, password)
    return auth_map
