"""Sitemap seeding (rebuild-only; the reference has no sitemap
support). Opt-in via ``CrawlConfig.use_sitemaps`` / ``--sitemaps``:
before the first wave, the driver fetches the origin host's sitemaps —
the ``Sitemap:`` directives from robots.txt when present, else the
conventional ``/sitemap.xml`` — and appends their SAME-DOMAIN page
URLs to the seed list, so pages unreachable by links still get
crawled (the usual reason sites publish sitemaps).

Protocol subset (sitemaps.org):
- ``<urlset>`` documents: every ``<loc>`` is a page URL;
- ``<sitemapindex>`` documents: every ``<loc>`` is a CHILD sitemap,
  followed breadth-first (bounded by ``max_sitemaps``);
- gzipped payloads (magic-sniffed — .xml.gz is ubiquitous);
- plain-text sitemaps (one URL per line).

Scale shape: sitemap gathering is a bounded driver-side prologue —
spec caps one sitemap at 50k URLs / 50 MB, and ``max_urls`` bounds the
total; the seeds themselves enter the sharded frontier exactly like
CLI seeds, so a million-URL sitemap set costs the driver one pass of
string filtering, never any per-page state."""

from __future__ import annotations

import gzip
import re
from html import unescape

_LOC_RE = re.compile(rb"<loc[^>]*>\s*(.*?)\s*</loc>", re.S | re.I)
_INDEX_RE = re.compile(rb"<\s*sitemapindex[\s>]", re.I)
_URLSET_RE = re.compile(rb"<\s*urlset[\s>]", re.I)


def parse_robots_sitemaps(text: str) -> list[str]:
    """``Sitemap:`` directives — per the spec these are GLOBAL (not
    tied to any User-agent group), so every line counts."""
    out = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        key, _, val = line.partition(":")
        # the value itself contains "://", so only the FIRST colon splits
        if key.strip().lower() == "sitemap" and val.strip():
            out.append(val.strip())
    return out


def parse_sitemap(body: bytes) -> tuple[list[str], list[str]]:
    """→ (page_urls, child_sitemap_urls). Entity-unescaped (sitemap
    XML requires &amp; escaping in <loc>); gzip magic-sniffed."""
    if body[:2] == b"\x1f\x8b":
        try:
            body = gzip.decompress(body)
        except OSError:
            return [], []
    if _URLSET_RE.search(body) or _INDEX_RE.search(body):
        locs = [
            unescape(m.decode("utf-8", errors="replace"))
            for m in _LOC_RE.findall(body)
        ]
        if _INDEX_RE.search(body):
            return [], locs
        return locs, []
    # plain-text sitemap: one URL per line
    urls = []
    for line in body.decode("utf-8", errors="replace").splitlines():
        line = line.strip()
        if line.startswith("http://") or line.startswith("https://"):
            urls.append(line)
    return urls, []


def gather_sitemap_seeds(
    store,
    origin: str,
    tries: int = 1,
    max_sitemaps: int = 50,
    max_urls: int = 50_000,
) -> list[str]:
    """Fetch + parse the origin's sitemaps; return SAME-DOMAIN page
    URLs in discovery order (deduped, origin excluded by the caller's
    seen gate anyway). Missing/failed sitemaps are simply empty — like
    a missing robots.txt, never an error."""
    from suckit_ray.urlkit import UrlParseError, is_on_another_domain, parse_url

    try:
        op = parse_url(origin)
    except UrlParseError:
        return []
    root = f"{op.scheme}://{op.host}" + (f":{op.port}" if op.port else "")

    def fetch(url: str) -> bytes | None:
        from urllib.parse import urljoin as _uj

        for _ in range(max(1, tries)):
            try:
                resp = store.fetch(url, None)
                # follow redirects like RobotsCache does — the
                # http→https hop is near-universal and a 301 on
                # robots.txt/sitemap.xml must not silently zero the
                # seed set
                hops, cur = 0, url
                while (
                    resp is not None
                    and resp.location
                    and 300 <= resp.status < 400
                    and hops < 10
                ):
                    cur = _uj(cur, resp.location)
                    resp = store.fetch(cur, None)
                    hops += 1
            except Exception:
                continue
            if resp is not None and resp.status == 200 and resp.body:
                return resp.body
        return None

    robots_body = fetch(f"{root}/robots.txt")
    queue = (
        parse_robots_sitemaps(robots_body.decode("utf-8", errors="replace"))
        if robots_body
        else []
    ) or [f"{root}/sitemap.xml"]

    seen_maps: set[str] = set()
    seeds: list[str] = []
    seen_urls: set[str] = set()
    while queue and len(seen_maps) < max_sitemaps and len(seeds) < max_urls:
        sm = queue.pop(0)
        if sm in seen_maps:
            continue
        seen_maps.add(sm)
        body = fetch(sm)
        if body is None:
            continue
        pages, children = parse_sitemap(body)
        queue.extend(children)
        for u in pages:
            if len(seeds) >= max_urls:
                break
            if u in seen_urls:
                continue
            seen_urls.add(u)
            # internal-only: cross-domain sitemap entries are dropped —
            # external reach stays governed by --ext-depth via links
            if is_on_another_domain(u, op):
                continue
            try:
                p = parse_url(u)
            except UrlParseError:
                continue
            seeds.append(p.as_str())
    return seeds
