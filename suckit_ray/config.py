"""Crawl configuration — the rebuild of the reference's ``Args`` struct.

Field-for-field mirror of the 20 CLI options of the reference
(src/args.rs:9-162) with identical defaults (jobs=1, depth=-1 meaning
infinity, ext_depth=0, tries=20, delay=0, random_range=0,
user_agent="suckit", include filters ".*", exclude filters "$^").
Regex filters use unanchored search semantics, matching Rust
``Regex::is_match``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, replace

INFINITE_DEPTH = -1  # sentinel, reference src/scraper.rs:30


@dataclass(frozen=True)
class CrawlConfig:
    origin: str
    output: str | None = None
    jobs: int = 1
    depth: int = INFINITE_DEPTH
    ext_depth: int = 0
    tries: int = 20
    verbose: bool = False
    delay: float = 0.0
    random_range: float = 0.0

    @property
    def politeness_on(self) -> bool:
        """The reference rate-limits whenever EITHER delay or
        random_range is nonzero (src/scraper.rs:342) — host-co-located
        routing and the per-host wave cap key off this, not delay
        alone."""
        return self.delay > 0 or self.random_range > 0
    user_agent: str = "suckit"
    cookie: str = ""
    include_visit: str = ".*"
    exclude_visit: str = "$^"
    include_download: str = ".*"
    exclude_download: str = "$^"
    visit_filter_is_download_filter: bool = False
    auth: tuple[str, ...] = field(default_factory=tuple)
    continue_on_error: bool = False
    dry_run: bool = False
    disable_certs_checks: bool = False
    # rebuild-only (north_rule): robots.txt exclusion; off by default
    # for reference parity (the reference ignores robots entirely)
    respect_robots: bool = False
    # rebuild-only: seed from the origin host's sitemaps (robots.txt
    # Sitemap: directives, else /sitemap.xml) before the first wave —
    # reaches pages no link points to. Off by default (parity).
    use_sitemaps: bool = False
    # rebuild-only: canonical URL dedup keys — fragment dropped,
    # tracking params (utm_*, gclid, ...) removed, query pairs sorted
    # — so spurious variants of one page fetch once. The FETCHED url
    # stays the first-discovered original. Off by default (parity:
    # the reference dedups raw fragment-inclusive strings).
    canonicalize_urls: bool = False
    # rebuild-only: honor rel="nofollow" link annotations and
    # <meta name="robots" content="nofollow"> page directives —
    # flagged links are still REWRITTEN in the mirror (the reference
    # rewrites every visit-passing candidate; real crawlers render
    # the anchor too) but are never enqueued, so link-spam paths do
    # not spend crawl budget. Off by default (parity: the reference
    # follows everything).
    honor_nofollow: bool = False
    # rebuild-only: follow <meta http-equiv=refresh content="N;url=…">
    # client-side redirects — the target enters the frontier through
    # the same visit/depth gates as markup links; the content
    # attribute is not rewritten (no src/href to splice). Off by
    # default (parity: the reference's [src],[href] selector never
    # sees it).
    follow_meta_refresh: bool = False
    # rebuild-only: OPIC adaptive frontier scheduling (Abiteboul/
    # Preda/Cobena, "Adaptive On-Line Page Importance Computation",
    # WWW 2003). Seeds start with cash 1.0; each fetched page's cash
    # splits evenly over its emitted outlink candidates; pending URLs
    # accrue cash per sighting and each wave releases the in-memory
    # hot tier highest-cash-first. Changes SCHEDULING ORDER only —
    # the crawled set is identical (crawl_mirror stays green either
    # way). Off by default (parity: the reference is strict FIFO).
    opic: bool = False
    # rebuild-only: conditional revalidation on delta recrawls. When a
    # frontier entry carries a prior-run body fingerprint AND the page
    # store supports it (``supports_conditional``), the fetch presents
    # the fingerprint as a validator (the If-None-Match handshake with
    # the digest as ETag) and an unchanged page answers 304 WITH NO
    # BODY — at a 95%-unchanged web-scale recrawl the body bytes that
    # never leave the store are the dominant transfer saving. The
    # crawl result is IDENTICAL to an unconditional delta recrawl
    # (unchanged pages already skip parse/docs); ledger rows for
    # revalidated pages record status 304 and the content-type-less
    # response's default is_html. Off by default (parity; and a
    # conditional fetch never fires without recrawl_from anyway).
    conditional_get: bool = False
    # rebuild-only: drop responses larger than this many bytes (soft
    # skip with a ledger error — no body stored, no links extracted).
    # None = unbounded (parity). The per-page memory guard at scale.
    max_page_bytes: int | None = None
    # rebuild-only: crawler-trap guard. Cap the TOTAL URLs accepted
    # per host; hosts exceeding it (parameter-explosion traps,
    # calendar pages, infinite pagination) have their remaining
    # frontier entries dropped, wave-synchronously like the breaker.
    # None = unbounded (parity).
    host_url_budget: int | None = None
    # rebuild-only: per-host circuit breaker. After N CONSECUTIVE
    # transport failures (status 0 after the full ``tries`` budget)
    # the host's remaining frontier entries are dropped instead of
    # hammering a dead server with tries×pages attempts. None = off
    # (parity: the reference retries every URL of a dead host).
    host_error_budget: int | None = None
    # rebuild-only (north_rule "per-host politeness priority queues"):
    # frontier release precedence. URLs matching patterns[i] (first
    # match wins, unanchored search) release before anything matching
    # only patterns[j>i]; non-matching URLs release last. Empty = pure
    # FIFO waves (reference parity). With unlimited depth (the default)
    # the crawl SET is unchanged — only the wave in which a URL is
    # fetched moves. With a FINITE --depth/--ext-depth combined with
    # politeness or wave caps, reordering can flip which same-wave
    # parent wins the first-seen race, recording a different depth and
    # therefore a (slightly) different reachable set — depth recording
    # is first-wins to match the reference, not min-over-parents. Leave
    # patterns empty when exact reference grouping or finite-depth set
    # equality matters.
    priority_patterns: tuple[str, ...] = field(default_factory=tuple)
    # rebuild-only (north_rule "bloom/cuckoo URL-seen"): frozen-tier
    # pre-screen of the seen set. "auto" (default) resolves to bloom
    # for fresh crawls (reference parity: dead urls stay seen,
    # vectorized append-only build) and to the delete-capable cuckoo
    # for delta recrawls (crawl(recrawl_from=...)), so
    # removed-then-restored pages are refetched on rediscovery
    # without a flag (r3 verdict item 7). Explicit "bloom" / "cuckoo"
    # pin the choice either way — an explicitly requested bloom is
    # never silently upgraded (review finding).
    seen_filter: str = "auto"

    def resolved(self) -> "CrawlConfig":
        """Apply --visit-filter-is-download-filter aliasing
        (reference src/scraper.rs:52-56): copy the download regexes over
        the visit regexes at startup."""
        if self.visit_filter_is_download_filter:
            return replace(
                self,
                include_visit=self.include_download,
                exclude_visit=self.exclude_download,
            )
        return self

    # Compiled-filter helpers. Cheap to recompile (Python caches), but
    # stage actors call these once in __init__ and keep the result.
    def visit_filters(self) -> tuple[re.Pattern, re.Pattern]:
        return re.compile(self.include_visit), re.compile(self.exclude_visit)

    def download_filters(self) -> tuple[re.Pattern, re.Pattern]:
        return re.compile(self.include_download), re.compile(self.exclude_download)
