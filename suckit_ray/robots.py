"""robots.txt handling — a north_rule component the reference lacks
(suckit ignores robots entirely; this engine makes it opt-in via
``CrawlConfig.respect_robots`` so default behavior stays
reference-parity).

Model: one ``/robots.txt`` fetch per host, parsed once, cached in the
fetch worker (worker-local cache keyed by host — at most
hosts × workers fetches). Rules follow the original robots exclusion
protocol subset most crawlers agree on:

- group selection: the most specific ``User-agent`` match (exact agent
  token beats ``*``), case-insensitive;
- ``Disallow``/``Allow`` path prefixes; longest-match wins, ``Allow``
  wins ties (Google/Bing semantics);
- empty ``Disallow:`` means allow-all; a missing/failed robots.txt
  (4xx/5xx/transport error) means allow-all.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass(frozen=True)
class RobotsRules:
    # (path_prefix, allow) pairs, already filtered to our user-agent
    rules: tuple[tuple[str, bool], ...] = ()
    # Crawl-delay (seconds) from the chosen group, None when absent —
    # a de-facto extension most large crawlers honor (Bing/Yandex do,
    # Google ignores it); exposed so the frontier can space releases
    crawl_delay: float | None = None

    def allows(self, path: str) -> bool:
        best_len = -1
        best_allow = True
        for prefix, allow in self.rules:
            if _rule_matches(prefix, path) and len(prefix) >= best_len:
                # most-specific (longest pattern) wins; on equal
                # length, Allow wins (Google/Bing semantics)
                if len(prefix) > best_len or allow:
                    best_len = len(prefix)
                    best_allow = allow
        return best_allow


_WILDCARD_CACHE: dict[str, "re.Pattern"] = {}
_WILDCARD_CACHE_MAX = 10_000  # rules are attacker-controlled strings —
# a hostile crawl of many robots.txt files with unique wildcard rules
# must not grow worker RSS unboundedly; on overflow the cache resets
# (correctness unaffected: entries recompile on demand)


def _rule_matches(rule: str, path: str) -> bool:
    """Path-rule match with the REP wildcard extension every major
    crawler honors: ``*`` matches any char sequence, a trailing ``$``
    anchors the end (``/*.pdf$``). Rules without either are plain
    prefixes (original 1994 semantics, the fast path)."""
    if "*" not in rule and not rule.endswith("$"):
        return path.startswith(rule)
    pat = _WILDCARD_CACHE.get(rule)
    if pat is None:
        body = rule[:-1] if rule.endswith("$") else rule
        rx = ".*".join(re.escape(seg) for seg in body.split("*"))
        rx = rx + "$" if rule.endswith("$") else rx
        if len(_WILDCARD_CACHE) >= _WILDCARD_CACHE_MAX:
            _WILDCARD_CACHE.clear()
        pat = _WILDCARD_CACHE[rule] = re.compile(rx)
    return pat.match(path) is not None


ALLOW_ALL = RobotsRules()

# Crawl-delay clamp (seconds): one hostile/typo'd robots.txt must not
# be able to stall the whole crawl arbitrarily long
CRAWL_DELAY_CAP_S = 60.0


def parse_robots(text: str, user_agent: str) -> RobotsRules:
    """Parse robots.txt for ``user_agent`` (first token, lowercased)."""
    agent = user_agent.split("/")[0].strip().lower()
    groups: list[tuple[list[str], list[tuple[str, bool]], float | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    cur_delay: float | None = None
    seen_rule_in_group = False

    def flush():
        nonlocal cur_agents, cur_rules, cur_delay, seen_rule_in_group
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None
        seen_rule_in_group = False

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if seen_rule_in_group:
                flush()
            cur_agents.append(val.lower())
        elif key in ("disallow", "allow"):
            seen_rule_in_group = True
            if key == "disallow" and val == "":
                continue  # empty Disallow = allow all
            cur_rules.append((val, key == "allow"))
        elif key == "crawl-delay":
            seen_rule_in_group = True
            try:
                d = float(val)
                # clamp like the big crawlers do (Bing caps effective
                # delays around the minute mark): an 'inf' or absurd
                # value must not overflow int-ms conversion or park the
                # driver's sleep-retry loop for years on one hostile
                # robots.txt
                if 0 <= d == d:  # rejects NaN
                    cur_delay = min(d, CRAWL_DELAY_CAP_S)
            except ValueError:
                pass  # malformed delay: ignore the directive
    flush()

    chosen: tuple[list[tuple[str, bool]], float | None] | None = None
    wildcard: tuple[list[tuple[str, bool]], float | None] | None = None
    for agents, rules, delay in groups:
        if agent in agents and chosen is None:
            chosen = (rules, delay)
        if "*" in agents and wildcard is None:
            wildcard = (rules, delay)
    rules, delay = chosen if chosen is not None else (wildcard or ([], None))
    return RobotsRules(rules=tuple(rules), crawl_delay=delay)


@dataclass
class RobotsCache:
    """Per-worker robots cache: (scheme, host) → RobotsRules, fetched
    through the same page store — and the same ``tries`` retry budget —
    as page fetches, so one transient failure can't permanently cache
    ALLOW_ALL for a host (ADVICE r1)."""

    store: object
    user_agent: str = "suckit"
    tries: int = 1
    _cache: dict = field(default_factory=dict)

    def rules_for(self, scheme: str, authority: str) -> RobotsRules:
        """``authority`` includes any non-default port — two sites on
        one host but different ports have independent robots files and
        must not share a cache entry."""
        key = (scheme, authority)
        if key in self._cache:
            return self._cache[key]
        resp = None
        for _ in range(max(1, self.tries)):
            try:
                resp = self.store.fetch(f"{scheme}://{authority}/robots.txt", None)
                # robots.txt itself very commonly redirects (http→https
                # is near-universal); the page-fetch redirect loop lives
                # in the fetch stage, so follow here too — RFC 9309
                # says to use the redirect target's rules
                hops = 0
                while (
                    resp is not None
                    and resp.location
                    and 300 <= resp.status < 400
                    and hops < 10
                ):
                    from urllib.parse import urljoin as _uj

                    target = _uj(f"{scheme}://{authority}/robots.txt", resp.location)
                    resp = self.store.fetch(target, None)
                    hops += 1
                break
            except Exception:  # transport error: retry, then allow-all
                resp = None
        if resp is not None and resp.status == 200 and resp.body:
            rules = parse_robots(
                resp.body.decode("utf-8", errors="replace"), self.user_agent
            )
        else:
            rules = ALLOW_ALL
        self._cache[key] = rules
        return rules

    def allows(self, url: str) -> bool:
        return self.allows_and_delay_ms(url)[0]

    def allows_and_delay_ms(self, url: str) -> tuple[bool, int]:
        """One parse + one rules lookup for both the visit decision and
        the host's Crawl-delay (milliseconds; 0 = no directive)."""
        from suckit_ray.urlkit import UrlParseError, parse_url

        try:
            p = parse_url(url)
        except UrlParseError:
            return True, 0
        path = p.path or "/"
        if p.query is not None:
            path += "?" + p.query
        authority = p.host or ""
        if p.port is not None:
            authority += f":{p.port}"
        rules = self.rules_for(p.scheme, authority)
        delay_ms = int(rules.crawl_delay * 1000) if rules.crawl_delay else 0
        return rules.allows(path), delay_ms
