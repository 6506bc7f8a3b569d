"""Fetch stage — the rebuild of the reference Downloader
(src/downloader.rs:56-184) as a ``map_batches`` stage.

Session-ish state (auth map, compiled config, the page store) is built
ONCE PER WORKER PROCESS and cached in a module-level dict keyed by the
store's object ref — the wave-loop driver builds a fresh Dataset per
BFS wave, and stateless tasks + a worker-local cache amortize setup
across waves without paying actor-pool startup per wave. (A callable
class would re-create its actor pool every wave; Ray reuses worker
processes across executions, so the cache survives.)

Fetch is an application-level concern: HTTP retries stay INSIDE the
stage (``tries`` attempts, no backoff — reference src/downloader.rs:
174-184), while Ray task retries separately cover worker death. The
reference conflates both (a panic aborts the process).
"""

from __future__ import annotations

import pyarrow as pa

import ray
from suckit_ray import textkit
from suckit_ray.authkit import build_auth_map
from suckit_ray.config import CrawlConfig
from suckit_ray.urlkit import parse_url

_WORKER_CACHE: dict = {}


def _get_store(store_ref):
    if isinstance(store_ref, ray.ObjectRef):
        # single-slot: repeated crawl() calls in one Ray session put a
        # fresh store ref each time — caching per hex key would pin
        # every past crawl's store in every worker for the session's
        # lifetime (linear RSS growth across bench loops)
        key = store_ref.hex()
        cached = _WORKER_CACHE.get("store")
        if cached is None or cached[0] != key:
            _WORKER_CACHE["store"] = (key, ray.get(store_ref))
        return _WORKER_CACHE["store"][1]
    return store_ref


def _get_auth_map(config: CrawlConfig):
    key = ("auth", config.auth, config.origin)
    if key not in _WORKER_CACHE:
        _WORKER_CACHE[key] = build_auth_map(config.auth, parse_url(config.origin))
    return _WORKER_CACHE[key]


FETCH_SCHEMA_FIELDS = [
    ("status", pa.int32()),
    ("data_type", pa.string()),
    ("charset", pa.string()),
    ("filename", pa.string()),
    ("is_html", pa.bool_()),
    ("body", pa.binary()),
    ("fetch_error", pa.string()),
]


def make_fetch_fn(store_ref, config: CrawlConfig):
    """Build the per-batch fetch function. Input batch columns:
    url, host, depth, ext_depth, seq. Output adds FETCH_SCHEMA_FIELDS."""

    tries = config.tries
    continue_on_error = config.continue_on_error
    max_page_bytes = config.max_page_bytes
    conditional = config.conditional_get

    def fetch_batch(batch: pa.Table) -> pa.Table:
        store = _get_store(store_ref)
        auth_map = _get_auth_map(config)

        urls = batch.column("url").to_pylist()
        # conditional revalidation (delta recrawl): present the prior
        # run's fingerprint as a validator so unchanged pages answer
        # 304 with no body. First hop only — a redirect target is a
        # different resource than the fingerprinted original.
        prevs = (
            batch.column("prev_hash").to_pylist()
            if (
                conditional
                and "prev_hash" in batch.schema.names
                and getattr(store, "supports_conditional", False)
            )
            else None
        )
        if hasattr(store, "prefetch"):
            # sharded lookup stores (ShardedWarcPageStore) resolve the
            # whole batch in one RPC per shard instead of one per URL
            store.prefetch(urls)
        status, data_types, charsets = [], [], []
        filenames, is_htmls, bodies, errors = [], [], [], []

        for row_i, url in enumerate(urls):
            # the fragment never goes on the wire (reqwest strips it);
            # the frontier key keeps it (reference fragment quirk, A1)
            request_url = url.split("#", 1)[0]
            try:
                host = parse_url(request_url).host or ""
            except Exception:
                host = ""
            auth = auth_map.get(host)

            resp = None
            last_err: Exception | None = None
            for _ in range(max(1, tries)):
                try:
                    hop_url, hop_auth = request_url, auth
                    if prevs is not None and prevs[row_i]:
                        resp = store.fetch(
                            hop_url, hop_auth, if_digest=int(prevs[row_i])
                        )
                    else:
                        resp = store.fetch(hop_url, hop_auth)
                    # follow redirects transparently, like the
                    # reference's reqwest client (default policy, up to
                    # 10 hops); the mirror path stays keyed on the
                    # ORIGINAL url (path_map semantics)
                    hops = 0
                    while (
                        resp is not None
                        and resp.location
                        and 300 <= resp.status < 400
                        and hops < 10
                    ):
                        from urllib.parse import urljoin as _uj

                        hop_url = _uj(hop_url, resp.location).split("#", 1)[0]
                        # re-resolve auth for the redirect TARGET host:
                        # reqwest strips Authorization on cross-host
                        # redirects, so credentials must never follow a
                        # redirect to a different host (ADVICE r1)
                        try:
                            hop_host = parse_url(hop_url).host or ""
                        except Exception:
                            hop_host = ""
                        hop_auth = auth_map.get(hop_host)
                        resp = store.fetch(hop_url, hop_auth)
                        hops += 1
                    if (
                        resp is not None
                        and resp.location
                        and 300 <= resp.status < 400
                    ):
                        # still redirecting after 10 hops (loop or deep
                        # chain): reqwest's default policy errors here —
                        # surface it instead of recording the 3xx as the
                        # final page
                        raise RuntimeError(f"too many redirects for {url}")
                    last_err = None
                    break
                except Exception as e:  # transport-level failure
                    # a stale response from THIS attempt (e.g. the 301
                    # whose hop fetch raised) must not survive the
                    # retry loop — it would record the intermediate
                    # redirect as the final page and swallow last_err
                    resp = None
                    last_err = e
            if resp is None:
                # reference: panic unless continue_on_error (src/scraper.rs:275-282)
                if not continue_on_error:
                    raise RuntimeError(f"Couldn't download {url}: {last_err}")
                status.append(0)
                data_types.append("")
                charsets.append(None)
                filenames.append(None)
                is_htmls.append(False)
                bodies.append(b"")
                errors.append(str(last_err))
                continue

            if (
                max_page_bytes is not None
                and resp.body is not None
                and len(resp.body) > max_page_bytes
            ):
                # oversized response: SOFT skip (no panic even without
                # continue_on_error) — ledger records why, no body is
                # stored, no links are extracted. The memory guard that
                # keeps one pathological page from blowing a worker's
                # batch budget at scale.
                status.append(resp.status)
                data_types.append("")
                charsets.append(None)
                filenames.append(None)
                is_htmls.append(False)
                bodies.append(b"")
                errors.append(
                    f"body {len(resp.body)} B exceeds "
                    f"max_page_bytes={max_page_bytes}"
                )
                continue

            data_type, charset = textkit.parse_content_type(resp.content_type)
            html = textkit.is_html(data_type)
            filename = (
                textkit.extract_filename(resp.content_disposition) if not html else None
            )
            status.append(resp.status)
            data_types.append(data_type)
            charsets.append(charset)
            filenames.append(filename)
            is_htmls.append(html)
            bodies.append(resp.body)
            errors.append(None)

        out = batch
        for (name, typ), vals in zip(
            FETCH_SCHEMA_FIELDS,
            [status, data_types, charsets, filenames, is_htmls, bodies, errors],
        ):
            out = out.append_column(pa.field(name, typ), pa.array(vals, type=typ))
        return out

    return fetch_batch
