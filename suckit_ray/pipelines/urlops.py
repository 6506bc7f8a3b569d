"""SQL-checkable wrappers around the crawl URL kernels.

The crawl kernels (to_path, normalize_url, should_visit,
is_on_another_domain — SURVEY.md §2.2 M8/M9/M11/M13) are pure string
functions. To put them under the DuckDB oracle gate, each query derives
a deterministic URL corpus from ``documents.doc_id`` (4 structural
shapes covering the to_path rule branches) and applies the kernel; the
oracle SQL computes the expected output independently with CASE
expressions. Columns and derivations are mirrored exactly.
"""

from __future__ import annotations

import re

import pandas as pd

import ray.data as rd
from suckit_ray import urlkit

MATCH_ALL = re.compile(".*")
MATCH_NONE = re.compile("$^")


def _derive_url(doc_id: int) -> str:
    host = f"site-{doc_id % 20}.test"
    m = doc_id % 4
    if m == 0:
        return f"http://{host}/a/page{doc_id}.html"     # file with extension
    if m == 1:
        return f"http://{host}/b/dir{doc_id}/"          # trailing slash
    if m == 2:
        return f"http://{host}/c/noext{doc_id}"         # no extension
    return f"http://{host}/d/q{doc_id}?x=1&y=2"        # query string


def _read_ids(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])


def url_to_path(sf_dir: str) -> rd.Dataset:
    """(doc_id, url, path): to_path over the 4 derived URL shapes."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        urls = [_derive_url(int(d)) for d in df["doc_id"]]
        paths = [urlkit.to_path(urlkit.parse_url(u), False) for u in urls]
        return pd.DataFrame({"doc_id": df["doc_id"], "url": urls, "path": paths})

    return _read_ids(sf_dir).map_batches(f, batch_format="pandas")


def _derive_candidate(doc_id: int) -> str:
    m = doc_id % 6
    if m == 0:
        return f"///ext{doc_id}.test/x"
    if m == 1:
        return f"//ext{doc_id}.test/y"
    if m == 2:
        return f"page{doc_id}.html"
    if m == 3:
        return f"mailto:user{doc_id}@x.test"
    if m == 4:
        return "javascript:void(0)"
    return f"https://other{doc_id}.test/z.html"


def normalize_url(sf_dir: str) -> rd.Dataset:
    """(doc_id, candidate, normalized): the ///->https quirk."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        cands = [_derive_candidate(int(d)) for d in df["doc_id"]]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "candidate": cands,
                "normalized": [urlkit.normalize_url(c) for c in cands],
            }
        )

    return _read_ids(sf_dir).map_batches(f, batch_format="pandas")


def should_visit(sf_dir: str) -> rd.Dataset:
    """(doc_id, candidate, visit): default-filter visit predicate —
    pseudo-links dropped, relative/absolute kept."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        cands = [_derive_candidate(int(d)) for d in df["doc_id"]]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "candidate": cands,
                "visit": [
                    urlkit.should_visit(c, MATCH_ALL, MATCH_NONE) for c in cands
                ],
            }
        )

    return _read_ids(sf_dir).map_batches(f, batch_format="pandas")


def is_external(sf_dir: str) -> rd.Dataset:
    """(doc_id, candidate, external): domain classifier against the
    derived page URL as base."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        cands = [_derive_candidate(int(d)) for d in df["doc_id"]]
        bases = [urlkit.parse_url(_derive_url(int(d))) for d in df["doc_id"]]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "candidate": cands,
                "external": [
                    urlkit.is_on_another_domain(c, b) for c, b in zip(cands, bases)
                ],
            }
        )

    return _read_ids(sf_dir).map_batches(f, batch_format="pandas")
