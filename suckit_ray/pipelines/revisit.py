"""Adaptive revisit scheduling — freshness-driven recrawl planning.

A continuous crawl cannot re-fetch 10^10 pages per increment; it
re-fetches the pages most likely to have CHANGED (Cho &
Garcia-Molina, "Effective Page Refresh Policies for Web Crawlers",
public literature). The signal is already on disk: every delta-recrawl
run writes ``hashes_parts/`` body fingerprints
(``pipelines.crawl:delta_hashes``), so K successive runs give each url
a change HISTORY — which adjacent-snapshot intervals it survived and
in how many its body hash moved.

``plan_revisit`` turns those histories into a due-list:

    rate_micro = (changes + 1) * 1_000_000 // (intervals + 2)

— a Laplace-smoothed change-rate estimate in integer MICRO-units
(deterministic across engines and reduction orders; 0 intervals →
the neutral prior 1/2, never-seen-changing pages decay toward 0 as
evidence accumulates). The due-list is every url ranked by
(rate desc, url asc); a ``budget`` caps it to the top-N.

The budgeted revisit itself is the existing machinery composed:

    plan = plan_revisit([run1, run2, ...], budget=N)
    crawl(cfg(depth=0), store, seeds=plan["url"].tolist(),
          recrawl_from=runK, delta_hashes=True,
          carry_prior_hashes=True, output_dir=runK1)

depth=0 fetches exactly the due pages; ``recrawl_from`` skips the
ones that turn out unchanged; ``carry_prior_hashes`` leaves a
COMPLETE fingerprint set for the next increment.

Scale shape: snapshot parts stream in as one tagged union (the only
corpus-scale exchange carries (url, snap, body_hash) rows — urls and
two ints, never bodies); ONE url-hash co-group lines up each url's
snapshots and counts changed adjacent-presence intervals
group-locally; with a budget, per-block top-k bounds the driver merge
to ≤ budget rows per block (the top_customers idiom). Driver state:
the final due-list only.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd

import ray.data as rd


def _read_snapshot(history_dir: str, snap: int, B: int) -> rd.Dataset:
    parts = sorted(
        glob.glob(os.path.join(history_dir, "hashes_parts", "*.parquet"))
    )
    if not parts:
        raise FileNotFoundError(
            f"no hashes_parts under {history_dir} — was the run made "
            "with delta_hashes=True?"
        )

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "url": df["url"],
                "snap": np.int64(snap),
                "body_hash": df["body_hash"].astype("int64"),
            }
        )
        out["ub"] = (
            pd.util.hash_pandas_object(out["url"], index=False).astype(
                "uint64"
            )
            % B
        ).astype("int64")
        return out

    return rd.read_parquet(parts, columns=["url", "body_hash"]).map_batches(
        tag, batch_format="pandas"
    )


def revisit_stats(history_dirs: list[str]) -> rd.Dataset:
    """(url, changes, intervals, rate_micro) for every url appearing
    in ANY snapshot of ``history_dirs`` (ordered oldest → newest).
    ``intervals`` counts ADJACENT snapshot pairs where the url is
    present in both; ``changes`` counts those whose body hash moved
    (an errored fetch records hash 0, which never matches — it counts
    as changed, the conservative choice for a revisit policy)."""
    if len(history_dirs) < 2:
        raise ValueError("need >= 2 snapshots to estimate change rates")
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()
    ds = _read_snapshot(history_dirs[0], 0, B)
    for i, d in enumerate(history_dirs[1:], 1):
        ds = ds.union(_read_snapshot(d, i, B))

    def per_url(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "url": pd.array([], dtype="object"),
                    "changes": pd.array([], dtype="int64"),
                    "intervals": pd.array([], dtype="int64"),
                    "rate_micro": pd.array([], dtype="int64"),
                }
            )
        g = g.drop_duplicates(["url", "snap"]).sort_values(["url", "snap"])
        u = g["url"].to_numpy()
        s = g["snap"].to_numpy()
        h = g["body_hash"].to_numpy()
        same_url = u[1:] == u[:-1]
        adjacent = same_url & (s[1:] == s[:-1] + 1)
        changed = adjacent & (h[1:] != h[:-1])
        # per-url interval/change counts via one grouped sum each
        iv = pd.DataFrame(
            {"url": u[1:][adjacent], "n": np.int64(1)}
        ).groupby("url", as_index=False).agg(intervals=("n", "sum"))
        ch = pd.DataFrame(
            {"url": u[1:][changed], "n": np.int64(1)}
        ).groupby("url", as_index=False).agg(changes=("n", "sum"))
        out = (
            pd.DataFrame({"url": pd.unique(u)})
            .merge(ch, on="url", how="left")
            .merge(iv, on="url", how="left")
            .fillna(0)
        )
        out["changes"] = out["changes"].astype("int64")
        out["intervals"] = out["intervals"].astype("int64")
        out["rate_micro"] = (
            (out["changes"] + 1) * 1_000_000 // (out["intervals"] + 2)
        ).astype("int64")
        return out[["url", "changes", "intervals", "rate_micro"]]

    return ds.groupby("ub").map_groups(per_url, batch_format="pandas")


def plan_revisit(
    history_dirs: list[str], budget: int | None = None
) -> pd.DataFrame:
    """The due-list: ``revisit_stats`` ranked by (rate_micro desc,
    url asc), capped to ``budget`` rows. Per-block top-k keeps the
    driver merge ≤ budget·blocks rows; budget=None returns the full
    ranking (small corpora / diagnostics only — at web scale always
    pass a budget)."""
    stats = revisit_stats(history_dirs)
    if budget is None:
        out = stats.to_pandas()
    else:

        def block_topk(df: pd.DataFrame) -> pd.DataFrame:
            return df.sort_values(
                ["rate_micro", "url"], ascending=[False, True]
            ).head(budget)

        out = stats.map_batches(block_topk, batch_format="pandas").to_pandas()
    out = out.sort_values(
        ["rate_micro", "url"], ascending=[False, True]
    ).reset_index(drop=True)
    return out.head(budget) if budget is not None else out
