#!/usr/bin/env python
"""Profile one queries() entry: run it, print wall time, result shape,
and Ray Data's per-operator stats() for every Dataset it executes —
the feedback loop for iterating a stage until wall-time is dominated
by useful compute.

Usage:
    python tools/profile_query.py <query_name> [sf_dir] [num_cpus]

Owns a Ray session (tool entry point, like bench.py)."""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    num_cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as E

    import pyarrow as pa
    import ray.data as rd

    fn = E.queries()[name]
    t0 = time.perf_counter()
    out = fn(sf_dir)
    if isinstance(out, rd.Dataset):
        m = out.materialize()  # count() may shortcut via metadata; a
        n = m.count()          # materialized set carries full stats
        wall = time.perf_counter() - t0
        print(f"== {name}: {n} rows in {wall:.2f}s (Dataset) ==")
        print(m.stats())
    elif isinstance(out, pa.Table):
        wall = time.perf_counter() - t0
        print(f"== {name}: {out.num_rows} rows in {wall:.2f}s (pa.Table; "
              "stats cover datasets executed inside) ==")
    else:
        wall = time.perf_counter() - t0
        print(f"== {name}: {len(out)} rows in {wall:.2f}s ({type(out).__name__}) ==")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
