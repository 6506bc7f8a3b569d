"""Local driver-sim: run every ``queries()`` entry against its
``oracle_sql()`` at a given sf dir, mirroring the round driver's
compare (sorted columns, sorted rows, md5 value hash). Usage:

    python tools/oracle_sweep.py [sf_dir] [only_query1,only_query2,...]

Defaults to /root/testdata/sf0.01 and all queries. Exit code 1 on any
mismatch. This is the fast feedback loop for oracle-parity work —
the per-round CORRECTNESS gate runs the same comparison.
"""
import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

import ray

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return hashlib.md5(df.astype(str).to_csv(index=False).encode()).hexdigest(), len(df)


def main() -> int:
    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=16, include_dashboard=False,
            logging_level="ERROR",
        )
    import __ray_entry__  # noqa: E402 (needs repo on sys.path first)

    qs, osql = __ray_entry__.queries(), __ray_entry__.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    fails = []
    for name, q in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            res = q(SF)
            df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
            if name not in osql:
                print(f"{name:32s} rows={len(df):7d} no_oracle        ({time.time()-t0:5.1f}s)", flush=True)
                continue
            want = con.execute(osql[name]).fetchdf()
            h1, n1 = canon(df)
            h2, n2 = canon(want)
            ok = h1 == h2 and n1 == n2
            print(f"{name:32s} rows={n1:7d}/{n2:7d} {'OK  ' if ok else 'FAIL'} ({time.time()-t0:5.1f}s)", flush=True)
            if not ok:
                fails.append(name)
        except Exception as e:  # noqa: BLE001 — report and continue the sweep
            print(f"{name:32s} ERROR {e}", flush=True)
            fails.append(name)

    ray.shutdown()
    print("FAILS:", fails if fails else "none")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
