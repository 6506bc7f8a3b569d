"""One-decade scaling evidence (VERDICT r4 item 4): run the flagship
crawl + the five heaviest queries at sf0.1 and at a 10×-scaled copy
(tools/make_sf_scale.py) IN THE SAME WINDOW, print wall-times and
ratios. The sf0.1 leg doubles as the same-window control so host
weather cancels out of the ratio.

Usage: python tools/decade_scaling.py [sf_small] [sf_big]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def consume(x) -> int:
    import pandas as pd
    import pyarrow as pa

    if isinstance(x, (pd.DataFrame, pa.Table)):
        return len(x)
    return x.count()


def main() -> int:
    sf_small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf_big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0"

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import bench as B

    B.warm_pool(B.num_cpus())
    health = B.box_health()

    from suckit_ray.pipelines import ann, flagship, graph, relops

    jobs = [
        ("flagship_crawl", lambda sf: flagship.crawl_docs(sf)),
        ("table_fds", relops.table_fds),
        ("crawl_clustering_coeff", graph.crawl_clustering_coeff),
        ("crawl_betweenness", graph.crawl_betweenness),
        ("embeddings_dbscan", ann.embeddings_dbscan),
        ("crawl_hits", graph.crawl_hits),
        ("crawl_ktruss", graph.crawl_ktruss),
    ]
    results: dict[str, dict[str, float]] = {}
    for tag, sf in (("small", sf_small), ("big", sf_big)):
        for name, fn in jobs:
            t0 = time.perf_counter()
            n = consume(fn(sf))
            dt = time.perf_counter() - t0
            results.setdefault(name, {})[tag] = dt
            results[name][f"{tag}_rows"] = n
            print(f"{tag:5s} {name:24s} {dt:8.2f}s rows={n}", flush=True)
    line = {
        "health": health,
        "ratios": {
            k: round(v["big"] / v["small"], 2) for k, v in results.items()
        },
        "times": {
            k: {"small": round(v["small"], 2), "big": round(v["big"], 2)}
            for k, v in results.items()
        },
    }
    print(json.dumps(line))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
