"""CLI — drop-in command surface for the reference's binary.

Mirrors every option of ``suckit <url>`` (reference src/args.rs:9-162,
same names and defaults) and produces the same on-disk artifact: a
``<output>/<host>/<path>`` mirror tree (plus the span-document
parquet and fetch-ledger tables the rebuild adds).

    python -m suckit_ray http://example.test/ -o /tmp/mirror -j 8

Extra (rebuild-only) options: --shards, --checkpoint-dir, --resume,
--num-cpus, and --synthetic N (crawl the deterministic synthetic web
instead of the live network — the only mode usable in an offline
sandbox).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="suckit_ray", description="Ray-Data-native recursive website mirror"
    )
    p.add_argument("url", help="Entry point of the scraping")
    p.add_argument("-o", "--output", help="Output directory")
    p.add_argument("-j", "--jobs", type=int, default=1,
                   help="Maximum number of parallel fetch tasks")
    p.add_argument("-d", "--depth", type=int, default=-1,
                   help="Maximum recursion depth (-1 = infinity)")
    p.add_argument("--ext-depth", type=int, default=0,
                   help="Maximum external-domain recursion depth")
    p.add_argument("-t", "--tries", type=int, default=20,
                   help="Maximum retries on download failure")
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument("--delay", type=float, default=0)
    p.add_argument("--random-range", type=float, default=0)
    p.add_argument("-u", "--user-agent", default="suckit")
    p.add_argument("--cookie", default="")
    p.add_argument("--include-visit", default=".*")
    p.add_argument("--exclude-visit", default="$^")
    p.add_argument("-i", "--include-download", default=".*")
    p.add_argument("-e", "--exclude-download", default="$^")
    p.add_argument("--visit-filter-is-download-filter", action="store_true")
    p.add_argument("-a", "--auth", nargs="*", default=[],
                   help='Space-separated "username password host" triples')
    p.add_argument("-c", "--continue-on-error", action="store_true")
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--disable-certs-checks", action="store_true")
    # rebuild-only
    p.add_argument("--shards", type=int, default=4, help="frontier shard actors")
    p.add_argument("--checkpoint-dir")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--num-cpus", type=int, default=8)
    p.add_argument("--synthetic", type=int, metavar="N",
                   help="crawl the deterministic N-page synthetic web (offline)")
    p.add_argument("--respect-robots", action="store_true",
                   help="honor robots.txt exclusion rules (rebuild-only)")
    p.add_argument("--canonicalize", action="store_true",
                   help="canonical URL dedup keys: drop fragments and "
                        "tracking params, sort query pairs "
                        "(rebuild-only)")
    p.add_argument("--honor-nofollow", action="store_true",
                   help="do not enqueue rel=nofollow links or links "
                        "from meta-robots-nofollow pages; they are "
                        "still rewritten in the mirror (rebuild-only)")
    p.add_argument("--follow-meta-refresh", action="store_true",
                   help="enqueue <meta http-equiv=refresh> redirect "
                        "targets through the normal visit/depth gates "
                        "(rebuild-only)")
    p.add_argument("--opic", action="store_true",
                   help="adaptive frontier scheduling: release "
                        "highest-cash (most-linked-to) URLs first "
                        "(OPIC, WWW'03; rebuild-only)")
    p.add_argument("--conditional-get", action="store_true",
                   help="on delta recrawls (--recrawl-from), present "
                        "the prior body fingerprint as a validator so "
                        "unchanged pages answer 304 without a body "
                        "(rebuild-only)")
    p.add_argument("--max-page-size", type=int, metavar="BYTES",
                   help="skip responses larger than BYTES (soft skip, "
                        "recorded in the ledger; rebuild-only)")
    p.add_argument("--host-url-budget", type=int, metavar="N",
                   help="crawler-trap guard: cap total URLs accepted "
                        "per host; excess frontier entries dropped "
                        "(rebuild-only)")
    p.add_argument("--host-error-budget", type=int, metavar="N",
                   help="per-host circuit breaker: after N consecutive "
                        "transport failures, drop the host's remaining "
                        "frontier entries (rebuild-only)")
    p.add_argument("--sitemaps", action="store_true",
                   help="seed from the origin host's sitemaps "
                        "(robots.txt Sitemap: directives, else "
                        "/sitemap.xml; rebuild-only)")
    p.add_argument("--priority", action="append", default=[],
                   metavar="REGEX",
                   help="frontier release precedence (rebuild-only): "
                        "URLs matching the first --priority regex "
                        "release before the second, etc.; repeatable")
    p.add_argument("--seen-filter", choices=["auto", "bloom", "cuckoo"],
                   default="auto",
                   help="frozen-tier seen-set pre-screen (rebuild-only):"
                        " auto = bloom for fresh crawls, cuckoo for delta"
                        " recrawls (retirement); explicit values pin it")
    p.add_argument("--seeds-parquet", metavar="FILE",
                   help="parquet file with a url column: the seed list")
    p.add_argument("--compact-out", metavar="DIR",
                   help="after the crawl, bin-pack the --parquet-out "
                        "per-wave docs into ~target-size parquet files "
                        "at DIR (sinks.compact_parquet; requires "
                        "--parquet-out)")
    p.add_argument("--compact-target-mb", type=int, default=256,
                   metavar="MB", help="compaction target file size")
    p.add_argument("--wds-out", metavar="DIR",
                   help="after the crawl, export the --parquet-out docs "
                        "as WebDataset tar shards (training-loader "
                        "interchange; requires --parquet-out)")
    p.add_argument("--parquet-out", metavar="DIR",
                   help="also stream per-wave span-document parquet "
                        "partitions (+ per-shard ledger) to DIR")
    p.add_argument("--delta-hashes", action="store_true",
                   help="record per-url body fingerprints "
                        "(hashes_parts/) for later --recrawl-from; "
                        "needs --parquet-out")
    p.add_argument("--recrawl-from", metavar="DIR",
                   help="delta recrawl against a prior --parquet-out "
                        "run: seed from its ledger, skip unchanged "
                        "pages, write only the changed/new delta")
    p.add_argument("--warc-out", metavar="DIR",
                   help="also archive downloaded pages as gzipped WARC "
                        "segments in DIR")
    p.add_argument("--warc-cdx", metavar="DIR",
                   help="with --warc-out: also build the CDX index of "
                        "the archive as parquet in DIR")
    p.add_argument("--revisit-history", action="append", default=[],
                   metavar="DIR",
                   help="adaptive revisit: prior --parquet-out dirs "
                        "(oldest first, >= 2, each crawled with "
                        "--delta-hashes); seeds become the change-rate "
                        "due-list, prior hashes skip unchanged pages, "
                        "and the fingerprint set carries forward "
                        "complete. Combine with -d 0 to fetch ONLY the "
                        "due-list")
    p.add_argument("--revisit-budget", type=int, metavar="N",
                   help="cap the revisit due-list to the top-N urls by "
                        "estimated change rate (requires "
                        "--revisit-history)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from suckit_ray.config import CrawlConfig

    config = CrawlConfig(
        origin=args.url,
        output=args.output,
        jobs=args.jobs,
        depth=args.depth,
        ext_depth=args.ext_depth,
        tries=args.tries,
        verbose=args.verbose,
        delay=args.delay,
        random_range=args.random_range,
        user_agent=args.user_agent,
        cookie=args.cookie,
        include_visit=args.include_visit,
        exclude_visit=args.exclude_visit,
        include_download=args.include_download,
        exclude_download=args.exclude_download,
        visit_filter_is_download_filter=args.visit_filter_is_download_filter,
        auth=tuple(args.auth),
        continue_on_error=args.continue_on_error,
        dry_run=args.dry_run,
        disable_certs_checks=args.disable_certs_checks,
        respect_robots=args.respect_robots,
        use_sitemaps=args.sitemaps,
        host_error_budget=args.host_error_budget,
        host_url_budget=args.host_url_budget,
        max_page_bytes=args.max_page_size,
        canonicalize_urls=args.canonicalize,
        conditional_get=args.conditional_get,
        honor_nofollow=args.honor_nofollow,
        follow_meta_refresh=args.follow_meta_refresh,
        opic=args.opic,
        priority_patterns=tuple(args.priority),
        seen_filter=args.seen_filter,
    )

    import os

    import ray

    if not ray.is_initialized():
        # `ray job submit` / existing-cluster mode: when RAY_ADDRESS
        # points at a cluster, attach to it (num_cpus is a local-only
        # knob); otherwise start a local session
        addr = os.environ.get("RAY_ADDRESS", "local")
        if addr and addr != "local":
            ray.init(address=addr, logging_level="ERROR")
        else:
            ray.init(
                address="local",
                num_cpus=args.num_cpus,
                include_dashboard=False,
                logging_level="ERROR",
            )

    if args.wds_out and not args.parquet_out:
        print("--wds-out requires --parquet-out", file=sys.stderr)
        return 2
    if args.compact_out and not args.parquet_out:
        print("--compact-out requires --parquet-out", file=sys.stderr)
        return 2

    revisit = bool(args.revisit_history)
    if args.revisit_budget is not None and not revisit:
        print("--revisit-budget requires --revisit-history", file=sys.stderr)
        return 2
    if revisit and len(args.revisit_history) < 2:
        print("--revisit-history needs >= 2 snapshot dirs", file=sys.stderr)
        return 2

    seeds = None
    if revisit:
        from suckit_ray.pipelines.revisit import plan_revisit

        plan = plan_revisit(
            args.revisit_history, budget=args.revisit_budget
        )
        seeds = plan["url"].tolist()
        if args.recrawl_from is None:
            args.recrawl_from = args.revisit_history[-1]
    if args.seeds_parquet:
        import pyarrow.parquet as pq

        seeds = pq.read_table(args.seeds_parquet, columns=["url"]).column("url").to_pylist()
    if args.synthetic:
        from suckit_ray.sources.pagestore import SyntheticCorpus, SyntheticPageStore

        corpus = SyntheticCorpus(n_hosts=8, n_docs=args.synthetic, fanout=4)
        store = SyntheticPageStore(corpus)
        config = CrawlConfig(**{**config.__dict__, "origin": corpus.page_url(0, 0)})
        if seeds is None:
            # an explicit seed list (revisit due-list / --seeds-parquet)
            # wins over the corpus's default per-host seeds
            seeds = corpus.seeds()
    else:
        from suckit_ray.sources.pagestore import HttpPageStore

        store = HttpPageStore(
            user_agent=config.user_agent,
            cookie=config.cookie,
            disable_certs_checks=config.disable_certs_checks,
        )

    from suckit_ray.pipelines.crawl import crawl

    res = crawl(
        config,
        store,
        seeds=seeds,
        num_shards=args.shards,
        mirror_dir=args.output,
        output_dir=args.parquet_out,
        warc_dir=args.warc_out,
        warc_cdx_dir=args.warc_cdx,
        checkpoint_dir=args.checkpoint_dir,
        resume=args.resume,
        collect=False,
        max_concurrency=args.jobs,
        delta_hashes=args.delta_hashes or revisit,
        recrawl_from=args.recrawl_from,
        recrawl_seed=not revisit,
        carry_prior_hashes=revisit,
    )
    compact_manifest = None
    if args.compact_out:
        import os as _os

        from suckit_ray.sinks import compact_parquet

        compact_manifest = compact_parquet(
            _os.path.join(args.parquet_out, "docs"),
            args.compact_out,
            target_bytes=args.compact_target_mb * 1024 * 1024,
        )

    wds_samples = None
    if args.wds_out:
        from suckit_ray.sources.wds import export_docs_webdataset

        wds_samples = export_docs_webdataset(args.parquet_out, args.wds_out)

    summary = {
        "pages": res.metrics.get("pages", 0),
        "urls_seen": res.metrics.get("seen_urls", 0),
        "waves": res.waves,
        "wall_sec": round(res.wall_sec, 2),
        "output": args.output,
    }
    if wds_samples is not None:
        summary["wds_samples"] = wds_samples
    if compact_manifest is not None:
        summary["compact_out_files"] = compact_manifest["out_files"]
        summary["compact_rows"] = compact_manifest["n_rows"]
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
