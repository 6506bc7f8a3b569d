"""Wave-loop crawl driver — the deterministic rebuild of the
reference's unbounded-channel + idle-poll scraper loop
(src/scraper.rs:296-335):

    seed → LOOP { finalize frontier wave → Dataset(fetch → process)
                  → docs sink; candidates/ledger flow to shards }
    until every shard is drained.

Each BFS wave is a bounded ``ray.data.Dataset`` streaming through
fetch and HTML-process ``map_batches`` stages; frontier/dedup/ledger
state lives in hash-partitioned shard actors (state/frontier.py).
Termination is exact (frontier empty), not the reference's racy
10×500 ms idle-poll heuristic (src/scraper.rs:315-330).

Checkpoint/resume (north_rule): after each ``finalize_wave`` the
shards snapshot their full state (seen-set tiers, pending queues, the
released-but-unfetched wave, ledger) plus a driver manifest with the
lineage epoch. Resume restores the shards and re-runs the in-flight
wave; per-wave output directories make the re-run idempotent.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import pyarrow as pa

import ray
import ray.data as rd
from suckit_ray.config import CrawlConfig
from suckit_ray.stages.crawl_stage import make_crawl_fn
from suckit_ray.stages.fetch import make_fetch_fn
from suckit_ray.stages.html_stage import DOC_SCHEMA, make_process_fn
from suckit_ray.state.frontier import (  # noqa: F401 (schemas re-exported)
    FRONTIER_SCHEMA,
    LEDGER_SCHEMA,
    FrontierShard,
    shard_of,
)
from suckit_ray.urlkit import parse_url, to_path


@dataclass
class CrawlResult:
    docs: pa.Table | None          # collected documents (collect=True)
    output_dir: str | None         # parquet mirror root (output_dir mode)
    ledger: pa.Table               # every visited URL
    metrics: dict = field(default_factory=dict)
    waves: int = 0
    wall_sec: float = 0.0

    def downloaded_docs(self) -> pa.Table:
        """Rows actually saved (download filter ∧ not dry-run) — the
        reference's mirror file set."""
        assert self.docs is not None
        mask = self.docs.column("downloaded")
        return self.docs.filter(mask)


def _dataset_to_table(ds: rd.Dataset) -> pa.Table:
    # iter_batches executes exactly once; to_arrow_refs would add a
    # limit-1 schema-probe execution that re-runs side-effecting tasks
    tables = [
        t
        for t in ds.iter_batches(batch_size=None, batch_format="pyarrow")
        if t.num_rows > 0
    ]
    if not tables:
        return DOC_SCHEMA.empty_table()
    return pa.concat_tables(tables, promote_options="default")


def crawl(
    config: CrawlConfig,
    store,
    *,
    seeds: list[str] | None = None,
    num_shards: int = 4,
    fetch_batch_size: int = 128,
    fetch_num_cpus: float = 0.5,
    proc_num_cpus: float = 0.5,
    max_parallel_blocks: int = 64,
    fuse_stages: bool = True,
    reserve_cpus: int | None = None,
    max_concurrency: int | None = None,
    mirror_dir: str | None = None,
    output_dir: str | None = None,
    warc_dir: str | None = None,
    warc_cdx_dir: str | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    collect: bool | None = None,
    max_waves: int | None = None,
    max_wall_sec: float | None = None,
    max_wave_entries: int | None = None,
    spill_threshold: int = 2_000_000,
    pending_mem_limit: int = 500_000,
    ledger_mem_rows: int = 500_000,
    delta_hashes: bool = False,
    recrawl_from: str | None = None,
    recrawl_seed: bool = True,
    carry_prior_hashes: bool = False,
) -> CrawlResult:
    """Run a crawl to completion. ``store`` is any PageStore; it is put
    into the object store once and read zero-copy by every fetch task.

    ``collect`` defaults to True when no ``output_dir`` is given (test
    mode, returns the docs table) and False otherwise (bench/scale mode,
    streams each wave to ``output_dir/wave=K/`` partitioned parquet —
    the resumable layout).

    ``max_wave_entries`` bounds the TOTAL entries released per wave
    (split evenly across shards): the memory bound that keeps a
    10^8-URL BFS wave from materializing as one per-shard Arrow table —
    overflow stays in the shards' pending spill tiers and drains as
    additional sub-waves. Crawl-set equality is unaffected (pure FIFO
    re-ordering across wave boundaries); only the depth-labeled wave
    numbering of entries shifts, so leave it None when reproducing the
    reference's exact per-wave grouping matters.

    ``delta_hashes`` / ``recrawl_from``: delta recrawl. With
    ``delta_hashes`` (needs ``output_dir``) the run records per-url
    body fingerprints as ``hashes_parts/shard_NNNN.parquet``. A later
    run passing ``recrawl_from=<that output_dir>`` seeds from the
    prior ledger, attaches each url's prior hash to its frontier entry
    at release (shard-partitioned — no broadcast), and pages whose
    bodies are unchanged skip parsing/spans/candidates/doc rows: the
    docs output is the DELTA (changed + new pages), the ledger still
    records every fetch, and a fresh hashes_parts is written for the
    next increment. ``carry_prior_hashes`` makes that artifact carry
    forward prior hashes for urls this run did not fetch — required
    for BUDGETED revisits (depth=0 over a due-list from
    ``pipelines.revisit.plan_revisit``), which refresh only their
    seeds but must leave a complete fingerprint set behind."""
    t0 = time.perf_counter()
    cfg = config.resolved()
    if cfg.seen_filter == "auto":
        # delta recrawls default to the delete-capable cuckoo
        # pre-screen: a previously-alive url that 404s/410s this run
        # (crawl_diff status='removed') is retired from its shard's
        # seen set, so a later rediscovery — the page restored and
        # re-linked from a changed page — refetches it instead of
        # being first-wins blocked. Fresh crawls resolve to bloom
        # (reference parity: dead urls stay seen); an EXPLICIT
        # seen_filter is honored as given.
        from dataclasses import replace as _replace

        cfg = _replace(
            cfg,
            seen_filter="cuckoo" if recrawl_from is not None else "bloom",
        )
    if collect is None:
        collect = output_dir is None
    # delta recrawl: ``recrawl_from`` points at a prior run's
    # output_dir (its hashes_parts/ + ledger_parts/); implies hash
    # recording so THIS run can seed the next increment.
    _delta = delta_hashes or recrawl_from is not None
    if _delta and output_dir is None:
        raise ValueError(
            "delta_hashes/recrawl_from require output_dir: the body "
            "fingerprints are written as output_dir/hashes_parts/ and "
            "a recrawl without them would silently be a full crawl"
        )

    store_ref = ray.put(store)
    # leave headroom for the driver + shard actors: on a saturated node
    # the wave loop is latency-sensitive and starving the orchestrator
    # costs more than a few task slots (measured: 32 tasks on 32 cores
    # is ~2x slower than 28 tasks + free orchestrator)
    total_cpus = int(ray.cluster_resources().get("CPU", 8))
    if reserve_cpus is None:
        reserve_cpus = max(1, total_cpus // 8)
    task_concurrency = max(2, total_cpus - reserve_cpus)
    if max_concurrency is not None:  # the reference's --jobs knob
        task_concurrency = max(1, min(task_concurrency, max_concurrency))
    ShardActor = ray.remote(num_cpus=0)(FrontierShard)
    shards = [
        ShardActor.remote(
            i,
            num_shards,
            spill_threshold,
            pending_mem_limit,
            ledger_mem_rows,
            priority_patterns=cfg.priority_patterns,
            seen_filter=cfg.seen_filter,
            host_error_budget=cfg.host_error_budget,
            host_url_budget=cfg.host_url_budget,
            canonicalize=cfg.canonicalize_urls,
            opic=cfg.opic,
        )
        for i in range(num_shards)
    ]

    start_wave = 0
    if resume:
        if not checkpoint_dir:
            raise ValueError("resume=True requires checkpoint_dir")
        manifest_path = os.path.join(checkpoint_dir, "MANIFEST.json")
        with open(manifest_path) as f:
            manifest = json.load(f)
        if manifest["num_shards"] != num_shards:
            # an explicit raise, not an assert: python -O strips asserts
            # and a silent mismatch re-routes candidates modulo the
            # wrong shard count, dropping half the restored frontier
            raise ValueError(
                f"checkpoint was written with num_shards="
                f"{manifest['num_shards']}, resume got {num_shards}"
            )
        start_wave = manifest["next_wave"]
        restored = ray.get(
            [
                s.restore.remote(_snap_path(checkpoint_dir, i, start_wave))
                for i, s in enumerate(shards)
            ]
        )
        if any(w != start_wave for w in restored):
            raise RuntimeError(
                f"torn checkpoint: manifest next_wave={start_wave} but "
                f"shard snapshots restored waves {sorted(set(restored))}"
            )
    else:
        seed_urls = seeds if seeds is not None else [cfg.origin]
        _recrawl_seed = False
        if recrawl_from is not None:
            import glob

            hash_parts = sorted(
                glob.glob(os.path.join(recrawl_from, "hashes_parts", "*.parquet"))
            )
            meta_path = os.path.join(recrawl_from, "hashes_parts", "META.json")
            same_layout = False
            if os.path.exists(meta_path) and len(hash_parts) == num_shards:
                with open(meta_path) as f:
                    hmeta = json.load(f)
                same_layout = (
                    hmeta.get("num_shards") == num_shards
                    and hmeta.get("route_by_host") == cfg.politeness_on
                    and hmeta.get("canonicalize", False)
                    == cfg.canonicalize_urls
                )
            if hash_parts:
                # same_layout (META num_shards + routing + canonicalize
                # all match): part i was WRITTEN by shard i under this
                # exact routing, so it loads verification-free; ANY
                # layout difference routes every part to every shard
                # with shard-side ownership re-derivation under the
                # CURRENT routing
                ray.get(
                    [
                        s.load_recrawl_hashes.remote(
                            [p], cfg.politeness_on, verify_ownership=False
                        )
                        for s, p in zip(shards, hash_parts)
                    ]
                    if same_layout
                    else [
                        s.load_recrawl_hashes.remote(
                            hash_parts, cfg.politeness_on
                        )
                        for s in shards
                    ]
                )
                # recrawl_seed=False: a BUDGETED revisit — prior
                # hashes still load (unchanged seeds skip), but only
                # the explicit due-list seeds enter the frontier
                _recrawl_seed = recrawl_seed
        if cfg.use_sitemaps and store is not None:
            from suckit_ray.sitemap import gather_sitemap_seeds

            extra = gather_sitemap_seeds(store, cfg.origin, tries=cfg.tries)
            have = set(seed_urls)
            seed_urls = seed_urls + [u for u in extra if u not in have]
        by_shard: dict[int, list[tuple[str, str]]] = {}
        route_by_host = cfg.politeness_on
        for s in seed_urls:
            p = parse_url(s)
            # seed enters the seen-map exactly like the reference's
            # map_url_path(origin, to_path(origin, false)) (src/scraper.rs:298-302)
            key = p.as_str()
            to_path(p, False)  # validate it derives
            from suckit_ray.state.frontier import shard_of_url
            from suckit_ray.urlkit import canonical_url

            rk = canonical_url(key) if cfg.canonicalize_urls else key
            by_shard.setdefault(
                shard_of_url(rk, p.host or "", num_shards, route_by_host), []
            ).append((key, p.host or ""))
        ray.get(
            [shards[i].seed.remote(ents) for i, ents in by_shard.items()]
        )
        if _recrawl_seed:
            # prior-run urls enter at their RECORDED (depth, ext_depth)
            # so finite --depth/--ext-depth gate exactly like a fresh
            # crawl; explicit seeds above win first-seen at depth 0
            ray.get([s.seed_recrawl.remote() for s in shards])

    import random

    politeness_rng = random.Random(42)  # seeded: reproducible politeness
    # the reference sleeps delay + U(0..=random_range) whenever EITHER
    # knob is nonzero (src/scraper.rs:342) — a random_range-only config
    # is still a rate limit, not a no-op
    max_per_host = 1 if cfg.politeness_on else None
    per_shard_cap = (
        max(1, -(-max_wave_entries // num_shards))
        if max_wave_entries is not None
        else None
    )
    wave = start_wave
    docs_tables: list[pa.Table] = []
    pages_total = 0
    last_wave_started = 0.0
    last_wave_finished = 0.0
    wave_stats: list[dict] = []

    while True:
        if resume and wave == start_wave:
            # re-run the in-flight wave from the restored released state
            counts = ray.get([s.released_count.remote() for s in shards])
        else:
            t_fin = time.perf_counter()
            counts = ray.get(
                [
                    s.finalize_wave.remote(
                        wave, cfg.depth, cfg.ext_depth, max_per_host, per_shard_cap
                    )
                    for s in shards
                ]
            )
            if os.environ.get("GRAFT_CRAWL_DEBUG"):
                print(f"[crawl] finalize wave={wave}: {time.perf_counter() - t_fin:.2f}s", flush=True)
            if checkpoint_dir:
                _checkpoint(checkpoint_dir, shards, wave)
        n_entries = sum(counts)
        if n_entries == 0:
            # Nothing released — but robots Crawl-delay gating may be
            # holding pending hosts. Sleep until the nearest deadline
            # and re-drain (same wave: the previous release was empty,
            # so seq numbering cannot collide). Terminate only when
            # pending is truly empty or no deadline explains the block.
            stale_retries = 0
            while True:
                info = ray.get([s.delay_block_info.remote() for s in shards])
                n_pending = sum(i[0] for i in info)
                waits = [i[1] for i in info if i[1] is not None]
                if n_pending == 0:
                    break
                if waits:
                    time.sleep(min(waits) + 0.005)
                elif stale_retries >= 2:
                    break  # pending without any deadline: not delay-blocked
                else:
                    # a deadline may have expired between finalize and
                    # the info call — re-drain before concluding
                    stale_retries += 1
                counts = ray.get(
                    [
                        s.finalize_wave.remote(
                            wave, cfg.depth, cfg.ext_depth, max_per_host, per_shard_cap
                        )
                        for s in shards
                    ]
                )
                n_entries = sum(counts)
                if n_entries:
                    break
        if n_entries == 0:
            break
        if max_waves is not None and wave - start_wave >= max_waves:
            break
        # opt-in wall-clock budget (rebuild-only: the pages-in-T-seconds
        # protocol of the reference's tests/benchmark.py). Checked at
        # wave boundaries so every counted page is fully processed.
        if max_wall_sec is not None and time.perf_counter() - t0 >= max_wall_sec:
            break

        # politeness floor between waves (budget-equivalence: with
        # max_per_host=1 a host is fetched at most once per wave, so
        # spacing >= delay needs the gap anchored to the PREVIOUS
        # wave's END — anchoring to its start lets a host fetched late
        # in wave N be re-hit early in wave N+1 with near-zero spacing
        # whenever a wave runs longer than the delay. random_range adds
        # seeded jitter like the reference's per-worker
        # delay + U(0..=random_range), src/scraper.rs:338-350)
        if cfg.politeness_on and last_wave_finished:
            jitter = politeness_rng.uniform(0, cfg.random_range) if cfg.random_range else 0.0
            sleep_left = (cfg.delay + jitter) - (time.perf_counter() - last_wave_finished)
            if sleep_left > 0:
                time.sleep(sleep_left)
        last_wave_started = time.perf_counter()

        # shards put their released entries into the object store as
        # Arrow table chunks; the wave Dataset is built straight from
        # those refs — entries never transit driver memory (a 10^8-row
        # wave stays distributed end to end)
        block_rows = max(fetch_batch_size, -(-n_entries // max_parallel_blocks))
        wave_refs = [
            r
            for part in ray.get(
                [s.released_refs.remote(block_rows) for s in shards]
            )
            for r in part
        ]
        ds = rd.from_arrow_refs(wave_refs)
        _wdir = warc_dir if (warc_dir is not None and not cfg.dry_run) else None
        if fuse_stages:
            ds = ds.map_batches(
                make_crawl_fn(store_ref, cfg, shards, wave, warc_dir=_wdir,
                              delta_hashes=_delta),
                batch_format="pyarrow",
                batch_size=fetch_batch_size,
                num_cpus=proc_num_cpus,
                concurrency=task_concurrency,
            )
        else:
            ds = ds.map_batches(
                make_fetch_fn(store_ref, cfg),
                batch_format="pyarrow",
                batch_size=fetch_batch_size,
                num_cpus=fetch_num_cpus,
            )
            if _wdir is not None:
                from suckit_ray.stages.crawl_stage import make_warc_stage

                ds = ds.map_batches(make_warc_stage(_wdir), batch_format="pyarrow")
            ds = ds.map_batches(
                make_process_fn(cfg, shards, wave, store_ref=store_ref,
                                delta_hashes=_delta),
                batch_format="pyarrow",
                batch_size=fetch_batch_size,
                num_cpus=proc_num_cpus,
            )

        if mirror_dir is not None and not cfg.dry_run:
            from suckit_ray.sinks import write_mirror_batch

            _mdir = mirror_dir

            def _mirror_stage(b, _d=_mdir):
                write_mirror_batch(b, _d)
                return b

            ds = ds.map_batches(_mirror_stage, batch_format="pyarrow")

        # Consume the wave EXACTLY ONCE — the process stage pushes
        # candidates/ledger to the shard actors as a side effect, so a
        # second consumption would re-run tasks and double-ingest.
        if collect:
            wave_tbl = _dataset_to_table(ds)
            docs_tables.append(wave_tbl)
            pages_total += wave_tbl.num_rows
            if output_dir is not None and not cfg.dry_run:
                import pyarrow.parquet as pq

                wave_dir = os.path.join(output_dir, "docs", f"wave-{wave:05d}")
                _fresh_dir(wave_dir)
                pq.write_table(
                    wave_tbl.filter(wave_tbl.column("downloaded")),
                    os.path.join(wave_dir, "part-0.parquet"),
                )
        elif output_dir is not None and not cfg.dry_run:
            wave_dir = os.path.join(output_dir, "docs", f"wave-{wave:05d}")
            _fresh_dir(wave_dir)  # idempotent re-run of a resumed wave
            saved = ds.map_batches(
                lambda t: t.filter(t.column("downloaded")), batch_format="pyarrow"
            )
            saved.write_parquet(wave_dir)
            pages_total += n_entries
        else:
            # count-only consumption (dry-run semantics, S6)
            pages_total += ds.count()

        last_wave_finished = time.perf_counter()
        wave_stats.append(
            {
                "wave": wave,
                "entries": n_entries,
                "sec": round(last_wave_finished - last_wave_started, 4),
                "driver_rss_mb": _driver_rss_mb(),
            }
        )
        if cfg.host_error_budget is not None or cfg.host_url_budget is not None:
            opened: set[str] = set()
            if cfg.host_error_budget is not None:
                for part in ray.get(
                    [s.take_opened_breakers.remote() for s in shards]
                ):
                    opened.update(part)
            if cfg.host_url_budget is not None:
                # crawler-trap guard, two phases: (1) shards report
                # hosts at/above a coarse hint — the summed counts
                # UNDERCOUNT (sub-hint shards are missing), so any sum
                # already over budget trips with certainty; (2) hosts
                # whose undercounted sum lands NEAR the budget get an
                # exact per-host count round so a plateauing trap
                # cannot hide in the undercount gap forever
                budget = cfg.host_url_budget
                hint = max(1, budget // (num_shards * 2))
                totals: dict[str, int] = {}
                for part in ray.get(
                    [s.host_accept_counts.remote(hint) for s in shards]
                ):
                    for h, c in part.items():
                        totals[h] = totals.get(h, 0) + c
                opened.update(h for h, c in totals.items() if c > budget)
                near = [
                    h
                    for h, c in totals.items()
                    if budget // 2 < c <= budget and h not in opened
                ]
                if near:
                    exact: dict[str, int] = {}
                    for part in ray.get(
                        [s.host_counts_for.remote(near) for s in shards]
                    ):
                        for h, c in part.items():
                            exact[h] = exact.get(h, 0) + c
                    opened.update(h for h, c in exact.items() if c > budget)
            if opened:
                # wave-synchronous broadcast: every shard drops the
                # tripped hosts' entries starting with the NEXT release
                ray.get(
                    [s.open_breakers.remote(sorted(opened)) for s in shards]
                )
        if checkpoint_dir:
            # keep the in-flight wave restorable until durably written;
            # without checkpoints the next finalize overwrites it anyway
            # and the ack round-trip is pure inter-wave latency
            ray.get([s.ack_wave.remote() for s in shards])
        if cfg.verbose or os.environ.get("GRAFT_CRAWL_DEBUG"):
            print(
                f"[crawl] wave={wave} entries={n_entries} "
                f"consume={time.perf_counter() - last_wave_started:.2f}s",
                flush=True,
            )
        wave += 1

    if output_dir is not None and not cfg.dry_run:
        # scale path: each shard writes its ledger partition straight to
        # parquet (never transits the driver); the driver reads the
        # parts back only to satisfy the CrawlResult API
        import pyarrow.parquet as pq

        part_paths = [
            os.path.join(output_dir, "ledger_parts", f"shard_{i:04d}.parquet")
            for i in range(len(shards))
        ]
        ray.get(
            [s.flush_ledger.remote(p) for s, p in zip(shards, part_paths)]
        )
        ledger = pa.concat_tables([pq.read_table(p) for p in part_paths])
        if _delta:
            hdir = os.path.join(output_dir, "hashes_parts")
            os.makedirs(hdir, exist_ok=True)
            ray.get(
                [
                    s.flush_hashes.remote(
                        os.path.join(hdir, f"shard_{i:04d}.parquet"),
                        carry_prior=carry_prior_hashes,
                    )
                    for i, s in enumerate(shards)
                ]
            )
            with open(os.path.join(hdir, "META.json"), "w") as f:
                json.dump(
                    {
                        "num_shards": num_shards,
                        "route_by_host": cfg.politeness_on,
                        "canonicalize": cfg.canonicalize_urls,
                    },
                    f,
                )
    else:
        parts = ray.get([s.get_ledger.remote() for s in shards])
        ledger = pa.concat_tables(parts) if parts else LEDGER_SCHEMA.empty_table()
    counters: dict[str, int] = {}
    for c in ray.get([s.get_counters.remote() for s in shards]):
        for k, v in c.items():
            counters[k] = counters.get(k, 0) + v
    seen_total = sum(ray.get([s.seen_count.remote() for s in shards]))
    counters["seen_urls"] = seen_total
    counters["pages"] = pages_total
    counters["wave_stats"] = wave_stats

    if (output_dir or mirror_dir) and not cfg.dry_run:
        from suckit_ray.sinks import write_ledger

        write_ledger(ledger, output_dir or mirror_dir)

    if warc_cdx_dir is not None and warc_dir is not None and not cfg.dry_run:
        # archive + index in one run: the CDX build is its own
        # distributed pass over the finished segments (one task per
        # file), written as parquet next to them
        from suckit_ray.sources.warc import build_cdx

        build_cdx(warc_dir).write_parquet(warc_cdx_dir)

    docs = None
    if collect:
        docs = (
            pa.concat_tables(docs_tables, promote_options="default")
            if docs_tables
            else DOC_SCHEMA.empty_table()
        )

    for s in shards:
        ray.kill(s)

    return CrawlResult(
        docs=docs,
        output_dir=output_dir,
        ledger=ledger,
        metrics=counters,
        waves=wave - start_wave,
        wall_sec=time.perf_counter() - t0,
    )


def _driver_rss_mb() -> float:
    """Driver resident-set size in MB (per-wave evidence that frontier
    entries/candidates no longer transit driver memory)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return round(int(line.split()[1]) / 1024, 1)
    except OSError:
        pass
    return 0.0


def _fresh_dir(path: str) -> None:
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)


def _snap_path(checkpoint_dir: str, shard_id: int, wave: int) -> str:
    return os.path.join(checkpoint_dir, f"shard_{shard_id:04d}.w{wave:05d}.pkl")


def _checkpoint(checkpoint_dir: str, shards: list, wave: int) -> None:
    """Checkpoint = wave-stamped shard pickles + MANIFEST rename, in
    that order. The pickles are NEW files per wave (never overwrites),
    so a crash anywhere before the manifest's os.replace leaves the
    previous manifest still pointing at its own intact wave files —
    the manifest IS the commit point. Prior waves' files (and their
    spill copies, which share the pickle's basename prefix) are
    garbage-collected only after the rename lands."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    ray.get(
        [
            s.snapshot.remote(_snap_path(checkpoint_dir, i, wave), wave)
            for i, s in enumerate(shards)
        ]
    )
    manifest = {"next_wave": wave, "num_shards": len(shards), "epoch": wave}
    tmp = os.path.join(checkpoint_dir, "MANIFEST.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(checkpoint_dir, "MANIFEST.json"))
    keep = f".w{wave:05d}."
    for name in os.listdir(checkpoint_dir):
        if name.startswith("shard_") and ".w" in name and keep not in name:
            try:
                os.remove(os.path.join(checkpoint_dir, name))
            except OSError:
                pass
