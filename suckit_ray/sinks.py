"""Sinks: the parquet span-document tables (primary, resumable) and a
filesystem mirror identical in layout to the reference's output tree.

The reference writes each page to ``<output>/<host>/<path>`` and, when
Content-Disposition names the file, saves under that name and symlinks
the url-derived path to it (reference src/disk.rs:12-65, call site
src/scraper.rs:262-270). ``write_mirror_batch`` reproduces that layout
from inside a ``map_batches`` stage — each task writes its own rows, so
the mirror write is distributed and idempotent (same doc_id → same
path → same bytes).
"""

from __future__ import annotations

import os

import pyarrow as pa


def _safe_join(root: str, rel: str) -> str:
    """Join defensively: mirror paths derive from crawled URLs, so strip
    any rooted/upward components before touching the filesystem."""
    parts = [p for p in rel.split("/") if p not in ("", ".", "..")]
    return os.path.join(root, *parts)


def write_mirror_batch(batch: pa.Table, output_dir: str) -> pa.Table:
    """Write the downloaded rows of a docs batch as mirror files.
    Returns a small (doc_id, path) table. Content-Disposition aliases:
    bytes land under the alias name; the url-derived path becomes a
    relative symlink to it (reference disk::symlink, src/disk.rs:35-65)."""
    doc_ids = batch.column("doc_id").to_pylist()
    bodies = batch.column("body").to_pylist()
    downloaded = batch.column("downloaded").to_pylist()
    filenames = batch.column("filename").to_pylist()

    out_ids, out_paths = [], []
    for doc_id, body, ok, alias in zip(doc_ids, bodies, downloaded, filenames):
        if not ok:
            continue
        if alias:
            target = _safe_join(output_dir, alias)
            os.makedirs(os.path.dirname(target) or output_dir, exist_ok=True)
            # tmp+rename: the alias path is keyed by the served
            # filename alone (reference parity, src/disk.rs:35-65), so
            # two docs claiming one filename race on this path — the
            # rename makes that race last-writer-wins instead of a
            # torn interleave of both bodies
            tmp = f"{target}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(body or b"")
            os.replace(tmp, target)
            link = _safe_join(output_dir, doc_id)
            os.makedirs(os.path.dirname(link), exist_ok=True)
            rel = os.path.relpath(target, os.path.dirname(link))
            try:
                if os.path.islink(link) or os.path.exists(link):
                    os.remove(link)
                os.symlink(rel, link)
            except OSError:
                # filesystems without symlink support: copy instead
                with open(link, "wb") as f:
                    f.write(body or b"")
            out_paths.append(target)
        else:
            path = _safe_join(output_dir, doc_id)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "wb") as f:
                f.write(body or b"")
            out_paths.append(path)
        out_ids.append(doc_id)
    return pa.table(
        {"doc_id": pa.array(out_ids, pa.string()), "path": pa.array(out_paths, pa.string())}
    )


def write_ledger(ledger: pa.Table, output_dir: str) -> str:
    """Persist the fetch ledger as parquet next to the mirror — the
    queryable upgrade of the reference's write-only visited set."""
    import pyarrow.parquet as pq

    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, "ledger.parquet")
    pq.write_table(ledger, path)
    return path


def write_lance(docs: pa.Table, output_dir: str, mode: str = "append"):
    """North-star sink: a Lance table of interleaved text+media
    documents (BASELINE.json names Lance as the target table format).

    The sandbox image does not ship the ``lance`` package, so this is
    feature-gated: when lance is importable the docs table lands as a
    Lance dataset (append mode per crawl wave = the same resumable
    layout as the parquet path); otherwise callers fall back to the
    per-wave parquet partitions written by ``crawl(output_dir=...)``,
    which carry the identical schema. The substitution is documented in
    README.md / BASELINE.md."""
    try:
        import lance
    except ImportError as e:
        raise NotImplementedError(
            "the 'lance' package is not installed in this environment; "
            "use the per-wave parquet output (same schema, same "
            "partition layout) written by crawl(output_dir=...)"
        ) from e
    return lance.write_dataset(docs, output_dir, mode=mode)


def read_lance(path: str):
    """Read a Lance table of interleaved documents back as a streaming
    ``ray.data.Dataset`` — the read half of the BASELINE.json
    input_hint. Prefers Ray Data's native ``read_lance`` (per-fragment
    read tasks, streaming) when this Ray build ships it; otherwise
    falls back to ``lance.dataset(...).to_table()`` via
    ``from_arrow`` (bounded inputs only — the native reader is the
    scale path). Same feature gate + documented parquet substitution
    as ``write_lance``."""
    try:
        import lance
    except ImportError as e:
        raise NotImplementedError(
            "the 'lance' package is not installed in this environment; "
            "read the per-wave parquet partitions with "
            "ray.data.read_parquet instead (identical schema)"
        ) from e
    import ray.data as rd

    if hasattr(rd, "read_lance"):
        return rd.read_lance(path)
    return rd.from_arrow(lance.dataset(path).to_table())


def compact_parquet(
    src_dir: str,
    out_dir: str,
    target_bytes: int = 256 * 1024 * 1024,
) -> dict:
    """Bin-pack a small-files parquet tree (the crawl's per-wave
    partitions: one file per shard per wave) into ~``target_bytes``
    files — the compaction pass a 10^10-page crawl needs before its
    output is query-efficient (row-group pruning, fewer file opens).

    One streaming Ray Data pass: read → ``repartition(n,
    shuffle=False)`` (block coalescing, NO all-to-all exchange) →
    write to a staging dir, then a two-rename swap (old tree aside,
    complete staging tree — manifest already fsynced inside — into
    place, THEN delete the retired tree). Crash safety: the only
    no-readable-output window is the instant between the two renames;
    the next run RESTORES the retired tree before rebuilding, so the
    old data reappears even if that run also dies early. Concurrency:
    stale staging/retired dirs are swept only when their owning pid
    is dead — two live runs never delete each other's trees (the
    final swap is still last-writer-wins, as any overwrite is).
    Returns the manifest.

    At 100 TB one global repartition is still a single pipeline but
    its output granule is the whole corpus; run this per key-range
    partition (e.g. per host bucket) and swap per-partition manifests
    so a failed run skips finished partitions — same primitive, keyed
    resumability."""
    import json
    import math
    import shutil

    import ray.data as rd

    src_bytes = 0
    src_files = 0
    for root, _, files in os.walk(src_dir):
        for f in files:
            if f.endswith(".parquet"):
                src_bytes += os.path.getsize(os.path.join(root, f))
                src_files += 1
    n_out = max(1, math.ceil(src_bytes / target_bytes))

    # recover + clean up after crashed runs, without racing a LIVE
    # concurrent run: stale staging/retired dirs are swept only when
    # their embedded pid is dead (/proc check), and if a crash in the
    # two-rename window left NO out_dir, the newest dead retired tree
    # is restored first so readers regain the old data even if THIS
    # run also fails before its swap
    def _pid_of(name: str) -> int | None:
        try:
            return int(name.rsplit("-", 1)[1])
        except (IndexError, ValueError):
            return None

    parent = os.path.dirname(os.path.abspath(out_dir)) or "."
    base = os.path.basename(out_dir)
    if os.path.isdir(parent):
        dead = []
        for d in os.listdir(parent):
            if d.startswith(f"{base}.staging-") or d.startswith(f"{base}.retired-"):
                pid = _pid_of(d)
                if pid is not None and os.path.exists(f"/proc/{pid}"):
                    continue  # a live run owns this dir — hands off
                dead.append(d)
        retired_dead = sorted(
            (d for d in dead if f"{base}.retired-" in d),
            key=lambda d: os.path.getmtime(os.path.join(parent, d)),
        )
        if not os.path.exists(out_dir) and retired_dead:
            os.replace(os.path.join(parent, retired_dead[-1]), out_dir)
            retired_dead = retired_dead[:-1]
        for d in [d for d in dead if f"{base}.staging-" in d] + retired_dead:
            shutil.rmtree(os.path.join(parent, d), ignore_errors=True)
    staging = f"{out_dir}.staging-{os.getpid()}"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    ds = rd.read_parquet(src_dir)
    n_rows = ds.count()
    ds.repartition(n_out, shuffle=False).write_parquet(staging)
    manifest = {
        "src_dir": src_dir,
        "src_files": src_files,
        "src_bytes": src_bytes,
        "n_rows": n_rows,
        "target_bytes": target_bytes,
        "out_files": len(
            [f for f in os.listdir(staging) if f.endswith(".parquet")]
        ),
    }
    with open(os.path.join(staging, "_COMPACT_MANIFEST.json"), "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    # swap via two renames, not rmtree-then-rename: the only crash
    # window is the instant between the two metadata ops (the old tree
    # survives intact under .retired-<pid> and a rerun both recovers
    # disk and rebuilds the output); deleting the old tree — the slow,
    # interruptible part — happens strictly AFTER the new tree is live
    retired = None
    if os.path.exists(out_dir):
        retired = f"{out_dir}.retired-{os.getpid()}"
        os.replace(out_dir, retired)
    os.replace(staging, out_dir)
    if retired:
        shutil.rmtree(retired, ignore_errors=True)
    return manifest
