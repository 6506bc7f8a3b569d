"""WebDataset-style tar-shard source + sink — the de-facto interchange
layout for multimodal training corpora (github.com/webdataset, public
format): a dataset is a set of POSIX tar files whose members are named
``<sample key>.<extension>``; all members sharing a key form one
sample (``000123.jpg`` + ``000123.txt`` + ``000123.json``). Training
loaders stream shards sequentially, so shard = unit of IO parallelism
— exactly Ray Data's block model:

- ``write_webdataset_batch`` runs inside ``map_batches``: each task
  writes its rows as ONE tar shard named after the content hash
  (idempotent re-runs, the WARC-segment convention). Member headers
  are normalized (mtime=0, uid/gid=0) so identical inputs produce
  byte-identical shards.
- ``read_webdataset`` streams shards back: one untar task per file,
  members regrouped into samples by key, one row per sample with a
  binary column per extension. Rows never visit the driver.

Scale note: sample bytes live only inside their task's batch; a
100 TB corpus is just more shards. Keep ``batch_size`` small for
wide samples (images/audio) exactly like the media stages do.
"""

from __future__ import annotations

import hashlib
import io
import os
import tarfile

import pyarrow as pa

import ray.data as rd


def write_webdataset_batch(
    batch: pa.Table,
    output_dir: str,
    *,
    key_col: str = "key",
    ext_cols: dict[str, str] | None = None,
) -> pa.Table:
    """Write one batch as one tar shard. ``ext_cols`` maps member
    extension → batch column; string columns are utf-8 encoded, binary
    columns pass through. Returns a small (shard, n_samples) table."""
    os.makedirs(output_dir, exist_ok=True)
    ext_cols = ext_cols or {"txt": "text"}
    keys = batch.column(key_col).to_pylist()
    payloads: dict[str, list] = {
        ext: batch.column(col).to_pylist() for ext, col in ext_cols.items()
    }
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for i, key in enumerate(keys):
            for ext in sorted(payloads):  # stable member order per sample
                data = payloads[ext][i]
                if data is None:
                    continue
                if isinstance(data, str):
                    data = data.encode("utf-8")
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(data)
                info.mtime = 0  # normalized: stable bytes
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tf.addfile(info, io.BytesIO(data))
    raw = buf.getvalue()
    name = f"shard-{hashlib.blake2b(raw, digest_size=8).hexdigest()}.tar"
    path = os.path.join(output_dir, name)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(raw)
    os.replace(tmp, path)
    return pa.table(
        {
            "shard": pa.array([name]),
            "n_samples": pa.array([len(keys)], pa.int64()),
        }
    )


def write_webdataset(
    ds: rd.Dataset,
    output_dir: str,
    *,
    key_col: str = "key",
    ext_cols: dict[str, str] | None = None,
) -> int:
    """Distributed WebDataset sink; returns total sample count."""
    seg = ds.map_batches(
        lambda t: write_webdataset_batch(
            t, output_dir, key_col=key_col, ext_cols=ext_cols
        ),
        batch_format="pyarrow",
    )
    total = 0
    for b in seg.iter_batches(batch_format="pyarrow"):
        total += sum(b.column("n_samples").to_pylist())
    return total


def _resolve_tar_paths(paths: str | list[str]) -> list[str]:
    if isinstance(paths, str):
        if os.path.isdir(paths):
            return sorted(
                os.path.join(paths, n)
                for n in os.listdir(paths)
                if n.endswith(".tar")
            )
        return [paths]
    return list(paths)


def read_webdataset(paths: str | list[str]) -> rd.Dataset:
    """Dataset of samples from tar shard(s)/dir: one row per sample
    key with columns (key, ext, data) EXPLODED per member — the
    neutral relational shape; regroup by key downstream when a sample
    needs all its modalities together (keys never split across shards
    by construction of the writer)."""
    files = rd.read_binary_files(_resolve_tar_paths(paths), include_paths=False)

    def untar(batch: pa.Table) -> pa.Table:
        keys, exts, datas = [], [], []
        for raw in batch.column("bytes").to_pylist():
            with tarfile.open(fileobj=io.BytesIO(raw)) as tf:
                for m in tf.getmembers():
                    if not m.isfile():
                        continue
                    stem, _, ext = m.name.rpartition(".")
                    keys.append(stem)
                    exts.append(ext)
                    datas.append(tf.extractfile(m).read())
        return pa.table(
            {
                "key": pa.array(keys, pa.string()),
                "ext": pa.array(exts, pa.string()),
                "data": pa.array(datas, pa.binary()),
            }
        )

    return files.map_batches(untar, batch_format="pyarrow", batch_size=2)


def export_docs_webdataset(parquet_root: str, out_dir: str) -> int:
    """Stream a crawl's per-wave parquet docs (``output_dir/docs/
    wave-*``, the ``--parquet-out`` layout) into WebDataset tar
    shards: one sample per downloaded page, key =
    blake2s(doc_id)[:16] (tar-safe, collision-negligible), members
    ``bin`` (the mirrored body bytes — links already rewritten) and
    ``json`` (doc_id, url, data_type, charset, wave). This is the
    crawl → training-loader bridge: the mirror becomes a sequential-
    streaming corpus without any driver materialization (each wave
    file maps to shard-writing tasks; returns the total sample
    count). CLI: ``--wds-out DIR`` (requires ``--parquet-out``)."""
    import glob
    import json as _json
    import shutil

    # fresh output: shards are content-hash named and only ever ADDED,
    # so re-exporting into a stale dir would mix runs (duplicate keys,
    # stale bodies) — same idempotent-re-run rule as the per-wave
    # parquet's _fresh_dir
    shutil.rmtree(out_dir, ignore_errors=True)

    paths = sorted(
        glob.glob(os.path.join(parquet_root, "docs", "wave-*", "*.parquet"))
    )
    if not paths:
        return 0
    ds = rd.read_parquet(paths)

    def to_samples(t: pa.Table) -> pa.Table:
        keys, bins, metas = [], [], []
        for doc_id, body, url, dt, cs, wave in zip(
            t.column("doc_id").to_pylist(),
            t.column("body").to_pylist(),
            t.column("url").to_pylist(),
            t.column("data_type").to_pylist(),
            t.column("charset").to_pylist(),
            t.column("wave").to_pylist(),
        ):
            keys.append(
                hashlib.blake2s(doc_id.encode("utf-8")).hexdigest()[:16]
            )
            bins.append(body or b"")
            metas.append(
                _json.dumps(
                    {
                        "doc_id": doc_id,
                        "url": url,
                        "data_type": dt,
                        "charset": cs,
                        "wave": wave,
                    },
                    sort_keys=True,
                )
            )
        return pa.table(
            {
                "key": pa.array(keys, pa.string()),
                "bin": pa.array(bins, pa.binary()),
                "json": pa.array(metas, pa.string()),
            }
        )

    return write_webdataset(
        ds.map_batches(to_samples, batch_format="pyarrow"),
        out_dir,
        key_col="key",
        ext_cols={"bin": "bin", "json": "json"},
    )
