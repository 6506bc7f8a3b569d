"""Text-format source/sink ops: JSONL and CSV round-trips proven
end to end against the documents table (SQL-oracle-checkable).

Both directions are fully distributed Ray Data IO: ``write_json`` /
``write_csv`` emit one file per block from the writing tasks, and
``read_json`` / ``read_csv`` fan the files back out as a streaming
source — nothing transits the driver. The round-trip queries return
the re-read table itself, so the DuckDB oracle is the IDENTITY select
over documents: any quoting, escaping, encoding or dtype defect in
either direction breaks the value-hash match. The documents text
column carries real unicode; the dedicated edge-case test feeds
embedded newlines, quotes, commas, tabs and empty strings through the
same helpers.

Scratch placement follows warcops: distributed writes land in
``$GRAFT_SCRATCH_DIR`` when set (multi-node: must be shared storage
visible to all nodes and the driver), else a driver-local mkdtemp —
correct only single-node.
"""

from __future__ import annotations

import os
import tempfile

import ray.data as rd

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _scratch(prefix: str) -> str:
    scratch = os.environ.get("GRAFT_SCRATCH_DIR")
    if scratch:
        return tempfile.mkdtemp(prefix=prefix, dir=scratch)
    return tempfile.mkdtemp(prefix=prefix)


def roundtrip_jsonl(ds: rd.Dataset, out_dir: str | None = None) -> rd.Dataset:
    """Write ``ds`` as JSONL (one file per block, distributed), read
    it back as a streaming source. JSON escaping (\\n, \\", \\uXXXX)
    is what keeps embedded structure intact."""
    out = out_dir or _scratch("suckit_jsonl_rt_")
    ds.write_json(out)
    return rd.read_json(out)


def roundtrip_csv(ds: rd.Dataset, out_dir: str | None = None) -> rd.Dataset:
    """Write ``ds`` as CSV (one file per block, distributed), read it
    back. Arrow's writer quotes fields containing separators, quotes
    or newlines; the reader must undo exactly that."""
    out = out_dir or _scratch("suckit_csv_rt_")
    ds.write_csv(out)
    return rd.read_csv(out)


def docs_jsonl_roundtrip(sf_dir: str) -> rd.Dataset:
    """queries() entry: documents → JSONL → back. Oracle: identity
    SELECT over documents — hash-exact round-trip or bust."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=DOC_COLS)
    return roundtrip_jsonl(docs).select_columns(DOC_COLS)


def docs_csv_roundtrip(sf_dir: str) -> rd.Dataset:
    """queries() entry: documents → CSV → back. Oracle: identity
    SELECT over documents."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=DOC_COLS)
    return roundtrip_csv(docs).select_columns(DOC_COLS)


def docs_webdataset_roundtrip(sf_dir: str) -> rd.Dataset:
    """documents → WebDataset tar shards ({doc_id}.txt + {doc_id}.lang
    members, normalized headers) → untar → reassembled (doc_id, text,
    lang) rows. WebDataset is the de-facto tar-shard layout for
    multimodal training corpora; proving the round-trip on the text
    table means any member naming, tar framing, encoding or regroup
    defect breaks the identity value-hash against the oracle's plain
    SELECT.

    Both directions distributed: one tar per writing task, one untar
    task per shard; samples regroup by key inside the reading tasks
    (a key never splits across shards by construction), then one
    key-bucketed co-group zips each sample's members back into one
    row."""
    import pandas as pd
    import pyarrow as pa

    from suckit_ray.sources import wds
    from suckit_ray.stages.agg import default_buckets

    out = _scratch("suckit_wds_rt_")
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )

    def to_keyed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pa.array(
                    [str(x) for x in t.column("doc_id").to_pylist()],
                    pa.string(),
                ),
                "text": t.column("text"),
                "lang": t.column("lang"),
            }
        )

    wds.write_webdataset(
        docs.map_batches(to_keyed, batch_format="pyarrow"),
        out,
        key_col="key",
        ext_cols={"txt": "text", "lang": "lang"},
    )
    B = default_buckets()
    members = wds.read_webdataset(out)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out_ = df.copy()
        out_["kb"] = (
            pd.util.hash_pandas_object(out_["key"], index=False).to_numpy()
            % B
        ).astype("int64")
        return out_

    def zip_sample(g: pd.DataFrame) -> pd.DataFrame:
        w = g.pivot(index="key", columns="ext", values="data")
        return pd.DataFrame(
            {
                "doc_id": w.index.astype("int64"),
                "text": [b.decode("utf-8") for b in w["txt"]],
                "lang": [b.decode("utf-8") for b in w["lang"]],
            }
        )

    return (
        members.map_batches(add_bucket, batch_format="pandas")
        .groupby("kb")
        .map_groups(zip_sample, batch_format="pandas")
    )


def write_arrow_ipc(ds: rd.Dataset, output_dir: str) -> int:
    """Distributed Arrow IPC (Feather V2) sink: each map task writes
    its block as ONE ``.arrow`` file in the standard IPC *file*
    format, named after the content hash (idempotent re-runs — the
    WARC-segment/WebDataset-shard convention) via tmp+rename.
    Returns total row count. IPC is the zero-parse interchange
    format: a reader mmaps the file and gets Arrow arrays back with
    no decode step, which is why it's the natural spill/cache format
    between Ray Data jobs. Content naming means two byte-identical
    BLOCKS collapse to one file (the WARC-segment dedup convention;
    impossible for keyed tables like documents, acceptable for
    re-run idempotence everywhere else)."""
    import hashlib
    import io

    import pyarrow as pa

    os.makedirs(output_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"file": pa.array([], pa.string()),
                             "n_rows": pa.array([], pa.int64())})
        buf = io.BytesIO()
        with pa.ipc.new_file(buf, t.schema) as w:
            w.write_table(t)
        raw = buf.getvalue()
        name = f"block-{hashlib.blake2b(raw, digest_size=8).hexdigest()}.arrow"
        path = os.path.join(output_dir, name)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(raw)
        os.replace(tmp, path)
        return pa.table(
            {
                "file": pa.array([name], pa.string()),
                "n_rows": pa.array([t.num_rows], pa.int64()),
            }
        )

    seg = ds.map_batches(write_block, batch_format="pyarrow")
    total = 0
    for b in seg.iter_batches(batch_format="pyarrow"):
        total += sum(b.column("n_rows").to_pylist())
    return total


def read_arrow_ipc(paths: str | list[str]) -> rd.Dataset:
    """Streaming Arrow IPC source: one parse task per file batch —
    ``pa.ipc.open_file`` over the raw bytes, record batches
    re-emitted as Arrow blocks. Bytes never visit the driver."""
    import io

    import pyarrow as pa

    if isinstance(paths, str) and os.path.isdir(paths):
        paths = sorted(
            os.path.join(paths, n)
            for n in os.listdir(paths)
            if n.endswith(".arrow")
        )
    files = rd.read_binary_files(paths, include_paths=False)

    def parse(batch: pa.Table) -> "list[pa.Table]":
        out = []
        for raw in batch.column("bytes").to_pylist():
            with pa.ipc.open_file(io.BytesIO(raw)) as r:
                out.append(r.read_all())
        return out

    # flat_map-style: one output table per input file keeps blocks
    # aligned with the writer's block structure
    def parse_concat(batch: pa.Table) -> pa.Table:
        tables = parse(batch)
        return pa.concat_tables(tables) if tables else pa.table({})

    return files.map_batches(parse_concat, batch_format="pyarrow", batch_size=2)


def docs_arrow_roundtrip(sf_dir: str) -> rd.Dataset:
    """queries() entry: documents → Arrow IPC files → back. Oracle:
    identity SELECT over documents — any framing, schema, encoding or
    block-reassembly defect breaks the value hash."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=DOC_COLS)
    out = _scratch("suckit_arrow_rt_")
    write_arrow_ipc(docs, out)
    return read_arrow_ipc(out).select_columns(DOC_COLS)
