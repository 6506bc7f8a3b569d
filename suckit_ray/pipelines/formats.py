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
``$SUCKIT_SCRATCH_DIR`` when set (multi-node: must be shared storage
visible to all nodes and the driver), else a driver-local mkdtemp —
correct only single-node.
"""

from __future__ import annotations

import os
import tempfile

import ray.data as rd

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _scratch(prefix: str) -> str:
    scratch = os.environ.get("SUCKIT_SCRATCH_DIR")
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


# ----- TFRecord framing (TensorFlow's public record format) -----
# Each record: uint64-LE payload length, uint32-LE masked crc32c of
# those 8 length bytes, payload, uint32-LE masked crc32c of the
# payload; mask(c) = ((c >> 15 | c << 17) + 0xa282ead8) mod 2^32.
# The de-facto training-shard format of the TF data stack — proving
# the round-trip means any framing/CRC/length defect breaks the
# identity hash. Payload here is the row as sorted-key UTF-8 JSON
# (tf.train.Example protobuf is a payload CONVENTION, not part of
# the framing; protobuf is not in this image).

import numpy as np


def _crc32c_table() -> "np.ndarray":
    poly = np.uint32(0x82F63B78)
    tbl = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        c = np.uint32(i)
        for _ in range(8):
            c = (c >> np.uint32(1)) ^ (poly if c & np.uint32(1) else np.uint32(0))
        tbl[i] = c
    return tbl


_CRC32C_TBL = _crc32c_table()


def _crc32c_many(blobs: "list[bytes]") -> "np.ndarray":
    """Castagnoli CRCs of many byte strings, vectorized ACROSS records
    (CRC is serial per byte, so the loop runs over positions — ~payload
    length iterations of O(records) numpy work, not records×bytes
    Python steps). A native crc32c drops in at real scale."""
    n = len(blobs)
    lens = np.array([len(b) for b in blobs], dtype=np.int64)
    maxlen = int(lens.max()) if n else 0
    arr = np.zeros((n, maxlen), dtype=np.uint8)
    for r, b in enumerate(blobs):
        arr[r, : len(b)] = np.frombuffer(b, np.uint8)
    crc = np.full(n, 0xFFFFFFFF, dtype=np.uint32)
    for i in range(maxlen):
        active = lens > i
        c = crc[active]
        crc[active] = (c >> np.uint32(8)) ^ _CRC32C_TBL[
            (c ^ arr[active, i]) & np.uint32(0xFF)
        ]
    return crc ^ np.uint32(0xFFFFFFFF)


def _tfrecord_mask(crc: "np.ndarray") -> "np.ndarray":
    c = crc.astype(np.uint32)
    return (
        ((c >> np.uint32(15)) | (c << np.uint32(17)))
        + np.uint32(0xA282EAD8)
    ).astype(np.uint32)


def write_tfrecord_blocks(ds: rd.Dataset, out_dir: str) -> None:
    """One .tfrecord file per block, written by distributed tasks
    (shared-scratch contract like every other sink here); rows are
    framed as sorted-key JSON payloads."""
    import json as _json

    import pyarrow as pa

    def write_block(t: pa.Table) -> pa.Table:
        rows = t.to_pylist()
        if not rows:
            return pa.table({"path": pa.array([], pa.string())})
        payloads = [
            _json.dumps(r, sort_keys=True, ensure_ascii=False).encode()
            for r in rows
        ]
        lens = [len(p).to_bytes(8, "little") for p in payloads]
        lcrc = _tfrecord_mask(_crc32c_many(lens))
        pcrc = _tfrecord_mask(_crc32c_many(payloads))
        buf = bytearray()
        for ln, lc, p, pc in zip(lens, lcrc, payloads, pcrc):
            buf += ln
            buf += int(lc).to_bytes(4, "little")
            buf += p
            buf += int(pc).to_bytes(4, "little")
        lo = min(r["doc_id"] for r in rows)
        path = os.path.join(out_dir, f"part-{int(lo):08d}.tfrecord")
        with open(path, "wb") as f:
            f.write(bytes(buf))
        return pa.table({"path": pa.array([path], pa.string())})

    os.makedirs(out_dir, exist_ok=True)
    # count() drives execution; paths themselves are not needed
    ds.map_batches(write_block, batch_format="pyarrow", batch_size=None).count()


def read_tfrecord(out_dir: str) -> rd.Dataset:
    """Streaming read-back: one parse task per shard; BOTH CRCs are
    verified per record — a flipped byte raises instead of yielding a
    corrupt row (pinned in tests)."""
    import json as _json

    import pyarrow as pa

    def parse(t: pa.Table) -> pa.Table:
        # split the framing first, then verify ALL records' CRCs in
        # two batched _crc32c_many calls — the vectorization is
        # across records, so per-record singleton calls would degrade
        # to O(total_bytes) numpy dispatches (review r4 finding)
        len_bs, payloads, got_lc, got_pc, offs = [], [], [], [], []
        for blob in t.column("bytes").to_pylist():
            pos, n = 0, len(blob)
            while pos < n:
                ln_b = blob[pos : pos + 8]
                ln = int.from_bytes(ln_b, "little")
                len_bs.append(ln_b)
                got_lc.append(
                    int.from_bytes(blob[pos + 8 : pos + 12], "little")
                )
                payloads.append(blob[pos + 12 : pos + 12 + ln])
                got_pc.append(
                    int.from_bytes(
                        blob[pos + 12 + ln : pos + 16 + ln], "little"
                    )
                )
                offs.append(pos)
                pos += 16 + ln
        if not payloads:
            return pa.table({})
        want_lc = _tfrecord_mask(_crc32c_many(len_bs))
        want_pc = _tfrecord_mask(_crc32c_many(payloads))
        import numpy as _np

        bad = (want_lc != _np.array(got_lc, dtype=_np.uint32)) | (
            want_pc != _np.array(got_pc, dtype=_np.uint32)
        )
        if bad.any():
            raise ValueError(
                f"TFRecord CRC mismatch at offset {offs[int(bad.argmax())]}"
            )
        return pa.Table.from_pylist(
            [_json.loads(p.decode()) for p in payloads]
        )

    return rd.read_binary_files(out_dir).map_batches(
        parse, batch_format="pyarrow"
    )


def docs_tfrecord_roundtrip(sf_dir: str) -> rd.Dataset:
    """queries() entry: documents → TFRecord shards → back. Oracle:
    identity SELECT — framing, CRC or JSON defects break the hash."""
    out = _scratch("suckit_tfrecord_rt_")
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=DOC_COLS)
    write_tfrecord_blocks(docs, out)
    return read_tfrecord(out).select_columns(DOC_COLS)
