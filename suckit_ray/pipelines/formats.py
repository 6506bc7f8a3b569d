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
