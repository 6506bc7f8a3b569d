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
