"""WARC-backed pipeline ops: prove the archive source/sink end to end
against the documents table (SQL-oracle-checkable)."""

from __future__ import annotations


import pyarrow as pa

import ray.data as rd

from suckit_ray.pipelines.formats import _scratch
from suckit_ray.sources import warc


def warc_roundtrip(sf_dir: str, output_dir: str | None = None) -> rd.Dataset:
    """documents → distributed WARC archive → ``read_warc`` →
    (doc_id, n_bytes): every document travels through real WARC
    response records (deterministic URL ``http://warc.test/doc/<id>``,
    utf-8 body) and comes back byte-counted. Oracle:
    ``octet_length(encode(text))`` per doc — any framing, gzip or
    parsing defect in the WARC path breaks the hash match.

    ``output_dir``: where the archive segments land. The write runs in
    distributed ``map_batches`` tasks, so on a multi-node cluster this
    MUST be shared storage visible to every node AND the driver (NFS,
    object-store mount). Default: ``$SUCKIT_SCRATCH_DIR`` if set, else a
    driver-local mkdtemp — correct only single-node (ADVICE r2)."""
    if output_dir is None:
        output_dir = _scratch("suckit_warc_rt_")
    out = output_dir
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_docs(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        return pa.table(
            {
                "url": pa.array([f"http://warc.test/doc/{i}" for i in ids]),
                "status": pa.array([200] * len(ids), pa.int32()),
                "data_type": pa.array(["text/plain; charset=utf-8"] * len(ids)),
                "body": pa.array([x.encode("utf-8") for x in texts], pa.binary()),
            }
        )

    warc.write_warc(docs.map_batches(to_docs, batch_format="pyarrow"), out)
    back = warc.read_warc(out)

    def summarize(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        bodies = t.column("body").to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(
                    [int(u.rsplit("/", 1)[1]) for u in urls], pa.int64()
                ),
                "n_bytes": pa.array([len(b) for b in bodies], pa.int64()),
            }
        )

    return back.map_batches(summarize, batch_format="pyarrow")


def warc_cdx(sf_dir: str, output_dir: str | None = None) -> rd.Dataset:
    """CDX index of the documents archive: write the same deterministic
    WARC segments ``warc_roundtrip`` proves, then ``build_cdx`` them —
    one row per record with (urlkey, record_type, status, mime,
    digest, segment, offset, length). Rows-only (segment names and
    offsets depend on block partitioning, which Ray may vary run to
    run); the random-access contract — every index row resolves via
    ``fetch_cdx_record`` to the exact archived body — is pinned in
    tests/test_warc_cdx.py."""
    if output_dir is None:
        output_dir = _scratch("suckit_warc_cdx_")
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def to_docs(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        return pa.table(
            {
                "url": pa.array([f"http://warc.test/doc/{i}" for i in ids]),
                "status": pa.array([200] * len(ids), pa.int32()),
                "data_type": pa.array(["text/plain; charset=utf-8"] * len(ids)),
                "body": pa.array([x.encode("utf-8") for x in texts], pa.binary()),
            }
        )

    warc.write_warc(docs.map_batches(to_docs, batch_format="pyarrow"), output_dir)
    return warc.build_cdx(output_dir)
