"""Multimodal column stages — image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

The container has no image/audio codecs (no PIL/ffmpeg), so the DECODE
kernels are stubbed: ``DecodeImage`` raises ``NotImplementedError``
unless constructed with ``fake=True``, in which case a deterministic
fake decoder derives (width, height, channels) and a feature vector
from the bytes themselves. Everything AROUND the kernel — schema,
actor-pool signature (setup in ``__init__`` once per actor), batch
sizing for large binary payloads, output layout — is real and tested;
swapping in a real codec is a one-function change.

Usage shape (the 100 TB story): media rows are wide (MBs of bytes), so
these stages run with SMALL ``batch_size`` (tens of rows) and
``batch_format="pyarrow"`` to keep the bytes zero-copy until the
kernel needs them.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_META_TYPE = pa.struct(
    [
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("format", pa.string()),
        ("n_bytes", pa.int64()),
    ]
)

FEATURE_DIM = 64


def _fake_decode(data: bytes) -> dict:
    """Deterministic fake decoder: metadata derived from a content hash
    (stable across runs/processes)."""
    h = hashlib.blake2b(data, digest_size=16).digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "channels": 3,
        "format": "jpeg" if data[:2] == b"\xff\xd8" else "bin",
        "n_bytes": len(data),
    }


def _fake_features(data: bytes) -> np.ndarray:
    """Deterministic fake embedding: seeded from the content hash."""
    seed = int.from_bytes(hashlib.blake2b(data, digest_size=4).digest(), "little")
    rng = np.random.RandomState(seed)
    v = rng.rand(FEATURE_DIM).astype(np.float32)
    return v / np.linalg.norm(v)


class DecodeImage:
    """Actor-pool stage: binary column → media metadata struct column.

    Construct with ``fake=True`` in this sandbox; with ``fake=False``
    the ``__init__`` would load the codec once per actor and ``decode``
    would do the real work (STUB: NotImplementedError)."""

    def __init__(self, input_col: str = "body", fake: bool = True):
        self.input_col = input_col
        self.fake = fake
        if not fake:
            # real path: import the codec ONCE per actor here
            raise NotImplementedError(
                "no image codec in this environment; construct with fake=True"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = [
            _fake_decode(b or b"") for b in batch.column(self.input_col).to_pylist()
        ]
        return batch.append_column(
            pa.field("media_meta", MEDIA_META_TYPE),
            pa.array(metas, type=MEDIA_META_TYPE),
        )


class ExtractImageFeatures:
    """Actor-pool stage: binary column → fixed-dim float32 embedding
    column (batched model inference in the real path; the 'model' is
    loaded once per actor in __init__)."""

    def __init__(self, input_col: str = "body", fake: bool = True):
        self.input_col = input_col
        if not fake:
            raise NotImplementedError(
                "no inference runtime in this environment; construct with fake=True"
            )
        # fake 'model' state built once per actor
        self._dim = FEATURE_DIM

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            _fake_features(b or b"").tolist()
            for b in batch.column(self.input_col).to_pylist()
        ]
        return batch.append_column(
            pa.field("features", pa.list_(pa.float32(), FEATURE_DIM)),
            pa.array(feats, type=pa.list_(pa.float32(), FEATURE_DIM)),
        )


class ResizeImage:
    """Actor-pool stage stub: real path would decode→resize→re-encode.
    The fake path re-stamps metadata with the target size, leaving
    bytes untouched (plumbing-only)."""

    def __init__(self, width: int, height: int, fake: bool = True):
        self.width = width
        self.height = height
        if not fake:
            raise NotImplementedError("no image codec; construct with fake=True")

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = batch.column("media_meta").to_pylist()
        for m in metas:
            m["width"] = self.width
            m["height"] = self.height
        return batch.set_column(
            batch.schema.get_field_index("media_meta"),
            pa.field("media_meta", MEDIA_META_TYPE),
            pa.array(metas, type=MEDIA_META_TYPE),
        )


class SampleVideoFrames:
    """Actor-pool stage stub: video binary column → sampled frame rows
    (flat_map shape: one output row per sampled frame, carrying
    (doc_id, frame_idx, ts_ms, frame_bytes)). Real path: open the
    container once per actor (__init__), seek+decode N uniformly-spaced
    frames per row. Fake path: deterministic byte-slice "frames" so the
    plumbing (fan-out row counts, schema, ordering) is fully testable.

    Scale notes: video rows are the widest payloads in a corpus — run
    with batch_size in the single digits and fractional num_cpus, and
    let the fan-out (rows → frames) happen INSIDE the task so frame
    bytes stream straight into the object store."""

    def __init__(self, n_frames: int = 4, input_col: str = "body", fake: bool = True):
        self.n_frames = n_frames
        self.input_col = input_col
        if not fake:
            # real path: load the demuxer/codec ONCE per actor here
            raise NotImplementedError(
                "no video codec in this environment; construct with fake=True"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, idxs, ts, frames = [], [], [], []
        for doc_id, data in zip(
            batch.column("doc_id").to_pylist(),
            batch.column(self.input_col).to_pylist(),
        ):
            data = data or b""
            # fake duration: 1 ms per byte; uniform sampling like a real
            # frame sampler would seek at duration * i / n
            duration_ms = len(data)
            for i in range(self.n_frames):
                off = (len(data) * i) // self.n_frames
                doc_ids.append(doc_id)
                idxs.append(i)
                ts.append((duration_ms * i) // self.n_frames)
                frames.append(data[off : off + 16])
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.string()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "ts_ms": pa.array(ts, pa.int64()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def media_pipeline(docs_ds, *, concurrency: int = 2, batch_size: int = 32):
    """Decode + feature-extract the media rows of a crawled documents
    Dataset — the canonical actor-pool wiring (small batches for wide
    binary rows; classes so setup happens once per actor)."""
    media = docs_ds.filter(lambda row: not row["is_html"])
    media = media.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    media = media.map_batches(
        ExtractImageFeatures,
        fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return media
