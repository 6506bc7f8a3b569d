"""sinks.compact_parquet pins: bin-packing a small-files tree into
fewer files, row preservation, manifest accuracy, atomic replace of a
pre-existing output tree, and the read path ignoring the manifest."""

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd
from suckit_ray.sinks import compact_parquet

pytestmark = pytest.mark.usefixtures("ray_session")


def _make_tree(root, n_files=8, rows_per_file=50):
    os.makedirs(root, exist_ok=True)
    for i in range(n_files):
        sub = os.path.join(root, f"wave={i}")
        os.makedirs(sub, exist_ok=True)
        tbl = pa.table(
            {
                "doc_id": pa.array(
                    range(i * rows_per_file, (i + 1) * rows_per_file),
                    pa.int64(),
                ),
                "payload": pa.array(
                    [f"row-{i}-{j}" for j in range(rows_per_file)]
                ),
            }
        )
        pq.write_table(tbl, os.path.join(sub, "part.parquet"))
    return n_files * rows_per_file


def test_compact_coalesces_and_preserves_rows(tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    n_rows = _make_tree(src)
    manifest = compact_parquet(src, out, target_bytes=10 * 1024 * 1024)
    assert manifest["src_files"] == 8
    assert manifest["n_rows"] == n_rows
    assert manifest["out_files"] < 8  # genuinely coalesced
    # the swapped-in tree contains its own manifest (self-describing)
    on_disk = json.load(open(os.path.join(out, "_COMPACT_MANIFEST.json")))
    assert on_disk == manifest
    back = rd.read_parquet(out).to_pandas()  # manifest must be ignored
    assert len(back) == n_rows
    assert set(back["doc_id"]) == set(range(n_rows))


def test_compact_replaces_existing_output_atomically(tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    _make_tree(src, n_files=2, rows_per_file=10)
    compact_parquet(src, out, target_bytes=1024 * 1024)
    # second run over a GROWN source replaces the old tree wholesale
    _make_tree(src, n_files=4, rows_per_file=10)
    m2 = compact_parquet(src, out, target_bytes=1024 * 1024)
    assert m2["n_rows"] == 40
    back = rd.read_parquet(out).to_pandas()
    assert len(back) == 40
    # no staging leftovers
    parent = os.path.dirname(out)
    assert not [d for d in os.listdir(parent) if ".staging-" in d]


def test_compact_content_identical_not_just_counts(tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    _make_tree(src, n_files=3, rows_per_file=7)
    compact_parquet(src, out, target_bytes=512)
    a = (
        rd.read_parquet(src)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        rd.read_parquet(out)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
