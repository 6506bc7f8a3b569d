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


def test_sweep_spares_live_pids_and_restores_dead_retired(tmp_path):
    import pyarrow as pa_
    import pyarrow.parquet as pq_

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    _make_tree(src, n_files=2, rows_per_file=5)

    # a LIVE run's staging dir (our own pid) must survive the sweep
    live = f"{out}.staging-{os.getpid()}"
    os.makedirs(live)
    open(os.path.join(live, "marker"), "w").write("x")
    # NB compact_parquet's own staging uses the same pid suffix — the
    # marker below proves the dir was REUSED/cleared by our run only
    # after the liveness check, not deleted by the stale sweep
    # (its own-pid path explicitly rmtree's it; so instead use a live
    # FOREIGN pid: pid 1 is always alive in the sandbox)
    foreign_live = f"{out}.staging-1"
    os.makedirs(foreign_live)
    open(os.path.join(foreign_live, "marker"), "w").write("x")

    # a DEAD run's retired dir with valid parquet + no out_dir →
    # restored as the output before the rebuild
    dead_retired = f"{out}.retired-999999999"
    os.makedirs(dead_retired)
    pq_.write_table(
        pa_.table({"doc_id": pa_.array([42], pa_.int64())}),
        os.path.join(dead_retired, "old.parquet"),
    )

    compact_parquet(src, out, target_bytes=1024 * 1024)
    # live foreign staging untouched; dead retired consumed (restored
    # then re-retired by the successful swap); output is the new tree
    assert os.path.exists(os.path.join(foreign_live, "marker"))
    assert not os.path.exists(dead_retired)
    back = rd.read_parquet(out).to_pandas()
    assert len(back) == 10 and 42 not in set(back["doc_id"])
