"""JSONL/CSV round-trip pins (suckit_ray/pipelines/formats.py):
hostile content — embedded newlines, CR, quotes, commas, tabs,
unicode, empty strings, JSON-looking text — must survive the full
distributed write+read cycle byte-for-byte. The sf-table identity
oracles live in __ray_entry__; these cover what the synthetic corpus
text never exercises."""

import pandas as pd
import pytest

import ray.data as rd
from suckit_ray.pipelines import formats

pytestmark = pytest.mark.usefixtures("ray_session")

NASTY = pd.DataFrame(
    {
        "doc_id": list(range(8)),
        "text": [
            "plain",
            "comma, separated, values",
            'quo"ted "and" more',
            "line\nbreak\nand another",
            "cr\r\nlf mix",
            "tab\there",
            "unicode: pågår – 日本語 🦀",
            "",
        ],
        "lang": ["en"] * 8,
        "n": [7, 0, -3, 2**40, 1, 2, 3, 4],
    }
)


def _assert_roundtrip(back: rd.Dataset):
    got = (
        back.to_pandas()[list(NASTY.columns)]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = NASTY.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64", "n": "int64"}),
        want.astype({"doc_id": "int64", "n": "int64"}),
    )


def test_jsonl_roundtrip_hostile_content(tmp_path):
    ds = rd.from_pandas(NASTY)
    _assert_roundtrip(formats.roundtrip_jsonl(ds, str(tmp_path / "j")))


def test_csv_roundtrip_hostile_content(tmp_path):
    ds = rd.from_pandas(NASTY)
    _assert_roundtrip(formats.roundtrip_csv(ds, str(tmp_path / "c")))


def test_roundtrip_is_distributed_multiblock(tmp_path):
    # several blocks → several files; the read must reassemble all of
    # them (a single-file assumption would silently drop rows)
    import os

    ds = rd.from_pandas(NASTY).repartition(4)
    out = str(tmp_path / "multi")
    back = formats.roundtrip_jsonl(ds, out)
    assert len(os.listdir(out)) > 1
    _assert_roundtrip(back)


def test_arrow_ipc_roundtrip_hostile_content(tmp_path):
    out = str(tmp_path / "a")
    ds = rd.from_pandas(NASTY)
    n = formats.write_arrow_ipc(ds, out)
    assert n == len(NASTY)
    _assert_roundtrip(formats.read_arrow_ipc(out))


def test_arrow_ipc_roundtrip_multiblock_and_binary(tmp_path):
    # several blocks → several .arrow files, reassembled completely;
    # binary columns pass through IPC untouched (no text escaping
    # layer exists to get wrong — the format's whole point)
    import os

    import pyarrow as pa

    tbl = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "payload": pa.array(
                [b"\x00\xff", b"", b"\n\r", "日本".encode(), b"a" * 100, b"q"],
                pa.binary(),
            ),
        }
    )
    out = str(tmp_path / "b")
    n = formats.write_arrow_ipc(rd.from_arrow(tbl).repartition(3), out)
    assert n == 6
    assert len(os.listdir(out)) > 1
    got = (
        formats.read_arrow_ipc(out)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got["payload"]) == tbl.column("payload").to_pylist()
