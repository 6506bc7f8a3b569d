"""File-mirror sink parity (S4/S5), Content-Disposition aliases, retry
and error-path semantics, and the CLI."""

import json
import os
import subprocess
import sys

import pytest

from suckit_ray.config import CrawlConfig
from suckit_ray.pipelines.crawl import crawl
from suckit_ray.sources.pagestore import (
    FIXTURE_JPEG,
    FlakyPageStore,
    PageRecord,
    TablePageStore,
    fixture_pages,
)

ORIGIN = "http://site.test/"


@pytest.mark.usefixtures("ray_session")
def test_mirror_file_tree(tmp_path):
    mirror = str(tmp_path / "mirror")
    res = crawl(
        CrawlConfig(origin=ORIGIN), fixture_pages(), num_shards=2, mirror_dir=mirror
    )
    # reference layout: <output>/<host>/<path> (double slashes collapse)
    assert (tmp_path / "mirror/site.test/index.html").is_file()
    assert (tmp_path / "mirror/site.test/jpeg.jpg").read_bytes() == FIXTURE_JPEG
    assert (tmp_path / "mirror/site.test/file.txt").read_bytes() == b"Hello"
    assert (tmp_path / "mirror/google.com").exists() is False  # ext gated
    # rewritten HTML on disk
    html = (tmp_path / "mirror/site.test/index.html").read_text()
    assert 'href="../google.com/index.html"' in html
    # queryable ledger next to the mirror
    import pyarrow.parquet as pq

    ledger = pq.read_table(str(tmp_path / "mirror/ledger.parquet"))
    assert ledger.num_rows == res.ledger.num_rows == 6


@pytest.mark.usefixtures("ray_session")
def test_content_disposition_alias_symlink(tmp_path):
    # reference: save under the Content-Disposition name, symlink the
    # url-derived path to it (src/scraper.rs:263-267, src/disk.rs:35-65)
    store = TablePageStore.from_records(
        [
            PageRecord(
                "http://site.test/",
                b'<a href="doc.pdf">get</a>',
                "text/html",
            ),
            PageRecord(
                "http://site.test/doc.pdf",
                b"%PDF-fake",
                "application/pdf",
                content_disposition="attachment; filename=report.pdf",
            ),
        ]
    )
    mirror = str(tmp_path / "m2")
    res = crawl(CrawlConfig(origin=ORIGIN), store, num_shards=1, mirror_dir=mirror)
    docs = res.downloaded_docs()
    ids = docs.column("doc_id").to_pylist()
    pdf_row = ids.index("site.test//doc.pdf")
    assert docs.column("filename").to_pylist()[pdf_row] == "report.pdf"

    target = tmp_path / "m2/report.pdf"
    link = tmp_path / "m2/site.test/doc.pdf"
    assert target.read_bytes() == b"%PDF-fake"
    assert link.is_symlink()
    assert link.resolve() == target.resolve()


@pytest.mark.usefixtures("ray_session")
class TestRetriesAndErrors:
    def test_retries_cover_transient_failures(self):
        # tries budget covers the failures (reference src/downloader.rs:174-184)
        res = crawl(
            CrawlConfig(origin=ORIGIN, tries=3),
            FlakyPageStore(fixture_pages(), fail_times=2),
            num_shards=1,
        )
        assert res.docs.num_rows == 6
        assert all(e is None for e in res.docs.column("error").to_pylist())

    def test_exhausted_tries_with_continue_on_error(self):
        res = crawl(
            CrawlConfig(origin=ORIGIN, tries=1, continue_on_error=True),
            FlakyPageStore(fixture_pages(), fail_times=99),
            num_shards=1,
        )
        # origin fetch failed; error recorded; crawl ends cleanly
        assert res.ledger.num_rows == 1
        assert res.ledger.column("error").to_pylist()[0] is not None

    def test_exhausted_tries_without_continue_raises(self):
        # reference panics (error! abort, src/scraper.rs:275-282)
        with pytest.raises(Exception):
            crawl(
                CrawlConfig(origin=ORIGIN, tries=1),
                FlakyPageStore(fixture_pages(), fail_times=99),
                num_shards=1,
            )


def test_cli_synthetic_crawl(tmp_path):
    out = str(tmp_path / "cli_mirror")
    proc = subprocess.run(
        [
            sys.executable, "-m", "suckit_ray",
            "http://ignored.test/", "--synthetic", "120",
            "-o", out, "-j", "4", "--shards", "2", "--num-cpus", "4",
        ],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["pages"] > 100
    assert os.path.isfile(os.path.join(out, "ledger.parquet"))
    assert os.path.isfile(os.path.join(out, "host0000.test", "p0.html"))


@pytest.mark.usefixtures("ray_session")
def test_redirects_followed_body_under_original_url(tmp_path):
    # reqwest follows redirects transparently; the mirror path stays
    # keyed on the ORIGINAL url (reference path_map semantics)
    store = TablePageStore.from_records(
        [
            PageRecord("http://site.test/", b'<a href="moved.html">m</a>', "text/html"),
            PageRecord("http://site.test/moved.html", b"", location="/final.html"),
            PageRecord("http://site.test/final.html", b"<p>landed</p>", "text/html"),
        ]
    )
    res = crawl(CrawlConfig(origin="http://site.test/"), store, num_shards=1)
    docs = res.downloaded_docs()
    ids = docs.column("doc_id").to_pylist()
    row = ids.index("site.test//moved.html")
    assert docs.column("body").to_pylist()[row] == b"<p>landed</p>"
    assert docs.column("status").to_pylist()[row] == 200
    # final.html itself was also discovered? no link to it -> only via redirect
    assert "site.test//final.html" not in ids


def test_write_lance_feature_gate():
    """The Lance sink is real when `lance` is importable and a clean,
    declared NotImplementedError otherwise (this sandbox has no lance)."""
    import pyarrow as pa
    import pytest

    from suckit_ray.sinks import write_lance

    tbl = pa.table({"doc_id": ["a"], "body": [b"x"]})
    try:
        import lance  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            write_lance(tbl, "/tmp/suckit_lance_test")
    else:
        write_lance(tbl, "/tmp/suckit_lance_test", mode="overwrite")


def test_cli_parquet_out_streams_docs(tmp_path):
    """--parquet-out streams per-wave span-document partitions and
    per-shard ledger parts next to the mirror tree."""
    import os
    import subprocess
    import sys

    out = str(tmp_path / "pq")
    mirror = str(tmp_path / "mirror")
    r = subprocess.run(
        [sys.executable, "-m", "suckit_ray", "http://ignored.test/",
         "--synthetic", "60", "-o", mirror, "--parquet-out", out,
         "--num-cpus", "4", "--shards", "2"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    waves = os.listdir(os.path.join(out, "docs"))
    assert waves and all(w.startswith("wave-") for w in waves)
    import pyarrow.parquet as pq

    n = sum(
        pq.read_table(os.path.join(out, "docs", w)).num_rows for w in waves
    )
    assert n > 50
    assert len(os.listdir(os.path.join(out, "ledger_parts"))) == 2


def test_cli_priority_flag_same_mirror(tmp_path):
    """--priority re-times fetches but must not change the mirrored
    set: the prioritized synthetic crawl produces the same page count
    and the same on-disk tree as the FIFO default."""
    fifo, prio = str(tmp_path / "fifo"), str(tmp_path / "prio")
    runs = {}
    for out, extra in ((fifo, []), (prio, ["--priority", r"\.html"])):
        proc = subprocess.run(
            [
                sys.executable, "-m", "suckit_ray",
                "http://ignored.test/", "--synthetic", "120",
                "-o", out, "--shards", "2", "--num-cpus", "4", *extra,
            ],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        runs[out] = json.loads(proc.stdout.strip().splitlines()[-1])
    assert runs[fifo]["pages"] == runs[prio]["pages"]

    def tree(root):
        return sorted(
            os.path.relpath(os.path.join(d, f), root)
            for d, _, fs in os.walk(root) for f in fs
            if f != "ledger.parquet"
        )

    assert tree(fifo) == tree(prio)
