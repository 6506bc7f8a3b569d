"""CDX index + random access: every index row must resolve through
fetch_cdx_record to the exact archived record."""

import gzip
import os

import pyarrow as pa
import pytest

from suckit_ray.sources.warc import (
    build_cdx,
    build_record,
    build_revisit_record,
    fetch_cdx_record,
    parse_warc_bytes,
    write_warc_batch,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
class TestCdx:
    def _archive(self, tmp_path):
        batch = pa.table(
            {
                "url": pa.array(
                    [f"http://cdx.test/p{i}.html" for i in range(5)]
                ),
                "status": pa.array([200, 200, 404, 200, 200], pa.int32()),
                "data_type": pa.array(["text/html"] * 5),
                "body": pa.array(
                    [f"body {i} ".encode() * (i + 1) for i in range(5)],
                    pa.binary(),
                ),
            }
        )
        write_warc_batch(batch, str(tmp_path))
        return batch

    def test_index_rows_and_random_access(self, tmp_path):
        batch = self._archive(tmp_path)
        idx = build_cdx(str(tmp_path)).to_pandas()
        assert len(idx) == 5
        assert set(idx["record_type"]) == {"response"}
        assert sorted(idx["url"]) == sorted(
            batch.column("url").to_pylist()
        )
        bodies = dict(
            zip(
                batch.column("url").to_pylist(),
                batch.column("body").to_pylist(),
            )
        )
        for row in idx.itertuples(index=False):
            fields, block = fetch_cdx_record(
                str(tmp_path), row.segment, row.offset, row.length
            )
            assert fields["warc-target-uri"] == row.url
            http_end = block.find(b"\r\n\r\n")
            assert block[http_end + 4 :] == bodies[row.url]
        # statuses and mime survived into the index
        assert set(idx["status"]) == {200, 404}
        assert set(idx["mime"]) == {"text/html"}

    def test_revisit_records_indexed_with_declared_digest(self, tmp_path):
        raw = build_record(
            "http://cdx.test/a", 200, "text/html", b"xyz"
        ) + build_revisit_record("http://cdx.test/a", 12345)
        p = os.path.join(str(tmp_path), "seg-1.warc.gz")
        with gzip.GzipFile(p, "wb", mtime=0) as f:
            f.write(raw)
        idx = (
            build_cdx(str(tmp_path))
            .to_pandas()
            .sort_values("record_type")
            .reset_index(drop=True)
        )
        assert list(idx["record_type"]) == ["response", "revisit"]
        rev = idx.iloc[1]
        assert rev["digest"] == "blake2b63:12345"
        assert rev["length"] > 0
        fields, block = fetch_cdx_record(
            str(tmp_path), rev["segment"], rev["offset"], rev["length"]
        )
        assert fields["warc-type"] == "revisit"
        assert block == b""

    def test_digest_matches_skip_decision_fingerprint(self, tmp_path):
        from suckit_ray.stages.html_stage import body_hash

        self._archive(tmp_path)
        idx = build_cdx(str(tmp_path)).to_pandas()
        seg = idx.iloc[0]["segment"]
        with open(os.path.join(str(tmp_path), seg), "rb") as f:
            recs = parse_warc_bytes(f.read())
        by_url = {u: b for u, _s, _c, _d, b in recs}
        for row in idx.itertuples(index=False):
            assert row.digest == f"blake2b63:{body_hash(by_url[row.url])}"

    def test_query_entry_counts_documents(self):
        import __ray_entry__ as E

        idx = E.queries()["warc_cdx"](SF).to_pandas()
        assert len(idx) == 500  # one record per document
        assert (idx["record_type"] == "response").all()
        assert (idx["length"] > 0).all()


@pytest.mark.usefixtures("ray_session")
def test_crawl_writes_archive_plus_cdx(tmp_path):
    """--warc-out + --warc-cdx in one run: every crawled page gets an
    archive record AND an index row that resolves to its exact body."""
    import pandas as pd

    from suckit_ray.config import CrawlConfig
    from suckit_ray.pipelines.crawl import crawl
    from suckit_ray.sources.pagestore import fixture_pages

    wdir, cdir = str(tmp_path / "warc"), str(tmp_path / "cdx")
    res = crawl(
        CrawlConfig(origin="http://site.test/", output=str(tmp_path / "m")),
        fixture_pages(),
        num_shards=2,
        warc_dir=wdir,
        warc_cdx_dir=cdir,
    )
    idx = pd.read_parquet(cdir)
    assert len(idx) == res.metrics["pages"]
    row = idx[idx["url"] == "http://site.test/"].iloc[0]
    fields, block = fetch_cdx_record(
        wdir, row["segment"], int(row["offset"]), int(row["length"])
    )
    assert fields["warc-target-uri"] == "http://site.test/"
    assert b"\r\n\r\n" in block and len(block) > 0
