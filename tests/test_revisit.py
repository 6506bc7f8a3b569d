"""Adaptive revisit scheduling: change-rate estimation from delta-
recrawl fingerprint history, due-list ranking, and the budgeted
depth-0 revisit leaving a complete fingerprint set behind."""

import glob as globmod

import pandas as pd
import pyarrow.parquet as pq
import pytest

from suckit_ray.config import CrawlConfig
from suckit_ray.pipelines.crawl import crawl
from suckit_ray.pipelines.revisit import plan_revisit, revisit_stats
from suckit_ray.sources.pagestore import PageRecord, TablePageStore

ROOT = "http://site.test/"
A = "http://site.test/a.html"
B = "http://site.test/b.html"
C = "http://site.test/c.html"
LINKS = b'<a href="a.html">a</a><a href="b.html">b</a><a href="c.html">c</a>'


def _store(a: bytes, b: bytes, c: bytes) -> TablePageStore:
    return TablePageStore.from_records(
        [
            PageRecord(ROOT, LINKS, "text/html"),
            PageRecord(A, a, "text/html"),
            PageRecord(B, b, "text/html"),
            PageRecord(C, c, "text/html"),
        ]
    )


def _history(tmp_path, versions):
    """Run len(versions) chained delta crawls; return the output dirs."""
    outs = []
    for i, store in enumerate(versions):
        out = str(tmp_path / f"run{i}")
        crawl(
            CrawlConfig(origin=ROOT),
            store,
            num_shards=2,
            output_dir=out,
            delta_hashes=True,
            recrawl_from=outs[-1] if outs else None,
            collect=True,
        )
        outs.append(out)
    return outs


@pytest.mark.usefixtures("ray_session")
class TestRevisitPlanning:
    def _three_runs(self, tmp_path):
        # a changes every version, c changes once then stabilizes,
        # root/b never change
        return _history(
            tmp_path,
            [
                _store(b"alpha1", b"stable", b"c1"),
                _store(b"alpha2", b"stable", b"c2"),
                _store(b"alpha3", b"stable", b"c2"),
            ],
        )

    def test_change_rates(self, tmp_path):
        outs = self._three_runs(tmp_path)
        stats = revisit_stats(outs).to_pandas().set_index("url")
        assert len(stats) == 4
        # a: 2 changes / 2 intervals → (2+1)e6 // 4
        assert stats.loc[A, "changes"] == 2
        assert stats.loc[A, "intervals"] == 2
        assert stats.loc[A, "rate_micro"] == 750_000
        # c: 1 change / 2 intervals
        assert stats.loc[C, "rate_micro"] == 500_000
        # root, b: 0 changes / 2 intervals
        assert stats.loc[ROOT, "rate_micro"] == 250_000
        assert stats.loc[B, "rate_micro"] == 250_000

    def test_budget_ranks_changers_first(self, tmp_path):
        outs = self._three_runs(tmp_path)
        plan = plan_revisit(outs, budget=2)
        assert plan["url"].tolist() == [A, C]
        # full ranking: rate desc, url asc tie-break
        full = plan_revisit(outs)
        assert full["url"].tolist() == [A, C, ROOT, B]

    def test_budgeted_revisit_and_carry(self, tmp_path):
        outs = self._three_runs(tmp_path)
        plan = plan_revisit(outs, budget=2)
        # v4: a changed again (due-list catches it), b ALSO changed
        # but sits outside the budget — the revisit must not touch it
        v4 = _store(b"alpha4", b"sneaky", b"c2")
        out4 = str(tmp_path / "run_budget")
        res = crawl(
            CrawlConfig(origin=ROOT, depth=0),
            v4,
            num_shards=2,
            seeds=plan["url"].tolist(),
            output_dir=out4,
            recrawl_from=outs[-1],
            recrawl_seed=False,
            carry_prior_hashes=True,
            collect=True,
        )
        # fetched exactly the due-list; delta docs = only the page
        # that truly changed (c was due but unchanged → skipped)
        fetched = set(res.ledger.column("url").to_pylist())
        assert fetched == {A, C}
        docs = res.downloaded_docs().column("doc_id").to_pylist()
        assert docs == ["site.test//a.html"]
        # the fingerprint artifact is COMPLETE: all 4 urls present,
        # a refreshed, root/b carried verbatim from run3
        def hashes(out):
            t = pq.read_table(
                sorted(globmod.glob(out + "/hashes_parts/*.parquet"))
            )
            return dict(
                zip(t.column("url").to_pylist(), t.column("body_hash").to_pylist())
            )

        h3, h4 = hashes(outs[-1]), hashes(out4)
        assert set(h4) == {ROOT, A, B, C}
        assert h4[A] != h3[A]
        assert h4[ROOT] == h3[ROOT]
        assert h4[B] == h3[B]
        assert h4[C] == h3[C]
        # next FULL recrawl against v4 sees b (missed by the budget)
        # as the only change — the carried hashes stay consistent
        out5 = str(tmp_path / "run_full")
        res5 = crawl(
            CrawlConfig(origin=ROOT),
            v4,
            num_shards=2,
            output_dir=out5,
            recrawl_from=out4,
            collect=True,
        )
        docs5 = res5.downloaded_docs().column("doc_id").to_pylist()
        assert docs5 == ["site.test//b.html"]

    def test_two_snapshots_minimum(self, tmp_path):
        with pytest.raises(ValueError):
            revisit_stats([str(tmp_path)])

    def test_errored_fetch_counts_as_changed(self, tmp_path):
        # an url that errors in run2 records hash 0 → counts changed
        # (conservative: keep probing flaky pages)
        outs = _history(
            tmp_path,
            [
                _store(b"x", b"stable", b"c1"),
                TablePageStore.from_records(
                    [
                        PageRecord(ROOT, LINKS, "text/html"),
                        PageRecord(A, b"x", "text/html"),
                        PageRecord(B, b"stable", "text/html"),
                        # C missing → fetch error → hash 0
                    ]
                ),
            ],
        )
        stats = revisit_stats(outs).to_pandas().set_index("url")
        assert stats.loc[C, "changes"] == 1
        assert stats.loc[A, "changes"] == 0


@pytest.mark.usefixtures("ray_session")
class TestFlagshipRevisitPlan:
    def test_cross_check_vs_crawl_diff(self):
        """The change-rate table and crawl_diff are two independent
        views of the same v1→v2 pair: diff 'same' (span sequence
        unchanged ⇒ identical bytes in the deterministic corpus) must
        show 0 changes, 'changed' exactly 1, and 'added'/'removed'
        (single-snapshot urls) 0 intervals."""
        from suckit_ray.pipelines import flagship

        sf = "/root/testdata/sf0.001"
        plan = flagship.crawl_revisit_plan(sf).to_pandas()
        diff = flagship.crawl_diff(sf).to_pandas()
        # plan keys are URLs; diff keys are doc_ids (derived paths).
        # The synthetic corpus derives doc_id = to_path(url), which for
        # its page urls is "<host>/<file>" — rebuild the join key the
        # same way the mirror does
        from suckit_ray.urlkit import parse_url, to_path

        plan = plan.assign(
            doc_id=[to_path(parse_url(u), False) for u in plan["url"]]
        ).set_index("doc_id")
        by_status = dict(iter(diff.groupby("status")))
        assert set(by_status) == {"added", "removed", "changed", "same"}
        for did in by_status["same"]["doc_id"]:
            assert plan.loc[did, "changes"] == 0, did
            assert plan.loc[did, "intervals"] == 1, did
        for did in by_status["changed"]["doc_id"]:
            assert plan.loc[did, "changes"] == 1, did
        for st in ("added", "removed"):
            for did in by_status[st]["doc_id"]:
                assert plan.loc[did, "intervals"] == 0, did
        # determinism: a second build returns identical rows
        again = flagship.crawl_revisit_plan(sf).to_pandas()
        pd.testing.assert_frame_equal(
            plan.reset_index()
            .sort_values("url")[["url", "changes", "intervals", "rate_micro"]]
            .reset_index(drop=True),
            again.assign(
                doc_id=[
                    to_path(parse_url(u), False) for u in again["url"]
                ]
            )
            .sort_values("url")[["url", "changes", "intervals", "rate_micro"]]
            .reset_index(drop=True),
        )


@pytest.mark.usefixtures("ray_session")
class TestRevisitCli:
    def test_cli_budgeted_revisit(self, tmp_path):
        """Full CLI loop: two delta-hash snapshot crawls of the
        deterministic synthetic web, then a budgeted depth-0 revisit
        driven by --revisit-history/--revisit-budget — fetches exactly
        the budget, produces an empty delta (nothing changed), and
        leaves a COMPLETE fingerprint set."""
        import json
        import subprocess
        import sys

        def run(extra):
            proc = subprocess.run(
                [
                    sys.executable, "-m", "suckit_ray",
                    "http://ignored.test/", "--synthetic", "60",
                    "--num-cpus", "4", "--shards", "2", *extra,
                ],
                capture_output=True, text=True, timeout=300,
                cwd="/root/repo",
            )
            assert proc.returncode == 0, proc.stderr[-2000:]
            return json.loads(proc.stdout.strip().splitlines()[-1])

        out1 = str(tmp_path / "r1")
        out2 = str(tmp_path / "r2")
        out3 = str(tmp_path / "r3")
        s1 = run(["--parquet-out", out1, "--delta-hashes"])
        s2 = run(["--parquet-out", out2, "--delta-hashes"])
        assert s1["pages"] == s2["pages"] > 0
        s3 = run(
            [
                "--parquet-out", out3, "-d", "0",
                "--revisit-history", out1, "--revisit-history", out2,
                "--revisit-budget", "5",
            ]
        )
        assert s3["pages"] == 5
        # complete fingerprint carry: every url of run2 is present
        def n_hashes(out):
            t = pq.read_table(
                sorted(globmod.glob(out + "/hashes_parts/*.parquet"))
            )
            return t.num_rows
        assert n_hashes(out3) == n_hashes(out2)
        # nothing changed → empty docs delta (no docs parquet rows)
        import pyarrow.dataset as pads
        docs = sorted(globmod.glob(out3 + "/docs/**/*.parquet", recursive=True))
        ndocs = (
            sum(pq.read_metadata(p).num_rows for p in docs) if docs else 0
        )
        assert ndocs == 0

    def test_cli_flag_validation(self):
        import subprocess
        import sys

        proc = subprocess.run(
            [
                sys.executable, "-m", "suckit_ray",
                "http://x.test/", "--revisit-budget", "3",
            ],
            capture_output=True, text=True, timeout=60, cwd="/root/repo",
        )
        assert proc.returncode == 2
        assert "revisit-history" in proc.stderr
