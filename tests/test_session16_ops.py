"""Sixteenth-session pins: the embeddings_dbscan IVF-cell edge-stage
auto-cutover (VERDICT r3 item 1) — forced-cutover equality, recall of
the default approximate route, and the routing threshold itself."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
class TestDbscanIvfCutover:
    """Above DBSCAN_EXACT_PAIR_LIMIT candidate cosines the ε-edge
    stage routes through IVF-cell metric blocking (the
    BROADCAST_PAIR_LIMIT idiom). Pins: (1) the exhaustive-probe
    forced cutover is label-IDENTICAL to the exact route (plan
    equivalence — precision 1.0 by exact verify, recall 1.0 when
    nprobe == n_clusters); (2) the default approximate route keeps
    high label agreement; (3) the threshold routes tiny corpora
    exact (oracle corpora stay hash-green)."""

    def _run(self, **kw) -> pd.DataFrame:
        from suckit_ray.pipelines.ann import embeddings_dbscan

        return (
            embeddings_dbscan(SF, **kw)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )

    def test_forced_cutover_exhaustive_equals_exact(self):
        exact = self._run()
        ivf = self._run(exact_pair_limit=0, n_clusters=8, nprobe=8)
        pd.testing.assert_frame_equal(exact, ivf)

    def test_default_ivf_route_high_agreement(self):
        exact = self._run()
        approx = self._run(exact_pair_limit=0)  # default 16 cells / 4 probes
        agree = (
            approx["cluster"].to_numpy() == exact["cluster"].to_numpy()
        ).mean()
        # missing ε-edges can only demote points (core→border/noise) or
        # split clusters — agreement stays high on this corpus and is
        # pinned so quantizer/probe regressions surface.
        assert agree >= 0.95, agree
        # precision of the edge stage is exact: every IVF core is
        # genuinely dense, so no approx core may be exact-noise
        ivf_core = set(approx[approx["is_core"]]["vec_id"])
        exact_core = set(exact[exact["is_core"]]["vec_id"])
        assert ivf_core <= exact_core

    def test_threshold_routes_small_corpora_exact(self):
        from suckit_ray.pipelines.ann import DBSCAN_EXACT_PAIR_LIMIT

        # the sf0.01 oracle corpus (500 rows = 124,750 candidate
        # cosines) must stay on the exact route
        n = 500
        assert n * (n - 1) // 2 <= DBSCAN_EXACT_PAIR_LIMIT
        # the sf0.1 bench corpus (2000 rows) must take the scale path
        n = 2000
        assert n * (n - 1) // 2 > DBSCAN_EXACT_PAIR_LIMIT


def _page(host, j, targets):
    return {
        "doc_id": f"{host}//p{j}.html",
        "host": host,
        "is_html": True,
        "spans": [
            {"kind": "link", "text": "", "media_ref": f"p{t}.html", "offset": i}
            for i, t in enumerate(targets)
        ],
    }


def _skewed_host_rows(m: int, host: str = "big"):
    """Deterministic dense-ish host: chain + hub fan-out + skip links.
    Has cycles (back edges every 11) so SCC / bow-tie is non-trivial."""
    targets = {j: [] for j in range(m)}
    for j in range(m - 1):
        targets[j].append(j + 1)
    for j in range(0, m, 7):
        targets[0].append(j) if j else None
    for j in range(m - 3):
        if j % 5 == 0:
            targets[j].append(j + 3)
    for j in range(11, m, 11):
        targets[j].append(j - 11)  # back edges → cycles
    return [_page(host, j, sorted(set(t for t in targets[j] if t != j)))
            for j in range(m)]


def _bowtie_rich_rows(host="bt"):
    """All seven bow-tie classes: CORE 3-cycle {10,11,12}, IN 1,
    OUT 20, TUBE 30, TENDRIL_IN 40, TENDRIL_OUT 50, DISC 60/61."""
    edges = {
        1: [10, 30, 40],
        10: [11],
        11: [12],
        12: [10, 20],
        30: [20],
        50: [20],
        60: [61],
    }
    nodes = {1, 10, 11, 12, 20, 30, 40, 50, 60, 61}
    return [_page(host, j, edges.get(j, [])) for j in sorted(nodes)]


@pytest.mark.usefixtures("ray_session")
class TestRetireRemovedRecrawl:
    """VERDICT r3 item 7: delta recrawls default to the delete-capable
    cuckoo seen set and RETIRE previously-alive urls that die this run
    (crawl_diff status='removed'), so a removed-then-restored page is
    refetched when rediscovered — e2e over a restorable store whose
    wave ordering makes the 404, the restoration, and the refetch land
    in strictly increasing waves."""

    def _page(self, url, body, links=()):
        from suckit_ray.sources.pagestore import PageRecord

        html = "".join(f'<a href="{l}">l</a>' for l in links)
        return PageRecord(
            url=url,
            body=(f"<html><body>{body}{html}</body></html>").encode(),
            content_type="text/html; charset=utf-8",
        )

    def test_removed_then_restored_page_refetched(self, tmp_path):
        from suckit_ray.config import CrawlConfig
        from suckit_ray.pipelines.crawl import crawl
        from suckit_ray.sources.pagestore import (
            RestorablePageStore,
            TablePageStore,
        )

        H = "http://site.test"
        v1 = TablePageStore.from_records(
            [
                self._page(f"{H}/index.html", "v1 index", ["a.html", "x.html"]),
                self._page(f"{H}/a.html", "steady"),
                self._page(f"{H}/x.html", "x version 1"),
            ]
        )
        out1 = str(tmp_path / "out1")
        crawl(
            CrawlConfig(origin=f"{H}/index.html"),
            v1,
            num_shards=2,
            output_dir=out1,
            delta_hashes=True,
            collect=False,
        )

        # v2 web: index changed (re-parses), x dead until z2 is served,
        # then restored WITH NEW CONTENT; z3 re-links x two waves after
        # x's 404
        v2_inner = TablePageStore.from_records(
            [
                self._page(
                    f"{H}/index.html", "v2 index",
                    ["a.html", "x.html", "z1.html"],
                ),
                self._page(f"{H}/a.html", "steady"),
                self._page(f"{H}/x.html", "x RESTORED v2"),
                self._page(f"{H}/z1.html", "new", ["z2.html"]),
                self._page(f"{H}/z2.html", "new", ["z3.html"]),
                self._page(f"{H}/z3.html", "new", ["x.html"]),
            ]
        )
        flag = str(tmp_path / "restored.flag")
        v2 = RestorablePageStore(
            inner=v2_inner,
            dead_until_flag=(f"{H}/x.html",),
            touch_flag_on=f"{H}/z2.html",
            flag_path=flag,
        )
        out2 = str(tmp_path / "out2")
        res = crawl(
            CrawlConfig(origin=f"{H}/index.html"),
            v2,
            num_shards=2,
            output_dir=out2,
            recrawl_from=out1,
            delta_hashes=True,
            collect=False,
        )
        assert res.metrics["pages"] > 0

        import glob as _glob

        import pyarrow.parquet as pq

        docs = pd.concat(
            [
                pq.read_table(p).to_pandas()
                for p in sorted(_glob.glob(f"{out2}/docs/*/*.parquet"))
            ],
            ignore_index=True,
        )
        x = docs[docs["doc_id"] == "site.test//x.html"]
        # the dead fetch AND the post-restoration refetch both landed
        statuses = sorted(x["status"].tolist())
        assert 200 in statuses, statuses
        assert 404 in statuses, statuses
        ok = x[x["status"] == 200]
        assert len(ok) == 1
        assert b"x RESTORED v2" in ok["body"].iloc[0]
        # the refetch happened strictly after the 404 (later wave)
        assert int(ok["wave"].iloc[0]) > int(
            x[x["status"] == 404]["wave"].iloc[0]
        )


def _lance_installed() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


class TestLanceReadiness:
    """VERDICT r3 item 5: the Lance gate stays warm. The round-trip
    test lights up the moment the package exists (the PIL pattern —
    skipped in this sandbox); the mock test exercises the gate
    plumbing (args, mode, read fallback) without the package."""

    def _docs(self):
        import pyarrow as pa

        return pa.table(
            {
                "doc_id": ["site.test//a.html", "site.test//b.html"],
                "spans": [
                    [{"kind": "text", "text": "hi", "media_ref": "", "offset": 0}],
                    [
                        {"kind": "text", "text": "x", "media_ref": "", "offset": 0},
                        {
                            "kind": "media",
                            "text": "",
                            "media_ref": "img.png",
                            "offset": 1,
                        },
                    ],
                ],
            }
        )

    @pytest.mark.skipif(
        not _lance_installed(), reason="lance not installed in this sandbox"
    )
    @pytest.mark.usefixtures("ray_session")
    def test_lance_roundtrip_when_importable(self, tmp_path):
        from suckit_ray.sinks import read_lance, write_lance

        docs = self._docs()
        write_lance(docs, str(tmp_path / "tbl"), mode="overwrite")
        back = read_lance(str(tmp_path / "tbl"))
        got = back.to_pandas().sort_values("doc_id").reset_index(drop=True)
        want = docs.to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert got["doc_id"].tolist() == want["doc_id"].tolist()
        assert [len(s) for s in got["spans"]] == [len(s) for s in want["spans"]]

    def test_gate_plumbing_via_mock(self, monkeypatch, tmp_path):
        import sys
        import types

        import pyarrow as pa

        calls = {}
        fake = types.ModuleType("lance")

        def write_dataset(tbl, path, mode="append"):
            calls["write"] = (tbl, path, mode)
            return "ok"

        class _FakeDs:
            def __init__(self, tbl):
                self._tbl = tbl

            def to_table(self):
                return self._tbl

        def dataset(path):
            calls["read"] = path
            return _FakeDs(calls["write"][0])

        fake.write_dataset = write_dataset
        fake.dataset = dataset
        monkeypatch.setitem(sys.modules, "lance", fake)

        from suckit_ray.sinks import read_lance, write_lance

        docs = self._docs()
        assert write_lance(docs, str(tmp_path / "t"), mode="overwrite") == "ok"
        assert calls["write"] == (docs, str(tmp_path / "t"), "overwrite")
        # read path: force the non-native fallback so the mock serves
        import ray.data as rd

        monkeypatch.delattr(rd, "read_lance", raising=False)
        back = read_lance(str(tmp_path / "t"))
        assert calls["read"] == str(tmp_path / "t")
        assert back.count() == 2

    def test_gate_raises_cleanly_without_package(self, monkeypatch):
        if _lance_installed():
            pytest.skip("lance present: gate never fires")
        import pyarrow as pa

        from suckit_ray.sinks import read_lance

        with pytest.raises(NotImplementedError):
            read_lance("/tmp/nowhere")


@pytest.mark.usefixtures("ray_session")
class TestFlagshipScratchDir:
    """VERDICT r3 item 3: the flagship crawl's streamed per-wave
    parquet goes through the shared ``_scratch`` helper, so setting
    SUCKIT_SCRATCH_DIR (shared storage on a multi-node cluster) moves
    the distributed writes off the driver-local tempdir."""

    def test_flagship_output_lands_in_scratch_dir(self, tmp_path, monkeypatch):
        import suckit_ray.pipelines.flagship as fl

        monkeypatch.setenv("SUCKIT_SCRATCH_DIR", str(tmp_path))
        # force a fresh crawl for this sf_dir, restore the memo after
        saved = dict(fl._CRAWL_OUT_CACHE)
        fl._CRAWL_OUT_CACHE.clear()
        try:
            docs = fl.crawl_docs("/root/testdata/sf0.001")
            n = docs.count()
            out = fl._CRAWL_OUT_CACHE["/root/testdata/sf0.001"]
            assert out.startswith(str(tmp_path)), out
            assert n > 0
        finally:
            fl._CRAWL_OUT_CACHE.clear()
            fl._CRAWL_OUT_CACHE.update(saved)


@pytest.mark.usefixtures("ray_session")
class TestHostKernelScaleRoutes:
    """VERDICT r3 item 2: per-host O(m²)–O(m³) kernels route to
    sparse/sampled variants above HOST_EXACT_NODE_LIMIT. Pins:
    bow-tie sparse route is EXACT-equal; closeness/distance-stats/
    betweenness sampled routes reduce to the exact answer when the
    pivot set covers every node (betweenness within the documented
    per-pair-floor bound); the MC simrank route respects structure;
    and a skewed host completes via the scale route while small
    hosts in the same dataset stay exact."""

    def _docs(self, rows):
        import ray.data as rd

        return rd.from_items(rows).repartition(3)

    def test_bowtie_sparse_route_exact_equal(self):
        from suckit_ray.pipelines.graph import bowtie_from_docs

        rows = _bowtie_rich_rows() + _skewed_host_rows(60, "big")
        key = ["host", "cls"]
        dense = (
            bowtie_from_docs(self._docs(rows), exact_node_limit=10**9)
            .to_pandas().sort_values(key).reset_index(drop=True)
        )
        sparse = (
            bowtie_from_docs(self._docs(rows), exact_node_limit=1)
            .to_pandas().sort_values(key).reset_index(drop=True)
        )
        assert set(dense[dense.host == "bt"]["cls"]) == {
            "CORE", "IN", "OUT", "TUBE", "TENDRIL_IN", "TENDRIL_OUT", "DISC"
        }
        pd.testing.assert_frame_equal(dense, sparse)

    def test_closeness_full_pivots_equals_exact(self):
        from suckit_ray.pipelines.graph import closeness_from_docs

        rows = _skewed_host_rows(60, "big") + [
            _page("sm", 0, [1]), _page("sm", 1, []),
        ]
        key = ["host", "page"]
        exact = (
            closeness_from_docs(self._docs(rows), exact_node_limit=10**9)
            .to_pandas().sort_values(key).reset_index(drop=True)
        )
        sampled = (
            closeness_from_docs(
                self._docs(rows), exact_node_limit=1, pivots=100
            )
            .to_pandas().sort_values(key).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(exact, sampled)

    def test_distance_stats_full_pivots_equals_exact(self):
        from suckit_ray.pipelines.graph import distance_stats_from_docs

        rows = _skewed_host_rows(60, "big")
        exact = (
            distance_stats_from_docs(self._docs(rows), exact_node_limit=10**9)
            .to_pandas().reset_index(drop=True)
        )
        sampled = (
            distance_stats_from_docs(
                self._docs(rows), exact_node_limit=1, pivots=100
            )
            .to_pandas().reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(exact, sampled)

    def test_betweenness_full_pivots_within_floor_bound(self):
        from suckit_ray.pipelines.graph import betweenness_from_docs

        rows = _skewed_host_rows(60, "big")
        key = ["host", "page"]
        exact = (
            betweenness_from_docs(self._docs(rows), exact_node_limit=10**9)
            .to_pandas().sort_values(key).reset_index(drop=True)
        )
        sampled = (
            betweenness_from_docs(
                self._docs(rows), exact_node_limit=1, pivots=100
            )
            .to_pandas().sort_values(key).reset_index(drop=True)
        )
        m = 60
        # full-pivot Brandes differs from the per-ordered-pair-floored
        # exact kernel by < 1 micro per pair: |Δ| bounded by m²
        diff = (exact["bc_micro"] - sampled["bc_micro"]).abs()
        assert (diff <= m * m).all(), diff.max()
        # and ranks agree at the top
        assert (
            exact.nlargest(5, "bc_micro")["page"].tolist()
            == sampled.nlargest(5, "bc_micro")["page"].tolist()
        )

    def test_simrank_mc_route_structure(self):
        from suckit_ray.pipelines.graph import simrank_from_docs

        # 0 and 1 share the identical in-neighborhood {2,3}; 8/9 have
        # no in-edges at all (never meet anything)
        rows = [
            _page("h", 2, [0, 1]),
            _page("h", 3, [0, 1]),
            _page("h", 0, []),
            _page("h", 1, []),
            _page("h", 8, []),
            _page("h", 9, []),
        ]
        got = (
            simrank_from_docs(self._docs(rows), exact_node_limit=1)
            .to_pandas()
        )
        twin = got[(got.a == 0) & (got.b == 1)]
        assert len(twin) == 1 and twin["sim_micro"].iloc[0] > 0
        # sources with no in-edges can never meet: absent from output
        assert not ((got.a.isin([8, 9])) | (got.b.isin([8, 9]))).any()
        # exact kernel agrees 0–1 is the top non-diagonal pair
        exact = (
            simrank_from_docs(self._docs(rows), exact_node_limit=10**9)
            .to_pandas()
        )
        top = exact.nlargest(1, "sim_micro")
        assert (int(top["a"].iloc[0]), int(top["b"].iloc[0])) == (0, 1)

    def test_skewed_host_completes_sampled_small_stays_exact(self):
        from suckit_ray.pipelines.graph import (
            betweenness_from_docs,
            closeness_from_docs,
        )

        rows = _skewed_host_rows(300, "big") + [
            _page("sm", 0, [1]),
            _page("sm", 1, [2]),
            _page("sm", 2, []),
        ]
        got = (
            closeness_from_docs(
                self._docs(rows), exact_node_limit=100, pivots=32
            )
            .to_pandas().set_index(["host", "page"]).sort_index()
        )
        assert len(got.loc["big"]) == 300
        # the small host rode the EXACT kernel: hand values
        assert tuple(got.loc[("sm", 0)]) == (2, 3, (4 * 10**6) // (3 * 2))
        assert tuple(got.loc[("sm", 1)]) == (1, 1, (1 * 10**6) // (1 * 2))
        bc = (
            betweenness_from_docs(
                self._docs(rows), exact_node_limit=100, pivots=32
            )
            .to_pandas().set_index(["host", "page"])["bc_micro"]
        )
        assert len(bc.loc["big"]) == 300
        assert bc.loc[("sm", 1)] == 1_000_000  # exact path value


@pytest.mark.usefixtures("ray_session")
class TestSixteenthSessionQueries:
    """New operator pins beyond their SQL oracles."""

    SF = "/root/testdata/sf0.001"

    def test_range_search_empty_radius_is_robust(self):
        # a radius above the corpus max cosine → zero rows, and the
        # all-empty-blocks path must not lose the schema
        from suckit_ray.pipelines.ann import range_search

        t = range_search(self.SF, radius_pct=9999)
        assert t.num_rows == 0
        assert t.column_names == ["query_id", "neighbor_id", "cos_pct"]

    def test_range_search_subsumes_topk_hits(self):
        # every top-k hit with cos_pct >= radius must appear in the
        # range result with the same score
        from suckit_ray.pipelines.ann import brute_force_topk, range_search

        topk = brute_force_topk(self.SF).to_pandas()
        rng = range_search(self.SF, radius_pct=2000).to_pandas()
        have = {
            (int(q), int(n)): int(c)
            for q, n, c in zip(
                rng["query_id"], rng["neighbor_id"], rng["cos_pct"]
            )
        }
        hits = topk[topk["cos_pct"] >= 2000]
        assert len(hits) > 0
        for r in hits.itertuples():
            assert have.get((int(r.query_id), int(r.neighbor_id))) == int(
                r.cos_pct
            )

    def test_harmonic_sampled_route_equals_exact_with_full_pivots(self):
        import ray.data as rd

        from suckit_ray.pipelines.graph import harmonic_from_docs

        rows = _skewed_host_rows(60, "big")
        key = ["host", "page"]
        exact = (
            harmonic_from_docs(
                rd.from_items(rows).repartition(3), exact_node_limit=10**9
            )
            .to_pandas().sort_values(key).reset_index(drop=True)
        )
        sampled = (
            harmonic_from_docs(
                rd.from_items(rows).repartition(3),
                exact_node_limit=1,
                pivots=100,
            )
            .to_pandas().sort_values(key).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(exact, sampled)

    def test_harmonic_hand_values(self):
        import ray.data as rd

        from suckit_ray.pipelines.graph import harmonic_from_docs

        # path 0→1→2: harmonic(0) = 1e6 + 1e6//2; isolated page = 0
        rows = [
            _page("h", 0, [1]),
            _page("h", 1, [2]),
            _page("h", 2, []),
            _page("h", 3, []),
        ]
        got = (
            harmonic_from_docs(rd.from_items(rows))
            .to_pandas().set_index("page")["harmonic_micro"].to_dict()
        )
        assert got == {0: 1_500_000, 1: 1_000_000, 2: 0, 3: 0}

    def test_curriculum_ntile_remainder_rule(self):
        from suckit_ray.pipelines.textops import docs_curriculum_order

        got = (
            docs_curriculum_order(self.SF)
            .to_pandas()
            .sort_values("position")
            .reset_index(drop=True)
        )
        n = len(got)
        assert list(got["position"]) == list(range(1, n + 1))
        # n_chars non-decreasing along the curriculum
        assert (np.diff(got["n_chars"].to_numpy()) >= 0)[
            got["n_chars"].to_numpy()[:-1]
            != got["n_chars"].to_numpy()[1:]
        ].all() or (np.diff(got["n_chars"].to_numpy()) >= 0).all()
        # SQL NTILE remainder rule: first n%4 stages hold one extra
        q, r = divmod(n, 4)
        sizes = got.groupby("stage").size()
        assert sizes.tolist() == [q + 1] * r + [q] * (4 - r)


@pytest.mark.usefixtures("ray_session")
class TestDbscanDriverAssemblyCutover:
    """Small-graph assembly cutover (the CC_DRIVER_PAIR_LIMIT idiom
    applied to dbscan's downstream): below the edge bound the
    degree/core/CC/border assembly runs as one driver pass — pinned
    label-identical to the distributed join/co-group route."""

    def _run(self, limit, **kw):
        from suckit_ray.pipelines.ann import embeddings_dbscan

        return (
            embeddings_dbscan(SF, driver_edge_limit=limit, **kw)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )

    def test_driver_route_equals_distributed(self):
        driver = self._run(limit=None)       # default: driver assembly
        dist = self._run(limit=0)            # forced distributed route
        pd.testing.assert_frame_equal(driver, dist)

    def test_driver_route_equals_distributed_sparse_regime(self):
        # multiple clusters + borders + noise (the eps=0.35 regime of
        # the session-11 reference pins)
        driver = self._run(limit=None, eps=0.35)
        dist = self._run(limit=0, eps=0.35)
        pd.testing.assert_frame_equal(driver, dist)


@pytest.mark.usefixtures("ray_session")
class TestHitsDriverCutover:
    """HITS small-graph cutover: numpy driver matvecs bit-identical to
    the distributed message-passing route (integer sums + one global
    scalar divisor are reduction-order-free)."""

    def test_driver_route_equals_distributed(self):
        from suckit_ray.pipelines.flagship import crawl_docs
        from suckit_ray.pipelines.graph import hits_from_docs

        docs = crawl_docs("/root/testdata/sf0.001")
        key = "doc_id"
        driver = (
            hits_from_docs(docs)  # default: driver route (tiny graph)
            .to_pandas().sort_values(key).reset_index(drop=True)
        )
        dist = (
            hits_from_docs(docs, driver_edge_limit=0)
            .to_pandas().sort_values(key).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(driver, dist)
        assert (driver["hub_nano"] > 0).any()


@pytest.mark.usefixtures("ray_session")
class TestPagerankDriverCutover:
    """Integer pagerank/trustrank small-graph cutover equality: the
    quantized iteration is reduction-order-free, so the driver numpy
    matvec route must be bit-identical to the distributed co-groups.
    The float kernel never cuts over (order-sensitive sums)."""

    def test_pagerank_exact_driver_equals_distributed(self):
        from suckit_ray.pipelines.flagship import crawl_docs
        from suckit_ray.pipelines.graph import pagerank_exact_from_docs

        docs = crawl_docs("/root/testdata/sf0.001")
        driver = (
            pagerank_exact_from_docs(docs)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        dist = (
            pagerank_exact_from_docs(docs, driver_edge_limit=0)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(driver, dist)

    def test_trustrank_driver_equals_distributed(self):
        from suckit_ray.pipelines.flagship import crawl_docs
        from suckit_ray.pipelines.graph import trustrank_exact_from_docs

        docs = crawl_docs("/root/testdata/sf0.001")
        seeds = frozenset({"host0000.test//p0.html", "host0001.test//p0.html"})
        driver = (
            trustrank_exact_from_docs(docs, seeds)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        dist = (
            trustrank_exact_from_docs(docs, seeds, driver_edge_limit=0)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(driver, dist)


@pytest.mark.usefixtures("ray_session")
class TestCalibrationAndSemanticDecontam:
    def test_minhash_calibration_error_bound(self):
        """Broder estimator std ≈ √(J(1−J)/64) ≤ ~6.3 pct-points —
        the mean |err| over candidate pairs stays well inside a few
        sigma, and est/exact agree exactly where J = 1."""
        from suckit_ray.pipelines.dedup import minhash_calibration

        t = minhash_calibration(SF).to_pandas()
        assert len(t) > 0
        assert (t["abs_err"] == (t["est_pct"] - t["jaccard_pct"]).abs()).all()
        assert t["abs_err"].mean() <= 1500, t["abs_err"].mean()
        exact_dups = t[t["jaccard_pct"] == 10000]
        assert (exact_dups["est_pct"] == 10000).all()

    def test_calibration_covers_lsh_pairs(self):
        """Every thresholded minhash pair appears in the calibration
        table with the same exact jaccard."""
        from suckit_ray.pipelines.dedup import (
            minhash_calibration,
            minhash_lsh_pairs,
        )

        cal = minhash_calibration(SF).to_pandas()
        have = {
            (int(a), int(b)): int(j)
            for a, b, j in zip(cal["a_id"], cal["b_id"], cal["jaccard_pct"])
        }
        final = minhash_lsh_pairs(SF).to_pandas()
        assert len(final) > 0
        for r in final.itertuples():
            assert have[(int(r.a_id), int(r.b_id))] == int(r.jaccard_pct)

    def test_semantic_decontaminate_consistency(self):
        """Scores agree with ann_range_search on the shared radius:
        a doc is contaminated iff some test vector ranges to it."""
        from suckit_ray.pipelines.ann import range_search
        from suckit_ray.pipelines.textops import docs_semantic_decontaminate

        dec = docs_semantic_decontaminate(SF).to_pandas()
        rng = range_search(SF, radius_pct=3000).to_pandas()
        ranged = set(int(n) for n in rng["neighbor_id"] if n >= 10)
        flagged = set(
            int(d) for d in dec[dec["contaminated"]]["doc_id"]
        )
        assert flagged == ranged
        assert len(dec) == 490  # training split only (vec_id >= 10)


@pytest.mark.usefixtures("ray_session")
class TestWinnowOverlapPairs:
    def test_copied_passage_detected(self, tmp_path):
        """The MOSS guarantee end-to-end on an ENGINEERED corpus: an
        exact duplicate shares its full fingerprint set; a doc with a
        long copied passage shares >= 1 fingerprint; unrelated docs
        share nothing."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from suckit_ray.pipelines.textops import (
            winnow_fingerprint,
            winnow_overlap_pairs,
        )

        passage = "the quick brown fox jumps over the lazy dog " * 4
        docs = [
            (0, "alpha beta gamma delta " * 10 + passage),
            (1, "alpha beta gamma delta " * 10 + passage),  # exact dup of 0
            (2, "completely different words here entirely " * 8 + passage),
            (3, "zzz yyy xxx www vvv uuu ttt sss rrr qqq " * 9),
        ]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                    "text": pa.array([t for _, t in docs], pa.string()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        sf = str(tmp_path)
        pairs = winnow_overlap_pairs(sf, min_shared=1).to_pandas()
        have = {
            (int(a), int(b)): int(n)
            for a, b, n in zip(pairs["a_id"], pairs["b_id"], pairs["n_shared"])
        }
        fps = winnow_fingerprint(sf).to_pandas().set_index("doc_id")["n_fps"]
        assert have[(0, 1)] == int(fps.loc[0])  # identical text
        assert have.get((0, 2), 0) >= 1         # shared passage
        assert have.get((1, 2), 0) == have.get((0, 2), 0)
        assert (0, 3) not in have and (1, 3) not in have and (2, 3) not in have

    def test_corpus_pairs_nonempty_and_symmetric_free(self):
        from suckit_ray.pipelines.textops import winnow_overlap_pairs

        t = winnow_overlap_pairs(SF).to_pandas()
        assert len(t) > 0
        assert (t["a_id"] < t["b_id"]).all()
        assert (t["n_shared"] >= 2).all()


@pytest.mark.usefixtures("ray_session")
class TestQualityReport:
    def test_gate_conjunction_and_failure_counts(self):
        from suckit_ray.pipelines.textops import docs_quality_report

        t = docs_quality_report(SF).to_pandas()
        assert len(t) == 500
        assert (
            t["keep"] == (t["gopher_keep"] & t["c4_keep"] & t["readable"])
        ).all()
        expect = (
            (~t["gopher_keep"]).astype(int)
            + (~t["c4_keep"]).astype(int)
            + (~t["readable"]).astype(int)
        )
        assert (t["n_fail"] == expect).all()
        # the strict gates reject this synthetic corpus wholesale —
        # the report reveals it (the documented purpose); readability
        # still splits, so n_fail varies
        assert t["n_fail"].nunique() >= 2


@pytest.mark.usefixtures("ray_session")
class TestWaveSkewAndWindowedFunnel:
    def test_wave_skew_consistent_with_depths(self):
        from suckit_ray.pipelines.flagship import crawl_depths, crawl_wave_skew

        skew = (
            crawl_wave_skew(SF).to_pandas().set_index("depth").sort_index()
        )
        depths = crawl_depths(SF).to_pandas()
        per_wave = depths.groupby("depth").size()
        assert skew["n_docs"].to_dict() == per_wave.to_dict()
        assert (skew["top_share_pct"] <= 10000).all()
        assert (skew["n_hosts"] >= 1).all()

    def test_windowed_funnel_never_exceeds_plain(self, tmp_path):
        """Tightening the window can only DEMOTE stages; an engineered
        user whose purchase is outside the 7-day window proves the
        bound binds."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from suckit_ray.pipelines.relops import (
            events_funnel,
            events_funnel_windowed,
        )

        plain = (
            events_funnel(SF).to_pandas().set_index("user_id")["stage"]
        )
        win = (
            events_funnel_windowed(SF)
            .to_pandas().set_index("user_id")["stage"]
        )
        assert (win.loc[plain.index] <= plain).all()
        # engineered: view day 0, click day 1 (in window), purchase
        # day 30 (outside) -> stage 2 windowed, 3 plain
        day = 86_400_000_000
        tbl = pa.table(
            {
                "event_id": pa.array([0, 1, 2], pa.int64()),
                "ts": pa.array(
                    [0, 1 * day, 30 * day], pa.timestamp("us")
                ),
                "user_id": pa.array([1, 1, 1], pa.int64()),
                "event_type": pa.array(
                    ["view", "click", "purchase"], pa.string()
                ),
                "value": pa.array([1.0, 1.0, 1.0], pa.float64()),
                "props": pa.array(["{}"] * 3, pa.string()),
            }
        )
        pq.write_table(tbl, str(tmp_path / "events.parquet"))
        p = events_funnel(str(tmp_path)).to_pandas()
        w = events_funnel_windowed(str(tmp_path)).to_pandas()
        assert int(p["stage"].iloc[0]) == 3
        assert int(w["stage"].iloc[0]) == 2


@pytest.mark.usefixtures("ray_session")
class TestTfrecordRoundtrip:
    def test_crc32c_check_vector(self):
        """The standard Castagnoli check value — a self-consistent
        WRONG CRC would round-trip fine, so pin the public vector."""
        from suckit_ray.pipelines.formats import _crc32c_many

        assert int(_crc32c_many([b"123456789"])[0]) == 0xE3069283
        assert int(_crc32c_many([b""])[0]) == 0

    def test_roundtrip_and_corruption_detection(self, tmp_path):
        import glob as _glob

        import ray.data as rd

        from suckit_ray.pipelines.formats import (
            read_tfrecord,
            write_tfrecord_blocks,
        )

        docs = rd.from_items(
            [
                {"doc_id": i, "text": f"doc {i} body text", "lang": "en"}
                for i in range(20)
            ]
        ).repartition(3)
        out = str(tmp_path / "tfr")
        write_tfrecord_blocks(docs, out)
        back = (
            read_tfrecord(out)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert back["doc_id"].tolist() == list(range(20))
        assert back["text"].iloc[5] == "doc 5 body text"
        # flip one payload byte: the reader must refuse, not emit junk
        path = sorted(_glob.glob(f"{out}/*.tfrecord"))[0]
        blob = bytearray(open(path, "rb").read())
        blob[20] ^= 0xFF
        open(path, "wb").write(bytes(blob))
        with pytest.raises(Exception, match="CRC mismatch"):
            read_tfrecord(out).to_pandas()


@pytest.mark.usefixtures("ray_session")
class TestTokenEntropy:
    def test_degenerate_and_uniform_extremes(self, tmp_path):
        import math

        import pyarrow as pa
        import pyarrow.parquet as pq

        from suckit_ray.pipelines.textops import docs_token_entropy

        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": pa.array(
                        ["spam spam spam spam", "a b c d", ""], pa.string()
                    ),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        t = (
            docs_token_entropy(str(tmp_path))
            .to_pandas().set_index("doc_id")
        )
        assert 2 not in t.index  # token-less doc omitted
        assert t.loc[0, "ent_micro"] == 0  # one repeated word
        # uniform over 4 types: H = ln 4
        want = math.floor(4 * math.log(4) * 1_000_000) // 4
        assert t.loc[1, "ent_micro"] == want
        assert t.loc[1, "n_types"] == 4


@pytest.mark.usefixtures("ray_session")
class TestJaccardIntegerQuantization:
    def test_57_over_100_lands_on_5700(self, tmp_path):
        """Review-pass regression: floor((57/100)·10⁴) in float64 is
        5699 (0.57 is not representable), while the oracle's
        (10⁴·57)//100 is 5700 — both sides now spell the integer
        division. Engineered pair: doc B = prefix of doc A, giving
        exactly 57 shared / 100 union 3-gram shingles."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from suckit_ray.pipelines.dedup import ngram_jaccard_pairs

        assert int(np.floor((57 / 100) * 10000)) == 5699  # the trap
        toks = [f"w{i}" for i in range(102)]  # 100 shingles
        a = " ".join(toks)
        b = " ".join(toks[:59])  # 57 shingles, all shared
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array([a, b], pa.string()),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        t = ngram_jaccard_pairs(str(tmp_path)).to_pandas()
        row = t[(t.a_id == 0) & (t.b_id == 1)]
        assert len(row) == 1
        assert int(row["jaccard_pct"].iloc[0]) == 5700


@pytest.mark.usefixtures("ray_session")
class TestKnnClassifyAndNovelty:
    def test_knn_consistency_and_separable_corpus(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from suckit_ray.pipelines.ann import ann_knn_classify

        t = ann_knn_classify(SF).to_pandas()
        assert len(t) == 500
        assert (t["correct"] == (t["predicted"] == t["label"])).all()
        # NB the corpus labels are near-chance under cosine kNN
        # (~0.09 vs 0.126 majority) — the eval harness REVEALING that
        # a label column is not embedding-separable is its job; the
        # classifier itself is pinned on an engineered corpus:
        rng = np.random.RandomState(7)
        base0 = rng.rand(8); base1 = -base0
        rows = []
        for i in range(40):
            lab = i % 2
            v = (base0 if lab == 0 else base1) + rng.rand(8) * 0.01
            rows.append((i, v.tolist(), lab))
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                    "embedding": pa.array(
                        [r[1] for r in rows], pa.list_(pa.float32())
                    ),
                    "label": pa.array([r[2] for r in rows], pa.int64()),
                }
            ),
            str(tmp_path / "embeddings.parquet"),
        )
        sep = ann_knn_classify(str(tmp_path)).to_pandas()
        assert sep["correct"].all()  # two antipodal tight clusters

    def test_knn_forced_cutover_equality(self):
        # the round-5 scale routing: brute_limit=0 forces the IVF-cell
        # neighbor source; with nprobe == n_clusters every vector is in
        # every probed cell, so the route is exhaustive and must be
        # prediction-identical to the brute broadcast path.
        from suckit_ray.pipelines.ann import ann_knn_classify

        brute = (
            ann_knn_classify(SF).to_pandas()
            .sort_values("vec_id").reset_index(drop=True)
        )
        ivf = (
            ann_knn_classify(SF, brute_limit=0, n_clusters=4, nprobe=4)
            .to_pandas().sort_values("vec_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(brute, ivf[brute.columns])

    def test_knn_ivf_nonexhaustive_complete(self):
        # approximate probes still classify EVERY vector (the tagged
        # self-union guarantees coverage without a Dataset.join)
        from suckit_ray.pipelines.ann import ann_knn_classify

        t = (
            ann_knn_classify(SF, brute_limit=0, n_clusters=8, nprobe=2)
            .to_pandas()
        )
        assert len(t) == 500
        assert t["vec_id"].is_unique
        assert (t["correct"] == (t["predicted"] == t["label"])).all()

    def test_novelty_duplicate_scores_zero(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from suckit_ray.pipelines.dedup import docs_ngram_novelty

        a = " ".join(f"w{i}" for i in range(20))
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": pa.array(
                        [a, a, "entirely novel words " + " ".join(
                            f"x{i}" for i in range(10)
                        )],
                        pa.string(),
                    ),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        t = (
            docs_ngram_novelty(str(tmp_path))
            .to_pandas().set_index("doc_id")
        )
        assert t.loc[0, "novelty_pct"] == 10000  # first copy owns all
        assert t.loc[1, "novelty_pct"] == 0      # exact dup adds nothing
        assert t.loc[2, "novelty_pct"] == 10000


@pytest.mark.usefixtures("ray_session")
class TestSq8:
    def test_hand_built_codes(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from suckit_ray.pipelines.ann import embeddings_sq8

        # dim0 spans [0, 1] -> codes floor(x*256) clamped; dim1 is
        # CONSTANT -> codes 0, dequant == value, zero error
        vecs = [[0.0, 7.0], [0.5, 7.0], [1.0, 7.0]]
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array([0, 1, 2], pa.int64()),
                    "embedding": pa.array(vecs, pa.list_(pa.float32())),
                }
            ),
            str(tmp_path / "embeddings.parquet"),
        )
        t = (
            embeddings_sq8(str(tmp_path))
            .to_pandas().set_index("vec_id").sort_index()
        )
        # codes: x=0 -> 0; x=0.5 -> 128; x=1.0 -> 256 -> clamp 255
        assert t.loc[0, "code_sum"] == 0
        assert t.loc[1, "code_sum"] == 128
        assert t.loc[2, "code_sum"] == 255
        assert (t["code_min"] == 0).all()  # constant dim codes 0
        # midpoint dequant error <= half a cell = 1/512 of the range,
        # so each quantized component floor((x-deq)*1e3) is in
        # [-2, 1] and err_q stays tiny; constant dim contributes 0
        assert (t["err_q"] <= 8).all()

    def test_matches_oracle_shape(self):
        from suckit_ray.pipelines.ann import embeddings_sq8

        t = embeddings_sq8(SF).to_pandas()
        assert len(t) == 500
        assert t["code_max"].max() <= 255 and t["code_min"].min() >= 0


@pytest.mark.usefixtures("ray_session")
class TestRateLimit:
    def test_burst_flags_and_counts(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from suckit_ray.pipelines.relops import events_rate_limit

        base = np.datetime64("2026-01-01T00:00:00", "us")
        hour = np.timedelta64(3600_000_000, "us")
        rows = []
        # user 1: 8 events inside one hour — events 7..8 exceed limit 6
        for i in range(8):
            rows.append((i, 1, base + np.timedelta64(i, "m")))
        # user 2: one event per 48 h — never more than 1 in window
        for i in range(3):
            rows.append((100 + i, 2, base + 48 * hour * i))
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "user_id": pa.array([r[1] for r in rows], pa.int64()),
                    "ts": pa.array(
                        [r[2].astype("datetime64[us]").item() for r in rows],
                        pa.timestamp("us"),
                    ),
                }
            ),
            str(tmp_path / "events.parquet"),
        )
        t = (
            events_rate_limit(str(tmp_path))
            .to_pandas().set_index("event_id").sort_index()
        )
        assert t.loc[0:7, "n_in_window"].tolist() == list(range(1, 9))
        assert t.loc[0:7, "violation"].tolist() == [False] * 6 + [True] * 2
        assert (t.loc[100:, "n_in_window"] == 1).all()
        assert not t.loc[100:, "violation"].any()


@pytest.mark.usefixtures("ray_session")
def test_ann_recall_report_bands():
    """The recall report must reproduce the per-method pinned bands
    (deterministic seeded training): brute ∩ is microaveraged and
    basis-point floored, so the values are stable integers."""
    from suckit_ray.pipelines.ann import ann_recall_report

    t = ann_recall_report(SF).to_pandas().set_index("method")
    assert set(t.index) == {"ivf", "lsh", "pq"}
    assert (t["k"] == 10).all()
    # measured on this corpus: ivf 0.64 (nprobe=4/16), lsh 0.83,
    # pq 0.98 (+exact rescore) — pin generous floors so quantizer
    # regressions surface without over-pinning float k-means
    assert int(t.loc["ivf", "mean_recall_pct"]) >= 5000
    assert int(t.loc["lsh", "mean_recall_pct"]) >= 7000
    assert int(t.loc["pq", "mean_recall_pct"]) >= 9000
    assert (t["mean_recall_pct"] <= 10000).all()
