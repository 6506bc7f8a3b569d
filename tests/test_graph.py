"""Link-graph analytics: distributed PageRank over the crawled mirror
must match a single-machine numpy power iteration on the same docs
table (float reduction order differs, so allclose not hash)."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_pagerank_matches_reference():
    from suckit_ray.pipelines.flagship import crawl_docs
    from suckit_ray.pipelines.graph import pagerank_from_docs, reference_pagerank

    docs = crawl_docs(SF)
    got = pagerank_from_docs(docs).to_pandas()
    tbl = pa.concat_tables(
        list(docs.iter_batches(batch_size=None, batch_format="pyarrow")),
        promote_options="default",
    )
    ref = reference_pagerank(tbl)
    assert set(got["doc_id"]) == set(ref)
    g = dict(zip(got["doc_id"], got["rank"]))
    assert np.allclose([g[k] for k in ref], [ref[k] for k in ref], atol=1e-12)
    # ranks are a distribution over pages (links stay in the crawled
    # closure, so no mass leaks beyond float error)
    assert abs(got["rank"].sum() - 1.0) < 1e-9


def test_resolve_link_inverts_relative_rewrite():
    from suckit_ray.pipelines.graph import resolve_link
    from suckit_ray.urlkit import relative_rewrite

    cases = [
        ("host.test//p3.html", "host.test//p7.html"),
        ("host.test/a/b/page.html", "host.test/a/img.jpg"),
        ("host.test/a/page.html", "other.test//x.html"),
    ]
    import posixpath

    for src, dst in cases:
        rel = relative_rewrite(src, dst)
        assert resolve_link(src, rel) == posixpath.normpath(dst), (src, dst, rel)


@pytest.mark.usefixtures("ray_session")
def test_pagerank_drops_links_outside_crawled_set():
    """Regression: a link whose target was never crawled (depth- or
    wave-capped crawls emit these) must NOT invent a rank row — its
    mass falls to the teleport term, as in reference_pagerank."""
    import ray.data as rd

    from suckit_ray.pipelines.graph import pagerank_from_docs, reference_pagerank

    def page(doc_id, refs):
        return {
            "doc_id": doc_id,
            "is_html": True,
            "spans": [{"kind": "link", "text": "", "media_ref": r, "offset": 0}
                      for r in refs],
        }

    tbl = pa.Table.from_pylist(
        [
            page("h.test/a.html", ["b.html", "missing.html"]),
            page("h.test/b.html", ["a.html"]),
        ]
    )
    got = pagerank_from_docs(rd.from_arrow(tbl), num_buckets=2).to_pandas()
    ref = reference_pagerank(tbl)
    assert set(got["doc_id"]) == set(ref) == {"h.test/a.html", "h.test/b.html"}
    g = dict(zip(got["doc_id"], got["rank"]))
    assert np.allclose([g[k] for k in ref], [ref[k] for k in ref], atol=1e-12)


@pytest.mark.usefixtures("ray_session")
def test_pagerank_exact_tracks_float_reference():
    """The integer-quantized ranks must approximate the float power
    iteration (per-edge floors leak ≤ |edges| picounits per round) and
    conserve total mass up to that rounding."""
    from suckit_ray.pipelines.flagship import crawl_docs
    from suckit_ray.pipelines.graph import (
        PAGERANK_PICO,
        pagerank_exact_from_docs,
        reference_pagerank,
    )

    import pyarrow as pa

    docs = crawl_docs("/root/testdata/sf0.001")
    got = pagerank_exact_from_docs(docs).to_pandas()
    ref = reference_pagerank(pa.Table.from_pandas(docs.to_pandas()))
    assert len(got) == len(ref)
    for _, r in got.iterrows():
        approx = r["rank_pico"] / PAGERANK_PICO
        want = ref[r["doc_id"]]
        assert abs(approx - want) <= 5e-6 + 1e-3 * want, (
            r["doc_id"], approx, want)
    # mass conservation: floors only ever LOSE mass, bounded by
    # iters × (edges + n) picounits
    total = int(got["rank_pico"].sum())
    assert total <= PAGERANK_PICO
    assert total >= PAGERANK_PICO - 10 * (5 * len(ref) + len(ref) + 1000)


@pytest.mark.usefixtures("ray_session")
def test_hits_on_irregular_graph_matches_integer_reference():
    """The flagship web is exactly 4-in-regular (its linear link maps
    partition in-degree evenly), which makes HITS uniform there — so
    this pin uses a hand-built IRREGULAR graph with a clear hub and a
    clear authority, plus a dangling page and a link to an un-crawled
    target, and checks the distributed run against a direct Python
    implementation of the same integer rules."""
    import ray.data as rd

    from suckit_ray.pipelines.graph import HITS_SCALE, hits_from_docs

    def page(doc_id, refs):
        return {
            "doc_id": doc_id,
            "is_html": True,
            "spans": [{"kind": "link", "text": "", "media_ref": r, "offset": 0}
                      for r in refs],
        }

    pages = {
        "h.test/hub.html": ["auth.html", "b.html", "c.html", "auth.html"],
        "h.test/b.html": ["auth.html", "missing.html"],
        "h.test/c.html": ["auth.html"],
        "h.test/auth.html": ["hub.html"],
        "h.test/dangling.html": [],
    }
    tbl = pa.Table.from_pylist(
        [page(k, v) for k, v in sorted(pages.items())]
    )
    got = hits_from_docs(rd.from_arrow(tbl), num_buckets=2).to_pandas()

    # direct integer reference (same rules: multiplicity kept, edges
    # to un-crawled targets contribute nothing, scalar divisor floors)
    import posixpath

    nodes = sorted(pages)
    edges = []
    for u, refs in pages.items():
        for r in refs:
            v = posixpath.normpath(
                posixpath.join(posixpath.dirname(u), r)
            ).split("#", 1)[0]
            edges.append((u, v))
    S = HITS_SCALE
    h = {u: S // len(nodes) for u in nodes}
    a = dict(h)
    for _ in range(5):
        raw = {}
        for u, v in edges:
            if v in h:
                raw[v] = raw.get(v, 0) + h[u]
        d = max(sum(raw.values()) // S, 1)
        a = {v: raw.get(v, 0) // d for v in nodes}
        raw2 = {}
        for u, v in edges:
            if v in a and u in a:
                raw2[u] = raw2.get(u, 0) + a[v]
        d2 = max(sum(raw2.values()) // S, 1)
        h = {u: raw2.get(u, 0) // d2 for u in nodes}

    assert len(got) == len(nodes)
    g = got.set_index("doc_id")
    for u in nodes:
        assert int(g.loc[u, "hub_nano"]) == h[u], (u, "hub")
        assert int(g.loc[u, "auth_nano"]) == a[u], (u, "auth")
    # the graph actually discriminates: hub out-scores everyone as a
    # hub, auth as an authority, and the dangling page scores 0/0
    assert g["hub_nano"].idxmax() == "h.test/hub.html"
    assert g["auth_nano"].idxmax() == "h.test/auth.html"
    assert int(g.loc["h.test/dangling.html", "hub_nano"]) == 0
    assert int(g.loc["h.test/dangling.html", "auth_nano"]) == 0


@pytest.mark.usefixtures("ray_session")
def test_degrees_match_python_reference():
    """Degree histogram vs a brute-force dict reference over the same
    edge list (simple-graph: distinct neighbors, self-loops out)."""
    from collections import Counter, defaultdict

    from suckit_ray.pipelines.flagship import crawl_docs
    from suckit_ray.pipelines.graph import _link_edges, degrees_from_docs

    docs = crawl_docs(SF)
    got = (
        degrees_from_docs(docs)
        .to_pandas()
        .sort_values(["direction", "degree"])
        .reset_index(drop=True)
    )
    ed = _link_edges(crawl_docs(SF)).to_pandas()
    pairs = {
        (s, d) for s, d in zip(ed["src"], ed["dst"]) if s != d
    }
    outs, ins = defaultdict(set), defaultdict(set)
    for s, d in pairs:
        outs[s].add(d)
        ins[d].add(s)
    ref = []
    for dirname, m in (("in", ins), ("out", outs)):
        for deg, n in sorted(Counter(len(v) for v in m.values()).items()):
            ref.append((dirname, deg, n))
    got_rows = list(
        zip(got["direction"], got["degree"].astype(int), got["n_nodes"].astype(int))
    )
    assert got_rows == ref and len(ref) > 0


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("k", [2, 6])
def test_kcore_matches_python_peel(k):
    """k=2 converges in one round on this dense graph; k=6 PEELS
    (500 → 492 nodes with cascade) — the data-dependent-rounds path."""
    from collections import defaultdict

    from suckit_ray.pipelines.flagship import crawl_docs
    from suckit_ray.pipelines.graph import _link_edges, kcore_from_docs

    got = (
        kcore_from_docs(crawl_docs(SF), k=k)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ed = _link_edges(crawl_docs(SF)).to_pandas()
    pairs = {
        (min(s, d), max(s, d))
        for s, d in zip(ed["src"], ed["dst"])
        if s != d
    }
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    # brute-force peel
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for p in adj.pop(n):
                    adj[p].discard(n)
                changed = True
    ref = sorted((n, len(ps)) for n, ps in adj.items())
    got_rows = sorted(
        zip(got["doc_id"], got["core_degree"].astype(int))
    )
    assert got_rows == ref and len(ref) > 0
    if k == 6:
        assert len(ref) < 500  # genuine pruning exercised


@pytest.mark.usefixtures("ray_session")
def test_kcore_chain_peels_to_empty_and_raises_when_capped():
    """A path graph peels 2 endpoints per round — the data-dependent
    multi-round case; an insufficient max_rounds must RAISE, never
    return the truncated superset (review finding)."""
    import ray.data as rd

    from suckit_ray.pipelines.graph import kcore_from_docs

    n = 8  # path graph: peels 2 endpoints per round, 2-core empty
    rows = [
        {
            "doc_id": f"h.test/p{i}.html",
            "is_html": True,
            "spans": [
                {
                    "kind": "link",
                    "text": "",
                    "media_ref": f"p{i + 1}.html",
                    "offset": 0,
                }
            ]
            if i + 1 < n
            else [],
        }
        for i in range(n)
    ]
    docs = rd.from_items(rows).repartition(2)
    out = kcore_from_docs(docs, k=2).to_pandas()
    assert len(out) == 0  # a path has an empty 2-core

    with pytest.raises(RuntimeError, match="did not converge"):
        kcore_from_docs(
            rd.from_items(rows).repartition(2), k=2, max_rounds=1
        ).to_pandas()


class TestComponents:
    def _docs(self, rows):
        import pyarrow as pa

        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": [r[0] for r in rows],
                    "is_html": [True] * len(rows),
                    "spans": [
                        [
                            {"kind": "link", "text": "", "media_ref": m, "offset": 0}
                            for m in r[1]
                        ]
                        for r in rows
                    ],
                }
            )
        )

    def test_sizes_with_singleton_and_two_islands(self):
        from suckit_ray.pipelines.graph import components_from_docs

        docs = self._docs(
            [
                ("h//a.html", ["b.html"]),
                ("h//b.html", ["a.html"]),
                ("h//c.html", ["a.html"]),
                ("h//iso.html", []),  # no edges at all → singleton
                ("g//x.html", ["y.html"]),
                ("g//y.html", []),
            ]
        )
        out = (
            components_from_docs(docs)
            .to_pandas()
            .sort_values("size")
            .reset_index(drop=True)
        )
        assert out.to_dict("list") == {
            "size": [1, 2, 3],
            "n_components": [1, 1, 1],
        }

    def test_self_loops_and_duplicate_links_are_neutral(self):
        from suckit_ray.pipelines.graph import components_from_docs

        docs = self._docs(
            [
                ("h//a.html", ["a.html", "b.html", "b.html"]),  # self + dup
                ("h//b.html", []),
            ]
        )
        out = components_from_docs(docs).to_pandas()
        assert out.to_dict("list") == {"size": [2], "n_components": [1]}

    def test_cc_labels_rejects_negative_ids(self):
        import pandas as pd
        import pytest as pt

        import ray.data as rd
        from suckit_ray.pipelines.dedup import _cc_labels

        ids = rd.from_pandas(pd.DataFrame({"a_id": [-5], "b_id": [3]}))
        with pt.raises(Exception, match="non-negative"):
            _cc_labels(ids).to_pandas()


@pytest.mark.usefixtures("ray_session")
class TestComponentsCutoverEquality:
    def test_driver_and_propagation_routes_agree(self):
        """The small-graph driver union-find cutover and the
        zero-driver min-label propagation must produce the same size
        histogram — pinned on the real flagship sf0.001 link graph
        (multi-host, singletons, diameter > 1)."""
        from suckit_ray.pipelines.flagship import crawl_docs
        from suckit_ray.pipelines.graph import components_from_docs

        docs = crawl_docs("/root/testdata/sf0.001")
        fast = (
            components_from_docs(docs)
            .to_pandas()
            .sort_values("size")
            .reset_index(drop=True)
        )
        slow = (
            components_from_docs(docs, cc_driver_limit=0)
            .to_pandas()
            .sort_values("size")
            .reset_index(drop=True)
        )
        import pandas as pd

        pd.testing.assert_frame_equal(fast, slow)
        assert fast["n_components"].sum() >= 1


@pytest.mark.usefixtures("ray_session")
class TestScc:
    def _docs(self, rows):
        import pyarrow as pa

        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": [r[0] for r in rows],
                    "is_html": [True] * len(rows),
                    "spans": [
                        [
                            {"kind": "link", "text": "", "media_ref": m, "offset": 0}
                            for m in r[1]
                        ]
                        for r in rows
                    ],
                }
            )
        )

    def test_hand_digraphs_driver_route(self):
        from suckit_ray.pipelines.graph import scc_from_docs

        cases = [
            # 3-cycle with a tail: {a,b,c} + {d}
            (
                [
                    ("h//a.html", ["b.html"]),
                    ("h//b.html", ["c.html"]),
                    ("h//c.html", ["a.html", "d.html"]),
                    ("h//d.html", []),
                ],
                {1: 1, 3: 1},
            ),
            # DAG: all singletons
            (
                [
                    ("h//a.html", ["b.html"]),
                    ("h//b.html", ["c.html"]),
                    ("h//c.html", []),
                ],
                {1: 3},
            ),
            # two 2-cycles bridged one-way
            (
                [
                    ("h//a.html", ["b.html"]),
                    ("h//b.html", ["a.html", "c.html"]),
                    ("h//c.html", ["d.html"]),
                    ("h//d.html", ["c.html"]),
                ],
                {2: 2},
            ),
        ]
        for rows, exp in cases:
            out = scc_from_docs(self._docs(rows)).to_pandas()
            assert dict(zip(out["size"], out["n_sccs"])) == exp, rows

    def test_distributed_route_equals_driver(self):
        """Force the FW-BW coloring path (scc_driver_limit=0) on the
        bridged-two-cycles digraph — multi-phase: the high-id cycle's
        color floods the low one, so phase 1 resolves one SCC and
        phase 2 the other."""
        from suckit_ray.pipelines.graph import scc_from_docs

        docs = self._docs(
            [
                ("h//a.html", ["b.html"]),
                ("h//b.html", ["a.html", "c.html"]),
                ("h//c.html", ["d.html"]),
                ("h//d.html", ["c.html"]),
                ("h//iso.html", []),
            ]
        )
        slow = scc_from_docs(docs, scc_driver_limit=0).to_pandas()
        assert dict(zip(slow["size"], slow["n_sccs"])) == {2: 2, 1: 1}

    def test_vs_kosaraju_reference(self):
        """Independent Kosaraju (two DFS passes — a different
        algorithm from the engine's Tarjan) over the real sf0.001
        flagship link graph."""
        import posixpath
        from collections import defaultdict

        from suckit_ray.pipelines.flagship import crawl_docs
        from suckit_ray.pipelines.graph import _link_edges, crawl_scc

        docs = crawl_docs("/root/testdata/sf0.001")
        ed = _link_edges(docs).to_pandas()
        nodes = set()
        docs_df = docs.to_pandas()
        for did, is_html in zip(docs_df["doc_id"], docs_df["is_html"]):
            if is_html:
                nodes.add(posixpath.normpath(did))
        fwd, rev = defaultdict(list), defaultdict(list)
        for s, d in zip(ed["src"], ed["dst"]):
            if s in nodes and d in nodes and s != d:
                fwd[s].append(d)
                rev[d].append(s)
        order, seen = [], set()
        for n in nodes:
            if n in seen:
                continue
            stack = [(n, iter(fwd[n]))]
            seen.add(n)
            while stack:
                v, it = stack[-1]
                adv = False
                for w in it:
                    if w not in seen:
                        seen.add(w)
                        stack.append((w, iter(fwd[w])))
                        adv = True
                        break
                if not adv:
                    order.append(v)
                    stack.pop()
        comp_sizes = []
        assigned = set()
        for n in reversed(order):
            if n in assigned:
                continue
            size, stack = 0, [n]
            assigned.add(n)
            while stack:
                v = stack.pop()
                size += 1
                for w in rev[v]:
                    if w not in assigned:
                        assigned.add(w)
                        stack.append(w)
            comp_sizes.append(size)
        ref: dict[int, int] = {}
        for s in comp_sizes:
            ref[s] = ref.get(s, 0) + 1
        out = crawl_scc("/root/testdata/sf0.001").to_pandas()
        assert dict(zip(out["size"], out["n_sccs"])) == ref


@pytest.mark.usefixtures("ray_session")
class TestSssp:
    def _docs(self, rows):
        """rows: (doc_id, [(media_ref)...], wave)"""
        import pyarrow as pa

        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": [r[0] for r in rows],
                    "is_html": [True] * len(rows),
                    "wave": [r[2] for r in rows],
                    "spans": [
                        [
                            {"kind": "link", "text": "", "media_ref": m, "offset": 0}
                            for m in r[1]
                        ]
                        for r in rows
                    ],
                }
            )
        )

    def test_cheaper_long_path_beats_fewer_hops(self):
        """seed → loooong.html directly (cost 11) vs seed → a.html →
        loooong.html (cost 6+11=17): direct wins. seed → b12345.html
        (cost 11) vs via a (6+6=12): direct wins; but x.html is only
        reachable via two short hops (6+6=12) vs one long direct link
        of len 13 — the RELAXATION property: a later round lowers a
        BFS-level distance."""
        from suckit_ray.pipelines.graph import sssp_from_docs

        docs = self._docs(
            [
                # media_refs: 'a.html' len 6, 'll-x.html' len 9,
                # 'a-long-name.html' len 16
                ("h//seed.html", ["a.html", "a-long-name.html"], 0),
                ("h//a.html", ["a-long-name.html"], 1),
                ("h//a-long-name.html", [], 1),
            ]
        )
        out = (
            sssp_from_docs(docs)
            .to_pandas()
            .set_index("doc_id")["dist"]
        )
        assert out["h//seed.html"] == 0
        assert out["h//a.html"] == 6
        # direct: 16; via a: 6 + 16 = 22 → direct wins
        assert out["h//a-long-name.html"] == 16

    def test_relaxation_lowers_via_two_hops(self):
        from suckit_ray.pipelines.graph import sssp_from_docs

        docs = self._docs(
            [
                # direct link to target spelled with a LONG relative
                # ref (len 20) vs two hops 6 + 13 = 19
                ("h//seed.html", ["a.html", "./../h/target00.html"], 0),
                ("h//a.html", ["target00.html"], 1),
                ("h//target00.html", [], 1),
            ]
        )
        out = (
            sssp_from_docs(docs).to_pandas().set_index("doc_id")["dist"]
        )
        assert out["h//target00.html"] == 19  # not 20

    def test_unreachable_reports_minus_one_and_hop_cap(self):
        from suckit_ray.pipelines.graph import sssp_from_docs

        docs = self._docs(
            [
                ("h//seed.html", ["a.html"], 0),
                ("h//a.html", [], 1),
                ("h//island.html", [], 3),
            ]
        )
        out = (
            sssp_from_docs(docs).to_pandas().set_index("doc_id")["dist"]
        )
        assert out["h//island.html"] == -1
        # hop cap: chain longer than the cap leaves the tail at -1
        chain = [("h//p0.html", ["p1.html"], 0)] + [
            (f"h//p{i}.html", [f"p{i+1}.html"], i) for i in range(1, 5)
        ] + [("h//p5.html", [], 5)]
        capped = (
            sssp_from_docs(self._docs(chain), hop_cap=3)
            .to_pandas()
            .set_index("doc_id")["dist"]
        )
        assert capped["h//p3.html"] == 3 * 7  # 'pN.html' len 7
        assert capped["h//p4.html"] == -1
        assert capped["h//p5.html"] == -1

    def test_distributed_route_equals_driver(self):
        from suckit_ray.pipelines.graph import sssp_from_docs

        docs = self._docs(
            [
                ("h//seed.html", ["a.html", "./../h/target00.html"], 0),
                ("h//a.html", ["target00.html"], 1),
                ("h//target00.html", ["a.html"], 1),
                ("h//island.html", [], 3),
            ]
        )
        fast = (
            sssp_from_docs(docs)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        slow = (
            sssp_from_docs(docs, driver_limit=0)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        import pandas as pd

        pd.testing.assert_frame_equal(fast, slow)


@pytest.mark.usefixtures("ray_session")
class TestCocitation:
    def test_matches_bruteforce_reference(self):
        """Independent check on the real sf0.001 graph: nested-loop
        co-citation counts from the raw edge list."""
        import collections

        from suckit_ray.pipelines.flagship import crawl_docs
        from suckit_ray.pipelines.graph import (
            _link_edges,
            cocitation_from_docs,
        )

        docs = crawl_docs(SF)
        got = cocitation_from_docs(docs).to_pandas()

        import re

        page_re = re.compile(r"/p(\d+)\.html$")
        outadj = collections.defaultdict(set)
        ed = _link_edges(docs).to_pandas()
        for s, d in zip(ed["src"], ed["dst"]):
            ms, md = page_re.search(s), page_re.search(d)
            if not ms or not md:
                continue
            hs, hd = s.split("/", 1)[0], d.split("/", 1)[0]
            if hs != hd or ms.group(1) == md.group(1):
                continue
            outadj[(hs, int(ms.group(1)))].add(int(md.group(1)))
        cnt = collections.Counter()
        for (h, _s), ts in outadj.items():
            ts = sorted(ts)
            for i in range(len(ts)):
                for j in range(i + 1, len(ts)):
                    cnt[(h, ts[i], ts[j])] += 1
        want = {k: v for k, v in cnt.items() if v >= 2}
        have = {
            (h, int(a), int(b)): int(n)
            for h, a, b, n in zip(
                got["host"], got["a"], got["b"], got["n_common"]
            )
        }
        assert have == want and len(want) > 0

    def test_threshold_and_order_on_hand_graph(self):
        """4 sources all citing {1,2}; one source also citing 3:
        (1,2) has 4 common citers, (1,3)/(2,3) only 1 — thresholded
        out. Pair output is always a<b."""
        from suckit_ray.pipelines.graph import cocitation_from_docs

        rows = []
        for j, targets in [
            (10, [1, 2]),
            (11, [2, 1]),  # citation order must not matter
            (12, [1, 2, 3]),
            (13, [2, 1]),
        ]:
            spans = [
                {
                    "kind": "link",
                    "text": "",
                    "media_ref": f"p{t}.html",
                    "offset": i,
                }
                for i, t in enumerate(targets)
            ]
            rows.append(
                {
                    "doc_id": f"h//p{j}.html",
                    "host": "h",
                    "is_html": True,
                    "spans": spans,
                }
            )
        import ray.data as rd

        got = (
            cocitation_from_docs(rd.from_items(rows))
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        assert got.to_dict("records") == [
            {"host": "h", "a": 1, "b": 2, "n_common": 4}
        ]


@pytest.mark.usefixtures("ray_session")
def test_trustrank_tracks_float_reference():
    """Integer TrustRank approximates the float personalized power
    iteration on the real flagship graph (same floor-leak bound as the
    uniform variant), and every page holds LESS trust than rank mass
    outside the seeds' neighborhoods would imply — total trust ≤ 1."""
    from suckit_ray.pipelines.flagship import crawl_docs
    from suckit_ray.pipelines.graph import (
        PAGERANK_PICO,
        crawl_seed_paths,
        reference_trustrank,
        trustrank_exact_from_docs,
    )

    docs = crawl_docs("/root/testdata/sf0.001")
    seeds = crawl_seed_paths("/root/testdata/sf0.001")
    got = trustrank_exact_from_docs(docs, seeds).to_pandas()
    ref = reference_trustrank(
        pa.Table.from_pandas(docs.to_pandas()), seeds
    )
    assert len(got) == len(ref)
    for _, r in got.iterrows():
        approx = r["trust_pico"] / PAGERANK_PICO
        want = ref[r["doc_id"]]
        assert abs(approx - want) <= 5e-6 + 1e-3 * want, (
            r["doc_id"], approx, want)
    assert got["trust_pico"].sum() <= PAGERANK_PICO
    # seeds must hold strictly positive trust
    g = dict(zip(got["doc_id"], got["trust_pico"]))
    assert all(g[s] > 0 for s in seeds)


@pytest.mark.usefixtures("ray_session")
def test_trustrank_zeroes_spam_cluster_unreachable_from_seeds():
    """The defining property: a densely self-linked cluster with no
    path from any seed gets trust EXACTLY 0 (integer arithmetic — no
    float dust), while uniform PageRank rewards its internal mass."""
    import ray.data as rd

    from suckit_ray.pipelines.graph import (
        pagerank_exact_from_docs,
        trustrank_exact_from_docs,
    )

    def page(doc_id, refs):
        return {
            "doc_id": doc_id,
            "is_html": True,
            "spans": [{"kind": "link", "text": "", "media_ref": r, "offset": 0}
                      for r in refs],
        }

    tbl = pa.Table.from_pylist(
        [
            page("h.test/seed.html", ["good.html"]),
            page("h.test/good.html", ["seed.html"]),
            # spam farm: links only among itself
            page("h.test/spam1.html", ["spam2.html"]),
            page("h.test/spam2.html", ["spam1.html"]),
        ]
    )
    seeds = frozenset({"h.test/seed.html"})
    trust = (
        trustrank_exact_from_docs(rd.from_arrow(tbl), seeds, num_buckets=2)
        .to_pandas()
        .set_index("doc_id")["trust_pico"]
    )
    assert trust["h.test/spam1.html"] == 0
    assert trust["h.test/spam2.html"] == 0
    assert trust["h.test/seed.html"] > 0
    assert trust["h.test/good.html"] > 0
    rank = (
        pagerank_exact_from_docs(rd.from_arrow(tbl), num_buckets=2)
        .to_pandas()
        .set_index("doc_id")["rank_pico"]
    )
    assert rank["h.test/spam1.html"] > 0  # uniform PR pays the farm


@pytest.mark.usefixtures("ray_session")
def test_anchor_text_extraction_and_multiplicity():
    """Hand-built span sequences: anchors come from the '\">…</a>' head
    of the span FOLLOWING each link span; a page linking the same
    target twice with the same text counts twice; a link span followed
    by a non-matching span (stripped markup) yields the empty anchor
    rather than being dropped."""
    import ray.data as rd

    from suckit_ray.pipelines.graph import anchor_text_from_docs

    def doc(doc_id, spans):
        return {"doc_id": doc_id, "is_html": True, "spans": spans}

    def link(ref):
        return {"kind": "link", "text": "", "media_ref": ref, "offset": 0}

    def text(t):
        return {"kind": "text", "text": t, "media_ref": "", "offset": 0}

    tbl = pa.Table.from_pylist(
        [
            doc(
                "h.test/a.html",
                [
                    text('<a href="'),
                    link("b.html"),
                    text('">to B</a> <a href="'),
                    link("b.html"),
                    text('">to B</a></body>'),
                ],
            ),
            doc(
                "h.test/c.html",
                [
                    text('<a href="'),
                    link("b.html"),
                    text('">see b page</a>'),
                    link("d.html"),  # link span with no following text span
                ],
            ),
        ]
    )
    got = (
        anchor_text_from_docs(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values(["doc_id", "anchor"])
        .reset_index(drop=True)
    )
    rows = set(map(tuple, got[["doc_id", "anchor", "n_refs"]].to_numpy()))
    assert ("h.test/b.html", "to B", 2) in rows
    assert ("h.test/b.html", "see b page", 1) in rows
    assert ("h.test/d.html", "", 1) in rows
    assert len(rows) == 3


@pytest.mark.usefixtures("ray_session")
def test_lpa_matches_independent_reference_and_keeps_islands():
    """Exact equality against a literal pure-Python synchronous LPA
    (Counter mode + lexicographic tie) on a hand multigraph with a
    bridge, a vote tie, a parallel double edge, and an isolated node —
    pins the symmetrization, multiplicity voting, tie order, and the
    keep-own-label rule for message-less nodes."""
    from collections import Counter

    import ray.data as rd

    from suckit_ray.pipelines.graph import LPA_ROUNDS, lpa_communities_from_docs

    def page(doc_id, refs):
        return {
            "doc_id": doc_id,
            "is_html": True,
            "spans": [{"kind": "link", "text": "", "media_ref": r, "offset": 0}
                      for r in refs],
        }

    links = {
        "h.test/a1.html": ["a2.html", "a3.html", "a2.html"],  # parallel edge
        "h.test/a2.html": ["a3.html"],
        "h.test/a3.html": ["b1.html"],
        "h.test/b1.html": ["b2.html", "b3.html"],
        "h.test/b2.html": ["b3.html"],
        "h.test/b3.html": [],
        "h.test/tie.html": ["a1.html", "b1.html"],
        "h.test/island.html": [],
    }
    tbl = pa.Table.from_pylist([page(d, r) for d, r in links.items()])

    # independent reference: literal synchronous rounds
    nodes = list(links)
    sym = []
    for u, refs in links.items():
        for r in refs:
            v = "h.test/" + r
            sym += [(u, v), (v, u)]
    lab = {v: v for v in nodes}
    for _ in range(LPA_ROUNDS):
        inbox = {}
        for u, v in sym:
            inbox.setdefault(v, []).append(lab[u])
        lab = {
            v: (
                sorted(Counter(inbox[v]).items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
                if v in inbox
                else lab[v]
            )
            for v in nodes
        }

    got = (
        lpa_communities_from_docs(rd.from_arrow(tbl), num_buckets=2)
        .to_pandas()
        .set_index("doc_id")["community"]
        .to_dict()
    )
    assert got == lab
    assert got["h.test/island.html"] == "h.test/island.html"


@pytest.mark.usefixtures("ray_session")
def test_bowtie_engineered_all_classes():
    """Hand-built host exercising every Broder class (the flagship's
    synthetic hosts are fully strongly connected, so all-CORE there);
    second host checks per-host isolation."""
    import ray.data as rd

    from suckit_ray.pipelines.graph import bowtie_from_docs

    def page(host, j, targets):
        return {
            "doc_id": f"{host}//p{j}.html",
            "host": host,
            "is_html": True,
            "spans": [
                {
                    "kind": "link",
                    "text": "",
                    "media_ref": f"p{t}.html",
                    "offset": i,
                }
                for i, t in enumerate(targets)
            ],
        }

    # CORE {0,1}; IN {2,3}; OUT {4,5}; TUBE {6,7}; TENDRIL_IN {8};
    # TENDRIL_OUT {9}; DISC {10,11,12 (isolated)}
    h_edges = {
        0: [1],
        1: [0, 4],
        2: [0, 6, 8],
        3: [2],
        4: [5],
        5: [],
        6: [7],
        7: [4],
        8: [],
        9: [4],
        10: [11],
        11: [],
        12: [],
    }
    rows = [page("h", j, ts) for j, ts in h_edges.items()]
    # host g: pure 3-cycle — all CORE
    rows += [page("g", j, [(j + 1) % 3]) for j in range(3)]

    import pandas as pd

    got = (
        bowtie_from_docs(rd.from_items(rows).repartition(3))
        .to_pandas()
        .sort_values(["host", "cls"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        [
            ("g", "CORE", 3),
            ("h", "CORE", 2),
            ("h", "DISC", 3),
            ("h", "IN", 2),
            ("h", "OUT", 2),
            ("h", "TENDRIL_IN", 1),
            ("h", "TENDRIL_OUT", 1),
            ("h", "TUBE", 2),
        ],
        columns=["host", "cls", "n_nodes"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _truss_brute(pairs, k):
    """Brute sequential edge peel + within-truss supports."""
    from collections import defaultdict

    E = set(pairs)
    while True:
        adj = defaultdict(set)
        for a, b in E:
            adj[a].add(b)
            adj[b].add(a)
        drop = {(a, b) for a, b in E if len(adj[a] & adj[b]) < k - 2}
        if not drop:
            break
        E -= drop
    adj = defaultdict(set)
    for a, b in E:
        adj[a].add(b)
        adj[b].add(a)
    return sorted((a, b, len(adj[a] & adj[b])) for a, b in E)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("k", [3, 4])
def test_ktruss_matches_python_peel(k):
    """k=3 keeps the triangle-bearing subgraph (1 peel round on the
    synthetic web); k=4 peels nearly everything (multi-round
    cascade)."""
    from suckit_ray.pipelines.flagship import crawl_docs
    from suckit_ray.pipelines.graph import _link_edges, ktruss_from_docs

    got = (
        ktruss_from_docs(crawl_docs(SF), k=k)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    ed = _link_edges(crawl_docs(SF)).to_pandas()
    pairs = {
        (min(s, d), max(s, d))
        for s, d in zip(ed["src"], ed["dst"])
        if s != d
    }
    ref = _truss_brute(pairs, k)
    got_rows = sorted(
        zip(got["src"], got["dst"], got["support"].astype(int))
    )
    assert got_rows == ref
    if k == 3:
        assert 0 < len(ref) < len(pairs)  # non-trivial truss


@pytest.mark.usefixtures("ray_session")
def test_ktruss_strip_cascade_and_cap_raises():
    """A triangle strip's boundary edges sit in one triangle each, so
    the 4-truss peels from both ends inward — the data-dependent
    multi-round case; an insufficient max_rounds must RAISE."""
    import ray.data as rd

    from suckit_ray.pipelines.graph import ktruss_from_docs

    n = 10  # strip: vertices 0..9, triangle (i, i+1, i+2) per i
    adj = {i: [] for i in range(n)}
    for i in range(n - 1):
        adj[i].append(i + 1)
    for i in range(n - 2):
        adj[i].append(i + 2)
    rows = [
        {
            "doc_id": f"h.test/p{i}.html",
            "is_html": True,
            "spans": [
                {
                    "kind": "link",
                    "text": "",
                    "media_ref": f"p{t}.html",
                    "offset": o,
                }
                for o, t in enumerate(adj[i])
            ],
        }
        for i in range(n)
    ]
    docs = rd.from_items(rows).repartition(2)
    out = ktruss_from_docs(docs, k=4).to_pandas()
    # strip supports: every edge touches at most 2 triangles; the ends
    # peel first and the cascade empties the 4-truss entirely
    pairs = {
        (f"h.test/p{min(i, t)}.html", f"h.test/p{max(i, t)}.html")
        for i in adj
        for t in adj[i]
    }
    ref = _truss_brute(pairs, 4)
    # Ray drops the schema of a fully-empty Dataset in to_pandas()
    got_rows = (
        sorted(zip(out["src"], out["dst"], out["support"].astype(int)))
        if len(out)
        else []
    )
    assert got_rows == ref == []  # the cascade empties the 4-truss

    with pytest.raises(RuntimeError, match="did not converge"):
        ktruss_from_docs(
            rd.from_items(rows).repartition(2), k=4, max_rounds=1
        ).to_pandas()

    with pytest.raises(ValueError, match="k >= 3"):
        ktruss_from_docs(rd.from_items(rows), k=2)


@pytest.mark.usefixtures("ray_session")
def test_richclub_hand_graph():
    """4-clique + pendant: φ(0)=7000 (7 edges / 5 nodes), φ(1)=φ(2)=
    10000 (the clique is a perfect club once the pendant drops),
    k=3 row dropped (N_3 = 1 < 2)."""
    import ray.data as rd

    from suckit_ray.pipelines.graph import richclub_from_docs

    adj = {
        "a": ["b", "c", "d", "e"],
        "b": ["c", "d"],
        "c": ["d"],
    }
    rows = [
        {
            "doc_id": f"h.test/p{n}.html",
            "is_html": True,
            "spans": [
                {
                    "kind": "link",
                    "text": "",
                    "media_ref": f"p{t}.html",
                    "offset": o,
                }
                for o, t in enumerate(adj.get(n, []))
            ],
        }
        for n in ["a", "b", "c", "d", "e"]
    ]
    t = richclub_from_docs(rd.from_items(rows).repartition(2)).to_pandas()
    got = {
        int(r.k): (int(r.n_nodes), int(r.n_edges), int(r.phi_pct))
        for r in t.itertuples()
    }
    assert got == {
        0: (5, 7, 7000),
        1: (4, 6, 10000),
        2: (4, 6, 10000),
    }


@pytest.mark.usefixtures("ray_session")
def test_modularity_matches_python_brute():
    """Per-community (n_nodes, d_tot, e_in, term) vs a brute dict
    computation over the same simple edge list and the engine's own
    LPA labels — verifies the tagged-union aggregation pipeline end
    to end (incl. the two-column edge keys; a NUL-joined key silently
    merges edges sharing an endpoint — the CLAUDE.md hazard)."""
    from collections import defaultdict

    from suckit_ray.pipelines.flagship import crawl_docs
    from suckit_ray.pipelines.graph import (
        _link_edges,
        lpa_communities_from_docs,
        modularity_from_docs,
    )

    docs = crawl_docs(SF)
    got = modularity_from_docs(docs).to_pandas().set_index("community")

    ed = _link_edges(crawl_docs(SF)).to_pandas()
    pairs = {
        (min(s, d), max(s, d))
        for s, d in zip(ed["src"], ed["dst"])
        if s != d
    }
    lab = dict(
        zip(
            *(
                lambda df: (df["doc_id"], df["community"])
            )(lpa_communities_from_docs(crawl_docs(SF)).to_pandas())
        )
    )
    m = len(pairs)
    deg = defaultdict(int)
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    n_nodes, d_tot, e_in = (
        defaultdict(int), defaultdict(int), defaultdict(int),
    )
    for n, c in lab.items():
        n_nodes[c] += 1
        d_tot[c] += deg[n]
    for a, b in pairs:
        if lab[a] == lab[b]:
            e_in[lab[a]] += 1
    assert set(got.index) == set(n_nodes)
    for c in n_nodes:
        assert int(got.loc[c, "n_nodes"]) == n_nodes[c], c
        assert int(got.loc[c, "d_tot"]) == d_tot[c], c
        assert int(got.loc[c, "e_in"]) == e_in[c], c
        want = (10**6 * e_in[c]) // m - (
            10**6 * d_tot[c] * d_tot[c]
        ) // (4 * m * m)
        assert int(got.loc[c, "term_micro"]) == want, c
    # the synthetic web's LPA partition is denser than chance
    assert got["term_micro"].sum() > 0


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [3, 11, 42])
def test_ktruss_random_graphs_match_brute(seed):
    """Seeded random multigraphs (duplicate links, self-loops,
    isolated nodes) vs the brute sequential peel — the structural
    edge cases the synthetic web never exercises."""
    import ray.data as rd

    rng = np.random.RandomState(seed)
    n = 24
    adj = {i: [] for i in range(n)}
    for _ in range(70):
        a, b = int(rng.randint(n)), int(rng.randint(n))
        adj[a].append(b)  # may be a self-loop or a repeat
    rows = [
        {
            "doc_id": f"h.test/p{i:02d}.html",
            "is_html": True,
            "spans": [
                {
                    "kind": "link",
                    "text": "",
                    "media_ref": f"p{t:02d}.html",
                    "offset": o,
                }
                for o, t in enumerate(adj[i])
            ],
        }
        for i in range(n)
    ]
    docs = rd.from_items(rows).repartition(3)
    out = ktruss_from_docs_cached(docs)
    pairs = {
        (f"h.test/p{min(a, b):02d}.html", f"h.test/p{max(a, b):02d}.html")
        for a in adj
        for b in adj[a]
        if a != b
    }
    ref = _truss_brute(pairs, 3)
    got = (
        sorted(zip(out["src"], out["dst"], out["support"].astype(int)))
        if len(out)
        else []
    )
    assert got == ref


def ktruss_from_docs_cached(docs):
    from suckit_ray.pipelines.graph import ktruss_from_docs

    return ktruss_from_docs(docs, k=3).to_pandas()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [7, 19])
def test_richclub_random_graphs_match_brute(seed):
    import ray.data as rd
    from collections import defaultdict

    from suckit_ray.pipelines.graph import richclub_from_docs

    rng = np.random.RandomState(seed)
    n = 20
    adj = {i: [] for i in range(n)}
    for _ in range(50):
        a, b = int(rng.randint(n)), int(rng.randint(n))
        adj[a].append(b)
    rows = [
        {
            "doc_id": f"h.test/p{i:02d}.html",
            "is_html": True,
            "spans": [
                {
                    "kind": "link",
                    "text": "",
                    "media_ref": f"p{t:02d}.html",
                    "offset": o,
                }
                for o, t in enumerate(adj[i])
            ],
        }
        for i in range(n)
    ]
    t = richclub_from_docs(rd.from_items(rows).repartition(3)).to_pandas()
    pairs = {
        (min(a, b), max(a, b)) for a in adj for b in adj[a] if a != b
    }
    deg = defaultdict(int)
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    got = {
        int(r.k): (int(r.n_nodes), int(r.n_edges), int(r.phi_pct))
        for r in t.itertuples()
    }
    want = {}
    for k in range(max(deg.values())):
        nk = sum(1 for d in deg.values() if d > k)
        if nk < 2:
            continue
        ek = sum(1 for a, b in pairs if deg[a] > k and deg[b] > k)
        want[k] = (nk, ek, (10000 * 2 * ek) // (nk * (nk - 1)))
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_modularity_random_graph_matches_brute():
    import ray.data as rd
    from collections import defaultdict

    from suckit_ray.pipelines.graph import (
        lpa_communities_from_docs,
        modularity_from_docs,
    )

    rng = np.random.RandomState(5)
    n = 18
    adj = {i: [] for i in range(n)}
    for _ in range(44):
        a, b = int(rng.randint(n)), int(rng.randint(n))
        adj[a].append(b)
    rows = [
        {
            "doc_id": f"h.test/p{i:02d}.html",
            "is_html": True,
            "spans": [
                {
                    "kind": "link",
                    "text": "",
                    "media_ref": f"p{t:02d}.html",
                    "offset": o,
                }
                for o, t in enumerate(adj[i])
            ],
        }
        for i in range(n)
    ]
    docs = rd.from_items(rows).repartition(3)
    got = modularity_from_docs(docs).to_pandas().set_index("community")
    lab = dict(
        zip(
            *(lambda df: (df["doc_id"], df["community"]))(
                lpa_communities_from_docs(
                    rd.from_items(rows).repartition(3)
                ).to_pandas()
            )
        )
    )
    pairs = {
        (
            f"h.test/p{min(a, b):02d}.html",
            f"h.test/p{max(a, b):02d}.html",
        )
        for a in adj
        for b in adj[a]
        if a != b
    }
    m = len(pairs)
    deg = defaultdict(int)
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    nn, dt, ei = defaultdict(int), defaultdict(int), defaultdict(int)
    for node, c in lab.items():
        nn[c] += 1
        dt[c] += deg[node]
    for a, b in pairs:
        if lab[a] == lab[b]:
            ei[lab[a]] += 1
    assert set(got.index) == set(nn)
    for c in nn:
        assert int(got.loc[c, "n_nodes"]) == nn[c]
        assert int(got.loc[c, "d_tot"]) == dt[c]
        assert int(got.loc[c, "e_in"]) == ei[c]
        want = (10**6 * ei[c]) // m - (10**6 * dt[c] * dt[c]) // (4 * m * m)
        assert int(got.loc[c, "term_micro"]) == want
