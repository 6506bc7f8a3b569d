"""Link-graph analytics over the crawled mirror — the pipelines that
CONSUME the interleaved-span documents table as a web graph.

``crawl_pagerank`` rebuilds the absolute link graph from the rewritten
``link`` spans (media_ref is the relative path the rewriter emitted —
resolving it against the source doc's directory is the exact inverse
of ``urlkit.relative_rewrite``) and runs distributed power iteration:

- edges and ranks only ever exist as Dataset blocks, co-grouped by a
  node-hash bucket (same plan shape as ``dedup._cc_labels``: one
  bucketed co-group ships rank/outdeg contributions along edges, a
  second sums per target and applies the damping teleport);
- each iteration's ranks are materialized (O(pages) small rows), so
  iterations don't re-execute upstream lineage;
- a FIXED iteration count keeps the result deterministic for a given
  corpus; float sums depend on reduction order, so correctness is
  pinned by an allclose comparison against a single-machine numpy
  power iteration on the same table (rows-only in CORRECTNESS).

Scale shape: 10^10 pages → rank rows are ~16 B/node spread over the
cluster; the per-iteration shuffle carries one (dst, contrib) row per
edge — the same volume the crawl's candidate routing already moved.
"""

from __future__ import annotations

import posixpath

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

PAGERANK_DAMPING = 0.85
PAGERANK_ITERS = 10


def resolve_link(src_doc_id: str, media_ref: str) -> str:
    """Absolute doc path of a rewritten link — inverse of
    ``relative_rewrite`` (join against the source's parent dir, then
    normalize). Fragments stay part of the path the way ``to_path``
    with_fragment=True emits them; the mirror stores the
    fragment-free doc, so strip for graph identity."""
    target = posixpath.normpath(
        posixpath.join(posixpath.dirname(src_doc_id), media_ref)
    )
    return target.split("#", 1)[0]


def _link_edges(docs: rd.Dataset) -> rd.Dataset:
    """(src, dst) edges from the link spans of the HTML docs.
    normpath collapses the root-file double-slash quirk, so src is
    normalized the same way dst is."""

    def edges(t: pa.Table) -> pa.Table:
        srcs, dsts = [], []
        for doc_id, is_html, spans in zip(
            t.column("doc_id").to_pylist(),
            t.column("is_html").to_pylist(),
            t.column("spans").to_pylist(),
        ):
            if not is_html:
                continue
            src = posixpath.normpath(doc_id)
            for s in spans:
                if s["kind"] == "link":
                    srcs.append(src)
                    dsts.append(resolve_link(doc_id, s["media_ref"]))
        return pa.table(
            {"src": pa.array(srcs, pa.string()), "dst": pa.array(dsts, pa.string())}
        )

    return docs.map_batches(edges, batch_format="pyarrow")


def _und_simple(t: pa.Table) -> pa.Table:
    """Directed link edges → undirected SIMPLE pairs: self-loops
    dropped, (min, max)-canonicalized, batch-local dedup (exact dedup,
    where a consumer needs it, happens inside its keyed co-groups).
    Shared by kcore / ktruss / richclub / modularity — one place to
    fix canonicalization, not four (round-5 review)."""
    import numpy as np
    import pandas as pd

    src = t.column("src").to_numpy(zero_copy_only=False)
    dst = t.column("dst").to_numpy(zero_copy_only=False)
    keep = src != dst
    a = np.minimum(src[keep], dst[keep])
    b = np.maximum(src[keep], dst[keep])
    df = pd.DataFrame({"a": a, "b": b}).drop_duplicates()
    return pa.Table.from_pandas(df, preserve_index=False)


def _hash_bucket(col: "pd.Series", B: int) -> "pd.Series":
    """Deterministic node-hash bucket. Single-COLUMN hashing only —
    hash_pandas_object truncates strings at an embedded NUL, so
    composite keys must hash a multi-column frame, never a joined
    string (CLAUDE.md hazard)."""
    import pandas as pd

    h = pd.util.hash_pandas_object(col, index=False).astype("uint64")
    return (h % B).astype("int64")


def _edge_half_rows(df: "pd.DataFrame", B: int) -> "pd.DataFrame":
    """(node, peer, bucket) half-rows of an undirected pair frame —
    each edge visits both endpoint buckets."""
    import pandas as pd

    out = pd.DataFrame(
        {
            "node": pd.concat([df["a"], df["b"]], ignore_index=True),
            "peer": pd.concat([df["b"], df["a"]], ignore_index=True),
        }
    )
    out["bucket"] = _hash_bucket(out["node"], B)
    return out


HB_P = 8  # HyperBall register exponent: 2^8 regs, SE ≈ 6.5%
HB_M = 1 << HB_P


def _ball_init(node_ids: "pd.Series") -> np.ndarray:
    """(n, 256) uint8 register arrays, each an HLL of {node}: top-8
    hash bits pick the register, rho = leading-zero rank of the
    32-bit suffix (w < 2^32 keeps float64 log2 exact — the
    stages.sketch precondition at this p)."""
    from suckit_ray.stages.sketch import _splitmix64

    h = _splitmix64(
        pd.util.hash_pandas_object(node_ids, index=False).to_numpy()
    )
    idx = (h >> np.uint64(64 - HB_P)).astype(np.int64)
    w = (h & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    bits = np.zeros(len(w), dtype=np.int64)
    nz = w > 0
    bits[nz] = np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64) + 1
    rho = (32 - bits + 1).astype(np.uint8)
    regs = np.zeros((len(w), HB_M), dtype=np.uint8)
    regs[np.arange(len(w)), idx] = rho
    return regs


def _ball_est(regs: np.ndarray) -> np.ndarray:
    """Standard HLL estimate per row with linear-counting small-range
    correction, floored to int64."""
    m = HB_M
    alpha = 0.7213 / (1 + 1.079 / m)
    e = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum(axis=1)
    v = (regs == 0).sum(axis=1)
    small = (e <= 2.5 * m) & (v > 0)
    with np.errstate(divide="ignore"):
        e[small] = m * np.log(m / v[small])
    return np.floor(e).astype(np.int64)


def neighborhood_from_docs(
    docs: rd.Dataset, radius: int = 4, num_buckets: int | None = None
) -> rd.Dataset:
    """(node, ball_est): estimated number of crawled pages reachable
    from each page within ≤ ``radius`` hops — the neighborhood
    function N(v, r) via HyperBall (Boldi & Vigna 2013, public;
    HyperANF lineage): each node carries a 256-register HLL of its
    ball, and one round of elementwise-max propagation along edges
    grows the radius by one. THIS is the scale path the exact
    closure kernels (closeness / distance_stats / betweenness)
    document: per-round cost is O(edges) messages of 256 BYTES, no
    m×m matrix anywhere, duplicate edges are free (max is
    idempotent), and the estimate's SE is ≈ 1.04/√256 ≈ 6.5%.

    Plan: the `_pagerank_plan` round shape with reversed orientation
    (a node pulls its OUT-neighbors' registers, so the send co-group
    keys edges by dst) and blob-valued state: send = (regs ∪ adj)
    dst-bucket co-group emitting (src, reg[dst]) messages; reduce =
    node-bucket max-merge via one sort + np.maximum.reduceat; ONE
    materialize per round on the multi-consumer reg dataset. Ball
    membership is over CRAWLED nodes (un-crawled link targets have no
    registers), the components/pagerank convention. Rows-only
    correctness (HLL is not SQL-expressible); determinism and
    error-bound pins live in tests."""
    edges = _link_edges(docs).materialize()
    if num_buckets is None:
        from suckit_ray.stages.agg import default_buckets

        num_buckets = max(2, min(default_buckets(), edges.count() // 10_000 + 1))
    B = num_buckets

    def bucket_of(col: pd.Series) -> pd.Series:
        h = pd.util.hash_pandas_object(col, index=False).astype("uint64")
        return (h % B).astype("int64")

    adj = (
        edges.map_batches(
            lambda df: pd.DataFrame(
                {
                    "key": df["dst"],
                    "other": df["src"],
                    "blob": [b""] * len(df),
                    "is_reg": np.zeros(len(df), dtype="int64"),
                    "bucket": bucket_of(df["dst"]),
                }
            ),
            batch_format="pandas",
        )
        .repartition(B)
        .materialize()
    )

    def nodes_of(t: pa.Table) -> pd.DataFrame:
        keep = [
            posixpath.normpath(d)
            for d, h in zip(
                t.column("doc_id").to_pylist(), t.column("is_html").to_pylist()
            )
            if h
        ]
        return pd.DataFrame({"node": pd.array(keep, dtype="object")})

    def init_regs(df: pd.DataFrame) -> pd.DataFrame:
        regs = _ball_init(df["node"])
        return pd.DataFrame(
            {
                "node": df["node"],
                "blob": [r.tobytes() for r in regs],
            }
        )

    regs = (
        docs.map_batches(nodes_of, batch_format="pyarrow")
        .map_batches(init_regs, batch_format="pandas")
        .repartition(B)
        .materialize()
    )

    def as_reg_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": df["node"],
                "other": df["node"],
                "blob": df["blob"],
                "is_reg": np.ones(len(df), dtype="int64"),
                "bucket": bucket_of(df["node"]),
            }
        )

    def send(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["is_reg"] == 1][["key", "blob"]]
        e = g[g["is_reg"] == 0][["key", "other"]].merge(lab, on="key")
        # messages carry reg[dst] to src; reg rows pass through so
        # every node survives the reduce with its own registers
        return pd.concat(
            [
                pd.DataFrame({"node": e["other"], "blob": e["blob"]}),
                pd.DataFrame({"node": lab["key"], "blob": lab["blob"],
                              "own": np.ones(len(lab), dtype="int64")}),
            ],
            ignore_index=True,
        ).fillna({"own": 0})

    def reduce_max(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("node", kind="mergesort")
        # only keys with an own-register row are crawled nodes
        own_nodes = set(g.loc[g["own"] == 1, "node"])
        g = g[g["node"].isin(own_nodes)]
        if not len(g):
            return pd.DataFrame({"node": [], "blob": []})
        stack = np.frombuffer(
            b"".join(g["blob"].tolist()), dtype=np.uint8
        ).reshape(len(g), HB_M)
        nodes_arr = g["node"].to_numpy()
        starts = np.flatnonzero(
            np.r_[True, nodes_arr[1:] != nodes_arr[:-1]]
        )
        merged = np.maximum.reduceat(stack, starts, axis=0)
        return pd.DataFrame(
            {
                "node": nodes_arr[starts],
                "blob": [r.tobytes() for r in merged],
            }
        )

    for _ in range(radius):
        staged = regs.map_batches(as_reg_rows, batch_format="pandas").union(adj)
        msgs = staged.groupby("bucket").map_groups(send, batch_format="pandas")
        regs = (
            msgs.map_batches(
                lambda df: df.assign(bucket=bucket_of(df["node"])),
                batch_format="pandas",
            )
            .groupby("bucket")
            .map_groups(reduce_max, batch_format="pandas")
            .repartition(B)
            .materialize()
        )

    def estimate(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"node": [], "ball_est": []})
        stack = np.frombuffer(
            b"".join(df["blob"].tolist()), dtype=np.uint8
        ).reshape(len(df), HB_M)
        return pd.DataFrame(
            {"node": df["node"], "ball_est": _ball_est(stack)}
        )

    return regs.map_batches(estimate, batch_format="pandas")


def crawl_neighborhood_est(sf_dir: str) -> rd.Dataset:
    """queries() entry: HyperBall ≤4-hop neighborhood-size estimates
    for every crawled page. Rows-only (sketch); error-bound and
    determinism pins in tests/test_session12_ops.py."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return neighborhood_from_docs(crawl_docs(sf_dir))


PAGERANK_PICO = 1_000_000_000_000  # integer rank scale (10^-12 units)


def _pagerank_plan(
    docs: rd.Dataset,
    damping: float,
    iters: int,
    num_buckets: int | None,
    integer: bool,
    seed_nodes: "frozenset[str] | None" = None,
    driver_edge_limit: int | None = None,
) -> rd.Dataset:
    """The ONE power-iteration plan both PageRank variants run —
    (rank ∪ adjacency) co-group per round, O(pages) rank rows
    materialized between rounds. ``integer`` selects the arithmetic
    kernel only:

    - float: contrib = d·r(u)/deg(u), teleport (1−d)/n — fast,
      reduction-order-sensitive (rows-only correctness);
    - integer: rank in 10^-12 units, contrib
      (d₁₀₀·r(u))//(100·deg(u)) and teleport ((100−d₁₀₀)·S)//(100·n)
      with every division a floor on int64 — associative sums make
      the result BIT-IDENTICAL under any reduction order, which is
      what lets the unrolled-CTE SQL oracle hash-match a distributed
      run. Per-edge floors leak ≤ |edges| picounits of mass per
      round, mirrored exactly by the oracle.

    Returns (node, rank) with rank float64 or int64 by kernel.

    ``num_buckets`` defaults to ~1 bucket per 10k edges (capped at the
    cluster-scaled default): an iterative pipeline pays per-BLOCK fixed
    costs EVERY round, so over-bucketing a small graph multiplies task
    overhead ×iters (measured 10× wall on the sf0.001 graph at B=64 vs
    B=4); a 10^8-edge graph gets the full cluster fan-out. Duplicate
    links and self-links carry multiplicity (the ``_link_edges``
    convention); links out of the crawled set and dangling mass fall
    to the teleport term, same as ``reference_pagerank``.

    ``seed_nodes`` switches to PERSONALIZED teleportation (TrustRank,
    Gyöngyi/Garcia-Molina/Pedersen VLDB'04, public): initial mass and
    the per-round teleport term go ONLY to the seed set (divided by
    |seeds|), so rank measures proximity to trusted pages and leaked
    mass (out-of-set links, per-edge floors) vanishes instead of
    recirculating. The seed set is a trusted WHITELIST — small by
    construction — so it broadcasts via ``ray.put`` and membership is
    a vectorized ``isin`` in the reduce; every seed must be a crawled
    node (the flagship's seeds always are). ``seed_nodes=None`` is the
    uniform-teleport path, arithmetic untouched."""
    edges = _link_edges(docs).materialize()
    if num_buckets is None:
        from suckit_ray.stages.agg import default_buckets

        num_buckets = max(2, min(default_buckets(), edges.count() // 10_000 + 1))
    B = num_buckets
    d100 = round(damping * 100)

    def bucket_of(col: pd.Series) -> pd.Series:
        # vectorized (this runs per rank/message row EVERY iteration —
        # a per-row Python hash here multiplies interpreter time ×iters)
        h = pd.util.hash_pandas_object(col, index=False).astype("uint64")
        return (h % B).astype("int64")

    # out-degree rides on each edge so the contribution is computable
    # batch-locally once ranks are co-grouped in
    def add_deg(g: pd.DataFrame) -> pd.DataFrame:
        deg = g.groupby("src")["dst"].transform("size").astype("int64")
        return pd.DataFrame({"src": g["src"], "dst": g["dst"], "deg": deg})

    adj = (
        edges.map_batches(
            lambda df: df.assign(bucket=bucket_of(df["src"])), batch_format="pandas"
        )
        .groupby("bucket")
        .map_groups(add_deg, batch_format="pandas")
        .map_batches(
            lambda df: df.assign(bucket=bucket_of(df["src"])), batch_format="pandas"
        )
        .repartition(B)  # bounded block count: adj is unioned in EVERY round
        .materialize()
    )

    def nodes_of(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = t.filter(pc.field("is_html"))
        return pa.table(
            {
                "node": pa.array(
                    [posixpath.normpath(d) for d in keep.column("doc_id").to_pylist()],
                    pa.string(),
                )
            }
        )

    nodes = docs.map_batches(nodes_of, batch_format="pyarrow").materialize()
    n_nodes = nodes.count()
    rank_dtype = "int64" if integer else "float64"
    if n_nodes == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.string()),
                    "rank": pa.array(
                        [], pa.int64() if integer else pa.float64()
                    ),
                }
            )
        )
    import ray

    n_base = len(seed_nodes) if seed_nodes is not None else n_nodes
    if integer:
        init = PAGERANK_PICO // n_base
        teleport = ((100 - d100) * PAGERANK_PICO) // (100 * n_base)
    else:
        init = 1.0 / n_base
        teleport = (1.0 - damping) / n_base
    if driver_edge_limit is None:
        from suckit_ray.pipelines.dedup import CC_DRIVER_PAIR_LIMIT

        driver_edge_limit = CC_DRIVER_PAIR_LIMIT
    if (
        integer
        and edges.count() <= driver_edge_limit
        and n_nodes <= driver_edge_limit
    ):
        # small-graph cutover (the CC_DRIVER_PAIR_LIMIT idiom),
        # INTEGER kernels only: the quantized iteration is
        # reduction-order-free, so numpy matvecs on the driver are
        # bit-identical to the distributed co-groups
        # (equality-pinned). The float kernel stays distributed —
        # its sums are order-sensitive, so collapsing them would
        # CHANGE the result. Above the limit the message-passing
        # rounds below run unchanged (the 10^10-page path).
        ep = edges.to_pandas()
        nd = nodes.to_pandas()["node"].to_numpy()
        idxmap = {x: i for i, x in enumerate(nd)}
        n = len(nd)
        src = ep["src"].map(idxmap)
        dst = ep["dst"].map(idxmap)
        sm = src.notna()  # src is a crawled page by construction
        si_all = src[sm].to_numpy().astype(np.int64)
        deg = np.zeros(n, dtype=np.int64)
        np.add.at(deg, si_all, 1)  # out-multiplicity incl. ext links
        ok = sm & dst.notna()
        si = src[ok].to_numpy().astype(np.int64)
        di = dst[ok].to_numpy().astype(np.int64)
        if seed_nodes is not None:
            seed_mask = np.isin(nd, list(seed_nodes))
            rank = np.where(seed_mask, init, 0).astype(np.int64)
            tele_vec = np.where(seed_mask, teleport, 0).astype(np.int64)
        else:
            rank = np.full(n, init, dtype=np.int64)
            tele_vec = np.full(n, teleport, dtype=np.int64)
        for _ in range(iters):
            contrib = (d100 * rank[si]) // (100 * deg[si])
            c = np.zeros(n, dtype=np.int64)
            np.add.at(c, di, contrib)
            rank = tele_vec + c
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(nd.tolist(), pa.string()),
                    "rank": pa.array(rank, pa.int64()),
                }
            )
        )

    seeds_ref = ray.put(frozenset(seed_nodes)) if seed_nodes is not None else None

    def init_ranks(df: pd.DataFrame) -> pd.DataFrame:
        r = np.full(len(df), init, dtype=rank_dtype)
        if seeds_ref is not None:
            r = np.where(df["node"].isin(ray.get(seeds_ref)), r, 0).astype(rank_dtype)
        return pd.DataFrame({"node": df["node"], "rank": r})

    ranks = nodes.map_batches(init_ranks, batch_format="pandas").repartition(
        B
    ).materialize()

    def as_rank_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": df["node"],
                "dst": "",  # self marker
                "deg": np.full(len(df), -1, dtype="int64"),
                "rank": df["rank"].astype(rank_dtype),
                "bucket": bucket_of(df["node"]),
            }
        )

    def as_adj_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": df["src"],
                "dst": df["dst"],
                "deg": df["deg"].astype("int64"),
                "rank": np.zeros(len(df), dtype=rank_dtype),
                "bucket": df["bucket"].astype("int64"),
            }
        )

    def send(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["deg"] < 0][["src", "rank"]]
        a = g[g["deg"] >= 0][["src", "dst", "deg"]].merge(lab, on="src")
        if integer:
            # per-edge floor — the quantization both engines share
            contrib = (
                (d100 * a["rank"].to_numpy()) // (100 * a["deg"].to_numpy())
            ).astype("int64")
        else:
            contrib = (a["rank"] / a["deg"]).astype("float64").to_numpy()
        msgs = pd.DataFrame(
            {
                "node": a["dst"],
                "contrib": contrib,
                "is_node": np.zeros(len(a), dtype="int64"),
            }
        )
        # every node passes through with zero contribution so nodes
        # with no in-links still appear in the reduce; is_node marks
        # MEMBERSHIP in the crawled set
        selfs = pd.DataFrame(
            {
                "node": lab["src"],
                "contrib": np.zeros(len(lab), dtype=rank_dtype),
                "is_node": np.ones(len(lab), dtype="int64"),
            }
        )
        return pd.concat([msgs, selfs], ignore_index=True)

    def reduce_sum(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("node", as_index=False).agg(
            contrib=("contrib", "sum"), is_node=("is_node", "max")
        )
        # drop contributions addressed to targets OUTSIDE the crawled
        # node set (depth-/wave-capped crawls emit such links): their
        # mass falls to the teleport term, matching reference_pagerank —
        # without this filter a phantom rank row is invented for every
        # un-crawled link target and persists via its own self row
        s = s[s["is_node"] == 1]
        if seeds_ref is not None:
            tele = np.where(
                s["node"].isin(ray.get(seeds_ref)), teleport, 0
            ).astype(rank_dtype)
        else:
            tele = teleport
        if integer:
            rank = (tele + s["contrib"]).astype("int64")
        else:
            rank = (tele + damping * s["contrib"]).astype("float64")
        return pd.DataFrame({"node": s["node"], "rank": rank})

    adj_rows = adj.map_batches(as_adj_rows, batch_format="pandas")
    for _ in range(iters):
        staged = ranks.map_batches(as_rank_rows, batch_format="pandas").union(adj_rows)
        msgs = staged.groupby("bucket").map_groups(send, batch_format="pandas")
        # repartition before materializing: the sort-groupby emits
        # blocks proportional to its INPUT blocks, so without coalescing
        # each iteration's block count grows by the adjacency's and the
        # per-iteration cost turns quadratic (measured 2.2 → 4.7 s by
        # iteration 3 at sf0.001; flat ~1 s with the coalesce)
        ranks = (
            msgs.map_batches(
                lambda df: df.assign(bucket=bucket_of(df["node"])),
                batch_format="pandas",
            )
            .groupby("bucket")
            .map_groups(reduce_sum, batch_format="pandas")
            .repartition(B)
            .materialize()
        )
    return ranks


def pagerank_from_docs(
    docs: rd.Dataset,
    damping: float = PAGERANK_DAMPING,
    iters: int = PAGERANK_ITERS,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Float power iteration over the doc link graph — (doc_id, rank)
    over every HTML doc. Rows-only correctness (float sums are
    reduction-order-sensitive); see ``_pagerank_plan``."""
    ranks = _pagerank_plan(docs, damping, iters, num_buckets, integer=False)
    return ranks.map_batches(
        lambda df: pd.DataFrame({"doc_id": df["node"], "rank": df["rank"]}),
        batch_format="pandas",
    )


def pagerank_exact_from_docs(
    docs: rd.Dataset, iters: int = PAGERANK_ITERS,
    num_buckets: int | None = None,
    driver_edge_limit: int | None = None,
) -> rd.Dataset:
    """ALL-INTEGER power iteration — the hash-oracle-able PageRank,
    (doc_id, rank_pico) in 10^-12 units. Bit-identical under any
    reduction order, so the 10-step unrolled CTE oracle hash-matches
    a distributed run; see ``_pagerank_plan``."""
    ranks = _pagerank_plan(
        docs, PAGERANK_DAMPING, iters, num_buckets, integer=True,
        driver_edge_limit=driver_edge_limit,
    )
    return ranks.map_batches(
        lambda df: pd.DataFrame(
            {"doc_id": df["node"], "rank_pico": df["rank"].astype("int64")}
        ),
        batch_format="pandas",
    )


def trustrank_exact_from_docs(
    docs: rd.Dataset,
    seed_nodes: "frozenset[str]",
    iters: int = PAGERANK_ITERS,
    num_buckets: int | None = None,
    driver_edge_limit: int | None = None,
) -> rd.Dataset:
    """ALL-INTEGER TrustRank: ``pagerank_exact_from_docs`` with the
    teleport vector personalized to a trusted seed whitelist —
    (doc_id, trust_pico) in 10^-12 units, bit-identical under any
    reduction order (hash-oracle-able like the uniform variant). Pages
    unreachable from any seed score exactly 0; spam farms far from
    seeds score low regardless of their internal link mass — the
    link-spam demotion the algorithm exists for."""
    ranks = _pagerank_plan(
        docs, PAGERANK_DAMPING, iters, num_buckets, integer=True,
        seed_nodes=frozenset(seed_nodes),
        driver_edge_limit=driver_edge_limit,
    )
    return ranks.map_batches(
        lambda df: pd.DataFrame(
            {"doc_id": df["node"], "trust_pico": df["rank"].astype("int64")}
        ),
        batch_format="pandas",
    )


def reference_trustrank(
    docs_tbl: pa.Table,
    seed_nodes: "frozenset[str]",
    damping=PAGERANK_DAMPING,
    iters=PAGERANK_ITERS,
) -> dict:
    """Single-machine float TrustRank on the same docs table — the
    accuracy reference for tests (allclose, not hash)."""
    pages = []
    links: dict[str, list[str]] = {}
    for doc_id, is_html, spans in zip(
        docs_tbl.column("doc_id").to_pylist(),
        docs_tbl.column("is_html").to_pylist(),
        docs_tbl.column("spans").to_pylist(),
    ):
        if not is_html:
            continue
        src = posixpath.normpath(doc_id)
        pages.append(src)
        links[src] = [
            resolve_link(doc_id, s["media_ref"]) for s in spans if s["kind"] == "link"
        ]
    idx = {p: i for i, p in enumerate(sorted(pages))}
    n = len(idx)
    ns = len(seed_nodes)
    tele = np.zeros(n)
    r = np.zeros(n)
    for s in seed_nodes:
        tele[idx[s]] = (1.0 - damping) / ns
        r[idx[s]] = 1.0 / ns
    for _ in range(iters):
        nxt = tele.copy()
        for src, dsts in links.items():
            share = damping * r[idx[src]] / len(dsts)
            for d in dsts:
                if d in idx:
                    nxt[idx[d]] += share
        r = nxt
    return {p: r[i] for p, i in idx.items()}


def reference_pagerank(docs_tbl: pa.Table, damping=PAGERANK_DAMPING, iters=PAGERANK_ITERS) -> dict:
    """Single-machine numpy power iteration on the same docs table —
    the accuracy reference for tests (float reduction order differs,
    so equality is allclose, not hash)."""
    pages = []
    links: dict[str, list[str]] = {}
    for doc_id, is_html, spans in zip(
        docs_tbl.column("doc_id").to_pylist(),
        docs_tbl.column("is_html").to_pylist(),
        docs_tbl.column("spans").to_pylist(),
    ):
        if not is_html:
            continue
        src = posixpath.normpath(doc_id)
        pages.append(src)
        links[src] = [
            resolve_link(doc_id, s["media_ref"]) for s in spans if s["kind"] == "link"
        ]
    idx = {p: i for i, p in enumerate(sorted(pages))}
    n = len(idx)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - damping) / n)
        for src, dsts in links.items():
            share = damping * r[idx[src]] / len(dsts)
            for d in dsts:
                if d in idx:
                    nxt[idx[d]] += share
        r = nxt
    return {p: r[i] for p, i in idx.items()}


def crawl_pagerank(sf_dir: str):
    """queries() entry: PageRank of the flagship crawl's mirror.
    Returns (doc_id, rank_e9) with rank scaled to integer nano-units
    via rounding — stable across reduction orders at the corpus sizes
    the driver checks (verified by the allclose test; rows-only in
    CORRECTNESS because float sums are not bit-reproducible in SQL)."""
    from suckit_ray.pipelines.flagship import crawl_docs

    docs = crawl_docs(sf_dir)
    ranks = pagerank_from_docs(docs)

    def scale(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "rank_e9": (df["rank"] * 1e9).round().astype("int64"),
            }
        )

    return ranks.map_batches(scale, batch_format="pandas")


def triangles_from_docs(docs: rd.Dataset) -> rd.Dataset:
    """(host, n_triangles): exact triangle count of each host's
    undirected page-link graph — compact-forward (node-iterator over
    oriented edges): every triangle u<v<w is found exactly once, as
    the wedge (v, w) centered at its SMALLEST vertex u matched
    against the edge set.

    Scale shape, three bounded exchanges and no driver state:
    (1) hash-dedup the oriented edge set (links arrive from both
    endpoints' pages); (2) group by (host, u) and emit each
    neighbor pair of u's forward-adjacency as a wedge row — O(deg⁺²)
    per vertex, the known skew bound of every triangle algorithm
    (orientation by vertex id caps deg⁺ at the synthetic corpus's
    constant fanout; at web scale orient by DEGREE first, which
    provably bounds deg⁺ at O(√edges)); (3) a tagged-union co-group
    on the wedge/edge key counts matches. Per-host sums are the only
    driver-visible result."""
    import re

    from suckit_ray.stages.agg import bucketed_groupby_agg, default_buckets

    B = default_buckets()
    # normpath collapses the root-file double slash: host.test/pJ.html
    page_re = re.compile(r"/p(\d+)\.html$")

    def edge_rows(t: pa.Table) -> pa.Table:
        hosts, a_, b_ = [], [], []
        for doc_id, host, is_html, spans in zip(
            t.column("doc_id").to_pylist(),
            t.column("host").to_pylist(),
            t.column("is_html").to_pylist(),
            t.column("spans").to_pylist(),
        ):
            if not is_html:
                continue
            m = page_re.search(posixpath.normpath(doc_id))
            if not m:
                continue
            j = int(m.group(1))
            for s in spans:
                if s["kind"] != "link":
                    continue
                tgt = resolve_link(doc_id, s["media_ref"])
                mt = page_re.search(tgt)
                if not mt:
                    continue
                # cross-host links (corpora with ext_links) are NOT
                # intra-host edges — the page number alone would
                # fabricate one on the wrong host
                if tgt.split("/", 1)[0] != host:
                    continue
                k = int(mt.group(1))
                if k == j:
                    continue
                hosts.append(host)
                a_.append(min(j, k))
                b_.append(max(j, k))
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "a": pa.array(a_, pa.int64()),
                "b": pa.array(b_, pa.int64()),
            }
        )

    def batch_dedup(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates(["host", "a", "b"]).copy()
        out["eb"] = (
            out["a"].astype("int64") * 1_000_003 + out["b"]
        ) % B
        return out

    def bucket_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["host", "a", "b"])[["host", "a", "b"]]

    edges = (
        docs.map_batches(edge_rows, batch_format="pyarrow")
        .map_batches(batch_dedup, batch_format="pandas")
        .groupby("eb")
        .map_groups(bucket_dedup, batch_format="pandas")
        .materialize()  # feeds both the wedge build and the probe side
    )

    def to_wedge_groups(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["ub"] = (out["a"].astype("int64") % B).astype("int64")
        return out

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        """All forward-neighbor pairs per (host, u): wedge rows tagged
        side=1 keyed by the candidate closing edge (v1, v2). One
        vectorized self-merge per bucket — no Python loop over
        vertices (the deg⁺² output volume is inherent; the loop over
        it need not be)."""
        lhs = g[["host", "a", "b"]]
        m = lhs.merge(lhs, on=["host", "a"], suffixes=("_x", "_y"))
        m = m[m["b_x"] < m["b_y"]]
        return pd.DataFrame(
            {
                "host": m["host"],
                "a": m["b_x"].astype("int64"),
                "b": m["b_y"].astype("int64"),
                "side": pd.Series(1, index=m.index, dtype="int64"),
            }
        )

    wedge_rows = (
        edges.map_batches(to_wedge_groups, batch_format="pandas")
        .groupby("ub")
        .map_groups(wedges, batch_format="pandas")
    )

    def edge_side(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["host", "a", "b"]].copy()
        out["side"] = pd.Series(0, index=out.index, dtype="int64")
        return out

    def key_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["kb"] = (
            (out["a"].astype("int64") * 1_000_003 + out["b"]) % B
        ).astype("int64")
        return out

    def close_count(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["side"] == 0]
        w = g[g["side"] == 1]
        if len(w) == 0 or len(e) == 0:
            return pd.DataFrame(
                {
                    "host": pd.array([], dtype="str"),
                    "n": pd.array([], dtype="int64"),
                }
            )
        closed = w.merge(e[["host", "a", "b"]], on=["host", "a", "b"])
        if len(closed) == 0:
            return pd.DataFrame(
                {
                    "host": pd.array([], dtype="str"),
                    "n": pd.array([], dtype="int64"),
                }
            )
        out = closed.groupby("host", as_index=False).size()
        return pd.DataFrame(
            {"host": out["host"], "n": out["size"].astype("int64")}
        )

    counted = (
        wedge_rows.union(edges.map_batches(edge_side, batch_format="pandas"))
        .map_batches(key_bucket, batch_format="pandas")
        .groupby("kb")
        .map_groups(close_count, batch_format="pandas")
    )
    return bucketed_groupby_agg(
        counted, keys=["host"], aggs={"n_triangles": ("n", "sum")}
    )


def crawl_triangles(sf_dir: str) -> rd.Dataset:
    """queries() entry: per-host triangle counts of the flagship
    crawl's link graph (hosts with ≥1 triangle)."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return triangles_from_docs(crawl_docs(sf_dir))


def lcc_from_docs(docs: rd.Dataset) -> rd.Dataset:
    """(host, page, deg, tri, lcc_micro): per-PAGE local clustering
    coefficient of each host's undirected link graph — Watts &
    Strogatz 1998 (public), lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1))
    for deg(v) ≥ 2, floored to integer micro units so both engines
    agree bit-for-bit.

    Node-level sibling of ``triangles_from_docs``: the wedge build
    here keeps the CENTER vertex on every wedge row, because a closed
    wedge (v; a, b) credits the triangle to v (each triangle is
    counted once per corner — exactly the per-vertex incidence lcc
    needs, unlike compact-forward's once-per-triangle orientation).
    Wedge volume is O(deg²) per vertex — the inherent lcc bound (its
    numerator IS the number of adjacent neighbor pairs); at web scale
    cap or sample pathological-fanout hubs the way the triangle plan
    orients by degree.

    Scale shape, four bounded exchanges and no driver state:
    (1) orient + hash-dedup the undirected edge set; (2) per-vertex
    wedge emission from a center-bucketed co-group over the full
    adjacency; (3) a tagged-union co-group on the closing-edge key
    counts matches per center; (4) degrees and triangle counts meet
    in one vertex-bucketed co-group that computes the floored ratio
    group-locally. Rows are 4 small int/string columns throughout —
    page text never moves."""
    from suckit_ray.stages.agg import default_buckets

    B = default_buckets()

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "host": df["host"],
                "a": np.minimum(df["s"], df["t"]).astype("int64"),
                "b": np.maximum(df["s"], df["t"]).astype("int64"),
            }
        ).drop_duplicates(["host", "a", "b"])
        out["eb"] = ((out["a"] * 1_000_003 + out["b"]) % B).astype("int64")
        return out

    def bucket_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["host", "a", "b"])[["host", "a", "b"]]

    edges = (
        _host_page_edges(docs)
        .map_batches(orient, batch_format="pandas")
        .groupby("eb")
        .map_groups(bucket_dedup, batch_format="pandas")
        .materialize()  # feeds degrees, wedge build, and the probe side
    )

    def undirect(df: pd.DataFrame) -> pd.DataFrame:
        fwd = pd.DataFrame(
            {"host": df["host"], "v": df["a"], "w": df["b"]}
        )
        rev = pd.DataFrame(
            {"host": df["host"], "v": df["b"], "w": df["a"]}
        )
        out = pd.concat([fwd, rev], ignore_index=True)
        out["vb"] = (out["v"].astype("int64") % B).astype("int64")
        return out

    und = edges.map_batches(undirect, batch_format="pandas")

    def centered_wedges(g: pd.DataFrame) -> pd.DataFrame:
        lhs = g[["host", "v", "w"]]
        m = lhs.merge(lhs, on=["host", "v"], suffixes=("_x", "_y"))
        m = m[m["w_x"] < m["w_y"]]
        return pd.DataFrame(
            {
                "host": m["host"],
                "a": m["w_x"].astype("int64"),
                "b": m["w_y"].astype("int64"),
                "center": m["v"].astype("int64"),
                "side": pd.Series(1, index=m.index, dtype="int64"),
            }
        )

    wedge_rows = und.groupby("vb").map_groups(
        centered_wedges, batch_format="pandas"
    )

    def edge_side(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["host", "a", "b"]].copy()
        out["center"] = np.int64(-1)
        out["side"] = pd.Series(0, index=out.index, dtype="int64")
        return out

    def key_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["kb"] = (
            (out["a"].astype("int64") * 1_000_003 + out["b"]) % B
        ).astype("int64")
        return out

    def close_per_center(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["side"] == 0]
        w = g[g["side"] == 1]
        if len(w) == 0 or len(e) == 0:
            return pd.DataFrame(
                {
                    "host": pd.array([], dtype="str"),
                    "v": pd.array([], dtype="int64"),
                    "n": pd.array([], dtype="int64"),
                }
            )
        closed = w.merge(e[["host", "a", "b"]], on=["host", "a", "b"])
        if len(closed) == 0:
            return pd.DataFrame(
                {
                    "host": pd.array([], dtype="str"),
                    "v": pd.array([], dtype="int64"),
                    "n": pd.array([], dtype="int64"),
                }
            )
        out = closed.groupby(["host", "center"], as_index=False).size()
        return pd.DataFrame(
            {
                "host": out["host"],
                "v": out["center"].astype("int64"),
                "n": out["size"].astype("int64"),
            }
        )

    tri = (
        wedge_rows.union(edges.map_batches(edge_side, batch_format="pandas"))
        .map_batches(key_bucket, batch_format="pandas")
        .groupby("kb")
        .map_groups(close_per_center, batch_format="pandas")
    )

    # degrees and triangle counts meet per vertex: tag, bucket, fold
    def deg_side(df: pd.DataFrame) -> pd.DataFrame:
        und_ = pd.concat(
            [
                pd.DataFrame({"host": df["host"], "v": df["a"]}),
                pd.DataFrame({"host": df["host"], "v": df["b"]}),
            ],
            ignore_index=True,
        )
        out = und_.groupby(["host", "v"], as_index=False).size()
        return pd.DataFrame(
            {
                "host": out["host"],
                "v": out["v"].astype("int64"),
                "n": out["size"].astype("int64"),
                "side": pd.Series(0, index=out.index, dtype="int64"),
            }
        )

    def tri_side(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["side"] = pd.Series(1, index=out.index, dtype="int64")
        return out[["host", "v", "n", "side"]]

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        deg = (
            g[g["side"] == 0]
            .groupby(["host", "v"], as_index=False)["n"]
            .sum()
            .rename(columns={"n": "deg"})
        )
        tr = (
            g[g["side"] == 1]
            .groupby(["host", "v"], as_index=False)["n"]
            .sum()
            .rename(columns={"n": "tri"})
        )
        m = deg.merge(tr, on=["host", "v"], how="left")
        m["tri"] = m["tri"].fillna(0).astype("int64")
        m = m[m["deg"] >= 2]
        if len(m) == 0:
            return pd.DataFrame(
                {
                    "host": pd.array([], dtype="str"),
                    "page": pd.array([], dtype="int64"),
                    "deg": pd.array([], dtype="int64"),
                    "tri": pd.array([], dtype="int64"),
                    "lcc_micro": pd.array([], dtype="int64"),
                }
            )
        deg_ = m["deg"].astype("int64")
        return pd.DataFrame(
            {
                "host": m["host"],
                "page": m["v"].astype("int64"),
                "deg": deg_,
                "tri": m["tri"],
                "lcc_micro": (2_000_000 * m["tri"]) // (deg_ * (deg_ - 1)),
            }
        )

    def v_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["fb"] = (out["v"].astype("int64") % B).astype("int64")
        return out

    return (
        edges.map_batches(deg_side, batch_format="pandas")
        .union(tri.map_batches(tri_side, batch_format="pandas"))
        .map_batches(v_bucket, batch_format="pandas")
        .groupby("fb")
        .map_groups(fold, batch_format="pandas")
    )


def crawl_clustering_coeff(sf_dir: str) -> rd.Dataset:
    """queries() entry: per-page local clustering coefficients of the
    flagship crawl's link graph (pages with degree ≥ 2)."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return lcc_from_docs(crawl_docs(sf_dir))


def crawl_pagerank_exact(sf_dir: str):
    """queries() entry: the all-integer PageRank of the flagship
    mirror — (doc_id, rank_pico), hash-compared against a 10-step
    unrolled CTE oracle over the same reachability closure."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return pagerank_exact_from_docs(crawl_docs(sf_dir))


def crawl_seed_paths(sf_dir: str) -> frozenset:
    """Normalized doc paths of the flagship crawl's seed URLs — the
    natural trusted set for TrustRank (page 0 of every host)."""
    from suckit_ray.pipelines.flagship import corpus_for
    from suckit_ray.urlkit import parse_url, to_path

    corpus = corpus_for(sf_dir)
    return frozenset(
        posixpath.normpath(to_path(parse_url(u), False)) for u in corpus.seeds()
    )


def crawl_trustrank(sf_dir: str):
    """queries() entry: all-integer TrustRank of the flagship mirror
    seeded at the crawl seeds — (doc_id, trust_pico), hash-compared
    against the personalized-teleport unrolled CTE oracle."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return trustrank_exact_from_docs(crawl_docs(sf_dir), crawl_seed_paths(sf_dir))


HITS_SCALE = 1_000_000_000  # integer hub/authority scale (10^-9 units)
HITS_ITERS = 5


def hits_from_docs(
    docs: rd.Dataset, iters: int = HITS_ITERS,
    num_buckets: int | None = None,
    driver_edge_limit: int | None = None,
) -> rd.Dataset:
    """(doc_id, hub_nano, auth_nano): Kleinberg's HITS in all-integer
    arithmetic — the second hash-oracle-able iterative graph op. Each
    round is two sparse matvecs with a SCALAR renormalization:

        a'(v) = Σ_{u→v} h(u);  d = max(Σ a' // S, 1);  a ← a' // d
        h'(u) = Σ_{u→v} a(v);  d = max(Σ h' // S, 1);  h ← h' // d

    Integer sums are associative and the divisor is one global
    scalar, so the result is bit-identical under any reduction order
    — the property the unrolled-CTE oracle needs. S = 10^9 keeps
    Σ-over-in-edges ≤ max_degree·S safely inside int64 even at
    hub-heavy web degree distributions (10^8 in-links × 10^9 < 2^63).

    Scale shape per half-round: one co-group ships scores along
    edges (adjacency bucketed by the EMITTING side — src for the
    authority half, dst for the hub half), one O(blocks) partial-sum
    reduce produces the scalar divisor. Score rows are O(pages) and
    materialize between rounds exactly like ``_pagerank_plan``'s."""
    edges = _link_edges(docs).materialize()
    if num_buckets is None:
        from suckit_ray.stages.agg import default_buckets

        num_buckets = max(2, min(default_buckets(), edges.count() // 10_000 + 1))
    B = num_buckets
    S = HITS_SCALE

    def bucket_of(col: pd.Series) -> pd.Series:
        h = pd.util.hash_pandas_object(col, index=False).astype("uint64")
        return (h % B).astype("int64")

    def nodes_of(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = t.filter(pc.field("is_html"))
        return pa.table(
            {
                "node": pa.array(
                    [
                        posixpath.normpath(d)
                        for d in keep.column("doc_id").to_pylist()
                    ],
                    pa.string(),
                )
            }
        )

    nodes = docs.map_batches(nodes_of, batch_format="pyarrow").materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.string()),
                    "hub_nano": pa.array([], pa.int64()),
                    "auth_nano": pa.array([], pa.int64()),
                }
            )
        )
    init = S // n_nodes

    if driver_edge_limit is None:
        from suckit_ray.pipelines.dedup import CC_DRIVER_PAIR_LIMIT

        driver_edge_limit = CC_DRIVER_PAIR_LIMIT
    if edges.count() <= driver_edge_limit and n_nodes <= driver_edge_limit:
        # small-graph cutover (the CC_DRIVER_PAIR_LIMIT idiom): the
        # whole iteration is a function of the BOUNDED edge set, so
        # below the limit the ~4 shuffles × 2·iters half-rounds
        # collapse into numpy matvecs on the driver — bit-identical
        # (integer sums are order-free and the divisor is one global
        # scalar; equality-pinned against the distributed route).
        # Above the limit the message-passing plan below runs
        # unchanged — that IS the 10^10-page path.
        ep = edges.to_pandas()
        nd = nodes.to_pandas()["node"].to_numpy()
        idxmap = {n: i for i, n in enumerate(nd)}
        src = ep["src"].map(idxmap)
        dst = ep["dst"].map(idxmap)
        ok = src.notna() & dst.notna()  # member-member edges only
        si = src[ok].to_numpy().astype(np.int64)
        di = dst[ok].to_numpy().astype(np.int64)
        n = len(nd)
        hub = np.full(n, init, dtype=np.int64)
        hd_ = 1
        auth, ad_ = np.full(n, init, dtype=np.int64), 1
        for _ in range(iters):
            hs = hub // hd_
            contrib = np.zeros(n, dtype=np.int64)
            np.add.at(contrib, di, hs[si])
            auth, ad_ = contrib, max(int(contrib.sum()) // S, 1)
            as_ = auth // ad_
            contrib2 = np.zeros(n, dtype=np.int64)
            np.add.at(contrib2, si, as_[di])
            hub, hd_ = contrib2, max(int(contrib2.sum()) // S, 1)
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(nd.tolist(), pa.string()),
                    "hub_nano": pa.array(hub // hd_, pa.int64()),
                    "auth_nano": pa.array(auth // ad_, pa.int64()),
                }
            )
        )

    # adjacency bucketed by the side whose score the half-round reads
    adj_by_src = (
        edges.map_batches(
            lambda df: df.assign(bucket=bucket_of(df["src"])),
            batch_format="pandas",
        )
        .repartition(B)
        .materialize()
    )
    adj_by_dst = (
        edges.map_batches(
            lambda df: df.assign(bucket=bucket_of(df["dst"])),
            batch_format="pandas",
        )
        .repartition(B)
        .materialize()
    )

    def init_scores() -> rd.Dataset:
        return (
            nodes.map_batches(
                lambda df: pd.DataFrame(
                    {
                        "node": df["node"],
                        "contrib": np.full(len(df), init, dtype="int64"),
                    }
                ),
                batch_format="pandas",
            )
            .repartition(B)
            .materialize()
        )

    def half_round(
        scores: rd.Dataset, div: int, adj: rd.Dataset, read_col: str,
        emit_col: str,
    ) -> tuple[rd.Dataset, int]:
        """One matvec: co-locate ``scores`` with edges on ``read_col``,
        emit (node=``emit_col`` endpoint, contrib=score), reduce by
        node. ``scores`` is the PREVIOUS half-round's raw (node,
        contrib) with its pending scalar divisor ``div`` — the
        division folds into this round's first map over the
        materialized raw, so each half-round pays ONE materialization
        barrier instead of two (score normalize + raw; measured
        44.8 → 26.7 s for the full HITS at sf0.1, idle box). Returns
        (raw, d) with the division pending for the consumer."""

        def as_score_rows(df: pd.DataFrame) -> pd.DataFrame:
            score = (df["contrib"].to_numpy() // div).astype("int64")
            return pd.DataFrame(
                {
                    "src": df["node"] if read_col == "src" else "",
                    "dst": df["node"] if read_col == "dst" else "",
                    "score": score,
                    "is_score": np.ones(len(df), dtype="int64"),
                    "bucket": bucket_of(df["node"]),
                }
            )

        def as_edge_rows(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "src": df["src"],
                    "dst": df["dst"],
                    "score": np.zeros(len(df), dtype="int64"),
                    "is_score": np.zeros(len(df), dtype="int64"),
                    "bucket": df["bucket"].astype("int64"),
                }
            )

        def send(g: pd.DataFrame) -> pd.DataFrame:
            lab = g[g["is_score"] == 1][[read_col, "score"]].rename(
                columns={read_col: "key"}
            )
            e = g[g["is_score"] == 0][["src", "dst"]]
            m = e.merge(lab, left_on=read_col, right_on="key")
            return pd.DataFrame(
                {
                    "node": m[emit_col],
                    "contrib": m["score"].astype("int64"),
                }
            )

        msgs = (
            scores.map_batches(as_score_rows, batch_format="pandas")
            .union(adj.map_batches(as_edge_rows, batch_format="pandas"))
            .groupby("bucket")
            .map_groups(send, batch_format="pandas")
        )

        def pre_reduce(df: pd.DataFrame) -> pd.DataFrame:
            p = df.groupby("node", as_index=False)["contrib"].sum()
            p["is_node"] = np.zeros(len(p), dtype="int64")
            p["bucket"] = bucket_of(p["node"])
            return p

        # nodes ride the same co-group as zero-contribution marker
        # rows so every node persists AND the tag filters MEMBERSHIP:
        # a contribution addressed outside the crawled node set
        # (depth-capped crawls emit such links) must neither invent a
        # phantom score row nor count toward the normalization mass —
        # the same convention as _pagerank_plan's is_node filter
        def zero_rows(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "node": df["node"],
                    "contrib": np.zeros(len(df), dtype="int64"),
                    "is_node": np.ones(len(df), dtype="int64"),
                    "bucket": bucket_of(df["node"]),
                }
            )

        def merge_members(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby("node", as_index=False).agg(
                contrib=("contrib", "sum"), is_node=("is_node", "max")
            )
            return out[out["is_node"] == 1][["node", "contrib"]]

        # the ONE materialization per half-round: raw is consumed
        # twice (native sum + next round's maps), and its consumer
        # chain includes a groupby whose sort-based shuffle runs a
        # boundary-SAMPLING pass — a lazy input would re-execute per
        # pass (measured 17 → 59 s when this barrier was dropped).
        raw = (
            msgs.map_batches(pre_reduce, batch_format="pandas")
            .union(nodes.map_batches(zero_rows, batch_format="pandas"))
            .groupby("bucket")
            .map_groups(merge_members, batch_format="pandas")
            .repartition(B)
            .materialize()
        )
        total = int(raw.sum("contrib") or 0)
        return raw, max(total // S, 1)

    hubs, hd = init_scores(), 1
    # auths is overwritten by the first half-round; only build the
    # initial (full nodes pass + repartition) dataset when iters == 0.
    auths, ad = (init_scores(), 1) if iters == 0 else (None, 1)
    for _ in range(iters):
        auths, ad = half_round(hubs, hd, adj_by_src, "src", "dst")
        hubs, hd = half_round(auths, ad, adj_by_dst, "dst", "src")

    def tag(df: pd.DataFrame, col: str, d: int) -> pd.DataFrame:
        score = (df["contrib"].to_numpy() // d).astype("int64")
        out = pd.DataFrame(
            {
                "node": df["node"],
                "hub_nano": score if col == "hub" else 0,
                "auth_nano": score if col == "auth" else 0,
                "bucket": bucket_of(df["node"]),
            }
        )
        return out.astype({"hub_nano": "int64", "auth_nano": "int64"})

    return (
        hubs.map_batches(
            lambda df: tag(df, "hub", hd), batch_format="pandas"
        )
        .union(
            auths.map_batches(
                lambda df: tag(df, "auth", ad), batch_format="pandas"
            )
        )
        .groupby("bucket")
        .map_groups(
            lambda g: g.groupby("node", as_index=False)
            .agg(hub_nano=("hub_nano", "sum"), auth_nano=("auth_nano", "sum"))
            .rename(columns={"node": "doc_id"}),
            batch_format="pandas",
        )
    )


def crawl_hits(sf_dir: str):
    """queries() entry: integer HITS of the flagship mirror —
    (doc_id, hub_nano, auth_nano), hash-compared against an unrolled
    two-halves-per-round CTE oracle."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return hits_from_docs(crawl_docs(sf_dir))


def degrees_from_docs(docs: rd.Dataset, num_buckets: int | None = None) -> rd.Dataset:
    """(direction, degree, n_nodes): in-/out-degree histogram of the
    link graph — simple-graph semantics (distinct neighbors,
    self-loops dropped), the standard first look at a crawl's
    power-law shape.

    Scale shape: ONE tagged exchange carries two rows per edge
    ((src,'out',dst) and (dst,'in',src)), node-hash bucketed so a
    node's rows co-locate and the per-group distinct-neighbor count
    is exact global dedup; the per-(direction,degree) histogram is a
    second exchange over ≤ |distinct degrees| partial rows per
    bucket. The degree histogram itself is tiny by construction —
    the driver never sees an edge."""
    import pandas as pd

    from suckit_ray.stages.agg import bucketed_groupby_agg, default_buckets

    B = num_buckets or default_buckets()

    def tag(t: pa.Table) -> pa.Table:
        import numpy as np

        src = t.column("src").to_numpy(zero_copy_only=False)
        dst = t.column("dst").to_numpy(zero_copy_only=False)
        keep = src != dst  # self-loops out
        src, dst = src[keep], dst[keep]
        node = np.concatenate([src, dst])
        nbr = np.concatenate([dst, src])
        dirs = np.concatenate(
            [np.full(len(src), "out"), np.full(len(dst), "in")]
        )
        df = pd.DataFrame({"node": node, "dir": dirs, "nbr": nbr})
        df = df.drop_duplicates()  # batch-local pre-shrink
        h = pd.util.hash_pandas_object(df["node"], index=False).astype("uint64")
        df["bucket"] = (h % B).astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    def count_degrees(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "direction": pd.array([], dtype="str"),
                    "degree": pd.array([], dtype="int64"),
                    "n_nodes": pd.array([], dtype="int64"),
                }
            )
        d = (
            g.drop_duplicates(["node", "dir", "nbr"])  # exact: node-co-located
            .groupby(["node", "dir"], as_index=False)
            .agg(degree=("nbr", "size"))
        )
        p = d.groupby(["dir", "degree"], as_index=False).agg(
            n_nodes=("degree", "size")
        )
        return p.rename(columns={"dir": "direction"})

    tagged = _link_edges(docs).map_batches(tag, batch_format="pyarrow")
    partial = tagged.groupby("bucket").map_groups(
        count_degrees, batch_format="pandas"
    )
    return bucketed_groupby_agg(
        partial,
        keys=["direction", "degree"],
        aggs={"n_nodes": ("n_nodes", "sum")},
    )


def crawl_degrees(sf_dir: str) -> rd.Dataset:
    """queries() entry: degree histogram of the flagship mirror's
    link graph, hash-compared against the closure-formula oracle."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return degrees_from_docs(crawl_docs(sf_dir))


def kcore_from_docs(
    docs: rd.Dataset, k: int = 2, max_rounds: int = 50,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """(doc_id, core_degree): the k-CORE of the link graph — the
    maximal subgraph where every node keeps ≥ k (simple, undirected)
    neighbors — via distributed ITERATIVE PEELING, the graph shape no
    other operator here exercises (pagerank/HITS run a fixed round
    count; peeling runs data-dependent rounds to a fixpoint).

    Per round: one node-hash co-group marks edges whose BOTH endpoints
    are still alive (each edge row visits its two endpoint buckets as
    two half-rows; an edge survives iff both halves find their
    endpoint alive), a second co-group counts surviving degrees and
    drops nodes under k. Alive-set rows are O(nodes) and materialize
    between rounds exactly like the pagerank plan; convergence = no
    node dropped this round (an O(blocks) count, not a driver scan).
    SQL oracle: the unrolled-CTE simultaneous peel (idempotent past
    the fixpoint, so a fixed unroll depth ≥ the graph's peel depth is
    exact; the engine RAISES on loop exhaustion rather than return a
    superset, so a depth mismatch is loud) — plus the brute-force
    Python-peel pin on graphs that DO peel."""
    import pandas as pd

    from suckit_ray.stages.agg import default_buckets

    def bucket_of(col: pd.Series) -> pd.Series:
        return _hash_bucket(col, B)

    # batch-local pre-dedup; exact dedup happens inside the first
    # co-group of every round (all of a node's half-rows co-locate)
    edges = _link_edges(docs).map_batches(
        _und_simple, batch_format="pyarrow"
    ).materialize()
    if num_buckets is None:
        # iterative pipelines pay per-BLOCK fixed costs EVERY round —
        # scale buckets to the graph like _pagerank_plan (a tiny graph
        # at cluster fan-out spends minutes on pure task overhead)
        num_buckets = max(2, min(default_buckets(), edges.count() // 10_000 + 1))
    B = num_buckets

    halves = edges.map_batches(
        lambda df: _edge_half_rows(df, B), batch_format="pandas"
    ).materialize()

    # round 0 shortcut: with EVERYONE alive the liveness check is a
    # no-op, so the initial degrees come from one direct co-group (the
    # dense-graph / low-k case then skips the loop entirely — its
    # full degrees ARE the core degrees when nothing pruned)
    def init_deg(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["node", "peer"]).groupby(
            "node", as_index=False
        ).agg(deg=("peer", "size"))
        d["bucket"] = bucket_of(d["node"])
        return d

    deg0 = (
        halves.groupby("bucket")
        .map_groups(init_deg, batch_format="pandas")
        .materialize()
    )
    n_nodes = deg0.count()

    def keep0(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["deg"] >= k]

    alive = deg0.map_batches(keep0, batch_format="pandas").materialize()
    n_alive = alive.count()
    converged = n_alive == n_nodes
    cur_halves = halves  # shrinks each round to the surviving subgraph

    for _ in range(0 if converged else max_rounds):
        if n_alive == 0:
            converged = True
            break
        # round part 1: per-node liveness stamp on each half row (the
        # node side); an edge is alive iff BOTH its half rows survive
        # part 2's peer check — equivalently, count for each alive
        # node its alive peers. Do it in ONE co-group keyed by node:
        # the group sees the node's half rows + its alive marker; a
        # second co-group keyed by PEER subtracts dead peers.
        tagged = (
            cur_halves.union(
                alive.map_batches(
                    lambda df: pd.DataFrame(
                        {
                            "node": df["node"],
                            "peer": "",  # alive marker
                            "bucket": df["bucket"],
                        }
                    ),
                    batch_format="pandas",
                )
            )
            .groupby("bucket")
            .map_groups(
                lambda g: g[
                    g["node"].isin(set(g.loc[g["peer"] == "", "node"]))
                    & (g["peer"] != "")
                ][["node", "peer"]].drop_duplicates(),
                batch_format="pandas",
            )
        )
        # part 2: re-key by peer, drop halves whose peer is dead, then
        # count per NODE (the peer-keyed group emits (node) rows for
        # halves whose peer is alive; a final node-keyed count gives
        # the within-alive degree)
        def by_peer(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({"node": df["node"], "peer": df["peer"]})
            out["bucket"] = bucket_of(out["peer"])
            return out

        def peer_filter(g: pd.DataFrame) -> pd.DataFrame:
            ok = g["peer"].isin(set(g.loc[g["node"] == "", "peer"]))
            out = g[ok & (g["node"] != "")][["node", "peer"]].copy()
            return out

        # surv = the round's SURVIVING half rows (both endpoints
        # alive) — materialized once and reused as the NEXT round's
        # input, so per-round work tracks the shrinking live subgraph
        # instead of re-scanning every original edge each round
        surv = (
            tagged.map_batches(by_peer, batch_format="pandas")
            .union(
                alive.map_batches(
                    lambda df: pd.DataFrame(
                        {
                            "node": "",
                            "peer": df["node"],
                            "bucket": df["bucket"],
                        }
                    ),
                    batch_format="pandas",
                )
            )
            .groupby("bucket")
            .map_groups(peer_filter, batch_format="pandas")
            .materialize()
        )

        def count_deg(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby("node", as_index=False).agg(deg=("node", "size"))
            out["bucket"] = bucket_of(out["node"])
            return out

        def keep_core(g: pd.DataFrame) -> pd.DataFrame:
            d = g.groupby("node", as_index=False).agg(deg=("deg", "sum"))
            d = d[d["deg"] >= k]
            d["bucket"] = bucket_of(d["node"])
            return d[["node", "deg", "bucket"]]

        new_alive = (
            surv.map_batches(count_deg, batch_format="pandas")
            .groupby("bucket")
            .map_groups(keep_core, batch_format="pandas")
            .materialize()
        )
        n_new = new_alive.count()
        converged = n_new == n_alive
        alive = new_alive
        n_alive = n_new
        if converged:
            break

        def rebucket(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({"node": df["node"], "peer": df["peer"]})
            out["bucket"] = bucket_of(out["node"])
            return out

        cur_halves = surv.map_batches(rebucket, batch_format="pandas")

    if not converged:
        # an exhausted loop returns a SUPERSET with overcounted degrees
        # (a 2R-node path peels 2 nodes/round) — never silently
        raise RuntimeError(
            f"k-core peeling did not converge within max_rounds="
            f"{max_rounds} ({n_alive} nodes still alive); raise "
            "max_rounds — rounds needed equal the graph's peel depth"
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if "deg" not in df.columns:
            return pd.DataFrame(
                {
                    "doc_id": pd.array([], dtype="str"),
                    "core_degree": pd.array([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {"doc_id": df["node"], "core_degree": df["deg"].astype("int64")}
        )

    return alive.map_batches(finish, batch_format="pandas")


def ktruss_from_docs(
    docs: rd.Dataset, k: int = 3, max_rounds: int = 30,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """(src, dst, support): the k-TRUSS of the link graph (Cohen 2008,
    "Trusses: cohesive subgraphs for social network analysis" — NSA
    tech report, public) — the maximal subgraph where every edge sits
    in ≥ k−2 triangles, the EDGE analogue of the k-core (a k-truss is
    a stronger cohesion certificate: its edges survive pairwise, not
    just by degree). ``support`` = the edge's triangle count WITHIN
    the final truss. Deterministic integer edge-peeling, so it joins
    the kcore/pagerank family of SQL-oracle-able iterations.

    Distributed plan — the ``kcore_from_docs`` round structure on
    EDGES, two exchanges per round (edge-centric support, not wedge
    generation — measured 3.6 s/round → 2.4 s/round at sf0.1):
    (1) a node-keyed co-group reduces each node's half-rows to its
    neighbor SET and ships that set to every incident edge (one row
    per (edge, endpoint), the set serialized as a joined string);
    (2) an edge-keyed co-group intersects the edge's two endpoint
    sets — ``support = |N(u) ∩ N(v)|`` — and keeps edges with
    support ≥ k−2 (the two rows can never carry identical sets:
    u ∈ N(v) but u ∉ N(u)). Converged when no edge dropped — the
    just-computed supports of the surviving round ARE the
    within-truss supports, so the fixpoint round's output is final.
    One ``materialize()`` per round on the survivor set (the
    iterative-groupby rule). Neighbor-set replication is the
    standard triangle-counting cost, O(Σ deg(v)²) per round —
    bounded-fanout webs keep it linear; a hub-heavy graph pays the
    same price any exact truss must.

    The engine RAISES on loop exhaustion rather than return a
    superset — the same loud-depth contract as kcore, which is what
    makes the unrolled-CTE oracle exact."""
    import pandas as pd

    from suckit_ray.stages.agg import default_buckets

    if k < 3:
        raise ValueError("k-truss needs k >= 3 (support threshold k-2 >= 1)")
    thresh = k - 2

    raw = _link_edges(docs).map_batches(
        _und_simple, batch_format="pyarrow"
    ).materialize()
    if num_buckets is None:
        # iterative rounds pay per-BLOCK fixed costs every round —
        # scale buckets to the graph like kcore/_pagerank_plan
        # (measured: 64 buckets → 15 s, scaled → ~5 s at sf0.1)
        num_buckets = max(2, min(default_buckets(), raw.count() // 10_000 + 1))
    B = num_buckets

    def bucket_of(col: pd.Series) -> pd.Series:
        return _hash_bucket(col, B)

    def ebucket(df: pd.DataFrame) -> pd.Series:
        # two-COLUMN hash, not a NUL-joined string: hash_pandas_object
        # is also NUL-truncating (it would hash only the first
        # endpoint — co-location still correct but needlessly skewed)
        h = pd.util.hash_pandas_object(
            df[["a", "b"]], index=False
        ).astype("uint64")
        return (h % B).astype("int64")

    # no exact-dedup pre-pass: a cross-batch duplicate edge is
    # harmless — the wedge stage reduces each node's half-rows to a
    # neighbor SET and the closing stage matches against a marker
    # SET, so triangles (and therefore supports) are exact; round-1
    # output rows are support-grouped and thus exactly deduped. The
    # only effect of an inflated raw count is that convergence can't
    # trigger before round 1 — which a peel never does anyway.
    edges = raw
    n_edges = edges.count()

    def nbr_rows(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for u, grp in g.groupby("node"):
            nbrs = sorted(set(grp["peer"]))
            blob = "\x00".join(nbrs)
            for p in nbrs:
                a, b = (u, p) if u < p else (p, u)
                rows.append((a, b, u, blob))
        if not rows:
            return pd.DataFrame(
                {
                    "a": pd.array([], dtype="str"),
                    "b": pd.array([], dtype="str"),
                    "end": pd.array([], dtype="str"),
                    "nbrs": pd.array([], dtype="str"),
                    "bucket": pd.array([], dtype="int64"),
                }
            )
        df = pd.DataFrame(rows, columns=["a", "b", "end", "nbrs"])
        df["bucket"] = ebucket(df)
        return df

    def support_group(g: pd.DataFrame) -> pd.DataFrame:
        # select the two endpoint rows by the explicit ``end`` column,
        # NEVER by blob equality: pandas' unique()/hashtable treats an
        # embedded NUL as a C-string terminator, so two different
        # "\x00"-joined neighbor sets sharing a prefix compare EQUAL
        # (measured; the round-5 ktruss rewrite lost every triangle to
        # it before this was endpoint-keyed)
        out = []
        for (a, b), grp in g.groupby(["a", "b"]):
            bya = grp.loc[grp["end"] == a, "nbrs"]
            byb = grp.loc[grp["end"] == b, "nbrs"]
            if not len(bya) or not len(byb):
                continue
            s = len(
                set(bya.iloc[0].split("\x00")) & set(byb.iloc[0].split("\x00"))
            )
            if s >= thresh:
                out.append((a, b, s))
        if not out:
            return pd.DataFrame(
                {
                    "a": pd.array([], dtype="str"),
                    "b": pd.array([], dtype="str"),
                    "support": pd.array([], dtype="int64"),
                }
            )
        return pd.DataFrame(out, columns=["a", "b", "support"])

    result = None
    for _ in range(max_rounds):
        if n_edges == 0:
            result = edges.map_batches(
                lambda df: pd.DataFrame(
                    {
                        "a": pd.array([], dtype="str"),
                        "b": pd.array([], dtype="str"),
                        "support": pd.array([], dtype="int64"),
                    }
                ),
                batch_format="pandas",
            )
            break
        surv = (
            edges.map_batches(
                lambda df: _edge_half_rows(df, B), batch_format="pandas"
            )
            .groupby("bucket")
            .map_groups(nbr_rows, batch_format="pandas")
            .groupby("bucket")
            .map_groups(support_group, batch_format="pandas")
            .materialize()
        )
        n_new = surv.count()
        if n_new == n_edges or n_new == 0:
            # n_new == 0 is a fully determined fixpoint too (the
            # empty truss) — don't demand one more confirming round
            result = surv
            break
        edges = surv.map_batches(
            lambda df: df[["a", "b"]], batch_format="pandas"
        ).materialize()
        n_edges = n_new
    if result is None:
        raise RuntimeError(
            f"k-truss peeling did not converge within max_rounds="
            f"{max_rounds} ({n_edges} edges still alive); raise max_rounds"
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if "support" not in df.columns or not len(df):
            return pd.DataFrame(
                {
                    "src": pd.array([], dtype="str"),
                    "dst": pd.array([], dtype="str"),
                    "support": pd.array([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "src": df["a"],
                "dst": df["b"],
                "support": df["support"].astype("int64"),
            }
        )

    return result.map_batches(finish, batch_format="pandas")


def crawl_ktruss(sf_dir: str, k: int = 3) -> rd.Dataset:
    """queries() entry: the 3-truss of the flagship mirror's link
    graph (SQL-oracled via the unrolled triangle-support peel CTE;
    pinned against a brute Python peel on graphs that peel harder)."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return ktruss_from_docs(crawl_docs(sf_dir), k=k)


def components_from_docs(
    docs: rd.Dataset,
    num_buckets: int | None = None,
    cc_driver_limit: int | None = None,
) -> rd.Dataset:
    """(size, n_components): weakly-connected-component size histogram
    of the crawl's HTML link graph — the structural question a
    web-scale corpus asks first ("is this one web or many islands?").

    Plan: edges hash to int64 node ids (pd.util.hash_pandas_object —
    deterministic 64-bit; a collision merging two components needs
    ~2^32 nodes per partition, and the OUTPUT is size-level, so ids
    never surface); labels come from ``dedup._cc_labels`` — the same
    distributed min-label propagation (+ pointer jumping on long
    chains) the near-dup clusters use, now over a full link graph.
    Isolated HTML pages (no edges at all) ride a tagged co-group as
    singleton components. Per-label sizes and the size histogram are
    two bucketed aggregations over O(nodes) rows; the driver never
    sees an edge or a label."""
    import pandas as pd

    from suckit_ray.pipelines.dedup import _cc_labels
    from suckit_ray.stages.agg import bucketed_groupby_agg, default_buckets

    B = num_buckets or default_buckets()

    def to_ids(df: pd.DataFrame) -> pd.DataFrame:
        a = pd.util.hash_pandas_object(df["src"], index=False)
        b = pd.util.hash_pandas_object(df["dst"], index=False)
        # >> 1: 63-bit NON-NEGATIVE ids — _cc_labels' tagged rows use
        # peer<0 / label=-1 sentinels, so signed views of uint64
        # hashes would masquerade as sentinels and corrupt labels
        out = pd.DataFrame(
            {
                "a_id": (a.to_numpy() >> np.uint64(1)).astype("int64"),
                "b_id": (b.to_numpy() >> np.uint64(1)).astype("int64"),
            }
        )
        # _cc_labels expects a near-dup-shaped pair list: no self-loops
        # (a page linking to itself is component-neutral) and no exact
        # duplicates (repeated links in one document). Batch-local
        # dedup; cross-batch duplicates are harmless to the adjacency
        # but self-pairs would double a node's self-label row and break
        # reduce_min's unique-index reindex.
        out = out[out["a_id"] != out["b_id"]].drop_duplicates()
        return out

    # materialized ONCE: consumed by _cc_labels AND the singleton
    # branch, whose groupby's sampling pass would otherwise re-run
    # the span-explode link extraction (the lazy-input re-execution
    # trap: sort-groupby boundary sampling re-runs a lazy upstream)
    ids = (
        _link_edges(docs)
        .map_batches(to_ids, batch_format="pandas")
        .materialize()
    )
    from suckit_ray.pipelines.dedup import (
        CC_DRIVER_PAIR_LIMIT,
        _cc_union_find,
    )

    limit = (
        CC_DRIVER_PAIR_LIMIT if cc_driver_limit is None else cc_driver_limit
    )
    if ids.count() <= limit:
        # small-graph cutover (the near_dup_clusters pattern): the
        # batch-deduped edge list is bounded, so collect it, union-find
        # on the driver, and emit per-component sizes directly —
        # skipping O(diameter) propagation rounds whose per-round
        # materialize barriers dominate wall time on small graphs
        # (measured 53.6 → ~3 s for the 628-page sf0.01 mirror).
        # Larger graphs keep the zero-driver propagation path; both
        # routes are equality-tested in tests/test_graph.py.
        parts = list(ids.iter_batches(batch_format="pyarrow"))
        edge_tbl = (
            pa.concat_tables(parts)
            if parts
            else pa.table(
                {
                    "a_id": pa.array([], pa.int64()),
                    "b_id": pa.array([], pa.int64()),
                }
            )
        )
        # cross-batch duplicate edges are harmless to the adjacency
        # but would double-count sizes here
        edge_tbl = pa.Table.from_pandas(
            edge_tbl.to_pandas().drop_duplicates(["a_id", "b_id"]),
            preserve_index=False,
        )
        nonroot = _cc_union_find(edge_tbl)
        a = edge_tbl.column("a_id").to_numpy(zero_copy_only=False)
        b = edge_tbl.column("b_id").to_numpy(zero_copy_only=False)
        nodes = np.unique(np.concatenate([a, b]))
        roots = np.fromiter(
            (nonroot.get(int(n), int(n)) for n in nodes),
            dtype=np.int64,
            count=len(nodes),
        )
        _, counts = np.unique(roots, return_counts=True)
        sizes = rd.from_arrow(
            pa.table({"size": pa.array(counts, pa.int64())})
        )
    else:
        labels = _cc_labels(ids, num_buckets)
        sizes = bucketed_groupby_agg(
            labels,
            keys=["label"],
            aggs={"size": ("node", "count")},
            num_buckets=B,
        ).select_columns(["size"])

    # singleton components: HTML nodes that appear in NO edge. Tagged
    # co-group on the node hash: edge endpoints mark presence, doc
    # nodes mark membership; members without presence are size-1.
    def node_rows(df: pd.DataFrame) -> pd.DataFrame:
        # pandas out like endpoint_rows: the union feeding a groupby
        # must be format-homogeneous (mixed arrow+pandas blocks break
        # the sort-shuffle's group slicing)
        keep = df.loc[df["is_html"].astype(bool), "doc_id"]
        ids = (
            pd.util.hash_pandas_object(
                keep.map(posixpath.normpath), index=False
            ).to_numpy()
            >> np.uint64(1)  # same 63-bit ids as to_ids
        ).astype("int64")
        return pd.DataFrame(
            {
                "node": ids,
                "in_edge": np.zeros(len(ids), dtype=np.int64),
                "bucket": ids % B,
            }
        )

    def endpoint_rows(df: pd.DataFrame) -> pd.DataFrame:
        ids = pd.unique(
            pd.concat([df["a_id"], df["b_id"]], ignore_index=True)
        )
        return pd.DataFrame(
            {
                "node": ids,
                "in_edge": np.ones(len(ids), dtype=np.int64),
                "bucket": ids % B,
            }
        )

    def count_singletons(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("node")["in_edge"].max()
        n = int((m == 0).sum())
        return pd.DataFrame({"n": pd.array([n] if n else [], dtype="int64")})

    singles = (
        docs.select_columns(["doc_id", "is_html"])
        .map_batches(node_rows, batch_format="pandas")
        .union(ids.map_batches(endpoint_rows, batch_format="pandas"))
        .groupby("bucket")
        .map_groups(count_singletons, batch_format="pandas")
        .to_pandas()  # ≤ B tiny rows
    )
    n_single = int(singles["n"].sum()) if len(singles) else 0

    single_rows = rd.from_arrow(
        pa.table({"size": pa.array([1] * n_single, pa.int64())})
    )
    all_sizes = sizes.union(single_rows) if n_single else sizes
    return bucketed_groupby_agg(
        all_sizes,
        keys=["size"],
        aggs={"n_components": ("size", "count")},
        num_buckets=B,
    )


def crawl_components(sf_dir: str) -> rd.Dataset:
    """queries() entry: component-size histogram of the flagship
    mirror's link graph. The oracle corpus has no cross-host links
    (ext_links=False), so each host's reachable page set is exactly
    one component — the closure CTE counts them per host."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return components_from_docs(crawl_docs(sf_dir))


def crawl_kcore(sf_dir: str, k: int = 2) -> rd.Dataset:
    """queries() entry: the 2-core of the flagship mirror's link graph
    (SQL-oracled via the unrolled simultaneous-peel CTE; additionally
    pinned against a Python peel on graphs that actually peel)."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return kcore_from_docs(crawl_docs(sf_dir), k=k)


# ---------------------------------------------------------------------------
# strongly connected components (directed)
# ---------------------------------------------------------------------------

SCC_DRIVER_EDGE_LIMIT = 200_000  # same class as dedup.CC_DRIVER_PAIR_LIMIT


def _scc_tarjan_sizes(a: np.ndarray, b: np.ndarray) -> list[int]:
    """Iterative Tarjan over a small collected edge list — only ever
    called under SCC_DRIVER_EDGE_LIMIT. Returns the SCC sizes of every
    node appearing in an edge (explicit stack: no recursion limit)."""
    adj: dict[int, list[int]] = {}
    nodes: set[int] = set()
    for x, y in zip(a.tolist(), b.tolist()):
        adj.setdefault(x, []).append(y)
        nodes.add(x)
        nodes.add(y)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on_stack: set[int] = set()
    stack: list[int] = []
    sizes: list[int] = []
    counter = 0
    for root in nodes:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            succs = adj.get(v, ())
            for i in range(pi, len(succs)):
                w = succs[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                n = 0
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    n += 1
                    if w == v:
                        break
                sizes.append(n)
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    return sizes


def _keep_edges_with_member(
    edges: rd.Dataset, nodes: rd.Dataset, endpoint: str, B: int
) -> rd.Dataset:
    """Edges whose ``endpoint`` (\"a_id\"/\"b_id\") appears in
    ``nodes`` (single column \"node\") — the distributed semi-join as
    one tagged co-group on the endpoint's hash bucket."""

    def tag_edge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": df[endpoint].astype("int64"),
                "a_id": df["a_id"].astype("int64"),
                "b_id": df["b_id"].astype("int64"),
                "is_node": np.zeros(len(df), dtype="int64"),
                "bucket": (df[endpoint] % B).astype("int64"),
            }
        )

    def tag_node(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": df["node"].astype("int64"),
                "a_id": np.full(len(df), -1, dtype="int64"),
                "b_id": np.full(len(df), -1, dtype="int64"),
                "is_node": np.ones(len(df), dtype="int64"),
                "bucket": (df["node"] % B).astype("int64"),
            }
        )

    def keep(g: pd.DataFrame) -> pd.DataFrame:
        members = set(g.loc[g["is_node"] == 1, "key"].tolist())
        e = g[g["is_node"] == 0]
        e = e[e["key"].isin(members)]
        return pd.DataFrame(
            {
                "a_id": e["a_id"].astype("int64"),
                "b_id": e["b_id"].astype("int64"),
            }
        )

    return (
        edges.map_batches(tag_edge, batch_format="pandas")
        .union(nodes.map_batches(tag_node, batch_format="pandas"))
        .groupby("bucket")
        .map_groups(keep, batch_format="pandas")
    )


def _dir_max_prop(
    edges: rd.Dataset,
    init: rd.Dataset,
    B: int,
    max_rounds: int,
    what: str,
) -> rd.Dataset:
    """Directed max-propagation to fixpoint: val[b] ← max(val[b],
    val[a]) along every edge a→b. ``init`` is (node, val) covering
    EVERY node (isolated nodes keep their value). Two bucketed
    exchanges per round (attach src vals, reduce at dst), one small
    changed-count to the driver; raises on non-convergence rather
    than returning a truncated fixpoint (the kcore convention).
    Returns a materialized (node, val)."""
    vals = init.materialize()
    edges = edges.materialize()

    def send(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["is_self"] == 1][["key", "val"]]
        e = g[g["is_self"] == 0][["key", "dst"]].merge(lab, on="key")
        return pd.DataFrame(
            {
                "node": e["dst"].astype("int64"),
                "val": e["val"].astype("int64"),
                "is_self": np.zeros(len(e), dtype="int64"),
            }
        )

    for rnd in range(max_rounds):

        def tag_vals(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "key": df["node"].astype("int64"),
                    "dst": np.full(len(df), -1, dtype="int64"),
                    "val": df["val"].astype("int64"),
                    "is_self": np.ones(len(df), dtype="int64"),
                    "bucket": (df["node"] % B).astype("int64"),
                }
            )

        def tag_edges(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "key": df["a_id"].astype("int64"),
                    "dst": df["b_id"].astype("int64"),
                    "val": np.full(len(df), -1, dtype="int64"),
                    "is_self": np.zeros(len(df), dtype="int64"),
                    "bucket": (df["a_id"] % B).astype("int64"),
                }
            )

        msgs = (
            vals.map_batches(tag_vals, batch_format="pandas")
            .union(edges.map_batches(tag_edges, batch_format="pandas"))
            .groupby("bucket")
            .map_groups(send, batch_format="pandas")
        )

        def tag_self(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "node": df["node"].astype("int64"),
                    "val": df["val"].astype("int64"),
                    "is_self": np.ones(len(df), dtype="int64"),
                }
            )

        def reduce_max(g: pd.DataFrame) -> pd.DataFrame:
            new = g.groupby("node")["val"].max()
            own = g[g["is_self"] == 1].set_index("node")["val"]
            own = own.reindex(new.index)
            chg = new > own
            return pd.DataFrame(
                {
                    "node": new.index.astype("int64"),
                    "val": new.to_numpy().astype("int64"),
                    "chg": chg.to_numpy().astype("int64"),
                }
            )

        def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            out["bucket"] = (out["node"] % B).astype("int64")
            return out

        new_vals = (
            msgs.union(vals.map_batches(tag_self, batch_format="pandas"))
            .map_batches(add_bucket, batch_format="pandas")
            .groupby("bucket")
            .map_groups(reduce_max, batch_format="pandas")
            .materialize()  # the ONE barrier per iterative round
        )
        changed = int(
            new_vals.map_batches(
                lambda df: pd.DataFrame({"c": [int(df["chg"].sum())]}),
                batch_format="pandas",
            )
            .to_pandas()["c"]
            .sum()
        )
        # lazy select over the materialized base — no second barrier
        vals = new_vals.select_columns(["node", "val"])
        if changed == 0:
            return vals.materialize()
    raise RuntimeError(
        f"_dir_max_prop({what}) did not converge in {max_rounds} rounds "
        "— refusing to return a truncated fixpoint"
    )


def scc_from_docs(
    docs: rd.Dataset,
    num_buckets: int | None = None,
    scc_driver_limit: int | None = None,
    max_rounds: int = 64,
    max_phases: int = 16,
) -> rd.Dataset:
    """(size, n_sccs): STRONGLY-connected-component size histogram of
    the crawl's directed link graph — the directed sibling of
    ``components_from_docs`` (a page cluster where every page reaches
    every other by following links FORWARD: the web's "core" vs its
    tendrils, per the classic bow-tie structure). Nodes are crawled
    HTML pages; edges keep only targets that are themselves crawled
    pages (the pagerank phantom-node rule).

    Small graphs (edge count ≤ ``scc_driver_limit``, default
    SCC_DRIVER_EDGE_LIMIT) collect the bounded edge list and run an
    iterative driver Tarjan. Larger graphs run distributed
    FORWARD-BACKWARD COLORING (the Pregel-style SCC decomposition —
    public literature: Orzan 2004 / FW-BW): per phase, (1) every
    alive node's color = max node id that reaches it (directed max
    propagation, O(diameter) rounds of two bucketed exchanges), (2)
    nodes whose color equals their own id are roots, (3) a backward
    propagation over SAME-COLOR edges marks the nodes that reach
    their root — exactly the root's SCC — which are counted and
    removed; repeat on the survivors. Real web graphs (one giant SCC
    + shallow periphery) finish in a few phases; adversarial chains
    exhaust ``max_phases`` and RAISE rather than return a partial
    decomposition. Both routes are equality-pinned in
    tests/test_graph.py."""
    from suckit_ray.stages.agg import bucketed_groupby_agg, default_buckets

    def to_ids(df: pd.DataFrame) -> pd.DataFrame:
        a = pd.util.hash_pandas_object(df["src"], index=False)
        b = pd.util.hash_pandas_object(df["dst"], index=False)
        out = pd.DataFrame(
            {
                # >> 1: 63-bit non-negative ids (sentinel-safe, the
                # components_from_docs convention)
                "a_id": (a.to_numpy() >> np.uint64(1)).astype("int64"),
                "b_id": (b.to_numpy() >> np.uint64(1)).astype("int64"),
            }
        )
        return out[out["a_id"] != out["b_id"]].drop_duplicates()

    def node_rows(df: pd.DataFrame) -> pd.DataFrame:
        keep = df.loc[df["is_html"].astype(bool), "doc_id"]
        ids = (
            pd.util.hash_pandas_object(
                keep.map(posixpath.normpath), index=False
            ).to_numpy()
            >> np.uint64(1)
        ).astype("int64")
        return pd.DataFrame({"node": ids})

    nodes = (
        docs.select_columns(["doc_id", "is_html"])
        .map_batches(node_rows, batch_format="pandas")
        .materialize()
    )
    n_html = nodes.count()
    raw_edges = _link_edges(docs).map_batches(to_ids, batch_format="pandas")
    Bsemi = num_buckets or default_buckets()
    # keep only page→page edges (src is a crawled page by construction)
    edges = _keep_edges_with_member(
        raw_edges, nodes, "b_id", Bsemi
    ).materialize()
    n_edges = edges.count()
    limit = (
        SCC_DRIVER_EDGE_LIMIT if scc_driver_limit is None else scc_driver_limit
    )

    if n_edges <= limit:
        parts = list(edges.iter_batches(batch_format="pyarrow"))
        if parts:
            tbl = pa.concat_tables(parts)
            df = tbl.to_pandas().drop_duplicates(["a_id", "b_id"])
            a = df["a_id"].to_numpy()
            b = df["b_id"].to_numpy()
            sizes_list = _scc_tarjan_sizes(a, b)
            n_edge_nodes = len(np.unique(np.concatenate([a, b])))
        else:
            sizes_list = []
            n_edge_nodes = 0
        sizes_list.extend([1] * (n_html - n_edge_nodes))
        hist: dict[int, int] = {}
        for s in sizes_list:
            hist[s] = hist.get(s, 0) + 1
        return rd.from_arrow(
            pa.table(
                {
                    "size": pa.array(sorted(hist), pa.int64()),
                    "n_sccs": pa.array(
                        [hist[s] for s in sorted(hist)], pa.int64()
                    ),
                }
            )
        )

    # distributed FW-BW coloring
    # B scaled like the pagerank plan: iterative rounds pay per-block
    # fixed costs every round, so small graphs get few buckets
    B = num_buckets or max(
        2, min(default_buckets(), n_edges // 10_000 + 1)
    )
    alive_nodes = nodes
    alive_edges = edges
    size_parts: list[rd.Dataset] = []
    for _phase in range(max_phases):
        if alive_nodes.count() == 0:
            break
        init = alive_nodes.map_batches(
            lambda df: pd.DataFrame(
                {
                    "node": df["node"].astype("int64"),
                    "val": df["node"].astype("int64"),
                }
            ),
            batch_format="pandas",
        )
        colors = _dir_max_prop(
            alive_edges, init, B, max_rounds, "scc colors"
        )

        # same-color edges, reversed (mark flows descendant → ancestor)
        def tag_e_src(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "key": df["a_id"].astype("int64"),
                    "a_id": df["a_id"].astype("int64"),
                    "b_id": df["b_id"].astype("int64"),
                    "val": np.full(len(df), -1, dtype="int64"),
                    "bucket": (df["a_id"] % B).astype("int64"),
                }
            )

        def tag_c(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "key": df["node"].astype("int64"),
                    "a_id": np.full(len(df), -1, dtype="int64"),
                    "b_id": np.full(len(df), -1, dtype="int64"),
                    "val": df["val"].astype("int64"),
                    "bucket": (df["node"] % B).astype("int64"),
                }
            )

        def join_src_color(g: pd.DataFrame) -> pd.DataFrame:
            c = g[g["a_id"] < 0][["key", "val"]].rename(
                columns={"val": "ca"}
            )
            e = g[g["a_id"] >= 0][["key", "a_id", "b_id"]].merge(
                c, on="key"
            )
            return pd.DataFrame(
                {
                    "a_id": e["a_id"].astype("int64"),
                    "b_id": e["b_id"].astype("int64"),
                    "ca": e["ca"].astype("int64"),
                }
            )

        e_ca = (
            alive_edges.map_batches(tag_e_src, batch_format="pandas")
            .union(colors.map_batches(tag_c, batch_format="pandas"))
            .groupby("bucket")
            .map_groups(join_src_color, batch_format="pandas")
        )

        def tag_e_dst(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "key": df["b_id"].astype("int64"),
                    "a_id": df["a_id"].astype("int64"),
                    "b_id": df["b_id"].astype("int64"),
                    "val": df["ca"].astype("int64"),
                    "bucket": (df["b_id"] % B).astype("int64"),
                }
            )

        def join_dst_color(g: pd.DataFrame) -> pd.DataFrame:
            c = g[g["a_id"] < 0][["key", "val"]].rename(
                columns={"val": "cb"}
            )
            e = g[g["a_id"] >= 0][["key", "a_id", "b_id", "val"]].merge(
                c, on="key"
            )
            e = e[e["val"] == e["cb"]]
            # REVERSED for the backward pass: a_id ← b_id
            return pd.DataFrame(
                {
                    "a_id": e["b_id"].astype("int64"),
                    "b_id": e["a_id"].astype("int64"),
                }
            )

        intra_rev = (
            e_ca.map_batches(tag_e_dst, batch_format="pandas")
            .union(colors.map_batches(tag_c, batch_format="pandas"))
            .groupby("bucket")
            .map_groups(join_dst_color, batch_format="pandas")
        )

        mark_init = colors.map_batches(
            lambda df: pd.DataFrame(
                {
                    "node": df["node"].astype("int64"),
                    "val": (df["node"] == df["val"]).astype("int64"),
                }
            ),
            batch_format="pandas",
        )
        marks = _dir_max_prop(
            intra_rev, mark_init, B, max_rounds, "scc marks"
        )

        # assigned this phase: marked nodes grouped by their color
        def tag_m(df: pd.DataFrame) -> pd.DataFrame:
            keep = df[df["val"] == 1]
            return pd.DataFrame(
                {
                    "key": keep["node"].astype("int64"),
                    "a_id": np.full(len(keep), -2, dtype="int64"),
                    "b_id": np.full(len(keep), -2, dtype="int64"),
                    "val": np.full(len(keep), -2, dtype="int64"),
                    "bucket": (keep["node"] % B).astype("int64"),
                }
            )

        def color_of_marked(g: pd.DataFrame) -> pd.DataFrame:
            c = g[g["val"] >= 0][["key", "val"]]
            m = g[g["val"] == -2][["key"]].merge(c, on="key")
            return pd.DataFrame({"color": m["val"].astype("int64")})

        phase_sizes = bucketed_groupby_agg(
            marks.map_batches(tag_m, batch_format="pandas")
            .union(colors.map_batches(tag_c, batch_format="pandas"))
            .groupby("bucket")
            .map_groups(color_of_marked, batch_format="pandas"),
            keys=["color"],
            aggs={"size": ("color", "count")},
            num_buckets=B,
        ).select_columns(["size"]).materialize()
        size_parts.append(phase_sizes)

        # survivors: unmarked nodes; edges restricted to survivors
        survivors = marks.map_batches(
            lambda df: pd.DataFrame(
                {"node": df.loc[df["val"] == 0, "node"].astype("int64")}
            ),
            batch_format="pandas",
        ).materialize()
        alive_nodes = survivors
        if alive_nodes.count() == 0:
            break
        alive_edges = _keep_edges_with_member(
            _keep_edges_with_member(alive_edges, survivors, "a_id", B),
            survivors,
            "b_id",
            B,
        ).materialize()
    else:
        raise RuntimeError(
            f"scc_from_docs did not decompose in {max_phases} phases — "
            "refusing to return a partial histogram"
        )

    sizes = size_parts[0]
    for p in size_parts[1:]:
        sizes = sizes.union(p)
    return bucketed_groupby_agg(
        sizes,
        keys=["size"],
        aggs={"n_sccs": ("size", "count")},
        num_buckets=B,
    )


def crawl_scc(sf_dir: str) -> rd.Dataset:
    """queries() entry: SCC-size histogram of the flagship mirror's
    directed link graph. Full SQL oracle: the shared reachability CTE
    regenerates the directed edges, a transitive-closure CTE finds
    mutually-reachable pairs, and the histogram groups per-host
    min-partner labels."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return scc_from_docs(crawl_docs(sf_dir))


# ---------------------------------------------------------------------------
# weighted single-source shortest paths (bounded-hop Bellman–Ford)
# ---------------------------------------------------------------------------

SSSP_HOP_CAP = 15
_SSSP_INF = 1 << 62


def sssp_from_docs(
    docs: rd.Dataset,
    hop_cap: int = SSSP_HOP_CAP,
    num_buckets: int | None = None,
    driver_limit: int | None = None,
) -> rd.Dataset:
    """(doc_id, dist): minimum-cost path from the crawl seeds (wave-0
    pages) to every crawled HTML page over the link graph, edge cost =
    len(media_ref) (the rewritten relative-link string — a
    deterministic, SQL-reproducible weight), restricted to paths of at
    most ``hop_cap`` edges; unreachable-within-cap pages report −1.
    The iterative RELAXATION shape (distributed Bellman–Ford): unlike
    BFS (crawl_depths) a later round can LOWER an earlier round's
    distance, so rounds run to the hop cap with an early exit when no
    distance improves.

    Scale shape: per round one src-bucket co-group ships dist+w
    messages along edges and one dst-bucket co-group takes per-node
    mins (the _cc_labels exchange pair, with weights); distances are
    O(pages) small rows materialized between rounds; messages from
    still-unreached nodes are suppressed, so early rounds move only
    the expanding frontier."""
    from suckit_ray.stages.agg import default_buckets

    def node_rows(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[df["is_html"].astype(bool)]
        return pd.DataFrame(
            {
                "doc_id": keep["doc_id"],
                "node": keep["doc_id"].map(posixpath.normpath),
                "dist": np.where(
                    keep["wave"].to_numpy() == 0, 0, _SSSP_INF
                ).astype("int64"),
            }
        )

    def edge_rows(t: pa.Table) -> pd.DataFrame:
        srcs, dsts, ws = [], [], []
        for doc_id, is_html, spans in zip(
            t.column("doc_id").to_pylist(),
            t.column("is_html").to_pylist(),
            t.column("spans").to_pylist(),
        ):
            if not is_html:
                continue
            src = posixpath.normpath(doc_id)
            for s in spans:
                if s["kind"] == "link":
                    dst = resolve_link(doc_id, s["media_ref"])
                    if dst != src:
                        srcs.append(src)
                        dsts.append(dst)
                        ws.append(len(s["media_ref"]))
        return pd.DataFrame(
            {
                "src": pd.array(srcs, dtype="object"),
                "dst": pd.array(dsts, dtype="object"),
                "w": pd.array(ws, dtype="int64"),
            }
        ).drop_duplicates()

    B = num_buckets or max(2, min(default_buckets(), 8))

    def bucket_of(col: pd.Series) -> pd.Series:
        h = pd.util.hash_pandas_object(col, index=False).astype("uint64")
        return (h % B).astype("int64")

    dists = (
        docs.select_columns(["doc_id", "is_html", "wave"])
        .map_batches(node_rows, batch_format="pandas")
        .materialize()
    )
    edges = (
        docs.map_batches(edge_rows, batch_format="pyarrow")
        .map_batches(
            lambda df: df.assign(bucket=bucket_of(df["src"])),
            batch_format="pandas",
        )
        .materialize()
    )

    limit = SCC_DRIVER_EDGE_LIMIT if driver_limit is None else driver_limit
    if edges.count() <= limit:
        # small-graph cutover (the components/SCC pattern): a bounded
        # edge list collects and K-round Bellman–Ford runs in numpy —
        # the distributed rounds' materialize barriers cost ~7 s/round
        # even on a 100-page graph (measured 213 s at sf0.001).
        # Routes equality-pinned in tests/test_graph.py.
        eparts = list(edges.iter_batches(batch_format="pandas"))
        nparts = list(dists.iter_batches(batch_format="pandas"))
        nd = (
            pd.concat(nparts, ignore_index=True)
            if nparts
            else pd.DataFrame({"doc_id": [], "node": [], "dist": []})
        )
        ed = (
            pd.concat(eparts, ignore_index=True)
            if eparts
            else pd.DataFrame({"src": [], "dst": [], "w": []})
        )
        idx = {n: i for i, n in enumerate(nd["node"])}
        dist = nd["dist"].to_numpy().astype("int64").copy()
        keep = [s in idx and d in idx for s, d in zip(ed["src"], ed["dst"])]
        ed = ed[keep]
        si = np.array([idx[s] for s in ed["src"]], dtype="int64")
        di = np.array([idx[d] for d in ed["dst"]], dtype="int64")
        w = ed["w"].to_numpy().astype("int64")
        for _ in range(hop_cap):
            cand = dist[si] + w
            # suppress unreached sources (INF + w would wrap toward
            # other nodes' real distances at extreme weights)
            cand = np.where(dist[si] >= _SSSP_INF, _SSSP_INF, cand)
            new = dist.copy()
            np.minimum.at(new, di, cand)
            if (new == dist).all():
                break
            dist = new
        return rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": nd["doc_id"],
                    "dist": np.where(dist >= _SSSP_INF, -1, dist).astype(
                        "int64"
                    ),
                }
            )
        )

    def send(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["w"] < 0][["key", "dist"]]
        lab = lab[lab["dist"] < _SSSP_INF]  # unreached: no messages
        e = g[g["w"] >= 0][["key", "dst", "w"]].merge(lab, on="key")
        return pd.DataFrame(
            {
                "node": e["dst"],
                "doc_id": pd.array([""] * len(e), dtype="object"),
                "dist": (e["dist"] + e["w"]).astype("int64"),
                "is_self": np.zeros(len(e), dtype="int64"),
            }
        )

    def reduce_min(g: pd.DataFrame) -> pd.DataFrame:
        own = g[g["is_self"] == 1]
        new = g.groupby("node")["dist"].min()
        new = new.reindex(own["node"]).fillna(_SSSP_INF)
        better = np.minimum(own["dist"].to_numpy(), new.to_numpy())
        return pd.DataFrame(
            {
                "doc_id": own["doc_id"],
                "node": own["node"],
                "dist": better.astype("int64"),
                "chg": (better < own["dist"].to_numpy()).astype("int64"),
            }
        )

    for _round in range(hop_cap):

        def tag_d(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "key": df["node"],
                    "dst": pd.array([""] * len(df), dtype="object"),
                    "w": np.full(len(df), -1, dtype="int64"),
                    "dist": df["dist"].astype("int64"),
                    "bucket": bucket_of(df["node"]),
                }
            )

        def tag_e(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "key": df["src"],
                    "dst": df["dst"],
                    "w": df["w"].astype("int64"),
                    "dist": np.full(len(df), -1, dtype="int64"),
                    "bucket": df["bucket"].astype("int64"),
                }
            )

        msgs = (
            dists.map_batches(tag_d, batch_format="pandas")
            .union(edges.map_batches(tag_e, batch_format="pandas"))
            .groupby("bucket")
            .map_groups(send, batch_format="pandas")
        )

        def tag_self(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "node": df["node"],
                    "doc_id": df["doc_id"],
                    "dist": df["dist"].astype("int64"),
                    "is_self": np.ones(len(df), dtype="int64"),
                }
            )

        def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            out["bucket"] = bucket_of(out["node"])
            return out

        new_dists = (
            msgs.union(dists.map_batches(tag_self, batch_format="pandas"))
            .map_batches(with_bucket, batch_format="pandas")
            .groupby("bucket")
            .map_groups(reduce_min, batch_format="pandas")
            .materialize()
        )
        changed = int(
            new_dists.map_batches(
                lambda df: pd.DataFrame({"c": [int(df["chg"].sum())]}),
                batch_format="pandas",
            )
            .to_pandas()["c"]
            .sum()
        )
        dists = new_dists.select_columns(["doc_id", "node", "dist"])
        if changed == 0:
            break

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        d = df["dist"].to_numpy()
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "dist": np.where(d >= _SSSP_INF, -1, d).astype("int64"),
            }
        )

    return dists.map_batches(finish, batch_format="pandas")


def crawl_sssp(sf_dir: str) -> rd.Dataset:
    """queries() entry: cheapest ≤15-hop link path from each host's
    seed to every crawled page, edge cost = rewritten-link string
    length. Full SQL oracle: bounded-hop recursive path enumeration
    over the shared reach CTE with MIN-per-node."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return sssp_from_docs(crawl_docs(sf_dir))


COCITATION_MIN_COMMON = 2


def _host_page_edges(docs: rd.Dataset) -> rd.Dataset:
    """Distinct same-host directed page edges (host, s, t) with
    integer page ids — the shared front end of the link-similarity
    family (cocitation, link-Jaccard). Self-loops dropped; one page's
    spans arrive in one row, so batch-local dedup already makes the
    edge set globally distinct (a directed edge originates only from
    its source page's document row)."""
    import re

    page_re = re.compile(r"/p(\d+)\.html$")

    def edge_rows(t: pa.Table) -> pa.Table:
        hosts, s_, t_ = [], [], []
        for doc_id, host, is_html, spans in zip(
            t.column("doc_id").to_pylist(),
            t.column("host").to_pylist(),
            t.column("is_html").to_pylist(),
            t.column("spans").to_pylist(),
        ):
            if not is_html:
                continue
            m = page_re.search(posixpath.normpath(doc_id))
            if not m:
                continue
            j = int(m.group(1))
            for s in spans:
                if s["kind"] != "link":
                    continue
                tgt = resolve_link(doc_id, s["media_ref"])
                mt = page_re.search(tgt)
                if not mt:
                    continue
                if tgt.split("/", 1)[0] != host:
                    continue
                k = int(mt.group(1))
                if k == j:
                    continue
                hosts.append(host)
                s_.append(j)
                t_.append(k)
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "s": pa.array(s_, pa.int64()),
                "t": pa.array(t_, pa.int64()),
            }
        )

    def batch_dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["host", "s", "t"])

    return docs.map_batches(edge_rows, batch_format="pyarrow").map_batches(
        batch_dedup, batch_format="pandas"
    )


def cocitation_from_docs(
    docs: rd.Dataset, min_common: int = COCITATION_MIN_COMMON
) -> rd.Dataset:
    """(host, a, b, n_common): co-citation similarity of each host's
    directed page-link graph — pairs of pages a<b cited together by
    ≥ ``min_common`` common source pages (Small 1973, public; the
    link-structure near-dup signal that needs no page content).

    Plan — the wedge-emission vocabulary ``triangles_from_docs``
    established, minus the closing probe AND minus its edge-dedup
    exchange: a directed edge (s, t) originates only from page s's
    single document row, so batch-local dedup already makes the edge
    set globally distinct (triangles needed the exchange because its
    undirected orientation collects each edge from both endpoints).
    (1) extract distinct directed edges per batch (self-loops
    dropped — a page citing itself co-cites nothing); (2) group by
    source-hash bucket and emit each (host, source)'s distinct
    out-neighbor pairs — O(outdeg²) per source, bounded by page size
    at web scale (a source citing d pages emits d(d−1)/2 wedges; cap
    or sample sources with pathological fanout the same way the
    triangle plan orients by degree); (3) one bucketed count per
    (host, a, b) pair, thresholded group-locally so the exchange's
    output is only the qualifying pairs. Two exchanges total, no
    driver state at any step."""
    from suckit_ray.stages.agg import bucketed_groupby_agg, default_buckets

    B = default_buckets()

    def add_sb(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["sb"] = (out["s"].astype("int64") % B).astype("int64")
        return out

    def cocite_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Distinct out-neighbor pairs per (host, s) — one vectorized
        self-merge per bucket, same as the triangle wedge build."""
        lhs = g[["host", "s", "t"]]
        m = lhs.merge(lhs, on=["host", "s"], suffixes=("_x", "_y"))
        m = m[m["t_x"] < m["t_y"]]
        return pd.DataFrame(
            {
                "host": m["host"],
                "a": m["t_x"].astype("int64"),
                "b": m["t_y"].astype("int64"),
            }
        )

    pairs = (
        _host_page_edges(docs)
        .map_batches(add_sb, batch_format="pandas")
        .groupby("sb")
        .map_groups(cocite_pairs, batch_format="pandas")
    )
    counted = bucketed_groupby_agg(
        pairs, keys=["host", "a", "b"], aggs={"n_common": ("a", "count")}
    )
    return counted.map_batches(
        lambda df: df[df["n_common"] >= min_common],
        batch_format="pandas",
    )


def crawl_cocitation(sf_dir: str) -> rd.Dataset:
    """queries() entry: co-cited page pairs (≥2 common citing pages)
    of the flagship crawl's link graph. Full SQL oracle: edge
    self-join on the shared reach CTE."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return cocitation_from_docs(crawl_docs(sf_dir))


LINK_JACCARD_NUM, LINK_JACCARD_DEN = 1, 3  # keep pairs with J >= 1/3


def link_jaccard_from_docs(
    docs: rd.Dataset,
    num: int = LINK_JACCARD_NUM,
    den: int = LINK_JACCARD_DEN,
) -> rd.Dataset:
    """(host, a, b, n_common, jaccard_micro): page pairs whose
    OUT-link sets overlap with Jaccard >= num/den — the structural
    near-dup signal over link sets rather than content (template
    pages, mirrored sections, and nav boilerplate cluster here even
    when their text differs). Co-citation pairs TARGETS by shared
    source; this pairs SOURCES by shared target and normalizes by the
    exact union size, gated all-integer (den·|∩| >= num·(dA+dB−|∩|))
    so both engines select the identical set.

    Plan — three bounded exchanges, no driver state: (1) a source-hash
    co-group attaches each page's exact out-degree to its edge rows
    (the degree rides the row, the q17 attach idiom — never an
    O(pages) broadcast); (2) a target-hash co-group self-merges each
    target's in-neighbors into source pairs, partial-counted
    group-locally (O(indeg²) per target — at web scale cap or orient
    pathological in-fanout exactly like the triangle plan); (3) one
    bucketed sum per (host, a, b) with the constant degrees riding as
    min, then the threshold + micro-ratio close group-locally so only
    qualifying pairs leave the final stage."""
    from suckit_ray.stages.agg import bucketed_groupby_agg, default_buckets

    B = default_buckets()

    def add_sb(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["sb"] = (out["s"].astype("int64") % B).astype("int64")
        return out

    def attach_degree(g: pd.DataFrame) -> pd.DataFrame:
        out = g[["host", "s", "t"]].copy()
        out["d"] = (
            out.groupby(["host", "s"])["t"].transform("size").astype("int64")
        )
        out["tb"] = (out["t"].astype("int64") % B).astype("int64")
        return out

    def pair_partials(g: pd.DataFrame) -> pd.DataFrame:
        lhs = g[["host", "s", "t", "d"]]
        m = lhs.merge(lhs, on=["host", "t"], suffixes=("_x", "_y"))
        m = m[m["s_x"] < m["s_y"]]
        p = (
            m.groupby(
                ["host", "s_x", "s_y", "d_x", "d_y"], as_index=False
            ).size()
        )
        return pd.DataFrame(
            {
                "host": p["host"],
                "a": p["s_x"].astype("int64"),
                "b": p["s_y"].astype("int64"),
                "da": p["d_x"].astype("int64"),
                "db": p["d_y"].astype("int64"),
                "n": p["size"].astype("int64"),
            }
        )

    pairs = (
        _host_page_edges(docs)
        .map_batches(add_sb, batch_format="pandas")
        .groupby("sb")
        .map_groups(attach_degree, batch_format="pandas")
        .groupby("tb")
        .map_groups(pair_partials, batch_format="pandas")
    )
    counted = bucketed_groupby_agg(
        pairs,
        keys=["host", "a", "b"],
        aggs={
            "n_common": ("n", "sum"),
            "da": ("da", "min"),
            "db": ("db", "min"),
        },
    )

    def close(df: pd.DataFrame) -> pd.DataFrame:
        union = df["da"] + df["db"] - df["n_common"]
        keep = den * df["n_common"] >= num * union
        df, union = df[keep], union[keep]
        return pd.DataFrame(
            {
                "host": df["host"],
                "a": df["a"].astype("int64"),
                "b": df["b"].astype("int64"),
                "n_common": df["n_common"].astype("int64"),
                "jaccard_micro": (
                    (1_000_000 * df["n_common"]) // union
                ).astype("int64"),
            }
        )

    return counted.map_batches(close, batch_format="pandas")


def crawl_link_jaccard(sf_dir: str) -> rd.Dataset:
    """queries() entry: out-link-set Jaccard >= 1/3 page pairs of the
    flagship crawl's link graph. Full SQL oracle: degree + target
    self-join on the shared reach CTE."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return link_jaccard_from_docs(crawl_docs(sf_dir))


RA_MIN_COMMON = 2


def resource_allocation_from_docs(
    docs: rd.Dataset, min_common: int = RA_MIN_COMMON
) -> rd.Dataset:
    """(host, a, b, n_common, ra_nano): resource-allocation link
    prediction over each host's UNDIRECTED page graph (Zhou, Lü &
    Zhang 2009, public) — for non-adjacent pairs a<b sharing
    ≥ ``min_common`` neighbors, the RA index Σ_z 1/deg(z) over common
    neighbors z, carried exactly as Σ 1e9 // deg(z) (deg(z) ≥ 2 for
    any common neighbor, so every term is a positive integer). The
    pairs RA ranks highest are the edges most likely missing — the
    recrawl-seeding / related-pages signal.

    Plan — TWO exchanges, no driver state:
    (1) directed edges emitted BOTH ways into a center-hash co-group:
        all rows for neighbor-center z land in one group, so the
        within-group (host, z, x) dedup IS the global undirected
        dedup (no separate exchange), deg(z) is the group slice size,
        and the wedge emit attaches w = 1e9 // deg(z) to each of the
        O(deg²) neighbor pairs — the cocitation wedge shape with a
        weight column;
    (2) one bucketed (host, a, b) sum where normalized edge MARKER
        rows ride the SAME exchange as sum-of-indicator columns —
        n_common = Σ is_wedge, ra_nano = Σ w, edge_flag = Σ is_edge —
        and the group-local filter keeps non-adjacent pairs only (RA
        scores candidate links, not existing ones). The tagged-union
        trick referential_audit established: anti-join for free.

    The edge dataset feeds both legs, so it carries the plan's one
    materialize() barrier (three int/string columns, O(links) —
    object-store-spillable at scale; without it each sort-groupby
    pass re-executes the lazy crawl)."""
    from suckit_ray.stages.agg import bucketed_groupby_agg, default_buckets

    B = default_buckets()
    edges = _host_page_edges(docs).materialize()

    def both_ways(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "host": pd.concat([df["host"], df["host"]], ignore_index=True),
                "z": pd.concat([df["s"], df["t"]], ignore_index=True).astype(
                    "int64"
                ),
                "x": pd.concat([df["t"], df["s"]], ignore_index=True).astype(
                    "int64"
                ),
            }
        )
        out["zb"] = (out["z"] % B).astype("int64")
        return out

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["host", "z", "x"])
        deg = g.groupby(["host", "z"])["x"].transform("size")
        gw = g.assign(w=(1_000_000_000 // deg).astype("int64"))
        m = gw.merge(gw[["host", "z", "x"]], on=["host", "z"])
        m = m[m["x_x"] < m["x_y"]]
        return pd.DataFrame(
            {
                "host": m["host"],
                "a": m["x_x"].astype("int64"),
                "b": m["x_y"].astype("int64"),
                "w": m["w"].astype("int64"),
                "is_w": np.ones(len(m), dtype="int64"),
                "is_edge": np.zeros(len(m), dtype="int64"),
            }
        )

    def edge_markers(df: pd.DataFrame) -> pd.DataFrame:
        a = np.minimum(df["s"].to_numpy(), df["t"].to_numpy())
        b = np.maximum(df["s"].to_numpy(), df["t"].to_numpy())
        n = len(df)
        return pd.DataFrame(
            {
                "host": df["host"],
                "a": a.astype("int64"),
                "b": b.astype("int64"),
                "w": np.zeros(n, dtype="int64"),
                "is_w": np.zeros(n, dtype="int64"),
                "is_edge": np.ones(n, dtype="int64"),
            }
        )

    staged = (
        edges.map_batches(both_ways, batch_format="pandas")
        .groupby("zb")
        .map_groups(wedges, batch_format="pandas")
        .union(edges.map_batches(edge_markers, batch_format="pandas"))
    )
    agg = bucketed_groupby_agg(
        staged,
        keys=["host", "a", "b"],
        aggs={
            "n_common": ("is_w", "sum"),
            "ra_nano": ("w", "sum"),
            "edge_flag": ("is_edge", "sum"),
        },
    )
    return agg.map_batches(
        lambda df: df[
            (df["edge_flag"] == 0) & (df["n_common"] >= min_common)
        ][["host", "a", "b", "n_common", "ra_nano"]],
        batch_format="pandas",
    )


def crawl_resource_allocation(sf_dir: str) -> rd.Dataset:
    """queries() entry: RA link-prediction scores for non-adjacent
    same-host page pairs of the flagship crawl. Full SQL oracle:
    undirected degree + wedge self-join + NOT EXISTS adjacency filter
    over the shared reach CTE."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return resource_allocation_from_docs(crawl_docs(sf_dir))


_ANCHOR_RE = None  # compiled lazily in workers (module import stays light)


def anchor_text_from_docs(docs: rd.Dataset) -> rd.Dataset:
    """(doc_id, anchor, n_refs): the inbound anchor-text index — for
    every link TARGET, the visible anchor strings pointing at it with
    reference counts. The classic off-page relevance signal (anchor
    text describes the target better than the target describes
    itself); a search pipeline joins this against the page index.

    The span layout makes this a pure table scan: the splice scanner
    cuts a text span immediately AFTER each link span, so the anchor
    is the ``">…</a>`` head of the FOLLOWING span — no re-parse of the
    page, just a regex on span i+1. Multiplicity is preserved (a page
    linking the same target twice with the same anchor counts twice,
    matching the rendered tag count). One bucketed (target, anchor)
    count aggregation; the shuffle carries one small row per link
    span."""
    import re

    from suckit_ray.stages.agg import bucketed_groupby_agg

    anchor_re = re.compile(r'\A"?>([^<]*)</a>', re.IGNORECASE)

    def explode(t: pa.Table) -> pa.Table:
        targets, anchors = [], []
        for doc_id, is_html, spans in zip(
            t.column("doc_id").to_pylist(),
            t.column("is_html").to_pylist(),
            t.column("spans").to_pylist(),
        ):
            if not is_html:
                continue
            for i, s in enumerate(spans):
                if s["kind"] != "link":
                    continue
                m = (
                    anchor_re.match(spans[i + 1]["text"])
                    if i + 1 < len(spans) and spans[i + 1]["kind"] == "text"
                    else None
                )
                targets.append(resolve_link(doc_id, s["media_ref"]))
                anchors.append(m.group(1) if m else "")
        return pa.table(
            {
                "doc_id": pa.array(targets, pa.string()),
                "anchor": pa.array(anchors, pa.string()),
            }
        )

    rows = docs.map_batches(explode, batch_format="pyarrow")
    return bucketed_groupby_agg(
        rows.map_batches(
            lambda df: df.assign(n_refs=np.ones(len(df), dtype="int64")),
            batch_format="pandas",
        ),
        keys=["doc_id", "anchor"],
        aggs={"n_refs": ("n_refs", "sum")},
    )


def crawl_anchor_text(sf_dir: str) -> rd.Dataset:
    """queries() entry: inbound anchor-text index of the flagship
    mirror, hash-compared against the closed-form oracle (the
    synthetic corpus renders every anchor as 'link <raw candidate>',
    so the reach CTE regenerates (target, anchor, count) exactly)."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return anchor_text_from_docs(crawl_docs(sf_dir))


LPA_ROUNDS = 4


def lpa_communities_from_docs(
    docs: rd.Dataset, rounds: int = LPA_ROUNDS, num_buckets: int | None = None
) -> rd.Dataset:
    """(doc_id, community): SYNCHRONOUS label propagation over the
    undirected link multigraph (Raghavan/Albert/Kumara 2007, public),
    made deterministic — and therefore hash-oracle-able — by a fixed
    round count and a total tie order: each round every node adopts
    the most frequent label among its neighbors, ties broken by the
    LEXICOGRAPHICALLY SMALLEST label, isolated nodes keep their own.
    Community detection proper (dense blocks), where the components /
    near-dup machinery answers only reachability.

    Plan shape = ``_pagerank_plan``: the symmetric edge list (both
    directions of every link, multiplicity kept — parallel edges are
    double votes) materializes once; per round one src-bucket co-group
    attaches labels to out-edges and one dst-bucket co-group takes the
    per-node mode. Label payloads are node-id strings, so the shuffle
    carries (dst, label) pairs — same volume as a rank round."""
    from suckit_ray.stages.agg import default_buckets

    edges = _link_edges(docs).materialize()
    if num_buckets is None:
        num_buckets = max(2, min(default_buckets(), edges.count() // 10_000 + 1))
    B = num_buckets

    def bucket_of(col: pd.Series) -> pd.Series:
        h = pd.util.hash_pandas_object(col, index=False).astype("uint64")
        return (h % B).astype("int64")

    sym = (
        edges.map_batches(
            lambda df: pd.concat(
                [
                    pd.DataFrame({"u": df["src"], "v": df["dst"]}),
                    pd.DataFrame({"u": df["dst"], "v": df["src"]}),
                ],
                ignore_index=True,
            ).assign(bucket=lambda d: bucket_of(d["u"])),
            batch_format="pandas",
        )
        .repartition(B)
        .materialize()
    )

    def nodes_of(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = t.filter(pc.field("is_html"))
        return pa.table(
            {
                "node": pa.array(
                    [posixpath.normpath(d) for d in keep.column("doc_id").to_pylist()],
                    pa.string(),
                )
            }
        )

    labels = (
        docs.map_batches(nodes_of, batch_format="pyarrow")
        .map_batches(
            lambda df: pd.DataFrame({"node": df["node"], "lab": df["node"]}),
            batch_format="pandas",
        )
        .repartition(B)
        .materialize()
    )

    def as_label_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "u": df["node"],
                "v": "",  # self marker
                "lab": df["lab"],
                "bucket": bucket_of(df["node"]),
            }
        )

    def as_edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "u": df["u"],
                "v": df["v"],
                "lab": "",
                "bucket": df["bucket"].astype("int64"),
            }
        )

    def send(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["v"] == ""][["u", "lab"]]
        a = g[g["v"] != ""][["u", "v"]].merge(lab, on="u")
        msgs = pd.DataFrame(
            {"node": a["v"], "lab": a["lab"], "is_self": np.zeros(len(a), "int64")}
        )
        selfs = pd.DataFrame(
            {"node": lab["u"], "lab": lab["lab"],
             "is_self": np.ones(len(lab), "int64")}
        )
        return pd.concat([msgs, selfs], ignore_index=True)

    def mode_reduce(g: pd.DataFrame) -> pd.DataFrame:
        present = set(g.loc[g["is_self"] == 1, "node"])
        m = g[(g["is_self"] == 0) & g["node"].isin(present)]
        counts = (
            m.groupby(["node", "lab"], as_index=False)
            .size()
            .sort_values(["node", "size", "lab"], ascending=[True, False, True])
        )
        win = counts.drop_duplicates("node", keep="first")[["node", "lab"]]
        keep = g[g["is_self"] == 1][["node", "lab"]].rename(columns={"lab": "own"})
        out = keep.merge(win, on="node", how="left")
        return pd.DataFrame(
            {"node": out["node"], "lab": out["lab"].fillna(out["own"])}
        )

    edge_rows = sym.map_batches(as_edge_rows, batch_format="pandas")
    for _ in range(rounds):
        staged = labels.map_batches(as_label_rows, batch_format="pandas").union(
            edge_rows
        )
        msgs = staged.groupby("bucket").map_groups(send, batch_format="pandas")
        labels = (
            msgs.map_batches(
                lambda df: df.assign(bucket=bucket_of(df["node"])),
                batch_format="pandas",
            )
            .groupby("bucket")
            .map_groups(mode_reduce, batch_format="pandas")
            .repartition(B)
            .materialize()
        )
    return labels.map_batches(
        lambda df: pd.DataFrame({"doc_id": df["node"], "community": df["lab"]}),
        batch_format="pandas",
    )


def crawl_communities_lpa(sf_dir: str) -> rd.Dataset:
    """queries() entry: 4-round deterministic LPA communities of the
    flagship mirror — hash-compared against the unrolled mode-CTE
    oracle (ROW_NUMBER over per-neighbor-label counts)."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return lpa_communities_from_docs(crawl_docs(sf_dir))


# ---------------------------------------------------------------------------
# per-host dense-kernel scale routing (VERDICT r3 item 2)
# ---------------------------------------------------------------------------
# The whole-graph-per-host kernels (bowtie closure, closeness /
# distance-stats matrix BFS, betweenness counting, simrank matmuls) do
# O(m²)–O(m³) work INSIDE one host's co-group: exact and oracle-green
# at politeness-capped crawl scale, intractable on a 10^7-page host.
# Above this per-host node bound each kernel routes to its scale
# variant instead of silently grinding:
#   bowtie        → sparse EXACT (Kosaraju SCC + four frontier BFS,
#                   O(m+e) — same answer, no closure matrix)
#   closeness     → pivot-sampled farness (Eppstein & Wang 2004,
#                   public: K pivots give additive error O(Δ·√(log m/K))
#                   on dist_sum whp; exact when K ≥ m)
#   distance_stats→ pivot-sampled distance histogram (same pivots;
#                   diameter becomes a lower bound — documented)
#   betweenness   → pivot-sampled Brandes (Brandes & Pich 2007,
#                   public: unbiased (m−1)/K-scaled dependency sums;
#                   float accumulators, floored to micro at the end)
#   simrank       → Jeh–Widom §5 Monte-Carlo reverse-walk meeting
#                   estimator over the top-GRAPH_PIVOTS in-degree
#                   pair space (bounded output for giant hosts)
# Every kernel takes ``exact_node_limit`` so tests force the scale
# route on small graphs and pin it against the exact route.
HOST_EXACT_NODE_LIMIT = 1500
GRAPH_PIVOTS = 64


def _group_arrays(
    g: pd.DataFrame,
) -> tuple[np.ndarray, dict[int, int], np.ndarray, np.ndarray]:
    """(nodes, idx, s_idx, t_idx) of a _host_graph_staged group:
    sorted node ids, id→dense index, and edge endpoint index arrays."""
    nodes = np.sort(g.loc[g["s"] < 0, "j"].unique())
    idx = {int(n): i for i, n in enumerate(nodes)}
    e = g[g["s"] >= 0]
    s_idx = np.array([idx[int(x)] for x in e["s"]], dtype=np.int64)
    t_idx = np.array([idx[int(x)] for x in e["t"]], dtype=np.int64)
    return nodes, idx, s_idx, t_idx


def _csr(m: int, s_idx: np.ndarray, t_idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """CSR adjacency (indptr, nbrs) with neighbor lists sorted by id —
    numpy only, O(e log e)."""
    order = np.lexsort((t_idx, s_idx))
    s_sorted, t_sorted = s_idx[order], t_idx[order]
    indptr = np.zeros(m + 1, dtype=np.int64)
    np.add.at(indptr, s_sorted + 1, 1)
    np.cumsum(indptr, out=indptr)
    return indptr, t_sorted


def _bfs_csr(indptr: np.ndarray, nbrs: np.ndarray, src: int, m: int) -> np.ndarray:
    """Distances (length ≥ 1 semantics like the matrix kernels: the
    source itself is 0) from ``src`` over a CSR graph; −1 unreachable.
    Sparse frontier expansion — O(m+e) per call."""
    dist = np.full(m, -1, dtype=np.int64)
    dist[src] = 0
    frontier = np.array([src], dtype=np.int64)
    d = 0
    while len(frontier):
        d += 1
        # gather all neighbor slices of the frontier, vectorized
        starts, ends = indptr[frontier], indptr[frontier + 1]
        total = int((ends - starts).sum())
        if not total:
            break
        out = np.concatenate(
            [nbrs[a:b] for a, b in zip(starts, ends)]
        )
        out = np.unique(out)
        out = out[dist[out] < 0]
        dist[out] = d
        frontier = out
    return dist


def _pick_pivots(m: int, k: int, salt: int = 0) -> np.ndarray:
    """K deterministic pivot indices: splitmix64-hash order over the
    dense index space — uniform-ish, reproducible, machine-independent."""
    from suckit_ray.stages.sketch import _splitmix64

    if k >= m:
        return np.arange(m, dtype=np.int64)
    h = _splitmix64(np.arange(m, dtype=np.uint64) + np.uint64(salt * 2654435761 + 1))
    return np.sort(np.argsort(h)[:k].astype(np.int64))


def bowtie_from_docs(
    docs: rd.Dataset, exact_node_limit: int = HOST_EXACT_NODE_LIMIT
) -> rd.Dataset:
    """(host, cls, n_nodes): the Broder et al. 2000 ("Graph structure
    in the web", WWW — public) bow-tie decomposition of each host's
    directed page-link graph around its LARGEST strongly-connected
    component (ties on size break toward the smaller min-member id,
    the ``crawl_scc`` scc_id convention):

    - ``CORE``         the largest SCC
    - ``IN``           reaches CORE, not in it
    - ``OUT``          reachable from CORE, not in it
    - ``TUBE``         reachable from IN and reaches OUT, avoiding CORE
    - ``TENDRIL_IN``   reachable from IN only
    - ``TENDRIL_OUT``  reaches OUT only
    - ``DISC``         none of the above

    The crawl's link graph is host-partitioned by construction (links
    never cross hosts), so the natural plan is ONE groupby(host) with
    per-group boolean-matrix transitive closure (repeated squaring,
    O(log diameter) matmuls) — exactly the oracle's closure CTE, so
    every set is exact. Per-group work is O(m³ log m) in host page
    count: bounded for politeness-capped crawls; above
    ``exact_node_limit`` nodes the group kernel routes to the SPARSE
    EXACT decomposition — iterative Kosaraju SCC + four multi-source
    frontier BFS reach sets, O(m+e), SAME answer (equality-pinned in
    tests) — so a giant host degrades in constant factor, not in
    complexity class."""

    def classify_sparse(
        host, nodes, m: int, s_idx: np.ndarray, t_idx: np.ndarray
    ) -> pd.DataFrame:
        fwd_ptr, fwd_nbr = _csr(m, s_idx, t_idx)
        rev_ptr, rev_nbr = _csr(m, t_idx, s_idx)
        # iterative Kosaraju: forward DFS finish order, then reverse
        # DFS in reverse finish order assigns components
        visited = np.zeros(m, dtype=bool)
        finish: list[int] = []
        for start in range(m):
            if visited[start]:
                continue
            stack = [(start, int(fwd_ptr[start]))]
            visited[start] = True
            while stack:
                u, ptr = stack[-1]
                if ptr < fwd_ptr[u + 1]:
                    stack[-1] = (u, ptr + 1)
                    v = int(fwd_nbr[ptr])
                    if not visited[v]:
                        visited[v] = True
                        stack.append((v, int(fwd_ptr[v])))
                else:
                    finish.append(u)
                    stack.pop()
        comp = np.full(m, -1, dtype=np.int64)
        for u in reversed(finish):
            if comp[u] >= 0:
                continue
            stack2 = [u]
            comp[u] = u
            while stack2:
                x = stack2.pop()
                for v in rev_nbr[rev_ptr[x]: rev_ptr[x + 1]]:
                    v = int(v)
                    if comp[v] < 0:
                        comp[v] = u
                        stack2.append(v)
        # scc_id = min node id in the component (the crawl_scc rule).
        # Vectorized (review finding: a per-component full scan is
        # O(m·#SCCs) — quadratic on mostly-acyclic hosts where nearly
        # every page is its own singleton SCC)
        uniq, inv = np.unique(comp, return_inverse=True)
        minid = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(minid, inv, nodes)
        scc_id = minid[inv]
        counts = np.bincount(inv)
        core_id = minid[np.lexsort((minid, -counts))[0]]  # size desc, id asc
        core = scc_id == core_id

        def reach(ptr, nbr, seeds: np.ndarray) -> np.ndarray:
            reached = np.zeros(m, dtype=bool)
            frontier = seeds
            while len(frontier):
                starts, ends = ptr[frontier], ptr[frontier + 1]
                if not int((ends - starts).sum()):
                    break
                out = np.unique(
                    np.concatenate(
                        [nbr[a:b] for a, b in zip(starts, ends)]
                    )
                )
                out = out[~reached[out]]
                reached[out] = True
                frontier = out
            return reached

        core_seeds = np.nonzero(core)[0].astype(np.int64)
        f = core | reach(fwd_ptr, fwd_nbr, core_seeds)
        b = core | reach(rev_ptr, rev_nbr, core_seeds)
        in_ = b & ~f
        out = f & ~b
        rest = ~(f | b)
        from_in = reach(fwd_ptr, fwd_nbr, np.nonzero(in_)[0].astype(np.int64))
        to_out = reach(rev_ptr, rev_nbr, np.nonzero(out)[0].astype(np.int64))
        cls = np.where(
            f & b,
            "CORE",
            np.where(
                in_,
                "IN",
                np.where(
                    out,
                    "OUT",
                    np.where(
                        rest & from_in & to_out,
                        "TUBE",
                        np.where(
                            rest & from_in,
                            "TENDRIL_IN",
                            np.where(rest & to_out, "TENDRIL_OUT", "DISC"),
                        ),
                    ),
                ),
            ),
        )
        u, c = np.unique(cls, return_counts=True)
        return pd.DataFrame(
            {
                "host": [host] * len(u),
                "cls": u,
                "n_nodes": c.astype("int64"),
            }
        )

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        host = g["host"].iloc[0]
        nodes = np.unique(
            np.concatenate([g["j"].to_numpy(), g["s"].to_numpy(), g["t"].to_numpy()])
        )
        nodes = nodes[nodes >= 0]
        idx = {int(n): i for i, n in enumerate(nodes)}
        m = len(nodes)
        e = g[g["s"] >= 0]
        if m > exact_node_limit:
            s_idx = np.array([idx[int(x)] for x in e["s"]], dtype=np.int64)
            t_idx = np.array([idx[int(x)] for x in e["t"]], dtype=np.int64)
            return classify_sparse(host, nodes, m, s_idx, t_idx)
        A = np.zeros((m, m), dtype=bool)
        if len(e):
            A[
                [idx[int(x)] for x in e["s"]],
                [idx[int(x)] for x in e["t"]],
            ] = True
        # transitive closure by repeated squaring (no reflexive seed:
        # R[i,j] = path of length >= 1, matching the SQL tc CTE)
        R = A.copy()
        while True:
            R2 = R | (R @ R)
            if (R2 == R).all():
                break
            R = R2
        mutual = R & R.T
        # scc_id(j) = min(j, min mutual partner) — crawl_scc's lab CTE
        scc_id = nodes.copy()
        for i in range(m):
            p = np.nonzero(mutual[i])[0]
            if len(p):
                scc_id[i] = min(scc_id[i], nodes[p].min())
        sizes: dict[int, int] = {}
        for sid in scc_id:
            sizes[int(sid)] = sizes.get(int(sid), 0) + 1
        core_id = min(sizes, key=lambda s: (-sizes[s], s))
        core = scc_id == core_id
        f = core | (R[core].any(axis=0) if core.any() else np.zeros(m, bool))
        b = core | (R[:, core].any(axis=1) if core.any() else np.zeros(m, bool))
        in_ = b & ~f
        out = f & ~b
        rest = ~(f | b)
        from_in = R[in_].any(axis=0) if in_.any() else np.zeros(m, bool)
        to_out = R[:, out].any(axis=1) if out.any() else np.zeros(m, bool)
        cls = np.where(
            f & b,
            "CORE",
            np.where(
                in_,
                "IN",
                np.where(
                    out,
                    "OUT",
                    np.where(
                        rest & from_in & to_out,
                        "TUBE",
                        np.where(
                            rest & from_in,
                            "TENDRIL_IN",
                            np.where(rest & to_out, "TENDRIL_OUT", "DISC"),
                        ),
                    ),
                ),
            ),
        )
        u, c = np.unique(cls, return_counts=True)
        return pd.DataFrame(
            {
                "host": [host] * len(u),
                "cls": u,
                "n_nodes": c.astype("int64"),
            }
        )

    return (
        _host_graph_staged(docs)
        .groupby("host")
        .map_groups(classify, batch_format="pandas")
    )


def _host_graph_staged(docs: rd.Dataset) -> rd.Dataset:
    """Per-host node + edge rows staged into one unionable layout for
    a host co-group: node rows (host, j, -1, -1) for every crawled
    page, edge rows (host, -1, s, t) from the distinct directed link
    graph — isolated crawled pages survive into the group. Shared by
    the whole-graph-per-host kernels (bowtie, closeness)."""
    import re

    page_re = re.compile(r"/p(\d+)\.html$")

    def node_rows(t: pa.Table) -> pd.DataFrame:
        hosts, js = [], []
        for doc_id, host, is_html in zip(
            t.column("doc_id").to_pylist(),
            t.column("host").to_pylist(),
            t.column("is_html").to_pylist(),
        ):
            if not is_html:
                continue
            m = page_re.search(posixpath.normpath(doc_id))
            if not m:
                continue
            hosts.append(host)
            js.append(int(m.group(1)))
        n = len(hosts)
        # pandas block: the edge leg is pandas and a mixed-format
        # union breaks the downstream groupby's group slicing
        return pd.DataFrame(
            {
                "host": pd.array(hosts, dtype="object"),
                "j": pd.array(js, dtype="int64"),
                "s": pd.array([-1] * n, dtype="int64"),
                "t": pd.array([-1] * n, dtype="int64"),
            }
        )

    return (
        docs.select_columns(["doc_id", "host", "is_html"])
        .map_batches(node_rows, batch_format="pyarrow", batch_size=None)
        .union(
            _host_page_edges(docs).map_batches(
                lambda df: pd.DataFrame(
                    {
                        "host": df["host"],
                        "j": np.full(len(df), -1, dtype="int64"),
                        "s": df["s"].astype("int64"),
                        "t": df["t"].astype("int64"),
                    }
                ),
                batch_format="pandas",
            )
        )
    )


def closeness_from_docs(
    docs: rd.Dataset,
    exact_node_limit: int = HOST_EXACT_NODE_LIMIT,
    pivots: int = GRAPH_PIVOTS,
) -> rd.Dataset:
    """(host, page, n_reach, dist_sum, closeness_ppm): DIRECTED
    closeness centrality of every crawled page within its host's
    link graph — n_reach/dist_sum over BFS shortest distances to the
    other reachable pages (self excluded even under cycles), and the
    Wasserman–Faust disconnected-graph normalization in exact ppm:

        closeness_ppm = (n_reach² · 1e6) / (dist_sum · (m_host − 1))

    truncated (numerator non-negative, so floor == trunc == DuckDB
    ``//``); isolated pages score 0. Bavelas 1950 / Wasserman–Faust
    1994 (public).

    Plan: the bow-tie plan's host co-group, but the group kernel is
    LEVEL-SYNCHRONOUS matrix BFS (R_{k+1} = R_k ∨ R_k·A, new entries
    get distance k+1 — O(diameter) boolean matmuls) instead of the
    closure's repeated squaring, because distances, not reachability,
    are the output. Per-group work is O(m³·diam/64) bit-ops in host
    page count — bounded for politeness-capped crawls; above
    ``exact_node_limit`` nodes the kernel routes to PIVOT-SAMPLED
    farness (Eppstein & Wang 2004, public): K reverse-BFS passes from
    deterministic pivot targets, n_reach/dist_sum scaled by
    (m−1)/|pivots∖{v}| then floored — additive error O(Δ·√(log m/K))
    on dist_sum whp, EXACT when K ≥ m (the equality pin)."""

    def sampled(host, nodes, m, s_idx, t_idx) -> pd.DataFrame:
        rev_ptr, rev_nbr = _csr(m, t_idx, s_idx)
        piv = _pick_pivots(m, pivots, salt=1)
        is_piv = np.zeros(m, dtype=bool)
        is_piv[piv] = True
        cnt = np.zeros(m, dtype=np.int64)
        sumd = np.zeros(m, dtype=np.int64)
        for t in piv:
            dist = _bfs_csr(rev_ptr, rev_nbr, int(t), m)
            ok = dist > 0  # v reaches t (self excluded: dist 0)
            cnt[ok] += 1
            sumd[ok] += dist[ok]
        k_v = np.where(is_piv, len(piv) - 1, len(piv))
        n_reach = np.zeros(m, dtype=np.int64)
        dist_sum = np.zeros(m, dtype=np.int64)
        pos = k_v > 0
        n_reach[pos] = (cnt[pos] * (m - 1)) // k_v[pos]
        dist_sum[pos] = (sumd[pos] * (m - 1)) // k_v[pos]
        ppm = [
            (int(r) * int(r) * 1_000_000) // (int(s) * (m - 1))
            if s > 0 and m > 1
            else 0
            for r, s in zip(n_reach, dist_sum)
        ]
        return pd.DataFrame(
            {
                "host": [host] * m,
                "page": nodes.astype("int64"),
                "n_reach": n_reach,
                "dist_sum": dist_sum,
                "closeness_ppm": pd.array(ppm, dtype="int64"),
            }
        )

    def distances(g: pd.DataFrame) -> pd.DataFrame:
        host = g["host"].iloc[0]
        nodes, idx, s_idx, t_idx = _group_arrays(g)
        m = len(nodes)
        if m > exact_node_limit:
            return sampled(host, nodes, m, s_idx, t_idx)
        A = np.zeros((m, m), dtype=bool)
        A[s_idx, t_idx] = True
        R = A.copy()
        D = np.where(A, 1, 0).astype(np.int64)
        d = 1
        while True:
            new = (R @ A) & ~R
            if not new.any():
                break
            d += 1
            D[new] = d
            R |= new
        off = ~np.eye(m, dtype=bool)
        n_reach = (R & off).sum(axis=1).astype(np.int64)
        dist_sum = np.where(R & off, D, 0).sum(axis=1).astype(np.int64)
        # exact ppm in Python ints: reach²·1e6 outgrows int64 on
        # million-page hosts
        ppm = [
            (int(r) * int(r) * 1_000_000) // (int(s) * (m - 1))
            if s > 0 and m > 1
            else 0
            for r, s in zip(n_reach, dist_sum)
        ]
        return pd.DataFrame(
            {
                "host": [host] * m,
                "page": nodes.astype("int64"),
                "n_reach": n_reach,
                "dist_sum": dist_sum,
                "closeness_ppm": pd.array(ppm, dtype="int64"),
            }
        )

    return (
        _host_graph_staged(docs)
        .groupby("host")
        .map_groups(distances, batch_format="pandas")
    )


def harmonic_from_docs(
    docs: rd.Dataset,
    exact_node_limit: int = HOST_EXACT_NODE_LIMIT,
    pivots: int = GRAPH_PIVOTS,
) -> rd.Dataset:
    """(host, page, n_reach, harmonic_micro): DIRECTED harmonic
    centrality of every crawled page within its host's link graph —

        harmonic_micro(v) = Σ_{t reachable, t≠v} 10⁶ // d(v,t)

    (per-term integer floor, so the bounded-BFS SQL oracle matches bit
    for bit). Harmonic centrality is the disconnected-graph-robust
    closeness variant (Boldi & Vigna, "Axioms for centrality", 2014 —
    public): unreachable pairs contribute 0 instead of poisoning a
    reciprocal-of-sum, so no Wasserman–Faust correction is needed.

    Plan: the closeness kernel's host co-group and level-synchronous
    matrix BFS, with the reduction swapped. Above ``exact_node_limit``
    nodes: the same pivot-sampled route (Eppstein–Wang over reverse
    BFS targets), sums scaled by (m−1)/|pivots∖{v}| then floored —
    EXACT when K ≥ m (the equality pin)."""

    def sampled(host, nodes, m, s_idx, t_idx) -> pd.DataFrame:
        rev_ptr, rev_nbr = _csr(m, t_idx, s_idx)
        piv = _pick_pivots(m, pivots, salt=4)
        is_piv = np.zeros(m, dtype=bool)
        is_piv[piv] = True
        cnt = np.zeros(m, dtype=np.int64)
        hsum = np.zeros(m, dtype=np.int64)
        for t in piv:
            dist = _bfs_csr(rev_ptr, rev_nbr, int(t), m)
            ok = dist > 0
            cnt[ok] += 1
            hsum[ok] += 1_000_000 // dist[ok]
        k_v = np.where(is_piv, len(piv) - 1, len(piv))
        n_reach = np.zeros(m, dtype=np.int64)
        harm = np.zeros(m, dtype=np.int64)
        pos = k_v > 0
        n_reach[pos] = (cnt[pos] * (m - 1)) // k_v[pos]
        harm[pos] = (hsum[pos] * (m - 1)) // k_v[pos]
        return pd.DataFrame(
            {
                "host": [host] * m,
                "page": nodes.astype("int64"),
                "n_reach": n_reach,
                "harmonic_micro": harm,
            }
        )

    def harmonic(g: pd.DataFrame) -> pd.DataFrame:
        host = g["host"].iloc[0]
        nodes, idx, s_idx, t_idx = _group_arrays(g)
        m = len(nodes)
        if m > exact_node_limit:
            return sampled(host, nodes, m, s_idx, t_idx)
        A = np.zeros((m, m), dtype=bool)
        A[s_idx, t_idx] = True
        R = A.copy()
        D = np.where(A, 1, 0).astype(np.int64)
        d = 1
        while True:
            new = (R @ A) & ~R
            if not new.any():
                break
            d += 1
            D[new] = d
            R |= new
        off = ~np.eye(m, dtype=bool)
        pairs = R & off
        n_reach = pairs.sum(axis=1).astype(np.int64)
        terms = np.where(pairs, 1_000_000 // np.maximum(D, 1), 0)
        harm = terms.sum(axis=1).astype(np.int64)
        return pd.DataFrame(
            {
                "host": [host] * m,
                "page": nodes.astype("int64"),
                "n_reach": n_reach,
                "harmonic_micro": harm,
            }
        )

    return (
        _host_graph_staged(docs)
        .groupby("host")
        .map_groups(harmonic, batch_format="pandas")
    )


def crawl_harmonic(sf_dir: str) -> rd.Dataset:
    """queries() entry: per-page harmonic centrality of the flagship
    crawl. Full SQL oracle: the closeness BFS CTE with the reduction
    swapped to SUM(1e6 // d)."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return harmonic_from_docs(crawl_docs(sf_dir))


def distance_stats_from_docs(
    docs: rd.Dataset,
    exact_node_limit: int = HOST_EXACT_NODE_LIMIT,
    pivots: int = GRAPH_PIVOTS,
) -> rd.Dataset:
    """(host, n_pages, n_pairs, median_dist, eff_diameter_90,
    diameter): each host's directed shortest-path distance
    distribution — over all ordered reachable pairs (s ≠ t):
    the median distance (lower median: smallest d with 2·cum ≥ n),
    the 90%-effective diameter (smallest d with 10·cum ≥ 9·n — the
    integer form of the web-graph metric of Leskovec, Kleinberg &
    Faloutsos 2005, public), and the true diameter (max). All-integer
    rank rules, no interpolation, so the oracle mirrors them exactly.

    Plan: the closeness kernel's level-synchronous matrix BFS in the
    same host co-group, reduced to a distance HISTOGRAM per host —
    six small integer columns leave each group. Above
    ``exact_node_limit`` nodes: PIVOT-SAMPLED histogram — K forward
    BFS passes from deterministic pivot sources; median/eff90/diameter
    come from the sampled distribution (the rank rules are
    scale-invariant in the histogram, so uniform source sampling
    leaves them consistent; the diameter degrades to a LOWER BOUND),
    n_pairs is the (m/K)-scaled estimate. EXACT when K ≥ m."""

    def sampled(host, nodes, m, s_idx, t_idx) -> pd.DataFrame:
        fwd_ptr, fwd_nbr = _csr(m, s_idx, t_idx)
        piv = _pick_pivots(m, pivots, salt=2)
        hist: list[np.ndarray] = []
        for s in piv:
            dist = _bfs_csr(fwd_ptr, fwd_nbr, int(s), m)
            hist.append(dist[dist > 0])
        dists = (
            np.concatenate(hist) if hist else np.array([], dtype=np.int64)
        )
        observed = int(dists.size)
        n_pairs = (observed * m) // len(piv) if len(piv) else 0
        if observed:
            counts = np.bincount(dists)
            cum = np.cumsum(counts)
            median = int(np.searchsorted(cum * 2, observed, side="left"))
            eff90 = int(np.searchsorted(cum * 10, 9 * observed, side="left"))
            diam = int(dists.max())
        else:
            median = eff90 = diam = 0
        return pd.DataFrame(
            {
                "host": [host],
                "n_pages": pd.array([m], dtype="int64"),
                "n_pairs": pd.array([n_pairs], dtype="int64"),
                "median_dist": pd.array([median], dtype="int64"),
                "eff_diameter_90": pd.array([eff90], dtype="int64"),
                "diameter": pd.array([diam], dtype="int64"),
            }
        )

    def stats(g: pd.DataFrame) -> pd.DataFrame:
        host = g["host"].iloc[0]
        nodes, idx, s_idx, t_idx = _group_arrays(g)
        m = len(nodes)
        if m > exact_node_limit:
            return sampled(host, nodes, m, s_idx, t_idx)
        A = np.zeros((m, m), dtype=bool)
        A[s_idx, t_idx] = True
        R = A.copy()
        D = np.where(A, 1, 0).astype(np.int64)
        d = 1
        while True:
            new = (R @ A) & ~R
            if not new.any():
                break
            d += 1
            D[new] = d
            R |= new
        off = ~np.eye(m, dtype=bool)
        dists = D[R & off]
        n_pairs = int(dists.size)
        if n_pairs:
            counts = np.bincount(dists)
            cum = np.cumsum(counts)
            median = int(np.searchsorted(cum * 2, n_pairs, side="left"))
            eff90 = int(np.searchsorted(cum * 10, 9 * n_pairs, side="left"))
            diam = int(dists.max())
        else:
            median = eff90 = diam = 0
        return pd.DataFrame(
            {
                "host": [host],
                "n_pages": pd.array([m], dtype="int64"),
                "n_pairs": pd.array([n_pairs], dtype="int64"),
                "median_dist": pd.array([median], dtype="int64"),
                "eff_diameter_90": pd.array([eff90], dtype="int64"),
                "diameter": pd.array([diam], dtype="int64"),
            }
        )

    return (
        _host_graph_staged(docs)
        .groupby("host")
        .map_groups(stats, batch_format="pandas")
    )


WALKS_PER_NODE = 2
WALK_LEN = 4


def walk_corpus_from_docs(
    docs: rd.Dataset,
    walks_per_node: int = WALKS_PER_NODE,
    walk_len: int = WALK_LEN,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """(anchor, walk_idx, path, n_steps): a DETERMINISTIC random-walk
    corpus over the crawl link graph — ``walks_per_node`` walks of up
    to ``walk_len`` edges from every page, the training input of
    DeepWalk / node2vec-style graph embeddings (Perozzi et al. 2014,
    public). Determinism: the walk RNG is a splitmix64 chain seeded
    from (node hash ⊕ walk index); each step picks
    out-neighbors-sorted-by-id[state mod outdeg] — so the corpus is
    reproducible run to run and machine to machine, which is what
    makes a SAMPLED operator testable (equality pins, edge-validity
    pins) without an oracle.

    Distributed plan: walk frontier rows live in the bucket of their
    CURRENT node; each of the ``walk_len`` rounds is ONE co-group of
    (frontier ∪ adjacency) where the step is a vectorized merge on
    (node, state mod outdeg) against the rank-numbered neighbor
    list — no per-walk Python loop; walks at dead ends ride through
    unchanged. O(walks) rows shuffle per round, one materialize per
    round (the iterative-plan rule)."""
    from suckit_ray.stages.sketch import _splitmix64

    edges = _link_edges(docs).materialize()
    if num_buckets is None:
        from suckit_ray.stages.agg import default_buckets

        num_buckets = max(2, min(default_buckets(), edges.count() // 10_000 + 1))
    B = num_buckets

    def bucket_of(col: pd.Series) -> pd.Series:
        h = pd.util.hash_pandas_object(col, index=False).astype("uint64")
        return (h % B).astype("int64")

    adj = (
        edges.map_batches(
            lambda df: pd.DataFrame(
                {
                    "key": df["src"],
                    "nbr": df["dst"],
                    "is_adj": np.ones(len(df), dtype="int64"),
                    "anchor": "",
                    "walk_idx": np.zeros(len(df), dtype="int64"),
                    "state": np.zeros(len(df), dtype="int64"),
                    "path": "",
                    "n_steps": np.zeros(len(df), dtype="int64"),
                    "bucket": bucket_of(df["src"]),
                }
            ),
            batch_format="pandas",
        )
        .repartition(B)
        .materialize()
    )

    def nodes_of(t: pa.Table) -> pd.DataFrame:
        keep = [
            posixpath.normpath(d)
            for d, h in zip(
                t.column("doc_id").to_pylist(), t.column("is_html").to_pylist()
            )
            if h
        ]
        return pd.DataFrame({"node": pd.array(keep, dtype="object")})

    def init_walks(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df["node"], index=False).to_numpy()
        outs = []
        for w in range(walks_per_node):
            seed = _splitmix64(h ^ np.uint64(w + 1))
            outs.append(
                pd.DataFrame(
                    {
                        "key": df["node"],
                        "nbr": "",
                        "is_adj": np.zeros(len(df), dtype="int64"),
                        "anchor": df["node"],
                        "walk_idx": np.full(len(df), w, dtype="int64"),
                        "state": seed.view(np.int64),
                        "path": df["node"],
                        "n_steps": np.zeros(len(df), dtype="int64"),
                    }
                )
            )
        out = pd.concat(outs, ignore_index=True)
        out["bucket"] = bucket_of(out["key"])
        return out

    walks = (
        docs.map_batches(nodes_of, batch_format="pyarrow")
        .map_batches(init_walks, batch_format="pandas")
        .repartition(B)
        .materialize()
    )

    def step(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["is_adj"] == 1][["key", "nbr"]].sort_values(
            ["key", "nbr"], kind="mergesort"
        )
        a = a.assign(
            rank=a.groupby("key").cumcount().astype("int64"),
            deg=a.groupby("key")["nbr"].transform("size").astype("int64"),
        )
        w = g[g["is_adj"] == 0].drop(columns=["bucket"])
        deg_map = a.drop_duplicates("key").set_index("key")["deg"]
        wdeg = w["key"].map(deg_map).fillna(0).astype("int64")
        state_u = w["state"].to_numpy().view(np.uint64)
        rank = np.zeros(len(w), dtype="int64")
        live = wdeg.to_numpy() > 0
        rank[live] = (
            state_u[live] % wdeg.to_numpy()[live].astype(np.uint64)
        ).astype("int64")
        # vectorized advance: merge live walks onto (key, rank) →
        # next node; dead-end walks pass through unchanged
        wl = w[live].assign(rank=rank[live])
        adv = wl.merge(
            a[["key", "rank", "nbr"]].rename(columns={"nbr": "nxt"}),
            on=["key", "rank"],
        )
        from suckit_ray.stages.sketch import _splitmix64 as smx

        new_state = smx(adv["state"].to_numpy().view(np.uint64)).view(np.int64)
        moved = pd.DataFrame(
            {
                "key": adv["nxt"],
                "nbr": "",
                "is_adj": np.zeros(len(adv), dtype="int64"),
                "anchor": adv["anchor"],
                "walk_idx": adv["walk_idx"].astype("int64"),
                "state": new_state,
                "path": adv["path"] + ">" + adv["nxt"],
                "n_steps": adv["n_steps"].astype("int64") + 1,
            }
        )
        stuck = w[~live][
            [
                "key",
                "nbr",
                "is_adj",
                "anchor",
                "walk_idx",
                "state",
                "path",
                "n_steps",
            ]
        ]
        return pd.concat([moved, stuck], ignore_index=True)

    for _ in range(walk_len):
        staged = walks.union(adj)
        walks = (
            staged.groupby("bucket")
            .map_groups(step, batch_format="pandas")
            .map_batches(
                lambda df: df.assign(bucket=bucket_of(df["key"])),
                batch_format="pandas",
            )
            .repartition(B)
            .materialize()
        )

    return walks.map_batches(
        lambda df: df[["anchor", "walk_idx", "path", "n_steps"]],
        batch_format="pandas",
    )


def crawl_walk_corpus(sf_dir: str) -> rd.Dataset:
    """queries() entry: deterministic random-walk training corpus of
    the flagship crawl. Rows-only (sampled operator); determinism and
    edge-validity pins in tests/test_session12_ops.py."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return walk_corpus_from_docs(crawl_docs(sf_dir))


SIMRANK_ITERS = 3
SIMRANK_MICRO = 1_000_000


def simrank_from_docs(
    docs: rd.Dataset,
    iters: int = SIMRANK_ITERS,
    exact_node_limit: int = HOST_EXACT_NODE_LIMIT,
    pivots: int = GRAPH_PIVOTS,
    mc_walks: int = 24,
) -> rd.Dataset:
    """(host, a, b, sim_micro): SimRank structural similarity (Jeh &
    Widom 2002, KDD — public) of same-host page pairs after ``iters``
    iterations with C = 0.8, carried in exact integer micro units:

        s₀ = 1e6·[a=b]
        s_{k+1}(a,b) = (4 · Σ_{i∈I(a), j∈I(b)} s_k(i,j))
                        // (5 · |I(a)|·|I(b)|)      (a ≠ b)

    with s(a,a) pinned to 1e6 and pairs with an empty in-set scoring
    0 — every division floors, so the k-step unrolled-CTE oracle
    matches bit for bit. Output: pairs a < b with positive score
    (SimRank is symmetric).

    Plan: host co-group; inside it the update is two integer matmuls
    (Pᵀ S P over the in-adjacency) per iteration. O(m³)-class like
    the closure kernels, so it is bench-gated the same way; above
    ``exact_node_limit`` nodes the kernel routes to the Jeh–Widom §5
    Monte-Carlo estimator — s(a,b) = E[C^τ], τ = first meeting step
    of two coupled REVERSE random walks, truncated at ``iters`` —
    over the BOUNDED pair space of the host's top-``pivots``
    in-degree pages (ties to the smaller id; SimRank of a 10^7-page
    host is itself O(m²) output, so the scale route must restrict
    the pair space — documented behavioral difference). splitmix64
    walk chains keep the sample deterministic; ±C/√W standard error
    per pair, sanity-pinned against the exact kernel in tests."""

    def simrank_mc(host, nodes, m, s_idx, t_idx) -> pd.DataFrame:
        from suckit_ray.stages.sketch import _splitmix64

        rev_ptr, rev_nbr = _csr(m, t_idx, s_idx)
        indeg = (rev_ptr[1:] - rev_ptr[:-1]).astype(np.int64)
        k = min(pivots, m)
        # top-k by (indeg desc, id asc): lexsort on (-indeg, index)
        top = np.lexsort((np.arange(m), -indeg))[:k].astype(np.int64)
        top = np.sort(top)
        ai, bi = np.triu_indices(k, k=1)
        pa_ = np.repeat(top[ai], mc_walks)
        pb_ = np.repeat(top[bi], mc_walks)
        widx = np.tile(np.arange(mc_walks, dtype=np.uint64), len(ai))
        state = _splitmix64(
            pa_.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ^ pb_.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
            ^ widx
        )
        x, y = pa_.copy(), pb_.copy()
        alive = np.ones(len(x), dtype=bool)
        contrib = np.zeros(len(x), dtype=np.float64)
        c_pow = 1.0
        for _ in range(iters):
            c_pow *= 0.8
            live = alive & (indeg[x] > 0) & (indeg[y] > 0)
            alive = live
            if not live.any():
                break
            state = _splitmix64(state + np.uint64(1))
            nx = rev_nbr[
                rev_ptr[x[live]]
                + (state[live] % indeg[x[live]].astype(np.uint64)).astype(
                    np.int64
                )
            ]
            state = _splitmix64(state + np.uint64(2))
            ny = rev_nbr[
                rev_ptr[y[live]]
                + (state[live] % indeg[y[live]].astype(np.uint64)).astype(
                    np.int64
                )
            ]
            x = x.copy()
            y = y.copy()
            x[live], y[live] = nx, ny
            met = live.copy()
            met[live] = nx == ny
            contrib[met] = c_pow
            alive = alive & ~met
        sim = contrib.reshape(len(ai), mc_walks).mean(axis=1)
        sim_micro = np.floor(sim * SIMRANK_MICRO).astype(np.int64)
        keep = sim_micro > 0
        return pd.DataFrame(
            {
                "host": [host] * int(keep.sum()),
                "a": nodes[top[ai[keep]]].astype("int64"),
                "b": nodes[top[bi[keep]]].astype("int64"),
                "sim_micro": sim_micro[keep],
            }
        )

    def simrank(g: pd.DataFrame) -> pd.DataFrame:
        host = g["host"].iloc[0]
        nodes, idx, s_idx, t_idx = _group_arrays(g)
        m = len(nodes)
        if m > exact_node_limit:
            return simrank_mc(host, nodes, m, s_idx, t_idx)
        A = np.zeros((m, m), dtype=np.int64)
        A[s_idx, t_idx] = 1
        ind = A.sum(axis=0)
        denom = 5 * np.multiply.outer(ind, ind)
        nz = denom > 0
        S = np.zeros((m, m), dtype=np.int64)
        np.fill_diagonal(S, SIMRANK_MICRO)
        for _ in range(iters):
            T = A.T @ S @ A
            S2 = np.zeros_like(S)
            S2[nz] = (4 * T[nz]) // denom[nz]
            np.fill_diagonal(S2, SIMRANK_MICRO)
            S = S2
        ai, bi = np.nonzero(np.triu(S, k=1))
        return pd.DataFrame(
            {
                "host": [host] * len(ai),
                "a": nodes[ai].astype("int64"),
                "b": nodes[bi].astype("int64"),
                "sim_micro": S[ai, bi],
            }
        )

    return (
        _host_graph_staged(docs)
        .groupby("host")
        .map_groups(simrank, batch_format="pandas")
    )


def crawl_simrank(sf_dir: str) -> rd.Dataset:
    """queries() entry: 3-iteration integer SimRank pairs of the
    flagship crawl. Full SQL oracle: the iteration unrolled as
    chained aggregation-join CTEs over the in-edge sets."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return simrank_from_docs(crawl_docs(sf_dir))


def betweenness_from_docs(
    docs: rd.Dataset,
    exact_node_limit: int = HOST_EXACT_NODE_LIMIT,
    pivots: int = GRAPH_PIVOTS,
) -> rd.Dataset:
    """(host, page, bc_micro): exact directed shortest-path
    betweenness centrality per host, in the per-pair-floored integer
    form

        bc_micro(v) = Σ_{s≠v≠t} (σ_st(v) · 1e6) // σ_st

    (σ = shortest-path counts; flooring per ORDERED pair keeps both
    sides in integers — the convention that makes betweenness
    SQL-oracle-able via full shortest-path enumeration, tractable
    because the flagship hosts' path counts are small). Freeman 1977
    / Brandes 2001 (public).

    Plan: the host co-group again; inside it, level-synchronous
    all-sources BFS gives the distance matrix D and the path-count
    matrix S (σ at level d = masked S @ A — one int matmul per
    level), then the counting lemma σ_st(v) = σ_sv·σ_vt gated on
    D[s,v]+D[v,t] = D[s,t] turns the accumulation into one outer
    product + mask per node. O(m³) per host like the closure kernels;
    int64 σ products bound test-scale hosts — above
    ``exact_node_limit`` nodes the kernel routes to PIVOT-SAMPLED
    Brandes (Brandes & Pich 2007, public): K deterministic pivot
    sources, one BFS + dependency accumulation each (O(K·(m+e))),
    bc ≈ (m/K)·Σ_pivots δ_s(v) with float accumulators floored to
    micro at the end. Unbiased over uniform pivots; with K ≥ m it
    reduces to full Brandes, whose only divergence from the exact
    kernel is the per-ordered-pair flooring (|Δ| < #pairs micro,
    the documented bound pinned in tests)."""

    def sampled(host, nodes, m, s_idx, t_idx) -> pd.DataFrame:
        fwd_ptr, fwd_nbr = _csr(m, s_idx, t_idx)
        piv = _pick_pivots(m, pivots, salt=3)
        bc = np.zeros(m, dtype=np.float64)
        for src in piv:
            dist = np.full(m, -1, dtype=np.int64)
            sigma = np.zeros(m, dtype=np.float64)
            dist[src] = 0
            sigma[src] = 1.0
            levels: list[np.ndarray] = [np.array([src], dtype=np.int64)]
            frontier = levels[0]
            d = 0
            while len(frontier):
                d += 1
                starts, ends = fwd_ptr[frontier], fwd_ptr[frontier + 1]
                reps = ends - starts
                if not int(reps.sum()):
                    break
                srcs = np.repeat(frontier, reps)
                dsts = np.concatenate(
                    [fwd_nbr[a:b] for a, b in zip(starts, ends)]
                )
                newnodes = np.unique(dsts[dist[dsts] == -1])
                dist[newnodes] = d
                sel = dist[dsts] == d
                np.add.at(sigma, dsts[sel], sigma[srcs[sel]])
                frontier = newnodes
                if len(newnodes):
                    levels.append(newnodes)
            # dependency accumulation over the shortest-path DAG edges
            dag = dist[t_idx] == dist[s_idx] + 1
            dag &= dist[s_idx] >= 0
            ds_, dt_ = s_idx[dag], t_idx[dag]
            delta = np.zeros(m, dtype=np.float64)
            for lvl in reversed(levels[1:]):
                lvl_d = dist[lvl[0]]
                sel = dist[dt_] == lvl_d
                np.add.at(
                    delta,
                    ds_[sel],
                    (sigma[ds_[sel]] / sigma[dt_[sel]])
                    * (1.0 + delta[dt_[sel]]),
                )
            delta[src] = 0.0
            bc += delta
        scale = m / len(piv) if len(piv) else 0.0
        bc_micro = np.floor(bc * scale * 1_000_000).astype(np.int64)
        return pd.DataFrame(
            {
                "host": [host] * m,
                "page": nodes.astype("int64"),
                "bc_micro": bc_micro,
            }
        )

    def betweenness(g: pd.DataFrame) -> pd.DataFrame:
        host = g["host"].iloc[0]
        nodes, idx, s_idx, t_idx = _group_arrays(g)
        m = len(nodes)
        if m > exact_node_limit:
            return sampled(host, nodes, m, s_idx, t_idx)
        A = np.zeros((m, m), dtype=bool)
        A[s_idx, t_idx] = True
        # distances (length >= 1), then self-distance 0 / unreachable INF
        R = A.copy()
        D = np.where(A, 1, 0).astype(np.int64)
        d = 1
        while True:
            new = (R @ A) & ~R
            if not new.any():
                break
            d += 1
            D[new] = d
            R |= new
        maxd = d
        INF = np.int64(m + 1)
        D2 = np.where(R, D, INF)
        np.fill_diagonal(D2, 0)
        # path counts: sigma[s,s]=1; level d entries = (level d-1
        # slice of S) @ A
        S = np.zeros((m, m), dtype=np.int64)
        np.fill_diagonal(S, 1)
        Aint = A.astype(np.int64)
        for lvl in range(1, maxd + 1):
            contrib = (np.where(D2 == lvl - 1, S, 0)) @ Aint
            sel = D2 == lvl
            S[sel] = contrib[sel]
        bc = np.zeros(m, dtype=np.int64)
        finite = D2 <= m
        for vi in range(m):
            dv = D2[:, vi][:, None] + D2[vi, :][None, :]
            valid = (dv == D2) & finite & (D2 > 0)
            valid[:, vi] = False
            valid[vi, :] = False
            if not valid.any():
                continue
            through = np.multiply.outer(S[:, vi], S[vi, :])
            bc[vi] = np.floor_divide(
                through[valid] * 1_000_000, S[valid]
            ).sum()
        return pd.DataFrame(
            {
                "host": [host] * m,
                "page": nodes.astype("int64"),
                "bc_micro": bc,
            }
        )

    return (
        _host_graph_staged(docs)
        .groupby("host")
        .map_groups(betweenness, batch_format="pandas")
    )


def crawl_betweenness(sf_dir: str) -> rd.Dataset:
    """queries() entry: per-page betweenness centrality of the
    flagship crawl. Full SQL oracle: shortest-path ENUMERATION (the
    BFS-level join prunes every non-shortest prefix), interior-node
    unnest, per-pair floored micro terms."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return betweenness_from_docs(crawl_docs(sf_dir))


def crawl_distance_stats(sf_dir: str) -> rd.Dataset:
    """queries() entry: per-host distance-distribution statistics of
    the flagship crawl. Full SQL oracle: the bounded BFS CTE's min
    distances rolled into cumulative rank rules."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return distance_stats_from_docs(crawl_docs(sf_dir))


def crawl_closeness(sf_dir: str) -> rd.Dataset:
    """queries() entry: per-page directed closeness centrality of the
    flagship crawl. Full SQL oracle: bounded-depth recursive BFS CTE
    (min distance per (host, src, node)) over the shared reach CTE's
    regenerated edges."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return closeness_from_docs(crawl_docs(sf_dir))


def crawl_bowtie(sf_dir: str) -> rd.Dataset:
    """queries() entry: per-host bow-tie class histogram of the
    flagship crawl. Full SQL oracle: closure + largest-SCC + four
    reachability sets over the shared reach CTE."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return bowtie_from_docs(crawl_docs(sf_dir))


def assortativity_from_docs(docs: rd.Dataset) -> rd.Dataset:
    """(host, n_edges, assort2_micro): per-host directed degree
    assortativity of the link graph — the Pearson correlation, ACROSS
    directed edges, between the source's OUT-degree and the target's
    IN-degree (Newman 2002/2003, public; the out-in convention, no
    excess-degree correction — documented so the oracle can mirror it
    literally). Positive = hubs cite hubs (core-periphery webs score
    negative). Reported as the SIGNED SQUARED correlation in micro
    units (the events_acf/spearman/regression trick: the square
    avoids the irrational √, floor == trunc on the non-negative
    numerator, Python `//` ≡ DuckDB `//`).

    Plan — degrees attach where the edges already are, no degree
    table broadcast: (1) one s-hash co-group counts outdeg(host, s)
    group-locally (every edge of a source co-locates) and attaches x;
    (2) one t-hash co-group counts indeg(host, t) the same way and
    folds per-host sufficient-statistic PARTIALS (n, Σx, Σy, Σxy,
    Σx², Σy²) — the exchange after it carries O(buckets·hosts) rows,
    never edges; (3) one tiny bucketed sum per host, closed form in
    unbounded Python ints. Partials ride int64: Σxy per bucket holds
    to ~3e9 edges × deg 1e3 (overflow would need a host whose hot
    pages exceed ~10^6 degree at 10^9 edges per bucket — re-quantize
    to HUGEINT-style string partials the spearman way if a real web
    graph gets there)."""
    from suckit_ray.stages.agg import bucketed_groupby_agg, default_buckets

    B = default_buckets()
    edges = _host_page_edges(docs).materialize()  # feeds two groupby passes

    def add_sb(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["sb"] = (out["s"].astype("int64") % B).astype("int64")
        return out

    def attach_out(g: pd.DataFrame) -> pd.DataFrame:
        x = g.groupby(["host", "s"])["t"].transform("size").astype("int64")
        return pd.DataFrame(
            {
                "host": g["host"],
                "t": g["t"].astype("int64"),
                "x": x,
                "tb": (g["t"].astype("int64") % B).astype("int64"),
            }
        )

    def fold_in(g: pd.DataFrame) -> pd.DataFrame:
        y = g.groupby(["host", "t"])["x"].transform("size").astype("int64")
        d = pd.DataFrame(
            {
                "host": g["host"],
                "x": g["x"].astype("int64"),
                "y": y,
            }
        )
        d["xy"] = d["x"] * d["y"]
        d["xx"] = d["x"] * d["x"]
        d["yy"] = d["y"] * d["y"]
        return (
            d.groupby("host", as_index=False)
            .agg(
                n=("x", "size"),
                sx=("x", "sum"),
                sy=("y", "sum"),
                sxy=("xy", "sum"),
                sxx=("xx", "sum"),
                syy=("yy", "sum"),
            )
        )

    partials = (
        edges.map_batches(add_sb, batch_format="pandas")
        .groupby("sb")
        .map_groups(attach_out, batch_format="pandas")
        .groupby("tb")
        .map_groups(fold_in, batch_format="pandas")
    )
    sums = bucketed_groupby_agg(
        partials,
        keys=["host"],
        aggs={
            "n": ("n", "sum"),
            "sx": ("sx", "sum"),
            "sy": ("sy", "sum"),
            "sxy": ("sxy", "sum"),
            "sxx": ("sxx", "sum"),
            "syy": ("syy", "sum"),
        },
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        hosts, ns, vals = [], [], []
        for _, r in df.iterrows():
            n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
            sxy, sxx, syy = int(r["sxy"]), int(r["sxx"]), int(r["syy"])
            num = n * sxy - sx * sy
            den = (n * sxx - sx * sx) * (n * syy - sy * sy)
            r2 = 0 if den == 0 else (
                (-1 if num < 0 else 1) * ((num * num * 1_000_000) // den)
            )
            hosts.append(r["host"])
            ns.append(n)
            vals.append(r2)
        return pd.DataFrame(
            {
                "host": pd.array(hosts, dtype="object"),
                "n_edges": pd.array(ns, dtype="int64"),
                "assort2_micro": pd.array(vals, dtype="int64"),
            }
        )

    return sums.map_batches(finish, batch_format="pandas")


def crawl_assortativity(sf_dir: str) -> rd.Dataset:
    """queries() entry: per-host directed out-in degree assortativity
    of the flagship crawl's link graph. Full SQL oracle: edges +
    degree joins + HUGEINT closed form over the shared reach CTE."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return assortativity_from_docs(crawl_docs(sf_dir))


def motifs_from_docs(docs: rd.Dataset) -> rd.Dataset:
    """(host, ffl, cycles): per-host DIRECTED triad motif census of
    the link graph — feed-forward loops (a→b, b→c, a→c: the
    hierarchy/shortcut pattern) vs 3-cycles (a→b, b→c, c→a: the
    feedback pattern), the Milo et al. 2002 network-motif distinction
    that tells a hub-and-spoke site apart from a ring even when their
    undirected triangle counts agree.

    Counting rule: pattern EMBEDDINGS on distinct ordered vertex
    triples. An FFL instance is identified by its middle vertex, so
    wedge-per-middle counts it exactly once; a 3-cycle is seen once
    per rotation (every vertex is a middle), so the match count is
    divided by 3 — exact, since the closure join sees each rotation
    exactly once. Triples carrying both patterns (mutual edges) count
    in both, the standard motif-census convention.

    Scale shape (the ``lcc_from_docs`` vocabulary, direction kept):
    (1) the shared distinct directed edge set; (2) wedges a→v→c from
    one middle-bucketed co-group over in/out adjacency — O(in·out)
    per vertex, the inherent bound (cap hub fanout at web scale the
    way the triangle plan orients by degree); (3) one tagged-union
    co-group on the closing-edge key, wedge multiplicities
    pre-aggregated so the probe moves one row per distinct (edge key,
    pattern); (4) a tiny per-host sum. Four bounded exchanges of
    small int/string columns, no driver graph state."""
    from suckit_ray.stages.agg import bucketed_groupby_agg, default_buckets

    B = default_buckets()

    edges = _host_page_edges(docs).materialize()  # distinct by
    # construction (one source page per doc row); feeds the wedge
    # build AND the closure probe

    def to_middle(df: pd.DataFrame) -> pd.DataFrame:
        inn = pd.DataFrame(
            {"host": df["host"], "v": df["t"], "u": df["s"],
             "dir": np.zeros(len(df), dtype="int64")}
        )
        out = pd.DataFrame(
            {"host": df["host"], "v": df["s"], "u": df["t"],
             "dir": np.ones(len(df), dtype="int64")}
        )
        m = pd.concat([inn, out], ignore_index=True)
        m["vb"] = (m["v"].astype("int64") % B).astype("int64")
        return m

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        inn = g[g["dir"] == 0][["host", "v", "u"]]
        out = g[g["dir"] == 1][["host", "v", "u"]]
        m = inn.merge(out, on=["host", "v"], suffixes=("_a", "_c"))
        m = m[m["u_a"] != m["u_c"]]  # distinct triple: a ≠ c
        if not len(m):
            return pd.DataFrame(
                {
                    "host": pd.Series([], dtype="object"),
                    "x": pd.Series([], dtype="int64"),
                    "y": pd.Series([], dtype="int64"),
                    "kind": pd.Series([], dtype="int64"),
                    "cnt": pd.Series([], dtype="int64"),
                }
            )
        a = m["u_a"].astype("int64").to_numpy()
        c = m["u_c"].astype("int64").to_numpy()
        # ffl probes edge a→c (kind 1); cycle probes edge c→a (kind 2)
        probe = pd.DataFrame(
            {
                "host": pd.concat([m["host"], m["host"]], ignore_index=True),
                "x": np.concatenate([a, c]),
                "y": np.concatenate([c, a]),
                "kind": np.repeat(np.array([1, 2], dtype="int64"), len(m)),
                "cnt": np.ones(2 * len(m), dtype="int64"),
            }
        )
        return probe.groupby(
            ["host", "x", "y", "kind"], as_index=False
        )["cnt"].sum()

    wedge_rows = (
        edges.map_batches(to_middle, batch_format="pandas")
        .groupby("vb")
        .map_groups(wedges, batch_format="pandas")
    )

    def edge_probe(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "host": df["host"],
                "x": df["s"].astype("int64"),
                "y": df["t"].astype("int64"),
                "kind": np.zeros(len(df), dtype="int64"),
                "cnt": np.ones(len(df), dtype="int64"),
            }
        )

    def key_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["kb"] = (
            (df["x"].astype("int64") * 1_000_003 + df["y"].astype("int64"))
            % B
        ).astype("int64")
        return df

    tagged = (
        wedge_rows.map_batches(key_bucket, batch_format="pandas")
        .union(
            edges.map_batches(edge_probe, batch_format="pandas").map_batches(
                key_bucket, batch_format="pandas"
            )
        )
    )

    def close_count(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["kind"] == 0][["host", "x", "y"]]
        w = g[g["kind"] > 0]
        m = w.merge(e, on=["host", "x", "y"])
        if not len(m):
            return pd.DataFrame(
                {
                    "host": pd.Series([], dtype="object"),
                    "kind": pd.Series([], dtype="int64"),
                    "cnt": pd.Series([], dtype="int64"),
                }
            )
        return m.groupby(["host", "kind"], as_index=False)["cnt"].sum()

    matched = bucketed_groupby_agg(
        tagged.groupby("kb").map_groups(close_count, batch_format="pandas"),
        keys=["host", "kind"],
        aggs={"cnt": ("cnt", "sum")},
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        p = (
            df.pivot_table(
                index="host", columns="kind", values="cnt",
                aggfunc="sum", fill_value=0,
            )
            .reindex(columns=[1, 2], fill_value=0)
            .reset_index()
        )
        return pd.DataFrame(
            {
                "host": p["host"],
                "ffl": p[1].astype("int64"),
                # every 3-cycle matched once per rotation
                "cycles": (p[2] // 3).astype("int64"),
            }
        )

    return matched.groupby("host").map_groups(
        finish, batch_format="pandas"
    )


def crawl_motifs(sf_dir: str) -> rd.Dataset:
    """queries() entry: directed triad motif census (feed-forward vs
    cycle counts) per host of the flagship crawl's link graph."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return motifs_from_docs(crawl_docs(sf_dir))


def reciprocity_from_docs(docs: rd.Dataset) -> rd.Dataset:
    """(host, n_edges, n_mutual, recip_micro): edge reciprocity of
    each host's directed link graph — the share of directed edges
    whose reverse also exists (Garlaschelli & Loffredo 2004, public),
    recip_micro = (10^6 · n_mutual) // n_edges. The direction-level
    audit that separates a strict hierarchy (0) from a fully mutual
    web (10^6); complements ``motifs_from_docs``' triad census.

    Plan: each distinct directed edge emits one row keyed by its
    UNDIRECTED pair with a direction flag; one pair-bucketed co-group
    marks both edges of a 2-cycle mutual group-locally; a tiny
    per-host sum finishes. Two bounded exchanges of small columns."""
    from suckit_ray.stages.agg import bucketed_groupby_agg, default_buckets

    B = default_buckets()

    def key_rows(df: pd.DataFrame) -> pd.DataFrame:
        a = np.minimum(df["s"], df["t"]).astype("int64")
        b = np.maximum(df["s"], df["t"]).astype("int64")
        out = pd.DataFrame(
            {
                "host": df["host"],
                "a": a,
                "b": b,
                "fwd": (df["s"] == a).astype("int64"),
            }
        )
        out["kb"] = ((a * 1_000_003 + b) % B).astype("int64")
        return out

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["host", "a", "b"], as_index=False).agg(
            n=("fwd", "count")
        )
        # n directed edges on the pair (1 or 2); both mutual iff n=2
        return pd.DataFrame(
            {
                "host": m["host"],
                "n_edges": m["n"].astype("int64"),
                "n_mutual": np.where(m["n"] == 2, 2, 0),
            }
        )

    agg = bucketed_groupby_agg(
        _host_page_edges(docs)
        .map_batches(key_rows, batch_format="pandas")
        .groupby("kb")
        .map_groups(mark, batch_format="pandas"),
        keys=["host"],
        aggs={"n_edges": ("n_edges", "sum"), "n_mutual": ("n_mutual", "sum")},
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        ne = df["n_edges"].astype("int64")
        nm = df["n_mutual"].astype("int64")
        return pd.DataFrame(
            {
                "host": df["host"],
                "n_edges": ne,
                "n_mutual": nm,
                "recip_micro": (1_000_000 * nm) // ne,
            }
        )

    return agg.map_batches(finish, batch_format="pandas")


def crawl_reciprocity(sf_dir: str) -> rd.Dataset:
    """queries() entry: per-host directed-edge reciprocity of the
    flagship crawl's link graph."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return reciprocity_from_docs(crawl_docs(sf_dir))


def richclub_from_docs(
    docs: rd.Dataset, num_buckets: int | None = None
) -> pa.Table:
    """(k, n_nodes, n_edges, phi_pct): the RICH-CLUB coefficient of
    the undirected simple link graph (Zhou & Mondragón 2004, IEEE
    Comm. Lett. — public): for every degree threshold k,
    φ(k) = 2·E_k / (N_k·(N_k−1)) where N_k = nodes with degree > k
    and E_k = edges with BOTH endpoints of degree > k — "do the
    hubs link to each other more than chance?", the connectivity
    audit run before trusting hub-based crawl prioritization.
    ``phi_pct`` = (10⁴·2·E_k) // (N_k·(N_k−1)) — the integer-ratio
    quantization spelled identically in the oracle (repo invariant).
    Rows for k = 0..max_degree−1 where N_k ≥ 2.

    Scale shape — two co-groups, histogram-sized driver fold:
    (1) node co-group: each node's distinct-peer set gives its
    degree; emit (edge, endpoint_degree) half-rows PLUS one tagged
    node-row per node; (2) edge co-group: pair the two halves,
    m = min(deg_a, deg_b), and fold BOTH tallies group-locally into
    (tag, val, cnt) histogram partials — E_k and N_k are then suffix
    sums over two ≤max_degree-row histograms, so the driver never
    sees a node or an edge, only O(max_degree) partial rows."""
    import pandas as pd

    from suckit_ray.stages.agg import default_buckets

    B = num_buckets or default_buckets()

    def deg_attach(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for node, grp in g.groupby("node"):
            peers = set(grp["peer"])
            d = len(peers)
            rows.append((node, "", d))  # tagged node-row
            for p in peers:
                a, b = (node, p) if node < p else (p, node)
                rows.append((a, b, d))
        df = pd.DataFrame(rows, columns=["a", "b", "deg"])
        # two-COLUMN hash (hash_pandas_object is NUL-truncating on
        # joined strings — see CLAUDE.md)
        h = pd.util.hash_pandas_object(
            df[["a", "b"]], index=False
        ).astype("uint64")
        df["bucket"] = (h % B).astype("int64")
        return df

    def edge_min(g: pd.DataFrame) -> pd.DataFrame:
        nodes = g[g["b"] == ""]
        edges = g[g["b"] != ""]
        parts = []
        if len(nodes):
            h = nodes.groupby("deg", as_index=False).agg(cnt=("deg", "size"))
            h["tag"] = "node"
            parts.append(h.rename(columns={"deg": "val"}))
        if len(edges):
            m = edges.groupby(["a", "b"], as_index=False).agg(
                val=("deg", "min")
            )
            h = m.groupby("val", as_index=False).agg(cnt=("val", "size"))
            h["tag"] = "edge"
            parts.append(h)
        if not parts:
            return pd.DataFrame(
                {
                    "tag": pd.array([], dtype="str"),
                    "val": pd.array([], dtype="int64"),
                    "cnt": pd.array([], dtype="int64"),
                }
            )
        return pd.concat(parts, ignore_index=True)[["tag", "val", "cnt"]]

    parts = (
        # materialize before the sort-groupby: a lazy input re-executes
        # the doc scan + edge extraction per boundary-sampling pass
        # (CLAUDE.md gotcha; round-5 review)
        _link_edges(docs)
        .map_batches(_und_simple, batch_format="pyarrow")
        .map_batches(
            lambda df: _edge_half_rows(df, B), batch_format="pandas"
        )
        .materialize()
        .groupby("bucket")
        .map_groups(deg_attach, batch_format="pandas")
        .groupby("bucket")
        .map_groups(edge_min, batch_format="pandas")
        .to_pandas()  # O(max_degree) histogram partials
    )
    import numpy as np

    folded = parts.groupby(["tag", "val"], as_index=False)["cnt"].sum()
    dh = folded[folded["tag"] == "node"].set_index("val")["cnt"]
    eh = folded[folded["tag"] == "edge"].set_index("val")["cnt"]
    if not len(dh):
        return pa.table(
            {
                "k": pa.array([], pa.int64()),
                "n_nodes": pa.array([], pa.int64()),
                "n_edges": pa.array([], pa.int64()),
                "phi_pct": pa.array([], pa.int64()),
            }
        )
    max_deg = int(dh.index.max())
    # linear suffix sums over the sorted histograms (one cumsum each,
    # not an O(max_degree × distinct_degrees) filter loop — round-5
    # review): suffix[k] = Σ cnt over vals > k
    dh_s = dh.sort_index()
    eh_s = eh.sort_index() if len(eh) else eh
    dvals = dh_s.index.to_numpy()
    dcum = dh_s.to_numpy()[::-1].cumsum()[::-1]  # Σ cnt for vals >= dvals[i]
    evals = eh_s.index.to_numpy() if len(eh) else np.array([], dtype=np.int64)
    ecum = (
        eh_s.to_numpy()[::-1].cumsum()[::-1]
        if len(eh)
        else np.array([], dtype=np.int64)
    )

    def suffix(vals: np.ndarray, cum: np.ndarray, k: int) -> int:
        i = np.searchsorted(vals, k, side="right")
        return int(cum[i]) if i < len(vals) else 0

    ks, nn, ne, phi = [], [], [], []
    for k in range(max_deg):
        n_k = suffix(dvals, dcum, k)
        if n_k < 2:
            continue
        e_k = suffix(evals, ecum, k)
        ks.append(k)
        nn.append(n_k)
        ne.append(e_k)
        phi.append((10000 * 2 * e_k) // (n_k * (n_k - 1)))
    return pa.table(
        {
            "k": pa.array(ks, pa.int64()),
            "n_nodes": pa.array(nn, pa.int64()),
            "n_edges": pa.array(ne, pa.int64()),
            "phi_pct": pa.array(phi, pa.int64()),
        }
    )


def crawl_richclub(sf_dir: str) -> pa.Table:
    """queries() entry: rich-club audit of the flagship link graph."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return richclub_from_docs(crawl_docs(sf_dir))


def modularity_from_docs(
    docs: rd.Dataset, rounds: int = LPA_ROUNDS, num_buckets: int | None = None
) -> pa.Table:
    """(community, n_nodes, e_in, d_tot, term_micro): Newman
    MODULARITY audit of the LPA communities (Newman & Girvan 2004,
    Phys. Rev. E — public) over the undirected SIMPLE link graph —
    "are the detected communities denser than chance?", the quality
    gate run before trusting community labels for sharding or
    sampling. Per community c: e_in = intra-community edges, d_tot =
    summed member degrees, and the quantized Newman term

        term_micro = (10⁶·e_in)//m − (10⁶·d_tot²)//(4·m²)

    (integer-ratio spelling on BOTH engines — repo invariant; Python
    ints in the driver fold, so no overflow at any scale). Σ terms =
    Q·10⁶ up to the per-community floors. Degrees/e_in use the simple
    graph (relationships, not link multiplicity); the LPA vote itself
    stays multigraph — the same split the oracle spells.

    Scale shape: labels ride the SAME node co-group as the edge
    half-rows (tagged union — one exchange attaches each node's
    degree AND community and emits per-community node partials plus
    per-edge endpoint-community halves); one edge co-group counts
    intra edges and the exact global edge total group-locally. The
    driver folds O(communities + groups) partial rows, never nodes
    or edges."""
    import pandas as pd

    from suckit_ray.stages.agg import default_buckets

    B = num_buckets or default_buckets()

    labels = lpa_communities_from_docs(docs, rounds=rounds)

    def half_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = _edge_half_rows(df, B)
        out["comm"] = ""
        return out

    def label_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "node": df["doc_id"].astype(str),
                "peer": "",
                "comm": df["community"].astype(str),
            }
        )
        out["bucket"] = _hash_bucket(out["node"], B)
        return out

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        # per node: community from its label row, degree from its
        # distinct peers; emit community node-partials + edge halves
        rows = []
        for node, grp in g.groupby("node"):
            comm_rows = grp.loc[grp["peer"] == "", "comm"]
            if not len(comm_rows):
                continue  # edge endpoint outside the labeled set
            comm = comm_rows.iloc[0]
            peers = {p for p in grp["peer"] if p != ""}
            rows.append(("node", comm, "", "", len(peers)))
            for p in peers:
                a, b = (node, p) if node < p else (p, node)
                rows.append(("half", comm, a, b, 1))
        if not rows:
            return pd.DataFrame(
                {
                    "tag": pd.array([], dtype="str"),
                    "comm": pd.array([], dtype="str"),
                    "ea": pd.array([], dtype="str"),
                    "eb": pd.array([], dtype="str"),
                    "val": pd.array([], dtype="int64"),
                    "bucket": pd.array([], dtype="int64"),
                }
            )
        import numpy as np

        df = pd.DataFrame(rows, columns=["tag", "comm", "ea", "eb", "val"])
        # node partials route by community, halves by EDGE — the two
        # halves of an edge carry different communities, so the hash
        # key must blank the comm for halves (and the edge for nodes)
        # or intra-edges would never co-locate. The edge is TWO
        # columns end to end — a NUL-joined string truncates in every
        # pandas hashtable path (groupby/nunique/hash_pandas_object),
        # which silently merged all edges sharing an endpoint when
        # this first used one joined column (the CLAUDE.md hazard,
        # hit twice in one session).
        df["k1"] = np.where(df["tag"] == "node", df["comm"], "")
        df["bucket"] = (
            pd.util.hash_pandas_object(
                df[["tag", "k1", "ea", "eb"]], index=False
            ).astype("uint64") % B
        ).astype("int64")
        return df[["tag", "comm", "ea", "eb", "val", "bucket"]]

    def fold_group(g: pd.DataFrame) -> pd.DataFrame:
        parts = []
        nodes = g[g["tag"] == "node"]
        if len(nodes):
            agg = nodes.groupby("comm", as_index=False).agg(
                n_nodes=("val", "size"), d_tot=("val", "sum")
            )
            agg["tag"] = "comm"
            agg["e_in"] = 0
            parts.append(agg[["tag", "comm", "n_nodes", "d_tot", "e_in"]])
        halves = g[g["tag"] == "half"]
        if len(halves):
            m_part = len(halves.drop_duplicates(["ea", "eb"]))
            intra = (
                halves.groupby(["ea", "eb"])
                .filter(lambda eg: len(eg) >= 2 and eg["comm"].nunique() == 1)
                .drop_duplicates(["ea", "eb"])
            )
            rows = [("m", "", 0, 0, int(m_part))]
            if len(intra):
                ec = intra.groupby("comm", as_index=False).agg(
                    e_in=("comm", "size")
                )
                for r in ec.itertuples():
                    rows.append(("ec", r.comm, 0, 0, int(r.e_in)))
            parts.append(
                pd.DataFrame(
                    rows, columns=["tag", "comm", "n_nodes", "d_tot", "e_in"]
                )
            )
        if not parts:
            return pd.DataFrame(
                {
                    "tag": pd.array([], dtype="str"),
                    "comm": pd.array([], dtype="str"),
                    "n_nodes": pd.array([], dtype="int64"),
                    "d_tot": pd.array([], dtype="int64"),
                    "e_in": pd.array([], dtype="int64"),
                }
            )
        return pd.concat(parts, ignore_index=True)

    parts = (
        # materialize the tagged union before the sort-groupby (lazy
        # inputs re-execute per boundary-sampling pass — CLAUDE.md)
        _link_edges(docs)
        .map_batches(_und_simple, batch_format="pyarrow")
        .map_batches(half_rows, batch_format="pandas")
        .union(labels.map_batches(label_rows, batch_format="pandas"))
        .materialize()
        .groupby("bucket")
        .map_groups(attach, batch_format="pandas")
        .groupby("bucket")
        .map_groups(fold_group, batch_format="pandas")
        .to_pandas()  # O(communities + groups) partial rows
    )
    m = int(parts.loc[parts["tag"] == "m", "e_in"].sum())
    comm = (
        parts[parts["tag"] == "comm"]
        .groupby("comm", as_index=False)
        .agg(n_nodes=("n_nodes", "sum"), d_tot=("d_tot", "sum"))
    )
    ec = (
        parts[parts["tag"] == "ec"]
        .groupby("comm", as_index=False)
        .agg(e_in=("e_in", "sum"))
    )
    out = comm.merge(ec, on="comm", how="left")
    out["e_in"] = out["e_in"].fillna(0).astype("int64")
    out = out.sort_values("comm").reset_index(drop=True)
    terms = [
        (10**6 * int(r.e_in)) // m
        - (10**6 * int(r.d_tot) * int(r.d_tot)) // (4 * m * m)
        if m
        else 0
        for r in out.itertuples()
    ]
    return pa.table(
        {
            "community": pa.array(out["comm"].tolist(), pa.string()),
            "n_nodes": pa.array(out["n_nodes"].astype("int64")),
            "e_in": pa.array(out["e_in"].astype("int64")),
            "d_tot": pa.array(out["d_tot"].astype("int64")),
            "term_micro": pa.array(terms, pa.int64()),
        }
    )


def crawl_modularity(sf_dir: str) -> pa.Table:
    """queries() entry: Newman-modularity audit of the flagship LPA
    communities (SQL-oracled: the LPA label CTEs + the quantized
    Newman term)."""
    from suckit_ray.pipelines.flagship import crawl_docs

    return modularity_from_docs(crawl_docs(sf_dir))
