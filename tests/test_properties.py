"""Property-based invariants (hypothesis) over the URL kernels —
randomized coverage beyond the reference's 8 golden vectors."""

import posixpath

from hypothesis import given, settings
from hypothesis import strategies as st

from suckit_ray import urlkit

hosts = st.from_regex(r"[a-z][a-z0-9]{0,10}(\.[a-z]{2,5}){1,2}", fullmatch=True)
segments = st.lists(
    st.from_regex(r"[A-Za-z0-9_\-]{1,12}(\.[a-z]{1,4})?", fullmatch=True),
    min_size=0,
    max_size=4,
)


@st.composite
def urls(draw):
    host = draw(hosts)
    segs = draw(segments)
    trailing = draw(st.booleans())
    path = "/" + "/".join(segs) + ("/" if trailing and segs else "")
    query = draw(st.one_of(st.none(), st.from_regex(r"[a-z]=[a-z0-9]{1,6}", fullmatch=True)))
    fragment = draw(st.one_of(st.none(), st.from_regex(r"[a-z0-9]{1,8}", fullmatch=True)))
    u = f"http://{host}{path}"
    if query:
        u += f"?{query}"
    if fragment:
        u += f"#{fragment}"
    return u


@given(urls())
@settings(max_examples=300, deadline=None)
def test_parse_as_str_round_trip(u):
    p = urlkit.parse_url(u)
    assert urlkit.parse_url(p.as_str()) == p


@given(urls())
@settings(max_examples=300, deadline=None)
def test_to_path_deterministic_and_rooted(u):
    p = urlkit.parse_url(u)
    path = urlkit.to_path(p, False)
    assert path == urlkit.to_path(p, False)
    assert path.startswith(p.host)
    assert not path.endswith("/")
    # fragment-free variant never contains '#'
    assert "#" not in path


@given(urls(), urls())
@settings(max_examples=300, deadline=None)
def test_rewrite_resolves_back_to_target(src, dst):
    """M13/M14 linkage: joining the source page's directory with the
    rewritten relative ref must resolve to the target's mirror path."""
    sp = urlkit.to_path(urlkit.parse_url(src), False)
    dp = urlkit.to_path(urlkit.parse_url(dst), False)
    rel = urlkit.relative_rewrite(sp, dp)
    resolved = posixpath.normpath(posixpath.join(posixpath.dirname(sp), rel))
    assert resolved == posixpath.normpath(dp)


@given(urls(), st.from_regex(r"[a-z0-9_\-./]{1,20}", fullmatch=True))
@settings(max_examples=300, deadline=None)
def test_join_never_escapes_scheme(base, cand):
    b = urlkit.parse_url(base)
    j = urlkit.join_url(b, cand)
    assert j.scheme == "http"
    assert j.has_host


@given(st.text(alphabet="abc:/.#?=%", max_size=24))
@settings(max_examples=500, deadline=None)
def test_should_visit_and_normalize_total(cand):
    """The predicates are total functions over arbitrary junk."""
    import re

    inc, exc = re.compile(".*"), re.compile("$^")
    urlkit.should_visit(cand, inc, exc)  # must not raise
    n = urlkit.normalize_url(cand)
    if cand.startswith("//"):
        assert n.startswith("https://")


@given(
    st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=200, deadline=None)
def test_to_cents_matches_duckdb_round(vals):
    """Engine-parity fuzz: to_cents must equal DuckDB's
    CAST(round(v * 100) AS BIGINT) for arbitrary DOUBLE money values
    (incl. the x-just-below-k+0.5 addition-rounding edge)."""
    import duckdb
    import pandas as pd

    from suckit_ray.pipelines.relops import to_cents

    got = list(to_cents(pd.Series(vals, dtype="float64")))
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = [
        int(x)
        for (x,) in con.execute(
            "SELECT CAST(round(v * 100) AS BIGINT) FROM t"
        ).fetchall()
    ]
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 60) - 1),
            st.integers(min_value=1, max_value=100_000),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=200, deadline=None)
def test_wsample_key_matches_duckdb(pairs):
    """Engine-parity fuzz for the A-ES priority key: Python
    floor(−log(u)·1e9/w) must equal DuckDB's floor(−ln(u)·1e9/w) for
    arbitrary 60-bit hashes and weights (the BIGINT→DOUBLE h+1.0
    promotion happens in both engines)."""
    import math

    import duckdb

    got = [
        math.floor(
            -math.log((float(h) + 1.0) / float(1 << 60)) * 1e9 / int(w)
        )
        for h, w in pairs
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(h BIGINT, w BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(h, w) for h, w in pairs])
    want = [
        int(x)
        for (x,) in con.execute(
            "SELECT CAST(floor(-ln((h + 1.0) / 1152921504606846976.0)"
            " * 1000000000.0 / w) AS BIGINT) FROM t"
        ).fetchall()
    ]
    assert got == want


# ---------------------------------------------------------------------------
# FrontierShard invariants under random candidate streams (OPIC on/off,
# random wave caps): conservation, exactly-once release, cash accounting
# ---------------------------------------------------------------------------


@st.composite
def candidate_waves(draw):
    n_waves = draw(st.integers(1, 4))
    waves = []
    seq = 1
    for _ in range(n_waves):
        n = draw(st.integers(0, 12))
        cands = []
        for i in range(n):
            u = draw(st.integers(0, 15))  # small url space → many dups
            h = draw(st.sampled_from(["a.test", "b.test"]))
            cash = draw(
                st.floats(0.0, 2.0, allow_nan=False, allow_infinity=False)
            )
            cands.append(
                (seq, i, f"http://{h}/p{u}.html", h, False, 0, 0, cash)
            )
        seq += 1
        waves.append(cands)
    return waves


@given(
    waves=candidate_waves(),
    opic=st.booleans(),
    cap=st.one_of(st.none(), st.integers(1, 5)),
)
@settings(max_examples=60, deadline=None)
def test_frontier_conservation_and_exactly_once(waves, opic, cap):
    from suckit_ray.state.frontier import FrontierShard

    sh = FrontierShard(0, 1, opic=opic)
    sh.seed([("http://a.test/", "a.test")])
    released = []
    for w, cands in enumerate(waves):
        sh.add_candidates(list(cands))
        sh.finalize_wave(w, -1, -1, None, cap)
        released.extend(sh.released_tbl.column("url").to_pylist())
    # drain whatever the caps held back
    for w in range(len(waves), len(waves) + 64):
        if sh.pending_count() == 0:
            break
        sh.finalize_wave(w, -1, -1, None, cap)
        released.extend(sh.released_tbl.column("url").to_pylist())
    assert sh.pending_count() == 0
    # exactly-once: no url released twice
    assert len(released) == len(set(released))
    # conservation: released = accepted = seed + every first-seen url
    accepted = {"http://a.test/"} | {c[2] for w in waves for c in w}
    assert set(released) == accepted
    # cash accounting: the hot set fully drains with the queue
    assert sh.url_cash == {}


class TestCentsParityWithDuckdb:
    """The money invariant every oracle leans on: ``to_cents`` must
    equal DuckDB ``CAST(round(value * 100) AS BIGINT)`` bit-exactly —
    half away from zero, including the doubles just below a half-cent
    boundary where a naive floor(x+0.5) overshoots."""

    def _duck(self, values):
        import duckdb

        con = duckdb.connect()
        con.execute(
            "CREATE TABLE v AS SELECT * FROM (SELECT unnest(?::DOUBLE[]) AS x)",
            [list(values)],
        )
        return [
            r[0]
            for r in con.execute(
                "SELECT CAST(round(x * 100) AS BIGINT) FROM v"
            ).fetchall()
        ]

    def test_adversarial_boundaries(self):
        import pandas as pd

        from suckit_ray.pipelines.relops import to_cents

        vals = []
        for k in range(-3, 4):
            for eps in (0.005, 0.0049999999999999, 0.0050000000000001):
                vals += [k + eps, k - eps]
        vals += [0.0, -0.0, 0.125, -0.125, 2.675, -2.675, 1e12 + 0.005]
        got = to_cents(pd.Series(vals)).tolist()
        want = self._duck(vals)
        assert got == want

    @given(
        st.lists(
            st.floats(
                min_value=-1e9, max_value=1e9,
                allow_nan=False, allow_infinity=False,
            ),
            min_size=1, max_size=50,
        )
    )
    @settings(max_examples=60, deadline=None)
    def test_random_doubles_agree(self, vals):
        import pandas as pd

        from suckit_ray.pipelines.relops import to_cents

        got = to_cents(pd.Series(vals)).tolist()
        assert got == self._duck(vals)
