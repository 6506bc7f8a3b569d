"""OPIC adaptive frontier scheduling (config.opic / --opic).

Shard-level pins: cash seeding, per-sighting accrual, cash-ordered
release under a wave cap, hot-set pop at release, snapshot round-trip
and the toggle guard. E2E: on a star-shaped site the heavily-linked
hub overtakes FIFO discovery order when waves are capped, while the
crawled SET stays identical to the FIFO run (scheduling-only change).

OPIC: Abiteboul, Preda, Cobena — "Adaptive On-Line Page Importance
Computation", WWW 2003 (public). The reference crawler is strict FIFO
(src/scraper.rs channel order), so opic is off by default.
"""

import pytest

from suckit_ray.config import CrawlConfig
from suckit_ray.pipelines.crawl import crawl
from suckit_ray.sources.pagestore import PageRecord, TablePageStore
from suckit_ray.state.frontier import FrontierShard

pytestmark = pytest.mark.usefixtures("ray_session")


def cand(seq, ordinal, url, cash, host="h.test", ext=False, d=0, e=0):
    return (seq, ordinal, url, host, ext, d, e, cash)


class TestOpicShard:
    def test_seed_cash_released(self):
        sh = FrontierShard(0, 1, opic=True)
        sh.seed([("http://h.test/", "h.test")])
        assert sh.finalize_wave(0, -1, -1) == 1
        tbl = sh.released_tbl
        assert tbl.column("cash").to_pylist() == [1.0]
        assert sh.url_cash == {}  # released urls leave the hot set

    def test_release_order_is_cash_desc_with_fifo_ties(self):
        sh = FrontierShard(0, 1, opic=True)
        sh.add_candidates(
            [
                cand(1, 0, "http://h.test/low.html", 0.1),
                cand(1, 1, "http://h.test/high.html", 0.6),
                cand(1, 2, "http://h.test/mid.html", 0.3),
                cand(1, 3, "http://h.test/tie.html", 0.3),  # FIFO after mid
            ]
        )
        sh.finalize_wave(1, -1, -1)
        urls = sh.released_tbl.column("url").to_pylist()
        assert urls == [
            "http://h.test/high.html",
            "http://h.test/mid.html",
            "http://h.test/tie.html",
            "http://h.test/low.html",
        ]
        assert sh.released_tbl.column("cash").to_pylist() == [0.6, 0.3, 0.3, 0.1]

    def test_sighting_accrual_same_wave_and_across_waves(self):
        sh = FrontierShard(0, 1, opic=True)
        # wave 1: two sightings of hub (0.2 + 0.3) and one of leaf (0.4)
        sh.add_candidates(
            [
                cand(1, 0, "http://h.test/hub.html", 0.2),
                cand(2, 0, "http://h.test/hub.html", 0.3),
                cand(1, 1, "http://h.test/leaf.html", 0.4),
            ]
        )
        # cap 1: only the leaf's 0.4 loses to hub's 0.5
        assert sh.finalize_wave(1, -1, -1, None, 1) == 1
        assert sh.released_tbl.column("url").to_pylist() == [
            "http://h.test/hub.html"
        ]
        assert sh.released_tbl.column("cash").to_pylist() == [0.5]
        # wave 2: ANOTHER sighting of the still-pending leaf accrues
        # (the sighting itself is a seen-dup — no new pending entry)
        sh.add_candidates([cand(3, 0, "http://h.test/leaf.html", 0.25)])
        assert sh.finalize_wave(2, -1, -1) == 1
        assert sh.released_tbl.column("url").to_pylist() == [
            "http://h.test/leaf.html"
        ]
        assert sh.released_tbl.column("cash").to_pylist() == [
            pytest.approx(0.65)
        ]

    def test_depth_gated_urls_never_enter_hot_set(self):
        sh = FrontierShard(0, 1, opic=True)
        sh.add_candidates(
            [cand(1, 0, "http://h.test/deep.html", 0.9, d=5)]
        )
        sh.finalize_wave(1, 3, -1)  # max_depth 3 < parent depth 5
        assert sh.released_tbl.num_rows == 0
        assert sh.url_cash == {}  # no leaked entry for the gated url

    def test_breaker_dropped_entries_retire_their_cash(self):
        sh = FrontierShard(0, 1, opic=True)
        sh.add_candidates(
            [
                cand(1, 0, "http://bad.test/a.html", 0.8, host="bad.test"),
                cand(1, 1, "http://ok.test/b.html", 0.2, host="ok.test"),
            ]
        )
        sh.finalize_wave(1, -1, -1, None, 0)  # cap 0: both stay pending
        sh.open_breakers(["bad.test"])
        sh.finalize_wave(2, -1, -1)
        assert sh.released_tbl.column("url").to_pylist() == [
            "http://ok.test/b.html"
        ]
        # the dropped url's cash must not linger in the hot set
        assert sh.url_cash == {}
        assert sh.counters["breaker_dropped"] == 1

    def test_snapshot_roundtrip_and_toggle_guard(self, tmp_path):
        sh = FrontierShard(0, 1, opic=True)
        sh.add_candidates([cand(1, 0, "http://h.test/a.html", 0.7)])
        # accrue without releasing: cap 0 keeps it pending
        sh.finalize_wave(1, -1, -1, None, 0)
        p = str(tmp_path / "shard_0.pkl")
        sh.snapshot(p, wave=1)
        sh2 = FrontierShard(0, 1, opic=True)
        assert sh2.restore(p) == 1
        assert sh2.url_cash == {"http://h.test/a.html": 0.7}
        sh2.finalize_wave(2, -1, -1)
        assert sh2.released_tbl.column("cash").to_pylist() == [0.7]
        fifo = FrontierShard(0, 1, opic=False)
        with pytest.raises(ValueError, match="opic"):
            fifo.restore(p)


def _star_site() -> TablePageStore:
    """index → p1..p4; every p links (leaf FIRST, hub LAST) so FIFO
    discovery order favors leaf1 while cash favors the 4×-linked hub."""

    def html(name, links):
        body = "".join(f'<a href="{u}">x</a>' for u in links)
        return PageRecord(
            url=f"http://star.test/{name}",
            body=f"<html><body>{body}</body></html>".encode(),
            content_type="text/html",
        )

    recs = [
        html("", [f"p{i}.html" for i in range(1, 5)]),
        *[
            html(f"p{i}.html", [f"leaf{i}.html", "hub.html"])
            for i in range(1, 5)
        ],
        html("hub.html", []),
        *[html(f"leaf{i}.html", []) for i in range(1, 5)],
    ]
    return TablePageStore.from_records(recs)


# root-level files carry the reference's double-slash path quirk
ALL_STAR_DOCS = {
    "star.test/index.html",
    *{f"star.test//p{i}.html" for i in range(1, 5)},
    "star.test//hub.html",
    *{f"star.test//leaf{i}.html" for i in range(1, 5)},
}


def _wave_of(res, doc_id):
    df = res.docs.to_pandas()
    return int(df.loc[df["doc_id"] == doc_id, "wave"].iloc[0])


class TestOpicE2E:
    def _run(self, opic: bool):
        return crawl(
            CrawlConfig(origin="http://star.test/", opic=opic),
            _star_site(),
            num_shards=1,
            max_wave_entries=1,  # one fetch per wave after the seed
        )

    def test_hub_overtakes_fifo_order_and_set_is_unchanged(self):
        fifo = self._run(opic=False)
        prio = self._run(opic=True)
        fifo_ids = set(fifo.docs.to_pandas()["doc_id"])
        prio_ids = set(prio.docs.to_pandas()["doc_id"])
        assert fifo_ids == prio_ids == ALL_STAR_DOCS  # scheduling-only
        # under FIFO, leaf1 (discovered first on p1) beats the hub;
        # under OPIC the 4×-sighted hub (cash 4 × 1/8) beats every
        # leaf (1/8 each)
        assert _wave_of(fifo, "star.test//leaf1.html") < _wave_of(
            fifo, "star.test//hub.html"
        )
        assert _wave_of(prio, "star.test//hub.html") < _wave_of(
            prio, "star.test//leaf1.html"
        )


def test_politeness_cap_releases_highest_cash_per_host():
    from suckit_ray.state.frontier import FrontierShard

    sh = FrontierShard(0, 1, opic=True)
    sh.add_candidates(
        [
            cand(1, 0, "http://a.test/lo.html", 0.1, host="a.test"),
            cand(1, 1, "http://a.test/hi.html", 0.9, host="a.test"),
            cand(1, 2, "http://b.test/mid.html", 0.5, host="b.test"),
            cand(1, 3, "http://b.test/top.html", 0.7, host="b.test"),
        ]
    )
    # per-host cap 1: each host contributes its HIGHEST-cash url
    sh.finalize_wave(1, -1, -1, 1)
    urls = set(sh.released_tbl.column("url").to_pylist())
    assert urls == {"http://a.test/hi.html", "http://b.test/top.html"}
    # next wave drains the rest, still cash-first per host
    sh.finalize_wave(2, -1, -1, 1)
    urls2 = set(sh.released_tbl.column("url").to_pylist())
    assert urls2 == {"http://a.test/lo.html", "http://b.test/mid.html"}
