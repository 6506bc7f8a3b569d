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
