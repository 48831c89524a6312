"""Ingress-style incremental recompute (pipelines/incremental).

Contract (docs/analytical_engine/ingress.md): after an edge delta,
warm-starting from the previous fixpoint must reach EXACTLY the result
a full recompute reaches (WCC exact, PageRank 1e-10 at tol), in fewer
rounds — and the warm state must be loadable from a CheckpointManager
manifest (the --resume wiring).
"""

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data

from graphscope_ray.pipelines import algorithms
from graphscope_ray.pipelines.incremental import (
    pagerank_incremental,
    state_from_checkpoint,
    wcc_incremental,
)
from graphscope_ray.state.graph import build_graph


def _ring_plus_bridges(n=60, seed=7):
    """Base: several disjoint chains; delta: random bridge edges that
    merge chains and attach brand-new vertices."""
    rng = np.random.default_rng(seed)
    base = []
    for c in range(6):
        vs = np.arange(c * 10, c * 10 + 10)
        base += [(int(a), int(b)) for a, b in zip(vs[:-1], vs[1:])]
    delta = [(5, 25), (35, 55), (12, 47)]
    # new vertices 100..104 chained onto vertex 3
    delta += [(3, 100), (100, 101), (101, 102)]
    extra = [(int(rng.integers(0, 60)), int(103 + i)) for i in range(2)]
    return (pd.DataFrame(base, columns=["src", "dst"]),
            pd.DataFrame(delta + extra, columns=["src", "dst"]))


@pytest.fixture(scope="module")
def split():
    base, delta = _ring_plus_bridges()
    return base, delta, pd.concat([base, delta], ignore_index=True)


class TestWccIncremental:
    @pytest.mark.parametrize("P", [1, 3])
    def test_matches_full_recompute_exact(self, ray_session, split, P):
        base, delta, full = split
        gb = build_graph(ray.data.from_pandas(base), num_partitions=P,
                         directed=False)
        prev, prev_m = algorithms.wcc(gb)
        gf = build_graph(ray.data.from_pandas(full), num_partitions=P,
                         directed=False)
        inc, inc_m = wcc_incremental(
            gf, prev, ray.data.from_pandas(delta))
        inc_df = inc.to_pandas().sort_values("vid").reset_index(drop=True)
        gf2 = build_graph(ray.data.from_pandas(full), num_partitions=P,
                          directed=False)
        cold, cold_m = algorithms.wcc(gf2)
        cold_df = cold.to_pandas().sort_values("vid").reset_index(drop=True)
        pd.testing.assert_frame_equal(inc_df, cold_df)
        # round-count reduction: the warm run's frontier starts at the
        # delta endpoints only — never MORE rounds than cold start
        assert inc_m["rounds"] <= cold_m["rounds"]

    def test_fewer_rounds_on_long_chain(self, ray_session):
        # chain 0-1-…-39 converges in ~chain-length rounds cold; the
        # delta only appends 40-41 at the far end (label already 0 at
        # 39), so the incremental run settles in O(1) rounds
        base = pd.DataFrame(
            {"src": np.arange(39), "dst": np.arange(1, 40)})
        delta = pd.DataFrame({"src": [39], "dst": [40]})
        full = pd.concat([base, delta], ignore_index=True)
        gb = build_graph(ray.data.from_pandas(base), num_partitions=2,
                         directed=False)
        prev, _ = algorithms.wcc(gb)
        gf = build_graph(ray.data.from_pandas(full), num_partitions=2,
                         directed=False)
        inc, inc_m = wcc_incremental(gf, prev,
                                     ray.data.from_pandas(delta))
        gf2 = build_graph(ray.data.from_pandas(full), num_partitions=2,
                          directed=False)
        cold, cold_m = algorithms.wcc(gf2)
        assert (inc.to_pandas().sort_values("vid")["component"].to_numpy()
                == cold.to_pandas().sort_values("vid")["component"]
                .to_numpy()).all()
        assert inc_m["rounds"] < cold_m["rounds"] / 2

    def test_deletions_refused(self, ray_session, split):
        base, delta, full = split
        gf = build_graph(ray.data.from_pandas(full), num_partitions=2,
                         directed=False)
        with pytest.raises(ValueError, match="deletions"):
            wcc_incremental(gf, ray.data.from_pandas(
                pd.DataFrame({"vid": [0], "component": [0]})),
                ray.data.from_pandas(delta), deletions=True)


class TestPagerankIncremental:
    @pytest.mark.parametrize("P", [1, 3])
    def test_matches_full_recompute_at_tol(self, ray_session, split, P):
        base, delta, full = split
        gb = build_graph(ray.data.from_pandas(base), num_partitions=P,
                         directed=False)
        prev, _ = algorithms.pagerank(gb, tol=1e-12, max_iter=500)
        gf = build_graph(ray.data.from_pandas(full), num_partitions=P,
                         directed=False)
        inc, inc_m = pagerank_incremental(gf, prev, tol=1e-12,
                                          max_iter=500)
        gf2 = build_graph(ray.data.from_pandas(full), num_partitions=P,
                          directed=False)
        cold, cold_m = algorithms.pagerank(gf2, tol=1e-12, max_iter=500)
        a = inc.to_pandas().sort_values("vid")["pagerank"].to_numpy()
        b = cold.to_pandas().sort_values("vid")["pagerank"].to_numpy()
        np.testing.assert_allclose(a, b, atol=1e-10, rtol=0)
        # this delta rewires 8/65 vertices — warm start must at least
        # never lose rounds (strict reduction pinned on the small-delta
        # test below)
        assert inc_m["rounds"] <= cold_m["rounds"]

    def test_round_reduction_small_delta(self, ray_session):
        rng = np.random.default_rng(3)
        n = 200
        base = pd.DataFrame({"src": rng.integers(0, n, 400),
                             "dst": rng.integers(0, n, 400)})
        base = base[base.src != base.dst].drop_duplicates()
        delta = pd.DataFrame({"src": [0], "dst": [200]})
        full = pd.concat([base, delta], ignore_index=True)
        gb = build_graph(ray.data.from_pandas(base), num_partitions=2,
                         directed=False)
        prev, _ = algorithms.pagerank(gb, tol=1e-12, max_iter=500)
        gf = build_graph(ray.data.from_pandas(full), num_partitions=2,
                         directed=False)
        inc, inc_m = pagerank_incremental(gf, prev, tol=1e-12,
                                          max_iter=500)
        gf2 = build_graph(ray.data.from_pandas(full), num_partitions=2,
                          directed=False)
        cold, cold_m = algorithms.pagerank(gf2, tol=1e-12, max_iter=500)
        a = inc.to_pandas().sort_values("vid")["pagerank"].to_numpy()
        b = cold.to_pandas().sort_values("vid")["pagerank"].to_numpy()
        np.testing.assert_allclose(a, b, atol=1e-10, rtol=0)
        assert inc_m["rounds"] < cold_m["rounds"]

    def test_new_vertices_get_uniform_seed(self, ray_session):
        # prev state covers only {0,1}; vertex 2 is new → seeded 1/3,
        # and the run converges to the 3-cycle's uniform fixpoint
        base = pd.DataFrame({"src": [0, 1], "dst": [1, 0]})
        full = pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 0]})
        gb = build_graph(ray.data.from_pandas(base), num_partitions=2,
                         directed=False)
        prev, _ = algorithms.pagerank(gb, tol=1e-12, max_iter=200)
        gf = build_graph(ray.data.from_pandas(full), num_partitions=2,
                         directed=True)
        inc, _ = pagerank_incremental(gf, prev, tol=1e-12, max_iter=500)
        out = inc.to_pandas().sort_values("vid")["pagerank"].to_numpy()
        np.testing.assert_allclose(out, [1 / 3] * 3, atol=1e-9)


class TestCheckpointWiring:
    def test_warm_start_from_manifest(self, ray_session, split, tmp_path):
        """The --resume path: the nightly job checkpoints its WCC
        fixpoint; the next ingest warm-starts from the manifest files
        (cross-graph — new vertices keep the warm default)."""
        base, delta, full = split
        gb = build_graph(ray.data.from_pandas(base), num_partitions=2,
                         directed=False)
        state, _ = algorithms.wcc(gb, ckpt_dir=str(tmp_path),
                                  job="nightly", ckpt_every=1)
        prev = state_from_checkpoint(str(tmp_path), "nightly")
        # checkpoint state column is the generic 'value' name — the
        # warm ingest reads (vid, <second column>) positionally
        gf = build_graph(ray.data.from_pandas(full), num_partitions=2,
                         directed=False)
        inc, _ = wcc_incremental(gf, prev, ray.data.from_pandas(delta))
        gf2 = build_graph(ray.data.from_pandas(full), num_partitions=2,
                          directed=False)
        cold, _ = algorithms.wcc(gf2)
        pd.testing.assert_frame_equal(
            inc.to_pandas().sort_values("vid").reset_index(drop=True),
            cold.to_pandas().sort_values("vid").reset_index(drop=True))

    def test_missing_checkpoint_raises(self, ray_session, tmp_path):
        import os
        os.makedirs(tmp_path / "empty", exist_ok=True)
        with pytest.raises(FileNotFoundError):
            state_from_checkpoint(str(tmp_path), "empty")
