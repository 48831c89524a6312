"""Checkpoint/resume (FIXTURES.md F5): kill after superstep k, resume,
final state byte-identical to an uninterrupted run."""

import json
import os

import ray.data

from graphscope_ray.pipelines.algorithms import pagerank, wcc
from graphscope_ray.sources.generator import MICRO_VERTICES, micro_edge_table
from graphscope_ray.state.graph import build_graph


def _graph(P=3, directed=True):
    edges = ray.data.from_arrow(micro_edge_table())
    verts = ray.data.from_items([{"vid": v} for v in MICRO_VERTICES])
    return build_graph(edges, num_partitions=P, directed=directed,
                       extra_vertices=verts)


def test_pagerank_resume_bitwise(tmp_path):
    ck = str(tmp_path / "ckpt")
    # uninterrupted run
    full, _ = pagerank(_graph())
    want = full.to_pandas().sort_values("vid").reset_index(drop=True)

    # interrupted run: stop after 5 rounds (simulated kill), checkpointing
    interrupted, _ = pagerank(_graph(), max_iter=5, tol=0.0,
                              ckpt_dir=ck, job="pr", ckpt_every=1)
    # manifests exist with lineage
    steps = sorted(os.listdir(os.path.join(ck, "pr")))
    assert len(steps) == 5
    m = json.load(open(os.path.join(ck, "pr", steps[-1], "manifest.json")))
    assert m["superstep"] == 4 and m["num_partitions"] == 3
    assert "dangling" in m["scalars"] and m["per_partition"]

    # resume on a FRESH graph (new actors) and run to convergence
    resumed, metrics = pagerank(_graph(), ckpt_dir=ck, job="pr", ckpt_every=0)
    got = resumed.to_pandas().sort_values("vid").reset_index(drop=True)
    assert metrics["per_round"][0]["round"] == 5  # re-entered mid-iteration
    # bitwise-identical to the uninterrupted run
    assert (got["pagerank"].to_numpy() == want["pagerank"].to_numpy()).all()


def test_pagerank_resume_rejects_config_mismatch(tmp_path):
    ck = str(tmp_path / "ckpt")
    pagerank(_graph(P=3), max_iter=3, tol=0.0, ckpt_dir=ck, job="pr",
             ckpt_every=1)
    # different partition count -> different config hash -> fresh start
    res, metrics = pagerank(_graph(P=2), ckpt_dir=ck, job="pr")
    assert metrics["per_round"][0]["round"] == 0  # did NOT resume


def test_wcc_resume(tmp_path):
    ck = str(tmp_path / "ckpt")
    full, _ = wcc(_graph(directed=False))
    want = full.to_pandas().sort_values("vid").reset_index(drop=True)
    wcc(_graph(directed=False), max_iter=2, ckpt_dir=ck, job="w", ckpt_every=1)
    resumed, _ = wcc(_graph(directed=False), ckpt_dir=ck, job="w")
    got = resumed.to_pandas().sort_values("vid").reset_index(drop=True)
    assert (got["component"].to_numpy() == want["component"].to_numpy()).all()
