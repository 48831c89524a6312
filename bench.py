"""Benchmark entry point (driver contract).

Headline metric: the north-rule flagship job — synthetic source-code
corpus (deterministic, cached in /tmp) → sha256 ingest → dependency
edge derivation → actor-pool CSR graph build → PageRank to 1e-6 +
WCC to fixpoint — reported as wall seconds plus derived
edges-processed/sec (|arcs| × supersteps / algo seconds).

Also times representative per-operator queries over $GRAFT_SF_DIR
(default /root/testdata/sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, ...}

`--scaling` runs the headline job at num_cpus=8 and 32 in fresh
processes on the same input and reports both throughputs + scaling
efficiency (the sandbox proxy for the N-vs-4N-node criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_REPOS = int(os.environ.get("GRAFT_BENCH_REPOS", "8000"))
# Shard count is a DATA-size choice, not a cluster-size one (VERDICT
# r01: P=f(cpus) inflates the P² message-object cost at small arc
# counts). Default: one shard per ~2.5M arcs, clamped to [8, 32]; the
# scaling protocol pins the same P at both parallelism levels so the
# superstep work is identical and only the resources differ.
SHARDS = os.environ.get("GRAFT_SHARDS")


def _rpc(*args, **kwargs):
    """Metadata-stripped parquet read (lazy import — bench's module
    top stays stdlib-only so `--scaling` subprocesses start fast)."""
    from graphscope_ray.sources.readers import read_parquet_clean

    return read_parquet_clean(*args, **kwargs)


def _init_ray():
    import logging

    # Honest parallelism bound: ray.init(num_cpus=N) throttles TASK
    # concurrency but actors compute unthrottled on every host thread
    # (seal/BSP phases measured identical at num_cpus=2 and 32). Pin
    # the whole process tree (raylet + workers + actors inherit the
    # driver's affinity) to N hardware threads so an "N-cpu leg" is a
    # faithful proxy for an N-core cluster slice.
    if os.environ.get("GRAFT_AFFINITY", "1") == "1":
        try:
            os.sched_setaffinity(0, range(min(NUM_CPUS, os.cpu_count())))
        except (AttributeError, OSError):
            pass

    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from graphscope_ray.context import tune_for_session

    tune_for_session()


BODY_TOKENS = int(os.environ.get("GRAFT_BODY_TOKENS", "4"))


def _corpus_dir() -> str:
    from graphscope_ray.sources.generator import CorpusSpec, write_corpus

    suffix = "" if BODY_TOKENS == 4 else f"_bt{BODY_TOKENS}"
    d = f"/tmp/gsr_bench_corpus_{N_REPOS}{suffix}"
    spec = CorpusSpec(
        n_repos=N_REPOS, n_communities=max(4, N_REPOS // 500),
        keys_per_community=8, n_hub_keys=4, n_hub_repos=4, seed=42,
        body_tokens=BODY_TOKENS,
    )
    write_corpus(d, spec, repos_per_file=2000)  # skips existing shards
    return d


def headline() -> dict:
    import ray.data

    from graphscope_ray.pipelines import algorithms
    from graphscope_ray.pipelines.repo_graph import build_repo_graph
    from graphscope_ray.stages.derive import with_sha256

    import ray as _ray

    d = _corpus_dir()
    # warm the page cache so we measure compute + shuffle, not cold disk
    _rpc(d).count()
    # warm the worker pool: process spawn cost scales with num_cpus and
    # would otherwise be billed to the first timed stage

    @_ray.remote
    def _noop():
        return 0

    _ray.get([_noop.remote() for _ in range(2 * NUM_CPUS)])

    # P sized to the data (≈2.5M arcs/shard at 64.7 arcs/repo derived
    # rate), not the cpu count; override via GRAFT_SHARDS
    P = int(SHARDS) if SHARDS else max(8, min(32, N_REPOS * 65 // 2_500_000))
    t0 = time.perf_counter()
    corpus = _rpc(d, columns=["repo", "path", "content"])
    n_rows = with_sha256(corpus).count()  # ingest + invariant column
    t_ingest = time.perf_counter()
    graph, vmap = build_repo_graph(
        corpus, num_partitions=P, directed=False, cap_per_key=64
    )
    t_build = time.perf_counter()
    # one undirected build serves both algorithms (CSR is immutable;
    # each algorithm re-initialises its own vertex state on the shards)
    _, pr_m = algorithms.pagerank(graph, tol=1e-6)
    t_pr = time.perf_counter()
    _, wcc_m = algorithms.wcc(graph)
    t_wcc = time.perf_counter()
    # throughput measurement over fixed rounds: at large N the 1e-6
    # convergence test (err < N*tol, networkx semantics) can pass after
    # a single superstep, which says nothing about sustained edges/sec
    _, pr10_m = algorithms.pagerank(graph, max_iter=10, tol=0.0)

    pr_eps = graph.n_edges * pr10_m["rounds"] / max(pr10_m["seconds"], 1e-9)
    wcc_eps = graph.n_edges * wcc_m["rounds"] / max(wcc_m["seconds"], 1e-9)
    return {
        "headline_sec": t_wcc - t0,
        "ingest_sec": t_ingest - t0,
        "graph_build_sec": t_build - t_ingest,
        # per-phase build walls (derive+route / mirror exchange / vertex
        # route / per-shard seal) — the scaling table grades these
        # separately (compute-bound vs bandwidth-bound, BASELINE.md)
        **{f"build_{k}": round(v, 3)
           for k, v in graph.build_phases.items()},
        "pagerank_sec": t_pr - t_build,
        "wcc_sec": t_wcc - t_pr,
        "corpus_rows": n_rows,
        "graph_vertices": graph.n_vertices,
        "graph_arcs": graph.n_edges,
        "pagerank_rounds": pr_m["rounds"],
        "pagerank10_sec": pr10_m["seconds"],
        "wcc_rounds": wcc_m["rounds"],
        "pagerank_edges_per_sec": pr_eps,
        "wcc_edges_per_sec": wcc_eps,
    }


def _q_span_dedup(sf_dir: str):
    """Stress shape for paragraph_dedup: the sf documents are one-line
    word streams, so sep=' ' explodes EVERY token as a span — maximal
    span rows per byte of corpus (worst case for the three shuffles)."""
    from graphscope_ray.stages.dedup import paragraph_dedup

    docs = _rpc(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return paragraph_dedup(docs, sep=" ")


def _q_decontam(sf_dir: str):
    """Benchmark-decontamination timing: blocklist from the first 100
    docs (the 'eval set'), one streaming overlap pass over the corpus."""
    from graphscope_ray.stages.textprep import decontaminate

    docs = _rpc(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    bench = docs.limit(100)
    return decontaminate(docs, bench, n=8)


def _q_kmeans(sf_dir: str):
    """Spherical k-means over the embeddings table: 5 Lloyd passes,
    k=16 — per-pass cost is the streaming partial-sum scan."""
    from graphscope_ray.stages.similarity import kmeans

    emb = _rpc(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    assigned, _, _ = kmeans(emb, k=16, iters=5, seed=42)
    return assigned


def _q_node2vec(sf_dir: str):
    """Graph-embedding leg: DeepWalk corpus on the resident shard pool
    + 2-epoch SGNS (pipelines/walks.random_walks_pool +
    functions/skipgram)."""
    from graphscope_ray.functions.skipgram import train_skipgram
    from graphscope_ray.pipelines import sf_graph
    from graphscope_ray.pipelines.walks import random_walks_pool

    g = sf_graph.build_part_graph(sf_dir)
    walks = random_walks_pool(g, walk_length=5, num_walks=1, seed=42)
    emb, _ = train_skipgram(walks, dim=16, window=2, epochs=2, seed=42)
    return emb


def run_queries() -> dict:
    """Representative per-operator timings over the sf dir."""
    from graphscope_ray.pipelines import sf_graph, textproc, tpch

    picks = {
        "q1": tpch.q1_pricing_summary,
        "q3": tpch.q3_top_orders,
        "q5": tpch.q5_nation_revenue,
        "cypher_parts": sf_graph.q_cypher_parts,
        "events_window": tpch.q_events_window,
        "part_pagerank": sf_graph.q_part_pagerank,
        "part_wcc": sf_graph.q_part_wcc,
        "part_kcore": sf_graph.q_part_kcore,
        "part_apsp": sf_graph.q_part_apsp,
        "part_triangles": sf_graph.q_part_triangles,
        "doc_dedup": textproc.q_doc_dedup,
        "doc_simhash": textproc.q_doc_simhash,
        "doc_repetition": textproc.q_doc_repetition,
        "ann_topk": textproc.q_ann_topk,
        "doc_span_dedup": _q_span_dedup,
        "doc_substr_dedup": textproc.q_doc_substr_dedup,
        "doc_packed": textproc.q_doc_packed,
        "events_funnel": tpch.q_events_funnel,
        "doc_decontam": _q_decontam,
        "emb_kmeans": _q_kmeans,
        "node2vec": _q_node2vec,
        "doc_pipeline": textproc.q_doc_pipeline,
        "doc_gopher": textproc.q_doc_gopher,
        "doc_bm25": textproc.q_doc_bm25,
        "doc_bloom_new": textproc.q_doc_bloom_new,
        # round-5 gates
        "gremlin_parts": sf_graph.q_gremlin_parts,
        "cypher_write": sf_graph.q_cypher_write,
        "part_wcc_incr": sf_graph.q_part_wcc_incr,
        "part_pagerank_incr": sf_graph.q_part_pagerank_incr,
    }
    out = {}
    for name, fn in picks.items():
        t0 = time.perf_counter()
        res = fn(SF_DIR)
        if hasattr(res, "count"):
            res.count()  # consume the lazy pipeline
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def big_superstep_rate() -> dict:
    """Fixed-10-round PageRank edges/sec at the scaling-corpus size
    (default 600k repos / 38.8M arcs) — the sustained superstep rate at
    a scale where per-round compute dominates actor round-trip latency
    (the sf0.1 graph's 0.5M arcs are latency-bound and overstate the
    rate; VERDICT r02 #8). Reuses the /tmp scaling-corpus cache; skip
    with GRAFT_BIG=0."""
    global N_REPOS, BODY_TOKENS
    import ray.data

    from graphscope_ray.pipelines import algorithms
    from graphscope_ray.pipelines.repo_graph import build_repo_graph

    save = (N_REPOS, BODY_TOKENS)
    N_REPOS = int(os.environ.get("GRAFT_BIG_REPOS", "600000"))
    BODY_TOKENS = int(os.environ.get("GRAFT_BIG_BODY_TOKENS", "64"))
    try:
        d = _corpus_dir()
        P = int(SHARDS) if SHARDS else 16
        corpus = _rpc(d, columns=["repo", "path", "content"])
        t0 = time.perf_counter()
        graph, _ = build_repo_graph(
            corpus, num_partitions=P, directed=False, cap_per_key=64
        )
        t_build = time.perf_counter() - t0
        _, pr_m = algorithms.pagerank(graph, max_iter=10, tol=0.0)
        eps = graph.n_edges * pr_m["rounds"] / max(pr_m["seconds"], 1e-9)
        return {
            "big_repos": N_REPOS,
            "big_graph_arcs": graph.n_edges,
            "big_build_sec": round(t_build, 3),
            "big_pagerank10_sec": round(pr_m["seconds"], 3),
            "pagerank_edges_per_sec_big": round(eps, 1),
        }
    finally:
        N_REPOS, BODY_TOKENS = save


def _host_window() -> dict:
    """10-line host-condition stamp (tools/hostprobe.py's single-proc
    probes, abbreviated): the sandbox's shared memory bus drifts 2-3x
    across hours (BASELINE.md), so every BENCH line carries the window
    it was measured in — absolute numbers are comparable across rounds
    only after normalizing by this."""
    import numpy as np

    # 200 MB buffer (matches tools/hostprobe.py) so the copy streams
    # DRAM, not LLC — 25 MB buffers were measured reading 5-8 GB/s
    # (cache-resident) vs 0.1 GB/s cold on the same degraded bus
    a = np.ones(200_000_000, dtype=np.uint8)
    t0 = time.perf_counter()
    b = a.copy()
    membw = a.nbytes / (time.perf_counter() - t0) / 1e9
    t0 = time.perf_counter()
    s = 0
    for i in range(2_000_000):
        s += i * i
    cpu = 2_000_000 / (time.perf_counter() - t0) / 1e6
    del b, s
    return {"host_membw_GBs": round(membw, 3),
            "host_cpu_Mloops": round(cpu, 2)}


def main():
    _init_ray()
    import ray

    h = headline()
    h.update(_host_window())
    if os.environ.get("GRAFT_BIG", "1") == "1" \
            and not os.environ.get("GRAFT_SKIP_QUERIES"):
        h.update(big_superstep_rate())
    q = {} if os.environ.get("GRAFT_SKIP_QUERIES") else run_queries()
    print(json.dumps({
        "metric": "flagship corpus->graph->PageRank(1e-6)+WCC wall time",
        "value": round(h["headline_sec"], 3),
        "unit": "sec",
        "queries": q,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "detail": {k: (round(v, 3) if isinstance(v, float) else v)
                   for k, v in h.items()},
    }))
    ray.shutdown()


def scaling():
    """Same job (ingest -> derive -> build -> PageRank 1e-6 + WCC) on
    the same input at num_cpus=N and 4N in fresh processes (sandbox
    proxy for N vs 4N nodes, BASELINE.md protocol). Shard count P is
    pinned identical at both levels (data-sized partitioning), so the
    two legs run the same plan with different resources.

    The sandbox host is co-tenant-noisy (round-1 legs varied 26-59 s
    on identical input), so the protocol runs the leg PAIR
    back-to-back ``GRAFT_SCALING_RUNS`` times (default 3) and reports
    per-pair efficiencies plus the median — pairing time-localizes the
    noise. Env knobs: GRAFT_SCALING_N (default 8),
    GRAFT_SCALING_REPOS (default 600000)."""
    n_repos = os.environ.get("GRAFT_SCALING_REPOS", "600000")
    n_lo = int(os.environ.get("GRAFT_SCALING_N", "8"))
    n_hi = 4 * n_lo
    runs = int(os.environ.get("GRAFT_SCALING_RUNS", "3"))
    shards = os.environ.get("GRAFT_SHARDS", "16")
    # realistic per-file content (~700 B) for the scaling corpus: the
    # round-1 60-byte bodies made the job shuffle/IPC-bound, which on
    # this steal-heavy sandbox host measures the hypervisor, not the
    # engine (BASELINE.md, utilization evidence)
    body_tokens = os.environ.get("GRAFT_BODY_TOKENS", "64")

    def leg(n):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(n),
                   GRAFT_BENCH_REPOS=n_repos, GRAFT_SKIP_QUERIES="1",
                   GRAFT_SHARDS=shards, GRAFT_BODY_TOKENS=body_tokens)
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, capture_output=True, text=True,
                           check=True,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
        return json.loads(r.stdout.strip().splitlines()[-1])

    pairs = []
    for i in range(runs):
        lo = leg(n_lo)
        hi = leg(n_hi)
        pairs.append({
            "run": i,
            f"sec_{n_lo}": lo["value"], f"sec_{n_hi}": hi["value"],
            # host-window stamps per leg: pairs measured on a degraded
            # bus (quiet ref ≈0.30 GB/s) are graded accordingly
            "membw_lo": lo["detail"].get("host_membw_GBs"),
            "membw_hi": hi["detail"].get("host_membw_GBs"),
            "eff_wall": round((lo["value"] / hi["value"]) / 4, 3),
            "eff_build": round(
                (lo["detail"]["graph_build_sec"]
                 / hi["detail"]["graph_build_sec"]) / 4, 3),
            "detail_lo": lo["detail"], "detail_hi": hi["detail"],
        })
    effs = sorted(p["eff_wall"] for p in pairs)
    med = effs[len(effs) // 2] if runs % 2 else (
        effs[runs // 2 - 1] + effs[runs // 2]) / 2
    beffs = sorted(p["eff_build"] for p in pairs)
    bmed = beffs[len(beffs) // 2] if runs % 2 else (
        beffs[runs // 2 - 1] + beffs[runs // 2]) / 2
    print(json.dumps({
        "n_repos": int(n_repos), "n_lo": n_lo, "n_hi": n_hi,
        "shards": int(shards), "runs": runs,
        "pairs": [{k: v for k, v in p.items()
                   if not k.startswith("detail")} for p in pairs],
        "scaling_efficiency_wall_median": med,
        "scaling_efficiency_build_median": bmed,
        "scaling_efficiency_wall": med,
        "detail_lo_last": pairs[-1]["detail_lo"],
        "detail_hi_last": pairs[-1]["detail_hi"],
    }))


def smoke2m():
    """Standing 3.3×-scale smoke (default 2M repos / ~129M arcs /
    ~7 GB content): corpus → build → fixed-10-round PageRank, with the
    host-window stamp attached (BASELINE.md r3 protocol). Proves every
    stage streams within heap at a scale where per-round compute
    dominates actor latency. Env: GRAFT_SMOKE_REPOS (default
    2_000_000)."""
    _init_ray()
    import ray

    os.environ["GRAFT_BIG_REPOS"] = os.environ.get(
        "GRAFT_SMOKE_REPOS", "2000000")
    out = big_superstep_rate()
    out.update(_host_window())
    out["num_cpus"] = NUM_CPUS
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif "--smoke2m" in sys.argv:
        smoke2m()
    else:
        main()
