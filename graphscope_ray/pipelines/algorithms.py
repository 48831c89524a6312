"""Iterative graph algorithms as BSP superstep loops over GraphShard pools.

The driver-side round loop is the Ray-native restatement of grape's
worker ``Query`` loop (PEval + IncEval per superstep with MPI message
exchange, SURVEY §3.1 step 3): each round is scatter (per-shard local
combine) → object-store message exchange (refs routed shard→shard, the
role of mirror sync ``SyncStateOnOuterVertex``) → apply (segment
reduce + state update) → driver-side scalar allreduce (the role of
``grape::Communicator::Sum``, pagerank_networkx.h:85,146).

Each algorithm returns ``(state_dataset, metrics)`` where the dataset is
``(vid, <col>)`` and metrics carries per-round message counts and
timings (north-rule lineage metrics).
"""

from __future__ import annotations

import time

from graphscope_ray.state.checkpoint import CheckpointManager
from graphscope_ray.state.graph import ShardedGraph


def _metrics(rounds, n_edges):
    total_s = sum(r["seconds"] for r in rounds)
    return {
        "rounds": len(rounds),
        "seconds": total_s,
        "edges_per_sec": (n_edges * len(rounds) / total_s) if total_s > 0 else 0.0,
        "per_round": rounds,
    }


def pagerank(
    graph: ShardedGraph,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1e-6,
    ckpt_dir: str | None = None,
    job: str = "pagerank",
    ckpt_every: int = 0,
):
    """NetworkX-semantics PageRank with dangling-mass redistribution.

    Exact update (apps/pagerank/pagerank_networkx.h:117-161):
      rank'[v] = alpha*Σ_in rank[u]/outdeg[u] + (1-alpha)/N + alpha*dangling/N
    where ``dangling`` is the summed rank of outdeg-0 vertices from the
    *previous* round. Convergence: Σ|rank'-rank| < tol*N (":135-149").
    ``tol=0`` forces exactly ``max_iter`` rounds (used by the SQL-unrolled
    oracle). Undirected graphs (both arcs stored) match networkx.Graph.
    """
    n = graph.n_vertices
    # tol/max_iter are stopping criteria, not state: resume across them
    # is sound, so they are excluded from the lineage config hash
    cfg = f"pagerank|a={alpha}|P={graph.P}|V={n}|E={graph.n_edges}"
    ck = CheckpointManager(ckpt_dir, job, cfg)
    start_round = 0
    dangling = None
    m = ck.latest()
    if m is not None:
        start_round = ck.restore(graph, m) + 1
        dangling = m["scalars"]["dangling"]
    if dangling is None:
        dangling = sum(graph.call_all("pagerank_init", n))
    rounds = []
    # fused supersteps: round-0 scatter, then one apply+scatter RPC
    # wave per round; the driver syncs only on the scalar partials
    refs = graph.step_refs("pagerank_step", 0.0, alpha)
    for it in range(start_round, max_iter):
        t0 = time.perf_counter()
        base = (1.0 - alpha) / n + alpha * dangling / n
        refs = graph.step_refs("pagerank_step", base, alpha, inbox=refs)
        parts = graph.step_scalars(refs)
        delta = sum(p[0] for p in parts)
        dangling = sum(p[1] for p in parts)
        rounds.append({"round": it, "delta": delta, "seconds": time.perf_counter() - t0})
        if ckpt_every and (it + 1) % ckpt_every == 0:
            ck.save(graph, it, {"dangling": dangling},
                    {"delta": delta, "edges_processed": graph.n_edges * (it + 1)})
        if tol > 0 and delta < tol * n:
            break
    return graph.state_dataset("pagerank"), _metrics(rounds, graph.n_edges)


def personalized_pagerank(
    graph: ShardedGraph,
    seeds,
    alpha: float = 0.85,
    max_iter: int = 100,
    tol: float = 1e-6,
):
    """Personalized PageRank (FLASH apps/flash/ranking/ppr.h; networkx
    ``pagerank(personalization=...)`` with uniform weight over the seed
    set): teleport and dangling mass both redistribute to the seeds.
    Same fused supersteps and convergence test as :func:`pagerank`."""
    import numpy as np

    n = graph.n_vertices
    seeds = np.unique(np.asarray(list(seeds), dtype=np.int64))
    dangling = sum(graph.call_all("ppr_init", seeds, len(seeds)))
    rounds = []
    refs = graph.step_refs("ppr_step", alpha, 0.0)
    for it in range(max_iter):
        t0 = time.perf_counter()
        refs = graph.step_refs("ppr_step", alpha, dangling, inbox=refs)
        parts = graph.step_scalars(refs)
        delta = sum(p[0] for p in parts)
        dangling = sum(p[1] for p in parts)
        rounds.append({"round": it, "delta": delta,
                       "seconds": time.perf_counter() - t0})
        if tol > 0 and delta < tol * n:
            break
    return graph.state_dataset("ppr"), _metrics(rounds, graph.n_edges)


def wcc(
    graph: ShardedGraph,
    max_iter: int = 10**6,
    ckpt_dir: str | None = None,
    job: str = "wcc",
    ckpt_every: int = 0,
):
    """Weakly connected components by hash-min label exchange
    (apps/projected/wcc_projected.h:62-183): comp[v] starts as vid,
    changed vertices push it to neighbors, receivers keep the min;
    fixpoint when no vertex changes. Requires an undirected-arcs graph
    (the reference's wcc is undirected-only, wcc.py:30)."""
    if graph.directed:
        raise ValueError(
            "wcc requires an undirected graph: rebuild with directed=False "
            "(the reference rejects directed graphs too, "
            "python/graphscope/analytical/app/wcc.py:30)"
        )
    cfg = f"wcc|P={graph.P}|V={graph.n_vertices}|E={graph.n_edges}"
    ck = CheckpointManager(ckpt_dir, job, cfg)
    start_round = 0
    m = ck.latest()
    if m is not None:
        # frontier_all: safe over-approximation — re-activating every
        # vertex converges to the same fixpoint (min is idempotent)
        start_round = ck.restore(graph, m, frontier_all=True) + 1
    else:
        graph.call_all("minprop_init")
    rounds = []
    refs = graph.step_refs("minprop_step")
    for it in range(start_round, max_iter):
        t0 = time.perf_counter()
        refs = graph.step_refs("minprop_step", inbox=refs)
        changed = sum(graph.step_scalars(refs))
        rounds.append({"round": it, "changed": changed,
                       "seconds": time.perf_counter() - t0})
        if ckpt_every and (it + 1) % ckpt_every == 0:
            ck.save(graph, it, {}, {"changed": changed})
        if changed == 0:
            break
    return graph.state_dataset("component"), _metrics(rounds, graph.n_edges)


def cdlp(
    graph: ShardedGraph,
    max_round: int = 10,
    ckpt_dir: str | None = None,
    job: str = "cdlp",
    ckpt_every: int = 0,
):
    """Community detection by synchronous label propagation — LDBC CDLP
    semantics (builtin ``lpa`` → grape::CDLP, .gs_conf.yaml:80-87; golden
    file p2p-31-CDLP): label[v] init vid; each round every vertex adopts
    the most frequent incoming label, ties broken by minimum label;
    fixed ``max_round`` rounds (default 10, lpa.py:29-55), early-exit
    when no label changes."""
    cfg = f"cdlp|P={graph.P}|V={graph.n_vertices}|E={graph.n_edges}|r={max_round}"
    ck = CheckpointManager(ckpt_dir, job, cfg)
    start_round = 0
    m = ck.latest()
    if m is not None:
        start_round = ck.restore(graph, m) + 1
    else:
        graph.call_all("cdlp_init")
    rounds = []
    refs = graph.step_refs("cdlp_step")
    for it in range(start_round, max_round):
        t0 = time.perf_counter()
        refs = graph.step_refs("cdlp_step", inbox=refs)
        changed = sum(graph.step_scalars(refs))
        rounds.append({"round": it, "changed": changed,
                       "seconds": time.perf_counter() - t0})
        if ckpt_every and (it + 1) % ckpt_every == 0:
            ck.save(graph, it, {}, {"changed": changed})
        if changed == 0:
            break
    return graph.state_dataset("label"), _metrics(rounds, graph.n_edges)


def hits(
    graph_fwd: ShardedGraph,
    graph_rev: ShardedGraph,
    max_iter: int = 100,
    tol: float = 1e-8,
):
    """HITS hub/authority scores — networkx semantics (the reference's
    gs::HITS, apps/hits/hits.h:205): per iteration a = Aᵀh then h = Aa,
    both max-normalized; converge on Σ|Δh| < n·tol; final sum-normalize.

    ``graph_fwd`` holds arcs as given (hub lives here); ``graph_rev``
    the reversed arcs (authority lives here). Both must be built with
    the same partition count and full vertex registration so partition-
    aligned state tables can be exchanged. Passing the SAME graph for
    both (valid only when the arc set is symmetric, i.e. undirected:
    A = Aᵀ) is supported via a per-shard stash slot for the authority
    vector — one pool, two vertex vectors, no mid-iteration aliasing.
    ``tol=0`` forces exactly ``max_iter`` rounds (SQL-oracle mode)."""
    if graph_fwd.P != graph_rev.P:
        raise ValueError("fwd/rev graphs must share a partition count")
    aliased = graph_fwd is graph_rev or graph_fwd.shards is graph_rev.shards
    if aliased and graph_fwd.directed:
        raise ValueError(
            "hits(g, g) requires an undirected (symmetric-arc) graph; "
            "build a reversed twin for directed graphs"
        )
    n = graph_fwd.n_vertices
    graph_fwd.call_all("value_init", 1.0 / n)  # h
    if aliased:
        graph_fwd.call_all("stash_state", "authority")  # a
    else:
        graph_rev.call_all("value_init", 1.0 / n)  # a
    rounds = []
    for it in range(max_iter):
        t0 = time.perf_counter()
        graph_fwd.call_all("save_snapshot")
        # a_raw = A^T h : push h along fwd arcs, accumulate at rev pool
        refs = graph_fwd.scatter_refs("value_scatter")
        graph_rev.apply_all("value_apply", refs, 1.0, 0.0, False)
        if aliased:
            # state now holds a_raw — keep it in the stash slot so the
            # h half-step below can't clobber it (ADVICE r01)
            graph_fwd.call_all("stash_state", "authority")
        # h_raw = A a_raw : push a along rev arcs, accumulate at fwd pool
        refs = graph_rev.scatter_refs("value_scatter")
        parts_h = graph_fwd.apply_all("value_apply", refs, 1.0, 0.0, False)
        max_h = max(p[3] for p in parts_h) or 1.0
        graph_fwd.call_all("value_scale", 1.0 / max_h)
        if aliased:
            a_max = max(graph_fwd.call_all("stash_max", "authority")) or 1.0
            graph_fwd.call_all("stash_scale", "authority", 1.0 / a_max)
        else:
            a_max = max(graph_rev.call_all("state_max")) or 1.0
            graph_rev.call_all("value_scale", 1.0 / a_max)
        err = sum(graph_fwd.call_all("l1_diff_snapshot"))
        rounds.append({"round": it, "delta": err,
                       "seconds": time.perf_counter() - t0})
        if tol > 0 and err < n * tol:
            break
    s_h = sum(graph_fwd.call_all("value_scale", 1.0))
    graph_fwd.call_all("value_scale", 1.0 / s_h if s_h else 1.0)
    if aliased:
        s_a = sum(graph_fwd.call_all("stash_scale", "authority", 1.0))
        graph_fwd.call_all("stash_scale", "authority",
                           1.0 / s_a if s_a else 1.0)
        merged = graph_fwd.state_dataset_with_stash(
            "hub", "authority", "authority"
        )
        return merged, None, _metrics(rounds, graph_fwd.n_edges)
    s_a = sum(graph_rev.call_all("value_scale", 1.0))
    graph_rev.call_all("value_scale", 1.0 / s_a if s_a else 1.0)
    return (
        graph_fwd.state_dataset("hub"),
        graph_rev.state_dataset("authority"),
        _metrics(rounds, graph_fwd.n_edges),
    )


def katz_centrality(
    graph: ShardedGraph,
    alpha: float = 0.1,
    beta: float = 1.0,
    max_iter: int = 100,
    tol: float = 1e-6,
):
    """Katz centrality — networkx semantics (reference
    apps/centrality/katz/katz_centrality.h:186): x' = α·Aᵀx + β along
    in-edges (push along stored arcs ⇒ the graph's arcs must point
    src→dst as influence flows), converge Σ|Δ| < n·tol, final L2
    normalize."""
    n = graph.n_vertices
    graph.call_all("value_init", 0.0)
    rounds = []
    refs = graph.step_refs("value_step", alpha, beta, False)
    for it in range(max_iter):
        t0 = time.perf_counter()
        refs = graph.step_refs("value_step", alpha, beta, False, inbox=refs)
        parts = graph.step_scalars(refs)
        err = sum(p[0] for p in parts)
        rounds.append({"round": it, "delta": err,
                       "seconds": time.perf_counter() - t0})
        if tol > 0 and err < n * tol:
            break
    sumsq = sum(p[2] for p in parts)
    s = 1.0 / (sumsq ** 0.5) if sumsq > 0 else 1.0
    graph.call_all("value_scale", s)
    return graph.state_dataset("katz"), _metrics(rounds, graph.n_edges)


def eigenvector_centrality(
    graph: ShardedGraph,
    max_iter: int = 100,
    tol: float = 1e-6,
):
    """Eigenvector centrality — networkx power iteration (reference
    apps/centrality/eigenvector/eigenvector_centrality.h:185):
    x' = (Aᵀ + I)x, L2-normalized each round, converge Σ|Δ| < n·tol."""
    n = graph.n_vertices
    graph.call_all("value_init", 1.0 / n)
    rounds = []
    for it in range(max_iter):
        t0 = time.perf_counter()
        graph.call_all("save_snapshot")
        refs = graph.scatter_refs("value_scatter")
        parts = graph.apply_all("value_apply", refs, 1.0, 0.0, True)
        sumsq = sum(p[2] for p in parts)
        graph.call_all("value_scale", 1.0 / (sumsq ** 0.5) if sumsq else 1.0)
        err = sum(graph.call_all("l1_diff_snapshot"))
        rounds.append({"round": it, "delta": err,
                       "seconds": time.perf_counter() - t0})
        if tol > 0 and err < n * tol:
            break
    return graph.state_dataset("eigenvector"), _metrics(rounds, graph.n_edges)


def bfs(graph: ShardedGraph, source: int, max_iter: int = 10**6):
    """BFS depth from ``source`` (apps/bfs/bfs_generic.h): frontier
    expansion rounds with min-depth combine; unreached vertices get
    +inf (dropped by callers that want reachable-only)."""
    return _dist_loop(graph, [source], weighted=False, max_iter=max_iter,
                      col="depth")


def sssp(graph: ShardedGraph, source: int, max_iter: int = 10**6):
    """Single-source shortest paths over double edge weights
    (apps/projected/sssp_projected.h:181): Bellman-Ford-style frontier
    relaxation with min-dist combine."""
    return _dist_loop(graph, [source], weighted=True, max_iter=max_iter,
                      col="distance")


def sssp_delta_stepping(graph: ShardedGraph, source: int,
                        delta: float | None = None,
                        max_iter: int = 10**6):
    """Delta-stepping SSSP (flash/traversal/sssp-dlt-step.h, Meyer &
    Sanders '03): relaxations are processed in distance buckets of
    width Δ (the reference's default: 2·mean arc weight), so each inner
    wave only carries messages whose source distance lies in the open
    bucket. Same fixpoint as :func:`sssp` — with positive weights a
    vertex below the bucket floor is settled, so clamping the frontier
    never loses a relaxation — but long arcs are re-relaxed at most
    once per bucket instead of once per Bellman-Ford wave, which at
    cluster scale means fewer (and smaller) all-to-all message
    exchanges on hub-heavy weighted graphs.

    Returns ``(state_dataset(vid, distance), metrics)`` like sssp();
    metrics rounds carry (bucket_lo, waves, active) per bucket."""
    import numpy as np

    stats = graph.call_all("weight_stats")
    m = sum(s[1] for s in stats)
    if delta is None:
        wsum = sum(s[0] for s in stats)
        delta = (2.0 * wsum / m) if m else 1.0
    if delta <= 0:
        delta = 1.0
    graph.call_all("dist_init", np.asarray([source], dtype=np.int64))
    rounds = []
    a, b = 0.0, float(delta)
    spent = 0
    while spent < max_iter:
        t0 = time.perf_counter()
        active = sum(graph.call_all("dlt_bucket_start", a, b))
        waves = 0
        if active:
            refs = graph.step_refs("dlt_step", a, b)
            while spent + waves < max_iter:
                refs = graph.step_refs("dlt_step", a, b, inbox=refs)
                waves += 1
                if sum(graph.step_scalars(refs)) == 0:
                    break
        maxd = max(graph.call_all("state_max_finite"))
        rounds.append({"round": len(rounds), "bucket_lo": a,
                       "changed": active, "waves": waves,
                       "seconds": time.perf_counter() - t0})
        spent += max(waves, 1)
        a += delta
        b += delta
        # The reference exits on ``a < maxd`` (sssp-dlt-step.h:63) which
        # drops a vertex whose tentative distance sits exactly on a
        # bucket boundary (only reachable with a caller-chosen Δ; the
        # built-in 2·mean-weight Δ masks it). ``a ≤ maxd + ε`` processes
        # that last boundary bucket too.
        if a > maxd + 1e-10:
            break
    return graph.state_dataset("distance"), _metrics(rounds, graph.n_edges)


def closeness_centrality(
    graph: ShardedGraph,
    sources=None,
    batch_size: int = 2048,
    wf_improved: bool = True,
    harmonic: bool = False,
):
    """Closeness (Wasserman–Faust improved, networkx default) or
    harmonic centrality via batched multi-source BFS
    (apps/centrality/closeness/closeness_centrality.h:143 /
    harmonic flash variant). ``sources=None`` computes EXACT
    centrality for every vertex by sweeping source batches of
    ``batch_size`` (memory per shard: n_local × batch_size doubles) —
    pass a sampled source list for very large graphs.

    Returns a pandas DataFrame (vid, closeness|harmonic)."""
    import numpy as np
    import pandas as pd

    if sources is None:
        tables = graph.call_all("degree_table")
        all_vids = np.sort(np.concatenate(
            [t.column("vid").to_numpy(zero_copy_only=False) for t in tables]
        ))
    else:
        all_vids = np.sort(np.asarray(sources, dtype=np.int64))
    n = graph.n_vertices
    out_vid, out_val = [], []
    for lo in range(0, len(all_vids), batch_size):
        batch = all_vids[lo: lo + batch_size]
        graph.call_all("msbfs_init", batch)
        refs = graph.step_refs("msbfs_step")
        for _ in range(10**6):
            refs = graph.step_refs("msbfs_step", inbox=refs)
            changed = sum(graph.step_scalars(refs))
            if changed == 0:
                break
        parts = graph.call_all("msbfs_column_sums")
        tot = sum(p[0] for p in parts)
        reach = sum(p[1] for p in parts)
        inv = sum(p[2] for p in parts)
        with np.errstate(divide="ignore", invalid="ignore"):
            if harmonic:
                val = inv
            else:
                r = reach.astype(np.float64) - 1.0  # exclude the source
                val = np.where(tot > 0, r / tot, 0.0)
                if wf_improved and n > 1:
                    val = val * (r / (n - 1))
        out_vid.append(batch)
        out_val.append(val)
    graph.call_all("msbfs_free")
    col = "harmonic" if harmonic else "closeness"
    return pd.DataFrame({"vid": np.concatenate(out_vid),
                         col: np.concatenate(out_val)})


def scc(graph: ShardedGraph, max_rounds: int = 10**6):
    """Strongly connected components by forward-backward max coloring
    (the FLASH scc family, apps/flash/connectivity/scc*.h): per round,
    unassigned vertices propagate color = max vid along FORWARD arcs to
    fixpoint; every color root then sweeps BACKWARD within its color,
    and vertices reached both ways commit that color as their SCC id.
    All colors sweep simultaneously, so each round commits one SCC per
    surviving color. Needs a bidi graph
    (``build_graph(directed=True, with_reverse=True)``).

    Returns a Dataset (vid, scc) with scc = max member vid."""
    import ray.data

    if not (graph.directed and graph.has_reverse):
        raise ValueError(
            "scc needs a directed bidi graph: build_graph(directed=True, "
            "with_reverse=True)"
        )
    graph.call_all("scc_init")
    for _ in range(max_rounds):
        if sum(graph.call_all("scc_color_init")) == 0:
            break
        refs = graph.step_refs("scc_color_step")
        while True:
            refs = graph.step_refs("scc_color_step", inbox=refs)
            if sum(graph.step_scalars(refs)) == 0:
                break
        graph.call_all("scc_back_init")
        refs = graph.step_refs("scc_back_step")
        while True:
            refs = graph.step_refs("scc_back_step", inbox=refs)
            if sum(graph.step_scalars(refs)) == 0:
                break
        graph.call_all("scc_commit")
    return ray.data.from_arrow_refs(
        [s.scc_table.remote() for s in graph.shards]
    )


def kcore_pool(graph: ShardedGraph, k: int):
    """k-core membership by BSP degree-decrement peeling on the shard
    pool (gs::KCore, apps/kcore/kcore.h:130): each round the newly
    sub-k vertices die and push −1 along their arcs; fixpoint when no
    vertex dies. Fused supersteps; no per-round driver-side degree
    table (the Dataset-peeling variant in pipelines/structure.py keeps
    the edge-table API). Undirected (both-arcs) graphs only."""
    import ray.data

    if graph.directed:
        raise ValueError("kcore_pool requires an undirected (both-arcs) graph")
    graph.call_all("kcore_init", k)
    refs = graph.step_refs("kcore_step")
    changed = sum(graph.step_scalars(refs))
    while changed:
        refs = graph.step_refs("kcore_step", inbox=refs)
        changed = sum(graph.step_scalars(refs))
    return ray.data.from_arrow_refs(
        [s.kcore_table.remote() for s in graph.shards]
    )


def core_decomposition(graph: ShardedGraph):
    """Per-vertex core numbers (FLASH
    apps/flash/subgraph → kcore_decomposition; networkx core_number):
    one continuous BSP peel with a rising threshold — level k peels to
    fixpoint, survivors are stamped core=k, the threshold rises and the
    RESIDUAL degrees carry over (each level is incremental, total work
    ≈ one full peel, not kmax peels). Vertices outside the 1-core
    (isolated) stay 0. Returns Dataset(vid, core)."""
    import ray.data

    if graph.directed:
        raise ValueError("core_decomposition requires an undirected "
                         "(both-arcs) graph")
    graph.call_all("kcore_init", 1)
    k = 1
    while True:
        refs = graph.step_refs("kcore_step")
        changed = sum(graph.step_scalars(refs))
        while changed:
            refs = graph.step_refs("kcore_step", inbox=refs)
            changed = sum(graph.step_scalars(refs))
        alive = sum(graph.call_all("kcore_stamp_and_raise", k, k + 1))
        if alive == 0:
            break
        k += 1
    return ray.data.from_arrow_refs(
        [s.kcore_decomp_table.remote() for s in graph.shards]
    )


def kshell_pool(graph: ShardedGraph, k: int):
    """k-shell (in k-core, not in (k+1)-core; gs::KShell,
    apps/kcore/kshell.h:139) as two BSP pool peels + a distributed
    anti-join — no driver-side vertex sets (actor-task ordering makes
    the first peel's membership tables compute before the second peel
    re-initialises shard state)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from graphscope_ray.stages.relational import bucketed_group_apply

    def side(v: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "_side", pa.array(np.full(t.num_rows, v, np.int8)))

        return f

    lo = kcore_pool(graph, k).map_batches(side(0), batch_format="pyarrow")
    hi = kcore_pool(graph, k + 1).map_batches(side(1), batch_format="pyarrow")

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        # (k+1)-core ⊆ k-core: keep vids never seen with _side=1
        drop = g.loc[g["_side"] == 1, "vid"]
        keep = g.loc[(g["_side"] == 0) & ~g["vid"].isin(drop), "vid"]
        return pd.DataFrame({"vid": keep.to_numpy(np.int64)})

    return bucketed_group_apply(lo.union(hi), ["vid"], anti, num_buckets=16)


def betweenness_centrality(
    graph: ShardedGraph,
    batch_size: int = 512,
    normalized: bool = True,
    sources=None,
):
    """Brandes betweenness centrality via batched multi-source BFS
    (reference apps/centrality/betweenness/betweenness_centrality.h:240,
    networkx.betweenness_centrality semantics). Each source batch runs
    a forward σ-counting sweep and a backward dependency sweep on the
    shard pool (fused supersteps); per-shard BC accumulates across
    batches. ``sources=None`` = exact (every vertex a source);
    a sampled source list gives the networkx k-sample estimate
    (scale ×n/k). Undirected (both-arcs) graphs work directly; directed
    graphs need a bidi build (``build_graph(directed=True,
    with_reverse=True)``) — the backward dependency sweep then pushes
    along the dir=1 mirror arcs.

    Returns a Dataset (vid, betweenness)."""
    import numpy as np
    import ray

    if graph.directed and not graph.has_reverse:
        raise ValueError(
            "directed betweenness needs a bidi graph: rebuild with "
            "build_graph(directed=True, with_reverse=True) so the "
            "dependency sweep has mirror arcs"
        )
    if sources is None:
        tables = graph.call_all("degree_table")
        all_vids = np.sort(np.concatenate(
            [t.column("vid").to_numpy(zero_copy_only=False) for t in tables]
        ))
    else:
        all_vids = np.sort(np.asarray(sources, dtype=np.int64))
    n = graph.n_vertices
    graph.call_all("brandes_bc_init")
    for lo in range(0, len(all_vids), batch_size):
        batch = all_vids[lo: lo + batch_size]
        graph.call_all("brandes_init", batch)
        refs = graph.step_refs("brandes_fwd_step")
        max_dist, r = 0, 0
        while True:
            r += 1
            refs = graph.step_refs("brandes_fwd_step", inbox=refs)
            if sum(graph.step_scalars(refs)) == 0:
                break
            max_dist = r
        graph.call_all("brandes_bwd_init", max_dist)
        if max_dist > 0:
            refs = graph.step_refs("brandes_bwd_step")
            for _ in range(max_dist):
                refs = graph.step_refs("brandes_bwd_step", inbox=refs)
            graph.step_scalars(refs)  # barrier: last level applied
        graph.call_all("brandes_accumulate")
    graph.call_all("msbfs_free")
    if normalized:
        scale = 1.0 / ((n - 1) * (n - 2)) if n > 2 else 1.0
    elif not graph.directed:
        scale = 0.5  # networkx _rescale: halve the two-direction count
    else:
        scale = 1.0  # directed raw counts are single-direction already
    if sources is not None and len(all_vids):
        scale *= n / len(all_vids)
    import ray.data

    return ray.data.from_arrow_refs(
        [s.brandes_bc_table.remote(scale) for s in graph.shards]
    )


def all_pairs_shortest_path_length(
    graph: ShardedGraph,
    sources=None,
    batch_size: int = 2048,
):
    """All-pairs (or sources×all) BFS shortest-path lengths as a
    Dataset (src, dst, length) — the matrix form of
    apps/apsp/all_pairs_shortest_path_length.h:144, exposed row-wise.
    O(V²) output: pass ``sources`` beyond small graphs."""
    import numpy as np
    import ray.data

    if sources is None:
        tables = graph.call_all("degree_table")
        all_vids = np.sort(np.concatenate(
            [t.column("vid").to_numpy(zero_copy_only=False) for t in tables]
        ))
    else:
        all_vids = np.sort(np.asarray(sources, dtype=np.int64))
    parts = []
    for lo in range(0, len(all_vids), batch_size):
        batch = all_vids[lo: lo + batch_size]
        graph.call_all("msbfs_init", batch)
        refs = graph.step_refs("msbfs_step")
        while True:
            refs = graph.step_refs("msbfs_step", inbox=refs)
            if sum(graph.step_scalars(refs)) == 0:
                break
        parts.extend(s.msbfs_lengths_table.remote() for s in graph.shards)
    out = ray.data.from_arrow_refs(parts)
    # matrices freed lazily AFTER the export tables materialize
    return out


def sssp_path(graph: ShardedGraph, source: int, target: int | None = None,
              weighted: bool = True, max_iter: int = 10**6):
    """Shortest paths with parent pointers (apps/sssp/sssp_path.h:174).

    Returns ``(table_dataset, path)`` where the dataset is
    (vid, distance, parent) for every vertex and ``path`` is the
    deterministic min-parent path source→target as a list of vids
    (None when target is None or unreachable)."""
    import numpy as np
    import ray
    import ray.data

    graph.call_all("path_init", np.asarray([source], dtype=np.int64))
    refs = graph.step_refs("path_step", weighted)
    for _ in range(max_iter):
        refs = graph.step_refs("path_step", weighted, inbox=refs)
        if sum(graph.step_scalars(refs)) == 0:
            break
    # deterministic parent re-pick: min vid among optimal predecessors
    fin = graph.scatter_refs("path_finalize_scatter", weighted)
    graph.apply_all("path_finalize_apply", fin)
    table = ray.data.from_arrow_refs(
        [s.path_table.remote() for s in graph.shards]
    )
    path = None
    if target is not None:
        from graphscope_ray.functions.hashing import partition_of

        path, cur = [], int(target)
        for _ in range(graph.n_vertices):
            fid = int(partition_of(np.asarray([cur], dtype=np.int64), graph.P)[0])
            hit = ray.get(graph.shards[fid].path_parent_of.remote(cur))
            if hit is None or not np.isfinite(hit[1]):
                path = None  # unreachable
                break
            path.append(cur)
            if cur == source:
                break
            cur = hit[0]
        if path is not None:
            path = path[::-1]
    return table, path


def voterank(graph: ShardedGraph, num_nodes: int) -> list[int]:
    """VoteRank influential-node election (apps/voterank/voterank.h:230;
    networkx.voterank semantics): each round every vertex's score is the
    sum of its in-neighbors' voting abilities; the global max scorer is
    elected (ties → min vid), its ability zeroed, and its out-neighbors'
    abilities decremented by 1/⟨k⟩. Stops early when the best score
    reaches 0. ⟨k⟩ follows networkx: sum of (in+out) degrees / N.
    Undirected graphs store both arcs so that is arcs/N; directed
    graphs store each edge once, so every arc contributes one out- and
    one in-degree ⇒ 2·arcs/N (ADVICE r01)."""
    graph.call_all("voterank_init")
    factor = 2 if graph.directed else 1
    avg_deg = factor * graph.n_edges / max(1, graph.n_vertices)
    delta = -1.0 / avg_deg if avg_deg else 0.0
    elected: list[int] = []
    for _ in range(num_nodes):
        refs = graph.scatter_refs("voterank_scatter")
        best = max(
            graph.apply_all("voterank_best", refs),
            key=lambda sv: (sv[0], -sv[1]),
        )
        if best[0] == 0.0:
            break
        vid = best[1]
        elected.append(vid)
        refs = graph.scatter_refs("voterank_elect", vid, delta)
        graph.apply_all("voterank_apply_delta", refs)
    return elected


def sssp_average_length(graph: ShardedGraph, source: int) -> float:
    """Average shortest-path length from ``source`` over reachable
    vertices (apps/sssp/sssp_average_length.h:260 — per-source variant)."""
    state, _ = sssp(graph, source)
    total, n = 0.0, 0
    for b in state.iter_batches(batch_format="pandas"):
        d = b["distance"].to_numpy()
        finite = d[~__import__("numpy").isinf(d)]
        total += float(finite.sum())
        n += len(finite)
    return total / n if n else 0.0


def sssp_has_path(graph: ShardedGraph, source: int, target: int) -> bool:
    """Reachability source→target (apps/sssp/sssp_has_path.h:157):
    BFS frontier expansion, early answer read from the final state."""
    import numpy as np

    state, _ = bfs(graph, source)
    for b in state.iter_batches(batch_format="pandas"):
        hit = b[b["vid"] == target]
        if len(hit):
            return bool(np.isfinite(hit["depth"].iloc[0]))
    return False


def _dist_loop(graph, sources, weighted, max_iter, col):
    import numpy as np

    graph.call_all("dist_init", np.asarray(sources, dtype=np.int64))
    rounds = []
    refs = graph.step_refs("dist_step", weighted)
    for it in range(max_iter):
        t0 = time.perf_counter()
        refs = graph.step_refs("dist_step", weighted, inbox=refs)
        changed = sum(graph.step_scalars(refs))
        rounds.append({"round": it, "changed": changed,
                       "seconds": time.perf_counter() - t0})
        if changed == 0:
            break
    return graph.state_dataset(col), _metrics(rounds, graph.n_edges)


def run_vertex_program(
    graph: ShardedGraph,
    program,
    max_iter: int = 100,
    col: str = "value",
):
    """Generic superstep driver for user ``VertexProgram``s (the §2.7
    user-extension surface; functions/vertex_program.py). Runs the same
    fused scatter→exchange→apply wave as the builtins: one RPC wave per
    round, driver syncs only on the (delta, global-scalar) partials.

    Returns ``(state_dataset(vid, col), metrics)`` — identical contract
    to every builtin algorithm."""
    g = sum(graph.call_all("vp_init", program, graph.n_vertices))
    rounds = []
    refs = graph.step_refs("vp_step", g)  # round-0 scatter
    for it in range(max_iter):
        t0 = time.perf_counter()
        refs = graph.step_refs("vp_step", g, inbox=refs)
        parts = graph.step_scalars(refs)
        delta = sum(p[0] for p in parts)
        g = sum(p[1] for p in parts)
        rounds.append({"round": it, "delta": delta,
                       "seconds": time.perf_counter() - t0})
        if program.converged(delta, graph.n_vertices, it):
            break
    return graph.state_dataset(col), _metrics(rounds, graph.n_edges)


def articlerank(graph: ShardedGraph, damping: float = 0.85,
                max_iters: int = 20):
    """ArticleRank (FLASH apps/flash/ranking/articlerank.h:48-71) via
    the user-program surface: val' = (1-d) + d·Σ val(u)/(outdeg+⟨k⟩),
    fixed rounds. Returns (Dataset(vid, articlerank), metrics)."""
    from graphscope_ray.functions.vertex_program import ArticleRankProgram

    avg = graph.n_edges / max(1, graph.n_vertices)
    return run_vertex_program(
        graph, ArticleRankProgram(avg, damping, max_iters),
        max_iter=max_iters, col="articlerank")


def maximal_independent_set(graph: ShardedGraph, max_iter: int = 10**6):
    """Deterministic greedy MIS (FLASH apps/flash/matching/mis.h:46-77
    round shape, min-vid priority — the lexicographically-first MIS).
    Returns a (vid) Dataset of the members."""
    import pyarrow.compute as pc

    if graph.directed:
        raise ValueError("maximal_independent_set requires an undirected "
                         "graph (the reference runs MIS on EU arcs)")
    from graphscope_ray.functions.vertex_program import MISProgram

    ds, _ = run_vertex_program(graph, MISProgram(), max_iter=max_iter,
                               col="state")
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("state"), 1)).select(["vid"]),
        batch_format="pyarrow")


def diameter_approximation(graph: ShardedGraph, k: int = 16):
    """Diameter lower bound: max eccentricity over a deterministic
    ~k-source sample plus the classic double-sweep refinement (BFS from
    the min vid, then from the farthest vertex found). The reference's
    flash/measurement/diameter-approx.h samples 64 random sources and
    takes the same max-over-BFS bound; ours is seed-free deterministic.
    Exact on trees and on any graph whose diameter endpoint lands in
    the sample."""
    import numpy as np

    deg = graph.degree_dataset()
    lo = int(deg.min("vid"))
    n = graph.n_vertices
    mod = max(1, n // max(1, k - 2))

    def pick(t):
        import pyarrow as pa

        from graphscope_ray.functions.hashing import hash64_ints

        v = t.column("vid").to_numpy(zero_copy_only=False)
        keep = hash64_ints(v) % np.uint64(mod) == 0
        return pa.table({"vid": pa.array(v[keep], pa.int64())})

    sample = [int(r["vid"]) for r in
              deg.map_batches(pick, batch_format="pyarrow").take_all()]
    # double sweep: farthest finite vertex from lo (ties -> min vid)
    d0, _ = bfs(graph, source=lo)
    fin = d0.map_batches(
        lambda df: df[np.isfinite(df["depth"])], batch_format="pandas")
    dmax = fin.max("depth")
    far = int(fin.map_batches(
        lambda df: df[df["depth"] == dmax], batch_format="pandas"
    ).min("vid"))
    sources = sorted(set(sample) | {lo, far})
    lengths = all_pairs_shortest_path_length(graph, sources=sources)
    return int(lengths.max("length"))


def k_center(graph: ShardedGraph, k: int):
    """Greedy k-center (FLASH apps/flash/measurement/k-center.h:42-75):
    first center = max-degree vertex, then k-1 rounds of "BFS from the
    newest center, keep per-vertex min distance, next center = farthest
    vertex". Ties break to the minimum vid (the reference's tie is
    traversal-order-dependent; ours is deterministic). Returns
    ``(centers, Dataset(vid, dis))`` with dis = hop distance to the
    nearest center (+inf on unreachable components, like the
    reference's INT_MAX)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from graphscope_ray.stages.relational import cogroup_join

    deg = graph.degree_dataset().materialize()
    dmax = deg.max("out_degree")
    c0 = int(deg.map_batches(
        lambda t: t.filter(pc.equal(t.column("out_degree"), dmax)),
        batch_format="pyarrow").min("vid"))
    centers = [c0]
    mind, _ = bfs(graph, source=c0)
    mind = mind.map_batches(
        lambda t: pa.table({"vid": t.column("vid"),
                            "dis": t.column("depth").cast(pa.float64())}),
        batch_format="pyarrow").materialize()
    for _ in range(1, k):
        far = mind.max("dis")
        if far == 0:  # every vertex is a center already
            break
        nxt = int(mind.map_batches(
            lambda t, far=far: t.filter(
                pc.equal(t.column("dis"), far)),
            batch_format="pyarrow").min("vid"))
        centers.append(nxt)
        d, _ = bfs(graph, source=nxt)
        d = d.map_batches(
            lambda t: pa.table({"vid": t.column("vid"),
                                "nd": t.column("depth").cast(pa.float64())}),
            batch_format="pyarrow")
        joined = cogroup_join(mind, d, on="vid")

        def mn(t: pa.Table) -> pa.Table:
            a = t.column("dis").to_numpy(zero_copy_only=False)
            b = t.column("nd").to_numpy(zero_copy_only=False)
            return pa.table({"vid": t.column("vid"),
                             "dis": pa.array(np.minimum(a, b))})

        mind = joined.map_batches(mn, batch_format="pyarrow").materialize()
    return centers, mind


def maximal_matching(graph: ShardedGraph, max_rounds: int = 10**6):
    """Greedy maximal matching (FLASH apps/flash/matching/mm.h:44-77):
    every unmatched vertex proposes to its max-id unmatched neighbor;
    mutual proposals match; vertices with no active neighbors retire.
    Deterministic (max-id rule), ≥½ the maximum matching by the classic
    greedy bound. Returns a (vid, mate) Dataset, mate=-1 for unmatched.
    Undirected (both-arcs) graphs only; two fused waves per round."""
    import ray.data

    if graph.directed:
        raise ValueError("maximal_matching requires an undirected graph")
    graph.call_all("mm_init")
    refs = graph.step_refs("mm_step_a")
    for _ in range(max_rounds):
        if sum(graph.step_scalars(refs)) == 0:
            break
        refs_b = graph.step_refs("mm_step_b", inbox=refs)
        refs = graph.step_refs("mm_step_a", inbox=refs_b)
    return ray.data.from_arrow_refs(
        [s.mm_table.remote() for s in graph.shards])


def min_vertex_cover(graph: ShardedGraph, max_rounds: int = 10**6):
    """Greedy min vertex cover (FLASH matching/min-cover-greedy.h:43-86):
    per round, every uncovered vertex whose (residual degree, vid) is a
    local max among uncovered neighbors joins the cover; selected
    vertices decrement neighbors' residual degrees; repeat until no
    uncovered vertex has uncovered incident edges. Returns a
    (vid, in_cover) Dataset. Undirected graphs only."""
    import ray.data

    if graph.directed:
        raise ValueError("min_vertex_cover requires an undirected graph")
    graph.call_all("mc_init")
    refs = graph.step_refs("mc_step_a")
    for _ in range(max_rounds):
        if sum(graph.step_scalars(refs)) == 0:
            break
        refs_b = graph.step_refs("mc_step_b", inbox=refs)
        refs = graph.step_refs("mc_step_a", inbox=refs_b)
    return ray.data.from_arrow_refs(
        [s.mc_table.remote() for s in graph.shards])


def min_dominating_set(graph: ShardedGraph, max_rounds: int = 10**6):
    """Greedy min dominating set (FLASH
    matching/min-dominating-set.h:46-95): per round each undominated
    vertex takes the 2-hop max of (undominated-neighbor count, vid);
    local winners join the set and dominate their closed neighborhood;
    counts are then recomputed. Returns a (vid, in_set) Dataset.
    Undirected graphs only; four fused waves per round."""
    import ray.data

    if graph.directed:
        raise ValueError("min_dominating_set requires an undirected graph")
    graph.call_all("mds_init")
    refs = graph.step_refs("mds_step_a")
    for _ in range(max_rounds):
        refs = graph.step_refs("mds_step_b", inbox=refs)
        refs = graph.step_refs("mds_step_c", inbox=refs)
        refs = graph.step_refs("mds_step_d", inbox=refs)
        if sum(graph.step_scalars(refs)) == 0:
            break
        refs = graph.step_refs("mds_step_a", inbox=refs)
    return ray.data.from_arrow_refs(
        [s.mds_table.remote() for s in graph.shards])


def min_edge_cover(graph: ShardedGraph, max_rounds: int = 10**6):
    """Greedy min edge cover (FLASH matching/min-edge-cover.h:44-93):
    unmatched vertices propose to their min-(degree, vid) unmatched
    neighbor, mutual proposals pair up, and proposals whose target just
    matched are reset and retried; leftover unmatched vertices each
    count one arbitrary incident edge. Returns ((vid, mate) Dataset,
    cover_size) with cover_size = |matched|/2 + |unmatched, deg>0| —
    the reference's GlobalRes. Undirected graphs only."""
    import ray.data

    if graph.directed:
        raise ValueError("min_edge_cover requires an undirected graph")
    graph.call_all("mec_init")
    refs = graph.step_refs("mec_step_a")
    for _ in range(max_rounds):
        if sum(graph.step_scalars(refs)) == 0:
            break
        refs_b = graph.step_refs("mec_step_b", inbox=refs)
        refs_c = graph.step_refs("mec_step_c", inbox=refs_b)
        refs = graph.step_refs("mec_step_a", inbox=refs_c)
    matched, uncov = map(sum, zip(*graph.call_all("mec_counts")))
    size = matched // 2 + uncov
    return ray.data.from_arrow_refs(
        [s.mec_table.remote() for s in graph.shards]), size


def onion_layers(graph: ShardedGraph, max_rounds: int = 10**6):
    """Onion-layer ordering (FLASH apps/flash/core/
    onion-layer-ordering.h:44-100): per-vertex (core, layer), where
    layer is the peel wave at which the vertex's count of
    same-or-higher-core neighbors drops to ≤ its core number; ranked
    vertices decrement only SAME-core unranked neighbors. Runs on top
    of ``core_decomposition`` (one incremental peel), then one raw
    O(E) core-exchange wave + frontier-sized ranking rounds.
    Undirected graphs only."""
    import ray.data

    if graph.directed:
        raise ValueError("onion_layers requires an undirected graph")
    core_decomposition(graph).materialize()  # stamps _kc_core shard-side
    refs = graph.step_refs("onion_init")
    i = 0
    refs = graph.step_refs("onion_round", i, True, inbox=refs)
    while sum(graph.step_scalars(refs)) and i < max_rounds:
        i += 1
        refs = graph.step_refs("onion_round", i, False, inbox=refs)
    return ray.data.from_arrow_refs(
        [s.onion_table.remote() for s in graph.shards])


def degeneracy_ordering(graph: ShardedGraph, max_rounds: int = 10**6):
    """Degeneracy ordering (FLASH apps/flash/core/
    degeneracy-ordering.h:43-110): dg = max core number; wave i ranks
    every unranked vertex whose residual degree is ≤ dg, then
    decrements unranked neighbors. Returns (vid, rank) — ranks are
    consecutive peel waves, the parallel analogue of the sequential
    min-degree elimination order. Undirected graphs only."""
    import ray.data

    if graph.directed:
        raise ValueError("degeneracy_ordering requires an undirected graph")
    core_decomposition(graph).materialize()
    dg = max(graph.call_all("kc_core_max"))
    graph.call_all("degen_init", dg)
    i = 0
    refs = graph.step_refs("degen_round", i)
    while sum(graph.step_scalars(refs)) and i < max_rounds:
        i += 1
        refs = graph.step_refs("degen_round", i, inbox=refs)
    return ray.data.from_arrow_refs(
        [s.degen_table.remote() for s in graph.shards])


def bridges(graph: ShardedGraph, max_iter: int = 10**6):
    """All bridge edges (FLASH apps/flash/connectivity/bridge.h:44-150
    semantics, scalable restatement): (u, v) Dataset, u < v.

    Requires a SIMPLE graph (``build_graph(..., dedup_arcs=True)`` when
    the input may repeat an edge or carry both orientations): a
    parallel edge is never a bridge and breaks the BFS-forest tree /
    non-tree classification. Same contract for
    :func:`biconnected_components` and :func:`articulation_points`.

    The reference replicates O(V) parent/depth arrays on every worker
    and walks tree paths with random access; here: (1) hash-min WCC
    picks per-component min-vid roots, (2) a deterministic BFS forest
    (min-parent re-pick) spans each component, (3) every vertex XORs
    deterministic 64-bit hashes of its incident NON-TREE edges, (4) an
    O(depth)-round child→parent sweep accumulates subtree XORs — a
    tree edge is a bridge iff its subtree XOR is zero (non-tree edges
    inside or outside the subtree self-cancel; crossing edges can't,
    up to a 2⁻⁶⁴-per-edge Monte-Carlo error, deterministic given
    vids). Non-tree edges are never bridges (they sit on a cycle).
    Undirected simple graphs only."""
    import numpy as np
    import ray.data

    if graph.directed:
        raise ValueError("bridges requires an undirected graph")
    _bfs_forest(graph, max_iter)
    refs = graph.step_refs("bridge_init")
    maxd = max(graph.apply_all("bridge_init_apply", refs))
    refs = graph.step_refs("bridge_sweep", maxd)
    for t in range(maxd - 1, 0, -1):
        refs = graph.step_refs("bridge_sweep", t, inbox=refs)
    return ray.data.from_arrow_refs(
        [s.bridge_table.remote() for s in graph.shards])


def _bfs_forest(graph: ShardedGraph, max_iter: int):
    """wcc → per-component min-vid roots → deterministic BFS forest
    with min-parent re-pick (shared by bridges / biconnectivity)."""
    import numpy as np

    wcc(graph, max_iter=max_iter)
    roots = np.concatenate(graph.call_all("bridge_roots"))
    graph.call_all("path_init", roots)
    refs = graph.step_refs("path_step", False)
    for _ in range(max_iter):
        refs = graph.step_refs("path_step", False, inbox=refs)
        if sum(graph.step_scalars(refs)) == 0:
            break
    fin = graph.scatter_refs("path_finalize_scatter", False)
    graph.apply_all("path_finalize_apply", fin)


def _tarjan_vishkin_labels(graph: ShardedGraph, max_iter: int = 10**6):
    """Per-non-root-vertex BCC labels (= the biconnected component of
    the vertex's parent tree edge) via Tarjan–Vishkin on the BFS
    forest; returns a (vid, component) Dataset or None on an edgeless
    graph. See the shard-side section for the reduction."""
    import ray.data

    from graphscope_ray.state.graph import build_graph

    if graph.directed:
        raise ValueError("biconnectivity requires an undirected graph")
    _bfs_forest(graph, max_iter)
    maxd = max(graph.call_all("tv_init"))
    refs = graph.step_refs("tv_size_sweep", maxd)
    for t in range(maxd - 1, -1, -1):
        refs = graph.step_refs("tv_size_sweep", t, inbox=refs)
    ch = graph.scatter_refs("tv_children_scatter")
    graph.apply_all("tv_children_apply", ch)
    refs = graph.step_refs("tv_pre_level", 0)
    for t in range(1, maxd + 1):
        refs = graph.step_refs("tv_pre_level", t, inbox=refs)
    base = graph.step_refs("tv_base_scatter")
    graph.apply_all("tv_base_apply", base)
    refs = graph.step_refs("tv_lohi_sweep", maxd)
    for t in range(maxd - 1, -1, -1):
        refs = graph.step_refs("tv_lohi_sweep", t, inbox=refs)
    nonroot = ray.data.from_arrow_refs(
        [s.tv_nonroot_table.remote() for s in graph.shards])
    if nonroot.count() == 0:
        return None
    aux_edges = ray.data.from_arrow_refs(
        [s.tv_aux_table.remote() for s in graph.shards])
    aux_g = build_graph(aux_edges, num_partitions=graph.P, directed=False,
                        extra_vertices=nonroot)
    labels, _ = wcc(aux_g, max_iter=max_iter)
    return labels


def biconnected_components(graph: ShardedGraph, max_iter: int = 10**6):
    """Per-edge biconnected-component labels (u, v, bcc) — the FLASH
    bcc family's per-vertex union-find labeling re-keyed to edges (the
    unambiguous form: articulation points belong to several BCCs, an
    edge to exactly one). Tree edges take their child's label;
    non-tree edges the label of their descendant / smaller-preorder
    endpoint (equal by rule A)."""
    import pyarrow as pa
    import ray.data

    from graphscope_ray.stages.relational import cogroup_join

    labels = _tarjan_vishkin_labels(graph, max_iter)
    if labels is None:
        import numpy as np

        return ray.data.from_arrow(pa.table({
            "u": pa.array([], pa.int64()), "v": pa.array([], pa.int64()),
            "bcc": pa.array([], pa.int64())}))
    edge_rows = ray.data.from_arrow_refs(
        [s.tv_edge_rows.remote() for s in graph.shards])
    lab = labels.map_batches(
        lambda t: pa.table({"vid": t.column("vid"),
                            "bcc": t.column("component")}),
        batch_format="pyarrow")
    return cogroup_join(edge_rows, lab, on="key", right_on="vid"
                        ).select_columns(["u", "v", "bcc"])


def articulation_points(graph: ShardedGraph, max_iter: int = 10**6):
    """Cut vertices (FLASH cut-point.h semantics): a vertex whose
    incident edges span ≥ 2 biconnected components. Incidence rows
    (vertex touches its own parent edge and each child's parent edge)
    joined with the aux-graph labels, then a distinct-count per
    vertex. Returns a (vid) Dataset."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from graphscope_ray.stages.relational import cogroup_join, grouped_agg

    labels = _tarjan_vishkin_labels(graph, max_iter)
    if labels is None:
        return ray.data.from_arrow(pa.table({"vid": pa.array([], pa.int64())}))
    inc = ray.data.from_arrow_refs(
        [s.tv_incidence_rows.remote() for s in graph.shards])
    joined = cogroup_join(inc, labels, on="key", right_on="vid")
    counts = grouped_agg(joined, ["vertex"],
                         {"n": ("component", "nunique")})
    return counts.map_batches(
        lambda t: pa.table({"vid": t.filter(
            pc.greater_equal(t.column("n"), 2)).column("vertex")}),
        batch_format="pyarrow")


def graph_coloring(graph: ShardedGraph, max_rounds: int = 10**6):
    """Greedy graph coloring (FLASH apps/flash/clustering/color.h:
    43-82): iterate cc[v] = mex of higher-(deg, vid) neighbors'
    colors to fixpoint. Proper coloring guaranteed at fixpoint (every
    vertex differs from all higher neighbors, and the relation is a
    total order). Returns (vid, color). Undirected simple graphs."""
    import ray.data

    if graph.directed:
        raise ValueError("graph_coloring requires an undirected graph")
    refs = graph.step_refs("color_init")
    graph.apply_all("color_setup", refs)
    refs = graph.step_refs("color_round")
    for _ in range(max_rounds):
        refs = graph.step_refs("color_round", inbox=refs)
        if sum(graph.step_scalars(refs)) == 0:
            break
    return ray.data.from_arrow_refs(
        [s.color_table.remote() for s in graph.shards])


def lpa_by_color(graph: ShardedGraph, max_rounds: int = 100):
    """Label propagation scheduled by graph coloring (FLASH
    apps/flash/clustering/lpa-by-color.h:44-146): greedy-color the
    graph (mex over higher-(deg, vid) neighbors — :func:`graph_coloring`),
    then sweep the color classes in order, each class relabeling
    synchronously from CURRENT neighbor labels (argmax count,
    deterministic min-label tie-break where the reference takes the
    CSR-order first). A color class is an independent set, so the
    in-class synchronous apply equals the reference's sequential sweep
    — Gauss-Seidel scheduling that cannot two-cycle the way plain sync
    LPA can. Converges when one full sweep changes nothing.

    Scale shape: the one-time mirror exchange gives every arc its
    destination's color, so each color wave ships ONLY the arcs
    entering the active class — a full sweep costs the same O(E)
    message volume as one plain LPA round, split across
    (#colors) latency waves. Returns (state_dataset(vid, label),
    metrics); rounds carry per-sweep changed counts. Simple graphs
    (deduped arcs) assumed — both mirror exchanges pair each arc with
    exactly one reverse arc (the :func:`graph_coloring` contract)."""
    if graph.directed:
        raise ValueError("lpa_by_color requires an undirected graph")
    graph_coloring(graph)  # leaves _cl_c on every shard
    refs = graph.step_refs("lpabc_setup_scatter")
    n_colors = max(graph.apply_all("lpabc_setup", refs)) + 1
    rounds = []
    refs = graph.step_refs("lpabc_step", 0)  # scatter class 0
    for it in range(max_rounds):
        t0 = time.perf_counter()
        changed = 0
        for ci in range(n_colors):
            refs = graph.step_refs("lpabc_step", (ci + 1) % n_colors,
                                   inbox=refs)
            changed += sum(graph.step_scalars(refs))
        rounds.append({"round": it, "changed": changed,
                       "colors": n_colors,
                       "seconds": time.perf_counter() - t0})
        if changed == 0:
            break
    return graph.state_dataset("label"), _metrics(rounds, graph.n_edges)


def fluid_communities(graph: ShardedGraph, k: int = 10,
                      max_rounds: int = 100):
    """Fluid communities (FLASH apps/flash/clustering/
    fluid-community.h:43-105): k seeds, density-max label adoption,
    oscillation-guarded fixpoint, ≤100 rounds. The reference seeds
    with rand(time()); here the k seeds are the vertices with the
    smallest splitmix64(vid) — deterministic and unbiased. Rounds are
    synchronized (BSP snapshot) where the reference reads neighbor
    labels mid-round in thread order — its results are
    nondeterministic, ours are exactly reproducible. Returns
    (vid, community), community ∈ [-1, k)."""
    import numpy as np
    import ray.data

    if graph.directed:
        raise ValueError("fluid_communities requires an undirected graph")
    cands = graph.call_all("fluid_seed_candidates", k)
    h = np.concatenate([c[0] for c in cands])
    v = np.concatenate([c[1] for c in cands])
    order = np.lexsort((v, h))[:k]
    seeds = np.sort(v[order])
    parts = graph.call_all("fluid_init", seeds)
    cnt = np.sum(parts, axis=0)
    refs = graph.step_refs("fluid_scatter")
    for _ in range(max_rounds):
        refs = graph.step_refs("fluid_round", cnt, inbox=refs)
        scalars = graph.step_scalars(refs)
        cnt = cnt + np.sum([sc[0] for sc in scalars], axis=0)
        if sum(sc[1] for sc in scalars) == 0:
            break
    return ray.data.from_arrow_refs(
        [s.fluid_table.remote() for s in graph.shards])


def random_multi_bfs(graph: ShardedGraph, k: int = 64, seed: int = 42,
                     sources=None):
    """Multi-source BFS eccentricity samples (FLASH
    apps/flash/traversal/random-multi-bfs.h:44-90): run k simultaneous
    BFS waves and record per vertex the MAX distance to any source
    that reaches it (−1 when none does) — the diameter-estimation
    primitive. The reference seeds rand_r(time(NULL)); here sources
    are the k vertices with the smallest splitmix64(vid ^ seed), so
    runs are deterministic and partition-invariant. Pass ``sources``
    to pin them explicitly. Returns Dataset(vid, res)."""
    import numpy as np
    import ray.data

    from graphscope_ray.functions.hashing import splitmix64

    if sources is None:
        cands = np.unique(np.concatenate(
            graph.call_all("sample_vids", k, seed)))
        h = splitmix64(cands.astype(np.uint64) ^ np.uint64(seed))
        sources = cands[np.argsort(h, kind="stable")[:k]]
    sources = np.unique(np.asarray(sources, dtype=np.int64))
    graph.call_all("msbfs_init", sources)
    refs = graph.step_refs("msbfs_step")
    while True:
        refs = graph.step_refs("msbfs_step", inbox=refs)
        if sum(graph.step_scalars(refs)) == 0:
            break
    out = ray.data.from_arrow_refs(
        [s.msbfs_row_max_table.remote() for s in graph.shards]).materialize()
    graph.call_all("msbfs_free")
    return out


def k_core_search(graph: ShardedGraph, k: int) -> int:
    """Size of the k-core (FLASH apps/flash/core/k-core-search.h:42-67,
    GlobalRes = surviving-set size after the peel): the
    :func:`kcore_pool` BSP peel's membership count."""
    return kcore_pool(graph, k).count()
