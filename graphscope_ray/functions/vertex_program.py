"""User-extension surface: Pregel-style vectorized vertex programs.

The reference exposes user algorithms through ``@pie``/``@pregel``
class decorators whose hooks are transpiled and run by the engine's
superstep loop (``python/graphscope/analytical/udf/decorators.py:51-163``,
``apps/python_pie/wrapper.h``; SURVEY §2.7). The Ray-native equivalent
is this protocol: a plain Python class with NUMPY-VECTORIZED hooks that
the generic superstep driver (``pipelines.algorithms.run_vertex_program``)
executes on the ``GraphShard`` actor pool — same scatter → combine →
exchange → apply BSP round as every builtin, no engine code touched.

Every hook operates on whole per-shard vectors (never one vertex at a
time): ``init``/``emit``/``apply`` receive and return arrays of length
``ctx.n_local``. The message combiner runs inside the scatter as a
segment reduce (one pre-combined value per destination shard — the
same wire format the builtins use), so a program's messages never
materialize per-edge off-shard.

Hooks
-----
- ``init(ctx) -> state[n_local]``          initial vertex state
- ``emit(state, ctx) -> vals[n_local]``    value each vertex sends along
  every out-arc (multiplied by edge weight when ``use_weights``)
- ``apply(state, acc, has_msg, g, ctx) -> state'`` new state from the
  combined inbox (``acc``, filled with ``identity`` where ``has_msg``
  is False) and the previous round's global scalar ``g``
- ``reduce(state, ctx) -> float``          per-shard partial of a global
  scalar, summed by the driver and fed back as ``g`` next round (the
  role of ``grape::Communicator::Sum``)
- ``converged(delta, n_total, round) -> bool`` driver-side stop test;
  ``delta`` is Σ|Δstate| (float state) or #changed (integer state)

Class attributes: ``combine`` ("add"|"min"|"max"), ``identity`` (acc
fill), ``msg_dtype``, ``use_weights``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class VPContext:
    """Per-shard read-only context handed to every hook."""

    vids: np.ndarray      # sorted local vertex ids (int64)
    out_deg: np.ndarray   # out-degree per local vertex (int64)
    n_local: int
    n_total: int          # global vertex count
    fid: int              # this shard's partition id


class VertexProgram:
    """Base class; subclass and override the hooks below."""

    combine: str = "add"          # message combiner: add | min | max
    identity = 0.0                # acc value for vertices with no message
    msg_dtype = np.float64
    use_weights: bool = False     # multiply emitted values by edge weight

    def init(self, ctx: VPContext) -> np.ndarray:
        raise NotImplementedError

    def emit(self, state: np.ndarray, ctx: VPContext) -> np.ndarray:
        raise NotImplementedError

    def apply(self, state, acc, has_msg, g: float, ctx: VPContext):
        raise NotImplementedError

    def reduce(self, state: np.ndarray, ctx: VPContext) -> float:
        return 0.0

    def converged(self, delta: float, n_total: int, round: int) -> bool:
        return delta == 0.0


class PageRankProgram(VertexProgram):
    """NetworkX-semantics PageRank written as a user program — the
    protocol's reference implementation, pinned against the builtin
    ``algorithms.pagerank`` in pytest. ``reduce`` carries the dangling
    rank mass (``pagerank_networkx.h:62-161`` semantics)."""

    combine = "add"
    identity = 0.0

    def __init__(self, alpha: float = 0.85, tol: float = 1e-6):
        self.alpha, self.tol = alpha, tol

    def init(self, ctx):
        return np.full(ctx.n_local, 1.0 / ctx.n_total, dtype=np.float64)

    def emit(self, state, ctx):
        out = np.zeros(ctx.n_local, dtype=np.float64)
        nz = ctx.out_deg > 0
        out[nz] = state[nz] / ctx.out_deg[nz]
        return out

    def apply(self, state, acc, has_msg, g, ctx):
        base = (1.0 - self.alpha) / ctx.n_total + self.alpha * g / ctx.n_total
        return self.alpha * acc + base

    def reduce(self, state, ctx):
        return float(state[ctx.out_deg == 0].sum())

    def converged(self, delta, n_total, round):
        return delta < self.tol * n_total


class MinLabelProgram(VertexProgram):
    """Hash-min label propagation (WCC on undirected graphs) as a user
    program — integer state, min combiner, changed-count convergence."""

    combine = "min"
    identity = np.iinfo(np.int64).max
    msg_dtype = np.int64

    def init(self, ctx):
        return ctx.vids.copy()

    def emit(self, state, ctx):
        return state

    def apply(self, state, acc, has_msg, g, ctx):
        return np.minimum(state, acc)


class ArticleRankProgram(VertexProgram):
    """FLASH ArticleRank (apps/flash/ranking/articlerank.h:48-71) as a
    user program — proof the extension surface covers the FLASH DSL's
    EdgeMapDense/VertexMap shape, not just the builtins it mirrors:
    ``val' = (1-d) + d·Σ_in val(u)/(outdeg(u) + avg_outdeg)``, val₀=0,
    fixed ``max_iters`` rounds. ``avg_deg`` (Σ outdeg / N — one scalar
    off the pool's counts) comes in via the constructor, matching the
    header's GetSum(a)/n_vertex."""

    combine = "add"
    identity = 0.0

    def __init__(self, avg_deg: float, damping: float = 0.85,
                 max_iters: int = 20):
        self.avg_deg, self.damping, self.max_iters = avg_deg, damping, max_iters

    def init(self, ctx):
        return np.zeros(ctx.n_local, dtype=np.float64)

    def emit(self, state, ctx):
        return state / (ctx.out_deg + self.avg_deg)

    def apply(self, state, acc, has_msg, g, ctx):
        return self.damping * acc + (1.0 - self.damping)

    def converged(self, delta, n_total, round):
        return round + 1 >= self.max_iters


class MISProgram(VertexProgram):
    """Deterministic greedy maximal independent set — the FLASH
    mis.h:46-77 round shape (undecided vertex joins when its priority
    is the strict minimum among undecided neighbors; members' neighbors
    drop out a round later). Priority = vid — any injective priority
    yields a valid deterministic MIS; the reference packs
    ``deg·N + id``, which assumes compacted 0..N-1 ids our hashed vids
    don't satisfy. The fixpoint equals the sequential min-vid-first
    greedy MIS (the lexicographically-first MIS), which is the pytest
    oracle. States: 0 undecided / 1 in / 2 out; message = min over
    neighbors of (-1 if in, vid if undecided, +INF if out). Requires
    an undirected (both-arcs) graph."""

    combine = "min"
    identity = np.iinfo(np.int64).max
    msg_dtype = np.int64

    def init(self, ctx):
        return np.zeros(ctx.n_local, dtype=np.int64)

    def emit(self, state, ctx):
        return np.where(
            state == 1, np.int64(-1),
            np.where(state == 0, ctx.vids, self.identity)).astype(np.int64)

    def apply(self, state, acc, has_msg, g, ctx):
        new = state.copy()
        und = state == 0
        new[und & (acc == -1)] = 2
        new[und & (acc != -1) & (ctx.vids < acc)] = 1
        return new
