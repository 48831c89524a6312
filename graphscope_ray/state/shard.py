"""GraphShard — one hash-partition of the graph held in a Ray actor.

The Ray-native analogue of the reference's per-MPI-rank
``ArrowProjectedFragment`` (CSR over Arrow arrays,
``analytical_engine/core/fragment/arrow_projected_fragment.h:992-1041``)
plus its per-rank message buffers
(``core/parallel/thread_local_property_message_buffer.h``): edges whose
*src* hashes to this shard live here as sorted numpy arrays; per-round
messages are combined locally per destination (the equivalent of
grape's local combine before mirror sync) and shipped as one object per
destination shard.

Partition contract (mirrors ``core/utils/partitioner.h:43-54``):
``fid(v) = splitmix64(v) % P``. Vertices are int64 vids (string oids are
hashed to vids by state/vertex_map.py). Local vertex order is the
sorted order of vids — fully deterministic regardless of ingest order,
which pins float summation order (SURVEY §4 note 2).

All hot paths are vectorized numpy over Arrow-backed arrays; there are
no per-row Python loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from graphscope_ray.functions.hashing import partition_of, splitmix64

INF = np.float64(np.inf)


def _lex_reduce(dst, hi, lo, biggest=True):
    """Per-dst lexicographic (hi, lo) extremum via lexsort + segment
    first/last — the two-column analogue of _group_reduce(min/max)."""
    order = np.lexsort((lo, hi, dst))
    dst, hi, lo = dst[order], hi[order], lo[order]
    if biggest:
        idx = np.flatnonzero(np.concatenate((dst[1:] != dst[:-1], [True])))
    else:
        idx = np.flatnonzero(np.concatenate(([True], dst[1:] != dst[:-1])))
    return dst[idx], hi[idx], lo[idx]


def _edge_hash(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit hash of the canonical undirected edge
    (min, max) — the bridge sweep's Monte-Carlo XOR labels."""
    lo = np.minimum(a, b).astype(np.uint64)
    hi = np.maximum(a, b).astype(np.uint64)
    with np.errstate(over="ignore"):
        mixed = splitmix64(lo) ^ splitmix64(
            hi * np.uint64(0xC2B2AE3D27D4EB4F) + np.uint64(0x165667B19E3779F9))
    return mixed.view(np.int64)


def _concat_msgs(parts, dtypes):
    """Concatenate per-source-shard message tuples in shard order
    (deterministic), returning column arrays."""
    cols = [[] for _ in dtypes]
    for p in parts:
        if p is None:
            continue
        for i, arr in enumerate(p):
            cols[i].append(arr)
    if not cols[0]:
        return [np.empty(0, dtype=d) for d in dtypes]
    return [np.concatenate(c) for c in cols]


def _group_reduce(dst, val, op, presorted=False):
    """Segment-reduce val by dst. dst need not be sorted; a stable sort
    pins reduction order (determinism contract). ``presorted=True``
    skips the sort — valid for CSR slices, whose dst is sealed sorted
    (and any boolean-masked subset of them, masks preserve order)."""
    if len(dst) == 0:
        return dst, val
    if not presorted:
        order = np.argsort(dst, kind="stable")
        dst, val = dst[order], val[order]
    starts = np.flatnonzero(np.concatenate(([True], dst[1:] != dst[:-1])))
    return dst[starts], op.reduceat(val, starts)


@ray.remote
class GraphShard:
    """One graph partition: CSR + vertex state, alive across supersteps."""

    def __init__(self, fid: int, num_partitions: int):
        self.fid = fid
        self.P = num_partitions
        # per-dst-fid chunk buckets, split at INGEST (one O(chunk)
        # counting pass each) so seal never runs an edge-scale
        # partition-key sort: _fwd[d] holds this shard's arcs whose dst
        # is owned by d; _mir[f] holds mirror arcs received from sender
        # f (every reversed arc from f has fid(dst)=f, so the bucket
        # assignment on the receive side is free)
        self._fwd: list[list] = [[] for _ in range(num_partitions)]
        self._mir: list[list] = [[] for _ in range(num_partitions)]
        self._vbuf: list[np.ndarray] = []
        self.local: np.ndarray | None = None  # sorted local vids
        self.state: np.ndarray | None = None
        self.e_dir: np.ndarray | None = None  # bidi direction tags
        self.e_w: np.ndarray | None = None    # edge weights (None = all 1)

    # ------------------------------------------------------------- build
    def _bucketize(self, src, dst, w) -> None:
        """Counting-split one arc chunk by fid(dst) into the _fwd
        buckets (stable, so later dedup tie-breaks match the pre-split
        ingest order)."""
        if self.P == 1:
            self._fwd[0].append((src, dst, w))
            return
        fid = partition_of(dst, self.P)
        counts = np.bincount(fid, minlength=self.P)
        bounds = np.concatenate(([0], np.cumsum(counts)))
        order = np.argsort(fid, kind="stable")
        so, do = src[order], dst[order]
        wo = None if w is None else w[order]
        for d in range(self.P):
            lo, hi = bounds[d], bounds[d + 1]
            if hi > lo:
                self._fwd[d].append(
                    (so[lo:hi], do[lo:hi],
                     None if wo is None else wo[lo:hi]))

    def _ingest_table(self, t: pa.Table) -> int:
        src = np.asarray(
            t.column("src").to_numpy(zero_copy_only=False), dtype=np.int64)
        dst = np.asarray(
            t.column("dst").to_numpy(zero_copy_only=False), dtype=np.int64)
        w = None
        if "weight" in t.column_names:
            # weights stay OPTIONAL end-to-end: unweighted graphs never
            # materialize, exchange, sort or store 8 B/arc of ones
            w = np.asarray(t.column("weight").to_numpy(zero_copy_only=False),
                           dtype=np.float64)
        self._bucketize(src, dst, w)
        return t.num_rows

    def ingest(self, edges: pa.Table | None, vertices: np.ndarray | None) -> int:
        n = 0
        if edges is not None and edges.num_rows:
            n += self._ingest_table(edges)
        if vertices is not None and len(vertices):
            self._vbuf.append(np.asarray(vertices, dtype=np.int64))
        return n

    def ingest_blocks(self, *tables: pa.Table) -> int:
        """Buffer many pre-split edge sub-tables at once (the split-task
        routing path: one actor call per shard for the whole build)."""
        return sum(self._ingest_table(t) for t in tables
                   if t is not None and t.num_rows)

    def reverse_slices(self):
        """Seal-time reverse-arc exchange (undirected builds route each
        edge ONCE by fid(src); the mirror arcs travel here, shard →
        shard through the object store, skipping a second edge-scale
        Dataset shuffle). Ingest already bucketed the arcs by fid(dst)
        — the per-destination reversed slice IS bucket d, so this is
        pure concatenation (no hash, no sort). Each bucket is
        consolidated in place so seal concatenates each chunk once."""
        out = []
        for d in range(self.P):
            chunks = self._fwd[d]
            if not chunks:
                out.append(None)
                continue
            if len(chunks) > 1:
                s = np.concatenate([c[0] for c in chunks])
                t = np.concatenate([c[1] for c in chunks])
                if any(c[2] is not None for c in chunks):
                    w = np.concatenate([
                        c[2] if c[2] is not None
                        else np.ones(len(c[0]), np.float64) for c in chunks])
                else:
                    w = None
                self._fwd[d] = [(s, t, w)]
            s, t, w = self._fwd[d][0]
            out.append((t, s, w))  # reversed: (src'=dst, dst'=src, w)
        return tuple(out) if self.P > 1 else out[0]

    def ingest_arrays(self, *parts) -> int:
        """Receive reverse-exchange (src', dst', w|None) triples, one
        per sender shard in fid order; sender f's reversed arcs all
        have fid(dst')=f, so each lands wholesale in mirror bucket f."""
        n = 0
        for f, p in enumerate(parts):
            if p is None or len(p[0]) == 0:
                continue
            src = np.asarray(p[0], dtype=np.int64)
            dst = np.asarray(p[1], dtype=np.int64)
            w = None if p[2] is None else np.asarray(p[2], dtype=np.float64)
            self._mir[f].append((src, dst, w))
            n += len(src)
        return n

    def ingest_vertices(self, table: pa.Table) -> int:
        v = np.asarray(
            table.column("vid").to_numpy(zero_copy_only=False), dtype=np.int64)
        self._vbuf.append(v)
        return len(v)

    def build(self, dedup_arcs: bool = False, mirror_dir: int = 0,
              verts_complete: bool = False) -> dict:
        """Seal the shard: dedupe vertices, sort edges grouped by
        (dst_fid, dst, src) for combined scatter, build out-degrees.

        The partition-key grouping was already done by the ingest-time
        counting split, so sealing is one 2-key sort PER BUCKET (~E/P²
        rows each — cache-resident at typical shard sizes) instead of a
        3-key lexsort over the whole shard; src sorts as its int32
        local position (same order — `local` is vid-sorted).

        ``dedup_arcs`` drops duplicate (src, dst) arcs locally — every
        copy of an arc hashes to this shard, so shard-local dedup is
        exact and costs no extra shuffle (the reference loader dedups
        at the same point, global_vertex_map.h:45-52).

        ``mirror_dir=1`` tags the reverse-exchanged mirror arcs with a
        direction bit (bidi graph: one CSR holds fwd arcs dir=0 and rev
        arcs dir=1, filtered per sweep — Brandes' backward pass on
        directed graphs). ``mirror_dir=0`` (undirected) treats both arc
        sets identically and keeps no dir array.

        ``verts_complete=True`` asserts the routed vertex table covers
        every vid the arcs reference (the build_graph extra_vertices
        contract) — ``local`` then comes from the vertex table alone,
        skipping an edge-scale unique; a per-bucket membership check
        still catches violations loudly."""
        P = self.P
        verts = np.concatenate(self._vbuf) if self._vbuf else np.empty(0, np.int64)
        self._vbuf = []
        if verts_complete and len(verts):
            self.local = np.unique(verts)
        else:
            srcs_all = [c[0] for d in range(P) for c in self._fwd[d]]
            srcs_all += [c[0] for d in range(P) for c in self._mir[d]]
            self.local = np.unique(np.concatenate([verts] + srcs_all))
        self.n_local = len(self.local)

        has_w = any(
            c[2] is not None
            for d in range(P) for c in (self._fwd[d] + self._mir[d]))
        sp_parts, dst_parts, w_parts, dir_parts = [], [], [], []
        sizes = np.zeros(P + 1, dtype=np.int64)
        n_edges = 0
        for d in range(P):
            fwd, mir = self._fwd[d], self._mir[d]
            chunks = fwd + mir
            if not chunks:
                continue
            if len(chunks) > 1:
                src = np.concatenate([c[0] for c in chunks])
                dst = np.concatenate([c[1] for c in chunks])
            else:
                src, dst = chunks[0][0], chunks[0][1]
            w = None
            if has_w:
                w = np.concatenate([
                    c[2] if c[2] is not None
                    else np.ones(len(c[0]), np.float64) for c in chunks])
            if mirror_dir:
                n_fwd = sum(len(c[0]) for c in fwd)
                edir = np.zeros(len(src), dtype=np.int8)
                edir[n_fwd:] = 1
            else:
                edir = None
            sp = np.searchsorted(self.local, src).astype(np.int32)
            if verts_complete and len(src):
                bad = sp >= self.n_local
                if bad.any() or not np.array_equal(
                        self.local[np.minimum(sp, self.n_local - 1)], src):
                    raise ValueError(
                        f"shard {self.fid}: arc src vid absent from the "
                        "vertex table (verts_complete contract violated)"
                    )
            if edir is None:
                perm = np.lexsort((sp, dst))
            else:
                perm = np.lexsort((edir, sp, dst))
            sp, dst = sp[perm], dst[perm]
            w = None if w is None else w[perm]
            edir = None if edir is None else edir[perm]
            if dedup_arcs and len(sp):
                same = (sp[1:] == sp[:-1]) & (dst[1:] == dst[:-1])
                if edir is not None:
                    same &= edir[1:] == edir[:-1]
                keep = np.concatenate(([True], ~same))
                sp, dst = sp[keep], dst[keep]
                w = None if w is None else w[keep]
                edir = None if edir is None else edir[keep]
            sizes[d + 1] = len(sp)
            n_edges += len(sp) if edir is None else int((edir == 0).sum())
            sp_parts.append(sp)
            dst_parts.append(dst)
            if w is not None:
                w_parts.append(w)
            if edir is not None:
                dir_parts.append(edir)
        self._fwd = [[] for _ in range(P)]
        self._mir = [[] for _ in range(P)]
        self.e_src_pos = (np.concatenate(sp_parts) if sp_parts
                          else np.empty(0, np.int32))
        self.e_dst = (np.concatenate(dst_parts) if dst_parts
                      else np.empty(0, np.int64))
        self.e_w = np.concatenate(w_parts) if w_parts else None
        self.e_dir = np.concatenate(dir_parts) if dir_parts else None
        self.part_bounds = np.cumsum(sizes)
        if self.e_dir is None:
            self.out_deg = np.bincount(
                self.e_src_pos, minlength=self.n_local).astype(np.int64)
        else:
            # degree/edge counts describe the FORWARD graph; mirror arcs
            # exist only for reverse sweeps
            self.out_deg = np.bincount(
                self.e_src_pos[self.e_dir == 0],
                minlength=self.n_local).astype(np.int64)
        self.n_edges = n_edges
        return {"fid": self.fid, "vertices": self.n_local, "edges": self.n_edges}

    def degree_table(self) -> pa.Table:
        return pa.table(
            {"vid": pa.array(self.local, pa.int64()),
             "out_degree": pa.array(self.out_deg, pa.int64())}
        )

    # ------------------------------------------- generic scatter helpers
    def _weights(self):
        """Edge weight vector, or scalar 1.0 when the graph stores none
        (unweighted graphs keep e_w=None — no 8 B/arc of ones)."""
        return self.e_w if self.e_w is not None else 1.0

    def _emit_per_part(self, edge_mask, values, op):
        """Combine `values[edge]` per (dst_fid, dst) and return one
        (dst, val) tuple per destination shard (None when empty).
        e_dst is sealed sorted within each partition segment (masking
        preserves that), so the segment reduce skips its sort."""
        out = []
        for d in range(self.P):
            lo, hi = self.part_bounds[d], self.part_bounds[d + 1]
            if edge_mask is None:
                dsts, vals = self.e_dst[lo:hi], values[lo:hi]
            else:
                m = edge_mask[lo:hi]
                dsts, vals = self.e_dst[lo:hi][m], values[lo:hi][m]
            if len(dsts) == 0:
                out.append(None)
                continue
            u, v = _group_reduce(dsts, vals, op, presorted=True)
            out.append((u, v))
        return out if self.P > 1 else out[0]

    # ----------------------------------------------------------- PageRank
    def pagerank_init(self, n_total: int) -> float:
        """rank=1/N for all; returns this shard's dangling-rank partial
        (semantics: apps/pagerank/pagerank_networkx.h:62-87)."""
        self.n_total = n_total
        self.state = np.full(self.n_local, 1.0 / n_total, dtype=np.float64)
        self._dangling_mask = self.out_deg == 0
        return float(self.state[self._dangling_mask].sum())

    def pagerank_scatter(self):
        """Emit rank/outdeg along out-edges, pre-summed per destination."""
        contrib = np.zeros(self.n_local, dtype=np.float64)
        nz = ~self._dangling_mask
        contrib[nz] = self.state[nz] / self.out_deg[nz]
        return self._emit_per_part(None, contrib[self.e_src_pos], np.add)

    def pagerank_apply(self, base: float, alpha: float, *msg_parts):
        """rank' = alpha*acc + base (base folds (1-alpha)/N and
        alpha*dangling/N exactly as pagerank_networkx.h:117-133)."""
        dst, val = _concat_msgs(msg_parts, (np.int64, np.float64))
        acc = np.zeros(self.n_local, dtype=np.float64)
        if len(dst):
            u, s = _group_reduce(dst, val, np.add)
            acc[np.searchsorted(self.local, u)] = s
        new = alpha * acc + base
        delta = float(np.abs(new - self.state).sum())
        self.state = new
        dangling = float(new[self._dangling_mask].sum())
        return delta, dangling

    # ------------------------------- personalized PageRank (FLASH ppr.h)
    def ppr_init(self, seeds: np.ndarray, n_seeds_total: int) -> float:
        """Teleport vector p = 1/|S| at seed vertices, 0 elsewhere
        (networkx pagerank(personalization=...) semantics; dangling
        mass also redistributes by p). Returns the shard's initial
        dangling partial (state starts at p)."""
        self._pvec = np.zeros(self.n_local, dtype=np.float64)
        pos = np.searchsorted(self.local, seeds)
        hit = pos < self.n_local
        pos = pos[hit]
        ok = self.local[pos] == np.asarray(seeds)[hit]
        self._pvec[pos[ok]] = 1.0 / n_seeds_total
        self.state = self._pvec.copy()
        self._dangling_mask = self.out_deg == 0
        return float(self.state[self._dangling_mask].sum())

    def ppr_step(self, alpha: float, dangling: float, *inbox):
        """Fused round: rank' = α·Σ_in rank/outdeg + (α·dangling +
        (1−α))·p, then scatter the next round's contributions."""
        if inbox:
            dst, val = _concat_msgs(inbox, (np.int64, np.float64))
            acc = np.zeros(self.n_local, dtype=np.float64)
            if len(dst):
                u, s = _group_reduce(dst, val, np.add)
                acc[np.searchsorted(self.local, u)] = s
            new = alpha * acc + (alpha * dangling + (1.0 - alpha)) * self._pvec
            delta = float(np.abs(new - self.state).sum())
            self.state = new
            scal = (delta, float(new[self._dangling_mask].sum()))
        else:
            scal = (0.0, 0.0)
        contrib = np.zeros(self.n_local, dtype=np.float64)
        nz = ~self._dangling_mask
        contrib[nz] = self.state[nz] / self.out_deg[nz]
        vals = contrib[self.e_src_pos]
        if self.e_dir is not None:
            msgs = self._emit_per_part(self.e_dir == 0, vals, np.add)
        else:
            msgs = self._emit_per_part(None, vals, np.add)
        return self._msgs_tuple(msgs) + (scal,)

    # ------------------------------------------- hash-min propagation (WCC)
    def minprop_init(self):
        """comp = own vid (wcc_projected.h:76-81); everyone active."""
        self.state = self.local.copy()
        self._frontier = np.ones(self.n_local, dtype=bool)
        return int(self.n_local)

    def minprop_scatter(self):
        """Active vertices push their component id to out-neighbors
        (undirected graphs are stored with both arcs, so push-only
        covers both directions; wcc_projected.h:83-105)."""
        mask = self._frontier[self.e_src_pos]
        return self._emit_per_part(mask, self.state[self.e_src_pos], np.minimum)

    def minprop_apply(self, *msg_parts) -> int:
        dst, val = _concat_msgs(msg_parts, (np.int64, np.int64))
        self._frontier = np.zeros(self.n_local, dtype=bool)
        if not len(dst):
            return 0
        u, m = _group_reduce(dst, val, np.minimum)
        pos = np.searchsorted(self.local, u)
        better = m < self.state[pos]
        pos = pos[better]
        self.state[pos] = m[better]
        self._frontier[pos] = True
        return int(better.sum())

    # ---------------------------------------------------- CDLP (sync LPA)
    def cdlp_init(self) -> int:
        self.state = self.local.copy()
        return int(self.n_local)

    def cdlp_scatter(self):
        """Emit (dst, label, count) partials, pre-counted per dest."""
        labels = self.state[self.e_src_pos]
        out = []
        for d in range(self.P):
            lo, hi = self.part_bounds[d], self.part_bounds[d + 1]
            dsts, labs = self.e_dst[lo:hi], labels[lo:hi]
            if len(dsts) == 0:
                out.append(None)
                continue
            order = np.lexsort((labs, dsts))
            dsts, labs = dsts[order], labs[order]
            newseg = np.concatenate(
                ([True], (dsts[1:] != dsts[:-1]) | (labs[1:] != labs[:-1]))
            )
            starts = np.flatnonzero(newseg)
            counts = np.diff(np.append(starts, len(dsts))).astype(np.int64)
            out.append((dsts[starts], labs[starts], counts))
        # mirror _emit_per_part's P==1 convention (single object, not list)
        return out if self.P > 1 else out[0]

    def cdlp_apply(self, *msg_parts) -> int:
        """label' = most frequent incoming label, ties -> min label
        (LDBC CDLP; in-repo shape apps/flash/clustering/lpa.h:42-78)."""
        dst, lab, cnt = _concat_msgs(msg_parts, (np.int64, np.int64, np.int64))
        if not len(dst):
            return 0
        order = np.lexsort((lab, dst))
        dst, lab, cnt = dst[order], lab[order], cnt[order]
        newseg = np.concatenate(([True], (dst[1:] != dst[:-1]) | (lab[1:] != lab[:-1])))
        starts = np.flatnonzero(newseg)
        udst, ulab = dst[starts], lab[starts]
        ucnt = np.add.reduceat(cnt, starts)
        # per dst: argmax count, tie-break min label. ulab ascending within
        # dst already; stable selection via lexsort on (-count) then first.
        sel = np.lexsort((ulab, -ucnt, udst))
        udst2, ulab2 = udst[sel], ulab[sel]
        first = np.flatnonzero(np.concatenate(([True], udst2[1:] != udst2[:-1])))
        tgt, newlab = udst2[first], ulab2[first]
        pos = np.searchsorted(self.local, tgt)
        changed = int((self.state[pos] != newlab).sum())
        self.state[pos] = newlab
        return changed

    # --------------------------------- Louvain distributed local-move
    # (pipelines/louvain.louvain_pool; reference semantics
    # apps/pregel/louvain/louvain.h — aggregator-based local moving).
    # Per round, three fused waves with O(1) driver state:
    #   A lv_nbr_step  : apply previous round's accepted moves, then
    #                    push comm[src] along every arc to owner(dst)
    #                    pre-summed per (dst, comm)  [O(E) messages]
    #   B lv_cand_step : owner(v) groups to per-(v, c) weights w_{v→c},
    #                    synthesizes the stay option, ships candidate
    #                    rows AND raw (c, vid, kv) community-mass rows
    #                    to owner(c)                 [O(E)+O(V)]
    #   C lv_score_step: owner(c) reduces tot[c] in ascending-vid
    #                    order (float order pinned), scores its rows,
    #                    returns per-v partial bests + the stay score
    #                    to owner(v)                 [O(V) bests]
    # The per-round math (gain formula, strict margin, parity gating,
    # min-community tie-breaks) is IDENTICAL to the Dataset engine's
    # _local_move_level; tests pin exact equality at P ∈ {1, 3}.
    def lv_loops_ingest(self, t: pa.Table) -> int:
        """Buffer this shard's self-loop weight rows (vid, w) — the
        pool's arc set excludes loops; kv adds 2w per loop."""
        if not hasattr(self, "_lv_loopbuf"):
            self._lv_loopbuf = []
        if t is not None and t.num_rows:
            self._lv_loopbuf.append((
                np.asarray(t.column("vid").to_numpy(zero_copy_only=False),
                           np.int64),
                np.asarray(t.column("w").to_numpy(zero_copy_only=False),
                           np.float64)))
        return int(t.num_rows if t is not None else 0)

    def lv_init(self) -> float:
        """comm = own vid; kv = Σ arc weights + 2×self-loops. Returns
        this shard's kv partial (driver scalar-sums m2)."""
        w = self._weights()
        if isinstance(w, np.ndarray):
            kv = np.bincount(self.e_src_pos, weights=w,
                             minlength=self.n_local).astype(np.float64)
        else:
            kv = np.bincount(self.e_src_pos,
                             minlength=self.n_local).astype(np.float64)
        for vid, lw in getattr(self, "_lv_loopbuf", []):
            pos = np.searchsorted(self.local, vid)
            np.add.at(kv, pos, 2.0 * lw)
        self._lv_loopbuf = []
        self._lv_kv = kv
        self._lv_comm = self.local.copy()
        return float(kv.sum())

    def _lv_nbr_scatter(self):
        labels = self._lv_comm[self.e_src_pos]
        w = self._weights()
        out = []
        for d in range(self.P):
            lo, hi = self.part_bounds[d], self.part_bounds[d + 1]
            dsts, labs = self.e_dst[lo:hi], labels[lo:hi]
            if len(dsts) == 0:
                out.append(None)
                continue
            ws = (w[lo:hi] if isinstance(w, np.ndarray)
                  else np.ones(hi - lo, np.float64))
            order = np.lexsort((labs, dsts))
            dsts, labs, ws = dsts[order], labs[order], ws[order]
            starts = np.flatnonzero(np.concatenate(
                ([True], (dsts[1:] != dsts[:-1]) | (labs[1:] != labs[:-1]))))
            out.append((dsts[starts], labs[starts],
                        np.add.reduceat(ws, starts)))
        return out if self.P > 1 else out[0]

    def _lv_apply(self, parity: int, *inbox) -> int:
        v, kind, c, score = _concat_msgs(
            inbox, (np.int64, np.int8, np.int64, np.float64))
        if not len(v):
            return 0
        sm = kind == 1
        vs, ss = v[sm], score[sm]
        so = np.argsort(vs, kind="stable")
        vs, ss = vs[so], ss[so]
        vb, cb, sb = v[~sm], c[~sm], score[~sm]
        order = np.lexsort((cb, -sb, vb))
        vb, cb, sb = vb[order], cb[order], sb[order]
        first = np.concatenate(([True], vb[1:] != vb[:-1]))
        vb, cb, sb = vb[first], cb[first], sb[first]
        stay = ss[np.searchsorted(vs, vb)]
        pos = np.searchsorted(self.local, vb)
        cold = self._lv_comm[pos]
        mv = ((cb != cold) & (sb > stay + 1e-12)
              & ((vb % 2) == parity))
        self._lv_comm[pos[mv]] = cb[mv]
        return int(mv.sum())

    def lv_nbr_step(self, parity: int, *inbox):
        moved = self._lv_apply(parity, *inbox) if inbox else 0
        return self._msgs_tuple(self._lv_nbr_scatter()) + (moved,)

    def lv_apply_final(self, parity: int, *inbox) -> int:
        return self._lv_apply(parity, *inbox)

    def lv_cand_step(self, *inbox):
        u, cn, w = _concat_msgs(inbox, (np.int64, np.int64, np.float64))
        if len(u):
            order = np.lexsort((cn, u))
            u, cn, w = u[order], cn[order], w[order]
            starts = np.flatnonzero(np.concatenate(
                ([True], (u[1:] != u[:-1]) | (cn[1:] != cn[:-1]))))
            cu, cc = u[starts], cn[starts]
            cw = np.add.reduceat(w, starts)
        else:
            cu = cc = np.empty(0, np.int64)
            cw = np.empty(0, np.float64)
        pos = np.searchsorted(self.local, cu)
        cold = self._lv_comm[pos]
        ckv = self._lv_kv[pos]
        cself = (cc == cold)
        # synthesize the stay option (w_{v,cold} = 0) for vertices with
        # no arc into their own community — exactly once per vertex
        ustarts = np.flatnonzero(np.concatenate(
            ([True], cu[1:] != cu[:-1]))) if len(cu) else np.empty(0, int)
        if len(ustarts):
            has_self = np.logical_or.reduceat(cself, ustarts)
            miss = ~has_self
            mu = cu[ustarts[miss]]
            mpos = np.searchsorted(self.local, mu)
            cu = np.concatenate([cu, mu])
            cc = np.concatenate([cc, self._lv_comm[mpos]])
            cw = np.concatenate([cw, np.zeros(miss.sum())])
            cold = np.concatenate([cold, self._lv_comm[mpos]])
            ckv = np.concatenate([ckv, self._lv_kv[mpos]])
            cself = np.concatenate([cself, np.ones(miss.sum(), bool)])
        # community-mass rows for every LOCAL vertex → owner(comm)
        towner = partition_of(self._lv_comm, self.P)
        cowner = partition_of(cc, self.P)
        out = []
        for d in range(self.P):
            tm = towner == d
            cm = cowner == d
            if not tm.any() and not cm.any():
                out.append(None)
                continue
            out.append((self._lv_comm[tm], self.local[tm],
                        self._lv_kv[tm],
                        cu[cm], cc[cm], cw[cm], ckv[cm],
                        cself[cm].astype(np.int8)))
        return self._msgs_tuple(out if self.P > 1 else out[0]) + (0,)

    def lv_score_step(self, m2: float, *inbox):
        tc, tvid, tkv, cv, cc, cw, ckv, cself = _concat_msgs(
            inbox, (np.int64, np.int64, np.float64,
                    np.int64, np.int64, np.float64, np.float64, np.int8))
        # tot[c] reduced in ascending (c, vid) order — the same float
        # summation order as the Dataset engine's vid-ordered groupby
        if len(tc):
            order = np.lexsort((tvid, tc))
            tcs, tkvs = tc[order], tkv[order]
            starts = np.flatnonzero(np.concatenate(
                ([True], tcs[1:] != tcs[:-1])))
            uc, tot = tcs[starts], np.add.reduceat(tkvs, starts)
        else:
            uc, tot = np.empty(0, np.int64), np.empty(0, np.float64)
        out_parts = [[] for _ in range(self.P)]
        if len(cv):
            tot_c = tot[np.searchsorted(uc, cc)]
            selfb = cself.astype(bool)
            score = cw - (tot_c - np.where(selfb, ckv, 0.0)) * ckv / m2
            vowner = partition_of(cv, self.P)
            # stay rows (kind 1)
            for d in range(self.P):
                m = selfb & (vowner == d)
                if m.any():
                    out_parts[d].append((cv[m],
                                         np.ones(m.sum(), np.int8),
                                         cc[m], score[m]))
            # per-v partial best among THIS shard's rows (kind 0):
            # max score, ties → min community (matches the Dataset
            # engine's (score desc, cn asc) stable sort)
            order = np.lexsort((cc, -score, cv))
            vb = cv[order]
            first = np.concatenate(([True], vb[1:] != vb[:-1]))
            sel = order[first]
            bowner = vowner[sel]
            for d in range(self.P):
                m = bowner == d
                if m.any():
                    out_parts[d].append((cv[sel][m],
                                         np.zeros(m.sum(), np.int8),
                                         cc[sel][m], score[sel][m]))
        out = []
        for d in range(self.P):
            parts = out_parts[d]
            if not parts:
                out.append(None)
            elif len(parts) == 1:
                out.append(parts[0])
            else:
                out.append(tuple(np.concatenate([p[i] for p in parts])
                                 for i in range(4)))
        return self._msgs_tuple(out if self.P > 1 else out[0]) + (0,)

    def lv_table(self) -> pa.Table:
        return pa.table({
            "vid": pa.array(self.local, pa.int64()),
            "comm": pa.array(self._lv_comm, pa.int64())})

    # ------------------------------------------------ BFS / SSSP (min-dist)
    def dist_init(self, roots: np.ndarray) -> int:
        self.state = np.full(self.n_local, INF, dtype=np.float64)
        pos = np.searchsorted(self.local, roots)
        hit = (pos < self.n_local)
        pos = pos[hit]
        pos = pos[self.local[pos] == np.asarray(roots)[hit]]
        self.state[pos] = 0.0
        self._frontier = np.zeros(self.n_local, dtype=bool)
        self._frontier[pos] = True
        return int(len(pos))

    def dist_warm_ingest(self, table: pa.Table) -> int:
        """Buffer (vid, dist) warm-start rows (sssp_property_append's
        IncEval-from-old-fixpoint: the pre-append distances)."""
        if not hasattr(self, "_warm"):
            self._warm = []
        self._warm.append((
            table.column("vid").to_numpy(zero_copy_only=False).astype(np.int64),
            table.column("dist").to_numpy(zero_copy_only=False).astype(
                np.float64),
        ))
        return table.num_rows

    def dist_warm_roots(self, table: pa.Table) -> int:
        """Buffer frontier seed vids (the appended arcs' src endpoints)."""
        if not hasattr(self, "_warm_roots"):
            self._warm_roots = []
        self._warm_roots.append(
            table.column("vid").to_numpy(zero_copy_only=False).astype(np.int64))
        return table.num_rows

    def dist_warm_seal(self) -> int:
        """state <- buffered distances (INF where absent); frontier <-
        buffered roots with finite distance (only they can relax their
        new out-arcs; everything else is already at the old fixpoint)."""
        self.state = np.full(self.n_local, INF, dtype=np.float64)
        for vids, dists in getattr(self, "_warm", []):
            pos = np.searchsorted(self.local, vids)
            ok = pos < self.n_local
            pos, d = pos[ok], dists[ok]
            hit = self.local[pos] == vids[ok]
            self.state[pos[hit]] = d[hit]
        self._warm = []
        self._frontier = np.zeros(self.n_local, dtype=bool)
        for vids in getattr(self, "_warm_roots", []):
            pos = np.searchsorted(self.local, vids)
            ok = pos < self.n_local
            pos = pos[ok]
            hit = self.local[pos] == vids[ok]
            pos = pos[hit]
            self._frontier[pos[np.isfinite(self.state[pos])]] = True
        self._warm_roots = []
        return int(self._frontier.sum())

    def dist_scatter(self, weighted: bool):
        mask = self._frontier[self.e_src_pos]
        vals = self.state[self.e_src_pos] + (self._weights() if weighted else 1.0)
        return self._emit_per_part(mask, vals, np.minimum)

    def dist_apply(self, *msg_parts) -> int:
        dst, val = _concat_msgs(msg_parts, (np.int64, np.float64))
        self._frontier = np.zeros(self.n_local, dtype=bool)
        if not len(dst):
            return 0
        u, m = _group_reduce(dst, val, np.minimum)
        pos = np.searchsorted(self.local, u)
        better = m < self.state[pos]
        pos = pos[better]
        self.state[pos] = m[better]
        self._frontier[pos] = True
        return int(better.sum())

    # ------------------------------------------------ delta-stepping SSSP
    # flash/traversal/sssp-dlt-step.h: relaxations processed in distance
    # buckets of width Δ; same fixpoint as the plain dist loop, but each
    # inner wave's frontier is clamped to the open bucket.
    def weight_stats(self):
        """(Σ arc weight, #arcs) over this shard's CSR — the reference
        picks Δ = 2·mean(arc weight) (sssp-dlt-step.h:52-59)."""
        n = int(len(self.e_src_pos))
        w = self._weights()
        tot = float(np.sum(w)) if np.ndim(w) else float(w) * n
        return tot, n

    def dlt_bucket_start(self, a: float, b: float) -> int:
        """Open bucket [a, b): frontier = vertices with a−ε ≤ dis < b
        (sssp-dlt-step.h filter2; ε matches the reference's 1e-10)."""
        self._frontier = (self.state >= a - 1e-10) & (self.state < b)
        return int(self._frontier.sum())

    def dlt_step(self, a: float, b: float, *inbox):
        """Fused inner round: min-apply the inbox, clamp the improved
        frontier to the current bucket, scatter weighted relaxations.
        Scalar = frontier size after clamping (the reference's
        VSize(A) loop condition)."""
        if inbox:
            self.dist_apply(*inbox)
            self._frontier &= (self.state >= a - 1e-10) & (self.state < b)
        active = int(self._frontier.sum())
        return self._msgs_tuple(self.dist_scatter(True)) + (active,)

    def state_max_finite(self) -> float:
        """Max settled distance (−1 when nothing is reached) — the
        reference's maxd termination scalar."""
        finite = self.state[np.isfinite(self.state)]
        return float(finite.max()) if len(finite) else -1.0

    # --------------------- SSSP with parent pointers (path reconstruction)
    # The dist loop plus a parent column (apps/sssp/sssp_path.h:174).
    # During relaxation the parent follows the accepted (strictly
    # better) distance; a final fix-point pass re-picks parent = min
    # vid among ALL optimal predecessors, making the parent array (and
    # hence every reconstructed path) deterministic regardless of
    # arrival order.
    def path_init(self, roots: np.ndarray) -> int:
        n = self.dist_init(roots)
        self._parent = np.full(self.n_local, -1, dtype=np.int64)
        return n

    def _path_emit(self, mask, vals):
        """Per-destination (dst, val, parent) with min-(val, parent)
        combine."""
        parents = self.local[self.e_src_pos]
        out = []
        for d in range(self.P):
            lo, hi = self.part_bounds[d], self.part_bounds[d + 1]
            m = mask[lo:hi]
            if not m.any():
                out.append(None)
                continue
            dsts = self.e_dst[lo:hi][m]
            v = vals[lo:hi][m]
            p = parents[lo:hi][m]
            order = np.lexsort((p, v, dsts))
            dsts, v, p = dsts[order], v[order], p[order]
            first = np.flatnonzero(
                np.concatenate(([True], dsts[1:] != dsts[:-1]))
            )
            out.append((dsts[first], v[first], p[first]))
        return out if self.P > 1 else out[0]

    def path_step(self, weighted: bool, *inbox):
        changed = 0
        if inbox:
            dst, val, par = _concat_msgs(inbox, (np.int64, np.float64, np.int64))
            self._frontier = np.zeros(self.n_local, dtype=bool)
            if len(dst):
                order = np.lexsort((par, val, dst))
                dst, val, par = dst[order], val[order], par[order]
                first = np.flatnonzero(
                    np.concatenate(([True], dst[1:] != dst[:-1]))
                )
                u, v, p = dst[first], val[first], par[first]
                pos = np.searchsorted(self.local, u)
                better = v < self.state[pos]
                pos_b = pos[better]
                self.state[pos_b] = v[better]
                self._parent[pos_b] = p[better]
                self._frontier[pos_b] = True
                changed = int(better.sum())
        mask = self._frontier[self.e_src_pos]
        vals = self.state[self.e_src_pos] + (self._weights() if weighted else 1.0)
        return self._msgs_tuple(self._path_emit(mask, vals)) + (changed,)

    def path_finalize_scatter(self, weighted: bool):
        """Emit candidate (dist, parent) along EVERY edge once — the
        deterministic min-parent re-pick pass."""
        finite = np.isfinite(self.state[self.e_src_pos])
        vals = self.state[self.e_src_pos] + (self._weights() if weighted else 1.0)
        return self._path_emit(finite, vals)

    def path_finalize_apply(self, *inbox) -> int:
        dst, val, par = _concat_msgs(inbox, (np.int64, np.float64, np.int64))
        if not len(dst):
            return 0
        order = np.lexsort((par, val, dst))
        dst, val, par = dst[order], val[order], par[order]
        first = np.flatnonzero(np.concatenate(([True], dst[1:] != dst[:-1])))
        u, v, p = dst[first], val[first], par[first]
        pos = np.searchsorted(self.local, u)
        tie = v == self.state[pos]
        self._parent[pos[tie]] = p[tie]
        return int(tie.sum())

    def path_table(self) -> pa.Table:
        return pa.table({
            "vid": pa.array(self.local, pa.int64()),
            "distance": pa.array(self.state),
            "parent": pa.array(self._parent, pa.int64()),
        })

    def path_parent_of(self, vid: int):
        pos = np.searchsorted(self.local, vid)
        if pos >= self.n_local or self.local[pos] != vid:
            return None
        return (int(self._parent[pos]), float(self.state[pos]))

    # --------------------------- generic linear propagation (HITS/Katz/…)
    def value_init(self, value: float = 1.0) -> int:
        """state[v] = value for all local vertices."""
        self.state = np.full(self.n_local, value, dtype=np.float64)
        return self.n_local

    def value_scatter(self, weighted: bool = False):
        """Emit state[src] (optionally × edge weight) along stored arcs,
        pre-summed per destination — the generic 'push my value' step
        (used with a reversed-arc twin graph for in-edge pulls)."""
        vals = self.state[self.e_src_pos]
        if weighted and self.e_w is not None:
            vals = vals * self.e_w
        return self._emit_per_part(None, vals, np.add)

    def value_apply(self, alpha: float, beta: float, plus_state: bool,
                    *msg_parts):
        """state' = alpha * Σ_in msgs + beta (+ state if plus_state);
        returns partials (Σ|Δ|, Σ state', Σ state'², max state') for
        driver-side normalization (grape::Communicator allreduce role)."""
        dst, val = _concat_msgs(msg_parts, (np.int64, np.float64))
        acc = np.zeros(self.n_local, dtype=np.float64)
        if len(dst):
            u, s = _group_reduce(dst, val, np.add)
            acc[np.searchsorted(self.local, u)] = s
        new = alpha * acc + beta + (self.state if plus_state else 0.0)
        delta = float(np.abs(new - self.state).sum())
        self.state = new
        return (
            delta,
            float(new.sum()),
            float((new * new).sum()),
            float(new.max()) if self.n_local else 0.0,
        )

    def value_scale(self, factor: float) -> float:
        self.state *= factor
        return float(self.state.sum())

    # ---------------------------------- multi-source BFS (closeness etc.)
    def msbfs_init(self, sources: np.ndarray) -> int:
        """Distance matrix (n_local × B) for B simultaneous BFS sources
        — the batched per-source fan-out behind closeness/harmonic
        centrality (apps/centrality/closeness/closeness_centrality.h).
        Memory: n_local × B doubles per shard; exact mode is for graphs
        where V×B fits (callers sample sources beyond that)."""
        self._msb_sources = np.asarray(sources, dtype=np.int64)
        B = len(self._msb_sources)
        self.state = None
        self._msd = np.full((self.n_local, B), INF, dtype=np.float64)
        pos = np.searchsorted(self.local, self._msb_sources)
        hit = pos < self.n_local
        ok = np.where(hit)[0]
        ok = ok[self.local[pos[ok]] == self._msb_sources[ok]]
        self._msd[pos[ok], ok] = 0.0
        self._frontier = np.zeros(self.n_local, dtype=bool)
        self._frontier[pos[ok]] = True
        return int(len(ok))

    def msbfs_scatter(self):
        """Push (dist row + 1) along out-edges from frontier vertices,
        min-combined per destination (vector-valued hash-min). On a
        bidi graph only forward arcs carry distance."""
        mask = self._frontier[self.e_src_pos]
        if self.e_dir is not None:
            mask = mask & (self.e_dir == 0)
        out = []
        for d in range(self.P):
            lo, hi = self.part_bounds[d], self.part_bounds[d + 1]
            m = mask[lo:hi]
            if not m.any():
                out.append(None)
                continue
            dsts = self.e_dst[lo:hi][m]
            rows = self._msd[self.e_src_pos[lo:hi][m]] + 1.0
            # segment-min per dst over the row matrix (dsts arrives
            # sealed-sorted within the partition segment)
            starts = np.flatnonzero(
                np.concatenate(([True], dsts[1:] != dsts[:-1]))
            )
            out.append((dsts[starts], np.minimum.reduceat(rows, starts, axis=0)))
        return out if self.P > 1 else out[0]

    def msbfs_apply(self, *msg_parts) -> int:
        self._frontier = np.zeros(self.n_local, dtype=bool)
        dsts, rows = [], []
        for p in msg_parts:
            if p is None:
                continue
            dsts.append(p[0])
            rows.append(p[1])
        if not dsts:
            return 0
        dst = np.concatenate(dsts)
        mat = np.concatenate(rows, axis=0)
        order = np.argsort(dst, kind="stable")
        dst, mat = dst[order], mat[order]
        starts = np.flatnonzero(np.concatenate(([True], dst[1:] != dst[:-1])))
        u = dst[starts]
        m = np.minimum.reduceat(mat, starts, axis=0)
        pos = np.searchsorted(self.local, u)
        better = m < self._msd[pos]
        improved = better.any(axis=1)
        self._msd[pos] = np.minimum(self._msd[pos], m)
        self._frontier[pos[improved]] = True
        return int(improved.sum())

    def _matrix_scatter(self, vertex_mask, rows, reduce_op, use_dir=None):
        """Push per-vertex matrix rows along out-edges of masked
        vertices, segment-``reduce_op``-combined per destination —
        the generic vector-valued scatter behind msbfs and Brandes.
        ``use_dir`` filters to one direction class of a bidi graph
        (0 = forward arcs, 1 = mirror arcs; None = all)."""
        mask = vertex_mask[self.e_src_pos]
        if use_dir is not None and self.e_dir is not None:
            mask = mask & (self.e_dir == use_dir)
        out = []
        for d in range(self.P):
            lo, hi = self.part_bounds[d], self.part_bounds[d + 1]
            m = mask[lo:hi]
            if not m.any():
                out.append(None)
                continue
            dsts = self.e_dst[lo:hi][m]
            r = rows[self.e_src_pos[lo:hi][m]]
            # dsts arrives sealed-sorted within the partition segment
            starts = np.flatnonzero(
                np.concatenate(([True], dsts[1:] != dsts[:-1]))
            )
            out.append((dsts[starts], reduce_op.reduceat(r, starts, axis=0)))
        return out if self.P > 1 else out[0]

    @staticmethod
    def _concat_matrix_msgs(inbox):
        dsts, rows = [], []
        for p in inbox:
            if p is None:
                continue
            dsts.append(p[0])
            rows.append(p[1])
        if not dsts:
            return None, None
        dst = np.concatenate(dsts)
        mat = np.concatenate(rows, axis=0)
        order = np.argsort(dst, kind="stable")
        dst, mat = dst[order], mat[order]
        starts = np.flatnonzero(np.concatenate(([True], dst[1:] != dst[:-1])))
        return dst[starts], (starts, mat)

    # ------------------- Brandes betweenness (batched multi-source BFS)
    # Forward: level-synchronous BFS with σ path counting (all shortest
    # paths to a vertex arrive in the same round, so σ is the plain sum
    # of predecessor σ). Backward: dependency sweep by descending
    # level, δ(v) += σ(v)·Σ_w (1+δ(w))/σ(w) over successors w. The
    # reference's Brandes lives in
    # apps/centrality/betweenness/betweenness_centrality.h (240 LoC).
    def brandes_init(self, sources: np.ndarray) -> int:
        self._msb_sources = np.asarray(sources, dtype=np.int64)
        B = len(self._msb_sources)
        self._msd = np.full((self.n_local, B), INF, dtype=np.float64)
        self._msig = np.zeros((self.n_local, B), dtype=np.float64)
        pos = np.searchsorted(self.local, self._msb_sources)
        hit = pos < self.n_local
        ok = np.where(hit)[0]
        ok = ok[self.local[pos[ok]] == self._msb_sources[ok]]
        self._msd[pos[ok], ok] = 0.0
        self._msig[pos[ok], ok] = 1.0
        self._frontier = np.zeros(self.n_local, dtype=bool)
        self._frontier[pos[ok]] = True
        self._fwd_r = 0
        return int(len(ok))

    def brandes_fwd_step(self, *inbox):
        changed = 0
        if inbox:
            self._fwd_r += 1
            u, packed = self._concat_matrix_msgs(inbox)
            self._frontier = np.zeros(self.n_local, dtype=bool)
            if u is not None:
                starts, mat = packed
                s = np.add.reduceat(mat, starts, axis=0)
                pos = np.searchsorted(self.local, u)
                new = (~np.isfinite(self._msd[pos])) & (s > 0)
                if new.any():
                    self._msd[pos] = np.where(new, float(self._fwd_r),
                                              self._msd[pos])
                    self._msig[pos] = np.where(new, s, self._msig[pos])
                    imp = new.any(axis=1)
                    self._frontier[pos[imp]] = True
                    changed = int(imp.sum())
        rows = np.where(self._msd == float(self._fwd_r), self._msig, 0.0)
        msgs = self._matrix_scatter(self._frontier, rows, np.add, use_dir=0)
        return self._msgs_tuple(msgs) + (changed,)

    def brandes_bwd_init(self, max_dist: int) -> int:
        self._msdelta = np.zeros_like(self._msig)
        self._bwd_r = int(max_dist)
        return self._bwd_r

    def brandes_bwd_step(self, *inbox):
        """One backward level: receivers at dist r-1 fold in
        Σ (1+δ(w))/σ(w) from senders at dist r (column-masked on both
        sides), then the level counter drops and the new level
        scatters. Requires both arcs stored (undirected graph)."""
        if inbox:
            u, packed = self._concat_matrix_msgs(inbox)
            if u is not None:
                starts, mat = packed
                s = np.add.reduceat(mat, starts, axis=0)
                pos = np.searchsorted(self.local, u)
                recv = self._msd[pos] == float(self._bwd_r - 1)
                self._msdelta[pos] += np.where(recv, s * self._msig[pos], 0.0)
            self._bwd_r -= 1
        level = self._msd == float(self._bwd_r)
        vmask = level.any(axis=1)
        sig = np.where(self._msig > 0, self._msig, 1.0)
        rows = np.where(level, (1.0 + self._msdelta) / sig, 0.0)
        # dependency flows to PREDECESSORS: along mirror arcs (dir=1)
        # on a bidi graph; on undirected graphs every arc serves
        msgs = self._matrix_scatter(vmask, rows, np.add, use_dir=1)
        return self._msgs_tuple(msgs) + (0,)

    def brandes_bc_init(self) -> int:
        self._bc = np.zeros(self.n_local, dtype=np.float64)
        return self.n_local

    def brandes_accumulate(self) -> int:
        """Fold this batch's dependencies into the running BC vector
        (δ at the source itself — dist 0 — is excluded, Brandes)."""
        counted = np.isfinite(self._msd) & (self._msd > 0)
        self._bc += np.where(counted, self._msdelta, 0.0).sum(axis=1)
        return self.n_local

    def brandes_bc_table(self, scale: float) -> pa.Table:
        return pa.table({
            "vid": pa.array(self.local, pa.int64()),
            "betweenness": pa.array(self._bc * scale),
        })

    # -------------------------------- APSP lengths (msbfs matrix export)
    def msbfs_lengths_table(self) -> pa.Table:
        """(src, dst, length) rows for every finite entry of the current
        multi-source distance matrix — the Dataset-exposed form of
        apps/apsp/all_pairs_shortest_path_length.h:144."""
        d = self._msd
        finite = np.isfinite(d)
        vi, sj = np.nonzero(finite)
        return pa.table({
            "src": pa.array(self._msb_sources[sj], pa.int64()),
            "dst": pa.array(self.local[vi], pa.int64()),
            "length": pa.array(d[vi, sj].astype(np.int64), pa.int64()),
        })

    def msbfs_row_max_table(self) -> pa.Table:
        """(vid, res) per local vertex: MAX finite distance to the
        current multi-source batch, −1 when unreached by every source —
        the final VertexMap of flash/traversal/random-multi-bfs.h:85-90."""
        d = self._msd
        res = np.where(np.isfinite(d), d, -1.0).max(axis=1)
        return pa.table({
            "vid": pa.array(self.local, pa.int64()),
            "res": pa.array(res.astype(np.int64), pa.int64()),
        })

    def sample_vids(self, n: int, seed: int) -> np.ndarray:
        """The n local vids with smallest splitmix64(vid ^ seed) — a
        deterministic stand-in for random-multi-bfs.h's rand_r source
        pick (partition-invariant: the global min-k of the same hash)."""
        h = splitmix64(self.local.astype(np.uint64) ^ np.uint64(seed))
        idx = np.argsort(h, kind="stable")[:n]
        return self.local[idx]

    def msbfs_free(self) -> int:
        """Release the distance/aux matrices (the pool may be a cached
        session graph — don't leave n_local × B doubles resident)."""
        self._msd = None
        for a in ("_msig", "_msdelta"):
            if hasattr(self, a):
                setattr(self, a, None)
        return 0

    def msbfs_column_sums(self):
        """Per-source partials over local vertices: (Σ finite dist,
        #reached, Σ 1/dist for dist>0) — the closeness/harmonic inputs."""
        d = self._msd
        finite = np.isfinite(d)
        s = np.where(finite, d, 0.0).sum(axis=0)
        r = finite.sum(axis=0)
        with np.errstate(divide="ignore"):
            inv = np.where(finite & (d > 0), 1.0 / np.where(d > 0, d, 1.0), 0.0)
        return s, r.astype(np.int64), inv.sum(axis=0)

    # ------------------------------- SCC (forward-backward max coloring)
    # The FLASH scc family (apps/flash/connectivity/scc*.h) reduces to
    # repeated color/confirm sweeps: propagate color = max vid along
    # FORWARD arcs among unassigned vertices; then from each color root
    # sweep BACKWARD within the color — vertices reached both ways form
    # the root's SCC. Requires a bidi graph (dir-tagged mirror arcs).
    def scc_init(self) -> int:
        self._scc = np.full(self.n_local, -1, dtype=np.int64)  # assigned
        return self.n_local

    def scc_color_init(self) -> int:
        un = self._scc < 0
        self._color = np.where(un, self.local, np.int64(-1))
        self._frontier = un.copy()
        return int(un.sum())

    def scc_color_step(self, *inbox):
        changed = 0
        if inbox:
            dst, val = _concat_msgs(inbox, (np.int64, np.int64))
            self._frontier = np.zeros(self.n_local, dtype=bool)
            if len(dst):
                u, m = _group_reduce(dst, val, np.maximum)
                pos = np.searchsorted(self.local, u)
                ok = (self._scc[pos] < 0) & (m > self._color[pos])
                pos = pos[ok]
                self._color[pos] = m[ok]
                self._frontier[pos] = True
                changed = int(ok.sum())
        mask = self._frontier[self.e_src_pos]
        if self.e_dir is not None:
            mask = mask & (self.e_dir == 0)
        # only color edges between unassigned vertices participate;
        # receivers filter on their own assignment
        msgs = self._emit_per_part(mask, self._color[self.e_src_pos],
                                   np.maximum)
        return self._msgs_tuple(msgs) + (changed,)

    def scc_back_init(self) -> int:
        """Roots (color == own vid, unassigned) start the backward
        sweep confirmed."""
        root = (self._scc < 0) & (self._color == self.local)
        self._inscc = root.copy()
        self._frontier = root.copy()
        return int(root.sum())

    def scc_back_step(self, *inbox):
        changed = 0
        if inbox:
            dst, val = _concat_msgs(inbox, (np.int64, np.int64))
            self._frontier = np.zeros(self.n_local, dtype=bool)
            if len(dst):
                pos = np.searchsorted(self.local, dst)
                # a receiver joins iff ANY received color equals its own
                # — messages must stay RAW: a per-destination combine
                # (e.g. max) would swallow the matching color whenever
                # a root of a LARGER color also reaches the vertex in
                # the same wave (roots of every surviving color sweep
                # simultaneously)
                ok = ((self._scc[pos] < 0) & (~self._inscc[pos])
                      & (self._color[pos] == val))
                pos = np.unique(pos[ok])
                self._inscc[pos] = True
                self._frontier[pos] = True
                changed = int(len(pos))
        mask = self._frontier[self.e_src_pos]
        if self.e_dir is not None:
            mask = mask & (self.e_dir == 1)
        # send my color along REVERSE arcs, uncombined
        msgs = self._emit_per_part_raw(mask, self._color[self.e_src_pos])
        return self._msgs_tuple(msgs) + (changed,)

    def scc_commit(self) -> int:
        """Confirmed vertices take their color as SCC id; the rest stay
        unassigned for the next round."""
        take = (self._scc < 0) & self._inscc
        self._scc[take] = self._color[take]
        return int(take.sum())

    def scc_table(self) -> pa.Table:
        return pa.table({
            "vid": pa.array(self.local, pa.int64()),
            "scc": pa.array(self._scc, pa.int64()),
        })

    # ------------------------------------------------- k-core peeling (BSP)
    # gs::KCore (apps/kcore/kcore.h:130) as degree-decrement rounds on
    # the pool: newly sub-k vertices die and send −1 along their arcs;
    # receivers decrement; fixpoint when nobody dies. Replaces the
    # driver-round-trip peeling (per-round O(V) degree table pulls).
    def kcore_init(self, k: int) -> int:
        self._kc_alive = np.ones(self.n_local, dtype=bool)
        # undirected graphs store both arcs ⇒ out_deg IS the degree
        self._kc_deg = self.out_deg.astype(np.int64).copy()
        self._kc_k = int(k)
        # per-vertex core number, stamped level by level during core
        # decomposition (vertices never in the 1-core stay 0 —
        # networkx core_number semantics for isolated vertices)
        self._kc_core = np.zeros(self.n_local, dtype=np.int64)
        return self.n_local

    def kcore_step(self, *inbox):
        if inbox:
            dst, val = _concat_msgs(inbox, (np.int64, np.int64))
            if len(dst):
                u, s = _group_reduce(dst, val, np.add)
                pos = np.searchsorted(self.local, u)
                self._kc_deg[pos] += s  # s is negative
        newly = self._kc_alive & (self._kc_deg < self._kc_k)
        changed = int(newly.sum())
        self._kc_alive[newly] = False
        mask = newly[self.e_src_pos]
        msgs = self._emit_per_part(
            mask, np.full(self.n_edges, -1, dtype=np.int64), np.add
        )
        return self._msgs_tuple(msgs) + (changed,)

    def kcore_table(self) -> pa.Table:
        return pa.table({
            "vid": pa.array(self.local[self._kc_alive], pa.int64())
        })

    def kcore_stamp_and_raise(self, core_k: int, k_next: int) -> int:
        """Core-decomposition level step: the current survivors are the
        ``core_k``-core (stamp them), then raise the peel threshold.
        Residual degrees carry over — each level peels incrementally
        from the previous one, never from scratch. Returns the alive
        count so the driver knows when the graph is exhausted."""
        self._kc_core[self._kc_alive] = int(core_k)
        self._kc_k = int(k_next)
        return int(self._kc_alive.sum())

    def kcore_decomp_table(self) -> pa.Table:
        return pa.table({
            "vid": pa.array(self.local, pa.int64()),
            "core": pa.array(self._kc_core, pa.int64()),
        })

    # ------------------------------------------- bridges (XOR forest)
    # Scalable restatement of apps/flash/connectivity/bridge.h:44-150.
    # The reference replicates O(V) parent/dis arrays on every worker
    # and walks tree paths with random access (sync_all_=true); here a
    # tree edge (v, parent v) is a bridge iff the XOR of deterministic
    # 64-bit edge hashes over all NON-TREE edges incident to subtree(v)
    # is zero — a non-tree edge fully inside or fully outside the
    # subtree cancels itself, so a zero XOR means no non-tree edge
    # crosses the cut (Monte Carlo, error ≤ 2⁻⁶⁴ per tree edge;
    # deterministic given vids). Subtree XORs ride an O(depth)-round
    # child→parent sweep on the BFS forest from path_step.

    def bridge_roots(self) -> np.ndarray:
        """After the minprop (wcc) fixpoint: local vids that are their
        own component minimum — the BFS forest roots."""
        return self.local[self.state == self.local]

    def bridge_init(self):
        """x_v = XOR of incident non-tree edge hashes: XOR over ALL
        incident arcs, minus the parent edge locally; each child's
        tree-edge hash arrives on the XOR wave and cancels (XOR
        removal = addition). Snapshots integer BFS depths (simple
        graphs assumed — parallel arcs would self-cancel)."""
        self._br_depth = self.state.astype(np.int64) if self.n_local \
            else np.empty(0, np.int64)
        h = _edge_hash(self.local[self.e_src_pos], self.e_dst)
        x = np.zeros(self.n_local, np.int64)
        if len(h):
            u_pos, xs = _group_reduce(
                self.e_src_pos.astype(np.int64), h, np.bitwise_xor)
            x[u_pos] = xs
        hasp = self._parent != -1
        x[hasp] ^= _edge_hash(self.local[hasp], self._parent[hasp])
        self._br_x = x
        mask = self._parent[self.e_src_pos] == self.e_dst
        msgs = self._emit_per_part(mask, h, np.bitwise_xor)
        return self._msgs_tuple(msgs) + (0,)

    def bridge_init_apply(self, *inbox) -> int:
        if inbox:
            dst, val = _concat_msgs(inbox, (np.int64, np.int64))
            if len(dst):
                u, s = _group_reduce(dst, val, np.bitwise_xor)
                self._br_x[np.searchsorted(self.local, u)] ^= s
        self._br_s = self._br_x.copy()
        return int(self._br_depth.max()) if self.n_local else 0

    def bridge_sweep(self, t: int, *inbox):
        """Apply subtree XORs from depth-(t+1) children, then emit
        depth-t accumulators along the parent arc."""
        if inbox:
            dst, val = _concat_msgs(inbox, (np.int64, np.int64))
            if len(dst):
                u, s = _group_reduce(dst, val, np.bitwise_xor)
                self._br_s[np.searchsorted(self.local, u)] ^= s
        mask = (self._br_depth[self.e_src_pos] == t) & \
            (self._parent[self.e_src_pos] == self.e_dst)
        vals = self._br_s[self.e_src_pos]
        msgs = self._emit_per_part(mask, vals, np.bitwise_xor)
        return self._msgs_tuple(msgs) + (0,)

    def bridge_table(self) -> pa.Table:
        br = (self._parent != -1) & (self._br_s == 0)
        a, b = self.local[br], self._parent[br]
        return pa.table({
            "u": pa.array(np.minimum(a, b), pa.int64()),
            "v": pa.array(np.maximum(a, b), pa.int64()),
        })

    # ----------------------------------- greedy graph coloring
    # apps/flash/clustering/color.h:43-82: every round each vertex
    # takes the mex (minimum excluded value) of its higher-(deg, vid)
    # neighbors' colors; fixpoint when nothing changes. Colors ride a
    # raw per-round wave along the higher→lower arcs only (the same
    # O(E) the reference's dense pull walks); orientation flags are
    # fixed once by a degree-exchange wave. Simple graphs (deduped
    # arcs) assumed — the setup merge pairs each arc with its mirror.

    def color_init(self):
        """Scatter-only: ship degrees along all arcs (raw)."""
        self._cl_c = np.zeros(self.n_local, np.int64)
        sp = self.e_src_pos
        msgs = self._emit_per_part_raw(
            np.ones(self.n_edges, dtype=bool),
            self.out_deg.astype(np.int64)[sp],
            self.local[sp].astype(np.int64))
        return self._msgs_tuple(msgs) + (0,)

    def color_setup(self, *inbox) -> int:
        """Pair each out-arc with its mirror's degree info; store the
        sender-is-higher orientation flags."""
        import pandas as pd

        dst, deg_nb, nb = _concat_msgs(inbox, (np.int64, np.int64, np.int64))
        arcs = pd.DataFrame({
            "i": np.arange(self.n_edges, dtype=np.int64),
            "p": self.e_src_pos.astype(np.int64),
            "c": self.e_dst,
        })
        recv = pd.DataFrame({
            "p": np.searchsorted(self.local, dst) if len(dst) else
            np.empty(0, np.int64),
            "c": nb, "dnb": deg_nb})
        m = arcs.merge(recv, on=["p", "c"], how="left").sort_values("i")
        dnb = m["dnb"].to_numpy(np.float64)
        ds_ = self.out_deg.astype(np.int64)[self.e_src_pos]
        vs = self.local[self.e_src_pos]
        self._cl_higher = (ds_ > dnb) | \
            ((ds_ == dnb) & (vs > self.e_dst))
        return int(self._cl_higher.sum())

    def color_round(self, *inbox):
        """Apply mex of received higher-neighbor colors, commit
        changes, re-emit committed colors along higher arcs."""
        changed = 0
        if inbox:
            dst, col = _concat_msgs(inbox, (np.int64, np.int64))
            cc = np.zeros(self.n_local, np.int64)
            if len(dst):
                pos = np.searchsorted(self.local, dst)
                order = np.lexsort((col, pos))
                pos, col = pos[order], col[order]
                keep = np.concatenate(
                    ([True], (pos[1:] != pos[:-1]) | (col[1:] != col[:-1])))
                pos, col = pos[keep], col[keep]
                starts = np.flatnonzero(
                    np.concatenate(([True], pos[1:] != pos[:-1])))
                rank = np.arange(len(pos), dtype=np.int64) - \
                    np.repeat(starts, np.diff(np.append(starts, len(pos))))
                big = np.int64(1) << 62
                cand = np.where(col != rank, rank, big)
                mex = np.minimum.reduceat(cand, starts)
                seg_len = np.diff(np.append(starts, len(pos)))
                mex = np.where(mex == big, seg_len, mex)
                upos = pos[starts]
                cc[upos] = mex
            diff = cc != self._cl_c
            changed = int(diff.sum())
            self._cl_c = cc
        msgs = self._emit_per_part_raw(
            self._cl_higher, self._cl_c[self.e_src_pos])
        return self._msgs_tuple(msgs) + (changed,)

    def color_table(self) -> pa.Table:
        return pa.table({
            "vid": pa.array(self.local, pa.int64()),
            "color": pa.array(self._cl_c, pa.int64()),
        })

    # --------------------------------------- LPA by coloring
    # apps/flash/clustering/lpa-by-color.h: label propagation scheduled
    # color class by color class (Gauss-Seidel) — a class is an
    # independent set, so applying it synchronously while every other
    # class stays fixed equals the reference's sequential sweep and
    # kills sync-LPA's two-cycle oscillation. Requires the greedy
    # coloring's `_cl_c` (run color_init/setup/round first).
    def lpabc_setup_scatter(self):
        """Ship (dst, source color, source vid) along all arcs — the
        mirror-attribute exchange that tells each arc's OWNER the color
        of the arc's destination (the mirror arc's source)."""
        sp = self.e_src_pos
        msgs = self._emit_per_part_raw(
            np.ones(self.n_edges, dtype=bool),
            self._cl_c[sp],
            self.local[sp].astype(np.int64))
        return self._msgs_tuple(msgs) + (0,)

    def lpabc_setup(self, *inbox) -> int:
        """Pair each out-arc (u→v) with its mirror's message (v's color)
        — same merge shape as color_setup — so per-class scatters can
        mask arcs by destination color at the SOURCE (each arc ships
        once per full round, not once per color wave). Labels init to
        vid. Returns the max local color (wave count - 1)."""
        import pandas as pd

        dst, col_nb, nb = _concat_msgs(inbox, (np.int64, np.int64, np.int64))
        arcs = pd.DataFrame({
            "i": np.arange(self.n_edges, dtype=np.int64),
            "p": self.e_src_pos.astype(np.int64),
            "c": self.e_dst,
        })
        recv = pd.DataFrame({
            "p": np.searchsorted(self.local, dst) if len(dst) else
            np.empty(0, np.int64),
            "c": nb, "colnb": col_nb})
        m = arcs.merge(recv, on=["p", "c"], how="left").sort_values("i")
        self._lpabc_dst_color = m["colnb"].to_numpy(np.int64)
        self.state = self.local.copy()
        return int(self._cl_c.max()) if self.n_local else -1

    def lpabc_scatter(self, c: int):
        """cdlp-style pre-counted (dst, label, count) partials, only
        along arcs whose destination is in color class ``c``."""
        mask = self._lpabc_dst_color == c
        labels = self.state[self.e_src_pos]
        out = []
        for d in range(self.P):
            lo, hi = self.part_bounds[d], self.part_bounds[d + 1]
            seg = mask[lo:hi]
            dsts, labs = self.e_dst[lo:hi][seg], labels[lo:hi][seg]
            if len(dsts) == 0:
                out.append(None)
                continue
            order = np.lexsort((labs, dsts))
            dsts, labs = dsts[order], labs[order]
            newseg = np.concatenate(
                ([True], (dsts[1:] != dsts[:-1]) | (labs[1:] != labs[:-1]))
            )
            starts = np.flatnonzero(newseg)
            counts = np.diff(np.append(starts, len(dsts))).astype(np.int64)
            out.append((dsts[starts], labs[starts], counts))
        return out if self.P > 1 else out[0]

    def lpabc_step(self, scatter_color: int, *inbox):
        """Fused wave: apply the previous class's labels (messages only
        ever target that class — masked at the source), scatter the
        next class's. Deterministic min-label tie-break like cdlp (the
        reference's first-seen tie-break is CSR-order-dependent)."""
        changed = self.cdlp_apply(*inbox) if inbox else 0
        return self._msgs_tuple(self.lpabc_scatter(scatter_color)) \
            + (changed,)

    # --------------------------------------- fluid communities
    # apps/flash/clustering/fluid-community.h:43-105: k seed vertices
    # start one community each; every round a vertex adopts the
    # community with max density Σ 1/|community| over itself + its
    # neighbors (strictly-greater ε=1e-10 replacement scanning labels
    # in order, exactly the reference's loop), until labels stop
    # changing (2-cycle oscillators excluded via the l1/l2 shift
    # registers) or 100 rounds. The reference seeds with rand(time) —
    # here seeds are deterministic (min splitmix64(vid)); community
    # sizes are a tiny O(k) allreduce; labels ride a raw per-round
    # wave like graph coloring.

    def fluid_seed_candidates(self, k: int):
        """Local k smallest (splitmix64(vid), vid) pairs."""
        if not self.n_local:
            return np.empty(0, np.uint64), np.empty(0, np.int64)
        h = splitmix64(self.local.astype(np.uint64))
        idx = np.argsort(h, kind="stable")[:k]
        return h[idx], self.local[idx]

    def fluid_init(self, seeds: np.ndarray):
        """lab = seed index (sorted-seed order) or -1; returns this
        shard's per-community counts."""
        s = len(seeds)
        self._fl_lab = np.full(self.n_local, -1, np.int64)
        pos = np.searchsorted(self.local, seeds)
        ok = (pos < self.n_local)
        safe = np.minimum(pos, max(0, self.n_local - 1))
        ok &= self.local[safe] == seeds if self.n_local else False
        self._fl_lab[pos[ok]] = np.flatnonzero(ok)
        self._fl_l1 = np.full(self.n_local, -2, np.int64)
        self._fl_l2 = np.full(self.n_local, -2, np.int64)
        self._fl_s = s
        cnt = np.bincount(self._fl_lab[self._fl_lab >= 0], minlength=s)
        return cnt.astype(np.int64)

    def fluid_scatter(self):
        """Round-0 label wave from the seeds."""
        mask = (self._fl_lab >= 0)[self.e_src_pos]
        msgs = self._emit_per_part_raw(
            mask, self._fl_lab[self.e_src_pos])
        return self._msgs_tuple(msgs) + ((np.zeros(self._fl_s, np.int64), 0),)

    def fluid_round(self, cnt: np.ndarray, *inbox):
        """One synchronized density-update round; scalar = (count
        delta vector, #still-moving)."""
        s = self._fl_s
        inv = np.zeros(s, np.float64)
        nz = cnt > 0
        inv[nz] = 1.0 / cnt[nz]
        d = np.zeros((self.n_local, s), np.float64)
        if inbox:
            dst, lab = _concat_msgs(inbox, (np.int64, np.int64))
            if len(dst):
                pos = np.searchsorted(self.local, dst)
                flat = pos * s + lab
                counts = np.bincount(flat, minlength=self.n_local * s)
                d += counts.reshape(self.n_local, s) * inv
        own = self._fl_lab >= 0
        d[np.flatnonzero(own), self._fl_lab[own]] += inv[self._fl_lab[own]]
        old = self._fl_lab.copy()
        # l1/l2 shift registers (oscillation detection)
        self._fl_l2 = np.where(own, self._fl_l1, self._fl_l2)
        self._fl_l1 = np.where(own, self._fl_lab, self._fl_l1)
        cur = self._fl_lab.copy()
        curd = np.where(own, d[np.arange(self.n_local),
                               np.maximum(cur, 0)], 0.0)
        for i in range(s):
            di = d[:, i]
            better = (di > 1e-10) & ((cur == -1) | (di > curd + 1e-10))
            cur[better] = i
            curd[better] = di[better]
        self._fl_lab = cur
        delta = np.bincount(cur[cur >= 0], minlength=s).astype(np.int64) - \
            np.bincount(old[old >= 0], minlength=s).astype(np.int64)
        moving = int(((cur != old) & (cur != self._fl_l2)).sum())
        mask = (cur >= 0)[self.e_src_pos]
        msgs = self._emit_per_part_raw(mask, cur[self.e_src_pos])
        return self._msgs_tuple(msgs) + ((delta, moving),)

    def fluid_table(self) -> pa.Table:
        return pa.table({
            "vid": pa.array(self.local, pa.int64()),
            "community": pa.array(self._fl_lab, pa.int64()),
        })

    # ----------------------- Tarjan–Vishkin biconnectivity (BCC)
    # Scalable restatement of apps/flash/connectivity/{bcc,bcc-2,
    # cut-point,cut-point-2}.h, which replicate an O(V) union-find on
    # every worker and walk tree paths per non-tree edge. Here the
    # classic Tarjan–Vishkin reduction runs on the deterministic BFS
    # forest (any rooted spanning tree works): subtree sizes → preorder
    # intervals → low/high (min/max preorder reachable from each
    # subtree via non-tree edges) → an auxiliary graph on TREE EDGES
    # (identified by their child vertex) whose connected components
    # are the biconnected components:
    #   rule A: non-tree edge {v,w}, neither an ancestor of the other
    #           (disjoint preorder intervals) → aux edge {v, w};
    #   rule B: tree edge (p(w), w) with p(w) non-root → aux edge
    #           {w, p(w)} iff low(w) < pre(p(w)) or
    #           high(w) ≥ pre(p(w)) + size(p(w)).
    # Per-vertex BCC labels are then the aux-graph WCC of each child
    # vertex = the BCC of its parent edge. All sweeps are O(depth)
    # rounds; the one O(E) wave ships (pre, size, tree-flag, sender)
    # raw along every arc. Preorders are per-component (roots start at
    # 0); intervals are only ever compared within a component.

    def tv_init(self) -> int:
        """Snapshot integer BFS depths, unit subtree sizes."""
        self._tv_depth = self.state.astype(np.int64) if self.n_local \
            else np.empty(0, np.int64)
        self._tv_size = np.ones(self.n_local, np.int64)
        return int(self._tv_depth.max()) if self.n_local else 0

    def tv_size_sweep(self, t: int, *inbox):
        """Child→parent subtree-size accumulation, one depth per wave."""
        if inbox:
            dst, val = _concat_msgs(inbox, (np.int64, np.int64))
            if len(dst):
                u, s = _group_reduce(dst, val, np.add)
                self._tv_size[np.searchsorted(self.local, u)] += s
        mask = (self._tv_depth[self.e_src_pos] == t) & \
            (self._parent[self.e_src_pos] == self.e_dst)
        msgs = self._emit_per_part(mask, self._tv_size[self.e_src_pos],
                                   np.add)
        return self._msgs_tuple(msgs) + (0,)

    def tv_children_scatter(self):
        """Raw (parent ← child, size) — the parent shard needs its
        sorted children to hand out preorder offsets."""
        mask = self._parent[self.e_src_pos] == self.e_dst
        return self._emit_per_part_raw(
            mask, self.local[self.e_src_pos].astype(np.int64),
            self._tv_size[self.e_src_pos])

    def tv_children_apply(self, *inbox) -> int:
        """Store per-parent child offsets (preorder = parent pre + 1 +
        Σ sizes of smaller-vid siblings) and per-arc tree flags."""
        dst, child, size = _concat_msgs(
            inbox, (np.int64, np.int64, np.int64))
        ppos = np.searchsorted(self.local, dst) if len(dst) else \
            np.empty(0, np.int64)
        order = np.lexsort((child, ppos))
        ppos, child, size = ppos[order], child[order], size[order]
        # exclusive segmented cumsum of sizes per parent
        csum = np.cumsum(size) - size
        if len(ppos):
            seg0 = np.concatenate(([True], ppos[1:] != ppos[:-1]))
            base = np.where(seg0, csum, 0)
            np.maximum.accumulate(base, out=base)
            off = 1 + csum - base
        else:
            off = csum
        # arc-aligned: child-arc offsets (+ tree flags) via a C-speed
        # merge on (src_pos, dst vid)
        import pandas as pd
        arcs = pd.DataFrame({
            "i": np.arange(self.n_edges, dtype=np.int64),
            "p": self.e_src_pos.astype(np.int64),
            "c": self.e_dst,
        })
        pairs = pd.DataFrame({"p": ppos, "c": child, "off": off})
        m = arcs.merge(pairs, on=["p", "c"], how="left")
        m = m.sort_values("i")
        offs = m["off"].to_numpy()
        is_child = ~np.isnan(offs)
        self._tv_arc_off = np.where(is_child, offs, 0).astype(np.int64)
        self._tv_arc_tree = is_child | \
            (self._parent[self.e_src_pos] == self.e_dst)
        # preorder state: roots start each component at 0
        self._tv_pre = np.full(self.n_local, -1, np.int64)
        roots = self._parent == -1
        self._tv_pre[roots] = 0
        self._tv_ppre = np.full(self.n_local, -1, np.int64)
        self._tv_psz = np.zeros(self.n_local, np.int64)
        return int(len(dst))

    def tv_pre_level(self, t: int, *inbox):
        """Apply preorder assignments (base, parent pre, parent size)
        to depth-(t) vertices, then hand bases to depth-(t+1)."""
        if inbox:
            dst, base, ppre, psz = _concat_msgs(
                inbox, (np.int64, np.int64, np.int64, np.int64))
            if len(dst):
                pos = np.searchsorted(self.local, dst)
                self._tv_pre[pos] = base
                self._tv_ppre[pos] = ppre
                self._tv_psz[pos] = psz
        mask = (self._tv_depth[self.e_src_pos] == t) & self._tv_arc_tree & \
            (self._parent[self.e_src_pos] != self.e_dst)
        sp = self.e_src_pos
        base = self._tv_pre[sp] + self._tv_arc_off
        msgs = self._emit_per_part_raw(
            mask, base, self._tv_pre[sp], self._tv_size[sp])
        return self._msgs_tuple(msgs) + (0,)

    def tv_base_scatter(self):
        """The one O(E) raw wave: (pre, size, tree-flag, sender vid)
        along every arc."""
        sp = self.e_src_pos
        msgs = self._emit_per_part_raw(
            np.ones(self.n_edges, dtype=bool),
            self._tv_pre[sp], self._tv_size[sp],
            self._tv_arc_tree.astype(np.int64),
            self.local[sp].astype(np.int64))
        return self._msgs_tuple(msgs) + (0,)

    def tv_base_apply(self, *inbox) -> int:
        """Non-tree neighbor preorder extrema (low/high seeds), rule-A
        aux pairs, and the non-tree edge-labeling rows."""
        dst, pre_u, sz_u, tree, sender = _concat_msgs(
            inbox, (np.int64, np.int64, np.int64, np.int64, np.int64))
        self._tv_low = self._tv_pre.copy()
        self._tv_high = self._tv_pre.copy()
        aux_a = aux_b = np.empty(0, np.int64)
        eu = ev = ekey = np.empty(0, np.int64)
        nt = tree == 0
        if nt.any():
            d_nt, pu_nt, su_nt, snd = (dst[nt], pre_u[nt], sz_u[nt],
                                       sender[nt])
            pos = np.searchsorted(self.local, d_nt)
            u, mn = _group_reduce(pos, pu_nt, np.minimum)
            self._tv_low[u] = np.minimum(self._tv_low[u], mn)
            u, mx = _group_reduce(pos, pu_nt, np.maximum)
            self._tv_high[u] = np.maximum(self._tv_high[u], mx)
            d_pre = self._tv_pre[pos]
            d_sz = self._tv_size[pos]
            u_anc = (pu_nt <= d_pre) & (d_pre < pu_nt + su_nt)
            d_anc = (d_pre <= pu_nt) & (pu_nt < d_pre + d_sz)
            unrel = ~u_anc & ~d_anc
            if unrel.any():
                aux_a = d_nt[unrel]
                aux_b = snd[unrel]
            # edge-label rows: exactly one side emits each non-tree
            # edge — the descendant under an ancestor, else the
            # smaller-preorder side (labels agree via rule A)
            emit = u_anc | (unrel & (d_pre < pu_nt))
            if emit.any():
                a, b = d_nt[emit], snd[emit]
                eu, ev = np.minimum(a, b), np.maximum(a, b)
                ekey = d_nt[emit]
        self._tv_auxA = (aux_a, aux_b)
        self._tv_enontree = (eu, ev, ekey)
        return int(nt.sum())

    def tv_lohi_sweep(self, t: int, *inbox):
        """Child→parent low/high accumulation (raw two-column)."""
        if inbox:
            dst, lo, hi = _concat_msgs(inbox, (np.int64, np.int64, np.int64))
            if len(dst):
                pos = np.searchsorted(self.local, dst)
                u, mn = _group_reduce(pos, lo, np.minimum)
                self._tv_low[u] = np.minimum(self._tv_low[u], mn)
                u, mx = _group_reduce(pos, hi, np.maximum)
                self._tv_high[u] = np.maximum(self._tv_high[u], mx)
        mask = (self._tv_depth[self.e_src_pos] == t) & \
            (self._parent[self.e_src_pos] == self.e_dst)
        sp = self.e_src_pos
        msgs = self._emit_per_part_raw(
            mask, self._tv_low[sp], self._tv_high[sp])
        return self._msgs_tuple(msgs) + (0,)

    def tv_aux_table(self) -> pa.Table:
        """Aux-graph edges: rule A (stored) + rule B (local check)."""
        w = (self._parent != -1) & (self._tv_depth >= 2)
        escape = (self._tv_low < self._tv_ppre) | \
            (self._tv_high >= self._tv_ppre + self._tv_psz)
        sel = w & escape
        a = np.concatenate([self.local[sel], self._tv_auxA[0]])
        b = np.concatenate([self._parent[sel], self._tv_auxA[1]])
        return pa.table({"src": pa.array(a, pa.int64()),
                         "dst": pa.array(b, pa.int64())})

    def tv_nonroot_table(self) -> pa.Table:
        return pa.table({
            "vid": pa.array(self.local[self._parent != -1], pa.int64())})

    def tv_edge_rows(self) -> pa.Table:
        """Per-edge labeling rows (u, v, key): tree edges keyed by
        their child; non-tree edges keyed by the side chosen in
        tv_base_apply."""
        ch = self._parent != -1
        a, b = self.local[ch], self._parent[ch]
        eu, ev, ekey = self._tv_enontree
        return pa.table({
            "u": pa.array(np.concatenate([np.minimum(a, b), eu]), pa.int64()),
            "v": pa.array(np.concatenate([np.maximum(a, b), ev]), pa.int64()),
            "key": pa.array(np.concatenate([self.local[ch], ekey]),
                            pa.int64()),
        })

    def tv_incidence_rows(self) -> pa.Table:
        """(vertex, key) rows: each non-root w touches its own parent
        edge at both endpoints — vertex-incident BCC sets for the
        articulation test."""
        ch = self._parent != -1
        w = self.local[ch]
        p = self._parent[ch]
        return pa.table({
            "vertex": pa.array(np.concatenate([w, p]), pa.int64()),
            "key": pa.array(np.concatenate([w, w]), pa.int64()),
        })

    # ------------------------------- FLASH core-ordering family
    # Onion-layer and degeneracy orderings (apps/flash/core/
    # onion-layer-ordering.h:44-100, degeneracy-ordering.h:43-110):
    # ranking peels on top of the core numbers stamped by
    # core_decomposition (self._kc_core). Onion's initial residual
    # (#neighbors with core ≥ mine) and its same-core decrement checks
    # compare BOTH endpoint cores, so those waves ship raw (dst,
    # sender-core) pairs — one O(E) exchange at init, then frontier-
    # sized rounds.

    def kc_core_max(self) -> int:
        return int(self._kc_core.max()) if self.n_local else 0

    def onion_init(self):
        """Scatter-only: every vertex ships its core along its arcs
        (raw — the receiver compares against its own core)."""
        self._on_rank = np.full(self.n_local, -1, np.int64)
        self._on_d = np.zeros(self.n_local, np.int64)
        vals = self._kc_core[self.e_src_pos]
        mask = np.ones(self.n_edges, dtype=bool)
        msgs = self._emit_per_part_raw(mask, vals)
        return self._msgs_tuple(msgs) + (0,)

    def onion_round(self, i: int, first: bool, *inbox):
        """Apply (init residuals, or same-core decrements from the
        newly ranked), rank vertices with d ≤ core at layer ``i``, and
        scatter their cores raw for the next decrement wave."""
        if inbox:
            dst, val = _concat_msgs(inbox, (np.int64, np.int64))
            if len(dst):
                pos = np.searchsorted(self.local, dst)
                if first:
                    hit = val >= self._kc_core[pos]
                    np.add.at(self._on_d, pos[hit], 1)
                else:
                    hit = (val == self._kc_core[pos]) & \
                        (self._on_rank[pos] == -1)
                    np.add.at(self._on_d, pos[hit], -1)
        sel = (self._on_rank == -1) & (self._on_d <= self._kc_core)
        self._on_rank[sel] = int(i)
        mask = sel[self.e_src_pos]
        vals = self._kc_core[self.e_src_pos]
        msgs = self._emit_per_part_raw(mask, vals)
        return self._msgs_tuple(msgs) + (int(sel.sum()),)

    def onion_table(self) -> pa.Table:
        return pa.table({
            "vid": pa.array(self.local, pa.int64()),
            "core": pa.array(self._kc_core, pa.int64()),
            "layer": pa.array(self._on_rank, pa.int64()),
        })

    def degen_init(self, dg: int) -> int:
        self._dg_rank = np.full(self.n_local, -1, np.int64)
        self._dg_d = self.out_deg.astype(np.int64).copy()
        self._dg = int(dg)
        return self.n_local

    def degen_round(self, i: int, *inbox):
        """Apply degree decrements (receivers still unranked), rank
        vertices with residual degree ≤ degeneracy at wave ``i``, and
        scatter −1s from the newly ranked."""
        if inbox:
            dst, val = _concat_msgs(inbox, (np.int64, np.int64))
            if len(dst):
                u, s = _group_reduce(dst, val, np.add)
                pos = np.searchsorted(self.local, u)
                upd = self._dg_rank[pos] == -1
                self._dg_d[pos[upd]] -= s[upd]
        sel = (self._dg_rank == -1) & (self._dg_d <= self._dg)
        self._dg_rank[sel] = int(i)
        mask = sel[self.e_src_pos]
        vals = np.ones(self.n_edges, dtype=np.int64)
        msgs = self._emit_per_part(mask, vals, np.add)
        return self._msgs_tuple(msgs) + (int(sel.sum()),)

    def degen_table(self) -> pa.Table:
        return pa.table({
            "vid": pa.array(self.local, pa.int64()),
            "rank": pa.array(self._dg_rank, pa.int64()),
        })

    # ----------------------------------------- FLASH matching family
    # BSP restatements of the reference's round-based greedy matching
    # apps (apps/flash/matching/{mm,min-cover-greedy,min-dominating-set,
    # min-edge-cover}.h). Lexicographic (degree, vid) comparisons ride
    # TWO-column messages combined by a sort-based segment reduce (the
    # _path_emit shape) — exact for arbitrary signed 64-bit vids
    # (hashed string-node ids) and unbounded degrees, where a packed
    # single-int64 key would overflow. Handshake checks ("did MY
    # proposal target propose back to me?") are membership tests no
    # associative combiner expresses — those waves ship RAW
    # (dst, sender) pairs, masked to one edge per proposer, so raw
    # volume is O(frontier), not O(E).

    def max_vid(self) -> int:
        return int(self.local.max()) if self.n_local else -1

    def _emit_per_part_lex(self, edge_mask, hi, lo, biggest=True):
        """Per-destination lexicographic (hi, lo) max/min combine."""
        out = []
        for d in range(self.P):
            b0, b1 = self.part_bounds[d], self.part_bounds[d + 1]
            m = edge_mask[b0:b1]
            if not m.any():
                out.append(None)
                continue
            dsts = self.e_dst[b0:b1][m]
            h, l = hi[b0:b1][m], lo[b0:b1][m]
            out.append(_lex_reduce(dsts, h, l, biggest))
        return out if self.P > 1 else out[0]

    def _emit_per_part_raw(self, edge_mask, *value_cols):
        """Per-destination-shard (dst, col1[, col2, …]) tuples WITHOUT
        combining — aligned payload columns for receiver-side logic."""
        out = []
        for d in range(self.P):
            lo, hi = self.part_bounds[d], self.part_bounds[d + 1]
            m = edge_mask[lo:hi]
            if not m.any():
                out.append(None)
                continue
            out.append((self.e_dst[lo:hi][m],)
                       + tuple(c[lo:hi][m] for c in value_cols))
        return out if self.P > 1 else out[0]

    # --- maximal matching (mm.h:44-77): unmatched vertices propose to
    # their max-id active neighbor; mutual proposals match; repeat.
    def mm_init(self) -> int:
        self._mm_s = np.full(self.n_local, -1, np.int64)   # partner
        self._mm_p = np.full(self.n_local, -1, np.int64)   # proposal
        self._mm_matched = np.zeros(self.n_local, dtype=bool)
        self._mm_active = np.ones(self.n_local, dtype=bool)
        return self.n_local

    def mm_step_a(self, *inbox):
        """Apply handshake responses (mutual ⇒ matched), then advertise
        this round's active unmatched ids (mm.h update1 scatter)."""
        if inbox:
            dst, val = _concat_msgs(inbox, (np.int64, np.int64))
            if len(dst):
                u, s = _group_reduce(dst, val, np.maximum)
                pos = np.searchsorted(self.local, u)
                # m_v == p_v  ⇔  my proposal target proposed back to me
                # (every responder is an active neighbor, and p_v is
                # the max active-neighbor id, so responses never exceed
                # p_v — equality is exactly mutuality, mm.h check2)
                ok = self._mm_active[pos] & (self._mm_p[pos] == s)
                pos = pos[ok]
                self._mm_s[pos] = self._mm_p[pos]
                self._mm_matched[pos] = True
        self._mm_active &= ~self._mm_matched
        self._mm_p[self._mm_active] = -1
        mask = self._mm_active[self.e_src_pos]
        vals = self.local[self.e_src_pos].astype(np.int64)
        msgs = self._emit_per_part(mask, vals, np.maximum)
        return self._msgs_tuple(msgs) + (int(self._mm_active.sum()),)

    def mm_step_b(self, *inbox):
        """Apply proposals p = max active-neighbor id (targets heard
        from ≥1 active neighbor stay active — EdgeMapDense's updated
        set), then respond along the proposal edge only."""
        got = np.zeros(self.n_local, dtype=bool)
        if inbox:
            dst, val = _concat_msgs(inbox, (np.int64, np.int64))
            if len(dst):
                u, s = _group_reduce(dst, val, np.maximum)
                pos = np.searchsorted(self.local, u)
                upd = self._mm_active[pos]
                pos = pos[upd]
                self._mm_p[pos] = s[upd]
                got[pos] = True
        self._mm_active &= got
        mask = self._mm_active[self.e_src_pos] & \
            (self._mm_p[self.e_src_pos] == self.e_dst)
        vals = self.local[self.e_src_pos].astype(np.int64)
        msgs = self._emit_per_part(mask, vals, np.maximum)
        return self._msgs_tuple(msgs) + (int(self._mm_active.sum()),)

    def mm_table(self) -> pa.Table:
        mate = np.where(self._mm_matched, self._mm_s, -1)
        return pa.table({
            "vid": pa.array(self.local, pa.int64()),
            "mate": pa.array(mate, pa.int64()),
            "matched": pa.array(self._mm_matched),
        })

    # --- greedy min vertex cover (min-cover-greedy.h:43-86): a vertex
    # joins the cover when no uncovered neighbor beats its (residual
    # degree, vid); selected vertices decrement neighbors' residuals.
    def mc_init(self) -> int:
        self._mc_c = np.zeros(self.n_local, dtype=bool)
        self._mc_d = self.out_deg.astype(np.int64).copy()
        return self.n_local

    def mc_step_a(self, *inbox):
        """Apply residual-degree decrements from the newly selected,
        then broadcast (d, vid) beat keys from live vertices."""
        if inbox:
            dst, val = _concat_msgs(inbox, (np.int64, np.int64))
            if len(dst):
                u, s = _group_reduce(dst, val, np.add)
                pos = np.searchsorted(self.local, u)
                upd = ~self._mc_c[pos]
                self._mc_d[pos[upd]] -= s[upd]
        active = ~self._mc_c & (self._mc_d > 0)
        mask = active[self.e_src_pos]
        msgs = self._emit_per_part_lex(
            mask, self._mc_d[self.e_src_pos],
            self.local[self.e_src_pos].astype(np.int64))
        return self._msgs_tuple(msgs) + (int(active.sum()),)

    def mc_step_b(self, *inbox):
        """Select local (d, vid)-maxima into the cover (filter1), then
        scatter +1 decrements from the selected."""
        beaten = np.zeros(self.n_local, dtype=bool)
        if inbox:
            dst, bh, bl = _concat_msgs(inbox, (np.int64, np.int64, np.int64))
            if len(dst):
                u, h, l = _lex_reduce(dst, bh, bl)
                pos = np.searchsorted(self.local, u)
                beaten[pos] = (h > self._mc_d[pos]) | \
                    ((h == self._mc_d[pos]) & (l > self.local[pos]))
        active = ~self._mc_c & (self._mc_d > 0)
        sel = active & ~beaten
        self._mc_c |= sel
        mask = sel[self.e_src_pos]
        vals = np.ones(self.n_edges, dtype=np.int64)
        msgs = self._emit_per_part(mask, vals, np.add)
        return self._msgs_tuple(msgs) + (int(sel.sum()),)

    def mc_table(self) -> pa.Table:
        return pa.table({
            "vid": pa.array(self.local, pa.int64()),
            "in_cover": pa.array(self._mc_c),
        })

    # --- greedy min dominating set (min-dominating-set.h:46-95): each
    # round every undominated vertex takes the 2-hop max of
    # (undominated-neighbor count, vid); local winners join the set and
    # dominate their neighborhoods.
    def mds_init(self) -> int:
        self._mds_dom = np.zeros(self.n_local, dtype=bool)   # v.d
        self._mds_in = np.zeros(self.n_local, dtype=bool)    # v.b
        self._mds_cnt = self.out_deg.astype(np.int64).copy()  # v.max_cnt
        self._mds_mid = self.local.copy()                     # v.max_id
        return self.n_local

    def _mds_apply_max(self, inbox):
        if inbox:
            dst, mh, ml = _concat_msgs(inbox, (np.int64, np.int64, np.int64))
            if len(dst):
                u, h, l = _lex_reduce(dst, mh, ml)
                pos = np.searchsorted(self.local, u)
                upd = ~self._mds_dom[pos] & (
                    (h > self._mds_cnt[pos]) |
                    ((h == self._mds_cnt[pos]) & (l > self._mds_mid[pos])))
                pos = pos[upd]
                self._mds_cnt[pos] = h[upd]
                self._mds_mid[pos] = l[upd]

    def _mds_scatter_packed(self):
        mask = (~self._mds_dom)[self.e_src_pos]
        return self._emit_per_part_lex(
            mask, self._mds_cnt[self.e_src_pos],
            self._mds_mid[self.e_src_pos])

    def mds_step_a(self, *inbox):
        """Apply the recount (undominated-neighbor totals → max_cnt,
        reset max_id=id — local2), then scatter hop-1 packed maxima."""
        if inbox:
            dst, val = _concat_msgs(inbox, (np.int64, np.int64))
            counts = np.zeros(self.n_local, dtype=np.int64)
            if len(dst):
                u, s = _group_reduce(dst, val, np.add)
                counts[np.searchsorted(self.local, u)] = s
            live = ~self._mds_dom
            self._mds_cnt[live] = counts[live]
            self._mds_mid[live] = self.local[live]
        msgs = self._mds_scatter_packed()
        n_live = int((~self._mds_dom).sum())
        return self._msgs_tuple(msgs) + (n_live,)

    def mds_step_b(self, *inbox):
        """Hop-1 max apply + hop-2 scatter."""
        self._mds_apply_max(inbox)
        msgs = self._mds_scatter_packed()
        return self._msgs_tuple(msgs) + (0,)

    def mds_step_c(self, *inbox):
        """Hop-2 max apply; local winners (max_id == id) join the set
        and become dominated; scatter domination marks."""
        self._mds_apply_max(inbox)
        sel = ~self._mds_dom & (self._mds_mid == self.local)
        self._mds_in |= sel
        self._mds_dom |= sel
        mask = sel[self.e_src_pos]
        vals = np.ones(self.n_edges, dtype=np.int64)
        msgs = self._emit_per_part(mask, vals, np.maximum)
        return self._msgs_tuple(msgs) + (int(sel.sum()),)

    def mds_step_d(self, *inbox):
        """Apply domination marks, then scatter the recount wave (+1
        from every still-undominated vertex)."""
        if inbox:
            dst, val = _concat_msgs(inbox, (np.int64, np.int64))
            if len(dst):
                u, _ = _group_reduce(dst, val, np.maximum)
                self._mds_dom[np.searchsorted(self.local, u)] = True
        mask = (~self._mds_dom)[self.e_src_pos]
        vals = np.ones(self.n_edges, dtype=np.int64)
        msgs = self._emit_per_part(mask, vals, np.add)
        return self._msgs_tuple(msgs) + (int((~self._mds_dom).sum()),)

    def mds_table(self) -> pa.Table:
        return pa.table({
            "vid": pa.array(self.local, pa.int64()),
            "in_set": pa.array(self._mds_in),
        })

    # --- greedy min edge cover (min-edge-cover.h:44-93): unmatched
    # vertices propose to their min-(initial degree, vid) unmatched
    # neighbor; mutual proposals match; proposals whose target just
    # matched are reset and retried. Vertices left unmatched at the
    # fixpoint are covered by one arbitrary incident edge (counted,
    # not materialized — the reference counts them the same way).
    def mec_init(self) -> int:
        self._mec_s = np.full(self.n_local, -1, np.int64)
        self._mec_p = np.full(self.n_local, -1, np.int64)
        self._mec_matched = np.zeros(self.n_local, dtype=bool)
        self._mec_unset = np.ones(self.n_local, dtype=bool)
        self._mec_active = np.ones(self.n_local, dtype=bool)
        return self.n_local

    def mec_step_a(self, *inbox):
        """Apply proposal invalidations (raw sender ids from the newly
        matched: targets still pointing at one reset p and retry —
        check3), then advertise (deg, vid) keys from every unmatched
        vertex."""
        if inbox:
            dst, val = _concat_msgs(inbox, (np.int64, np.int64))
            retry = np.zeros(self.n_local, dtype=bool)
            if len(dst):
                pos = np.searchsorted(self.local, dst)
                hit = ~self._mec_matched[pos] & ~self._mec_unset[pos] & \
                    (self._mec_p[pos] == val)
                pos = pos[hit]
                self._mec_unset[pos] = True
                retry[pos] = True
            self._mec_active = retry
        mask = (~self._mec_matched)[self.e_src_pos]
        msgs = self._emit_per_part_lex(
            mask, self.out_deg.astype(np.int64)[self.e_src_pos],
            self.local[self.e_src_pos].astype(np.int64), biggest=False)
        return self._msgs_tuple(msgs) + (int(self._mec_active.sum()),)

    def mec_step_b(self, *inbox):
        """Active vertices pick p = min-(deg, vid) unmatched neighbor,
        then send their id RAW along the proposal edge."""
        got = np.full(self.n_local, -1, dtype=np.int64)
        has = np.zeros(self.n_local, dtype=bool)
        if inbox:
            dst, mh, ml = _concat_msgs(inbox, (np.int64, np.int64, np.int64))
            if len(dst):
                u, _, l = _lex_reduce(dst, mh, ml, biggest=False)
                pos = np.searchsorted(self.local, u)
                got[pos] = l
                has[pos] = True
        upd = self._mec_active
        self._mec_p[upd] = got[upd]
        self._mec_unset[upd] = ~has[upd]
        self._mec_active &= ~self._mec_unset
        mask = self._mec_active[self.e_src_pos] & \
            (self._mec_p[self.e_src_pos] == self.e_dst)
        vals = self.local[self.e_src_pos].astype(np.int64)
        msgs = self._emit_per_part_raw(mask, vals)
        return self._msgs_tuple(msgs) + (int(self._mec_active.sum()),)

    def mec_step_c(self, *inbox):
        """Mutual-proposal handshake (raw membership test: some sender
        IS my proposal target ⇒ matched — check2), then notify
        neighborhoods of the newly matched (raw, for check3)."""
        matched = np.zeros(self.n_local, dtype=bool)
        if inbox:
            dst, val = _concat_msgs(inbox, (np.int64, np.int64))
            if len(dst):
                pos = np.searchsorted(self.local, dst)
                hit = ~self._mec_matched[pos] & ~self._mec_unset[pos] & \
                    (self._mec_p[pos] == val)
                pos = pos[hit]
                self._mec_s[pos] = self._mec_p[pos]
                self._mec_matched[pos] = True
                matched[pos] = True
        mask = matched[self.e_src_pos]
        vals = self.local[self.e_src_pos].astype(np.int64)
        msgs = self._emit_per_part_raw(mask, vals)
        return self._msgs_tuple(msgs) + (int(matched.sum()),)

    def mec_counts(self):
        """(matched vertices, unmatched-with-degree) partials for the
        reference's edge-cover size: |matched|/2 + |unmatched, d>0|."""
        matched = int(self._mec_matched.sum())
        uncov = int((~self._mec_matched & (self.out_deg > 0)).sum())
        return matched, uncov

    def mec_table(self) -> pa.Table:
        mate = np.where(self._mec_matched, self._mec_s, -1)
        return pa.table({
            "vid": pa.array(self.local, pa.int64()),
            "mate": pa.array(mate, pa.int64()),
            "matched": pa.array(self._mec_matched),
        })

    # ------------------------------------------------------------ VoteRank
    def voterank_init(self) -> int:
        """ability=1 for all, nobody elected (apps/voterank/voterank.h:230,
        networkx.voterank semantics)."""
        self._ability = np.ones(self.n_local, dtype=np.float64)
        self._excluded = np.zeros(self.n_local, dtype=bool)
        return self.n_local

    def voterank_scatter(self):
        """Each arc delivers src's voting ability to dst's score."""
        return self._emit_per_part(None, self._ability[self.e_src_pos], np.add)

    def voterank_best(self, *msg_parts):
        """Combine incoming votes into local scores (elected vertices
        score 0) and return this shard's best (score, vid) with
        deterministic min-vid tie-break."""
        dst, val = _concat_msgs(msg_parts, (np.int64, np.float64))
        scores = np.zeros(self.n_local, dtype=np.float64)
        if len(dst):
            u, s = _group_reduce(dst, val, np.add)
            scores[np.searchsorted(self.local, u)] = s
        scores[self._excluded] = 0.0
        if self.n_local == 0:
            return (0.0, -1)
        best = np.lexsort((self.local, -scores))[0]
        return (float(scores[best]), int(self.local[best]))

    def voterank_elect(self, vid: int, delta: float):
        """Mark ``vid`` elected (if local) and, from its owner, emit the
        ability decrement to its out-neighbors."""
        pos = np.searchsorted(self.local, vid)
        if pos >= self.n_local or self.local[pos] != vid:
            return None if self.P == 1 else [None] * self.P
        self._excluded[pos] = True
        self._ability[pos] = 0.0
        return self._emit_masked(self.e_src_pos == pos, delta)

    def _emit_masked(self, mask, delta):
        out = []
        for d in range(self.P):
            lo, hi = self.part_bounds[d], self.part_bounds[d + 1]
            m = mask[lo:hi]
            dsts = self.e_dst[lo:hi][m]
            if len(dsts) == 0:
                out.append(None)
                continue
            u, v = _group_reduce(dsts, np.full(len(dsts), delta), np.add,
                                 presorted=True)
            out.append((u, v))
        return out if self.P > 1 else out[0]

    def voterank_apply_delta(self, *msg_parts) -> int:
        dst, val = _concat_msgs(msg_parts, (np.int64, np.float64))
        if not len(dst):
            return 0
        u, s = _group_reduce(dst, val, np.add)
        pos = np.searchsorted(self.local, u)
        # networkx clamps voting ability at 0 after each decrement
        self._ability[pos] = np.maximum(self._ability[pos] + s, 0.0)
        return len(pos)

    def state_max(self) -> float:
        return float(self.state.max()) if self.n_local else 0.0

    # --------------------------------------------------- fused BSP steps
    # One RPC wave per superstep instead of two: apply the previous
    # round's inbox, then immediately scatter the next round's messages
    # from the same task. Callers pass ``num_returns=P+1``: the first P
    # returns are the per-destination message objects (object-store
    # direct to the next round's consumers), the last is the scalar
    # partial the driver reduces (grape::Communicator role). Round 0
    # (no inbox) scatters only. This halves per-round actor round-trip
    # latency — the dominant superstep cost at small shard sizes
    # (BASELINE.md round-1 measurement).
    def _msgs_tuple(self, msgs):
        return tuple(msgs) if self.P > 1 else (msgs,)

    # --------------------------------------- generic user vertex program
    # The §2.7 user-extension surface: a cloudpickled VertexProgram
    # (functions/vertex_program.py) runs on the same fused
    # scatter→combine→exchange→apply wave as the builtins.
    _VP_OPS = {"add": np.add, "min": np.minimum, "max": np.maximum}

    def vp_init(self, program, n_total: int) -> float:
        from graphscope_ray.functions.vertex_program import VPContext

        self._vp = program
        self._vp_ctx = VPContext(
            vids=self.local, out_deg=self.out_deg,
            n_local=self.n_local, n_total=n_total, fid=self.fid,
        )
        self.state = np.asarray(program.init(self._vp_ctx))
        return float(program.reduce(self.state, self._vp_ctx))

    def vp_step(self, g: float, *inbox):
        p, ctx = self._vp, self._vp_ctx
        op = self._VP_OPS[p.combine]
        if inbox:
            dst, val = _concat_msgs(inbox, (np.int64, p.msg_dtype))
            acc = np.full(self.n_local, p.identity, dtype=self.state.dtype)
            has = np.zeros(self.n_local, dtype=bool)
            if len(dst):
                u, s = _group_reduce(dst, val, op)
                idx = np.searchsorted(self.local, u)
                acc[idx] = s
                has[idx] = True
            new = np.asarray(p.apply(self.state, acc, has, g, ctx),
                             dtype=self.state.dtype)
            if new.dtype.kind == "f":
                delta = float(np.abs(new - self.state).sum())
            else:
                delta = float((new != self.state).sum())
            self.state = new
        else:
            delta = float("inf")  # round-0 scatter: no inbox yet
        vals = np.asarray(p.emit(self.state, ctx), dtype=p.msg_dtype)
        per_edge = vals[self.e_src_pos]
        if p.use_weights:
            per_edge = per_edge * self._weights()
        scal = (delta, float(p.reduce(self.state, ctx)))
        return self._msgs_tuple(self._emit_per_part(None, per_edge, op)) \
            + (scal,)

    # ------------------------------------------------- bipartite LPAU2I
    # BSP restatement of gs::LPAU2I (apps/lpa/lpa_u2i.h:30-250) on a
    # parity-encoded bidi graph: u-vertices = 2·u (even), i-vertices =
    # 2·i+1 (odd); forward arcs u→i carry dir=0, mirror arcs i→u dir=1
    # with the same weights. Each half-step is one fused wave.

    def lpa_seed(self, table: pa.Table) -> int:
        """Buffer routed (vid, label) seed rows (u side)."""
        if not hasattr(self, "_lpa_buf"):
            self._lpa_buf = []
        self._lpa_buf.append((
            np.asarray(table.column("vid").to_numpy(zero_copy_only=False),
                       dtype=np.int64),
            np.asarray(table.column("label").to_numpy(zero_copy_only=False),
                       dtype=np.float64),
        ))
        return table.num_rows

    def lpa_seal(self) -> int:
        vids = (np.concatenate([b[0] for b in self._lpa_buf])
                if getattr(self, "_lpa_buf", None) else np.empty(0, np.int64))
        labs = (np.concatenate([b[1] for b in self._lpa_buf])
                if getattr(self, "_lpa_buf", None) else np.empty(0, np.float64))
        self._lpa_buf = []
        self.state = np.zeros(self.n_local, dtype=np.float64)
        if len(vids):
            self.state[np.searchsorted(self.local, vids)] = labs
        self._lpa_ond = np.zeros(self.n_local, dtype=np.float64)
        return int(len(vids))

    def _lpa_emit(self, dirbit: int, weighted: bool):
        vals = self.state[self.e_src_pos]
        if weighted:
            vals = vals * self._weights()
        return self._emit_per_part(self.e_dir == dirbit, vals, np.add)

    def _lpa_acc(self, inbox) -> np.ndarray:
        dst, val = _concat_msgs(inbox, (np.int64, np.float64))
        acc = np.zeros(self.n_local, dtype=np.float64)
        if len(dst):
            u, s = _group_reduce(dst, val, np.add)
            acc[np.searchsorted(self.local, u)] = s
        return acc

    def lpa_ond_start(self):
        """indeg(i) = Σ 1 along forward arcs."""
        ones = np.ones(len(self.e_dst), dtype=np.float64)
        return self._msgs_tuple(
            self._emit_per_part(self.e_dir == 0, ones, np.add)) + (0.0,)

    def lpa_ond_mid(self, *inbox):
        """Stash indeg at i; push it back along mirror arcs (unweighted)
        so u accumulates ond(u) = Σ_{i∈out(u)} indeg(i)."""
        indeg = self._lpa_acc(inbox)
        return self._msgs_tuple(self._emit_per_part(
            self.e_dir == 1, indeg[self.e_src_pos], np.add)) + (0.0,)

    def lpa_ond_apply(self, *inbox) -> int:
        self._lpa_ond = self._lpa_acc(inbox)
        return self.n_local

    def lpa_scatter_u(self):
        """Round-0 scatter: u labels · w along forward arcs."""
        return self._msgs_tuple(self._lpa_emit(0, True)) + (0.0,)

    def lpa_i_step(self, *inbox):
        """u2i apply (i.label = Σ u_label·w, lpa_u2i.h:167-186) fused
        with the i2u scatter (i.label·w along mirror arcs)."""
        new_i = self._lpa_acc(inbox)
        imask = (self.local % 2) == 1
        self.state = np.where(imask, new_i, self.state)
        return self._msgs_tuple(self._lpa_emit(1, True)) + (0.0,)

    def lpa_u_step(self, scatter: bool, *inbox):
        """i2u apply (lpa_u2i.h:188-236): exact-0/1 labels pinned,
        else label' = (tmp − outdeg·label)/(ond − outdeg), unchanged on
        zero denominator; fused with the next round's u2i scatter."""
        tmp = self._lpa_acc(inbox)
        lab = self.state
        od = self.out_deg.astype(np.float64)
        denom = self._lpa_ond - od
        upd = (((self.local % 2) == 0) & (lab != 0.0) & (lab != 1.0)
               & (denom != 0.0))
        new = lab.copy()
        new[upd] = (tmp[upd] - od[upd] * lab[upd]) / denom[upd]
        self.state = new
        if scatter:
            return self._msgs_tuple(self._lpa_emit(0, True)) + (0.0,)
        empty = [None] * self.P if self.P > 1 else None
        return self._msgs_tuple(empty) + (0.0,)

    def pagerank_step(self, base: float, alpha: float, *inbox):
        scal = self.pagerank_apply(base, alpha, *inbox) if inbox else (0.0, 0.0)
        return self._msgs_tuple(self.pagerank_scatter()) + (scal,)

    def minprop_step(self, *inbox):
        changed = self.minprop_apply(*inbox) if inbox else self.n_local
        return self._msgs_tuple(self.minprop_scatter()) + (changed,)

    def cdlp_step(self, *inbox):
        changed = self.cdlp_apply(*inbox) if inbox else self.n_local
        return self._msgs_tuple(self.cdlp_scatter()) + (changed,)

    def dist_step(self, weighted: bool, *inbox):
        changed = self.dist_apply(*inbox) if inbox else 0
        return self._msgs_tuple(self.dist_scatter(weighted)) + (changed,)

    def value_step(self, alpha: float, beta: float, plus_state: bool, *inbox):
        """Fused linear-propagation round (Katz: no mid-round global
        normalization, so apply+scatter fuse soundly)."""
        scal = (
            self.value_apply(alpha, beta, plus_state, *inbox)
            if inbox else (0.0, 0.0, 0.0, 0.0)
        )
        return self._msgs_tuple(self.value_scatter()) + (scal,)

    def msbfs_step(self, *inbox):
        changed = self.msbfs_apply(*inbox) if inbox else 0
        return self._msgs_tuple(self.msbfs_scatter()) + (changed,)

    # ------------------------------------------------- named state slots
    # A second vertex-state buffer per shard. Needed when ONE pool plays
    # two roles (hits() on an undirected graph uses the same CSR for A
    # and Aᵀ): without a separate slot the authority vector would be
    # overwritten by the hub half-step mid-iteration.
    def stash_state(self, name: str) -> int:
        if not hasattr(self, "_stash"):
            self._stash = {}
        self._stash[name] = self.state.copy()
        return self.n_local

    def stash_max(self, name: str) -> float:
        s = self._stash[name]
        return float(s.max()) if len(s) else 0.0

    def stash_scale(self, name: str, factor: float) -> float:
        """Scale the stashed vector; returns its (pre-scale) sum."""
        s = self._stash[name]
        tot = float(s.sum())
        self._stash[name] = s * factor
        return tot

    def state_table_with_stash(self, col: str, stash_name: str,
                               stash_col: str) -> pa.Table:
        """(vid, col, stash_col) in one table — partition-aligned export
        of two vertex vectors with no driver-side merge."""
        return pa.table({
            "vid": pa.array(self.local, pa.int64()),
            col: pa.array(self.state),
            stash_col: pa.array(self._stash[stash_name]),
        })

    def save_snapshot(self) -> int:
        self._snap = self.state.copy()
        return self.n_local

    def l1_diff_snapshot(self) -> float:
        return float(np.abs(self.state - self._snap).sum())

    def set_state_vector(self, table: pa.Table) -> int:
        """Overwrite state from a (vid, value) table produced by a twin
        graph's shard with the SAME partitioning (fid fn + full vertex
        registration ⇒ identical local vid arrays)."""
        return self.load_state(table)

    # ------------------------------------------------------ state export
    def state_table(self, col: str = "value") -> pa.Table:
        st = self.state
        return pa.table({"vid": pa.array(self.local, pa.int64()), col: pa.array(st)})

    def save_state(self, path: str, col: str = "value") -> int:
        """Write this shard's vertex state to parquet (atomically) —
        per-partition checkpoint written with locality, the role of the
        reference's per-fragment vineyard persist (grape_instance.cc:302)."""
        import os

        import pyarrow.parquet as pq

        tmp = path + f".tmp{self.fid}"
        pq.write_table(self.state_table(col), tmp)
        os.replace(tmp, path)
        return self.n_local

    def restore_state(self, path: str, frontier_all: bool = False) -> int:
        import pyarrow.parquet as pq

        return self.load_state(pq.read_table(path), frontier_all)

    def load_state(self, table: pa.Table, frontier_all: bool = False):
        """Restore vertex state from a checkpoint table (vid, value).

        The vid set must match this shard's local vertex array exactly —
        a checkpoint from a different graph with the same (P, V, E)
        config hash would otherwise silently scatter values to wrong
        vertices and leave uninitialized slots (ADVICE r01)."""
        vid = table.column("vid").to_numpy(zero_copy_only=False)
        val = table.column(table.column_names[1]).to_numpy(zero_copy_only=False)
        if len(vid) != self.n_local:
            raise ValueError(
                f"shard {self.fid}: checkpoint has {len(vid)} vertices, "
                f"shard has {self.n_local} — wrong graph or partitioning"
            )
        pos = np.searchsorted(self.local, vid)
        if pos.max(initial=-1) >= self.n_local or not np.array_equal(
            self.local[pos], vid
        ):
            raise ValueError(
                f"shard {self.fid}: checkpoint vid set does not match the "
                "shard's local vertex array — refusing to restore"
            )
        st = np.empty(self.n_local, dtype=val.dtype)
        st[pos] = val
        self.state = st
        self._frontier = np.ones(self.n_local, dtype=bool) if frontier_all else np.zeros(
            self.n_local, dtype=bool
        )
        if not hasattr(self, "_dangling_mask"):
            self._dangling_mask = self.out_deg == 0
        return self.n_local

    # ------------------------------------- incremental warm start (Ingress)
    # The reference's Ingress engine (docs/analytical_engine/ingress.md)
    # resumes a monotonic fixpoint computation from the previous result
    # after a graph delta instead of cold-starting. Ray-side protocol:
    # ``warm_init`` seals the default state + empty frontier, the driver
    # routes the previous run's (vid, value) table into ``warm_ingest``
    # (values overlay the default; vids absent from this shard — deleted
    # or re-partitioned — are dropped), then routes the delta-edge
    # endpoints into ``warm_activate`` (they seed the frontier).
    def warm_init(self, kind: str, fill: float = 0.0) -> int:
        """kind='vid' → state = own vid (min-propagation family);
        kind='fill' → state = scalar fill (PageRank: 1/N for vertices
        the previous run never saw)."""
        if kind == "vid":
            self.state = self.local.astype(np.int64).copy()
        elif kind == "fill":
            self.state = np.full(self.n_local, fill, dtype=np.float64)
        else:
            raise ValueError(f"warm_init: unknown kind {kind!r}")
        self._frontier = np.zeros(self.n_local, dtype=bool)
        self._dangling_mask = self.out_deg == 0
        return self.n_local

    def _local_pos(self, vid: np.ndarray) -> tuple:
        """Positions of ``vid`` in this shard's local array; rows whose
        vid is not local are masked out (NOT an error: an incremental
        run's vertex set may shrink)."""
        pos = np.searchsorted(self.local, vid)
        ok = pos < self.n_local
        ok[ok] &= self.local[pos[ok]] == vid[ok]
        return pos[ok], ok

    def warm_ingest(self, table: pa.Table) -> int:
        vid = table.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
        val = table.column(table.column_names[1]).to_numpy(zero_copy_only=False)
        pos, ok = self._local_pos(vid)
        self.state[pos] = val[ok].astype(self.state.dtype)
        return int(ok.sum())

    def warm_activate(self, table: pa.Table) -> int:
        vid = table.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
        pos, ok = self._local_pos(vid)
        self._frontier[pos] = True
        return int(ok.sum())

    def dangling_partial(self) -> float:
        """Σ state over this shard's outdeg-0 vertices (the warm-start
        analogue of pagerank_init's return)."""
        return float(self.state[self._dangling_mask].sum())

    # ------------------------------------------------------------- walks
    # DeepWalk / node2vec on the RESIDENT CSR: the arc table never
    # re-shuffles (the Dataset engine in pipelines/walks.py pays one
    # arc-table shuffle per level; here arcs stay in the pool and only
    # the frontier — O(#walks) rows — moves shard→shard per level).
    # Picks use the same functions/hashing.walk_race_keys kernel, so
    # results are IDENTICAL to the Dataset engine and the sequential
    # oracle (pinned in tests/test_walks.py).

    def _wk_csr(self) -> None:
        """Cached src-sorted forward CSR + packed (src, dst-rank) keys
        for vectorized O(log E) arc-membership queries."""
        if getattr(self, "_wk_indptr", None) is not None:
            return
        if self.e_dir is None:
            sp, dst, w = self.e_src_pos, self.e_dst, self.e_w
        else:
            m = self.e_dir == 0
            sp, dst = self.e_src_pos[m], self.e_dst[m]
            w = None if self.e_w is None else self.e_w[m]
        order = np.lexsort((dst, sp))
        self._wk_nbrs = dst[order]
        self._wk_w = None if w is None else w[order]
        spo = sp[order].astype(np.int64)
        self._wk_indptr = np.concatenate(
            ([0], np.cumsum(np.bincount(spo, minlength=self.n_local)))
        ).astype(np.int64)
        self._wk_dstu = np.unique(self._wk_nbrs)
        stride = np.int64(len(self._wk_dstu) + 1)
        if len(spo) and int(self.n_local) * int(stride) >= 2**62:
            raise ValueError("walk membership key overflow: "
                             "n_local x distinct-dst exceeds int64")
        rank = np.searchsorted(self._wk_dstu, self._wk_nbrs)
        self._wk_keys = np.sort(spo * stride + rank)
        self._wk_stride = stride
        self._wk_front = None
        self._wk_done: list[tuple[np.ndarray, np.ndarray]] = []

    def _wk_empty(self) -> dict:
        return {"walk": np.empty(0, np.int64),
                "path": np.empty(0, object),
                "prev": np.empty(0, np.int64),
                "last": np.empty(0, np.int64)}

    @staticmethod
    def _wk_table(f: dict) -> pa.Table:
        return pa.table({
            "walk": pa.array(f["walk"], pa.int64()),
            "path": pa.array(f["path"].tolist(), pa.string()),
            "prev": pa.array(f["prev"], pa.int64()),
            "last": pa.array(f["last"], pa.int64()),
        })

    @staticmethod
    def _wk_from_tables(tables) -> dict:
        fs = [t for t in tables if t is not None and t.num_rows]
        if not fs:
            return {"walk": np.empty(0, np.int64),
                    "path": np.empty(0, object),
                    "prev": np.empty(0, np.int64),
                    "last": np.empty(0, np.int64)}
        return {
            "walk": np.concatenate([
                t.column("walk").to_numpy(zero_copy_only=False)
                for t in fs]).astype(np.int64),
            "path": np.concatenate([np.asarray(
                t.column("path").to_pylist(), object) for t in fs]),
            "prev": np.concatenate([
                t.column("prev").to_numpy(zero_copy_only=False)
                for t in fs]).astype(np.int64),
            "last": np.concatenate([
                t.column("last").to_numpy(zero_copy_only=False)
                for t in fs]).astype(np.int64),
        }

    def _wk_split(self, f: dict, key: np.ndarray) -> list:
        """Split frontier-shaped dict rows by an owner array into P
        tables (counting split, no sort of the payload)."""
        out = []
        for d in range(self.P):
            m = key == d
            out.append(self._wk_table({
                "walk": f["walk"][m], "path": f["path"][m],
                "prev": f["prev"][m], "last": f["last"][m]}))
        return out if self.P > 1 else out[0]

    def walk_seed(self, num_walks: int,
                  starts: np.ndarray | None = None,
                  use_weights: bool = False) -> int:
        self._wk_csr()
        self._wk_use_w = bool(use_weights) and self._wk_w is not None
        v = self.local if starts is None else np.asarray(starts, np.int64)
        v = np.repeat(v.astype(np.int64), num_walks)
        rep = np.tile(np.arange(num_walks, dtype=np.int64),
                      len(v) // max(1, num_walks))
        from graphscope_ray.functions.hashing import walk_ids
        wid = walk_ids(v, rep)
        self._wk_front = {
            "walk": wid,
            "path": np.asarray([str(int(x)) for x in v], object),
            "prev": np.full(len(v), -1, np.int64),
            "last": v.copy(),
        }
        self._wk_done = []
        return len(v)

    def _wk_expand(self) -> tuple[dict, np.ndarray, np.ndarray]:
        """Expand the resident frontier against the local CSR: returns
        (candidate rows in frontier shape with last=cur, cand, w)."""
        f = self._wk_front or self._wk_empty()
        if self.n_local == 0:
            # shard owns no vertices but may still receive frontier
            # rows (user start vid hashing here on a tiny graph):
            # every such walk takes the documented dead-end path
            if len(f["walk"]):
                self._wk_done.append((f["walk"], f["path"]))
            return (self._wk_empty(), np.empty(0, np.int64),
                    np.empty(0, np.float64))
        pos = np.searchsorted(self.local, f["last"]) if len(f["walk"]) \
            else np.empty(0, np.int64)
        # a start vid absent from the graph must become the
        # single-vertex path (like the Dataset engine / oracle), not an
        # out-of-bounds read or a neighbor's CSR row
        if len(pos):
            pos = np.minimum(pos, self.n_local - 1)
            valid = self.local[pos] == f["last"]
        else:
            valid = np.empty(0, bool)
        lo = self._wk_indptr[pos]
        hi = self._wk_indptr[pos + 1] if len(pos) else lo
        deg = np.where(valid, hi - lo, 0).astype(np.int64)
        dead = deg == 0
        if dead.any():
            self._wk_done.append((f["walk"][dead], f["path"][dead]))
        live = ~dead
        reps = deg[live]
        idx = np.repeat(lo[live], reps) + (
            np.arange(int(reps.sum()))
            - np.repeat(np.concatenate(([0], np.cumsum(reps)))[:-1], reps))
        cand = self._wk_nbrs[idx]
        w = (self._wk_w[idx] if getattr(self, "_wk_use_w", False)
             else np.ones(len(idx), np.float64))
        rows = {
            "walk": np.repeat(f["walk"][live], reps),
            "path": np.repeat(f["path"][live], reps),
            "prev": np.repeat(f["prev"][live], reps),
            "last": np.repeat(f["last"][live], reps),   # = cur
        }
        return rows, cand, w

    @staticmethod
    def _wk_pick(rows: dict, cand, w, level: int, seed: int):
        """Deterministic race pick per walk over candidate rows —
        the shared kernel, sorted (walk, r, cand), first wins."""
        from graphscope_ray.functions.hashing import walk_race_keys

        r = walk_race_keys(rows["walk"], level, cand, w, seed)
        order = np.lexsort((cand, r, rows["walk"]))
        wlk = rows["walk"][order]
        first = np.concatenate(([True], wlk[1:] != wlk[:-1]))
        sel = order[first]
        import pandas as pd

        new_path = (pd.Series(rows["path"][sel])
                    + "," + pd.Series(cand[sel]).astype(str)
                    ).to_numpy(object)
        return {"walk": rows["walk"][sel], "path": new_path,
                "prev": rows["last"][sel], "last": cand[sel]}

    def walk_step_uniform(self, level: int, seed: int):
        """One DeepWalk level fused: expand + pick + owner-split. ONE
        actor wave per level."""
        rows, cand, w = self._wk_expand()
        if not len(cand):
            return self._wk_split(self._wk_empty(),
                                  np.empty(0, np.int64))
        nf = self._wk_pick(rows, cand, w, level, seed)
        return self._wk_split(nf, partition_of(nf["last"], self.P))

    def walk_expand_biased(self):
        """node2vec wave 1: expand, split candidates by owner(prev)
        for the arc-membership check (prev = -1 rows map to owner 0 —
        level-0 rows are uniform by contract and skip the test)."""
        rows, cand, w = self._wk_expand()
        f = {"walk": rows["walk"], "path": rows["path"],
             "prev": rows["prev"], "last": rows["last"]}
        tabs = []
        owner = partition_of(np.maximum(rows["prev"], 0), self.P)
        for d in range(self.P):
            m = owner == d
            tabs.append(pa.table({
                "walk": pa.array(f["walk"][m], pa.int64()),
                "path": pa.array(f["path"][m].tolist(), pa.string()),
                "prev": pa.array(f["prev"][m], pa.int64()),
                "cur": pa.array(f["last"][m], pa.int64()),
                "cand": pa.array(cand[m], pa.int64()),
                "w": pa.array(w[m], pa.float64()),
            }))
        return tabs if self.P > 1 else tabs[0]

    def walk_mark(self, *tables):
        """node2vec wave 2: membership of (prev, cand) in the local
        forward arcs (prev owned here), then split by hash(walk) for
        the per-walk pick."""
        fs = [t for t in tables if t is not None and t.num_rows]
        if not fs:
            z = pa.table({
                "walk": pa.array([], pa.int64()),
                "path": pa.array([], pa.string()),
                "prev": pa.array([], pa.int64()),
                "cur": pa.array([], pa.int64()),
                "cand": pa.array([], pa.int64()),
                "w": pa.array([], pa.float64()),
                "is_edge": pa.array([], pa.int8())})
            return [z] * self.P if self.P > 1 else z
        t = pa.concat_tables(fs)
        prev = t.column("prev").to_numpy(zero_copy_only=False)
        cand = t.column("cand").to_numpy(zero_copy_only=False)
        is_edge = np.zeros(len(prev), np.int8)
        has_prev = prev >= 0
        if has_prev.any() and self.n_local:
            pos = np.searchsorted(self.local, prev[has_prev])
            ok = (pos < self.n_local)
            pos = np.minimum(pos, self.n_local - 1)
            ok &= self.local[pos] == prev[has_prev]
            rank = np.searchsorted(self._wk_dstu, cand[has_prev])
            rok = rank < len(self._wk_dstu)
            rank = np.minimum(rank, max(0, len(self._wk_dstu) - 1))
            rok &= (self._wk_dstu[rank] == cand[has_prev]) if len(
                self._wk_dstu) else False
            key = pos.astype(np.int64) * self._wk_stride + rank
            ki = np.searchsorted(self._wk_keys, key)
            kok = ki < len(self._wk_keys)
            ki = np.minimum(ki, max(0, len(self._wk_keys) - 1))
            kok &= (self._wk_keys[ki] == key) if len(self._wk_keys) \
                else False
            is_edge[has_prev] = (ok & rok & kok).astype(np.int8)
        t = t.append_column("is_edge", pa.array(is_edge, pa.int8()))
        walk = t.column("walk").to_numpy(zero_copy_only=False)
        owner = (splitmix64(walk.astype(np.int64))
                 % np.uint64(self.P)).astype(np.int64)
        out = []
        for d in range(self.P):
            out.append(t.filter(pa.array(owner == d)))
        return out if self.P > 1 else out[0]

    def walk_pick_biased(self, level: int, seed: int, p: float,
                         q: float, *tables):
        """node2vec wave 3: per-walk weighted pick over all of a
        walk's marked candidates (co-located here by hash(walk)),
        owner-split new frontier."""
        fs = [t for t in tables if t is not None and t.num_rows]
        if not fs:
            return self._wk_split(self._wk_empty(),
                                  np.empty(0, np.int64))
        t = pa.concat_tables(fs)
        rows = {
            "walk": t.column("walk").to_numpy(zero_copy_only=False
                                              ).astype(np.int64),
            "path": np.asarray(t.column("path").to_pylist(), object),
            "prev": t.column("prev").to_numpy(zero_copy_only=False
                                              ).astype(np.int64),
            "last": t.column("cur").to_numpy(zero_copy_only=False
                                             ).astype(np.int64),
        }
        cand = t.column("cand").to_numpy(zero_copy_only=False
                                         ).astype(np.int64)
        we = t.column("w").to_numpy(zero_copy_only=False)
        is_edge = t.column("is_edge").to_numpy(zero_copy_only=False)
        first = rows["prev"] < 0
        bias = np.where(
            first, 1.0,
            np.where(cand == rows["prev"], 1.0 / p,
                     np.where(is_edge == 1, 1.0, 1.0 / q)))
        nf = self._wk_pick(rows, cand, bias * we, level, seed)
        return self._wk_split(nf, partition_of(nf["last"], self.P))

    def walk_ingest(self, *tables) -> int:
        """Install the next level's frontier (rows owned here)."""
        self._wk_front = self._wk_from_tables(tables)
        return len(self._wk_front["walk"])

    def walk_collect(self) -> pa.Table:
        """Finished + still-live walks on this shard as (walk, path);
        frees the walk state."""
        f = self._wk_front or self._wk_empty()
        walks = [w for w, _ in self._wk_done] + [f["walk"]]
        paths = [p for _, p in self._wk_done] + [f["path"]]
        out = pa.table({
            "walk": pa.array(np.concatenate(walks), pa.int64()),
            "path": pa.array(np.concatenate(paths).tolist(),
                             pa.string()),
        })
        self._wk_front = None
        self._wk_done = []
        return out

    # ------------------------------------- negative edge sampling
    # Link-prediction training data: k deterministic non-edge
    # candidates per vertex, drawn uniformly from the GLOBAL vertex set
    # by hashing into the rank space [0, V) (rank → owning shard by the
    # broadcast n_local cumsum, → vid by local sorted position), then
    # filtered against the resident membership index. Three actor
    # waves, no vertex table ever leaves the pool.

    def local_count(self) -> int:
        """Number of vertices owned by this shard."""
        return int(self.n_local)

    def neg_gen(self, k: int, seed: int, bounds: np.ndarray):
        """Wave 1: k candidate ranks per local vertex, split by the
        rank-owning shard."""
        self._wk_csr()
        V = int(bounds[-1])
        u = np.repeat(self.local, k)
        j = np.tile(np.arange(k, dtype=np.int64), self.n_local)
        from graphscope_ray.functions.hashing import hash64_any

        with np.errstate(over="ignore"):
            h = hash64_any(u * np.int64(1000003)
                           + j * np.int64(99991) + np.int64(seed))
        rank = (h % np.uint64(max(V, 1))).astype(np.int64)
        owner = (np.searchsorted(bounds, rank, side="right") - 1
                 ).astype(np.int64)
        out = []
        for d in range(self.P):
            m = owner == d
            out.append(pa.table({
                "u": pa.array(u[m], pa.int64()),
                "rank": pa.array(rank[m], pa.int64()),
            }))
        return out if self.P > 1 else out[0]

    def neg_resolve(self, base: int, *tables):
        """Wave 2: rank → vid via the local sorted vid array, split
        back by owner(u)."""
        fs = [t for t in tables if t is not None and t.num_rows]
        if not fs:
            z = pa.table({"u": pa.array([], pa.int64()),
                          "cand": pa.array([], pa.int64())})
            return [z] * self.P if self.P > 1 else z
        t = pa.concat_tables(fs)
        u = t.column("u").to_numpy(zero_copy_only=False)
        rank = t.column("rank").to_numpy(zero_copy_only=False)
        cand = self.local[rank - np.int64(base)]
        owner = partition_of(u, self.P)
        out = []
        for d in range(self.P):
            m = owner == d
            out.append(pa.table({
                "u": pa.array(u[m], pa.int64()),
                "cand": pa.array(cand[m], pa.int64()),
            }))
        return out if self.P > 1 else out[0]

    def neg_filter(self, *tables) -> pa.Table:
        """Wave 3: drop candidates that ARE forward arcs of u (or u
        itself); emit surviving (src, neg_dst) rows."""
        fs = [t for t in tables if t is not None and t.num_rows]
        if not fs:
            return pa.table({"src": pa.array([], pa.int64()),
                             "neg_dst": pa.array([], pa.int64())})
        t = pa.concat_tables(fs)
        u = t.column("u").to_numpy(zero_copy_only=False)
        cand = t.column("cand").to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(self.local, u),
                         self.n_local - 1)
        rank = np.searchsorted(self._wk_dstu, cand)
        rok = rank < len(self._wk_dstu)
        rank = np.minimum(rank, max(0, len(self._wk_dstu) - 1))
        if len(self._wk_dstu):
            rok &= self._wk_dstu[rank] == cand
        key = pos.astype(np.int64) * self._wk_stride + rank
        ki = np.minimum(np.searchsorted(self._wk_keys, key),
                        max(0, len(self._wk_keys) - 1))
        is_edge = rok & (self._wk_keys[ki] == key) if len(self._wk_keys) \
            else np.zeros(len(u), bool)
        keep = ~is_edge & (u != cand)
        return pa.table({"src": pa.array(u[keep], pa.int64()),
                         "neg_dst": pa.array(cand[keep], pa.int64())})

    def nbr_sample(self, frontier, fanout: int, seed: int) -> pa.Table:
        """One k-hop-sampling wave on the resident CSR: for each
        frontier vertex owned here, keep ≤ fanout distinct neighbors by
        the SAME deterministic rank as stages/sampling.neighbor_sample
        (splitmix64(h(src) ^ h(dst+7) ^ seed)), so the two engines
        produce identical samples. Returns the sampled (src, dst)
        arcs."""
        from graphscope_ray.functions.hashing import hash64_ints

        self._wk_csr()
        f = np.asarray(ray.get(frontier) if isinstance(
            frontier, ray.ObjectRef) else frontier, np.int64)
        pos = np.minimum(np.searchsorted(self.local, f),
                         max(self.n_local - 1, 0))
        ok = (self.local[pos] == f) if self.n_local else \
            np.zeros(len(f), bool)
        pos = pos[ok]
        lo, hi = self._wk_indptr[pos], self._wk_indptr[pos + 1]
        reps = (hi - lo).astype(np.int64)
        live = reps > 0
        lo, reps = lo[live], reps[live]
        idx = np.repeat(lo, reps) + (
            np.arange(int(reps.sum()))
            - np.repeat(np.concatenate(([0], np.cumsum(reps)))[:-1],
                        reps))
        src = np.repeat(self.local[pos[live]], reps)
        dst = self._wk_nbrs[idx]
        # CSR is dst-sorted within src: drop parallel-arc duplicates
        keep = np.concatenate(([True], (src[1:] != src[:-1])
                               | (dst[1:] != dst[:-1]))) \
            if len(src) else np.empty(0, bool)
        src, dst = src[keep], dst[keep]
        with np.errstate(over="ignore"):
            r = splitmix64(hash64_ints(src) ^ hash64_ints(dst + 7)
                           ^ np.uint64(seed))
        order = np.lexsort((r, src))
        src, dst = src[order], dst[order]
        first = np.concatenate(([True], src[1:] != src[:-1])) \
            if len(src) else np.empty(0, bool)
        gid = np.cumsum(first) - 1
        grp_start = np.concatenate(([0], np.flatnonzero(first)[1:])) \
            if len(src) else np.empty(0, np.int64)
        within = np.arange(len(src)) - grp_start[gid] if len(src) \
            else np.empty(0, np.int64)
        m = within < fanout
        return pa.table({"src": pa.array(src[m], pa.int64()),
                         "dst": pa.array(dst[m], pa.int64())})

    # ---------------- GNN full-batch training (GCN / GraphSAGE-mean)
    # The distributed half of the learning engine's full-graph mode:
    # per-shard dense layer math over resident feature matrices, with
    # every sparse aggregate (ÂM or D⁻¹AM) expressed as ONE
    # add-combined message wave on the same CSR every other kernel
    # uses. The reference trains GNNs through learning_engine/
    # graph-learn (GLE); here the model math is the shared numpy
    # kernels in functions/gnn.py so the sequential oracle and the
    # pool are bit-for-bit the same arithmetic per row.
    def gnn_ingest(self, table: pa.Table) -> int:
        """Buffer routed (vid, feat list<float>[, label]) rows."""
        if not hasattr(self, "_gnn_buf"):
            self._gnn_buf = []
        vids = table.column("vid").to_numpy(zero_copy_only=False).astype(
            np.int64)
        feats = table.column("feat").to_numpy(zero_copy_only=False)
        X = (np.vstack([np.asarray(r, np.float64) for r in feats])
             if len(feats) else np.empty((0, 0), np.float64))
        y = None
        if "label" in table.column_names:
            lab = table.column("label")
            y = np.asarray(lab.fill_null(-1).to_numpy(
                zero_copy_only=False), dtype=np.int64)
        self._gnn_buf.append((vids, X, y))
        return table.num_rows

    def gnn_seal(self, f_dim: int) -> tuple[int, int]:
        """Assemble the resident feature matrix X (n_local × f, zeros
        where no row arrived), labels y (−1 = unlabeled) and the two
        normalization scales. Returns (rows_placed, n_labeled)."""
        from graphscope_ray.functions.gnn import (inv_deg_scale,
                                                  sym_norm_scale)
        X = np.zeros((self.n_local, f_dim), np.float64)
        y = np.full(self.n_local, -1, np.int64)
        placed = 0
        for vids, feats, labs in getattr(self, "_gnn_buf", []):
            pos = np.searchsorted(self.local, vids)
            ok = pos < self.n_local
            hit = np.zeros(len(vids), bool)
            hit[ok] = self.local[pos[ok]] == vids[ok]
            p = pos[hit]
            if feats.size:
                X[p] = feats[hit]
            if labs is not None:
                y[p] = labs[hit]
            placed += int(hit.sum())
        self._gnn_buf = []
        self._gnn = {"X": X}
        self._gnn_y = y
        self._gnn_s = sym_norm_scale(self.out_deg)
        self._gnn_id = inv_deg_scale(self.out_deg)
        return placed, int((y >= 0).sum())

    def _gnn_pre(self, name: str, pre: str) -> np.ndarray:
        M = self._gnn[name]
        if pre == "sym":
            return self._gnn_s[:, None] * M
        if pre == "invdeg":
            return self._gnn_id[:, None] * M
        return M

    def gnn_spmm_scatter(self, name: str, pre: str):
        """Wave half 1: push (optionally pre-scaled) rows of resident
        matrix ``name`` along ALL arcs, add-combined per destination.
        pre ∈ {sym: D̃^{-1/2}, invdeg: D^{-1}, none}."""
        rows = self._gnn_pre(name, pre)
        if self.n_local == 0:
            return [None] * self.P if self.P > 1 else None
        return self._matrix_scatter(
            np.ones(self.n_local, bool), rows, np.add)

    def gnn_spmm_apply(self, out: str, name: str, post: str,
                       self_coef: str, *inbox) -> int:
        """Wave half 2: out = post · (Σ inbox + self term).

        GCN (Â = D̃^{-1/2}(A+I)D̃^{-1/2}): pre=sym, post=sym,
        self_coef=sym → out = s·(agg + s·M).
        GraphSAGE mean (D⁻¹A): pre=none, post=invdeg, self_coef=none.
        Mean transpose ((D⁻¹A)ᵀ = A D⁻¹ on the undirected CSR):
        pre=invdeg, post=none, self_coef=none.
        """
        width = self._gnn[name].shape[1]
        agg = np.zeros((self.n_local, width), np.float64)
        dst, packed = self._concat_matrix_msgs(inbox)
        if dst is not None:
            starts, mat = packed
            pos = np.searchsorted(self.local, dst)
            agg[pos] = np.add.reduceat(mat, starts, axis=0)
        if self_coef == "sym":
            agg += self._gnn_s[:, None] * self._gnn[name]
        if post == "sym":
            agg *= self._gnn_s[:, None]
        elif post == "invdeg":
            agg *= self._gnn_id[:, None]
        self._gnn[out] = agg
        return self.n_local

    def gnn_concat(self, out: str, a: str, b: str) -> int:
        """out = [a ‖ b] (the GraphSAGE concat aggregator input)."""
        self._gnn[out] = np.concatenate(
            [self._gnn[a], self._gnn[b]], axis=1)
        return self.n_local

    def gnn_hidden(self, wref) -> int:
        """Z1 = F1 @ W1 + b1 ; H1 = relu(Z1) (F1 is the sealed layer-1
        input — ÂX for GCN, [X ‖ mean-nbr X] for SAGE)."""
        from graphscope_ray.functions.gnn import relu
        params = self._resolve_ref(wref)
        Z1 = self._gnn["F1"] @ params["W1"] + params["b1"]
        self._gnn["Z1"] = Z1
        self._gnn["H1"] = relu(Z1)
        return self.n_local

    def gnn_output(self, wref):
        """Z2 = G1 @ W2 + b2 ; probs = softmax. Returns the per-shard
        loss partials (Σ CE over labeled, n_labeled, n_correct)."""
        from graphscope_ray.functions.gnn import ce_loss_rows, softmax_rows
        params = self._resolve_ref(wref)
        Z2 = self._gnn["G1"] @ params["W2"] + params["b2"]
        P = softmax_rows(Z2) if Z2.size else Z2
        self._gnn["probs"] = P
        y = self._gnn_y
        lab = y >= 0
        if not lab.any():
            return 0.0, 0, 0
        loss = float(ce_loss_rows(P[lab], y[lab]).sum())
        correct = int((P[lab].argmax(axis=1) == y[lab]).sum())
        return loss, int(lab.sum()), correct

    def gnn_grad_out(self, wref, n_labeled_total: int, h_dim: int,
                     conv: str):
        """dZ2 = (softmax − onehot)/N masked; returns (dW2 = G1ᵀ dZ2,
        db2) partials and stashes the hidden-layer backprop inputs
        (Gs = self part, Gn = neighbor part to be aggregated)."""
        from graphscope_ray.functions.gnn import masked_output_grad
        params = self._resolve_ref(wref)
        dZ2 = masked_output_grad(self._gnn["probs"], self._gnn_y,
                                 n_labeled_total)
        dW2 = self._gnn["G1"].T @ dZ2
        db2 = dZ2.sum(axis=0)
        dH1 = dZ2 @ params["W2"].T
        if conv == "sage":
            self._gnn["Gs"] = dH1[:, :h_dim]
            self._gnn["Gn"] = dH1[:, h_dim:]
        else:
            self._gnn["Gn"] = dH1
        return dW2, db2

    def gnn_grad_hidden(self, conv: str):
        """dZ1 = (Gs + AGn) ⊙ relu′(Z1); returns (dW1 = F1ᵀ dZ1, db1)
        partials (AGn is the aggregated neighbor-gradient wave)."""
        dH1 = self._gnn["AGn"]
        if conv == "sage":
            dH1 = dH1 + self._gnn["Gs"]
        dZ1 = dH1 * (self._gnn["Z1"] > 0)
        return self._gnn["F1"].T @ dZ1, dZ1.sum(axis=0)

    def gnn_predict_table(self) -> pa.Table:
        """(vid, pred, maxprob) from the last forward pass."""
        P = self._gnn["probs"]
        pred = (P.argmax(axis=1).astype(np.int64) if P.size
                else np.empty(0, np.int64))
        mp = P.max(axis=1) if P.size else np.empty(0, np.float64)
        return pa.table({
            "vid": pa.array(self.local, pa.int64()),
            "pred": pa.array(pred, pa.int64()),
            "prob": pa.array(mp, pa.float64()),
        })

    def gnn_embed_table(self, name: str = "H1") -> pa.Table:
        """(vid, emb list<double>) export of a resident matrix — the
        trained-representation product (node embeddings)."""
        M = np.ascontiguousarray(self._gnn[name])
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(M.ravel(), pa.float64()), M.shape[1] or 1)
        return pa.table({
            "vid": pa.array(self.local, pa.int64()),
            "emb": emb,
        })

    def gnn_labeled_vids(self) -> np.ndarray:
        """Locally-owned vids with a label (the minibatch seed pool)."""
        if getattr(self, "_gnn_y", None) is None:
            return np.empty(0, np.int64)
        return self.local[self._gnn_y >= 0]

    def gnn_gather(self, vids_ref):
        """Feature/label gather for the minibatch trainer: of the
        requested vids, return (owned_vids, X rows, labels) for the
        ones this shard owns — a vectorized searchsorted gather on the
        resident matrix, no per-row Python."""
        v = np.asarray(ray.get(vids_ref) if isinstance(
            vids_ref, ray.ObjectRef) else vids_ref, np.int64)
        if not self.n_local or not len(v):
            f = self._gnn["X"].shape[1] if getattr(self, "_gnn", None) \
                and "X" in self._gnn else 0
            return (np.empty(0, np.int64), np.empty((0, f), np.float64),
                    np.empty(0, np.int64))
        pos = np.minimum(np.searchsorted(self.local, v), self.n_local - 1)
        ok = self.local[pos] == v
        p = pos[ok]
        return (v[ok], self._gnn["X"][p], self._gnn_y[p])

    def gnn_label_max(self) -> int:
        """Largest local label (−1 when none) — num_classes inference."""
        y = self._gnn_y
        return int(y.max()) if y is not None and len(y) else -1

    def gnn_free(self) -> int:
        """Release the resident matrices (pools may be cached)."""
        self._gnn = {}
        self._gnn_y = None
        return 0

    @staticmethod
    def _resolve_ref(ref):
        """Accept a plain object or an ObjectRef wrapped in a 1-list
        (the broadcast idiom: ray.put once, resolve per wave without
        the actor call deserializing it P times eagerly)."""
        if isinstance(ref, list) and len(ref) == 1 \
                and isinstance(ref[0], ray.ObjectRef):
            return ray.get(ref[0])
        return ref
