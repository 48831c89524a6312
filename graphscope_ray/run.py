"""Job entry point: ``ray job submit -- python -m graphscope_ray.run ...``.

The north-rule launch path (SURVEY §3.4; the reference's equivalent is
the mpirun ``run_app`` driver, analytical_engine/test/run_app.h:192-300):
one self-contained driver that reads an edge table from Parquet/CSV,
builds the shard pool, runs the selected algorithm with optional
per-superstep checkpointing, writes the result as resumable partitioned
Parquet, and prints ONE JSON metrics line.

Examples::

    ray job submit -- python -m graphscope_ray.run \
        --algo pagerank --input /data/edges --output /data/pr \
        --src src --dst dst --partitions 64 \
        --ckpt-dir /data/ckpt --ckpt-every 5

    python -m graphscope_ray.run --algo wcc --input edges.parquet \
        --output /tmp/wcc_out

Ray session: under ``ray job submit`` the runtime is already up
(RAY_ADDRESS set) and ``ray.init()`` attaches to it; standalone the
guard initializes a local session. The library itself never inits —
only this CLI, bench.py and the pytest fixture own sessions.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from graphscope_ray.sources.readers import read_parquet_clean as _read_parquet


ALGOS = ("pagerank", "wcc", "cdlp", "bfs", "sssp", "triangles",
         "degree_centrality", "node2vec_walks", "louvain", "kcore",
         "ppr", "scc", "hits", "gnn_sage_mb")


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="python -m graphscope_ray.run")
    p.add_argument("--algo", required=True, choices=ALGOS)
    p.add_argument("--input", required=True,
                   help="edge table: parquet file/dir or .csv")
    p.add_argument("--src", default="src")
    p.add_argument("--dst", default="dst")
    p.add_argument("--weight", default=None,
                   help="edge weight column (sssp)")
    p.add_argument("--vertices", default=None,
                   help="optional vertex parquet (isolated vertices)")
    p.add_argument("--vid", default="vid",
                   help="vertex id column of --vertices")
    p.add_argument("--directed", action="store_true")
    p.add_argument("--partitions", type=int, default=8,
                   help="shard count (size to the DATA, not the cluster)")
    p.add_argument("--output", required=True,
                   help="result directory (partitioned parquet)")
    p.add_argument("--output-partitions", type=int, default=64)
    p.add_argument("--no-resume", action="store_true",
                   help="rewrite finished output partitions")
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--ckpt-every", type=int, default=0)
    # Ingress-style incremental recompute (pagerank/wcc): --input is
    # the FULL (delta'd) edge table; --warm-from is the previous
    # fixpoint — a (vid, value) parquet, or a CheckpointManager job
    # directory given as  <ckpt_dir>::<job>  (state_from_checkpoint)
    p.add_argument("--warm-from", default=None,
                   help="previous-state parquet or <ckpt_dir>::<job>")
    p.add_argument("--delta", default=None,
                   help="added-edge parquet (wcc frontier seeding)")
    # algorithm knobs
    p.add_argument("--alpha", type=float, default=0.85)
    p.add_argument("--max-iter", type=int, default=100)
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--source", type=int, default=0,
                   help="bfs/sssp root; ppr seed")
    p.add_argument("--k", type=int, default=3, help="kcore k")
    # node2vec_walks knobs
    p.add_argument("--walk-length", type=int, default=10)
    p.add_argument("--num-walks", type=int, default=4)
    p.add_argument("--p", type=float, default=1.0, dest="n2v_p")
    p.add_argument("--q", type=float, default=1.0, dest="n2v_q")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--features", default=None,
                   help="gnn_sage_mb: parquet with (vid, feat "
                        "list<float>, label int; label −1 = unlabeled)")
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--fanouts", default="10,5",
                   help="gnn_sage_mb: comma-separated 2-hop fanouts")
    p.add_argument("--hidden", type=int, default=16)
    p.add_argument("--lr", type=float, default=0.1)
    return p


def _read_edges(args) -> "ray.data.Dataset":
    import pyarrow as pa
    import ray.data

    cols = [args.src, args.dst] + ([args.weight] if args.weight else [])
    if args.input.endswith(".csv"):
        ds = ray.data.read_csv(args.input).select_columns(cols)
    else:
        ds = _read_parquet(args.input, columns=cols)

    def norm(t: pa.Table) -> pa.Table:
        out = {"src": t.column(args.src).cast(pa.int64()),
               "dst": t.column(args.dst).cast(pa.int64())}
        if args.weight:
            out["weight"] = t.column(args.weight).cast(pa.float64())
        return pa.table(out)

    return ds.map_batches(norm, batch_format="pyarrow")


def _warm_state(spec: str):
    """Previous-fixpoint source for --warm-from: a (vid, value)
    parquet path, or ``<ckpt_dir>::<job>`` → the newest complete
    CheckpointManager superstep."""
    if "::" in spec:
        from graphscope_ray.pipelines.incremental import (
            state_from_checkpoint,
        )

        ckpt_dir, job = spec.split("::", 1)
        return state_from_checkpoint(ckpt_dir, job)
    return _read_parquet(spec)


def main(argv=None) -> dict:
    args = _build_parser().parse_args(argv)

    import ray

    if not ray.is_initialized():  # ray job submit pre-sets RAY_ADDRESS
        ray.init(include_dashboard=False, logging_level="ERROR")

    from graphscope_ray.pipelines import algorithms
    from graphscope_ray.sources.sink import write_partitioned_parquet
    from graphscope_ray.state.graph import build_graph

    t0 = time.perf_counter()
    edges = _read_edges(args)
    verts = None
    if args.vertices:
        import pyarrow as pa
        import ray.data

        verts = _read_parquet(
            args.vertices, columns=[args.vid]
        ).map_batches(
            lambda t: pa.table({"vid": t.column(args.vid).cast(pa.int64())}),
            batch_format="pyarrow")

    metrics: dict = {"algo": args.algo, "input": args.input}
    if args.algo == "triangles":
        from graphscope_ray.pipelines.triangles import triangle_counts
        result = triangle_counts(edges)
    elif args.algo == "louvain":
        from graphscope_ray.pipelines.louvain import louvain_pool
        result = louvain_pool(edges, num_partitions=args.partitions,
                              vertices=verts)
    elif args.algo == "scc":
        # SCC is inherently directed and needs both arc directions
        # resident (forward color sweep + backward confirm)
        g = build_graph(edges, num_partitions=args.partitions,
                        directed=True, with_reverse=True,
                        extra_vertices=verts)
        metrics.update(vertices=g.n_vertices, arcs=g.n_edges)
        result = algorithms.scc(g)
    elif args.algo == "degree_centrality":
        from graphscope_ray.pipelines.degree import degree_centrality
        g = build_graph(edges, num_partitions=args.partitions,
                        directed=args.directed, extra_vertices=verts)
        result = degree_centrality(edges, g.n_vertices)
        metrics.update(vertices=g.n_vertices, arcs=g.n_edges)
    else:
        g = build_graph(edges, num_partitions=args.partitions,
                        directed=args.directed, extra_vertices=verts)
        metrics.update(vertices=g.n_vertices, arcs=g.n_edges,
                       build_sec=round(time.perf_counter() - t0, 3),
                       build_phases={k: round(v, 3) for k, v
                                     in g.build_phases.items()})
        t1 = time.perf_counter()
        if args.algo == "pagerank":
            if args.warm_from:
                from graphscope_ray.pipelines.incremental import (
                    pagerank_incremental,
                )
                result, m = pagerank_incremental(
                    g, _warm_state(args.warm_from), alpha=args.alpha,
                    max_iter=args.max_iter, tol=args.tol)
                metrics["incremental"] = True
            else:
                result, m = algorithms.pagerank(
                    g, alpha=args.alpha, max_iter=args.max_iter,
                    tol=args.tol, ckpt_dir=args.ckpt_dir,
                    ckpt_every=args.ckpt_every)
            metrics.update(rounds=m["rounds"],
                           edges_per_sec=round(
                               g.n_edges * m["rounds"]
                               / max(m["seconds"], 1e-9), 1))
        elif args.algo == "wcc":
            if args.warm_from:
                if not args.delta:
                    raise SystemExit(
                        "incremental wcc needs --delta (the added "
                        "edges seed the frontier)")
                from graphscope_ray.pipelines.incremental import (
                    wcc_incremental,
                )
                delta = _read_parquet(
                    args.delta, columns=[args.src, args.dst]
                ).rename_columns({args.src: "src", args.dst: "dst"})
                result, m = wcc_incremental(
                    g, _warm_state(args.warm_from), delta)
                metrics["incremental"] = True
            else:
                result, m = algorithms.wcc(g, ckpt_dir=args.ckpt_dir,
                                           ckpt_every=args.ckpt_every)
            metrics.update(rounds=m["rounds"])
        elif args.algo == "cdlp":
            result, m = algorithms.cdlp(g, max_round=args.max_iter
                                        if args.max_iter != 100 else 10,
                                        ckpt_dir=args.ckpt_dir,
                                        ckpt_every=args.ckpt_every)
        elif args.algo == "bfs":
            result, _ = algorithms.bfs(g, source=args.source)
        elif args.algo == "sssp":
            result, _ = algorithms.sssp(g, source=args.source)
        elif args.algo == "kcore":
            result = algorithms.kcore_pool(g, k=args.k)
        elif args.algo == "ppr":
            result, _ = algorithms.personalized_pagerank(
                g, [args.source], alpha=args.alpha,
                max_iter=args.max_iter, tol=args.tol)
        elif args.algo == "hits":
            if args.directed:
                import pyarrow as pa
                grev = build_graph(
                    edges.map_batches(
                        lambda t: pa.table({"src": t.column("dst"),
                                            "dst": t.column("src")}),
                        batch_format="pyarrow"),
                    num_partitions=args.partitions, directed=True,
                    extra_vertices=verts)
            else:
                grev = g        # undirected: A == Aᵀ, one pool serves
            result, _, _ = algorithms.hits(g, grev,
                                           max_iter=args.max_iter,
                                           tol=args.tol)
        elif args.algo == "gnn_sage_mb":
            # mini-batch GraphSAGE node classification: train on the
            # sampled 2-hop batches, predict with one full-forward pass
            import ray.data

            from graphscope_ray.pipelines.gnn_train import (
                sage_minibatch_node_classification,
            )
            if not args.features:
                raise SystemExit("gnn_sage_mb needs --features parquet")
            feats = _read_parquet(args.features)
            fanouts = tuple(int(x) for x in args.fanouts.split(","))
            result, m = sage_minibatch_node_classification(
                g, feats, hidden=args.hidden, fanouts=fanouts,
                batch_size=args.batch_size, epochs=args.epochs,
                lr=args.lr, seed=args.seed, ckpt_dir=args.ckpt_dir)
            metrics.update(
                n_labeled=m["n_labeled"],
                final_loss=m["iters"][-1]["loss"],
                final_train_accuracy=m["iters"][-1]["accuracy"])
        elif args.algo == "node2vec_walks":
            from graphscope_ray.pipelines.walks import random_walks_pool
            result = random_walks_pool(
                g, args.walk_length, num_walks=args.num_walks,
                p=args.n2v_p, q=args.n2v_q, seed=args.seed,
                use_weights=args.weight is not None)
        metrics["algo_sec"] = round(time.perf_counter() - t1, 3)

    sink = write_partitioned_parquet(
        result, args.output,
        key="start" if args.algo == "node2vec_walks" else "vid",
        num_partitions=args.output_partitions,
        resume=not args.no_resume)
    metrics.update(sink)
    metrics["total_sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main(sys.argv[1:])
