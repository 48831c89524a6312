"""The flagship pipeline: source-code corpus → link graph → analytics.

End-to-end (north_star in BASELINE.json): read the repo-file Parquet
table → verify/append content sha256 → extract dependency keys →
derive the repo→repo edge table → hash-partitioned CSR shards in an
actor pool → PageRank / WCC / CDLP supersteps → (oid, value) results.

The Ray-native restatement of the reference's session flow
(SURVEY §3.4): the client/coordinator/engine/vineyard process
boundaries collapse into driver / Dataset tasks / shard actors /
object store.
"""

from __future__ import annotations

import ray.data

from graphscope_ray.sources.readers import read_parquet_clean as _read_parquet
from graphscope_ray.pipelines import algorithms
from graphscope_ray.stages.derive import (
    derive_edges,
    extract_dep_keys,
    with_sha256,
)
from graphscope_ray.state.graph import ShardedGraph, build_graph
from graphscope_ray.state.vertex_map import (
    add_vid_columns,
    attach_oids,
    build_vertex_map,
    canonical_components,
)


def read_corpus(path: str) -> ray.data.Dataset:
    """Read the (repo, path, commit, lang, content) table, pruning to the
    columns the pipeline needs at the parquet reader."""
    return _read_parquet(path, columns=["repo", "path", "content"])


def corpus_to_edges(corpus: ray.data.Dataset, cap_per_key: int = 64) -> ray.data.Dataset:
    """(repo,path,content) → directed weighted edges (src, dst, weight)."""
    pairs = extract_dep_keys(corpus)
    return derive_edges(pairs, cap_per_key=cap_per_key)


def build_repo_graph(
    corpus: ray.data.Dataset,
    num_partitions: int = 8,
    directed: bool = True,
    cap_per_key: int = 64,
):
    """Corpus → (ShardedGraph over vids, vertex map Dataset).

    The vertex set is every distinct repo in the corpus (repos whose
    files share no keys become isolated vertices — they must exist, as
    in the reference's vertex map, global_vertex_map.h:44-68).
    """
    # int64 fast path: repo→vid and key→hash computed AT EXTRACT (both
    # pure functions, identical to the vertex map's), so the derive and
    # routing shuffles move 17-byte int rows instead of two strings and
    # no oid→vid join stage exists. Unweighted multigraph pair rows
    # ship as-is; the exact (src,dst) dedup happens shard-locally at
    # build (all copies of an arc hash to the same owner).
    from graphscope_ray.stages.derive import (
        derive_edges_vids,
        extract_dep_keys_vids,
    )

    pairs = extract_dep_keys_vids(corpus)
    edges = derive_edges_vids(pairs, cap_per_key=cap_per_key)
    vmap = build_vertex_map(corpus.select_columns(["repo"]), "repo")
    graph = build_graph(
        edges,
        num_partitions=num_partitions,
        directed=directed,
        extra_vertices=vmap,
        dedup_arcs=True,
    )
    if graph.n_vertices != vmap.count():
        raise ValueError(
            "vid hash collision detected at graph build: "
            f"{graph.n_vertices} graph vertices != {vmap.count()} map rows"
        )
    return graph, vmap


def pagerank_repos(graph: ShardedGraph, vmap, **kw):
    """PageRank over the repo graph → (repo, pagerank) + metrics."""
    state, metrics = algorithms.pagerank(graph, **kw)
    out = attach_oids(state, vmap, "repo", graph.P).select_columns(["repo", "pagerank"])
    return out, metrics


def wcc_repos(graph: ShardedGraph, vmap, **kw):
    """WCC over the repo graph → (repo, component_repo = min member repo)."""
    state, metrics = algorithms.wcc(graph, **kw)
    out = canonical_components(state, vmap, "repo", graph.P)
    return out, metrics


def cdlp_repos(graph: ShardedGraph, vmap, max_round: int = 10, **kw):
    """CDLP over the repo graph → (repo, label_repo): labels relabeled
    from vids back to the repo string that seeded them."""
    state, metrics = algorithms.cdlp(graph, max_round=max_round, **kw)
    named = attach_oids(state, vmap, "repo", graph.P).materialize()
    lab = vmap.select_columns(["repo", "vid"]).rename_columns(
        {"repo": "label_repo", "vid": "label"}
    )
    out = named.join(lab, join_type="inner", num_partitions=graph.P, on=("label",))
    return out.select_columns(["repo", "label_repo"]), metrics
