"""graphscope_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch rebuild of the capabilities of GraphScope's GRAPE
analytical-engine core (reference: /root/reference, e.g.
``analytical_engine/apps/pagerank/pagerank_networkx.h``,
``apps/projected/wcc_projected.h``) re-expressed as idiomatic Ray Data:

- ``sources``   — parquet readers + deterministic synthetic corpora
- ``functions`` — vectorized per-batch kernels (hashing, text, vectors)
- ``stages``    — Dataset-level operators (relational, dedup, similarity,
                  edge derivation, multimodal plumbing)
- ``state``     — stateful layer: vertex map, CSR shard actor pool,
                  BSP superstep driver, checkpoint/resume
- ``pipelines`` — end-user pipelines (graph algorithms, TPC-H-ish demos,
                  text-processing) with matching SQL oracles

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
