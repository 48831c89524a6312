"""Declarative query frontends over the relational operator layer.

The reference's interactive engine (GIE) accepts Gremlin and Cypher
and compiles them onto its relational algebra
(``interactive_engine/compiler`` → ``algebra.proto``). This package is
the same idea Ray-Data-first: a Cypher-subset parser + planner
(:mod:`cypher`) and a Gremlin-style fluent traversal builder
(:mod:`traversal`) that both compile onto ``stages/relational``
(cogroup joins, bucketed aggregates, topk, path_expand) — no new
execution machinery, every stage streams.
"""

from graphscope_ray.query.cypher import CypherGraph  # noqa: F401
from graphscope_ray.query.traversal import (  # noqa: F401
    P,
    traversal_source,
)
