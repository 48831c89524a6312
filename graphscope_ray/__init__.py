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

import logging as _logging


class _EmptySchemaDivergenceFilter(_logging.Filter):
    """Suppress Ray Data's benign empty-schema divergence warning.

    Ray 2.49's sort-based shuffle (inside ``groupby().map_groups``)
    builds zero-row output splits with an EMPTY schema whenever a sort
    range holds no rows (buckets < blocks); the streaming executor then
    logs "Operator produced a RefBundle with a different schema …
    new schema: ." once per operator. Those bundles never reach user
    UDFs (``_apply_udf_to_groups`` yields nothing for empty blocks) and
    every gather point in this package filters raw blocks through
    :func:`stages.relational.typed_blocks`, so the message is pure
    noise for this engine's bucketed operators. Only the exact
    empty-new-schema variants are suppressed — the Arrow repr
    ("new schema: .") and the pandas-block repr
    ("PandasBlockSchema(names=[], types=[])", what the same empty sort
    split prints when the stage ran on pandas blocks) — real schema
    divergence still warns."""

    _EMPTY_REPRS = ("new schema: .",
                    "new schema: PandasBlockSchema(names=[], types=[])")

    def filter(self, record: _logging.LogRecord) -> bool:  # noqa: A003
        msg = record.getMessage()
        return not ("a different schema" in msg
                    and any(r in msg for r in self._EMPTY_REPRS))


_logging.getLogger(
    "ray.data._internal.execution.streaming_executor_state"
).addFilter(_EmptySchemaDivergenceFilter())
