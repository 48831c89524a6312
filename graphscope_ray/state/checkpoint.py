"""Per-superstep checkpoint/resume with lineage manifests (north rule).

Layout (FIXTURES.md F5):

    <ckpt_dir>/<job>/superstep=<k>/part-<fid>.parquet   (one per shard)
    <ckpt_dir>/<job>/superstep=<k>/manifest.json        (written LAST)

A superstep checkpoint is complete iff its manifest exists — parts are
written first (each atomically by its owning shard actor), then the
manifest is published with write-temp-then-rename, so a crash mid-write
never yields a manifest without its parts. Resume picks the newest
complete superstep whose ``config_hash`` matches; mismatched config
(different graph / params / partition count) refuses to resume rather
than silently corrupting (SURVEY §7.4 "manifests must be atomic").

The manifest carries lineage + metrics: superstep number, config hash,
graph shape, per-partition row counts, message counts and scalar
carry-over state (e.g. PageRank's dangling sum) — enough to re-enter
the BSP loop mid-iteration with byte-identical continuation.
"""

from __future__ import annotations

import json
import os

import ray


class CheckpointManager:
    def __init__(self, ckpt_dir: str | None, job: str, config_hash: str):
        self.root = os.path.join(ckpt_dir, job) if ckpt_dir else None
        self.config_hash = config_hash

    def _step_dir(self, k: int) -> str:
        return os.path.join(self.root, f"superstep={k:06d}")

    def save(self, graph, superstep: int, scalars: dict, metrics: dict) -> None:
        if self.root is None:
            return
        d = self._step_dir(superstep)
        os.makedirs(d, exist_ok=True)
        rows = ray.get(
            [
                s.save_state.remote(os.path.join(d, f"part-{f:05d}.parquet"))
                for f, s in enumerate(graph.shards)
            ]
        )
        manifest = {
            "superstep": superstep,
            "config_hash": self.config_hash,
            "num_partitions": graph.P,
            "n_vertices": graph.n_vertices,
            "n_edges": graph.n_edges,
            "per_partition": {str(f): {"rows": r} for f, r in enumerate(rows)},
            "scalars": scalars,
            "metrics": metrics,
        }
        tmp = os.path.join(d, "manifest.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, os.path.join(d, "manifest.json"))

    def latest(self) -> dict | None:
        """Newest complete, config-matching superstep manifest (or None)."""
        if self.root is None or not os.path.isdir(self.root):
            return None
        best = None
        for name in sorted(os.listdir(self.root)):
            mf = os.path.join(self.root, name, "manifest.json")
            if not os.path.exists(mf):
                continue
            with open(mf) as fh:
                m = json.load(fh)
            if m.get("config_hash") == self.config_hash:
                if best is None or m["superstep"] > best["superstep"]:
                    best = m
        return best

    def restore(self, graph, manifest: dict, frontier_all: bool = False) -> int:
        if manifest["num_partitions"] != graph.P:
            raise ValueError(
                f"checkpoint has P={manifest['num_partitions']}, graph has P={graph.P}"
            )
        d = self._step_dir(manifest["superstep"])
        ray.get(
            [
                s.restore_state.remote(
                    os.path.join(d, f"part-{f:05d}.parquet"), frontier_all
                )
                for f, s in enumerate(graph.shards)
            ]
        )
        return manifest["superstep"]
