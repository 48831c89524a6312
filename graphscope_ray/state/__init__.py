"""Stateful layer: CSR shard actors, graph build, checkpoint/resume."""
