"""Dataset-level operator stages (stateless or actor-pool map_batches)."""
