"""Sources: parquet table readers and deterministic synthetic corpora."""
