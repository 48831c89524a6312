"""End-user pipelines: graph algorithms, relational demos, text processing."""
