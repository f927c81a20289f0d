"""Sources: deterministic synthetic page corpus + parquet readers."""
