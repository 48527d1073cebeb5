"""Sources: deterministic corpus synthesis + pruned parquet readers."""
