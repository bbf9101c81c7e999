"""Storage: atomic parquet snapshot commit/restore."""
