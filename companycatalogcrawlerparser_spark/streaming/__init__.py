"""Structured Streaming ingestion of crawl event logs."""
