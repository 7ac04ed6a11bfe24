"""Incremental ingest: micro-batch + Structured Streaming surfaces (C12)."""
