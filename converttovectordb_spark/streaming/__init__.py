"""Structured Streaming jobs: continuous ingest + windowed aggregates."""
