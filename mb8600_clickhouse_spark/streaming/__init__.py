"""Structured Streaming: ingest pipeline + windowed/stateful analytics."""
