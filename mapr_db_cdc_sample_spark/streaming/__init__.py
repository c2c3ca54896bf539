"""Structured Streaming layer: the CDC pipeline as a streaming query,
windowed/watermarked aggregations, streaming dedup, and stateful document
materialization."""
