"""Streaming operators exposed as driver-checkable queries (rows-only
smoke; populated in Phase 4 — windows, watermark dedup, stateful
materialization run through Structured Streaming with availableNow
triggers and memory sinks, then returned as batch DataFrames)."""

from __future__ import annotations
