"""Stream sources: CDC changelog connectors.

- replay.py: file-based changelog replay (deterministic tests/benchmarks).
- kafka.py: the production connector — thin declarative layer over
  Spark's Kafka source (no broker in this container; covered by the
  replay path which shares every downstream operator).
"""
