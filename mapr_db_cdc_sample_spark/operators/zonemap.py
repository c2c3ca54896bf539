"""File-level zone maps (manifest-based file pruning) over plain parquet.

What Iceberg/Delta manifests do, built from Spark primitives: cluster the
table on write (range-partition + sort on the zone key), record per-file
min/max of the key (the "zone map" — one tiny row per file), and at query
time intersect the predicate with the manifest to plan a scan of ONLY the
overlapping files. Parquet row-group stats give this *within* a file;
the manifest gives it *across* files, which is what matters at 100 TB
where a table is 10^5-10^6 files and the per-file footer round-trips
alone would dominate planning.

The manifest is collected to the driver at planning time — it is
O(files) tiny rows (the same thing every table format's planner reads),
not data. Determinism: the clustered write sorts on the zone key, so
min/max per file are data-determined; the pruned result is
hash-identical to the full-table filter by construction (the residual
predicate still applies — pruning only removes files that cannot match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_clustered(df: DataFrame, path: str, zone_key: str, n_files: int) -> None:
    """Range-partition + sort on `zone_key` into ~n_files files: tight,
    non-overlapping per-file min/max — the layout zone maps need (random
    placement gives every file the full key range and prunes nothing)."""
    (
        df.repartitionByRange(n_files, F.col(zone_key))
        .sortWithinPartitions(zone_key)
        .write.mode("overwrite")
        .parquet(path)
    )


def build_manifest(spark: SparkSession, path: str, zone_key: str) -> list[tuple]:
    """[(file, lo, hi)] per data file — the zone map. One aggregate over
    the key column only (column-pruned scan); at 100 TB this is built
    incrementally at write time, never by re-scanning."""
    stats = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("f"), F.col(zone_key).alias("k"))
        .groupBy("f")
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .collect()
    )
    return [(r.f, r.lo, r.hi) for r in stats]


def pruned_scan(
    spark: SparkSession,
    manifest: list[tuple],
    lo,
    hi,
) -> tuple[DataFrame, int, int]:
    """(df, n_selected_files, n_total_files): scan ONLY the files whose
    [lo, hi] zone overlaps the predicate range; the caller re-applies the
    exact predicate as the residual filter."""
    selected = [f for f, flo, fhi in manifest if flo <= hi and fhi >= lo]
    if not selected:  # degenerate: nothing can match; empty frame, same schema
        return spark.read.parquet(manifest[0][0]).limit(0), 0, len(manifest)
    return spark.read.parquet(*selected), len(selected), len(manifest)
