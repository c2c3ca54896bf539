"""Python Data Source API (Spark 4): a custom line-oriented source.

Demonstrates the PySpark `DataSource` extension point — the public way
to plug a format Spark has no built-in reader for (proprietary record
logs, instrument dumps) while keeping partition planning and pushdown
inside the engine: `partitions()` returns one split per file, and each
split is read INSIDE an executor Python worker (batched over Arrow), so
a 100 TB directory fans out across the cluster like any other scan —
the driver only lists files.

Format: `event_id|user_id|event_type|cents` text lines, one record per
line (written by q264 with `df.write.text`).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

LINEREC_SCHEMA = "event_id bigint, user_id bigint, event_type string, cents bigint"


class LineRecDataSource(DataSource):
    """`spark.read.format("linerec").option("path", dir)` — and the
    write side: `df.write.format("linerec").option("path", dir)`
    (see LineRecWriter)."""

    @classmethod
    def name(cls) -> str:
        return "linerec"

    def schema(self) -> str:
        return LINEREC_SCHEMA

    def reader(self, schema):
        return LineRecReader(self.options)

    def writer(self, schema, overwrite):
        return LineRecWriter(self.options, schema, overwrite)


class LineRecReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError(
                "linerec source requires .option('path', <directory>)"
            )

    def partitions(self):
        # one split per data file — the planning step that makes the
        # source parallel; sorted for deterministic split numbering
        files = sorted(
            f for f in os.listdir(self.path)
            if f.startswith("part-") and not f.endswith(".crc")
        )
        return [InputPartition(os.path.join(self.path, f)) for f in files]

    def read(self, partition):
        with open(partition.value, encoding="utf-8") as fh:
            for lineno, line in enumerate(fh, 1):
                line = line.rstrip("\n")
                if not line:
                    continue
                fields = line.split("|")
                if len(fields) != 4:
                    raise ValueError(
                        f"linerec: malformed record at "
                        f"{partition.value}:{lineno} — expected 4 "
                        f"'|'-separated fields, got {len(fields)}: {line!r}"
                    )
                eid, uid, etype, cents = fields
                yield int(eid), int(uid), etype, int(cents)


class LineRecWriter(DataSourceWriter):
    """Write side of the linerec format (Spark 4 Python Data Source
    writer API): each task serializes ITS partition to one
    `part-<partitionId>` file inside executor Python workers — the
    driver never sees row data, so the sink scales out like any file
    sink. `overwrite` clears prior part files at plan time (driver);
    commit() receives one message per task (a failed task's file is
    re-written by its retry under the same deterministic name, so
    commits are idempotent UNDER overwrite). mode('append') is
    rejected: deterministic part names mean a second write would
    silently clobber the first write's files — not append to them —
    so the only honest append implementation would need job-unique
    file names plus a commit/abort rename protocol this demo sink
    does not carry."""

    def __init__(self, options, schema, overwrite):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("linerec sink requires .option('path', <directory>)")
        if not overwrite:
            raise ValueError(
                "linerec sink supports only mode('overwrite'): part file "
                "names are deterministic per partition id, so append would "
                "overwrite earlier output instead of extending it"
            )
        self.fields = [f.name for f in schema.fields]
        if len(self.fields) != 4:
            raise ValueError(
                f"linerec sink writes exactly 4 '|'-separated fields, "
                f"got schema with {len(self.fields)}: {self.fields}"
            )
        os.makedirs(self.path, exist_ok=True)
        if overwrite:
            for f in os.listdir(self.path):
                if f.startswith("part-"):
                    os.remove(os.path.join(self.path, f))

    def write(self, iterator) -> WriterCommitMessage:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        out = os.path.join(self.path, f"part-{pid:05d}")
        n = 0
        with open(out, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write("|".join(str(row[f]) for f in self.fields) + "\n")
                n += 1
        return WriterCommitMessage()

    def commit(self, messages) -> None:
        pass

    def abort(self, messages) -> None:
        pass


def register(spark) -> None:
    """Idempotent registration of the linerec format."""
    try:
        spark.dataSource.register(LineRecDataSource)
    except Exception as e:  # re-register in the same session is the only OK failure
        if "already" not in str(e).lower():
            raise
