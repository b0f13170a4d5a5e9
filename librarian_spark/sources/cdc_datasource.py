"""Custom Spark 4 Python DataSource: direct CDC ingestion without the Kafka hop.

The reference's streaming source contract is pull-based with an opaque resumable
position: ``Source.Next(ctx) (Event, error)`` + ``Checkpoint{Position []byte}``
(`/root/reference/pkg/replicator/replicator.go:46-60`,
`pkg/replicator/checkpoint.go:14-18`). Its transport is a Postgres replication
slot or a Mongo change stream; both reduce to "an append-only, position-ordered
stream of Debezium-envelope documents".

This module implements that contract as a **PySpark DataSource** (Spark 4 Python
DataSource API): the stream is a directory of JSONL segment files — each line
one Debezium envelope, exactly the bytes the reference produces to Kafka
(`internal/integrations/kafka/repository.go:142-183`) — treated as immutable
once written, like WAL segments or the reference's own batched parquet files
(`internal/parquet/preserver.go:79-83`). Offsets are ``{"nfiles": K}`` ("first
K segment files consumed"), mirroring the reference's monotonic LSN/resume-token
position (`pkg/postgres/source.go:597-605`); Spark's checkpoint WAL persists
them, replacing ``FilesystemCheckpointer`` (`pkg/replicator/checkpoint.go:57-126`).

Scale design: one InputPartition per unconsumed segment file, so a micro-batch
fans out across executors file-parallel; per-row work is json.loads only (no
Python UDF per field); a 1000-executor cluster ingests as many segments
concurrently as the batch contains. The same class serves batch reads (full
directory replay) for backfill.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

__all__ = ["CdcJsonlDataSource", "CDC_ROW_SCHEMA", "register"]

FORMAT_NAME = "cdc_jsonl"

# Flattened event row — the typed mirror of `replicator.Event`
# (`pkg/replicator/event.go:30-56`): op/ts_ms/source-coordinates, the
# before/after images as verbatim-equivalent JSON text (schemaless, like the
# reference's map[string]interface{}), and the opaque resumable position.
CDC_ROW_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("db", T.StringType()),
        T.StructField("schema_name", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("before", T.StringType()),
        T.StructField("after", T.StringType()),
        T.StructField("position", T.StringType()),
    ]
)


def _segment_files(path: str) -> list[str]:
    """Sorted segment list — lexicographic name order IS the stream order
    (producer names segments monotonically, like WAL segment names)."""
    if not os.path.isdir(path):
        return []
    return sorted(
        f for f in os.listdir(path) if f.endswith((".jsonl", ".json", ".ndjson"))
    )


def _rows_of(path: str, fname: str):
    """Parse one segment file into CDC_ROW_SCHEMA tuples."""
    full = os.path.join(path, fname)
    with open(full, encoding="utf-8") as fh:
        for lineno, line in enumerate(fh):
            line = line.strip()
            if not line:
                continue
            doc = json.loads(line)
            p = doc.get("payload", {})
            src = p.get("source") or {}
            before, after = p.get("before"), p.get("after")
            # Go marshals map[string]interface{} with sorted keys
            # (`internal/integrations/kafka/repository.go:143`); match it.
            dump = lambda v: (
                None
                if v is None
                else json.dumps(v, separators=(",", ":"), sort_keys=True)
            )
            yield (
                p.get("op"),
                p.get("ts_ms"),
                src.get("db"),
                src.get("schema"),
                src.get("table"),
                src.get("lsn"),
                dump(before),
                dump(after),
                f"{fname}:{lineno}",
            )


@dataclass
class _SegmentPartition(InputPartition):
    fname: str


class _CdcBatchReader(DataSourceReader):
    """Full-directory replay (backfill / snapshot-rebuild path)."""

    def __init__(self, options):
        self.path = options["path"]

    def partitions(self):
        return [_SegmentPartition(f) for f in _segment_files(self.path)]

    def read(self, partition: _SegmentPartition):
        yield from _rows_of(self.path, partition.fname)


class _CdcStreamReader(DataSourceStreamReader):
    """Micro-batch reader: offset = number of fully-consumed segment files.

    ``latestOffset`` snapshots the directory; ``partitions(start, end)`` is one
    partition per new segment (executor-parallel); ``commit`` is a no-op because
    segments are retained (replay from any offset — same property the reference
    gets from Postgres slot retention).

    TRUE PAUSE (the reference FSM's suspended state, `fsm.go:50-129`): when
    the ``pause_marker`` option names a file that exists, ``latestOffset``
    re-returns its last answer instead of the directory count — the query
    stays active with its checkpoint and state warm, it simply observes no
    new data until the marker is removed. The freeze needs one prior poll to
    know the held position, so pausing applies to a LIVE query; a query
    restarted under a pre-existing marker polls once before freezing (it
    can never move the offset backward, which would re-deliver segments)."""

    def __init__(self, options):
        self.path = options["path"]
        self.pause_marker = options.get("pause_marker") or ""
        self._last: int | None = None

    def initialOffset(self) -> dict:
        return {"nfiles": 0}

    def latestOffset(self) -> dict:
        if (
            self.pause_marker
            and self._last is not None
            and os.path.exists(self.pause_marker)
        ):
            return {"nfiles": self._last}
        self._last = len(_segment_files(self.path))
        return {"nfiles": self._last}

    def partitions(self, start: dict, end: dict):
        files = _segment_files(self.path)
        return [
            _SegmentPartition(f) for f in files[start["nfiles"] : end["nfiles"]]
        ]

    def read(self, partition: _SegmentPartition):
        yield from _rows_of(self.path, partition.fname)

    def commit(self, end: dict) -> None:
        pass  # segments retained; Spark's WAL owns the committed offset

    def stop(self) -> None:
        pass


class CdcJsonlDataSource(DataSource):
    """``spark.read/readStream.format("cdc_jsonl").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        return CDC_ROW_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _CdcBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _CdcStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the format with a session.

    The module registers itself for cloudpickle BY-VALUE serialization first:
    Spark's Python workers deserialize the DataSource class in fresh
    interpreters that may not have this repo on ``sys.path`` (any driver
    process launched from another cwd) — by-value pickling removes the import
    dependency entirely.
    """
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(CdcJsonlDataSource)
