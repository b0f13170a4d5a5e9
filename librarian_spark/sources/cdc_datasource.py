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

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, DataSourceStreamReader

from librarian_spark.sources import segments as _seg

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


class _CdcBatchReader(_seg.SegmentBatchReader):
    """Full-directory replay (backfill / snapshot-rebuild path)."""

    exts = (".jsonl", ".json", ".ndjson")

    def rows_of(self, path: str, fname: str):
        yield from _rows_of(path, fname)


class _CdcStreamReader(_seg.SegmentStreamReader):
    """Micro-batch reader over envelope JSONL segments — offset semantics
    and the true-pause protocol live in :mod:`.segments`."""

    exts = (".jsonl", ".json", ".ndjson")

    def rows_of(self, path: str, fname: str):
        yield from _rows_of(path, fname)


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

    cloudpickle.register_pickle_by_value(_seg)
    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(CdcJsonlDataSource)
