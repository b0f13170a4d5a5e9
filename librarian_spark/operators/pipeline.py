"""End-to-end pipeline operators: the reference's core capability (snapshot:
source → query → batched parquet → catalog audit,
`/root/reference/internal/archiver/archiver.go:57-130`) expressed as a registry
query so BOTH gates cover it — the driver's oracle comparison proves the write
path round-trips values exactly, and the bench tracks snapshot THROUGHPUT
(the number the reference would be judged on) alongside the query surface.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

from librarian_spark.operators.registry import query

_SNAP_QUERY = "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM source"


@query(
    "pipeline_snapshot",
    oracle="SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders",
    doc="The full snapshot pipeline E2E (librarian YAML config → source read → "
    "native query → batched parquet write → _catalog.json with count parity → "
    "read-back): the returned DataFrame is the data read BACK from the "
    "committed files, so the oracle comparison proves byte-faithful value "
    "round-tripping through the write path, and the bench timing is the "
    "pipeline's snapshot throughput — the single number the reference's whole "
    "job does (archiver.go:57-130). Distributed scan → distributed write; "
    "maxRecordsPerFile batches files like batch_size_num_records; the catalog "
    "count check fails loudly on any row loss.",
)
def pipeline_snapshot(spark: SparkSession, sf: str) -> DataFrame:
    from librarian_spark.config import load_config_str
    from librarian_spark.snapshot import run_snapshot_config

    src = os.path.join(sf, "orders.parquet")
    mtime = int(os.path.getmtime(src)) if os.path.exists(src) else 0
    tag = hashlib.md5(f"{sf}:{mtime}".encode()).hexdigest()[:10]
    out = f"/tmp/librarian_bench_snapshot_{tag}"
    cfg = load_config_str(
        f"""
name: bench-snapshot
archiver:
  source:
    format: parquet
    path: {src}
    query: "{_SNAP_QUERY}"
  preserver:
    batch_size_num_records: 100000
  repository:
    local:
      path: {out}
"""
    )
    rec = run_snapshot_config(spark, cfg)
    if not rec.success or rec.num_source_records != rec.num_records_processed:
        raise RuntimeError(f"snapshot count parity failed: {rec}")
    return spark.read.parquet(out)
