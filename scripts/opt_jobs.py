#!/usr/bin/env python
"""Round-11: deterministic per-query Spark JOB counts (noise-free evidence
for action-count reductions — timing is host-load-sensitive, job counts are
structural).

For each named query: setJobGroup, build the DataFrame, run the noop sink,
report how many jobs the group submitted (collects/eager checkpoints inside
the operator are jobs too, which is exactly what we count).

Usage: OPT_QUERIES=a,b,c python scripts/opt_jobs.py [tag]
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from librarian_spark.operators.registry import load_all  # noqa: E402
from librarian_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "head"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = [
        n.strip()
        for n in os.environ.get("OPT_QUERIES", "").split(",")
        if n.strip()
    ]
    specs = load_all()
    spark = get_spark(app_name=f"librarian-spark-opt-jobs-{tag}")
    sc = spark.sparkContext
    # warm-up outside any group
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    counts: dict[str, int] = {}
    for name in names:
        spark.catalog.clearCache()
        try:
            spark._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()  # noqa: E501
        except Exception:  # noqa: BLE001
            pass
        group = f"jobs:{name}"
        sc.setJobGroup(group, name)
        df = specs[name].spark_fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        sc.setJobGroup(None, None)
        ids = sc.statusTracker().getJobIdsForGroup(group)
        counts[name] = len(ids)
    print(json.dumps(counts))


if __name__ == "__main__":
    main()
