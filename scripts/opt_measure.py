#!/usr/bin/env python
"""Optimization-round measurement: isolated per-query timing + plan capture.

For each named query (or a comma list via OPT_QUERIES):
  - builds the DataFrame, captures .explain("formatted") to
    plans/$OPT_PLANS_DIR/<name>_<tag>.txt   (tag = before/after, argv[1];
    OPT_PLANS_DIR defaults to r12)
  - times construction + noop-sink execution best-of-N (OPT_RUNS, default 3),
    same methodology as bench.py (clearCache + StateStore.stop between runs)
  - prints one JSON line {name: best_sec, ...}

Usage: OPT_QUERIES=q79_rfm_segmentation,... python scripts/opt_measure.py before
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from librarian_spark.operators.registry import load_all  # noqa: E402
from librarian_spark.plans.introspect import formatted_plan  # noqa: E402
from librarian_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("OPT_RUNS", "3"))
    names = [
        n.strip()
        for n in os.environ.get("OPT_QUERIES", "").split(",")
        if n.strip()
    ]
    specs = load_all()
    unknown = [n for n in names if n not in specs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(1)

    extra = {}
    for kv in os.environ.get("OPT_EXTRA_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k.strip()] = v.strip()
    spark = get_spark(app_name="librarian-spark-opt-measure", extra_conf=extra)
    # runtime-settable confs must also be (re)applied when the JVM session
    # already exists, and survive tune_session re-application per query
    from librarian_spark.operators import registry as _reg

    _reg._CALLER_SESSION_CONF.update(extra)
    for k, v in extra.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # noqa: BLE001
            pass
    plans_dir = REPO / "plans" / os.environ.get("OPT_PLANS_DIR", "r12")
    plans_dir.mkdir(parents=True, exist_ok=True)

    # same warm-up as bench.py
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()

    best: dict[str, float] = {}
    for _ in range(n_runs):
        for name in names:
            spark.catalog.clearCache()
            try:
                spark._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()  # noqa: E501
            except Exception:  # noqa: BLE001
                pass
            spark.sparkContext.setJobDescription(f"opt:{name}")
            t0 = time.perf_counter()
            df = specs[name].spark_fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            best[name] = min(best.get(name, float("inf")), dt)
            spark.sparkContext.setJobDescription(None)
    # capture the plan once, after timing (plan capture triggers analysis
    # work that must not pollute the first timed run)
    for name in names:
        df = specs[name].spark_fn(spark, sf_dir)
        (plans_dir / f"{name}_{tag}.txt").write_text(formatted_plan(df))
    print(json.dumps({n: round(t, 3) for n, t in best.items()}))


if __name__ == "__main__":
    main()
