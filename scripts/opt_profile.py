#!/usr/bin/env python
"""Round-11 job-level profiler: run one query with the Spark event log on,
then break its wall time into per-job slices (guide §1: find where the time
actually goes before changing anything).

Usage: OPT_QUERY=<name> [OPT_RUNS=1] python scripts/opt_profile.py
Prints per-job (start-offset, duration, description) plus gaps between jobs
(driver-side time: planning, python, filesystem work).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from librarian_spark.operators.registry import load_all  # noqa: E402
from librarian_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    name = os.environ["OPT_QUERY"]
    n_runs = int(os.environ.get("OPT_RUNS", "1"))
    evt_dir = "/tmp/opt_eventlog"
    shutil.rmtree(evt_dir, ignore_errors=True)
    os.makedirs(evt_dir, exist_ok=True)
    spark = get_spark(
        app_name=f"opt-profile-{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evt_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    specs = load_all()
    # warm-up identical to bench.py
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()

    best = float("inf")
    for _ in range(n_runs):
        spark.catalog.clearCache()
        try:
            spark._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()  # noqa: E501
        except Exception:  # noqa: BLE001
            pass
        t0 = time.perf_counter()
        df = specs[name].spark_fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        print(f"run: {dt:.3f}s", file=sys.stderr)
        if dt < best:
            best = dt
            mark = (t0, time.perf_counter())
    spark.stop()

    # parse the event log: jobs inside [mark0, mark1]
    logs = sorted(
        (p for p in Path(evt_dir).rglob("*local-*") if p.is_file()),
        key=lambda p: p.stat().st_mtime,
    )
    events = []
    with open(logs[-1]) as fh:
        for line in fh:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            if e.get("Event") in ("SparkListenerJobStart", "SparkListenerJobEnd"):
                events.append(e)
    jobs: dict[int, dict] = {}
    for e in events:
        jid = e["Job ID"]
        if e["Event"] == "SparkListenerJobStart":
            jobs[jid] = {
                "t0": e["Submission Time"] / 1000.0,
                "desc": (e.get("Properties") or {}).get(
                    "spark.job.description", ""
                ).replace("\n", " | ")[:140],
                "stages": len(e.get("Stage Infos", [])),
                "tasks": sum(
                    s.get("Number of Tasks", 0)
                    for s in e.get("Stage Infos", [])
                ),
            }
        else:
            if jid in jobs:
                jobs[jid]["t1"] = e["Completion Time"] / 1000.0
    # epoch vs perf_counter: align with the best run's wall span via offsets
    done = [j for j in jobs.values() if "t1" in j]
    if not done:
        print("no jobs captured")
        return
    # report ALL jobs with durations and inter-job gaps (last run's tail is
    # what matters; the bench interleaves anyway)
    done.sort(key=lambda j: j["t0"])
    t_first = done[0]["t0"]
    prev_end = None
    print(f"best wall: {best:.3f}s; {len(done)} jobs total across runs")
    for j in done:
        gap = f" gap_before={j['t0']-prev_end:6.3f}s" if prev_end else ""
        print(
            f"  +{j['t0']-t_first:7.3f}s dur={j['t1']-j['t0']:6.3f}s "
            f"stages={j['stages']} tasks={j['tasks']:4d}{gap}  {j['desc']}"
        )
        prev_end = j["t1"]


if __name__ == "__main__":
    main()
