#!/usr/bin/env python
"""Interleaved conf A/B inside ONE session: session-level effects (JIT
warm-up, host load drift) hit both arms equally, so the per-query delta is
trustworthy even when absolute isolated numbers drift between sessions.

Usage:
  OPT_QUERIES=a,b,c OPT_RUNS=3 \
  OPT_CONF_B="spark.sql.x=y;spark.sql.z=w" python scripts/opt_ab.py

Arm A = current session defaults (get_spark + tune_session).
Arm B = A plus OPT_CONF_B overrides (runtime-settable confs only).
Per round, each query runs A then B; best-of-N per arm is reported.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from librarian_spark.operators import registry as _reg  # noqa: E402
from librarian_spark.operators.registry import load_all  # noqa: E402
from librarian_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("OPT_RUNS", "3"))
    names = [n for n in os.environ.get("OPT_QUERIES", "").split(",") if n.strip()]
    conf_b: dict[str, str] = {}
    for kv in os.environ.get("OPT_CONF_B", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            conf_b[k.strip()] = v.strip()
    specs = load_all()
    spark = get_spark(app_name="librarian-spark-opt-ab")
    # defaults for arm A, captured from the session AFTER tune_session so the
    # reset between arms restores exactly what arm A ran with
    _reg.tune_session(spark)
    base_vals = {k: spark.conf.get(k, None) for k in conf_b}

    def set_arm(arm: str) -> None:
        vals = conf_b if arm == "B" else base_vals
        for k, v in vals.items():
            try:
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
            except Exception:  # noqa: BLE001
                pass
        # tune_session must not undo the arm's confs mid-query
        if arm == "B":
            _reg._CALLER_SESSION_CONF.update(conf_b)
        else:
            for k in conf_b:
                _reg._CALLER_SESSION_CONF.pop(k, None)

    # warm-up (same as bench.py)
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()

    best: dict[str, dict[str, float]] = {n: {} for n in names}
    for _ in range(n_runs):
        for name in names:
            for arm in ("A", "B"):
                set_arm(arm)
                spark.catalog.clearCache()
                try:
                    spark._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()  # noqa: E501
                except Exception:  # noqa: BLE001
                    pass
                t0 = time.perf_counter()
                df = specs[name].spark_fn(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                best[name][arm] = min(best[name].get(arm, float("inf")), dt)
    set_arm("A")
    out = {
        n: {
            "A": round(v["A"], 3),
            "B": round(v["B"], 3),
            "B/A": round(v["B"] / v["A"], 3),
        }
        for n, v in best.items()
    }
    ta = sum(v["A"] for v in best.values())
    tb = sum(v["B"] for v in best.values())
    out["_total"] = {"A": round(ta, 3), "B": round(tb, 3), "B/A": round(tb / ta, 3)}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
