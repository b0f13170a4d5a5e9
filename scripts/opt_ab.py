#!/usr/bin/env python
"""Interleaved conf A/B inside ONE session: session-level effects (JIT
warm-up, host load drift) hit both arms equally, so the per-query delta is
trustworthy even when absolute isolated numbers drift between sessions.

Usage:
  OPT_QUERIES=a,b,c OPT_RUNS=3 \
  OPT_CONF_B="spark.sql.x=y;spark.sql.z=w" python scripts/opt_ab.py

Arm A = current session defaults (get_spark + tune_session).
Arm B = A plus OPT_CONF_B overrides (runtime-settable confs only).
OPT_SCRATCH_B=<dir> additionally points arm B's scratch root (streaming
checkpoints/state/staged inputs) at <dir> — for the RAM-vs-disk scratch
adjudication, which is a filesystem choice, not a Spark conf.
OPT_PY_B="pkg.mod.ATTR=True;pkg.mod2.ATTR2=False" flips python module
globals per arm (arm B gets the listed values, arm A the originals) — for
code-level adjudications (lazy-vs-eager checkpoints, cache priming) that
have no conf surface. Values are ast.literal_eval'd.

Arm ORDER alternates per round (round 0: A,B; round 1: B,A; ...): the arm
that runs SECOND for a query benefits ~20-25% from the first arm's
identical-plan warm-up (page-cached parquet footers, hot JIT for exactly
that codegen) — measured by an A/A control with both arms identical:
fixed A-then-B order reported B/A = 0.777 where truth is 1.0. With
alternation the same A/A control reads ~1.0. Use an EVEN OPT_RUNS so both
arms get equal first-position runs.
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
    scratch_b = os.environ.get("OPT_SCRATCH_B") or None
    from librarian_spark import scratch as _scratch

    scratch_a = _scratch.scratch_root()  # resolve arm A's root before any flip

    import ast
    import importlib

    py_b: list[tuple[object, str, object, object]] = []  # (mod, attr, a_val, b_val)
    for kv in os.environ.get("OPT_PY_B", "").split(";"):
        if "=" not in kv:
            continue
        dotted, val = kv.split("=", 1)
        mod_name, attr = dotted.strip().rsplit(".", 1)
        mod = importlib.import_module(mod_name)
        py_b.append((mod, attr, getattr(mod, attr), ast.literal_eval(val.strip())))

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
        if scratch_b:
            _scratch._ROOT = scratch_b if arm == "B" else scratch_a
        for mod, attr, a_val, b_val in py_b:
            setattr(mod, attr, b_val if arm == "B" else a_val)
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

    samples: dict[str, dict[str, list[float]]] = {
        n: {"A": [], "B": []} for n in names
    }
    for rnd in range(n_runs):
        for name in names:
            for arm in (("A", "B") if rnd % 2 == 0 else ("B", "A")):
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
                samples[name][arm].append(dt)
    set_arm("A")
    best = {n: {a: min(v) for a, v in s.items()} for n, s in samples.items()}
    out = {
        n: {
            "A": round(v["A"], 3),
            "B": round(v["B"], 3),
            "B/A": round(v["B"] / v["A"], 3),
            "A_runs": [round(x, 2) for x in samples[n]["A"]],
            "B_runs": [round(x, 2) for x in samples[n]["B"]],
        }
        for n, v in best.items()
    }
    ta = sum(v["A"] for v in best.values())
    tb = sum(v["B"] for v in best.values())
    out["_total"] = {"A": round(ta, 3), "B": round(tb, 3), "B/A": round(tb / ta, 3)}
    out["_meta"] = {
        "runs_per_arm": n_runs,
        "arm_order": "alternating per round (round 0: A,B; round 1: B,A; ...)",
        "conf_b": conf_b,
        "scratch_b": scratch_b,
        "py_b": {f"{m.__name__}.{a}": bv for m, a, _av, bv in py_b},
        "n_queries": len(names),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
