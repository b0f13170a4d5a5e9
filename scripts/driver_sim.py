#!/usr/bin/env python
"""Simulate the grading driver's correctness gate exactly: a BARE
SparkSession (none of get_spark's configs — catches hidden conf
dependencies), every `queries()` entry run at sf0.01 and compared against
its `oracle_sql()` through the same canonicalization the parity tests use.

Run from anywhere: `python /root/repo/scripts/driver_sim.py [sf_dir]`.
Exit 1 on any failure.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as ent
    from oracle import compare, dtype_mismatches, oracle_types, run_oracle

    import time

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[16]").appName("driver-sim").getOrCreate()
    )
    print("entry rows:", ent.entry(spark).count())
    q, o = ent.queries(), ent.oracle_sql()
    # DRIVER_SIM_ONLY: comma-separated name-prefix filter (family sweeps at
    # big scale, e.g. "q,text_,cdc_" for the sf1 parity run)
    only = __import__("os").environ.get("DRIVER_SIM_ONLY")
    if only:
        prefixes = tuple(p.strip() for p in only.split(",") if p.strip())
        q = {n: f for n, f in q.items() if n.startswith(prefixes)}
    failed, rows_only, secs = [], 0, {}
    for name in sorted(q):
        t0 = time.perf_counter()
        try:
            df = q[name](spark, sf)
            if name not in o:
                assert df.count() >= 0
                rows_only += 1
                continue
            srows = [tuple(r) for r in df.collect()]
            cols, orows = run_oracle(o[name], sf)
            problems = compare(df.columns, srows, cols, orows)
            # dtype gate: the driver's hash is dtype-sensitive (DuckDB
            # HUGEINT from uncast SUMs never matches a Spark BIGINT)
            problems += [
                f"dtype: {p}"
                for p in dtype_mismatches(dict(df.dtypes), oracle_types(o[name], sf))
            ]
            if problems:
                failed.append((name, problems[:1]))
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            failed.append((name, [f"EXCEPTION {type(e).__name__}: {str(e)[:100]}"]))
        finally:
            secs[name] = time.perf_counter() - t0
    print(
        f"driver sim @ {sf}: {len(q)} queries, {rows_only} rows-only, "
        f"{len(failed)} failed, {sum(secs.values()):.1f}s total "
        "(spark+oracle+compare per query)"
    )
    print("slowest:", {n: round(s, 2) for n, s in
                       sorted(secs.items(), key=lambda kv: -kv[1])[:12]})
    for name, p in failed:
        print(" FAIL", name, p)
    # optional committed artifact (DRIVER_SIM_OUT=/root/repo/DRIVER_SIM_SF01.json)
    out_path = __import__("os").environ.get("DRIVER_SIM_OUT")
    if out_path:
        import json

        with open(out_path, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf,
                    "n_queries": len(q),
                    "rows_only": rows_only,
                    "n_failed": len(failed),
                    "failed": [[n, p] for n, p in failed],
                    "total_s": round(sum(secs.values()), 1),
                    "per_query_s": {n: round(s, 2) for n, s in secs.items()},
                },
                fh,
                indent=1,
            )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
