#!/usr/bin/env python
"""One-shot dtype audit: for every registry query with an oracle, compare
the DuckDB oracle's result column types against the Spark DataFrame's
dtypes. The driver's value-hash is dtype-sensitive (a DuckDB HUGEINT —
what SUM() and SUM() OVER return for any integer input — hashes
differently from a Spark BIGINT even when values are identical), so every
oracle column must CAST arithmetic-derived integers to the Spark-matching
type. This audit makes that class of mismatch impossible to miss locally.

Run: `python scripts/dtype_audit.py [sf_dir]` (default sf0.001 — Spark
DataFrame *construction* is enough to know dtypes, but pipeline operators
do real work while constructing, so the small SF keeps the sweep fast).
Exit 1 on any mismatch.
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
    from oracle import dtype_mismatches, oracle_types

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("dtype-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    q, o = ent.queries(), ent.oracle_sql()
    bad, errs = [], []
    for name in sorted(q):
        if name not in o:
            continue
        try:
            duck = oracle_types(o[name], sf)
            sdt = dict(q[name](spark, sf).dtypes)
            problems = dtype_mismatches(sdt, duck)
            if problems:
                bad.append((name, problems))
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            errs.append((name, f"{type(e).__name__}: {str(e)[:120]}"))
    print(f"dtype audit @ {sf}: {len(o)} oracles, {len(bad)} mismatched, "
          f"{len(errs)} errored")
    for name, p in bad:
        print(" MISMATCH", name, p)
    for name, e in errs:
        print(" ERROR", name, e)
    return 1 if (bad or errs) else 0


if __name__ == "__main__":
    raise SystemExit(main())
