#!/usr/bin/env python
"""Regenerate PLANS.md: per-registry-query physical-plan fingerprint.

One row per query via plans.introspect.plan_fingerprint — the SAME helper
`cli explain` prints, so the two surfaces cannot disagree. Run from repo root
after operator changes.
"""
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from librarian_spark.operators.registry import load_all  # noqa: E402
from librarian_spark.plans.introspect import (  # noqa: E402
    TINY_DOMAIN_SINGLE_PARTITION,
    plan_fingerprint,
)
from librarian_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("gen-plans")
    specs = load_all()
    rows = []
    for name, spec in sorted(specs.items()):
        try:
            fp = plan_fingerprint(spec.spark_fn(spark, SF))
        except Exception as e:  # noqa: BLE001
            rows.append((name, "-", "-", "-", "-", f"BUILD-ERROR {type(e).__name__}"))
            continue
        hazards = [
            h + "(bounded)"
            if h == "single-partition" and name in TINY_DOMAIN_SINGLE_PARTITION
            else h
            for h in fp["hazards"]
        ]
        rows.append(
            (name, fp["exchanges"], fp["codegen_stages"],
             "y" if fp["pushed_filters"] else "",
             "y" if fp["broadcast_join"] else "",
             ",".join(hazards) or "")
        )
    lines = [
        "# Plan fingerprints (auto-generated; scripts/gen_plans_md.py)",
        "",
        "Physical-plan summary per registry query at sf0.001 — the scale-review",
        "evidence behind `tests/test_plans.py`: exchange count (each one is a",
        "cluster-wide shuffle), whole-stage-codegen stages, parquet filter",
        "pushdown, broadcast joins, and hazard flags (cartesian / nested-loop /",
        "single-partition exchange). NB: AQE prints non-finalized plans without",
        "codegen annotations, so 0 codegen stages means 'not shown', not",
        "'interpreted'.",
        "Hazard cells are empty except `single-partition(bounded)` rows: those",
        "SinglePartition exchanges are reviewed-and-bounded (the final reduce of",
        "aggregate partials, or a window over a documented tiny domain — the",
        "allowlist with per-query reasons lives in",
        "`librarian_spark/plans/introspect.py::TINY_DOMAIN_SINGLE_PARTITION`).",
        "The global plan gate fails any future query that plans a cartesian,",
        "a nested loop, or an UNLISTED single-partition exchange.",
        "",
        "| query | exchanges | codegen stages | pushed filters | broadcast join | hazards |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append("| " + " | ".join(str(x) for x in r) + " |")
    (REPO / "PLANS.md").write_text("\n".join(lines) + "\n")
    print(f"wrote PLANS.md ({len(rows)} queries)")


if __name__ == "__main__":
    main()
