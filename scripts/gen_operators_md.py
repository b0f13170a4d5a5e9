#!/usr/bin/env python
"""Regenerate OPERATORS.md from the query registry (run from the repo root)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from librarian_spark.operators.registry import load_all  # noqa: E402


def main() -> None:
    specs = load_all()
    fams: dict[str, list] = {}
    for name, spec in sorted(specs.items()):
        fam = "relational" if name.startswith("q") else name.split("_")[0]
        fams.setdefault(fam, []).append((name, spec))
    lines = [
        "# Operator inventory (auto-generated from the query registry)",
        "",
        "One row per `queries()` entry. **Oracle** = the driver hash-compares the",
        "Spark result against the listed ANSI-SQL run by DuckDB at sf0.01;",
        "rows-only entries are genuinely approximate/bit-level operators whose",
        "guarantees are pinned by unit tests instead.",
        "",
        f"Total: {len(specs)} queries, "
        f"{sum(1 for s in specs.values() if s.oracle)} oracle-checked.",
        "",
    ]
    for fam in sorted(fams):
        lines += [f"## {fam} ({len(fams[fam])})", "",
                  "| query | oracle | what / scale design |", "|---|---|---|"]
        for name, spec in fams[fam]:
            doc = " ".join((spec.doc or "").split())
            lines.append(
                f"| `{name}` | {'✓' if spec.oracle else 'rows-only'} | {doc} |"
            )
        lines.append("")
    Path("OPERATORS.md").write_text("\n".join(lines) + "\n")
    print(f"wrote OPERATORS.md ({len(specs)} queries)")


if __name__ == "__main__":
    main()
