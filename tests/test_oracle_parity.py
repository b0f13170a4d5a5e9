"""Every registered query must hash-match its DuckDB oracle (the t2 gate, locally).

Runs at sf0.001 by default (fast); set SPARK_GRAFT_ORACLE_SF_DIR=/root/testdata/sf0.01
to replicate the driver's exact comparison scale.
"""

from __future__ import annotations

import pytest

from librarian_spark.operators.registry import load_all
from tests.oracle import assert_query_matches

SPECS = load_all()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, oracle_sf_dir, name):
    spec = SPECS[name]
    if spec.oracle is None:
        df = spec.spark_fn(spark, oracle_sf_dir)
        assert df.count() >= 0  # rows-only check, mirroring the driver
        return
    assert_query_matches(spark, spec.spark_fn, spec.oracle, oracle_sf_dir, name)
