"""Differential test: every registered query vs its DuckDB oracle.

This is a local replica of the driver's t2 gate (see verify.py). A query
without an oracle gets a rows-run smoke check instead.
"""

from __future__ import annotations

import pytest

from nyc_analytics_database_platform_spark import registry
from nyc_analytics_database_platform_spark.verify import compare

SPECS = registry.all_specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        # rows-only smoke: materializes without error, schema is stable
        assert df.columns
        df.collect()
        return
    result = compare(name, df, spec.oracle, sf_dir)
    assert result.ok, result.detail
