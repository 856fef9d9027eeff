"""Round-7 invariants: the wide-plan PCA shape (default) must be
bit-for-bit identical to the exploded cross-check shape
(SPARK_GRAFT_PCA_WIDE=off) — same pinned-BIGINT term values, different
physical plan. Locked at sf0.001 here and at sf0.01 via
SPARK_GRAFT_TEST_SF_DIR (the parity-pitfalls rule: iterative float
parity verified at BOTH scales)."""

from __future__ import annotations

import os

import pytest

from nyc_analytics_database_platform_spark.registry import all_specs


@pytest.mark.parametrize(
    "name",
    ["embedding_pca_top_component", "embedding_pca_projection_extremes"],
)
def test_pca_wide_equals_exploded(spark, sf_dir, name):
    spec = all_specs()[name]
    prev = os.environ.get("SPARK_GRAFT_PCA_WIDE")
    try:
        os.environ["SPARK_GRAFT_PCA_WIDE"] = "off"
        exploded = [tuple(r) for r in spec.fn(spark, sf_dir).collect()]
        os.environ["SPARK_GRAFT_PCA_WIDE"] = "auto"
        wide = [tuple(r) for r in spec.fn(spark, sf_dir).collect()]
    finally:
        if prev is None:
            os.environ.pop("SPARK_GRAFT_PCA_WIDE", None)
        else:
            os.environ["SPARK_GRAFT_PCA_WIDE"] = prev
    assert wide == exploded


def test_pca_wide_is_default_and_plan_has_no_explode(spark, sf_dir):
    """The default path must be the wide shape: no Generate (posexplode)
    node in the executed plan of the returned loadings frame."""
    spec = all_specs()["embedding_pca_top_component"]
    assert os.environ.get("SPARK_GRAFT_PCA_WIDE", "auto") != "off"
    df = spec.fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan, plan
