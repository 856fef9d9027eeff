"""Grouped-map (applyInPandas) operator surface.

The engine's rule is native expressions first (SURVEY.md section 2.10); this
module is the sanctioned escape hatch for per-group kernels that genuinely
need imperative logic, showing the correct plumbing: groupBy -> applyInPandas
with an explicit output schema, Arrow-batched, one pandas frame per group.

The demo kernel (min-max scaling) is deliberately expressible in SQL too, so
the DuckDB oracle can verify the grouped-map path value-exactly: subtraction
and division of the same IEEE doubles are bit-deterministic, making the
pandas result identical to the window-function formulation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def grouped_minmax_scale(
    df: DataFrame, group_col: str, value_col: str, out_col: str = "scaled"
) -> DataFrame:
    """Per-group min-max scaling: (v - min) / (max - min); NULL when the
    group is constant. Grouped-map shape: state per group fits in memory
    (a group's rows stream into one pandas frame - at 100 TB this bounds
    group size, the same constraint any applyInPandas kernel carries)."""
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_fields}, {out_col} double"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col]
        lo, hi = v.min(), v.max()
        pdf = pdf.copy()
        pdf[out_col] = (v - lo) / (hi - lo) if hi > lo else None
        return pdf

    return df.groupBy(group_col).applyInPandas(kernel, schema)
