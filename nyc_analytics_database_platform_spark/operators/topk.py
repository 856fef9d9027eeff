"""Top-K + "Other" rollup operator.

The reference keeps the top 5 complaint types by count and sums the tail into
one 'Other' bucket, in Python, after fetching all rows (reference:
server.py:411-419). Here it is a ranking window + relabel + re-aggregate -
fully distributed, no driver-side rows.

Scale: the input to the window is already aggregated (one row per group
label), so the window sort is tiny. For an un-aggregated 100 TB input the
groupBy happens first and reduces cardinality to the label domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_other(
    agg_df: DataFrame,
    label_col: str,
    value_col: str,
    k: int,
    other_label: str = "Other",
    out_label: str | None = None,
) -> DataFrame:
    """Keep the top-k rows of agg_df by value_col; fold the rest into one
    `other_label` row summing value_col. Ties broken by label for
    determinism (the reference relies on PostgreSQL's stable output order;
    an engine cannot)."""
    out_label = out_label or label_col
    w = Window.orderBy(F.desc(value_col), F.col(label_col))
    # lazy plan-deduped cache (tiny: one row per input label); eager
    # materialization here would run a job on every plan BUILD, including
    # explain-only paths
    ranked = agg_df.withColumn("_rn", F.row_number().over(w)).cache()
    # Head rows pass through; the tail becomes ONE synthetic row appended by
    # union (not relabel+regroup, which would silently merge a genuine input
    # label equal to other_label into the rollup row - the reference appends
    # Other as a separate entry, server.py:417).
    head = ranked.filter(F.col("_rn") <= k).select(
        F.col(label_col).alias(out_label), F.col(value_col)
    )
    tail = (
        ranked.filter(F.col("_rn") > k)
        .agg(F.sum(value_col).alias(value_col))
        .filter(F.col(value_col).isNotNull())
        .select(F.lit(other_label).alias(out_label), F.col(value_col))
    )
    return head.unionByName(tail)
