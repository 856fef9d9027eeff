"""Frequency-sketch query surfaces (operators/sketches.py).

Heavy hitters over the events stream: the sketch pass bounds memory by
capacity * partitions (domain-independent), the exact verify pass makes the
answer oracle-exact - so the DuckDB oracle is the plain GROUP BY / HAVING
the sketch replaces at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.operators.sketches import heavy_hitters
from nyc_analytics_database_platform_spark.registry import register

_PHI = 0.005  # heavy hitter = value carrying > 0.5% of all events


@register(
    "heavy_hitters_users",
    oracle=f"""
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM events
        GROUP BY user_id
        HAVING COUNT(*) > (SELECT COUNT(*) FROM events) * {_PHI}
        ORDER BY n_rows DESC, user_id
    """,
    tags=("sketch", "heavy-hitters", "llm"),
)
def heavy_hitters_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users carrying > phi = 0.5% of event traffic, via per-partition
    Misra-Gries summaries (mapInPandas, Arrow-batched) -> candidate union ->
    broadcast-semi-join exact recount -> threshold filter. The sketch only
    prunes; the output counts are exact, so the oracle is the direct
    GROUP BY/HAVING. At 100 TB the GROUP BY over a high-cardinality key is
    the expensive plan; the sketch caps state at capacity x partitions."""
    events = load(spark, sf_dir, "events", parallel=True)
    return heavy_hitters(events, "user_id", phi=_PHI)
