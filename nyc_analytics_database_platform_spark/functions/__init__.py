"""Native column-expression helpers (no Python UDFs in any hot path)."""

from nyc_analytics_database_platform_spark.functions.numeric import (  # noqa: F401
    ORACLE_AVG,
    ORACLE_SUM,
    exact_avg,
    exact_sum,
)
