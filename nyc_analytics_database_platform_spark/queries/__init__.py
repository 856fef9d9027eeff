"""Query wiring: importing this package registers every query in registry.py.

Each module maps one SURVEY.md section 2 area onto the driver testdata tables.
"""

from nyc_analytics_database_platform_spark.queries import (  # noqa: F401
    graph_analytics,
    llm_clusters,
    llm_corpus,
    llm_dedup,
    llm_ivf,
    llm_mixture,
    llm_multimodal,
    llm_sampling,
    llm_similarity,
    llm_text,
    parity_analytics,
    parity_composites,
    parity_core,
    parity_etl,
    parity_extras,
    parity_joins,
    parity_json,
    parity_lifecycle,
    parity_misc,
    parity_profile,
    parity_sketches,
    parity_sql,
    parity_sql_recursive,
    parity_stats,
    parity_timeseries,
    parity_tpch,
    parity_tpch_rest,
    parity_tpch_sub,
    parity_windows,
    streaming_batch,
    streaming_join,
    streaming_stateful,
)
