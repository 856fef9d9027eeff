"""PySpark-native analytics engine with the query surface of
leonjas/NYC-Analytics-Database-Platform (see SURVEY.md), rebuilt Spark-first.

The reference is a Flask app delegating all relational work to PostgreSQL
(reference: webserver/server.py). Here every query shape is a declarative
DataFrame/SQL plan optimized by Catalyst, designed for 100 TB scale:
broadcast joins for small dims, partial aggregation, partition-prunable
predicates, and no driver-side row loops.

Layout:
    session.py    - tuned SparkSession builder
    catalog.py    - table loaders for the driver testdata
    registry.py   - query registry (queries() + oracle_sql() contract)
    functions/    - native column-expression helpers (codec, time, text, vectors)
    operators/    - composable DataFrame transforms (SURVEY.md section 2)
    plans/        - composite query plans (SURVEY.md section 2.11)
    sources/      - readers/sinks (CSV/JSON, geocode dimension)
    streaming/    - Structured Streaming windows/watermark/sessionization
    queries/      - registry wiring of operators onto the testdata tables
"""

__version__ = "0.1.0"
