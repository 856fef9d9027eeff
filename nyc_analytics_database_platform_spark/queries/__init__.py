"""Query wiring: importing this package registers every query in registry.py.

Each module maps one SURVEY.md section 2 area onto the driver testdata tables.
"""

from nyc_analytics_database_platform_spark.queries import parity_core  # noqa: F401
