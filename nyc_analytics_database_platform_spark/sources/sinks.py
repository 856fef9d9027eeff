"""Row-export sinks: CSV and JSON (reference: server.py:498-535 CSV download,
:495 jsonify time-series).

The reference streams rows through Python's csv module per request; here the
sinks are distributed writes (one file per partition; coalesce(1) only when a
single download-style file is explicitly wanted and the result is known
small, e.g. an already-aggregated time series).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def write_json(df: DataFrame, path: str, single_file: bool = False) -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)


def to_json_records(df: DataFrame) -> list[str]:
    """Driver-side JSON records for API-response-sized results only (the
    reference's jsonify boundary). Not for large outputs - use write_json."""
    return df.toJSON().collect()
