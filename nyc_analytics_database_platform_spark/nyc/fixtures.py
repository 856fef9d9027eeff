"""Deterministic NYC-domain fixtures (FIXTURES.md group A).

Hand-authored rows (no RNG) chosen to hit every branch the reference handles
explicitly:
- BBL 1-100-10: both facts; >5 complaint types (top-5+Other branch,
  server.py:412-417); sales with odd AND even per-month counts (median
  interpolation, server.py:224); a month gap inside 2024 (fill branches,
  server.py:337-340); same-date sale ties (ORDER BY stability).
- BBL 2-200-20: requests but no property/sales (empty-sales branch,
  server.py:237-240); active counts 0 < active < total, plus one BBL-level
  all-active and all-inactive mix across statuses.
- BBL 3-300-30: sales but no requests.
- BBL 4-11458-29: the README demo parcel (README.md:38-42) - lookup hits,
  all stats empty (zeroed-stats branch).
"""

from __future__ import annotations

from datetime import date
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession

from nyc_analytics_database_platform_spark.nyc import schema as S

D = Decimal

GEO_ROWS = [
    (1, "Manhattan", 1, 100, 10),
    (2, "Brooklyn", 2, 200, 20),
    (3, "Queens", 3, 300, 30),
    (4, "Queens", 4, 11458, 29),
]

PROPERTY_ROWS = [
    (10, 1, "100 BROADWAY", None, 1920, D("5000.00"), D("2500.00"), 10, 2),
    (11, 1, "102 BROADWAY", "2A", 1985, D("3000.00"), None, 6, 0),
    (30, 3, "1 MAIN ST, BROOKLYN", None, 1960, D("1500.00"), D("800.00"), 3, 1),
]

SALE_ROWS = [
    # BBL 1, Jan 2024: 3 sales (odd count -> exact middle), with a date tie
    (100, 10, D("1000000.00"), date(2024, 1, 10)),
    (101, 10, D("1200000.00"), date(2024, 1, 10)),
    (102, 11, D("900000.00"), date(2024, 1, 20)),
    # BBL 1, Feb 2024: 2 sales (even count -> interpolated median)
    (103, 10, D("800000.00"), date(2024, 2, 5)),
    (104, 11, D("1100000.00"), date(2024, 2, 25)),
    # BBL 1, Apr 2024 (March is the gap month inside the default window)
    (105, 10, D("1500000.00"), date(2024, 4, 1)),
    # BBL 1, outside the 2024 default window (date-range predicate)
    (106, 10, D("700000.00"), date(2023, 6, 15)),
    # BBL 3: sales but no requests
    (107, 30, D("450000.00"), date(2024, 3, 3)),
    (108, 30, D("475000.00"), date(2024, 5, 9)),
]

AGENCY_ROWS = [("NYPD", "Police Department"), ("DOB", "Dept of Buildings"), ("DSNY", "Sanitation")]

COMPLAINT_TYPE_ROWS = [
    (1, "Noise"),
    (2, "Heat/Hot Water"),
    (3, "Illegal Parking"),
    (4, "Blocked Driveway"),
    (5, "Street Condition"),
    (6, "Rodent"),
    (7, "Graffiti"),
]

DESCRIPTOR_ROWS = [(1, "Loud Music"), (2, None)]
RESOLUTION_ROWS = [(1, "Closed by inspection"), (2, None)]

SR_ROWS = [
    # BBL 1: 9 requests over 7 distinct complaint types (-> top-5 + Other),
    # active strictly between 0 and total; months Jan/Feb/Apr 2024 (gap Mar)
    (1000, 1, 1, "NYPD", 1, 1, "100 BROADWAY", date(2024, 1, 5), date(2024, 1, 9), None, "Closed"),
    (1001, 1, None, "NYPD", 1, None, None, date(2024, 1, 6), None, None, "Open"),
    (1002, 1, None, "DOB", 2, None, None, date(2024, 1, 15), None, None, "Pending"),
    (1003, 1, 1, "DSNY", 3, None, None, date(2024, 2, 2), date(2024, 2, 10), None, "Closed"),
    (1004, 1, None, "NYPD", 4, None, None, date(2024, 2, 14), None, None, "In Progress"),
    (1005, 1, None, "DOB", 5, None, None, date(2024, 4, 3), None, None, "Open"),
    (1006, 1, 2, "DSNY", 6, 2, None, date(2024, 4, 18), date(2024, 4, 30), None, "Cancelled"),
    (1007, 1, None, "NYPD", 7, None, None, date(2024, 4, 21), None, None, "Open"),
    (1008, 1, None, "NYPD", 1, None, None, date(2023, 12, 30), None, None, "Closed"),  # outside 2024
    # BBL 2: requests, no property/sales; active == total for this key
    (2000, 2, None, "NYPD", 1, None, None, date(2024, 3, 1), None, None, "Open"),
    (2001, 2, None, "DOB", 2, None, None, date(2024, 3, 2), None, None, "Pending"),
]


def nyc_tables(spark: SparkSession) -> dict[str, DataFrame]:
    return {
        "geographic_area": spark.createDataFrame(GEO_ROWS, S.GEOGRAPHIC_AREA),
        "property": spark.createDataFrame(PROPERTY_ROWS, S.PROPERTY),
        "sale": spark.createDataFrame(SALE_ROWS, S.SALE),
        "service_request": spark.createDataFrame(SR_ROWS, S.SERVICE_REQUEST),
        "agency": spark.createDataFrame(AGENCY_ROWS, S.AGENCY),
        "complaint_type": spark.createDataFrame(COMPLAINT_TYPE_ROWS, S.COMPLAINT_TYPE),
        "complaint_descriptor": spark.createDataFrame(DESCRIPTOR_ROWS, S.COMPLAINT_DESCRIPTOR),
        "resolution": spark.createDataFrame(RESOLUTION_ROWS, S.RESOLUTION),
    }
