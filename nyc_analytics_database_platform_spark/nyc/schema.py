"""Spark schemas for the reference's normalized NYC model
(reference: schema.sql:1-74; type mapping in SURVEY.md section 1.2).

DECIMAL is kept for money (the reference's numeric(10,2)/numeric(12,2),
schema.sql:26-27,41); the app layer casts to float only at presentation
(server.py:214,234-236), mirrored in api.py.
"""

from __future__ import annotations

from pyspark.sql import types as T

# status domain: schema.sql:73; "active" = first three (server.py:172)
STATUS_DOMAIN = ("Open", "Pending", "In Progress", "Closed", "Cancelled")
ACTIVE_STATUSES = ("Open", "Pending", "In Progress")

GEOGRAPHIC_AREA = T.StructType(
    [
        T.StructField("geographic_id", T.LongType(), False),
        T.StructField("borough_name", T.StringType(), False),
        T.StructField("borough_code", T.IntegerType(), False),
        T.StructField("block_code", T.IntegerType(), False),
        T.StructField("lot_code", T.IntegerType(), False),
    ]
)

PROPERTY = T.StructType(
    [
        T.StructField("property_id", T.IntegerType(), False),
        T.StructField("geographic_id", T.LongType(), False),
        T.StructField("property_address", T.StringType(), False),
        T.StructField("apartment_number", T.StringType(), True),
        T.StructField("year_built", T.IntegerType(), True),
        T.StructField("gross_sqft", T.DecimalType(10, 2), True),
        T.StructField("land_sqft", T.DecimalType(10, 2), True),
        T.StructField("residential_units", T.IntegerType(), True),
        T.StructField("commercial_units", T.IntegerType(), True),
    ]
)

SALE = T.StructType(
    [
        T.StructField("sale_id", T.IntegerType(), False),
        T.StructField("property_id", T.IntegerType(), False),
        T.StructField("sale_price", T.DecimalType(12, 2), False),
        T.StructField("sale_date", T.DateType(), False),
    ]
)

SERVICE_REQUEST = T.StructType(
    [
        T.StructField("service_request_id", T.IntegerType(), False),
        T.StructField("geographic_id", T.LongType(), False),
        T.StructField("resolution_id", T.IntegerType(), True),
        T.StructField("agency_code", T.StringType(), False),
        T.StructField("complaint_type_id", T.IntegerType(), False),
        T.StructField("descriptor_id", T.IntegerType(), True),
        T.StructField("incident_address", T.StringType(), True),
        T.StructField("created_date", T.DateType(), False),
        T.StructField("closed_date", T.DateType(), True),
        T.StructField("update_date", T.DateType(), True),
        T.StructField("status", T.StringType(), False),
    ]
)

AGENCY = T.StructType(
    [
        T.StructField("agency_code", T.StringType(), False),
        T.StructField("agency_name", T.StringType(), False),
    ]
)

COMPLAINT_TYPE = T.StructType(
    [
        T.StructField("complaint_type_id", T.IntegerType(), False),
        T.StructField("complaint_type_name", T.StringType(), False),
    ]
)

COMPLAINT_DESCRIPTOR = T.StructType(
    [
        T.StructField("descriptor_id", T.IntegerType(), False),
        T.StructField("descriptor_name", T.StringType(), True),
    ]
)

RESOLUTION = T.StructType(
    [
        T.StructField("resolution_id", T.IntegerType(), False),
        T.StructField("description", T.StringType(), True),
    ]
)
