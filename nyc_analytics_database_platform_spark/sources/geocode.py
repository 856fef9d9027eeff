"""Hermetic geocode enrichment - the NYC Geoclient HTTP lookup modeled as a
static dimension join.

The reference calls api.nyc.gov per address with a 5s timeout and slices the
BBL out of the response (reference: server.py:74-115); compare dereferences
a failed lookup and crashes (server.py:461,468). Engine version: a geocode
dimension table (address -> key string) broadcast-joined to the address
batch; misses surface as NULL keys (typed, no crash); the key string is
decomposed with the native codec.

At 100 TB of addresses the dimension is the full geocode snapshot and the
join is a plain broadcast/shuffle hash join - no per-row HTTP path at all.
If an online lookup is unavoidable, `enrich_addresses_online` shows the
batched mapInPandas shape with a pluggable resolver (the real HTTP client
isn't available here, so the default resolver consults the same static dim).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nyc_analytics_database_platform_spark.functions.codec import parse_key

GEOCODE_SCHEMA = T.StructType(
    [
        T.StructField("house_number", T.StringType()),
        T.StructField("street", T.StringType()),
        T.StructField("borough", T.StringType()),
        T.StructField("key_code", T.StringType()),  # 'b-bbbbb-llll'
    ]
)

# Static fixture snapshot (FIXTURES.md A6); includes the reference demo
# address (README.md:38-42).
GEOCODE_ROWS = [
    ("88-08", "151ST AVE", "QUEENS", "4-11458-0029"),
    ("100", "BROADWAY", "MANHATTAN", "1-00047-0010"),
    ("1", "MAIN ST", "BROOKLYN", "3-00123-0001"),
    ("350", "5TH AVE", "MANHATTAN", "1-00835-0041"),
]


def geocode_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(GEOCODE_ROWS, GEOCODE_SCHEMA)


def _normalized(col: str) -> F.Column:
    return F.upper(F.trim(F.col(col)))


def enrich_addresses(addresses: DataFrame, dim: DataFrame) -> DataFrame:
    """Left-join address rows to the geocode dimension on the normalized
    natural key; decompose the key code into its three int parts. Misses keep
    NULLs (the reference's None branch, server.py:101-102,376-377)."""
    a = addresses
    d = dim.select(
        _normalized("house_number").alias("_hn"),
        _normalized("street").alias("_st"),
        _normalized("borough").alias("_bo"),
        "key_code",
    )
    joined = a.join(
        F.broadcast(d),
        (_normalized("house_number") == F.col("_hn"))
        & (_normalized("street") == F.col("_st"))
        & (_normalized("borough") == F.col("_bo")),
        "left",
    ).drop("_hn", "_st", "_bo")
    parts = parse_key(F.col("key_code"))
    return (
        joined.withColumn("borough_code", parts[0])
        .withColumn("block_code", parts[1])
        .withColumn("lot_code", parts[2])
    )


Resolver = Callable[[pd.DataFrame], pd.Series]

# Transport: one external lookup. Takes the Geoclient query params
# ({'houseNumber', 'street', 'borough'}) and returns (status_code, payload)
# - exactly the (response.status_code, response.json()) pair of the
# reference's per-address GET (server.py:92-97). Production injects a
# requests/urllib3-backed transport (adding its API key and timeout);
# tests inject a fake. The engine never constructs an HTTP client itself,
# so the hermetic/live split is this one callable.
Transport = Callable[[dict[str, str]], tuple[int, dict]]


def http_resolver(transport: Transport) -> Resolver:
    """Build a batched Resolver from a Transport.

    Mirrors the reference's response handling (server.py:95-109): non-200 or
    a missing ``address.bbl`` field resolves to NULL; otherwise the 10-digit
    BBL string becomes the engine's zero-padded ``b-bbbbb-llll`` key code.
    The transport is consulted once per UNIQUE normalized address per batch
    (the reference pays one round-trip per row), and the per-executor batch
    granularity comes from mapInPandas, so a production transport can add
    cross-batch memoization without changing this contract.
    """

    def resolve(pdf: pd.DataFrame) -> pd.Series:
        memo: dict[tuple[str, str, str], str | None] = {}

        def one(h: object, s: object, b: object) -> str | None:
            key = (str(h).strip().upper(), str(s).strip().upper(), str(b).strip().upper())
            if key not in memo:
                status, payload = transport(
                    {"houseNumber": key[0], "street": key[1], "borough": key[2]}
                )
                bbl = (
                    payload.get("address", {}).get("bbl") if status == 200 else None
                )
                memo[key] = (
                    f"{bbl[0]}-{bbl[1:6]}-{bbl[6:10]}"
                    if bbl and len(str(bbl)) == 10
                    else None
                )
            return memo[key]

        return pd.Series(
            [
                one(h, s, b)
                for h, s, b in zip(pdf["house_number"], pdf["street"], pdf["borough"])
            ],
            index=pdf.index,
            dtype="object",
        )

    return resolve


def enrich_addresses_online(
    addresses: DataFrame, resolver: Resolver | None = None
) -> DataFrame:
    """Batched external-lookup shape: mapInPandas over address partitions,
    one resolver call per Arrow batch (never per row - the reference pays one
    HTTP round-trip per address, server.py:84-97).

    The default resolver is the static-dim lookup (hermetic stand-in; a real
    deployment injects an HTTP-client resolver with memoization).
    """
    rows = {(h.upper(), s.upper(), b.upper()): k for h, s, b, k in GEOCODE_ROWS}

    def default_resolver(pdf: pd.DataFrame) -> pd.Series:
        return pd.Series(
            [
                rows.get(
                    (
                        str(h).strip().upper(),
                        str(s).strip().upper(),
                        str(b).strip().upper(),
                    )
                )
                for h, s, b in zip(
                    pdf["house_number"], pdf["street"], pdf["borough"]
                )
            ],
            index=pdf.index,
            dtype="object",
        )

    resolve = resolver or default_resolver
    out_schema = T.StructType(
        list(addresses.schema.fields) + [T.StructField("key_code", T.StringType())]
    )

    def lookup(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["key_code"] = resolve(pdf)
            yield pdf

    return addresses.mapInPandas(lookup, out_schema)
