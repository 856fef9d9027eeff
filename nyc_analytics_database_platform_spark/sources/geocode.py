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
If an online lookup is unavoidable, `enrich_addresses_online` is the batched
mapInPandas shape with a pluggable resolver; `urllib_transport` is the real
(stdlib, dependency-free) live HTTP transport behind it - hermetic tests
inject a fake opener, production injects credentials via extra_params.
The default resolver consults the same static dim (no network in tests).
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


def urllib_transport(
    base_url: str,
    extra_params: dict[str, str] | None = None,
    timeout: float = 5.0,
    opener: Callable | None = None,
) -> Transport:
    """A REAL, dependency-free Transport over stdlib urllib - the live half
    of the hermetic/live split (the reference does the same GET with
    `requests`, server.py:84-97, 5s timeout).

    `base_url` is the Geoclient-style address endpoint; `extra_params`
    carries deployment credentials (e.g. a subscription key) so no secret
    lives in engine code. `opener` is injectable (signature of
    urllib.request.urlopen) so the transport's encoding/status/JSON
    handling is contract-testable without a network; production leaves it
    None. Timeouts and HTTP errors resolve to a non-200 status, which
    http_resolver maps to a NULL key (the reference's None branch) - an
    executor never crashes on a flaky lookup."""
    import json as _json
    import urllib.error
    import urllib.parse
    import urllib.request

    def transport(params: dict[str, str]) -> tuple[int, dict]:
        q = dict(params)
        if extra_params:
            q.update(extra_params)
        url = f"{base_url}?{urllib.parse.urlencode(q)}"
        open_fn = opener or urllib.request.urlopen
        try:
            with open_fn(url, timeout=timeout) as resp:
                status = getattr(resp, "status", 200)
                body = resp.read()
            return status, _json.loads(body.decode("utf-8"))
        except urllib.error.HTTPError as e:  # non-2xx with a status
            return e.code, {}
        except Exception:  # timeout, DNS, malformed JSON, ...
            return 599, {}

    return transport


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
