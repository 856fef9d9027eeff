"""Contract tests for the geocode HTTP adapter boundary.

The engine models the reference's per-address Geoclient GET
(server.py:74-115) as an injected Transport callable; these tests pin the
adapter contract with a fake transport - response parsing, NULL semantics,
per-unique-address call economy - plus the end-to-end mapInPandas path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.functions.codec import parse_key
from nyc_analytics_database_platform_spark.sources.geocode import (
    enrich_addresses_online,
    http_resolver,
)

_CANNED = {
    ("88-08", "151ST AVE", "QUEENS"): (200, {"address": {"bbl": "4114580029"}}),
    ("100", "BROADWAY", "MANHATTAN"): (200, {"address": {"bbl": "1000470010"}}),
    ("1", "NOWHERE ST", "QUEENS"): (200, {"address": {}}),  # geocode miss
    ("500", "ERROR AVE", "BRONX"): (503, {}),  # upstream failure
}


def _fake_transport(params: dict[str, str]) -> tuple[int, dict]:
    key = (params["houseNumber"], params["street"], params["borough"])
    return _CANNED.get(key, (200, {"address": {}}))


def test_http_resolver_parses_bbl_and_null_semantics():
    resolve = http_resolver(_fake_transport)
    pdf = pd.DataFrame(
        {
            "house_number": ["88-08", "100", "1", "500"],
            "street": ["151st Ave ", "Broadway", "Nowhere St", "Error Ave"],
            "borough": ["queens", "MANHATTAN", "Queens", "Bronx"],
        }
    )
    out = resolve(pdf)
    # 10-digit BBL -> zero-padded b-bbbbb-llll key code
    assert out.tolist() == ["4-11458-0029", "1-00047-0010", None, None]


def test_http_resolver_one_call_per_unique_address():
    calls: list[tuple[str, str, str]] = []

    def counting_transport(params: dict[str, str]) -> tuple[int, dict]:
        calls.append((params["houseNumber"], params["street"], params["borough"]))
        return _fake_transport(params)

    resolve = http_resolver(counting_transport)
    pdf = pd.DataFrame(
        {
            # 6 rows, 2 unique addresses after normalization
            "house_number": ["100", "100 ", "100", "88-08", "88-08", "100"],
            "street": ["Broadway", "broadway", "BROADWAY", "151st Ave", "151ST AVE", "Broadway"],
            "borough": ["Manhattan", "MANHATTAN", "manhattan", "Queens", "QUEENS", "Manhattan"],
        }
    )
    out = resolve(pdf)
    assert len(calls) == 2  # memoized within the batch
    assert out.tolist()[:3] == ["1-00047-0010"] * 3


def test_enrich_addresses_online_with_http_adapter(spark):
    # defined inside the test so cloudpickle ships it by value to the Python
    # workers (the tests dir is not on the executor module path)
    canned = dict(_CANNED)

    def fake_transport(params: dict[str, str]) -> tuple[int, dict]:
        key = (params["houseNumber"], params["street"], params["borough"])
        return canned.get(key, (200, {"address": {}}))

    addresses = spark.createDataFrame(
        [
            ("88-08", "151st Ave", "Queens"),
            ("100", "Broadway", "Manhattan"),
            ("500", "Error Ave", "Bronx"),
        ],
        "house_number string, street string, borough string",
    )
    out = enrich_addresses_online(addresses, http_resolver(fake_transport))
    parts = parse_key(F.col("key_code"))
    rows = {
        r["house_number"]: r
        for r in out.select(
            "house_number",
            "key_code",
            parts[0].alias("borough_code"),
            parts[1].alias("block_code"),
            parts[2].alias("lot_code"),
        ).collect()
    }
    assert rows["88-08"]["key_code"] == "4-11458-0029"
    assert (
        rows["88-08"]["borough_code"],
        rows["88-08"]["block_code"],
        rows["88-08"]["lot_code"],
    ) == (4, 11458, 29)
    assert rows["100"]["key_code"] == "1-00047-0010"
    # upstream failure surfaces as typed NULLs, never a crash
    # (the reference dereferences the None and crashes, server.py:461,468)
    assert rows["500"]["key_code"] is None
    assert rows["500"]["borough_code"] is None
