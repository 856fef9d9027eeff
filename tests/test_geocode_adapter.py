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


def test_urllib_transport_contract_with_fake_opener():
    """The stdlib-urllib live transport: query encoding, credential params,
    JSON decode, HTTP error -> non-200, exception -> 599. No network - the
    opener is injected (production passes none and gets urllib.request)."""
    import io
    import json
    import urllib.error

    from nyc_analytics_database_platform_spark.sources.geocode import (
        http_resolver,
        urllib_transport,
    )

    seen_urls = []

    class FakeResp(io.BytesIO):
        status = 200

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_opener(url, timeout=None):
        seen_urls.append(url)
        assert timeout == 5.0
        if "ERROR+AVE" in url or "ERROR%20AVE" in url:
            raise urllib.error.HTTPError(url, 500, "boom", {}, None)
        if "TIMEOUT" in url:
            raise TimeoutError("slow upstream")
        return FakeResp(
            json.dumps({"address": {"bbl": "4114580029"}}).encode()
        )

    t = urllib_transport(
        "https://example.test/geoclient/v2/address.json",
        extra_params={"key": "deployment-secret"},
        opener=fake_opener,
    )
    status, payload = t(
        {"houseNumber": "88-08", "street": "151ST AVE", "borough": "QUEENS"}
    )
    assert status == 200
    assert payload["address"]["bbl"] == "4114580029"
    assert "key=deployment-secret" in seen_urls[0]  # creds injected, not hardcoded
    assert t({"houseNumber": "1", "street": "ERROR AVE", "borough": "BRONX"})[0] == 500
    assert t({"houseNumber": "1", "street": "TIMEOUT", "borough": "BRONX"})[0] == 599

    # end-to-end through the resolver: BBL -> key code, errors -> None
    resolve = http_resolver(t)
    import pandas as pd

    out = resolve(
        pd.DataFrame(
            {
                "house_number": ["88-08", "1"],
                "street": ["151st Ave", "Error Ave"],
                "borough": ["Queens", "Bronx"],
            }
        )
    )
    assert list(out) == ["4-11458-0029", None]
