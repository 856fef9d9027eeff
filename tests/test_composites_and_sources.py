"""Golden/branch tests for the composite plans, ETL stage, sinks, and the
hermetic geocode enrichment (SURVEY.md section 5 strategy items 2-4)."""

from __future__ import annotations

import csv
import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.functions.quality import (
    date_not_future,
    positive,
    split_valid,
)
from nyc_analytics_database_platform_spark.plans.summary import customer_summary
from nyc_analytics_database_platform_spark.sources.csv_etl import etl_csv_to_parquet
from nyc_analytics_database_platform_spark.sources.geocode import (
    enrich_addresses,
    enrich_addresses_online,
    geocode_dim,
)
from nyc_analytics_database_platform_spark.sources.sinks import (
    to_json_records,
    write_csv,
    write_json,
)

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")


@pytest.fixture(autouse=True, scope="module")
def _tmpdir():
    os.makedirs(TMP, exist_ok=True)
    yield
    shutil.rmtree(TMP, ignore_errors=True)


def test_summary_zeroed_stats_for_orderless_key(spark, sf_dir):
    """A key with no orders in range keeps a row with zeroed counts and NULL
    price stats (reference branch server.py:237-240)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    # a window before any order exists -> every key has zero orders
    out = customer_summary(cust, orders, [1, 2], start="1990-01-01", end="1990-02-01")
    rows = {r["custkey"]: r for r in out.collect()}
    assert set(rows) == {1, 2}
    for r in rows.values():
        assert r["total_orders"] == 0
        assert r["active_orders"] == 0
        assert r["min_price"] is None
        assert r["median_price"] is None
        assert r["revenue"] is None


def test_summary_batch_equals_per_key_runs(spark, sf_dir):
    """Property: the batched one-pass summary equals N independent runs (the
    reference's N+1 loop is the spec, server.py:569-578)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    batch = {r["custkey"]: r for r in customer_summary(cust, orders, [3, 8]).collect()}
    for k in (3, 8):
        single = customer_summary(cust, orders, [k]).collect()
        assert len(single) == 1
        assert batch[k] == single[0]


def test_csv_sink_roundtrip(spark, sf_dir):
    df = load(spark, sf_dir, "nation")
    path = os.path.join(TMP, "nation_csv")
    write_csv(df, path, single_file=True)
    files = glob.glob(os.path.join(path, "*.csv"))
    assert len(files) == 1
    with open(files[0]) as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == df.count()
    assert set(rows[0]) == set(df.columns)


def test_json_sink_and_records(spark, sf_dir):
    df = load(spark, sf_dir, "region")
    path = os.path.join(TMP, "region_json")
    write_json(df, path, single_file=True)
    back = spark.read.json(path)
    assert back.count() == df.count()
    recs = to_json_records(df.orderBy("r_regionkey"))
    assert len(recs) == df.count()
    assert '"r_name"' in recs[0]


def test_etl_csv_to_parquet_with_rejects(spark):
    src = os.path.join(TMP, "sales.csv")
    with open(src, "w") as fh:
        fh.write("sale_id,price,sale_date,city\n")
        fh.write("1,100.50,2024-01-05,  New York \n")
        fh.write("2,-5.00,2024-02-01,Boston\n")  # violates positive(price)
        fh.write("3,42.00,2099-12-31,Chicago\n")  # violates date_not_future
        fh.write("4,7.25,2023-11-11,\n")
    schema = T.StructType(
        [
            T.StructField("sale_id", T.IntegerType()),
            T.StructField("price", T.DoubleType()),
            T.StructField("sale_date", T.DateType()),
            T.StructField("city", T.StringType()),
        ]
    )
    out = os.path.join(TMP, "sales_parquet")
    n_ok, n_bad = etl_csv_to_parquet(
        spark,
        src,
        out,
        schema,
        checks={"price_positive": positive("price"), "date_sane": date_not_future("sale_date")},
    )
    assert (n_ok, n_bad) == (2, 2)
    good = spark.read.parquet(out)
    byid = {r["sale_id"]: r for r in good.collect()}
    assert set(byid) == {1, 4}
    assert byid[1]["city"] == "New York"  # trimmed
    assert byid[4]["city"] is None  # empty -> NULL
    rejects = spark.read.parquet(out + "_rejects")
    viol = {r["sale_id"]: r["violated"] for r in rejects.collect()}
    assert viol == {2: "price_positive", 3: "date_sane"}


def test_split_valid_multiple_violations(spark):
    df = spark.createDataFrame([(-1, None)], "v int, d date")
    _, bad = split_valid(df, {"pos": positive("v"), "nn": F.col("d").isNotNull()})
    assert bad.collect()[0]["violated"] == ["pos", "nn"]


def test_geocode_enrichment_hit_and_miss(spark):
    addrs = spark.createDataFrame(
        [("88-08", "151st Ave ", "queens"), ("999", "NOWHERE RD", "QUEENS")],
        "house_number string, street string, borough string",
    )
    out = enrich_addresses(addrs, geocode_dim(spark)).collect()
    hit = next(r for r in out if r["house_number"] == "88-08")
    miss = next(r for r in out if r["house_number"] == "999")
    assert (hit["borough_code"], hit["block_code"], hit["lot_code"]) == (4, 11458, 29)
    assert miss["key_code"] is None and miss["borough_code"] is None


def test_geocode_online_batched_shape(spark):
    addrs = spark.createDataFrame(
        [("100", "Broadway", "Manhattan"), ("999", "NOWHERE RD", "QUEENS")],
        "house_number string, street string, borough string",
    )
    out = {r["house_number"]: r["key_code"] for r in enrich_addresses_online(addrs).collect()}
    assert out["100"] == "1-00047-0010"
    assert out["999"] is None


def test_schema_evolution_merge_and_union(spark, tmp_path):
    """Schema evolution across parquet generations: an old partition without
    a column and a new partition with it must read as ONE frame via
    mergeSchema (missing values null), and the same contract holds for
    frame-level unionByName(allowMissingColumns=True) - the append-only
    table-evolution path a 100 TB dataset takes when a column is added."""
    import pyspark.sql.functions as F

    v1 = spark.range(5).select(
        F.col("id").alias("k"), F.lit("a").alias("val")
    )
    v2 = spark.range(5, 8).select(
        F.col("id").alias("k"),
        F.lit("b").alias("val"),
        F.lit(1.5).alias("score"),
    )
    base = str(tmp_path / "evo")
    v1.write.parquet(base + "/gen=1")
    v2.write.parquet(base + "/gen=2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        base + "/gen=1", base + "/gen=2"
    )
    assert set(merged.columns) == {"k", "val", "score"}
    rows = {r.k: r for r in merged.collect()}
    assert len(rows) == 8
    assert rows[0].score is None and rows[6].score == 1.5

    unioned = v1.unionByName(v2, allowMissingColumns=True)
    got = {r.k: r.score for r in unioned.collect()}
    assert got[3] is None and got[7] == 1.5
