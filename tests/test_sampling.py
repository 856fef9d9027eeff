"""Operator-level properties of the deterministic sampling family.

The queries are oracle-checked for exact values; these tests pin the
*properties* that make the operators production-lawful: membership is
partition-independent, splits are total and disjoint, packing conserves
documents and respects the window bound.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load
from nyc_analytics_database_platform_spark.operators.sampling import (
    deterministic_sample,
    pack_sequences,
    split_column,
    stratified_sample,
)


def _ids(df):
    return sorted(r[0] for r in df.select("doc_id").collect())


def test_sample_membership_is_partition_independent(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    a = _ids(deterministic_sample(docs.repartition(3), 0.3))
    b = _ids(deterministic_sample(docs.repartition(17), 0.3))
    c = _ids(deterministic_sample(docs.coalesce(1), 0.3))
    assert a == b == c
    assert 0 < len(a) < docs.count()


def test_sample_is_monotone_in_rate(spark, sf_dir):
    """A row sampled at rate p stays sampled at every rate > p (nested
    samples - what makes a 1% dev corpus a subset of the 10% one)."""
    docs = load(spark, sf_dir, "documents")
    small = set(_ids(deterministic_sample(docs, 0.1)))
    big = set(_ids(deterministic_sample(docs, 0.4)))
    assert small <= big


def test_split_total_and_disjoint(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    tagged = docs.withColumn(
        "split", split_column(F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1})
    )
    counts = {r["split"]: r["n"] for r in tagged.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()  # total: every row assigned
    assert counts["train"] > counts.get("val", 0)  # 0.8 band dominates


def test_stratified_downsamples_target_stratum(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    base = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {
        r["lang"]: r["n"]
        for r in stratified_sample(docs, "lang", {"en": 0.05}, 0.9)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert kept.get("en", 0) / base["en"] < 0.3
    non_en = [lang for lang in base if lang != "en" and lang in kept]
    assert non_en and all(kept[lang] / base[lang] > 0.5 for lang in non_en)


def test_pack_sequences_conserves_docs_and_bounds_bins(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").withColumn(
        "toks", F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    )
    context = 256
    packed = pack_sequences(docs, context, F.size("toks"))
    assert packed.count() == docs.count()  # every doc lands in a bin
    bins = (
        packed.groupBy("bin_id")
        .agg(F.sum("n_tokens").alias("tot"), F.max("n_tokens").alias("biggest"))
        .collect()
    )
    # exclusive-prefix binning: a bin holds at most one straddling doc, so
    # its total never exceeds the window plus its largest member
    assert all(r["tot"] <= context + r["biggest"] for r in bins)
    ids = sorted(r["bin_id"] for r in bins)
    assert ids[0] == 0 and ids == list(range(len(ids)))  # bins are consecutive
