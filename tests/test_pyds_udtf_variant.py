"""Spark 4 API surfaces: custom Python DataSource (partitioned synthetic
corpus), Python UDTF (with native-path parity), and the Variant type for
semi-structured extraction (parity with the from_json path)."""

from __future__ import annotations

import pyspark.sql.functions as F

from nyc_analytics_database_platform_spark.sources.pyds import register


def test_python_datasource_partitioned_and_deterministic(spark):
    register(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("n", 500)
        .option("parts", 8)
        .load()
    )
    rows = df.collect()
    assert len(rows) == 500
    assert len({r.doc_id for r in rows}) == 500  # ranges don't overlap
    assert set(df.columns) == {"doc_id", "text", "lang"}
    # determinism under a different partitioning
    again = (
        spark.read.format("synthetic_docs")
        .option("n", 500)
        .option("parts", 3)
        .load()
        .collect()
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # partition-level parallelism is real
    assert (
        spark.read.format("synthetic_docs")
        .option("n", 500)
        .option("parts", 8)
        .load()
        .rdd.getNumPartitions()
        == 8
    )


def test_udtf_ngrams_matches_native_explode(spark):
    """UDTF = the table-function API; the native transform+posexplode is the
    hot path (UDFs are the slow path) - both must produce identical rows."""

    @F.udtf(returnType="pos: int, ngram: string")
    class Bigrams:
        def eval(self, text: str):
            toks = text.split()
            for i in range(len(toks) - 1):
                yield i, f"{toks[i]} {toks[i + 1]}"

    spark.udtf.register("bigrams", Bigrams)
    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "x y"), (2, "solo")], "doc_id long, text string"
    )
    docs.createOrReplaceTempView("udtf_docs")
    got = spark.sql(
        """
        SELECT d.doc_id, b.pos, b.ngram
        FROM udtf_docs d, LATERAL bigrams(d.text) b
        """
    ).collect()
    native = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "CASE WHEN size(split(text, ' ')) >= 2 THEN "
                "transform(sequence(0, size(split(text, ' ')) - 2), "
                "i -> array_join(slice(split(text, ' '), i + 1, 2), ' ')) "
                "ELSE array() END"
            )
        ).alias("pos", "ngram"),
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, native))
    assert len(got) == 3 + 1 + 0


def test_variant_extract_matches_from_json(spark, sf_dir):
    """VariantType path (parse_json -> variant_get) agrees with the declared
    -schema from_json path on the events props column."""
    from nyc_analytics_database_platform_spark.catalog import load

    ev = load(spark, sf_dir, "events").limit(500).cache()
    via_variant = ev.select(
        "event_id",
        F.variant_get(F.parse_json("props"), "$.k", "bigint").alias("k"),
    ).collect()
    via_json = ev.select(
        "event_id",
        F.from_json("props", "struct<k: bigint>").getField("k").alias("k"),
    ).collect()
    assert sorted(map(tuple, via_variant)) == sorted(map(tuple, via_json))
    ev.unpersist()


def test_python_datasource_stream_equals_batch(spark, tmp_path):
    """The streaming reader over the same id space must emit exactly the
    batch reader's rows (deterministic LCG keyed by (doc_id, seed)), across
    multiple micro-batches with offset tracking."""
    register(spark)
    q = (
        spark.readStream.format("synthetic_docs")
        .option("n", 250)
        .option("batch", 100)  # -> batches of 100, 100, 50
        .load()
        .writeStream.format("memory")
        .queryName("pyds_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    import time

    deadline = time.time() + 60
    while time.time() < deadline:
        got = spark.sql("SELECT COUNT(*) AS n FROM pyds_stream").collect()[0].n
        if got >= 250:
            break
        time.sleep(0.5)
    q.stop()
    stream_rows = sorted(
        map(tuple, spark.sql("SELECT * FROM pyds_stream").collect())
    )
    batch_rows = sorted(
        map(
            tuple,
            spark.read.format("synthetic_docs").option("n", 250).load().collect(),
        )
    )
    assert stream_rows == batch_rows
