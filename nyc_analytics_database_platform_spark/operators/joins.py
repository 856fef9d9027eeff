"""Join operators beyond plain equi-joins: as-of join and range-band join.

The reference has only inner FK equi-joins (SURVEY.md section 2.3); these are
the engine-parity extensions, implemented with shuffle-friendly plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts <= left_ts within the same `on` key (left outer semantics).

    Implementation: union the two sides tagged, single window sorted by
    (ts, side) per key, and carry the last non-null right value forward
    (`F.last(ignorenulls=True)`). This is the scale-correct as-of join: one
    shuffle on the key, one sort, no row-multiplying join - versus the naive
    join-then-filter-then-rank which materializes |left| x |right| per key.
    Right rows sort before left rows at equal ts, making the join inclusive
    (right_ts == left_ts matches).
    """
    lcols = left.columns
    # The carried right-side payload is ONE struct, not per-column values:
    # last(ignorenulls) over separate columns would skip a right row whose
    # value is genuinely NULL (falling back to an older row) and could stitch
    # different right rows together across columns. The struct is non-null
    # exactly for right rows, so the window always picks one whole row and
    # NULLs inside it survive.
    payload_t = (
        "struct<" + ", ".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols) + ">"
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(payload_t).alias("_r"),
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(*[F.col(c) for c in value_cols]).alias("_r"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = l.unionByName(r).withColumn("_r", F.last("_r", ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).select(
        *lcols, *[F.col(f"_r.{c}").alias(f"asof_{c}") for c in value_cols]
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """For each left row, attach the EARLIEST right row with
    right_ts >= left_ts within the same `on` key (left outer semantics) -
    the forward/"next event" mirror of asof_join, e.g. click -> next
    purchase, quote -> next trade, alert -> next deploy.

    Same union-window shape (one shuffle on the key, no row multiplication):
    the only difference is the traversal order - DESCENDING ts, right rows
    still visited before left rows at equal ts so the match is inclusive -
    and the carried struct is therefore the nearest FUTURE right row."""
    lcols = left.columns
    payload_t = (
        "struct<" + ", ".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols) + ">"
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(payload_t).alias("_r"),
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(*[F.col(c) for c in value_cols]).alias("_r"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").desc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = l.unionByName(r).withColumn("_r", F.last("_r", ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).select(
        *lcols, *[F.col(f"_r.{c}").alias(f"asof_{c}") for c in value_cols]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_by: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: left rows get a deterministic salt derived
    from `salt_by` (a high-cardinality left column), the right side is
    replicated once per salt value, and the join key becomes (on, salt) -
    splitting a hot key's rows across n_salts reducers.

    Result set is identical to `left.join(right, on)`; only the shuffle
    distribution changes. Prefer AQE's automatic skew-join splitting
    (enabled in session.py) - this operator is for engines/paths where AQE
    cannot see the skew (e.g. skewed aggregations feeding the join).
    """
    salt = F.pmod(F.xxhash64(F.col(salt_by)), F.lit(n_salts))
    l = left.withColumn("_salt", salt)
    salts = left.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("_salt")
    )
    r = right.crossJoin(F.broadcast(salts))
    joined = l.join(r, [on, "_salt"])
    return joined.drop("_salt")


def key_max_share(df: DataFrame, on: str) -> float:
    """Fraction of rows held by the single hottest `on` key - the number
    the salt-or-don't-salt decision consults (same statistic as the
    join_key_skew_report query's max_share). Two small aggregates; at
    100 TB this is a planning probe you run once per pipeline (or read
    from the stats/skew report), not per query."""
    row = (
        df.groupBy(on)
        .agg(F.count("*").alias("_sz"))
        .agg(
            (F.max("_sz").cast("double") / F.sum("_sz")).alias("_share")
        )
        .collect()[0]
    )
    return float(row["_share"]) if row["_share"] is not None else 0.0


def maybe_salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_by: str,
    n_salts: int = 8,
    share_threshold: float = 0.05,
    measured_share: float | None = None,
) -> DataFrame:
    """Skew-aware equi-join: consult the measured hot-key share of the left
    side (pass `measured_share` from a stats report such as
    join_key_skew_report, or let this probe it via key_max_share) and pick
    plain vs salted execution. Result set is IDENTICAL either way - only
    the shuffle distribution changes (property-tested in
    tests/test_r3_scale_ops.py).

    Default threshold 0.05: with the session's 32 shuffle partitions a key
    holding >= 5% of rows makes one reducer >= 1.6x the average - the point
    where AQE skew splitting would also kick in. Salting costs an n_salts x
    replication of the right side, so it must not be the default path."""
    share = (
        key_max_share(left, on) if measured_share is None else measured_share
    )
    if share >= share_threshold:
        return salted_join(left, right, on, salt_by, n_salts)
    return left.join(right, on)


def range_band_join(
    fact: DataFrame,
    bands: DataFrame,
    value: Column,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Join fact rows to a small band table on lo <= value < hi.

    The band side is broadcast, so the non-equi condition compiles to a
    BroadcastNestedLoopJoin - O(|fact| * |bands|) comparisons but zero
    shuffle; correct choice while |bands| is tiny. (For large band tables
    the scale path is binning to an equi-key first.)
    """
    cond = (value >= F.col(lo_col)) & (value < F.col(hi_col))
    return fact.join(F.broadcast(bands), cond, "inner")
