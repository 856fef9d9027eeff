"""Multi-dimensional data-layout keys: Morton (Z-order) interleaving as
native Spark expressions.

The reference serves every range predicate from PostgreSQL B-tree indexes
over heap tables (webserver/server.py:155-167 - dynamic date predicates;
schema.sql - single-column indexes). A columnar lake has no secondary
indexes; its substitute is CLUSTERING: sort the files so parquet row-group
min/max statistics become selective, and the scan skips row groups instead
of probing an index. A single-column sort makes stats selective on ONE
dimension only - rows sorted by date interleave every customer inside
every row group, so a customer predicate skips nothing. Z-ordering
interleaves the BITS of both dimensions into one sort key, so proximity in
the key implies proximity in every dimension: a 2-D box predicate then
skips the large majority of row groups on either dimension or both
(Delta Lake / Iceberg expose the same lever as `ZORDER BY` /
`sort_order(zorder(...))`).

Everything here compiles to JVM-side integer expressions (shift/and/or) -
whole-stage codegen, no UDFs - so the layout write costs one range
repartition + local sort, amortized over every later scan.

`functions/zorder.zvalue` is the per-bit-aggregate twin of `morton_key`
(chosen there because the identical arithmetic is expressible in DuckDB
for oracle parity); this module's magic-number spread is the branch-free
form used on the physical write path. tests/test_scalejoin_plans.py pins
the two bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Magic-number bit spreads: place each of the low 16 bits of x at even bit
# positions (0, 2, 4, ... 30). Classic Morton encoding, see e.g. the public
# "Bit Twiddling Hacks" interleave-by-binary-magic-numbers construction.
_SPREAD_STEPS: tuple[tuple[int, int], ...] = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(col: Column) -> Column:
    """Spread the low 16 bits of `col` to even bit positions (long math).

    Cast to long first: on IntegerType inputs the final shiftleft would
    land the top y bit on bit 31 and wrap to a negative int, scrambling
    the z-order sort for the upper half of the domain.
    """
    x = col.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton_key(x16: Column, y16: Column) -> Column:
    """Interleave two 16-bit bucket ordinals into one 32-bit Morton key
    (x in even bits, y in odd bits). Inputs outside [0, 65535] are masked.
    """
    return _spread16(x16).bitwiseOR(F.shiftleft(_spread16(y16), 1))


def bucket16(col: Column, vmin: Column, vmax: Column) -> Column:
    """Scale a numeric column to a 16-bit bucket ordinal given its bounds
    as (possibly literal, possibly joined-in) columns. The mapping is
    layout-only: downstream predicates run on the ORIGINAL columns, so any
    rounding here affects clustering quality, never answers."""
    span = (vmax - vmin).cast("double")
    frac = (col.cast("double") - vmin.cast("double")) / F.greatest(
        span, F.lit(1e-300)
    )
    return F.least(
        F.greatest(F.floor(frac * 65536).cast("long"), F.lit(0)),
        F.lit(65535),
    )


def zorder_by(
    df: DataFrame,
    dim_x: Column,
    dim_y: Column,
    num_slices: int,
) -> DataFrame:
    """Return `df` re-laid-out by the Morton key of two dimension
    expressions: bucket each dimension to 16 bits against its OWN min/max
    (computed as a 1-row aggregate broadcast back in - no driver collect),
    range-repartition into `num_slices` ascending key slices and sort each
    slice locally. Written as-is, every parquet row group then covers a
    small rectangle of (dim_x, dim_y) space, so footer min/max stats prune
    2-D box predicates on EITHER original column.

    At 100 TB `num_slices` is sized to the target file size (~1 GB); the
    bounds aggregate is a metadata-cheap single pass also obtainable from
    table-level statistics. The Morton key itself is dropped after the
    local sort - the layout, not an extra column, carries the clustering.
    """
    bounds = df.agg(
        F.min(dim_x).alias("_xmin"),
        F.max(dim_x).alias("_xmax"),
        F.min(dim_y).alias("_ymin"),
        F.max(dim_y).alias("_ymax"),
    )
    keyed = (
        df.join(F.broadcast(bounds))
        .withColumn(
            "_zkey",
            morton_key(
                bucket16(dim_x, F.col("_xmin"), F.col("_xmax")),
                bucket16(dim_y, F.col("_ymin"), F.col("_ymax")),
            ),
        )
        .drop("_xmin", "_xmax", "_ymin", "_ymax")
    )
    return (
        keyed.repartitionByRange(num_slices, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )
