"""Generic bucketed+sorted table lifecycle: adopt-or-build a persisted
parquet layout keyed for a family of downstream plans.

The reference recomputes every rollup from un-layouted heap tables per
request (reference: webserver/server.py:186-206); PostgreSQL's planner
re-sorts / re-hashes on every query. At 100 TB the winning pattern is the
opposite: pay ONE clustered write per source snapshot, then every
key-partitioned window, aggregation, and join on that key runs
exchange-free forever after. `queries/parity_scalejoin.build_bucketed_pair`
introduced the lifecycle for one join pair; this module is the general
form used by the stateful-lifecycle family (SCD2 point-in-time,
sessionization), where the plans need not just co-partitioning but
co-ORDERING (window sort elimination).

Two mechanical details make sort elimination real, not aspirational:

1. **One file per bucket.** The writer task layout must guarantee each
   bucket's rows land in a single file, or the scan cannot report
   per-bucket sortedness (rows from two sorted files interleave
   arbitrarily). `repartition(n_buckets, key)` uses the same
   murmur3-pmod placement as the bucket spec, so task i receives exactly
   bucket i and writes exactly one file.
2. **`spark.sql.legacy.bucketedTableScan.outputOrdering=true`**
   (set in session.py): Spark only *reports* the SORTED BY order from a
   bucketed scan under this flag, and only when condition (1) holds -
   with it, a Window/SortMergeJoin whose requirement is a prefix of the
   layout order plans with ZERO Exchange and ZERO Sort nodes.

At 100 TB "one file per bucket" means bucket count scales with data
(size buckets to the ~1 GB file target, e.g. 100k buckets for 100 TB),
which is exactly how Hive/Iceberg bucket specs are sized in production.

Freshness: layouts carry a source-mtime stamp (same discipline as
parity_scalejoin) - regenerated inputs force a rewrite, never a stale
serve. A fresh session adopts existing files with CREATE TABLE ...
CLUSTERED BY DDL: the catalog entry, not the data, carries the bucket
spec, so adoption moves zero bytes.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_analytics_database_platform_spark.catalog import load, table_path

_N_BUCKETS = 16


def _scratch(sf_dir: str, name: str) -> str:
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return os.path.join(
        tempfile.gettempdir(), "spark_graft_bucketed", tag, name
    )


def _source_stamp(sf_dir: str, table: str, spec: str) -> str:
    return f"{table}:{os.path.getmtime(table_path(sf_dir, table)):.0f}|{spec}"


def _is_fresh(marker: str, stamp: str) -> bool:
    try:
        with open(marker) as fh:
            return fh.read() == stamp
    except OSError:
        return False


def bucketed_sorted_table(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    key: str,
    sort_cols: tuple[str, ...],
    cols: tuple[str, ...] | None = None,
    n_buckets: int = _N_BUCKETS,
    alias: str | None = None,
) -> DataFrame:
    """Return `table` re-laid-out as a bucketed (on `key`) and per-bucket
    sorted (by `sort_cols`, which must start with `key`) external parquet
    table, building it on first use and adopting the existing files on
    every later session. `cols` prunes the layout to the columns the
    consuming family needs (narrower shuffle-free scans downstream)."""
    name = alias or f"{table}_{key}"
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    tbl = f"bkt_{name}_{tag}"
    base = _scratch(sf_dir, name)
    path = os.path.join(base, "data")
    done = os.path.join(base, "_layout_done")
    spec = f"key={key}|sort={','.join(sort_cols)}|n={n_buckets}|cols={','.join(cols or ())}"
    stamp = _source_stamp(sf_dir, table, spec)

    src = load(spark, sf_dir, table)
    if cols:
        src = src.select(*cols)

    # The marker alone is not proof the data survived: a tmp cleaner can
    # remove the parquet files but leave the marker, and CREATE TABLE ...
    # LOCATION over an empty dir would silently serve zero rows (ADVICE
    # r9). Adoption requires marker AND at least one data file.
    def _has_data() -> bool:
        try:
            return any(f.endswith(".parquet") for f in os.listdir(path))
        except OSError:
            return False

    if not (_is_fresh(done, stamp) and _has_data()):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            src.repartition(n_buckets, F.col(key))
            .write.format("parquet")
            .bucketBy(n_buckets, key)
            .sortBy(*sort_cols)
            .option("path", path)
            .mode("overwrite")
            .saveAsTable(tbl)
        )
        os.makedirs(base, exist_ok=True)
        with open(done, "w") as fh:
            fh.write(stamp)
    elif tbl not in {t.name for t in spark.catalog.listTables()}:
        ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in src.schema.fields
        )
        spark.sql(
            f"""CREATE TABLE IF NOT EXISTS {tbl} ({ddl})
                USING parquet CLUSTERED BY ({key})
                SORTED BY ({', '.join(sort_cols)})
                INTO {n_buckets} BUCKETS LOCATION '{path}'"""
        )
    return spark.table(tbl)
