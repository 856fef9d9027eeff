"""MERGE / upsert: apply a CDC change batch to a snapshot.

The engine analogue of SQL MERGE (and of the copy-on-write commit in table
formats): given a target snapshot and a batch of keyed changes
(insert / update / delete), produce the next snapshot. Expressed as one
anti-join plus a union:

    next = (target ANTI JOIN change_keys) UNION ALL (upsert rows)

Scale shape: the anti-join shuffles both sides on the key ONCE (or zero
times when the target is bucketed on the key - the change batch is tiny by
comparison and broadcasts), and the union is free. No window, no driver
materialization, map-side combinable downstream. This is exactly the
partition-level rewrite a 100 TB copy-on-write table performs per commit;
pair with sources/layout.write_partitioned so only partitions containing
changed keys rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OP_COL = "_op"  # 'U' upsert (insert-or-update), 'D' delete


def merge_upsert(target: DataFrame, changes: DataFrame, key_col: str) -> DataFrame:
    """Apply `changes` (target schema + an OP_COL of 'U'/'D') to `target`.

    Semantics match SQL MERGE with WHEN MATCHED UPDATE / WHEN NOT MATCHED
    INSERT / WHEN MATCHED AND op='D' DELETE: every change key's old row is
    removed, then 'U' rows are appended. The change batch must carry at most
    one row per key (CDC compaction happens upstream); this is asserted
    lazily by the key join, not a driver-side check.
    """
    change_keys = changes.select(key_col)
    survivors = target.join(change_keys, key_col, "left_anti")
    upserts = changes.filter(F.col(OP_COL) == "U").drop(OP_COL)
    return survivors.unionByName(upserts)
