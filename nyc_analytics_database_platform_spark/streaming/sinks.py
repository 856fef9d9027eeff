"""foreachBatch sinks: exactly-once delivery to non-transactional stores.

Structured Streaming's checkpoint guarantees each micro-batch is DELIVERED
at least once; making the overall pipeline exactly-once on a plain
parquet/key-value target is the SINK's job and the standard recipe is
(idempotent write) + (batch-id journal):

- the journal marks batch ids already applied, so a post-failure REPLAY of
  a committed batch is a no-op (replay safety is test-pinned, not assumed);
- the write itself is an atomic swap (write to a temp dir, rename over),
  so a crash mid-write leaves the previous target intact - the same
  promote discipline as sources/layout.compact_parquet.

At scale the target would be a transactional table format (the merge is
the same anti-join + union; the journal becomes the format's commit log);
the parquet + journal pair here realizes identical semantics with no
extra infrastructure.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame


def idempotent_upsert_sink(target_dir: str, journal_dir: str, key_col: str):
    """Build a foreachBatch function that MERGEs each micro-batch into
    `target_dir` by `key_col` (new rows replace same-key rows - correct
    for monotone per-key state emitted in update mode), skipping batch
    ids already recorded in `journal_dir`."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        mark = os.path.join(journal_dir, f"batch-{batch_id}")
        if os.path.exists(mark):  # replayed after a commit: no-op
            return
        spark = batch_df.sparkSession
        if os.path.exists(target_dir):
            cur = spark.read.parquet(target_dir)
            merged = cur.join(batch_df, key_col, "left_anti").unionByName(batch_df)
        else:
            merged = batch_df
        tmp = target_dir + "__tmp"
        merged.write.mode("overwrite").parquet(tmp)
        old = target_dir + "__old"
        if os.path.exists(target_dir):
            os.rename(target_dir, old)
        os.rename(tmp, target_dir)
        shutil.rmtree(old, ignore_errors=True)
        os.makedirs(journal_dir, exist_ok=True)
        open(mark, "w").close()

    return apply_batch
