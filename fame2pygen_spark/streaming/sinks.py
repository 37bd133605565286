"""Exactly-once-effect sinks for ``foreachBatch`` pipelines.

``foreachBatch`` offers AT-LEAST-ONCE delivery: after a partial
failure, Structured Streaming replays the epoch with the SAME
``batch_id``.  A bare ``mode("append")`` therefore double-appends on
replay — the failure mode DEPLOYMENT.md documents for the incremental
dedup pipeline (pairs/signatures/corpus desync).  The guard that makes
a parquet sink idempotent is batch-keyed DYNAMIC PARTITION OVERWRITE:
key every output row by ``batch_id`` and overwrite exactly that
partition, so a replay rewrites partition ``batch=<id>`` in place
instead of appending next to the partial first attempt.

This is the file-sink analogue of a transactional sink's
``txnAppId``/``txnVersion`` dedup; at 100 TB the same pattern holds —
the per-batch partition is also the natural retention/compaction unit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F


def idempotent_batch_writer(
    path: str,
    *,
    batch_col: str = "batch",
    partition_cols: tuple[str, ...] = (),
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function that writes each micro-batch
    to ``<path>/<batch_col>=<batch_id>/`` with dynamic partition
    overwrite — replay-idempotent by construction: the second delivery
    of a batch id REPLACES the first attempt's partition (including a
    torn partial write), never appends beside it.

    Extra *partition_cols* nest inside the batch partition (batch
    first, so one batch's replay can never touch another batch's
    files).  Readers see the union of all batch partitions
    (``spark.read.parquet(path)``); the ``batch`` column doubles as
    ingest lineage.

    Usage::

        q = (stream.writeStream
             .foreachBatch(idempotent_batch_writer("/data/pairs"))
             .option("checkpointLocation", ckpt).start())
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn(batch_col, F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(batch_col, *partition_cols)
            .parquet(path)
        )

    return write
