"""foreachBatch CDC upsert: maintain a keyed snapshot table from a
change stream (SURVEY.md §2.8 T1-T3 as a *continuously merged* sink
rather than an append sink; reference analog: the keep-latest dedupe
the batch pipeline re-runs per schedule, go-incremental-ingest-elt.py:
200-213, here applied incrementally per micro-batch).

foreachBatch is Structured Streaming's escape hatch for sinks that
need a MERGE: each micro-batch arrives as a batch DataFrame together
with a monotonically increasing ``batch_id``, and the function applies
it transactionally-enough by making the write idempotent in
``batch_id`` (a replayed batch after a crash rewrites the same
versioned snapshot, so at-least-once delivery composes to
exactly-once state).

Snapshot layout: versioned directories ``v{batch_id}`` under
``snapshot_dir``, plus a tiny ``_LATEST`` pointer file written last —
readers resolve the pointer, writers never mutate a published version
(the swap is the pointer write, same commit-after-write discipline as
sources.state.BookmarkStore). Each merge unions the previous snapshot
with the batch and keeps the latest row per primary key.

Scale path (100 TB snapshot): a full-snapshot rewrite per batch is
O(snapshot) — production buckets the snapshot by pmod(xxhash64(pk), B)
at write time and rewrites only the buckets the batch touches
(partition-pruned read + dynamic partition overwrite), making each
merge O(delta · snapshot/B). The versioned-pointer commit protocol is
unchanged; only the copy narrows. A table format with native MERGE
(Iceberg/Delta/Hudi) slots behind the same callback.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession

from ..operators.windows import dedupe_keep_latest

_POINTER = "_LATEST"


def read_snapshot(spark: SparkSession, snapshot_dir: str) -> DataFrame | None:
    """Resolve the pointer and read the published snapshot version
    (None before the first commit)."""
    ptr = os.path.join(snapshot_dir, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr, encoding="utf-8") as f:
        version = f.read().strip()
    return spark.read.parquet(os.path.join(snapshot_dir, version))


def foreach_batch_upsert(
    source: DataFrame,
    *,
    primary_keys: Sequence[str],
    order_by: Sequence[Column],
    snapshot_dir: str,
    checkpoint_path: str,
    tiebreak: Sequence[Column] | None = None,
) -> None:
    """Drain ``source`` (a streaming DataFrame) with AvailableNow,
    merging every micro-batch into the keyed snapshot. Blocks until
    the drain finishes; the merged result is then at
    ``read_snapshot(spark, snapshot_dir)``.

    Restart safety: the checkpoint replays unacknowledged batches and
    the ``v{batch_id}`` write is idempotent; the pointer advances only
    after the version directory is fully written.
    """
    spark = source.sparkSession
    os.makedirs(snapshot_dir, exist_ok=True)

    def merge(batch: DataFrame, batch_id: int) -> None:
        prev = read_snapshot(spark, snapshot_dir)
        merged = batch if prev is None else prev.unionByName(batch)
        latest = dedupe_keep_latest(merged, list(primary_keys),
                                    list(order_by),
                                    list(tiebreak) if tiebreak else ())
        out = os.path.join(snapshot_dir, f"v{batch_id}")
        latest.write.mode("overwrite").parquet(out)
        tmp = os.path.join(snapshot_dir, f"._ptr_{batch_id}")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(f"v{batch_id}")
        os.replace(tmp, os.path.join(snapshot_dir, _POINTER))

    q = (source.writeStream
               .foreachBatch(merge)
               .option("checkpointLocation", checkpoint_path)
               .trigger(availableNow=True)
               .start())
    q.awaitTermination()
