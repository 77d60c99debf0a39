"""Bucket-pruned CDC MERGE: the 100 TB scale path for the keyed
snapshot that ``streaming.upsert`` maintains (reference analog: the
keep-latest dedupe of go-incremental-ingest-elt.py:200-213, applied
continuously — here with per-merge cost proportional to the BATCH,
not the snapshot).

Layout: the snapshot lives as a Hive-partitioned parquet table
``<snapshot_dir>/data/_bucket=K/`` with K = pmod(xxhash64(pk), B).
A merge then:

1. computes the batch's touched bucket set (bounded by B — a ≤B-row
   collect, never data-sized);
2. reads ONLY those partitions back (an ``isin`` filter on the
   partition column — Catalyst turns it into PartitionFilters, so
   untouched buckets are never opened, pinned by
   tests/test_bucketed_upsert.py);
3. unions prev ∪ batch and keeps the newest row per key
   (operators.windows.dedupe_keep_latest — one shuffle, by key,
   of O(batch + touched·snapshot/B) rows);
4. writes the merged buckets to a staging dir and swaps each touched
   ``_bucket=K`` directory into the live table (old→aside, new→live,
   drop aside — the same crash-survivable two-rename protocol as
   sources.writers.compact_parquet). Untouched bucket directories are
   not rewritten, not read, not even listed by the merge job.

So a batch that touches t of B buckets costs
O(|batch| + t·|snapshot|/B) — the docstring contract of
``foreach_batch_upsert``'s scale note, now real. With B sized so a
bucket is a few GB, a trickle batch into a 100 TB snapshot rewrites
gigabytes, not the table. On an object store the per-directory swap
becomes a manifest-pointer update; a table format with native MERGE
(Iceberg/Delta/Hudi) replaces step 4 with its own commit protocol and
keeps steps 1-3 verbatim.

Deletes: change rows may carry an op column; a key whose NEWEST
change is the delete op disappears from reads. Tombstones are
RETAINED in the stored snapshot (they win keep-latest like any other
version), so a late-arriving OLDER update can never resurrect a
deleted key — ``read_bucketed_snapshot`` filters them out. Expiring
tombstones past a replay horizon is a compaction-time policy
(rewrite a bucket dropping tombstones older than the horizon), not a
merge-time one.

Idempotence: keep-latest is a join-semilattice fold (max by
(order_by, tiebreak) per key), so re-merging an already-applied batch
reproduces the same winners — a replayed micro-batch after a crash
rewrites the same bucket contents. This REQUIRES a deterministic
total order: pass unique tiebreakers when the ordering columns can
collide.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.windows import dedupe_keep_latest

BUCKET_COL = "_bucket"
_DATA = "data"


def bucket_of(primary_keys: Sequence[str], n_buckets: int) -> Column:
    """The snapshot's bucket id for a row: pmod(xxhash64(pk...), B).
    xxhash64 is a pinned, seed-stable Spark builtin, so the mapping is
    reproducible across sessions/versions — required for an on-disk
    layout contract."""
    return F.pmod(F.xxhash64(*[F.col(k) for k in primary_keys]),
                  F.lit(n_buckets)).cast("int")


def _live_dir(snapshot_dir: str) -> str:
    return os.path.join(snapshot_dir, _DATA)


def bucketed_merge(
    batch: DataFrame,
    *,
    snapshot_dir: str,
    primary_keys: Sequence[str],
    order_by: Sequence[Column],
    n_buckets: int = 64,
    tiebreak: Sequence[Column] = (),
) -> list[int]:
    """Apply one change batch to the bucketed snapshot. Returns the
    sorted list of bucket ids this merge rewrote (≤ n_buckets ints).

    ``order_by``/``tiebreak`` follow dedupe_keep_latest's contract
    (pass desc() columns for newest-wins). ``n_buckets`` is part of
    the table layout — it must match across merges into the same
    snapshot (changing it means re-bucketing, a compaction job).
    """
    spark = batch.sparkSession
    live = _live_dir(snapshot_dir)
    os.makedirs(snapshot_dir, exist_ok=True)

    b = batch.withColumn(BUCKET_COL, bucket_of(primary_keys, n_buckets))
    touched = sorted(
        r[0] for r in b.select(BUCKET_COL).distinct().collect())
    if not touched:
        return []

    merged = b
    if os.path.isdir(live):
        prev = (spark.read.parquet(live)
                .filter(F.col(BUCKET_COL).isin(touched))
                .withColumn(BUCKET_COL, F.col(BUCKET_COL).cast("int")))
        merged = b.unionByName(prev)
    merged = dedupe_keep_latest(merged, list(primary_keys),
                                list(order_by), list(tiebreak))

    staging = os.path.join(snapshot_dir, ".staging")
    shutil.rmtree(staging, ignore_errors=True)
    (merged.write.mode("overwrite").partitionBy(BUCKET_COL)
           .parquet(staging))

    os.makedirs(live, exist_ok=True)
    for k in touched:
        part = f"{BUCKET_COL}={k}"
        src = os.path.join(staging, part)
        if not os.path.isdir(src):     # defensive: bucket merged empty
            continue
        dst = os.path.join(live, part)
        aside = dst + "__old"
        shutil.rmtree(aside, ignore_errors=True)
        if os.path.isdir(dst):
            shutil.move(dst, aside)    # old bucket stays live at aside
        shutil.move(src, dst)          # new bucket takes the live path
        shutil.rmtree(aside, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)

    from ..sources.readers import invalidate_schema_cache
    invalidate_schema_cache(live)
    return touched


def read_bucketed_snapshot(
    spark: SparkSession,
    snapshot_dir: str,
    *,
    op_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame | None:
    """Current state of the bucketed snapshot (None before the first
    merge). With ``op_col`` set, keys whose newest change is the
    delete op are filtered out (their tombstone rows stay on disk —
    see module docstring)."""
    live = _live_dir(snapshot_dir)
    if not os.path.isdir(live):
        return None
    df = spark.read.parquet(live).drop(BUCKET_COL)
    if op_col is not None:
        df = df.filter(F.col(op_col) != delete_op)
    return df


def expire_tombstones(
    spark: SparkSession,
    snapshot_dir: str,
    *,
    op_col: str,
    expire_if: Column,
    delete_op: str = "D",
) -> list[int]:
    """Compaction-time tombstone expiry: rewrite the buckets that hold
    delete tombstones matching ``expire_if`` (e.g. ``F.col("seq") <
    horizon``), dropping those rows. Returns the rewritten bucket ids.

    Choose the horizon STRICTLY older than the change feed's maximum
    replay/late-arrival lateness: once a tombstone is gone, an even
    older update for that key would win keep-latest again (the
    resurrection the retained tombstone exists to prevent). This is a
    maintenance job — it scans the table once to find expirable rows
    (no partition pruning is possible without reading), then rewrites
    only the buckets that contain any, through the same staging+swap
    protocol as the merge."""
    live = _live_dir(snapshot_dir)
    if not os.path.isdir(live):
        return []
    cur = spark.read.parquet(live)
    expirable = (F.col(op_col) == delete_op) & expire_if
    touched = sorted(r[0] for r in cur.filter(expirable)
                     .select(BUCKET_COL).distinct().collect())
    if not touched:
        return []
    kept = (cur.filter(F.col(BUCKET_COL).isin(touched))
               .filter(~expirable)
               .withColumn(BUCKET_COL, F.col(BUCKET_COL).cast("int")))
    staging = os.path.join(snapshot_dir, ".staging")
    shutil.rmtree(staging, ignore_errors=True)
    kept.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(staging)
    for k in touched:
        part = f"{BUCKET_COL}={k}"
        src, dst = os.path.join(staging, part), os.path.join(live, part)
        aside = dst + "__old"
        shutil.rmtree(aside, ignore_errors=True)
        if os.path.isdir(dst):
            shutil.move(dst, aside)
        if os.path.isdir(src):
            shutil.move(src, dst)      # bucket may compact to empty:
        shutil.rmtree(aside, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)
    from ..sources.readers import invalidate_schema_cache
    invalidate_schema_cache(live)
    return touched


def foreach_batch_bucketed_upsert(
    source: DataFrame,
    *,
    primary_keys: Sequence[str],
    order_by: Sequence[Column],
    snapshot_dir: str,
    checkpoint_path: str,
    n_buckets: int = 64,
    tiebreak: Sequence[Column] = (),
) -> None:
    """Streaming twin of upsert.foreach_batch_upsert with the
    bucket-pruned merge as the sink: drain ``source`` AvailableNow,
    merging every micro-batch via bucketed_merge. At-least-once
    replay composes to exactly-once state because the merge is
    idempotent (see module docstring); the per-bucket directory swap
    plays the role the version-pointer commit plays in the
    full-rewrite path."""
    def merge(batch: DataFrame, batch_id: int) -> None:
        bucketed_merge(batch, snapshot_dir=snapshot_dir,
                       primary_keys=primary_keys, order_by=order_by,
                       n_buckets=n_buckets, tiebreak=tiebreak)

    q = (source.writeStream
               .foreachBatch(merge)
               .option("checkpointLocation", checkpoint_path)
               .trigger(availableNow=True)
               .start())
    q.awaitTermination()
