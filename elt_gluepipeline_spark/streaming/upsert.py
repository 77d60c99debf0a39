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


def _latest_version_before(snapshot_dir: str, batch_id: int) -> str | None:
    """Newest committed version directory with id STRICTLY below
    ``batch_id`` (None before the first)."""
    import re
    best = -1
    for d in os.listdir(snapshot_dir):
        m = re.fullmatch(r"v(\d+)", d)
        if m and int(m.group(1)) < batch_id:
            best = max(best, int(m.group(1)))
    return None if best < 0 else f"v{best}"


def foreach_batch_incremental_agg(
    source: DataFrame,
    *,
    delta_fn,
    keys: Sequence[str],
    count_col: str,
    sum_cols: Sequence[str],
    snapshot_dir: str,
    checkpoint_path: str,
) -> None:
    """Streaming incremental view maintenance: per micro-batch,
    ``delta_fn(batch)`` aggregates the batch into a keyed
    (count + exact-sum) delta, which MERGEs into the published
    aggregate state via operators.aggregates.merge_agg_states — the
    aggregate stays current at cost ∝ batch volume, and the state
    lives in a bucketable snapshot table instead of the state store
    (no state-store sizing, queryable between batches, survives
    checkpoint loss).

    Exactly-once under replay: additive merges are NOT idempotent, so
    unlike the keep-latest upsert the previous state resolves to the
    newest version STRICTLY BELOW this batch_id — never the pointer.
    A replayed batch recomputes ``v{id}`` from the same predecessor it
    used the first time instead of double-counting itself; the pointer
    (written last) only ever advances over fully-written versions.

    ``delta_fn`` must emit keys + ``count_col`` + ``sum_cols`` with
    sums in an EXACT type (decimal/integer — see merge_agg_states);
    merged sums are cast back to the delta's dtype so the state schema
    is stable no matter how many merges compound (ANSI mode turns a
    true overflow into an error, never silent corruption).
    """
    spark = source.sparkSession
    os.makedirs(snapshot_dir, exist_ok=True)

    from ..operators.aggregates import merge_agg_states

    def merge(batch: DataFrame, batch_id: int) -> None:
        delta = delta_fn(batch)
        dtypes = dict(delta.dtypes)
        prev_v = _latest_version_before(snapshot_dir, batch_id)
        if prev_v is None:
            merged = delta
        else:
            prev = spark.read.parquet(os.path.join(snapshot_dir, prev_v))
            merged = merge_agg_states(prev, delta, list(keys),
                                      count_col=count_col,
                                      sum_cols=list(sum_cols))
        from pyspark.sql import functions as F
        merged = merged.select(
            *keys, count_col,
            *[F.col(s).cast(dtypes[s]).alias(s) for s in sum_cols])
        out = os.path.join(snapshot_dir, f"v{batch_id}")
        merged.write.mode("overwrite").parquet(out)
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


def foreach_batch_incremental_dedupe(
    source: DataFrame,
    *,
    id_col: str,
    text_col: str,
    block_cols_fn,
    snapshot_dir: str,
    checkpoint_path: str,
    k: int = 3,
    threshold: float = 0.4,
) -> None:
    """Continuous corpus dedup: each micro-batch keeps only the docs
    that survive ``operators.dedup.incremental_jaccard_dedupe`` against
    the accumulated survivor snapshot, then publishes
    ``survivors ∪ batch-survivors`` as the next version — the streaming
    form of the daily-crawl dedup loop, with per-batch cost
    O(batch × overlap) because the corpus side contributes only its
    inverted index (never corpus×corpus).

    Replay safety follows the incremental-agg protocol, not the
    upsert one: survivor accumulation is not idempotent against the
    pointer (a replayed batch must not dedupe against a snapshot that
    already contains its own survivors), so the previous state resolves
    to the newest version STRICTLY BELOW this batch_id.

    ``block_cols_fn()`` returns the blocking Column expressions
    (unbound, evaluated against both batch and snapshot frames). The
    snapshot stores full survivor rows, so blocking/text columns stay
    available to future batches.
    """
    spark = source.sparkSession
    os.makedirs(snapshot_dir, exist_ok=True)

    from ..operators.dedup import incremental_jaccard_dedupe

    def merge(batch: DataFrame, batch_id: int) -> None:
        prev_v = _latest_version_before(snapshot_dir, batch_id)
        corpus = (batch.limit(0) if prev_v is None
                  else spark.read.parquet(
                      os.path.join(snapshot_dir, prev_v)))
        kept = incremental_jaccard_dedupe(
            batch, corpus, id_col, text_col, block_cols_fn(),
            k=k, threshold=threshold)
        merged = corpus.unionByName(kept.select(*corpus.columns)
                                    if prev_v is not None else kept)
        out = os.path.join(snapshot_dir, f"v{batch_id}")
        merged.write.mode("overwrite").parquet(out)
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
