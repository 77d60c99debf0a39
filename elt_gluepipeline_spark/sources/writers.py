"""Sinks (SURVEY.md §2.1 S5-S9, S11).

Writers keep the reference's layout contracts (partition columns,
bounded file counts, snappy parquet) while letting AQE size the
shuffles. File-count control uses coalesce at the sink only — never
upstream, where it would cap stage parallelism.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, *, mode: str = "overwrite",
                  partition_by: tuple[str, ...] = (), max_files: int | None = None,
                  sort_by: tuple[str, ...] = (),
                  compression: str = "snappy") -> None:
    """S5/S6/S7: (partitioned) parquet sink.

    ``max_files`` bounds output file count per the reference's layout
    budget (landing ≤8, final ≤64 — go-incremental-ingest-elt.py:222,
    go-quality-elt.py:311-312). Applied as a sink-side coalesce so the
    preceding stages keep full parallelism; at 100 TB prefer
    spark.sql.files.maxRecordsPerFile + AQE coalescing instead.

    ``sort_by`` clusters rows WITHIN each output task before writing
    (sortWithinPartitions — no extra shuffle): parquet row-group
    min/max statistics on the sort keys become tight and disjoint, so
    later selective scans skip row groups wholesale. This is the poor
    man's clustering index — the single cheapest layout lever for a
    100 TB table that is mostly read through key/time predicates.
    """
    out = df
    if max_files is not None:
        out = out.coalesce(max_files)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    writer = out.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_jdbc(df: DataFrame, url: str, table: str, *, mode: str = "append",
               properties: dict[str, str] | None = None,
               create_table_column_types: str | None = None,
               batch_size: int = 10_000) -> None:
    """S8/S9: JDBC batch-insert sink with optional DDL type overrides
    (replaces the loader's fast_executemany path,
    rds/load_to_sqlserver.py:149-264 — Spark's JDBC writer batches
    inserts per partition and creates the table with inferred or
    overridden column types)."""
    writer = (df.write.format("jdbc").mode(mode)
              .option("url", url)
              .option("dbtable", table)
              .option("batchsize", str(batch_size)))
    if create_table_column_types:
        writer = writer.option("createTableColumnTypes", create_table_column_types)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def move_path(src: str, dst: str) -> None:
    """S11: post-process archival move (landing → processed). Local-FS
    stand-in for the reference's S3 copy+delete
    (go-transform-elt.py:295-311); out-of-plane file management, not a
    query operator."""
    dst_p = Path(dst)
    dst_p.parent.mkdir(parents=True, exist_ok=True)
    if dst_p.exists():
        shutil.rmtree(dst)
    shutil.move(src, dst)


def compact_parquet(spark, path: str, *, target_files: int = 8,
                    partition_by: tuple[str, ...] = (),
                    compression: str = "snappy") -> int:
    """Small-file compaction: rewrite a parquet folder into a bounded
    file count and atomically swap it in. The operational counterpart
    of an append-mode sink (incremental ingest appends a few files per
    run — go-incremental-ingest-elt.py:224-233 — and a year of runs
    makes thousands of tiny files whose open/footer cost dominates
    scans).

    The rewrite is one read→write job (no driver-side file handling);
    the swap goes through a sibling temp dir, then old→aside rename,
    tmp→live rename, delete-aside — a live copy of the data exists on
    disk at every instant, and a crash mid-swap leaves either the old
    folder (at the aside path) or the new one recoverable, never
    neither. (Two renames aren't one atomic op: a reader can race the
    microseconds between them — on POSIX use renameat2/EXCHANGE for a
    true atomic swap; on object stores swap via manifest pointer.)
    Returns the row count (cheap parity check for callers).
    """
    df = spark.read.parquet(path)
    base = path.rstrip("/")
    tmp, aside = base + "__compact_tmp", base + "__compact_old"
    out = df.coalesce(target_files)
    writer = (out.write.mode("overwrite")
                 .option("compression", compression))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    n = spark.read.parquet(tmp).count()
    shutil.rmtree(aside, ignore_errors=True)
    shutil.move(base, aside)   # old data stays live at the aside path
    shutil.move(tmp, base)     # new data takes the live path
    shutil.rmtree(aside)       # only now does the old copy disappear
    # the live path now holds different files; drop any cached footer
    # schema so the next read re-resolves (readers also key on a leaf
    # signature, but an in-place rewrite is the explicit case)
    from .readers import invalidate_schema_cache
    invalidate_schema_cache(base)
    return n


def zorder_key(*cols, bits: int = 16):
    """Morton (Z-order) interleave key for multi-dimensional layout
    clustering: pass it to ``write_parquet(..., sort_by=(key,))`` to
    cluster rows so parquet row-group min/max stats stay tight on ALL
    the interleaved dimensions at once — a single-column sort gives
    perfect pruning on one predicate column and none on the others;
    Z-order gives good (log-factor) pruning on each. The cheapest
    layout lever after partitioning for a 100 TB table read through
    multiple independent predicates.

    Each column is rank-normalized by the caller into [0, 2^bits)
    (e.g. ``F.pmod(F.xxhash64(c), F.lit(1 << bits))`` for opaque keys,
    or a scaled/clamped numeric). Bits interleave LSB-first across
    columns; 2 cols × 16 bits → a 32-bit key in a LongType.

    Pure JVM bit arithmetic (shifts/ors folded by codegen) — no UDF.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    assert n >= 2, "zorder needs >= 2 columns"
    assert n * bits <= 63, "interleaved key must fit a signed long"
    norm = [(F.col(c) if isinstance(c, str) else c).cast("long")
            for c in cols]
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(norm):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    return key
