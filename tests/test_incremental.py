"""Batch-incremental ingest: bookmark advance, dedupe-on-replay
idempotence, empty-increment skip (SURVEY.md §2.8)."""

from pyspark.sql import functions as F

from elt_gluepipeline_spark.sources.state import BookmarkStore, RunManifest
from elt_gluepipeline_spark.streaming.incremental import incremental_ingest


def _run(spark, tmp_path, source_rows, tag, bm_dir="bm"):
    src_path = str(tmp_path / f"src_{tag}")
    spark.createDataFrame(source_rows, "pk long, wm long, v string") \
         .write.mode("overwrite").parquet(src_path)

    def read_since(last):
        df = spark.read.parquet(src_path)
        if last is not None:
            df = df.filter(F.col("wm") > int(last))
        return df

    return incremental_ingest(
        spark, table="t", read_since=read_since, watermark_col="wm",
        primary_keys=["pk"], sink_path=str(tmp_path / "sink"),
        bookmarks=BookmarkStore(str(tmp_path / bm_dir)),
        manifest=RunManifest(str(tmp_path / "mf"), "r1"))


def test_first_load_then_increment(spark, tmp_path):
    bs = BookmarkStore(str(tmp_path / "bm"))
    src_path = str(tmp_path / "src")
    sink = str(tmp_path / "sink")

    def write_src(rows):
        spark.createDataFrame(rows, "pk long, wm long, v string") \
             .write.mode("overwrite").parquet(src_path)

    def read_since(last):
        df = spark.read.parquet(src_path)
        return df.filter(F.col("wm") > int(last)) if last is not None else df

    def ingest():
        return incremental_ingest(
            spark, table="t", read_since=read_since, watermark_col="wm",
            primary_keys=["pk"], sink_path=sink, bookmarks=bs)

    # initial full window, with an in-batch duplicate pk (keep latest wm)
    write_src([(1, 10, "a"), (1, 12, "a2"), (2, 11, "b")])
    r1 = ingest()
    assert r1.rows_ingested == 2 and str(r1.new_bookmark) == "12"
    sunk = spark.read.parquet(sink)
    assert {(r.pk, r.v) for r in sunk.collect()} == {(1, "a2"), (2, "b")}

    # empty increment: nothing newer than bookmark → skip, bookmark unchanged
    r2 = ingest()
    assert r2.skipped and bs.get("t") == "12"

    # new rows arrive → only they are ingested (append)
    write_src([(1, 12, "a2"), (2, 11, "b"), (3, 20, "c")])
    r3 = ingest()
    assert r3.rows_ingested == 1 and bs.get("t") == "20"
    assert spark.read.parquet(sink).count() == 3


def test_replay_is_idempotent_after_dedupe(spark, tmp_path):
    """Crash-window contract: if the bookmark failed to commit and the
    same window replays, re-deduping the sink by (pk, max wm) restores
    exactly-once output."""
    r = _run(spark, tmp_path, [(1, 10, "a")], "x")
    assert r.rows_ingested == 1
    # simulate replay of the same window: bookmark commit was lost
    r2 = _run(spark, tmp_path, [(1, 10, "a")], "x", bm_dir="bm_lost")
    sunk = spark.read.parquet(str(tmp_path / "sink"))
    assert sunk.count() == 2  # two appends...
    from elt_gluepipeline_spark.operators.windows import dedupe_keep_latest
    healed = dedupe_keep_latest(sunk, ["pk"], [F.col("wm").desc()])
    assert healed.count() == 1  # ...but dedupe restores one logical row
