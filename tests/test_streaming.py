"""Structured Streaming variants: AvailableNow ingest with
dedupe-within-watermark, and windowed rollup parity with the batch A4
rollup."""

from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType, TimestampType)

from elt_gluepipeline_spark.streaming.stream import (stream_ingest,
                                                     stream_windowed_rollup)

SCHEMA = StructType([
    StructField("pk", LongType()),
    StructField("ts", TimestampType()),
    StructField("v", DoubleType()),
    StructField("cat", StringType()),
])


def _write_source(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _rows(spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    return [
        (1, base, 1.0, "a"),
        (1, base + dt.timedelta(minutes=1), 2.0, "a"),  # dup pk within watermark
        (2, base + dt.timedelta(hours=1), 3.0, "b"),
    ]


def test_stream_ingest_available_now(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_source(spark, src, _rows(spark))
    q = stream_ingest(spark, source_dir=src, schema=SCHEMA,
                      watermark_col="ts", primary_keys=["pk"],
                      sink_path=str(tmp_path / "sink"),
                      checkpoint_path=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "sink"))
    assert out.count() == 2  # pk=1 deduped within watermark
    assert {r.pk for r in out.collect()} == {1, 2}


def test_stream_windowed_rollup_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_source(spark, src, _rows(spark))
    q = stream_windowed_rollup(
        spark, source_dir=src, schema=SCHEMA, ts_col="ts", keys=["cat"],
        value_col="v", window="1 hour", lateness="0 seconds",
        sink_path=str(tmp_path / "roll"),
        checkpoint_path=str(tmp_path / "ckpt2"))
    q.awaitTermination(120)
    got = {(r.cat, r.total_value, r.n_events)
           for r in spark.read.parquet(str(tmp_path / "roll")).collect()}
    # append mode emits only windows CLOSED by the watermark: with
    # max(ts)=01:00 the [00:00,01:00) window is final, [01:00,02:00)
    # is held in state awaiting later data — correct late-data behavior
    batch = (spark.read.parquet(src)
             .groupBy(F.window("ts", "1 hour").alias("w"), "cat")
             .agg(F.sum(F.col("v").cast("decimal(18,4)")).cast("double").alias("tv"),
                  F.count(F.lit(1)).alias("n")))
    max_ts = spark.read.parquet(src).agg(F.max("ts")).collect()[0][0]
    want = {(r.cat, r.tv, r.n) for r in batch.collect() if r.w.end <= max_ts}
    assert got == want and len(got) >= 1


def test_stream_enrich_matches_batch_join(spark):
    # q50's property, pinned at sf0.001: the stream-static broadcast
    # enrichment join + aggregation must equal the same plan run as a
    # batch join
    from elt_gluepipeline_spark.plans import registry
    from elt_gluepipeline_spark.sources.readers import read_table
    sf = "/root/testdata/sf0.001"
    stream = {tuple(r) for r in
              registry()["q50_stream_enrich"].build(spark, sf).collect()}
    ev = read_table(spark, sf, "events")
    dim = read_table(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    batch = (ev.join(dim, ev.user_id == dim.c_custkey)
               .groupBy("event_type", "c_mktsegment")
               .agg(F.count(F.lit(1)).alias("n_events"),
                    F.sum(F.col("value").cast("decimal(18,4)"))
                     .cast("double").alias("total_value")))
    want = {tuple(r) for r in batch.collect()}
    assert stream == want and len(stream) > 0


def test_stream_hourly_matches_batch_rollup(spark):
    # q29's property, pinned at sf0.001: the streaming tumbling-window
    # rollup drained with AvailableNow must equal the batch hourly
    # rollup (q06_trend_hourly) — this is what catches a testdata
    # timestamp-encoding change in pytest instead of the driver gate
    from elt_gluepipeline_spark.plans import registry
    sf = "/root/testdata/sf0.001"
    batch = {tuple(r) for r in
             registry()["q06_trend_hourly"].build(spark, sf).collect()}
    stream = {tuple(r) for r in
              registry()["q29_stream_hourly"].build(spark, sf).collect()}
    assert stream == batch and len(stream) > 0


def test_stream_sessions_match_batch_sessionize(spark):
    # q35's property, pinned at sf0.001: stateful streaming
    # sessionization == batch sessionization minus each user's trailing
    # open session (completed-sessions semantics)
    from pyspark.sql import Window
    from elt_gluepipeline_spark.plans import registry
    sf = "/root/testdata/sf0.001"
    batch_df = registry()["q34_sessionize"].build(spark, sf)
    w = Window.partitionBy("user_id")
    closed = (batch_df
              .withColumn("_max_sid", F.max("session_id").over(w))
              .filter(F.col("session_id") < F.col("_max_sid"))
              .drop("_max_sid"))
    want = {tuple(r) for r in closed.collect()}
    stream = {tuple(r) for r in
              registry()["q35_stream_sessions"].build(spark, sf).collect()}
    assert stream == want and len(stream) > 0


def test_stream_interval_join_matches_batch_range_join(spark):
    # q48's property, pinned at sf0.001: the watermarked stream-stream
    # interval join must agree row-for-row with the batch range join
    from elt_gluepipeline_spark.plans import registry
    sf = "/root/testdata/sf0.001"
    batch = {tuple(r) for r in
             registry()["q39_range_clicks"].build(spark, sf).collect()}
    stream = {tuple(r) for r in
              registry()["q48_stream_attribution"].build(spark, sf).collect()}
    assert stream == batch and len(stream) > 0


def test_stream_sessions_timeout_closes_idle(spark):
    # event-time-timeout variant, pinned at sf0.001 against an
    # independent pure-python sessionizer: the drain must emit every
    # CLOSED session plus every open session whose (last + gap) the
    # end-of-stream watermark passed — i.e. only sessions still inside
    # the gap window at max(ts) stay in state
    from elt_gluepipeline_spark.sources.readers import (ntz_micros,
                                                        ntz_to_instant,
                                                        read_table,
                                                        read_table_stream)
    from elt_gluepipeline_spark.streaming.sessionize import \
        sessionize_stateful_timeout
    from elt_gluepipeline_spark.streaming.stream import \
        run_rollup_available_now

    sf = "/root/testdata/sf0.001"
    gap_min = 30
    gap_us = gap_min * 60 * 1_000_000

    src = (read_table_stream(spark, sf, "events")
           .select("user_id", "event_id", ntz_to_instant("ts").alias("ts"))
           .withWatermark("ts", "0 seconds"))
    sessions = sessionize_stateful_timeout(src, gap_minutes=gap_min)
    got = {tuple(r) for r in
           run_rollup_available_now(sessions, output_mode="append",
                                    state_partitions=8).collect()}

    pdf = (read_table(spark, sf, "events")
           .select("user_id", "event_id", ntz_micros("ts").alias("us"))
           .toPandas())
    max_us = int(pdf["us"].max())
    want = set()
    for uid, g in pdf.sort_values(["us", "event_id"]).groupby("user_id"):
        sid, start, last, n = 0, None, None, 0
        rows = []
        for us in g["us"]:
            us = int(us)
            if last is None:
                sid, start, last, n = sid + 1, us, us, 1
            elif us - last > gap_us:
                rows.append((uid, sid, n, last - start, True))
                sid, start, last, n = sid + 1, us, us, 1
            else:
                last, n = us, n + 1
        rows.append((uid, sid, n, last - start, last + gap_us < max_us))
        want |= {r[:4] for r in rows if r[4]}
    assert got == want and len(got) > 0


def test_stateful_sessions_across_micro_batches(spark, tmp_path):
    # multi-batch drain (maxFilesPerTrigger=1): state carries across
    # micro-batches, and a LATE event delivered in a later batch —
    # inside the session gap — must extend the open session's bounds
    # monotonically, not move them backward
    import datetime as dt
    from elt_gluepipeline_spark.streaming.sessionize import \
        sessionize_stateful
    src_dir = str(tmp_path / "ev")
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = "user_id long, event_id long, ts timestamp"

    def write_file(rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
             .write.mode("append").parquet(src_dir)

    m = dt.timedelta(minutes=1)
    # batch 1: u1 events at 12:00, 12:10
    write_file([(1, 1, base), (1, 2, base + 10 * m)])
    # batch 2: LATE event 12:05 (inside the open session) + 12:20
    write_file([(1, 3, base + 5 * m), (1, 4, base + 20 * m)])
    # batch 3: u1 at 13:30 — 70min gap closes session 1 (4 events)
    write_file([(1, 5, base + 90 * m)])

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir)
              .select("user_id", "event_id",
                      F.unix_micros("ts").alias("ts_us")))
    sessions = sessionize_stateful(stream, gap_minutes=30)
    name = "_mb_sessions"
    q = (sessions.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = [tuple(r) for r in spark.table(name).collect()]
    # one closed session: 4 events spanning 12:00-12:20 (20 min)
    assert got == [(1, 1, 4, 20 * 60 * 1_000_000)]


def test_timeout_sessions_across_micro_batches(spark, tmp_path):
    # event-time-timeout variant under a multi-batch drain: the
    # watermark advances between batches; timeouts must clamp past it
    # (a late event's last+gap can lie behind the watermark) and idle
    # sessions flush once it passes last+gap
    import datetime as dt
    from elt_gluepipeline_spark.streaming.sessionize import \
        sessionize_stateful_timeout
    src_dir = str(tmp_path / "ev2")
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = "user_id long, event_id long, ts timestamp"

    def write_file(rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
             .write.mode("append").parquet(src_dir)

    m = dt.timedelta(minutes=1)
    write_file([(1, 1, base), (2, 2, base + 2 * m)])
    # u2 goes idle; u1 keeps going far past u2's last+gap
    write_file([(1, 3, base + 120 * m)])
    write_file([(1, 4, base + 240 * m)])

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir)
              .withWatermark("ts", "0 seconds"))
    sessions = sessionize_stateful_timeout(stream, gap_minutes=30)
    name = "_mb_timeout_sessions"
    q = (sessions.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {tuple(r) for r in spark.table(name).collect()}
    # u2's idle session flushed by timeout; u1's first two singleton
    # sessions closed by gap; the trailing u1 session (ts 240m) may or
    # may not time out depending on the final watermark — accept both
    assert (2, 1, 1, 0) in got           # u2 idle session flushed
    assert (1, 1, 1, 0) in got and (1, 2, 1, 0) in got
    assert got <= {(2, 1, 1, 0), (1, 1, 1, 0), (1, 2, 1, 0), (1, 3, 1, 0)}


def test_foreach_batch_upsert_multi_batch(spark, tmp_path):
    # the foreachBatch merge must fold three micro-batches into the
    # same keep-latest result a single batch pass computes, with later
    # batches overwriting earlier keys and ties broken by event_id
    import datetime as dt
    from elt_gluepipeline_spark.streaming.upsert import (
        foreach_batch_upsert, read_snapshot)
    src_dir = str(tmp_path / "chg")
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = "k long, event_id long, ts timestamp, v string"

    def write_file(rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
             .write.mode("append").parquet(src_dir)

    h = dt.timedelta(hours=1)
    write_file([(1, 1, base, "a"), (2, 2, base, "b")])
    write_file([(1, 3, base + h, "a2"),          # newer → wins
                (2, 4, base - h, "stale"),       # older → loses
                (3, 5, base, "c")])
    write_file([(3, 6, base, "c2")])             # same ts: event_id wins

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    snap_dir = str(tmp_path / "snap")
    foreach_batch_upsert(stream, primary_keys=["k"],
                         order_by=[F.col("ts").desc()],
                         tiebreak=[F.col("event_id").desc()],
                         snapshot_dir=snap_dir,
                         checkpoint_path=str(tmp_path / "ckpt"))
    got = {r.k: (r.event_id, r.v)
           for r in read_snapshot(spark, snap_dir).collect()}
    assert got == {1: (3, "a2"), 2: (2, "b"), 3: (6, "c2")}

    # replayed batch (same batch_id) rewrites the same version — the
    # pointer and result don't change: exactly-once state under
    # at-least-once delivery
    merged_before = read_snapshot(spark, snap_dir).count()
    stream2 = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(src_dir))
    foreach_batch_upsert(stream2, primary_keys=["k"],
                         order_by=[F.col("ts").desc()],
                         tiebreak=[F.col("event_id").desc()],
                         snapshot_dir=snap_dir,
                         checkpoint_path=str(tmp_path / "ckpt"))
    assert read_snapshot(spark, snap_dir).count() == merged_before


def test_stream_incremental_agg_matches_batch_and_replay_safe(spark, sf_dir, tmp_path):
    import os
    import shutil

    from elt_gluepipeline_spark.functions.deterministic import dec
    from elt_gluepipeline_spark.sources.readers import read_table
    from elt_gluepipeline_spark.streaming.upsert import (
        foreach_batch_incremental_agg, read_snapshot)

    ev = read_table(spark, sf_dir, "events")
    src_dir = str(tmp_path / "src")
    ev.repartition(3).write.mode("overwrite").parquet(src_dir)

    def delta_fn(b):
        return b.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"), F.sum(dec("value")).alias("s"))

    def drain(ckpt):
        src = (spark.readStream
                    .schema(spark.read.parquet(src_dir).schema)
                    .option("maxFilesPerTrigger", 1).parquet(src_dir))
        foreach_batch_incremental_agg(
            src, delta_fn=delta_fn, keys=["user_id"], count_col="n",
            sum_cols=["s"], snapshot_dir=str(tmp_path / "snap"),
            checkpoint_path=ckpt)
        return {r.user_id: (r.n, float(r.s)) for r in
                read_snapshot(spark, str(tmp_path / "snap")).collect()}

    got = drain(str(tmp_path / "ckpt1"))
    want = {r.user_id: (r.n, float(r.s)) for r in delta_fn(ev).collect()}
    assert got == want  # 3 incremental merges == one full aggregation

    # FULL REPLAY: lose the checkpoint, keep the snapshots. Every batch
    # re-runs with the same batch ids; each recomputes its version from
    # the version strictly below it, so nothing double-counts.
    shutil.rmtree(str(tmp_path / "ckpt1"))
    assert drain(str(tmp_path / "ckpt2")) == want
    # schema stability: compounding merges must not widen the sum type
    snap = read_snapshot(spark, str(tmp_path / "snap"))
    assert dict(snap.dtypes)["s"] == dict(delta_fn(ev).dtypes)["s"]


def test_stream_incremental_dedupe_equals_sequential(spark, tmp_path):
    """foreachBatch continuous dedup == sequentially applying
    incremental_jaccard_dedupe batch-by-batch (whatever batch order
    the file source picked)."""
    import os
    import time

    from pyspark.sql import functions as F

    from elt_gluepipeline_spark.operators.dedup import \
        incremental_jaccard_dedupe
    from elt_gluepipeline_spark.streaming.upsert import (
        foreach_batch_incremental_dedupe, read_snapshot)

    rows = [
        # file 0
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon eta")],      # 1~2 → keep 1
        # file 1: 10 matches survivor 1; 11 clean
        [(10, "alpha beta gamma delta epsilon zeta"),
         (11, "one two three four five six seven")],
        # file 2: 20 matches 11; 21 clean
        [(20, "one two three four five six eight"),
         (21, "nine ten eleven twelve thirteen fourteen")],
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, batch in enumerate(rows):
        spark.createDataFrame(batch, "doc_id long, text string") \
             .coalesce(1).write.parquet(str(src / f"b{i}"))
        time.sleep(1.1)  # distinct mtimes → deterministic-ish order

    stream = (spark.readStream
                   .schema("doc_id long, text string")
                   .option("maxFilesPerTrigger", 1)
                   .parquet(str(src) + "/*"))
    snap = str(tmp_path / "snap")
    foreach_batch_incremental_dedupe(
        stream, id_col="doc_id", text_col="text",
        block_cols_fn=lambda: [F.lit(0)],
        snapshot_dir=snap, checkpoint_path=str(tmp_path / "ck"),
        k=3, threshold=0.3)

    got = {r.doc_id for r in read_snapshot(spark, snap).collect()}

    # reconstruct the batch order the stream actually used from the
    # version directories, then replay sequentially
    import re
    versions = sorted((int(re.fullmatch(r"v(\d+)", d).group(1)), d)
                      for d in os.listdir(snap)
                      if re.fullmatch(r"v(\d+)", d))
    assert len(versions) == 3
    prev_ids: set = set()
    order = []
    all_batches = {i: {r[0] for r in b} for i, b in enumerate(rows)}
    for _, d in versions:
        ids = {r.doc_id
               for r in spark.read.parquet(os.path.join(snap, d)).collect()}
        new_ids = ids - prev_ids
        matches = [i for i, b in all_batches.items() if new_ids <= b]
        assert matches, (ids, prev_ids)
        order.append(matches[0])
        del all_batches[matches[0]]
        prev_ids = ids

    corpus = spark.createDataFrame([], "doc_id long, text string")
    for i in order:
        b = spark.createDataFrame(rows[i], "doc_id long, text string")
        kept = incremental_jaccard_dedupe(b, corpus, "doc_id", "text",
                                          [F.lit(0)], k=3, threshold=0.3)
        corpus = corpus.unionByName(kept)
    expect = {r.doc_id for r in corpus.collect()}
    assert got == expect
    # and the fixture really exercised cross-batch matching
    assert 1 in got and 10 not in got and 11 in got and 20 not in got


def test_update_mode_multibatch_converges_to_batch_agg(spark, tmp_path):
    """UPDATE output mode across several micro-batches: each batch
    re-emits only the CHANGED groups; taking the last emission per key
    must converge to the plain batch aggregate. (complete mode re-emits
    everything — update is the mode that scales output ∝ change.)"""
    import time

    from pyspark.sql import functions as F

    src = tmp_path / "src"
    src.mkdir()
    batches = [
        [("a", 1.0), ("b", 2.0)],
        [("a", 10.0), ("c", 3.0)],
        [("b", 5.0), ("a", 0.5)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "k string, v double") \
             .coalesce(1).write.parquet(str(src / f"b{i}"))
        time.sleep(1.1)

    stream = (spark.readStream.schema("k string, v double")
                   .option("maxFilesPerTrigger", 1)
                   .parquet(str(src) + "/*"))
    agg = (stream.groupBy("k")
                 .agg(F.sum(F.col("v").cast("decimal(18,4)"))
                       .cast("double").alias("total"),
                      F.count(F.lit(1)).alias("n")))
    name = "_upd_sink_test"
    q = (agg.writeStream.format("memory").queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start())
    q.awaitTermination()
    # the memory sink accumulates one row per (batch, changed key):
    # more rows than keys proves update-mode re-emission happened
    log = spark.table(name).collect()
    assert len(log) > 3, log
    # last emission per key == batch aggregate
    final = {}
    for r in log:   # memory sink appends in batch order
        final[r.k] = (r.total, r.n)
    batch_rows = [(k, v) for rows in batches for k, v in rows]
    expect_df = (spark.createDataFrame(batch_rows, "k string, v double")
                 .groupBy("k")
                 .agg(F.sum(F.col("v").cast("decimal(18,4)"))
                       .cast("double").alias("total"),
                      F.count(F.lit(1)).alias("n")))
    expect = {r.k: (r.total, r.n) for r in expect_df.collect()}
    assert final == expect


def test_append_rollup_emits_only_watermark_closed_windows(spark, sf_dir):
    """q117 semantics pinned: every emitted window END is <= final
    watermark (max event time - lateness), windows past it stay in
    state unemitted, and emitted rows equal the batch rollup exactly
    for those windows."""
    from pyspark.sql import functions as F

    from elt_gluepipeline_spark.plans.reference import (
        _Q117_LATENESS_S, q117_stream_append_rollup)
    from elt_gluepipeline_spark.sources.readers import ntz_micros, read_table

    got = q117_stream_append_rollup(spark, sf_dir)
    ev = read_table(spark, sf_dir, "events")
    max_us = ev.agg(F.max(ntz_micros("ts"))).collect()[0][0]
    wm_us = max_us - _Q117_LATENESS_S * 1_000_000
    rows = got.collect()
    assert rows and all(
        r.bucket_start_us + 3_600_000_000 <= wm_us for r in rows)
    # the batch rollup has MORE windows (the open tail) — eviction is
    # observable, not vacuous
    batch = (ev.groupBy(F.date_trunc("hour", "ts").alias("b"), "event_type")
               .count())
    assert batch.count() > len(rows)
    # and the emitted prefix matches the batch rollup per-window
    batch_closed = {
        (ntz_micros_val, et): n for ntz_micros_val, et, n in
        (batch.select(F.unix_micros(F.to_timestamp("b")).alias("us"),
                      "event_type", "count").collect())
        if ntz_micros_val + 3_600_000_000 <= wm_us}
    got_map = {(r.bucket_start_us, r.event_type): r.n_events for r in rows}
    assert got_map == batch_closed


def test_read_table_stream_directory_layout(spark, sf_dir, tmp_path):
    """Directory-layout tables (Spark-written part files) must stream
    ALL rows: the old pathGlobFilter='<name>.parquet' matched zero
    leaf files against part-*.parquet and silently streamed nothing
    (surfaced by a 4x scale check on q117)."""
    from pyspark.sql import functions as F

    from elt_gluepipeline_spark.sources.readers import (read_table,
                                                        read_table_stream)

    out = str(tmp_path / "dirly")
    ev = read_table(spark, sf_dir, "events")
    ev.repartition(3).write.parquet(f"{out}/events.parquet")
    src = read_table_stream(spark, out, "events")
    q = (src.groupBy().agg(F.count(F.lit(1)).alias("n"))
            .writeStream.format("memory").queryName("dirly_n")
            .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    assert spark.table("dirly_n").collect()[0]["n"] == ev.count()
    # timestamp normalization still applies in the dir branch
    assert dict(src.dtypes)["ts"].startswith("timestamp")


def test_drain_runs_on_rocksdb_state_store(spark, sf_dir):
    """The 100 TB state story: HDFS-backed state holds everything in
    executor heap; RocksDB spills to local disk and is the provider a
    large stateful deployment actually runs. Prove the engine's drain
    path works unchanged under it (provider is a session conf — the
    plans don't care, but only a test makes that claim true)."""
    from pyspark.sql import functions as F

    from elt_gluepipeline_spark.sources.readers import read_table_stream
    from elt_gluepipeline_spark.streaming.stream import (
        run_rollup_available_now)

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming."
                        "state.RocksDBStateStoreProvider")
    try:
        src = read_table_stream(spark, sf_dir, "events")
        agg = (src.groupBy(F.window("ts", "1 hour").alias("b"),
                           "event_type")
                  .agg(F.count(F.lit(1)).alias("n")))
        got = run_rollup_available_now(agg, state_partitions=4)
        from elt_gluepipeline_spark.sources.readers import read_table
        exact = (read_table(spark, sf_dir, "events")
                 .groupBy(F.date_trunc("hour", "ts").alias("h"),
                          "event_type")
                 .agg(F.count(F.lit(1)).alias("n")))
        assert got.count() == exact.count()
        assert got.agg(F.sum("n")).collect()[0][0] == \
            exact.agg(F.sum("n")).collect()[0][0]
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_chain_handler_replay_is_idempotent(spark, tmp_path):
    """SURVEY §7.4 crash-window invariant: after a batch's bookmark
    commits, the streaming runtime replaying that batch_id (restart
    after a crash between checkpoint and shutdown) must append NOTHING
    — drive the foreachBatch handler directly, twice."""
    from elt_gluepipeline_spark.sources.state import BookmarkStore
    from elt_gluepipeline_spark.streaming.chain import (
        make_chain_batch_handler)

    final = str(tmp_path / "final")
    quar = str(tmp_path / "quar")
    handler = make_chain_batch_handler(
        final_dir=final, quarantine_dir=quar,
        bookmarks=BookmarkStore(str(tmp_path / "bm")),
        rules=(("neg", "v <= 0"),))
    batch = spark.createDataFrame(
        [(1, 5.0, " A "), (2, -1.0, "B"), (3, 2.0, "c")],
        "id long, v double, tag string")
    handler(batch, 0)
    n_final = spark.read.parquet(final).count()
    n_quar = spark.read.parquet(quar).count()
    assert (n_final, n_quar) == (2, 1)
    # transform stage ran inside the chain: strings lower+trim
    tags = {r.tag for r in spark.read.parquet(final).collect()}
    assert tags == {"a", "c"}

    handler(batch, 0)  # replayed micro-batch → no-op
    assert spark.read.parquet(final).count() == n_final
    assert spark.read.parquet(quar).count() == n_quar

    handler(batch.withColumn("id", batch.id + 10), 1)  # next batch lands
    assert spark.read.parquet(final).count() == 2 * n_final


def test_stream_chain_multibatch_equals_batch_route(spark, sf_dir,
                                                    tmp_path):
    """Drain the full foreachBatch chain over a 3-file source with
    maxFilesPerTrigger=1 (3 genuine micro-batches) and check final/ +
    quarantine/ is a clean partition of the input routed identically
    to the batch quality stage."""
    from pyspark.sql import functions as F

    from elt_gluepipeline_spark.functions.conform import (
        normalize_names, normalize_strings)
    from elt_gluepipeline_spark.operators.quality import (
        extract_violations, split_clean)
    from elt_gluepipeline_spark.sources.readers import read_table
    from elt_gluepipeline_spark.streaming.chain import run_stream_chain

    rules = (("price_nonpos", "l_extendedprice <= 0"),
             ("qty_out_of_band", "l_quantity IS NULL OR l_quantity >= 48"))
    li = read_table(spark, sf_dir, "lineitem")
    src = str(tmp_path / "src")
    li.repartitionByRange(3, "l_orderkey").write.parquet(src)
    run_stream_chain(
        spark, source_dir=src,
        final_dir=str(tmp_path / "final"),
        quarantine_dir=str(tmp_path / "quar"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        bookmark_dir=str(tmp_path / "bm"),
        rules=rules, max_files_per_trigger=1)

    got_clean = spark.read.parquet(str(tmp_path / "final"))
    got_quar = spark.read.parquet(str(tmp_path / "quar"))
    want_clean, want_quar = split_clean(extract_violations(
        normalize_strings(normalize_names(li)),
        [(n, F.expr(s)) for n, s in rules]))
    assert got_clean.count() + got_quar.count() == li.count()
    assert got_clean.count() == want_clean.count()
    assert got_quar.count() == want_quar.count()
    # value-level: clean side matches the batch route exactly
    assert got_clean.exceptAll(want_clean).count() == 0
    assert want_clean.exceptAll(got_clean).count() == 0
