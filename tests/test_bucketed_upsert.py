"""Bucket-pruned CDC MERGE (streaming/bucketed_upsert.py): the merge
must (a) compute exactly the keep-latest-minus-deletes state the
full-rewrite path computes, (b) physically touch ONLY the buckets the
batch hashes into, (c) be idempotent under replay, and (d) never let
a late-arriving older update resurrect a deleted key (tombstones are
retained in the stored snapshot)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from elt_gluepipeline_spark.streaming.bucketed_upsert import (
    BUCKET_COL, bucket_of, bucketed_merge, foreach_batch_bucketed_upsert,
    read_bucketed_snapshot)

SCHEMA = "k long, seq long, v string, op string"


def _state(spark, snap):
    df = read_bucketed_snapshot(spark, snap, op_col="op")
    return {r.k: (r.seq, r.v) for r in df.collect()}


def _bucket_files(snap):
    """{bucket_dir: {relpath: (size, mtime_ns)}} for the live table."""
    live = os.path.join(snap, "data")
    out = {}
    for d in os.listdir(live):
        if not d.startswith(f"{BUCKET_COL}="):
            continue
        files = {}
        for root, _, names in os.walk(os.path.join(live, d)):
            for n in names:
                p = os.path.join(root, n)
                st = os.stat(p)
                files[os.path.relpath(p, live)] = (st.st_size,
                                                   st.st_mtime_ns)
        out[d] = files
    return out


def test_merge_matches_single_pass_and_handles_deletes(spark, tmp_path):
    snap = str(tmp_path / "snap")
    rows = [(1, 1, "a", "U"), (2, 2, "b", "U"), (3, 3, "c", "U"),
            (1, 4, "a2", "U"),                 # newer update wins
            (2, 5, None, "D"),                 # newest change: delete
            (3, 1, "stale", "U"),              # older than seq 3: loses
            (4, 6, "d", "U")]
    df = spark.createDataFrame(rows, SCHEMA)
    # three batches in a deliberately shuffled order: the final state
    # must be batching-invariant
    for i in (1, 2, 0):
        bucketed_merge(df.filter(F.col("seq") % 3 == i),
                       snapshot_dir=snap, primary_keys=["k"],
                       order_by=[F.col("seq").desc()], n_buckets=8)
    assert _state(spark, snap) == {1: (4, "a2"), 3: (3, "c"),
                                   4: (6, "d")}
    # the tombstone row for k=2 is physically retained on disk
    raw = read_bucketed_snapshot(spark, snap)
    assert raw.filter((F.col("k") == 2) & (F.col("op") == "D")).count() == 1


def test_merge_rewrites_only_touched_buckets(spark, tmp_path):
    snap = str(tmp_path / "snap")
    seed = [(k, 1, f"v{k}", "U") for k in range(1, 33)]
    bucketed_merge(spark.createDataFrame(seed, SCHEMA),
                   snapshot_dir=snap, primary_keys=["k"],
                   order_by=[F.col("seq").desc()], n_buckets=8)
    before = _bucket_files(snap)
    assert len(before) > 2               # seed spread over several buckets

    batch = spark.createDataFrame([(1, 2, "v1b", "U")], SCHEMA)
    touched = bucketed_merge(batch, snapshot_dir=snap,
                             primary_keys=["k"],
                             order_by=[F.col("seq").desc()], n_buckets=8)
    expect = [r[0] for r in batch.select(
        bucket_of(["k"], 8)).distinct().collect()]
    assert touched == sorted(expect) and len(touched) == 1

    after = _bucket_files(snap)
    touched_dir = f"{BUCKET_COL}={touched[0]}"
    for d, files in before.items():
        if d == touched_dir:
            assert after[d] != files     # rewritten
        else:
            assert after[d] == files     # same file sizes AND mtimes

    assert _state(spark, snap)[1] == (2, "v1b")


def test_replay_idempotent_and_no_resurrection(spark, tmp_path):
    snap = str(tmp_path / "snap")
    b1 = spark.createDataFrame([(1, 1, "a", "U"), (2, 2, "b", "U")], SCHEMA)
    b2 = spark.createDataFrame([(1, 9, None, "D")], SCHEMA)
    for b in (b1, b2, b2):               # b2 replayed
        bucketed_merge(b, snapshot_dir=snap, primary_keys=["k"],
                       order_by=[F.col("seq").desc()], n_buckets=4)
    assert _state(spark, snap) == {2: (2, "b")}
    # late-arriving OLDER update for the deleted key: tombstone wins
    bucketed_merge(
        spark.createDataFrame([(1, 5, "zombie", "U")], SCHEMA),
        snapshot_dir=snap, primary_keys=["k"],
        order_by=[F.col("seq").desc()], n_buckets=4)
    assert _state(spark, snap) == {2: (2, "b")}


def test_partition_pruned_read(spark, tmp_path):
    # the prev-state scan inside a merge must prune to the touched
    # buckets at the PLAN level, not filter after reading
    snap = str(tmp_path / "snap")
    seed = [(k, 1, "x", "U") for k in range(64)]
    bucketed_merge(spark.createDataFrame(seed, SCHEMA),
                   snapshot_dir=snap, primary_keys=["k"],
                   order_by=[F.col("seq").desc()], n_buckets=8)
    live = os.path.join(snap, "data")
    pruned = (spark.read.parquet(live)
              .filter(F.col(BUCKET_COL).isin([3])))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and f"{BUCKET_COL}#" in plan
    # and the pruned scan really returns only that bucket's rows
    got = {r[0] for r in pruned.select(BUCKET_COL).distinct().collect()}
    assert got == {3}


def test_expire_tombstones(spark, tmp_path):
    from elt_gluepipeline_spark.streaming.bucketed_upsert import (
        expire_tombstones)
    snap = str(tmp_path / "snap")
    rows = [(1, 1, "a", "U"), (2, 2, None, "D"), (3, 30, None, "D"),
            (4, 4, "d", "U")]
    bucketed_merge(spark.createDataFrame(rows, SCHEMA),
                   snapshot_dir=snap, primary_keys=["k"],
                   order_by=[F.col("seq").desc()], n_buckets=4)
    # expire tombstones with seq < 10: k=2's goes, k=3's stays
    touched = expire_tombstones(spark, snap, op_col="op",
                                expire_if=F.col("seq") < 10)
    assert touched           # at least the bucket holding k=2
    raw = read_bucketed_snapshot(spark, snap)
    ops = {r.k: r.op for r in raw.collect()}
    assert 2 not in ops and ops[3] == "D"
    # live state unchanged (reads already filtered tombstones)
    assert _state(spark, snap) == {1: (1, "a"), 4: (4, "d")}
    # no expirable tombstones left → no-op
    assert expire_tombstones(spark, snap, op_col="op",
                             expire_if=F.col("seq") < 10) == []


def test_streaming_wrapper_matches_full_rewrite(spark, tmp_path):
    import datetime as dt

    from elt_gluepipeline_spark.streaming.upsert import (
        foreach_batch_upsert, read_snapshot)

    src_dir = str(tmp_path / "chg")
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = "k long, event_id long, ts timestamp, v string"
    h = dt.timedelta(hours=1)
    batches = [[(1, 1, base, "a"), (2, 2, base, "b")],
               [(1, 3, base + h, "a2"), (2, 4, base - h, "stale"),
                (3, 5, base, "c")],
               [(3, 6, base, "c2")]]
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1) \
             .write.mode("append").parquet(src_dir)

    kw = dict(primary_keys=["k"], order_by=[F.col("ts").desc()],
              tiebreak=[F.col("event_id").desc()])
    stream1 = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(src_dir))
    foreach_batch_bucketed_upsert(
        stream1, snapshot_dir=str(tmp_path / "bsnap"),
        checkpoint_path=str(tmp_path / "bckpt"), n_buckets=4, **kw)
    stream2 = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(src_dir))
    foreach_batch_upsert(
        stream2, snapshot_dir=str(tmp_path / "fsnap"),
        checkpoint_path=str(tmp_path / "fckpt"), **kw)

    bucketed = {tuple(r) for r in read_bucketed_snapshot(
        spark, str(tmp_path / "bsnap")).select("k", "event_id", "v").collect()}
    full = {tuple(r) for r in read_snapshot(
        spark, str(tmp_path / "fsnap")).select("k", "event_id", "v").collect()}
    assert bucketed == full == {(1, 3, "a2"), (2, 2, "b"), (3, 6, "c2")}


def test_crash_recovery_restores_aside_bucket(spark, tmp_path):
    # Simulate a crash between the two swap renames: the only copy of
    # a bucket sits at .aside/_bucket=K and the live dir is missing.
    # The next entry to the table must move it back (ADVICE r9: the
    # old in-live aside location silently lost the bucket instead).
    import shutil

    snap = str(tmp_path / "snap")
    rows = [(k, 1, f"v{k}", "U") for k in range(1, 17)]
    bucketed_merge(spark.createDataFrame(rows, SCHEMA),
                   snapshot_dir=snap, primary_keys=["k"],
                   order_by=[F.col("seq").desc()], n_buckets=4)
    before = _state(spark, snap)
    live = os.path.join(snap, "data")
    victim = sorted(d for d in os.listdir(live)
                    if d.startswith(f"{BUCKET_COL}="))[0]
    aside_root = os.path.join(snap, ".aside")
    os.makedirs(aside_root, exist_ok=True)
    shutil.move(os.path.join(live, victim),
                os.path.join(aside_root, victim))
    # a plain read heals the straggler and sees every row
    assert _state(spark, snap) == before
    assert os.path.isdir(os.path.join(live, victim))
    assert not os.path.isdir(os.path.join(aside_root, victim))

    # superseded aside (live twin exists): dropped, state unchanged
    shutil.copytree(os.path.join(live, victim),
                    os.path.join(aside_root, victim))
    assert _state(spark, snap) == before
    assert not os.path.isdir(os.path.join(aside_root, victim))


def _wallclock_batch(spark):
    """3 rows whose keys change on every plan evaluation."""
    from pyspark.sql.functions import udf

    def _wallclock_key(i):
        import time
        return time.time_ns() + i

    _wallclock_udf = udf(_wallclock_key, "long").asNondeterministic()
    return (spark.range(3)
            .withColumn("k", _wallclock_udf("id"))
            .selectExpr("k", "id as seq", "'x' as v", "'U' as op"))


def test_nondeterministic_batch_fails_loudly_unpersisted(spark, tmp_path):
    # With persist_batch=False the plan is evaluated twice; a batch
    # whose rows change between evaluations can stage buckets outside
    # the touched set — the merge must raise, not drop rows (ADVICE
    # r9).
    import pytest

    snap = str(tmp_path / "snap")
    with pytest.raises(ValueError, match="nondeterministic"):
        bucketed_merge(_wallclock_batch(spark), snapshot_dir=snap,
                       primary_keys=["k"], order_by=[F.col("seq").desc()],
                       n_buckets=65536, persist_batch=False)
    # and the failed merge left no live table behind
    assert read_bucketed_snapshot(spark, snap) is None


def test_nondeterministic_batch_succeeds_by_default(spark, tmp_path):
    # Default persist_batch=True localCheckpoints the batch, so both
    # consumers read the SAME materialized rows: the formerly
    # operational error is now a successful merge of exactly the rows
    # the batch produced (VERDICT r10 #6).
    snap = str(tmp_path / "snap")
    touched = bucketed_merge(_wallclock_batch(spark), snapshot_dir=snap,
                             primary_keys=["k"],
                             order_by=[F.col("seq").desc()],
                             n_buckets=65536)
    assert touched
    assert read_bucketed_snapshot(spark, snap).count() == 3


def test_persist_batch_evaluates_plan_once(spark, tmp_path):
    # Side-effect instrumentation: an accumulator-bumping UDF in the
    # batch plan must fire once per row under the default
    # localCheckpoint (it fired 2x per row when the merge's two
    # consumers each re-evaluated the plan).
    from pyspark.sql.functions import udf

    snap = str(tmp_path / "snap")
    acc = spark.sparkContext.accumulator(0)

    def bump(i):
        acc.add(1)
        return int(i)

    rows = spark.range(7).selectExpr("id as k", "id as seq")
    batch = (rows.withColumn("k", udf(bump, "long")("k"))
                 .selectExpr("k", "seq", "'x' as v", "'U' as op"))
    bucketed_merge(batch, snapshot_dir=snap, primary_keys=["k"],
                   order_by=[F.col("seq").desc()], n_buckets=4)
    assert acc.value == 7, f"batch plan evaluated {acc.value / 7:.1f}x"


def test_null_op_rows_are_upserts(spark, tmp_path):
    # NULL op = ordinary upsert: visible in reads, never expired
    # (ADVICE r9: non-null-safe predicates silently destroyed them).
    from elt_gluepipeline_spark.streaming.bucketed_upsert import (
        expire_tombstones)

    snap = str(tmp_path / "snap")
    rows = [(1, 1, "a", None), (2, 2, None, "D"), (3, 3, "c", "U")]
    bucketed_merge(spark.createDataFrame(rows, SCHEMA),
                   snapshot_dir=snap, primary_keys=["k"],
                   order_by=[F.col("seq").desc()], n_buckets=4,
                   op_col="op")
    assert _state(spark, snap) == {1: (1, "a"), 3: (3, "c")}
    expire_tombstones(spark, snap, op_col="op",
                      expire_if=F.col("seq") < 10)
    assert _state(spark, snap) == {1: (1, "a"), 3: (3, "c")}
    raw = read_bucketed_snapshot(spark, snap)
    assert raw.filter(F.col("k") == 2).count() == 0      # expired
    assert raw.filter(F.col("k") == 1).count() == 1      # null-op kept


def test_rebucket_preserves_state_and_restores_pruning(spark, tmp_path):
    from elt_gluepipeline_spark.streaming.bucketed_upsert import rebucket

    snap = str(tmp_path / "snap")
    feed = [(k, s, f"v{k}.{s}", "D" if (k, s) == (7, 3) else "U")
            for k in range(1, 41) for s in (1, 2, 3)]
    df = spark.createDataFrame(feed, SCHEMA)
    # merge first two thirds at B=8, REBUCKET to 32 mid-feed, then the
    # final third at B=32: final state must equal a single-window
    # replay (rebucket is state-transparent)
    bucketed_merge(df.filter(F.col("seq") <= 2), snapshot_dir=snap,
                   primary_keys=["k"], order_by=[F.col("seq").desc()],
                   n_buckets=8, op_col="op")
    n = rebucket(spark, snap, primary_keys=["k"], new_n_buckets=32,
                 op_col="op")
    assert n == 40                        # one keep-latest winner per key
    touched = bucketed_merge(df.filter(F.col("seq") == 3),
                             snapshot_dir=snap, primary_keys=["k"],
                             order_by=[F.col("seq").desc()],
                             n_buckets=32, op_col="op")
    # the new layout really is 32-way: bucket ids beyond the old B=8
    # range appear, and the merge pruned to the batch's buckets
    live = os.path.join(snap, "data")
    dirs = {int(d.split("=")[1]) for d in os.listdir(live)
            if d.startswith(f"{BUCKET_COL}=")}
    assert max(dirs) >= 8 and set(touched) <= dirs

    expect = {k: (3, f"v{k}.3") for k in range(1, 41) if k != 7}
    assert _state(spark, snap) == expect
    # the tombstone row survived the migration (k=7 deleted at seq 3;
    # wait — (7,3) is the delete, so k=7 absent from reads but present
    # raw)
    raw = read_bucketed_snapshot(spark, snap)
    assert raw.filter((F.col("k") == 7) & (F.col("op") == "D")).count() == 1
    # late OLDER update for the deleted key still loses post-rebucket
    bucketed_merge(spark.createDataFrame([(7, 0, "zombie", "U")], SCHEMA),
                   snapshot_dir=snap, primary_keys=["k"],
                   order_by=[F.col("seq").desc()], n_buckets=32,
                   op_col="op")
    assert 7 not in _state(spark, snap)


def test_expire_prunes_scan_via_sidecar(spark, tmp_path):
    # With the tombstone-bounds sidecar, expiry must never OPEN a
    # bucket whose bound is zero. Pin it physically: corrupt a
    # no-tombstone bucket's parquet file — a pruned scan succeeds, an
    # unpruned one would fail to read the garbage.
    import json

    from elt_gluepipeline_spark.streaming.bucketed_upsert import (
        _SIDECAR, expire_tombstones)

    snap = str(tmp_path / "snap")
    rows = [(k, k, f"v{k}", "U") for k in range(1, 33)]
    rows.append((100, 1, None, "D"))
    bucketed_merge(spark.createDataFrame(rows, SCHEMA),
                   snapshot_dir=snap, primary_keys=["k"],
                   order_by=[F.col("seq").desc()], n_buckets=8,
                   op_col="op")
    bounds = json.load(open(os.path.join(snap, _SIDECAR)))["bounds"]
    tomb_bucket = [int(k) for k, v in bounds.items() if v > 0]
    assert len(tomb_bucket) == 1
    live = os.path.join(snap, "data")
    for d in os.listdir(live):
        if not d.startswith(f"{BUCKET_COL}="):
            continue
        if int(d.split("=")[1]) in tomb_bucket:
            continue
        for f in os.listdir(os.path.join(live, d)):
            if f.endswith(".parquet"):
                with open(os.path.join(live, d, f), "wb") as fh:
                    fh.write(b"not parquet")
    touched = expire_tombstones(spark, snap, op_col="op",
                                expire_if=F.col("seq") < 10)
    assert touched == tomb_bucket
    # exact post-swap lowering: no positive bounds remain → the next
    # expiry is a no-op without reading anything at all
    bounds2 = json.load(open(os.path.join(snap, _SIDECAR)))["bounds"]
    assert all(v == 0 for v in bounds2.values()) or bounds2 == {}
    assert expire_tombstones(spark, snap, op_col="op",
                             expire_if=F.lit(True)) == []


def test_expire_bootstraps_sidecar_on_first_full_scan(spark, tmp_path):
    import json

    from elt_gluepipeline_spark.streaming.bucketed_upsert import (
        _SIDECAR, expire_tombstones)

    snap = str(tmp_path / "snap")
    rows = [(1, 1, "a", "U"), (2, 2, None, "D"), (3, 30, None, "D")]
    # merged WITHOUT op_col: no sidecar maintained
    bucketed_merge(spark.createDataFrame(rows, SCHEMA),
                   snapshot_dir=snap, primary_keys=["k"],
                   order_by=[F.col("seq").desc()], n_buckets=4)
    assert not os.path.isfile(os.path.join(snap, _SIDECAR))
    expire_tombstones(spark, snap, op_col="op",
                      expire_if=F.col("seq") < 10)
    # the full-scan run bootstrapped exact counts: k=3's tombstone
    # bucket has bound 1, everything else is pruned away next time
    raw = json.load(open(os.path.join(snap, _SIDECAR)))
    bounds = {int(k): v for k, v in raw["bounds"].items()}
    assert sum(bounds.values()) == 1
    # the bootstrap records its op column, so later merges WITHOUT
    # op_col keep the bounds current (mixed-usage hole, VERDICT r10 #5)
    assert raw["op_col"] == "op" and raw["delete_op"] == "D"


def test_sidecar_maintained_without_op_col_after_adoption(spark, tmp_path):
    # VERDICT r10 "what's wrong #2": a merge WITHOUT op_col into a
    # sidecar-bearing snapshot used to leave new tombstones uncounted
    # (bound stays 0 -> a pruned expiry silently never expires them).
    # Now the sidecar records its op column and every merge maintains
    # it; a CONFLICTING op_col raises.
    import json

    import pytest

    from elt_gluepipeline_spark.streaming.bucketed_upsert import (
        _SIDECAR, expire_tombstones)

    snap = str(tmp_path / "snap")
    bucketed_merge(spark.createDataFrame([(1, 1, "a", "U")], SCHEMA),
                   snapshot_dir=snap, primary_keys=["k"],
                   order_by=[F.col("seq").desc()], n_buckets=4,
                   op_col="op")          # creates the sidecar
    # tombstone merged WITHOUT op_col: the bound must still rise
    bucketed_merge(spark.createDataFrame([(2, 2, None, "D")], SCHEMA),
                   snapshot_dir=snap, primary_keys=["k"],
                   order_by=[F.col("seq").desc()], n_buckets=4)
    bounds = {int(k): v for k, v in json.load(
        open(os.path.join(snap, _SIDECAR)))["bounds"].items()}
    assert sum(bounds.values()) == 1
    # and a pruned expiry (no full scan) still finds and expires it
    touched = expire_tombstones(spark, snap, op_col="op",
                                expire_if=F.col("seq") < 10)
    assert len(touched) == 1
    assert read_bucketed_snapshot(spark, snap).filter(
        F.col("k") == 2).count() == 0

    # conflicting op column is a contract violation, not a silent
    # second sidecar
    with pytest.raises(ValueError, match="mixed op_col"):
        bucketed_merge(spark.createDataFrame([(3, 3, "c", "U")], SCHEMA),
                       snapshot_dir=snap, primary_keys=["k"],
                       order_by=[F.col("seq").desc()], n_buckets=4,
                       op_col="v")


def test_one_data_file_per_bucket_per_write(spark, tmp_path):
    # partition discovery lists the WHOLE table before pruning, so
    # file count per bucket is a per-merge cost every later reader
    # pays: each write must route a bucket to exactly one task
    from elt_gluepipeline_spark.streaming.bucketed_upsert import rebucket

    snap = str(tmp_path / "snap")
    rows = [(k, 1, f"v{k}", "U") for k in range(1, 257)]
    bucketed_merge(spark.createDataFrame(rows, SCHEMA).repartition(8),
                   snapshot_dir=snap, primary_keys=["k"],
                   order_by=[F.col("seq").desc()], n_buckets=8)
    rebucket(spark, snap, primary_keys=["k"], new_n_buckets=32)
    live = os.path.join(snap, "data")
    for d in os.listdir(live):
        if d.startswith(f"{BUCKET_COL}="):
            files = [f for f in os.listdir(os.path.join(live, d))
                     if f.endswith(".parquet")]
            assert len(files) == 1, (d, files)


def test_maintain_bucket_layout(spark, tmp_path):
    """maintain_bucket_layout: the snapshot analog of the LSH index's
    maintain_entries_layout — auto_n_buckets picks B from on-disk
    BYTES (the SCALE_r10 lesson: merge/rebucket cost is byte-bound),
    hysteresis avoids churning the caller's n_buckets contract, and a
    migration preserves state and resumes pruned merges at the new B."""
    from elt_gluepipeline_spark.streaming.bucketed_upsert import (
        auto_n_buckets, maintain_bucket_layout)

    # formula at the measured anchors: 4.1 GB at the SCALE_r10 256 MB
    # test target -> 16 (the outgrown starting point measured there);
    # 100 TB at the 1 GB default -> the 65536 listing cap; tiny -> 16
    assert auto_n_buckets(4_198 * 1024**2, target_mb_per_bucket=256) == 16
    assert auto_n_buckets(100 * 1024**4) == 65536
    assert auto_n_buckets(1) == 16

    snap = str(tmp_path / "snap")
    rows = [(k, k, f"v{k}", "U") for k in range(200)]
    df = spark.createDataFrame(rows, SCHEMA)
    bucketed_merge(df, snapshot_dir=snap, primary_keys=["k"],
                   order_by=[F.col("seq").desc()], n_buckets=8,
                   op_col="op")
    before = _state(spark, snap)

    # in band (tiny table wants the floor 16; 8 is within 4x) -> no-op
    assert maintain_bucket_layout(
        spark, snap, primary_keys=["k"], current_n_buckets=8) is None

    # force a drift: a target of 1/64th of the measured size makes the
    # table "outgrown" (want lands on 64 or 128 vs current 8)
    def _du(path):
        live = os.path.join(path, "data")
        return sum(os.path.getsize(os.path.join(r, f))
                   for r, _, fs in os.walk(live) for f in fs)

    new_b = maintain_bucket_layout(
        spark, snap, primary_keys=["k"], current_n_buckets=8,
        target_mb_per_bucket=_du(snap) / 64 / (1024 * 1024), op_col="op")
    assert new_b is not None and new_b >= 8 * 4
    assert _state(spark, snap) == before
    # merges resume at the new B and stay pruned (touched < B)
    up = spark.createDataFrame([(7, 999, "v7b", "U")], SCHEMA)
    touched = bucketed_merge(up, snapshot_dir=snap, primary_keys=["k"],
                             order_by=[F.col("seq").desc()],
                             n_buckets=new_b, op_col="op")
    assert len(touched) == 1
    after = dict(before)
    after[7] = (999, "v7b")
    assert _state(spark, snap) == after

    # and with a target centered on the CURRENT size the same call is
    # a no-op (hysteresis): want lands on ~new_b, within the 4x band
    assert maintain_bucket_layout(
        spark, snap, primary_keys=["k"], current_n_buckets=new_b,
        target_mb_per_bucket=_du(snap) / new_b / (1024 * 1024),
        op_col="op") is None


def test_persist_batch_auto_gate(spark):
    """Round-12 pin (VERDICT r11 item #2): persist_batch="auto"
    checkpoints expensive/nondeterministic batches but skips the eager
    materialization for deterministic projection/filter/scan chains."""
    from elt_gluepipeline_spark.streaming.bucketed_upsert import (
        _is_cheap_deterministic_scan)

    base = spark.createDataFrame(
        [(1, 10, "a", "U"), (2, 20, "b", "U")], SCHEMA)
    # plain scan / projection / filter: cheap & deterministic -> skip
    assert _is_cheap_deterministic_scan(base)
    assert _is_cheap_deterministic_scan(
        base.filter(F.col("seq") % 3 == 1).select("k", "seq", "v", "op"))
    # aggregate, join, limit: keep the checkpoint
    assert not _is_cheap_deterministic_scan(
        base.groupBy("k").agg(F.max("seq").alias("seq")))
    assert not _is_cheap_deterministic_scan(
        base.join(base.select("k"), "k"))
    assert not _is_cheap_deterministic_scan(base.limit(1))
    # nondeterministic expression: keep the checkpoint
    assert not _is_cheap_deterministic_scan(
        base.withColumn("r", F.rand(7)))
    assert not _is_cheap_deterministic_scan(_wallclock_batch(spark))
