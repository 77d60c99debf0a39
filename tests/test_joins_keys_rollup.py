import datetime as dt

from pyspark.sql import functions as F

from elt_gluepipeline_spark.functions.keys import (surrogate_key,
                                                   with_row_fingerprint)
from elt_gluepipeline_spark.operators.aggregates import grouping_rollup
from elt_gluepipeline_spark.operators.joins import asof_join
from elt_gluepipeline_spark.operators.similarity import cosine_neardup_pairs


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _events(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts("2024-01-05T10:00:00")),
         (2, 100, _ts("2024-01-01T00:00:00")),   # before any right row
         (3, 200, _ts("2024-01-05T10:00:00")),   # equal-ts inclusive match
         (4, 300, _ts("2024-01-05T10:00:00"))],  # key with no right rows
        "purchase_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(11, 100, _ts("2024-01-02T00:00:00")),
         (12, 100, _ts("2024-01-04T00:00:00")),  # latest before purchase 1
         (13, 100, _ts("2024-01-06T00:00:00")),  # after → never matches 1
         (21, 200, _ts("2024-01-05T10:00:00")),  # tie on ts with 22
         (22, 200, _ts("2024-01-05T10:00:00"))],
        "click_id long, user_id long, ts timestamp")
    return left, right


def test_asof_join_backward_inclusive_and_ties(spark):
    left, right = _events(spark)
    out = asof_join(left, right, on=["user_id"], left_ts="ts", right_ts="ts",
                    right_payload=["click_id"], tie_break="click_id",
                    prefix="last_")
    got = {r.purchase_id: r.last_click_id for r in out.collect()}
    assert got == {
        1: 12,     # latest click strictly before
        2: None,   # no click at-or-before
        3: 22,     # equal-ts match allowed; tie → greatest click_id
        4: None,   # key absent on right side
    }
    assert out.count() == left.count()  # left-outer: every left row kept


def test_asof_join_carries_left_columns(spark):
    left, right = _events(spark)
    left = left.withColumn("amount", F.col("purchase_id") * 10.0)
    out = asof_join(left, right, on=["user_id"], left_ts="ts", right_ts="ts",
                    right_payload=["click_id", "ts"], tie_break="click_id")
    row = out.filter(F.col("purchase_id") == 1).collect()[0]
    assert row.amount == 10.0
    assert row.asof_ts == _ts("2024-01-04T00:00:00")


def test_cosine_neardup_exact_pairs(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]),
         (2, [0.999, 0.01, 0.0]),   # near-dup of 1
         (3, [0.0, 1.0, 0.0]),      # orthogonal
         (4, [-1.0, 0.0, 0.0])],    # opposite
        "vec_id long, embedding array<float>")
    pairs = cosine_neardup_pairs(df, threshold=0.95, n_blocks=3).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]
    assert pairs[0].cosine > 0.99


def test_cosine_neardup_no_duplicate_pairs(spark):
    # all-identical vectors: every pair qualifies exactly once
    df = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(6)],
        "vec_id long, embedding array<float>")
    pairs = cosine_neardup_pairs(df, threshold=0.99, n_blocks=4)
    rows = [(p.id_a, p.id_b) for p in pairs.collect()]
    assert len(rows) == len(set(rows)) == 15  # C(6,2)
    assert all(a < b for a, b in rows)


def test_cosine_neardup_max_pairs_guard(spark):
    import pytest as _pytest
    df = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(6)],
        "vec_id long, embedding array<float>")
    with _pytest.raises(ValueError, match="max_pairs"):
        cosine_neardup_pairs(df, threshold=0.5, max_pairs=10)  # C(6,2)=15
    # explicit opt-out disables the guard
    assert cosine_neardup_pairs(df, threshold=0.5,
                                max_pairs=None).count() == 15
    # anchored mode has its own guard: 2 anchors x 6 = 12 > 10
    anchors = spark.createDataFrame([(0,), (1,)], "vec_id long")
    with _pytest.raises(ValueError, match="anchored"):
        cosine_neardup_pairs(df, threshold=0.5, anchor_ids=anchors,
                             max_pairs=10)


def test_cosine_neardup_anchored_equals_filtered_full(spark):
    import random as _random
    rng = _random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    anchors = spark.createDataFrame([(i,) for i in (3, 11, 27)],
                                    "vec_id long")
    full = cosine_neardup_pairs(df, threshold=0.2).collect()
    want = sorted((p.id_a, p.id_b, p.cosine) for p in full
                  if p.id_a in (3, 11, 27) or p.id_b in (3, 11, 27))
    got = cosine_neardup_pairs(df, threshold=0.2,
                               anchor_ids=anchors).collect()
    assert sorted((p.id_a, p.id_b, p.cosine) for p in got) == want
    assert want  # non-vacuous: the anchor set does hit pairs


def test_cosine_neardup_anchored_multiblock(spark):
    # force multi-block on both sides: tiny target_block_bytes splits
    # 12 anchors / 30 corpus vectors across several rectangular tiles;
    # anchor-anchor pairs must still appear exactly once
    df = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0]) for i in range(30)],
        "vec_id long, embedding array<float>")
    anchors = spark.createDataFrame([(i,) for i in range(12)],
                                    "vec_id long")
    out = cosine_neardup_pairs(df, threshold=0.99, anchor_ids=anchors,
                               target_block_bytes=128).collect()
    rows = [(p.id_a, p.id_b) for p in out]
    assert len(rows) == len(set(rows))
    # every pair has >=1 anchor endpoint; all anchor-incident pairs of
    # identical vectors qualify: C(12,2) + 12*18 = 66 + 216
    assert len(rows) == 282
    assert all(a < 12 or b < 12 for a, b in rows)


def test_grouping_rollup_levels(spark):
    df = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 4.0)],
        "k1 string, k2 string, v double")
    out = grouping_rollup(df, ["k1", "k2"], [F.sum("v").alias("s")])
    by_gid = {}
    for r in out.collect():
        by_gid.setdefault(r.gid, []).append(r)
    assert len(by_gid[0]) == 3            # detail level
    assert len(by_gid[1]) == 2            # per-k1 subtotals
    assert len(by_gid[3]) == 1            # grand total
    assert by_gid[3][0].s == 7.0


def test_surrogate_key_null_normalization_and_stability(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, None), (1, "a")],
        "k long, name string")
    out = df.select(surrogate_key("t", ["k", "name"]).alias("pk")).collect()
    assert out[0].pk == out[2].pk          # same keys → same pk
    assert out[0].pk != out[1].pk          # null is distinct from 'a'
    assert len(out[0].pk) == 64            # sha256 hex


def test_row_fingerprint_order_insensitive_to_column_def_order(spark):
    a = spark.createDataFrame([(1, "x")], "c1 long, c2 string")
    b = spark.createDataFrame([("x", 1)], "c2 string, c1 long")
    pa = with_row_fingerprint(a, "t").select("__pk").collect()[0][0]
    pb = with_row_fingerprint(b, "t").select("__pk").collect()[0][0]
    assert pa == pb


def test_date_dimension_iso_semantics(spark):
    from elt_gluepipeline_spark.sources.dimensions import date_dimension
    dim = date_dimension(spark, "2023-12-30", "2024-01-02").collect()
    by_key = {r.date_key: r for r in dim}
    assert len(dim) == 4
    sat = by_key["30-12-2023"]  # Saturday
    mon = by_key["01-01-2024"]  # Monday
    assert sat.iso_dow == 6 and sat.is_weekend
    assert mon.iso_dow == 1 and not mon.is_weekend
    assert mon.year == 2024 and mon.month == 1
    assert mon.week == 1  # ISO week 1 of 2024
    assert by_key["31-12-2023"].week == 52  # Sunday still ISO week 52


def test_date_dimension_leap_year_count(spark):
    from elt_gluepipeline_spark.sources.dimensions import date_dimension
    assert date_dimension(spark, "2024-01-01", "2024-12-31").count() == 366


def test_asof_join_null_timestamps(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts("2024-01-05T00:00:00")), (2, 100, None)],
        "purchase_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(11, 100, _ts("2024-01-01T00:00:00")), (12, 100, None)],
        "click_id long, user_id long, ts timestamp")
    out = asof_join(left, right, on=["user_id"], left_ts="ts", right_ts="ts",
                    right_payload=["click_id"], tie_break="click_id")
    got = {r.purchase_id: r.asof_click_id for r in out.collect()}
    # null-ts left rows never match; null-ts right rows never win
    assert got == {1: 11, 2: None}
    assert out.count() == 2


def test_range_join_band_and_bucketing(spark):
    from elt_gluepipeline_spark.operators.joins import range_join
    left = spark.createDataFrame(
        [(1, 100, _ts("2024-01-05T10:00:00")),
         (2, 100, _ts("2024-01-05T12:00:00")),
         (3, 300, _ts("2024-01-05T10:00:00")),   # key with no right rows
         (4, 100, None)],                        # null ts never matches
        "purchase_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(11, 100, _ts("2024-01-05T09:00:00")),  # exactly lower bound of p1
         (12, 100, _ts("2024-01-05T09:59:59")),
         (13, 100, _ts("2024-01-05T10:00:00")),  # equal ts → inclusive
         (14, 100, _ts("2024-01-05T10:00:01")),  # after p1, before p2's band
         (15, 100, _ts("2024-01-05T11:30:00")),  # in p2's band
         (16, 200, _ts("2024-01-05T09:30:00")),  # other key
         (17, 100, None)],
        "click_id long, user_id long, ts timestamp")
    out = range_join(left, right, on=["user_id"], left_ts="ts", right_ts="ts",
                     lower_s=-3600, upper_s=0, prefix="c_")
    pairs = {(r.purchase_id, r.c_click_id) for r in out.collect()}
    assert pairs == {(1, 11), (1, 12), (1, 13), (2, 15)}
    # no duplicate pairs from the bucket fan-out
    assert out.count() == len(pairs)


def test_range_join_forward_band_small_bucket(spark):
    from elt_gluepipeline_spark.operators.joins import range_join
    left = spark.createDataFrame(
        [(1, 7, _ts("2024-03-01T00:00:00"))],
        "pid long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, 7, _ts("2024-03-01T00:00:30")),
         (2, 7, _ts("2024-03-01T00:02:00")),
         (3, 7, _ts("2024-02-29T23:59:59"))],
        "rid long, k long, ts timestamp")
    # forward band [0, +60s], bucket much smaller than the band
    out = range_join(left, right, on=["k"], left_ts="ts", right_ts="ts",
                     lower_s=0, upper_s=60, bucket_s=7)
    assert {r.r_rid for r in out.collect()} == {1}


def test_snapshot_diff_classifies_iud_and_null_transitions(spark):
    from pyspark.sql import functions as F  # noqa: F811

    from elt_gluepipeline_spark.operators.joins import snapshot_diff
    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "C"), (4, None, "D")],
        "k long, price double, status string")
    new = spark.createDataFrame(
        [(1, 10.0, "A"),          # unchanged -> dropped
         (2, 25.0, "B"),          # price update
         (4, None, None),         # D -> NULL: status update, price same
         (5, 50.0, "E")],         # insert
        "k long, price double, status string")
    out = {r.k: (r.op, r.changed_cols, r.price, r.status)
           for r in snapshot_diff(old, new, ["k"],
                                  ["price", "status"]).collect()}
    assert out[2] == ("U", "price", 25.0, "B")
    assert out[3][0] == "D" and out[3][2] == 30.0          # old values kept
    assert out[4] == ("U", "status", None, None)           # NULL emitted, not coalesced
    assert out[5] == ("I", "", 50.0, "E")
    assert 1 not in out                                    # minimal feed


def test_range_join_band_is_microsecond_precise(spark):
    # regression (found by the sf0.1 oracle gate): whole-second epoch
    # truncation admitted right rows up to 999999 us outside the band
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([(1, t0)], "id long, ts timestamp_ntz")
    right = spark.createDataFrame(
        [(1, t0 + dt.timedelta(microseconds=300_000)),   # 0.3s AFTER: out
         (1, t0 - dt.timedelta(seconds=3600)),           # exactly -1h: in
         (1, t0 - dt.timedelta(seconds=3600,
                               microseconds=1)),         # 1us early: out
         (1, t0)],                                       # exact: in
        "id long, ts timestamp_ntz")
    from elt_gluepipeline_spark.operators.joins import range_join
    out = range_join(left.withColumnRenamed("id", "user_id"),
                     right.withColumnRenamed("id", "user_id"),
                     on=["user_id"], left_ts="ts", right_ts="ts",
                     lower_s=-3600, upper_s=0, prefix="r_")
    got = sorted(r.r_ts for r in out.collect())
    assert got == [t0 - dt.timedelta(seconds=3600), t0]


def test_asof_join_forward_matches_bruteforce(spark):
    import datetime as dt

    from elt_gluepipeline_spark.operators.joins import asof_join

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        [(1, ts(10)), (1, ts(30)), (1, ts(90)), (2, ts(5))],
        "k long, ts timestamp_ntz")
    right = spark.createDataFrame(
        [(1, ts(10), "a", 1), (1, ts(40), "b", 2), (1, ts(40), "c", 3),
         (2, ts(1), "z", 4)],
        "k long, ts timestamp_ntz, v string, rid long")
    out = asof_join(left, right, ["k"], "ts", "ts",
                    right_payload=["v"], tie_break="rid",
                    direction="forward")
    got = {(r.k, r.ts): r.asof_v for r in out.collect()}
    # inclusive: left@10 matches right@10; left@30 -> earliest future is
    # @40 where greatest tie ('c') wins; left@90 -> nothing after
    assert got == {(1, ts(10)): "a", (1, ts(30)): "c",
                   (1, ts(90)): None, (2, ts(5)): None}


def test_asof_join_forward_vs_backward_symmetry(spark, sf_dir):
    from pyspark.sql import functions as F

    from elt_gluepipeline_spark.operators.joins import asof_join
    from elt_gluepipeline_spark.sources.readers import read_table

    ev = read_table(spark, sf_dir, "events").limit(2000)
    p = ev.filter(F.col("event_type") == "purchase") \
          .select("user_id", "ts", "event_id")
    c = ev.filter(F.col("event_type") == "click") \
          .select("user_id", "ts", F.col("event_id").alias("cid"))
    fwd = asof_join(p, c, ["user_id"], "ts", "ts",
                    right_payload=["cid"], tie_break="cid",
                    direction="forward")
    # brute force: min future click ts then greatest cid at that ts
    j = (p.join(c.withColumnRenamed("ts", "cts"), "user_id", "left")
          .filter(F.col("cts").isNull() | (F.col("cts") >= F.col("ts")))
          .groupBy("user_id", "ts", "event_id")
          .agg(F.min_by(F.struct("cts", "cid"),
                        F.struct(F.col("cts"),
                                 (-F.col("cid")).alias("nc"))).alias("m")))
    brute = {(r.user_id, r.ts, r.event_id):
             (r.m["cid"] if r.m and r.m["cts"] is not None else None)
             for r in j.collect()}
    got = {(r.user_id, r.ts, r.event_id): r.asof_cid for r in fwd.collect()}
    # rows with no future click may be missing from the brute left-join
    # grouping only if the purchase had no clicks at all; align keys
    for k, v in got.items():
        assert brute.get(k, None) == v, (k, v, brute.get(k))
    assert any(v is not None for v in got.values())
