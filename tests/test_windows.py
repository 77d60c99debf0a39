from pyspark.sql import functions as F

from elt_gluepipeline_spark.operators.windows import (dedupe_keep_latest,
                                                      lag_features, ranked,
                                                      top_n_global,
                                                      top_n_per_key)


def _events(spark):
    rows = [
        ("u1", "click", 1, 10.0),
        ("u1", "click", 3, 30.0),   # latest for (u1, click)
        ("u1", "click", 2, 20.0),
        ("u2", "view", 5, 50.0),
    ]
    return spark.createDataFrame(rows, "user string, typ string, ts long, v double")


def test_dedupe_keep_latest(spark):
    out = dedupe_keep_latest(_events(spark), ["user", "typ"], [F.col("ts").desc()])
    got = {(r.user, r.typ): r.ts for r in out.collect()}
    assert got == {("u1", "click"): 3, ("u2", "view"): 5}


def test_dedupe_idempotent(spark):
    df = _events(spark)
    once = dedupe_keep_latest(df, ["user", "typ"], [F.col("ts").desc()])
    twice = dedupe_keep_latest(once, ["user", "typ"], [F.col("ts").desc()])
    assert sorted(once.collect()) == sorted(twice.collect())


def test_dedupe_tie_break_deterministic(spark):
    rows = [("u1", "click", 1, 100), ("u1", "click", 1, 200)]
    df = spark.createDataFrame(rows, "user string, typ string, ts long, id long")
    out = dedupe_keep_latest(df, ["user", "typ"], [F.col("ts").desc()],
                             [F.col("id").desc()])
    assert out.collect()[0].id == 200


def test_top_n_per_key_and_global(spark):
    df = _events(spark)
    per_key = top_n_per_key(df, ["user"], [F.col("v").desc()], 2)
    assert per_key.filter(F.col("user") == "u1").count() == 2
    top = top_n_global(df, [F.col("v").desc()], 1).collect()
    assert top[0].v == 50.0


def test_ranked(spark):
    df = _events(spark)
    out = ranked(df, [F.col("v").desc()]).collect()
    assert [r.v for r in sorted(out, key=lambda r: r["rank"])] == [50.0, 30.0, 20.0, 10.0]


def test_lag_features(spark):
    df = _events(spark).filter(F.col("user") == "u1")
    out = lag_features(df, ["user"], "ts", {"prev_v": "v"})
    rows = {r.ts: r.prev_v for r in out.collect()}
    assert rows == {1: None, 2: 10.0, 3: 20.0}
