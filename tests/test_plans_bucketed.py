"""q195's value claim is the PLAN, not just the values: the bucketed
fact×fact join must run with no Exchange (and no Sort) between the
scans and the join — the whole point of paying the bucket shuffle at
write time. The correctness gate certifies the values; this pins the
physical plan shape so a regression (catalog metadata lost, bucketing
disabled, key mismatch) fails loudly."""

import io
from contextlib import redirect_stdout

from elt_gluepipeline_spark.plans import registry

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    # simple mode: the tree once, each node named once (formatted mode
    # repeats every node in the detail section, breaking count()s)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_q195_join_is_exchange_free(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = registry()["q195_bucketed_join"].build(spark, SF)
        plan = _plan(df)
        # exactly ONE Exchange: the final tiny groupBy. The join itself
        # reads co-partitioned buckets — no shuffle, no per-run
        # repartition (the reference pays 2 Exchanges every run).
        assert plan.count("Exchange") == 1, plan
        assert "SortMergeJoin" in plan, plan
        # single-file buckets + sortBy: merge join with NO Sort nodes
        assert "Sort " not in plan.replace("SortMergeJoin", ""), plan
        # scans carry bucket metadata out of the catalog
        assert "Bucketed: true" in _formatted(df), plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def _formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q195_idempotent_within_session(spark):
    # second build must reuse the session's tables (no re-write) and
    # return the same values
    r1 = registry()["q195_bucketed_join"].build(spark, SF)
    r2 = registry()["q195_bucketed_join"].build(spark, SF)
    a = {tuple(r.asDict().items()) for r in r1.collect()}
    b = {tuple(r.asDict().items()) for r in r2.collect()}
    assert a == b and len(a) > 0
