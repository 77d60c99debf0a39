"""Property-based tests (SURVEY.md §5): the QA-gate invariants hold for
arbitrary inputs, not just the fixture rows. Examples are bounded (each
one runs Spark jobs) but generated — nulls, duplicates, extremes and
empty frames all get exercised."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from elt_gluepipeline_spark.functions.conform import conform
from elt_gluepipeline_spark.operators.quality import (extract_violations,
                                                      split_clean)
from elt_gluepipeline_spark.operators.windows import dedupe_keep_latest

SETTINGS = settings(max_examples=10, deadline=None,
                    suppress_health_check=[HealthCheck.function_scoped_fixture])

price = st.one_of(st.none(), st.floats(min_value=-1e6, max_value=1e6,
                                       allow_nan=False, allow_infinity=False))
qty = st.one_of(st.none(), st.integers(min_value=-5, max_value=60))
rows = st.lists(st.tuples(st.integers(0, 5), price, qty), min_size=0, max_size=30)

def _rules():
    return [
        ("price_null", F.col("price").isNull()),
        ("price_nonpos", F.col("price") <= 0),
        ("qty_high", F.col("qty") >= 48),
    ]


@given(rows)
@SETTINGS
def test_quality_split_is_exact_partition(spark, data):
    df = spark.createDataFrame(data, "k int, price double, qty int") \
        if data else spark.createDataFrame([], "k int, price double, qty int")
    tagged = extract_violations(df, _rules())
    clean, quarantine = split_clean(tagged)
    n_clean, n_quar = clean.count(), quarantine.count()
    # partition: counts add up (multiset-exact, no subtract dedupe)
    assert n_clean + n_quar == len(data)
    # disjoint by construction; quarantined rows each violate >= 1 rule
    assert quarantine.filter(F.size("violated") == 0).count() == 0
    # reunion preserves the input multiset
    reunion = clean.unionByName(quarantine.drop("violated"))
    assert sorted(map(repr, map(tuple, reunion.collect()))) == \
        sorted(map(repr, data))


@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 10)),
                min_size=1, max_size=25))
@SETTINGS
def test_dedupe_keep_latest_properties(spark, data):
    df = spark.createDataFrame(data, "k int, wm int")
    once = dedupe_keep_latest(df, ["k"], [F.col("wm").desc()])
    twice = dedupe_keep_latest(once, ["k"], [F.col("wm").desc()])
    got = {(r.k, r.wm) for r in once.collect()}
    # idempotent
    assert {(r.k, r.wm) for r in twice.collect()} == got
    # one row per key, and it carries that key's max watermark
    expect_keys = {k for k, _ in data}
    assert {k for k, _ in got} == expect_keys
    for k in expect_keys:
        assert dict(got)[k] == max(wm for kk, wm in data if kk == k)
    # output ⊆ input
    assert got <= set(data)


@given(st.lists(st.tuples(st.one_of(st.none(), st.text(max_size=5)),
                          st.integers(-1000, 1000)),
                min_size=0, max_size=20))
@SETTINGS
def test_conform_idempotent_and_total(spark, data):
    from pyspark.sql.types import (IntegerType, StringType, StructField,
                                   StructType)
    contract = StructType([
        StructField("name", StringType()),
        StructField("n", IntegerType()),
        StructField("absent", StringType()),   # missing → typed null
    ])
    df = spark.createDataFrame(data, "name string, n long") \
        if data else spark.createDataFrame([], "name string, n long")
    df = df.withColumn("extra", F.lit(1))      # extra → dropped
    once = conform(df, contract)
    assert once.schema == contract or \
        [f.dataType for f in once.schema.fields] == [f.dataType for f in contract.fields]
    assert conform(once, contract).collect() == once.collect()
    assert once.count() == len(data)
    assert once.filter(F.col("absent").isNotNull()).count() == 0


_asof_rows = st.lists(
    st.tuples(st.integers(0, 3),            # key
              st.integers(0, 100),          # ts (seconds)
              st.integers(0, 1000)),        # id / payload
    min_size=0, max_size=25)


@given(_asof_rows, _asof_rows)
@SETTINGS
def test_asof_join_both_directions_match_bruteforce(spark, lrows, rrows):
    from elt_gluepipeline_spark.operators.joins import asof_join

    schema_l = "k int, ts long, lid long"
    schema_r = "k int, ts long, rid long"
    left = (spark.createDataFrame(lrows, schema_l) if lrows
            else spark.createDataFrame([], schema_l))
    right = (spark.createDataFrame(rrows, schema_r) if rrows
             else spark.createDataFrame([], schema_r))

    for direction in ("backward", "forward"):
        out = asof_join(left, right, ["k"], "ts", "ts",
                        right_payload=["rid"], tie_break="rid",
                        direction=direction)
        got = {(r.k, r.ts, r.lid): r.asof_rid for r in out.collect()}

        expect = {}
        for k, lts, lid in lrows:
            if direction == "backward":
                cand = [rid for rk, rts, rid in rrows
                        if rk == k and rts <= lts]
                # latest ts wins; greatest rid breaks ties — emulate by
                # taking max (rts, rid)
                cand2 = [(rts, rid) for rk, rts, rid in rrows
                         if rk == k and rts <= lts]
                expect[(k, lts, lid)] = (max(cand2)[1] if cand2 else None)
            else:
                cand2 = [(rts, rid) for rk, rts, rid in rrows
                         if rk == k and rts >= lts]
                if cand2:
                    mn = min(t for t, _ in cand2)
                    expect[(k, lts, lid)] = max(r for t, r in cand2
                                                if t == mn)
                else:
                    expect[(k, lts, lid)] = None
        assert got == expect, (direction, got, expect)
