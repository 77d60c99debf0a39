"""End-to-end smoke of the reference's 4-stage chain (SURVEY.md §5):
incremental ingest → transform/conform → quality split → metrics, over
sf0.001 testdata, with row-count and schema contracts asserted at every
stage boundary. Stages communicate exclusively through parquet folders,
exactly like the reference's S3 hand-offs."""

from pyspark.sql import functions as F
from pyspark.sql.types import (DateType, DoubleType, LongType, StringType,
                               StructField, StructType)

from elt_gluepipeline_spark.functions.conform import conform, require_columns
from elt_gluepipeline_spark.functions.deterministic import dsum
from elt_gluepipeline_spark.operators.quality import (extract_violations,
                                                      split_clean)
from elt_gluepipeline_spark.sources.readers import read_table
from elt_gluepipeline_spark.sources.state import BookmarkStore
from elt_gluepipeline_spark.sources.writers import write_parquet
from elt_gluepipeline_spark.streaming.incremental import incremental_ingest

TRANSFORM_CONTRACT = StructType([
    StructField("l_orderkey", LongType()),
    StructField("l_linenumber", LongType()),
    StructField("l_quantity", DoubleType()),
    StructField("l_extendedprice", DoubleType()),
    StructField("l_discount", DoubleType()),
    StructField("l_returnflag", StringType()),
    StructField("ship_date", DateType()),
])


def test_full_chain_sf0001(spark, sf_dir, tmp_path):
    landing = str(tmp_path / "landing")
    final = str(tmp_path / "final")
    quarantine = str(tmp_path / "quality")
    metrics = str(tmp_path / "metrics")

    # -- stage 1: incremental ingest (full first window) ------------------
    src = read_table(spark, sf_dir, "lineitem")

    def read_since(last):
        df = read_table(spark, sf_dir, "lineitem")
        if last is not None:
            df = df.filter(F.col("l_shipdate") > last)
        return df

    r = incremental_ingest(
        spark, table="lineitem", read_since=read_since,
        watermark_col="l_shipdate", primary_keys=["l_orderkey", "l_linenumber"],
        sink_path=landing, bookmarks=BookmarkStore(str(tmp_path / "bm")))
    landed = spark.read.parquet(landing)
    # testdata carries duplicate (orderkey, linenumber) pairs: ingest
    # dedupes keep-latest per PK by watermark (W1/T3)
    n_pk = (src.select("l_orderkey", "l_linenumber").distinct().count())
    assert r.rows_ingested == landed.count() == n_pk
    assert landed.select("l_orderkey", "l_linenumber").distinct().count() == n_pk
    assert {"ingest_ts_utc", "source_table"} <= set(landed.columns)  # audit cols

    # -- stage 2: transform + contract ------------------------------------
    require_columns(landed, ["l_orderkey", "l_extendedprice", "l_shipdate"])
    transformed = conform(
        landed.withColumn("ship_date", F.col("l_shipdate").cast("date")),
        TRANSFORM_CONTRACT)
    assert transformed.schema == TRANSFORM_CONTRACT
    assert transformed.count() == n_pk                  # transform is total
    write_parquet(transformed, final + "_pre", max_files=8)

    # -- stage 3: quality gate --------------------------------------------
    pre = spark.read.parquet(final + "_pre")
    tagged = extract_violations(pre, [
        ("price_nonpos", F.col("l_extendedprice") <= 0),
        ("qty_high", F.col("l_quantity") >= 48),
    ]).cache()
    clean, bad = split_clean(tagged)
    n_clean, n_bad = clean.count(), bad.count()
    assert n_clean + n_bad == n_pk                      # exact partition
    write_parquet(clean, final)
    write_parquet(bad.withColumn("violated", F.array_join("violated", ",")),
                  quarantine)

    # -- stage 4: metrics over final ---------------------------------------
    base = spark.read.parquet(final)
    rev = base.groupBy("l_returnflag").agg(
        dsum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"))
    write_parquet(rev, metrics, partition_by=("l_returnflag",))
    out = spark.read.parquet(metrics)                   # partition discovery
    assert out.count() == base.select("l_returnflag").distinct().count()
    assert out.agg(F.sum("n_lines")).collect()[0][0] == n_clean
    tagged.unpersist()


def test_sql_front_door(spark, sf_dir):
    # SURVEY §7.1 engine/sql.py: every declared query is addressable
    # from spark.sql, and compositions over the views run the engine's
    # plans
    from elt_gluepipeline_spark.sql import register_all
    names = register_all(spark, sf_dir)
    assert "q02_clv" in names and len(names) > 50
    direct = spark.sql("SELECT COUNT(*) AS n FROM q02_clv").collect()[0].n
    assert direct > 0
    composed = spark.sql("""
        SELECT c.value_tier, SUM(l.revenue) AS rev
        FROM q01_line_revenue l JOIN q03_clv_tiered c
          ON l.l_orderkey = c.c_custkey
        GROUP BY c.value_tier
    """)  # cross-view composition plans and runs the engine's plans
    assert composed.count() >= 0 and {"value_tier", "rev"} == set(composed.columns)


def test_sql_front_door_default_registration_is_lazy(spark, sf_dir):
    """The laziness CONTRACT of register_all: with streaming/eager
    opted out, registration builds logical plans only — zero Spark
    jobs run (a query creeping into the default set with an eager
    collect/drain shows up here as submitted jobs)."""
    from elt_gluepipeline_spark.sql import load_tables, register_all

    sc = spark.sparkContext
    # pre-warm the footer-schema cache OUTSIDE the counted group so the
    # bound below is independent of test order (a solo run would
    # otherwise count one schema job per table — legitimate reads, not
    # eager creep)
    load_tables(spark, sf_dir)
    sc.setJobGroup("register_lazy", "laziness guard")
    names = register_all(spark, sf_dir)
    n_jobs = len(sc.statusTracker().getJobIdsForGroup("register_lazy"))
    sc.setLocalProperty("spark.jobGroup.id", None)
    assert len(names) > 100
    # the only permissible jobs with a warm schema cache are the two
    # lazy-localCheckpoint plan finalizations (q123/q140 — AQE runs the
    # checkpointed stage when the RDD is materialized at registration);
    # a query creeping into the default set with an eager collect/drain
    # blows well past this bound
    assert n_jobs <= 4, f"registration ran {n_jobs} Spark jobs"
