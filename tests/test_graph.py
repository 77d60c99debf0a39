"""PageRank (operators.graph): structural invariants, determinism
under repartitioning, grid-exact cross-engine replay."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elt_gluepipeline_spark.operators.graph import pagerank, pagerank_sql


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, w long")


def test_uniform_cycle_stays_uniform(spark):
    # a symmetric cycle is regular: every node keeps rank 1/n exactly
    n = 6
    rows = [(i, (i + 1) % n, 1) for i in range(n)] + \
           [((i + 1) % n, i, 1) for i in range(n)]
    out = {r.node: r.rank for r in pagerank(_edges(spark, rows)).collect()}
    assert len(out) == n
    for v in out.values():
        assert abs(v - 1.0 / n) < 1e-9


def test_star_center_dominates(spark):
    rows = []
    for leaf in range(1, 8):
        rows += [(0, leaf, 1), (leaf, 0, 1)]
    out = {r.node: r.rank for r in pagerank(_edges(spark, rows)).collect()}
    assert out[0] == max(out.values())
    assert all(abs(out[leaf] - out[1]) < 1e-12 for leaf in range(2, 8))
    # symmetric graph: no dangling leak — total mass stays ~1
    assert abs(sum(out.values()) - 1.0) < 1e-6


def test_determinism_under_repartitioning_and_broadcast(spark):
    import random
    rnd = random.Random(7)
    rows = list({(rnd.randrange(40), rnd.randrange(40)) for _ in range(300)})
    rows = [(a, b, 1 + (a + b) % 3) for a, b in rows if a != b]
    rows += [(b, a, w) for a, b, w in rows]          # symmetrize
    e = _edges(spark, rows)
    a = sorted(map(tuple, pagerank(e).collect()))
    b = sorted(map(tuple, pagerank(e.repartition(13)).collect()))
    c = sorted(map(tuple, pagerank(e, broadcast_ranks=True).collect()))
    assert a == b == c                 # bit-identical, not approximately


def test_sql_twin_replays_bit_for_bit(spark):
    import duckdb
    rows = [(0, 1, 2), (1, 0, 2), (1, 2, 1), (2, 1, 1), (2, 0, 3),
            (0, 2, 3), (3, 0, 1), (0, 3, 1)]
    mine = {r.node: r.rank for r in pagerank(_edges(spark, rows)).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE edges (s BIGINT, d BIGINT, w BIGINT)")
    con.executemany("INSERT INTO edges VALUES (?, ?, ?)", rows)
    duck = dict(con.execute("WITH " + pagerank_sql().lstrip()).fetchall())
    assert duck == mine                # grid-exact: equality, no tolerance
