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


def test_triangle_counts_handcrafted(spark):
    from elt_gluepipeline_spark.operators.graph import triangle_counts
    # K3 {1,2,3} + tail 3-4 + isolated edge 5-6 + second triangle
    # {3,4,5} sharing node 3 and edge 3-4
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5), (5, 6)],
        "s long, d long")
    out = {r.node: (r.degree, r.n_triangles)
           for r in triangle_counts(edges).collect()}
    assert out == {1: (2, 1), 2: (2, 1), 3: (4, 2),
                   4: (2, 1), 5: (3, 1), 6: (1, 0)}


def test_triangle_counts_no_triangles(spark):
    from elt_gluepipeline_spark.operators.graph import triangle_counts
    # a path graph has zero triangles everywhere
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)],
                                  "s long, d long")
    rows = triangle_counts(edges).collect()
    assert all(r.n_triangles == 0 for r in rows)
    assert {r.node for r in rows} == {1, 2, 3, 4}
