

def test_connected_components_transitive_chain(spark):
    from elt_gluepipeline_spark.operators.dedup import (connected_components,
                                                        keep_canonical)
    # chain 1-2-3 must collapse to ONE component even though (1,3) was
    # never a pair; 7-8 is a separate component; 99 untouched
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long")
    comp = {(r.id, r.component)
            for r in connected_components(pairs).collect()}
    assert comp == {(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)}
    docs = spark.createDataFrame([(i,) for i in (1, 2, 3, 7, 8, 99)],
                                 "doc_id long")
    kept = sorted(r.doc_id for r in
                  keep_canonical(docs, connected_components(pairs),
                                 "doc_id").collect())
    assert kept == [1, 7, 99]  # one survivor per component + unpaired


def test_connected_components_long_chain_converges(spark):
    from elt_gluepipeline_spark.operators.dedup import connected_components
    # a 12-node path exercises multiple propagation rounds
    pairs = spark.createDataFrame([(i, i + 1) for i in range(12)],
                                  "id_a long, id_b long")
    comp = connected_components(pairs).collect()
    assert {r.component for r in comp} == {0}
    assert len(comp) == 13


def test_star_contraction_matches_min_label(spark):
    import random
    from elt_gluepipeline_spark.operators.dedup import (
        connected_components, connected_components_star)
    rng = random.Random(11)
    # random graph: 60 nodes, 50 random edges → many components
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(50)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    star = {(r.id, r.component)
            for r in connected_components_star(pairs).collect()}
    prop = {(r.id, r.component)
            for r in connected_components(pairs).collect()}
    assert star == prop and len(star) > 0


def test_star_contraction_long_chain_few_rounds(spark):
    from elt_gluepipeline_spark.operators.dedup import \
        connected_components_star
    # a 40-hop path converges in O(log n) rounds — max_iters=8 would
    # be nowhere near enough for per-hop propagation
    pairs = spark.createDataFrame([(i, i + 1) for i in range(40)],
                                  "id_a long, id_b long")
    comp = connected_components_star(pairs, max_iters=8).collect()
    assert {r.component for r in comp} == {0}
    assert len(comp) == 41
