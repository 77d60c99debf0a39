

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
