"""Fit/serve split for the PQ/IVF family (round-4 judge item):
codebooks persist to a parquet artifact; serve runs score against the
loaded artifact with NO training stage."""

import pytest
from pyspark.sql import functions as F

from elt_gluepipeline_spark.operators.similarity import (
    fit_pq_artifact, ivf_pq_topk, ivf_pq_topk_serve, load_pq_artifact,
    pq_adc_topk, pq_adc_topk_serve, save_pq_artifact)
from elt_gluepipeline_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings")


def test_artifact_roundtrip_bitwise(spark, emb, tmp_path):
    art = fit_pq_artifact(emb, m=4, k=16, n_iter=2, seed=7,
                          n_cells=8, cell_seed=42)
    path = str(tmp_path / "pq")
    save_pq_artifact(spark, art, path)
    back = load_pq_artifact(spark, path)
    assert back == art                      # frozen dataclass equality
    assert back.coarse is not None and len(back.coarse) == 8
    assert len(back.books) == 4 and len(back.books[0]) == 16


def test_serve_equals_fit_and_serve(spark, emb):
    """The fused wrappers delegate to serve — output identity between
    fit+serve convenience and explicit artifact serve, both families."""
    q = emb.filter(F.col("vec_id") < 5)
    art = fit_pq_artifact(emb, m=4, k=16, n_iter=2, seed=7,
                          n_cells=8, cell_seed=42)
    a = pq_adc_topk(q, emb, 3, m=4, k=16, n_iter=2, seed=7).collect()
    b = pq_adc_topk_serve(q, emb, 3, art).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    a2 = ivf_pq_topk(q, emb, 3, n_cells=8, n_probe=2, cell_seed=42,
                     m=4, k=16, n_iter=2, seed=7).collect()
    b2 = ivf_pq_topk_serve(q, emb, 3, art, n_probe=2).collect()
    assert sorted(map(tuple, a2)) == sorted(map(tuple, b2))


def test_registry_serve_path_runs_no_fit(spark, sf_dir, monkeypatch, tmp_path):
    """With the artifact on disk, q77/q81/q82 must NEVER train: a
    poisoned _pq_fit proves the fit is excluded from their plans."""
    from elt_gluepipeline_spark.operators import similarity
    from elt_gluepipeline_spark.plans import training

    monkeypatch.setattr(training, "_ARTIFACT_ROOT", str(tmp_path / "arts"))
    monkeypatch.setattr(training, "_ARTIFACT_MEMO", {})
    # first call fits and persists
    assert training.q77_pq_adc(spark, sf_dir).count() > 0

    def _boom(*a, **kw):
        raise AssertionError("serve path must not train")

    monkeypatch.setattr(training, "_ARTIFACT_MEMO", {})  # force disk load
    monkeypatch.setattr(similarity, "_pq_fit", _boom)
    assert training.q77_pq_adc(spark, sf_dir).count() > 0
    assert training.q81_ivf_pq(spark, sf_dir).count() > 0
    assert training.q82_rerank(spark, sf_dir).count() > 0


def test_load_rejects_torn_artifact(spark, emb, tmp_path):
    art = fit_pq_artifact(emb, m=4, k=16, n_iter=2, seed=7)
    path = str(tmp_path / "torn")
    save_pq_artifact(spark, art, path)
    # drop half the centroid rows -> loader must refuse, not serve junk
    torn = spark.read.parquet(path).filter(F.col("cell") < 8)
    torn.write.mode("overwrite").parquet(str(tmp_path / "torn2"))
    with pytest.raises(ValueError, match="torn"):
        load_pq_artifact(spark, str(tmp_path / "torn2"))


# ---------------- k-means / IVF coarse artifacts (round-5) ----------------

def test_kmeans_artifact_roundtrip_and_serve_identity(spark, emb, tmp_path):
    """fit_kmeans_artifact -> save/load -> kmeans_assign_serve must be
    output-identical to the fused kmeans_lloyd with the same params."""
    from elt_gluepipeline_spark.operators.similarity import (
        fit_kmeans_artifact, kmeans_assign_serve, kmeans_lloyd)

    art = fit_kmeans_artifact(emb, k=8, n_iter=2, seed=7)
    path = str(tmp_path / "km")
    save_pq_artifact(spark, art, path)
    back = load_pq_artifact(spark, path)
    assert back == art
    assert len(back.books) == 1 and len(back.books[0]) == 8

    fused = kmeans_lloyd(emb, k=8, n_iter=2, seed=7).collect()
    served = kmeans_assign_serve(emb, back).collect()
    assert sorted(map(tuple, fused)) == sorted(map(tuple, served))


def test_ivf_centroids_artifact_serve_identity(spark, emb, tmp_path):
    """ivf_ann(centroids=artifact) must equal the fused sample path."""
    from elt_gluepipeline_spark.operators.similarity import (
        fit_ivf_centroids_artifact, ivf_ann)

    q = emb.filter(F.col("vec_id") < 5)
    art = fit_ivf_centroids_artifact(emb, n_cells=16, seed=42)
    path = str(tmp_path / "ivfc")
    save_pq_artifact(spark, art, path)
    back = load_pq_artifact(spark, path)
    assert back == art
    fused = ivf_ann(q, emb, 3, n_cells=16, n_probe=4, seed=42).collect()
    served = ivf_ann(q, emb, 3, n_cells=16, n_probe=4, seed=42,
                     centroids=[list(c) for c in back.books[0]]).collect()
    assert sorted(map(tuple, fused)) == sorted(map(tuple, served))


def test_q67_q31_serve_paths_run_no_fit(spark, sf_dir, monkeypatch, tmp_path):
    """With artifacts on disk, q67/q31 must NEVER train: poisoned fit
    entry points prove the training loop is out of their plans."""
    from elt_gluepipeline_spark.operators import similarity
    from elt_gluepipeline_spark.plans import training

    monkeypatch.setattr(training, "_ARTIFACT_ROOT", str(tmp_path / "arts"))
    monkeypatch.setattr(training, "_ARTIFACT_MEMO", {})
    # first calls fit and persist
    assert training.q67_kmeans(spark, sf_dir).count() > 0
    assert training.q31_ivf_ann(spark, sf_dir).count() > 0

    def _boom(*a, **kw):
        raise AssertionError("serve path must not train")

    monkeypatch.setattr(training, "_ARTIFACT_MEMO", {})  # force disk load
    monkeypatch.setattr(similarity, "_kmeans_fit_centroids", _boom)
    monkeypatch.setattr(similarity, "fit_ivf_centroids_artifact", _boom)
    monkeypatch.setattr(similarity, "portable_hash60", None, raising=False)
    assert training.q67_kmeans(spark, sf_dir).count() > 0
    assert training.q31_ivf_ann(spark, sf_dir).count() > 0
