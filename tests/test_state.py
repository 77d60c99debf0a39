import pytest

from elt_gluepipeline_spark.sources.state import (BookmarkStore, RunManifest,
                                                  parse_pk_config)


def test_bookmark_roundtrip(tmp_path):
    bs = BookmarkStore(str(tmp_path))
    assert bs.get("dbo.orders") is None
    bs.set("dbo.orders", "2024-01-01 00:00:00")
    assert bs.get("dbo.orders") == "2024-01-01 00:00:00"
    bs.set("dbo.orders", "2024-02-01 00:00:00")
    assert bs.get("dbo.orders") == "2024-02-01 00:00:00"


def test_manifest(tmp_path):
    m = RunManifest(str(tmp_path), "run1")
    m.log("ingest", "t1", "success", rows=10)
    p = m.flush()
    assert p.exists() and "success" in p.read_text()


def test_parse_pk_config():
    assert parse_pk_config("dbo.t1:pk|dbo.t2:pk1,pk2") == {
        "dbo.t1": ["pk"], "dbo.t2": ["pk1", "pk2"]}


@pytest.mark.parametrize("bad", [
    "", "   ", "t1", "t1:", ":pk", "t1:a|t1:b", "t1:a,a", "t1:a,,b", "|",
])
def test_parse_pk_config_rejects(bad):
    with pytest.raises(ValueError):
        parse_pk_config(bad)
