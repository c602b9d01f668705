"""TableCatalog: Iceberg-shaped semantics on the parquet-snapshot fallback.

The north_rule's storage layer is Iceberg; this sandbox has no Iceberg jar,
so the catalog must preserve the semantics the engine relies on — append vs
replace, numbered immutable snapshots, time-travel, snapshot properties —
through the fallback path that these tests pin down.
"""

import pytest
from pyspark.sql import functions as F

from homonim_spark.catalog import TableCatalog


@pytest.fixture()
def cat(spark, tmp_path):
    return TableCatalog(spark, str(tmp_path / "wh"))


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumn("v", F.col("id") * 2)


def test_append_accumulates_and_replace_shadows(spark, cat):
    s1 = cat.write(_df(spark, 0, 3), "t")
    s2 = cat.write(_df(spark, 3, 5), "t")
    assert (s1, s2) == (1, 2)
    assert sorted(r.id for r in cat.read("t").collect()) == [0, 1, 2, 3, 4]
    cat.write(_df(spark, 100, 102), "t", mode="replace")
    assert sorted(r.id for r in cat.read("t").collect()) == [100, 101]
    # appends after a replace stack on top of it
    cat.write(_df(spark, 200, 201), "t")
    assert sorted(r.id for r in cat.read("t").collect()) == [100, 101, 200]


def test_time_travel_reconstructs_past_views(spark, cat):
    cat.write(_df(spark, 0, 2), "t")
    cat.write(_df(spark, 2, 4), "t")
    cat.write(_df(spark, 50, 51), "t", mode="replace")
    assert sorted(r.id for r in cat.read("t", as_of=1).collect()) == [0, 1]
    assert sorted(r.id for r in cat.read("t", as_of=2).collect()) == [0, 1, 2, 3]
    assert sorted(r.id for r in cat.read("t", as_of=3).collect()) == [50]
    with pytest.raises(FileNotFoundError):
        cat.read("missing")


def test_snapshot_properties_record_run_metadata(spark, cat):
    # the FUSE_* tag analogue (reference fuse.py:193-207) rides on snapshots
    cat.write(_df(spark, 0, 1), "corrected",
              properties={"FUSE_MODEL": "gain-blk-offset",
                          "FUSE_KERNEL_SHAPE": "(5, 5)"})
    snaps = cat.snapshots("corrected")
    assert len(snaps) == 1
    assert snaps[0]["properties"]["FUSE_MODEL"] == "gain-blk-offset"
    assert cat.latest_snapshot("corrected") == 1


def test_unconfigured_iceberg_catalog_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="not configured"):
        TableCatalog(spark, str(tmp_path), catalog="nope")


def test_documents_round_trip_preserves_span_sequence(spark, cat, tmp_path):
    # per-row invariant (input_hint): span order survives the table layer
    from homonim_spark import datagen
    docs, _tiles = datagen.distributed_fixture(spark, n_pairs=2, tile=8,
                                               partitions=2)
    cat.write(docs, "documents")
    back = cat.read("documents")
    a = {r.doc_id: [(s.kind, s.media_ref, s.offset) for s in r.spans]
         for r in docs.collect()}
    b = {r.doc_id: [(s.kind, s.media_ref, s.offset) for s in r.spans]
         for r in back.collect()}
    assert a == b
