"""End-to-end facade parity: the reference's benchmark.py flow (index →
search → update → delete → dump → load → status) through U1MIndexerSpark."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from executor_u1mindexer_spark import tables
from executor_u1mindexer_spark.engine import U1MIndexerSpark


@pytest.fixture()
def engine(spark, sf_dir, tmp_path):
    eng = U1MIndexerSpark(spark, dim=64, workspace=str(tmp_path), metric="cosine", limit=20)
    docs = (
        tables.load(spark, sf_dir, "embeddings")
        .join(
            tables.load(spark, sf_dir, "documents"),
            F.col("vec_id") == F.col("doc_id"),
        )
        .select("doc_id", "embedding", "text", "lang")
        .filter(F.col("doc_id") < 100)
    )
    eng.index(docs)
    return eng


def test_index_then_search_returns_full_payload(spark, engine, sf_dir):
    q = (
        tables.load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 3)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding"))
    )
    rows = engine.search(q, limit=5).orderBy("rank").collect()
    assert len(rows) == 5
    assert rows[0].vec_id == 3 and rows[0].rank == 1  # self-match first
    assert rows[0].text is not None and rows[0].lang is not None


def test_update_skips_unknown_and_reembeds_known(spark, engine):
    upd = spark.createDataFrame(
        [(3, [1.0] * 64), (99999, [2.0] * 64)],
        "doc_id long, embedding array<double>",
    )
    skipped = engine.update(upd).collect()
    assert [r.id for r in skipped] == [99999]
    assert engine.status()["count_active"] == 100  # no inserts happened


def test_delete_and_status_tombstones(spark, engine):
    engine.delete([0, 1, 31337])  # 31337 unknown -> ignored
    st = engine.status()
    assert st["count_active"] == 98
    assert st["count_deleted"] == 2
    assert st["count_indexed"] == 100  # tombstones still counted
    assert st["size_dam"] == 98


def test_dump_load_roundtrip_preserves_search(spark, engine, sf_dir, tmp_path):
    engine.dump()
    eng2 = U1MIndexerSpark(spark, dim=64, workspace=str(tmp_path))
    q = (
        tables.load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 7)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_embedding"))
    )
    a = [(r.vec_id, r.rank) for r in engine.search(q, limit=5, with_payload=False).collect()]
    b = [(r.vec_id, r.rank) for r in eng2.search(q, limit=5, with_payload=False).collect()]
    assert sorted(a) == sorted(b)


def test_dump_after_load_same_workspace(spark, engine, tmp_path):
    """dump over a workspace the state was LOADED from (lineage reads the
    path being overwritten) — must not corrupt the snapshot."""
    engine.dump()
    eng2 = U1MIndexerSpark(spark, dim=64, workspace=str(tmp_path))
    upd = spark.createDataFrame([(3, [2.0] * 64)], "doc_id long, embedding array<double>")
    eng2.index(upd)
    eng2.dump()  # self-overwrite cycle
    eng3 = U1MIndexerSpark(spark, dim=64, workspace=str(tmp_path))
    assert eng3.status()["count_active"] == 100


def test_dim_mismatch_raises(spark, engine):
    bad = spark.createDataFrame([(1, [1.0] * 32)], "doc_id long, embedding array<double>")
    with pytest.raises(ValueError):
        engine.index(bad)


def test_clear_empties(spark, engine):
    engine.clear()
    st = engine.status()
    assert st == {"count_indexed": 0, "count_active": 0, "count_deleted": 0, "size_dam": 0}
