"""UDF-family API surface: each custom-logic entry point produces the same
answers as its pure-expression twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from executor_u1mindexer_spark import tables
from executor_u1mindexer_spark.functions import udfs
from executor_u1mindexer_spark.functions import vector as V
from executor_u1mindexer_spark.operators import pipeline as P


def test_pandas_udf_norm_matches_expression(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings").limit(50)
    both = emb.select(
        "vec_id",
        V.norm(V.as_double_array("embedding")).alias("expr_norm"),
        udfs.vector_norm_udf()(F.col("embedding").cast("array<double>")).alias("udf_norm"),
    ).collect()
    for r in both:
        assert abs(r.expr_norm - r.udf_norm) < 1e-12


def test_udtf_chunks_match_expression_chunker(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    spark.udtf.register("split_chunks", udfs.split_chunks_udtf())
    docs.createOrReplaceTempView("docs_udtf")
    got = {
        (r.doc_id, r.chunk_idx): (r.chunk_text, r.chunk_words)
        for r in spark.sql(
            "SELECT d.doc_id, c.* FROM docs_udtf d, LATERAL split_chunks(d.text) c"
        ).collect()
    }
    want = {
        (r.doc_id, r.chunk_idx): (r.chunk_text, r.chunk_words)
        for r in P.chunk_sliding_window(docs, size=32, stride=16).collect()
    }
    assert got == want and len(got) > 0
