"""Multimodal suite: text + vector + binary payloads in one schema
(operators/multimodal.py). The binary "decode" is the documented
deterministic fake — the Arrow/mapInPandas plumbing is the real artifact;
its oracle recomputes the same bytes from md5 hex in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from executor_u1mindexer_spark import tables
from executor_u1mindexer_spark.functions import vector as V
from executor_u1mindexer_spark.operators import multimodal as MM


def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, sf_dir, "documents")
    emb = tables.load(spark, sf_dir, "embeddings")
    out = MM.multimodal_join(docs, emb)
    return out.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        "label",
        V.norm(V.as_double_array("embedding")).alias("emb_norm"),
    )


def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> typed metadata through Arrow batches (mapInPandas)."""
    docs = tables.load(spark, sf_dir, "documents")
    return MM.extract_binary_metadata(MM.attach_fake_binary(docs))


def multimodal_decode_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: synthesize deterministic PPM/BMP/PNG
    bytes per doc (container cycles id%3; the PNG scanline filter cycles
    id%5 so all five unfilter paths run), then parse headers, DEFLATE
    streams, and pixel data with the pure-Python codecs
    (operators/multimodal.py). The oracle states the decoded metadata in
    closed form from the generation rule — if the decoder misreads a
    header, drops row padding, or unfilters a scanline wrong, width/height/
    pixel_sum diverge."""
    docs = tables.load(spark, sf_dir, "documents")
    return MM.decode_images_metadata(MM.attach_synthetic_images(docs))


QUERIES = {
    "multimodal_join": multimodal_join,
    "multimodal_binary_metadata": multimodal_binary_metadata,
    "multimodal_decode_image": multimodal_decode_image,
}

ORACLES = {
    "multimodal_join": """
SELECT d.doc_id, d.lang, d.source, d.n_chars, e.label,
       sqrt(list_reduce(list_transform(
              list_zip(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                       list_transform(e.embedding, x -> CAST(x AS DOUBLE))),
              x -> x[1]*x[2]), (s,y) -> s+y)) AS emb_norm
FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
""",
    # payload = unhex(md5(text)): n_bytes is always 16; byte k is hex pair k
    "multimodal_binary_metadata": """
SELECT doc_id,
       16 AS n_bytes,
       CAST('0x' || substr(md5(text), 1, 2) AS INT) AS first_byte,
       CAST('0x' || substr(md5(text), 1, 2) AS INT) % 64 + 1 AS fake_width,
       CAST('0x' || substr(md5(text), 3, 2) AS INT) % 64 + 1 AS fake_height
FROM documents
""",
    # image generation rule: w = id%5+2, h = id%3+2, channel byte i =
    # (id*7 + i) % 256 in top-down raster order — so the decoded metadata
    # has this closed form (no decoding in the oracle)
    "multimodal_decode_image": """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'ppm' WHEN 1 THEN 'bmp' ELSE 'png' END AS format,
       CAST(doc_id % 5 + 2 AS INT) AS width,
       CAST(doc_id % 3 + 2 AS INT) AS height,
       CAST(list_sum(list_transform(
              range(0, (doc_id % 5 + 2) * (doc_id % 3 + 2) * 3),
              i -> (doc_id * 7 + i) % 256)) AS BIGINT) AS pixel_sum
FROM documents
""",
}
