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
    """REAL image decode end-to-end: synthesize deterministic
    PPM/BMP/PNG/JPEG bytes per doc (container cycles id%4; the PNG
    scanline filter cycles id%5 so all five unfilter paths run; the JPEG
    slot alternates id%8=3 → 4:4:4 grayscale and id%8=7 → 4:2:0
    chroma-subsampled constant color, both MCU-constant so the baseline
    huffman+DCT codec of operators/jpeg.py roundtrips them exactly), then
    parse headers, DEFLATE streams, entropy-coded segments, and pixel
    data with the pure-Python codecs. The oracle states the decoded
    metadata in closed form from the generation rule — if a decoder
    misreads a header, drops row padding, unfilters a scanline wrong,
    mis-orders the 4:2:0 MCU interleave, or mis-dequantizes a DC
    coefficient, width/height/pixel_sum diverge."""
    docs = tables.load(spark, sf_dir, "documents")
    return MM.decode_images_metadata(MM.attach_synthetic_images(docs))


def multimodal_decode_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: synthesize deterministic RIFF/WAVE
    PCM16 payloads per doc (every 4th carries a LIST junk chunk the parser
    must skip), then chunk-walk the container and integrate the samples
    (operators/multimodal.py decode_wav). The oracle states the decoded
    metadata in closed form from the generation rule — a misread header,
    unskipped chunk, or sign error in the PCM unpack diverges sum_abs."""
    docs = tables.load(spark, sf_dir, "documents")
    return MM.decode_audio_metadata(MM.attach_synthetic_audio(docs))


def multimodal_sample_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-5th-frame sampling over a synthesized frame-index container:
    one row per SAMPLED frame (1->many mapInPandas explosion), timestamps
    from the fps in the container header."""
    docs = tables.load(spark, sf_dir, "documents")
    return MM.sample_video_frames(MM.attach_synthetic_video(docs), every=5)


QUERIES = {
    "multimodal_join": multimodal_join,
    "multimodal_binary_metadata": multimodal_binary_metadata,
    "multimodal_decode_image": multimodal_decode_image,
    "multimodal_decode_audio": multimodal_decode_audio,
    "multimodal_sample_video_frames": multimodal_sample_video_frames,
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
    # image generation rule: w = id%5+2, h = id%3+2; lossless containers
    # (id%4 in 0..2) carry RGB byte i = (id*7 + i) % 256; the JPEG slot
    # (id%4=3) alternates: id%8=3 is constant gray (id*7)%256 in 4:4:4,
    # id%8=7 is constant color ((id*7)%256, (id*11)%256, (id*13)%256) in
    # 4:2:0 — both exactly roundtripped (block/MCU-constant, all-ones
    # quant) — so the decoded metadata has this closed form (no decoding
    # in the oracle)
    "multimodal_decode_image": """
SELECT doc_id,
       CASE WHEN doc_id % 8 = 4 THEN 'gif'
            WHEN doc_id % 4 = 0 THEN 'ppm' WHEN doc_id % 4 = 1 THEN 'bmp'
            WHEN doc_id % 4 = 2 THEN 'png' ELSE 'jpeg' END AS format,
       CAST(doc_id % 5 + 2 AS INT) AS width,
       CAST(doc_id % 3 + 2 AS INT) AS height,
       CAST(CASE WHEN doc_id % 8 = 3
            THEN (doc_id % 5 + 2) * (doc_id % 3 + 2) * ((doc_id * 7) % 256)
            WHEN doc_id % 8 = 7
            THEN (doc_id % 5 + 2) * (doc_id % 3 + 2)
                 * ((doc_id * 7) % 256 + (doc_id * 11) % 256 + (doc_id * 13) % 256)
            ELSE list_sum(list_transform(
                   range(0, (doc_id % 5 + 2) * (doc_id % 3 + 2) * 3),
                   i -> (doc_id * 7 + i) % 256))
       END AS BIGINT) AS pixel_sum
FROM documents
""",
    # audio generation rule: channels = id%2+1, rate = 8000*(id%3+1),
    # frames = id%40+5, interleaved sample i = ((id*131 + i*17) % 65536)
    # - 32768 — closed form, no decoding in the oracle
    "multimodal_decode_audio": """
SELECT doc_id,
       CAST(8000 * (doc_id % 3 + 1) AS INT) AS sample_rate,
       CAST(doc_id % 2 + 1 AS INT) AS n_channels,
       CAST(16 AS INT) AS bit_depth,
       CAST(doc_id % 40 + 5 AS BIGINT) AS n_frames,
       CAST((doc_id % 40 + 5) * 1000000 // (8000 * (doc_id % 3 + 1)) AS BIGINT) AS duration_us,
       CAST(list_sum(list_transform(
              range(0, (doc_id % 40 + 5) * (doc_id % 2 + 1)),
              i -> abs(((doc_id * 131 + i * 17) % 65536) - 32768))) AS BIGINT) AS sum_abs
FROM documents
""",
    # video index rule: n_frames = id%24+8, fps = 10*(id%3+1), checksum of
    # frame f = (id*997 + f*31) % 2147483647; sampled f = 0,5,10,...
    "multimodal_sample_video_frames": """
SELECT d.doc_id,
       CAST(t.i * 5 AS INT) AS frame_idx,
       CAST(t.i * 5 * 1000 // (10 * (d.doc_id % 3 + 1)) AS BIGINT) AS ts_ms,
       CAST((d.doc_id * 997 + t.i * 5 * 31) % 2147483647 AS BIGINT) AS checksum
FROM documents d, unnest(range(0, (d.doc_id % 24 + 8 + 4) // 5)) AS t(i)
""",
}
