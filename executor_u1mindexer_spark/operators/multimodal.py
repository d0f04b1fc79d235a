"""Multimodal-column operators — opaque binary payloads with typed metadata.

The Jina Document (reference executor.py:6) carries arbitrary bytes next to
text/embedding/tags; Spark-side the equivalent is a BinaryType column with
struct metadata. The image/audio decode libraries are NOT in this container,
so the decode step is STUBBED (clearly-marked NotImplementedError, or a
deterministic fake) while everything Spark-owns — schema, Arrow batch
transfer, mapInPandas signature, partitioning — is real and tested.

Scale notes: binary payloads ride the columnar path (parquet BYTE_ARRAY,
Arrow Binary); mapInPandas streams Arrow batches so a 100 TB decode job is
bounded by batch size, not partition size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BINARY_META_SCHEMA = "doc_id long, n_bytes int, first_byte int, fake_width int, fake_height int"


def attach_fake_binary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic stand-in payload: the 16 md5 bytes of the text column
    (the fixture has no real image bytes; this keeps every downstream step
    oracle-checkable)."""
    return docs.withColumn("payload", F.unhex(F.md5(F.col(text_col))))


def extract_binary_metadata(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """Arrow-batched metadata extraction over a binary column (mapInPandas).

    The "decode" is a deterministic fake (dimensions derived from leading
    bytes) — swap `_fake_decode` for a real PIL/librosa call when the
    libraries exist. The plumbing (binary -> pandas bytes -> typed struct
    rows) is the production shape.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[bin_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": payloads.map(len),
                    "first_byte": payloads.map(lambda b: b[0]),
                    "fake_width": payloads.map(lambda b: b[0] % 64 + 1),
                    "fake_height": payloads.map(lambda b: b[1] % 64 + 1),
                }
            )

    from executor_u1mindexer_spark.operators.dedup import _spread

    return _spread(df.select(id_col, bin_col)).mapInPandas(
        extract, schema=BINARY_META_SCHEMA
    )


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """Compressed-format decode (PNG/JPEG/...) — STUB. The container has no
    PIL/opencv; gate the import and fail loudly rather than fake silently.
    Uncompressed BMP and PPM are decoded for real by decode_image_meta."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "compressed image decode requires PIL, which is not available in "
            "this environment; decode_image_meta handles uncompressed "
            "BMP/PPM in pure Python"
        ) from e
    raise NotImplementedError("real decode path not implemented in this round")


# -- real pure-Python codecs for uncompressed formats ------------------------
#
# PPM (P6) and 24-bit BI_RGB BMP need no image library: the formats are a
# text/struct header plus raw RGB bytes. Encoding + decoding them for real
# makes the multimodal decode path end-to-end exercisable (and oracle-
# checkable) despite PIL being absent.


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """P6 binary PPM: ASCII header then w*h*3 RGB bytes, top-down raster."""
    if len(pixels) != width * height * 3:
        raise ValueError(f"expected {width * height * 3} pixel bytes, got {len(pixels)}")
    return f"P6\n{width} {height}\n255\n".encode() + pixels


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """24-bit uncompressed (BI_RGB) BMP from top-down raster RGB bytes.
    BMP stores rows bottom-up as BGR with each row padded to 4 bytes."""
    import struct

    if len(pixels) != width * height * 3:
        raise ValueError(f"expected {width * height * 3} pixel bytes, got {len(pixels)}")
    row_size = (width * 3 + 3) & ~3
    image_size = row_size * height
    rows = []
    for r in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for c in range(width):
            i = (r * width + c) * 3
            row += bytes((pixels[i + 2], pixels[i + 1], pixels[i]))  # BGR
        row += b"\x00" * (row_size - width * 3)
        rows.append(bytes(row))
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + image_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0)
    return header + info + b"".join(rows)


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Parse P6 PPM → (width, height, top-down raster RGB bytes)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = 3 whitespace-separated tokens after the magic, then ONE
    # whitespace byte, then binary data (comments not supported — the
    # encoder never writes them)
    pos, tokens = 2, []
    while len(tokens) < 3:
        while payload[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    pixels = payload[pos : pos + width * height * 3]
    if len(pixels) != width * height * 3:
        raise ValueError("truncated PPM pixel data")
    return width, height, pixels


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Parse 24-bit BI_RGB BMP → (width, height, top-down raster RGB)."""
    import struct

    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, compression={compression})")
    row_size = (width * 3 + 3) & ~3
    out = bytearray(width * height * 3)
    for r in range(height):
        src = data_offset + (height - 1 - r) * row_size  # stored bottom-up
        for c in range(width):
            b, g, rr = payload[src + c * 3 : src + c * 3 + 3]
            i = (r * width + c) * 3
            out[i], out[i + 1], out[i + 2] = rr, g, b
    return width, height, bytes(out)


def decode_image_meta(payload: bytes) -> dict:
    """Dispatch on magic bytes; returns format/width/height/pixel_sum where
    pixel_sum is the sum of all RGB channel bytes in top-down raster order
    (identical for the same image in either container format)."""
    if payload.startswith(b"P6"):
        fmt, (w, h, px) = "ppm", decode_ppm(payload)
    elif payload.startswith(b"BM"):
        fmt, (w, h, px) = "bmp", decode_bmp(payload)
    else:
        raise ValueError("unrecognized image payload (expected P6 PPM or BMP)")
    return {"format": fmt, "width": w, "height": h, "pixel_sum": sum(px)}


def attach_synthetic_images(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic test images derived ONLY from the id: width = id%5+2,
    height = id%3+2, channel byte i = (id*7 + i) % 256 (top-down raster),
    even ids PPM / odd ids BMP — so an oracle can state the decoded
    metadata in closed form without itself decoding anything."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for did in pdf[id_col]:
                did = int(did)
                w, h = did % 5 + 2, did % 3 + 2
                px = bytes((did * 7 + i) % 256 for i in range(w * h * 3))
                payloads.append(encode_ppm(w, h, px) if did % 2 == 0 else encode_bmp(w, h, px))
                ids.append(did)
            yield pd.DataFrame({id_col: ids, "img": payloads})

    from executor_u1mindexer_spark.operators.dedup import _spread

    return _spread(docs.select(id_col)).mapInPandas(
        gen, schema=f"{id_col} long, img binary"
    )


DECODED_META_SCHEMA = "doc_id long, format string, width int, height int, pixel_sum long"


def decode_images_metadata(df: DataFrame, id_col: str = "doc_id", bin_col: str = "img") -> DataFrame:
    """Arrow-batched REAL decode of BMP/PPM payloads via mapInPandas —
    the production shape for 'decode 100 TB of images': binary rides the
    columnar path, Python sees bounded Arrow batches, output is a typed row
    per image."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "format": [], "width": [], "height": [], "pixel_sum": []}
            for did, payload in zip(pdf[id_col], pdf[bin_col]):
                meta = decode_image_meta(bytes(payload))
                rows["doc_id"].append(did)
                rows["format"].append(meta["format"])
                rows["width"].append(meta["width"])
                rows["height"].append(meta["height"])
                rows["pixel_sum"].append(meta["pixel_sum"])
            yield pd.DataFrame(rows)

    return df.select(id_col, bin_col).mapInPandas(decode, schema=DECODED_META_SCHEMA)


def multimodal_join(docs: DataFrame, emb: DataFrame) -> DataFrame:
    """documents ⋈ embeddings on doc_id = vec_id — one row per document with
    text + vector + metadata (the Jina Document shape as a DataFrame)."""
    return docs.join(emb, docs.doc_id == emb.vec_id, "inner").drop("vec_id")
