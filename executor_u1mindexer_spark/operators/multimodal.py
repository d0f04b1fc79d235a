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

    return df.select(id_col, bin_col).mapInPandas(extract, schema=BINARY_META_SCHEMA)


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """Real image decode — STUB. The container has no PIL/opencv; gate the
    import and fail loudly rather than fake silently."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL, which is not available in this "
            "environment; extract_binary_metadata demonstrates the Spark "
            "plumbing with a deterministic fake decode"
        ) from e
    raise NotImplementedError("real decode path not implemented in this round")


def multimodal_join(docs: DataFrame, emb: DataFrame) -> DataFrame:
    """documents ⋈ embeddings on doc_id = vec_id — one row per document with
    text + vector + metadata (the Jina Document shape as a DataFrame)."""
    return docs.join(emb, docs.doc_id == emb.vec_id, "inner").drop("vec_id")
