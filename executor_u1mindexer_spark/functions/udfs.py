"""User-defined function surface — the complete Spark Python UDF family.

The core engine is UDF-free (everything in suites/ is Catalyst expressions;
the only Python in hot paths is Arrow-batched kernels where measured faster
— see SCALE.md). This module demonstrates the remaining API families a user
of the engine can plug custom logic into, each tested equivalent to its
expression-based twin:

- scalar Arrow pandas_udf (vector_norm_udf() == functions/vector.norm)
- Python UDTF (table function: text -> chunk rows, twin of
  pipeline.chunk_sliding_window)

Factories, not module-level decorators: @pandas_udf/@udtf need an active
SparkSession at decoration time, which an importable library must not assume.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

CHUNK_SIZE = 32
CHUNK_STRIDE = 16


def vector_norm_udf():
    """Arrow-batched L2 norm of an array<double> column (the UDF twin of
    functions/vector.norm; numpy's np.dot on small fixed-dim vectors sums
    sequentially, so values agree to the last bit)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _norm(v: pd.Series) -> pd.Series:
        return v.map(lambda arr: float(np.sqrt(np.dot(arr, arr))))

    return _norm


def split_chunks_udtf():
    """Python table function: one text row -> N sliding-window chunk rows
    (size 32, stride 16 — mirrors pipeline.chunk_sliding_window)."""
    from pyspark.sql.functions import udtf

    ws = re.compile(r"\s+")

    @udtf(returnType="chunk_idx int, chunk_text string, chunk_words int")
    class SplitChunks:
        def eval(self, text: str):
            toks = ws.split(text) if text else [""]
            n = len(toks)
            n_chunks = max((n - CHUNK_SIZE + CHUNK_STRIDE - 1) // CHUNK_STRIDE + 1, 1)
            for i in range(n_chunks):
                words = toks[i * CHUNK_STRIDE : i * CHUNK_STRIDE + CHUNK_SIZE]
                yield i, " ".join(words), len(words)

    return SplitChunks
