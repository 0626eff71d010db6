"""Multimodal column plumbing (images/audio/video as opaque binary).

The reference OCRs images with Tesseract in a sequential file loop
(reference: src/preprocessing/data_cleaner.py:102-182). kgforge treats media
as ``binary`` columns with typed metadata and runs decode / feature-extract
as Arrow-batched ``mapInPandas`` — the Spark-side plumbing (schema, batch
shape, partition parallelism) is real and tested; the actual codec call is
STUBBED (no image/audio libs in this container): ``decode_stub`` computes
deterministic metadata from the bytes, and ``decode_real`` raises
NotImplementedError where PIL/ffmpeg would plug in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("n_frames", IntegerType(), False),
    ]
)


def decode_real(blob: bytes) -> dict:
    """Where a real codec goes (PIL.Image.open / soundfile / pyav)."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use decode_stub for deterministic plumbing tests"
    )


def decode_stub(blob: bytes) -> dict:
    """Deterministic fake decode: metadata derivable from the bytes alone."""
    n = len(blob)
    return {"n_bytes": n, "n_frames": n % 7 + 1}


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a media column: utf-8 bytes of the text as the blob."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def extract_media_meta(df: DataFrame) -> DataFrame:
    """binary payload -> typed metadata via Arrow-batched mapInPandas.

    This is the exact shape a real image/audio feature extractor takes:
    batched bytes in, struct metadata out, executor-parallel, no shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_stub(b) for b in pdf["payload"]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return df.select("doc_id", "payload").mapInPandas(run, schema=MEDIA_META)
