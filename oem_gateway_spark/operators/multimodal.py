"""Multimodal column conventions: image/audio/video as opaque BINARY
columns + typed metadata structs, processed by Arrow-batched pandas
functions via mapInPandas.

The container has no image/audio codecs, so the DECODE step is stubbed
(NotImplementedError or the deterministic fake used in tests); everything
around it — schema convention, binary packing, Arrow batch shapes, the
mapInPandas plumbing, partition sizing — is real and tested.

Schema convention:
    media STRUCT<blob: BINARY, mime: STRING,
                 width: INT, height: INT, channels: INT>

Scale notes: binary payloads make WIDE rows — keep
spark.sql.files.maxPartitionBytes at 128 MB so a partition holds a bounded
number of blobs; never collect blob columns; push metadata-only predicates
(width/height/mime) BEFORE the pandas stage so pruning happens on the
parquet scan (blob column not even read when filtered out — columnar wins).
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

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("byte_sum", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def attach_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pack a document's text as the binary payload of a fake media column
    (deterministic stand-in for real image bytes) + typed metadata."""
    return df.withColumn(
        "media",
        F.struct(
            F.encode(F.col(text_col), "UTF-8").alias("blob"),
            F.lit("application/octet-stream").alias("mime"),
            (F.col("n_chars") % 640).cast("int").alias("width"),
            ((F.col("doc_id") * 37) % 480).cast("int").alias("height"),
            F.lit(3).alias("channels"),
        ),
    )


def decode_image(blob: bytes) -> "object":
    """Real image decode — import-gated on Pillow (not shipped in this
    container; ``pip install pillow`` activates it — README 'Environment
    seams').  The single seam where a codec drops in; the pipeline shape
    (mapInPandas over binary + metadata) does not change when it does.
    """
    try:
        from PIL import Image  # noqa: PLC0415 - the seam itself
    except ImportError as e:  # pragma: no cover - no codec in container
        raise NotImplementedError(
            "image codecs not available in this environment; install pillow "
            "to activate this seam (README: Environment seams) or use "
            "extract_features' deterministic byte features instead"
        ) from e
    import io

    return Image.open(io.BytesIO(blob))


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the media column.

    Deterministic byte-level features (length, modular byte sum) stand in
    for codec output; numpy-vectorized per Arrow batch — the real 100 TB
    shape (no per-row Python, ~10k rows per batch, blob bytes stay in
    Arrow buffers end to end).
    """
    import numpy as np

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = pdf["media"].map(lambda m: m["blob"])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": blobs.map(len).astype("int32"),
                    "byte_sum": blobs.map(
                        lambda b: int(np.frombuffer(b, dtype=np.uint8).sum())
                        % 1000003
                    ).astype("int64"),
                    "width": pdf["media"].map(lambda m: m["width"]).astype("int32"),
                    "height": pdf["media"].map(lambda m: m["height"]).astype("int32"),
                }
            )

    return df.select("doc_id", "media").mapInPandas(_batches, FEATURE_SCHEMA)
