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
    StringType,
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


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("frame_fp", StringType()),
    ]
)


def frame_sample(
    df: DataFrame, frame_bytes: int = 64, every_n: int = 2
) -> DataFrame:
    """Video-style frame sampling over the media blob: the payload splits
    into fixed-size frames (the stand-in for demuxed video frames) and
    every ``every_n``-th frame is kept — one OUTPUT ROW PER SAMPLED FRAME
    (mapInPandas fan-out: rows out > rows in, the shape a real
    frame-extraction stage has).  Frame identity is the md5 of the frame
    bytes, so an oracle can verify the exact sampled content.

    Scale: fan-out happens executor-side inside the Arrow batch; blob
    bytes never hit the driver; the sampled-frame stream is
    ``1/every_n`` of the input bytes.  With a real demuxer the split
    becomes codec-determined keyframes behind the decode seam."""
    import hashlib

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_doc, out_idx, out_n, out_fp = [], [], [], []
            for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
                blob = media["blob"]
                n_frames = max(1, -(-len(blob) // frame_bytes))
                for i in range(0, n_frames, every_n):
                    frame = blob[i * frame_bytes : (i + 1) * frame_bytes]
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_n.append(n_frames)
                    out_fp.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "n_frames": pd.Series(out_n, dtype="int32"),
                    "frame_fp": pd.Series(out_fp, dtype=object),
                }
            )

    return df.select("doc_id", "media").mapInPandas(_batches, FRAME_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("stride", IntegerType()),
        StructField("n_bytes_out", IntegerType()),
        StructField("resized_fp", StringType()),
    ]
)


def resize_media(df: DataFrame, target_bytes: int = 192) -> DataFrame:
    """Resize stand-in: nearest-neighbor byte downsampling of the media
    blob to ~``target_bytes`` (stride = max(1, n // target), keep every
    stride-th byte) — the deterministic fake for an image resize, with
    the REAL pipeline shape: per-blob compute in Arrow batches, output =
    new payload fingerprint + dimensions.  A real backend drops Pillow's
    ``Image.resize`` behind the decode seam without changing the plan."""
    import hashlib

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            strides, n_out, fps = [], [], []
            for media in pdf["media"]:
                blob = media["blob"]
                stride = max(1, len(blob) // target_bytes)
                sampled = blob[::stride]
                strides.append(stride)
                n_out.append(len(sampled))
                fps.append(hashlib.md5(sampled).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "stride": pd.Series(strides, dtype="int32"),
                    "n_bytes_out": pd.Series(n_out, dtype="int32"),
                    "resized_fp": pd.Series(fps, dtype=object),
                }
            )

    return df.select("doc_id", "media").mapInPandas(_batches, RESIZE_SCHEMA)


CLASSIFY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("pred_class", IntegerType()),
        StructField("score", LongType()),
    ]
)

N_CLASSES = 4


def batch_classify(df: DataFrame) -> DataFrame:
    """Batched "model inference" over the media column via mapInPandas —
    the plumbing a captioning/classification pass over 100 TB of media
    needs: Arrow-batched input, vectorized per-batch scoring, small
    typed output rows (the blob never leaves the executor).

    The model itself is the deterministic stand-in this container
    forces (no GPU, no weights): per-class logits are md5-derived
    integers of the payload (md5(blob || ':' || class)[:8] as uint32),
    argmax with lowest-class tiebreak.  A real model drops into the
    same iterator — batch in, scores out — without touching the plan;
    the md5 fake keeps the whole path ORACLE-CHECKABLE (the only
    inference harness here whose outputs an independent engine can
    replay bit-for-bit).
    """
    import hashlib

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = pdf["media"].map(lambda m: bytes(m["blob"]))

            def score(b: bytes, c: int) -> int:
                return int(
                    hashlib.md5(b + f":{c}".encode()).hexdigest()[:8], 16
                )

            preds, scores = [], []
            for b in blobs:
                ss = [score(b, c) for c in range(N_CLASSES)]
                mx = max(ss)
                preds.append(ss.index(mx))  # lowest class wins ties
                scores.append(mx)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "pred_class": pd.Series(preds, dtype="int32"),
                    "score": pd.Series(scores, dtype="int64"),
                }
            )

    return df.select("doc_id", "media").mapInPandas(_batches, CLASSIFY_SCHEMA)
