"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as opaque
``binary`` columns next to typed metadata; the Spark-side contract —
schema, Arrow batch shape, ``mapInPandas`` signature, partitioning —
is what this module makes real.  The actual media *decode* is stubbed
(no image/audio libs in this container): :func:`decode_stub` raises
``NotImplementedError`` and :func:`fake_decode_features` supplies a
deterministic byte-histogram stand-in so the distributed plumbing is
fully testable.

At scale: feature extraction is a narrow ``mapInPandas`` over the
binary column (no shuffle); batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so a batch of blobs
fits executor memory; downstream similarity reuses
:mod:`ner_spark.operators.similarity` on the emitted feature vectors.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType,
    StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("modality", StringType()),       # image | audio | video
    StructField("mime", StringType()),
    StructField("payload", BinaryType()),         # opaque encoded bytes
    StructField("width", IntegerType()),          # typed metadata
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
])

MEDIA_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("modality", StringType()),
    StructField("n_bytes", LongType()),
    StructField("features", ArrayType(FloatType())),  # 16-d feature vector
])


def docs_as_media(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into the media shape for testing: the
    UTF-8 bytes of ``text`` play the opaque payload (deterministic)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("modality"),
        F.lit("application/x-fake").alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.lit(0).alias("duration_ms"),
    )


def decode_stub(payload: bytes, mime: str) -> np.ndarray:
    """Real decoder hook, wired behind import availability.

    When PIL is installed (deploy time) this decodes the image and
    returns a 16-bin luminance histogram, L1-normed — the same feature
    shape and normalization as :func:`fake_decode_features`, so the
    two paths are drop-in interchangeable.  In this container (no
    media libraries) it raises ``NotImplementedError``; the
    deterministic stand-in remains the test path.
    """
    if not mime.startswith("image/"):
        # only the image branch is wired; audio/video decode stays a
        # NotImplementedError hook regardless of installed libraries
        raise NotImplementedError(
            f"decode for mime {mime!r} is not wired; only image/* decode "
            "is implemented (requires Pillow)"
        )
    try:
        from PIL import Image  # optional deploy-time dependency
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires Pillow, not present in this container"
        ) from exc

    import io

    img = Image.open(io.BytesIO(payload)).convert("L")
    arr = np.asarray(img, dtype=np.uint8)
    hist = np.bincount((arr >> 4).ravel(), minlength=16).astype(np.float64)
    s = hist.sum()
    if s == 0:
        return np.zeros(16, dtype=np.float32)
    return (hist / s).astype(np.float32)


def fake_decode_features(payloads: pd.Series) -> np.ndarray:
    """Deterministic stand-in decode: 16-bin byte histogram, L1-normed.

    Vectorized over the whole Arrow batch (one np.frombuffer per blob,
    one bincount) — the batch shape production decode must follow.
    """
    out = np.zeros((len(payloads), 16), dtype=np.float32)
    for i, blob in enumerate(payloads):
        if blob is None or len(blob) == 0:
            continue
        arr = np.frombuffer(bytes(blob), dtype=np.uint8)
        hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
        out[i] = (hist / hist.sum()).astype(np.float32)
    return out


def extract_media_features(media: DataFrame, use_stub: bool = True) -> DataFrame:
    """media → (media_id, modality, n_bytes, features[16]).

    Narrow ``mapInPandas`` stage: no shuffle, Arrow-batched binary
    transfer, per-batch vectorized feature extraction.
    """
    # mime rides along so the real decoder can dispatch per payload
    # (decode_stub gates on it; passing a dummy would dead-end the
    # non-stub path at the image/* check)
    narrow = media.select("media_id", "modality", "payload", "mime")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = (fake_decode_features(pdf["payload"]) if use_stub
                     else np.stack([decode_stub(p, m) for p, m in
                                    zip(pdf["payload"], pdf["mime"])]))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)).astype("int64"),
                "features": list(feats),
            })

    return narrow.mapInPandas(run, schema=MEDIA_FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (posexplode of a sequence column) — the decode of each
    frame is the stubbed step.  Demonstrates the explode-then-decode
    partitioning: frames of one video stay in one partition unless
    repartitioned by (media_id, frame_no) for decode parallelism."""
    frames = media.where(F.col("duration_ms") > 0).select(
        "media_id", "mime",
        F.posexplode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms)))
        .alias("frame_no", "ts_ms"),
    )
    return frames.repartition("media_id", "frame_no")
