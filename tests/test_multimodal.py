"""Multimodal decode-path tests: the real decoder is wired behind
import availability; the deterministic byte-histogram stand-in is the
container test path (no media libraries here)."""

from __future__ import annotations

import numpy as np
import pytest

from ner_spark.operators.multimodal import decode_stub, fake_decode_features


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_decode_stub_raises_without_pil():
    if _pil_available():
        pytest.skip("PIL installed — deploy path active")
    with pytest.raises(NotImplementedError):
        decode_stub(b"\x89PNG...", "image/png")


def test_decode_stub_non_image_mime_raises_regardless_of_pil():
    # the contract is NotImplementedError = "path not wired"; a wav
    # payload must not fall through to the image decoder when Pillow
    # happens to be installed (it would raise UnidentifiedImageError)
    with pytest.raises(NotImplementedError, match="audio/wav"):
        decode_stub(b"RIFF....WAVE", "audio/wav")


def test_decode_stub_real_path_matches_feature_shape():
    if not _pil_available():
        pytest.skip("PIL not installed in this container")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (8, 8), color=128).save(buf, format="PNG")
    feats = decode_stub(buf.getvalue(), "image/png")
    assert feats.shape == (16,)
    assert feats.dtype == np.float32
    assert abs(float(feats.sum()) - 1.0) < 1e-5


def test_fake_decode_shape_and_norm():
    import pandas as pd

    feats = fake_decode_features(pd.Series([b"abc123", None, b""]))
    assert feats.shape == (3, 16)
    assert abs(float(feats[0].sum()) - 1.0) < 1e-5
    assert float(feats[1].sum()) == 0.0 and float(feats[2].sum()) == 0.0


def test_real_decode_path_receives_actual_mime(spark):
    """Regression: the non-stub path must pass each row's real mime to
    decode_stub (it used to pass a dummy that dead-ended at the
    image/* gate once that gate existed).  In this container (no
    Pillow) the fake application/x-fake mime must surface in the
    error — proof the column reached the decoder."""
    from pyspark.errors.exceptions.captured import PythonException

    from ner_spark.operators.multimodal import (
        docs_as_media,
        extract_media_features,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = docs_as_media(docs.limit(2))
    with pytest.raises(PythonException, match="application/x-fake"):
        extract_media_features(media, use_stub=False).collect()
