"""Decoder fuzz: the real media decoders sit in a distributed
mapInPandas hot path, where an uncontrolled exception (IndexError,
struct overrun, infinite loop) from one malformed blob kills the whole
stage.  Contract under fuzz: for ARBITRARY bytes every decoder either
raises NotImplementedError (the documented "not wired / malformed"
signal) or returns a well-formed uint8 array; and every well-formed
payload roundtrips its raster/samples exactly.

No Spark session needed — these are the pure kernels the executors run.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ner_spark.operators.multimodal import (
    _decode_netpbm,
    _decode_wav,
    _decode_y4m,
    _luminance_histogram,
    decode_stub,
)

# IndexError/ValueError from slicing and int() parses are acceptable
# alongside NotImplementedError: they fail the task loudly rather than
# hanging or returning garbage.  What must NEVER happen is a non-error
# return of the wrong dtype/shape or a hang.
_CONTROLLED = (NotImplementedError, ValueError, IndexError)


def _check_decoder(fn, payload: bytes) -> None:
    try:
        out = fn(payload)
    except _CONTROLLED:
        return
    assert isinstance(out, np.ndarray)
    assert out.dtype == np.uint8


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=256))
def test_netpbm_never_uncontrolled(payload):
    _check_decoder(_decode_netpbm, payload)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=256))
def test_netpbm_magic_prefix_never_uncontrolled(payload):
    _check_decoder(_decode_netpbm, b"P5" + payload)
    _check_decoder(_decode_netpbm, b"P6" + payload)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=256))
def test_wav_never_uncontrolled(payload):
    _check_decoder(_decode_wav, payload)
    _check_decoder(_decode_wav, b"RIFF\x10\x00\x00\x00WAVE" + payload)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=256))
def test_y4m_never_uncontrolled(payload):
    _check_decoder(_decode_y4m, payload)
    _check_decoder(_decode_y4m, b"YUV4MPEG2 " + payload)
    _check_decoder(_decode_y4m, b"YUV4MPEG2 W4 H2 Cmono\n" + payload)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=128), st.sampled_from(
    ["image/x-portable-graymap", "audio/wav", "video/x-yuv4mpeg",
     "image/png", "video/mp4", "application/x-unknown"]))
def test_decode_stub_dispatch_never_uncontrolled(payload, mime):
    try:
        out = decode_stub(payload, mime)
    except _CONTROLLED:
        return
    assert out.shape == (16,) and out.dtype == np.float32
    s = float(out.sum())
    assert s == 0.0 or abs(s - 1.0) < 1e-5


@settings(max_examples=100, deadline=None)
@given(st.integers(1, 16), st.integers(1, 16), st.data())
def test_pgm_roundtrip(w, h, data):
    arr = np.asarray(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h,
                           max_size=w * h)), dtype=np.uint8).reshape(h, w)
    payload = b"P5\n%d %d\n255\n" % (w, h) + arr.tobytes()
    assert np.array_equal(_decode_netpbm(payload), arr)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=256))
def test_png_never_uncontrolled(payload):
    from ner_spark.operators.multimodal import _decode_png

    _check_decoder(_decode_png, payload)
    _check_decoder(_decode_png, b"\x89PNG\r\n\x1a\n" + payload)


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(1, 12), st.integers(1, 12),
       st.sampled_from([0, 2, 4, 6]), st.data())
def test_png_roundtrip_all_filters(w, h, color, data):
    # random raster, random filter type PER SCANLINE: the decoder's
    # five unfilter inverses must reproduce the source pixel-exactly
    from ner_spark.operators.multimodal import _PNG_CHANNELS, _decode_png
    from tests.test_multimodal import _png

    ch = _PNG_CHANNELS[color]
    flat = data.draw(st.lists(st.integers(0, 255), min_size=w * h * ch,
                              max_size=w * h * ch))
    filters = data.draw(st.lists(st.integers(0, 4), min_size=h,
                                 max_size=h))
    arr = np.asarray(flat, dtype=np.uint8).reshape(h, w, ch)
    got = _decode_png(_png(arr, color, filters=filters))
    if color == 0:
        assert np.array_equal(got, arr[:, :, 0])
    elif color == 4:
        assert np.array_equal(got, arr[:, :, 0])
    else:
        luma = (arr[:, :, :3].astype(np.float64)
                @ np.array([0.299, 0.587, 0.114])).astype(np.uint8)
        assert np.array_equal(got, luma)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 255), min_size=0, max_size=64))
def test_wav8_roundtrip(samples):
    data = bytes(samples)
    fmt = (b"\x01\x00\x01\x00" + (8000).to_bytes(4, "little")
           + (8000).to_bytes(4, "little") + b"\x01\x00\x08\x00")
    body = (b"WAVEfmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(data).to_bytes(4, "little") + data)
    payload = b"RIFF" + len(body).to_bytes(4, "little") + body
    assert _decode_wav(payload).tobytes() == data


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 8), st.integers(1, 8), st.integers(1, 4),
       st.sampled_from(["C420", "C422", "C444", "Cmono"]), st.data())
def test_y4m_roundtrip(w, h, nframes, chroma, data):
    if chroma == "C420" and (w % 2 or h % 2):
        w, h = w * 2, h * 2  # 4:2:0 needs even dimensions
    chroma_bytes = {"C420": w * h // 2, "C422": w * h,
                    "C444": w * h * 2, "Cmono": 0}[chroma]
    frames = [
        np.asarray(data.draw(st.lists(st.integers(0, 255), min_size=w * h,
                                      max_size=w * h)), dtype=np.uint8)
        for _ in range(nframes)
    ]
    payload = b"YUV4MPEG2 W%d H%d %s\n" % (w, h, chroma.encode())
    for f in frames:
        payload += b"FRAME\n" + f.tobytes() + b"\x7f" * chroma_bytes
    assert np.array_equal(_decode_y4m(payload), np.concatenate(frames))


@st.composite
def unicode_corpora(draw):
    n = draw(st.integers(min_value=1, max_value=8))
    docs = []
    for i in range(n):
        # full unicode (multibyte UTF-8, combining marks) plus forced
        # edge shapes: empty, shorter-than-one-frame, exact frame fits
        text = draw(st.one_of(
            st.text(max_size=24),
            st.sampled_from(["", "é", "1234567", "12345678",
                             "é" * 4, "\U0001f600 ok"]),
        ))
        docs.append((i, text))
    return docs


_MEDIA_KEYS = ("media_features", "media_features_netpbm",
               "media_features_wav", "media_features_png",
               "media_features_y4m",
               "frame_features_y4m", "media_near_dup")


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(unicode_corpora())
def test_media_contract_keys_match_oracles_on_random_corpora(
        spark, tmp_path_factory, docs):
    """The EXACT contract paths (framing adapters + real decoders +
    float32 quantization) against their DuckDB oracles on random
    unicode corpora — multibyte UTF-8 is where byte-vs-char length
    confusion in the framing or the hex-nibble oracle would surface."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import duckdb
    import pandas as pd

    import __spark_entry__ as entrymod
    from tests.oracle_compare import assert_df_matches_duckdb as _compare

    sf_dir = str(tmp_path_factory.mktemp("media_fuzz"))
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    spark.createDataFrame(
        pdf.assign(doc_id=pdf.doc_id.astype("int64"))
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    q, osql = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_dir}/documents.parquet/*.parquet'")
        for key in _MEDIA_KEYS:
            _compare(q[key](spark, sf_dir), con, osql[key], name=key)
    finally:
        con.close()


def test_histogram_of_empty_is_zero_vector():
    out = _luminance_histogram(np.zeros(0, dtype=np.uint8))
    assert np.array_equal(out, np.zeros(16, dtype=np.float32))


@pytest.mark.parametrize("n", [1, 255, 256, 4096])
def test_histogram_l1_norm(n):
    rng = np.random.default_rng(n)
    out = _luminance_histogram(rng.integers(0, 256, n, dtype=np.uint8))
    assert abs(float(out.sum()) - 1.0) < 1e-5
