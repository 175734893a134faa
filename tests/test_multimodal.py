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
    # JPEG is the codec that stays behind the Pillow deploy branch
    # (PNG now decodes dependency-free, see the _png tests below)
    if _pil_available():
        pytest.skip("PIL installed — deploy path active")
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_stub(b"\xff\xd8\xff\xe0...", "image/jpeg")


def test_decode_stub_unwired_mime_raises_regardless_of_pil():
    # the contract is NotImplementedError = "path not wired"; a video
    # payload must not fall through to the image decoder when Pillow
    # happens to be installed (it would raise UnidentifiedImageError)
    with pytest.raises(NotImplementedError, match="video/mp4"):
        decode_stub(b"\x00\x00\x00 ftypmp42", "video/mp4")


def _wav(samples: np.ndarray, bits: int = 16) -> bytes:
    data = (samples.astype("<i2").tobytes() if bits == 16
            else samples.astype(np.uint8).tobytes())
    fmt = (b"\x01\x00\x01\x00" + (8000).to_bytes(4, "little")
           + (8000 * bits // 8).to_bytes(4, "little")
           + (bits // 8).to_bytes(2, "little") + bits.to_bytes(2, "little"))
    body = (b"WAVEfmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(data).to_bytes(4, "little") + data)
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_decode_real_wav_without_any_media_library():
    # full-scale int16 sweep → every uint8 bin hit uniformly
    samples = (np.arange(256, dtype=np.int32) * 256 - 32768).astype("<i2")
    feats = decode_stub(_wav(samples), "audio/wav")
    assert feats.shape == (16,) and abs(float(feats.sum()) - 1.0) < 1e-5
    assert np.allclose(feats, 1.0 / 16)
    # 8-bit branch: constant mid-scale amplitude → one bin
    feats8 = decode_stub(_wav(np.full(64, 200), bits=8), "audio/x-wav")
    expect = np.zeros(16, dtype=np.float32)
    expect[200 >> 4] = 1.0
    assert np.array_equal(feats8, expect)


def test_decode_wav_rejects_compressed_codecs():
    bad = _wav(np.zeros(4, dtype="<i2"))
    bad = bad.replace(b"\x01\x00\x01\x00", b"\x55\x00\x01\x00", 1)  # fmt=0x55 (mp3)
    with pytest.raises(NotImplementedError, match="PCM"):
        decode_stub(bad, "audio/wav")


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


def _pgm(arr: np.ndarray) -> bytes:
    h, w = arr.shape
    return b"P5\n# test image\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def _ppm(arr: np.ndarray) -> bytes:
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def test_decode_real_pgm_without_any_media_library():
    """netpbm grayscale decodes with numpy alone — the REAL decode path
    producing real output in this dependency-free container."""
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8) * 4  # bins 0..15
    feats = decode_stub(_pgm(arr), "image/x-portable-graymap")
    assert feats.shape == (16,) and feats.dtype == np.float32
    assert abs(float(feats.sum()) - 1.0) < 1e-5
    # exact: 4 pixels per 16-value bin → uniform histogram
    assert np.allclose(feats, 1.0 / 16)


def test_decode_real_ppm_luma_matches_bt601():
    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    rgb[..., 0] = 255  # pure red → luma int(255*0.299) = 76 → bin 4
    feats = decode_stub(_ppm(rgb), "image/x-portable-pixmap")
    expect = np.zeros(16, dtype=np.float32)
    expect[76 >> 4] = 1.0
    assert np.array_equal(feats, expect)


def test_decode_netpbm_rejects_ascii_variants():
    with pytest.raises(NotImplementedError, match="P5/P6"):
        decode_stub(b"P2\n2 2\n255\n0 1 2 3", "image/x-portable-graymap")


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib as _z

    return (len(body).to_bytes(4, "big") + ctype + body
            + _z.crc32(ctype + body).to_bytes(4, "big"))


def _png(arr: np.ndarray, color: int, filters=None,
         plte: np.ndarray | None = None) -> bytes:
    """Minimal PNG encoder (8-bit, non-interlaced) applying the
    REQUESTED filter type per scanline, so the decoder's unfilter
    inverse is exercised for all five filter types — not just the
    trivial None rows a lazy encoder would emit."""
    import zlib as _z

    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    bpp = ch
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        cur = arr[y].reshape(-1).astype(np.uint8)
        ft = filters[y % len(filters)]
        raw.append(ft)
        for x in range(w * ch):
            a = int(cur[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            if ft == 0:
                v = cur[x]
            elif ft == 1:
                v = (int(cur[x]) - a) & 0xFF
            elif ft == 2:
                v = (int(cur[x]) - b) & 0xFF
            elif ft == 3:
                v = (int(cur[x]) - ((a + b) >> 1)) & 0xFF
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc
                                                       else c)
                v = (int(cur[x]) - pr) & 0xFF
            raw.append(v)
        prev = cur
    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, color, 0, 0, 0]))
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    out += _png_chunk(b"IDAT", _z.compress(bytes(raw)))
    return out + _png_chunk(b"IEND", b"")


def test_decode_real_png_all_filters_no_media_library():
    """PNG decodes with stdlib zlib + numpy alone — a COMPRESSED codec
    on the real path in this container.  Every scanline uses a
    different filter type, so all five unfilter inverses are hit and
    verified pixel-exact against the source array."""
    from ner_spark.operators.multimodal import _decode_png

    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, size=(10, 9), dtype=np.uint8).astype(np.uint8)
    png = _png(arr, color=0, filters=[0, 1, 2, 3, 4])
    assert np.array_equal(_decode_png(png), arr)
    # histogram path through the public dispatch
    feats = decode_stub(png, "image/png")
    expect = np.bincount(arr.ravel() >> 4, minlength=16) / arr.size
    assert np.allclose(feats, expect.astype(np.float32))


def test_decode_real_png_color_types():
    from ner_spark.operators.multimodal import _decode_png

    # RGB: pure red → BT.601 luma 76, filters incl. Paeth on RGB bpp=3
    rgb = np.zeros((4, 3, 3), dtype=np.uint8)
    rgb[..., 0] = 255
    assert np.array_equal(_decode_png(_png(rgb, 2, filters=[4, 3, 1, 2])),
                          np.full((4, 3), 76, dtype=np.uint8))
    # RGBA: alpha ignored for luminance
    rgba = np.zeros((2, 2, 4), dtype=np.uint8)
    rgba[..., 1] = 255  # pure green → luma int(255*0.587) = 149
    rgba[..., 3] = 7
    assert np.array_equal(_decode_png(_png(rgba, 6)),
                          np.full((2, 2), 149, dtype=np.uint8))
    # palette: indices map through PLTE then BT.601
    plte = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    got = _decode_png(_png(idx, 3, plte=plte))
    assert np.array_equal(got, np.array([[0, 255], [255, 0]], np.uint8))
    # gray+alpha: luminance is the gray channel
    ga = np.dstack([np.full((2, 2), 33, np.uint8),
                    np.full((2, 2), 200, np.uint8)])
    assert np.array_equal(_decode_png(_png(ga, 4)),
                          np.full((2, 2), 33, dtype=np.uint8))


def test_decode_png_rejects_unwired_shapes():
    from ner_spark.operators.multimodal import _decode_png

    arr = np.zeros((2, 2), dtype=np.uint8)
    png = bytearray(_png(arr, 0))
    png[24] = 16  # IHDR depth byte → 16-bit
    with pytest.raises(NotImplementedError, match="depth=16"):
        _decode_png(bytes(png))
    png = bytearray(_png(arr, 0))
    png[28] = 1  # IHDR interlace byte → Adam7
    with pytest.raises(NotImplementedError, match="interlace=1"):
        _decode_png(bytes(png))
    with pytest.raises(NotImplementedError, match="signature"):
        _decode_png(b"\xff\xd8\xff\xe0 not a png")


def test_extract_media_features_png_end_to_end(spark):
    """The non-stub mapInPandas path over PNG payloads: a compressed
    codec through the distributed Arrow batches, verified against the
    locally computed histograms."""
    from ner_spark.operators.multimodal import extract_media_features

    rng = np.random.RandomState(11)
    arrs = [rng.randint(0, 256, size=(6, 6), dtype=np.uint8)
            for _ in range(3)]
    rows = [(i, "image", "image/png",
             bytearray(_png(a, 0, filters=[0, 1, 2, 3, 4])), 6, 6, 0)
            for i, a in enumerate(arrs)]
    media = spark.createDataFrame(
        rows, "media_id long, modality string, mime string, payload binary,"
              " width int, height int, duration_ms int")
    got = {r["media_id"]: np.asarray(r["features"], dtype=np.float32)
           for r in extract_media_features(media, use_stub=False).collect()}
    for i, a in enumerate(arrs):
        expect = (np.bincount(a.ravel() >> 4, minlength=16)
                  / a.size).astype(np.float32)
        assert np.allclose(got[i], expect)


def test_extract_media_features_real_decode_end_to_end(spark):
    """The non-stub mapInPandas path over PGM payloads: distributed
    Arrow batches through the real decoder, verified against the
    locally computed histograms."""
    from ner_spark.operators.multimodal import extract_media_features

    arrs = [np.full((4, 4), v, dtype=np.uint8) for v in (0, 100, 255)]
    rows = [(i, "image", "image/x-portable-graymap", bytearray(_pgm(a)),
             4, 4, 0) for i, a in enumerate(arrs)]
    media = spark.createDataFrame(
        rows, "media_id long, modality string, mime string, payload binary,"
              " width int, height int, duration_ms int")
    got = {r["media_id"]: np.asarray(r["features"], dtype=np.float32)
           for r in extract_media_features(media, use_stub=False).collect()}
    for i, a in enumerate(arrs):
        expect = np.zeros(16, dtype=np.float32)
        expect[int(a[0, 0]) >> 4] = 1.0
        assert np.array_equal(got[i], expect), i


def test_docs_as_netpbm_roundtrips_text_bytes(spark):
    """docs_as_netpbm frames text bytes as a 1-row P5 raster; the real
    netpbm decoder must recover exactly those bytes (container framing
    is lossless), including multi-byte UTF-8 and the empty string."""
    from ner_spark.operators.multimodal import _decode_netpbm, docs_as_netpbm

    texts = ["hello world", "naïve — café", ""]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    rows = {r["media_id"]: r for r in docs_as_netpbm(docs).collect()}
    for i, t in enumerate(texts):
        raw = t.encode("utf-8")
        payload = bytes(rows[i]["payload"])
        assert payload == b"P5\n%d 1\n255\n" % len(raw) + raw
        assert rows[i]["width"] == len(raw)
        if raw:
            assert _decode_netpbm(payload).tobytes() == raw


def test_docs_as_png_roundtrips_text_bytes(spark):
    """docs_as_png deflates text bytes into a 1-row grayscale PNG; the
    real inflate + unfilter decoder must recover exactly those bytes
    (compression is lossless), including multi-byte UTF-8 and the
    empty string."""
    from ner_spark.operators.multimodal import _decode_png, docs_as_png

    texts = ["hello world", "naïve — café", ""]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    rows = {r["media_id"]: r for r in docs_as_png(docs).collect()}
    for i, t in enumerate(texts):
        raw = t.encode("utf-8")
        payload = bytes(rows[i]["payload"])
        assert payload[:8] == b"\x89PNG\r\n\x1a\n"
        assert rows[i]["mime"] == "image/png"
        assert rows[i]["width"] == len(raw)
        if raw:
            assert _decode_png(payload).tobytes() == raw


def test_docs_as_wav_roundtrips_text_bytes(spark):
    """docs_as_wav frames text bytes as 8-bit PCM samples behind the
    canonical 44-byte RIFF header; the real WAV chunk walker must
    recover exactly those bytes."""
    from ner_spark.operators.multimodal import _decode_wav, docs_as_wav

    texts = ["hello world", "naïve — café", ""]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    rows = {r["media_id"]: r for r in docs_as_wav(docs).collect()}
    for i, t in enumerate(texts):
        raw = t.encode("utf-8")
        payload = bytes(rows[i]["payload"])
        assert len(payload) == 44 + len(raw)
        assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
        assert _decode_wav(payload).tobytes() == raw


def _y4m(frames: list[np.ndarray], chroma: str = "C420") -> bytes:
    """Well-formed YUV4MPEG2 stream: luma planes given, chroma planes
    zero-filled per the declared subsampling."""
    h, w = frames[0].shape
    chroma_bytes = {"C420": w * h // 2, "C422": w * h, "C444": w * h * 2,
                    "Cmono": 0}[chroma]
    out = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 %s\n" % (w, h, chroma.encode())
    for f in frames:
        out += b"FRAME\n" + f.astype(np.uint8).tobytes() + b"\x00" * chroma_bytes
    return out


def test_decode_real_y4m_without_any_media_library():
    """YUV4MPEG2 video decodes with numpy alone: luma planes only,
    chroma skipped per the declared subsampling."""
    from ner_spark.operators.multimodal import _decode_y4m, decode_stub

    frames = [np.full((4, 4), v, dtype=np.uint8) for v in (0, 100, 255)]
    for chroma in ("C420", "C422", "C444", "Cmono"):
        raw = _decode_y4m(_y4m(frames, chroma))
        assert raw.shape == (48,)
        assert np.array_equal(raw, np.repeat([0, 100, 255], 16))
    feats = decode_stub(_y4m(frames), "video/x-yuv4mpeg")
    expect = np.zeros(16, dtype=np.float32)
    expect[[0, 100 >> 4, 255 >> 4]] = np.float32(1 / 3)
    assert np.array_equal(feats, expect)


def test_decode_y4m_frame_sampling_and_rejects():
    from ner_spark.operators.multimodal import _decode_y4m, decode_stub

    frames = [np.full((2, 2), v, dtype=np.uint8) for v in range(5)]
    sampled = _decode_y4m(_y4m(frames), every_n=2)  # frames 0, 2, 4
    assert np.array_equal(sampled, np.repeat([0, 2, 4], 4))
    with pytest.raises(NotImplementedError, match="YUV4MPEG2"):
        decode_stub(b"\x00\x00\x00 ftypmp42", "video/x-yuv4mpeg")
    with pytest.raises(NotImplementedError, match="truncated"):
        _decode_y4m(_y4m(frames)[:-3])
    with pytest.raises(NotImplementedError, match="C411"):
        _decode_y4m(b"YUV4MPEG2 W2 H2 C411\nFRAME\n\x00\x00\x00\x00")


def test_extract_frame_features_per_frame(spark):
    """One row per sampled frame through the distributed mapInPandas
    path, each the real per-frame luma histogram."""
    from ner_spark.operators.multimodal import extract_frame_features

    frames = [np.full((2, 2), 16 * v, dtype=np.uint8) for v in range(4)]
    rows = [(7, "video", "video/x-yuv4mpeg", bytearray(_y4m(frames)),
             2, 2, 160)]
    media = spark.createDataFrame(
        rows, "media_id long, modality string, mime string, payload binary,"
              " width int, height int, duration_ms int")
    got = sorted(
        (r["frame_no"], np.argmax(r["features"]))
        for r in extract_frame_features(media, every_n=2).collect())
    assert got == [(0, 0), (2, 2)]


def test_docs_as_y4m_frames_chops_fixed_frames(spark):
    """Multi-frame adapter: full 8-byte frames only (fixed y4m frame
    size), tail dropped; empty/short texts produce a frameless stream;
    the real parser recovers each frame exactly."""
    from ner_spark.operators.multimodal import _y4m_frames, docs_as_y4m_frames

    texts = ["0123456789abcdefXYZ",  # 2 frames + 3 tail bytes dropped
             "short", ""]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    rows = {r["media_id"]: r for r in docs_as_y4m_frames(docs).collect()}
    frames0 = [p.tobytes() for p in _y4m_frames(bytes(rows[0]["payload"]))]
    assert frames0 == [b"01234567", b"89abcdef"]
    assert rows[0]["duration_ms"] == 80
    for i in (1, 2):
        assert list(_y4m_frames(bytes(rows[i]["payload"]))) == []


def test_docs_as_y4m_roundtrips_text_bytes(spark):
    from ner_spark.operators.multimodal import _decode_y4m, docs_as_y4m

    texts = ["hello world", "naïve — café", ""]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    rows = {r["media_id"]: r for r in docs_as_y4m(docs).collect()}
    for i, t in enumerate(texts):
        raw = t.encode("utf-8")
        payload = bytes(rows[i]["payload"])
        assert payload == (b"YUV4MPEG2 W%d H1 F25:1 Ip A1:1 Cmono\nFRAME\n"
                           % len(raw)) + raw
        assert _decode_y4m(payload).tobytes() == raw


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
