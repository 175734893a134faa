"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as opaque
``binary`` columns next to typed metadata; the Spark-side contract —
schema, Arrow batch shape, ``mapInPandas`` signature, partitioning —
is what this module makes real.  The real image decode
(:func:`decode_stub`) branches by codec: netpbm (PGM/PPM) images and
RIFF PCM WAV audio and YUV4MPEG2 (``.y4m``) uncompressed video decode
with numpy alone and therefore run end-to-end even in this
dependency-free container; other ``image/*`` codecs decode via Pillow
where installed and raise ``NotImplementedError`` where not.
Compressed audio/video codecs remain unwired hooks (no codec
libraries anywhere here);
:func:`fake_decode_features` supplies a deterministic byte-histogram
stand-in so the distributed plumbing is fully testable independent of
codecs.

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


def docs_as_netpbm(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into REAL media: each text's UTF-8
    bytes become the raster of a binary 1-row PGM (``P5``) image, so
    :func:`decode_stub` exercises the actual netpbm decode end-to-end.
    Pure Catalyst expressions (header concat + binary concat) — at
    production scale the payloads arrive already encoded and this
    adapter disappears."""
    nb = F.octet_length("text")
    header = F.concat(F.lit("P5\n"), nb.cast("string"), F.lit(" 1\n255\n"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("modality"),
        F.lit("image/x-portable-graymap").alias("mime"),
        F.concat(F.encode(header, "UTF-8"),
                 F.encode("text", "UTF-8")).alias("payload"),
        nb.cast("int").alias("width"),
        F.lit(1).alias("height"),
        F.lit(0).alias("duration_ms"),
    )


def docs_as_wav(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into REAL audio: each text's UTF-8
    bytes become the sample data of an 8-bit mono PCM RIFF/WAVE file
    (standard 44-byte header), so :func:`decode_stub` exercises the
    actual WAV decode end-to-end.  The header needs little-endian u32
    fields, which Catalyst cannot splice into binary — a vectorized
    pandas UDF builds it (fixture adapter only; production payloads
    arrive already encoded)."""

    @F.pandas_udf(BinaryType())
    def wav_wrap(text: pd.Series) -> pd.Series:
        def wrap(t: str | None) -> bytes:
            data = (t or "").encode("utf-8")
            nb = len(data)
            sample_rate = 8000
            header = (
                b"RIFF" + (36 + nb).to_bytes(4, "little") + b"WAVE"
                + b"fmt " + (16).to_bytes(4, "little")
                + (1).to_bytes(2, "little")            # PCM
                + (1).to_bytes(2, "little")            # mono
                + sample_rate.to_bytes(4, "little")
                + sample_rate.to_bytes(4, "little")    # byte rate (8-bit mono)
                + (1).to_bytes(2, "little")            # block align
                + (8).to_bytes(2, "little")            # bits per sample
                + b"data" + nb.to_bytes(4, "little")
            )
            return header + data

        return text.map(wrap)

    nb = F.octet_length("text")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("modality"),
        F.lit("audio/wav").alias("mime"),
        wav_wrap(F.col("text")).alias("payload"),
        F.lit(0).alias("width"),
        F.lit(0).alias("height"),
        # 8-bit mono at 8 kHz: one sample per byte
        (nb.cast("long") * 1000 / 8000).cast("int").alias("duration_ms"),
    )


def docs_as_png(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into REAL compressed media: each
    text's UTF-8 bytes become the raster of a 1-row 8-bit grayscale
    PNG (zlib-deflated, one filter-None scanline), so
    :func:`decode_stub` exercises the actual inflate + unfilter path
    end-to-end.  PNG needs zlib + CRC32, which Catalyst cannot
    express — a vectorized pandas UDF builds the container (fixture
    adapter only; production payloads arrive already encoded).
    Grayscale luminance IS the raw byte stream, so the decoded
    feature histogram has the same exact oracle as the netpbm key."""

    @F.pandas_udf(BinaryType())
    def png_wrap(text: pd.Series) -> pd.Series:
        import zlib

        def chunk(ctype: bytes, body: bytes) -> bytes:
            return (len(body).to_bytes(4, "big") + ctype + body
                    + zlib.crc32(ctype + body).to_bytes(4, "big"))

        def wrap(t: str | None) -> bytes:
            data = (t or "").encode("utf-8")
            w = len(data)
            ihdr = (w.to_bytes(4, "big") + (1).to_bytes(4, "big")
                    + bytes([8, 0, 0, 0, 0]))  # 8-bit gray, no interlace
            raw = b"\x00" + data  # one scanline, filter type None
            return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", zlib.compress(raw))
                    + chunk(b"IEND", b""))

        return text.map(wrap)

    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("modality"),
        F.lit("image/png").alias("mime"),
        png_wrap(F.col("text")).alias("payload"),
        F.octet_length("text").cast("int").alias("width"),
        F.lit(1).alias("height"),
        F.lit(0).alias("duration_ms"),
    )


def docs_as_y4m(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into REAL video: each text's UTF-8
    bytes become the luma plane of a single-frame monochrome
    YUV4MPEG2 stream, so :func:`decode_stub` exercises the actual y4m
    parser end-to-end.  Pure Catalyst expressions, like
    :func:`docs_as_netpbm`."""
    nb = F.octet_length("text")
    header = F.concat(F.lit("YUV4MPEG2 W"), nb.cast("string"),
                      F.lit(" H1 F25:1 Ip A1:1 Cmono\nFRAME\n"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("modality"),
        F.lit("video/x-yuv4mpeg").alias("mime"),
        F.concat(F.encode(header, "UTF-8"),
                 F.encode("text", "UTF-8")).alias("payload"),
        nb.cast("int").alias("width"),
        F.lit(1).alias("height"),
        F.lit(40).alias("duration_ms"),  # one frame at 25 fps
    )


def docs_as_y4m_frames(docs: DataFrame, frame_w: int = 8) -> DataFrame:
    """Adapt the documents table into REAL multi-frame video: the
    text's UTF-8 bytes are chopped into fixed ``frame_w``-byte luma
    frames of a monochrome YUV4MPEG2 stream (y4m frames are fixed
    size, so tail bytes that don't fill a frame are dropped).  Pure
    Catalyst: the FRAME sections are spliced with a higher-order
    aggregate over binary concat — no Python in the adapter.  The
    explicit empty-frame guard matters: Spark's ``sequence(0, -1)``
    counts DOWN, so zero-frame docs must short-circuit."""
    nfr = F.expr(f"CAST(octet_length(text) / {frame_w} AS INT)")
    frames = F.expr(
        f"aggregate(transform(sequence(0, CAST(octet_length(text) / {frame_w} AS INT) - 1), "
        f"i -> concat(X'4652414D450A', substring(encode(text, 'UTF-8'), i * {frame_w} + 1, {frame_w}))), "
        "CAST(X'' AS BINARY), (acc, x) -> concat(acc, x))"
    )
    header = F.lit(f"YUV4MPEG2 W{frame_w} H1 F25:1 Ip A1:1 Cmono\n")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("modality"),
        F.lit("video/x-yuv4mpeg").alias("mime"),
        F.concat(
            F.encode(header, "UTF-8"),
            F.when(nfr > 0, frames).otherwise(F.expr("CAST(X'' AS BINARY)")),
        ).alias("payload"),
        F.lit(frame_w).alias("width"),
        F.lit(1).alias("height"),
        (nfr * 40).alias("duration_ms"),  # 25 fps
    )


NETPBM_MIMES = ("image/x-portable-graymap", "image/x-portable-pixmap",
                "image/x-portable-anymap")


def _luminance_histogram(arr: np.ndarray) -> np.ndarray:
    """The shared feature definition for every REAL decode branch:
    16-bin luminance histogram over uint8 pixels, L1-normed."""
    hist = np.bincount((arr >> 4).ravel(), minlength=16).astype(np.float64)
    s = hist.sum()
    if s == 0:
        return np.zeros(16, dtype=np.float32)
    return (hist / s).astype(np.float32)


def _decode_netpbm(payload: bytes) -> np.ndarray:
    """Pure-numpy decode of binary netpbm images (PGM ``P5`` grayscale /
    PPM ``P6`` RGB, maxval ≤ 255) → uint8 luminance array.  No media
    library needed, so this branch of the REAL decode path runs (and is
    tested end-to-end) even in this dependency-free container."""
    if not payload[:2] in (b"P5", b"P6"):
        raise NotImplementedError(
            "netpbm decode supports binary P5/P6 only "
            f"(got magic {payload[:2]!r})"
        )
    # header: magic, width, height, maxval — whitespace-separated, with
    # optional '#' comment lines; the raster starts one byte after maxval
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":
            while i < len(payload) and payload[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    i += 1  # single whitespace byte after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    channels = 1 if payload[:2] == b"P5" else 3
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * channels,
                           offset=i)
    if channels == 1:
        return raster.reshape(h, w)
    rgb = raster.reshape(h, w, 3).astype(np.float64)
    # BT.601 luma, same weights PIL's convert("L") uses
    return (rgb @ np.array([0.299, 0.587, 0.114])).astype(np.uint8)


PNG_MIME = "image/png"

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color_type → samples/px


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Invert the PNG per-scanline filters (None/Sub/Up/Average/Paeth,
    RFC 2083 §6) over the decompressed byte stream → (h, stride)
    uint8.  Up and None vectorize whole-row; Sub/Average/Paeth have a
    true byte-serial dependency along the row, so they run a per-byte
    loop — row-local, bounded by the image width, and only on rows an
    encoder actually filtered that way."""
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        pos += 1
        row = np.frombuffer(raw, np.uint8, stride, pos).copy()
        pos += stride
        prev = out[y - 1] if y else np.zeros(stride, np.uint8)
        if ft == 0:
            pass
        elif ft == 2:  # Up
            row += prev  # uint8 wraps = mod-256 per spec
        elif ft == 1:  # Sub
            for x in range(bpp, stride):
                row[x] = (int(row[x]) + int(row[x - bpp])) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + ((a + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc
                                                       else c)
                row[x] = (int(row[x]) + pr) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter type {ft} invalid")
        out[y] = row
    return out


def _decode_png(payload: bytes) -> np.ndarray:
    """Dependency-free PNG decode (stdlib ``zlib`` inflate + numpy
    unfilter) → uint8 luminance array, so ONE compressed codec runs
    for real in this container (JPEG stays on the Pillow deploy
    branch).  Supports the common web shapes: 8-bit depth, color
    types gray / RGB / palette / gray+alpha / RGBA, non-interlaced;
    anything else raises loudly rather than mis-decoding."""
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError("not a PNG signature")
    i, w = 8, None
    idat, plte = [], None
    while i + 8 <= len(payload):
        size = int.from_bytes(payload[i:i + 4], "big")
        ctype = payload[i + 4:i + 8]
        body = payload[i + 8:i + 8 + size]
        if ctype == b"IHDR":
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            depth, color, _comp, _filt, interlace = body[8:13]
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        i += 12 + size  # length + type + data + crc
    if w is None or not idat:
        raise NotImplementedError("PNG missing IHDR/IDAT")
    if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG depth={depth} color_type={color} "
            f"interlace={interlace} not wired (8-bit non-interlaced "
            "gray/RGB/palette/gray+alpha/RGBA only)")
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    expected = h * (stride + 1)
    if expected > (1 << 28):
        raise NotImplementedError(
            "PNG raster over the 256 MiB decode-hook bound")
    # bounded inflate: a malformed stream raises the documented
    # NotImplementedError, and a zip-bomb cannot expand past the
    # header-declared raster size (this runs inside a distributed
    # mapInPandas task — no uncontrolled exception, no runaway alloc)
    try:
        d = zlib.decompressobj()
        raw = d.decompress(b"".join(idat), expected)
    except zlib.error as exc:
        raise NotImplementedError(f"PNG inflate failed: {exc}") from exc
    if len(raw) != expected or d.decompress(b"", 1):
        raise NotImplementedError("PNG stream length mismatch")
    px = _png_unfilter(raw, h, stride, ch).reshape(h, w, ch)
    if color == 0:
        return px[:, :, 0]
    if color == 4:  # gray + alpha: luminance is the gray channel
        return px[:, :, 0]
    if color == 3:
        if plte is None:
            raise NotImplementedError("palette PNG without PLTE")
        rgb = plte[px[:, :, 0]].astype(np.float64)
    else:  # 2 = RGB, 6 = RGBA (alpha ignored for luminance)
        rgb = px[:, :, :3].astype(np.float64)
    # BT.601 luma — same weights as _decode_netpbm / PIL convert("L")
    return (rgb @ np.array([0.299, 0.587, 0.114])).astype(np.uint8)


WAV_MIMES = ("audio/wav", "audio/x-wav", "audio/wave")


def _decode_wav(payload: bytes) -> np.ndarray:
    """Pure-numpy decode of RIFF/WAVE PCM (8- or 16-bit) → uint8
    amplitude array (16-bit samples are mapped to unsigned 8-bit), so
    the shared 16-bin histogram applies to audio exactly as to pixels.
    Container-format parsing only — compressed codecs (mp3/opus/aac)
    stay behind deploy-time libraries."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("audio decode supports RIFF/WAVE only")
    i, fmt_code, bits, data = 12, None, None, None
    while i + 8 <= len(payload):
        chunk_id = payload[i:i + 4]
        size = int.from_bytes(payload[i + 4:i + 8], "little")
        body = payload[i + 8:i + 8 + size]
        if chunk_id == b"fmt ":
            fmt_code = int.from_bytes(body[0:2], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif chunk_id == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_code != 1 or bits not in (8, 16) or data is None:
        raise NotImplementedError(
            f"only uncompressed PCM 8/16-bit WAV is wired "
            f"(fmt={fmt_code}, bits={bits})"
        )
    if bits == 8:
        return np.frombuffer(data, dtype=np.uint8)
    samples = np.frombuffer(data[:len(data) & ~1], dtype="<i2")
    return ((samples.astype(np.int32) + 32768) >> 8).astype(np.uint8)


Y4M_MIMES = ("video/x-yuv4mpeg", "video/x-yuv4mpeg2")

_Y4M_PLANE_FACTOR = {  # luma+chroma bytes per pixel, as a rational
    b"C420": (3, 2), b"C420jpeg": (3, 2), b"C420paldv": (3, 2),
    b"C420mpeg2": (3, 2), b"C422": (2, 1), b"C444": (3, 1),
    b"Cmono": (1, 1),
}


def _y4m_frames(payload: bytes) -> Iterator[np.ndarray]:
    """Pure-numpy frame iterator over YUV4MPEG2 (``.y4m``) uncompressed
    video: yields each frame's luma (Y) plane as a uint8 array.  Real
    public container format (ffmpeg's raw-video interchange), parsed
    from the spec: a space-separated ``YUV4MPEG2`` header line, then
    ``FRAME`` lines each followed by W×H luma bytes plus the chroma
    planes of the declared subsampling (skipped — luminance histograms
    need Y only).  Compressed codecs stay behind deploy-time
    libraries."""
    if payload[:9] != b"YUV4MPEG2":
        raise NotImplementedError("video decode supports YUV4MPEG2 only")
    eol = payload.index(b"\n")
    w = h = None
    factor = _Y4M_PLANE_FACTOR[b"C420"]  # spec default is 4:2:0
    for param in payload[9:eol].split():
        if param[:1] == b"W":
            w = int(param[1:])
        elif param[:1] == b"H":
            h = int(param[1:])
        elif param[:1] == b"C":
            if param not in _Y4M_PLANE_FACTOR:
                raise NotImplementedError(
                    f"y4m chroma mode {param!r} not wired")
            factor = _Y4M_PLANE_FACTOR[param]
    if w is None or h is None:
        raise NotImplementedError("y4m header missing W/H")
    luma, num, den = w * h, *factor
    frame_bytes = luma * num // den
    i = eol + 1
    while i < len(payload):
        if payload[i:i + 5] != b"FRAME":
            raise NotImplementedError("malformed y4m FRAME marker")
        i = payload.index(b"\n", i) + 1  # FRAME may carry parameters
        if i + frame_bytes > len(payload):
            raise NotImplementedError("truncated y4m frame")
        yield np.frombuffer(payload, dtype=np.uint8, count=luma, offset=i)
        i += frame_bytes


def _decode_y4m(payload: bytes, every_n: int = 1) -> np.ndarray:
    """All (or every Nth) frames' luma planes, concatenated — the video
    analogue of the image/audio decoders, feeding the same histogram."""
    planes = [p for k, p in enumerate(_y4m_frames(payload))
              if k % every_n == 0]
    if not planes:
        return np.zeros(0, dtype=np.uint8)
    return np.concatenate(planes)


def decode_stub(payload: bytes, mime: str) -> np.ndarray:
    """Real decoder hook: 16-bin histogram over uint8 intensity
    (luminance for images, amplitude for audio), L1-normed — the same
    feature shape and normalization as :func:`fake_decode_features`,
    so the paths are drop-in interchangeable.

    Branches by codec availability: netpbm (P5/P6) and PNG images and
    RIFF PCM WAV audio decode with numpy + stdlib alone, so they work
    everywhere including this container; every other ``image/*`` mime
    (JPEG foremost) needs Pillow (deploy-time dependency) and raises
    ``NotImplementedError`` where it is absent.  Compressed audio and
    video decode stay unwired hooks regardless of installed libraries.
    """
    if mime in WAV_MIMES:
        return _luminance_histogram(_decode_wav(payload))
    if mime in Y4M_MIMES:
        return _luminance_histogram(_decode_y4m(payload))
    if not mime.startswith("image/"):
        raise NotImplementedError(
            f"decode for mime {mime!r} is not wired; image/* and PCM "
            "audio/wav decode are implemented"
        )
    if mime in NETPBM_MIMES:
        return _luminance_histogram(_decode_netpbm(payload))
    if mime == PNG_MIME:
        return _luminance_histogram(_decode_png(payload))
    try:
        from PIL import Image  # optional deploy-time dependency
    except ImportError as exc:
        raise NotImplementedError(
            f"decode for {mime!r} requires Pillow, not present in this "
            "container (netpbm and PNG decode without it)"
        ) from exc

    import io

    img = Image.open(io.BytesIO(payload)).convert("L")
    return _luminance_histogram(np.asarray(img, dtype=np.uint8))


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
            if len(pdf) == 0:
                continue
            feats = (fake_decode_features(pdf["payload"]) if use_stub
                     else np.stack([decode_stub(bytes(p), m) for p, m in
                                    zip(pdf["payload"], pdf["mime"])]))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)).astype("int64"),
                "features": list(feats),
            })

    return narrow.mapInPandas(run, schema=MEDIA_FEATURES_SCHEMA)


FRAME_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_no", IntegerType()),
    StructField("features", ArrayType(FloatType())),
])


def extract_frame_features(media: DataFrame, every_n: int = 1) -> DataFrame:
    """Per-sampled-frame features over y4m video: one output row per
    kept frame (every ``every_n``-th), each carrying that frame's
    16-bin luma histogram from the REAL :func:`_y4m_frames` parser.

    Narrow ``mapInPandas`` like :func:`extract_media_features` — the
    fan-out happens inside the batch, so frames of one video are
    emitted together; repartition by (media_id, frame_no) downstream
    if per-frame work needs spreading."""
    narrow = media.select("media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            frame_nos: list[int] = []
            feats: list[np.ndarray] = []
            for mid, blob in zip(pdf["media_id"], pdf["payload"]):
                for k, plane in enumerate(_y4m_frames(bytes(blob))):
                    if k % every_n:
                        continue
                    ids.append(mid)
                    frame_nos.append(k)
                    feats.append(_luminance_histogram(plane))
            if not ids:
                # an all-frameless batch must yield nothing: an empty
                # DataFrame defaults the features column to float64,
                # which Arrow cannot cast to list<float>
                continue
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "frame_no": pd.Series(frame_nos, dtype="int32"),
                "features": feats,
            })

    return narrow.mapInPandas(run, schema=FRAME_FEATURES_SCHEMA)


def media_topk_pairs(features: DataFrame, top_k: int = 20) -> DataFrame:
    """Near-duplicate media pairs over decoded feature vectors: the
    composed multimodal-curation shape (real decode → histogram
    features → blocked cosine pairs).

    Blocking is content-derived — the dominant histogram bin (first
    argmax) — so the self-join stays per-block quadratic with no
    metadata needed, same contract as
    :func:`ner_spark.operators.dedup.embedding_topk_pairs_ivf`; at
    100 TB swap the block for a trained IVF cell over the same
    vectors.  Zero vectors (empty payloads) are dropped — their cosine
    is undefined and NaN ordering is engine-specific."""
    from ner_spark.operators.dedup import _topk_cosine_pairs

    v = features.select(
        F.col("media_id").alias("vec_id"),
        F.array_position("features", F.array_max("features")).alias("block"),
        F.transform("features", lambda x: x.cast("double")).alias("v"),
    ).where(F.array_max("v") > 0)
    return _topk_cosine_pairs(v, top_k)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (posexplode of a sequence column) — pair with
    :func:`extract_frame_features` for the actual per-frame decode.
    Demonstrates the explode-then-decode partitioning: frames of one
    video stay in one partition unless repartitioned by
    (media_id, frame_no) for decode parallelism."""
    frames = media.where(F.col("duration_ms") > 0).select(
        "media_id", "mime",
        F.posexplode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms)))
        .alias("frame_no", "ts_ms"),
    )
    return frames.repartition("media_id", "frame_no")
