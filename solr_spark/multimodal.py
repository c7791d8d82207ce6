"""Multimodal column plumbing: binary payloads + typed metadata.

Treats image/audio/video as opaque ``binary`` columns with a typed
metadata struct, the way a 100 TB multimodal training-data table stores
them (the reference's nearest analog is ``schema/BinaryField.java`` +
the Tika extraction module, SURVEY.md §2.1 — out-of-scope there too).

What is REAL here (and tested): the table schema, deterministic payload
synthesis, Arrow-batched ``mapInPandas`` feature extraction (byte-level
stats computed in numpy over whole record batches — the exact plumbing a
real decoder plugs into: same schema, same batch shape, same partition
behavior), and frame sampling for the video modality.

What is STUBBED (this container has no image/audio codecs): the actual
*codec* ``decode`` step — :func:`decode_image` raises
``NotImplementedError`` unless PIL is importable, documenting the exact
signature a real decoder must satisfy. Feature extraction does NOT
depend on the stub; it works on raw bytes.

What is a DETERMINISTIC FAKE (and therefore fully testable end-to-end):
:func:`decode_fake` expands each payload into a pixel tensor with a pure
byte-arithmetic rule (no codec), so the downstream kernels —
:func:`resize_image` (exact area-mean / nearest-neighbor),
:func:`audio_features` (framed RMS / zero-crossing / spectral centroid
via rFFT), :func:`frame_sample` + :func:`frame_features` — are REAL
vectorized numpy over Arrow batches, map-only plans, byte-for-byte
reproducible. Swapping :func:`decode_fake` for a Pillow/libvips decoder
changes one function body and nothing else.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MODALITIES = ("image", "audio", "video")

#: header prepended to synthesized payloads (fixed 4 bytes per modality)
_HEADERS = {"image": b"IMG0", "audio": b"AUD0", "video": b"VID0"}

MULTIMODAL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("data", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("payload_sha256", T.StringType(), False),
        T.StructField("mean_byte", T.DoubleType(), False),
        T.StructField("byte_entropy", T.DoubleType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), False),
    ]
)


def synth_multimodal(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic multimodal table derived from a documents table.

    Payload = 4-byte modality header + utf8 text bytes (a deterministic
    fake "encoded media"); modality cycles by doc_id; metadata is derived
    arithmetically. Pure JVM expressions — the synthesis itself is part of
    the tested plumbing, not the stub.
    """
    m = F.element_at(F.array(*[F.lit(x) for x in MODALITIES]), (F.col(id_col) % 3 + 1).cast("int"))
    header = F.element_at(
        F.create_map(*[F.lit(x) for kv in _HEADERS.items() for x in kv]), m
    )
    data = F.concat(header.cast("binary"), F.encode(F.col(text_col), "UTF-8"))
    meta = F.struct(
        F.when(m == "image", (F.col(id_col) % 8 + 1) * 64).otherwise(F.lit(None)).cast("int").alias("width"),
        F.when(m == "image", (F.col(id_col) % 4 + 1) * 64).otherwise(F.lit(None)).cast("int").alias("height"),
        F.when(m == "audio", F.lit(16000)).otherwise(F.lit(None)).cast("int").alias("sample_rate"),
        F.when(m == "video", (F.col(id_col) % 16 + 2)).otherwise(F.lit(None)).cast("int").alias("n_frames"),
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        m.alias("modality"),
        data.alias("data"),
        meta.alias("meta"),
    )


def extract_features(mm: DataFrame) -> DataFrame:
    """Arrow-batched byte-level feature extraction (``mapInPandas``).

    Computes, per payload, in numpy over the Arrow batch: byte length,
    sha256, mean byte value, byte-histogram entropy (bits), and an 8-dim
    density feature (fraction of bytes in each of 8 value octants). This
    is the exact harness a real image/audio featurizer drops into — only
    the numpy body changes.
    """

    def feats(batches):
        import hashlib

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, modality, data in zip(pdf["doc_id"], pdf["modality"], pdf["data"]):
                buf = np.frombuffer(bytes(data), dtype=np.uint8)
                hist = np.bincount(buf, minlength=256).astype(np.float64)
                p = hist / max(len(buf), 1)
                nz = p[p > 0]
                entropy = float(-(nz * np.log2(nz)).sum()) if len(nz) else 0.0
                octants = hist.reshape(8, 32).sum(axis=1) / max(len(buf), 1)
                rows.append(
                    (
                        int(doc_id),
                        modality,
                        len(buf),
                        hashlib.sha256(bytes(data)).hexdigest(),
                        float(buf.mean()) if len(buf) else 0.0,
                        entropy,
                        [float(x) for x in octants],
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return mm.select("doc_id", "modality", "data").mapInPandas(feats, schema=FEATURE_SCHEMA)


def frame_sample(mm: DataFrame, every_n: int = 4, frame_bytes: int = 32) -> DataFrame:
    """Video frame sampling: slice the payload into fixed-size pseudo
    frames and keep every ``every_n``-th. Returns
    (doc_id, frame_no, frame binary). Demonstrates the explode-shaped
    plumbing (one row per sampled frame) a real frame extractor uses.
    """
    vids = mm.where(F.col("modality") == "video")
    n_frames = F.floor(F.length("data") / frame_bytes).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return vids.select(
        "doc_id", F.explode(idx).alias("frame_no"), F.col("data")
    ).select(
        "doc_id",
        "frame_no",
        F.expr(f"substring(data, frame_no * {frame_bytes} + 1, {frame_bytes})").alias("frame"),
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("pixels", T.ArrayType(T.IntegerType()), False),
    ]
)


def _fake_pixels(buf: np.ndarray, w: int, h: int) -> np.ndarray:
    """Deterministic byte→pixel expansion (the fake 'codec').

    Cyclically tiles the payload bytes to ``w*h`` and XORs each position
    with ``pos & 0xFF`` so the tiling is not trivially periodic. Pure
    uint8 arithmetic — same bytes in, same pixels out, everywhere.
    """
    n = w * h
    px = np.resize(buf, n) ^ (np.arange(n, dtype=np.int64) & 0xFF).astype(np.uint8)
    return px


def decode_fake(mm: DataFrame) -> DataFrame:
    """Deterministic fake image decode (``mapInPandas``, map-only plan).

    For each ``image`` row, expands the payload (header stripped) into a
    ``meta.width × meta.height`` grayscale pixel array via
    :func:`_fake_pixels`. This is the sandbox stand-in for a Pillow
    decode: identical schema, batching, and partition behavior — only the
    numpy body differs. Returns (doc_id, width, height, pixels).
    """

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, data, meta in zip(pdf["doc_id"], pdf["data"], pdf["meta"]):
                w, h = int(meta["width"]), int(meta["height"])
                buf = np.frombuffer(bytes(data), dtype=np.uint8)[4:]  # strip header
                px = _fake_pixels(buf, w, h)
                rows.append((int(doc_id), w, h, px.astype(np.int32).tolist()))
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    imgs = mm.where(F.col("modality") == "image").select("doc_id", "data", "meta")
    return imgs.mapInPandas(run, schema=DECODED_SCHEMA)


def _area_resize(px: np.ndarray, w: int, h: int, out_w: int, out_h: int) -> np.ndarray:
    """Vectorized resize: exact area mean when the dims divide evenly,
    nearest-neighbor otherwise. Returns float64 (out_h, out_w)."""
    img = px.reshape(h, w).astype(np.float64)
    if h % out_h == 0 and w % out_w == 0:
        bh, bw = h // out_h, w // out_w
        return img.reshape(out_h, bh, out_w, bw).mean(axis=(1, 3))
    ri = (np.arange(out_h) * h) // out_h
    ci = (np.arange(out_w) * w) // out_w
    return img[np.ix_(ri, ci)]


def resize_image(decoded: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Real resize kernel over decoded pixel rows (``mapInPandas``).

    Exact area-mean downsample (reshape/mean — the OpenCV ``INTER_AREA``
    rule) when source dims are multiples of the target; deterministic
    nearest-neighbor sampling otherwise. Output pixels are float means.
    """
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("pixels", T.ArrayType(T.DoubleType()), False),
        ]
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, w, h, px in zip(pdf["doc_id"], pdf["width"], pdf["height"], pdf["pixels"]):
                small = _area_resize(np.asarray(px), int(w), int(h), out_w, out_h)
                rows.append((int(doc_id), out_w, out_h, small.ravel().tolist()))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return decoded.mapInPandas(run, schema=out_schema)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("zcr", T.DoubleType(), False),
        T.StructField("spectral_centroid", T.DoubleType(), False),
    ]
)


def audio_features(mm: DataFrame, frame: int = 256, hop: int = 128) -> DataFrame:
    """Real audio DSP over the (fake-PCM) payload (``mapInPandas``).

    Treats payload bytes (header stripped) as unsigned-8-bit PCM centered
    to [-1, 1] and computes framed RMS energy (stride-tricks framing,
    ``frame``/``hop``), zero-crossing rate, and spectral centroid in Hz
    from the rFFT magnitude at ``meta.sample_rate``. All numpy, no codec
    — a real PCM decoder swaps in upstream without touching this kernel.
    """

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, data, meta in zip(pdf["doc_id"], pdf["data"], pdf["meta"]):
                sr = int(meta["sample_rate"])
                buf = np.frombuffer(bytes(data), dtype=np.uint8)[4:]
                x = (buf.astype(np.float64) - 127.5) / 127.5
                if len(x) >= frame:
                    n_fr = 1 + (len(x) - frame) // hop
                    fr = np.lib.stride_tricks.as_strided(
                        x, shape=(n_fr, frame), strides=(x.strides[0] * hop, x.strides[0])
                    )
                    rms = float(np.sqrt((fr**2).mean(axis=1)).mean())
                else:
                    rms = float(np.sqrt((x**2).mean())) if len(x) else 0.0
                zcr = float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean()) if len(x) > 1 else 0.0
                mag = np.abs(np.fft.rfft(x))
                freqs = np.fft.rfftfreq(len(x), d=1.0 / sr)
                centroid = float((freqs * mag).sum() / mag.sum()) if mag.sum() > 0 else 0.0
                rows.append((int(doc_id), len(x), rms, zcr, centroid))
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURE_SCHEMA.fields])

    auds = mm.where(F.col("modality") == "audio").select("doc_id", "data", "meta")
    return auds.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


def frame_features(frames: DataFrame) -> DataFrame:
    """Per-sampled-frame stats (mean/std byte) over :func:`frame_sample`
    output — pure JVM expressions via ``aggregate`` over the unpacked
    bytes is not expressible on binary, so this uses the same Arrow
    batch kernel shape as the other extractors."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("mean_byte", T.DoubleType(), False),
            T.StructField("std_byte", T.DoubleType(), False),
        ]
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, frame_no, fr in zip(pdf["doc_id"], pdf["frame_no"], pdf["frame"]):
                b = np.frombuffer(bytes(fr), dtype=np.uint8).astype(np.float64)
                if len(b):
                    rows.append((int(doc_id), int(frame_no), float(b.mean()), float(b.std())))
                else:
                    rows.append((int(doc_id), int(frame_no), 0.0, 0.0))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return frames.mapInPandas(run, schema=schema)


def decode_image(mm: DataFrame):
    """Compressed-format decode (documented extension point).

    Uncompressed 24-bit BMP payloads decode FOR REAL via
    :func:`decode_bmp_stats` / :func:`decode_bmp` below (from-scratch
    pure-numpy codec, oracle-checked in `bmp_decode_stats`); PCM WAV
    likewise via :func:`decode_wav_stats`. This entry point covers the
    compressed formats (JPEG/PNG/...) a real deployment implements as
    ``mapInPandas`` over (doc_id, data, meta.width, meta.height)
    yielding decoded pixel tensors (``array<float>`` CHW). The
    Pillow/libvips dependency is not in this container, so this raises
    unless PIL is importable.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires Pillow; the Spark plumbing "
            "(schema/batching/partitioning) is exercised via extract_features"
        ) from e
    raise NotImplementedError("real decoder not wired in this build")


# ---------------------------------------------------------------------------
# REAL codecs: 24-bit BMP and 16-bit PCM WAV (pure-numpy formats)
# ---------------------------------------------------------------------------
# The honest subset of "real decode" this sandbox can do without
# image/audio libraries: BMP (BITMAPINFOHEADER, uncompressed 24bpp,
# bottom-up BGR rows with 4-byte padding) and WAV (RIFF PCM mono 16-bit)
# are fully specified byte layouts — struct + numpy suffice. JPEG/PNG/
# MP3 remain behind decode_image's documented NotImplementedError.


def encode_bmp(px: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24-bit BMP
    (BITMAPINFOHEADER; bottom-up BGR rows, rows padded to 4 bytes)."""
    import struct

    h, w, _ = px.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    img_size = (row + pad) * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    bgr = px[::-1, :, ::-1]  # bottom-up rows, RGB->BGR
    body = np.zeros((h, row + pad), dtype=np.uint8)
    body[:, :row] = bgr.reshape(h, row)
    return header + info + body.tobytes()


def decode_bmp(buf: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP back to (h, w, 3) uint8 RGB.
    Validates magic/bpp/compression and rejects anything else loudly."""
    import struct

    if buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", buf, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", buf, 14)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    compression = struct.unpack_from("<I", buf, 30)[0]
    if bpp != 24 or compression != 0 or h <= 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={compression})")
    row = w * 3
    pad = (4 - row % 4) % 4
    body = np.frombuffer(buf, dtype=np.uint8, count=(row + pad) * h, offset=offset)
    rows = body.reshape(h, row + pad)[:, :row].reshape(h, w, 3)
    return rows[::-1, :, ::-1].copy()  # back to top-down RGB


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode int16 mono samples as a PCM WAV (RIFF/fmt/data)."""
    import struct

    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate,
                      sample_rate * 2, 2, 16)
    header = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return header + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav(buf: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM mono 16-bit WAV to (sample_rate, int16 array).
    Walks RIFF chunks (fmt may be followed by extension chunks)."""
    import struct

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, sr, bits, channels = 12, None, None, None
    while pos + 8 <= len(buf):
        cid, size = struct.unpack_from("<4sI", buf, pos)
        pos += 8
        if cid == b"fmt ":
            fmt_code, channels, sr = struct.unpack_from("<HHI", buf, pos)
            bits = struct.unpack_from("<H", buf, pos + 14)[0]
            if fmt_code != 1:
                raise ValueError(f"unsupported WAV encoding {fmt_code}")
        elif cid == b"data":
            if sr is None:
                raise ValueError("WAV data chunk before fmt")
            if bits != 16 or channels != 1:
                raise ValueError(f"unsupported WAV layout ({bits}-bit, {channels}ch)")
            n = size // 2
            return sr, np.frombuffer(buf, dtype="<i2", count=n, offset=pos).copy()
        pos += size + (size % 2)  # RIFF chunks are 2-byte aligned
    raise ValueError("WAV has no data chunk")


def decode_bmp_stats(mm: DataFrame) -> DataFrame:
    """REAL image decode over a DataFrame of BMP payloads: Arrow-batched
    ``mapInPandas``, per image (width, height, mean over all RGB values,
    pixel-sum checksum). This is decode_image's real path for the BMP
    subset — same batching/schema shape a Pillow-backed decoder uses."""
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType, IntegerType, LongType, StructField, StructType,
    )

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_pixel", DoubleType()),
        StructField("pixel_sum", LongType()),
    ])

    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf["doc_id"], pdf["data"]):
                px = decode_bmp(bytes(data))
                s = int(px.astype(np.int64).sum())
                rows.append((int(doc_id), px.shape[1], px.shape[0],
                             round(s / px.size, 6), s))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return mm.mapInPandas(run, schema=schema)


def decode_wav_stats(mm: DataFrame) -> DataFrame:
    """REAL audio decode over WAV payloads: per clip (sample_rate,
    n_samples, mean sample, sum-of-squares checksum)."""
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType, IntegerType, LongType, StructField, StructType,
    )

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("mean_sample", DoubleType()),
        StructField("sumsq", LongType()),
    ])

    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id, data in zip(pdf["doc_id"], pdf["data"]):
                sr, s = decode_wav(bytes(data))
                a = s.astype(np.int64)
                rows.append((int(doc_id), int(sr), len(a),
                             round(float(a.mean()), 6) if len(a) else 0.0,
                             int((a * a).sum())))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return mm.mapInPandas(run, schema=schema)
