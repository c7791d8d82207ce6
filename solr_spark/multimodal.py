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
``decode`` step — :func:`decode_image` raises ``NotImplementedError``
unless PIL is importable, documenting the exact signature a real decoder
must satisfy. Feature extraction does NOT depend on the stub; it works
on raw bytes.
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


def decode_image(mm: DataFrame):
    """STUB — real image decode (documented extension point).

    A real deployment implements this as ``mapInPandas`` over
    (doc_id, data, meta.width, meta.height) yielding decoded pixel
    tensors (``array<float>`` CHW). The Pillow/libvips dependency is not
    in this container, so this raises unless PIL is importable.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires Pillow; the Spark plumbing "
            "(schema/batching/partitioning) is exercised via extract_features"
        ) from e
    raise NotImplementedError("real decoder not wired in this build")
