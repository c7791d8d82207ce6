"""CBOR (RFC 8949) ingest/egress — the /update/cbor loader analog.

The reference accepts update streams as CBOR — a single document map
or an array of document maps (``handler/loader/CborLoader.java:54-69``
walks the token stream and emits one SolrInputDocument per map).  No
CBOR library is baked into this sandbox, so this module carries a
from-scratch encoder/decoder for the RFC 8949 subset the loader
needs: unsigned/negative integers (major types 0/1), byte and text
strings (2/3), arrays (4), maps (5), and the simple/float values
null / true / false / float64 (major type 7).  Definite lengths only
— the writer never emits indefinite forms, and the decoder rejects
them loudly rather than guessing.

Spark integration mirrors the javabin pair: the writer emits one
``part-*.cbor`` file per partition from the executors (each file one
CBOR array of document maps — CborLoader's "array of docs" form) and
the reader decodes ``binaryFile`` rows in an Arrow-batched
``mapInPandas``, one task per file.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import Any

_MAJOR_UINT = 0
_MAJOR_NEGINT = 1
_MAJOR_BYTES = 2
_MAJOR_TEXT = 3
_MAJOR_ARRAY = 4
_MAJOR_MAP = 5
_MAJOR_SIMPLE = 7

_FALSE, _TRUE, _NULL = 0xF4, 0xF5, 0xF6
_FLOAT64 = 0xFB


def _encode_head(major: int, arg: int, out: bytearray) -> None:
    ib = major << 5
    if arg < 24:
        out.append(ib | arg)
    elif arg < 0x100:
        out.append(ib | 24)
        out.append(arg)
    elif arg < 0x10000:
        out.append(ib | 25)
        out += struct.pack(">H", arg)
    elif arg < 0x100000000:
        out.append(ib | 26)
        out += struct.pack(">I", arg)
    else:
        out.append(ib | 27)
        out += struct.pack(">Q", arg)


def cbor_encode(v: Any, out: bytearray | None = None) -> bytes:
    """Encode ``v`` (None/bool/int/float/str/bytes/list/dict) as
    canonical definite-length CBOR."""
    import numpy as np

    buf = bytearray() if out is None else out
    if v is None:
        buf.append(_NULL)
    elif isinstance(v, (bool, np.bool_)):
        buf.append(_TRUE if v else _FALSE)
    elif isinstance(v, (int, np.integer)):
        v = int(v)
        if v >= 0:
            _encode_head(_MAJOR_UINT, v, buf)
        else:
            _encode_head(_MAJOR_NEGINT, -1 - v, buf)
    elif isinstance(v, (float, np.floating)):
        buf.append(_FLOAT64)
        buf += struct.pack(">d", float(v))
    elif isinstance(v, str):
        raw = v.encode("utf-8")
        _encode_head(_MAJOR_TEXT, len(raw), buf)
        buf += raw
    elif isinstance(v, (bytes, bytearray)):
        _encode_head(_MAJOR_BYTES, len(v), buf)
        buf += bytes(v)
    elif isinstance(v, (list, tuple, np.ndarray)):
        seq = list(v)
        _encode_head(_MAJOR_ARRAY, len(seq), buf)
        for item in seq:
            cbor_encode(item, buf)
    elif isinstance(v, dict):
        _encode_head(_MAJOR_MAP, len(v), buf)
        for k, item in v.items():
            cbor_encode(k, buf)
            cbor_encode(item, buf)
    else:
        raise TypeError(f"cbor: unsupported type {type(v)!r}")
    return bytes(buf)


class _CborDecoder:
    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0

    def _read(self, n: int) -> bytes:
        raw = self._data[self._pos : self._pos + n]
        if len(raw) != n:
            raise ValueError("cbor: truncated stream")
        self._pos += n
        return raw

    def _arg(self, info: int) -> int:
        if info < 24:
            return info
        if info == 24:
            return self._read(1)[0]
        if info == 25:
            return struct.unpack(">H", self._read(2))[0]
        if info == 26:
            return struct.unpack(">I", self._read(4))[0]
        if info == 27:
            return struct.unpack(">Q", self._read(8))[0]
        raise ValueError(f"cbor: indefinite/reserved length (info={info}) unsupported")

    def decode(self) -> Any:
        ib = self._read(1)[0]
        major, info = ib >> 5, ib & 0x1F
        if major == _MAJOR_UINT:
            return self._arg(info)
        if major == _MAJOR_NEGINT:
            return -1 - self._arg(info)
        if major == _MAJOR_BYTES:
            return self._read(self._arg(info))
        if major == _MAJOR_TEXT:
            return self._read(self._arg(info)).decode("utf-8")
        if major == _MAJOR_ARRAY:
            return [self.decode() for _ in range(self._arg(info))]
        if major == _MAJOR_MAP:
            return {self.decode(): self.decode() for _ in range(self._arg(info))}
        if major == 6:  # tag — decode and surface the payload
            self._arg(info)
            return self.decode()
        if major == _MAJOR_SIMPLE:
            if ib == _NULL:
                return None
            if ib == _TRUE:
                return True
            if ib == _FALSE:
                return False
            if ib == _FLOAT64:
                return struct.unpack(">d", self._read(8))[0]
            if info == 25:  # float16 — rare, but spec-legal
                import numpy as np

                return float(np.frombuffer(self._read(2), dtype=">f2")[0])
            if info == 26:
                return struct.unpack(">f", self._read(4))[0]
            raise ValueError(f"cbor: unsupported simple value {ib:#x}")
        raise ValueError(f"cbor: unsupported major type {major}")


def cbor_decode(data: bytes) -> Any:
    return _CborDecoder(data).decode()


# ---------------------------------------------------------------------------
# Distributed Spark reader / writer
# ---------------------------------------------------------------------------


def write_cbor(df, path: str) -> None:
    """One CBOR array-of-document-maps file per partition, written from
    the executors (CborLoader's stream form)."""
    import os

    os.makedirs(path, exist_ok=True)
    cols = df.columns

    def write_partition(rows) -> None:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        docs = [dict(zip(cols, r)) for r in rows]
        payload = cbor_encode(docs)
        tmp = os.path.join(path, f".part-{pid:05d}.cbor.tmp")
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, os.path.join(path, f"part-{pid:05d}.cbor"))

    df.foreachPartition(write_partition)


def load_cbor(spark, path: str, schema: str):
    """CborLoader analog (``handler/loader/CborLoader.java:54``): each
    file is a CBOR array of doc maps (or a single map), decoded in its
    own task via ``binaryFile`` + Arrow-batched ``mapInPandas``."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from solr_spark.sources.loaders import _parse_ddl

    target: StructType = schema if isinstance(schema, StructType) else _parse_ddl(spark, schema)
    names = [f.name for f in target.fields]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                decoded = cbor_decode(bytes(blob))
                docs = decoded if isinstance(decoded, list) else [decoded]
                for d in docs:
                    rows.append([d.get(n) for n in names])
            yield pd.DataFrame(rows, columns=names)

    raw = spark.read.format("binaryFile").load(f"{path}/*.cbor").select("content")
    parsed = raw.mapInPandas(decode, schema=target)
    return parsed.select(*[F.col(f.name).alias(f.name) for f in target.fields])
