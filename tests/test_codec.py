import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from solr_spark.index.codec import (
    delta_varint_decode,
    delta_varint_encode,
    varint_decode,
    varint_encode,
)


def test_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert len(varint_decode(b"")) == 0
    assert delta_varint_encode(np.array([], dtype=np.int64)) == b""


def test_known_values():
    vals = np.array([0, 1, 127, 128, 300, 2**31, 2**63 - 1], dtype=np.uint64)
    assert list(varint_decode(varint_encode(vals))) == list(vals)
    # single-byte values encode to one byte each
    assert len(varint_encode(np.array([0, 1, 127]))) == 3
    assert len(varint_encode(np.array([128]))) == 2


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert list(varint_decode(varint_encode(arr))) == vals


@given(st.sets(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=400))
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip(vals):
    arr = np.array(sorted(vals), dtype=np.int64)
    out = delta_varint_decode(delta_varint_encode(arr))
    assert list(out.astype(np.int64)) == sorted(vals)


def test_delta_compression_wins():
    # dense sorted ids: gaps are tiny → ~1 byte per id regardless of magnitude
    ids = np.arange(10**9, 10**9 + 10_000, dtype=np.int64)
    enc = delta_varint_encode(ids)
    assert len(enc) < 10_000 + 10  # first abs value + 1 byte per gap
