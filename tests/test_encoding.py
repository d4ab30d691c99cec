import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from groonga_spark import encoding


def test_vb_roundtrip_boundaries():
    vals = np.array(
        [0, 1, 0x8E, 0x8F, 0x90, 0x408E, 0x408F, 0x4090, 0x20408E, 0x20408F,
         0x1020408E, 0x1020408F, 0xFFFFFFFF],
        dtype=np.uint32,
    )
    buf = encoding.vb_encode(vals)
    out = encoding.vb_decode(buf, len(vals))
    assert (out == vals).all()


def test_vb_all_one_byte_fast_path():
    vals = np.arange(0, 0x8F, dtype=np.uint32)
    buf = encoding.vb_encode(vals)
    assert len(buf) == len(vals)  # every value fits 1 byte
    assert (encoding.vb_decode(buf, len(vals)) == vals).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=0xFFFFFFFF), max_size=300))
def test_vb_roundtrip_random(xs):
    vals = np.array(xs, dtype=np.uint32)
    out = encoding.vb_decode(encoding.vb_encode(vals), len(vals))
    assert (out == vals).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=0xFFFFFFFF), max_size=400))
def test_pfor_roundtrip_random(xs):
    vals = np.array(xs, dtype=np.uint32)
    out = encoding.pfor_decode(encoding.pfor_encode(vals), len(vals))
    assert (out == vals).all()


def test_pfor_dense_smaller_than_varbyte():
    # dense small gaps: pfor should win (that's Groonga's density heuristic)
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 7, size=1024).astype(np.uint32)
    assert len(encoding.pfor_encode(vals)) < len(encoding.vb_encode(vals + 200))
    assert encoding.choose_encoding(1024, 5) == "pfor"
    assert encoding.choose_encoding(8, 5) == "varbyte"
    assert encoding.choose_encoding(100, 1 << 20) == "varbyte"


def test_pfor_exceptions():
    vals = np.array([1, 2, 3, 1 << 30, 5, 6, 0xFFFFFFFF] + [1] * 200, dtype=np.uint32)
    out = encoding.pfor_decode(encoding.pfor_encode(vals), len(vals))
    assert (out == vals).all()
