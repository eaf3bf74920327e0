"""Malformed-input hardening: decoders must return None/empty, never raise.

The reference's error model is `return 0` on defensive header checks
(e.g. block_rANS32x64_16w_decode.cpp:15-32); ours is None.  Truncations
and bit flips in headers must not escape as exceptions.
"""

import numpy as np
import pytest

from hsrans_tpu.ops.blk32 import blk32_decode
from hsrans_tpu.ops.block import block_decode, block_encode
from hsrans_tpu.ops.mt import mt_decode, mt_encode
from hsrans_tpu.ops.reference import raw_decode_16w, raw_encode_16w
from hsrans_tpu.models.histogram import make_hist
from hsrans_tpu.ops.tpx import tpx_decode, tpx_encode


def _data():
    rng = np.random.default_rng(21)
    from tools.gen_inputs import text_like

    return text_like(rng, 40_000)


CUTS = (0, 7, 8, 15, 16, 43, 44, 100, 800, 1000, -1)


def _truncations(blob):
    for cut in CUTS:
        yield blob[: cut if cut >= 0 else len(blob) - 1]


def test_tpx_truncations_safe():
    blob = tpx_encode(_data(), 12)
    assert tpx_decode(blob) == _data().tobytes()
    for t in _truncations(blob):
        out = tpx_decode(t)
        assert out is None or isinstance(out, bytes)


def test_raw_truncations_safe():
    data = _data()
    blob = raw_encode_16w(data, make_hist(data, 12), 64)
    for t in _truncations(blob):
        out = raw_decode_16w(t, 12, 64)
        assert out is None or isinstance(out, bytes)


def test_mt_truncations_safe():
    blob = mt_encode(_data(), 12, 64)
    for t in _truncations(blob):
        out = mt_decode(t, 12, 64)
        assert out is None or isinstance(out, bytes)


def test_block_truncations_safe():
    blob = block_encode(_data(), 12, 64)
    for t in _truncations(blob):
        out = block_decode(t, 12, 64)
        assert out is None or isinstance(out, bytes)


def test_tpx_header_bitflips_safe():
    blob = bytearray(tpx_encode(_data(), 12))
    for pos in (8, 24, 28, 32, 36, 40, 44, 48):
        for val in (0x00, 0xFF, 0x7F):
            b = bytearray(blob)
            b[pos] = val
            out = tpx_decode(bytes(b))
            assert out is None or isinstance(out, bytes)
