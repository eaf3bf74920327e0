"""Device (Pallas) tpx encoder: bit-identical to the numpy wire authority."""

import numpy as np
import pytest

from hsrans_tpu.kernels.tpx_encode import div_magic, make_enc_tables, tpx_encode_tpu
from hsrans_tpu.models.histogram import make_hist
from hsrans_tpu.ops.tpx import TpxParams, tpx_decode, tpx_encode

SMALL = TpxParams(bits=12, rows=8, lanes=128, steps=8, tiles=2)


def test_div_magic_exact():
    """floor(n/d) == (umul(m,n)>>31)>>l for all u31 states, edge divisors."""
    rng = np.random.default_rng(0)
    ds = [1, 2, 3, 4, 5, 7, 8, 15, 16, 17, 255, 256, 257, 1023, 1024, 4095, 4096, 32767, 32768]
    freq = np.zeros(256, dtype=np.uint16)
    freq[: len(ds)] = ds
    m, l = div_magic(freq)
    ns = np.concatenate(
        [
            rng.integers(0, 1 << 31, 50_000, dtype=np.int64),
            np.array([0, 1, 2, (1 << 31) - 1, 1 << 15, (1 << 16) - 1, 1 << 16, 1 << 30]),
        ]
    )
    mask16 = np.uint32(0xFFFF)
    for i, d in enumerate(ds):
        # the kernel's 16-bit-limb mulhi, exactly as lowered on the VPU
        st = ns.astype(np.uint32)
        mv, lv = np.uint32(m[i]), np.uint32(l[i])
        a0, a1 = mv & mask16, mv >> np.uint32(16)
        b0, b1 = st & mask16, st >> np.uint32(16)
        ll, lh, hl, hh = a0 * b0, a0 * b1, a1 * b0, a1 * b1
        tt = (ll >> np.uint32(16)) + (hl & mask16) + (lh & mask16)
        hi = hh + (hl >> np.uint32(16)) + (lh >> np.uint32(16)) + (tt >> np.uint32(16))
        q = ((hi << np.uint32(1)) | ((tt >> np.uint32(15)) & np.uint32(1))) >> lv
        assert np.array_equal(q.astype(np.int64), ns // d), d


def test_enc_tables_pack():
    h12 = make_hist(np.arange(256, dtype=np.uint8).repeat(7), 12)
    t = make_enc_tables(h12)
    fc = t["fc"].view(np.uint32)
    assert np.array_equal(fc & 0x1FFF, h12.symbol_count.astype(np.uint32))
    assert np.array_equal((fc >> 13) & 0xFFF, h12.cumul.astype(np.uint32))
    assert np.array_equal(fc >> 25, t["l"].astype(np.uint32))
    h15 = make_hist(np.arange(256, dtype=np.uint8).repeat(7), 15)
    t = make_enc_tables(h15)
    fc = t["fc"].view(np.uint32)
    assert np.array_equal(fc & 0xFFFF, h15.symbol_count.astype(np.uint32))
    assert np.array_equal(fc >> 16, h15.cumul.astype(np.uint32))


@pytest.mark.parametrize(
    "name,size",
    [
        ("partial-tile", 777),
        ("one-mega-exact", SMALL.mega_bytes),
        ("multi-mega", 2 * SMALL.mega_bytes + 333),
        ("empty", 0),
    ],
)
def test_encode_kernel_interpret_bit_identical(name, size):
    from tools.gen_inputs import text_like

    rng = np.random.default_rng(11)
    data = text_like(rng, size) if size else np.zeros(0, np.uint8)
    a = tpx_encode(data, p=SMALL)
    b = tpx_encode_tpu(data, p=SMALL, interpret=True)
    assert a == b
    assert tpx_decode(b) == data.tobytes()


def test_encode_kernel_nondividing_rows():
    """rows > 128 that 128 does not divide: the concat rc must fall back to
    a true divisor or the grid drops the trailing rows (corrupt streams)."""
    from tools.gen_inputs import text_like

    p = TpxParams(bits=12, rows=136, lanes=128, steps=4, tiles=1)
    rng = np.random.default_rng(33)
    data = text_like(rng, p.mega_bytes)
    b = tpx_encode_tpu(data, p=p, interpret=True)
    assert b == tpx_encode(data, p=p)
    assert tpx_decode(b) == data.tobytes()


def test_encode_kernel_interpret_rle_heavy():
    """Single-symbol-dominated rows: near-zero word counts per row."""
    data = np.concatenate(
        [np.full(SMALL.mega_bytes // 2, 7, np.uint8), np.arange(999, dtype=np.int64).astype(np.uint8)]
    )
    a = tpx_encode(data, p=SMALL)
    b = tpx_encode_tpu(data, p=SMALL, interpret=True)
    assert a == b
    assert tpx_decode(b) == data.tobytes()


@pytest.mark.parametrize("bits", (10, 12, 15))
def test_encode_kernel_fused_device_tables(bits):
    """Fully fused pipeline: hist + exact normalize + tables on device
    (models/jax_hist) -> bit-identical wire bytes."""
    from tools.gen_inputs import text_like

    rng = np.random.default_rng(17)
    p = TpxParams(bits=bits, rows=8, lanes=128, steps=8, tiles=2)
    data = text_like(rng, 2 * p.mega_bytes + 333)
    a = tpx_encode(data, p=p)
    b = tpx_encode_tpu(data, p=p, interpret=True, device_tables=True)
    assert a == b


def test_divisor_le_sublane_legal():
    """divisor_le must only return 8-multiples: Mosaic rejects block shapes
    whose sublane dim isn't divisible by 8 on real hardware (interpret mode
    does not check this, so a unit test pins it)."""
    from hsrans_tpu.kernels.tpx_encode import divisor_le

    for n in (8, 136, 184, 256, 1024, 968):
        d = divisor_le(n, 128)
        assert d % 8 == 0 and n % d == 0 and d <= 128, (n, d)


def test_tpx_adaptive_device_encode_matches_authority():
    """v3 adaptive device encode is bit-identical to the numpy authority
    and roundtrips through every decode tier."""
    import numpy as np
    from pathlib import Path

    from hsrans_tpu.kernels.tpx_decode import tpx_decode_tpu
    from hsrans_tpu.kernels.tpx_encode import tpx_encode_adaptive_tpu
    from hsrans_tpu.ops.tpx import tpx_decode, tpx_encode_adaptive

    arr = np.fromfile(Path(__file__).parent / "corpus" / "corpus.bin", np.uint8)[: 2 << 20]
    host = tpx_encode_adaptive(arr, 12)
    dev = tpx_encode_adaptive_tpu(arr, 12, interpret=True)
    assert dev == host
    assert tpx_decode(dev) == arr.tobytes()
    assert tpx_decode_tpu(dev, interpret=True) == arr.tobytes()
