"""Mesh-sharded tpx: megablocks data-parallel over the virtual 8-dev mesh."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from hsrans_tpu.ops.tpx import TpxParams, tpx_decode, tpx_encode
from hsrans_tpu.parallel.tpx_sharded import tpx_decode_device, tpx_encode_device

SMALL = TpxParams(bits=12, rows=8, lanes=128, steps=8, tiles=2)


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs the virtual multi-device CPU mesh")
    return Mesh(np.array(devs).reshape(len(devs)), ("dp",))


@pytest.mark.parametrize(
    "name,size",
    [
        ("multi-mega+tail", 9 * SMALL.mega_bytes + 777),
        ("exact-megas", 4 * SMALL.mega_bytes),
        ("sub-mega", 1234),
        ("empty", 0),
    ],
)
def test_sharded_roundtrip_bit_identical(mesh, name, size):
    from tools.gen_inputs import text_like

    rng = np.random.default_rng(5)
    data = text_like(rng, size) if size else np.zeros(0, np.uint8)
    ref = tpx_encode(data, p=SMALL)
    blob = tpx_encode_device(data, p=SMALL, mesh=mesh, interpret=True)
    assert blob == ref
    assert tpx_decode_device(blob, mesh=mesh, interpret=True) == data.tobytes()
    assert tpx_decode(blob) == data.tobytes()


def test_sharded_single_device_path():
    """mesh=None runs the same code path unsharded."""
    from tools.gen_inputs import text_like

    rng = np.random.default_rng(6)
    data = text_like(rng, 3 * SMALL.mega_bytes + 55)
    blob = tpx_encode_device(data, p=SMALL, mesh=None, interpret=True)
    assert blob == tpx_encode(data, p=SMALL)
    assert tpx_decode_device(blob, mesh=None, interpret=True) == data.tobytes()
