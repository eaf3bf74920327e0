"""hsrans_tpu — TPU-native interleaved rANS codec framework.

A from-scratch JAX/Pallas rebuild of the capabilities of
rainerzufalldererste/hypersonic-rANS (see SURVEY.md):

  * bit-exact wire-format parity codecs: raw rANS32x{16,32,64} 16w,
    rANS32x32 32blk {16w,8w}, block_rANS32x{32,64} 16w (adaptive
    histograms), mt_rANS32x{32,64} 16w (independent blocks)
    — `hsrans_tpu.ops.*` (numpy oracle) and jittable JAX device paths;
  * the tpx tile-parallel format: 1024x128 interleaved states decoded by a
    Pallas VPU kernel — `hsrans_tpu.ops.tpx`, `hsrans_tpu.kernels`;
  * data-parallel block decode/encode over a device mesh —
    `hsrans_tpu.parallel`;
  * C++ host runtime (histograms, block planner, thread pool) —
    `hsrans_tpu.runtime.native`;
  * hsrans-compatible CLI — `python -m hsrans_tpu.cli`.
"""

from .models.histogram import Hist, make_hist, normalize_hist, observe_hist
from .ops.blk32 import blk32_decode, blk32_decode_host, blk32_encode, blk32_encode_host
from .ops.block import block_decode, block_encode
from .ops.mt import mt_decode, mt_encode
from .ops.reference import raw_decode, raw_decode_16w, raw_encode, raw_encode_16w
from .ops.tpx import TpxParams, tpx_decode, tpx_encode

__all__ = [
    "Hist",
    "make_hist",
    "normalize_hist",
    "observe_hist",
    "raw_encode",
    "raw_decode",
    "raw_encode_16w",
    "raw_decode_16w",
    "blk32_encode",
    "blk32_decode",
    "blk32_encode_host",
    "blk32_decode_host",
    "block_encode",
    "block_decode",
    "mt_encode",
    "mt_decode",
    "TpxParams",
    "tpx_encode",
    "tpx_decode",
    "tpx_encode_tpu",
    "tpx_decode_tpu",
    "mt64_decode_tpu",
    "mt64_encode_tpu",
]

__version__ = "0.3.0"


def __getattr__(name: str):
    # device-path entry points import jax lazily
    if name == "tpx_encode_tpu":
        from .kernels.tpx_encode import tpx_encode_tpu

        return tpx_encode_tpu
    if name == "tpx_decode_tpu":
        from .kernels.tpx_decode import tpx_decode_tpu

        return tpx_decode_tpu
    if name == "mt64_decode_tpu":
        from .kernels.mt64_decode import mt64_decode_tpu

        return mt64_decode_tpu
    if name == "mt64_encode_tpu":
        from .kernels.mt64_encode import mt64_encode_tpu

        return mt64_encode_tpu
    raise AttributeError(name)
