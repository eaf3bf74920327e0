"""Backend capability detection and codec dispatch.

TPU-native analog of the reference's cpuid feature detection
(/root/reference/src/simd_platform.c `_DetectCPUFeatures`, and the
per-codec dispatch cascades like block_rANS32x64_16w_decode.cpp:135-151):
instead of SSE/AVX2/AVX-512 levels we probe the JAX backend once and pick
the best execution tier for each codec path.

Tiers (highest first):
  tpu        — real TPU: compiled Pallas kernels
  interpret  — CPU backend: Pallas kernels in interpret mode (the CI/
               capability-downgrade analog of the reference's --max-simd)
  numpy      — pure-host scalar-semantics paths (the oracle tier)

`--max-simd none` on the CLI maps to `numpy`, mirroring how the reference
clears its feature globals to force scalar decoders (main.cpp:463-618).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache


@dataclass(frozen=True)
class Capabilities:
    platform: str  # 'tpu' | 'cpu' | 'gpu' | ...
    device_kind: str  # e.g. 'TPU v5 lite'
    num_devices: int
    tier: str  # 'tpu' | 'interpret' | 'numpy'

    @property
    def pallas_interpret(self) -> bool:
        """Kernels must run in interpret mode on non-TPU backends."""
        return self.tier != "tpu"


@lru_cache(maxsize=1)
def detect(max_tier: str = "tpu") -> Capabilities:
    """Probe the JAX backend once (cf. _DetectCPUFeatures' one-shot globals)."""
    try:
        import jax

        devs = jax.devices()
        platform = devs[0].platform
        kind = devs[0].device_kind
        n = len(devs)
    except Exception:
        return Capabilities("none", "none", 0, "numpy")
    is_tpu = platform in ("tpu", "axon") or "TPU" in kind
    tier = "tpu" if is_tpu else "interpret"
    order = {"numpy": 0, "interpret": 1, "tpu": 2}
    if order[max_tier] < order[tier]:
        tier = max_tier
    return Capabilities(platform, kind, n, tier)


def banner(cap: Capabilities | None = None) -> str:
    """One-line capability report (cf. the reference's CPU feature banner,
    main.cpp:684-738)."""
    cap = cap or detect()
    return (
        f"backend: {cap.platform} ({cap.device_kind} x{cap.num_devices}) "
        f"-> tier '{cap.tier}'"
    )
