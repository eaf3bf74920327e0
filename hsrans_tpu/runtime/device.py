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

import os
import sys
import threading
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


def _enable_compile_cache(jax_mod) -> None:
    """Persistent executable cache (.jax_cache under HSRANS_CACHE_DIR or
    cwd).  Must go through config.update: this image's site hook
    (/root/.axon_site/sitecustomize.py) preloads jax before any package
    code runs, so JAX_COMPILATION_CACHE_DIR via os.environ is read too
    late and silently ignored.  A fresh process otherwise repays every
    Mosaic kernel compile (~10 min for a cold hb pair specialization)."""
    if os.environ.get("HSRANS_NO_COMPILE_CACHE") == "1":
        return
    try:
        path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
            os.environ.get("HSRANS_CACHE_DIR", os.getcwd()), ".jax_cache"
        )
        if not jax_mod.config.jax_compilation_cache_dir:
            jax_mod.config.update("jax_compilation_cache_dir", path)
            jax_mod.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # noqa: BLE001 — the cache is never worth failing over
        pass


def _probe_backend(timeout_s: float) -> tuple[str, str, int] | None:
    """jax.devices() in an abandonable daemon thread.

    A wedged remote-TPU tunnel (observed: the axon worker after an
    over-VMEM compile crash) blocks jax.devices() inside a C call for
    hours — no Python signal handler runs, and the blocked call holds
    jax's backend-init lock.  So on timeout the caller must NOT touch jax
    in this process at all: every later jax call would block on that same
    lock.  Degrading to the numpy/native host tier keeps the whole
    library usable with a dead device."""
    out: list[tuple[str, str, int] | None] = []

    def run() -> None:
        try:
            import jax

            _enable_compile_cache(jax)
            devs = jax.devices()
            out.append((devs[0].platform, devs[0].device_kind, len(devs)))
        except Exception:
            out.append(None)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout_s)
    return out[0] if out else None


@lru_cache(maxsize=1)
def detect(max_tier: str = "tpu") -> Capabilities:
    """Probe the JAX backend once (cf. _DetectCPUFeatures' one-shot globals)."""
    probe = _probe_backend(float(os.environ.get("HSRANS_DEVICE_PROBE_S", "60")))
    if probe is None:
        print(
            "hsrans: device backend probe timed out or failed (wedged device "
            "tunnel?) — degrading to the numpy/native host tier",
            file=sys.stderr,
        )
        return Capabilities("none", "none", 0, "numpy")
    platform, kind, n = probe
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
