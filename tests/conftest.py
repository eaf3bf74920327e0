"""Test config: force a virtual 8-device CPU mesh so sharding tests run
without TPU hardware, and Pallas kernels run in interpret mode on CPU."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The axon TPU plugin (sitecustomize) force-selects jax_platforms="axon,cpu"
# at interpreter start; override it before any backend is initialized so
# tests run on the virtual 8-device CPU mesh deterministically.
import jax

jax.config.update("jax_platforms", "cpu")

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
GOLDEN = REPO / "tests" / "golden"
INPUTS = Path("/tmp/golden_build/inputs")

sys.path.insert(0, str(REPO))


def fnv1a(data: bytes) -> int:
    """Mirror of the golden generator's FNV-1a-64 (tools/golden_gen.cpp)."""
    from hsrans_tpu.runtime import native

    return native.fnv1a(data)


@pytest.fixture(scope="session")
def golden_dir() -> Path:
    if not GOLDEN.exists() or not any(GOLDEN.iterdir()):
        pytest.skip("golden vectors not generated (run tools/gen_golden.sh)")
    return GOLDEN


@pytest.fixture(scope="session")
def golden_inputs() -> dict[str, np.ndarray]:
    """Regenerate the deterministic inputs if /tmp was cleaned."""
    if not INPUTS.exists():
        subprocess.run(
            [sys.executable, str(REPO / "tools" / "gen_inputs.py"), str(INPUTS)],
            check=True,
        )
    out = {}
    for f in sorted(INPUTS.glob("*.bin")):
        out[f.stem] = np.fromfile(f, dtype=np.uint8)
    return out


def read_meta(path: Path) -> tuple[int, int]:
    size_s, hash_s = path.read_text().split()
    return int(size_s), int(hash_s, 16)
