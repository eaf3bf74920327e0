"""Deterministic test corpora for golden-vector generation and benchmarks.

All inputs are seeded PRNG so tests/golden can be regenerated bit-exactly.
Distributions are chosen to exercise the codec paths that matter:
  text   — zipf-ish over ~80 symbols (enwik8-like entropy, ~0.6 ratio @ B=12)
  skew   — strongly geometric (high compressibility, deep renorm activity)
  uniform— near-incompressible (stress renorm every step)
  rle    — long single-symbol runs (single-symbol RLE blocks in block/mt)
  mixed  — alternating text / rle sections (block-boundary decisions)
Sizes avoid multiples of 64 to exercise lane-tail handling.
"""

from __future__ import annotations

import os
import sys

import numpy as np


def text_like(rng: np.random.Generator, n: int) -> np.ndarray:
    ranks = np.arange(1, 81)
    p = 1.0 / ranks**1.1
    p /= p.sum()
    symbols = np.concatenate([[32], np.arange(97, 123), np.arange(65, 91), np.arange(33, 60)])[:80]
    return rng.choice(symbols, size=n, p=p).astype(np.uint8)


def skewed(rng: np.random.Generator, n: int) -> np.ndarray:
    return np.minimum(rng.geometric(0.3, size=n) - 1, 255).astype(np.uint8)


def uniform(rng: np.random.Generator, n: int) -> np.ndarray:
    return rng.integers(0, 256, size=n, dtype=np.uint8)


def rle(rng: np.random.Generator, n: int) -> np.ndarray:
    out = np.zeros(n, dtype=np.uint8)
    pos = 0
    while pos < n:
        run = int(rng.integers(1 << 14, 1 << 19))
        sym = int(rng.integers(0, 8))
        out[pos : pos + run] = sym
        pos += run
    return out


def mixed(rng: np.random.Generator, n: int) -> np.ndarray:
    parts = []
    total = 0
    while total < n:
        k = int(rng.integers(1 << 15, 1 << 18))
        part = rle(rng, k) if rng.random() < 0.4 else text_like(rng, k)
        parts.append(part)
        total += k
    return np.concatenate(parts)[:n]


CASES = {
    "text_63k": (text_like, 64001),
    "text_1m": (text_like, 1 << 20),
    "skew_50k": (skewed, 50021),
    "uniform_8k": (uniform, 8179),
    "rle_1m": (rle, (1 << 20) + 37),
    "mixed_2m": (mixed, (1 << 21) + 13),
    "tiny_130": (text_like, 130),
}


def main(outdir: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    for name, (fn, size) in CASES.items():
        rng = np.random.default_rng(sum(ord(c) for c in name))
        data = fn(rng, size)
        with open(os.path.join(outdir, f"{name}.bin"), "wb") as f:
            f.write(data.tobytes())
        print(f"{name}: {size} bytes")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/golden_build/inputs")
