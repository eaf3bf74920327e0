"""Build the checked-in real-data test corpus (tests/corpus/corpus.bin).

BASELINE.json's ratio bar is enwik8; with no network in the build image the
closest license-safe real data is the CPython standard library (PSF-2.0):
natural English prose in docstrings/comments, code text, plus compiled
bytecode for a binary section.  The corpus interleaves text and binary
segments so the reference greedy planners (ops/planner.py; reference
block_rANS32x64_16w_encode.cpp:58-133) see content shifts and produce many
variable-size blocks — the same structural character as the reference's
x-ray/mozilla benchmark files (BASELINE.md).

Layout (deterministic given a stdlib tree; the OUTPUT is checked in, this
script documents provenance and can rebuild a similar corpus elsewhere):
  repeating groups of [ ~384 KiB .py text | ~128 KiB .pyc binary ],
  one 128 KiB single-byte run in the middle (RLE/planner single-symbol path),
  total 6 MiB.
"""

from __future__ import annotations

import os
import sys
import sysconfig

TOTAL = 6 << 20
TEXT_SEG = 384 << 10
BIN_SEG = 128 << 10
RLE_SEG = 128 << 10


def gather(root: str, suffix: str) -> bytes:
    parts = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames.sort()
        for f in sorted(filenames):
            if f.endswith(suffix):
                try:
                    parts.append(open(os.path.join(dirpath, f), "rb").read())
                except OSError:
                    pass
        if sum(len(p) for p in parts) > TOTAL * 2:
            break
    return b"".join(parts)


def main(out_path: str, total: int = TOTAL) -> None:
    """total > TOTAL builds the scale-validation corpus (e.g. 100 MiB, the
    reference's enwik8/x-ray benchmark size, README.md:29) — same
    deterministic interleave, not checked in (generated into /tmp)."""
    stdlib = sysconfig.get_paths()["stdlib"]
    text = gather(stdlib, ".py")
    binry = gather(stdlib, ".pyc") or gather(stdlib, ".so")
    out = bytearray()
    ti = bi = 0
    placed_rle = False
    while len(out) < total:
        out += text[ti : ti + TEXT_SEG]
        ti += TEXT_SEG
        if not placed_rle and len(out) >= total // 2:
            out += bytes([0x20]) * RLE_SEG
            placed_rle = True
        out += binry[bi % max(len(binry) - BIN_SEG, 1) :][:BIN_SEG]
        bi += BIN_SEG
        if ti >= len(text):
            ti = 0
    del out[total:]
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(out)
    print(f"wrote {out_path}: {len(out)} bytes")


def make_xray(out_path: str, side: int = 2048) -> None:
    """Deterministic x-ray-like corpus (tests/corpus/xray.bin).

    The reference's headline mt numbers are set on `x-ray` (a 16-bit
    grayscale radiograph, ~80% ratio at B10, README.md:78-125/182): smooth
    anatomy + sensor noise in the low byte, very low-entropy high byte,
    black collimator borders that become RLE/single-symbol blocks.  This
    synthesizes the same structural character without shipping medical
    data: 14-bit smooth field + blob "bones" + Poisson-ish noise, stored
    little-endian u16, with zeroed borders.  Measured mt ratios 0.767-0.770
    at B10-B15 (x-ray: 0.80).
    """
    import numpy as np

    rng = np.random.default_rng(20260817)
    y, x = np.mgrid[0:side, 0:side].astype(np.float32)
    cy, cx = side / 2, side / 2
    r2 = ((y - cy) ** 2 + (x - cx) ** 2) / (side / 2) ** 2
    img = 3600.0 * np.exp(-1.8 * r2)  # beam vignette (14-bit scale)
    # smooth "anatomy": a few dozen soft elliptical blobs
    for _ in range(40):
        by, bx = rng.uniform(0.15 * side, 0.85 * side, 2)
        sy, sx = rng.uniform(0.02 * side, 0.22 * side, 2)
        amp = rng.uniform(600, 3600)
        img += amp * np.exp(-(((y - by) / sy) ** 2 + ((x - bx) / sx) ** 2))
    # sensor noise ~ sqrt(signal) (Poisson-like), plus read noise; scaled so
    # the mt ratio lands near the real x-ray's ~0.80 (README.md:182) rather
    # than flattering decode with an easier stream
    img += rng.normal(0.0, 1.0, img.shape).astype(np.float32) * (np.sqrt(img + 64.0) * 5.2 + 24.0)
    img = np.clip(img, 0, 16383).astype(np.uint16)
    # collimator borders: hard zeros (long RLE runs for the planners)
    m = side // 16
    img[:m, :] = 0
    img[-m:, :] = 0
    img[:, : m // 2] = 0
    img[:, -m // 2 :] = 0
    data = img.astype("<u2").tobytes()
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(data)
    print(f"wrote {out_path}: {len(data)} bytes")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "xray":
        make_xray(sys.argv[2] if len(sys.argv) > 2 else "tests/corpus/xray.bin")
    elif len(sys.argv) > 1 and sys.argv[1] == "big":
        main(sys.argv[2] if len(sys.argv) > 2 else "/tmp/corpus100.bin", total=100 << 20)
    else:
        main(sys.argv[1] if len(sys.argv) > 1 else "tests/corpus/corpus.bin")
