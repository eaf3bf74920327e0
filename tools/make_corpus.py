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


def main(out_path: str) -> None:
    stdlib = sysconfig.get_paths()["stdlib"]
    text = gather(stdlib, ".py")
    binry = gather(stdlib, ".pyc") or gather(stdlib, ".so")
    out = bytearray()
    ti = bi = 0
    placed_rle = False
    while len(out) < TOTAL:
        out += text[ti : ti + TEXT_SEG]
        ti += TEXT_SEG
        if not placed_rle and len(out) >= TOTAL // 2:
            out += bytes([0x20]) * RLE_SEG
            placed_rle = True
        out += binry[bi % max(len(binry) - BIN_SEG, 1) :][:BIN_SEG]
        bi += BIN_SEG
        if ti >= len(text):
            ti = 0
    del out[TOTAL:]
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(out)
    print(f"wrote {out_path}: {len(out)} bytes")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "tests/corpus/corpus.bin")
