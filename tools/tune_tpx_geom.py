"""Measure tpx decode rate across candidate per-mega geometries.

The v3 adaptive encoder picks (rows, steps) per content region
(ops/tpx.py tpx_plan_geometry); this tool measures, on the real device,
the decode rate and ratio of each candidate geometry applied UNIFORMLY to
the mixed corpus, so the geometry table can be tuned from data:

    python tools/tune_tpx_geom.py [corpus] [--geoms 128x8,256x8,256x16,...]

Output: one line per geometry with ratio, decode MiB/s (slope-of-N), and
the chain count — pick the Pareto points for tpx_plan_geometry's table.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import slope  # noqa: E402


def measure(corpus: np.ndarray, rows: int, steps: int, bits: int = 12) -> tuple[float, float]:
    import jax
    import jax.numpy as jnp

    from hsrans_tpu.kernels import tpx_decode as K
    from hsrans_tpu.ops.tpx import MAGIC3, L, tpx_parse, tpx_plan_geometry  # noqa: F401
    from hsrans_tpu.kernels.tpx_encode import _device_mega_into

    tile_span = rows * steps * 128
    n_tiles = min(64, max(1, -(-corpus.size // tile_span)))
    # uniform v3 blob at this geometry
    out = bytearray()
    out += MAGIC3
    out += corpus.size.to_bytes(8, "little")
    out += b"\0" * 8
    for v in (bits, rows, 128, steps, n_tiles):
        out += int(v).to_bytes(4, "little")
    base = 0
    while base < corpus.size:
        nt = min(n_tiles, max(1, -(-(corpus.size - base) // tile_span)))
        out += int(rows).to_bytes(4, "little")
        out += int(steps).to_bytes(4, "little")
        _device_mega_into(out, corpus, base, nt, min(corpus.size - base, rows * nt * steps * 128),
                          bits=bits, rows=rows, steps=steps)
        base += rows * nt * steps * 128
    out[16:24] = len(out).to_bytes(8, "little")
    blob = bytes(out)
    ratio = len(blob) / corpus.size

    p, length, megas = tpx_parse(blob)
    groups: dict[tuple, list] = {}
    for m in megas:
        groups.setdefault((m.rows, m.steps, m.n_tiles), []).append(m)
    gspecs = []
    for (rows_g, steps_g, T), ms in sorted(groups.items()):
        w_max = max(m.w_slots for m in ms)
        M = len(ms)
        packs = [np.zeros((M, T, 8, 128), np.int32) for _ in range(6)]
        stream = np.zeros((M, T, rows_g, w_max), np.int32)
        states = np.zeros((M, rows_g, 128), np.uint32)
        vlens = np.zeros((M, 1, 1), np.int32)
        for i, m in enumerate(ms):
            tabs = K.mega_dec_tables(m.freqs, bits)
            for j in range(6):
                packs[j][i] = tabs[j]
            stream[i, :, :, : m.w_slots] = m.stream.view(np.int32)
            states[i] = m.states
            vlens[i, 0, 0] = min(length - m.base, m.span)
        dev = tuple(jnp.asarray(x) for x in packs + [K.chunk_major(stream), states])
        vl = jnp.asarray(vlens)
        gspecs.append((dev, vl, dict(rows=rows_g, n_tiles=T, w_slots=w_max, steps=steps_g, bits=bits)))

    def many(n):
        @jax.jit
        def fn():
            def body(i, carry):
                for dev, vl, kw in gspecs:
                    def gpass(c, xs, kw=kw):
                        vlen_m, c0m, bmm, t1am, t1bm, t2am, t2bm, streamm, initm = xs
                        o = K._decode_mega(vlen_m, c0m, bmm, t1am, t1bm, t2am, t2bm, streamm, initm ^ c, **kw)
                        d = jax.lax.bitcast_convert_type(o[0, 0, 0], jnp.uint32) & jnp.uint32(1)
                        return c ^ d, o[0, 0, 0]

                    carry, _ = jax.lax.scan(gpass, carry, (vl,) + dev)
                return carry

            return jax.lax.fori_loop(0, n, body, jnp.uint32(0))

        return fn

    per = slope(many, 1, 9)
    return ratio, corpus.size / (1 << 20) / per


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    path = args[0] if args else "tests/corpus/corpus.bin"
    geoms = [(128, 8), (128, 16), (256, 8), (256, 16), (512, 8), (1024, 8), (1024, 32)]
    for a in sys.argv[1:]:
        if a.startswith("--geoms="):
            geoms = [tuple(int(x) for x in g.split("x")) for g in a.split("=", 1)[1].split(",")]
    corpus = np.fromfile(path, np.uint8)
    print(f"{'rows x steps':>13} {'tile KiB':>9} {'chains':>7} {'ratio':>7} {'dec MiB/s':>10}")
    for rows, steps in geoms:
        ratio, mib = measure(corpus, rows, steps)
        print(f"{rows:>8} x {steps:<3} {rows * steps * 128 // 1024:>9} {rows:>7} {ratio:>7.4f} {mib:>10.0f}")


if __name__ == "__main__":
    main()
