"""Benchmark: flagship tpx Pallas decode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MiB/s", "vs_baseline": N}

Baseline: the reference's north-star single-thread decode of rANS32x64 16w
12 on enwik8 = 3009.18 MiB/s (BASELINE.md; 7950X, AVX2).  The corpus is a
deterministic enwik8-like zipf text (tools/gen_inputs.py) since the
container has no network access.

Timing methodology (docs/KERNEL_NOTES.md): host-side per-call timing through
the axon tunnel is unreliable, so we run N decode passes inside one jit with
a true data dependency between passes and fit the slope of wall time vs N —
the fixed dispatch/readback overhead cancels exactly.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MIB_S = 3009.18
SIZE_MB = int(os.environ.get("HSRANS_BENCH_MB", "64"))
BITS = 12


def main() -> None:
    import jax
    import jax.numpy as jnp

    from hsrans_tpu.kernels import tpx_decode as K
    from hsrans_tpu.models.histogram import complete_hist
    from hsrans_tpu.ops.tpx import TpxParams, make_rank_tables, tpx_encode, tpx_parse
    from tools.gen_inputs import text_like

    p = TpxParams(bits=BITS)
    n_megas = max(1, (SIZE_MB << 20) // p.mega_bytes)
    size = n_megas * p.mega_bytes

    rng = np.random.default_rng(8)
    data = text_like(rng, size)

    t0 = time.perf_counter()
    blob = tpx_encode(data, BITS)
    enc_s = time.perf_counter() - t0
    ratio = len(blob) / data.size
    print(
        f"corpus {size >> 20} MiB; encode (host numpy): "
        f"{size / (1 << 20) / enc_s:.1f} MiB/s; ratio {ratio:.4f}",
        file=sys.stderr,
    )

    _, length, megas = tpx_parse(blob)
    n_buckets = (1 << BITS) // 32

    # stack per-mega kernel inputs (all full megas -> identical shapes)
    w_max = max(m.w_slots for m in megas)
    M = len(megas)
    T = megas[0].n_tiles
    c0 = np.zeros((M, T, 8, 128), np.int32)
    bm = np.zeros((M, T, 8, 128), np.int32)
    t1a = np.zeros((M, T, 8, 128), np.int32)
    t1b = np.zeros((M, T, 8, 128), np.int32)
    t2a = np.zeros((M, T, 8, 128), np.int32)
    t2b = np.zeros((M, T, 8, 128), np.int32)
    stream = np.zeros((M, T, p.rows, w_max), np.int32)
    states = np.zeros((M, p.rows, p.lanes), np.uint32)
    for i, m in enumerate(megas):
        for t in range(m.n_tiles):
            hist = complete_hist(m.freqs[t], BITS)
            rt = make_rank_tables(hist)
            c0[i, t, 0, :n_buckets] = rt["c0"]
            bm[i, t, 0, :n_buckets] = rt["bm"]
            t1a[i, t, 0] = rt["t1"][:128]
            t1b[i, t, 0] = rt["t1"][128:]
            t2a[i, t, 0] = rt["t2"][:128]
            t2b[i, t, 0] = rt["t2"][128:]
        stream[i, :, :, : m.w_slots] = m.stream.view(np.int32)
        states[i] = m.states

    vlen = jnp.asarray(np.array([[p.mega_bytes]], np.int32))
    dev = [jnp.asarray(x) for x in (c0, bm, t1a, t1b, t2a, t2b, stream, states)]
    kw = dict(rows=p.rows, n_tiles=T, w_slots=w_max, steps=p.steps, bits=BITS)

    def corpus_pass(carry, xs):
        c0m, bmm, t1am, t1bm, t2am, t2bm, streamm, initm = xs
        # xor a bit of each output into the next pass's init: forces serial
        # execution (defeats CSE) while leaving the work shape identical
        out = K._decode_mega(vlen, c0m, bmm, t1am, t1bm, t2am, t2bm, streamm, initm ^ carry, **kw)
        delta = jax.lax.bitcast_convert_type(out[0, :, :128], jnp.uint32) & jnp.uint32(1)
        return carry ^ delta, out[0, 0, 0]

    def many(n):
        @jax.jit
        def fn(*dev_args):
            def body(i, carry):
                carry, _ = jax.lax.scan(corpus_pass, carry, dev_args)
                return carry
            return jax.lax.fori_loop(0, n, body, jnp.zeros((p.rows, p.lanes), jnp.uint32))
        return fn

    lo_n, hi_n = 1, 9
    f_lo, f_hi = many(lo_n), many(hi_n)
    np.asarray(f_lo(*dev))
    np.asarray(f_hi(*dev))  # compile + warm both

    t_lo = min(_timed(f_lo, dev) for _ in range(3))
    t_hi = min(_timed(f_hi, dev) for _ in range(3))
    per_pass = (t_hi - t_lo) / (hi_n - lo_n)
    mib_s = size / (1 << 20) / per_pass
    print(
        f"device decode (slope of {lo_n}->{hi_n} passes): {per_pass*1e3:.2f} ms per "
        f"{size >> 20} MiB -> {mib_s:.0f} MiB/s on {jax.devices()[0].device_kind}",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "tpx_rANS32_12bit_decode_enwik8like",
                "value": round(mib_s, 2),
                "unit": "MiB/s",
                "vs_baseline": round(mib_s / BASELINE_MIB_S, 4),
            }
        )
    )


def _timed(fn, dev) -> float:
    t0 = time.perf_counter()
    np.asarray(fn(*dev))
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
