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
    from hsrans_tpu.ops.tpx import TpxParams, tpx_encode, tpx_parse
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
        c0[i], bm[i], t1a[i], t1b[i], t2a[i], t2b[i] = K.mega_dec_tables(m.freqs, BITS)
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

    lo_n, hi_n = 1, 17
    f_lo, f_hi = many(lo_n), many(hi_n)
    np.asarray(f_lo(*dev))
    np.asarray(f_hi(*dev))  # compile + warm both

    t_lo = min(_timed(f_lo, dev) for _ in range(7))
    t_hi = min(_timed(f_hi, dev) for _ in range(7))
    per_pass = (t_hi - t_lo) / (hi_n - lo_n)
    mib_s = size / (1 << 20) / per_pass
    print(
        f"device decode (slope of {lo_n}->{hi_n} passes): {per_pass*1e3:.2f} ms per "
        f"{size >> 20} MiB -> {mib_s:.0f} MiB/s on {jax.devices()[0].device_kind}",
        file=sys.stderr,
    )

    _bench_encode(data, p)

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


def _bench_encode(data: "np.ndarray", p) -> None:
    """Device encode throughput (phase A + concat chained, slope of N).

    Reference baseline: scalar encoders only, 347.90 MiB/s (BASELINE.md).
    Reported to stderr; the JSON headline metric stays the decode rate.
    """
    import jax
    import jax.numpy as jnp

    from hsrans_tpu.kernels import tpx_encode as KE
    from hsrans_tpu.ops.tpx import make_tile_hist

    mega = data[: p.mega_bytes]
    s4c, rows, n_tiles = p.steps // 4, p.rows, p.tiles
    packed = jnp.asarray(mega.view("<i4").reshape(n_tiles, rows, s4c * p.lanes))
    tile_bytes = rows * p.steps * p.lanes
    hists = [make_tile_hist(mega[t * tile_bytes : (t + 1) * tile_bytes], p.bits) for t in range(n_tiles)]

    def pack(key):
        lo = np.zeros((n_tiles, 8, 128), np.int32)
        hi = np.zeros((n_tiles, 8, 128), np.int32)
        for t in range(n_tiles):
            tab = KE.make_enc_tables(hists[t])[key]
            lo[t, 0, :] = tab[:128]
            hi[t, 0, :] = tab[128:]
        return jnp.asarray(lo), jnp.asarray(hi)

    tabs = [x for key in ("fc", "m", "l") for x in pack(key)]
    vlen = jnp.asarray(np.array([[p.mega_bytes]], np.int32))
    wq = jnp.asarray(np.array([[1024 // 128]], np.int32))  # generous typical W
    kw_a = dict(rows=rows, s4c=s4c, n_tiles=n_tiles, bits=p.bits)
    kw_b = dict(rows=rows, rc=128, steps=p.steps, wcap=(p.steps * p.lanes // 2), n_tiles=n_tiles)

    def one_pass(carry):
        win, cntp, states = KE._encode_mega(vlen, *tabs, packed ^ carry, **kw_a)
        cnt = KE._unpack_counts(cntp, s4c=s4c)
        stream = KE._concat_mega(wq, win, cnt, **kw_b)
        delta = stream[0, :, : s4c * 128] & 1
        return carry ^ jnp.broadcast_to(delta[None], packed.shape)

    def many(n):
        @jax.jit
        def fn(p0):
            carry = jax.lax.fori_loop(0, n, lambda i, c: one_pass(c), jnp.zeros_like(p0))
            # small readback: every pass still runs fully (each consumes the
            # whole carry), only the final transfer shrinks
            return carry[:, 0, :128]

        return fn

    f_lo, f_hi = many(1), many(9)
    np.asarray(f_lo(packed))
    np.asarray(f_hi(packed))
    t_lo = min(_timed(f_lo, [packed]) for _ in range(5))
    t_hi = min(_timed(f_hi, [packed]) for _ in range(5))
    per = (t_hi - t_lo) / 8
    enc_mib_s = p.mega_bytes / (1 << 20) / per
    print(
        f"device encode (slope of 1->9 passes): {per*1e3:.2f} ms per "
        f"{p.mega_bytes >> 20} MiB -> {enc_mib_s:.0f} MiB/s "
        f"(reference scalar encode baseline: 347.90 MiB/s -> {enc_mib_s/347.90:.1f}x)",
        file=sys.stderr,
    )


def _timed(fn, dev) -> float:
    t0 = time.perf_counter()
    np.asarray(fn(*dev))
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
