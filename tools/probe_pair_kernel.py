"""Timing-split probe for the mt64 pair kernel on the planner blob.

Runs ONE configuration per process (the counterfactual env vars change the
traced kernel, and jax's trace cache keys on static args, not the
environment), printing a single JSON line:

    python tools/probe_pair_kernel.py <config> [bits] [corpus]

configs:
  base        — production kernel, default geometry
  nowindow    — HSRANS_WINDOW_TIMING_HACK (spread-free window scan; WRONG
                output, timing only) -> window-scan spread share
  nomatmul    — HSRANS_NO_MATMUL (identity prefix; WRONG output) -> MXU
                prefix share
  gcap64/128/256 — group-depth sweep
  slice8/32   — cursor-regroup time slicing every 8/32 s4 steps

The measured shares drive the next kernel lever (docs/KERNEL_NOTES.md:
the step is issue-bound, so shares ~= op-count shares).
"""

import json
import os
import sys

cfg = sys.argv[1] if len(sys.argv) > 1 else "base"
bits = int(sys.argv[2]) if len(sys.argv) > 2 else 12
corpus_path = sys.argv[3] if len(sys.argv) > 3 else None

if cfg in ("nowindow", "nomatmul"):
    os.environ["HSRANS_DEV_COUNTERFACTUAL"] = "1"
    os.environ[
        "HSRANS_WINDOW_TIMING_HACK" if cfg == "nowindow" else "HSRANS_NO_MATMUL"
    ] = "1"
elif cfg.startswith("gcap"):
    os.environ["HSRANS_PAIR_GCAP"] = cfg[4:]
elif cfg.startswith("slice"):
    os.environ["HSRANS_SLICE_S4"] = cfg[5:]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench  # noqa: E402
from hsrans_tpu.ops.mt import mt_encode  # noqa: E402

if corpus_path:
    corpus = np.fromfile(corpus_path, np.uint8)
else:
    corpus = np.tile(np.fromfile(os.path.join(bench.REPO, "tests", "corpus", "corpus.bin"), np.uint8), 11)[: 64 << 20]

blob = mt_encode(corpus, bits, 64)
bench._mt_bucket_slope(blob, bits, f"probe_{cfg}_B{bits}", None)
print(json.dumps(bench.METRICS[-1]))
