"""Quick mt-decode kernel bench: planner blob, largest bucket, slope-of-N.

Usage: python tools/bench_mt_dec.py [bits] [MB]
Env: HSRANS_PAIRS=0 to force the single kernel.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as B


def main():
    bits = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    from hsrans_tpu.ops.mt import mt_encode
    corpus = np.fromfile(os.path.join(B.REPO, "tests", "corpus", "corpus.bin"), np.uint8)
    corpus_big = np.tile(corpus, max(1, mb // 6))
    t0 = time.time()
    blob = mt_encode(corpus_big, bits, 64)
    print(f"encode {time.time()-t0:.1f}s blob={len(blob)/1e6:.1f}MB ratio={len(blob)/corpus_big.size:.4f}", file=sys.stderr)
    from hsrans_tpu.kernels import mt64_decode as K
    if os.environ.get("HSRANS_PAIRS") == "0":
        K._USE_PAIR_KERNEL = False
    if os.environ.get("HSRANS_PREFIX_MXU") == "0":
        K._PREFIX_MXU = False
    if os.environ.get("HSRANS_PAIR_V2") == "0":
        K._PAIR_V2 = False
    B._mt_bucket_slope(blob, bits, f"mt_planner_decode_B{bits}", 13207.0 if bits == 12 else 7471.0)


if __name__ == "__main__":
    main()
