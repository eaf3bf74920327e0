"""Device-plan cap sweep with same_tab kernels: ratio + decode slope per
(bits, cap).  Sequential; prints one line per cell."""
import sys
import numpy as np

sys.path.insert(0, "/root/repo")
import bench as B
B.DETAIL_PATH = "/tmp/sweep_detail.json"
from hsrans_tpu.ops.mt import mt_encode
from hsrans_tpu.parallel.sharded import device_plan

import os

xr_big = np.fromfile("/root/repo/tests/corpus/xray.bin", np.uint8)
# tile to the bench's working-set size (bench.py SIZE_MB, default 64 MiB):
# rates measured on the raw 8 MiB file run ~25-35% hotter than the bench's
# 64 MiB rows (observed B10 23.7 vs 17.4 GiB/s), so sweep on the same shape
xr_big = np.tile(xr_big, max(1, int(os.environ.get("HSRANS_BENCH_MB", "64")) // 8))
cells = []
for a in sys.argv[1:]:
    bits, caps = a.split(":")
    cells += [(int(bits), int(c) << 10) for c in caps.split(",")]
for bits, cap in cells:
    blob = mt_encode(xr_big, bits, 64, plan=device_plan(xr_big, bits, 64, cap))
    print(f"B{bits} cap{cap>>10}K ratio={len(blob)/xr_big.size:.4f}", flush=True)
    B._mt_bucket_slope(blob, bits, f"dp_B{bits}_cap{cap>>10}K", None)
