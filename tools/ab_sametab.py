"""On-device A/B: mt device_plan decode with same_tab on vs off (B10/B13).

Run twice: HSRANS_NO_SAMETAB=1 for the OFF arm (env is read at import)."""
import os, sys, json
import numpy as np

sys.path.insert(0, "/root/repo")
import bench as B
B.DETAIL_PATH = "/tmp/ab_detail.json"  # keep the A/B out of BENCH_DETAIL
from hsrans_tpu.ops.mt import mt_encode
from hsrans_tpu.parallel.sharded import device_plan

xr_big = np.fromfile("/root/repo/tests/corpus/xray.bin", np.uint8)
caps = {10: 16 << 10, 13: 16 << 10}
arm = "off" if os.environ.get("HSRANS_NO_SAMETAB") == "1" else "on"
for bits in (int(a) for a in sys.argv[1:] or ["10", "13"]):
    blob = mt_encode(xr_big, bits, 64, plan=device_plan(xr_big, bits, 64, caps[bits]))
    print(f"[{arm}] B{bits} ratio={len(blob)/xr_big.size:.4f}", flush=True)
    B._mt_bucket_slope(blob, bits, f"ab_{arm}_B{bits}", None)
print(json.dumps(B.METRICS))
