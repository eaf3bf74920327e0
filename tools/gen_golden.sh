#!/bin/bash
# Regenerate golden vectors from the C++ reference at /root/reference.
# Builds the generator in /tmp (the reference tree is read-only) and writes
# tests/golden/.  Deterministic inputs are produced by tools/gen_inputs.py.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
REF=/root/reference/src
BUILD=/tmp/golden_build
mkdir -p "$BUILD" "$REPO/tests/golden"

SRCS="$REF/hist.cpp $REF/simd_platform.c $REF/thread_pool.cpp \
  $REF/rANS32x16_16w.cpp $REF/rANS32x32_16w.cpp $REF/rANS32x64_16w.cpp \
  $REF/rans32x32_32blk_16w.cpp $REF/rans32x32_32blk_8w.cpp \
  $REF/block_rANS32x32_16w_encode.cpp $REF/block_rANS32x32_16w_decode.cpp \
  $REF/block_rANS32x64_16w_encode.cpp $REF/block_rANS32x64_16w_decode.cpp \
  $REF/mt_rANS32x32_16w_encode.cpp $REF/mt_rANS32x32_16w_decode.cpp \
  $REF/mt_rANS32x64_16w_encode.cpp $REF/mt_rANS32x64_16w_decode.cpp"

if [ ! -x "$BUILD/golden_gen" ]; then
  g++ -O2 -std=c++20 -mxsave -I"$REF" "$REPO/tools/golden_gen.cpp" $SRCS \
    -o "$BUILD/golden_gen" -lpthread
fi

python3 "$REPO/tools/gen_inputs.py" "$BUILD/inputs"

for f in "$BUILD"/inputs/*.bin; do
  case="$(basename "$f" .bin)"
  small=""
  # keep full blobs only for small inputs (direct decode-parity tests)
  if [ "$(stat -c%s "$f")" -le 70000 ]; then small="--small"; fi
  "$BUILD/golden_gen" "$f" "$REPO/tests/golden" "$case" $small
done
