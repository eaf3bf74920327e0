"""block_rANS32xN 16w — the flagship adaptive-histogram block codec.

Input is split into variable-size blocks by the greedy backward planner
(ops.planner); each block carries its own normalized histogram in-stream,
single-symbol blocks become RLE markers, and — the defining property — the
rANS states and word stream flow *continuously across blocks*: only the
table switches (SURVEY.md §3.4).

Wire format (block_rANS32x64_16w_{encode,decode}.cpp):
  u64 rawLength | u64 compressedLength | N*u32 final states |
  per block, embedded in the u16 word stream:
      u64 blockSize            (bit63 set => single-symbol:
                                size | 1<<63 | sym<<54, no hist, no words)
      256*u16 freq             (only for coded blocks)
      u16 words...             (continuous, consumed by the state machine)

Block starts are N-aligned; the final (possibly partial) lane group belongs
to the last block and is handled with the usual tail mask.
"""

from __future__ import annotations

import numpy as np

from ..models.histogram import Hist, complete_hist
from ..rans import DECODE_CONSUME_POINT_16, IDX2IDX, INV_IDX2IDX
from .planner import BlockPlan, plan_blocks
from .reference import decode_full_groups, decode_tail_group, encode_groups

_U32 = np.uint32
_SINGLE_BIT = 1 << 63
_SYM_SHIFT = 54
_SIZE_MASK = (1 << 54) - 1


def block_capacity(input_size: int, n: int) -> int:
    """Reference: block_rANS32x64_16w_encode.cpp:47-54."""
    base = 16 + 512 + input_size + n * 4
    block_count = (input_size + (1 << 15)) // (1 << 15) + 1
    return base + block_count * (8 + 512)


def _lane_groups(arr: np.ndarray, start: int, end: int, length: int, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Byte matrix [G, n] in lane order covering [start, end) (end==length
    may include the partial tail group)."""
    perm = IDX2IDX[n]
    total = -(-(end - start) // n)
    padded = np.zeros(max(total * n, 1), dtype=np.uint8)
    padded[: min(end, length) - start] = arr[start : min(end, length)]
    pos = np.arange(total, dtype=np.int64)[:, None] * n + perm[None, :]
    return padded[pos], (start + pos) < length


def block_encode(data: bytes | np.ndarray, bits: int, n: int, plan: list[BlockPlan] | None = None) -> bytes:
    """Encode with adaptive per-block histograms (bit-exact wire parity).

    Dispatches to the native C++ codec when built (identical bytes, tested
    by tests/test_native_codec.py); the numpy body is the wire authority.
    """
    if plan is None:
        from ..runtime import native

        arr0 = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else np.asarray(data, dtype=np.uint8)
        fast = native.block_encode(arr0, bits, n)
        if fast is not None:
            return fast
    return block_encode_py(data, bits, n, plan)


def block_encode_py(data: bytes | np.ndarray, bits: int, n: int, plan: list[BlockPlan] | None = None) -> bytes:
    """Pure-numpy encoder (the wire authority)."""
    arr = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else np.asarray(data, dtype=np.uint8)
    length = arr.size
    if plan is None:
        plan = plan_blocks(arr, bits, "block", n)

    states = np.full(n, DECODE_CONSUME_POINT_16, dtype=_U32)
    parts: list[bytes] = [b""] * len(plan)

    # encode blocks backward (rANS is LIFO); assemble parts in forward order
    for k in range(len(plan) - 1, -1, -1):
        row = plan[k]
        if row.is_single:
            indicator = row.size | _SINGLE_BIT | (row.symbol << _SYM_SHIFT)
            parts[k] = indicator.to_bytes(8, "little")
            continue
        hist = complete_hist(row.freq, bits)
        assert hist is not None, "planner produced an invalid histogram"
        groups, valid = _lane_groups(arr, row.start, row.start + row.size, length, n)
        words, emits, states = encode_groups(states, groups, valid, hist)
        parts[k] = (
            int(row.size).to_bytes(8, "little")
            + row.freq.astype("<u2").tobytes()
            + words[emits].astype("<u2").tobytes()
        )

    out = bytearray()
    out += int(length).to_bytes(8, "little")
    out += b"\0" * 8
    out += states.astype("<u4").tobytes()
    for p in parts:
        out += p
    out[8:16] = len(out).to_bytes(8, "little")
    return bytes(out)


def block_decode(blob: bytes | np.ndarray, bits: int, n: int) -> bytes | None:
    """Decode; None on malformed input (reference error model).

    Native C++ fast path when built; numpy fallback below is the authority.
    """
    from ..runtime import native

    # native implements the reference widths (32/64); other n fall back
    # to the numpy authority rather than reading native's -1 as malformed
    if native.load() is not None and n in (32, 64):
        return native.block_decode(blob, bits, n)
    return block_decode_py(blob, bits, n)


def block_decode_py(blob: bytes | np.ndarray, bits: int, n: int) -> bytes | None:
    """Pure-numpy decoder (the wire authority)."""
    buf = np.frombuffer(blob, dtype=np.uint8) if isinstance(blob, (bytes, bytearray, memoryview)) else np.asarray(blob, dtype=np.uint8)
    # NOTE: the reference rejects anything < header + one histogram
    # (block_rANS32x64_16w_decode.cpp:15), which makes its own all-RLE tiny
    # blobs undecodable; we only require the structural minimum.
    if buf.size < 16 + 4 * n + 8:
        return None
    length = int.from_bytes(buf[0:8].tobytes(), "little")
    expected_in = int.from_bytes(buf[8:16].tobytes(), "little")
    if buf.size < expected_in:
        return None
    states = buf[16 : 16 + 4 * n].view("<u4").astype(_U32)
    word_region = buf[16 + 4 * n :]
    nwords = word_region.size // 2
    stream = np.zeros(nwords + 2 * n + 4, dtype=np.uint16)
    stream[:nwords] = word_region[: nwords * 2].view("<u2")

    if length == 0:
        return b""
    out = np.zeros(length, dtype=np.uint8)
    out_len_states = max(length - n + 1, 0)
    inv_perm = INV_IDX2IDX[n]
    i = 0
    r = 0
    hist: Hist | None = None

    while True:
        if r + 4 > nwords:
            return None
        block_size_val = int.from_bytes(stream[r : r + 4].tobytes(), "little")
        r += 4
        if block_size_val & _SINGLE_BIT:
            sym = (block_size_val >> _SYM_SHIFT) & 0xFF
            size = block_size_val & _SIZE_MASK
            if i + size > length:
                return None
            out[i : i + size] = sym
            i += size
        else:
            if r + 256 > nwords:
                return None
            hist = complete_hist(stream[r : r + 256].copy(), bits)
            r += 256
            if hist is None:
                return None
            block_end = i + block_size_val
            if block_end > out_len_states:
                block_end = out_len_states
            elif block_end & (n - 1):
                return None
            num_groups = max(0, -(-(block_end - i) // n))
            syms, states, r = decode_full_groups(states, stream, r, hist, n, num_groups)
            out[i : i + num_groups * n] = syms[:, inv_perm].reshape(-1)
            i += num_groups * n
        if i > out_len_states:
            if i >= length:
                return out.tobytes()
            break
        if i >= out_len_states:
            break

    if i < length:
        if hist is None:
            return None
        tail, states, r = decode_tail_group(states, stream, r, hist, n, i, length)
        k = np.arange(n)
        sel = (i + IDX2IDX[n]) < length
        out[i + IDX2IDX[n][sel]] = tail[k[sel]]
    return out.tobytes()
