"""Data-parallel mt-block decode/encode over a device mesh.

The reference's thread-pool fan-out (mt_rANS32x64_16w_decode.cpp:217-224)
maps to two nested levels of TPU parallelism:

  1. *batched* — all self-contained blocks decode in lock-step as a leading
     batch axis of one jitted scan; lanes (64 per block) fill the VPU;
  2. *sharded* — the batch axis is sharded over a `jax.sharding.Mesh` data-
     parallel axis with `shard_map`; per-block tables travel with their
     shard, the compressed word stream is replicated (it is the smallest
     array), and decoded bytes are gathered in order on the host.

`thread_pool_await` corresponds to the gather at the end of the jitted
computation; the `writeHeadOffset` header chain is flattened into a block
index on the host first (ops.mt.block_index) so shards seek in O(1).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.histogram import complete_hist
from ..models.tables import make_dec3
from ..ops.mt import MtBlock, block_index
from ..ops.planner import BlockPlan, plan_blocks
from ..ops.raw_jax import decode_section, encode_section
from ..rans import DECODE_CONSUME_POINT_16, IDX2IDX, INV_IDX2IDX


def axis_size(mesh, axis) -> int:
    """Total devices across one mesh axis name or a tuple of names.

    A tuple (e.g. ("dcn", "ici")) shards the leading block axis over both
    axes, outer name slowest-varying: megablock GROUPS land on "dcn" (the
    multi-host interconnect) and the rows within a group on "ici" — the
    ordered output gather then crosses ici within each host before one
    dcn-level concat, matching SURVEY §2.4's comm-layer design.
    """
    if axis is None or mesh is None:
        return 1
    if isinstance(axis, str):
        return mesh.shape[axis]
    import math

    return math.prod(mesh.shape[a] for a in axis)


@dataclass
class BatchedBlocks:
    """Host-side SoA view of the coded blocks of an mt blob."""

    states: np.ndarray  # u32[B, n]
    read_pos: np.ndarray  # i32[B]
    sizes: np.ndarray  # i64[B] output bytes per block
    out_starts: np.ndarray  # i64[B]
    tab_sym: np.ndarray  # u8 [B, 2^bits]
    tab_freq: np.ndarray  # u16[B, 2^bits]
    tab_cumul: np.ndarray  # u16[B, 2^bits]
    max_steps: int


def gather_blocks(blocks: list[MtBlock], bits: int, n: int) -> BatchedBlocks | None:
    coded = [b for b in blocks if not b.is_single]
    if not coded:
        return None
    B = len(coded)
    t = 1 << bits
    out = BatchedBlocks(
        states=np.stack([b.states for b in coded]).astype(np.uint32),
        read_pos=np.asarray([b.word_start for b in coded], dtype=np.int32),
        sizes=np.asarray([b.size for b in coded], dtype=np.int64),
        out_starts=np.asarray([b.out_start for b in coded], dtype=np.int64),
        tab_sym=np.zeros((B, t), dtype=np.uint8),
        tab_freq=np.zeros((B, t), dtype=np.uint16),
        tab_cumul=np.zeros((B, t), dtype=np.uint16),
        max_steps=int(max(-(-b.size // n) for b in coded)),
    )
    for i, b in enumerate(coded):
        hist = complete_hist(b.freq, bits)
        if hist is None:
            return None
        tabs = make_dec3(hist)
        out.tab_sym[i] = tabs["sym"]
        out.tab_freq[i] = tabs["freq"].astype(np.uint16)
        out.tab_cumul[i] = tabs["cumul"].astype(np.uint16)
    return out


def _pad_batch(bb: BatchedBlocks, multiple: int) -> tuple[BatchedBlocks, int]:
    """Pad the block batch to a multiple (extra blocks decode 0 symbols)."""
    B = bb.states.shape[0]
    pad = (-B) % multiple
    if pad == 0:
        return bb, B
    def padded(a, fill=0):
        shape = (pad,) + a.shape[1:]
        return np.concatenate([a, np.full(shape, fill, dtype=a.dtype)])
    return (
        BatchedBlocks(
            states=padded(bb.states),
            read_pos=padded(bb.read_pos),
            sizes=padded(bb.sizes),
            out_starts=padded(bb.out_starts),
            tab_sym=padded(bb.tab_sym),
            tab_freq=padded(bb.tab_freq, 1),
            tab_cumul=padded(bb.tab_cumul),
            max_steps=bb.max_steps,
        ),
        B,
    )


def mt_decode_device(
    blob: bytes | np.ndarray,
    bits: int,
    n: int,
    mesh: jax.sharding.Mesh | None = None,
    axis: str | tuple[str, ...] = "dp",
) -> bytes | None:
    """Decode an mt blob with all coded blocks batched on device.

    With `mesh`, the block batch is sharded over `axis` via shard_map
    (compressed stream replicated); without, it runs on one device.
    Single-device blobs with uniform blocks take the Pallas fast path
    (kernels/mt64_decode.py, ~7 GiB/s on v5e) before the generic scan.
    """
    if n in (32, 64) and bits <= 15:
        from ..kernels.mt64_decode import mt64_decode_tpu
        from ..runtime.device import detect

        cap = detect()
        if cap.tier != "numpy":
            fast = mt64_decode_tpu(blob, bits, interpret=cap.pallas_interpret, mesh=mesh, axis=axis, n=n)
            if fast is not None:
                return fast

    # out-of-kernel-scope blobs (malformed-but-recoverable layouts): the
    # native pooled host decoder beats the XLA gather scan by ~30x
    from ..runtime import native

    if native.load() is not None:
        host = native.mt_decode(blob, bits, n)
        if host is not None:
            return host

    idx = block_index(blob, n)
    if idx is None:
        return None
    length, stream, blocks = idx
    if length == 0:
        return b""

    bb = gather_blocks(blocks, bits, n)
    out = np.zeros(length, dtype=np.uint8)

    if bb is not None:
        n_dev = axis_size(mesh, axis)
        bbp, B = _pad_batch(bb, n_dev)
        syms = _decode_batched(
            jnp.asarray(bbp.states),
            jnp.asarray(stream),
            jnp.asarray(bbp.read_pos),
            jnp.asarray(bbp.tab_sym),
            jnp.asarray(bbp.tab_freq),
            jnp.asarray(bbp.tab_cumul),
            jnp.asarray(bbp.sizes.astype(np.int32)),
            bits=bits,
            num_steps=bbp.max_steps,
            mesh=mesh,
            axis=axis,
        )
        syms = np.asarray(syms)  # [B_padded, S, n] lane order
        byte_mat = syms[:B][:, :, INV_IDX2IDX[n]].reshape(B, -1)
        for i in range(B):
            size = int(bb.sizes[i])
            start = int(bb.out_starts[i])
            out[start : start + size] = byte_mat[i, :size]

    for b in blocks:
        if b.is_single:
            out[b.out_start : b.out_start + b.size] = b.symbol
    return out.tobytes()


@partial(jax.jit, static_argnames=("bits", "num_steps", "mesh", "axis"))
def _decode_batched(states, stream, read_pos, tab_sym, tab_freq, tab_cumul, sizes, *, bits, num_steps, mesh, axis):
    def local(states, stream, read_pos, tab_sym, tab_freq, tab_cumul, sizes):
        syms, _, _ = decode_section(
            states,
            stream,
            read_pos,
            tab_sym,
            tab_freq,
            tab_cumul,
            sizes,
            bits=bits,
            num_steps=num_steps,
            tail=True,
        )
        return syms

    if mesh is None:
        return local(states, stream, read_pos, tab_sym, tab_freq, tab_cumul, sizes)

    from jax.sharding import PartitionSpec as P

    shard = P(axis)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(shard, P(), shard, shard, shard, shard, shard),
        out_specs=shard,
        check_vma=False,
    )
    return fn(states, stream, read_pos, tab_sym, tab_freq, tab_cumul, sizes)


# ---------------------------------------------------------------------------
# Device-parallel mt encode
#
# The reference encoder snapshots carried states per block; since each mt
# block's decoder reads its own snapshot, blocks may equally be encoded from
# *fresh* states, which makes them independent in both directions — the
# TPU-native choice.  Output is a valid mt wire blob (decodable by the
# reference decoder), byte-different from the sequential oracle.


def uniform_plan(data: np.ndarray, bits: int, n: int, block_size: int = 1 << 16) -> list[BlockPlan]:
    """Fixed-size segmentation: maximal batching, perfect shard balance.

    Valid per the wire format (block sizes are free) and ideal for the
    batched decoder — every block has the same step count.
    """
    length = data.size
    starts = list(range(0, length, block_size))
    # The trailing partial lane group must belong to the last block's chain
    # (the decoder's tail path continues the last block's stream), so the
    # remainder is merged into the final block rather than given its own.
    if len(starts) > 1 and length - starts[-1] < n:
        starts.pop()
    from ..ops.tpx import make_tile_hist  # native C++ fast path when built

    rows = []
    for i, start in enumerate(starts):
        end = starts[i + 1] if i + 1 < len(starts) else length
        freq = make_tile_hist(data[start:end], bits).symbol_count
        rows.append(BlockPlan(start, end - start, False, 0, freq))
    return rows


def device_plan(
    data: np.ndarray, bits: int, n: int = 64, max_block: int = 32 << 10
) -> list[BlockPlan]:
    """Greedy plan with coded blocks capped at `max_block` for the device.

    The reference's greedy planner (ops/planner.py, mirror of
    mt_rANS32x64_16w_encode.cpp:21-133) coalesces homogeneous spans into
    blocks up to 2^25 bytes — ideal for its 32-thread serial decoders, but
    chain-STARVING for the batched kernel, which wants >= 256 independent
    blocks per 64 MiB to stay in the issue-bound regime (measured: the
    x-ray corpus plans into 224 mixed-size blocks that decode at 5.8 GiB/s
    vs 14.4 at uniform 16 KiB).  This keeps the planner's content cuts and
    free RLE single-symbol rows but splits oversized CODED blocks into
    512-aligned pieces.  Consecutive piece PAIRS share one histogram
    computed over their joint span: the pair kernels decode two blocks per
    128-lane row anyway, so hist granularity = pairing granularity gives
    same_tab (the decoder reads only A-side tables, dropping up to 4
    gathers + 3 selects from the issue-bound step) while keeping tables
    nearly as sharp as per-piece ones (measured on x-ray B10: pair-hist
    ratio 0.8014 vs 0.8097 parent-hist vs 0.8023 reference).  Any
    segmentation is wire-format-valid; the blob stays decodable by the
    reference.
    """
    from ..ops.planner import plan_blocks
    from ..ops.tpx import make_tile_hist

    rows = plan_blocks(data, bits, "mt", n)
    out: list[BlockPlan] = []
    for r in rows:
        if r.is_single or r.size <= max_block:
            out.append(r)
            continue
        n_pieces = -(-r.size // max_block)
        base = r.size // n_pieces // 512 * 512
        if base == 0:
            out.append(r)
            continue
        starts = [r.start + i * base for i in range(n_pieces)]
        ends = starts[1:] + [r.start + r.size]
        for p in range(0, n_pieces, 2):
            s0, e_last = starts[p], ends[min(p + 1, n_pieces - 1)]
            freq = make_tile_hist(data[s0:e_last], bits).symbol_count
            for s, e in zip(starts[p : p + 2], ends[p : p + 2]):
                out.append(BlockPlan(s, e - s, False, 0, freq))
    return out


@partial(jax.jit, static_argnames=("bits", "num_steps", "mesh", "axis"))
def _encode_batched(states, group_bytes, valid, freq_tab, cumul_tab, *, bits, num_steps, mesh, axis):
    def local(states, group_bytes, valid, freq_tab, cumul_tab):
        return encode_section(
            states, group_bytes, valid, freq_tab, cumul_tab, bits=bits, num_steps=num_steps
        )

    if mesh is None:
        return local(states, group_bytes, valid, freq_tab, cumul_tab)

    from jax.sharding import PartitionSpec as P

    shard = P(axis)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(shard, shard, shard, shard, shard),
        out_specs=(shard, shard, shard),
        check_vma=False,
    )
    return fn(states, group_bytes, valid, freq_tab, cumul_tab)


def mt_encode_device(
    data: bytes | np.ndarray,
    bits: int,
    n: int,
    mesh: jax.sharding.Mesh | None = None,
    axis: str | tuple[str, ...] = "dp",
    plan: list[BlockPlan] | None = None,
    uniform_block: int | None = None,
) -> bytes:
    """Encode to the mt wire format with blocks batched on device.

    `uniform_block` forces fixed-size segmentation (TPU-optimal); otherwise
    the greedy planner's blocks are used (padded to the widest block).
    """
    arr = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else np.asarray(data, dtype=np.uint8)
    length = arr.size
    if plan is None:
        plan = uniform_plan(arr, bits, n, uniform_block) if uniform_block else plan_blocks(arr, bits, "mt", n)

    coded = [(k, row) for k, row in enumerate(plan) if not row.is_single]
    parts: list[bytes] = [b""] * len(plan)
    for k, row in enumerate(plan):
        if row.is_single:
            parts[k] = (row.size | (1 << 63) | (row.symbol << 54)).to_bytes(8, "little")

    if coded:
        n_dev = axis_size(mesh, axis)
        B = len(coded)
        s_max = max(-(-row.size // n) for _, row in coded)
        pad_b = (-B) % n_dev
        perm = IDX2IDX[n]

        gb = np.zeros((B + pad_b, s_max, n), dtype=np.uint8)
        gv = np.zeros((B + pad_b, s_max, n), dtype=bool)
        ft = np.ones((B + pad_b, 256), dtype=np.uint16)
        ct = np.zeros((B + pad_b, 256), dtype=np.uint16)
        for i, (_, row) in enumerate(coded):
            end = min(row.start + row.size, length)
            total = -(-row.size // n)
            padded = np.zeros(total * n, dtype=np.uint8)
            padded[: end - row.start] = arr[row.start : end]
            pos = np.arange(total, dtype=np.int64)[:, None] * n + perm[None, :]
            gb[i, :total] = padded[pos]
            gv[i, :total] = (row.start + pos) < end
            ft[i] = row.freq
            ct[i, 1:] = np.cumsum(row.freq[:-1].astype(np.uint64)).astype(np.uint16)

        init = np.full((B + pad_b, n), DECODE_CONSUME_POINT_16, dtype=np.uint32)
        words, emits, fin = _encode_batched(
            jnp.asarray(init), jnp.asarray(gb), jnp.asarray(gv), jnp.asarray(ft), jnp.asarray(ct),
            bits=bits, num_steps=s_max, mesh=mesh, axis=axis,
        )
        words = np.asarray(words)
        emits = np.asarray(emits)
        fin = np.asarray(fin)

        for i, (k, row) in enumerate(coded):
            w = words[i][emits[i]]
            offset = 2 * n + 256 + w.size - (2 if k == len(plan) - 1 else 1)
            parts[k] = (
                int(row.size).to_bytes(8, "little")
                + int(offset).to_bytes(8, "little")
                + fin[i].astype("<u4").tobytes()
                + row.freq.astype("<u2").tobytes()
                + w.astype("<u2").tobytes()
            )

    out = bytearray()
    out += int(length).to_bytes(8, "little")
    out += b"\0" * 8
    for p in parts:
        out += p
    out[8:16] = len(out).to_bytes(8, "little")
    return bytes(out)
