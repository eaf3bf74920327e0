"""Pallas TPU decoder for the *reference mt wire format* (mt_rANS32x64 16w).

The reference decodes mt blobs by fanning self-contained blocks out to a
CPU thread pool (/root/reference/src/mt_rANS32x64_16w_decode.cpp:137-265,
18 GiB/s at 32 threads).  Here each block is one ROW of a Pallas kernel:
its 64 interleaved rANS lanes live in vector lanes 0..63, hundreds of
blocks advance per vector op, and the per-block decode tables are per-row
shuffle operands (`tpu.dynamic_gather` dim-1 gathers from row r's own
table — no broadcast, the true per-row form of the primitive).

Differences from the tpx kernel (kernels/tpx_decode.py):
  * tables are PER ROW (every block has its own histogram);
  * renorm consumption order is the reference's lane order inside a
    64-lane half: the prefix matmul uses a lane-masked strict-lower
    triangular matrix, so any fixed consumption order is one MXU matmul;
  * output bytes follow the reference's idx2idx(64) lane permutation
    (/root/reference/src/block_codec64.h:22-28): the permutation is folded
    into constant-index pack shuffles, so the kernel's packed u32 output
    is already the block's wire byte order.

Scope: uniformly sized coded blocks (our device mt encoder's uniform_plan
produces them; they remain decodable by the reference binary).  Single-
symbol blocks, the final (tail-carrying) block, and non-uniform blobs are
decoded by the host oracle; `mt64_decode_tpu` returns None for layouts the
kernel cannot take so callers can fall back entirely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.histogram import complete_hist
from ..ops.mt import block_index
from ..ops.tpx import make_rank_tables
from ..rans import DECODE_CONSUME_POINT_16, INV_IDX2IDX
from .tpx_encode import gather256

N = 64  # rANS lanes per block (x64 family)
L = 128  # vector lanes per row


def _inv_idx2idx64(p):
    """Closed form of INV_IDX2IDX[64] for in-kernel iota arithmetic.

    idx2idx32[j] = (j&3) + 16*((j>>2)&1) + 4*(j>>3)  (rANS32x32_16w.cpp:51),
    64-lane = two 32-lane halves (block_codec64.h:22-28); inverting the bit
    shuffle gives inv32[p] = (p&3) + 4*((p>>4)&1) + 8*((p&15)>>2).
    """
    half = (p >> 5) << 5
    q = p & 31
    return (q & 3) + 4 * ((q >> 4) & 1) + 8 * ((q & 15) >> 2) + half


def _mt64_kernel(
    c0_ref,  # VMEM [G, 128] i32: per-row rank-bucket coarse ranks
    bm_ref,  # VMEM [G, 128] i32: per-row boundary bitmasks
    tp_lo_ref,  # VMEM [G, 128] i32: rank 0..127 -> sym|(freq-1)<<8|cumul<<20
    tp_hi_ref,  # VMEM [G, 128] i32: rank 128..255
    stream_ref,  # VMEM [G, W] i32: per-row word stream (2 u16 per slot)
    init_ref,  # VMEM [G, 128] u32: header states (lanes 64.. are dummies)
    out_ref,  # out VMEM [G, 128] i32: 8 steps x 16 u32 of wire bytes
    states_scr,  # VMEM [G, 128] u32
    rw_scr,  # VMEM [G, 128] i32
    *,
    g_rows: int,
    bits: int,
):
    s8 = pl.program_id(1)

    @pl.when(s8 == 0)
    def _():
        states_scr[:] = init_ref[:]
        rw_scr[:] = jnp.zeros((g_rows, L), jnp.int32)

    mask_slot = jnp.uint32((1 << bits) - 1)
    consume_point = jnp.uint32(DECODE_CONSUME_POINT_16)
    w_slots = stream_ref.shape[-1]

    # Per-invocation sliding stream window: 8 steps consume <= 8*64 words
    # = 256 slots per row, so a 3-chunk (384-slot) window starting at the
    # row's current chunk covers the whole invocation.  Building it is
    # per-row chunk SELECTION over static slices (cheap vector selects, no
    # gathers), turning the per-step fetch into a 3-candidate gather
    # instead of w_slots/128 candidates (21 at 16 KiB blocks).
    rw_entry = rw_scr[:, 0:1]
    win_chunk0 = (rw_entry >> 1) >> 7  # [G, 1] chunk-aligned window base
    window = []
    for h in range(3):
        wh = jnp.zeros((g_rows, 128), jnp.int32)
        for c in range(w_slots // 128):
            wh = jnp.where(win_chunk0 + h == c, stream_ref[:, c * 128 : (c + 1) * 128], wh)
        window.append(wh)

    c0 = c0_ref[:]
    bm = pltpu.bitcast(bm_ref[:], jnp.uint32)
    tp_lo, tp_hi = tp_lo_ref[:], tp_hi_ref[:]

    lane = jax.lax.broadcasted_iota(jnp.int32, (g_rows, L), 1)
    active = lane < N

    # strict-lower triangular restricted to the active 64 lanes: exclusive
    # prefix of the consume mask in the reference's lane consumption order
    tri_r = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    tri_c = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    tri = ((tri_r < tri_c) & (tri_r < N) & (tri_c < N)).astype(jnp.bfloat16)

    # pack_idx[b][.., l] = rANS lane supplying wire byte 4*(l&15)+b
    pack_idx = [_inv_idx2idx64((4 * (lane & 15) + b) & (N - 1)) for b in range(4)]
    step_of_lane = lane >> 4  # which step's u32s live in this lane group

    def step_fn(i, carry):
        states, rw, packed = carry
        slot = states & mask_slot
        k = pltpu.bitcast(slot, jnp.int32) >> 5
        c0v = jnp.take_along_axis(c0, k, axis=1)
        bmv = jnp.take_along_axis(bm, pltpu.bitcast(k, jnp.uint32), axis=1)
        m = (jnp.uint32(2) << (slot & jnp.uint32(31))) - jnp.uint32(2)
        rank = c0v + pltpu.bitcast(jax.lax.population_count(bmv & m), jnp.int32)
        v1 = pltpu.bitcast(gather256(tp_lo, tp_hi, rank), jnp.uint32)
        sym = pltpu.bitcast(v1 & jnp.uint32(0xFF), jnp.int32)
        freq = ((v1 >> jnp.uint32(8)) & jnp.uint32(0xFFF)) + jnp.uint32(1)
        cum = v1 >> jnp.uint32(20)

        new_states = (states >> jnp.uint32(bits)) * freq + slot - cum
        new_states = jnp.where(active, new_states, states)
        consume = (new_states < consume_point) & active

        cb = consume.astype(jnp.bfloat16)
        prefix = jnp.dot(cb, tri, preferred_element_type=jnp.float32).astype(jnp.int32)
        total = prefix[:, N - 1 : N] + consume[:, N - 1 : N].astype(jnp.int32)

        widx = rw + prefix
        rel = (widx >> 1) - (win_chunk0 << 7)  # slot index within the window
        within = rel & 127
        chunk = rel >> 7  # 0..2 by the window invariant
        w32 = jnp.zeros((g_rows, L), jnp.int32)
        for h in range(3):
            cand = jnp.take_along_axis(window[h], within, axis=1)
            w32 = jnp.where(chunk == h, cand, w32)
        word = (pltpu.bitcast(w32, jnp.uint32) >> pltpu.bitcast((widx & 1) << 4, jnp.uint32)) & jnp.uint32(0xFFFF)
        states = jnp.where(consume, (new_states << jnp.uint32(16)) | word, new_states)
        rw = rw + total

        # pack this step's 64 symbols as 16 wire-order u32s at lane group i
        w_s = jnp.zeros((g_rows, L), jnp.int32)
        for b in range(4):
            w_s = w_s | (jnp.take_along_axis(sym, pack_idx[b], axis=1) << (8 * b))
        packed = jnp.where(step_of_lane == i, w_s, packed)
        return states, rw, packed

    carry = (states_scr[:], rw_scr[:], jnp.zeros((g_rows, L), jnp.int32))
    states, rw, packed = jax.lax.fori_loop(0, 8, step_fn, carry)
    states_scr[:] = states
    rw_scr[:] = rw
    out_ref[:] = packed


@functools.partial(jax.jit, static_argnames=("g_rows", "n_groups", "s8c", "w_slots", "bits", "interpret"))
def _decode_blocks(c0, bm, tp_lo, tp_hi, stream, init, *, g_rows, n_groups, s8c, w_slots, bits, interpret=False):
    kernel = functools.partial(_mt64_kernel, g_rows=g_rows, bits=bits)
    row_spec = pl.BlockSpec((g_rows, 128), lambda g, s8: (g, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_groups, s8c),
        in_specs=[row_spec] * 4
        + [
            pl.BlockSpec((g_rows, w_slots), lambda g, s8: (g, 0), memory_space=pltpu.VMEM),
            row_spec,
        ],
        out_specs=pl.BlockSpec((g_rows, 128), lambda g, s8: (g, s8), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_groups * g_rows, s8c * 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((g_rows, L), jnp.uint32),
            pltpu.VMEM((g_rows, L), jnp.int32),
        ],
        interpret=interpret,
    )(c0, bm, tp_lo, tp_hi, stream, init)


def mt64_decode_tpu(
    blob: bytes | np.ndarray,
    bits: int,
    interpret: bool = False,
    mesh=None,
    axis: str = "dp",
) -> bytes | None:
    """Decode an mt_rANS32x64 16w blob with uniform blocks on the TPU.

    With `mesh`, the block batch is sharded over the mesh axis via
    shard_map (the reference thread-pool fan-out mapped to chips; outputs
    gather in order at the shard_map boundary).  Returns None when the
    blob's layout is outside the kernel's scope (non-uniform coded blocks,
    B > 12, tiny inputs) — callers fall back to ops.mt.mt_decode /
    parallel.sharded paths.
    """
    if bits > 12:
        return None
    idx = block_index(blob, N)
    if idx is None:
        return None
    length, stream, blocks = idx
    if length == 0:
        return b""

    # kernel set: all coded blocks except the last coded one (it may own the
    # trailing partial lane group), all the same size, steps % 8 == 0
    coded = [b for b in blocks if not b.is_single]
    kernel_blocks = coded[:-1] if coded else []
    if kernel_blocks:
        size0 = kernel_blocks[0].size
        if size0 % (N * 8) or any(b.size != size0 for b in kernel_blocks):
            return None
        # exact per-block word counts: a block's words end where the next
        # block's header begins (single-symbol header = 4 words; coded
        # header = 8 + 2N + 256 words before its word_start)
        pos_of = {id(b): j for j, b in enumerate(blocks)}
        w_counts = []
        for b in kernel_blocks:
            j = pos_of[id(b)] + 1
            if j < len(blocks):
                nxt = blocks[j]
                end = nxt.word_start - (4 if nxt.is_single else 8 + 2 * N + 256)
            else:
                end = stream.size
            w_counts.append(end - b.word_start)
        if min(w_counts) < 0:
            return None
        w_slots = max(128, -(-max(w_counts) // 2 // 128) * 128)
        if w_slots > 8192:
            return None  # stream tile would not fit VMEM comfortably

        nb = len(kernel_blocks)
        n_dev = mesh.shape[axis] if mesh is not None else 1
        # keep the double-buffered stream tile inside VMEM (the sliding
        # window keeps per-step cost flat regardless of w_slots)
        g_cap = 256 if w_slots <= 1536 else (128 if w_slots <= 4096 else 64)
        per_dev = -(-nb // n_dev)
        g_rows = g_cap if per_dev >= g_cap else max(8, -(-per_dev // 8) * 8)
        nb_pad = -(-nb // (g_rows * n_dev)) * g_rows * n_dev
        s8c = size0 // N // 8

        c0 = np.zeros((nb_pad, 128), np.int32)
        bm = np.zeros((nb_pad, 128), np.int32)
        tp_lo = np.zeros((nb_pad, 128), np.int32)
        tp_hi = np.zeros((nb_pad, 128), np.int32)
        stream_rows = np.zeros((nb_pad, w_slots), np.uint32)
        init = np.full((nb_pad, L), DECODE_CONSUME_POINT_16, np.uint32)
        n_buckets = (1 << bits) // 32
        for i, b in enumerate(kernel_blocks):
            hist = complete_hist(b.freq, bits)
            if hist is None:
                return None
            rt = make_rank_tables(hist)
            c0[i, :n_buckets] = rt["c0"]
            bm[i, :n_buckets] = rt["bm"]
            tp_lo[i] = rt["tp"][:128]
            tp_hi[i] = rt["tp"][128:]
            words = stream[b.word_start : b.word_start + w_counts[i]].astype(np.uint32)
            if words.size & 1:
                words = np.concatenate([words, np.zeros(1, np.uint32)])
            stream_rows[i, : words.size // 2] = words[0::2] | (words[1::2] << np.uint32(16))
            init[i, :N] = b.states

        args = [
            jnp.asarray(c0),
            jnp.asarray(bm),
            jnp.asarray(tp_lo),
            jnp.asarray(tp_hi),
            jnp.asarray(stream_rows.view(np.int32)),
            jnp.asarray(init),
        ]
        kw = dict(g_rows=g_rows, n_groups=nb_pad // g_rows // n_dev, s8c=s8c, w_slots=w_slots, bits=bits, interpret=interpret)
        if mesh is None:
            packed = _decode_blocks(*args, **kw)
        else:
            from jax.sharding import PartitionSpec as P

            fn = jax.shard_map(
                lambda *a: _decode_blocks(*a, **kw),
                mesh=mesh,
                in_specs=(P(axis),) * 6,
                out_specs=P(axis),
                check_vma=False,
            )
            packed = fn(*args)
        block_bytes = np.asarray(packed).view(np.uint8).reshape(nb_pad, size0)

    out = np.zeros(length, dtype=np.uint8)
    ki = 0
    for b in blocks:
        if b.is_single:
            out[b.out_start : b.out_start + b.size] = b.symbol
        elif kernel_blocks and ki < len(kernel_blocks) and b is kernel_blocks[ki]:
            out[b.out_start : b.out_start + b.size] = block_bytes[ki]
            ki += 1
        else:
            part = _decode_block_host(b, stream, bits, length)
            if part is None:
                return None
            out[b.out_start : b.out_start + part.size] = part
    return out.tobytes()


def _decode_block_host(blk, stream, bits: int, length: int) -> np.ndarray | None:
    """Oracle decode of one coded block (incl. the trailing partial group,
    which belongs to the final coded block's lane chain — ops/mt.py)."""
    from ..ops.reference import decode_full_groups, decode_tail_group
    from ..rans import IDX2IDX

    hist = complete_hist(blk.freq, bits)
    if hist is None:
        return None
    out_len_states = max(length - N + 1, 0)
    start = blk.out_start
    block_end = min(start + blk.size, out_len_states)
    num_groups = max(0, -(-(block_end - start) // N))
    syms, states, r = decode_full_groups(blk.states.copy(), stream, blk.word_start, hist, N, num_groups)
    part = syms[:, INV_IDX2IDX[N]].reshape(-1)
    end = start + num_groups * N
    if start + blk.size > end:
        tail, _, _ = decode_tail_group(states, stream, r, hist, N, end, length)
        perm = IDX2IDX[N]
        tail_bytes = np.zeros(length - end, np.uint8)
        sel = (end + perm) < length
        tail_bytes[perm[sel]] = tail[np.arange(N)[sel]]
        part = np.concatenate([part, tail_bytes])
    return part
