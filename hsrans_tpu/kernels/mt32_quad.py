"""Quad-packed Pallas decoder for mt_rANS32x32 16w blocks (n=32).

A 32-lane block leaves 3/4 of a 128-lane row idle in the generic bucket
kernel (kernels/mt64_decode.py `_mt64_kernel` masks lanes >= n).  Here
FOUR n=32 blocks share one row — quarters at lanes [0,32) [32,64) [64,96)
[96,128) — so every vector op advances four blocks: the TPU analog of the
reference's thread-pool fan-out for the x32 family
(/root/reference/src/mt_rANS32x32_16w_decode.cpp, same task-queue design
as the x64 decoder but 32 interleaved rANS states per block).

Layout notes (mirrors the 64-lane pair kernel, kernels/mt64_decode.py):
  * per-quarter 32-slot interleaved stream chunks; each quarter keeps its
    own read cursor and a 3-sub-chunk sliding window (one invocation is
    4 steps x 32 words = 64 words <= 2 sub-chunks per quarter);
  * the renorm prefix sum is ONE int8 MXU matmul against a block-diagonal
    strict-lower triangular operand (4 x 32-lane blocks);
  * rank tables pack by alphabet size: <=32 present symbols -> all four
    quarters in ONE shuffle operand (1 gather/step), <=64 -> two, <=128
    -> four, else 256-entry two-operand gathers per quarter;
  * c0/bm bucket tables merge the same way by depth: B10 (32 buckets) ->
    one operand for all quarters, B11 -> two, B12 -> four;
  * output follows idx2idx(32) (rANS32x32_16w.cpp:51): wire u32 w of a
    step sources lanes 32q + 4*((w>>2)&1) + 8*(w&3) + b, folded into
    constant-index pack shuffles at finalize.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.histogram import complete_hist
from ..ops.tpx import make_rank_tables
from ..rans import DECODE_CONSUME_POINT_16
from .mt64_decode import _PAIR_TILE_BYTES, _PREFIX_TOT, L
from .tpx_encode import gather256

import os as _os


def _mt32_quad_kernel(
    c0t0_ref, c0t1_ref, c0t2_ref, c0t3_ref,  # VMEM [G,128] i32 coarse ranks
    bmt0_ref, bmt1_ref, bmt2_ref, bmt3_ref,  # VMEM [G,128] i32 boundary bitmasks
    tpt0_ref, tpt1_ref, tpt2_ref, tpt3_ref,  # VMEM [G,128] i32 packed rank tables
    tph0_ref, tph1_ref, tph2_ref, tph3_ref,  # ranks 128..255 (rank_mode 256 only)
    tri_ref,  # VMEM [128,128(+128 fused-totals cols)] i8 block-diagonal strict-lower
    stream_ref,  # VMEM [C,G,128] i32: per-quarter 32-slot interleaved chunks
    init_ref,  # VMEM [G,128] u32: quarter q's 32 states at lanes 32q..
    rw_in_ref,  # VMEM [G,128] i32 per-quarter word cursors on entry
    out_ref,  # out VMEM [G,128] i32: 4 steps x 4 quarters x 8 u32
    states_out_ref,
    rw_out_ref,
    states_scr,
    rw_scr,
    *,
    g_rows: int,
    bits: int,
    rank_mode: int,
    s4c_slice: int,
):
    s4 = pl.program_id(1)

    @pl.when(s4 == 0)
    def _():
        states_scr[:] = init_ref[:]
        rw_scr[:] = rw_in_ref[:]

    mask_slot = jnp.uint32((1 << bits) - 1)
    consume_point = jnp.uint32(DECODE_CONSUME_POINT_16)
    w_chunks = stream_ref.shape[0]

    lane = jax.lax.broadcasted_iota(jnp.int32, (g_rows, L), 1)
    quarter = lane >> 5
    q32 = quarter << 5

    # per-quarter 3-sub-chunk window (32-slot granularity): one invocation
    # consumes <= 64 words = 32 slots per quarter, base-aligned to 32 slots
    # -> max rel = 31 + 64 < 96
    qc = [(rw_scr[:, 32 * q : 32 * q + 1] >> 1) >> 5 for q in range(4)]
    quarter_c0 = jnp.zeros((g_rows, L), jnp.int32)
    for q in range(4):
        quarter_c0 = jnp.where(quarter == q, qc[q], quarter_c0)
    cmin = jnp.minimum(jnp.minimum(jnp.min(qc[0]), jnp.min(qc[1])), jnp.minimum(jnp.min(qc[2]), jnp.min(qc[3])))
    cmax = jnp.minimum(
        jnp.maximum(jnp.maximum(jnp.max(qc[0]), jnp.max(qc[1])), jnp.maximum(jnp.max(qc[2]), jnp.max(qc[3]))) + 3,
        w_chunks,
    )

    def wbody(c, win):
        w0, w1, w2 = win
        rowc = stream_ref[c]
        w0 = jnp.where(quarter_c0 == c, rowc, w0)
        w1 = jnp.where(quarter_c0 + 1 == c, rowc, w1)
        w2 = jnp.where(quarter_c0 + 2 == c, rowc, w2)
        return w0, w1, w2

    zero = jnp.zeros((g_rows, L), jnp.int32)
    window = jax.lax.fori_loop(cmin, cmax, wbody, (zero, zero, zero))

    c0t = [c0t0_ref[:], c0t1_ref[:], c0t2_ref[:], c0t3_ref[:]]
    bmt = [pltpu.bitcast(r[:], jnp.uint32) for r in (bmt0_ref, bmt1_ref, bmt2_ref, bmt3_ref)]
    tpt = [tpt0_ref[:], tpt1_ref[:], tpt2_ref[:], tpt3_ref[:]]
    if rank_mode > 128:
        tph = [tph0_ref[:], tph1_ref[:], tph2_ref[:], tph3_ref[:]]

    tri_s8 = tri_ref[:]

    # wire u32 w of step i lives at out lane 32i + 8q + w; its 4 bytes
    # source CONSECUTIVE lanes 32q + l0(w) + b (idx2idx32 inversion)
    w_of = lane & 7
    l0_quad = (((lane >> 3) & 3) << 5) + 4 * ((w_of >> 2) & 1) + 8 * (w_of & 3)

    def sel4(parts):
        v = parts[0]
        for q in range(1, 4):
            v = jnp.where(quarter == q, parts[q], v)
        return v

    def step_fn(i, carry):
        states, rw, acc = carry
        slot = states & mask_slot
        k = pltpu.bitcast(slot, jnp.int32) >> 5
        if bits == 10:
            kk = k | q32
            c0v = jnp.take_along_axis(c0t[0], kk, axis=1)
            bmv = jnp.take_along_axis(bmt[0], pltpu.bitcast(kk, jnp.uint32), axis=1)
        elif bits == 11:
            kk = k | ((quarter & 1) << 6)
            kku = pltpu.bitcast(kk, jnp.uint32)
            c0v = jnp.where(
                quarter >= 2,
                jnp.take_along_axis(c0t[1], kk, axis=1),
                jnp.take_along_axis(c0t[0], kk, axis=1),
            )
            bmv = jnp.where(
                quarter >= 2,
                jnp.take_along_axis(bmt[1], kku, axis=1),
                jnp.take_along_axis(bmt[0], kku, axis=1),
            )
        else:
            ku = pltpu.bitcast(k, jnp.uint32)
            c0v = sel4([jnp.take_along_axis(t, k, axis=1) for t in c0t])
            bmv = sel4([jnp.take_along_axis(t, ku, axis=1) for t in bmt])
        m = (jnp.uint32(2) << (slot & jnp.uint32(31))) - jnp.uint32(2)
        rank = c0v + pltpu.bitcast(jax.lax.population_count(bmv & m), jnp.int32)
        if rank_mode <= 32:
            v1 = pltpu.bitcast(jnp.take_along_axis(tpt[0], rank | q32, axis=1), jnp.uint32)
        elif rank_mode <= 64:
            rr = rank | ((quarter & 1) << 6)
            v1 = pltpu.bitcast(
                jnp.where(
                    quarter >= 2,
                    jnp.take_along_axis(tpt[1], rr, axis=1),
                    jnp.take_along_axis(tpt[0], rr, axis=1),
                ),
                jnp.uint32,
            )
        elif rank_mode <= 128:
            v1 = pltpu.bitcast(sel4([jnp.take_along_axis(t, rank, axis=1) for t in tpt]), jnp.uint32)
        else:
            v1 = pltpu.bitcast(sel4([gather256(tpt[q], tph[q], rank) for q in range(4)]), jnp.uint32)
        sym = pltpu.bitcast(v1 & jnp.uint32(0xFF), jnp.int32)
        freq = ((v1 >> jnp.uint32(8)) & jnp.uint32(0xFFF)) + jnp.uint32(1)
        cum = v1 >> jnp.uint32(20)

        states = (states >> jnp.uint32(bits)) * freq + slot - cum
        consume = states < consume_point

        pt = jnp.dot(consume.astype(jnp.int8), tri_s8, preferred_element_type=jnp.int32)
        if _PREFIX_TOT:
            # fused totals columns (see _mt64_pair_kernel): the 128 extra
            # same-quarter all-ones columns replace the 4-slice/4-where
            # per-quarter total broadcast below
            prefix = pt[:, :128]
            tot = pt[:, 128:]
        else:
            prefix = pt
            tot = jnp.zeros((g_rows, L), jnp.int32)
            for q in range(4):
                e = 32 * q + 31
                tot = jnp.where(quarter == q, prefix[:, e : e + 1] + consume[:, e : e + 1].astype(jnp.int32), tot)

        widx = rw + prefix
        rel = (widx >> 1) - (quarter_c0 << 5)
        hsel = rel >> 5
        within = q32 | (rel & 31)
        w32 = jnp.zeros((g_rows, L), jnp.int32)
        for h in range(3):
            cand = jnp.take_along_axis(window[h], within, axis=1)
            w32 = jnp.where(hsel == h, cand, w32)
        word = (pltpu.bitcast(w32, jnp.uint32) >> pltpu.bitcast((widx & 1) << 4, jnp.uint32)) & jnp.uint32(0xFFFF)
        states = jnp.where(consume, (states << jnp.uint32(16)) | word, states)
        rw = rw + tot

        acc = acc | (sym << (i * 8))
        return states, rw, acc

    carry = (states_scr[:], rw_scr[:], jnp.zeros((g_rows, L), jnp.int32))
    states, rw, acc = jax.lax.fori_loop(0, 4, step_fn, carry)
    states_scr[:] = states
    rw_scr[:] = rw

    @pl.when(s4 == s4c_slice - 1)
    def _():
        states_out_ref[:] = states
        rw_out_ref[:] = rw

    # finalize: out lane o = step (o>>5), quarter ((o>>3)&3), word (o&7)
    shift_i = (lane >> 5) * 8
    b0 = (jnp.take_along_axis(acc, l0_quad, axis=1) >> shift_i) & 0xFF
    b1 = (jnp.take_along_axis(acc, l0_quad + 1, axis=1) >> shift_i) & 0xFF
    b2 = (jnp.take_along_axis(acc, l0_quad + 2, axis=1) >> shift_i) & 0xFF
    b3 = (jnp.take_along_axis(acc, l0_quad + 3, axis=1) >> shift_i) & 0xFF
    out_ref[:] = b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)


_TRI_QUAD = None


def _tri_quad_operand():
    global _TRI_QUAD
    if _TRI_QUAD is None:
        r = np.arange(L)[:, None]
        c = np.arange(L)[None, :]
        tri = ((r < c) & ((r >> 5) == (c >> 5))).astype(np.int8)
        if _PREFIX_TOT:
            tri = np.concatenate([tri, ((r >> 5) == (c >> 5)).astype(np.int8)], axis=1)
        _TRI_QUAD = tri
    return _TRI_QUAD


def _quads_call(*args, g_rows, n_groups, s4c, w_chunks, bits, rank_mode, interpret):
    """The quad pallas_call over n_groups row groups (the shardable unit)."""
    kernel = functools.partial(
        _mt32_quad_kernel, g_rows=g_rows, bits=bits, rank_mode=rank_mode, s4c_slice=s4c
    )
    row_spec = pl.BlockSpec((g_rows, 128), lambda g, s4: (g, 0), memory_space=pltpu.VMEM)
    npad = n_groups * g_rows
    return pl.pallas_call(
        kernel,
        grid=(n_groups, s4c),
        in_specs=[row_spec] * 16
        + [
            pl.BlockSpec((L, 256 if _PREFIX_TOT else 128), lambda g, s4: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w_chunks, g_rows, 128), lambda g, s4: (0, g, 0), memory_space=pltpu.VMEM),
            row_spec,
            row_spec,
        ],
        out_specs=[
            pl.BlockSpec((g_rows, 128), lambda g, s4: (g, s4), memory_space=pltpu.VMEM),
            row_spec,
            row_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad, s4c * 128), jnp.int32),
            jax.ShapeDtypeStruct((npad, 128), jnp.uint32),
            jax.ShapeDtypeStruct((npad, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((g_rows, L), jnp.uint32),
            pltpu.VMEM((g_rows, L), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def build_quad_arrays(
    kernel_blocks: list,
    w_counts: list[int],
    stream: np.ndarray,
    bits: int,
    n_dev: int = 1,
) -> tuple[list[np.ndarray], dict] | None:
    """Operands for the quad kernel: block 4p+q in lanes 32q..32q+31 of row
    p; 32-slot interleaved quarter-chunks."""
    nbq = len(kernel_blocks) // 4 * 4
    if nbq < 4 or bits > 12:
        return None
    quads = nbq // 4
    size0 = kernel_blocks[0].size
    slots = [-(-w // 2) for w in w_counts[:nbq]]
    w_chunks = max(2, -(-max(slots) // 32))
    g_cap = _PAIR_TILE_BYTES // (w_chunks * 128 * 4)
    default_cap = 256 if w_chunks <= 128 else 128
    g_cap = min(int(_os.environ.get("HSRANS_QUAD_GCAP", str(default_cap))), g_cap // 8 * 8)
    if g_cap < 8:
        return None
    quads_dev = -(-quads // n_dev)
    n_grp = -(-quads_dev // g_cap)
    g_rows = max(8, -(-(-(-quads_dev // n_grp)) // 8) * 8)
    npad = n_dev * n_grp * g_rows

    n_buckets = (1 << bits) // 32
    c0t = [np.zeros((npad, 128), np.int32) for _ in range(4)]
    bmt = [np.zeros((npad, 128), np.int32) for _ in range(4)]
    tpt = [np.zeros((npad, 128), np.int32) for _ in range(4)]
    tph = [np.zeros((npad, 128), np.int32) for _ in range(4)]
    init = np.full((npad, 128), DECODE_CONSUME_POINT_16, np.uint32)
    stream_cm = np.zeros((w_chunks, npad, 128), np.uint32)

    nz = [int(np.count_nonzero(b.freq)) for b in kernel_blocks[:nbq]]
    rank_mode = 32 if max(nz) <= 32 else 64 if max(nz) <= 64 else 128 if max(nz) <= 128 else 256

    for i in range(nbq):
        b = kernel_blocks[i]
        hist = complete_hist(b.freq, bits)
        if hist is None:
            return None
        rt = make_rank_tables(hist)
        p, q = divmod(i, 4)
        # c0/bm merge by depth: B10 all quarters in operand 0 (32-lane
        # strides), B11 quarter pairs in operands 0/1 (64-lane strides),
        # B12 one full operand per quarter
        if bits == 10:
            c0t[0][p, 32 * q : 32 * q + 32] = rt["c0"]
            bmt[0][p, 32 * q : 32 * q + 32] = rt["bm"]
        elif bits == 11:
            c0t[q >> 1][p, 64 * (q & 1) : 64 * (q & 1) + 64] = rt["c0"]
            bmt[q >> 1][p, 64 * (q & 1) : 64 * (q & 1) + 64] = rt["bm"]
        else:
            c0t[q][p, :n_buckets] = rt["c0"]
            bmt[q][p, :n_buckets] = rt["bm"]
        # rank tables merge by alphabet size
        if rank_mode <= 32:
            tpt[0][p, 32 * q : 32 * q + 32] = rt["tp"][:32]
        elif rank_mode <= 64:
            tpt[q >> 1][p, 64 * (q & 1) : 64 * (q & 1) + 64] = rt["tp"][:64]
        else:
            tpt[q][p] = rt["tp"][:128]
            tph[q][p] = rt["tp"][128:]
        words = stream[b.word_start : b.word_start + w_counts[i]].astype(np.uint32)
        if words.size & 1:
            words = np.concatenate([words, np.zeros(1, np.uint32)])
        padded = np.zeros(w_chunks * 32, np.uint32)
        padded[: words.size // 2] = words[0::2] | (words[1::2] << np.uint32(16))
        stream_cm[:, p, 32 * q : 32 * q + 32] = padded.reshape(w_chunks, 32)
        init[p, 32 * q : 32 * q + 32] = b.states

    arrs = c0t + bmt + tpt + tph + [stream_cm.view(np.int32), init]
    kw = dict(
        g_rows=g_rows, n_groups=npad // g_rows // n_dev, s4c=size0 // 128,
        w_chunks=w_chunks, bits=bits, rank_mode=rank_mode,
    )
    return arrs, kw


def decode_bucket_quad(
    kernel_blocks: list,
    w_counts: list[int],
    stream: np.ndarray,
    bits: int,
    interpret: bool,
    mesh=None,
    axis: str | tuple[str, ...] = "dp",
) -> np.ndarray | None:
    """Decode a bucket of n=32 blocks four per row; returns [nbq, size]
    bytes for the quad-packed prefix of the bucket (B=10..12)."""
    from ..parallel.sharded import axis_size

    n_dev = axis_size(mesh, axis)
    built = build_quad_arrays(kernel_blocks, w_counts, stream, bits, n_dev)
    if built is None:
        return None
    arrs, kw = built
    size0 = kernel_blocks[0].size
    npad = arrs[0].shape[0]
    tri = jnp.asarray(_tri_quad_operand())
    jarrs = [jnp.asarray(a) for a in arrs]
    rw0 = jnp.zeros((npad, 128), jnp.int32)
    call_kw = dict(
        g_rows=kw["g_rows"], n_groups=kw["n_groups"], s4c=kw["s4c"],
        w_chunks=kw["w_chunks"], bits=bits, rank_mode=kw["rank_mode"],
        interpret=interpret,
    )
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        fn = jax.shard_map(
            lambda *a: _quads_call(*a, **call_kw)[0],
            mesh=mesh,
            in_specs=(P(axis),) * 16 + (P(None, None), P(None, axis), P(axis), P(axis)),
            out_specs=P(axis),
            check_vma=False,
        )
        out_dev = fn(*jarrs[:16], tri, jarrs[16], jarrs[17], rw0)
    else:
        out_dev = _quads_jit(*jarrs[:16], tri, jarrs[16], jarrs[17], rw0, **call_kw)
    o = np.asarray(out_dev)
    s4c = o.shape[1] // 128
    # [row, invocation, step, quarter, word] -> per-block contiguous bytes
    u32 = o.reshape(npad, s4c, 4, 4, 8)
    out = np.empty((npad * 4, size0), np.uint8)
    for q in range(4):
        out[q::4] = np.ascontiguousarray(u32[:, :, :, q, :]).view(np.uint8).reshape(npad, size0)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("g_rows", "n_groups", "s4c", "w_chunks", "bits", "rank_mode", "interpret"),
)
def _quads_jit(*args, **kw):
    return _quads_call(*args, **kw)[0]
