"""Pallas TPU *encoder* producing the reference mt wire format (x64 16w).

The reference encodes mt blocks with scalar loops at ~348 MiB/s
(/root/reference/src/mt_rANS32x64_16w_encode.cpp; encoders are scalar-only,
README.md:26).  Here each uniformly sized block is one kernel ROW encoded
from fresh states — the device-mt convention established in
parallel/sharded.py: every mt block's decoder starts from the header
snapshot, so fresh-state blocks are a valid wire blob, decodable by the
unmodified C++ reference (interop-tested), merely byte-different from the
sequential LIFO oracle.

Structure mirrors kernels/tpx_encode.py (magic-multiply division, MXU
prefix + binary-search emission compaction, concat phase) with the mt
twists of kernels/mt64_decode.py:

  * per-block encode tables as per-row shuffle operands;
  * the idx2idx(64) input permutation folded into the byte unpack: lane j
    encodes wire byte idx2idx[j], whose byte-within-u32 is simply j&3 and
    whose u32 lane has a closed iota form;
  * phase A writes windows in [steps, blocks, 128] layout so phase B is
    literally the tpx concat kernel with n_tiles=1 — no transpose.

The final (remainder-carrying) block is encoded by the host oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.histogram import complete_hist
from ..ops.planner import BlockPlan
from ..ops.reference import encode_groups
from ..ops.tpx import make_tile_hist
from ..rans import DECODE_CONSUME_POINT_16
from .tpx_encode import _concat_mega, gather256, make_enc_tables_batch, unpack_enc_fields

N = 64
L = 128


def _idx2idx64_div4(j):
    """(idx2idx64[j] >> 2) as iota arithmetic; idx2idx64[j] & 3 == j & 3."""
    return 4 * ((j >> 2) & 1) + ((j >> 3) & 3) + 8 * ((j >> 5) & 1)


def _mt64_enc_kernel(
    fc_lo_ref,  # VMEM [G, 128] i32 per-row: freq | cumul<<16 (syms 0..127)
    fc_hi_ref,
    m_lo_ref,  # VMEM [G, 128] i32 per-row: division magic
    m_hi_ref,
    l_lo_ref,  # VMEM [G, 128] i32 per-row: division shift
    l_hi_ref,
    init_ref,  # VMEM [G, 128] u32: entry states (2^15 for the last segment;
    #            a later segment's output when blocks span several calls)
    packed_ref,  # VMEM [G, 128] i32: 8 steps x 64 wire bytes of each block
    win_ref,  # out VMEM [8, G, 128] i32: per-step compacted words
    cnta_ref,  # out VMEM [1, G, 128] i32: counts of steps 0..3, 8b each
    cntb_ref,  # out VMEM [1, G, 128] i32: counts of steps 4..7
    states_ref,  # out VMEM [G, 128] u32: final (= header) states
    states_scr,  # VMEM [G, 128] u32
    *,
    g_rows: int,
    bits: int,
):
    s8i = pl.program_id(1)

    @pl.when(s8i == 0)
    def _():
        states_scr[:] = init_ref[:]

    fc_lo, fc_hi = fc_lo_ref[:], fc_hi_ref[:]
    m_lo, m_hi = m_lo_ref[:], m_hi_ref[:]
    l_lo, l_hi = l_lo_ref[:], l_hi_ref[:]

    lane = jax.lax.broadcasted_iota(jnp.int32, (g_rows, L), 1)
    active = lane < N
    # inclusive lower-triangular over the 64 active lanes only
    tri_r = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    tri_c = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    tri = ((tri_r <= tri_c) & (tri_r < N) & (tri_c < N)).astype(jnp.bfloat16)

    emit_point = jnp.uint32(1 << (31 - bits))
    k_total = jnp.uint32(1 << bits)
    mask16 = jnp.uint32(0xFFFF)

    packed = packed_ref[:]
    src_base = _idx2idx64_div4(lane & (N - 1))  # u32 lane of lane j's byte
    byte_shift = pltpu.bitcast((lane & 3) << 3, jnp.uint32)

    states = states_scr[:]
    cnt_a = jnp.zeros((g_rows, L), jnp.int32)
    cnt_b = jnp.zeros((g_rows, L), jnp.int32)

    for i in range(7, -1, -1):  # steps run backward within the group
        word32 = jnp.take_along_axis(packed, i * 16 + src_base, axis=1)
        byte = pltpu.bitcast((pltpu.bitcast(word32, jnp.uint32) >> byte_shift) & jnp.uint32(0xFF), jnp.int32)

        fcv = pltpu.bitcast(gather256(fc_lo, fc_hi, byte), jnp.uint32)
        mv = pltpu.bitcast(gather256(m_lo, m_hi, byte), jnp.uint32)
        freq, cum, lv = unpack_enc_fields(fcv, l_lo, l_hi, byte, bits)

        emit = (states >= emit_point * freq) & active
        word = pltpu.bitcast(states & mask16, jnp.int32)
        states = jnp.where(emit, states >> jnp.uint32(16), states)

        a0, a1 = mv & mask16, mv >> jnp.uint32(16)
        b0, b1 = states & mask16, states >> jnp.uint32(16)
        ll = a0 * b0
        lh = a0 * b1
        hl = a1 * b0
        hh = a1 * b1
        tt = (ll >> jnp.uint32(16)) + (hl & mask16) + (lh & mask16)
        hi = hh + (hl >> jnp.uint32(16)) + (lh >> jnp.uint32(16)) + (tt >> jnp.uint32(16))
        q31 = (hi << jnp.uint32(1)) | ((tt >> jnp.uint32(15)) & jnp.uint32(1))
        q = q31 >> lv
        new_states = q * (k_total - freq) + cum + states
        states = jnp.where(active, new_states, states)

        prefix = jnp.dot(emit.astype(jnp.bfloat16), tri, preferred_element_type=jnp.float32).astype(jnp.int32)
        cnt = prefix[:, N - 1 : N]
        target = lane + 1
        lo = jnp.zeros((g_rows, L), jnp.int32)
        for sz in (32, 16, 8, 4, 2, 1):
            mid = lo + sz
            v = jnp.take_along_axis(prefix, jnp.minimum(mid - 1, N - 1), axis=1)
            lo = jnp.where(v < target, mid, lo)
        win = jnp.take_along_axis(word, jnp.minimum(lo, N - 1), axis=1)
        win = jnp.where(lane < cnt, win, 0)
        win_ref[i] = win
        cnt_bcast = cnt + jnp.zeros((g_rows, L), jnp.int32)
        if i < 4:
            cnt_a = cnt_a | (cnt_bcast << (8 * i))
        else:
            cnt_b = cnt_b | (cnt_bcast << (8 * (i - 4)))

    states_scr[:] = states
    states_ref[:] = states
    cnta_ref[0] = cnt_a
    cntb_ref[0] = cnt_b


@functools.partial(jax.jit, static_argnames=("g_rows", "n_groups", "s8c", "bits", "interpret"))
def _encode_blocks(fc_lo, fc_hi, m_lo, m_hi, l_lo, l_hi, init, packed, *, g_rows, n_groups, s8c, bits, interpret=False):
    kernel = functools.partial(_mt64_enc_kernel, g_rows=g_rows, bits=bits)
    row_spec = pl.BlockSpec((g_rows, 128), lambda g, s8: (g, 0), memory_space=pltpu.VMEM)
    nb = n_groups * g_rows
    return pl.pallas_call(
        kernel,
        grid=(n_groups, s8c),
        in_specs=[row_spec] * 7
        + [pl.BlockSpec((g_rows, 128), lambda g, s8: (g, s8c - 1 - s8), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((8, g_rows, 128), lambda g, s8: (s8c - 1 - s8, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g_rows, 128), lambda g, s8: (s8c - 1 - s8, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g_rows, 128), lambda g, s8: (s8c - 1 - s8, g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g_rows, 128), lambda g, s8: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s8c * 8, nb, 128), jnp.int32),
            jax.ShapeDtypeStruct((s8c, nb, 128), jnp.int32),
            jax.ShapeDtypeStruct((s8c, nb, 128), jnp.int32),
            jax.ShapeDtypeStruct((nb, 128), jnp.uint32),
        ],
        scratch_shapes=[pltpu.VMEM((g_rows, L), jnp.uint32)],
        interpret=interpret,
    )(fc_lo, fc_hi, m_lo, m_hi, l_lo, l_hi, init, packed)


def _encode_size_bucket(
    arr: np.ndarray,
    starts: list[int],
    freqs: np.ndarray,
    block_size: int,
    bits: int,
    interpret: bool,
) -> list[bytes]:
    """Device-encode equal-size blocks at `starts`; returns wire parts
    (header + words) per block, in `starts` order.  Blocks above 8 KiB run
    as chained <=128-step kernel segments (kernel shapes stay fixed; rANS
    is LIFO so the LAST segment runs first from fresh states and hands its
    exit states to the previous one; the header snapshot is seg 0's output).
    """
    nb = len(starts)
    steps = block_size // N
    g_rows = min(256, max(8, -(-nb // 8) * 8))
    nb_pad = -(-nb // g_rows) * g_rows

    cumuls = np.zeros((nb, 256), np.uint16)
    cumuls[:, 1:] = np.cumsum(freqs[:, :-1].astype(np.uint64), axis=1).astype(np.uint16)
    et = make_enc_tables_batch(freqs, cumuls, bits)
    fc_lo = np.zeros((nb_pad, 128), np.int32)
    fc_hi = np.zeros((nb_pad, 128), np.int32)
    m_lo = np.full((nb_pad, 128), np.int32(-(1 << 31)))  # d=1 magic for pads
    m_hi = np.full((nb_pad, 128), np.int32(-(1 << 31)))
    l_lo = np.zeros((nb_pad, 128), np.int32)
    l_hi = np.zeros((nb_pad, 128), np.int32)
    fc_lo[:nb], fc_hi[:nb] = et["fc"][:, :128], et["fc"][:, 128:]
    m_lo[:nb], m_hi[:nb] = et["m"][:, :128], et["m"][:, 128:]
    if bits > 12:  # for B<=12 the shift lives inside fc
        l_lo[:nb], l_hi[:nb] = et["l"][:, :128], et["l"][:, 128:]

    seg_steps = min(steps, 128)
    n_segs = steps // seg_steps
    seg_s8c = seg_steps // 8
    seg_bytes = seg_steps * N

    view32 = np.zeros((nb_pad, n_segs, seg_bytes // 4), np.int32)
    for k, s in enumerate(starts):
        view32[k] = arr[s : s + block_size].view("<i4").reshape(n_segs, seg_bytes // 4)

    init = jnp.full((nb_pad, 128), DECODE_CONSUME_POINT_16, jnp.uint32)
    seg_streams: list[np.ndarray] = [None] * n_segs
    seg_counts: list[np.ndarray] = [None] * n_segs
    wcap = -(-(seg_steps * N // 2) // 128) * 128
    # VMEM cap, rounded down to a divisor of g_rows (g_rows | nb_pad, so
    # rc | nb_pad): the concat grid floor-divides and a non-divisor rc
    # would drop the trailing rows' streams entirely
    from .tpx_encode import divisor_le

    rc = divisor_le(g_rows, max(8, (4 << 20) // (seg_steps * 128 * 4)))
    states = init
    for seg in range(n_segs - 1, -1, -1):
        win, cnta, cntb, states = _encode_blocks(
            *[jnp.asarray(x) for x in (fc_lo, fc_hi, m_lo, m_hi, l_lo, l_hi)],
            states,
            jnp.asarray(view32[:, seg]),
            g_rows=g_rows,
            n_groups=nb_pad // g_rows,
            s8c=seg_s8c,
            bits=bits,
            interpret=interpret,
        )
        cnt_steps = _unpack_counts_mt(cnta, cntb)  # [nb_pad, 128]
        counts_2d = np.asarray(cnt_steps[:, :seg_steps])  # [nb_pad, steps]
        # Segment the concat along the step axis: its cost is
        # O(output chunks x steps scanned) per tile, so 16-step segments
        # with per-segment chunk counts cost ~4x less than one pass over
        # the whole block; the host mux joins the ragged segments.
        c16 = divisor_le(seg_steps, 16)  # largest divisor <= 16, so segs*c16 == steps exactly
        segs = seg_steps // c16
        cnt_seg = jnp.pad(
            jnp.transpose(cnt_steps[:, : seg_steps].reshape(nb_pad, segs, c16), (1, 0, 2)),
            ((0, 0), (0, 0), (0, 128 - c16)),
        )
        seg_words = counts_2d.reshape(nb_pad, segs, c16).sum(axis=2)  # [nb, segs]
        wq_t = np.maximum(1, -(-(-(-seg_words.max(axis=0)) // 2) // 128))  # chunks/segment
        wcap16 = c16 * N // 2
        stream_full = _concat_mega(
            jnp.asarray(wq_t[:, None].astype(np.int32)),
            win.reshape(segs, c16, nb_pad, 128),
            cnt_seg,
            rows=nb_pad,
            rc=rc,
            steps=c16,
            wcap=wcap16,
            n_tiles=segs,
            interpret=interpret,
        )
        seg_streams[seg] = np.asarray(stream_full)  # [segs, nb_pad, wcap16]
        seg_counts[seg] = seg_words
    states_np = np.asarray(states)

    parts = []
    for k in range(nb):
        words = b"".join(
            seg_streams[seg][t, k].view("<u4").tobytes()[: 2 * int(seg_counts[seg][k, t])]
            for seg in range(n_segs)
            for t in range(seg_counts[seg].shape[1])
        )
        w_count = len(words) // 2
        offset = 2 * N + 256 + w_count - 1  # never the last block
        parts.append(
            block_size.to_bytes(8, "little")
            + offset.to_bytes(8, "little")
            + states_np[k, :N].astype("<u4").tobytes()
            + freqs[k].astype("<u2").tobytes()
            + words
        )
    return parts


def _kernel_block_ok(size: int) -> bool:
    """Kernel-eligible block size: 512-multiple, 8192-multiple above 8 KiB
    (equal chained segments); the greedy planner's 2^16-multiples qualify."""
    return size % (N * 8) == 0 and (size <= 8192 or size % 8192 == 0)


def mt64_encode_tpu(
    data: bytes | np.ndarray,
    bits: int,
    block_size: int = 4096,
    interpret: bool = False,
    plan: list[BlockPlan] | None = None,
) -> bytes:
    """Encode to the mt_rANS32x64 16w wire format on the TPU.

    Without `plan`: uniform `block_size` blocks (512-multiple; 8192-multiple
    above 8 KiB).  With `plan` (e.g. the reference greedy planner's rows,
    ops/planner.py): variable block sizes run as per-size kernel buckets,
    single-symbol rows become RLE indicators, and rows the kernel cannot
    take (unaligned sizes) are host-encoded.  All blocks start from fresh
    states — valid per the wire format since every mt block embeds its own
    state snapshot (mt_rANS32x64_16w_encode.cpp:266-298) — so the blob
    decodes in ops.mt.mt_decode, the mt64 Pallas decoder, and the
    unmodified C++ reference, merely byte-different from the sequential
    LIFO oracle.  The final block (trailing partial lane group) is always
    encoded by the host oracle.
    """
    arr = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else np.asarray(data, dtype=np.uint8)
    length = arr.size

    if plan is None:
        if not _kernel_block_ok(block_size):
            raise ValueError("block_size must be a multiple of 512 (of 8192 above 8 KiB)")
        starts = list(range(0, length, block_size)) or [0]
        if len(starts) > 1 and length - starts[-1] < N:
            starts.pop()
        plan = [
            BlockPlan(s, (starts[i + 1] if i + 1 < len(starts) else length) - s, False, 0, None)
            for i, s in enumerate(starts)
        ]
        # uniform fast path for histograms (native C++ threads when built)
        nk = len(plan) - 1
        if nk > 0:
            from ..runtime import native

            nb_hists = native.hist_blocks(arr[: nk * block_size], block_size, bits, nk)
            if nb_hists is not None:
                for k in range(nk):
                    plan[k].freq = nb_hists[0][k]

    parts: list[bytes] = [b""] * len(plan)
    buckets: dict[int, list[int]] = {}
    for k, row in enumerate(plan):
        if row.is_single:
            parts[k] = (row.size | (1 << 63) | (row.symbol << 54)).to_bytes(8, "little")
        elif k < len(plan) - 1 and _kernel_block_ok(row.size):
            buckets.setdefault(row.size, []).append(k)

    for size0, ks in sorted(buckets.items()):
        freqs = np.stack(
            [
                plan[k].freq
                if plan[k].freq is not None
                else make_tile_hist(arr[plan[k].start : plan[k].start + size0], bits).symbol_count
                for k in ks
            ]
        ).astype(np.uint16)
        bucket_parts = _encode_size_bucket(
            arr, [plan[k].start for k in ks], freqs, size0, bits, interpret
        )
        for k, part in zip(ks, bucket_parts):
            parts[k] = part

    # host-oracle blocks: the final one (owns the trailing partial lane
    # group, different offset accounting) and any kernel-ineligible sizes
    from ..ops.mt import _lane_groups

    for k, row in enumerate(plan):
        if parts[k] or row.size == 0:
            continue
        is_last = k == len(plan) - 1
        end = row.start + row.size
        freq = row.freq if row.freq is not None else make_tile_hist(arr[row.start : min(end, length)], bits).symbol_count
        hist = complete_hist(freq, bits)
        groups, valid = _lane_groups(arr, row.start, end, length, N)
        st = np.full(N, DECODE_CONSUME_POINT_16, dtype=np.uint32)
        words, emits, st = encode_groups(st, groups, valid, hist)
        w = words[emits]
        offset = 2 * N + 256 + w.size - (2 if is_last else 1)
        parts[k] = (
            int(row.size).to_bytes(8, "little")
            + int(offset).to_bytes(8, "little")
            + st.astype("<u4").tobytes()
            + np.asarray(freq, dtype=np.uint16).astype("<u2").tobytes()
            + w.astype("<u2").tobytes()
        )

    out = bytearray()
    out += int(length).to_bytes(8, "little")
    out += b"\0" * 8
    for p in parts:
        out += p
    out[8:16] = len(out).to_bytes(8, "little")
    return bytes(out)


@jax.jit
def _unpack_counts_mt(cnta, cntb):
    """[s8c, NB, 128] packed x2 -> [NB, 128] with step s's count in lane s."""
    s8c, nb, _ = cnta.shape
    a = cnta[:, :, 0]  # [s8c, NB]
    b = cntb[:, :, 0]
    steps = jnp.stack(
        [(a >> (8 * i)) & 0xFF for i in range(4)] + [(b >> (8 * i)) & 0xFF for i in range(4)],
        axis=1,
    )  # [s8c, 8, NB]
    cnt = steps.reshape(s8c * 8, nb).T  # [NB, steps]
    pad = jnp.zeros((nb, 128 - s8c * 8), jnp.int32)
    return jnp.concatenate([cnt.astype(jnp.int32), pad], axis=1)
