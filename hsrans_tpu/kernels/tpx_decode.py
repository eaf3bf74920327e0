"""Pallas TPU decode kernel for the tpx tile-parallel format.

Grid = (tiles, steps/4): each grid step advances 1024 rows x 128 lanes =
131,072 interleaved rANS states by four symbols and writes one packed
[rows, 128] i32 output block (4 bytes/lane).  All lookups use the two
primitives Mosaic lowers fast on v5e (docs/KERNEL_NOTES.md):

  * per-row 128-lane shuffles (`tpu.dynamic_gather` dim-1) for the bucketed
    rank tables (c0/bm), the rank->(sym|freq<<8)/cumul tables (2 chunks),
    and the stream-window fetch (chunk selects + one shuffle);
  * an MXU matmul against a strict upper-triangular ones matrix for the
    per-row exclusive prefix sum of the renorm consume mask (bf16 exact
    for sums <= 128; jnp.cumsum does not lower in Pallas TPU).

The VPU is latency-bound on this serial dependency chain, so the row count
(independent chains packed into each vector op) is what buys throughput —
1024 rows runs the chain at the same wall clock as 128 (KERNEL_NOTES).

States and per-row read positions persist in VMEM scratch across grid steps
(tiles chain within a megablock — the reference block codec's invariant);
the per-tile stream block is DMA'd from HBM into scratch manually once per
tile.  Byte unpack/transpose of the packed output runs in XLA outside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.histogram import complete_hist
from ..ops.tpx import make_rank_tables, tpx_parse

L = 128


def _tile_kernel(
    vlen_ref,  # SMEM (1,1) i32: valid bytes in this megablock
    c0_ref,  # VMEM [1, 8, 128] i32 (row 0 = bucket coarse ranks)
    bm_ref,  # VMEM [1, 8, 128] i32 (row 0 = boundary bitmasks)
    t1a_ref,  # VMEM [1, 8, 128] i32 (rank 0..127: sym | freq<<8)
    t1b_ref,  # VMEM [1, 8, 128] i32 (rank 128..255)
    t2a_ref,  # VMEM [1, 8, 128] i32 (cumul, rank 0..127)
    t2b_ref,  # VMEM [1, 8, 128] i32
    stream_hbm,  # ANY  [T, C, R, 128] i32 (chunk-major per-row streams)
    init_ref,  # VMEM [R, L] u32
    out_ref,  # VMEM [1, R, 128] i32 (4 packed bytes per lane)
    states_scr,  # VMEM [R, L] u32
    rw_scr,  # VMEM [R, L] i32 (per-row word position, broadcast on lanes)
    stream_scr,  # VMEM [C, R, 128] i32
    dma_sem,
    *,
    rows: int,
    steps: int,
    n_tiles: int,
    bits: int,
):
    t = pl.program_id(0)
    s4 = pl.program_id(1)

    @pl.when((t == 0) & (s4 == 0))
    def _():
        states_scr[:] = init_ref[:]

    @pl.when(s4 == 0)
    def _():
        pltpu.make_async_copy(stream_hbm.at[t], stream_scr, dma_sem).start()
        pltpu.make_async_copy(stream_hbm.at[t], stream_scr, dma_sem).wait()
        rw_scr[:] = jnp.zeros((rows, L), jnp.int32)

    mask_slot = jnp.uint32((1 << bits) - 1)
    consume_point = jnp.uint32(1 << 15)
    # B<=12: one 128-bucket rank chunk (row 0).  B>=13: flat one-level rank
    # over 64-slot buckets (the mt hb layout, kernels/mt64_decode.py):
    # c0 row 0 = delta-packed bucket bases (4 per word), bm rows 0..nc-1 /
    # 4..4+nc-1 = mask lo/hi chunks, t1 = freq|cumul<<16 by rank, t2 row 0
    # = symbols packed 4 per word.  Every lookup is one dependency level —
    # the old sequential chunk fori was the 3x B=15 cost.
    nc64 = max(1, (1 << bits) // 64 // 128)

    def bcast(ref, r=0):
        return jnp.broadcast_to(ref[0, r : r + 1, :], (rows, 128)).astype(jnp.int32)

    if bits <= 12:
        c0 = bcast(c0_ref)
        bm = pltpu.bitcast(bcast(bm_ref), jnp.uint32)
    else:
        cp = pltpu.bitcast(bcast(c0_ref), jnp.uint32)
        bm_lo = [pltpu.bitcast(bcast(bm_ref, c), jnp.uint32) for c in range(nc64)]
        bm_hi = [pltpu.bitcast(bcast(bm_ref, 4 + c), jnp.uint32) for c in range(nc64)]
        sp4 = pltpu.bitcast(bcast(t2a_ref), jnp.uint32)
    t1a, t1b = bcast(t1a_ref), bcast(t1b_ref)
    w_chunks = stream_scr.shape[0]

    # strict upper-triangular ones (consume @ tri = exclusive lane prefix)
    tri_r = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    tri_c = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    tri = (tri_r < tri_c).astype(jnp.bfloat16)

    # wire byte position of step-in-group 0 for each (row, lane):
    # pos = (((t*rows + row)*(steps/4) + s4)*L + lane)*4 + i
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, L), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, L), 0)
    base_pos = (((t * rows + row) * (steps // 4) + s4) * L + lane) * 4
    vlen = vlen_ref[0, 0]

    def gather256(lo, hi, rank):
        g_lo = jnp.take_along_axis(lo, jnp.minimum(rank, 127), axis=1)
        g_hi = jnp.take_along_axis(hi, jnp.maximum(rank - 128, 0), axis=1)
        return jnp.where(rank < 128, g_lo, g_hi)

    # per-invocation sliding stream window (docs/KERNEL_NOTES.md): 4 steps
    # consume <= 4*128 words = 256 slots per row, so a 3-chunk window
    # suffices; the chunk-major scratch + dynamic fori bounds scan only the
    # [min, max+3] chunk range the rows currently span (the mt decoder's
    # trick), instead of every chunk of the stream
    rw_entry = rw_scr[:, 0:1]
    win_chunk0 = (rw_entry >> 1) >> 7
    cmin = jnp.min(win_chunk0)
    cmax = jnp.minimum(jnp.max(win_chunk0) + 3, w_chunks)

    def wbody(c, win):
        w0, w1, w2 = win
        rowc = stream_scr[c]
        w0 = jnp.where(win_chunk0 == c, rowc, w0)
        w1 = jnp.where(win_chunk0 + 1 == c, rowc, w1)
        w2 = jnp.where(win_chunk0 + 2 == c, rowc, w2)
        return w0, w1, w2

    zero_win = jnp.zeros((rows, 128), jnp.int32)
    window = jax.lax.fori_loop(cmin, cmax, wbody, (zero_win, zero_win, zero_win))

    def step_fn(i, carry):
        states, rw, packed = carry
        slot = states & mask_slot
        slot_i = pltpu.bitcast(slot, jnp.int32)
        if bits <= 12:
            k = slot_i >> 5
            c0v = jnp.take_along_axis(c0, k, axis=1)
            bmv = jnp.take_along_axis(bm, pltpu.bitcast(k, jnp.uint32), axis=1)
            # bits 1..(slot&31) of the boundary bitmask; 2<<31 wraps to 0
            # making the mask 0xFFFFFFFE, which is exactly bits 1..31
            m = (jnp.uint32(2) << (slot & jnp.uint32(31))) - jnp.uint32(2)
            rank = c0v + pltpu.bitcast(jax.lax.population_count(bmv & m), jnp.int32)
            # packed rank table: sym | (freq-1)<<8 | cumul<<20 (one gather)
            v1 = pltpu.bitcast(gather256(t1a, t1b, rank), jnp.uint32)
            sym = pltpu.bitcast(v1 & jnp.uint32(0xFF), jnp.int32)
            freq = ((v1 >> jnp.uint32(8)) & jnp.uint32(0xFFF)) + jnp.uint32(1)
            cum = v1 >> jnp.uint32(20)
        else:
            k6 = slot_i >> 6
            j = k6 >> 2
            cpv = jnp.take_along_axis(pltpu.bitcast(cp, jnp.int32), j, axis=1)
            cpu_ = pltpu.bitcast(cpv, jnp.uint32)
            sub = k6 & 3
            base = cpu_ & jnp.uint32(0x1FF)
            d = jnp.where(
                sub == 1,
                (cpu_ >> jnp.uint32(9)) & jnp.uint32(0x7F),
                jnp.where(
                    sub == 2,
                    (cpu_ >> jnp.uint32(16)) & jnp.uint32(0xFF),
                    jnp.where(sub == 3, cpu_ >> jnp.uint32(24), jnp.uint32(0)),
                ),
            )
            c0v = pltpu.bitcast(base + d, jnp.int32)
            kw = k6 & 127
            kwu = pltpu.bitcast(kw, jnp.uint32)
            if nc64 == 1:
                lov = jnp.take_along_axis(bm_lo[0], kwu, axis=1)
                hiv = jnp.take_along_axis(bm_hi[0], kwu, axis=1)
            else:
                kc = k6 >> 7
                lov = jnp.zeros((rows, L), jnp.uint32)
                hiv = jnp.zeros((rows, L), jnp.uint32)
                for c in range(nc64):
                    sel = kc == c
                    lov = jnp.where(sel, jnp.take_along_axis(bm_lo[c], kwu, axis=1), lov)
                    hiv = jnp.where(sel, jnp.take_along_axis(bm_hi[c], kwu, axis=1), hiv)
            s6 = slot & jnp.uint32(63)
            in_lo = s6 < jnp.uint32(32)
            mlo = jnp.where(in_lo, (jnp.uint32(2) << s6) - jnp.uint32(2), jnp.uint32(0xFFFFFFFE))
            mhi = jnp.where(in_lo, jnp.uint32(0), (jnp.uint32(2) << (s6 & jnp.uint32(31))) - jnp.uint32(1))
            rank = c0v + pltpu.bitcast(
                jax.lax.population_count(lov & mlo) + jax.lax.population_count(hiv & mhi),
                jnp.int32,
            )
            fcv = pltpu.bitcast(gather256(t1a, t1b, rank), jnp.uint32)
            freq = fcv & jnp.uint32(0xFFFF)
            cum = fcv >> jnp.uint32(16)
            s4v = jnp.take_along_axis(pltpu.bitcast(sp4, jnp.int32), rank >> 2, axis=1)
            sym = pltpu.bitcast(
                (pltpu.bitcast(s4v, jnp.uint32) >> pltpu.bitcast((rank & 3) << 3, jnp.uint32)) & jnp.uint32(0xFF),
                jnp.int32,
            )

        valid = (base_pos + i) < vlen
        new_states = (states >> jnp.uint32(bits)) * freq + slot - cum
        new_states = jnp.where(valid, new_states, states)
        consume = (new_states < consume_point) & valid

        cb = consume.astype(jnp.bfloat16)
        prefix = jnp.dot(cb, tri, preferred_element_type=jnp.float32).astype(jnp.int32)
        total = prefix[:, L - 1 :] + consume[:, L - 1 :].astype(jnp.int32)

        widx = rw + prefix
        rel = (widx >> 1) - (win_chunk0 << 7)  # slot index within the window
        within = rel & 127
        chunk = rel >> 7  # 0..2 by the window invariant
        w32 = jnp.zeros((rows, L), jnp.int32)
        for h in range(3):
            cand = jnp.take_along_axis(window[h], within, axis=1)
            w32 = jnp.where(chunk == h, cand, w32)
        word = (pltpu.bitcast(w32, jnp.uint32) >> pltpu.bitcast((widx & 1) << 4, jnp.uint32)) & jnp.uint32(0xFFFF)
        states = jnp.where(consume, (new_states << jnp.uint32(16)) | word, new_states)
        rw = rw + total
        packed = packed | (sym << (i * 8))
        return states, rw, packed

    carry = (states_scr[:], rw_scr[:], jnp.zeros((rows, L), jnp.int32))
    # flat-rank keeps the step at <= 12 gathers even at B=15; 4x that stays
    # under the Mosaic code-size cliff for nc64 <= 2 (B<=14)
    # B=15 unrolled (48 gathers x 4 steps) hangs the Mosaic compiler
    states, rw, packed = jax.lax.fori_loop(0, 4, step_fn, carry, unroll=bits <= 14)
    states_scr[:] = states
    rw_scr[:] = rw
    out_ref[0] = packed


@functools.partial(
    jax.jit,
    static_argnames=("rows", "n_tiles", "w_slots", "steps", "bits", "interpret"),
)
def _decode_mega(vlen, c0, bm, t1a, t1b, t2a, t2b, stream, init_states, *, rows, n_tiles, w_slots, steps, bits, interpret=False):
    kernel = functools.partial(
        _tile_kernel, rows=rows, steps=steps, n_tiles=n_tiles, bits=bits
    )
    tab_spec = pl.BlockSpec((1, 8, 128), lambda t, s4: (t, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles, steps // 4),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t, s4: (0, 0), memory_space=pltpu.SMEM),
            tab_spec,
            tab_spec,
            tab_spec,
            tab_spec,
            tab_spec,
            tab_spec,
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((rows, L), lambda t, s4: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, 128), lambda t, s4: (t, 0, s4), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, rows, (steps // 4) * 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((rows, L), jnp.uint32),
            pltpu.VMEM((rows, L), jnp.int32),
            pltpu.VMEM((w_slots // 128, rows, 128), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        # wide streams (low B / incompressible tiles) push the stack past
        # the 16 MiB scoped-vmem default; v5e has 128 MiB of VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(vlen, c0, bm, t1a, t1b, t2a, t2b, stream, init_states)
    # The packed [T, R, S/4*128] i32 output IS the megablock's bytes in wire
    # order (little-endian) — no transpose needed by construction.
    return out


def chunk_major(stream_i32: np.ndarray) -> np.ndarray:
    """[..., R, W] i32 row-major stream -> [..., ceil(W/128), R, 128]
    chunk-major (the kernel's window build loads whole chunks by dynamic
    leading index).  Widths are zero-padded to a 128 multiple: wire blobs
    may carry any w_slots the header validation admits."""
    *lead, r, w = stream_i32.shape
    if w % 128:
        pad = np.zeros((*lead, r, 128 - w % 128), stream_i32.dtype)
        stream_i32 = np.concatenate([stream_i32, pad], axis=-1)
        w = stream_i32.shape[-1]
    cm = stream_i32.reshape(*lead, r, w // 128, 128)
    axes = list(range(len(lead))) + [len(lead) + 1, len(lead), len(lead) + 2]
    return np.ascontiguousarray(cm.transpose(*axes))


def mega_dec_tables(freqs: np.ndarray, bits: int) -> tuple[np.ndarray, ...] | None:
    """Per-tile kernel decode tables from wire freqs [n_tiles, 256].

    Returns (c0, bm, ta, tb, tc, td), each [n_tiles, 8, 128] i32.  For
    B<=12, ta/tb hold the packed single-u32 rank table and tc/td are unused
    zeros; for B>=13, (ta,tb)=(t1 lo,hi) and (tc,td)=(t2 lo,hi).
    """
    n_tiles = freqs.shape[0]
    n_buckets = (1 << bits) // 32
    out = [np.zeros((n_tiles, 8, 128), np.int32) for _ in range(6)]
    c0, bm, ta, tb, tc, td = out
    nc64 = max(1, (1 << bits) // 64 // 128)
    for t in range(n_tiles):
        hist = complete_hist(freqs[t], bits)
        if hist is None:
            return None
        rt = make_rank_tables(hist)
        if bits <= 12:
            c0[t].reshape(-1)[:n_buckets] = rt["c0"]
            bm[t].reshape(-1)[:n_buckets] = rt["bm"]
            ta[t, 0] = rt["tp"][:128]
            tb[t, 0] = rt["tp"][128:]
        else:
            # flat one-level rank stack (kernels/mt64_decode._hb_tables):
            # [cp, bm_lo x nc, bm_hi x nc, fc_lo, fc_hi, sp4]
            from .mt64_decode import _hb_tables

            stack = _hb_tables(rt, bits)
            c0[t, 0] = stack[0]
            for c in range(nc64):
                bm[t, c] = stack[1 + c]
                bm[t, 4 + c] = stack[1 + nc64 + c]
            ta[t, 0] = stack[1 + 2 * nc64]
            tb[t, 0] = stack[2 + 2 * nc64]
            tc[t, 0] = stack[3 + 2 * nc64]
    return tuple(out)


def tpx_decode_tpu(blob: bytes | np.ndarray, interpret: bool = False) -> bytes | None:
    """Decode a tpx blob with the Pallas kernel (interpret=True for CPU CI)."""
    parsed = tpx_parse(blob)
    if parsed is None:
        return None
    p, length, megas = parsed
    # rows must be a sublane multiple for the kernel's VMEM blocks — a
    # crafted header must degrade to None (host tier), not a Mosaic error
    if p.lanes != L or any(m.steps % 4 or m.rows % 8 or m.rows < 8 for m in megas):
        return None
    n_buckets = (1 << p.bits) // 32  # <= 1024; packed 128 per sublane row
    if n_buckets > 8 * 128:
        return None
    out = np.zeros(length, dtype=np.uint8)

    for mega in megas:
        n_tiles = mega.n_tiles
        tabs = mega_dec_tables(mega.freqs, p.bits)
        if tabs is None:
            return None

        vlen = np.array([[min(length - mega.base, mega.span)]], np.int32)
        packed = _decode_mega(
            jnp.asarray(vlen),
            *[jnp.asarray(t) for t in tabs],
            jnp.asarray(chunk_major(mega.stream.view(np.int32))),
            jnp.asarray(mega.states),
            rows=mega.rows,
            n_tiles=n_tiles,
            w_slots=mega.w_slots,
            steps=mega.steps,
            bits=p.bits,
            interpret=interpret,
        )
        mega_bytes = np.asarray(packed).reshape(-1).view(np.uint8)
        n_valid = min(length - mega.base, mega_bytes.size)
        out[mega.base : mega.base + n_valid] = mega_bytes[:n_valid]
    return out.tobytes()
