"""Pallas TPU *encode* kernels for the tpx tile-parallel format.

The reference's encoders are scalar-only (README.md:26; e.g. the div/mod hot
loop at /root/reference/src/rANS32x32_16w.cpp:95-128, ~348 MiB/s on a 7950X).
Here the encode runs on the TPU VPU/MXU in two Pallas phases, bit-identical
to the numpy wire authority (`hsrans_tpu.ops.tpx.tpx_encode`):

Phase A (`_encode_kernel`) — the rANS state machine, run in reverse over a
grid of (tile, step-group), 1024 rows x 128 lanes per vector op:

  * symbol-indexed encode tables (freq|cumul<<16, magic, shift) as 256-entry
    per-row shuffles, exactly like the decode kernel's rank tables;
  * `state // freq` via Granlund-Montgomery magic-number multiplication —
    u32 mulhi built from four 16-bit limb products (the VPU has no integer
    divide, and the reference's unused `hist_enc_t` slot, hist.cpp:224-228,
    anticipates exactly this precomputed-reciprocal design);
  * per-step renorm-emission compaction: inclusive lane prefix of the emit
    mask via an MXU triangular matmul, then a branchless 7-step binary
    search (lower_bound over the monotone prefix) to map output slot k to
    the k-th emitting lane — replacing the reference AVX decoders'
    movemask->LUT-shuffle idiom (rANS32x32_16w.cpp:1237-1266) with its
    gather-friendly dual.

Phase B (`_concat_kernel`) — per-row stream concatenation: the per-(tile,
step) compacted word windows are gathered into each row's final contiguous
word stream (word pairs packed into u32 slots).  Placement is resolved by an
exclusive prefix over per-step word counts (f32 MXU matmul, exact to 2^24)
and per-step windowed gathers; this is the encode-side dual of the decode
kernel's chunked stream fetch.

Divisions of labor with the host: per-tile histograms + normalization and
the wire mux stay on the host (numpy / native C++), as in the reference
(hist.cpp); everything per-byte runs on the TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.histogram import Hist
from ..ops.tpx import TpxParams, _mega_layout, _write_mega, _write_mega_segs, make_tile_hist, tpx_header
from ..rans import DECODE_CONSUME_POINT_16

L = 128


def div_magic(freq: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-symbol (magic, shift) with floor(n/d) == (umul64(m,n)>>31)>>l for
    all n < 2^31 (Granlund-Montgomery round-up magic, p = 31 + ceil(log2 d);
    the n<2^31 bound is the rANS32 state invariant, states < EncodeEmitPoint
    * freq <= 2^31).  freq == 0 entries get the d=1 identity."""
    d = np.maximum(freq.astype(np.int64), 1)
    l = np.zeros(256, dtype=np.int64)
    for k in range(16):
        l = np.where(d > (1 << k), k + 1, l)
    m = -(-(np.int64(1) << (31 + l)) // d)  # ceil(2^(31+l) / d)
    assert int(m.max()) < 1 << 32 and int(m.min()) >= 1 << 31
    return m.astype(np.uint32), l.astype(np.uint32)


def make_enc_tables(hist: Hist) -> dict[str, np.ndarray]:
    """Symbol-indexed encode tables (single-histogram convenience)."""
    t = make_enc_tables_batch(
        hist.symbol_count[None], hist.cumul[None], hist.total_symbol_count_bits
    )
    return {k: v[0] for k, v in t.items()}


def make_enc_tables_batch(freqs: np.ndarray, cumuls: np.ndarray, bits: int) -> dict[str, np.ndarray]:
    """Vectorized symbol-indexed encode tables over a block batch [B, 256].

    fc layout by depth: B<=12 packs freq(13) | cumul<<13 (12) | shift<<25
    into one u32 (one gather in the kernels); B>=13 uses
    freq | cumul<<16 plus the separate shift table l.
    """
    d = np.maximum(freqs.astype(np.int64), 1)
    l = np.zeros_like(d)
    for k in range(16):
        l = np.where(d > (1 << k), k + 1, l)
    m = -(-(np.int64(1) << (31 + l)) // d)
    assert int(m.max()) < 1 << 32 and int(m.min()) >= 1 << 31  # q31 invariant
    if bits <= 12:
        # absent symbols (freq 0) can carry cumul == 2^bits, which would
        # overflow the 12-bit field into the shift; they are never gathered
        # by an unmasked lane, so zero their freq/cumul fields entirely
        cum_field = np.where(freqs > 0, cumuls.astype(np.uint32), np.uint32(0))
        frq_field = freqs.astype(np.uint32)
        fc = frq_field | (cum_field << np.uint32(13)) | (l.astype(np.uint32) << np.uint32(25))
    else:
        fc = freqs.astype(np.uint32) | (cumuls.astype(np.uint32) << np.uint32(16))
    return {
        "fc": fc.view(np.int32),
        "m": m.astype(np.uint32).view(np.int32),
        "l": l.astype(np.int32),
    }


def gather256(lo, hi, idx):
    """Per-row 256-entry lookup from two [.., 128] chunk operands."""
    g_lo = jnp.take_along_axis(lo, jnp.minimum(idx, 127), axis=1)
    g_hi = jnp.take_along_axis(hi, jnp.maximum(idx - 128, 0), axis=1)
    return jnp.where(idx < 128, g_lo, g_hi)


def unpack_enc_fields(fcv, l_lo, l_hi, byte, bits):
    """(freq, cumul, shift) from the depth-dependent fc layout.

    Must mirror make_enc_tables_batch: B<=12 packs all three into fcv
    (freq 13b | cumul 12b | shift); B>=13 keeps the separate shift table.
    """
    if bits <= 12:
        freq = fcv & jnp.uint32(0x1FFF)
        cum = (fcv >> jnp.uint32(13)) & jnp.uint32(0xFFF)
        lv = fcv >> jnp.uint32(25)
    else:
        freq = fcv & jnp.uint32(0xFFFF)
        cum = fcv >> jnp.uint32(16)
        lv = pltpu.bitcast(gather256(l_lo, l_hi, byte), jnp.uint32)
    return freq, cum, lv


def _encode_kernel(
    vlen_ref,  # SMEM (1,1) i32: valid bytes in this megablock
    fc_lo_ref,  # VMEM [1, 8, 128] i32 (row 0: freq | cumul<<16, syms 0..127)
    fc_hi_ref,  # VMEM [1, 8, 128] i32 (syms 128..255)
    m_lo_ref,  # VMEM [1, 8, 128] i32 (division magic)
    m_hi_ref,
    l_lo_ref,  # VMEM [1, 8, 128] i32 (division shift)
    l_hi_ref,
    packed_ref,  # VMEM [1, R, 128] i32: input bytes, 4 steps per u32
    win_ref,  # out VMEM [1, 4, R, 128] i32: per-step compacted words
    cntp_ref,  # out VMEM [1, 1, R, 128] i32: 4 step word-counts, 8 bits each
    states_ref,  # out VMEM [R, L] u32: final (= decode-start) states
    states_scr,  # VMEM [R, L] u32
    *,
    rows: int,
    s4c: int,
    n_tiles: int,
    bits: int,
):
    ti = pl.program_id(0)
    s4i = pl.program_id(1)
    t = n_tiles - 1 - ti  # true tile index (encode runs in reverse)
    s4 = s4c - 1 - s4i

    @pl.when((ti == 0) & (s4i == 0))
    def _():
        states_scr[:] = jnp.full((rows, L), DECODE_CONSUME_POINT_16, jnp.uint32)

    def bcast(ref):
        return jnp.broadcast_to(ref[0, 0:1, :], (rows, 128)).astype(jnp.int32)

    fc_lo, fc_hi = bcast(fc_lo_ref), bcast(fc_hi_ref)
    m_lo, m_hi = bcast(m_lo_ref), bcast(m_hi_ref)
    l_lo, l_hi = bcast(l_lo_ref), bcast(l_hi_ref)

    # inclusive lower-triangular ones: (emit @ tri)[l] = sum_{j<=l} emit[j]
    tri_r = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    tri_c = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    tri = (tri_r <= tri_c).astype(jnp.bfloat16)

    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, L), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, L), 0)
    base_pos = (((t * rows + row) * s4c + s4) * L + lane) * 4
    vlen = vlen_ref[0, 0]

    emit_point = jnp.uint32(1 << (31 - bits))  # (2^15 >> bits) << 16
    k_minus = jnp.uint32((1 << bits))
    mask16 = jnp.uint32(0xFFFF)

    packed = packed_ref[0]
    states = states_scr[:]
    cnt_packed = jnp.zeros((rows, L), jnp.int32)

    for i in range(3, -1, -1):  # steps run backward within the group
        byte = (packed >> (8 * i)) & 0xFF
        fcv = pltpu.bitcast(gather256(fc_lo, fc_hi, byte), jnp.uint32)
        mv = pltpu.bitcast(gather256(m_lo, m_hi, byte), jnp.uint32)
        freq, cum, lv = unpack_enc_fields(fcv, l_lo, l_hi, byte, bits)

        valid = (base_pos + i) < vlen
        emit = (states >= emit_point * freq) & valid
        word = pltpu.bitcast(states & mask16, jnp.int32)
        states = jnp.where(emit, states >> jnp.uint32(16), states)

        # q = states // freq via magic multiply (u32 mulhi from 16-bit limbs)
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

        # state' = q*(2^bits - freq) + cumul + state  (== (q<<B)+cum+(state%freq))
        new_states = q * (k_minus - freq) + cum + states
        states = jnp.where(valid, new_states, states)

        # compact this step's emitted words to slots 0..cnt-1 (lane-ascending,
        # the forward-stream order): lower_bound over the inclusive prefix.
        prefix = jnp.dot(emit.astype(jnp.bfloat16), tri, preferred_element_type=jnp.float32).astype(jnp.int32)
        cnt = prefix[:, L - 1 :]
        target = lane + 1
        lo = jnp.zeros((rows, L), jnp.int32)
        for sz in (64, 32, 16, 8, 4, 2, 1):
            mid = lo + sz
            v = jnp.take_along_axis(prefix, mid - 1, axis=1)
            lo = jnp.where(v < target, mid, lo)
        win = jnp.take_along_axis(word, jnp.minimum(lo, 127), axis=1)
        win = jnp.where(lane < cnt, win, 0)
        win_ref[0, i] = win
        cnt_packed = cnt_packed | ((cnt + jnp.zeros((rows, L), jnp.int32)) << (8 * i))

    states_scr[:] = states
    states_ref[:] = states
    cntp_ref[0, 0] = cnt_packed


@functools.partial(jax.jit, static_argnames=("rows", "s4c", "n_tiles", "bits", "interpret"))
def _encode_mega(vlen, fc_lo, fc_hi, m_lo, m_hi, l_lo, l_hi, packed, *, rows, s4c, n_tiles, bits, interpret=False):
    kernel = functools.partial(_encode_kernel, rows=rows, s4c=s4c, n_tiles=n_tiles, bits=bits)
    tab_spec = pl.BlockSpec((1, 8, 128), lambda t, s4: (n_tiles - 1 - t, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles, s4c),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t, s4: (0, 0), memory_space=pltpu.SMEM),
            tab_spec,
            tab_spec,
            tab_spec,
            tab_spec,
            tab_spec,
            tab_spec,
            pl.BlockSpec((1, rows, 128), lambda t, s4: (n_tiles - 1 - t, 0, s4c - 1 - s4), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 4, rows, 128), lambda t, s4: (n_tiles - 1 - t, s4c - 1 - s4, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, 128), lambda t, s4: (n_tiles - 1 - t, s4c - 1 - s4, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, L), lambda t, s4: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 4 * s4c, rows, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, s4c, rows, 128), jnp.int32),
            jax.ShapeDtypeStruct((rows, L), jnp.uint32),
        ],
        scratch_shapes=[pltpu.VMEM((rows, L), jnp.uint32)],
        interpret=interpret,
    )(vlen, fc_lo, fc_hi, m_lo, m_hi, l_lo, l_hi, packed)


def _concat_kernel(
    wq_ref,  # SMEM i32: 128-slot output chunks in use (per tile if per_tile)
    win_ref,  # VMEM [1, S, Rc, 128] i32: per-step compacted words
    cnt_ref,  # VMEM [1, Rc, 128] i32: per-step word counts (lanes 0..S-1)
    out_ref,  # out VMEM [1, Rc, Wcap] i32: packed u32 stream slots
    *,
    rc: int,
    steps: int,
    per_tile: bool = False,
):
    cnt = cnt_ref[0].astype(jnp.float32)
    tri_r = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    tri_c = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    tri_excl = (tri_r < tri_c).astype(jnp.float32)
    base = jnp.dot(cnt, tri_excl, preferred_element_type=jnp.float32).astype(jnp.int32)
    cnt_i = cnt_ref[0]

    lane = jax.lax.broadcasted_iota(jnp.int32, (rc, 128), 1)

    # The step loop is split into groups of <= 16: 64 unrolled gathers in one
    # dynamic-loop body crash the Mosaic compiler, 32 compile fine.  Each
    # group makes its own pass over the output chunks and ORs its words in
    # (disjoint by construction: a word index hits exactly one step).
    def chunk_pass(s_lo, s_hi, first):
        def chunk_body(c, carry):
            w0 = (c * 128 + lane) * 2
            w1 = w0 + 1
            acc0 = jnp.zeros((rc, 128), jnp.int32)
            acc1 = jnp.zeros((rc, 128), jnp.int32)
            for s in range(s_lo, s_hi):
                bs = base[:, s : s + 1]
                cs = cnt_i[:, s : s + 1]
                ws = win_ref[0, s]
                k0 = w0 - bs
                k1 = w1 - bs
                g0 = jnp.take_along_axis(ws, jnp.clip(k0, 0, 127), axis=1)
                g1 = jnp.take_along_axis(ws, jnp.clip(k1, 0, 127), axis=1)
                acc0 = jnp.where((k0 >= 0) & (k0 < cs), g0, acc0)
                acc1 = jnp.where((k1 >= 0) & (k1 < cs), g1, acc1)
            packed = acc0 | (acc1 << 16)
            if not first:
                packed = packed | out_ref[0, :, pl.ds(c * 128, 128)]
            out_ref[0, :, pl.ds(c * 128, 128)] = packed
            return carry

        jax.lax.fori_loop(0, wq_ref[pl.program_id(0) if per_tile else 0, 0], chunk_body, 0)

    for g, s_lo in enumerate(range(0, steps, 16)):
        chunk_pass(s_lo, min(s_lo + 16, steps), first=g == 0)


def divisor_le(n: int, cap: int) -> int:
    """Largest divisor of n that is <= cap and a multiple of 8 (Mosaic
    requires sublane block dims divisible by 8); n itself if none exists."""
    d = min(n, max(8, cap // 8 * 8))
    d -= d % 8
    while d >= 8:
        if n % d == 0:
            return d
        d -= 8
    return n  # no 8-multiple divisor <= cap; full-array block is always legal


@functools.partial(jax.jit, static_argnames=("rows", "rc", "steps", "wcap", "n_tiles", "interpret"))
def _concat_mega(wq, win, cnt, *, rows, rc, steps, wcap, n_tiles, interpret=False):
    # the grid floor-divides: a non-divisor rc would silently skip the
    # trailing rows and emit structurally valid but corrupt streams
    assert rows % rc == 0, f"concat rc={rc} must divide rows={rows}"
    # wq may be per tile ([n_tiles, 1]) or shared ([1, 1]): the concat cost
    # is O(chunks x steps) per tile, so callers that segment the step axis
    # pass each segment's own chunk count
    per_tile = int(wq.shape[0]) == n_tiles and n_tiles > 1
    kernel = functools.partial(_concat_kernel, rc=rc, steps=steps, per_tile=per_tile)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles, rows // rc),
        in_specs=[
            pl.BlockSpec((int(wq.shape[0]), 1), lambda t, r: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, steps, rc, 128), lambda t, r: (t, 0, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rc, 128), lambda t, r: (t, r, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rc, wcap), lambda t, r: (t, r, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, rows, wcap), jnp.int32),
        interpret=interpret,
    )(wq, win, cnt)


@functools.partial(jax.jit, static_argnames=("s4c",))
def _unpack_counts(cntp, *, s4c):
    """[T, s4c, R, 128] packed counts -> [T, R, 128] (step s in lane s)."""
    c = cntp[:, :, :, 0]  # [T, s4c, R]
    steps = jnp.stack([(c >> (8 * i)) & 0xFF for i in range(4)], axis=2)  # [T, s4c, 4, R]
    n_tiles, _, _, rows = steps.shape
    cnt = steps.reshape(n_tiles, s4c * 4, rows).transpose(0, 2, 1)
    pad = jnp.zeros((n_tiles, rows, 128 - s4c * 4), jnp.int32)
    return jnp.concatenate([cnt, pad], axis=2)


@functools.partial(jax.jit, static_argnames=("bits",))
def _device_tile_tables(counts, nbytes, *, bits):
    """Fused on-device normalize -> encode tables for one tile's counts.

    Runs models/jax_hist (bit-exact with the host normalizer) so the whole
    per-tile model path stays on the chip; returns (freq u16[256],
    fc/m/l table rows as [8,128]-shaped chunks ready for _encode_mega).
    """
    from ..models.jax_hist import normalize_device

    freq, cumul = normalize_device(counts, nbytes, bits=bits)
    f = freq.astype(jnp.int32)
    d = jnp.maximum(f, 1).astype(jnp.uint32)
    l = jnp.zeros(256, jnp.int32)
    for k in range(16):
        l = jnp.where(f > (1 << k), k + 1, l)
    # m = ceil(2^(31+l) / d) without 64-bit ints (JAX x64 is off): the
    # doubling recurrence  2^k = d*m - r, 0 <= r < d  ->
    # m' = 2m - [2r >= d], r' = 2r mod d, run to k = 31+l per symbol.
    m = jnp.ones(256, jnp.uint32)  # ceil(2^0/d), d >= 1
    r = d - jnp.uint32(1)
    kk = jnp.arange(1, 48)
    target = (31 + l).astype(jnp.int32)
    for k in range(1, 48):
        active = k <= target
        r2 = r + r
        borrow = r2 >= d
        m2 = m + m - borrow.astype(jnp.uint32)
        r2 = jnp.where(borrow, r2 - d, r2)
        m = jnp.where(active, m2, m)
        r = jnp.where(active, r2, r)
    del kk
    if bits <= 12:
        cum_field = jnp.where(f > 0, cumul.astype(jnp.uint32), jnp.uint32(0))
        fc = f.astype(jnp.uint32) | (cum_field << jnp.uint32(13)) | (l.astype(jnp.uint32) << jnp.uint32(25))
    else:
        fc = f.astype(jnp.uint32) | (cumul.astype(jnp.uint32) << jnp.uint32(16))

    def chunks(tab):
        t = tab.astype(jnp.uint32).astype(jnp.int32) if tab.dtype != jnp.int32 else tab
        z = jnp.zeros((8, 128), jnp.int32)
        lo = z.at[0].set(t[:128])
        hi = z.at[0].set(t[128:])
        return lo, hi

    fc_i = jax.lax.bitcast_convert_type(fc, jnp.int32)
    m_i = jax.lax.bitcast_convert_type(m.astype(jnp.uint32), jnp.int32)
    return freq, chunks(fc_i), chunks(m_i), chunks(l.astype(jnp.int32))


def tpx_encode_tpu(
    data: bytes | np.ndarray,
    bits: int = 12,
    p: TpxParams | None = None,
    interpret: bool = False,
    device_tables: bool = False,
    goal: str = "balanced",
) -> bytes:
    """Encode to the tpx format on the TPU; bit-identical to tpx_encode.

    With `device_tables=True` the per-tile histograms, the exact
    normalization to 2^B, and the encode tables are computed on the chip
    (models/jax_hist) instead of the host — the fully fused pipeline; the
    wire bytes are identical either way (the device normalizer is
    bit-exact with the host one)."""
    arr = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else np.asarray(data, dtype=np.uint8)
    length = arr.size
    p = p or TpxParams.auto(length, bits, goal)
    bits = p.bits
    if p.lanes != L or p.steps % 4 or p.rows % 8:
        raise ValueError("kernel encode requires lanes=128, steps%4==0, rows%8==0")

    out = tpx_header(length, p)
    for mega_base, n_tiles, valid_bytes in _mega_layout(length, p):
        _device_mega_into(
            out, arr, mega_base, n_tiles, valid_bytes, bits=bits,
            rows=p.rows, steps=p.steps, interpret=interpret,
            device_tables=device_tables,
        )
    out[16:24] = len(out).to_bytes(8, "little")
    return bytes(out)


def _device_mega_into(
    out: bytearray,
    arr: np.ndarray,
    mega_base: int,
    n_tiles: int,
    valid_bytes: int,
    *,
    bits: int,
    rows: int,
    steps: int,
    interpret: bool = False,
    device_tables: bool = False,
) -> None:
    """Device-encode one megablock at the given geometry and append its wire
    section — the per-mega unit both the uniform (v2) and adaptive (v3)
    device encoders share; bytes match _encode_mega_into exactly."""
    s4c = steps // 4
    # rc=128 keeps the concat kernel's double-buffered win/out blocks inside
    # VMEM (rc=256 oversubscribes and the remote compile helper dies); it
    # must also divide rows or the concat grid drops the trailing rows.
    rc = divisor_le(rows, 128)
    row_span = n_tiles * steps * L
    n_valid = min(valid_bytes, rows * row_span)
    flat = np.zeros(rows * row_span, dtype=np.uint8)
    flat[:n_valid] = arr[mega_base : mega_base + n_valid]
    packed = flat.view("<i4").reshape(n_tiles, rows, s4c * L)

    # per-tile histograms: tile t's bytes are the contiguous wire range
    # [t*rows*steps*L, ...); absent trailing tiles get the 1-symbol hist.
    tile_bytes = rows * steps * L
    if device_tables:
        from ..models.jax_hist import observe_device

        tile_freqs = []
        per_tile = []
        for t in range(n_tiles):
            tb = flat[t * tile_bytes : min((t + 1) * tile_bytes, n_valid)]
            if tb.size:
                counts = observe_device(jnp.asarray(tb))
                nbytes = jnp.int32(tb.size)
            else:
                counts = jnp.zeros(256, jnp.uint32).at[0].set(1)
                nbytes = jnp.int32(1)
            per_tile.append(_device_tile_tables(counts, nbytes, bits=bits))
        tile_freqs = [np.asarray(x[0]) for x in per_tile]
        fc_lo = jnp.stack([x[1][0] for x in per_tile])
        fc_hi = jnp.stack([x[1][1] for x in per_tile])
        m_lo = jnp.stack([x[2][0] for x in per_tile])
        m_hi = jnp.stack([x[2][1] for x in per_tile])
        if bits <= 12:
            l_lo = l_hi = jnp.zeros((n_tiles, 8, 128), jnp.int32)
        else:
            l_lo = jnp.stack([x[3][0] for x in per_tile])
            l_hi = jnp.stack([x[3][1] for x in per_tile])
    else:
        hists = [
            make_tile_hist(flat[t * tile_bytes : min((t + 1) * tile_bytes, n_valid)], bits)
            for t in range(n_tiles)
        ]
        tile_freqs = [h.symbol_count for h in hists]

        def pack_tab(key):
            lo = np.zeros((n_tiles, 8, 128), np.int32)
            hi = np.zeros((n_tiles, 8, 128), np.int32)
            for t in range(n_tiles):
                tab = make_enc_tables(hists[t])[key]
                lo[t, 0, :] = tab[:128]
                hi[t, 0, :] = tab[128:]
            return jnp.asarray(lo), jnp.asarray(hi)

        fc_lo, fc_hi = pack_tab("fc")
        m_lo, m_hi = pack_tab("m")
        if bits <= 12:  # shift lives inside fc; don't build/ship dead tables
            l_lo = l_hi = jnp.zeros((n_tiles, 8, 128), jnp.int32)
        else:
            l_lo, l_hi = pack_tab("l")
    vlen = jnp.asarray(np.array([[n_valid]], np.int32))

    win, cntp, states = _encode_mega(
        vlen, fc_lo, fc_hi, m_lo, m_hi, l_lo, l_hi, jnp.asarray(packed),
        rows=rows, s4c=s4c, n_tiles=n_tiles, bits=bits, interpret=interpret,
    )
    cnt = _unpack_counts(cntp, s4c=s4c)

    counts_steps = np.asarray(cnt[:, :, : steps], np.int64)  # [T, R, S]
    counts = counts_steps.sum(axis=2)  # words per (t, row)
    max_words = int(counts.max()) if counts.size else 0
    w_slots = max(128, -(-(-(-max_words // 2)) // 128) * 128)

    # Segment the concat along the step axis (cost is O(output chunks x
    # steps scanned) per tile — phase B was 73% of encode time); the
    # mega writer joins the ragged per-segment pieces at byte level.
    c16 = divisor_le(steps, 16)  # largest divisor <= 16, so segs*c16 == steps exactly
    segs = steps // c16
    seg_words = counts_steps.reshape(n_tiles, rows, segs, c16).sum(axis=3)  # [T, R, S]
    wq_t = np.maximum(1, -(-(-(-seg_words.max(axis=1).reshape(-1)) // 2) // 128))
    cnt_seg = jnp.pad(
        jnp.transpose(
            cnt[:, :, : steps].reshape(n_tiles, rows, segs, c16), (0, 2, 1, 3)
        ).reshape(n_tiles * segs, rows, c16),
        ((0, 0), (0, 0), (0, 128 - c16)),
    )
    stream_full = _concat_mega(
        jnp.asarray(wq_t[:, None].astype(np.int32)),
        win.reshape(n_tiles * segs, c16, rows, 128),
        cnt_seg,
        rows=rows, rc=rc, steps=c16, wcap=c16 * L // 2,
        n_tiles=n_tiles * segs, interpret=interpret,
    )
    _write_mega_segs(
        out, n_tiles, w_slots, np.asarray(states), tile_freqs,
        counts.astype(np.uint16),
        np.asarray(stream_full).reshape(n_tiles, segs, rows, -1),
        seg_words,
    )


def tpx_encode_adaptive_tpu(
    data: bytes | np.ndarray,
    bits: int = 12,
    interpret: bool = False,
    device_tables: bool = False,
) -> bytes:
    """Device encode to the v3 adaptive wire (per-megablock geometry from
    `tpx_plan_geometry`); bit-identical to ops.tpx.tpx_encode_adaptive."""
    from ..ops.tpx import MAGIC3, tpx_plan_geometry

    arr = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else np.asarray(data, dtype=np.uint8)
    length = arr.size
    geoms = tpx_plan_geometry(arr, bits)

    out = bytearray()
    out += MAGIC3
    out += length.to_bytes(8, "little")
    out += b"\0" * 8
    g0 = geoms[0]
    for v in (bits, g0.rows, L, g0.steps, g0.n_tiles):
        out += int(v).to_bytes(4, "little")
    for g in geoms:
        out += int(g.rows).to_bytes(4, "little")
        out += int(g.steps).to_bytes(4, "little")
        _device_mega_into(
            out, arr, g.base, g.n_tiles, max(0, min(length - g.base, g.span)),
            bits=bits, rows=g.rows, steps=g.steps, interpret=interpret,
            device_tables=device_tables,
        )
    out[16:24] = len(out).to_bytes(8, "little")
    return bytes(out)
