"""Pallas TPU decoder for the *reference mt wire format* (mt_rANS32xN 16w,
n in {32, 64} — one grid step covers 512 bytes per block row either way).

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

Scope: any histogram depth B=10..15; coded blocks whose size is a multiple
of 512 bytes (64 lanes x 8 steps) — the greedy planner's blocks are 2^16-
multiples (ops/planner.py MIN_BLOCK_BITS_MT) so reference-planner blobs
qualify.  Blocks of *different* sizes are grouped into per-size buckets;
each bucket is one uniform kernel launch (identical step counts per row,
no masked idle work — the TPU analog of the reference's per-block task
enqueue, mt_rANS32x64_16w_decode.cpp:217-224).  Single-symbol blocks, the
final (tail-carrying) block, and blocks too large for a VMEM-resident
stream tile are decoded by the host oracle; `mt64_decode_tpu` returns None
only for whole-blob layouts the kernel cannot take so callers can fall
back entirely.
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

# per-bucket VMEM budget for the double-buffered stream tile; with the
# 100 MiB vmem_limit the practical gate is Mosaic's stack allocator
import os as _os

def _counterfactual(name: str) -> bool:
    """Gate for the wrong-output timing counterfactuals (bench diagnostics only).

    HSRANS_WINDOW_TIMING_HACK / HSRANS_NO_MATMUL deliberately corrupt decode
    output to isolate a cost term; they refuse to engage unless
    HSRANS_DEV_COUNTERFACTUAL=1 is ALSO set, so a stray env var can't silently
    poison production decodes.
    """
    if _os.environ.get(name) != "1":
        return False
    if _os.environ.get("HSRANS_DEV_COUNTERFACTUAL") != "1":
        raise RuntimeError(
            f"{name}=1 is a WRONG-OUTPUT timing counterfactual; "
            "set HSRANS_DEV_COUNTERFACTUAL=1 as well to confirm, or unset it."
        )
    print(
        f"hsrans_tpu: WARNING: {name}=1 — decode output is deliberately WRONG "
        "(timing counterfactual)",
        file=__import__("sys").stderr,
    )
    return True


_STREAM_TILE_BYTES = int(_os.environ.get("HSRANS_STREAM_TILE_MB", "6")) << 20
_PAIR_TILE_BYTES = int(_os.environ.get("HSRANS_PAIR_TILE_MB", "24")) << 20
# Safe-mode escape hatches (output-identical; only the kernel choice
# changes): a NEW specialization's first device compile can hang Mosaic and
# wedge the remote worker for hours, so an operator can force the simpler
# single-block kernel (HSRANS_NO_PAIR=1) or just skip the n=32 quad packing
# (HSRANS_NO_QUAD=1) until the compile is known-good on the installed stack.
_USE_PAIR_KERNEL = _os.environ.get("HSRANS_NO_PAIR") != "1"
_USE_QUAD_KERNEL = _os.environ.get("HSRANS_NO_QUAD") != "1"
# same-table pairing: device_plan splits one oversized coded block into
# sub-blocks that share ONE histogram (parallel/sharded.py), so pairing
# same-hist blocks lets the kernel read only the A-side tables — each
# merged table drops a gather(+select) from the issue-bound step
_USE_SAMETAB = _os.environ.get("HSRANS_NO_SAMETAB") != "1"
_PREFIX_MXU = True  # triangular-matmul prefix vs log-shift rolls (experiment)
# fold the per-half totals into the prefix matmul as 128 extra all-ones
# columns ([128,256] operand): kills two slice-broadcasts + a where per step
_PREFIX_TOT = _os.environ.get("HSRANS_PREFIX_TOT", "1") == "1"


def _exclusive_prefix_halves(consume, g_rows: int, lane):
    """Exclusive prefix sum of the consume mask within each 64-lane half.

    Log-shift (Hillis-Steele) form: 7 roll+masked-add stages on the VPU.
    Alternative to the MXU triangular matmul — lower fixed latency, no MXU
    round-trip, at the cost of ~7 dependent VPU ops."""
    half_pos = lane & 63
    e = jnp.where(half_pos >= 1, pltpu.roll(consume.astype(jnp.int32), 1, 1), 0)
    s = e
    for d in (1, 2, 4, 8, 16, 32):
        s = s + jnp.where(half_pos >= d, pltpu.roll(s, d, 1), 0)
    return s


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
    c0_ref,  # VMEM [NC, G, 128] i32: per-row rank-bucket coarse ranks
    bm_ref,  # VMEM [NC, G, 128] i32: per-row boundary bitmasks
    ta_ref,  # VMEM [G, 128] i32: B<=12 packed rank 0..127; B>12 t1 lo
    tb_ref,  # VMEM [G, 128] i32: rank 128..255 (packed / t1 hi)
    tc_ref,  # VMEM [G, 128] i32: B>12 t2 (cumul) lo; zeros for B<=12
    td_ref,  # VMEM [G, 128] i32: B>12 t2 hi (2 u16 words per i32 slot)
    stream_ref,  # VMEM [C, G, 128] i32: per-row stream, chunk-major
    init_ref,  # VMEM [G, 128] u32: header states (lanes n.. are dummies)
    out_ref,  # out VMEM [G, 128] i32: 512 wire bytes (8x16 or 16x8 u32)
    states_scr,  # VMEM [G, 128] u32
    rw_scr,  # VMEM [G, 128] i32
    *,
    g_rows: int,
    bits: int,
    n: int = 64,
    small_rank: bool = False,
):
    s8 = pl.program_id(1)

    @pl.when(s8 == 0)
    def _():
        states_scr[:] = init_ref[:]
        rw_scr[:] = jnp.zeros((g_rows, L), jnp.int32)

    mask_slot = jnp.uint32((1 << bits) - 1)
    consume_point = jnp.uint32(DECODE_CONSUME_POINT_16)
    w_chunks = stream_ref.shape[0]  # 128-slot stream chunks per row
    n_chunks = max(1, (1 << bits) // 32 // 128)  # 128-bucket chunks of c0/bm

    # Per-invocation sliding stream window: one invocation covers 512
    # bytes per row (8 steps x 64 lanes, or 16 x 32), consuming at most
    # 512 words = 256 slots, so a 3-chunk (384-slot) window at the
    # row's current chunk covers the whole invocation.  The stream tile is
    # chunk-MAJOR so the build loops only over [min, max] of the group's
    # current chunks (dynamic fori bounds from vector reduces) — early
    # invocations scan ~3 chunks, and even fully divergent rows cost at
    # most the w_chunks scan the row-major layout always paid.
    rw_entry = rw_scr[:, 0:1]
    win_chunk0 = (rw_entry >> 1) >> 7  # [G, 1] chunk-aligned window base
    cmin = jnp.min(win_chunk0)
    cmax = jnp.minimum(jnp.max(win_chunk0) + 3, w_chunks)

    def wbody(c, win):
        w0, w1, w2 = win
        row = stream_ref[c]
        w0 = jnp.where(win_chunk0 == c, row, w0)
        w1 = jnp.where(win_chunk0 + 1 == c, row, w1)
        w2 = jnp.where(win_chunk0 + 2 == c, row, w2)
        return w0, w1, w2

    zero_win = jnp.zeros((g_rows, 128), jnp.int32)
    window = jax.lax.fori_loop(cmin, cmax, wbody, (zero_win, zero_win, zero_win))

    if n_chunks == 1:
        c0 = c0_ref[0]
        bm = pltpu.bitcast(bm_ref[0], jnp.uint32)
    ta, tb = ta_ref[:], tb_ref[:]
    if bits > 12:
        tc, td = tc_ref[:], td_ref[:]

    lane = jax.lax.broadcasted_iota(jnp.int32, (g_rows, L), 1)
    active = lane < n
    u32s = n // 4  # output u32 lanes per step; steps/invocation = 128//u32s

    # strict-lower triangular restricted to the active n lanes: exclusive
    # prefix of the consume mask in the reference's lane consumption order
    tri_r = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    tri_c = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    tri = ((tri_r < tri_c) & (tri_r < n) & (tri_c < n)).astype(jnp.int8)

    # Wire word w sources CONSECUTIVE rANS lanes: inv_idx2idx(4w+b) =
    # L0(w) + b with L0(w) = 4*((w>>2)&1) + 8*(w&3) + 32*(w>>3); the pack
    # transpose runs once per invocation in the finalize below.
    w_idx = lane % u32s
    l0_idx = 4 * ((w_idx >> 2) & 1) + 8 * (w_idx & 3) + 32 * (w_idx >> 3)
    step_of_lane = lane // u32s  # which step's u32s live in this lane group
    n_acc = (128 // u32s) // 4  # one acc register per 4 steps

    def step_fn(i, carry):
        states, rw, *accs = carry
        slot = states & mask_slot
        k = pltpu.bitcast(slot, jnp.int32) >> 5
        if n_chunks == 1:
            c0v = jnp.take_along_axis(c0, k, axis=1)
            bmv = jnp.take_along_axis(bm, pltpu.bitcast(k, jnp.uint32), axis=1)
        else:
            # B>=13: loop over the 128-bucket chunks.  B=13 (2 chunks)
            # unrolls statically; wider depths loop dynamically (unrolling
            # 2*n_chunks gathers per step trips the Mosaic code-size cliff
            # at B=15, docs/KERNEL_NOTES.md)
            kc = k >> 7
            kw = k & 127
            kw_u = pltpu.bitcast(kw, jnp.uint32)

            def bchunk(c, carry):
                c0v, bmv = carry
                sel = kc == c
                c0v = jnp.where(sel, jnp.take_along_axis(c0_ref[c], kw, axis=1), c0v)
                bmv = jnp.where(
                    sel,
                    jnp.take_along_axis(pltpu.bitcast(bm_ref[c], jnp.uint32), kw_u, axis=1),
                    bmv,
                )
                return c0v, bmv

            carry0 = (jnp.zeros((g_rows, L), jnp.int32), jnp.zeros((g_rows, L), jnp.uint32))
            if n_chunks == 2:
                c0v, bmv = bchunk(1, bchunk(0, carry0))
            else:
                c0v, bmv = jax.lax.fori_loop(0, n_chunks, bchunk, carry0)
        m = (jnp.uint32(2) << (slot & jnp.uint32(31))) - jnp.uint32(2)
        rank = c0v + pltpu.bitcast(jax.lax.population_count(bmv & m), jnp.int32)
        if bits <= 12 and small_rank:
            # every block in this bucket has <= 128 present symbols: the
            # packed rank table fits one shuffle operand (saves a gather)
            v1 = pltpu.bitcast(jnp.take_along_axis(ta, rank, axis=1), jnp.uint32)
            sym = pltpu.bitcast(v1 & jnp.uint32(0xFF), jnp.int32)
            freq = ((v1 >> jnp.uint32(8)) & jnp.uint32(0xFFF)) + jnp.uint32(1)
            cum = v1 >> jnp.uint32(20)
        elif bits <= 12:
            # packed rank table: sym | (freq-1)<<8 | cumul<<20 (one gather)
            v1 = pltpu.bitcast(gather256(ta, tb, rank), jnp.uint32)
            sym = pltpu.bitcast(v1 & jnp.uint32(0xFF), jnp.int32)
            freq = ((v1 >> jnp.uint32(8)) & jnp.uint32(0xFFF)) + jnp.uint32(1)
            cum = v1 >> jnp.uint32(20)
        else:
            v1 = gather256(ta, tb, rank)  # sym | freq<<8 (freq <= 2^15)
            sym = v1 & 0xFF
            freq = pltpu.bitcast(v1, jnp.uint32) >> jnp.uint32(8)
            cum = pltpu.bitcast(gather256(tc, td, rank), jnp.uint32)

        new_states = (states >> jnp.uint32(bits)) * freq + slot - cum
        new_states = jnp.where(active, new_states, states)
        consume = (new_states < consume_point) & active

        prefix = jnp.dot(consume.astype(jnp.int8), tri, preferred_element_type=jnp.int32)
        total = prefix[:, n - 1 : n] + consume[:, n - 1 : n].astype(jnp.int32)

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

        # vertical pack: byte (i&3) of acc_(i>>2)[l] = step i's symbol at
        # lane l.  Pure elementwise on the hot loop (no lane-crossing
        # rolls); the wire-order transpose happens once in the finalize.
        v = sym << ((i & 3) * 8)
        accs = [jnp.where((i >> 2) == q, a | v, a) for q, a in enumerate(accs)]
        return (states, rw, *accs)

    zero = jnp.zeros((g_rows, L), jnp.int32)
    carry = (states_scr[:], rw_scr[:]) + (zero,) * n_acc
    states, rw, *accs = jax.lax.fori_loop(0, 128 // u32s, step_fn, carry)
    states_scr[:] = states
    rw_scr[:] = rw
    # finalize: wire u32 lane w = step step_of_lane(w)'s bytes at source
    # lanes l0..l0+3 (select the step's acc AFTER each gather: the source
    # lane's own step differs from the out lane's)
    shift_i = (step_of_lane & 3) * 8
    acc_q = step_of_lane >> 2
    out = zero
    for k in range(4):
        g = jnp.take_along_axis(accs[0], l0_idx + k, axis=1)
        for q in range(1, n_acc):
            g = jnp.where(acc_q == q, jnp.take_along_axis(accs[q], l0_idx + k, axis=1), g)
        out = out | (((g >> shift_i) & 0xFF) << (k * 8))
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("g_rows", "n_groups", "s8c", "w_slots", "bits", "n", "small_rank", "interpret"))
def _decode_blocks(c0, bm, ta, tb, tc, td, stream, init, *, g_rows, n_groups, s8c, w_slots, bits, n=64, small_rank=False, interpret=False):
    kernel = functools.partial(_mt64_kernel, g_rows=g_rows, bits=bits, n=n, small_rank=small_rank)
    row_spec = pl.BlockSpec((g_rows, 128), lambda g, s8: (g, 0), memory_space=pltpu.VMEM)
    n_chunks = max(1, (1 << bits) // 32 // 128)
    chunk_spec = pl.BlockSpec((n_chunks, g_rows, 128), lambda g, s8: (0, g, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_groups, s8c),
        in_specs=[chunk_spec, chunk_spec]
        + [row_spec] * 4
        + [
            pl.BlockSpec((w_slots // 128, g_rows, 128), lambda g, s8: (0, g, 0), memory_space=pltpu.VMEM),
            row_spec,
        ],
        out_specs=pl.BlockSpec((g_rows, 128), lambda g, s8: (g, s8), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_groups * g_rows, s8c * 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((g_rows, L), jnp.uint32),
            pltpu.VMEM((g_rows, L), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(c0, bm, ta, tb, tc, td, stream, init)


def _bucket_geometry(w_slots: int, nb: int, n_dev: int) -> int | None:
    """Rows per kernel group: VMEM stream-tile budget, multiples of 8.
    Measured: maximizing rows-per-group beats minimizing pad rows (per-
    invocation costs — window build, table loads — amortize over rows)."""
    g_cap = _STREAM_TILE_BYTES // (w_slots * 4)
    g_cap = min(256, g_cap // 8 * 8)
    if g_cap < 8:
        return None  # block too large for a VMEM-resident stream row
    per_dev = -(-nb // n_dev)
    return g_cap if per_dev >= g_cap else max(8, -(-per_dev // 8) * 8)


def build_bucket_arrays(
    kernel_blocks: list,
    w_counts: list[int],
    stream: np.ndarray,
    bits: int,
    n_dev: int = 1,
    n: int = N,
) -> tuple[list[np.ndarray], dict] | None:
    """Host-side kernel operands for one uniform-size bucket of blocks."""
    size0 = kernel_blocks[0].size
    nb = len(kernel_blocks)
    w_slots = max(128, -(-max(w_counts) // 2 // 128) * 128)
    g_rows = _bucket_geometry(w_slots, nb, n_dev)
    if g_rows is None:
        return None
    nb_pad = -(-nb // (g_rows * n_dev)) * g_rows * n_dev
    s8c = size0 // 512  # one grid step decodes 512 bytes/row at any n

    n_buckets = (1 << bits) // 32
    n_chunks = max(1, n_buckets // 128)
    c0 = np.zeros((n_chunks, nb_pad, 128), np.int32)
    bm = np.zeros((n_chunks, nb_pad, 128), np.int32)
    ta = np.zeros((nb_pad, 128), np.int32)
    tb = np.zeros((nb_pad, 128), np.int32)
    tc = np.zeros((nb_pad, 128), np.int32)
    td = np.zeros((nb_pad, 128), np.int32)
    stream_rows = np.zeros((nb_pad, w_slots), np.uint32)
    init = np.full((nb_pad, L), DECODE_CONSUME_POINT_16, np.uint32)
    small_rank = bits <= 12 and all(
        int(np.count_nonzero(b.freq)) <= 128 for b in kernel_blocks
    )
    for i, b in enumerate(kernel_blocks):
        hist = complete_hist(b.freq, bits)
        if hist is None:
            return None
        rt = make_rank_tables(hist)
        for c in range(n_chunks):
            seg = slice(c * 128, min((c + 1) * 128, n_buckets))
            c0[c, i, : seg.stop - seg.start] = rt["c0"][seg]
            bm[c, i, : seg.stop - seg.start] = rt["bm"][seg]
        key = "tp" if bits <= 12 else "t1"
        ta[i] = rt[key][:128]
        tb[i] = rt[key][128:]
        if bits > 12:
            tc[i] = rt["t2"][:128]
            td[i] = rt["t2"][128:]
        words = stream[b.word_start : b.word_start + w_counts[i]].astype(np.uint32)
        if words.size & 1:
            words = np.concatenate([words, np.zeros(1, np.uint32)])
        stream_rows[i, : words.size // 2] = words[0::2] | (words[1::2] << np.uint32(16))
        init[i, :n] = b.states

    # chunk-major stream layout: the kernel's window build loads whole
    # 128-slot chunks by dynamic leading index (stream_ref[c] -> [G, 128])
    stream_cm = np.ascontiguousarray(
        stream_rows.view(np.int32).reshape(nb_pad, w_slots // 128, 128).transpose(1, 0, 2)
    )
    arrs = [c0, bm, ta, tb, tc, td, stream_cm, init]
    kw = dict(
        g_rows=g_rows, n_groups=nb_pad // g_rows // n_dev, s8c=s8c,
        w_slots=w_slots, bits=bits, n=n, small_rank=small_rank,
    )
    return arrs, kw


def decode_bucket(
    kernel_blocks: list,
    w_counts: list[int],
    stream: np.ndarray,
    bits: int,
    interpret: bool,
    mesh,
    axis: str,
    n: int = N,
) -> np.ndarray | None:
    """Decode one uniform-size bucket of coded blocks; [nb_pad, size] bytes."""
    from ..parallel.sharded import axis_size

    n_dev = axis_size(mesh, axis)
    built = build_bucket_arrays(kernel_blocks, w_counts, stream, bits, n_dev, n)
    if built is None:
        return None
    arrs, kw = built
    size0 = kernel_blocks[0].size
    args = [jnp.asarray(a) for a in arrs]
    kw = dict(kw, interpret=interpret)
    if mesh is None:
        packed = _decode_blocks(*args, **kw)
    else:
        from jax.sharding import PartitionSpec as P

        fn = jax.shard_map(
            lambda *a: _decode_blocks(*a, **kw),
            mesh=mesh,
            in_specs=(P(None, axis), P(None, axis)) + (P(axis),) * 4 + (P(None, axis), P(axis)),
            out_specs=P(axis),
            check_vma=False,
        )
        packed = fn(*args)
    return np.asarray(packed).view(np.uint8).reshape(-1, size0)


def block_word_counts(blocks: list, kernel_blocks: list, stream: np.ndarray, n: int = N) -> list[int] | None:
    """Exact per-block word counts: a block's words end where the next
    block's header begins (single-symbol header = 4 words; coded header
    = 8 + 2n + 256 words before its word_start)."""
    pos_of = {id(b): j for j, b in enumerate(blocks)}
    w_counts = []
    for b in kernel_blocks:
        j = pos_of[id(b)] + 1
        if j < len(blocks):
            nxt = blocks[j]
            end = nxt.word_start - (4 if nxt.is_single else 8 + 2 * n + 256)
        else:
            end = stream.size
        w_counts.append(end - b.word_start)
    if w_counts and min(w_counts) < 0:
        return None
    return w_counts


def _order_same_hist(idxs: list[int], kernel_blocks: list, w_all: list[int]) -> tuple[list[int], list[int]]:
    """Order a size bucket so consecutive PAIRS share one histogram.

    device_plan (parallel/sharded.py) splits an oversized coded block into
    sub-blocks that all carry the parent's histogram; pairing those siblings
    lets build_pair_arrays* detect same_tab and the kernel drop every B-side
    table gather.  Returns (same, rest): `same` has even length and each
    pair (same[2p], same[2p+1]) shares a freq table; `rest` holds the
    leftovers (at most one odd block per histogram class), stream-length
    ordered like the plain bucket path.
    """
    groups: dict[bytes, list[int]] = {}
    for i in idxs:
        groups.setdefault(kernel_blocks[i].freq.tobytes(), []).append(i)
    if len(groups) == len(idxs):
        return [], idxs  # all histograms distinct: keep the plain order
    same: list[int] = []
    rest: list[int] = []
    for v in groups.values():  # members keep idxs' stream-length order
        m = len(v) // 2 * 2
        same += v[:m]
        rest += v[m:]
    return same, sorted(rest, key=lambda i: w_all[i])


def mt64_decode_tpu(
    blob: bytes | np.ndarray,
    bits: int,
    interpret: bool = False,
    mesh=None,
    axis: str | tuple[str, ...] = "dp",
    n: int = 64,
) -> bytes | None:
    """Decode an mt_rANS32xN 16w blob (n in {32, 64}) on the TPU, any B
    in 10..15.  One grid step covers 512 bytes per block row either way
    (8 steps x 64 lanes or 16 x 32), so the geometry is width-agnostic.

    Coded blocks are grouped by size into uniform kernel buckets (the
    greedy planner's variable blocks are minb-multiples, so buckets are
    few); blocks whose size isn't a 512-multiple or whose stream exceeds
    the VMEM tile budget fall back to the host oracle per block.  With
    `mesh`, each bucket's block batch is sharded over the mesh axis via
    shard_map (the reference thread-pool fan-out mapped to chips; outputs
    gather in order at the shard_map boundary).  Returns None only for
    layouts where nothing can run on the kernel (malformed/tiny inputs).
    """
    if bits > 15 or n not in (32, 64):
        return None
    idx = block_index(blob, n)
    if idx is None:
        return None
    length, stream, blocks = idx
    if length == 0:
        return b""

    # kernel set: all coded blocks except the last coded one (it may own the
    # trailing partial lane group), steps % 8 == 0
    coded = [b for b in blocks if not b.is_single]
    kernel_blocks = coded[:-1] if coded else []
    w_all = block_word_counts(blocks, kernel_blocks, stream, n)
    if w_all is None:
        return None

    buckets: dict[tuple, list[int]] = {}
    for i, b in enumerate(kernel_blocks):
        if b.size % 512 == 0:
            nz = int(np.count_nonzero(b.freq))
            if n == 32 and bits <= 12:
                # quad rank tables merge by alphabet class (<=32: 1 gather,
                # <=64: 2, <=128: 4, else per-quarter 256-entry pairs);
                # build_quad_arrays takes ONE rank_mode per bucket, so one
                # 256-symbol block in a text bucket would poison every quad
                # to the worst mode — bucket by class instead
                key = 32 if nz <= 32 else 64 if nz <= 64 else 128 if nz <= 128 else 256
            else:
                key = bits <= 12 and nz <= 128
            buckets.setdefault((b.size, key), []).append(i)

    decoded: dict[int, np.ndarray] = {}  # kernel_blocks index -> bytes
    for (size0, _small), idxs in sorted(buckets.items()):
        # order rows by stream length: kernel groups then hold blocks whose
        # read cursors stay close, keeping the dynamic window scan short
        # (measured 4.6 -> 6.2 GiB/s on the mixed corpus at 64 KiB blocks)
        idxs = sorted(idxs, key=lambda i: w_all[i])
        blk = [kernel_blocks[i] for i in idxs]
        wc = [w_all[i] for i in idxs]
        if _USE_PAIR_KERNEL and (n == 64 or bits > 12) and len(idxs) >= 2:
            # two blocks per 128-lane row (n=64 at any B; n=32 one block per
            # 64-lane half of the flat-rank kernel — the step is issue-bound
            # on its gather chain; sharing window/pack/matmul across a pair
            # cuts gathers per byte ~1.4x).  Same-hist blocks pair FIRST:
            # device_plan siblings share one table, so their bucket runs the
            # same_tab kernel (A-side tables only); mixed leftovers pair
            # after; odd leftover joins the single path.
            leftover: list[int] = []
            parts = _order_same_hist(idxs, kernel_blocks, w_all) if _USE_SAMETAB else ([], idxs)
            for part in parts:
                if len(part) < 2:
                    leftover += part
                    continue
                nbp = len(part) // 2 * 2
                pblk = [kernel_blocks[i] for i in part[:nbp]]
                pwc = [w_all[i] for i in part[:nbp]]
                rows2 = decode_bucket_paired(pblk, pwc, stream, bits, interpret, mesh, axis, n)
                if rows2 is None:
                    leftover += part
                    continue
                for j in range(nbp):
                    decoded[part[j]] = rows2[j]
                leftover += part[nbp:]
            idxs = sorted(leftover, key=lambda i: w_all[i])
            blk = [kernel_blocks[i] for i in idxs]
            wc = [w_all[i] for i in idxs]
            if not idxs:
                continue
        if _USE_PAIR_KERNEL and _USE_QUAD_KERNEL and n == 32 and bits <= 12 and len(idxs) >= 4:
            # four n=32 blocks per 128-lane row (kernels/mt32_quad.py):
            # 4x the row occupancy of the masked single path; leftover
            # (< 4) blocks join the single path below
            from .mt32_quad import decode_bucket_quad

            nbq = len(idxs) // 4 * 4
            rows4 = decode_bucket_quad(blk[:nbq], wc[:nbq], stream, bits, interpret, mesh, axis)
            if rows4 is not None:
                for j in range(nbq):
                    decoded[idxs[j]] = rows4[j]
                blk, wc, idxs = blk[nbq:], wc[nbq:], idxs[nbq:]
                if not idxs:
                    continue
        rows = decode_bucket(blk, wc, stream, bits, interpret, mesh, axis, n)
        if rows is None:
            continue  # bucket out of scope -> host oracle per block
        for j, i in enumerate(idxs):
            decoded[i] = rows[j]

    out = np.zeros(length, dtype=np.uint8)
    kpos = {id(b): i for i, b in enumerate(kernel_blocks)}
    for b in blocks:
        if b.is_single:
            out[b.out_start : b.out_start + b.size] = b.symbol
            continue
        i = kpos.get(id(b))
        if i is not None and i in decoded:
            out[b.out_start : b.out_start + b.size] = decoded[i]
        else:
            wc = w_all[i] if i is not None else None  # None: words to stream end
            part = _decode_block_host(b, stream, bits, length, n, wc)
            if part is None:
                return None
            out[b.out_start : b.out_start + part.size] = part
    return out.tobytes()


def _decode_block_host(blk, stream, bits: int, length: int, n: int = N, w_count: int | None = None) -> np.ndarray | None:
    """Host decode of one coded block (incl. the trailing partial group,
    which belongs to the final coded block's lane chain — ops/mt.py).

    Fast path: synthesize a single-block mt blob and hand it to the native
    C++ decoder (~GB/s) — this is what giant (>VMEM) greedy-planner blocks
    on homogeneous data hit, where the numpy oracle would run at MiB/s.
    The mini blob is semantically exact: rawLength' = blk.size for interior
    blocks (n-aligned, no tail group decodes) and length - out_start for
    the final coded block (reproducing the original tail geometry).
    """
    from ..runtime import native

    if native.load() is not None:
        length_p = (length - blk.out_start) if blk.is_last else blk.size
        end_w = blk.word_start + w_count if w_count is not None else stream.size
        words = stream[blk.word_start : end_w]
        offset = 2 * n + 256 + words.size - 2
        mini = bytearray()
        mini += int(length_p).to_bytes(8, "little")
        mini += b"\0" * 8
        mini += int(blk.size).to_bytes(8, "little")
        mini += int(offset).to_bytes(8, "little")
        mini += blk.states.astype("<u4").tobytes()
        mini += blk.freq.astype("<u2").tobytes()
        mini += words.astype("<u2").tobytes()
        mini[8:16] = len(mini).to_bytes(8, "little")
        got = native.mt_decode(bytes(mini), bits, n, threads=1)
        if got is not None and len(got) == length_p:
            return np.frombuffer(got, np.uint8)

    from ..ops.reference import decode_full_groups, decode_tail_group
    from ..rans import IDX2IDX

    hist = complete_hist(blk.freq, bits)
    if hist is None:
        return None
    out_len_states = max(length - n + 1, 0)
    start = blk.out_start
    block_end = min(start + blk.size, out_len_states)
    num_groups = max(0, -(-(block_end - start) // n))
    syms, states, r = decode_full_groups(blk.states.copy(), stream, blk.word_start, hist, n, num_groups)
    part = syms[:, INV_IDX2IDX[n]].reshape(-1)
    end = start + num_groups * n
    if start + blk.size > end:
        tail, _, _ = decode_tail_group(states, stream, r, hist, n, end, length)
        perm = IDX2IDX[n]
        tail_bytes = np.zeros(length - end, np.uint8)
        sel = (end + perm) < length
        tail_bytes[perm[sel]] = tail[np.arange(n)[sel]]
        part = np.concatenate([part, tail_bytes])
    return part


# ---------------------------------------------------------------------------
# Paired-block kernel: TWO 64-lane blocks per 128-lane row (B<=12,
# small-rank buckets).  The window fetch, output pack, prefix matmul and
# elementwise ALU are shared across the pair, cutting the per-128-bytes
# gather count from 14 to 10 — the step is latency-bound on its gather
# chain, so bytes-per-chain is the lever.  Streams are stored as 64-slot
# HALF-chunks: chunk c of row r holds slots 64c..64c+63 of block A in
# lanes 0..63 and of block B in lanes 64..127; each half keeps its own
# read cursor and window base.

def _mt64_pair_kernel(
    c0a_ref,  # VMEM [G, 128] i32: block A's rank-bucket coarse ranks
    c0b_ref,  # VMEM [G, 128] i32: block B's
    bma_ref,  # VMEM [G, 128] i32: boundary bitmasks (A)
    bmb_ref,  # VMEM [G, 128] i32: (B)
    tpa_ref,  # VMEM [G, 128] i32: packed rank table (A, ranks 0..127)
    tpb_ref,  # VMEM [G, 128] i32: (B, ranks 0..127)
    tpa_hi_ref,  # VMEM [G, 128] i32: ranks 128..255 (zeros when small_rank)
    tpb_hi_ref,
    tri_ref,  # VMEM [128, 128(+128 fused-totals cols)] i8: per-half strict-lower
    stream_ref,  # VMEM [C, G, 128] i32: interleaved half-chunk streams
    init_ref,  # VMEM [G, 128] u32: A's states in lanes 0..63, B's in 64..127
    rw_in_ref,  # VMEM [G, 128] i32: per-half word cursors on slice entry
    out_ref,  # out VMEM [G, 128] i32: 4 steps x (16 A + 16 B) u32
    states_out_ref,  # out VMEM [G, 128] u32: states on slice exit
    rw_out_ref,  # out VMEM [G, 128] i32: cursors on slice exit
    states_scr,  # VMEM [G, 128] u32
    rw_scr,  # VMEM [G, 128] i32 (per-half word cursors, broadcast per half)
    *,
    g_rows: int,
    bits: int,
    small_rank: bool,
    s4c_slice: int,
    rank64: bool = False,
    same_tab: bool = False,
    cb16: bool = False,
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
    is_b = lane >= 64
    hi64 = lane & 64
    # bits <= 11 -> <= 64 rank buckets per block, so build_pair_arrays packs
    # B's c0/bm tables into lanes 64.. of the A operands and ONE gather with
    # index k|hi64 replaces gather(A)+gather(B)+select; rank64 does the same
    # for the rank table when both blocks have <= 64 nonzero symbols.
    merged_cb = bits <= 11

    # 3 half-chunk window per half: one invocation consumes <= 4 steps x
    # 64 words = 128 slots per half; base-aligned to 64 slots -> max
    # rel = 63 + 128 < 192.  The scan runs PER ROW-SUBGROUP: its iteration
    # count is the subgroup's cursor spread, and rows are presorted by
    # stream length, so 4 subgroup scans over ~1/4 the spread each cost
    # ~1/4 of one global scan (the spread is the dominant term late in a
    # bucket as per-row compressed lengths drift apart).
    rwa = rw_scr[:, 0:1]
    rwb = rw_scr[:, 64:65]
    ca0 = (rwa >> 1) >> 6
    cb0 = (rwb >> 1) >> 6
    half_c0 = jnp.where(is_b, cb0, ca0)  # [G, 128]
    # subgroup scans measured a wash at <=128 rows (concat + loop setup eat
    # the spread savings); one scan per group below that, split above
    bounds = list(range(0, g_rows, 128)) + [g_rows] if g_rows > 128 else [0, g_rows]
    win_parts = []
    for si in range(len(bounds) - 1):
        sl = slice(bounds[si], bounds[si + 1])
        ca_s, cb_s = ca0[sl], cb0[sl]
        half_s = half_c0[sl]
        cmin = jnp.minimum(jnp.min(ca_s), jnp.min(cb_s))
        cmax = jnp.minimum(jnp.maximum(jnp.max(ca_s), jnp.max(cb_s)) + 3, w_chunks)
        if _counterfactual("HSRANS_WINDOW_TIMING_HACK"):
            cmax = cmin + 3  # WRONG OUTPUT: counterfactual spread-free scan

        def wbody(c, win, half_s=half_s, sl=sl):
            w0, w1, w2 = win
            rowc = stream_ref[c, sl]
            w0 = jnp.where(half_s == c, rowc, w0)
            w1 = jnp.where(half_s + 1 == c, rowc, w1)
            w2 = jnp.where(half_s + 2 == c, rowc, w2)
            return w0, w1, w2

        zero_s = jnp.zeros((sl.stop - sl.start, 128), jnp.int32)
        win_parts.append(jax.lax.fori_loop(cmin, cmax, wbody, (zero_s, zero_s, zero_s)))
    if len(win_parts) == 1:
        window = win_parts[0]
    else:
        window = tuple(jnp.concatenate([p[h] for p in win_parts], axis=0) for h in range(3))

    c0a, c0b = c0a_ref[:], c0b_ref[:]
    bma = pltpu.bitcast(bma_ref[:], jnp.uint32)
    bmb = pltpu.bitcast(bmb_ref[:], jnp.uint32)
    tpa, tpb = tpa_ref[:], tpb_ref[:]
    if not small_rank:
        tpa_hi, tpb_hi = tpa_hi_ref[:], tpb_hi_ref[:]

    # strict-lower triangular per 64-lane half, passed as an operand
    # (rebuilding it costs ~128 vreg-ops per invocation)
    tri_s8 = tri_ref[:]

    # wire u32 w of step i: lanes 32i+w; w<16 -> A word w, else B word w-16;
    # source lanes are consecutive: L0(w)+b (+64 for the B half)
    w_in_step = lane & 31
    wa = jnp.where(w_in_step < 16, w_in_step, w_in_step - 16)
    l0_pair = (
        4 * ((wa >> 2) & 1) + 8 * (wa & 3) + 32 * (wa >> 3)
        + jnp.where(w_in_step < 16, 0, 64)
    )
    def step_fn(i, carry):
        states, rw, acc = carry
        slot = states & mask_slot
        if cb16:
            # packed 16-slot buckets: ONE gather yields bm (low u16) and
            # c0 (high bits); the (2<<(slot&15))-2 mask tops out at 0xFFFE
            # so it never touches the c0 half — rank in 1 gather + shift +
            # popcount where c0/bm cost 2 gathers
            k16 = pltpu.bitcast(slot, jnp.int32) >> 4
            idx16 = k16 if same_tab else (k16 | hi64)
            v16 = pltpu.bitcast(jnp.take_along_axis(c0a, idx16, axis=1), jnp.uint32)
            m16 = (jnp.uint32(2) << (slot & jnp.uint32(15))) - jnp.uint32(2)
            rank = pltpu.bitcast(v16 >> jnp.uint32(16), jnp.int32) + pltpu.bitcast(
                jax.lax.population_count(v16 & m16), jnp.int32
            )
        else:
            k = pltpu.bitcast(slot, jnp.int32) >> 5
            if same_tab:
                # both halves decode the SAME histogram (device_plan
                # siblings): the A-side tables serve all 128 lanes — no B
                # gathers, no where(is_b) on any table read (up to 3
                # gathers + 2 selects off the issue-bound step at B=12
                # dense alphabets)
                c0v = jnp.take_along_axis(c0a, k, axis=1)
                bmv = jnp.take_along_axis(bma, pltpu.bitcast(k, jnp.uint32), axis=1)
            elif merged_cb:
                kk = k | hi64
                c0v = jnp.take_along_axis(c0a, kk, axis=1)
                bmv = jnp.take_along_axis(bma, pltpu.bitcast(kk, jnp.uint32), axis=1)
            else:
                ku = pltpu.bitcast(k, jnp.uint32)
                c0v = jnp.where(is_b, jnp.take_along_axis(c0b, k, axis=1), jnp.take_along_axis(c0a, k, axis=1))
                bmv = jnp.where(is_b, jnp.take_along_axis(bmb, ku, axis=1), jnp.take_along_axis(bma, ku, axis=1))
            m = (jnp.uint32(2) << (slot & jnp.uint32(31))) - jnp.uint32(2)
            rank = c0v + pltpu.bitcast(jax.lax.population_count(bmv & m), jnp.int32)
        if same_tab and small_rank:
            v1 = pltpu.bitcast(jnp.take_along_axis(tpa, rank, axis=1), jnp.uint32)
        elif same_tab:
            v1 = pltpu.bitcast(gather256(tpa, tpa_hi, rank), jnp.uint32)
        elif rank64:
            v1 = pltpu.bitcast(jnp.take_along_axis(tpa, rank | hi64, axis=1), jnp.uint32)
        elif small_rank:
            v1a = jnp.take_along_axis(tpa, rank, axis=1)
            v1b = jnp.take_along_axis(tpb, rank, axis=1)
            v1 = pltpu.bitcast(jnp.where(is_b, v1b, v1a), jnp.uint32)
        else:
            v1a = gather256(tpa, tpa_hi, rank)
            v1b = gather256(tpb, tpb_hi, rank)
            v1 = pltpu.bitcast(jnp.where(is_b, v1b, v1a), jnp.uint32)
        sym = pltpu.bitcast(v1 & jnp.uint32(0xFF), jnp.int32)
        freq = ((v1 >> jnp.uint32(8)) & jnp.uint32(0xFFF)) + jnp.uint32(1)
        cum = v1 >> jnp.uint32(20)

        states = (states >> jnp.uint32(bits)) * freq + slot - cum
        consume = states < consume_point

        if _counterfactual("HSRANS_NO_MATMUL"):
            prefix = consume.astype(jnp.int32)  # WRONG OUTPUT: timing counterfactual
            tot = prefix
        elif _PREFIX_TOT:
            # one [128,256] matmul yields the exclusive prefix AND each
            # half's total broadcast to its lanes — kills the two slice-
            # broadcasts and the where(is_b) below (the matmul is ~23% of
            # the step, so the extra MXU columns ride its staging)
            pt = jnp.dot(consume.astype(jnp.int8), tri_s8, preferred_element_type=jnp.int32)
            prefix = pt[:, :128]
            tot = pt[:, 128:]
        elif _PREFIX_MXU:
            # s8 x s8 -> s32 runs the MXU at twice the bf16 rate and skips
            # both float casts (measured +5.5%, exact)
            prefix = jnp.dot(consume.astype(jnp.int8), tri_s8, preferred_element_type=jnp.int32)
        else:
            prefix = _exclusive_prefix_halves(consume, g_rows, lane)
        if not _PREFIX_TOT and not _counterfactual("HSRANS_NO_MATMUL"):
            tot_a = prefix[:, 63:64] + consume[:, 63:64].astype(jnp.int32)
            tot_b = prefix[:, 127:128] + consume[:, 127:128].astype(jnp.int32)
            tot = jnp.where(is_b, tot_b, tot_a)

        widx = rw + prefix
        rel = (widx >> 1) - (half_c0 << 6)  # in [0, 192) per half
        hsel = rel >> 6  # window register 0..2
        within = (lane & 64) | (rel & 63)  # stay inside the lane's half
        w32 = jnp.zeros((g_rows, L), jnp.int32)
        for h in range(3):
            cand = jnp.take_along_axis(window[h], within, axis=1)
            w32 = jnp.where(hsel == h, cand, w32)
        word = (pltpu.bitcast(w32, jnp.uint32) >> pltpu.bitcast((widx & 1) << 4, jnp.uint32)) & jnp.uint32(0xFFFF)
        states = jnp.where(consume, (states << jnp.uint32(16)) | word, states)
        rw = rw + tot

        # vertical pack: byte i of acc[l] = step i's symbol at lane l.  Pure
        # elementwise (no lane-crossing rolls on the hot loop); the wire-
        # order transpose happens once per invocation in the finalize below.
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

    # finalize: wire u32 lane w = step (w>>5)'s bytes at lanes l0..l0+3
    shift_i = (lane >> 5) * 8
    b0 = (jnp.take_along_axis(acc, l0_pair, axis=1) >> shift_i) & 0xFF
    b1 = (jnp.take_along_axis(acc, l0_pair + 1, axis=1) >> shift_i) & 0xFF
    b2 = (jnp.take_along_axis(acc, l0_pair + 2, axis=1) >> shift_i) & 0xFF
    b3 = (jnp.take_along_axis(acc, l0_pair + 3, axis=1) >> shift_i) & 0xFF
    out_ref[:] = b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)


_TRI_PAIR = None


def _tri_pair_operand():
    global _TRI_PAIR
    if _TRI_PAIR is None:
        r = np.arange(L)[:, None]
        c = np.arange(L)[None, :]
        same_half = (r >= 64) == (c >= 64)
        tri = ((r < c) & same_half).astype(np.int8)
        if _PREFIX_TOT:
            # extra 128 all-ones-within-half columns: consume @ [:,128:]
            # broadcasts each half's consume total to its own lanes
            tri = np.concatenate([tri, same_half.astype(np.int8)], axis=1)
        _TRI_PAIR = tri
    return _TRI_PAIR


def _pairs_slice_call(c0a, c0b, bma, bmb, tpa, tpb, tpa_hi, tpb_hi, stream, states, rw, *, g_rows, n_groups, s4c_slice, w_chunks, bits, small_rank, interpret, rank64=False, same_tab=False, cb16=False):
    """One time slice of the paired decode: s4c_slice invocations per group,
    states/cursors in and out (so the driver can regroup rows between
    slices)."""
    kernel = functools.partial(
        _mt64_pair_kernel, g_rows=g_rows, bits=bits, small_rank=small_rank,
        s4c_slice=s4c_slice, rank64=rank64, same_tab=same_tab, cb16=cb16,
    )
    row_spec = pl.BlockSpec((g_rows, 128), lambda g, s4: (g, 0), memory_space=pltpu.VMEM)
    npad = n_groups * g_rows
    return pl.pallas_call(
        kernel,
        grid=(n_groups, s4c_slice),
        in_specs=[row_spec] * 8
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
            jax.ShapeDtypeStruct((npad, s4c_slice * 128), jnp.int32),
            jax.ShapeDtypeStruct((npad, 128), jnp.uint32),
            jax.ShapeDtypeStruct((npad, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((g_rows, L), jnp.uint32),
            pltpu.VMEM((g_rows, L), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(c0a, c0b, bma, bmb, tpa, tpb, tpa_hi, tpb_hi, jnp.asarray(_tri_pair_operand()), stream, states, rw)


# Invocations per time slice.  Cursor-regroup slicing (argsort between
# slices) measured NET NEGATIVE at the even-split geometry (9.1 -> 8.4
# GiB/s at 64): the in-jit sort+permute chain costs more than the window
# scan it saves.  Kept at "one slice" = plain decode; the machinery stays
# for experiments via HSRANS_SLICE_S4.
_SLICE_S4 = int(_os.environ.get("HSRANS_SLICE_S4", "1000000"))


@functools.partial(jax.jit, static_argnames=("g_rows", "n_groups", "s4c", "w_chunks", "bits", "small_rank", "interpret", "rank64", "same_tab", "cb16"))
def _decode_pairs(c0a, c0b, bma, bmb, tpa, tpb, tpa_hi, tpb_hi, stream, init, *, g_rows, n_groups, s4c, w_chunks, bits, small_rank=True, interpret=False, rank64=False, same_tab=False, cb16=False):
    """Time-sliced paired decode with cursor regrouping.

    Rows of one bucket drift apart in stream position as they decode
    (compressed lengths differ), and the per-invocation window scan costs
    O(per-group cursor spread).  Between slices of _SLICE_S4 invocations
    the driver re-sorts rows by current cursor (argsort + operand gather —
    a few % of HBM traffic), so every group's spread stays at the drift
    accumulated over ONE slice.  Returns (bytes, perm): row j of `bytes`
    is original row perm[j].
    """
    npad = c0a.shape[0]
    tabs = [c0a, c0b, bma, bmb, tpa, tpb, tpa_hi, tpb_hi]
    states = init
    rw = jnp.zeros((npad, 128), jnp.int32)
    perm = jnp.arange(npad, dtype=jnp.int32)
    n_slices = -(-s4c // _SLICE_S4)
    outs = []
    kw = dict(g_rows=g_rows, n_groups=n_groups, w_chunks=w_chunks, bits=bits, small_rank=small_rank, interpret=interpret, rank64=rank64, same_tab=same_tab, cb16=cb16)
    for t in range(n_slices):
        if t > 0 and n_slices > 1 and npad > g_rows:
            order = jnp.argsort(rw[:, 0])
            tabs = [a[order] for a in tabs]
            stream = stream[:, order]
            states = states[order]
            rw = rw[order]
            perm = perm[order]
        s4c_t = min(_SLICE_S4, s4c - t * _SLICE_S4)
        out, states, rw = _pairs_slice_call(*tabs, stream, states, rw, s4c_slice=s4c_t, **kw)
        outs.append((out, perm))
    return outs


def build_pair_arrays(
    kernel_blocks: list,
    w_counts: list[int],
    stream: np.ndarray,
    bits: int,
    n_dev: int = 1,
) -> tuple[list[np.ndarray], dict] | None:
    """Operands for the paired kernel (block 2p in lanes 0..63 of pair row
    p, block 2p+1 in 64..127; 64-slot interleaved half-chunks)."""
    nbp = len(kernel_blocks) // 2 * 2
    if nbp < 2:
        return None
    pairs = nbp // 2
    size0 = kernel_blocks[0].size
    slots = [-(-w // 2) for w in w_counts[:nbp]]
    w_chunks = max(2, -(-max(slots) // 64))
    # time-sliced decode keeps the window scan spread-free, so pair groups
    # can run much deeper than the generic tile budget allows (the gate is
    # VMEM capacity, not scan cost)
    g_cap = _PAIR_TILE_BYTES // (w_chunks * 128 * 4)
    # measured depth optimum: 256 rows for short streams (4 KiB blocks),
    # ~128 for long ones (64 KiB planner blocks), where the window scan's
    # cursor-spread term grows with stream length
    default_cap = 256 if w_chunks <= 64 else 128
    g_cap = min(int(_os.environ.get("HSRANS_PAIR_GCAP", str(default_cap))), g_cap // 8 * 8)
    if g_cap < 8:
        return None
    # split pairs EVENLY over the minimum group count: padding rows decode
    # dead bytes at full price (299 pairs at g_cap 256 would pad 42%).
    # Under a mesh, groups are per device (shard_map slices the row axis).
    pairs_dev = -(-pairs // n_dev)
    n_grp = -(-pairs_dev // g_cap)
    g_rows = max(8, -(-(-(-pairs_dev // n_grp)) // 8) * 8)
    npad = n_dev * n_grp * g_rows

    c0a = np.zeros((npad, 128), np.int32)
    c0b = np.zeros((npad, 128), np.int32)
    bma = np.zeros((npad, 128), np.int32)
    bmb = np.zeros((npad, 128), np.int32)
    tpa = np.zeros((npad, 128), np.int32)
    tpb = np.zeros((npad, 128), np.int32)
    tpa_hi = np.zeros((npad, 128), np.int32)
    tpb_hi = np.zeros((npad, 128), np.int32)
    init = np.full((npad, 128), DECODE_CONSUME_POINT_16, np.uint32)
    stream_cm = np.zeros((w_chunks, npad, 128), np.uint32)
    n_buckets = (1 << bits) // 32
    small_rank = all(int(np.count_nonzero(b.freq)) <= 128 for b in kernel_blocks[:nbp])
    # bits <= 11: both blocks' c0/bm tables fit one 128-lane operand (<= 64
    # buckets each); <= 64 nonzero symbols per block merges the rank tables
    # the same way (at ANY depth <= 12 — the conditions are independent).
    # Each merge halves that table's gathers per step (see _mt64_pair_kernel).
    merged_cb = bits <= 11
    rank64 = all(int(np.count_nonzero(b.freq)) <= 64 for b in kernel_blocks[:nbp])
    # every pair shares one histogram (device_plan siblings, paired by the
    # caller's same-hist ordering) -> the kernel reads only A-side tables
    same_tab = _USE_SAMETAB and all(
        np.array_equal(kernel_blocks[2 * p].freq, kernel_blocks[2 * p + 1].freq)
        for p in range(pairs)
    )
    # packed 16-slot c0bm (one gather where c0+bm cost two): B10 always
    # (64 entries/side -> A in lanes 0..63, B in 64..127, index k16|hi64);
    # B11 only when same_tab (128 entries fill the whole A row)
    cb16 = bits == 10 or (bits == 11 and same_tab)
    n16 = (1 << bits) // 16
    for i in range(nbp):
        b = kernel_blocks[i]
        hist = complete_hist(b.freq, bits)
        if hist is None:
            return None
        rt = make_rank_tables(hist)
        p, hi = divmod(i, 2)
        (c0b if hi else c0a)[p, :n_buckets] = rt["c0"]
        (bmb if hi else bma)[p, :n_buckets] = rt["bm"]
        (tpb if hi else tpa)[p] = rt["tp"][:128]
        (tpb_hi if hi else tpa_hi)[p] = rt["tp"][128:]
        if merged_cb and hi and not cb16:
            c0a[p, 64 : 64 + n_buckets] = rt["c0"]
            bma[p, 64 : 64 + n_buckets] = rt["bm"]
        if cb16:
            # the packed table REPLACES c0/bm in the c0a operand (the
            # kernel never reads c0/bm on this path); B11 same_tab fills
            # the whole 128-lane row, so the merged_cb write is skipped
            if not hi:
                c0a[p, :n16] = rt["cb16"]
            elif not same_tab:
                c0a[p, 64 : 64 + n16] = rt["cb16"]
        if rank64 and hi:
            tpa[p, 64:128] = rt["tp"][:64]
        words = stream[b.word_start : b.word_start + w_counts[i]].astype(np.uint32)
        if words.size & 1:
            words = np.concatenate([words, np.zeros(1, np.uint32)])
        padded = np.zeros(w_chunks * 64, np.uint32)
        padded[: words.size // 2] = words[0::2] | (words[1::2] << np.uint32(16))
        stream_cm[:, p, 64 * hi : 64 * hi + 64] = padded.reshape(w_chunks, 64)
        init[p, 64 * hi : 64 * hi + N] = b.states

    arrs = [c0a, c0b, bma, bmb, tpa, tpb, tpa_hi, tpb_hi, stream_cm.view(np.int32), init]
    kw = dict(
        g_rows=g_rows, n_groups=npad // g_rows // n_dev, s4c=size0 // 256,
        w_chunks=w_chunks, bits=bits, small_rank=small_rank, rank64=rank64,
        same_tab=same_tab, cb16=cb16,
    )
    return arrs, kw


def decode_bucket_paired(
    kernel_blocks: list,
    w_counts: list[int],
    stream: np.ndarray,
    bits: int,
    interpret: bool,
    mesh=None,
    axis: str | tuple[str, ...] = "dp",
    n: int = N,
) -> np.ndarray | None:
    """Decode an even-count bucket two blocks per row; returns
    [nbp, size] bytes for the paired prefix of the bucket.  B<=12 buckets
    use the packed-rank pair kernel; B=13..15 the flat-rank variant
    (which also takes n=32 blocks, one per half)."""
    if bits > 12:
        from ..parallel.sharded import axis_size

        n_dev_hb = axis_size(mesh, axis)
        built = build_pair_arrays_hb(kernel_blocks, w_counts, stream, bits, n_dev_hb, n)
        if built is None:
            return None
        arrs, kw = built
        size0 = kernel_blocks[0].size
        npad = arrs[0].shape[1]
        wn = n // 4  # valid wire u32 words per half per step
        if mesh is not None:
            # high-B pairs shard like the B<=12 path: row GROUPS split over
            # the mesh axis (tables/streams travel with their rows; ordered
            # gather at the shard_map boundary)
            from jax.sharding import PartitionSpec as P

            kwc = dict(
                g_rows=kw["g_rows"], n_groups=kw["n_groups"] // n_dev_hb,
                s4c=kw["s4c"], w_chunks=kw["w_chunks"], bits=bits, n=n,
                packed=kw["packed"], sym_lin=kw["sym_lin"], gbits=kw["gbits"],
                same_tab=kw["same_tab"], interpret=interpret,
            )
            fn = jax.shard_map(
                lambda *a: _pairs_hb_call(*a, **kwc)[0],
                mesh=mesh,
                in_specs=(P(None, axis), P(None, axis), P(None, axis), P(axis), P(axis)),
                out_specs=P(axis),
                check_vma=False,
            )
            out_dev = fn(
                jnp.asarray(arrs[0]), jnp.asarray(arrs[1]), jnp.asarray(arrs[2]),
                jnp.asarray(arrs[3]), jnp.zeros((npad, 128), jnp.int32),
            )
            slices = [(out_dev, jnp.arange(npad, dtype=jnp.int32))]
        else:
            slices = _decode_pairs_hb(*[jnp.asarray(a) for a in arrs], **kw, interpret=interpret)
        out = np.empty((npad * 2, size0), np.uint8)
        for out_t, perm_t in slices:
            o = np.asarray(out_t)
            p = np.asarray(perm_t)
            s4c_t = o.shape[1] // 128
            u32 = o.reshape(npad, s4c_t, 4, 2, 16)[:, :, :, :, :wn]
            a = np.ascontiguousarray(u32[:, :, :, 0, :]).view(np.uint8).reshape(npad, s4c_t * 16 * wn)
            b = np.ascontiguousarray(u32[:, :, :, 1, :]).view(np.uint8).reshape(npad, s4c_t * 16 * wn)
            out[2 * p] = a
            out[2 * p + 1] = b
        return out
    from ..parallel.sharded import axis_size

    n_dev = axis_size(mesh, axis)
    built = build_pair_arrays(kernel_blocks, w_counts, stream, bits, n_dev)
    if built is None:
        return None
    arrs, kw = built
    size0 = kernel_blocks[0].size
    if mesh is not None:
        # the reference thread-pool fan-out mapped to chips: pair rows
        # shard over the mesh axis, tables travel with their rows, outputs
        # gather in order at the shard_map boundary
        from jax.sharding import PartitionSpec as P

        npad = arrs[0].shape[0]
        kwc = dict(
            g_rows=kw["g_rows"], n_groups=kw["n_groups"], s4c_slice=kw["s4c"],
            w_chunks=kw["w_chunks"], bits=bits, small_rank=kw["small_rank"],
            rank64=kw["rank64"], same_tab=kw["same_tab"], cb16=kw["cb16"],
            interpret=interpret,
        )
        fn = jax.shard_map(
            lambda *a: _pairs_slice_call(*a, **kwc)[0],
            mesh=mesh,
            in_specs=(P(axis),) * 8 + (P(None, axis), P(axis), P(axis)),
            out_specs=P(axis),
            check_vma=False,
        )
        args = [jnp.asarray(a) for a in arrs[:8]] + [
            jnp.asarray(arrs[8]),
            jnp.asarray(arrs[9]),
            jnp.zeros((npad, 128), jnp.int32),
        ]
        out_dev = fn(*args)
        o = np.asarray(out_dev)
        s4c_t = o.shape[1] // 128
        u32 = o.reshape(npad, s4c_t, 4, 2, 16)
        a = np.ascontiguousarray(u32[:, :, :, 0, :]).view(np.uint8).reshape(npad, size0)
        b = np.ascontiguousarray(u32[:, :, :, 1, :]).view(np.uint8).reshape(npad, size0)
        out = np.empty((npad * 2, size0), np.uint8)
        out[0::2] = a
        out[1::2] = b
        return out
    if _PAIR_V2:
        packed = _decode_pairs_v2(*[jnp.asarray(a) for a in arrs], **kw, interpret=interpret)
        u32 = np.asarray(packed).reshape(-1, kw["s4c"], 4, 2, 16)
        # [pair, inv, step, half, word] -> per-block contiguous bytes
        a = np.ascontiguousarray(u32[:, :, :, 0, :]).view(np.uint8).reshape(-1, size0)
        b = np.ascontiguousarray(u32[:, :, :, 1, :]).view(np.uint8).reshape(-1, size0)
        out = np.empty((a.shape[0] * 2, size0), np.uint8)
        out[0::2] = a
        out[1::2] = b
        return out
    slices = _decode_pairs(*[jnp.asarray(a) for a in arrs], **kw, interpret=interpret)
    npad = arrs[0].shape[0]
    out = np.empty((npad * 2, size0), np.uint8)
    col = 0
    for out_t, perm_t in slices:
        o = np.asarray(out_t)
        p = np.asarray(perm_t)
        s4c_t = o.shape[1] // 128
        span = s4c_t * 256
        u32 = o.reshape(npad, s4c_t, 4, 2, 16)
        a = np.ascontiguousarray(u32[:, :, :, 0, :]).view(np.uint8).reshape(npad, span)
        b = np.ascontiguousarray(u32[:, :, :, 1, :]).view(np.uint8).reshape(npad, span)
        out[2 * p, col : col + span] = a
        out[2 * p + 1, col : col + span] = b
        col += span
    return out


# ---------------------------------------------------------------------------
# Paired-block kernel v2: annotated-stream pipeline.
#
# The renorm feedback is the whole reason the decode chain is serial: a
# consumed lane's next slot decides the next table lookups, and the word it
# consumes depends on every earlier lane's consume flag.  But for B <= 15
# the next slot after a renorm is EXACTLY `word & mask` — `(new << 16) &
# mask == 0` — i.e. it depends only on the *stream word*, not on the lane's
# state.  So a fully parallel pre-pass (`_annotate_pairs`) can stamp every
# stream word with the rank its low bits map to, and the serial kernel's
# critical cycle collapses to:
#
#     rank -> table gather -> state ALU -> prefix matmul -> pool select
#
# (two gathers + one matmul per step); the rank-of-slot chain for
# non-consuming lanes and the stream-window maintenance run OFF the
# critical path, where the VPU's deep pipeline hides them (measured: the
# 3-roll output pack was free there too).

_PAIR_V2 = False  # annotated-stream variant: measured neutral (docs/KERNEL_NOTES.md)


def _annotate_pairs(raw_ref, c0a_ref, c0b_ref, bma_ref, bmb_ref, out_ref, *, g_rows, bits):
    """ann[c][lane] = word | rank(word & mask) << 16 for word (lane&63) of
    64-word half-chunk c (A half in lanes 0..63, B half in 64..127)."""
    c = pl.program_id(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (g_rows, L), 1)
    is_b = lane >= 64
    # half-chunk c's words live in raw slots 32c..32c+32 of the same half
    idx = (lane & 64) | ((c & 1) * 32 + ((lane & 63) >> 1))
    slot32 = pltpu.bitcast(jnp.take_along_axis(raw_ref[0], idx, axis=1), jnp.uint32)
    word = (slot32 >> pltpu.bitcast((lane & 1) << 4, jnp.uint32)) & jnp.uint32(0xFFFF)
    slot = word & jnp.uint32((1 << bits) - 1)
    k = pltpu.bitcast(slot, jnp.int32) >> 5
    ku = pltpu.bitcast(k, jnp.uint32)
    c0v = jnp.where(is_b, jnp.take_along_axis(c0b_ref[:], k, axis=1), jnp.take_along_axis(c0a_ref[:], k, axis=1))
    bma = pltpu.bitcast(bma_ref[:], jnp.uint32)
    bmb = pltpu.bitcast(bmb_ref[:], jnp.uint32)
    bmv = jnp.where(is_b, jnp.take_along_axis(bmb, ku, axis=1), jnp.take_along_axis(bma, ku, axis=1))
    m = (jnp.uint32(2) << (slot & jnp.uint32(31))) - jnp.uint32(2)
    rank = c0v + pltpu.bitcast(jax.lax.population_count(bmv & m), jnp.int32)
    out_ref[0] = pltpu.bitcast(word, jnp.int32) | (rank << 16)


def _mt64_pair_kernel_v2(
    c0a_ref, c0b_ref, bma_ref, bmb_ref,  # VMEM [G, 128] i32 (nc-rank chain)
    tpa_ref, tpb_ref, tpa_hi_ref, tpb_hi_ref,  # packed rank tables
    ann_ref,  # VMEM [CA, G, 128] i32: annotated 64-word half-chunks
    init_ref,  # VMEM [G, 128] u32
    out_ref,  # out VMEM [G, 128] i32
    states_scr, rw_scr, rank_scr,
    *,
    g_rows: int,
    bits: int,
    small_rank: bool,
):
    s4 = pl.program_id(1)
    mask_slot = jnp.uint32((1 << bits) - 1)
    consume_point = jnp.uint32(DECODE_CONSUME_POINT_16)
    ca = ann_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (g_rows, L), 1)
    is_b = lane >= 64

    c0a, c0b = c0a_ref[:], c0b_ref[:]
    bma = pltpu.bitcast(bma_ref[:], jnp.uint32)
    bmb = pltpu.bitcast(bmb_ref[:], jnp.uint32)
    tpa, tpb = tpa_ref[:], tpb_ref[:]
    if not small_rank:
        tpa_hi, tpb_hi = tpa_hi_ref[:], tpb_hi_ref[:]

    def rank_of(slot):
        k = pltpu.bitcast(slot, jnp.int32) >> 5
        ku = pltpu.bitcast(k, jnp.uint32)
        c0v = jnp.where(is_b, jnp.take_along_axis(c0b, k, axis=1), jnp.take_along_axis(c0a, k, axis=1))
        bmv = jnp.where(is_b, jnp.take_along_axis(bmb, ku, axis=1), jnp.take_along_axis(bma, ku, axis=1))
        m = (jnp.uint32(2) << (slot & jnp.uint32(31))) - jnp.uint32(2)
        return c0v + pltpu.bitcast(jax.lax.population_count(bmv & m), jnp.int32)

    @pl.when(s4 == 0)
    def _():
        states_scr[:] = init_ref[:]
        rw_scr[:] = jnp.zeros((g_rows, L), jnp.int32)
        rank_scr[:] = rank_of(init_ref[:] & mask_slot)

    # 6-chunk window per half: one invocation consumes <= 4 * 64 words per
    # half; pool reads span [rw, rw + 63], so 63 + 256 < 384 = 6 * 64.
    rwa = rw_scr[:, 0:1]
    rwb = rw_scr[:, 64:65]
    ca0 = rwa >> 6
    cb0 = rwb >> 6
    half_c0 = jnp.where(is_b, cb0, ca0)
    cmin = jnp.minimum(jnp.min(ca0), jnp.min(cb0))
    cmax = jnp.minimum(jnp.maximum(jnp.max(ca0), jnp.max(cb0)) + 6, ca)

    def wbody(c, win):
        rowc = ann_ref[c]
        return tuple(
            jnp.where(half_c0 + h == c, rowc, win[h]) for h in range(6)
        )

    zero_win = jnp.zeros((g_rows, 128), jnp.int32)
    window = jax.lax.fori_loop(cmin, cmax, wbody, (zero_win,) * 6)
    base_w = half_c0 << 6

    tri_r = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    tri_c = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    tri = ((tri_r < tri_c) & ((tri_r >= 64) == (tri_c >= 64))).astype(jnp.int8)

    w_in_step = lane & 31
    wa = jnp.where(w_in_step < 16, w_in_step, w_in_step - 16)
    l0_pair = (
        4 * ((wa >> 2) & 1) + 8 * (wa & 3) + 32 * (wa >> 3)
        + jnp.where(w_in_step < 16, 0, 64)
    )

    def step_fn(i, carry):
        states, rw, rank, acc = carry
        # critical cycle: table gather -> ALU -> prefix -> pool select
        if small_rank:
            v1a = jnp.take_along_axis(tpa, rank, axis=1)
            v1b = jnp.take_along_axis(tpb, rank, axis=1)
        else:
            v1a = gather256(tpa, tpa_hi, rank)
            v1b = gather256(tpb, tpb_hi, rank)
        v1 = pltpu.bitcast(jnp.where(is_b, v1b, v1a), jnp.uint32)
        sym = pltpu.bitcast(v1 & jnp.uint32(0xFF), jnp.int32)
        freq = ((v1 >> jnp.uint32(8)) & jnp.uint32(0xFFF)) + jnp.uint32(1)
        cum = v1 >> jnp.uint32(20)

        slot = states & mask_slot
        new = (states >> jnp.uint32(bits)) * freq + slot - cum
        consume = new < consume_point

        prefix = jnp.dot(consume.astype(jnp.int8), tri, preferred_element_type=jnp.int32)
        tot_a = prefix[:, 63:64] + consume[:, 63:64].astype(jnp.int32)
        tot_b = prefix[:, 127:128] + consume[:, 127:128].astype(jnp.int32)

        # pool of the next 64 annotated words per half (off critical path:
        # depends only on rw at step entry)
        rel = (rw - base_w) + (lane & 63)
        hsel = rel >> 6
        within = (lane & 64) | (rel & 63)
        pool = jnp.zeros((g_rows, L), jnp.int32)
        for h in range(6):
            cand = jnp.take_along_axis(window[h], within, axis=1)
            pool = jnp.where(hsel == h, cand, pool)

        sel = jnp.take_along_axis(pool, (lane & 64) | prefix, axis=1)
        word = pltpu.bitcast(sel, jnp.uint32) & jnp.uint32(0xFFFF)
        rank_p = sel >> 16
        states = jnp.where(consume, (new << jnp.uint32(16)) | word, new)
        rank_nc = rank_of(new & mask_slot)  # off critical path
        rank = jnp.where(consume, rank_p, rank_nc)
        rw = rw + jnp.where(is_b, tot_b, tot_a)
        acc = acc | (sym << ((i & 3) * 8))
        return states, rw, rank, acc

    carry = (states_scr[:], rw_scr[:], rank_scr[:], jnp.zeros((g_rows, L), jnp.int32))
    states, rw, rank, acc = jax.lax.fori_loop(0, 4, step_fn, carry)
    states_scr[:] = states
    rw_scr[:] = rw
    rank_scr[:] = rank
    shift_i = (lane >> 5) * 8
    b0 = (jnp.take_along_axis(acc, l0_pair, axis=1) >> shift_i) & 0xFF
    b1 = (jnp.take_along_axis(acc, l0_pair + 1, axis=1) >> shift_i) & 0xFF
    b2 = (jnp.take_along_axis(acc, l0_pair + 2, axis=1) >> shift_i) & 0xFF
    b3 = (jnp.take_along_axis(acc, l0_pair + 3, axis=1) >> shift_i) & 0xFF
    out_ref[:] = b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)


@functools.partial(jax.jit, static_argnames=("g_rows", "n_groups", "s4c", "w_chunks", "bits", "small_rank", "interpret", "rank64"))
def _decode_pairs_v2(c0a, c0b, bma, bmb, tpa, tpb, tpa_hi, tpb_hi, stream, init, *, g_rows, n_groups, s4c, w_chunks, bits, small_rank=True, interpret=False, rank64=False):
    # rank64 accepted for kw-compatibility; v2 reads the intact c0b/tpb
    # operands, so the merged upper lanes don't affect it
    row_spec = pl.BlockSpec((g_rows, 128), lambda g, c: (g, 0), memory_space=pltpu.VMEM)
    ca = 2 * w_chunks
    ann = pl.pallas_call(
        functools.partial(_annotate_pairs, g_rows=g_rows, bits=bits),
        grid=(n_groups, ca),
        in_specs=[pl.BlockSpec((1, g_rows, 128), lambda g, c: (c // 2, g, 0), memory_space=pltpu.VMEM)]
        + [row_spec] * 4,
        out_specs=pl.BlockSpec((1, g_rows, 128), lambda g, c: (c, g, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ca, n_groups * g_rows, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(stream, c0a, c0b, bma, bmb)
    kernel = functools.partial(_mt64_pair_kernel_v2, g_rows=g_rows, bits=bits, small_rank=small_rank)
    return pl.pallas_call(
        kernel,
        grid=(n_groups, s4c),
        in_specs=[row_spec] * 8
        + [
            pl.BlockSpec((ca, g_rows, 128), lambda g, s4: (0, g, 0), memory_space=pltpu.VMEM),
            row_spec,
        ],
        out_specs=pl.BlockSpec((g_rows, 128), lambda g, s4: (g, s4), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_groups * g_rows, s4c * 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((g_rows, L), jnp.uint32),
            pltpu.VMEM((g_rows, L), jnp.int32),
            pltpu.VMEM((g_rows, L), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(c0a, c0b, bma, bmb, tpa, tpb, tpa_hi, tpb_hi, ann, init)


# ---------------------------------------------------------------------------
# Paired-block kernel for B = 13..15: flat one-level rank tables.
#
# The generic kernel resolves rank(slot) at B > 12 by looping over 128-
# bucket chunks of the c0/bm tables — at B=15 that is a sequential
# 8-iteration fori of dependent gathers per step, the 3x-vs-B12 cost.
# Here every lookup is ONE dependency level:
#   * 64-slot buckets: rank = c0_64[k] + pop(bm_lo & mlo) + pop(bm_hi & mhi)
#   * c0_64 delta-packed 4-per-u32 (base 9b | d1 7b @9 | d2 8b @16 | d3 8b @24):
#     the c0 table shrinks 4x, to <= 128 entries at every depth -> 1 take
#   * bm_lo/bm_hi chunk-selected (2^(B-11) independent takes total)
#   * per-rank tables: fc = freq | cumul<<16 (both <= 2^15), and symbols
#     packed 4-per-u32 (<= 64 entries -> 1 take)
# Per-half operand stacks: [cp, bm_lo x nc, bm_hi x nc, fc_lo, fc_hi, sp4].

def _hb_layout(bits: int) -> tuple[int, int]:
    nc = max(1, (1 << bits) // 64 // 128)  # chunks of the 64-bucket masks
    return nc, 1 + 2 * nc + 3


def _hb_tables(rt: dict, bits: int) -> np.ndarray:
    """[K, 128] i32 per-half stack from make_rank_tables output."""
    nc, K = _hb_layout(bits)
    n64 = (1 << bits) // 64
    c0 = rt["c0"].astype(np.int64)  # 32-slot ranks
    c064 = c0[0::2][:n64]
    bmlo = rt["bm"].view(np.uint32)[0::2][:n64]
    bmhi = rt["bm"].view(np.uint32)[1::2][:n64]
    cp_n = n64 // 4
    base = c064[0::4]
    d1 = c064[1::4] - base
    d2 = c064[2::4] - base
    d3 = c064[3::4] - base
    cp = (base | (d1 << 9) | (d2 << 16) | (d3 << 24)).astype(np.uint32)
    t1 = rt["t1"].view(np.uint32)
    t2 = rt["t2"].view(np.uint32)
    sym = t1 & 0xFF
    freq = t1 >> 8
    fc = freq | (t2 << np.uint32(16))
    sp4 = sym[0::4] | (sym[1::4] << 8) | (sym[2::4] << 16) | (sym[3::4] << 24)
    out = np.zeros((K, 128), np.uint32)
    out[0, :cp_n] = cp
    for c in range(nc):
        out[1 + c] = bmlo[c * 128 : (c + 1) * 128]
        out[1 + nc + c] = bmhi[c * 128 : (c + 1) * 128]
    out[1 + 2 * nc] = fc[:128]
    out[2 + 2 * nc] = fc[128:]
    out[3 + 2 * nc, :64] = sp4
    return out.view(np.int32)


# Packed-starts alternative for sparse-boundary histograms: one u32 per
# 64-slot group carries the group's rank base AND up to three in-group
# symbol-start positions, so the per-step rank needs ONE gather per class
# per half instead of cp(1) + bm lo/hi(2*nc).  At B=15 x-ray (256 symbols
# over 512 groups) this cuts the step from ~27 gathers to ~15; the gate
# (<= 3 starts at positions >= 1 per group) holds whenever the alphabet is
# spread thinner than ~4 symbols per 64 slots — measured: every x-ray
# device_plan block at B14/B15 passes, B13 does not (5-6 starts/group).

def _hb_packed_layout(bits: int, gbits: int = 6) -> tuple[int, int]:
    pnc = max(1, (1 << bits) >> gbits >> 7)  # 128-entry classes of groups
    return pnc, pnc + 3


def _hb_tables_packed(rt: dict, bits: int, gbits: int = 6) -> tuple[np.ndarray, bool] | None:
    """[Kp, 128] i32 packed-starts stack, or None when a 2^gbits-slot group
    has > 3 starts at positions >= 1 (position-0 starts are absorbed into
    the group's rank base, exactly like the bm kernel's bit-1..s6 masks).
    Positions are stored as p-1 and compared with strict > in the kernel,
    so the 127 sentinel never collides with a real start at position 127
    (gbits=7 groups have them: 276/308 x-ray B15 blocks).
    Second element: whether the present alphabet is contiguous (sym ==
    rank + first_sym), which lets the kernel skip the sp4 gather."""
    pnc, K = _hb_packed_layout(bits, gbits)
    gsz = 1 << gbits
    ng = (1 << bits) >> gbits
    c0g = rt["c0"].astype(np.uint32)[0 :: gsz // 32][:ng]
    bmlo = rt["bm"].view(np.uint32)[0::2]
    bmhi = rt["bm"].view(np.uint32)[1::2]
    n64 = (1 << bits) // 64
    b64 = bmlo[:n64].astype(np.uint64) | (bmhi[:n64].astype(np.uint64) << np.uint64(32))
    bits_m = np.unpackbits(b64.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little").reshape(ng, gsz)
    nsym = int(bits_m.sum())
    bits_m = bits_m.copy()
    bits_m[:, 0] = 0  # drop position 0 (absorbed into the base)
    cnt = bits_m.sum(axis=1)
    if int(cnt.max()) > 3:
        return None
    pos = np.argsort(1 - bits_m, axis=1, kind="stable")[:, :3].astype(np.uint32)
    valid = np.arange(3)[None, :] < cnt[:, None]
    q = np.where(valid, pos - 1, np.uint32(127))  # p-1; kernel tests s > q
    pk = c0g | (q[:, 0] << np.uint32(9)) | (q[:, 1] << np.uint32(16)) | (q[:, 2] << np.uint32(23))
    t1 = rt["t1"].view(np.uint32)
    t2 = rt["t2"].view(np.uint32)
    sym = t1 & 0xFF
    fc = (t1 >> 8) | (t2 << np.uint32(16))
    lin = bool((sym[:nsym] == (sym[0] + np.arange(nsym, dtype=np.uint32))).all())
    out = np.zeros((K, 128), np.uint32)
    out[:pnc].reshape(-1)[:ng] = pk  # ng == pnc * 128 except bits-gbits < 7
    out[pnc] = fc[:128]
    out[pnc + 1] = fc[128:]
    sp4 = sym[0::4] | (sym[1::4] << 8) | (sym[2::4] << 16) | (sym[3::4] << 24)
    out[pnc + 2, :64] = sp4
    return out.view(np.int32), lin


def _mt64_pair_kernel_hb(
    taba_ref,  # VMEM [K, G, 128] i32: block A's table stack
    tabb_ref,  # VMEM [K, G, 128] i32: block B's
    stream_ref,  # VMEM [C, G, 128] i32: interleaved half-chunk streams
    init_ref,  # VMEM [G, 128] u32
    rw_in_ref,  # VMEM [G, 128] i32
    out_ref,  # out VMEM [G, 128] i32
    states_out_ref,
    rw_out_ref,
    states_scr,
    rw_scr,
    *,
    g_rows: int,
    bits: int,
    s4c_slice: int,
    n: int = N,
    packed: bool = False,
    sym_lin: bool = False,
    gbits: int = 6,
    same_tab: bool = False,
):
    s4 = pl.program_id(1)

    @pl.when(s4 == 0)
    def _():
        states_scr[:] = init_ref[:]
        rw_scr[:] = rw_in_ref[:]

    mask_slot = jnp.uint32((1 << bits) - 1)
    consume_point = jnp.uint32(DECODE_CONSUME_POINT_16)
    w_chunks = stream_ref.shape[0]
    nc, _K = _hb_layout(bits)
    pnc, _Kp = _hb_packed_layout(bits, gbits)

    lane = jax.lax.broadcasted_iota(jnp.int32, (g_rows, L), 1)
    is_b = lane >= 64
    # n=32: one x32 block per half (lanes n.. of each half idle but the
    # row still advances TWO blocks per step — 2x the masked single path)
    active = (lane & 63) < n if n < 64 else None

    rwa = rw_scr[:, 0:1]
    rwb = rw_scr[:, 64:65]
    ca0 = (rwa >> 1) >> 6
    cb0 = (rwb >> 1) >> 6
    half_c0 = jnp.where(is_b, cb0, ca0)
    cmin = jnp.minimum(jnp.min(ca0), jnp.min(cb0))
    cmax = jnp.minimum(jnp.maximum(jnp.max(ca0), jnp.max(cb0)) + 3, w_chunks)

    def wbody(c, win):
        w0, w1, w2 = win
        rowc = stream_ref[c]
        w0 = jnp.where(half_c0 == c, rowc, w0)
        w1 = jnp.where(half_c0 + 1 == c, rowc, w1)
        w2 = jnp.where(half_c0 + 2 == c, rowc, w2)
        return w0, w1, w2

    zero_win = jnp.zeros((g_rows, 128), jnp.int32)
    window = jax.lax.fori_loop(cmin, cmax, wbody, (zero_win, zero_win, zero_win))

    if packed:
        pka = [taba_ref[c] for c in range(pnc)]
        pkb = [tabb_ref[c] for c in range(pnc)]
        fca_lo, fca_hi = taba_ref[pnc], taba_ref[pnc + 1]
        fcb_lo, fcb_hi = tabb_ref[pnc], tabb_ref[pnc + 1]
        spa, spb = taba_ref[pnc + 2], tabb_ref[pnc + 2]
    else:
        cpa, cpb = taba_ref[0], tabb_ref[0]
        bmloa = [pltpu.bitcast(taba_ref[1 + c], jnp.uint32) for c in range(nc)]
        bmhia = [pltpu.bitcast(taba_ref[1 + nc + c], jnp.uint32) for c in range(nc)]
        bmlob = [pltpu.bitcast(tabb_ref[1 + c], jnp.uint32) for c in range(nc)]
        bmhib = [pltpu.bitcast(tabb_ref[1 + nc + c], jnp.uint32) for c in range(nc)]
        fca_lo, fca_hi = taba_ref[1 + 2 * nc], taba_ref[2 + 2 * nc]
        fcb_lo, fcb_hi = tabb_ref[1 + 2 * nc], tabb_ref[2 + 2 * nc]
        spa, spb = taba_ref[3 + 2 * nc], tabb_ref[3 + 2 * nc]

    tri_r = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    tri_c = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    tri_m = (tri_r < tri_c) & ((tri_r >= 64) == (tri_c >= 64))
    if n < 64:
        # restrict ROWS only (inactive lanes must not count), but keep all
        # columns: tot_a/tot_b read columns 63/127, which accumulate the
        # half's full consume sum through the unmasked upper columns
        tri_m = tri_m & ((tri_r & 63) < n)
    if _PREFIX_TOT:
        # fused totals columns (see _mt64_pair_kernel): one [128,256] matmul
        # yields prefix AND per-half totals, killing the slice-broadcasts
        tot_m = (tri_r >= 64) == (tri_c >= 64)
        if n < 64:
            tot_m = tot_m & ((tri_r & 63) < n)
        tri_s8 = jnp.concatenate([tri_m, tot_m], axis=1).astype(jnp.int8)
    else:
        tri_s8 = tri_m.astype(jnp.int8)

    w_in_step = lane & 31
    wa = jnp.where(w_in_step < 16, w_in_step, w_in_step - 16)
    l0_pair = (
        4 * ((wa >> 2) & 1) + 8 * (wa & 3) + 32 * (wa >> 3)
        + jnp.where(w_in_step < 16, 0, 64)
    )

    def step_fn(i, carry):
        states, rw, acc = carry
        slot = states & mask_slot
        k6 = pltpu.bitcast(slot, jnp.int32) >> 6
        if packed:
            # ONE u32 per 2^gbits-slot group: rank base (9b) + up to 3
            # in-group start positions minus one (7b each, 127 = absent,
            # strict-> compare): rank = base + #(starts <= s_in).  Replaces
            # cp + bm lo/hi (2 + 4*nc gathers) with pnc gathers per half;
            # gbits=7 halves pnc again at B>=14 (every x-ray B14/15 block
            # passes the gate at 128-slot groups, measured).
            kg = pltpu.bitcast(slot, jnp.int32) >> gbits
            if pnc == 1:
                # same_tab: both halves share one histogram (device_plan
                # siblings) — A-side tables serve all 128 lanes, dropping
                # the B gathers and every where(is_b) on table reads
                if same_tab:
                    pv = jnp.take_along_axis(pka[0], kg, axis=1)
                else:
                    pv = jnp.where(
                        is_b,
                        jnp.take_along_axis(pkb[0], kg, axis=1),
                        jnp.take_along_axis(pka[0], kg, axis=1),
                    )
            else:
                kwi = kg & 127
                kc = kg >> 7
                pv = jnp.zeros((g_rows, L), jnp.int32)
                for c in range(pnc):
                    if same_tab:
                        pc = jnp.take_along_axis(pka[c], kwi, axis=1)
                    else:
                        pc = jnp.where(
                            is_b,
                            jnp.take_along_axis(pkb[c], kwi, axis=1),
                            jnp.take_along_axis(pka[c], kwi, axis=1),
                        )
                    pv = jnp.where(kc == c, pc, pv)
            pvu = pltpu.bitcast(pv, jnp.uint32)
            s_in = slot & jnp.uint32((1 << gbits) - 1)
            hit1 = s_in > ((pvu >> jnp.uint32(9)) & jnp.uint32(0x7F))
            hit2 = s_in > ((pvu >> jnp.uint32(16)) & jnp.uint32(0x7F))
            hit3 = s_in > (pvu >> jnp.uint32(23))
            rank = (
                pltpu.bitcast(pvu & jnp.uint32(0x1FF), jnp.int32)
                + hit1.astype(jnp.int32) + hit2.astype(jnp.int32) + hit3.astype(jnp.int32)
            )
        else:
            j = k6 >> 2
            if same_tab:
                cpv = pltpu.bitcast(jnp.take_along_axis(cpa, j, axis=1), jnp.uint32)
            else:
                cpv = pltpu.bitcast(
                    jnp.where(is_b, jnp.take_along_axis(cpb, j, axis=1), jnp.take_along_axis(cpa, j, axis=1)),
                    jnp.uint32,
                )
            sub = k6 & 3
            base = cpv & jnp.uint32(0x1FF)
            d = jnp.where(
                sub == 1,
                (cpv >> jnp.uint32(9)) & jnp.uint32(0x7F),
                jnp.where(
                    sub == 2,
                    (cpv >> jnp.uint32(16)) & jnp.uint32(0xFF),
                    jnp.where(sub == 3, cpv >> jnp.uint32(24), jnp.uint32(0)),
                ),
            )
            c0v = pltpu.bitcast(base + d, jnp.int32)

            kw = k6 & 127
            kwu = pltpu.bitcast(kw, jnp.uint32)
            if nc == 1:
                if same_tab:
                    lov = jnp.take_along_axis(bmloa[0], kwu, axis=1)
                    hiv = jnp.take_along_axis(bmhia[0], kwu, axis=1)
                else:
                    lov = jnp.where(is_b, jnp.take_along_axis(bmlob[0], kwu, axis=1), jnp.take_along_axis(bmloa[0], kwu, axis=1))
                    hiv = jnp.where(is_b, jnp.take_along_axis(bmhib[0], kwu, axis=1), jnp.take_along_axis(bmhia[0], kwu, axis=1))
            else:
                kc = k6 >> 7
                lov = jnp.zeros((g_rows, L), jnp.uint32)
                hiv = jnp.zeros((g_rows, L), jnp.uint32)
                for c in range(nc):
                    sel = kc == c
                    if same_tab:
                        lo_c = jnp.take_along_axis(bmloa[c], kwu, axis=1)
                        hi_c = jnp.take_along_axis(bmhia[c], kwu, axis=1)
                    else:
                        lo_c = jnp.where(is_b, jnp.take_along_axis(bmlob[c], kwu, axis=1), jnp.take_along_axis(bmloa[c], kwu, axis=1))
                        hi_c = jnp.where(is_b, jnp.take_along_axis(bmhib[c], kwu, axis=1), jnp.take_along_axis(bmhia[c], kwu, axis=1))
                    lov = jnp.where(sel, lo_c, lov)
                    hiv = jnp.where(sel, hi_c, hiv)
            s6 = slot & jnp.uint32(63)
            in_lo = s6 < jnp.uint32(32)
            mlo = jnp.where(in_lo, (jnp.uint32(2) << s6) - jnp.uint32(2), jnp.uint32(0xFFFFFFFE))
            mhi = jnp.where(in_lo, jnp.uint32(0), (jnp.uint32(2) << (s6 & jnp.uint32(31))) - jnp.uint32(1))
            rank = c0v + pltpu.bitcast(
                jax.lax.population_count(lov & mlo) + jax.lax.population_count(hiv & mhi), jnp.int32
            )

        if same_tab:
            fcv = pltpu.bitcast(gather256(fca_lo, fca_hi, rank), jnp.uint32)
        else:
            fcv = pltpu.bitcast(
                jnp.where(is_b, gather256(fcb_lo, fcb_hi, rank), gather256(fca_lo, fca_hi, rank)),
                jnp.uint32,
            )
        freq = fcv & jnp.uint32(0xFFFF)
        cum = fcv >> jnp.uint32(16)
        if sym_lin:
            # contiguous alphabet: sym = rank + per-half first symbol (the
            # sp row holds the broadcast first_sym) — no sp4 gather at all
            sym = rank + (spa if same_tab else jnp.where(is_b, spb, spa))
        else:
            r4 = rank >> 2
            if same_tab:
                s4v = pltpu.bitcast(jnp.take_along_axis(spa, r4, axis=1), jnp.uint32)
            else:
                s4v = pltpu.bitcast(
                    jnp.where(is_b, jnp.take_along_axis(spb, r4, axis=1), jnp.take_along_axis(spa, r4, axis=1)),
                    jnp.uint32,
                )
            sym = pltpu.bitcast((s4v >> pltpu.bitcast((rank & 3) << 3, jnp.uint32)) & jnp.uint32(0xFF), jnp.int32)

        new_states = (states >> jnp.uint32(bits)) * freq + slot - cum
        if n < 64:
            new_states = jnp.where(active, new_states, states)
            consume = (new_states < consume_point) & active
        else:
            consume = new_states < consume_point
        states = new_states

        pt = jnp.dot(consume.astype(jnp.int8), tri_s8, preferred_element_type=jnp.int32)
        if _PREFIX_TOT:
            prefix = pt[:, :128]
            tot = pt[:, 128:]
        else:
            prefix = pt
            tot_a = prefix[:, 63:64] + consume[:, 63:64].astype(jnp.int32)
            tot_b = prefix[:, 127:128] + consume[:, 127:128].astype(jnp.int32)
            tot = jnp.where(is_b, tot_b, tot_a)

        widx = rw + prefix
        rel = (widx >> 1) - (half_c0 << 6)
        hsel = rel >> 6
        within = (lane & 64) | (rel & 63)
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

    shift_i = (lane >> 5) * 8
    b0 = (jnp.take_along_axis(acc, l0_pair, axis=1) >> shift_i) & 0xFF
    b1 = (jnp.take_along_axis(acc, l0_pair + 1, axis=1) >> shift_i) & 0xFF
    b2 = (jnp.take_along_axis(acc, l0_pair + 2, axis=1) >> shift_i) & 0xFF
    b3 = (jnp.take_along_axis(acc, l0_pair + 3, axis=1) >> shift_i) & 0xFF
    out_ref[:] = b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)


def _pairs_hb_call(taba, tabb, stream, init, rw0, *, g_rows, n_groups, s4c, w_chunks, bits, n=N, packed=False, sym_lin=False, gbits=6, same_tab=False, interpret=False):
    """The B>12 paired pallas_call over n_groups row groups (the unit a
    shard_map shards: each device runs its slice of the groups)."""
    K, npad = taba.shape[0], taba.shape[1]
    kernel = functools.partial(
        _mt64_pair_kernel_hb, g_rows=g_rows, bits=bits, s4c_slice=s4c, n=n,
        packed=packed, sym_lin=sym_lin, gbits=gbits, same_tab=same_tab,
    )
    row_spec = pl.BlockSpec((g_rows, 128), lambda g, s4: (g, 0), memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec((K, g_rows, 128), lambda g, s4: (0, g, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_groups, s4c),
        in_specs=[tab_spec, tab_spec]
        + [
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
    )(taba, tabb, stream, init, rw0)


@functools.partial(jax.jit, static_argnames=("g_rows", "n_groups", "s4c", "w_chunks", "bits", "n", "packed", "sym_lin", "gbits", "same_tab", "interpret"))
def _decode_pairs_hb(taba, tabb, stream, init, *, g_rows, n_groups, s4c, w_chunks, bits, n=N, packed=False, sym_lin=False, gbits=6, same_tab=False, interpret=False):
    """Paired decode for B=13..15 (no slicing: high-B buckets are few-row)."""
    npad = taba.shape[1]
    out, _states, _rw = _pairs_hb_call(
        taba, tabb, stream, init, jnp.zeros((npad, 128), jnp.int32),
        g_rows=g_rows, n_groups=n_groups, s4c=s4c, w_chunks=w_chunks,
        bits=bits, n=n, packed=packed, sym_lin=sym_lin, gbits=gbits,
        same_tab=same_tab, interpret=interpret,
    )
    return [(out, jnp.arange(npad, dtype=jnp.int32))]


def build_pair_arrays_hb(
    kernel_blocks: list,
    w_counts: list[int],
    stream: np.ndarray,
    bits: int,
    n_dev: int = 1,
    n: int = N,
) -> tuple[list[np.ndarray], dict] | None:
    """Operands for the B>12 paired kernel: per-half [K, 128] table stacks
    ([K, npad, 128], chunk-leading) + the same interleaved stream layout."""
    nbp = len(kernel_blocks) // 2 * 2
    if nbp < 2:
        return None
    pairs = nbp // 2
    size0 = kernel_blocks[0].size
    slots = [-(-w // 2) for w in w_counts[:nbp]]
    w_chunks = max(2, -(-max(slots) // 64))
    # high-B planner blocks are long (256 KiB..1 MiB) and few: a deeper
    # VMEM stream budget buys rows, and their cursor spread stays small
    # (B14 4.4 -> 6.4 GiB/s at 48 MiB)
    g_cap = max(_PAIR_TILE_BYTES, 48 << 20) // (w_chunks * 128 * 4)
    g_cap = min(int(_os.environ.get("HSRANS_PAIR_GCAP", "256")), g_cap // 8 * 8)
    if g_cap < 8:
        return None
    n_grp = -(-(-(-pairs // g_cap)) // n_dev) * n_dev
    g_rows = max(8, -(-(-(-pairs // n_grp)) // 8) * 8)
    npad = n_grp * g_rows

    rts = []
    for i in range(nbp):
        hist = complete_hist(kernel_blocks[i].freq, bits)
        if hist is None:
            return None
        rts.append(make_rank_tables(hist))
    # every pair shares one histogram (device_plan siblings, paired by the
    # caller's same-hist ordering) -> the kernel reads only A-side tables
    same_tab = _USE_SAMETAB and all(
        np.array_equal(kernel_blocks[2 * p].freq, kernel_blocks[2 * p + 1].freq)
        for p in range(pairs)
    )
    # packed-starts layout engages only when EVERY block in the bucket
    # fits (<= 3 non-zero-position starts per 2^gbits-slot group); 128-slot
    # groups tried first at B>=14 (pnc halves: 2 fewer gathers+selects per
    # step); 32-slot groups last (pnc doubles, but even pnc=2 packed beats
    # the bm fallback by a gather — B13 dense alphabets fail the 64-slot
    # gate at ~2 starts/group average); sym_lin only when every alphabet
    # is contiguous.
    # HSRANS_NO_HBPACK forces the bm layout; HSRANS_NO_HBPACK128 the
    # 64-slot groups (safe-mode gates, same family as HSRANS_NO_PAIR).
    stacks = None
    gbits = 6
    if _os.environ.get("HSRANS_NO_HBPACK") != "1":
        gb_try = [6, 5] if bits < 14 or _os.environ.get("HSRANS_NO_HBPACK128") == "1" else [7, 6, 5]
        for gbits in gb_try:
            stacks = []
            for rt in rts:
                s = _hb_tables_packed(rt, bits, gbits)
                if s is None:
                    stacks = None  # one gate failure kills the layout; skip the rest
                    break
                stacks.append(s)
            if stacks is not None:
                break
    packed = stacks is not None
    sym_lin = packed and all(lin for _stk, lin in stacks)
    nc, K = _hb_packed_layout(bits, gbits) if packed else _hb_layout(bits)
    taba = np.zeros((K, npad, 128), np.int32)
    tabb = np.zeros((K, npad, 128), np.int32)
    init = np.full((npad, 128), DECODE_CONSUME_POINT_16, np.uint32)
    stream_cm = np.zeros((w_chunks, npad, 128), np.uint32)
    for i in range(nbp):
        b = kernel_blocks[i]
        p, hi = divmod(i, 2)
        if packed:
            stk = stacks[i][0].copy()
            if sym_lin:
                first_sym = int(stk.view(np.uint32)[nc + 2, 0] & 0xFF)
                stk[nc + 2, :] = first_sym
            (tabb if hi else taba)[:, p] = stk
        else:
            (tabb if hi else taba)[:, p] = _hb_tables(rts[i], bits)
        words = stream[b.word_start : b.word_start + w_counts[i]].astype(np.uint32)
        if words.size & 1:
            words = np.concatenate([words, np.zeros(1, np.uint32)])
        padded = np.zeros(w_chunks * 64, np.uint32)
        padded[: words.size // 2] = words[0::2] | (words[1::2] << np.uint32(16))
        stream_cm[:, p, 64 * hi : 64 * hi + 64] = padded.reshape(w_chunks, 64)
        init[p, 64 * hi : 64 * hi + n] = b.states

    arrs = [taba, tabb, stream_cm.view(np.int32), init]
    kw = dict(g_rows=g_rows, n_groups=n_grp, s4c=size0 // (4 * n), w_chunks=w_chunks, bits=bits, n=n, packed=packed, sym_lin=sym_lin, gbits=gbits, same_tab=same_tab)
    return arrs, kw
