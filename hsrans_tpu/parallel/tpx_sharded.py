"""Mesh-sharded tpx encode/decode: megablocks data-parallel over chips.

tpx megablocks are fully self-contained (own state snapshots, per-tile
histograms, padded per-row streams — ops/tpx.py), the TPU-native analog of
the reference's independently decodable mt blocks
(/root/reference/src/mt_rANS32x64_16w_decode.cpp:137-265).  Where the
reference fans blocks out to a CPU thread pool, here the mega axis is
sharded over a `jax.sharding.Mesh` axis with `shard_map`; each shard runs
the same Pallas kernels (kernels/tpx_decode.py, kernels/tpx_encode.py) on
its local megas via `lax.scan`, and the in-order gather of decoded shards
is the `thread_pool_await` equivalent (XLA inserts the collective over
ICI/DCN at the shard_map boundary).

Shapes are padded to the fleet: megas to a multiple of the axis size
(dummy megas decode zero valid bytes), streams to the widest mega.  The
trailing partial mega (fewer tiles) is handled on the caller's device
alone — it is at most one of M.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import tpx_decode as KD
from ..kernels import tpx_encode as KE
from ..ops.tpx import (
    TpxParams,
    _write_mega,
    make_tile_hist,
    tpx_header,
    tpx_parse,
)


def _pad_megas(arrs: list[np.ndarray], multiple: int) -> int:
    """Pad the leading mega axis of every array to a multiple; returns M."""
    m = arrs[0].shape[0]
    return -(-m // multiple) * multiple


@partial(
    jax.jit,
    static_argnames=("rows", "n_tiles", "w_slots", "steps", "bits", "mesh", "axis", "interpret"),
)
def _decode_sharded(vlens, c0, bm, t1a, t1b, t2a, t2b, stream, states, *, rows, n_tiles, w_slots, steps, bits, mesh, axis, interpret):
    kw = dict(rows=rows, n_tiles=n_tiles, w_slots=w_slots, steps=steps, bits=bits, interpret=interpret)

    def local(vlens, c0, bm, t1a, t1b, t2a, t2b, stream, states):
        def one(xs):
            vl, a, b, c, d, e, f, st, init = xs
            return KD._decode_mega(vl, a, b, c, d, e, f, st, init, **kw)

        return jax.lax.map(one, (vlens, c0, bm, t1a, t1b, t2a, t2b, stream, states))

    if mesh is None:
        return local(vlens, c0, bm, t1a, t1b, t2a, t2b, stream, states)

    from jax.sharding import PartitionSpec as P

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis),) * 9,
        out_specs=P(axis),
        check_vma=False,
    )
    return fn(vlens, c0, bm, t1a, t1b, t2a, t2b, stream, states)


def tpx_decode_device(
    blob: bytes | np.ndarray,
    mesh: jax.sharding.Mesh | None = None,
    axis: str | tuple[str, ...] = "dp",
    interpret: bool = False,
) -> bytes | None:
    """Decode a tpx blob with full megablocks sharded across the mesh."""
    parsed = tpx_parse(blob)
    if parsed is None:
        return None
    p, length, megas = parsed
    if p.lanes != 128 or any(m.steps % 4 or m.rows % 8 or m.rows < 8 for m in megas) or (1 << p.bits) // 32 > 1024:
        return None
    out = np.zeros(length, dtype=np.uint8)
    from .sharded import axis_size

    n_dev = axis_size(mesh, axis)

    # group megas by geometry: v2 blobs have one (rows, steps, tiles) so all
    # full megas land in one group; v3 (adaptive) blobs form one group per
    # region geometry.  Groups of >= 2 megas batch through the sharded
    # kernel; singletons (e.g. the trailing partial mega) decode locally.
    groups: dict[tuple[int, int, int], list] = {}
    for m in megas:
        groups.setdefault((m.rows, m.steps, m.n_tiles), []).append(m)

    rest = []
    for (rows, steps, T), ms in sorted(groups.items()):
        if len(ms) < 2:
            rest.extend(ms)
            continue
        M = -(-len(ms) // n_dev) * n_dev
        w_max = max(m.w_slots for m in ms)
        vlens = np.zeros((M, 1, 1), np.int32)
        c0 = np.zeros((M, T, 8, 128), np.int32)
        bm = np.zeros((M, T, 8, 128), np.int32)
        t1a = np.zeros((M, T, 8, 128), np.int32)
        t1b = np.zeros((M, T, 8, 128), np.int32)
        t2a = np.zeros((M, T, 8, 128), np.int32)
        t2b = np.zeros((M, T, 8, 128), np.int32)
        stream = np.zeros((M, T, rows, w_max), np.int32)
        states = np.full((M, rows, p.lanes), 1 << 15, np.uint32)
        for i, m in enumerate(ms):
            vlens[i, 0, 0] = min(length - m.base, m.span)
            tabs = KD.mega_dec_tables(m.freqs, p.bits)
            if tabs is None:
                return None
            c0[i], bm[i], t1a[i], t1b[i], t2a[i], t2b[i] = tabs
            stream[i, :, :, : m.w_slots] = m.stream.view(np.int32)
            states[i] = m.states
        # dummy pad megas keep freq tables invalid-but-harmless (vlen = 0)

        packed = _decode_sharded(
            *[jnp.asarray(x) for x in (vlens, c0, bm, t1a, t1b, t2a, t2b, KD.chunk_major(stream), states)],
            rows=rows,
            n_tiles=T,
            w_slots=w_max,
            steps=steps,
            bits=p.bits,
            mesh=mesh,
            axis=axis,
            interpret=interpret,
        )
        packed = np.asarray(packed)  # [M, T, rows, (steps/4)*128] i32, wire order
        for i, m in enumerate(ms):
            mega_bytes = packed[i].reshape(-1).view(np.uint8)
            n_valid = min(length - m.base, mega_bytes.size)
            out[m.base : m.base + n_valid] = mega_bytes[:n_valid]

    for m in rest:  # singleton geometry groups: decode locally
        mp = TpxParams(bits=p.bits, rows=m.rows, lanes=p.lanes, steps=m.steps, tiles=m.n_tiles)
        sub = tpx_header(0, mp)
        sub[8:16] = (min(length - m.base, m.span)).to_bytes(8, "little")
        _write_mega(sub, m.n_tiles, m.w_slots, m.states, list(m.freqs), m.counts, m.stream)
        sub[16:24] = len(sub).to_bytes(8, "little")
        part = KD.tpx_decode_tpu(bytes(sub), interpret=interpret)
        if part is None:
            return None
        out[m.base : m.base + len(part)] = np.frombuffer(part, np.uint8)
    return out.tobytes()


@partial(
    jax.jit,
    static_argnames=("rows", "s4c", "n_tiles", "bits", "steps", "wcap", "mesh", "axis", "interpret"),
)
def _encode_sharded(vlens, tabs, packed, wq, *, rows, s4c, n_tiles, bits, steps, wcap, mesh, axis, interpret):
    kw_a = dict(rows=rows, s4c=s4c, n_tiles=n_tiles, bits=bits, interpret=interpret)
    kw_b = dict(rows=rows, rc=min(128, rows), steps=steps, wcap=wcap, n_tiles=n_tiles, interpret=interpret)

    def local(vlens, tabs, packed, wq):
        def one(xs):
            vl, tb, pk, w = xs
            win, cntp, states = KE._encode_mega(vl, tb[0], tb[1], tb[2], tb[3], tb[4], tb[5], pk, **kw_a)
            cnt = KE._unpack_counts(cntp, s4c=s4c)
            stream = KE._concat_mega(w, win, cnt, **kw_b)
            return stream, jnp.sum(cnt, axis=2), states

        return jax.lax.map(one, (vlens, tabs, packed, wq))

    if mesh is None:
        return local(vlens, tabs, packed, wq)

    from jax.sharding import PartitionSpec as P

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis),) * 4,
        out_specs=(P(axis),) * 3,
        check_vma=False,
    )
    return fn(vlens, tabs, packed, wq)


def tpx_encode_device(
    data: bytes | np.ndarray,
    bits: int = 12,
    p: TpxParams | None = None,
    mesh: jax.sharding.Mesh | None = None,
    axis: str | tuple[str, ...] = "dp",
    interpret: bool = False,
) -> bytes:
    """Mesh-sharded tpx encode; bit-identical to ops.tpx.tpx_encode.

    Full megablocks are sharded over the mesh axis; the trailing partial
    mega (if any) is encoded unsharded.  The concat pass runs at full
    stream capacity per mega (w is not known until counts return), then
    each mega's stream is cut to its own exact w for the wire.
    """
    p = p or TpxParams(bits=bits)
    bits = p.bits
    arr = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else np.asarray(data, dtype=np.uint8)
    length = arr.size
    s4c = p.steps // 4
    wcap = -(-(p.steps * p.lanes // 2) // 128) * 128
    from .sharded import axis_size

    n_dev = axis_size(mesh, axis)

    n_full = length // p.mega_bytes
    out = tpx_header(length, p)

    if n_full:
        M = -(-n_full // n_dev) * n_dev
        T = p.tiles
        vlens = np.zeros((M, 1, 1), np.int32)
        vlens[:n_full, 0, 0] = p.mega_bytes
        packed = np.zeros((M, T, p.rows, s4c * p.lanes), np.int32)
        packed[:n_full] = arr[: n_full * p.mega_bytes].view("<i4").reshape(n_full, T, p.rows, s4c * p.lanes)
        tabs = np.zeros((M, 6, T, 8, 128), np.int32)
        tile_bytes = p.rows * p.steps * p.lanes
        all_hists = []
        for i in range(n_full):
            hists = [
                make_tile_hist(arr[i * p.mega_bytes + t * tile_bytes : i * p.mega_bytes + (t + 1) * tile_bytes], bits)
                for t in range(T)
            ]
            all_hists.append(hists)
            for t in range(T):
                et = KE.make_enc_tables(hists[t])
                keys = ("fc", "m") if bits <= 12 else ("fc", "m", "l")
                for j, key in enumerate(keys):
                    tabs[i, 2 * j, t, 0] = et[key][:128]
                    tabs[i, 2 * j + 1, t, 0] = et[key][128:]
        wq = np.full((M, 1, 1), wcap // 128, np.int32)

        stream_full, counts, states = _encode_sharded(
            jnp.asarray(vlens),
            jnp.asarray(tabs),
            jnp.asarray(packed),
            jnp.asarray(wq),
            rows=p.rows,
            s4c=s4c,
            n_tiles=T,
            bits=bits,
            steps=p.steps,
            wcap=wcap,
            mesh=mesh,
            axis=axis,
            interpret=interpret,
        )
        counts = np.asarray(counts)
        stream_full = np.asarray(stream_full)
        states = np.asarray(states)
        for i in range(n_full):
            max_words = int(counts[i].max())
            w_slots = max(128, -(-(-(-max_words // 2)) // 128) * 128)
            _write_mega(
                out,
                T,
                w_slots,
                states[i],
                [h.symbol_count for h in all_hists[i]],
                counts[i].astype(np.uint16),
                stream_full[i, :, :, :w_slots].astype("<i4").view(np.uint32),
            )

    if length > n_full * p.mega_bytes or length == 0:
        tail_blob = KE.tpx_encode_tpu(arr[n_full * p.mega_bytes :], p=p, interpret=interpret)
        out += tail_blob[len(tpx_header(0, p)) :]  # strip the sub-header

    out[16:24] = len(out).to_bytes(8, "little")
    return bytes(out)
