"""Pallas TPU kernels: position-gather sparse convolution.

Replaces the one-hot compare+matmul alignment of ops/pallas_sparse.py with a
two-kernel scheme that attacks its two structural wastes (PERF.md round 4:
per-tap compare volume ~300x the conv's useful FLOPs at L0; C=16 pads the
MXU M dim 8x):

  1. ``positions_kernel`` — computed ONCE per level and shared by every conv
     on that level (5 subm convs at L0 + the strided conv + the training
     dW): for each of the NINE 2D tap groups (dy, dx) it computes the
     window-relative insertion rank of ``tgt_id + D_g`` by a single compare
     plane + an MXU iota/ones matmul. The 27 3D taps collapse to 9 because
     the z-neighbors of an integer id are derivable from the center rank
     alone: id-1 can only sit at rank-1, id+1 at rank+hit (left-insertion
     rank invariant) — checked exactly against the gathered window ids.
  2. ``conv_kernel`` — per conv: NO compare planes and NO gather matmuls.
     Neighbor features are fetched by 128-lane dynamic permutes
     (``jnp.take_along_axis``, Mosaic's within-tile gather — f32 only; the
     bf16 form crashes the Mosaic compiler, hence the f32 window) over a
     narrow BAND of the resident window: ranks are monotone per tap group,
     so the 128 targets of one output tile read a <= BAND*128-wide slice
     (measured span p99.5 ~190, max ~250 at L0 ring occupancy). The only
     MXU work left is the single (Cout, 27*Cin) x (27*Cin, W) weight
     matmul per block.

Exactness contract (same discipline as the windowed kernels): every
dropped-neighbor condition is COUNTED — union-window span overflow (XLA
prelude, as before) plus band overflow (real-target hits whose rank falls
outside their tile's band) — and surfaced in the returned overflow scalar;
tests and the bench gate on zero.

Parity target: spconv SubMConv3d/SparseConv3d as used by
/root/reference/pcdet/models/backbones_3d/spconv_backbone.py:70-184.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALIGN = 512


def group_center_deltas(deltas27):
    """K zyx-C-order tap deltas (K % 3 == 0) -> the K/3 group-center (dz=0)
    deltas, plus the static check that each group's z-taps are consecutive
    ids.

    _kernel_offsets order: k = zi*G + yi*kx + xi with dz = zi-1 — so group
    g has taps k = g, G+g, 2G+g at deltas D-1, D, D+1 (true for any
    (3, ky, kx) kernel over guard-banded yxz ids)."""
    d = np.asarray(deltas27)
    assert d.shape[0] % 3 == 0
    g = d.shape[0] // 3
    centers = d[g:2 * g]
    assert np.all(d[0:g] == centers - 1) and np.all(d[2 * g:] == centers + 1), \
        "tap deltas are not z-consecutive; posgather needs a k3 z axis"
    return centers.astype(np.int32)


def reorder_weights_groups(weights27):
    """(K, Cin, Cout) zyx-C-order -> (K/3, 3, Cin, Cout) grouped [g, zi]."""
    k, cin, cout = weights27.shape
    assert k % 3 == 0
    return jnp.transpose(
        weights27.reshape(3, k // 3, cin, cout), (1, 0, 2, 3))


def _positions_kernel(lo_ref, tap_lo_ref, hr_ref, tgt_hbm, ids_hbm,
                      gd_ref, pos_ref, win_ids, tgt_buf, sem_i, sem_t, *,
                      tap_window=None, g_pad=None):
    """Grid (NB,). pos_ref block: (G, W) int32 — hit ? rank : ~rank, ranks
    relative to the block's union window (tap sub-window start added back).
    """
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    s = win_ids.shape[2]
    g_n = gd_ref.shape[0]
    w_blk = tgt_buf.shape[2]
    slot = jax.lax.rem(i, 2)

    def copies(j, sl):
        lo_j = pl.multiple_of(lo_ref[j], ALIGN)
        t0_j = pl.multiple_of(j * w_blk, ALIGN)
        return (
            pltpu.make_async_copy(
                ids_hbm.at[:, pl.ds(lo_j, s)], win_ids.at[sl], sem_i.at[sl]),
            pltpu.make_async_copy(
                tgt_hbm.at[:, pl.ds(t0_j, w_blk)], tgt_buf.at[sl],
                sem_t.at[sl]),
        )

    @pl.when((i == 0) & (hr_ref[0] != 0))
    def _():
        for cp in copies(0, 0):
            cp.start()

    @pl.when((i + 1 < nb) & (hr_ref[jnp.minimum(i + 1, nb - 1)] != 0))
    def _():
        for cp in copies(i + 1, 1 - slot):
            cp.start()

    dead = hr_ref[i] == 0

    @pl.when(dead)
    def _():
        # all-sentinel padding block: no neighbors exist; emit miss ranks
        pos_ref[:, :] = jnp.full(
            (pos_ref.shape[0], pos_ref.shape[1]), -1, jnp.int32)

    @pl.when(jnp.logical_not(dead))
    def _():
        for cp in copies(i, slot):
            cp.wait()
        _positions_block(i, slot, tap_lo_ref, gd_ref, pos_ref, win_ids,
                         tgt_buf, tap_window=tap_window, g_pad=g_pad)


def _positions_block(i, slot, tap_lo_ref, gd_ref, pos_ref, win_ids,
                     tgt_buf, *, tap_window, g_pad):
    s = win_ids.shape[2]
    g_n = gd_ref.shape[0]
    w_blk = tgt_buf.shape[2]
    tgt = tgt_buf[slot, 0, :]

    for g in range(g_n):
        want = tgt + gd_ref[g, 0]
        if tap_window is None:
            wi = win_ids[slot, 0, :]
            off = 0
        else:
            off = pl.multiple_of(tap_lo_ref[i, g], 128)
            wi = win_ids[slot, 0, pl.ds(off, tap_window)]
        lt = (wi[:, None] < want[None, :])
        eq = (wi[:, None] == want[None, :])
        # rank/hit via one MXU matmul: [1s over lt; 1s over eq] — shaped as
        # a (2, S') x (S', W) product of the stacked masks with ones is the
        # same as column sums; do it as two f32 column-sums on the MXU by
        # multiplying the mask matrix with a ones vector. Simpler and
        # exact: integer column-sum on the VPU.
        rank = jnp.sum(lt.astype(jnp.int32), axis=0) + off
        hit = jnp.sum(eq.astype(jnp.int32), axis=0) > 0
        pos_ref[g, :] = jnp.where(hit, rank, ~rank)
    if g_pad is not None:
        for g in range(g_n, g_pad):
            pos_ref[g, :] = jnp.zeros((w_blk,), jnp.int32)


@functools.partial(jax.jit, static_argnames=("block", "window", "tap_window",
                                             "interpret"))
def _positions_call(ids2, tgt2, lo, tap_lo, has_real, gdeltas, block,
                    window, tap_window=None, interpret=False):
    """ids2 (1, V), tgt2 (NB, block), lo (NB,), tap_lo (NB, G),
    has_real (NB,) int32 (0 = all-sentinel block, fully skipped),
    gdeltas (G,) -> pos (G, Vt) int32 signed-hit, window-relative ranks."""
    nb = tgt2.shape[0]
    vt = nb * block
    g_n = gdeltas.shape[0]
    g_pad = -(-g_n // 8) * 8  # sublane-tile aligned output rows

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,          # lo, tap_lo, has_real
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),           # tgt ids
            pl.BlockSpec(memory_space=pl.ANY),           # src ids
            pl.BlockSpec((g_n, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),          # group deltas
        ],
        out_specs=pl.BlockSpec((g_pad, block), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 1, window), jnp.int32),
            pltpu.VMEM((2, 1, block), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_positions_kernel, tap_window=tap_window,
                          g_pad=g_pad),
        out_shape=jax.ShapeDtypeStruct((g_pad, vt), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(lo, tap_lo, has_real, tgt2.reshape(1, -1), ids2, gdeltas[:, None])


def _conv_kernel(starts_ref, lo_ref, base_ref, hr_ref, flags_ref,
                 tgt_hbm, ids_hbm, feats_hbm, pos_hbm, gd_ref, w_ref,
                 *rest, band: int, epilogue=False, relu=False,
                 sentinel=None, skip_dead=True):
    """Grid (NB,). Per block: band-taa gather of all 27 taps from the f32
    window + ONE weight matmul.

    starts_ref: (NB, G*OT) SMEM 128-aligned band starts (window-relative)
    lo_ref: (NB,) SMEM window starts; base_ref: (NB,) SMEM first window id
    tgt_hbm (1, Vt) / ids_hbm (1, V) int32; feats_hbm (C, V) f32
    pos_hbm (G, Vt) int32 signed-hit window-relative ranks
    w_ref: (Cout, K*C) VMEM (group-major: row block g*3C + zi*C)
    [scale, shift (Cout, 1) when epilogue]
    out_ref (Cout, W); scratches: win_ids (2, 1, S) i32,
    win_feats (2, C, S) f32, tgt_buf (2, 1, W) i32, pos_buf (2, G, W) i32,
    relw (C+8, S) f32 (feature rows + rebased-id row), gbuf (27C, W) bf16.
    """
    if epilogue:
        (scale_ref, shift_ref, out_ref, win_ids, win_feats, tgt_buf,
         pos_buf, relw, gbuf, sem_i, sem_f, sem_t, sem_p) = rest
    else:
        (out_ref, win_ids, win_feats, tgt_buf, pos_buf, relw, gbuf,
         sem_i, sem_f, sem_t, sem_p) = rest
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    s = win_ids.shape[2]
    c = win_feats.shape[1]
    cg = relw.shape[0]
    g_n = gd_ref.shape[0]
    w_blk = tgt_buf.shape[2]
    ot_n = w_blk // 128
    bw = band * 128
    depth = win_feats.shape[0]           # DMA pipeline slots (2 or 3)
    slot = jax.lax.rem(i, depth)

    def copies(j, sl):
        lo_j = pl.multiple_of(lo_ref[j], ALIGN)
        t0_j = pl.multiple_of(j * w_blk, ALIGN)
        return (
            pltpu.make_async_copy(
                ids_hbm.at[:, pl.ds(lo_j, s)], win_ids.at[sl], sem_i.at[sl]),
            pltpu.make_async_copy(
                feats_hbm.at[:, pl.ds(lo_j, s)], win_feats.at[sl],
                sem_f.at[sl]),
            pltpu.make_async_copy(
                tgt_hbm.at[:, pl.ds(t0_j, w_blk)], tgt_buf.at[sl],
                sem_t.at[sl]),
            pltpu.make_async_copy(
                pos_hbm.at[:, pl.ds(t0_j, w_blk)], pos_buf.at[sl],
                sem_p.at[sl]),
        )

    def live(j):
        return hr_ref[jnp.minimum(j, nb - 1)] != 0 if skip_dead \
            else (i == i)

    # warm-up: fill depth-1 slots ahead; steady state keeps depth-1 window
    # DMAs in flight so the per-block strided window fetch (latency-bound:
    # the conv cost measured LINEAR in window at 2-deep) overlaps compute
    @pl.when(i == 0)
    def _():
        for j in range(depth - 1):
            @pl.when((j < nb) & live(j))
            def _(j=j):
                for cp in copies(j, j % depth):
                    cp.start()

    @pl.when((i + depth - 1 < nb) & live(i + depth - 1))
    def _():
        for cp in copies(i + depth - 1,
                         jax.lax.rem(i + depth - 1, depth)):
            cp.start()

    if not skip_dead:
        _conv_block(i, slot, starts_ref, base_ref, flags_ref, gd_ref,
                    w_ref,
                    scale_ref if epilogue else None,
                    shift_ref if epilogue else None,
                    out_ref, win_ids, win_feats, tgt_buf, pos_buf, relw,
                    gbuf, copies, band=band, epilogue=epilogue, relu=relu,
                    sentinel=sentinel)
        return

    dead = hr_ref[i] == 0

    @pl.when(dead)
    def _():
        # all-sentinel padding block: outputs are zero by definition
        out_ref[:, :] = jnp.zeros(
            (out_ref.shape[0], out_ref.shape[1]), out_ref.dtype)

    @pl.when(jnp.logical_not(dead))
    def _():
        _conv_block(i, slot, starts_ref, base_ref, flags_ref, gd_ref,
                    w_ref,
                    scale_ref if epilogue else None,
                    shift_ref if epilogue else None,
                    out_ref, win_ids, win_feats, tgt_buf, pos_buf, relw,
                    gbuf, copies, band=band, epilogue=epilogue, relu=relu,
                    sentinel=sentinel)


def _conv_block(i, slot, starts_ref, base_ref, flags_ref, gd_ref, w_ref,
                scale_ref, shift_ref, out_ref, win_ids, win_feats, tgt_buf,
                pos_buf, relw, gbuf, copies, *, band, epilogue, relu,
                sentinel):
    s = win_ids.shape[2]
    c = win_feats.shape[1]
    cg = relw.shape[0]
    g_n = gd_ref.shape[0]
    w_blk = tgt_buf.shape[2]
    ot_n = w_blk // 128
    bw = band * 128

    for cp in copies(i, slot):
        cp.wait()

    base = base_ref[i]
    # window ids relative to the block's first window id — the window only
    # spans a few guard-banded y-rows (< 2^24), so the rebased ids are
    # EXACT in f32, the only dtype Mosaic's dynamic gather accepts. The
    # (feats + id) rows are STACKED x3 so the three z-probes (rank-1,
    # rank, rank+hit) ride ONE dynamic gather per band tile (3x fewer
    # Mosaic ops — the flagship program was crashing the remote compile
    # helper's per-request budget).
    cg1 = relw.shape[0] // 3
    relw[0:c, :] = win_feats[slot]
    relw[c:c + 1, :] = (win_ids[slot, 0, :] - base
                        ).astype(jnp.float32)[None, :]
    relw[cg1:cg1 + c, :] = win_feats[slot]
    relw[cg1 + c:cg1 + c + 1, :] = relw[c:c + 1, :]
    relw[2 * cg1:2 * cg1 + c, :] = win_feats[slot]
    relw[2 * cg1 + c:2 * cg1 + c + 1, :] = relw[c:c + 1, :]

    for g in range(g_n):
        for ot in range(ot_n):
            off = pl.multiple_of(starts_ref[i, g * ot_n + ot], 128)
            bandbuf = relw[:, pl.ds(off, bw)]              # (CG, BW) load
            posv = pos_buf[slot, g, pl.ds(ot * 128, 128)]  # (128,) i32
            hit_c = posv >= 0
            rank = jnp.where(hit_c, posv, ~posv) - off     # band-relative
            want_rel = (tgt_buf[slot, 0, pl.ds(ot * 128, 128)]
                        + gd_ref[g, 0] - base).astype(jnp.float32)

            jc = rank
            jm = rank - 1
            jp = rank + hit_c.astype(jnp.int32)

            # one stacked gather serves all three probes: rows [0:cg1) use
            # jm, [cg1:2cg1) use jc, [2cg1:) use jp
            idx3 = jnp.concatenate([
                jnp.broadcast_to(jnp.clip(jm, 0, bw - 1)[None, :],
                                 (cg1, 128)),
                jnp.broadcast_to(jnp.clip(jc, 0, bw - 1)[None, :],
                                 (cg1, 128)),
                jnp.broadcast_to(jnp.clip(jp, 0, bw - 1)[None, :],
                                 (cg1, 128)),
            ], axis=0)
            acc3 = jnp.zeros((3 * cg1, 128), jnp.float32)
            for bt in range(band):
                tile = bandbuf[:, bt * 128:(bt + 1) * 128]
                gsel = jnp.take_along_axis(
                    tile, jnp.clip(idx3 - bt * 128, 0, 127), axis=1)
                acc3 = jnp.where(
                    (idx3 >= bt * 128) & (idx3 < (bt + 1) * 128),
                    gsel, acc3)

            cols = pl.ds(ot * 128, 128)
            g3 = g * 3 * c
            flagged = flags_ref[i, g * ot_n + ot] != 0

            @pl.when(jnp.logical_not(flagged))
            def _():
                gm = acc3[0:cg1]
                gc = acc3[cg1:2 * cg1]
                gp = acc3[2 * cg1:]
                okm = (jm >= 0) & (jm < bw)
                okc = (jc >= 0) & (jc < bw)
                okp = (jp >= 0) & (jp < bw)
                # exact id checks (f32 int-exact): the z-neighbors of want
                # can only live at rank-1 / rank+hit (left-insertion
                # invariant)
                mc = hit_c & okc & (gc[c, :] == want_rel)
                mm = okm & (gm[c, :] == want_rel - 1.0)
                mp = okp & (gp[c, :] == want_rel + 1.0)
                gbuf[pl.ds(g3, c), cols] = jnp.where(
                    mm[None, :], gm[:c], 0.0).astype(gbuf.dtype)
                gbuf[pl.ds(g3 + c, c), cols] = jnp.where(
                    mc[None, :], gc[:c], 0.0).astype(gbuf.dtype)
                gbuf[pl.ds(g3 + 2 * c, c), cols] = jnp.where(
                    mp[None, :], gp[:c], 0.0).astype(gbuf.dtype)

            @pl.when(flagged)
            def _():
                # exact fallback for long-tailed tiles (rank span > band):
                # one-hot compare over the FULL resident union window,
                # CHUNKED so the (chunk, 3*128) mask intermediate stays
                # ~1.5 MB on the VMEM stack (a full-window one-hot blew
                # the 16 MB scoped-vmem budget at the wide strided
                # variants). Flagged on ~0.1% of tiles at real density.
                wants = tgt_buf[slot, 0, cols] + gd_ref[g, 0]
                fchunk = 1024
                tot = jnp.zeros((c, 3 * 128), jnp.float32)
                for ch0 in range(0, s, fchunk):
                    cw = min(fchunk, s - ch0)
                    wi_c = win_ids[slot, 0, ch0:ch0 + cw]
                    wf_c = win_feats[slot, :, ch0:ch0 + cw]
                    mask = jnp.concatenate([
                        (wi_c[:, None] == (wants + dz)[None, :]
                         ).astype(jnp.float32)
                        for dz in (-1, 0, 1)], axis=1)     # (cw, 3*128)
                    tot = tot + jnp.dot(
                        wf_c, mask, preferred_element_type=jnp.float32)
                for zi, row in ((0, 0), (1, c), (2, 2 * c)):
                    gbuf[pl.ds(g3 + row, c), cols] = tot[
                        :, zi * 128:(zi + 1) * 128].astype(gbuf.dtype)

    acc = jnp.dot(w_ref[:], gbuf[:], preferred_element_type=jnp.float32)
    if epilogue:
        acc = acc * scale_ref[:] + shift_ref[:]
        if relu:
            acc = jnp.maximum(acc, 0.0)
        live = (tgt_buf[slot, 0, :] < sentinel)[None, :]
        acc = jnp.where(live, acc, 0.0)
    out_ref[:, :] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "block", "window", "band", "relu", "sentinel", "interpret", "out_bf16",
    "compute_dtype", "skip_dead"))
def _conv_call(ids2, feats_t, tgt2, pos, starts, lo, base, has_real,
               flags, gdeltas, w_flat, block,
               window, band, scale=None, shift=None, relu=False,
               sentinel=None, out_bf16=False, compute_dtype=jnp.bfloat16,
               skip_dead=True, interpret=False):
    nb = tgt2.shape[0]
    vt = nb * block
    c = feats_t.shape[0]
    g_n = gdeltas.shape[0]
    cout = w_flat.shape[0]
    epilogue = scale is not None
    out_dtype = jnp.bfloat16 if out_bf16 else jnp.float32

    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),           # tgt ids
        pl.BlockSpec(memory_space=pl.ANY),           # src ids
        pl.BlockSpec(memory_space=pl.ANY),           # feats f32
        pl.BlockSpec(memory_space=pl.ANY),           # pos
        pl.BlockSpec((g_n, 1), lambda i, *_: (0, 0),
                     memory_space=pltpu.SMEM),          # group deltas
        pl.BlockSpec((cout, 3 * g_n * c), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),          # weights
    ]
    operands = [starts, lo, base, has_real, flags, tgt2.reshape(1, -1),
                ids2, feats_t, pos, gdeltas[:, None], w_flat]
    if epilogue:
        for _ in range(2):
            in_specs.append(
                pl.BlockSpec((cout, 1), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM))
        operands.extend([scale.astype(jnp.float32)[:, None],
                         shift.astype(jnp.float32)[:, None]])

    # 3-deep window pipelining hides the strided window-DMA latency;
    # drop to 2 when the f32 window buffers would push scoped vmem past
    # the ~16 MB budget (the wide strided variants)
    est3 = (3 * (c + 1) * window * 4
            + 3 * (-(-(c + 1) // 8) * 8) * window * 4
            + 3 * g_n * c * block * 2)
    depth = 3 if est3 < 11 * 1024 * 1024 else 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,      # starts, lo, base, has_real, flags
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((cout, block), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((depth, 1, window), jnp.int32),
            pltpu.VMEM((depth, c, window), jnp.float32),
            pltpu.VMEM((depth, 1, block), jnp.int32),
            pltpu.VMEM((depth, pos.shape[0], block), jnp.int32),
            pltpu.VMEM((3 * (-(-(c + 1) // 8) * 8), window),
                       jnp.float32),
            pltpu.VMEM((3 * g_n * c, block), compute_dtype),
            pltpu.SemaphoreType.DMA((depth,)),
            pltpu.SemaphoreType.DMA((depth,)),
            pltpu.SemaphoreType.DMA((depth,)),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
    )
    out_t = pl.pallas_call(
        functools.partial(_conv_kernel, band=band, epilogue=epilogue,
                          relu=relu, sentinel=sentinel,
                          skip_dead=skip_dead),
        out_shape=jax.ShapeDtypeStruct((cout, vt), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*operands)
    return out_t.T


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("lo", "base", "pos", "starts", "flags", "gdeltas",
                 "has_real", "overflow"),
    meta_fields=("block", "window", "band"),
)
@dataclass(frozen=True)
class LevelPositions:
    """Precomputed per-level alignment shared by every conv on the level:
    window starts, first-window-ids, signed-hit ranks for the tap groups,
    per-(block, group, out-tile) band starts, and the overflow count.
    Registered as a pytree so it maps through vmap/jit (static knobs are
    metadata)."""

    lo: jax.Array
    base: jax.Array
    pos: jax.Array
    starts: jax.Array
    flags: jax.Array
    gdeltas: jax.Array
    has_real: jax.Array
    overflow: jax.Array
    block: int
    window: int
    band: int


def compute_positions(src_ids, tgt_ids, deltas27, block: int, window: int,
                      band: int = 3, tap_window=None, sentinel_start=None,
                      interpret=False):
    """XLA + positions-kernel prelude. src_ids (V,) / tgt_ids (Vt,) sorted
    ascending int32, Vt % block == 0. Returns LevelPositions.

    The overflow scalar counts, exactly: (a) target blocks whose union
    group-span (+-1 for the z taps) exceeds `window`; (b) (group, block)
    tap sub-window overflows when tap_window is set; (c) REAL-target hits
    (including the +-1 z-neighbors) whose band-relative rank falls outside
    [0, band*128) — any nonzero means a neighbor contribution was dropped.
    """
    vs = src_ids.shape[0]
    vt = tgt_ids.shape[0]
    nb = vt // block
    assert nb * block == vt and block % ALIGN == 0
    gdeltas = jnp.asarray(group_center_deltas(deltas27))

    pad_src = (-vs) % ALIGN
    if pad_src:
        src_ids = jnp.concatenate(
            [src_ids, src_ids[-1] + 2
             + jnp.arange(pad_src, dtype=jnp.int32)])
        vs = vs + pad_src
    window = -(-(min(window, vs) + ALIGN) // ALIGN) * ALIGN
    window = min(window, vs)

    d_min = jnp.min(gdeltas) - 1
    d_max = jnp.max(gdeltas) + 1
    block_first = tgt_ids[::block]
    lo = jnp.searchsorted(src_ids, block_first + d_min)
    lo_max = ((vs - window) // ALIGN) * ALIGN
    lo = jnp.minimum((lo // ALIGN) * ALIGN, max(lo_max, 0)).astype(jnp.int32)

    if sentinel_start is not None:
        tgt_b = tgt_ids.reshape(nb, block)
        real_b = tgt_b < sentinel_start
        block_last = jnp.max(
            jnp.where(real_b, tgt_b, jnp.iinfo(jnp.int32).min), axis=1)
        has_real = jnp.any(real_b, axis=1)
    else:
        block_last = tgt_ids[block - 1::block]
        has_real = jnp.ones((nb,), bool)
    hi = jnp.searchsorted(src_ids, block_last + d_max, side="right")
    overflow = jnp.sum(((hi - lo) > window) & has_real)

    g_n = gdeltas.shape[0]
    if tap_window is not None and tap_window < window:
        assert tap_window % 128 == 0
        lo_tap_g = jnp.searchsorted(
            src_ids,
            (block_first[:, None] + (gdeltas[None, :] - 1)).reshape(-1)
        ).reshape(nb, g_n)
        rel = jnp.clip(((lo_tap_g - lo[:, None]) // 128) * 128,
                       0, window - tap_window).astype(jnp.int32)
        hi_tap = jnp.searchsorted(
            src_ids,
            (block_last[:, None] + (gdeltas[None, :] + 1)).reshape(-1),
            side="right").reshape(nb, g_n)
        overflow = overflow + jnp.sum(
            ((hi_tap - (lo[:, None] + rel)) > tap_window)
            & has_real[:, None])
        tap_lo = rel
    else:
        tap_lo = jnp.zeros((nb, g_n), jnp.int32)
        tap_window = None

    base = src_ids[lo]
    hr = has_real.astype(jnp.int32)
    pos = _positions_call(src_ids[None, :], tgt_ids.reshape(nb, block), lo,
                          tap_lo, hr, gdeltas, block, window,
                          tap_window=tap_window, interpret=interpret)

    # band starts: ranks are monotone per group across a block; anchor each
    # 128-target tile at (first target's rank - 1), 128-aligned — the -1
    # guarantees the rank-1 probe of the FIRST target is in-band, and
    # monotonicity then keeps every later target's lower probe in-band too.
    pos_g = pos[:gdeltas.shape[0]]
    ranks = jnp.where(pos_g >= 0, pos_g, ~pos_g)           # (G, Vt)
    first = ranks[:, ::128]                                # (G, NB*OT)
    ot_n = block // 128
    bw = band * 128
    starts = jnp.clip(((first - 1) // 128) * 128, 0, window - bw)
    # band-overflow: any real target whose rank+1 probe could fall outside
    # the band. Conservative only at true near-violations (the probes
    # self-mask on id mismatch); bump `band` if this ever fires.
    tile_start = jnp.repeat(starts, 128, axis=1)           # (G, Vt)
    rel_rank = ranks - tile_start
    is_real = (tgt_ids < sentinel_start)[None, :] \
        if sentinel_start is not None else jnp.ones_like(ranks, bool)
    # Band violations do NOT count as overflow: tiles whose rank span
    # exceeds the band (ring scenes have density discontinuities — spans
    # are long-tailed: p99.9 ~878, max >10k at saturating occupancy) are
    # flagged and the conv kernel handles them EXACTLY with a per-tile
    # one-hot fallback over the full union window. The (first-1) anchor
    # makes rel_rank >= 1 by monotonicity except when the clip hit 0 at
    # the window head (harmless only at lo == 0).
    lo_t = jnp.repeat(lo, block)[None, :]
    bad = is_real & (((rel_rank < 1) & (lo_t > 0)) | (rel_rank > bw - 2))
    flags = jnp.any(
        bad.reshape(g_n, nb * ot_n, 128), axis=-1).astype(jnp.int32)

    starts = starts.reshape(g_n, nb, ot_n).transpose(1, 0, 2).reshape(
        nb, g_n * ot_n).astype(jnp.int32)
    flags = flags.reshape(g_n, nb, ot_n).transpose(1, 0, 2).reshape(
        nb, g_n * ot_n).astype(jnp.int32)
    return LevelPositions(lo=lo, base=base.astype(jnp.int32), pos=pos,
                          starts=starts, flags=flags, gdeltas=gdeltas,
                          has_real=hr, overflow=overflow, block=block,
                          window=window, band=band)


def posgather_conv(src_ids, src_feats, tgt_ids, weights, lp: LevelPositions,
                   scale=None, shift=None, relu=False, sentinel_start=None,
                   out_bf16=False, compute_dtype=jnp.bfloat16,
                   skip_dead=True, interpret=False):
    """One submanifold/strided conv using precomputed LevelPositions.

    src_feats (V, Cin) any float dtype (converted to f32 — the window must
    be f32 for Mosaic's dynamic gather); weights (27, Cin, Cout) zyx
    C-order. Returns (Vt, Cout) in src_feats.dtype (or bf16)."""
    vs, cin = src_feats.shape
    vt = tgt_ids.shape[0]
    k, _, cout = weights.shape
    g_n = k // 3
    nb = vt // lp.block

    pad_src = (-vs) % ALIGN
    if pad_src:
        src_ids = jnp.concatenate(
            [src_ids, src_ids[-1] + 2
             + jnp.arange(pad_src, dtype=jnp.int32)])
        src_feats = jnp.concatenate(
            [src_feats, jnp.zeros((pad_src, cin), src_feats.dtype)], axis=0)
        vs += pad_src

    # Cin pads to a 16-multiple so the bf16 gbuf's 3C-strided row blocks
    # stay sublane-tile aligned; Cout to the usual 8.
    cin_p = -(-cin // 16) * 16
    cout_p = -(-cout // 8) * 8
    wg = reorder_weights_groups(weights)            # (G, 3, Cin, Cout)
    if cin_p != cin:
        src_feats = jnp.concatenate(
            [src_feats, jnp.zeros((vs, cin_p - cin), src_feats.dtype)],
            axis=1)
        wg = jnp.concatenate(
            [wg, jnp.zeros((g_n, 3, cin_p - cin, cout), wg.dtype)], axis=2)
    if cout_p != cout:
        wg = jnp.concatenate(
            [wg, jnp.zeros((g_n, 3, cin_p, cout_p - cout), wg.dtype)], axis=3)
    if scale is not None and cout_p != cout:
        pad_c = jnp.zeros((cout_p - cout,), jnp.float32)
        scale = jnp.concatenate([scale.astype(jnp.float32), pad_c])
        shift = jnp.concatenate([shift.astype(jnp.float32), pad_c])

    w_flat = jnp.transpose(wg, (3, 0, 1, 2)).reshape(
        cout_p, 3 * g_n * cin_p).astype(compute_dtype)
    feats_t = src_feats.T.astype(jnp.float32)

    out = _conv_call(src_ids[None, :], feats_t,
                     tgt_ids.reshape(nb, lp.block), lp.pos, lp.starts,
                     lp.lo, lp.base, lp.has_real, lp.flags, lp.gdeltas,
                     w_flat, lp.block, lp.window, lp.band,
                     scale=scale, shift=shift, relu=relu,
                     sentinel=int(sentinel_start)
                     if scale is not None else None,
                     out_bf16=out_bf16, compute_dtype=compute_dtype,
                     skip_dead=skip_dead, interpret=interpret)
    out = out[:, :cout]
    if out_bf16:
        return out
    return out.astype(src_feats.dtype)


def flip_transpose_weights(weights):
    """W (K, Cin, Cout) -> the transposed-conv kernel W~ with
    W~[k] = W[K-1-k]^T: negating every tap offset reverses the
    C-ordered enumeration of the symmetric offset ranges, so the
    transposed conv's DELTAS equal the forward deltas and the SAME
    LevelPositions alignment serves both directions (subm case)."""
    return jnp.transpose(weights[::-1], (0, 2, 1))


def posgather_subm_diff(src_ids, src_feats, weights, deltas27,
                        lp: LevelPositions, dw_block: int = 512,
                        dw_window: int = 1536, sentinel_start=None,
                        compute_dtype=jnp.bfloat16, interpret=False):
    """Differentiable submanifold posgather conv (training path).

    Forward AND d_feats run the posgather kernels on the SAME positions
    (the transpose of a subm conv is a subm conv with flipped taps over
    the same id list); dW uses the fused windowed dW kernel
    (pallas_sparse.windowed_dw_pallas — the per-tap gathers there are
    one-hot, but dW is a (C, W) x (W, Cout) reduction where the one-hot
    form is already MXU-shaped). Exactness: callers gate on lp.overflow.
    """

    @functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
    def core(blk, win, ss, cd, interp, ids, dl, lpx, feats, w):
        return posgather_conv(ids, feats, ids, w, lpx,
                              sentinel_start=ss, compute_dtype=cd,
                              interpret=interp)

    def fwd(blk, win, ss, cd, interp, ids, dl, lpx, feats, w):
        return core(blk, win, ss, cd, interp, ids, dl, lpx, feats, w), \
            (ids, dl, lpx, feats, w)

    def bwd(blk, win, ss, cd, interp, res, g):
        from jax import dtypes

        from .pallas_sparse import windowed_dw_pallas

        ids, dl, lpx, feats, w = res
        d_feats = posgather_conv(ids, g.astype(feats.dtype), ids,
                                 flip_transpose_weights(w), lpx,
                                 sentinel_start=ss, compute_dtype=cd,
                                 interpret=interp)
        d_w = windowed_dw_pallas(ids, feats, ids, g, dl, block=blk,
                                 window=win, compute_dtype=cd,
                                 interpret=interp)
        zero_i = lambda x: np.zeros(x.shape, dtypes.float0)
        zero_lp = jax.tree.map(
            lambda x: np.zeros(x.shape, dtypes.float0), lpx)
        return (zero_i(ids), zero_i(dl), zero_lp,
                d_feats.astype(feats.dtype), d_w.astype(w.dtype))

    core.defvjp(fwd, bwd)
    return core(dw_block, dw_window, sentinel_start, compute_dtype,
                interpret, src_ids, deltas27, lp, src_feats, weights)
