"""Dense-z pillar formulation of the submanifold sparse 3D conv.

Parity target: spconv's SubMConv3d / SparseConv3d semantics as used by
VoxelBackBone8x / VoxelResBackBone8x
(/root/reference/pcdet/models/backbones_3d/spconv_backbone.py:70-184).

Motivation (PERF.md round 4): the windowed one-hot kernel is gather-bound —
its per-tap compare volume and M=16-padded gather matmuls burn ~300x the
conv's useful FLOPs at L0 (C=16). This module restructures the SAME conv:

  * The active set is stored per BEV PILLAR with the z axis DENSE:
    features (V2, nz*C) with an activity mask (V2, nz). LiDAR scenes put
    ~2-4 occupied z cells per active pillar at L0, so the z-densification
    wastes ~10x memory but turns the channel axis of every matmul into
    nz*C = hundreds of lanes — full MXU width instead of 16/128.
  * A 3x3x3 conv becomes 9 PILLAR-NEIGHBOR alignments (the 2D taps) x a
    z-banded matmul (the 3 z taps fold into a block-banded weight matrix).
    The z-banded matmul runs in z-chunks: an output chunk of `zc` z-cells
    reads the (zc+2)-cell input slice — a contiguous LANE slice of the
    flat (V2, nz*C) layout — through a ((zc+2)*C, zc*Co) weight block.
    With zc*Co = 128 the MXU N dim is exactly full.
  * Submanifold masking: inactive (pillar, z) cells hold zero features
    (so they contribute nothing as neighbors) and outputs are re-masked
    after every conv — bit-exact with the gather-GEMM formulation.

Pillar ids are guard-banded (y, x)-major (one guard column in x), the 2D
analog of sparse_ops.yxz_linear_ids: an id delta then uniquely identifies
the spatial neighbor, and sorted-neighbor alignments stay searchsorted-able.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _yx_strides(shape):
    """Guard-banded (y, x)-major pillar id stride (one guard cell in x)."""
    nz, ny, nx = (int(s) for s in shape)
    return nx + 2


def yx_linear_ids(coords2, valid, shape):
    """(V2, 2) [y, x] -> guard-banded (y, x)-major pillar ids; invalid rows
    get ascending sentinels above every valid id + max |delta|."""
    nz, ny, nx = (int(s) for s in shape)
    sy = _yx_strides(shape)
    ids = coords2[:, 0] * sy + (coords2[:, 1] + 1)
    big = (ny + 1) * sy + 2
    slot = jnp.arange(coords2.shape[0], dtype=jnp.int32)
    return jnp.where(valid, ids, big + slot).astype(jnp.int32)


def yx_sentinel_start(shape):
    nz, ny, nx = (int(s) for s in shape)
    return (ny + 1) * (nx + 2) + 2


def yx_offset_deltas(shape):
    """The 9 (dy, dx) pillar-id deltas of a 3x3 BEV neighborhood, row-major
    (dy, dx) in {-1, 0, 1}^2."""
    sy = _yx_strides(shape)
    return jnp.asarray(
        [dy * sy + dx for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
        jnp.int32,
    )


@functools.partial(jax.jit, static_argnames=("shape", "v2_cap", "nz"))
def pillarize(coords, valid, feats, shape, v2_cap: int, nz: int):
    """Voxel list -> dense-z pillar tensor.

    coords (V, 3) int32 zyx; valid (V,); feats (V, C).
    Returns (ids2 (V2,), coords2 (V2, 2) [y, x], pvalid (V2,),
    pfeats (V2, nz*C), pmask (V2, nz)); V2 = v2_cap. Pillars are emitted in
    ascending 2D-id order (so neighbor alignments can use searchsorted);
    overflow pillars beyond v2_cap are dropped (callers size v2_cap from
    the level's voxel capacity — pillar count <= voxel count).
    """
    v, c = feats.shape
    nz_s, ny, nx = (int(s) for s in shape)
    sy = _yx_strides(shape)

    ids2_all = jnp.where(
        valid, coords[:, 1] * sy + (coords[:, 2] + 1), jnp.iinfo(jnp.int32).max
    )
    order = jnp.argsort(ids2_all)
    ids2_sorted = ids2_all[order]
    z_sorted = coords[order, 0]
    feats_sorted = feats[order]
    valid_sorted = valid[order]

    newseg = jnp.concatenate(
        [valid_sorted[:1],
         (ids2_sorted[1:] != ids2_sorted[:-1]) & valid_sorted[1:]]
    )
    pslot = jnp.cumsum(newseg.astype(jnp.int32)) - 1
    pslot = jnp.where(valid_sorted, pslot, v2_cap)
    num_pillars = jnp.minimum(
        jnp.max(jnp.where(valid_sorted, pslot + 1, 0), initial=0), v2_cap
    ).astype(jnp.int32)

    keep = valid_sorted & (pslot < v2_cap)
    ps = jnp.where(keep, pslot, v2_cap)
    zc = jnp.where(keep, jnp.clip(z_sorted, 0, nz - 1), 0)

    pfeats = jnp.zeros((v2_cap + 1, nz, c), feats.dtype)
    pfeats = pfeats.at[ps, zc].set(
        jnp.where(keep[:, None], feats_sorted, 0.0))
    pmask = jnp.zeros((v2_cap + 1, nz), bool)
    pmask = pmask.at[ps, zc].set(keep)

    # per-pillar id/coords at segment starts (scalar scatter)
    pids = jnp.full((v2_cap + 1,), 0, jnp.int32)
    pids = pids.at[jnp.where(newseg & keep, ps, v2_cap)].set(ids2_sorted)
    pvalid = jnp.arange(v2_cap) < num_pillars
    sent = yx_sentinel_start(shape)
    slot_idx = jnp.arange(v2_cap, dtype=jnp.int32)
    ids2 = jnp.where(pvalid, pids[:v2_cap], sent + slot_idx)
    y = pids[:v2_cap] // sy
    x = pids[:v2_cap] % sy - 1
    coords2 = jnp.where(pvalid[:, None], jnp.stack([y, x], axis=1), -1)

    return (ids2, coords2.astype(jnp.int32), pvalid,
            pfeats[:v2_cap].reshape(v2_cap, nz * c),
            pmask[:v2_cap])


@functools.partial(jax.jit, static_argnames=("shape", "nz"))
def depillarize(ids2, pvalid, pfeats, pmask, shape, nz: int):
    """Dense-z pillars -> voxel list in (y, x, z)-major id order, fixed
    capacity V2*nz with validity mask. Returns (ids3 (V2*nz,), coords
    (V2*nz, 3) zyx, valid, feats (V2*nz, C)). ids3 use the 3D guard-banded
    scheme of sparse_ops.yxz_linear_ids, NOT compacted (inactive z cells
    stay as invalid rows) — callers needing a compact list rank-select."""
    from .sparse_ops import _yxz_strides, yxz_sentinel_start

    v2 = ids2.shape[0]
    c = pfeats.shape[1] // nz
    nz_s, ny, nx = (int(s) for s in shape)
    sy2 = _yx_strides(shape)
    sx3, sy3 = _yxz_strides(shape)

    y = ids2 // sy2
    x = ids2 % sy2 - 1
    z = jnp.arange(nz, dtype=jnp.int32)
    valid = pmask & pvalid[:, None]                      # (V2, nz)
    ids3 = (y[:, None] * sy3 + (x[:, None] + 1) * sx3 + z[None, :] + 1)
    sent = yxz_sentinel_start(shape)
    flat_idx = jnp.arange(v2 * nz, dtype=jnp.int32).reshape(v2, nz)
    ids3 = jnp.where(valid, ids3, sent + flat_idx)
    coords = jnp.stack(
        [jnp.broadcast_to(z[None, :], (v2, nz)),
         jnp.broadcast_to(y[:, None], (v2, nz)),
         jnp.broadcast_to(x[:, None], (v2, nz))], axis=-1)
    coords = jnp.where(valid[..., None], coords, -1)
    feats = pfeats.reshape(v2, nz, c)
    feats = jnp.where(valid[..., None], feats, 0.0)
    return (ids3.reshape(-1), coords.reshape(-1, 3).astype(jnp.int32),
            valid.reshape(-1), feats.reshape(-1, c))


def _zband_weight(w9, zc: int, cin: int, cout: int, pad_tail: int):
    """w9: (3, Cin, Cout) z-taps (dz = -1, 0, +1) for ONE 2D tap ->
    block-banded ((zc+2)*Cin, zc*Cout) chunk weight: output z-cell j reads
    padded input cells j, j+1, j+2 (= dz -1, 0, +1 after the 1-cell pad)."""
    wc = np.zeros(((zc + 2) * cin, zc * cout), np.float32)
    blocks = []
    for j in range(zc):
        for dz in range(3):
            blocks.append((j + dz, j, dz))
    return blocks  # assembled with dynamic values by the caller


def make_zband(w_tap, zc: int):
    """w_tap (3, Cin, Cout) [dz=-1,0,1] -> ((zc+2)*Cin, zc*Cout) banded."""
    three, cin, cout = w_tap.shape
    wc = jnp.zeros(((zc + 2) * cin, zc * cout), w_tap.dtype)
    for j in range(zc):
        for dz in range(3):
            wc = jax.lax.dynamic_update_slice(
                wc, w_tap[dz], ((j + dz) * cin, j * cout))
    return wc


def _split_taps(weights, kernel=(3, 3, 3)):
    """weights (27, Cin, Cout) in sparse_ops._kernel_offsets zyx order ->
    dict[(dy, dx)] -> (3, Cin, Cout) z-stack [dz=-1,0,+1]."""
    from .sparse_ops import _kernel_offsets

    offs = np.asarray(_kernel_offsets(kernel))  # (K, 3) zyx
    out = {}
    for k, (dz, dy, dx) in enumerate(offs):
        out.setdefault((int(dy), int(dx)), {})[int(dz)] = weights[k]
    return {
        key: jnp.stack([v[-1], v[0], v[1]], axis=0) for key, v in out.items()
    }


@functools.partial(
    jax.jit, static_argnames=("shape", "nz", "cin", "zc"))
def zdense_subm(ids2, pfeats, pmask, pvalid, weights, shape, nz: int,
                cin: int, zc: int = 8):
    """Submanifold 3x3x3 conv over dense-z pillars.

    ids2 (V2,) ascending guard-banded; pfeats (V2, nz*Cin); pmask (V2, nz);
    weights (27, Cin, Cout) zyx tap order. Returns (V2, nz*Cout) f32-acc
    output, re-masked to active cells.

    Neighbor alignment: searchsorted per 2D tap (exact: guard-banded ids
    make id-equality iff spatial adjacency). The z mixing runs in z-chunks
    of `zc` cells: pick zc so zc*Cout is a lane multiple (128) — at L0
    Cout=16 -> zc=8.
    """
    v2 = ids2.shape[0]
    cout = weights.shape[2]
    taps = _split_taps(weights)
    nzp = -(-nz // zc) * zc
    dtype = pfeats.dtype

    deltas = yx_offset_deltas(shape)
    out = jnp.zeros((v2, nzp * cout), jnp.float32)

    ti = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            w_tap = taps[(dy, dx)].astype(dtype)          # (3, Cin, Cout)
            if dy == 0 and dx == 0:
                g = pfeats
            else:
                want = ids2 + deltas[ti]
                pos = jnp.searchsorted(ids2, want)
                posc = jnp.clip(pos, 0, v2 - 1)
                hit = (ids2[posc] == want) & (pos < v2)
                g = jnp.where(hit[:, None], pfeats[posc], 0.0)
            # pad: 1 z cell each side + tail to the chunk multiple
            gp = jnp.pad(g.reshape(v2, nz, cin),
                         ((0, 0), (1, 1 + nzp - nz), (0, 0))
                         ).reshape(v2, (nzp + 2) * cin)
            wc = make_zband(w_tap, zc)                    # ((zc+2)Cin, zcCo)
            for ch in range(nzp // zc):
                sl = jax.lax.dynamic_slice(
                    gp, (0, ch * zc * cin), (v2, (zc + 2) * cin))
                acc = jnp.dot(sl, wc, preferred_element_type=jnp.float32)
                out = jax.lax.dynamic_update_slice(
                    out,
                    jax.lax.dynamic_slice(
                        out, (0, ch * zc * cout), (v2, zc * cout)) + acc,
                    (0, ch * zc * cout))
            ti += 1

    out = out[:, : nz * cout]
    mask_full = (pmask & pvalid[:, None])
    out = out.reshape(v2, nz, cout) * mask_full[..., None]
    return out.reshape(v2, nz * cout)


@functools.partial(
    jax.jit,
    static_argnames=("in_shape", "out_shape", "nz_in", "nz_out", "cin",
                     "v2_out_cap", "zc"))
def zdense_downsample(ids2, coords2, pfeats, pmask, pvalid, weights,
                      in_shape, out_shape, nz_in: int, nz_out: int,
                      cin: int, v2_out_cap: int, zc: int = 4):
    """Strided (stride 2, kernel 3, pad 1) sparse conv over dense-z pillars.

    Output pillar set = 3x3/2 receptive-field rule over input pillars
    (dense-occupancy max-pool + rank select). Features: for the 9 strided
    2D taps, gather the contributing INPUT pillar of each output pillar
    (in y: yi = 2*yo + dy - 1, same x), then a stride-2 z-banded chunk
    matmul. Returns (ids2_o, coords2_o, pvalid_o, pfeats_o (V2o, nz_out*Co),
    pmask_o (V2o, nz_out)).
    """
    v2 = ids2.shape[0]
    cout = weights.shape[2]
    nzi, ny_i, nx_i = (int(s) for s in in_shape)
    nzo, ny_o, nx_o = (int(s) for s in out_shape)
    dtype = pfeats.dtype

    # ---- output occupancy: scatter input pillars into a dense (ny, nx)
    # occupancy map, 3x3 stride-2 max-pool, rank-select the active cells.
    iy = jnp.where(pvalid, coords2[:, 0], ny_i)
    ix = jnp.where(pvalid, coords2[:, 1], nx_i)
    occ = jnp.zeros((ny_i + 1, nx_i + 1), jnp.int8)
    occ = occ.at[iy, ix].max(jnp.int8(1), mode="drop", unique_indices=True)
    occ = occ[:ny_i, :nx_i]
    pooled = jax.lax.reduce_window(
        occ, jnp.int8(0), jax.lax.max, (3, 3), (2, 2), ((1, 1), (1, 1)))
    flat = pooled.reshape(-1)

    # rank-select first v2_out_cap active output cells (ascending (y, x))
    active = flat > 0
    ranks = jnp.cumsum(active.astype(jnp.int32)) - 1
    num_out = jnp.minimum(ranks[-1] + 1, v2_out_cap)
    slot = jnp.where(active & (ranks < v2_out_cap), ranks, v2_out_cap)
    pos_arr = jnp.full((v2_out_cap + 1,), 0, jnp.int32)
    pos_arr = pos_arr.at[slot].set(
        jnp.arange(flat.shape[0], dtype=jnp.int32), mode="drop")
    out_pos = pos_arr[:v2_out_cap]
    pvalid_o = jnp.arange(v2_out_cap) < num_out
    yo = out_pos // nx_o
    xo = out_pos % nx_o
    coords2_o = jnp.where(
        pvalid_o[:, None], jnp.stack([yo, xo], axis=1), -1).astype(jnp.int32)
    sy_o = _yx_strides(out_shape)
    sent_o = yx_sentinel_start(out_shape)
    ids2_o = jnp.where(
        pvalid_o, yo * sy_o + xo + 1,
        sent_o + jnp.arange(v2_out_cap, dtype=jnp.int32)).astype(jnp.int32)

    # ---- features: 9 strided taps. Input pillar for output (yo, xo) at
    # tap (dy, dx): (2*yo + dy - 1, 2*xo + dx - 1).
    taps = _split_taps(weights)
    nzop = -(-nz_out // zc) * zc
    out = jnp.zeros((v2_out_cap, nzop * cout), jnp.float32)
    sy_i = _yx_strides(in_shape)

    # stride-2 z-band: output z-cell j reads input cells 2j+dz-1+1 (pad 1)
    def make_zband_s2(w_tap):
        wc = jnp.zeros(((2 * zc + 1) * cin, zc * cout), w_tap.dtype)
        for j in range(zc):
            for dz in range(3):
                wc = jax.lax.dynamic_update_slice(
                    wc, w_tap[dz], ((2 * j + dz) * cin, j * cout))
        return wc

    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            w_tap = taps[(dy, dx)].astype(dtype)
            yi = 2 * yo + dy
            xi = 2 * xo + dx
            inb = (yi >= 0) & (yi < ny_i) & (xi >= 0) & (xi < nx_i)
            want = yi * sy_i + xi + 1
            pos = jnp.searchsorted(ids2, want)
            posc = jnp.clip(pos, 0, v2 - 1)
            hit = inb & (pos < v2) & (ids2[posc] == want)
            g = jnp.where(hit[:, None], pfeats[posc], 0.0)
            # z pad: 1 front (kernel pad), tail to cover 2*(nzop-1)+3
            need = 2 * nzop + 1
            gp = jnp.pad(g.reshape(v2_out_cap, nz_in, cin),
                         ((0, 0), (1, max(0, need - nz_in - 1)), (0, 0))
                         ).reshape(v2_out_cap, -1)
            wc = make_zband_s2(w_tap)
            for ch in range(nzop // zc):
                sl = jax.lax.dynamic_slice(
                    gp, (0, ch * 2 * zc * cin),
                    (v2_out_cap, (2 * zc + 1) * cin))
                acc = jnp.dot(sl, wc, preferred_element_type=jnp.float32)
                out = jax.lax.dynamic_update_slice(
                    out,
                    jax.lax.dynamic_slice(
                        out, (0, ch * zc * cout),
                        (v2_out_cap, zc * cout)) + acc,
                    (0, ch * zc * cout))

    out = out[:, : nz_out * cout]

    # ---- output z mask: receptive-field rule in z as well — out z active
    # iff ANY input cell in its 3-cell stride-2 z window of ANY contributing
    # pillar is active. Compute via the same 9-tap gather of pmask.
    zmask_acc = jnp.zeros((v2_out_cap, nz_in), bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            yi = 2 * yo + dy
            xi = 2 * xo + dx
            inb = (yi >= 0) & (yi < ny_i) & (xi >= 0) & (xi < nx_i)
            want = yi * sy_i + xi + 1
            pos = jnp.searchsorted(ids2, want)
            posc = jnp.clip(pos, 0, v2 - 1)
            hit = inb & (pos < v2) & (ids2[posc] == want)
            zmask_acc = zmask_acc | (hit[:, None] & pmask[posc])
    zp = jnp.pad(zmask_acc, ((0, 0), (1, 1 + max(0, 2 * nz_out - nz_in - 1))))
    pmask_o = jnp.zeros((v2_out_cap, nz_out), bool)
    for zo in range(nz_out):
        win = zp[:, 2 * zo: 2 * zo + 3]
        pmask_o = pmask_o.at[:, zo].set(jnp.any(win, axis=1))
    pmask_o = pmask_o & pvalid_o[:, None]

    out = out.reshape(v2_out_cap, nz_out, cout) * pmask_o[..., None]
    return (ids2_o, coords2_o, pvalid_o,
            out.reshape(v2_out_cap, nz_out * cout), pmask_o)
