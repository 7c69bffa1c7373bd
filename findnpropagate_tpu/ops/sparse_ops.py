"""TPU-native sparse 3D convolution primitives.

Replaces the reference's spconv dependency (pcdet/models/backbones_3d/
spconv_backbone.py + pcdet/utils/spconv_utils.py under /root/reference) —
the single biggest kernel work item (SURVEY.md §2.13).

Design (not a port): spconv builds CPU rulebooks with dynamic shapes; on TPU
we keep a FIXED-capacity active-voxel list per level and a dense int32
index table ("hash") in HBM mapping linear cell id -> slot. Convolutions
become, per kernel offset, a row gather + a dense (V, Cin) x (Cin, Cout)
matmul on the MXU + a masked accumulate. Submanifold convs reuse the level's
table; strided convs first build the next level's active set exactly like
spconv does (any output cell whose receptive field touches an active input is
active) via a candidate-expansion + sort-unique — the same machinery as
ops/voxelize.py.

All functions are batchless (single sample); batch via jax.vmap.
Coordinates are zyx int32 like spconv, -1 rows = padding.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("coords", "valid", "table"),
    meta_fields=("shape",),
)
@dataclass(frozen=True)
class SparseGrid:
    """Active-set representation of one resolution level. `shape` is static
    pytree metadata so SparseGrid maps cleanly through vmap/jit."""

    coords: jax.Array   # (V, 3) int32 zyx, -1 padding
    valid: jax.Array    # (V,) bool
    table: jax.Array    # (nz*ny*nx + 1,) int32 slot index, -1 empty; [-1] sentinel
    shape: tuple        # (nz, ny, nx) static


def linear_id(coords, shape):
    """(V, 3) zyx -> (V,) linear id; invalid/out-of-grid -> sentinel (last)."""
    nz, ny, nx = shape
    z, y, x = coords[:, 0], coords[:, 1], coords[:, 2]
    inside = (
        (z >= 0) & (z < nz) & (y >= 0) & (y < ny) & (x >= 0) & (x < nx)
    )
    lin = (z * ny + y) * nx + x
    return jnp.where(inside, lin, nz * ny * nx), inside


def build_grid(coords, valid, shape) -> SparseGrid:
    """Builds the dense lookup table for an active set."""
    nz, ny, nx = (int(s) for s in shape)
    n_cells = nz * ny * nx
    lin, inside = linear_id(coords, (nz, ny, nx))
    lin = jnp.where(valid & inside, lin, n_cells)
    table = jnp.full((n_cells + 1,), -1, jnp.int32)
    slots = jnp.arange(coords.shape[0], dtype=jnp.int32)
    table = table.at[lin].set(jnp.where(valid & inside, slots, -1))
    table = table.at[n_cells].set(-1)  # sentinel stays empty
    return SparseGrid(coords=coords, valid=valid & inside, table=table,
                      shape=(nz, ny, nx))


def _kernel_offsets(kernel_size: Sequence[int]):
    """(K, 3) zyx offsets, centered (e.g. 3x3x3 -> -1..1), C-order —
    matching the weight layout (kz, ky, kx) flattened."""
    kz, ky, kx = kernel_size
    oz, oy, ox = np.meshgrid(
        np.arange(kz) - (kz - 1) // 2,
        np.arange(ky) - (ky - 1) // 2,
        np.arange(kx) - (kx - 1) // 2,
        indexing="ij",
    )
    return np.stack([oz, oy, ox], axis=-1).reshape(-1, 3).astype(np.int32)


def subm_conv(grid: SparseGrid, features, weights, bias=None,
              kernel_size=(3, 3, 3)):
    """Submanifold sparse conv: output active set == input active set.

    features: (V, Cin); weights: (K, Cin, Cout) with K = prod(kernel_size)
    in zyx C-order; returns (V, Cout).
    """
    offsets = jnp.asarray(_kernel_offsets(kernel_size))  # (K, 3)
    k = offsets.shape[0]
    v, cin = features.shape
    cout = weights.shape[-1]
    feats_ext = jnp.concatenate(
        [features, jnp.zeros((1, cin), features.dtype)], axis=0
    )  # slot V = zero row for missing neighbors

    def body(carry, inputs):
        off, w = inputs
        nbr = grid.coords + off[None, :]
        lin, _ = linear_id(nbr, grid.shape)
        slot = grid.table[lin]               # (V,) -1 if absent
        slot = jnp.where(slot >= 0, slot, v)
        gathered = feats_ext[slot]           # (V, Cin)
        return carry + jnp.dot(gathered, w, preferred_element_type=carry.dtype, precision=jax.lax.Precision.HIGHEST), None

    out0 = jnp.zeros((v, cout), dtype=jnp.promote_types(features.dtype, jnp.float32))
    out, _ = jax.lax.scan(body, out0, (offsets, weights))
    if bias is not None:
        out = out + bias[None, :]
    out = jnp.where(grid.valid[:, None], out, 0.0)
    return out.astype(features.dtype)


def downsample_active_set(grid: SparseGrid, out_shape, max_out: int,
                          kernel_size=(3, 3, 3), stride=(2, 2, 2),
                          padding=(1, 1, 1)):
    """Exact spconv active-set for a strided sparse conv: output cell o is
    active iff any input cell in its receptive field (stride*o + k - pad)
    is active. Returns (out_coords (Vo, 3), out_valid (Vo,)).

    Candidates per input cell per axis: o in
    [ceil((i + pad - ks + 1)/s), floor((i + pad)/s)] — at most 2 for the
    k3s2p1 layers used here; we expand to the static max and dedupe.
    """
    kz, ky, kx = kernel_size
    sz, sy, sx = stride
    pz, py, px = padding

    def axis_candidates(i, ks, s, p, n_out):
        lo = jnp.ceil((i + p - ks + 1) / s).astype(jnp.int32)
        hi = jnp.floor((i + p) / s).astype(jnp.int32)
        # static max candidates per axis
        max_c = (ks + s - 1) // s + 1
        cand = lo[:, None] + jnp.arange(max_c)[None, :]
        ok = (cand <= hi[:, None]) & (cand >= 0) & (cand < n_out)
        return cand, ok  # (V, max_c)

    nz_o, ny_o, nx_o = (int(s) for s in out_shape)
    cz, okz = axis_candidates(grid.coords[:, 0], kz, sz, pz, nz_o)
    cy, oky = axis_candidates(grid.coords[:, 1], ky, sy, py, ny_o)
    cx, okx = axis_candidates(grid.coords[:, 2], kx, sx, px, nx_o)

    # outer product of per-axis candidates -> (V, mz*my*mx, 3)
    mz, my, mx = cz.shape[1], cy.shape[1], cx.shape[1]
    zz = jnp.broadcast_to(cz[:, :, None, None], (cz.shape[0], mz, my, mx))
    yy = jnp.broadcast_to(cy[:, None, :, None], (cy.shape[0], mz, my, mx))
    xx = jnp.broadcast_to(cx[:, None, None, :], (cx.shape[0], mz, my, mx))
    ok = (
        okz[:, :, None, None] & oky[:, None, :, None] & okx[:, None, None, :]
    ) & grid.valid[:, None, None, None]
    cand = jnp.stack([zz, yy, xx], axis=-1).reshape(-1, 3)
    ok = ok.reshape(-1)

    n_cells = nz_o * ny_o * nx_o
    lin = (cand[:, 0] * ny_o + cand[:, 1]) * nx_o + cand[:, 2]
    lin = jnp.where(ok, lin, n_cells)

    order = jnp.argsort(lin)
    lin_sorted = lin[order]
    is_real = lin_sorted < n_cells
    newseg = jnp.concatenate(
        [is_real[:1], (lin_sorted[1:] != lin_sorted[:-1]) & is_real[1:]]
    )
    slot = jnp.cumsum(newseg.astype(jnp.int32)) - 1
    keep = newseg & (slot < max_out)

    out_coords = jnp.full((max_out + 1, 3), -1, jnp.int32)
    cand_sorted = cand[order]
    write_slot = jnp.where(keep, slot, max_out)
    out_coords = out_coords.at[write_slot].set(
        jnp.where(keep[:, None], cand_sorted, -1)
    )[:max_out]
    num_out = jnp.minimum(jnp.sum(newseg), max_out)
    out_valid = jnp.arange(max_out) < num_out
    return out_coords, out_valid


def strided_conv(grid_in: SparseGrid, features, grid_out: SparseGrid,
                 weights, bias=None, kernel_size=(3, 3, 3),
                 stride=(2, 2, 2), padding=(1, 1, 1)):
    """Strided ("spconv") sparse conv from grid_in onto grid_out's active set.

    For each output cell o and kernel tap k: input cell = stride*o + k - pad.
    features: (Vi, Cin); weights: (K, Cin, Cout); returns (Vo, Cout).
    """
    offsets = jnp.asarray(_kernel_offsets(kernel_size))  # centered taps
    center = jnp.asarray(
        [(kernel_size[0] - 1) // 2, (kernel_size[1] - 1) // 2,
         (kernel_size[2] - 1) // 2], jnp.int32
    )
    stride_a = jnp.asarray(stride, jnp.int32)
    pad_a = jnp.asarray(padding, jnp.int32)

    vi, cin = features.shape
    vo = grid_out.coords.shape[0]
    cout = weights.shape[-1]
    feats_ext = jnp.concatenate(
        [features, jnp.zeros((1, cin), features.dtype)], axis=0
    )

    def body(carry, inputs):
        off, w = inputs
        # tap index k = off + center; input cell = stride*o + k - pad
        in_coord = grid_out.coords * stride_a[None, :] + (
            off + center
        )[None, :] - pad_a[None, :]
        lin, _ = linear_id(in_coord, grid_in.shape)
        slot = grid_in.table[lin]
        slot = jnp.where(slot >= 0, slot, vi)
        gathered = feats_ext[slot]
        return carry + jnp.dot(gathered, w, preferred_element_type=carry.dtype, precision=jax.lax.Precision.HIGHEST), None

    out0 = jnp.zeros((vo, cout), dtype=jnp.promote_types(features.dtype, jnp.float32))
    out, _ = jax.lax.scan(body, out0, (offsets, weights))
    if bias is not None:
        out = out + bias[None, :]
    out = jnp.where(grid_out.valid[:, None], out, 0.0)
    return out.astype(features.dtype)


def sparse_to_dense(grid: SparseGrid, features):
    """(V, C) active features -> dense (nz, ny, nx, C)."""
    nz, ny, nx = grid.shape
    c = features.shape[-1]
    lin, _ = linear_id(grid.coords, grid.shape)
    lin = jnp.where(grid.valid, lin, nz * ny * nx)
    dense = jnp.zeros((nz * ny * nx + 1, c), features.dtype)
    dense = dense.at[lin].set(jnp.where(grid.valid[:, None], features, 0.0))
    return dense[:-1].reshape(nz, ny, nx, c)


def masked_batch_stats(features, valid):
    """Mean/var over valid rows only (for masked BatchNorm)."""
    m = valid[:, None].astype(features.dtype)
    n = jnp.clip(jnp.sum(m), 1.0)
    mean = jnp.sum(features * m, axis=0) / n
    var = jnp.sum(((features - mean) ** 2) * m, axis=0) / n
    return mean, var


# --------------------------------------------------------------------------
# Windowed one-hot submanifold conv (PERF.md roadmap): exploits that with a
# (y, x, z)-major sorted active list, every kernel offset's neighbor lives in
# a near-contiguous slot window, so the random row-gather becomes a
# contiguous slice gather + an MXU compare-matmul alignment.
# --------------------------------------------------------------------------

def _yxz_strides(shape):
    """Guard-banded (y, x, z)-major id strides: +-1 guard cells in z and x so
    an id delta can never alias across a column/row boundary (a same-id match
    then always IS the true spatial neighbor)."""
    nz, ny, nx = (int(s) for s in shape)
    stride_x = nz + 2
    stride_y = (nx + 2) * stride_x
    return stride_x, stride_y


def yxz_linear_ids(coords, valid, shape):
    """(V, 3) zyx coords -> (V,) int32 guard-banded (y, x, z)-major ids;
    invalid rows get unique ascending sentinels placed ABOVE any valid
    target (valid id + max kernel delta), so windowed equality can never
    match a sentinel to a valid cell. Sentinel-to-sentinel matches are
    harmless (their feature rows are zero). Spacing 1 keeps everything well
    inside int32 (the id space tops out around ny*stride_y + V)."""
    nz, ny, nx = (int(s) for s in shape)
    stride_x, stride_y = _yxz_strides(shape)
    ids = coords[:, 1] * stride_y + (coords[:, 2] + 1) * stride_x + (
        coords[:, 0] + 1
    )
    big = (ny + 1) * stride_y + stride_x + 2  # > max valid id + max |delta|
    slot = jnp.arange(coords.shape[0], dtype=jnp.int32)
    return jnp.where(valid, ids, big + slot).astype(jnp.int32)


def yxz_offset_deltas(kernel_size, shape):
    """Per kernel tap, the guard-banded (y, x, z)-major id delta."""
    stride_x, stride_y = _yxz_strides(shape)
    offs = _kernel_offsets(kernel_size)  # (K, 3) zyx
    return offs[:, 1] * stride_y + offs[:, 2] * stride_x + offs[:, 0]


def yxz_sentinel_start(shape):
    """First id value used for invalid-slot sentinels by yxz_linear_ids."""
    nz, ny, nx = (int(s) for s in shape)
    stride_x, stride_y = _yxz_strides(shape)
    return (ny + 1) * stride_y + stride_x + 2


def strided_sentinel_start(in_shape):
    """First sentinel value used by strided_base_ids (input id space)."""
    nz, ny, nx = (int(s) for s in in_shape)
    stride_x, stride_y = _yxz_strides(in_shape)
    return (ny + 2) * stride_y + 2 * stride_x


def windowed_conv(src_ids, src_feats, tgt_ids, weights, deltas,
                  block: int = 256, window: int = 512, precision=None,
                  sentinel_start=None):
    """Generalized windowed one-hot sparse conv.

    For every target row t and kernel tap k, accumulates
    ``src_feats[src_ids == tgt_ids[t] + deltas[k]] @ weights[k]`` (zero when
    absent). Both id lists must be ascending; a contiguous block of targets
    then reads its tap-k neighbors from one contiguous source window —
    a slice-DMA plus an MXU compare-matmul instead of a random row gather.

    src_ids: (Vs,) ascending; src_feats: (Vs, Cin) zero rows at invalid
    slots; tgt_ids: (Vt,) ascending, Vt % block == 0; weights: (K, Cin,
    Cout); deltas: (K,) id deltas in SOURCE id space.

    Returns (out (Vt, Cout) f32-accumulated cast back to feats dtype,
    overflow (,) int32 — the number of (block, tap) pairs whose true
    neighbor span exceeded `window`; any nonzero count means neighbors were
    silently treated as absent and the window must be enlarged).
    """
    vs, cin = src_feats.shape
    vt = tgt_ids.shape[0]
    k, _, cout = weights.shape
    nb = vt // block
    assert nb * block == vt, "pad Vt to a multiple of block"
    window = min(window, vs)

    # per-block span via min/max (== first/last for sorted target lists,
    # and also correct for UNSORTED targets like the inverse conv's
    # integer-divided ids)
    tgt_b_all = tgt_ids.reshape(nb, block)
    if sentinel_start is not None:
        # sentinels (invalid-slot padding) must not stretch the span or
        # boundary blocks report false-positive overflows (sentinel ids
        # live far above valid ids)
        real_b = tgt_b_all < sentinel_start
        block_first = jnp.min(
            jnp.where(real_b, tgt_b_all, jnp.iinfo(jnp.int32).max), axis=1
        )
        block_last = jnp.max(
            jnp.where(real_b, tgt_b_all, jnp.iinfo(jnp.int32).min), axis=1
        )
        has_real = jnp.any(real_b, axis=1)
        block_first = jnp.where(has_real, block_first, 0)
    else:
        block_first = jnp.min(tgt_b_all, axis=1)
        block_last = jnp.max(tgt_b_all, axis=1)
        has_real = jnp.ones((nb,), bool)
    lo = jnp.searchsorted(
        src_ids, (block_first[:, None] + deltas[None, :]).reshape(-1)
    ).reshape(nb, k)
    lo = jnp.minimum(lo, vs - window).astype(jnp.int32)
    hi = jnp.searchsorted(
        src_ids, (block_last[:, None] + deltas[None, :]).reshape(-1),
        side="right",
    ).reshape(nb, k).astype(jnp.int32)
    # exactness check (runtime): every (block, tap) span must fit the window
    overflow = jnp.sum(((hi - lo) > window) & has_real[:, None])
    tgt_b = tgt_ids.reshape(nb, block)

    def body(carry, inputs):
        lo_k, w_k, d_k = inputs
        win_f = jax.vmap(
            lambda l: jax.lax.dynamic_slice(src_feats, (l, 0), (window, cin))
        )(lo_k)  # (NB, S, C)
        win_i = jax.vmap(
            lambda l: jax.lax.dynamic_slice(src_ids, (l,), (window,))
        )(lo_k)  # (NB, S)
        want = tgt_b + d_k  # (NB, W)
        onehot = (win_i[:, None, :] == want[:, :, None]).astype(src_feats.dtype)
        # structurally exact (<=1 nonzero per onehot row) up to the matmul
        # precision's rounding of the feature values themselves; with bf16
        # features any precision is exact (products are 1.0 * f). Plumbed
        # from the backbone's WINDOWED_PRECISION cfg.
        g = jnp.einsum("nws,nsc->nwc", onehot, win_f, precision=precision)
        return carry + jnp.dot(
            g.reshape(vt, cin), w_k, preferred_element_type=carry.dtype,
            precision=jax.lax.Precision.HIGHEST,
        ), None

    out0 = jnp.zeros((vt, cout), jnp.promote_types(src_feats.dtype, jnp.float32))
    out, _ = jax.lax.scan(body, out0, (lo.T, weights, deltas))
    return out.astype(src_feats.dtype), overflow


def subm_conv_windowed(ids, feats, weights, deltas, block: int = 256,
                       window: int = 512, precision=None):
    """Submanifold conv over a (y, x, z)-major SORTED active list.

    ids: (V,) ascending int32 from yxz_linear_ids (V % block == 0);
    feats: (V, C) with zero rows at invalid slots; weights: (K, Cin, Cout);
    deltas: (K,) id deltas. EXACT as long as every offset's neighbor window
    spans < `window` slots — violations are counted in the returned
    `overflow` scalar (ADVICE r1: checked at runtime, not assumed).
    Returns (out, overflow)."""
    return windowed_conv(ids, feats, ids, weights, deltas, block=block,
                         window=window, precision=precision)


# ---- windowed STRIDED convs: map output voxels into the input id space ----

def strided_deltas(kernel_size, stride, padding, in_shape):
    """Per kernel tap, the SOURCE-id-space delta for a strided conv, plus the
    static monotonicity check for the base-id mapping.

    For output cell o, tap t (0-indexed kernel position): input cell =
    stride*o + t - pad. In guard-banded yxz ids: id_in = base(o) + delta(t)
    with base(o) = s_y*o_y*SY + s_x*o_x*SX + s_z*o_z and
    delta(t) = t_y*SY + (t_x+1)*SX + (t_z+1)."""
    stride_x, stride_y = _yxz_strides(in_shape)
    offs = _kernel_offsets(kernel_size)  # (K, 3) zyx centered
    center = np.asarray([(k - 1) // 2 for k in kernel_size])
    t = offs + center[None, :] - np.asarray(padding)[None, :]  # (K, 3) zyx
    return (t[:, 1] * stride_y + (t[:, 2] + 1) * stride_x + (t[:, 0] + 1)
            ).astype(np.int32)


def strided_base_ids(out_coords, out_valid, stride, in_shape, out_shape):
    """Map output voxels (sorted by their OUTPUT yxz id) to ascending base
    ids in the INPUT id space. Requires the lexicographic (y, x, z) output
    order to survive the stride scaling — asserted statically."""
    nz_i, ny_i, nx_i = (int(s) for s in in_shape)
    nz_o, ny_o, nx_o = (int(s) for s in out_shape)
    sz, sy, sx = (int(s) for s in stride)
    stride_x, stride_y = _yxz_strides(in_shape)
    # monotonicity: x+z contributions must not overflow one y step, and z
    # must not overflow one x step
    assert sx * stride_x * (nx_o - 1) + sz * (nz_o - 1) < sy * stride_y, (
        "strided base-id mapping not monotone in y", in_shape, out_shape)
    assert sz * (nz_o - 1) < sx * stride_x, (
        "strided base-id mapping not monotone in x", in_shape, out_shape)
    base = (out_coords[:, 1] * (sy * stride_y)
            + out_coords[:, 2] * (sx * stride_x)
            + out_coords[:, 0] * sz)
    big = (ny_i + 2) * stride_y + 2 * stride_x  # > any valid base + delta
    slot = jnp.arange(out_coords.shape[0], dtype=jnp.int32)
    return jnp.where(out_valid, base, big + slot).astype(jnp.int32)


def win_downsample(coords, valid, in_shape, out_shape, max_out: int,
                   kernel_size=(3, 3, 3), stride=(2, 2, 2), padding=(1, 1, 1)):
    """Strided-conv active-set build emitting the output SORTED by its
    (y, x, z)-major id — the windowed pipeline's invariant — so no per-level
    re-sort or lookup table is ever needed. Semantics match
    downsample_active_set (exact spconv receptive-field rule).

    Returns (out_ids (Vo,), out_coords (Vo, 3), out_valid (Vo,)) with
    invalid rows carrying ascending sentinel ids (sorted overall)."""
    kz, ky, kx = kernel_size
    sz, sy, sx = stride
    pz, py, px = padding
    nz_o, ny_o, nx_o = (int(s) for s in out_shape)

    def axis_candidates(i, ks, s, p, n_out):
        lo = jnp.ceil((i + p - ks + 1) / s).astype(jnp.int32)
        hi = jnp.floor((i + p) / s).astype(jnp.int32)
        max_c = (ks + s - 1) // s + 1
        cand = lo[:, None] + jnp.arange(max_c)[None, :]
        ok = (cand <= hi[:, None]) & (cand >= 0) & (cand < n_out)
        return cand, ok

    cz, okz = axis_candidates(coords[:, 0], kz, sz, pz, nz_o)
    cy, oky = axis_candidates(coords[:, 1], ky, sy, py, ny_o)
    cx, okx = axis_candidates(coords[:, 2], kx, sx, px, nx_o)
    mz, my, mx = cz.shape[1], cy.shape[1], cx.shape[1]
    v = coords.shape[0]

    # candidate ids directly (no (N, 3) coord materialization): the dedup
    # key IS the guard-banded yxz id (injective over the padded grid), and
    # coords are recovered arithmetically from the id afterwards — this
    # keeps the whole downsample sort+top_k bound (~5 ms at L0 scale)
    # instead of 1M-row gather/scatter bound (~90 ms).
    stride_x, stride_y = _yxz_strides(out_shape)
    cid = (cy[:, None, :, None] * stride_y
           + (cx[:, None, None, :] + 1) * stride_x
           + (cz[:, :, None, None] + 1))
    ok = (okz[:, :, None, None] & oky[:, None, :, None]
          & okx[:, None, None, :]) & valid[:, None, None, None]
    sentinel = (ny_o + 1) * stride_y + stride_x + 2
    cid = jnp.where(ok, cid, sentinel).reshape(-1)

    cid_sorted = jnp.sort(cid)
    is_real = cid_sorted < sentinel
    newseg = jnp.concatenate(
        [is_real[:1], (cid_sorted[1:] != cid_sorted[:-1]) & is_real[1:]]
    )
    uniq = jnp.where(newseg, cid_sorted, jnp.iinfo(jnp.int32).max)
    neg, _ = jax.lax.top_k(-uniq, max_out)
    out_ids = -neg  # ascending unique ids, iinfo.max tail when short
    num_out = jnp.minimum(jnp.sum(newseg), max_out)
    out_valid = jnp.arange(max_out) < num_out

    # id -> coords (exact inverse of the guard-banded formula)
    oy = out_ids // stride_y
    rem = out_ids % stride_y
    oxc = rem // stride_x - 1
    ozc = rem % stride_x - 1
    out_coords = jnp.where(
        out_valid[:, None],
        jnp.stack([ozc, oy, oxc], axis=1), -1
    ).astype(jnp.int32)
    # invalid slots get the standard ascending sentinels (sorted overall)
    slot = jnp.arange(max_out, dtype=jnp.int32)
    out_ids = jnp.where(out_valid, out_ids, sentinel + slot)
    return out_ids.astype(jnp.int32), out_coords, out_valid


def _mask_rank_select(mask, max_out: int, sel_block: int,
                      sub_block: int = 128):
    """First `max_out` set positions of a flat 0/1 int8 mask, ascending.

    Two-level rank select (PERF.md round-3 session 5: the one-level
    variant's (max_out, sel_block) row gather + prefix was 9 ms of the
    13 ms dense downsample at L0):
      1. blockwise popcounts + one small cumsum locate each output slot's
         containing sel_block via searchsorted,
      2. a narrow (max_out, nsub) gather of per-SUB-block counts picks the
         sub_block inside it,
      3. only that (max_out, sub_block) slice of mask bits is gathered for
         the final prefix-sum rank — gathered bytes and prefix width both
         shrink by sel_block/sub_block.
    mask length must be a sel_block multiple. Returns (positions
    (max_out,) int32 — garbage at invalid slots, mask with out_valid —,
    out_valid (max_out,) bool)."""
    nblk = mask.shape[0] // sel_block
    sub_block = min(sub_block, sel_block)
    nsub = sel_block // sub_block
    assert nsub * sub_block == sel_block, (sel_block, sub_block)
    sub_counts = jnp.sum(
        mask.reshape(nblk * nsub, sub_block).astype(jnp.int32), axis=1
    ).reshape(nblk, nsub)                                       # (nblk, ns)
    counts = jnp.sum(sub_counts, axis=1)                        # (nblk,)
    csum_inc = jnp.cumsum(counts)                               # inclusive
    total = csum_inc[-1]

    p_slot = jnp.arange(max_out, dtype=jnp.int32)
    blk = jnp.searchsorted(csum_inc, p_slot, side="right")
    blk = jnp.minimum(blk, nblk - 1).astype(jnp.int32)
    csum_exc = csum_inc - counts
    within = p_slot - csum_exc[blk]                             # rank in blk

    subrow = sub_counts[blk]                                    # (MO, ns)
    sub_inc = jnp.cumsum(subrow, axis=1)                        # inclusive
    sub_idx = jnp.sum((sub_inc <= within[:, None]).astype(jnp.int32),
                      axis=1)
    sub_idx = jnp.minimum(sub_idx, nsub - 1)
    sub_exc = sub_inc - subrow
    within_sub = within - jnp.take_along_axis(
        sub_exc, sub_idx[:, None], axis=1)[:, 0]                # rank in sub

    rows = mask.reshape(nblk * nsub, sub_block)[
        blk * nsub + sub_idx].astype(jnp.int32)                 # (MO, SUB)
    prefix = jnp.cumsum(rows, axis=1)                           # 1-indexed
    pos = jnp.sum((prefix <= within_sub[:, None]).astype(jnp.int32), axis=1)
    out_pos = blk * sel_block + sub_idx * sub_block + pos
    out_valid = p_slot < jnp.minimum(total, max_out)
    return out_pos.astype(jnp.int32), out_valid


def win_downsample_dense(coords, valid, in_shape, out_shape,
                         max_out: int, kernel_size=(3, 3, 3),
                         stride=(2, 2, 2), padding=(1, 1, 1),
                         sel_block: int = 512):
    """Dense-occupancy win_downsample (same contract): the scatter variant's
    8V-candidate scatter-max is the single most expensive op at batch 1
    (49 ms of the 52 ms L0->L1 stage on v5e — TPU scatter with colliding
    indices is row-rate bound). Here only the V UNIQUE actives are
    scattered (fast unique-indices path), the spconv receptive-field rule
    becomes ONE max-pool over the dense occupancy (out cell active iff any
    input active in its kernel footprint — reduce_window, pure VPU), and
    the active list is recovered with the same blockwise rank-select. The
    dense (ny, nx, nz) int8 occupancy is the memory cost — fine at small
    batch, so DOWNSAMPLE_IMPL='auto' picks this at batch <= 2."""
    nz_i, ny_i, nx_i = (int(s) for s in in_shape)
    nz_o, ny_o, nx_o = (int(s) for s in out_shape)
    kz, ky, kx = kernel_size
    sz, sy, sx = stride
    pz, py, px = padding

    # (y, x, z) layout so ascending flat index == ascending yxz id.
    # Invalid slots are routed to a positive out-of-bounds index and
    # dropped (negative -1 coords would WRAP under jnp .at semantics);
    # the applied indices are the unique active cells -> the scatter
    # takes XLA's fast unique-indices path (no collision handling).
    iy = jnp.where(valid, coords[:, 1], ny_i)
    ix = jnp.where(valid, coords[:, 2], nx_i)
    iz = jnp.where(valid, coords[:, 0], nz_i)
    occ = jnp.zeros((ny_i, nx_i, nz_i), jnp.int8)
    occ = occ.at[iy, ix, iz].max(
        jnp.int8(1), mode="drop", unique_indices=True)

    pooled = jax.lax.reduce_window(
        occ, jnp.int8(0), jax.lax.max,
        window_dimensions=(ky, kx, kz), window_strides=(sy, sx, sz),
        padding=((py, py), (px, px), (pz, pz)),
    )
    assert pooled.shape == (ny_o, nx_o, nz_o), (pooled.shape, out_shape)

    flat = pooled.reshape(-1)
    pad = (-flat.shape[0]) % sel_block
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), jnp.int8)])
    out_pos, out_valid = _mask_rank_select(flat, max_out, sel_block)

    # flat (y, x, z) position -> coords -> guard-banded yxz id (monotone
    # in the flat order, so the output stays ascending)
    oy = out_pos // (nx_o * nz_o)
    rem = out_pos % (nx_o * nz_o)
    oxc = rem // nz_o
    ozc = rem % nz_o
    stride_x, stride_y = _yxz_strides(out_shape)
    sentinel = (ny_o + 1) * stride_y + stride_x + 2
    out_ids = oy * stride_y + (oxc + 1) * stride_x + (ozc + 1)
    out_coords = jnp.where(
        out_valid[:, None],
        jnp.stack([ozc, oy, oxc], axis=1), -1
    ).astype(jnp.int32)
    p_slot = jnp.arange(max_out, dtype=jnp.int32)
    out_ids = jnp.where(out_valid, out_ids, sentinel + p_slot)
    return out_ids.astype(jnp.int32), out_coords, out_valid


def win_downsample_scatter(coords, valid, in_shape, out_shape,
                           max_out: int, kernel_size=(3, 3, 3),
                           stride=(2, 2, 2), padding=(1, 1, 1),
                           sel_block: int = 512):
    """Sort-free win_downsample (same contract): at batch 1 the ~8V-entry
    bitonic sort is the single most expensive op in the whole backbone
    (~92 ms of a 258 ms scan — serial-depth-bound, not FLOP-bound). This
    variant is O(V) scatter + dense rank-select:

      1. scatter-max candidate ids into a dense int8 mask over the
         guard-banded coarse grid (duplicates coalesce for free),
      2. blockwise popcounts + one small cumsum give each OUTPUT slot's
         containing block via searchsorted,
      3. the position within the block is an in-block prefix-sum rank —
         dense VPU math on (max_out, sel_block).

    The output is ascending by construction; invalid slots carry the same
    ascending sentinels as win_downsample."""
    kz, ky, kx = kernel_size
    sz, sy, sx = stride
    pz, py, px = padding
    nz_o, ny_o, nx_o = (int(s) for s in out_shape)

    def axis_candidates(i, ks, s, p, n_out):
        lo = jnp.ceil((i + p - ks + 1) / s).astype(jnp.int32)
        hi = jnp.floor((i + p) / s).astype(jnp.int32)
        max_c = (ks + s - 1) // s + 1
        cand = lo[:, None] + jnp.arange(max_c)[None, :]
        ok = (cand <= hi[:, None]) & (cand >= 0) & (cand < n_out)
        return cand, ok

    cz, okz = axis_candidates(coords[:, 0], kz, sz, pz, nz_o)
    cy, oky = axis_candidates(coords[:, 1], ky, sy, py, ny_o)
    cx, okx = axis_candidates(coords[:, 2], kx, sx, px, nx_o)

    stride_x, stride_y = _yxz_strides(out_shape)
    cid = (cy[:, None, :, None] * stride_y
           + (cx[:, None, None, :] + 1) * stride_x
           + (cz[:, :, None, None] + 1))
    ok = (okz[:, :, None, None] & oky[:, None, :, None]
          & okx[:, None, None, :]) & valid[:, None, None, None]
    sentinel = (ny_o + 1) * stride_y + stride_x + 2
    # invalid candidates land on a dummy tail cell (sliced off below)
    cid = jnp.where(ok, cid, sentinel).reshape(-1)

    nblk = -(-(sentinel + 1) // sel_block)
    msize = nblk * sel_block
    mask = jnp.zeros((msize,), jnp.int8).at[cid].max(
        jnp.int8(1), mode="drop")
    # kill the dummy cell and anything past it
    live = jnp.arange(msize, dtype=jnp.int32) < sentinel
    mask = jnp.where(live, mask, jnp.int8(0))

    out_ids, out_valid = _mask_rank_select(mask, max_out, sel_block)
    p_slot = jnp.arange(max_out, dtype=jnp.int32)

    oy = out_ids // stride_y
    rem = out_ids % stride_y
    oxc = rem // stride_x - 1
    ozc = rem % stride_x - 1
    out_coords = jnp.where(
        out_valid[:, None],
        jnp.stack([ozc, oy, oxc], axis=1), -1
    ).astype(jnp.int32)
    out_ids = jnp.where(out_valid, out_ids, sentinel + p_slot)
    return out_ids.astype(jnp.int32), out_coords, out_valid


def win_inverse_conv(coarse_coords, coarse_valid, coarse_feats, fine_ids,
                     fine_valid, fine_shape, coarse_shape, weights,
                     kernel_size=(3, 3, 3), stride=(2, 2, 2),
                     padding=(1, 1, 1), block: int = 256, window: int = 512,
                     precision=None):
    """Sparse INVERSE (transposed) conv on the windowed pipeline
    (spconv.SparseInverseConv3d semantics): output active set = the stored
    fine-level set; out[f] = sum_t W_t contributions from the coarse cell c
    with s*c + t - pad = f.

    ONE windowed_conv call — the exact transpose of the forward strided
    formulation: map each coarse cell into the FINE id space via
    strided_base_ids (monotone, sorted, sentinel-padded), then for tap t the
    match `base(c) + delta_t == fine_id(f)` is a constant id shift, i.e.
    windowed_conv(src=coarse-in-fine-ids, tgt=fine_ids, deltas=-strided
    deltas). Tap t of `weights` (K, Cin_coarse, Cout) is the kernel position
    of the corresponding FORWARD conv (a fixed re-indexing of spconv's
    inverse-conv kernel layout — identical expressiveness; noted for
    checkpoint-import parity).

    Single sample; coarse list must be sorted by its own yxz id (pipeline
    invariant), fine_ids sorted with Vf % block == 0.
    Returns (out (Vf, Cout), overflow).
    """
    base = strided_base_ids(coarse_coords, coarse_valid, stride,
                            fine_shape, coarse_shape)
    deltas = jnp.asarray(
        strided_deltas(kernel_size, stride, padding, fine_shape))
    out, ovf = windowed_conv(
        base, jnp.where(coarse_valid[:, None], coarse_feats, 0.0),
        fine_ids, weights, -deltas, block=block, window=window,
        precision=precision,
        sentinel_start=yxz_sentinel_start(fine_shape))
    out = jnp.where(fine_valid[:, None], out, 0.0)
    return out, ovf


def bev_merge(coords_list, valid_list, feats_list, scales, bev_shape,
              max_out: int):
    """Multi-scale sparse BEV collapse (VoxelNeXt's bev_out +
    multi-scale concat, spconv_backbone_voxelnext.py:141-186): scale each
    level's (y, x) coords into the target BEV grid, drop z, and SUM the
    features of coinciding cells. Single sample; batch via vmap.

    coords_list: per scale (V_i, 3) zyx int32; scales: static ints mapping
    each level's coords into the target grid; bev_shape: (ny, nx).
    Returns (ids (Vo,), coords (Vo, 3) zyx with z=0, valid (Vo,), feats
    (Vo, C)) sorted by the (1, ny, nx) guard-banded yxz id — i.e. a ready
    windowed level for the sparse-2D head stages.
    """
    ny, nx = (int(s) for s in bev_shape)
    shape2d = (1, ny, nx)
    stride_x, stride_y = _yxz_strides(shape2d)
    sentinel = yxz_sentinel_start(shape2d)
    c = feats_list[0].shape[-1]

    all_ids, all_feats = [], []
    for coords, valid, feats, s in zip(coords_list, valid_list, feats_list,
                                       scales):
        y = coords[:, 1] * s
        x = coords[:, 2] * s
        inside = valid & (y >= 0) & (y < ny) & (x >= 0) & (x < nx)
        ids = y * stride_y + (x + 1) * stride_x + 1
        all_ids.append(jnp.where(inside, ids, sentinel))
        all_feats.append(jnp.where(inside[:, None], feats, 0.0))
    ids = jnp.concatenate(all_ids)
    feats = jnp.concatenate(all_feats, axis=0)

    order = jnp.argsort(ids)
    ids_s = ids[order]
    feats_s = feats[order]
    is_real = ids_s < sentinel
    newseg = jnp.concatenate(
        [is_real[:1], (ids_s[1:] != ids_s[:-1]) & is_real[1:]]
    )
    slot = jnp.cumsum(newseg.astype(jnp.int32)) - 1
    in_cap = is_real & (slot < max_out) & (slot >= 0)
    write = jnp.where(in_cap, slot, max_out)

    out_feats = jnp.zeros((max_out + 1, c), feats.dtype)
    out_feats = out_feats.at[write].add(
        jnp.where(in_cap[:, None], feats_s, 0.0))[:max_out]
    out_ids = jnp.full((max_out + 1,), jnp.iinfo(jnp.int32).max, jnp.int32)
    out_ids = out_ids.at[jnp.where(in_cap & newseg, slot, max_out)].min(
        ids_s)[:max_out]
    num_out = jnp.minimum(jnp.sum(newseg), max_out)
    out_valid = jnp.arange(max_out) < num_out

    oy = out_ids // stride_y
    rem = out_ids % stride_y
    ox = rem // stride_x - 1
    out_coords = jnp.where(
        out_valid[:, None],
        jnp.stack([jnp.zeros_like(oy), oy, ox], axis=1), -1
    ).astype(jnp.int32)
    slot_arange = jnp.arange(max_out, dtype=jnp.int32)
    out_ids = jnp.where(out_valid, out_ids, sentinel + slot_arange)
    return (out_ids.astype(jnp.int32), out_coords, out_valid,
            jnp.where(out_valid[:, None], out_feats, 0.0))


def coords_to_dense(coords, valid, feats, shape):
    """(V, C) active features + zyx coords -> dense (nz, ny, nx, C); the
    tableless counterpart of sparse_to_dense for the windowed pipeline."""
    nz, ny, nx = (int(s) for s in shape)
    c = feats.shape[-1]
    lin, inside = linear_id(coords, (nz, ny, nx))
    lin = jnp.where(valid & inside, lin, nz * ny * nx)
    dense = jnp.zeros((nz * ny * nx + 1, c), feats.dtype)
    dense = dense.at[lin].set(
        jnp.where((valid & inside)[:, None], feats, 0.0)
    )
    return dense[:-1].reshape(nz, ny, nx, c)


def focal_dilate(ids, feats, cand_mask, shape, max_out: int):
    """Focal sparse conv active-set dilation (reference
    focal_sparse_conv/focal_sparse_utils.py:89-147 split_voxels +
    check_repeat, TPU formulation): every selected (voxel, kernel-offset)
    pair contributes a ZERO-feature cell at that offset; the candidates are
    merged with the existing actives, dedup'd by id (stable sort — an
    original keeps its features when a candidate collides; the reference's
    importance-averaging on such collisions is a side effect of its
    index_add dedup and is not replicated), and capped to the `max_out`
    smallest ids.

    ids (V,) sorted guard-banded yxz ids (ascending sentinels for invalid
    slots); feats (V, C); cand_mask (V, 26) bool over the non-center 3x3x3
    offsets in `_kernel_offsets` order (center removed).
    Returns (ids', coords', valid', feats'), sorted, fixed size max_out."""
    nz, ny, nx = (int(s) for s in shape)
    stride_x, stride_y = _yxz_strides(shape)
    sentinel = yxz_sentinel_start(shape)

    offs = np.asarray(_kernel_offsets((3, 3, 3)))
    offs = offs[~np.all(offs == 0, axis=1)]            # (26, 3) zyx
    deltas = jnp.asarray(
        offs[:, 1] * stride_y + offs[:, 2] * stride_x + offs[:, 0],
        jnp.int32)

    cand = ids[:, None] + deltas[None, :]              # (V, 26)
    cy = cand // stride_y
    rem = cand % stride_y
    cx = rem // stride_x - 1
    cz = rem % stride_x - 1
    ok = (cand_mask & (ids < sentinel)[:, None]
          & (cy >= 0) & (cy < ny) & (cx >= 0) & (cx < nx)
          & (cz >= 0) & (cz < nz))
    big = jnp.iinfo(jnp.int32).max
    cand = jnp.where(ok, cand, big).reshape(-1)

    all_ids = jnp.concatenate([jnp.where(ids < sentinel, ids, big), cand])
    c = feats.shape[1]
    feats_ext = jnp.concatenate(
        [feats, jnp.zeros((cand.shape[0], c), feats.dtype)], axis=0)
    perm = jnp.argsort(all_ids, stable=True)
    ids_s = all_ids[perm]
    newseg = jnp.concatenate(
        [ids_s[:1] < big, (ids_s[1:] != ids_s[:-1]) & (ids_s[1:] < big)])
    uniq_key = jnp.where(newseg, ids_s, big)
    order = jnp.argsort(uniq_key, stable=True)[:max_out]
    out_ids = uniq_key[order]
    out_valid = out_ids < big
    out_feats = jnp.where(out_valid[:, None], feats_ext[perm[order]], 0.0)

    oy = out_ids // stride_y
    rem = out_ids % stride_y
    oxc = rem // stride_x - 1
    ozc = rem % stride_x - 1
    out_coords = jnp.where(
        out_valid[:, None], jnp.stack([ozc, oy, oxc], axis=1), -1
    ).astype(jnp.int32)
    slot = jnp.arange(max_out, dtype=jnp.int32)
    out_ids = jnp.where(out_valid, out_ids, sentinel + slot).astype(jnp.int32)
    return out_ids, out_coords, out_valid, out_feats
