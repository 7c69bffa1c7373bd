"""Pallas TPU kernel: fused windowed sparse convolution.

The XLA formulation (ops/sparse_ops.windowed_conv) spends its time in 27
separate window slices and padded-out one-hot matmuls. This kernel fuses the
whole conv per target block:

  * ONE union window of source features/ids is DMA'd into VMEM per block
    (all 27 taps' neighbors live in a single contiguous span when the active
    list is (y, x, z)-major sorted — PERF.md),
  * the one-hot alignment runs TRANSPOSED on the MXU — (C, S) x (S, W) —
    so the small channel count sits in the sublane dim and the wide W in the
    lanes (full MXU utilization at C=16 where the naive layout wastes 8x),
  * per-tap gathered features accumulate into a (K*C, W) VMEM buffer which
    one final (Cout, K*C) x (K*C, W) matmul turns into the output block.

Inputs are prepared by the caller (sparse_ops.windowed_conv_pallas): sorted
ids, transposed features (C, V), per-block window starts lo (NB,), and
per-tap weights. Gradients fall back to the XLA windowed_conv via
jax.custom_vjp (numerically identical semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_kernel(lo_ref, tgt_ref, ids_hbm, feats_hbm, deltas_ref, w_ref,
                  out_ref, win_ids, win_feats, gbuf, sem_i, sem_f):
    """Grid: (NB,). One target block per step.

    lo_ref: (NB,) SMEM window starts (scalar-prefetched)
    tgt_ref: (W_BLK,) VMEM target ids for this block
    ids_hbm: (V,) int32 in ANY/HBM; feats_hbm: (C, V) in ANY/HBM
    deltas_ref: (K, 1) SMEM; w_ref: (Cout, K*C) VMEM
    out_ref: (Cout, W_BLK) VMEM output block
    win_ids: (S,) VMEM scratch; win_feats: (C, S) VMEM scratch
    gbuf: (K*C, W_BLK) VMEM scratch
    """
    i = pl.program_id(0)
    lo = pl.multiple_of(lo_ref[i], 512)  # aligned by the caller
    s = win_ids.shape[0]
    k = deltas_ref.shape[0]
    c = win_feats.shape[0]
    w_blk = tgt_ref.shape[0]

    cp_i = pltpu.make_async_copy(ids_hbm.at[pl.ds(lo, s)], win_ids, sem_i)
    cp_f = pltpu.make_async_copy(
        feats_hbm.at[:, pl.ds(lo, s)], win_feats, sem_f)
    cp_i.start()
    cp_f.start()
    cp_i.wait()
    cp_f.wait()

    tgt = tgt_ref[:]                      # (W,)
    wi = win_ids[:]                       # (S,)
    wf = win_feats[:]                     # (C, S)

    def tap(kk, _):
        want = tgt + deltas_ref[kk, 0]    # (W,)
        onehot = (wi[:, None] == want[None, :]).astype(wf.dtype)  # (S, W)
        g = jnp.dot(wf, onehot, preferred_element_type=jnp.float32)  # (C, W)
        gbuf[pl.ds(kk * c, c), :] = g.astype(gbuf.dtype)
        return 0

    jax.lax.fori_loop(0, k, tap, 0)
    out_ref[:, :] = jnp.dot(
        w_ref[:], gbuf[:], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block", "window"),
)
def _fused_call(ids, feats_t, tgt_ids, lo, deltas, w_flat, block, window):
    """ids (V,), feats_t (C, V), tgt_ids (Vt,), lo (NB,), deltas (K,),
    w_flat (Cout, K*C) -> out (Vt, Cout)."""
    v = ids.shape[0]
    vt = tgt_ids.shape[0]
    nb = vt // block
    c = feats_t.shape[0]
    k = deltas.shape[0]
    cout = w_flat.shape[0]
    compute_dtype = feats_t.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,          # lo
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block,), lambda i, lo_ref: (i,),
                         memory_space=pltpu.VMEM),          # tgt block
            pl.BlockSpec(memory_space=pltpu.ANY),           # ids (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),           # feats_t (HBM)
            pl.BlockSpec((k, 1), lambda i, lo_ref: (0, 0),
                         memory_space=pltpu.SMEM),          # deltas
            pl.BlockSpec((cout, k * c), lambda i, lo_ref: (0, 0),
                         memory_space=pltpu.VMEM),          # weights
        ],
        out_specs=pl.BlockSpec((cout, block), lambda i, lo_ref: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((window,), jnp.int32),
            pltpu.VMEM((c, window), compute_dtype),
            pltpu.VMEM((k * c, block), compute_dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out_t = pl.pallas_call(
        _fused_kernel,
        out_shape=jax.ShapeDtypeStruct((cout, vt), jnp.float32),
        grid_spec=grid_spec,
    )(lo, tgt_ids, ids, feats_t, deltas[:, None], w_flat)
    return out_t.T


def windowed_conv_pallas(src_ids, src_feats, tgt_ids, weights, deltas,
                         block: int = 512, window: int = 1536,
                         sentinel_start=None, compute_dtype=jnp.bfloat16):
    """Drop-in fused variant of sparse_ops.windowed_conv (same contract,
    same (out, overflow) return). Union window per block; gradients route
    through the XLA implementation via custom_vjp."""
    from .sparse_ops import windowed_conv  # XLA fallback for VJP

    vs, cin = src_feats.shape
    vt = tgt_ids.shape[0]
    k, _, cout = weights.shape
    nb = vt // block
    assert nb * block == vt, "pad Vt to a multiple of block"
    window = min(window, vs)

    d_min = jnp.min(deltas)
    block_first = tgt_ids[::block]
    lo = jnp.searchsorted(src_ids, block_first + d_min)
    # TPU DMA offsets must be tile-aligned: round starts down to 512 and
    # widen the window by the same margin
    window = min(window + 512, vs)
    lo_max = ((vs - window) // 512) * 512
    lo = jnp.minimum((lo // 512) * 512, lo_max).astype(jnp.int32)

    # overflow check against the UNION window (sentinel-aware like
    # windowed_conv)
    d_max = jnp.max(deltas)
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

    feats_t = src_feats.T.astype(compute_dtype)
    w_flat = jnp.transpose(weights, (2, 0, 1)).reshape(cout, k * cin)
    w_flat = w_flat.astype(compute_dtype)
    out = _fused_call(src_ids, feats_t, tgt_ids, lo, deltas, w_flat,
                      block, window)
    return out.astype(src_feats.dtype), overflow
