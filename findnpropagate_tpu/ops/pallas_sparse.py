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

All HBM operands are kept 2-D with the sliced axis LAST (lane dim), window
starts/sizes aligned to 512 — the layouts Mosaic handles natively.

Training: `windowed_conv_pallas_diff` wraps the kernel in a custom VJP —
d_feats is the TRANSPOSED windowed conv (same Pallas kernel with swapped
id lists, negated deltas and (Cout, Cin) weights), and dW is a per-tap
windowed gather + (C, Vt) x (Vt, Cout) matmul in XLA. Both directions run
the same slice-DMA + MXU pattern as the forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALIGN = 512


def _fused_kernel(lo_ref, tap_lo_ref, tgt_hbm, ids_hbm, feats_hbm,
                  deltas_ref, w_ref, *rest, precision=None, epilogue=False,
                  relu=False, sentinel=None, tap_window=None,
                  sub_block=None, unroll=False):
    """Grid: (NB,). One target block per step.

    lo_ref: (NB,) SMEM window starts (scalar-prefetched, 512-aligned)
    tap_lo_ref: (NB, K) SMEM per-tap sub-window starts RELATIVE to lo
    (128-aligned; all zeros when tap_window is None); with `sub_block`
    set the layout is (NB, K*NSUB) — one start per (tap, target sub-span)
    tgt_hbm: (1, Vt) int32 ANY target ids (block i sliced by DMA)
    ids_hbm: (1, V) int32 ANY; feats_hbm: (C, V) ANY
    deltas_ref: (K, 1) SMEM; w_ref: (Cout, K*C) VMEM
    [scale_ref, shift_ref: (Cout, 1) VMEM — when epilogue]
    out_ref: (Cout, W_BLK) VMEM output block
    win_ids: (1, S) VMEM scratch; win_feats: (C, S) VMEM scratch
    tgt_buf: (1, W_BLK) VMEM scratch; gbuf: (K*C, W_BLK) VMEM scratch

    Per-tap sub-windows (`tap_window` = S_sub < S): each tap's true
    neighbor span is only ~(block + local-density margin) ids wide, while
    the UNION window must cover the full d_min..d_max spread — so the
    one-hot compare volume and the gather matmul FLOPs shrink by S/S_sub
    when each tap reads just its own slice of the resident window.

    Banded sub-spans (`sub_block` = W_sub < W_BLK, with tap_window the
    per-(tap, sub-span) source width): the tap span scales with the
    TARGET width it serves, so splitting the block into NSUB target
    sub-spans with their own (narrower) source slices shrinks the compare
    volume and matmul MACs by ~W_BLK/W_sub again — the alignment between
    two sorted id lists is locally banded.

    Epilogue (fused bias+BN+ReLU for the eval path): out = out*scale +
    shift, optional relu, and rows whose target id >= `sentinel` (padding /
    inactive slots) zeroed — replacing three XLA elementwise HBM round
    trips per conv with in-VMEM math.
    """
    if epilogue:
        (scale_ref, shift_ref, out_ref, win_ids, win_feats, tgt_buf, gbuf,
         sem_i, sem_f, sem_t) = rest
    else:
        (out_ref, win_ids, win_feats, tgt_buf, gbuf,
         sem_i, sem_f, sem_t) = rest
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    s = win_ids.shape[2]
    k = deltas_ref.shape[0]
    c = win_feats.shape[1]
    w_blk = tgt_buf.shape[2]
    slot = jax.lax.rem(i, 2)

    # double-buffered manual pipeline: the window DMA for block i+1 is in
    # flight while block i computes (scratch leading dim = slot)
    def copies(j, sl):
        lo_j = pl.multiple_of(lo_ref[j], ALIGN)
        t0_j = pl.multiple_of(j * w_blk, ALIGN)  # block % 512 (asserted)
        return (
            pltpu.make_async_copy(
                ids_hbm.at[:, pl.ds(lo_j, s)], win_ids.at[sl], sem_i.at[sl]),
            pltpu.make_async_copy(
                feats_hbm.at[:, pl.ds(lo_j, s)], win_feats.at[sl],
                sem_f.at[sl]),
            pltpu.make_async_copy(
                tgt_hbm.at[:, pl.ds(t0_j, w_blk)], tgt_buf.at[sl],
                sem_t.at[sl]),
        )

    @pl.when(i == 0)
    def _():
        for cp in copies(0, 0):
            cp.start()

    @pl.when(i + 1 < nb)
    def _():
        for cp in copies(i + 1, 1 - slot):
            cp.start()

    for cp in copies(i, slot):
        cp.wait()

    tgt = tgt_buf[slot, 0, :]             # (W,)

    def tap(kk, _):
        if sub_block is not None:
            nsub = w_blk // sub_block
            for j in range(nsub):
                off = pl.multiple_of(tap_lo_ref[i, kk * nsub + j], 128)
                wi = win_ids[slot, 0, pl.ds(off, tap_window)]
                wf = win_feats[slot, :, pl.ds(off, tap_window)]
                want = (tgt_buf[slot, 0, pl.ds(j * sub_block, sub_block)]
                        + deltas_ref[kk, 0])
                onehot = (wi[:, None] == want[None, :]).astype(wf.dtype)
                g = jnp.dot(wf, onehot, preferred_element_type=jnp.float32,
                            precision=precision)  # (C, W_sub)
                gbuf[pl.ds(pl.multiple_of(kk * c, 8), c),
                     pl.ds(j * sub_block, sub_block)] = g.astype(gbuf.dtype)
            return 0
        want = tgt + deltas_ref[kk, 0]    # (W,)
        if tap_window is None:
            wi = win_ids[slot, 0, :]      # (S,)
            wf = win_feats[slot]          # (C, S)
        else:
            off = pl.multiple_of(tap_lo_ref[i, kk], 128)
            wi = win_ids[slot, 0, pl.ds(off, tap_window)]
            wf = win_feats[slot, :, pl.ds(off, tap_window)]
        onehot = (wi[:, None] == want[None, :]).astype(wf.dtype)  # (S', W)
        g = jnp.dot(wf, onehot, preferred_element_type=jnp.float32,
                    precision=precision)  # (C, W)
        gbuf[pl.ds(pl.multiple_of(kk * c, 8), c), :] = g.astype(gbuf.dtype)
        return 0

    if unroll:
        # static tap indices: deltas/tap starts become immediate operands
        # and Mosaic can software-pipeline the compare (VPU) of tap kk+1
        # against the gather matmul (MXU) of tap kk
        for kk in range(k):
            tap(kk, 0)
    else:
        jax.lax.fori_loop(0, k, tap, 0)
    acc = jnp.dot(
        w_ref[:], gbuf[:], preferred_element_type=jnp.float32,
        precision=precision,
    )
    if epilogue:
        acc = acc * scale_ref[:] + shift_ref[:]
        if relu:
            acc = jnp.maximum(acc, 0.0)
        live = (tgt < sentinel)[None, :]          # (1, W) row mask
        acc = jnp.where(live, acc, 0.0)
    out_ref[:, :] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "block", "window", "interpret", "relu", "sentinel", "tap_window",
    "sub_block", "unroll"))
def _fused_call(ids2, feats_t, tgt2, lo, tap_lo, deltas, w_flat, block,
                window, scale=None, shift=None, relu=False, sentinel=None,
                tap_window=None, sub_block=None, unroll=False,
                interpret=False):
    """ids2 (1, V), feats_t (C, V), tgt2 (NB, block), lo (NB,),
    tap_lo (NB, K) per-tap relative sub-window starts, deltas (K,),
    w_flat (Cout, K*C) -> out (Vt, Cout) f32. With scale/shift (Cout,) the
    affine+relu+padding-mask epilogue runs in-kernel (sentinel = first
    padding id, static)."""
    nb = tgt2.shape[0]
    vt = nb * block
    c = feats_t.shape[0]
    k = deltas.shape[0]
    cout = w_flat.shape[0]
    compute_dtype = feats_t.dtype
    epilogue = scale is not None

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),           # tgt ids (HBM)
        pl.BlockSpec(memory_space=pltpu.ANY),           # ids (HBM)
        pl.BlockSpec(memory_space=pltpu.ANY),           # feats_t (HBM)
        pl.BlockSpec((k, 1), lambda i, *_: (0, 0),
                     memory_space=pltpu.SMEM),          # deltas
        pl.BlockSpec((cout, k * c), lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM),          # weights
    ]
    operands = [lo, tap_lo, tgt2.reshape(1, -1), ids2, feats_t,
                deltas[:, None], w_flat]
    if epilogue:
        for _ in range(2):
            in_specs.append(
                pl.BlockSpec((cout, 1), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM))  # scale / shift
        operands.extend([scale.astype(jnp.float32)[:, None],
                         shift.astype(jnp.float32)[:, None]])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,          # lo, tap_lo
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((cout, block), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 1, window), jnp.int32),
            pltpu.VMEM((2, c, window), compute_dtype),
            pltpu.VMEM((2, 1, block), jnp.int32),
            pltpu.VMEM((k * c, block), compute_dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # bf16 inputs are single-pass exact on the MXU; f32 inputs need the
    # full-precision contraction (Mosaic rejects fp32 precision on bf16)
    prec = jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else None
    out_t = pl.pallas_call(
        functools.partial(_fused_kernel, precision=prec, epilogue=epilogue,
                          relu=relu, sentinel=sentinel,
                          tap_window=tap_window, sub_block=sub_block,
                          unroll=unroll),
        out_shape=jax.ShapeDtypeStruct((cout, vt), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*operands)
    return out_t.T


def windowed_overflow(src_ids, tgt_ids, deltas, block, window,
                      sentinel_start=None, tap_window=None):
    """Union-window exactness check (shared by the fwd/bwd directions):
    counts target blocks whose true neighbor span exceeds `window`, plus
    — when per-tap sub-windows are active — (block, tap) pairs whose span
    exceeds `tap_window` (mirrors windowed_conv_pallas exactly)."""
    vs = src_ids.shape[0]
    vt = tgt_ids.shape[0]
    nb = vt // block
    window = min(window, vs)
    d_min = jnp.min(deltas)
    d_max = jnp.max(deltas)
    block_first = tgt_ids[::block]
    lo = jnp.searchsorted(src_ids, block_first + d_min)
    lo = jnp.minimum((lo // ALIGN) * ALIGN,
                     max(((vs - window) // ALIGN) * ALIGN, 0))
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
    total = jnp.sum(((hi - lo) > window) & has_real)
    if tap_window is not None and tap_window < window:
        k_taps = deltas.shape[0]
        lo_tap_g = jnp.searchsorted(
            src_ids,
            (block_first[:, None] + deltas[None, :]).reshape(-1)
        ).reshape(nb, k_taps)
        rel = jnp.clip(((lo_tap_g - lo[:, None]) // 128) * 128,
                       0, window - tap_window)
        hi_tap = jnp.searchsorted(
            src_ids,
            (block_last[:, None] + deltas[None, :]).reshape(-1),
            side="right").reshape(nb, k_taps)
        total = total + jnp.sum(
            ((hi_tap - (lo[:, None] + rel)) > tap_window)
            & has_real[:, None])
    return total


def _dw_kernel(lo_ref, tgt_hbm, ids_hbm, feats_hbm, g_hbm, deltas_ref,
               out_ref, win_ids, win_feats, tgt_buf, g_buf, sem_i, sem_f,
               sem_t, sem_g, *, precision=None):
    """Grid: (NB,). dW accumulated across ALL blocks into one (K*C, Cout)
    output (same index for every grid step — the block stays resident in
    VMEM, Mosaic writes it back once).

    Per block this reuses the forward's union-window DMA + per-tap one-hot
    gather (C, W) and adds a single (C, W) x (W, Cout) matmul per tap —
    ~2x the forward's FLOPs versus the XLA fallback's 27x window
    re-gather traffic."""
    i = pl.program_id(0)
    lo = pl.multiple_of(lo_ref[i], ALIGN)
    s = win_ids.shape[1]
    k = deltas_ref.shape[0]
    c = win_feats.shape[0]
    w_blk = tgt_buf.shape[1]
    t0 = pl.multiple_of(i * w_blk, ALIGN)

    cp_i = pltpu.make_async_copy(ids_hbm.at[:, pl.ds(lo, s)], win_ids, sem_i)
    cp_f = pltpu.make_async_copy(
        feats_hbm.at[:, pl.ds(lo, s)], win_feats, sem_f)
    cp_t = pltpu.make_async_copy(
        tgt_hbm.at[:, pl.ds(t0, w_blk)], tgt_buf, sem_t)
    cp_g = pltpu.make_async_copy(
        g_hbm.at[:, pl.ds(t0, w_blk)], g_buf, sem_g)
    cp_i.start()
    cp_f.start()
    cp_t.start()
    cp_g.start()
    cp_i.wait()
    cp_f.wait()
    cp_t.wait()
    cp_g.wait()

    @pl.when(i == 0)
    def _init():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    tgt = tgt_buf[0, :]
    wi = win_ids[0, :]
    wf = win_feats[:]
    gt = g_buf[:]                          # (Cout, W)

    def tap(kk, _):
        want = tgt + deltas_ref[kk, 0]
        onehot = (wi[:, None] == want[None, :]).astype(wf.dtype)  # (S, W)
        gath = jnp.dot(wf, onehot, preferred_element_type=jnp.float32,
                       precision=precision)                       # (C, W)
        dw_k = jnp.dot(gath.astype(wf.dtype), gt.T,
                       preferred_element_type=jnp.float32,
                       precision=precision)                       # (C, Cout)
        row = pl.ds(pl.multiple_of(kk * c, 8), c)
        out_ref[row, :] += dw_k.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, k, tap, 0)


@functools.partial(jax.jit, static_argnames=("block", "window", "interpret"))
def _dw_call(ids2, feats_t, tgt2, g_t, lo, deltas, block, window,
             interpret=False):
    """ids2 (1, V), feats_t (C, V), tgt2 (NB, block), g_t (Cout, Vt),
    lo (NB,), deltas (K,) -> dW (K, C, Cout) f32."""
    nb = tgt2.shape[0]
    c = feats_t.shape[0]
    k = deltas.shape[0]
    cout = g_t.shape[0]
    compute_dtype = feats_t.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),       # tgt ids (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),       # src ids (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),       # feats_t (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),       # g_t (HBM)
            pl.BlockSpec((k, 1), lambda i, lo_ref: (0, 0),
                         memory_space=pltpu.SMEM),      # deltas
        ],
        out_specs=pl.BlockSpec((k * c, cout), lambda i, lo_ref: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, window), jnp.int32),
            pltpu.VMEM((c, window), compute_dtype),
            pltpu.VMEM((1, block), jnp.int32),
            pltpu.VMEM((cout, block), compute_dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    prec = jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else None
    dw = pl.pallas_call(
        functools.partial(_dw_kernel, precision=prec),
        out_shape=jax.ShapeDtypeStruct((k * c, cout), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(lo, tgt2.reshape(1, -1), ids2, feats_t, g_t, deltas[:, None])
    return dw.reshape(k, c, cout)


def windowed_dw_pallas(src_ids, src_feats, tgt_ids, g, deltas,
                       block: int = 512, window: int = 1536,
                       compute_dtype=jnp.bfloat16, interpret=False):
    """dW[k] = gathered_k(src->tgt)^T @ g via the fused union-window kernel.
    Same contract as _windowed_dw; returns (K, Cin, Cout) f32."""
    vs, cin = src_feats.shape
    vt = tgt_ids.shape[0]
    k = deltas.shape[0]
    cout = g.shape[1]
    nb = vt // block
    assert nb * block == vt and block % ALIGN == 0

    pad_src = (-vs) % ALIGN
    if pad_src:
        src_ids = jnp.concatenate(
            [src_ids,
             src_ids[-1] + 1 + jnp.arange(pad_src, dtype=jnp.int32)])
        src_feats = jnp.concatenate(
            [src_feats, jnp.zeros((pad_src, cin), src_feats.dtype)], axis=0)
        vs = vs + pad_src
    window = -(-(min(window, vs) + ALIGN) // ALIGN) * ALIGN
    window = min(window, vs)

    d_min = jnp.min(deltas)
    lo = jnp.searchsorted(src_ids, tgt_ids[::block] + d_min)
    lo_max = ((vs - window) // ALIGN) * ALIGN
    lo = jnp.minimum((lo // ALIGN) * ALIGN, max(lo_max, 0)).astype(jnp.int32)

    cin_p = -(-cin // 8) * 8
    cout_p = -(-cout // 8) * 8
    if cin_p != cin:
        src_feats = jnp.concatenate(
            [src_feats, jnp.zeros((vs, cin_p - cin), src_feats.dtype)],
            axis=1)
    if cout_p != cout:
        g = jnp.concatenate(
            [g, jnp.zeros((vt, cout_p - cout), g.dtype)], axis=1)

    dw = _dw_call(src_ids[None, :], src_feats.T.astype(compute_dtype),
                  tgt_ids.reshape(nb, block), g.T.astype(compute_dtype),
                  lo, deltas, block, window, interpret=interpret)
    return dw[:, :cin, :cout]


def _windowed_dw(src_ids, src_feats, tgt_ids, g, deltas, block, window,
                 compute_dtype):
    """dW[k] = gathered_k(src->tgt)^T @ g — XLA windowed gather per tap.

    src_ids (Vs,) ascending, src_feats (Vs, Cin), tgt_ids (Vt,), g (Vt,
    Cout). Returns (K, Cin, Cout) f32."""
    vs, cin = src_feats.shape
    vt = tgt_ids.shape[0]
    nb = vt // block
    window = min(window, vs)
    feats = src_feats.astype(compute_dtype)
    gc = g.astype(compute_dtype)

    lo = jnp.searchsorted(
        src_ids, (tgt_ids[::block][:, None] + deltas[None, :]).reshape(-1)
    ).reshape(nb, -1)
    lo = jnp.minimum(lo, vs - window).astype(jnp.int32)
    tgt_b = tgt_ids.reshape(nb, block)

    def tap(_, inputs):
        lo_k, d_k = inputs
        win_f = jax.vmap(
            lambda l: jax.lax.dynamic_slice(feats, (l, 0), (window, cin))
        )(lo_k)
        win_i = jax.vmap(
            lambda l: jax.lax.dynamic_slice(src_ids, (l,), (window,))
        )(lo_k)
        want = tgt_b + d_k
        onehot = (win_i[:, None, :] == want[:, :, None]).astype(feats.dtype)
        gath = jnp.einsum("nws,nsc->nwc", onehot, win_f)  # (NB, W, Cin)
        dw_k = jnp.dot(gath.reshape(vt, cin).T, gc,
                       preferred_element_type=jnp.float32)
        return None, dw_k

    _, dw = jax.lax.scan(tap, None, (lo.T, deltas))
    return dw  # (K, Cin, Cout) f32


def windowed_conv_pallas_diff(src_ids, src_feats, tgt_ids, weights, deltas,
                              block: int = 512, window: int = 1536,
                              sentinel_start=None,
                              compute_dtype=jnp.bfloat16, tap_window=None,
                              unroll=False, interpret=False):
    """Differentiable fused windowed conv: Pallas forward AND Pallas
    transposed backward for d_feats; dW via the fused Pallas dW kernel.
    `tap_window` applies to BOTH directions (the transposed conv has the
    same per-tap span structure with negated deltas).

    Same contract as windowed_conv_pallas minus the overflow scalar (use
    `windowed_overflow` for the runtime exactness check — it only needs the
    id lists, so callers evaluate it once outside the grad)."""

    @functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
    def core(blk, win, cd, tw, s_ids, t_ids, dl, feats, w):
        out, _ = windowed_conv_pallas(
            s_ids, feats, t_ids, w, dl, block=blk, window=win,
            sentinel_start=None, compute_dtype=cd, tap_window=tw,
            unroll=unroll, interpret=interpret)
        return out

    def fwd(blk, win, cd, tw, s_ids, t_ids, dl, feats, w):
        return core(blk, win, cd, tw, s_ids, t_ids, dl, feats, w), \
            (s_ids, t_ids, dl, feats, w)

    def bwd(blk, win, cd, tw, res, g):
        import numpy as np
        from jax import dtypes

        s_ids, t_ids, dl, feats, w = res
        w_t = jnp.transpose(w, (0, 2, 1))          # (K, Cout, Cin)
        d_feats, _ = windowed_conv_pallas(
            t_ids, g.astype(feats.dtype), s_ids, w_t, -dl, block=blk,
            window=win, sentinel_start=None, compute_dtype=cd,
            tap_window=tw, unroll=unroll, interpret=interpret)
        d_w = windowed_dw_pallas(s_ids, feats, t_ids, g, dl, block=blk,
                                 window=win, compute_dtype=cd,
                                 interpret=interpret)
        zero_i = lambda x: np.zeros(x.shape, dtypes.float0)
        return (zero_i(s_ids), zero_i(t_ids), zero_i(dl),
                d_feats.astype(feats.dtype), d_w.astype(w.dtype))

    core.defvjp(fwd, bwd)
    # pad the src/tgt axes consistently with the kernel's internal layout:
    # the kernel pads src internally, but the TRANSPOSED call needs the src
    # list to be a block multiple too — callers guarantee both lists are
    # block multiples (backbone invariant).
    assert src_ids.shape[0] % block == 0, "pad Vs to a block multiple"
    assert tgt_ids.shape[0] % block == 0, "pad Vt to a block multiple"
    out = core(block, window, compute_dtype, tap_window, src_ids, tgt_ids,
               deltas, src_feats, weights)
    ovf = windowed_overflow(src_ids, tgt_ids, deltas, block, window,
                            sentinel_start=sentinel_start,
                            tap_window=tap_window)
    ovf = ovf + windowed_overflow(tgt_ids, src_ids, -deltas, block, window,
                                  sentinel_start=sentinel_start,
                                  tap_window=tap_window)
    return out, ovf


def windowed_conv_pallas(src_ids, src_feats, tgt_ids, weights, deltas,
                         block: int = 512, window: int = 1536,
                         sentinel_start=None, compute_dtype=jnp.bfloat16,
                         scale=None, shift=None, relu=False,
                         tap_window=None, sub_block=None, unroll=False,
                         interpret=False):
    """Drop-in fused variant of sparse_ops.windowed_conv (same contract,
    same (out, overflow) return). One UNION window per target block covers
    all taps; window starts/sizes are 512-aligned for the DMA engine.

    tap_window (static int, 128-multiple): per-tap sub-windows — each
    tap's one-hot gather reads only its own ~block-wide slice of the
    resident union window, cutting the compare volume and tap-matmul
    FLOPs by window/tap_window. Per-(block, tap) starts ride the scalar
    prefetch; the returned overflow also counts taps whose true span
    exceeds tap_window (same runtime exactness contract as the union
    check).

    scale/shift (Cout,): fuse the eval-path bias+BN affine (+ optional
    relu) and the padding-row zeroing into the kernel epilogue — requires
    a static int `sentinel_start` (first padding/inactive id)."""
    vs, cin = src_feats.shape
    vt = tgt_ids.shape[0]
    k, _, cout = weights.shape
    nb = vt // block
    assert nb * block == vt, "pad Vt to a multiple of block"
    assert block % ALIGN == 0, "pallas path needs block % 512 == 0"

    # pad source to an ALIGN multiple (ascending sentinel ids, zero feats)
    pad_src = (-vs) % ALIGN
    if pad_src:
        src_ids = jnp.concatenate(
            [src_ids,
             src_ids[-1] + 1 + jnp.arange(pad_src, dtype=jnp.int32)])
        src_feats = jnp.concatenate(
            [src_feats, jnp.zeros((pad_src, cin), src_feats.dtype)], axis=0)
        vs = vs + pad_src

    window = -(-(min(window, vs) + ALIGN) // ALIGN) * ALIGN
    window = min(window, vs)

    d_min = jnp.min(deltas)
    block_first = tgt_ids[::block]
    lo = jnp.searchsorted(src_ids, block_first + d_min)
    lo_max = ((vs - window) // ALIGN) * ALIGN
    lo = jnp.minimum((lo // ALIGN) * ALIGN, lo_max).astype(jnp.int32)

    # overflow check against the union window (sentinel-aware, see
    # sparse_ops.windowed_conv)
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

    # per-(block, tap) sub-window starts, 128-aligned and relative to lo;
    # with sub_block the granularity is (block, tap, target sub-span)
    k_taps = deltas.shape[0]
    sub_eff = None
    if tap_window is not None and tap_window < window:
        assert tap_window % 128 == 0, "tap_window must be a 128-multiple"
        if sub_block is not None and sub_block < block:
            assert block % sub_block == 0 and sub_block % 128 == 0, \
                "sub_block must be a 128-multiple dividing block"
            nsub = block // sub_block
            tgt_sub = tgt_ids.reshape(nb, nsub, sub_block)
            first_sub = tgt_sub[:, :, 0]
            if sentinel_start is not None:
                real_s = tgt_sub < sentinel_start
                last_sub = jnp.max(
                    jnp.where(real_s, tgt_sub, jnp.iinfo(jnp.int32).min),
                    axis=2)
                has_real_s = jnp.any(real_s, axis=2)
            else:
                last_sub = tgt_sub[:, :, -1]
                has_real_s = jnp.ones((nb, nsub), bool)
            lo_tap_g = jnp.searchsorted(
                src_ids,
                (first_sub[:, None, :] + deltas[None, :, None]).reshape(-1)
            ).reshape(nb, k_taps, nsub)
            rel = jnp.clip(((lo_tap_g - lo[:, None, None]) // 128) * 128,
                           0, window - tap_window).astype(jnp.int32)
            hi_tap = jnp.searchsorted(
                src_ids,
                (last_sub[:, None, :] + deltas[None, :, None]).reshape(-1),
                side="right").reshape(nb, k_taps, nsub)
            overflow = overflow + jnp.sum(
                ((hi_tap - (lo[:, None, None] + rel)) > tap_window)
                & has_real_s[:, None, :])
            tap_lo = rel.reshape(nb, k_taps * nsub)
            tap_window_eff = tap_window
            sub_eff = sub_block
        else:
            lo_tap_g = jnp.searchsorted(
                src_ids,
                (block_first[:, None] + deltas[None, :]).reshape(-1)
            ).reshape(nb, k_taps)
            rel = jnp.clip(((lo_tap_g - lo[:, None]) // 128) * 128,
                           0, window - tap_window).astype(jnp.int32)
            hi_tap = jnp.searchsorted(
                src_ids,
                (block_last[:, None] + deltas[None, :]).reshape(-1),
                side="right").reshape(nb, k_taps)
            overflow = overflow + jnp.sum(
                ((hi_tap - (lo[:, None] + rel)) > tap_window)
                & has_real[:, None])
            tap_lo = rel
            tap_window_eff = tap_window
    else:
        tap_lo = jnp.zeros((nb, k_taps), jnp.int32)
        tap_window_eff = None

    # sublane tiling needs channel counts in multiples of 8: zero-pad Cin
    # (extra zero rows contribute nothing) and Cout (sliced off after)
    cin_p = -(-cin // 8) * 8
    cout_p = -(-cout // 8) * 8
    if cin_p != cin:
        src_feats = jnp.concatenate(
            [src_feats, jnp.zeros((vs, cin_p - cin), src_feats.dtype)],
            axis=1)
        weights = jnp.concatenate(
            [weights, jnp.zeros((k, cin_p - cin, cout), weights.dtype)],
            axis=1)
    if cout_p != cout:
        weights = jnp.concatenate(
            [weights, jnp.zeros((k, cin_p, cout_p - cout), weights.dtype)],
            axis=2)

    if scale is not None:
        assert isinstance(sentinel_start, (int, np.integer)), \
            "epilogue needs a static sentinel_start"
        if cout_p != cout:
            pad_c = jnp.zeros((cout_p - cout,), jnp.float32)
            scale = jnp.concatenate([scale.astype(jnp.float32), pad_c])
            shift = jnp.concatenate([shift.astype(jnp.float32), pad_c])

    feats_t = src_feats.T.astype(compute_dtype)
    w_flat = jnp.transpose(weights, (2, 0, 1)).reshape(cout_p, k * cin_p)
    w_flat = w_flat.astype(compute_dtype)
    out = _fused_call(src_ids[None, :], feats_t, tgt_ids.reshape(nb, block),
                      lo, tap_lo, deltas, w_flat, block, window,
                      scale=scale, shift=shift, relu=relu,
                      sentinel=int(sentinel_start)
                      if scale is not None else None,
                      tap_window=tap_window_eff, sub_block=sub_eff,
                      unroll=unroll, interpret=interpret)
    return out[:, :cout].astype(src_feats.dtype), overflow
