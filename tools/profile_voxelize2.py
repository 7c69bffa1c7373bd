"""Voxelizer decomposition at batch 1 + candidate means-gather variants.

Chained per PERF.md truth protocol. Pieces are measured as cumulative
prefixes of the voxelize_mean program so each line is (prefix cost); the
deltas between lines attribute cost to the added piece.
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def chain(fn, iters=8):
    s = fn(jnp.float32(0.0))
    jax.block_until_ready(s)
    t0 = time.perf_counter(); s = fn(jnp.float32(1.0)); jax.block_until_ready(s)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        s = fn(s + jnp.float32(i) * 0.01)
    jax.block_until_ready(s)
    return (time.perf_counter() - t0 - t1) / (iters - 1) * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--p", type=int, default=300000)
    args = ap.parse_args()
    b, p = args.batch, args.p
    rng = np.random.RandomState(0)
    pts = rng.uniform(-54, 54, (b, p, 5)).astype(np.float32)
    pts[..., 2] = rng.uniform(-5, 3, (b, p))
    pts = jnp.asarray(pts)
    mask = jnp.ones((b, p), bool)
    pcr = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    vs = (0.075, 0.075, 0.2)
    nx, ny, nz = 1440, 1440, 41
    V, T = 120000, 10

    from findnpropagate_tpu.ops.voxelize import compute_voxel_coords

    def segments(q, m):
        xyz, ok = compute_voxel_coords(q, jnp.asarray(pcr), jnp.asarray(vs))
        valid = m & ok
        lin = (xyz[:, 2] * ny + xyz[:, 1]) * nx + xyz[:, 0]
        sentinel = nx * ny * nz
        lin = jnp.where(valid, lin, sentinel)
        order = jnp.argsort(lin, stable=True)
        lin_sorted = lin[order]
        is_valid_sorted = lin_sorted < sentinel
        newseg = jnp.concatenate(
            [is_valid_sorted[:1],
             (lin_sorted[1:] != lin_sorted[:-1]) & is_valid_sorted[1:]])
        slot = jnp.cumsum(newseg.astype(jnp.int32)) - 1
        slot = jnp.where(is_valid_sorted, slot, V)
        nvox = jnp.minimum(
            jnp.max(jnp.where(is_valid_sorted, slot + 1, 0), initial=0), V
        ).astype(jnp.int32)
        total_valid = jnp.sum(is_valid_sorted.astype(jnp.int32))
        pos = jnp.arange(p, dtype=jnp.int32)
        seg_slot = jnp.where(newseg & is_valid_sorted,
                             jnp.minimum(slot, V), V + 1)
        starts_ext = jnp.full((V + 2,), p, jnp.int32).at[seg_slot].min(pos)
        starts_ext = jnp.minimum(starts_ext[:V + 1], total_valid)
        starts = starts_ext[:V]
        start_valid = jnp.arange(V) < nvox
        counts_full = jnp.where(start_valid, starts_ext[1:] - starts, 0)
        nump = jnp.minimum(counts_full, T).astype(jnp.int32)
        return dict(order=order, lin_sorted=lin_sorted, starts=starts,
                    nump=nump, slot=slot, valid_sorted=is_valid_sorted,
                    nvox=nvox)

    def perturb(s):
        return pts * (1.0 + (s % 1.0) * 1e-3)

    # ---- cumulative prefixes ----
    @jax.jit
    def pfx_sort(s):
        x = perturb(s)
        def one(q, m):
            seg = segments(q, m)
            return (jnp.sum(seg["order"]) % 97 + jnp.sum(seg["starts"]) % 89
                    + jnp.sum(seg["nump"]))
        return jnp.sum(jax.vmap(one)(x, mask)).astype(jnp.float32) % 1000.0

    @jax.jit
    def pfx_permute(s):
        x = perturb(s)
        def one(q, m):
            seg = segments(q, m)
            ps = q[seg["order"]]
            return jnp.sum(jnp.abs(ps)) + jnp.sum(seg["starts"] % 89
                                                  ).astype(q.dtype)
        return jnp.sum(jax.vmap(one)(x, mask)).astype(jnp.float32) % 1000.0

    @jax.jit
    def pfx_means_unroll(s):
        x = perturb(s)
        def one(q, m):
            seg = segments(q, m)
            ps = q[seg["order"]]
            pp = jnp.concatenate([ps, jnp.zeros((1, 5), ps.dtype)], 0)
            acc = jnp.zeros((V, 5), ps.dtype)
            for t in range(T):
                idx = jnp.where(t < seg["nump"], seg["starts"] + t, p)
                acc = acc + pp[idx]
            means = acc / jnp.clip(seg["nump"].astype(acc.dtype), 1.0)[:, None]
            return jnp.sum(jnp.abs(means))
        return jnp.sum(jax.vmap(one)(x, mask)).astype(jnp.float32) % 1000.0

    @jax.jit
    def pfx_means_flat(s):
        """Flat (T*C) span slice per voxel: one descriptor per voxel."""
        x = perturb(s)
        def one(q, m):
            c = q.shape[1]
            seg = segments(q, m)
            ps = q[seg["order"]]
            flat = jnp.concatenate(
                [ps.reshape(-1), jnp.zeros((T * c,), ps.dtype)], 0)
            span = jax.vmap(lambda s0: jax.lax.dynamic_slice(
                flat, (s0 * c,), (T * c,)))(seg["starts"])  # (V, T*c)
            tmask = (jnp.arange(T * c) // c)[None, :] < seg["nump"][:, None]
            span = jnp.where(tmask, span, 0.0)
            summat = jnp.zeros((T * c, c), q.dtype)
            summat = summat.at[jnp.arange(T * c), jnp.arange(T * c) % c].set(1.)
            acc = span @ summat
            means = acc / jnp.clip(seg["nump"].astype(acc.dtype), 1.0)[:, None]
            return jnp.sum(jnp.abs(means))
        return jnp.sum(jax.vmap(one)(x, mask)).astype(jnp.float32) % 1000.0

    @jax.jit
    def pfx_means_segsum(s):
        """Row scatter-add segment sum with rank<T mask (no T gathers)."""
        x = perturb(s)
        def one(q, m):
            seg = segments(q, m)
            ps = q[seg["order"]]
            rank = jnp.arange(p) - seg["starts"][
                jnp.minimum(seg["slot"], V - 1)]
            ok = seg["valid_sorted"] & (seg["slot"] < V) & (rank < T)
            tgt = jnp.where(ok, seg["slot"], V)
            acc = jnp.zeros((V + 1, 5), ps.dtype).at[tgt].add(
                jnp.where(ok[:, None], ps, 0.0))[:V]
            means = acc / jnp.clip(seg["nump"].astype(acc.dtype), 1.0)[:, None]
            return jnp.sum(jnp.abs(means))
        return jnp.sum(jax.vmap(one)(x, mask)).astype(jnp.float32) % 1000.0

    @jax.jit
    def raw_argsort(s):
        x = perturb(s)
        def one(q, m):
            xyz, ok = compute_voxel_coords(q, jnp.asarray(pcr),
                                           jnp.asarray(vs))
            lin = (xyz[:, 2] * ny + xyz[:, 1]) * nx + xyz[:, 0]
            lin = jnp.where(m & ok, lin, nx * ny * nz)
            order = jnp.argsort(lin, stable=True)
            return jnp.sum(order) % 97
        return jnp.sum(jax.vmap(one)(x, mask)).astype(jnp.float32) % 1000.0

    # correctness cross-check of the flat variant vs unroll
    v1 = pfx_means_unroll(jnp.float32(0.25))
    v2 = pfx_means_flat(jnp.float32(0.25))
    v3 = pfx_means_segsum(jnp.float32(0.25))
    print(f"cross-check unroll={float(v1):.4f} flat={float(v2):.4f} "
          f"segsum={float(v3):.4f}", flush=True)

    for name, fn in [("raw argsort", raw_argsort),
                     ("sort+starts", pfx_sort),
                     ("+permute", pfx_permute),
                     ("+means T-unroll (current)", pfx_means_unroll),
                     ("+means flat-span", pfx_means_flat),
                     ("+means segsum", pfx_means_segsum)]:
        try:
            print(f"{name:28s}: {chain(fn):8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:28s}: FAIL {repr(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
