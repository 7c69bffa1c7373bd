"""bev_pool — LSS frustum-to-BEV splat (sum over coinciding cells).

Replaces the reference's bev_pool_ext CUDA extension
(pcdet/ops/bev_pool/src/bev_pool_cuda.cu:1-98 + bev_pool.py interval-hash
autograd wrapper, /root/reference): the interval trick exists to make the
CUDA scatter deterministic; on TPU a masked scatter-add into the dense BEV
grid is a single XLA `scatter-add` — deterministic, differentiable, and
fused by the compiler.
"""

from __future__ import annotations

import jax.numpy as jnp


def bev_pool(feats, coords, valid, nx: int, ny: int, nz: int):
    """feats (N, C); coords (N, 3) int32 (x, y, z) cell indices; valid (N,)
    — one sample. Returns (ny, nx, nz * C) BEV features (z-collapse by
    channel concat, depth_lss.py:150-153 semantics).

    Batch via vmap.
    """
    n, c = feats.shape
    inside = (
        valid
        & (coords[:, 0] >= 0) & (coords[:, 0] < nx)
        & (coords[:, 1] >= 0) & (coords[:, 1] < ny)
        & (coords[:, 2] >= 0) & (coords[:, 2] < nz)
    )
    flat = (coords[:, 1] * nx + coords[:, 0]) * nz + coords[:, 2]
    flat = jnp.where(inside, flat, nx * ny * nz)
    grid = jnp.zeros((nx * ny * nz + 1, c), feats.dtype)
    grid = grid.at[flat].add(jnp.where(inside[:, None], feats, 0.0))
    return grid[:-1].reshape(ny, nx, nz * c)
