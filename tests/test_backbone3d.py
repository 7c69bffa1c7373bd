"""VoxelResBackBone8x: sparse vs dense-masked execution parity, and shape
contract. Small grid, ample capacities so no truncation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from findnpropagate_tpu.models.backbones_3d import VoxelResBackBone8x

GRID = (32, 32, 40)  # nx, ny, nz -> sparse z 41


def make_batch(rng, b=2, n=150, v_cap=256, c=5):
    nx, ny, nz = GRID
    coords = np.full((b, v_cap, 3), -1, np.int32)
    valid = np.zeros((b, v_cap), bool)
    for i in range(b):
        lin = rng.choice(nx * ny * (nz), n, replace=False)
        z, rem = lin // (ny * nx), lin % (ny * nx)
        y, x = rem // nx, rem % nx
        cc = np.unique(np.stack([z, y, x], -1), axis=0)
        coords[i, : len(cc)] = cc
        valid[i, : len(cc)] = True
    feats = rng.randn(b, v_cap, c).astype(np.float32) * valid[..., None]
    return {
        "voxel_features": jnp.asarray(feats),
        "voxel_coords": jnp.asarray(coords),
        "voxel_mask": jnp.asarray(valid),
    }


@pytest.mark.parametrize("dense_from", [2, 1])
def test_hybrid_matches_sparse(dense_from):
    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    outs = {}
    var0 = None
    for df in (5, dense_from):
        bb = VoxelResBackBone8x(
            model_cfg={"MAX_VOXELS": 4096,
                       "LEVEL_CAPACITIES": [4096, 4096, 4096, 2048, 1024],
                       "DENSE_FROM_LEVEL": df},
            input_channels=5, grid_size=GRID,
        )
        if var0 is None:
            var0 = bb.init(jax.random.PRNGKey(0), dict(batch), train=False)
        out = bb.apply(var0, dict(batch), train=False)
        outs[df] = np.asarray(out["encoded_spconv_tensor"])
    np.testing.assert_allclose(outs[5], outs[dense_from], atol=2e-3)


def test_windowed_subm_matches_gather():
    rng = np.random.RandomState(2)
    batch = make_batch(rng)
    outs = {}
    var0 = None
    for mode in ("gather", "windowed"):
        bb = VoxelResBackBone8x(
            model_cfg={"MAX_VOXELS": 4096,
                       "LEVEL_CAPACITIES": [4096, 4096, 4096, 2048, 1024],
                       "DENSE_FROM_LEVEL": 2, "SUBM_MODE": mode,
                       "WINDOWED_BLOCK": 64, "WINDOWED_WINDOW": 192},
            input_channels=5, grid_size=GRID,
        )
        if var0 is None:
            var0 = bb.init(jax.random.PRNGKey(0), dict(batch), train=False)
        out = bb.apply(var0, dict(batch), train=False)
        outs[mode] = np.asarray(out["encoded_spconv_tensor"])
        if mode == "windowed":
            assert int(out["sparse_window_overflow"]) == 0
    np.testing.assert_allclose(outs["gather"], outs["windowed"], atol=5e-3)


def test_output_shape_and_stride():
    rng = np.random.RandomState(1)
    batch = make_batch(rng)
    bb = VoxelResBackBone8x(
        model_cfg={"MAX_VOXELS": 2048, "DENSE_FROM_LEVEL": 2},
        input_channels=5, grid_size=GRID,
    )
    var = bb.init(jax.random.PRNGKey(0), dict(batch), train=False)
    out = bb.apply(var, dict(batch), train=False)
    # z: 41 -> 21 -> 11 -> 5 -> 2; y/x: 32 -> 16 -> 8 -> 4
    assert out["encoded_spconv_tensor"].shape == (2, 2, 4, 4, 128)
    assert out["encoded_spconv_tensor_stride"] == 8
