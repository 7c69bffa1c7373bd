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


def test_pallas_fused_epilogue_matches_xla_windowed():
    """SUBM_IMPL=pallas (interpret) with FUSE_BN_EPILOGUE folds bias+BN+relu
    +padding-mask into the kernel; outputs must match the XLA windowed path
    with separate BN. Randomized BN stats/params so the affine matters."""
    rng = np.random.RandomState(4)
    batch = make_batch(rng, n=300, v_cap=1024)
    base_cfg = {"MAX_VOXELS": 4096,
                "LEVEL_CAPACITIES": [1024, 1024, 1024, 1024, 1024],
                "DENSE_FROM_LEVEL": 2, "SUBM_MODE": "windowed",
                "WINDOWED_BLOCK": 512, "WINDOWED_WINDOW": 1536,
                "WINDOWED_PRECISION": "highest"}
    bb_x = VoxelResBackBone8x(model_cfg=dict(base_cfg), input_channels=5,
                              grid_size=GRID)
    variables = bb_x.init(jax.random.PRNGKey(0), dict(batch), train=False)

    # randomize BN affine + running stats
    def perturb(path, leaf):
        name = "/".join(str(p) for p in path)
        if "mean" in name or "bias" in name:
            return leaf + rng.standard_normal(leaf.shape).astype(np.float32) * 0.2
        if "var" in name or "scale" in name:
            return leaf * np.float32(rng.uniform(0.5, 1.5))
        return leaf
    variables = jax.tree_util.tree_map_with_path(perturb, variables)

    ref = bb_x.apply(variables, dict(batch), train=False)
    bb_p = VoxelResBackBone8x(
        model_cfg={**base_cfg, "SUBM_IMPL": "pallas",
                   "PALLAS_INTERPRET": True, "FUSE_BN_EPILOGUE": True},
        input_channels=5, grid_size=GRID)
    got = bb_p.apply(variables, dict(batch), train=False)
    assert int(got.get("sparse_window_overflow", 0)) == 0
    np.testing.assert_allclose(
        np.asarray(got["encoded_spconv_tensor"]),
        np.asarray(ref["encoded_spconv_tensor"]), rtol=1e-3, atol=1e-3)


def test_dense_dtype_bf16_close_to_f32():
    """DENSE_DTYPE=bf16 (eval-only hybrid storage) stays within bf16
    tolerance of the f32 dense path and halves the dominant tensors."""
    rng = np.random.RandomState(7)
    batch = make_batch(rng)
    base = {"MAX_VOXELS": 4096,
            "LEVEL_CAPACITIES": [4096, 4096, 4096, 2048, 1024],
            "DENSE_FROM_LEVEL": 1}
    bb_f = VoxelResBackBone8x(model_cfg=dict(base), input_channels=5,
                              grid_size=GRID)
    variables = bb_f.init(jax.random.PRNGKey(0), dict(batch), train=False)
    ref = bb_f.apply(variables, dict(batch), train=False)
    bb_h = VoxelResBackBone8x(model_cfg={**base, "DENSE_DTYPE": "bf16"},
                              input_channels=5, grid_size=GRID)
    got = bb_h.apply(variables, dict(batch), train=False)
    r = np.asarray(ref["encoded_spconv_tensor"])
    g = np.asarray(got["encoded_spconv_tensor"])
    assert g.dtype == np.float32  # cast back at the boundary
    denom = np.abs(r).max() + 1e-6
    assert np.abs(g - r).max() / denom < 0.06, np.abs(g - r).max() / denom


def test_dense_chunked_tail_matches_flat():
    """DENSE_CHUNK=2 (eval lax.map over batch chunks of the dense tail)
    must be numerically identical to the flat batch."""
    rng = np.random.RandomState(9)
    batch = make_batch(rng, b=4)
    base = {"MAX_VOXELS": 4096,
            "LEVEL_CAPACITIES": [4096, 4096, 4096, 2048, 1024],
            "DENSE_FROM_LEVEL": 2, "SUBM_MODE": "windowed",
            "WINDOWED_BLOCK": 64, "WINDOWED_WINDOW": 192}
    bb_f = VoxelResBackBone8x(model_cfg=dict(base), input_channels=5,
                              grid_size=GRID)
    variables = bb_f.init(jax.random.PRNGKey(0), dict(batch), train=False)
    ref = bb_f.apply(variables, dict(batch), train=False)
    bb_c = VoxelResBackBone8x(model_cfg={**base, "DENSE_CHUNK": 2},
                              input_channels=5, grid_size=GRID)
    got = bb_c.apply(variables, dict(batch), train=False)
    np.testing.assert_allclose(
        np.asarray(got["encoded_spconv_tensor"]),
        np.asarray(ref["encoded_spconv_tensor"]), rtol=1e-5, atol=1e-5)
    # multi-scale levels keep their contract (dense at L3/L4)
    assert got["multi_scale_3d_features"]["x_conv3"][0] == "dense"

def test_per_level_window_lists_and_scatter_downsample():
    """Window knobs accept PER-LEVEL lists and DOWNSAMPLE_IMPL=scatter;
    output must match the scalar-knob sort-downsample reference exactly
    (the windows below are ample for this scene, so all variants see the
    full neighbor unions)."""
    rng = np.random.RandomState(12)
    batch = make_batch(rng)
    base = {"MAX_VOXELS": 4096,
            "LEVEL_CAPACITIES": [4096, 4096, 4096, 2048, 1024],
            "DENSE_FROM_LEVEL": 2, "SUBM_MODE": "windowed",
            "WINDOWED_BLOCK": 64, "WINDOWED_WINDOW": 256}
    bb_ref = VoxelResBackBone8x(model_cfg=dict(base), input_channels=5,
                                grid_size=GRID)
    variables = bb_ref.init(jax.random.PRNGKey(0), dict(batch), train=False)
    ref = bb_ref.apply(variables, dict(batch), train=False)
    bb_l = VoxelResBackBone8x(
        model_cfg={**base,
                   "WINDOWED_WINDOW": [256, 320, 320],
                   "WINDOWED_STRIDED_WINDOW": [1024, 1280, 1280],
                   "TAP_WINDOW": [128, 192, 192],
                   "STRIDED_TAP_WINDOW": [256, 512, 512],
                   "DOWNSAMPLE_IMPL": "scatter"},
        input_channels=5, grid_size=GRID)
    got = bb_l.apply(variables, dict(batch), train=False)
    assert int(got["sparse_window_overflow"]) == 0
    np.testing.assert_allclose(
        np.asarray(got["encoded_spconv_tensor"]),
        np.asarray(ref["encoded_spconv_tensor"]), rtol=1e-4, atol=1e-4)


def test_posgather_matches_gather():
    """SUBM_IMPL=posgather (interpret): per-level rank prelude + banded
    dynamic-permute gathers must reproduce the gather-GEMM reference
    through the full backbone (subm + strided + (3,1,1) out conv)."""
    rng = np.random.RandomState(4)
    batch = make_batch(rng)
    outs = {}
    var0 = None
    for mode in ("ref", "posgather"):
        cfg = {"MAX_VOXELS": 4096,
               "LEVEL_CAPACITIES": [4096, 4096, 4096, 2048, 1024],
               "DENSE_FROM_LEVEL": 2, "SUBM_MODE": "windowed",
               "WINDOWED_BLOCK": 512, "WINDOWED_WINDOW": 512,
               "POSGATHER_BAND": 3, "STRIDED_BAND": 4}
        if mode == "posgather":
            cfg.update({"SUBM_IMPL": "posgather", "PALLAS_INTERPRET": True,
                        "FUSE_BN_EPILOGUE": True})
        bb = VoxelResBackBone8x(model_cfg=cfg, input_channels=5,
                                grid_size=GRID)
        if var0 is None:
            var0 = bb.init(jax.random.PRNGKey(0), dict(batch), train=False)
        out = bb.apply(var0, dict(batch), train=False)
        outs[mode] = np.asarray(out["encoded_spconv_tensor"])
        assert int(out["sparse_window_overflow"]) == 0, mode
    np.testing.assert_allclose(outs["ref"], outs["posgather"], atol=5e-3)
