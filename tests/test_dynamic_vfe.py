"""Dynamic VFEs: DynamicMeanVFE must equal MeanVFE whenever the static
per-voxel cap T holds all points (both then average the same point sets);
DynamicPillarVFE must produce finite, pillar-masked features."""

import jax
import jax.numpy as jnp
import numpy as np

from findnpropagate_tpu.models.vfe import (
    DynamicMeanVFE,
    DynamicPillarVFE,
    MeanVFE,
)
from findnpropagate_tpu.ops.voxelize import voxelize

PC_RANGE = (-8.0, -8.0, -3.0, 8.0, 8.0, 1.0)
VOXEL = (0.5, 0.5, 4.0)
GRID = (32, 32, 1)


def make_batch(rng, p=2000, v_cap=512, t_cap=64):
    pts = rng.uniform(-7.9, 7.9, (p, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2.9, 0.9, p)
    mask = np.ones(p, bool)
    mask[-100:] = False
    out = voxelize(jnp.asarray(pts), jnp.asarray(mask), PC_RANGE, VOXEL,
                   GRID, v_cap, t_cap)
    return {
        "points": jnp.asarray(pts)[None],
        "points_mask": jnp.asarray(mask)[None],
        "voxels": out.voxels[None],
        "voxel_num_points": out.num_points[None],
        "voxel_coords": out.coords[None],
        "voxel_mask": out.voxel_mask[None],
    }


def test_dynamic_mean_matches_mean_vfe():
    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    m = MeanVFE(model_cfg={}, num_point_features=4)
    d = DynamicMeanVFE(model_cfg={}, num_point_features=4,
                       voxel_size=VOXEL, point_cloud_range=PC_RANGE,
                       grid_size=GRID)
    out_m = m.apply({}, dict(batch), train=False)["voxel_features"]
    out_d = d.apply({}, dict(batch), train=False)["voxel_features"]
    vmask = np.asarray(batch["voxel_mask"][0])
    np.testing.assert_allclose(np.asarray(out_d[0])[vmask],
                               np.asarray(out_m[0])[vmask], atol=1e-4)


def test_dynamic_pillar_vfe_shapes():
    rng = np.random.RandomState(1)
    batch = make_batch(rng)
    mod = DynamicPillarVFE(
        model_cfg={"NUM_FILTERS": [32], "USE_ABSLOTE_XYZ": True,
                   "WITH_DISTANCE": False},
        num_point_features=4, voxel_size=VOXEL,
        point_cloud_range=PC_RANGE, grid_size=GRID)
    var = mod.init(jax.random.PRNGKey(0), dict(batch), train=False)
    out = mod.apply(var, dict(batch), train=False)["pillar_features"]
    assert out.shape == (1, 512, 32)
    assert np.isfinite(np.asarray(out)).all()
    vmask = np.asarray(batch["voxel_mask"][0])
    if (~vmask).any():
        assert np.abs(np.asarray(out[0])[~vmask]).max() == 0.0
