"""Focals Conv: active-set dilation oracle parity and the
VoxelBackBone8xFocal end-to-end (forward shapes, dilation grows the active
set, importance loss trains). Reference: spconv_backbone_focal.py +
focal_sparse_conv/."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from findnpropagate_tpu.ops.sparse_ops import (
    _kernel_offsets,
    focal_dilate,
    yxz_linear_ids,
    yxz_sentinel_start,
)

SHAPE = (9, 24, 24)  # nz, ny, nx


def make_level(rng, n_active=60, v_cap=128, c=4):
    nz, ny, nx = SHAPE
    lin = rng.choice(nz * ny * nx, n_active, replace=False)
    z, r = lin // (ny * nx), lin % (ny * nx)
    y, x = r // nx, r % nx
    coords = np.full((v_cap, 3), -1, np.int32)
    coords[:n_active] = np.stack([z, y, x], 1)
    valid = np.zeros(v_cap, bool)
    valid[:n_active] = True
    ids = np.asarray(yxz_linear_ids(jnp.asarray(coords), jnp.asarray(valid),
                                    SHAPE))
    order = np.argsort(ids)
    ids, coords, valid = ids[order], coords[order], valid[order]
    feats = (rng.randn(v_cap, c).astype(np.float32)) * valid[:, None]
    return ids.astype(np.int32), coords, valid, feats


def test_focal_dilate_matches_loop_oracle():
    rng = np.random.RandomState(0)
    ids, coords, valid, feats = make_level(rng)
    offs = np.asarray(_kernel_offsets((3, 3, 3)))
    offs = offs[~np.all(offs == 0, axis=1)]
    cand_mask = rng.rand(ids.shape[0], 26) < 0.1
    max_out = 384

    nids, ncoords, nvalid, nfeats = focal_dilate(
        jnp.asarray(ids), jnp.asarray(feats), jnp.asarray(cand_mask),
        SHAPE, max_out)
    nids, ncoords = np.asarray(nids), np.asarray(ncoords)
    nvalid, nfeats = np.asarray(nvalid), np.asarray(nfeats)

    # loop oracle: expected active coord set + feature ownership
    nz, ny, nx = SHAPE
    exp = {}
    for i in range(ids.shape[0]):
        if valid[i]:
            exp[tuple(coords[i])] = feats[i]
    for i in range(ids.shape[0]):
        if not valid[i]:
            continue
        for k in range(26):
            if not cand_mask[i, k]:
                continue
            cc = tuple(coords[i] + offs[k])
            if not (0 <= cc[0] < nz and 0 <= cc[1] < ny and 0 <= cc[2] < nx):
                continue
            if cc not in exp:
                exp[cc] = np.zeros(feats.shape[1], np.float32)
    assert len(exp) <= max_out  # oracle fits the cap in this sizing
    assert int(nvalid.sum()) == len(exp)
    got = {tuple(ncoords[i]): nfeats[i] for i in range(max_out) if nvalid[i]}
    assert set(got.keys()) == set(exp.keys())
    for k in exp:
        np.testing.assert_allclose(got[k], exp[k], atol=1e-6)
    # sorted ascending ids on the valid prefix region
    vv = nids[nvalid]
    assert np.all(np.diff(vv) > 0)


def _focal_cfg(dense_from=1):
    return {
        "CHANNELS": [8, 8, 16, 16, 16], "OUT_CHANNELS": 32,
        "MAX_VOXELS": 512,
        "LEVEL_CAPACITIES": [512, 512, 512, 256, 256],
        "DENSE_FROM_LEVEL": dense_from, "SUBM_MODE": "windowed",
        "WINDOWED_BLOCK": 256, "WINDOWED_WINDOW": 512,
        "THRESHOLD": 0.5, "TOPK": True, "MASK_MULTI": True,
        "FOCAL_DILATE_FACTOR": 1.5,
    }


def make_batch(rng, b=2, n=120, v_cap=512):
    nz, ny, nx = 40, 32, 32
    coords = np.full((b, v_cap, 3), -1, np.int32)
    valid = np.zeros((b, v_cap), bool)
    for i in range(b):
        lin = rng.choice(nx * ny * nz, n, replace=False)
        z, r = lin // (ny * nx), lin % (ny * nx)
        y, x = r // nx, r % nx
        cc = np.unique(np.stack([z, y, x], -1), axis=0)
        coords[i, : len(cc)] = cc
        valid[i, : len(cc)] = True
    feats = rng.randn(b, v_cap, 4).astype(np.float32) * valid[..., None]
    gt = np.zeros((b, 3, 8), np.float32)
    gt[:, 0] = [0.0, 0.0, -1.0, 4.0, 2.0, 1.5, 0.3, 1]
    gt[:, 1] = [3.0, -2.0, -1.2, 2.0, 2.0, 1.5, -0.5, 2]
    return {
        "voxel_features": jnp.asarray(feats),
        "voxel_coords": jnp.asarray(coords),
        "voxel_mask": jnp.asarray(valid),
        "gt_boxes": jnp.asarray(gt),
    }


@pytest.mark.parametrize("dense_from", [1, 2])
def test_focal_backbone_forward_and_loss(dense_from):
    from findnpropagate_tpu.models.backbones_3d import VoxelBackBone8xFocal

    rng = np.random.RandomState(1)
    batch = make_batch(rng)
    bb = VoxelBackBone8xFocal(
        model_cfg=_focal_cfg(dense_from), input_channels=4,
        grid_size=(32, 32, 40),
        voxel_size=(0.4, 0.4, 0.1),
        point_cloud_range=(-6.4, -6.4, -3.0, 6.4, 6.4, 1.0),
    )
    variables = bb.init(jax.random.PRNGKey(0), dict(batch), train=True)
    out, _ = bb.apply(variables, dict(batch), train=True,
                      mutable=["batch_stats"])
    assert out["encoded_spconv_tensor"].ndim == 5
    assert int(out.get("sparse_window_overflow", 0)) == 0
    # importance loss present, finite, and differentiable
    assert "loss_box_of_pts" in out
    lbp = float(out["loss_box_of_pts"])
    assert np.isfinite(lbp) and lbp > 0

    def loss_fn(params):
        o, _ = bb.apply({**variables, "params": params}, dict(batch),
                        train=True, mutable=["batch_stats"])
        return o["loss_box_of_pts"] + 0.0 * jnp.sum(
            jnp.abs(o["encoded_spconv_tensor"]))

    grads = jax.grad(loss_fn)(variables["params"])
    gsum = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gsum) and gsum > 0

    # eval path: dilation grows the stage-1 active set
    out_e = bb.apply(variables, dict(batch), train=False)
    lvl1 = out_e["multi_scale_3d_features"]["x_conv1"]
    if lvl1[0] == "win":
        n_before = int(np.asarray(batch["voxel_mask"]).sum())
        n_after = int(np.asarray(lvl1[1][2]).sum())
        assert n_after >= n_before
