"""VoxelNeXt-2D end-to-end: pillar VFE -> six sparse 2D stages ->
multi-scale BEV merge -> sparse head; loss descends and decode produces
boxes (spconv_backbone_voxelnext2d.py)."""

import copy

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax

from findnpropagate_tpu.config import EDict
from findnpropagate_tpu.datasets import build_dataloader
from findnpropagate_tpu.models import build_network
from findnpropagate_tpu.runtime.optimization import build_optimizer
from findnpropagate_tpu.runtime.trainer import (
    create_train_state,
    make_train_step,
)
from tests.test_voxelnext_e2e import DATA_CFG, MODEL_CFG


def cfg_2d():
    model = copy.deepcopy(MODEL_CFG)
    model["NAME"] = "VoxelNeXt2D"
    model["VFE"] = EDict({
        "NAME": "DynPillarVFE", "WITH_DISTANCE": False,
        "USE_ABSLOTE_XYZ": True, "USE_NORM": True,
        "NUM_FILTERS": [8, 8],
    })
    model["BACKBONE_3D"] = EDict({
        "NAME": "VoxelResBackBone8xVoxelNeXt2D",
        # reference block counts are 3/4/6/3/3/3 (44 convs) — too much to
        # compile on this 1-core CPU; 1 block per stage exercises the same
        # machinery (counts themselves are covered by the param-tree check)
        "CHANNELS": [8, 8, 8, 16, 16, 16],
        "OUT_CHANNEL": 32,
        "BLOCKS_PER_STAGE": [1, 1, 1, 1, 1, 1],
        "SUBM_MODE": "windowed",
        "WINDOWED_BLOCK": 128,
        "WINDOWED_WINDOW": 512,
        "MAX_BEV_VOXELS": 512,
    })
    data = copy.deepcopy(DATA_CFG)
    return data, model


@pytest.fixture(scope="module")
def setup():
    data, model = cfg_2d()
    ds, loader, _ = build_dataloader(data, ["Car", "Pedestrian"],
                                     batch_size=2, training=True)
    det = build_network(model, num_class=2, dataset=ds)
    batch = next(iter(loader))
    batch.pop("frame_id")
    batch.pop("batch_size")
    variables = det.init(jax.random.PRNGKey(0), batch)
    return ds, det, batch, variables


def test_forward_sparse_bev_contract(setup):
    ds, det, batch, variables = setup
    out = det.apply(variables, batch, train=False)
    bev = out["encoded_sparse_bev"]
    assert bev["features"].shape[-1] == 32
    assert bev["ids"].shape == bev["valid"].shape
    # stride-8 grid: 64/8 = 8 per side at the test geometry (128 cells)
    ny, nx = out["encoded_sparse_bev_shape"]
    assert (ny, nx) == (16, 16)
    assert "multi_scale_2d_features" in out
    assert out["multi_scale_2d_strides"]["x_conv5"] == 16
    dets = det.post_process(out)
    assert np.isfinite(np.asarray(dets.boxes)).all()


def test_loss_decreases(setup):
    ds, det, batch, variables = setup
    tx, _ = build_optimizer(
        EDict({"OPTIMIZER": "adam", "LR": 0.003, "WEIGHT_DECAY": 0.0,
               "GRAD_NORM_CLIP": 35.0}), 100)
    state = create_train_state(det, batch, tx, jax.random.PRNGKey(0))
    step = make_train_step(det, tx, donate=False)
    losses = []
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_default_block_counts_match_reference():
    """Default stage depths = reference 3/4/6/3/3/3
    (spconv_backbone_voxelnext2d.py:81-129), checked via the param tree."""
    import jax.numpy as jnp

    from findnpropagate_tpu.models.backbones_3d import (
        VoxelResBackBone8xVoxelNeXt2D,
    )

    bb = VoxelResBackBone8xVoxelNeXt2D(
        model_cfg=EDict({"CHANNELS": [4, 4, 4, 4, 4, 4], "OUT_CHANNEL": 4,
                         "MAX_VOXELS": 256, "WINDOWED_BLOCK": 64,
                         "WINDOWED_WINDOW": 128, "MAX_BEV_VOXELS": 128}),
        input_channels=4, grid_size=(32, 32, 1))
    batch = {
        "pillar_features": jnp.zeros((1, 256, 4)),
        "voxel_coords": jnp.zeros((1, 256, 3), jnp.int32),
        "voxel_mask": jnp.zeros((1, 256), bool).at[:, :32].set(True),
    }
    variables = bb.init(jax.random.PRNGKey(0), batch, train=False)
    params = variables["params"]
    import re

    counts = {}
    for k in params:
        m = re.match(r"blocks(\d)_res(\d)_conv1", k)
        if m:
            counts[int(m.group(1))] = max(
                counts.get(int(m.group(1)), 0), int(m.group(2)) + 1)
    assert counts == {1: 3, 2: 4, 3: 6, 4: 3, 5: 3, 6: 3}, counts
