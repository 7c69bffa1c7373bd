"""CenterHeadCLIP: agnostic heatmap + CLIP-embedding classification (text
features stubbed as orthogonal basis vectors)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from findnpropagate_tpu.config import EDict
from findnpropagate_tpu.models.dense_heads.center_head_clip import (
    CenterHeadCLIP,
    make_center_head_clip_tools,
)

CFG = EDict({
    "SHARED_CONV_CHANNEL": 16,
    "EMBED_DIM": 8,
    "USE_BIAS_BEFORE_NORM": True,
    "NUM_HM_CONV": 2,
    "SEPARATE_HEAD_CFG": {
        "HEAD_ORDER": ["center", "center_z", "dim", "rot"],
        "HEAD_DICT": {
            "center": {"out_channels": 2, "num_conv": 2},
            "center_z": {"out_channels": 1, "num_conv": 2},
            "dim": {"out_channels": 3, "num_conv": 2},
            "rot": {"out_channels": 2, "num_conv": 2},
        },
    },
    "TARGET_ASSIGNER_CONFIG": {"FEATURE_MAP_STRIDE": 2, "NUM_MAX_OBJS": 500,
                               "GAUSSIAN_OVERLAP": 0.1, "MIN_RADIUS": 2},
    "LOSS_CONFIG": {"LOSS_WEIGHTS": {"cls_weight": 1.0, "loc_weight": 2.0,
                                     "emb_weight": 1.0,
                                     "code_weights": [1.0] * 8}},
    "POST_PROCESSING": {
        "SCORE_THRESH": 0.0,
        "POST_CENTER_LIMIT_RANGE": [-10, -10, -10, 10, 10, 10],
        "MAX_OBJ_PER_SAMPLE": 20,
        "NMS_CONFIG": {"NMS_THRESH": 0.2, "NMS_PRE_MAXSIZE": 20,
                       "NMS_POST_MAXSIZE": 10},
    },
})


def make():
    head = CenterHeadCLIP(
        model_cfg=CFG, input_channels=16, num_class=2,
        class_names=("Car", "Pedestrian"),
        grid_size=(16, 16, 4), point_cloud_range=(-8, -8, -3, 8, 8, 1),
        voxel_size=(1.0, 1.0, 1.0),
    )
    text = np.eye(2, 8, dtype=np.float32)   # orthogonal class embeddings
    tools = make_center_head_clip_tools(
        CFG, 2, (16, 16, 4), (-8, -8, -3, 8, 8, 1), (1.0, 1.0, 1.0),
        class_names=("Car", "Pedestrian"), text_features=text)
    return head, tools


def test_forward_loss_and_decode():
    head, tools = make()
    rng = np.random.RandomState(0)
    batch = {"spatial_features_2d": jnp.asarray(
        rng.standard_normal((2, 8, 8, 16)), jnp.float32)}
    vars_ = head.init(jax.random.PRNGKey(0), batch, train=True)
    out, _ = head.apply(vars_, batch, train=True, mutable=["batch_stats"])
    assert out["center_clip_preds"]["hm"].shape == (2, 8, 8, 1)
    assert out["center_clip_preds"]["emb"].shape == (2, 8, 8, 8)

    gt = np.zeros((2, 3, 8), np.float32)
    gt[0, 0] = [2, 1, -0.5, 4.0, 2.0, 1.6, 0.2, 1]
    gt[1, 0] = [-3, 2, -0.6, 0.8, 0.7, 1.7, 0.0, 2]
    out["gt_boxes"] = jnp.asarray(gt)
    total, tb = tools.compute_loss(out)
    assert np.isfinite(float(total))
    assert "emb_loss" in tb

    dets = tools.get_bboxes(out)
    assert dets.boxes.shape[0] == 2
    labels = np.asarray(dets.labels)
    assert ((labels >= 0) & (labels <= 2)).all()


def test_emb_loss_decreases_under_training():
    head, tools = make()
    rng = np.random.RandomState(1)
    batch = {"spatial_features_2d": jnp.asarray(
        rng.standard_normal((2, 8, 8, 16)), jnp.float32)}
    vars_ = head.init(jax.random.PRNGKey(0), batch, train=True)
    gt = np.zeros((2, 2, 8), np.float32)
    gt[0, 0] = [2, 1, -0.5, 4.0, 2.0, 1.6, 0.2, 1]
    gt[1, 0] = [-3, 2, -0.6, 0.8, 0.7, 1.7, 0.0, 2]

    import optax

    tx = optax.adam(3e-3)
    params = vars_["params"]
    opt = tx.init(params)

    def loss_fn(p):
        out, _ = head.apply({**vars_, "params": p}, batch, train=True,
                            mutable=["batch_stats"])
        out["gt_boxes"] = jnp.asarray(gt)
        total, tb = tools.compute_loss(out)
        return total

    losses = []
    for _ in range(8):
        val, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt)
        params = optax.apply_updates(params, upd)
        losses.append(float(val))
    assert losses[-1] < losses[0], losses
