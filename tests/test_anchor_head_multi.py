"""AnchorHeadMulti: per-group heads scatter into the global anchor/class
layout; the shared anchor tools drive loss + decode unchanged."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from findnpropagate_tpu.config import EDict
from findnpropagate_tpu.models.dense_heads.anchor_head_multi import (
    NEG_FILL,
    AnchorHeadMulti,
)

CFG = EDict({
    "USE_DIRECTION_CLASSIFIER": True,
    "NUM_DIR_BINS": 2,
    "SHARED_CONV_NUM_FILTER": 16,
    "NUM_MIDDLE_CONV": 1,
    "RPN_HEAD_CFGS": [
        {"HEAD_CLS_NAME": ["Car"]},
        {"HEAD_CLS_NAME": ["Pedestrian", "Cyclist"]},
    ],
    "ANCHOR_GENERATOR_CONFIG": [
        {"class_name": "Car", "anchor_sizes": [[4.6, 1.95, 1.7]],
         "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.5],
         "feature_map_stride": 2, "matched_threshold": 0.55,
         "unmatched_threshold": 0.4},
        {"class_name": "Pedestrian", "anchor_sizes": [[0.8, 0.7, 1.7]],
         "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.5],
         "feature_map_stride": 2, "matched_threshold": 0.5,
         "unmatched_threshold": 0.35},
        {"class_name": "Cyclist", "anchor_sizes": [[1.8, 0.7, 1.7]],
         "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.5],
         "feature_map_stride": 2, "matched_threshold": 0.5,
         "unmatched_threshold": 0.35},
    ],
    "LOSS_CONFIG": {"LOSS_WEIGHTS": {"cls_weight": 1.0, "loc_weight": 2.0,
                                     "dir_weight": 0.2,
                                     "code_weights": [1.0] * 7}},
})


def make_head():
    return AnchorHeadMulti(
        model_cfg=CFG, input_channels=16, num_class=3,
        class_names=("Car", "Pedestrian", "Cyclist"),
        grid_size=(16, 16, 4), point_cloud_range=(-8, -8, -3, 8, 8, 1),
    )


def test_forward_layout_and_offhead_fill():
    head = make_head()
    batch = {"spatial_features_2d": jnp.zeros((2, 8, 8, 16))}
    vars_ = head.init(jax.random.PRNGKey(0), batch, train=False)
    out = head.apply(vars_, batch, train=False,
                     mutable=["batch_stats"])[0]
    cls = np.asarray(out["cls_preds"])        # (B, N, 3)
    n_loc = 8 * 8
    a = 6  # 3 classes x 2 rotations
    assert cls.shape == (2, n_loc * a, 3)
    cls = cls.reshape(2, n_loc, a, 3)
    # slots 0-1 = Car anchors: Ped/Cyc columns pinned to the fill value
    assert np.allclose(cls[:, :, 0:2, 1:], NEG_FILL)
    assert not np.allclose(cls[:, :, 0:2, 0], NEG_FILL)
    # slots 2-3 = Pedestrian anchors (head 2): Car column pinned
    assert np.allclose(cls[:, :, 2:4, 0], NEG_FILL)
    assert out["batch_box_preds"].shape == (2, n_loc * a, 7)


def test_loss_via_shared_tools_and_grads():
    from findnpropagate_tpu.models.dense_heads.anchor_head import (
        make_anchor_head_tools,
    )

    head = make_head()
    rng = np.random.RandomState(0)
    batch = {"spatial_features_2d": jnp.asarray(
        rng.standard_normal((2, 8, 8, 16)), jnp.float32)}
    vars_ = head.init(jax.random.PRNGKey(0), batch, train=True)
    tools = make_anchor_head_tools(CFG, 3, (16, 16, 4), (-8, -8, -3, 8, 8, 1))
    gt = np.zeros((2, 3, 8), np.float32)
    gt[0, 0] = [2, 1, -0.5, 4.6, 1.95, 1.7, 0.2, 1]
    gt[1, 0] = [-3, 2, -0.6, 0.8, 0.7, 1.7, 0.0, 2]

    def loss_fn(params):
        out, _ = head.apply({**vars_, "params": params}, batch, train=True,
                            mutable=["batch_stats"])
        out["gt_boxes"] = jnp.asarray(gt)
        total, tb = tools.compute_loss(out)
        return total

    val, grads = jax.value_and_grad(loss_fn)(vars_["params"])
    assert np.isfinite(float(val))
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # both heads receive gradient
    gsum = {k: float(jnp.sum(jnp.abs(jax.tree.leaves(v)[0])))
            for k, v in vars_["params"].items() if k.startswith("h")}
    got = jax.tree.map(lambda g: float(jnp.sum(jnp.abs(g))), grads)
    assert any(v > 0 for v in jax.tree.leaves(got))
