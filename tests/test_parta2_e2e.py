"""Part-A2 end-to-end: UNetV2 encoder/decoder (windowed inverse convs),
intra-part point head targets, ROI-aware part aggregation head. Loss
descends; two-stage post-processing produces detections."""

import copy

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from findnpropagate_tpu.config import EDict
from findnpropagate_tpu.datasets import build_dataloader
from findnpropagate_tpu.models import build_network
from findnpropagate_tpu.runtime.optimization import build_optimizer
from findnpropagate_tpu.runtime.trainer import create_train_state, make_train_step
from test_voxelrcnn_e2e import DATA_CFG

MODEL_CFG = EDict({
    "NAME": "PartA2Net",
    "VFE": {"NAME": "MeanVFE"},
    "BACKBONE_3D": {"NAME": "UNetV2",
                    "CHANNELS": [8, 16, 16, 16], "OUT_CHANNEL": 32,
                    "SUBM_MODE": "windowed",
                    "WINDOWED_BLOCK": 128, "WINDOWED_WINDOW": 512},
    "MAP_TO_BEV": {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 64},
    "BACKBONE_2D": {"NAME": "BaseBEVBackbone", "LAYER_NUMS": [2],
                    "LAYER_STRIDES": [1], "NUM_FILTERS": [32],
                    "UPSAMPLE_STRIDES": [1], "NUM_UPSAMPLE_FILTERS": [32]},
    "DENSE_HEAD": {
        "NAME": "AnchorHeadSingle",
        "USE_DIRECTION_CLASSIFIER": False,
        "PREDICT_BOXES_WHEN_TRAINING": True,
        "ANCHOR_GENERATOR_CONFIG": [
            {"class_name": "Car", "anchor_sizes": [[4.6, 1.95, 1.7]],
             "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.5],
             "feature_map_stride": 8, "matched_threshold": 0.55,
             "unmatched_threshold": 0.4},
            {"class_name": "Pedestrian", "anchor_sizes": [[0.8, 0.7, 1.7]],
             "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.5],
             "feature_map_stride": 8, "matched_threshold": 0.5,
             "unmatched_threshold": 0.35},
        ],
        "TARGET_ASSIGNER_CONFIG": {"NAME": "AxisAlignedTargetAssigner",
                                   "POS_FRACTION": -1.0, "SAMPLE_SIZE": 512,
                                   "NORM_BY_NUM_EXAMPLES": False,
                                   "MATCH_HEIGHT": False,
                                   "BOX_CODER": "ResidualCoder"},
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {
            "cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
            "code_weights": [1.0] * 7}},
    },
    "POINT_HEAD": {
        "NAME": "PointIntraPartOffsetHead",
        "CLS_FC": [], "PART_FC": [],
        "TARGET_CONFIG": {"GT_EXTRA_WIDTH": [0.2, 0.2, 0.2]},
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {"point_cls_weight": 1.0,
                                         "point_part_weight": 1.0}},
    },
    "ROI_HEAD": {
        "NAME": "PartA2FCHead",
        "CLASS_AGNOSTIC": True,
        "SHARED_FC": [32, 32],
        "CLS_FC": [32],
        "REG_FC": [32],
        "DP_RATIO": 0.0,
        "SEG_MASK_SCORE_THRESH": 0.0,
        "ROI_AWARE_POOL": {"POOL_SIZE": 4, "NUM_FEATURES": 32,
                           "MAX_POINTS_PER_VOXEL": 128},
        "NMS_CONFIG": {
            "TRAIN": {"NMS_PRE_MAXSIZE": 512, "NMS_POST_MAXSIZE": 64,
                      "NMS_THRESH": 0.8},
            "TEST": {"NMS_PRE_MAXSIZE": 256, "NMS_POST_MAXSIZE": 32,
                     "NMS_THRESH": 0.7},
        },
        "TARGET_CONFIG": {
            "BOX_CODER": "ResidualCoder", "ROI_PER_IMAGE": 16,
            "FG_RATIO": 0.5, "SAMPLE_ROI_BY_EACH_CLASS": True,
            "CLS_SCORE_TYPE": "roi_iou", "CLS_FG_THRESH": 0.75,
            "CLS_BG_THRESH": 0.25, "CLS_BG_THRESH_LO": 0.1,
            "HARD_BG_RATIO": 0.8, "REG_FG_THRESH": 0.55,
        },
        "LOSS_CONFIG": {
            "CLS_LOSS": "BinaryCrossEntropy",
            "REG_LOSS": "smooth-l1",
            "CORNER_LOSS_REGULARIZATION": True,
            "LOSS_WEIGHTS": {"rcnn_cls_weight": 1.0, "rcnn_reg_weight": 1.0,
                             "rcnn_corner_weight": 1.0,
                             "code_weights": [1.0] * 7},
        },
    },
    "POST_PROCESSING": {
        "RECALL_THRESH_LIST": [0.3, 0.5, 0.7],
        "SCORE_THRESH": 0.1,
        "NMS_CONFIG": {"NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.1,
                       "NMS_PRE_MAXSIZE": 256, "NMS_POST_MAXSIZE": 64},
    },
})
CLASS_NAMES = ["Car", "Pedestrian"]


@pytest.fixture(scope="module")
def setup():
    ds, loader, _ = build_dataloader(
        copy.deepcopy(DATA_CFG), CLASS_NAMES, batch_size=2, training=True
    )
    det = build_network(copy.deepcopy(MODEL_CFG), num_class=2, dataset=ds)
    batch = next(iter(loader))
    batch.pop("frame_id")
    batch.pop("batch_size")
    variables = det.init(jax.random.PRNGKey(0), batch)
    return ds, det, batch, variables


def test_part_targets():
    """Canonical part locations: box center -> 0.5^3; +x front corner ->
    part_x near 1."""
    import jax.numpy as jnp

    from findnpropagate_tpu.models.dense_heads.point_intra_part_head import (
        assign_part_targets,
    )

    gt = np.zeros((1, 1, 8), np.float32)
    gt[0, 0] = [10, 0, 0, 4, 2, 1.5, np.pi / 2, 1]  # rotated 90deg
    pts = np.array([[[10.0, 0.0, 0.0],
                     [10.0, 1.9, 0.0],     # along rotated +x axis (length)
                     [0.0, 0.0, 0.0]]], np.float32)
    labels, part = assign_part_targets(
        jnp.asarray(pts), jnp.ones((1, 3), bool), jnp.asarray(gt))
    labels = np.asarray(labels)
    part = np.asarray(part)
    assert labels[0, 0] == 1 and labels[0, 2] == 0
    np.testing.assert_allclose(part[0, 0], [0.5, 0.5, 0.5], atol=1e-5)
    assert part[0, 1, 0] > 0.9  # near the +length face


def test_forward_unet_and_decode(setup):
    ds, det, batch, variables = setup
    out = det.apply(variables, batch, train=False)
    assert out["point_features"].shape[-1] == 8   # c1 of the unet
    assert out["point_part_offset"].shape[-1] == 3
    assert int(out.get("sparse_window_overflow", 0)) == 0
    dets = det.post_process(out)
    assert dets.boxes.shape[0] == 2


def test_loss_decreases(setup):
    ds, det, batch, variables = setup
    tx, _ = build_optimizer(
        EDict({"OPTIMIZER": "adam", "LR": 0.002, "WEIGHT_DECAY": 0.0,
               "GRAD_NORM_CLIP": 10.0}), 100,
    )
    state = create_train_state(det, batch, tx, jax.random.PRNGKey(0))
    step = make_train_step(det, tx, donate=False)
    losses = []
    for _ in range(10):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()
