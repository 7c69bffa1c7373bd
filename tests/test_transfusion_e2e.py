"""TransFusion-LiDAR end-to-end: sparse backbone -> height compression ->
BEV backbone -> transformer head; Hungarian targets; loss decreases."""

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

DATA_CFG = EDict({
    "DATASET": "SyntheticDataset",
    "POINT_CLOUD_RANGE": [-12.8, -12.8, -3.0, 12.8, 12.8, 1.0],
    "SYNTHETIC": {"NUM_SCENES": 8, "NUM_OBJECTS": 8, "NUM_RAW_POINTS": 4000},
    "CAPACITIES": {"MAX_POINTS": 6000, "MAX_GT": 16, "MAX_VOXELS": 4000,
                   "MAX_POINTS_PER_VOXEL": 8},
    "POINT_FEATURE_ENCODING": {
        "encoding_type": "absolute_coordinates_encoding",
        "used_feature_list": ["x", "y", "z", "intensity"],
        "src_feature_list": ["x", "y", "z", "intensity"],
    },
    "DATA_PROCESSOR": [
        {"NAME": "mask_points_and_boxes_outside_range", "REMOVE_OUTSIDE_BOXES": True},
        {"NAME": "shuffle_points", "SHUFFLE_ENABLED": {"train": True, "test": False}},
        {"NAME": "transform_points_to_voxels", "VOXEL_SIZE": [0.2, 0.2, 0.1]},
    ],
})

MODEL_CFG = EDict({
    "NAME": "TransFusion",
    "VFE": {"NAME": "MeanVFE"},
    "BACKBONE_3D": {"NAME": "VoxelResBackBone8x", "USE_BIAS": False,
                    "MAX_VOXELS": 4096},
    "MAP_TO_BEV": {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 256},
    "BACKBONE_2D": {"NAME": "BaseBEVBackbone", "LAYER_NUMS": [2, 2],
                    "LAYER_STRIDES": [1, 2], "NUM_FILTERS": [64, 128],
                    "UPSAMPLE_STRIDES": [1, 2], "NUM_UPSAMPLE_FILTERS": [64, 64]},
    "DENSE_HEAD": {
        "NAME": "TransFusionHead",
        "USE_BIAS_BEFORE_NORM": False,
        "NUM_PROPOSALS": 40,
        "HIDDEN_CHANNEL": 64,
        "NUM_CLASSES": 2,
        "NUM_HEADS": 4,
        "NMS_KERNEL_SIZE": 3,
        "FFN_CHANNEL": 128,
        "DROPOUT": 0.1,
        "NUM_HM_CONV": 2,
        "SEPARATE_HEAD_CFG": {
            "HEAD_ORDER": ["center", "height", "dim", "rot"],
            "HEAD_DICT": {
                "center": {"out_channels": 2, "num_conv": 2},
                "height": {"out_channels": 1, "num_conv": 2},
                "dim": {"out_channels": 3, "num_conv": 2},
                "rot": {"out_channels": 2, "num_conv": 2},
            },
        },
        "TARGET_ASSIGNER_CONFIG": {
            "FEATURE_MAP_STRIDE": 8,
            "DATASET": "nuScenes",
            "GAUSSIAN_OVERLAP": 0.1,
            "MIN_RADIUS": 2,
            "HUNGARIAN_ASSIGNER": {
                "cls_cost": {"gamma": 2.0, "alpha": 0.25, "weight": 0.15},
                "reg_cost": {"weight": 0.25},
                "iou_cost": {"weight": 0.25},
            },
        },
        "LOSS_CONFIG": {
            "LOSS_WEIGHTS": {"cls_weight": 1.0, "bbox_weight": 0.25,
                             "hm_weight": 1.0, "code_weights": [1.0] * 8},
            "LOSS_CLS": {"use_sigmoid": True, "gamma": 2.0, "alpha": 0.25},
        },
        "POST_PROCESSING": {
            "SCORE_THRESH": 0.0,
            "POST_CENTER_RANGE": [-15.0, -15.0, -10.0, 15.0, 15.0, 10.0],
        },
    },
    "POST_PROCESSING": {"RECALL_THRESH_LIST": [0.3, 0.5, 0.7],
                        "SCORE_THRESH": 0.1},
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


def test_forward_and_decode(setup):
    ds, det, batch, variables = setup
    out = det.apply(variables, batch, train=False)
    res = out["transfusion_preds"]
    assert res["center"].shape == (2, 40, 2)
    assert res["dense_heatmap"].shape == (2, 16, 16, 2)
    dets = det.post_process(out)
    assert dets.boxes.shape == (2, 40, 7)
    assert np.asarray(dets.count).max() <= 40
    # decoded boxes inside post range where valid
    b = np.asarray(dets.boxes)
    cnt = np.asarray(dets.count)
    for i in range(2):
        assert np.all(np.abs(b[i, : cnt[i], :2]) <= 15.0 + 1e-3)


def test_targets_match_each_valid_gt_once(setup):
    ds, det, batch, variables = setup
    out = det.apply(variables, batch, train=False)
    targets = det.head_tools.get_targets(
        out["transfusion_preds"], batch["gt_boxes"]
    )
    labels = np.asarray(targets["labels"])
    n_gt = (batch["gt_boxes"][..., 7] > 0).sum()
    # every valid gt matched exactly once -> num matched == num valid gts
    assert int((labels < 2).sum()) == int(n_gt)
    hm = np.asarray(targets["heatmap"])
    assert hm.shape == (2, 2, 16, 16)
    assert hm.max() == 1.0  # gt centers hit exactly 1


def test_loss_decreases(setup):
    ds, det, batch, variables = setup
    tx, _ = build_optimizer(
        EDict({"OPTIMIZER": "adam", "LR": 0.001, "WEIGHT_DECAY": 0.0,
               "GRAD_NORM_CLIP": 35.0}), 100,
    )
    state = create_train_state(det, batch, tx, jax.random.PRNGKey(0))
    step = make_train_step(det, tx, donate=False)
    losses = []
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses
    assert np.isfinite(losses).all()

