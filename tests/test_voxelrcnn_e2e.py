"""VoxelRCNN end-to-end: anchor proposals + ROI grid pooling from the
multi-scale sparse voxel levels + cls/reg towers. Loss descends; two-stage
post-processing produces detections."""

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
    "SYNTHETIC": {"NUM_SCENES": 8, "NUM_OBJECTS": 6, "NUM_RAW_POINTS": 4000},
    "CAPACITIES": {"MAX_POINTS": 6000, "MAX_GT": 16, "MAX_VOXELS": 4096,
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
    "NAME": "VoxelRCNN",
    "VFE": {"NAME": "MeanVFE"},
    "BACKBONE_3D": {"NAME": "VoxelBackBone8x",
                    "CHANNELS": [4, 8, 8, 16, 16], "OUT_CHANNELS": 16,
                    "SUBM_MODE": "windowed", "DENSE_FROM_LEVEL": 2,
                    "WINDOWED_BLOCK": 128, "WINDOWED_WINDOW": 512},
    "MAP_TO_BEV": {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 32},
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
    "ROI_HEAD": {
        "NAME": "VoxelRCNNHead",
        "CLASS_AGNOSTIC": True,
        "SHARED_FC": [32, 32],
        "CLS_FC": [32],
        "REG_FC": [32],
        "DP_RATIO": 0.0,
        "ROI_GRID_POOL": {
            "FEATURES_SOURCE": ["x_conv2"],
            "GRID_SIZE": 4,
            "POOL_LAYERS": {
                "x_conv2": {"MLPS": [[16, 16]], "POOL_RADIUS": [0.8],
                            "NSAMPLE": [8], "POOL_METHOD": "max_pool",
                            "QUERY_RANGES": [[4, 4, 4]]},
            },
        },
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


def test_forward_and_decode(setup):
    ds, det, batch, variables = setup
    out = det.apply(variables, batch, train=False)
    assert out["rcnn_cls"].shape[0] == 2
    assert "multi_scale_3d_features" in out
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
