"""End-to-end PV-RCNN: VoxelSetAbstraction keypoints + PointHeadSimple +
PVRCNNHead two-stage refinement. Loss must descend; inference produces
refined boxes through the two-stage post-processing path.

Reference: pcdet/models/detectors/pv_rcnn.py + pfe/voxel_set_abstraction.py
+ roi_heads/pvrcnn_head.py + tools/cfgs/kitti_models/pv_rcnn.yaml."""

import copy

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from findnpropagate_tpu.config import EDict
from findnpropagate_tpu.datasets import build_dataloader
from findnpropagate_tpu.models import build_network
from findnpropagate_tpu.runtime.optimization import build_optimizer
from findnpropagate_tpu.runtime.trainer import (
    create_train_state,
    make_eval_step,
    make_train_step,
)

DATA_CFG = EDict({
    "DATASET": "SyntheticDataset",
    "POINT_CLOUD_RANGE": [-12.8, -12.8, -3.0, 12.8, 12.8, 1.0],
    "SYNTHETIC": {"NUM_SCENES": 12, "NUM_OBJECTS": 6, "NUM_RAW_POINTS": 3000},
    "CAPACITIES": {"MAX_POINTS": 4096, "MAX_GT": 12, "MAX_VOXELS": 2048,
                   "MAX_POINTS_PER_VOXEL": 8},
    "POINT_FEATURE_ENCODING": {
        "encoding_type": "absolute_coordinates_encoding",
        "used_feature_list": ["x", "y", "z", "intensity"],
        "src_feature_list": ["x", "y", "z", "intensity"],
    },
    "DATA_PROCESSOR": [
        {"NAME": "mask_points_and_boxes_outside_range",
         "REMOVE_OUTSIDE_BOXES": True},
        {"NAME": "shuffle_points", "SHUFFLE_ENABLED": {"train": True,
                                                       "test": False}},
        {"NAME": "transform_points_to_voxels", "VOXEL_SIZE": [0.4, 0.4, 0.1]},
    ],
})

SA_GROUP = {"MLPS": [[8, 8]], "POOL_RADIUS": [1.0], "NSAMPLE": [8]}
MODEL_CFG = EDict({
    "NAME": "PVRCNN",
    "VFE": {"NAME": "MeanVFE"},
    "BACKBONE_3D": {"NAME": "VoxelBackBone8x", "MAX_VOXELS": 2048,
                    "DENSE_FROM_LEVEL": 2,
                    "CHANNELS": [4, 8, 8, 16, 16], "OUT_CHANNELS": 16},
    "MAP_TO_BEV": {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 48},
    "PFE": {
        "NAME": "VoxelSetAbstraction",
        "POINT_SOURCE": "raw_points",
        "NUM_KEYPOINTS": 256,
        "NUM_OUTPUT_FEATURES": 32,
        "SAMPLE_METHOD": "FPS",
        "FEATURES_SOURCE": ["bev", "raw_points", "x_conv3"],
        "SA_LAYER": {
            "raw_points": dict(SA_GROUP),
            "x_conv3": {"DOWNSAMPLE_FACTOR": 4, **SA_GROUP},
        },
    },
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
        "NAME": "PointHeadSimple",
        "CLS_FC": [32],
        "CLASS_AGNOSTIC": True,
        "USE_POINT_FEATURES_BEFORE_FUSION": True,
        "TARGET_CONFIG": {"GT_EXTRA_WIDTH": [0.2, 0.2, 0.2]},
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {"point_cls_weight": 1.0}},
    },
    "ROI_HEAD": {
        "NAME": "PVRCNNHead",
        "CLASS_AGNOSTIC": True,
        "SHARED_FC": [64, 64],
        "CLS_FC": [64],
        "REG_FC": [64],
        "DP_RATIO": 0.0,
        "NMS_CONFIG": {
            "TRAIN": {"NMS_PRE_MAXSIZE": 512, "NMS_POST_MAXSIZE": 64,
                      "NMS_THRESH": 0.8},
            "TEST": {"NMS_PRE_MAXSIZE": 256, "NMS_POST_MAXSIZE": 32,
                     "NMS_THRESH": 0.7},
        },
        "ROI_GRID_POOL": {"GRID_SIZE": 3, "MLPS": [[16, 16]],
                          "POOL_RADIUS": [0.8], "NSAMPLE": [8],
                          "POOL_METHOD": "max_pool"},
        "TARGET_CONFIG": {
            "BOX_CODER": "ResidualCoder", "ROI_PER_IMAGE": 32,
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
        "SCORE_THRESH": 0.1,
        "NMS_CONFIG": {"NMS_THRESH": 0.01, "NMS_PRE_MAXSIZE": 64,
                       "NMS_POST_MAXSIZE": 32},
    },
})
CLASS_NAMES = ["Car", "Pedestrian"]


def test_pvrcnn_train_and_infer():
    ds, loader, _ = build_dataloader(copy.deepcopy(DATA_CFG), CLASS_NAMES,
                                     batch_size=2, training=True)
    det = build_network(copy.deepcopy(MODEL_CFG), num_class=2, dataset=ds)
    batch = next(iter(loader))
    batch.pop("frame_id", None)
    batch.pop("batch_size", None)

    tx, _ = build_optimizer(
        EDict({"OPTIMIZER": "adam", "LR": 0.003, "WEIGHT_DECAY": 0.0,
               "GRAD_NORM_CLIP": 10.0}), 10)
    state = create_train_state(det, batch, tx, jax.random.PRNGKey(0))
    step = make_train_step(det, tx, donate=False)
    losses = []
    it = iter(loader)
    for _ in range(10):
        try:
            b = next(it)
        except StopIteration:
            it = iter(loader)
            b = next(it)
        b.pop("frame_id", None)
        b.pop("batch_size", None)
        state, metrics = step(state, b)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1]), losses
        assert "rcnn_loss" in metrics and "point_loss_cls" in metrics
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses

    eval_step = make_eval_step(det)
    dets = eval_step({"params": state.params,
                      "batch_stats": state.batch_stats}, batch)
    assert np.isfinite(np.asarray(dets.scores)).all()
    assert dets.boxes.shape[-1] >= 7
