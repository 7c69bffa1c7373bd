"""End-to-end SECOND-IoU (two-stage): proposal layer + ROI sampling + rotated
BEV grid pooling + IoU head. Loss must descend and inference must produce
detections through the two-stage post-processing path.

Reference: pcdet/models/detectors/second_net_iou.py +
roi_heads/second_head.py + tools/cfgs/kitti_models/second_iou.yaml."""

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
from test_pointpillar_e2e import DATA_CFG

MODEL_CFG = EDict({
    "NAME": "SECONDNetIoU",
    "VFE": {"NAME": "PillarVFE", "WITH_DISTANCE": False,
            "USE_ABSLOTE_XYZ": True, "USE_NORM": True, "NUM_FILTERS": [32]},
    "MAP_TO_BEV": {"NAME": "PointPillarScatter", "NUM_BEV_FEATURES": 32},
    "BACKBONE_2D": {"NAME": "BaseBEVBackbone", "LAYER_NUMS": [2, 2],
                    "LAYER_STRIDES": [2, 2], "NUM_FILTERS": [32, 64],
                    "UPSAMPLE_STRIDES": [1, 2],
                    "NUM_UPSAMPLE_FILTERS": [32, 32]},
    "DENSE_HEAD": {
        "NAME": "AnchorHeadSingle",
        "USE_DIRECTION_CLASSIFIER": False,
        "PREDICT_BOXES_WHEN_TRAINING": True,
        "ANCHOR_GENERATOR_CONFIG": [
            {"class_name": "Car", "anchor_sizes": [[4.6, 1.95, 1.7]],
             "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.5],
             "feature_map_stride": 2, "matched_threshold": 0.55,
             "unmatched_threshold": 0.4},
            {"class_name": "Pedestrian", "anchor_sizes": [[0.8, 0.7, 1.7]],
             "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.5],
             "feature_map_stride": 2, "matched_threshold": 0.5,
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
        "NAME": "SECONDHead",
        "CLASS_AGNOSTIC": True,
        "SHARED_FC": [64, 64],
        "IOU_FC": [64],
        "DP_RATIO": 0.0,
        "NMS_CONFIG": {
            "TRAIN": {"NMS_PRE_MAXSIZE": 512, "NMS_POST_MAXSIZE": 64,
                      "NMS_THRESH": 0.8},
            "TEST": {"NMS_PRE_MAXSIZE": 256, "NMS_POST_MAXSIZE": 32,
                     "NMS_THRESH": 0.7},
        },
        "ROI_GRID_POOL": {"GRID_SIZE": 7, "IN_CHANNEL": 64,
                          "DOWNSAMPLE_RATIO": 2},
        "TARGET_CONFIG": {
            "BOX_CODER": "ResidualCoder", "ROI_PER_IMAGE": 32,
            "FG_RATIO": 0.5, "SAMPLE_ROI_BY_EACH_CLASS": True,
            "CLS_SCORE_TYPE": "roi_iou", "CLS_FG_THRESH": 0.75,
            "CLS_BG_THRESH": 0.25, "CLS_BG_THRESH_LO": 0.1,
            "HARD_BG_RATIO": 0.8, "REG_FG_THRESH": 0.55,
        },
        "LOSS_CONFIG": {
            "IOU_LOSS": "BinaryCrossEntropy",
            "LOSS_WEIGHTS": {"rcnn_iou_weight": 1.0,
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


def test_second_iou_train_and_infer():
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
    for i in range(12):
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
        assert "rcnn_loss_iou" in metrics
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses

    # inference path: two-stage post-processing produces fixed-size dets
    eval_step = make_eval_step(det)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    dets = eval_step(variables, batch)
    assert dets.boxes.shape[-1] >= 7
    assert int(dets.count.max()) >= 0
    assert np.isfinite(np.asarray(dets.scores)).all()
