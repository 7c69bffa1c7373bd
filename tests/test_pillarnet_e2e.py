"""PillarNet end-to-end: dynamic pillar VFE, sparse 2D backbone (windowed
pipeline on a (1, ny, nx) grid), BaseBEVBackboneV1 neck, CenterHead."""

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
                   "MAX_POINTS_PER_VOXEL": 16},
    "POINT_FEATURE_ENCODING": {
        "encoding_type": "absolute_coordinates_encoding",
        "used_feature_list": ["x", "y", "z", "intensity"],
        "src_feature_list": ["x", "y", "z", "intensity"],
    },
    "DATA_PROCESSOR": [
        {"NAME": "mask_points_and_boxes_outside_range", "REMOVE_OUTSIDE_BOXES": True},
        {"NAME": "shuffle_points", "SHUFFLE_ENABLED": {"train": True, "test": False}},
        {"NAME": "transform_points_to_voxels", "VOXEL_SIZE": [0.2, 0.2, 4.0]},
    ],
})
MODEL_CFG = EDict({
    "NAME": "PillarNet",
    "VFE": {"NAME": "DynPillarVFE", "WITH_DISTANCE": False,
            "USE_ABSLOTE_XYZ": True, "USE_NORM": True, "NUM_FILTERS": [16]},
    "BACKBONE_3D": {
        "NAME": "PillarRes18BackBone8x",
        "CHANNELS": [16, 16, 32, 32, 32],
        "SUBM_MODE": "windowed",
        "WINDOWED_BLOCK": 128, "WINDOWED_WINDOW": 512,
    },
    "BACKBONE_2D": {
        "NAME": "BaseBEVBackboneV1",
        "LAYER_NUMS": [2, 2],
        "NUM_FILTERS": [32, 32],
        "UPSAMPLE_STRIDES": [1, 2],
        "NUM_UPSAMPLE_FILTERS": [32, 32],
    },
    "DENSE_HEAD": {
        "NAME": "CenterHead",
        "CLASS_AGNOSTIC": False,
        "SHARED_CONV_CHANNEL": 32,
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
        "TARGET_ASSIGNER_CONFIG": {"FEATURE_MAP_STRIDE": 8,
                                   "NUM_MAX_OBJS": 500,
                                   "GAUSSIAN_OVERLAP": 0.1, "MIN_RADIUS": 2},
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {"cls_weight": 1.0,
                                         "loc_weight": 2.0,
                                         "code_weights": [1.0] * 8}},
        "POST_PROCESSING": {
            "SCORE_THRESH": 0.1,
            "POST_CENTER_LIMIT_RANGE": [-15, -15, -10, 15, 15, 10],
            "MAX_OBJ_PER_SAMPLE": 100,
            "NMS_CONFIG": {"NMS_TYPE": "nms_bev", "NMS_THRESH": 0.2,
                           "NMS_PRE_MAXSIZE": 100, "NMS_POST_MAXSIZE": 32},
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
    assert out["spatial_features_2d"].shape[-1] == 64  # concat 32+32
    assert "x_conv5" in out["multi_scale_2d_features"]
    assert int(out.get("sparse_window_overflow", 0)) == 0
    dets = det.post_process(out)
    assert dets.boxes.shape[0] == 2


def test_loss_decreases(setup):
    ds, det, batch, variables = setup
    tx, _ = build_optimizer(
        EDict({"OPTIMIZER": "adam", "LR": 0.003, "WEIGHT_DECAY": 0.0,
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
