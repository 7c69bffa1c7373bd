"""PointRCNN end-to-end: PointNet2MSG backbone, PointHeadBox stage-1 point
proposals + targets, PointRCNNHead refinement, loss descent, decode."""

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
    "SYNTHETIC": {"NUM_SCENES": 8, "NUM_OBJECTS": 5, "NUM_RAW_POINTS": 1500},
    "CAPACITIES": {"MAX_POINTS": 2048, "MAX_GT": 12, "MAX_VOXELS": 2048,
                   "MAX_POINTS_PER_VOXEL": 8},
    "POINT_FEATURE_ENCODING": {
        "encoding_type": "absolute_coordinates_encoding",
        "used_feature_list": ["x", "y", "z", "intensity"],
        "src_feature_list": ["x", "y", "z", "intensity"],
    },
    "DATA_PROCESSOR": [
        {"NAME": "mask_points_and_boxes_outside_range", "REMOVE_OUTSIDE_BOXES": True},
        {"NAME": "shuffle_points", "SHUFFLE_ENABLED": {"train": True, "test": False}},
    ],
})
MODEL_CFG = EDict({
    "NAME": "PointRCNN",
    "BACKBONE_3D": {
        "NAME": "PointNet2MSG",
        "SA_CONFIG": {
            "NPOINTS": [256, 64, 32],
            "RADIUS": [[0.5, 1.0], [1.0, 2.0], [2.0, 4.0]],
            "NSAMPLE": [[8, 16], [8, 16], [8, 16]],
            "MLPS": [[[16, 16], [16, 24]],
                     [[24, 32], [24, 32]],
                     [[32, 48], [32, 48]]],
        },
        "FP_MLPS": [[32, 32], [48, 48], [64, 64]],
    },
    "POINT_HEAD": {
        "NAME": "PointHeadBox",
        "CLS_FC": [32], "REG_FC": [32],
        "CLASS_AGNOSTIC": False,
        "USE_POINT_FEATURES_BEFORE_FUSION": False,
        "TARGET_CONFIG": {
            "GT_EXTRA_WIDTH": [0.2, 0.2, 0.2],
            "BOX_CODER": "PointResidualCoder",
            "BOX_CODER_CONFIG": {
                "use_mean_size": True,
                "mean_size": [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73]],
            },
        },
        "LOSS_CONFIG": {
            "LOSS_REG": "WeightedSmoothL1Loss",
            "LOSS_WEIGHTS": {"point_cls_weight": 1.0,
                             "point_box_weight": 1.0,
                             "code_weights": [1.0] * 8},
        },
    },
    "ROI_HEAD": {
        "NAME": "PointRCNNHead",
        "CLASS_AGNOSTIC": True,
        "ROI_POINT_POOL": {"POOL_EXTRA_WIDTH": [0.0, 0.0, 0.0],
                           "NUM_SAMPLED_POINTS": 64,
                           "DEPTH_NORMALIZER": 70.0},
        "XYZ_UP_LAYER": [32, 32],
        "CLS_FC": [32], "REG_FC": [32],
        "DP_RATIO": 0.0,
        "USE_BN": False,
        "SA_CONFIG": {
            "NPOINTS": [32, 16, -1],
            "RADIUS": [0.2, 0.4, 100],
            "NSAMPLE": [8, 8, 8],
            "MLPS": [[32, 32], [32, 48], [48, 64]],
        },
        "NMS_CONFIG": {
            "TRAIN": {"NMS_TYPE": "nms_gpu", "NMS_PRE_MAXSIZE": 512,
                      "NMS_POST_MAXSIZE": 32, "NMS_THRESH": 0.8},
            "TEST": {"NMS_TYPE": "nms_gpu", "NMS_PRE_MAXSIZE": 512,
                     "NMS_POST_MAXSIZE": 16, "NMS_THRESH": 0.85},
        },
        "TARGET_CONFIG": {
            "BOX_CODER": "ResidualCoder",
            "ROI_PER_IMAGE": 16, "FG_RATIO": 0.5,
            "SAMPLE_ROI_BY_EACH_CLASS": True, "CLS_SCORE_TYPE": "cls",
            "CLS_FG_THRESH": 0.6, "CLS_BG_THRESH": 0.45,
            "CLS_BG_THRESH_LO": 0.1, "HARD_BG_RATIO": 0.8,
            "REG_FG_THRESH": 0.55,
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
                       "NMS_PRE_MAXSIZE": 512, "NMS_POST_MAXSIZE": 64},
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


def test_point_targets():
    """assign_point_targets: fg inside boxes, ignore ring, residual
    encodings recover the gt box on decode."""
    import jax.numpy as jnp

    from findnpropagate_tpu.models.dense_heads.point_head_box import (
        assign_point_targets,
    )
    from findnpropagate_tpu.utils.box_coders import PointResidualCoder

    coder = PointResidualCoder(
        use_mean_size=True, mean_size=((3.9, 1.6, 1.56), (0.8, 0.6, 1.73)))
    gt = np.zeros((1, 2, 8), np.float32)
    gt[0, 0] = [5, 0, 0, 4, 2, 1.5, 0.3, 1]
    pts = np.array([[[5.0, 0.0, 0.0],        # inside box
                     [5.0, 1.05, 0.0],       # in the 0.2-enlarged ring
                     [0.0, -5.0, 0.0]]],     # background
                   np.float32)
    labels, enc = assign_point_targets(
        jnp.asarray(pts), jnp.ones((1, 3), bool), jnp.asarray(gt), coder)
    labels = np.asarray(labels)
    assert labels[0, 0] == 1 and labels[0, 1] == -1 and labels[0, 2] == 0
    dec = coder.decode(enc[0, :1], jnp.asarray(pts)[0, :1],
                       jnp.asarray([1]))
    np.testing.assert_allclose(np.asarray(dec)[0], gt[0, 0, :7], atol=1e-4)


def test_forward_shapes(setup):
    ds, det, batch, variables = setup
    out = det.apply(variables, batch, train=False)
    assert out["point_features"].shape == (2, 2048, 32)
    assert out["point_cls_scores"].shape == (2, 2048)
    assert out["rcnn_cls"].shape == (2, 16, 1)
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
