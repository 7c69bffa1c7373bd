"""CaDDN end-to-end: ImageVFE (depth distribution + frustum-to-voxel
sampling), Conv2DCollapse, anchor head; depth loss + detection loss descend."""

import copy

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from findnpropagate_tpu.config import EDict
from findnpropagate_tpu.datasets import build_dataloader
from findnpropagate_tpu.models import build_network
from findnpropagate_tpu.runtime.optimization import build_optimizer
from findnpropagate_tpu.runtime.trainer import create_train_state, make_train_step

DATA_CFG = EDict({
    "DATASET": "SyntheticDataset",
    "POINT_CLOUD_RANGE": [-12.8, -12.8, -3.0, 12.8, 12.8, 1.0],
    "SYNTHETIC": {"NUM_SCENES": 4, "NUM_OBJECTS": 6, "NUM_RAW_POINTS": 3000,
                  "CAMERA": {"NUM": 1, "IMAGE_SIZE": [48, 64]}},
    "CAPACITIES": {"MAX_POINTS": 4000, "MAX_GT": 16, "MAX_VOXELS": 2048,
                   "MAX_POINTS_PER_VOXEL": 8},
    "POINT_FEATURE_ENCODING": {
        "encoding_type": "absolute_coordinates_encoding",
        "used_feature_list": ["x", "y", "z", "intensity"],
        "src_feature_list": ["x", "y", "z", "intensity"],
    },
    "DATA_PROCESSOR": [
        {"NAME": "mask_points_and_boxes_outside_range",
         "REMOVE_OUTSIDE_BOXES": True},
        {"NAME": "transform_points_to_voxels",
         "VOXEL_SIZE": [0.4, 0.4, 0.5]},
    ],
})
MODEL_CFG = EDict({
    "NAME": "CaDDN",
    "VFE": {
        "NAME": "ImageVFE",
        "FFN": {"CHANNELS": 16, "STRIDE": 4},
        "DISC_CFG": {"mode": "LID", "num_bins": 20,
                     "depth_min": 1.0, "depth_max": 20.0},
        "LOSS": {"WEIGHT": 3.0, "GAMMA": 2.0},
    },
    "MAP_TO_BEV": {"NAME": "Conv2DCollapse", "NUM_BEV_FEATURES": 32},
    "BACKBONE_2D": {"NAME": "BaseBEVBackbone", "LAYER_NUMS": [2],
                    "LAYER_STRIDES": [1], "NUM_FILTERS": [32],
                    "UPSAMPLE_STRIDES": [1], "NUM_UPSAMPLE_FILTERS": [32]},
    "DENSE_HEAD": {
        "NAME": "AnchorHeadSingle",
        "USE_DIRECTION_CLASSIFIER": False,
        "ANCHOR_GENERATOR_CONFIG": [
            {"class_name": "Car", "anchor_sizes": [[4.6, 1.95, 1.7]],
             "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.5],
             "feature_map_stride": 1, "matched_threshold": 0.55,
             "unmatched_threshold": 0.4},
            {"class_name": "Pedestrian", "anchor_sizes": [[0.8, 0.7, 1.7]],
             "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.5],
             "feature_map_stride": 1, "matched_threshold": 0.5,
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
    "POST_PROCESSING": {
        "RECALL_THRESH_LIST": [0.3, 0.5, 0.7],
        "SCORE_THRESH": 0.1,
        "NMS_CONFIG": {"NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.1,
                       "NMS_PRE_MAXSIZE": 256, "NMS_POST_MAXSIZE": 64},
    },
})


def test_bin_depths_lid_roundtrip():
    from findnpropagate_tpu.models.vfe.image_vfe import bin_depths

    d = jnp.asarray([1.0, 5.0, 10.0, 19.9])
    idx = np.asarray(bin_depths(d, "LID", 1.0, 20.0, 20))
    assert (np.diff(idx) > 0).all()
    assert idx[0] < 0.01 and idx[-1] < 20.01
    u = np.asarray(bin_depths(d, "UD", 1.0, 20.0, 20))
    np.testing.assert_allclose(u, (np.asarray(d) - 1.0) / (19.0 / 20))


def test_caddn_e2e():
    ds, loader, _ = build_dataloader(
        copy.deepcopy(DATA_CFG), ["Car", "Pedestrian"], batch_size=2,
        training=True)
    det = build_network(copy.deepcopy(MODEL_CFG), num_class=2, dataset=ds)
    batch = next(iter(loader))
    batch.pop("frame_id")
    batch.pop("batch_size")
    variables = det.init(jax.random.PRNGKey(0), batch)
    out = det.apply(variables, batch, train=False)
    assert out["voxel_features_dense"].shape[0] == 2
    assert out["spatial_features"].shape[-1] == 32
    dets = det.post_process(out)
    assert dets.boxes.shape[0] == 2

    tx, _ = build_optimizer(
        EDict({"OPTIMIZER": "adam", "LR": 0.002, "WEIGHT_DECAY": 0.0,
               "GRAD_NORM_CLIP": 10.0}), 100)
    state = create_train_state(det, batch, tx, jax.random.PRNGKey(0))
    step = make_train_step(det, tx, donate=False)
    losses = []
    for _ in range(6):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
