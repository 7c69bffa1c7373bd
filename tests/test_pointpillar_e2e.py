"""End-to-end PointPillar: build from cfg, train steps reduce loss, detect,
and the sharded train step runs on the 8-device CPU mesh."""

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
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
)

DATA_CFG = EDict({
    "DATASET": "SyntheticDataset",
    "POINT_CLOUD_RANGE": [-12.8, -12.8, -3.0, 12.8, 12.8, 1.0],
    "SYNTHETIC": {"NUM_SCENES": 16, "NUM_OBJECTS": 8, "NUM_RAW_POINTS": 4000},
    "CAPACITIES": {"MAX_POINTS": 6000, "MAX_GT": 16, "MAX_VOXELS": 4000,
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
    "NAME": "PointPillar",
    "VFE": {"NAME": "PillarVFE", "WITH_DISTANCE": False, "USE_ABSLOTE_XYZ": True,
            "USE_NORM": True, "NUM_FILTERS": [32]},
    "MAP_TO_BEV": {"NAME": "PointPillarScatter", "NUM_BEV_FEATURES": 32},
    "BACKBONE_2D": {"NAME": "BaseBEVBackbone", "LAYER_NUMS": [2, 2],
                    "LAYER_STRIDES": [2, 2], "NUM_FILTERS": [32, 64],
                    "UPSAMPLE_STRIDES": [1, 2], "NUM_UPSAMPLE_FILTERS": [64, 64]},
    "DENSE_HEAD": {
        "NAME": "AnchorHeadSingle",
        "USE_DIRECTION_CLASSIFIER": True,
        "DIR_OFFSET": 0.78539, "DIR_LIMIT_OFFSET": 0.0, "NUM_DIR_BINS": 2,
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
    "POST_PROCESSING": {
        "SCORE_THRESH": 0.1,
        "NMS_CONFIG": {"NMS_THRESH": 0.01, "NMS_PRE_MAXSIZE": 256,
                       "NMS_POST_MAXSIZE": 32},
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
    tx, _ = build_optimizer(
        EDict({"OPTIMIZER": "adam", "LR": 0.003, "WEIGHT_DECAY": 0.0,
               "GRAD_NORM_CLIP": 10.0}),
        100,
    )
    state = create_train_state(det, batch, tx, jax.random.PRNGKey(0))
    return ds, loader, det, tx, state, batch


def test_forward_shapes(setup):
    ds, loader, det, tx, state, batch = setup
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out = det.apply(variables, batch, train=False)
    n_anchors = 64 * 64 * 4  # 128-grid /2 stride, 2 cls * 2 rot
    assert out["batch_box_preds"].shape == (2, n_anchors, 7)
    assert out["batch_cls_preds"].shape == (2, n_anchors, 2)
    dets = det.post_process(out)
    assert dets.boxes.shape[0] == 2


def test_loss_decreases(setup):
    ds, loader, det, tx, state, batch = setup
    # donate=False: the fixture's state is reused by later tests
    step = make_train_step(det, tx, donate=False)
    losses = []
    for i in range(30):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[::6]
    assert np.isfinite(losses).all()


def test_target_assigner_sane(setup):
    ds, loader, det, tx, state, batch = setup
    targets = det.head_tools.assign(batch["gt_boxes"])
    labels = np.asarray(targets["box_cls_labels"])
    n_gt = int((batch["gt_boxes"][..., 7] > 0).sum())
    assert (labels > 0).sum() > 0, "some anchors must be foreground"
    assert (labels == 0).sum() > labels.size * 0.5, "most anchors background"
    # foreground anchors only where gt classes exist
    fg_classes = set(np.unique(labels[labels > 0]).tolist())
    gt_classes = set(
        np.unique(batch["gt_boxes"][..., 7][batch["gt_boxes"][..., 7] > 0]
                  .astype(int)).tolist()
    )
    assert fg_classes <= gt_classes


def test_checkpoint_roundtrip(setup, tmp_path):
    ds, loader, det, tx, state, batch = setup
    path = save_checkpoint(tmp_path / "ckpt", state, step=3)
    restored = restore_checkpoint(path, state)
    assert int(restored.step) == int(state.step)
    chex_equal = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
        state.params, restored.params,
    )
    assert all(jax.tree.leaves(chex_equal))
