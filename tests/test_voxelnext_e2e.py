"""VoxelNeXt end-to-end: fully sparse backbone (multi-scale BEV merge, no
dense map), sparse head target assignment to nearest active voxels, loss
descent, sparse decode."""

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
        {"NAME": "transform_points_to_voxels", "VOXEL_SIZE": [0.2, 0.2, 0.5]},
    ],
})
MODEL_CFG = EDict({
    "NAME": "VoxelNeXt",
    "VFE": {"NAME": "MeanVFE"},
    "BACKBONE_3D": {
        "NAME": "VoxelResBackBone8xVoxelNeXt",
        "CHANNELS": [8, 16, 16, 32, 32],
        "OUT_CHANNEL": 32,
        "SUBM_MODE": "windowed",
        "WINDOWED_BLOCK": 128,
        "WINDOWED_WINDOW": 512,
        "MAX_BEV_VOXELS": 512,
    },
    "DENSE_HEAD": {
        "NAME": "VoxelNeXtHead",
        "CLASS_AGNOSTIC": False,
        "SHARED_CONV_CHANNEL": 32,
        "KERNEL_SIZE_HEAD": 1,
        "WINDOWED_BLOCK": 128,
        "WINDOWED_WINDOW": 512,
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
        "TARGET_ASSIGNER_CONFIG": {
            "FEATURE_MAP_STRIDE": 8,
            "NUM_MAX_OBJS": 500,
            "GAUSSIAN_OVERLAP": 0.1,
            "MIN_RADIUS": 2,
        },
        "LOSS_CONFIG": {
            "LOSS_WEIGHTS": {"cls_weight": 1.0, "loc_weight": 0.25,
                             "code_weights": [1.0] * 8},
        },
        "POST_PROCESSING": {
            "SCORE_THRESH": 0.1,
            "POST_CENTER_LIMIT_RANGE": [-15, -15, -10, 15, 15, 10],
            "MAX_OBJ_PER_SAMPLE": 100,
            "NMS_CONFIG": {"NMS_TYPE": "nms_gpu", "NMS_THRESH": 0.2,
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


def test_backbone_sparse_bev(setup):
    ds, det, batch, variables = setup
    out = det.apply(variables, batch, train=False)
    bev = out["encoded_sparse_bev"]
    assert bev["features"].shape[0] == 2
    assert bev["features"].shape[-1] == 32
    v = np.asarray(bev["valid"])
    assert v.any(), "no active BEV voxels after merge"
    # active coords live on the stride-8 grid
    c = np.asarray(bev["coords"])
    assert c[v].min() >= 0
    assert (c[v][:, 1] < 16).all() and (c[v][:, 2] < 16).all()
    assert int(out.get("sparse_window_overflow", 0)) == 0
    # sorted sparse ids (windowed invariant)
    ids = np.asarray(bev["ids"])
    assert (np.diff(ids, axis=1) > 0).all()


def test_targets_on_active_voxels(setup):
    ds, det, batch, variables = setup
    out = det.apply(variables, batch, train=False)
    vox = out["voxelnext_voxels"]
    vox_xy = np.stack(
        [np.asarray(vox["coords"])[..., 2], np.asarray(vox["coords"])[..., 1]],
        -1).astype(np.float32)
    import jax.numpy as jnp

    heatmaps, targets, inds, masks = det.head_tools.assign(
        batch["gt_boxes"], jnp.asarray(vox_xy), vox["valid"])
    n_gt = int((np.asarray(batch["gt_boxes"])[..., 7] > 0).sum())
    assert int(np.asarray(masks).sum()) == n_gt
    hm = np.asarray(heatmaps)
    # the nearest active voxel of each gt carries a peak == 1 ('nearst' type)
    assert hm.max() > 0.999
    # assigned voxels are valid actives
    v = np.asarray(vox["valid"])
    m = np.asarray(masks)
    i = np.asarray(inds)
    for b in range(2):
        assert v[b][i[b][m[b]]].all()


def test_decode(setup):
    ds, det, batch, variables = setup
    out = det.apply(variables, batch, train=False)
    dets = det.post_process(out)
    assert dets.boxes.shape[0] == 2
    assert dets.boxes.shape[-1] == 7


def test_loss_decreases(setup):
    ds, det, batch, variables = setup
    tx, _ = build_optimizer(
        EDict({"OPTIMIZER": "adam", "LR": 0.003, "WEIGHT_DECAY": 0.0,
               "GRAD_NORM_CLIP": 10.0}), 100,
    )
    state = create_train_state(det, batch, tx, jax.random.PRNGKey(0))
    step = make_train_step(det, tx, donate=False)
    losses = []
    for _ in range(12):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses
    assert np.isfinite(losses).all()


def test_double_flip_tta():
    """Double-flip TTA: eval batches expand x4 at collate; the head's
    merge_double_flip folds them back to B samples with valid boxes."""
    import jax.numpy as jnp

    data_cfg = copy.deepcopy(DATA_CFG)
    data_cfg["DATA_PROCESSOR"][-1]["DOUBLE_FLIP"] = True
    model_cfg = copy.deepcopy(MODEL_CFG)
    model_cfg["DENSE_HEAD"]["DOUBLE_FLIP"] = True
    ds, loader, _ = build_dataloader(
        data_cfg, CLASS_NAMES, batch_size=2, training=False)
    det = build_network(model_cfg, num_class=2, dataset=ds)
    batch = next(iter(loader))
    batch.pop("frame_id")
    batch.pop("batch_size")
    assert batch["points"].shape[0] == 8  # 2 samples x 4 flips
    variables = det.init(jax.random.PRNGKey(0), batch)
    out = det.apply(variables, batch, train=False)
    dets = det.post_process(out)
    assert dets.boxes.shape[0] == 2       # merged back to real batch
    assert np.isfinite(np.asarray(dets.boxes)).all()
