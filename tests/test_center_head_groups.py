"""CenterHead CLASS_NAMES_EACH_HEAD grouping: per-group heads, per-group
targets with local class ids, merged decode with global labels."""

import copy

import jax
import numpy as np
import pytest

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
    "NAME": "CenterPoint",
    "VFE": {"NAME": "PillarVFE", "WITH_DISTANCE": False,
            "USE_ABSLOTE_XYZ": True, "USE_NORM": True, "NUM_FILTERS": [32]},
    "MAP_TO_BEV": {"NAME": "PointPillarScatter", "NUM_BEV_FEATURES": 32},
    "BACKBONE_2D": {"NAME": "BaseBEVBackbone", "LAYER_NUMS": [2],
                    "LAYER_STRIDES": [2], "NUM_FILTERS": [32],
                    "UPSAMPLE_STRIDES": [1], "NUM_UPSAMPLE_FILTERS": [32]},
    "DENSE_HEAD": {
        "NAME": "CenterHead",
        "CLASS_NAMES_EACH_HEAD": [["Car"], ["Pedestrian"]],
        "SHARED_CONV_CHANNEL": 32,
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
        "TARGET_ASSIGNER_CONFIG": {"FEATURE_MAP_STRIDE": 2,
                                   "GAUSSIAN_OVERLAP": 0.1, "MIN_RADIUS": 2},
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {"cls_weight": 1.0,
                                         "loc_weight": 2.0,
                                         "code_weights": [1.0] * 8}},
        "POST_PROCESSING": {
            "SCORE_THRESH": 0.01,
            "POST_CENTER_LIMIT_RANGE": [-15, -15, -5, 15, 15, 5],
            "MAX_OBJ_PER_SAMPLE": 100,
            "NMS_CONFIG": {"NMS_THRESH": 0.2, "NMS_PRE_MAXSIZE": 100,
                           "NMS_POST_MAXSIZE": 32},
        },
    },
    "POST_PROCESSING": {"RECALL_THRESH_LIST": [0.3, 0.5, 0.7]},
})
CLASS_NAMES = ["Car", "Pedestrian"]


def test_grouped_center_head_trains_and_decodes():
    ds, loader, _ = build_dataloader(copy.deepcopy(DATA_CFG), CLASS_NAMES,
                                     batch_size=2, training=True)
    det = build_network(copy.deepcopy(MODEL_CFG), num_class=2, dataset=ds)
    batch = next(iter(loader))
    batch.pop("frame_id", None)
    batch.pop("batch_size", None)

    variables = det.init(jax.random.PRNGKey(0), batch)
    out = det.apply(variables, batch, train=False)
    preds = out["center_preds"]
    assert len(preds) == 2            # one per group
    assert preds[0]["hm"].shape[-1] == 1
    assert preds[1]["hm"].shape[-1] == 1

    tx, _ = build_optimizer(
        EDict({"OPTIMIZER": "adam", "LR": 0.003, "WEIGHT_DECAY": 0.0,
               "GRAD_NORM_CLIP": 10.0}), 10)
    state = create_train_state(det, batch, tx, jax.random.PRNGKey(0))
    step = make_train_step(det, tx, donate=False)
    losses = []
    it = iter(loader)
    for _ in range(8):
        try:
            b = next(it)
        except StopIteration:
            it = iter(loader)
            b = next(it)
        b.pop("frame_id", None)
        b.pop("batch_size", None)
        state, metrics = step(state, b)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])

    eval_step = make_eval_step(det)
    dets = eval_step({"params": state.params,
                      "batch_stats": state.batch_stats}, batch)
    labels = np.asarray(dets.labels)
    # both global labels reachable through the group mapping
    assert set(np.unique(labels)) <= {0, 1, 2}
