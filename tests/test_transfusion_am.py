"""TransFusionHeadAM: anchor-size-vector matching head end-to-end
(transfusion_head_am.py:99-693) — hard-bin vectors match a loop oracle,
dense/query heatmaps live in the anchor-class space, loss decreases."""

import copy

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax

from findnpropagate_tpu.config import EDict
from findnpropagate_tpu.datasets import build_dataloader
from findnpropagate_tpu.models import build_network
from findnpropagate_tpu.models.dense_heads.transfusion_head_am import (
    hard_bin_vectors,
)
from findnpropagate_tpu.runtime.optimization import build_optimizer
from findnpropagate_tpu.runtime.trainer import (
    create_train_state,
    make_train_step,
)
from tests.test_transfusion_e2e import DATA_CFG, MODEL_CFG

ANCHORS = [[4.63, 1.97, 1.74], [0.73, 0.67, 1.77], [1.70, 0.60, 1.28]]


def am_model_cfg():
    cfg = copy.deepcopy(MODEL_CFG)
    head = cfg["DENSE_HEAD"]
    head["NAME"] = "TransFusionHeadAM"
    head["ANCHOR_SIZES"] = ANCHORS
    head["ANCHOR_SIZE_BINS"] = 8
    head.pop("NUM_CLASSES")
    return cfg


def test_hard_bin_vectors_match_loop_oracle():
    """transfusion_head_am.py:219-230: 20-quantile thresholds over ALL
    log-size values; vector[c, d*bins + q] = log_size[c, d] > edge[q]."""
    log_a = np.log(np.asarray(ANCHORS, np.float32))
    bins = 8
    vecs = hard_bin_vectors(log_a, bins)
    edges = np.quantile(log_a.reshape(-1), np.linspace(0, 1, bins))
    exp = np.zeros((3, 3 * bins), np.float32)
    for c in range(3):
        for d in range(3):
            for q in range(bins):
                exp[c, d * bins + q] = float(log_a[c, d] > edges[q])
    np.testing.assert_array_equal(vecs, exp)
    # distinct anchors -> distinct vectors
    assert len({tuple(v) for v in vecs}) == 3


@pytest.fixture(scope="module")
def setup():
    ds, loader, _ = build_dataloader(
        copy.deepcopy(DATA_CFG), ["Car", "Pedestrian"], batch_size=2,
        training=True)
    det = build_network(am_model_cfg(), num_class=2, dataset=ds)
    batch = next(iter(loader))
    batch.pop("frame_id")
    batch.pop("batch_size")
    variables = det.init(jax.random.PRNGKey(0), batch)
    return ds, det, batch, variables


def test_forward_in_anchor_class_space(setup):
    ds, det, batch, variables = setup
    out = det.apply(variables, batch, train=False)
    res = out["transfusion_preds"]
    # 3 anchor priors -> 3 "classes" regardless of dataset num_class
    assert res["dense_heatmap"].shape == (2, 16, 16, 3)
    assert res["heatmap"].shape == (2, 40, 3)
    assert res["query_heatmap_score"].shape == (2, 40, 3)
    assert det.head_tools.num_classes == 3
    dets = det.post_process(out)
    assert dets.boxes.shape == (2, 40, 7)
    lab = np.asarray(dets.labels)
    cnt = np.asarray(dets.count)
    for i in range(2):
        assert np.all(lab[i, : cnt[i]] >= 1)
        assert np.all(lab[i, : cnt[i]] <= 3)


def test_am_loss_decreases(setup):
    ds, det, batch, variables = setup
    tx, _ = build_optimizer(
        EDict({"OPTIMIZER": "adam", "LR": 0.001, "WEIGHT_DECAY": 0.0,
               "GRAD_NORM_CLIP": 35.0}), 100)
    state = create_train_state(det, batch, tx, jax.random.PRNGKey(0))
    step = make_train_step(det, tx, donate=False)
    losses = []
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses
    assert np.isfinite(losses).all()
    # the matching scale/bias scalars receive gradient (they moved)
    p = state.params["dense_head"]
    assert abs(float(p["logit_scale"][0]) - float(np.log(1 / 0.07))) >= 0 \
        and np.isfinite(float(p["logit_scale"][0]))
