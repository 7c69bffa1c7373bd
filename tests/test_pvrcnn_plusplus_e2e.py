"""PV-RCNN++ end-to-end: proposal layer BEFORE the pfe, sectorized
proposal-centric keypoint sampling, VectorPool aggregation, shared PVRCNNHead
refinement over the precomputed ROIs."""

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
from test_pvrcnn_e2e import DATA_CFG, MODEL_CFG as PVRCNN_CFG

MODEL_CFG = copy.deepcopy(PVRCNN_CFG)
MODEL_CFG["NAME"] = "PVRCNNPlusPlus"
MODEL_CFG["PFE"]["SAMPLE_METHOD"] = "SPC"
MODEL_CFG["PFE"]["SPC_SAMPLING"] = {"NUM_SECTORS": 6,
                                    "SAMPLE_RADIUS_WITH_ROI": 1.6}
MODEL_CFG["PFE"]["SA_LAYER"]["x_conv3"]["VECTOR_POOL"] = {
    "GRID_SIZE": 2, "POOL_RADIUS": 1.2, "NSAMPLE": 8, "OUT_CHANNELS": 16}
MODEL_CFG["ROI_HEAD"]["PROPOSAL_BEFORE_PFE"] = True
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


def test_topology_and_forward(setup):
    ds, det, batch, variables = setup
    order = det.module.bind(variables).module_order
    assert "roi_proposal" in order
    assert order.index("roi_proposal") < order.index("pfe")
    out = det.apply(variables, batch, train=False)
    assert "rois" in out and "point_features" in out
    dets = det.post_process(out)
    assert dets.boxes.shape[0] == 2


def test_spc_keypoints_near_rois(setup):
    """Keypoints concentrate near the proposal boxes (SPC sampling)."""
    ds, det, batch, variables = setup
    out = det.apply(variables, batch, train=False)
    kp = np.asarray(out["point_coords"])       # (B, K, 3)
    kp_valid = np.asarray(out["point_valid"])
    rois = np.asarray(out["rois"])
    rv = np.asarray(out["roi_valid"])
    for b in range(kp.shape[0]):
        if not rv[b].any() or not kp_valid[b].any():
            continue
        ctr = rois[b][rv[b], :3]
        rad = np.linalg.norm(rois[b][rv[b], 3:6], axis=-1) / 2 + 1.6 + 1e-3
        d = np.linalg.norm(kp[b][kp_valid[b]][:, None] - ctr[None], axis=-1)
        frac_near = (d < rad[None]).any(axis=1).mean()
        assert frac_near > 0.95, frac_near


def test_loss_decreases(setup):
    ds, det, batch, variables = setup
    tx, _ = build_optimizer(
        EDict({"OPTIMIZER": "adam", "LR": 0.002, "WEIGHT_DECAY": 0.0,
               "GRAD_NORM_CLIP": 10.0}), 100,
    )
    state = create_train_state(det, batch, tx, jax.random.PRNGKey(0))
    step = make_train_step(det, tx, donate=False)
    losses = []
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()
