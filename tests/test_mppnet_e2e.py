"""MPPNet: trajectory generation oracle, point cropping, grouped
transformer shapes, Waymo sequence/pred-box loading, and the e2e
train/eval cycle (reference mppnet_head.py + mppnet.py)."""

import pickle

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from findnpropagate_tpu.config import EDict
from findnpropagate_tpu.models.detectors.detector3d import build_detector
from findnpropagate_tpu.models.roi_heads.mppnet_head import (
    box_anchor_points,
    crop_points_to_rois,
    generate_trajectory,
    spherical_offsets,
)


def _iou3d_np(a, b):
    from findnpropagate_tpu.ops.rotated_iou import boxes_iou3d

    return np.asarray(boxes_iou3d(jnp.asarray(a), jnp.asarray(b)))


def test_generate_trajectory_matches_loop_oracle():
    rng = np.random.RandomState(3)
    f, r = 4, 6
    props = np.zeros((f, r, 9), np.float32)
    props[..., :2] = rng.uniform(-10, 10, (f, r, 2))
    props[..., 2] = 0.5
    props[..., 3:6] = rng.uniform(2, 4, (f, r, 3))
    props[..., 6] = rng.uniform(-np.pi, np.pi, (f, r))
    props[..., 7:9] = rng.uniform(-0.3, 0.3, (f, r, 2))
    valid = np.ones((f, r), bool)

    traj, vlen, assign = generate_trajectory(
        jnp.asarray(props), jnp.asarray(valid))
    traj, vlen, assign = np.asarray(traj), np.asarray(vlen), np.asarray(assign)

    # loop oracle (mppnet_head.py:635-659)
    exp = props[0].copy()
    prev = props[0].copy()
    for i in range(1, f):
        pred = prev.copy()
        pred[:, 0:2] += pred[:, 7:9]
        iou = _iou3d_np(pred[:, :7], props[i][:, :7])
        best, assign = iou.max(1), iou.argmax(1)
        ok = best >= 0.5
        cur = np.where(ok[:, None], props[i][assign], pred)
        np.testing.assert_allclose(traj[i], cur, atol=1e-4)
        np.testing.assert_array_equal(vlen[i], ok)
        prev = cur
    np.testing.assert_allclose(traj[0], exp)


def test_crop_points_first_k_and_radius():
    pts = np.zeros((20, 5), np.float32)
    pts[:, 0] = np.arange(20)          # x = index
    boxes = np.array([[5.0, 0, 0, 4.0, 4.0, 2.0, 0.0]], np.float32)
    # radius = sqrt(2^2+2^2)*1.1 ~ 3.11 -> x in [1.9, 8.1] -> idx 2..8
    crop, valid = crop_points_to_rois(
        jnp.asarray(pts), jnp.ones(20, bool), jnp.asarray(boxes), 4)
    crop, valid = np.asarray(crop), np.asarray(valid)
    assert valid[0].all()
    np.testing.assert_array_equal(crop[0, :, 0], [2, 3, 4, 5])
    # empty box -> zeros
    far = np.array([[500.0, 0, 0, 1, 1, 1, 0]], np.float32)
    crop2, valid2 = crop_points_to_rois(
        jnp.asarray(pts), jnp.ones(20, bool), jnp.asarray(far), 4)
    assert not np.asarray(valid2).any()
    assert np.abs(np.asarray(crop2)).sum() == 0


def test_spherical_offsets_formula():
    rng = np.random.RandomState(0)
    box = jnp.asarray(rng.uniform(1, 2, (1, 7)).astype(np.float32))
    anchors = box_anchor_points(box)          # (1, 9, 3)
    p = jnp.asarray(rng.uniform(-1, 1, (1, 5, 3)).astype(np.float32))
    diag = jnp.linalg.norm(box[:, 3:6], axis=-1)
    out = np.asarray(spherical_offsets(p, anchors, diag))
    assert out.shape == (1, 5, 27)
    rel = np.asarray(p)[:, :, None] - np.asarray(anchors)[:, None]
    dis = np.linalg.norm(rel, axis=-1)
    np.testing.assert_allclose(
        out[..., :9], dis / (np.asarray(diag)[:, None, None] + 1e-5),
        atol=1e-4)


def test_grouped_transformer_shapes_16frame_path():
    from findnpropagate_tpu.models.model_utils.mppnet_utils import (
        MPPNetTransformer,
    )

    cfg = {"hidden_dim": 16, "num_groups": 4, "num_frames": 8,
           "num_proxy_points": 8, "enc_layers": 2, "dim_feedforward": 32,
           "nheads": 2, "sequence_stride": 4, "dropout": 0.0,
           "use_mlp_mixer": {"hidden_dim": 8}}
    m = MPPNetTransformer(model_cfg=cfg, grid_size=2)
    src = jnp.ones((3, 8 * 8, 16))
    vs = m.init(jax.random.PRNGKey(0), src, None, False)
    hs, tokens = m.apply(vs, src, None, False)
    assert hs.shape == (3, 4 * 16)
    assert tokens.shape == (2, 3, 4, 16)


def _tiny_cfg():
    return EDict({
        "NAME": "MPPNet",
        "ROI_HEAD": {
            "NAME": "MPPNetHead", "TRANS_INPUT": 32, "CLASS_AGNOSTIC": True,
            "AVG_STAGE1_SCORE": True, "USE_TRAJ_EMPTY_MASK": True,
            "USE_AUX_LOSS": True, "IOU_WEIGHT": [0.5, 0.4],
            "ROI_GRID_POOL": {"GRID_SIZE": 2, "MLPS": [[16, 16], [16, 16]],
                              "POOL_RADIUS": [0.8, 1.6], "NSAMPLE": [8, 8],
                              "POOL_METHOD": "max_pool"},
            "Transformer": {
                "num_lidar_points": 16, "num_proxy_points": 8,
                "pos_hidden_dim": 16, "enc_layers": 3,
                "dim_feedforward": 64, "hidden_dim": 32, "dropout": 0.1,
                "nheads": 2, "pre_norm": False, "num_frames": 4,
                "num_groups": 4,
                "use_grid_pos": {"enabled": True, "init_type": "index"},
                "use_mlp_mixer": {"enabled": True, "hidden_dim": 8}},
            "TARGET_CONFIG": {
                "BOX_CODER": "ResidualCoder", "ROI_PER_IMAGE": 8,
                "FG_RATIO": 0.5, "REG_AUG_METHOD": "single",
                "ROI_FG_AUG_TIMES": 4, "RATIO": 0.2, "USE_ROI_AUG": True,
                "USE_TRAJ_AUG": {"ENABLED": True, "THRESHOD": 0.8},
                "SAMPLE_ROI_BY_EACH_CLASS": True,
                "CLS_SCORE_TYPE": "roi_iou", "CLS_FG_THRESH": 0.75,
                "CLS_BG_THRESH": 0.25, "CLS_BG_THRESH_LO": 0.1,
                "HARD_BG_RATIO": 0.8, "REG_FG_THRESH": 0.55},
            "LOSS_CONFIG": {
                "CLS_LOSS": "BinaryCrossEntropy", "REG_LOSS": "smooth-l1",
                "CORNER_LOSS_REGULARIZATION": True,
                "LOSS_WEIGHTS": {
                    "rcnn_cls_weight": 1.0, "rcnn_reg_weight": 1.0,
                    "rcnn_corner_weight": 2.0,
                    "traj_reg_weight": [2.0, 2.0, 2.0],
                    "code_weights": [1.0] * 7}}},
        "POST_PROCESSING": {
            "RECALL_THRESH_LIST": [0.3, 0.5, 0.7], "SCORE_THRESH": 0.1,
            "EVAL_METRIC": "waymo", "NOT_APPLY_NMS_FOR_VEL": True,
            "NMS_CONFIG": {"MULTI_CLASSES_NMS": False, "NMS_THRESH": 0.7,
                           "NMS_PRE_MAXSIZE": 64,
                           "NMS_POST_MAXSIZE": 16}},
    })


class _DS:
    class_names = ["Vehicle", "Pedestrian", "Cyclist"]
    grid_size = None
    voxel_size = None
    point_cloud_range = [-50, -50, -3, 50, 50, 3]
    num_point_features = 6
    max_voxels = 100
    max_points_per_voxel = 5


def _make_batch(rng, b=2, f=4, r=12, n=800, m=4):
    gt = np.zeros((b, m, 8), np.float32)
    gt[..., :2] = rng.uniform(-20, 20, (b, m, 2))
    gt[..., 2] = 0.2
    gt[..., 3:6] = rng.uniform(2, 4, (b, m, 3))
    gt[..., 6] = rng.uniform(-np.pi, np.pi, (b, m))
    gt[..., 7] = rng.randint(1, 4, (b, m))
    props = np.zeros((b, f, r, 9), np.float32)
    labels = np.zeros((b, f, r), np.int32)
    for bi in range(b):
        for fi in range(f):
            for ri in range(r):
                g = gt[bi, ri % m]
                props[bi, fi, ri, :7] = g[:7] + rng.normal(0, 0.2, 7)
                props[bi, fi, ri, 7:9] = rng.normal(0, 0.1, 2)
                labels[bi, fi, ri] = int(g[7])
    pts = rng.uniform(-25, 25, (b, n, 6)).astype(np.float32)
    pts[..., 5] = rng.randint(0, f, (b, n)) * 0.1
    # plant in-box points so crops are non-empty
    for bi in range(b):
        for mi in range(m):
            sl = slice(mi * 40, mi * 40 + 40)
            pts[bi, sl, :3] = gt[bi, mi, :3] + rng.normal(0, 0.5, (40, 3))
    return {
        "points": jnp.asarray(pts),
        "points_mask": jnp.ones((b, n), bool),
        "roi_boxes": jnp.asarray(props),
        "roi_scores": jnp.ones((b, f, r)) * 0.7,
        "roi_labels": jnp.asarray(labels),
        "gt_boxes": jnp.asarray(gt),
        "batch_size": b,
    }


@pytest.mark.slow
def test_mppnet_train_eval_e2e():
    import optax

    det = build_detector(_tiny_cfg(), 3, _DS)
    rng = np.random.RandomState(0)
    batch = _make_batch(rng)
    key = jax.random.PRNGKey(0)
    variables = det.init(key, batch)

    tx = optax.adam(3e-4)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, k):
        def lf(p):
            loss, (tb, mut) = det.loss({"params": p, **rest}, batch, rng=k)
            return loss, tb

        (loss, tb), grads = jax.value_and_grad(lf, has_aux=True)(params)
        upd, opt_state2 = tx.update(grads, opt_state)
        return optax.apply_updates(params, upd), opt_state2, loss

    losses = []
    for i in range(6):
        params, opt_state, loss = step(
            params, opt_state, jax.random.fold_in(key, 77))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses

    out = det.apply({"params": params, **rest}, batch, train=False)
    dets = det.post_process(out)
    assert dets.boxes.shape[-1] == 9          # velocity channels kept
    assert int(np.asarray(dets.count).sum()) > 0
    # labels preserved from ROIs (has_class_labels path)
    lab = np.asarray(dets.labels)
    cnt = np.asarray(dets.count)
    for bi in range(lab.shape[0]):
        assert set(np.unique(lab[bi, :cnt[bi]])) <= {1, 2, 3}


def test_waymo_sequence_predbox_loading(tmp_path):
    """get_sequence_data: multi-sweep concat + time channel + pred-box
    trajectories through the collate (waymo_dataset.py get_sequence_data)."""
    from findnpropagate_tpu.datasets.waymo import WaymoDataset

    seq = "segment-007"
    d = tmp_path / "waymo_processed_data" / seq
    d.mkdir(parents=True)
    rng = np.random.RandomState(0)
    infos = []
    for i in range(4):
        p = np.zeros((100, 6), np.float32)
        p[:, :3] = rng.uniform(2, 10, (100, 3))
        p[:, 5] = -1
        np.save(str(d / f"{i:04d}.npy"), p)
        pose = np.eye(4)
        pose[0, 3] = i * 1.0     # ego moves 1m +x per frame
        infos.append({
            "point_cloud": {"lidar_sequence": seq, "sample_idx": i},
            "frame_id": f"{seq}_{i:03d}",
            "pose": pose,
            "annos": {"name": np.array(["Vehicle"], dtype=object),
                      "gt_boxes_lidar": np.array(
                          [[5, 0, 0, 4, 2, 1.5, 0, 0, 0]], np.float32),
                      "num_points_in_gt": np.array([10])},
        })
    with open(d / f"{seq}.pkl", "wb") as f:
        pickle.dump(infos, f)
    (tmp_path / "ImageSets").mkdir()
    (tmp_path / "ImageSets" / "train.txt").write_text(seq + ".tfrecord\n")

    preds = []
    for i in range(4):
        preds.append({
            "frame_id": f"{seq}_{i:03d}",
            "boxes_lidar": np.array(
                [[5, 0, 0, 4, 2, 1.5, 0, 1.0, 0]], np.float32),
            "score": np.array([0.9]),
            "name": np.array(["Vehicle"], dtype=object),
        })
    with open(tmp_path / "result.pkl", "wb") as f:
        pickle.dump(preds, f)

    cfg = EDict({
        "DATASET": "WaymoDataset",
        "DATA_SPLIT": {"train": "train", "test": "val"},
        "PROCESSED_DATA_TAG": "waymo_processed_data",
        "POINT_CLOUD_RANGE": [-50, -50, -3, 50, 50, 3],
        "SEQUENCE_CONFIG": {"ENABLED": True, "SAMPLE_OFFSET": [-3, 0]},
        "USE_PREDBOX": True, "MAX_ROIS": 8,
        "ROI_BOXES_PATH": {"train": str(tmp_path / "result.pkl")},
        "DISABLE_NLZ_FLAG_ON_POINTS": True,
        "CAPACITIES": {"MAX_POINTS": 2000, "MAX_GT": 8, "MAX_VOXELS": 10,
                       "MAX_POINTS_PER_VOXEL": 4},
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity", "elongation",
                                  "time"],
            "src_feature_list": ["x", "y", "z", "intensity", "elongation",
                                 "time"]},
        "DATA_PROCESSOR": [],
    })
    ds = WaymoDataset(cfg, ["Vehicle", "Pedestrian", "Cyclist"],
                      training=True, root_path=tmp_path)
    sample = ds[3]      # frame 3 has frames 0..2 behind it
    pts = sample["points"]
    assert pts.shape[-1] == 6   # xyz + intensity + elongation + time
    times = np.unique(np.round(pts[:, -1], 3))
    np.testing.assert_allclose(times, [0.0, 0.1, 0.2, 0.3], atol=1e-6)
    assert sample["roi_boxes"].shape == (4, 8, 9)
    # frame i box transformed into current frame: x = 5 + pose shift (i back)
    for i in range(4):
        np.testing.assert_allclose(
            sample["roi_boxes"][i, 0, 0], 5.0 - i * 1.0, atol=1e-4)
        # velocity flipped to backward per-frame motion: -0.1 * 1.0
        np.testing.assert_allclose(
            sample["roi_boxes"][i, 0, 7], -0.1, atol=1e-5)
    batch = ds.collate_batch([sample, ds[3]])
    assert batch["roi_boxes"].shape == (2, 4, 8, 9)
    assert batch["roi_scores"].shape == (2, 4, 8)


@pytest.mark.slow
def test_mppnet_e2e_streaming_memory_bank():
    """Online MPPNetE2E: 3 consecutive frames through the functional
    memory bank; offline-trained param structure drops in
    (mppnet_memory_bank_e2e.py + mppnet_e2e.py)."""
    from findnpropagate_tpu.models.roi_heads.mppnet_head import (
        MPPNetHeadE2E,
        init_mppnet_memory,
        mppnet_e2e_push_feature,
        mppnet_e2e_push_rois,
    )

    cfg = _tiny_cfg()["ROI_HEAD"]
    head = MPPNetHeadE2E(model_cfg=cfg, num_class=1)
    rng = np.random.RandomState(1)
    b, f, r, n = 1, 4, 6, 400
    g_pts, hidden = 8, 32

    def frame_inputs(t):
        rois11 = np.zeros((b, r, 11), np.float32)
        rois11[..., :2] = rng.uniform(-15, 15, (b, r, 2))
        rois11[..., 2] = 0.3
        rois11[..., 3:6] = rng.uniform(2, 4, (b, r, 3))
        rois11[..., 6] = rng.uniform(-np.pi, np.pi, (b, r))
        rois11[..., 9] = 0.8
        rois11[..., 10] = rng.randint(1, 4, (b, r))
        pose = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
        pose[:, 0, 3] = t * 1.0
        pts = rng.uniform(-20, 20, (b, n, 6)).astype(np.float32)
        pts[..., 5] = 0.0
        return jnp.asarray(rois11), jnp.asarray(pose), jnp.asarray(pts)

    variables = None
    memory = None
    for t in range(3):
        rois11, pose, pts = frame_inputs(t)
        if memory is None:
            memory = init_mppnet_memory(rois11, pose, f, g_pts, hidden)
        else:
            memory = mppnet_e2e_push_rois(memory, rois11, pose)
        batch = {
            "points": pts, "points_mask": jnp.ones((b, n), bool),
            "memory_rois": memory["rois"], "poses": memory["poses"],
            "memory_feature": memory["feature"],
            "sample_idx": jnp.full((b,), t, jnp.int32),
        }
        if variables is None:
            variables = head.init(jax.random.PRNGKey(0), batch, False)
        out = head.apply(variables, batch, False)
        assert out["batch_box_preds"].shape == (b, r, 9)
        assert np.isfinite(np.asarray(out["batch_box_preds"])).all()
        feat = out["geometry_feature_memory"]
        assert feat.shape == (b, r, g_pts, hidden)
        memory = mppnet_e2e_push_feature(memory, feat)

    # the bank rolled: slot 0 holds the latest frame's features
    assert float(jnp.abs(memory["feature"][:, 0]).sum()) > 0

    # param structure is a subset-match of the offline head (ckpt transfer)
    det = build_detector(_tiny_cfg(), 3, _DS)
    off_vars = det.init(jax.random.PRNGKey(0),
                        _make_batch(np.random.RandomState(0), b=1, n=400))
    off = off_vars["params"]["roi_head"]
    on = variables["params"]
    for k in on:
        assert k in off, f"online param {k} missing offline"
