"""Local / frustum / pyramid augmentations (host-side numpy)."""

import numpy as np

from findnpropagate_tpu.datasets.augmentor.data_augmentor import DataAugmentor


def make_scene():
    rng = np.random.RandomState(0)
    box = np.array([[10.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.3]], np.float32)
    local = rng.uniform(-0.45, 0.45, (200, 3)) * box[0, 3:6]
    c, s = np.cos(0.3), np.sin(0.3)
    pts_in = np.stack([local[:, 0] * c - local[:, 1] * s,
                       local[:, 0] * s + local[:, 1] * c,
                       local[:, 2]], -1) + box[0, :3]
    pts_bg = rng.uniform(-20, 20, (300, 3)).astype(np.float32)
    pts_bg[:, 2] = rng.uniform(-2, 2, 300)
    points = np.concatenate([pts_in, pts_bg]).astype(np.float32)
    intensity = rng.uniform(0, 1, (len(points), 1)).astype(np.float32)
    return {
        "points": np.concatenate([points, intensity], 1),
        "gt_boxes": box.copy(),
        "gt_names": np.asarray(["Car"]),
    }


def make_aug():
    return DataAugmentor({"AUG_CONFIG_LIST": []}, ["Car"])


def test_local_translation_moves_box_points_together():
    np.random.seed(1)
    d = make_scene()
    before = d["points"].copy()
    aug = make_aug()
    out = aug.random_local_translation(
        dict(d), {"LOCAL_TRANSLATION_RANGE": [0.5, 0.5],
                  "ALONG_AXIS_LIST": ["x"]})
    assert abs(out["gt_boxes"][0, 0] - (d["gt_boxes"][0, 0] + 0.5)) < 1e-5
    # in-box points moved by the same offset, background untouched
    moved = np.abs(out["points"][:, 0] - before[:, 0])
    assert (np.abs(moved[(moved > 1e-6)] - 0.5) < 1e-5).all()
    assert (moved > 1e-6).sum() >= 150


def test_local_scaling_and_rotation_keep_membership():
    np.random.seed(2)
    from findnpropagate_tpu.utils.geometry_np import points_in_boxes_mask

    aug = make_aug()
    d = make_scene()
    n_before = points_in_boxes_mask(
        d["points"][:, :3], d["gt_boxes"][:, :7]).sum()
    out = aug.random_local_scaling(
        dict(d), {"LOCAL_SCALE_RANGE": [1.2, 1.2]})
    n_after = points_in_boxes_mask(
        out["points"][:, :3], out["gt_boxes"][:, :7]).sum()
    assert n_after >= n_before  # scaled together: membership preserved
    out2 = aug.random_local_rotation(
        dict(d), {"LOCAL_ROT_ANGLE": [0.5, 0.5]})
    assert abs(out2["gt_boxes"][0, 6] - (0.3 + 0.5)) < 1e-5
    n_rot = points_in_boxes_mask(
        out2["points"][:, :3], out2["gt_boxes"][:, :7]).sum()
    assert n_rot >= n_before - 2


def test_global_frustum_dropout_drops_slab():
    np.random.seed(3)
    aug = make_aug()
    d = make_scene()
    n0 = len(d["points"])
    out = aug.random_global_frustum_dropout(
        dict(d), {"INTENSITY_RANGE": [0.3, 0.3], "DIRECTION": ["top"]})
    assert len(out["points"]) < n0
    zmax_before = d["points"][:, 2].max()
    assert out["points"][:, 2].max() < zmax_before


def test_local_frustum_dropout_removes_in_box_top():
    np.random.seed(4)
    from findnpropagate_tpu.utils.geometry_np import points_in_boxes_mask

    aug = make_aug()
    d = make_scene()
    n_in0 = points_in_boxes_mask(
        d["points"][:, :3], d["gt_boxes"][:, :7]).sum()
    out = aug.random_local_frustum_dropout(
        dict(d), {"INTENSITY_RANGE": [0.5, 0.5], "DIRECTION": ["top"]})
    n_in1 = points_in_boxes_mask(
        out["points"][:, :3], out["gt_boxes"][:, :7]).sum()
    assert n_in1 < n_in0
    # remaining in-box points are all in the lower half
    m = points_in_boxes_mask(out["points"][:, :3], out["gt_boxes"][:, :7])[0]
    assert (out["points"][m, 2] < d["gt_boxes"][0, 2] + 0.26).all()


def test_pyramid_dropout_and_sparsify():
    np.random.seed(5)
    aug = make_aug()
    d = make_scene()
    n0 = len(d["points"])
    out = aug.random_local_pyramid_aug(
        dict(d), {"DROP_PROB": 1.0, "SPARSIFY_PROB": 0.0, "SWAP_PROB": 0.0})
    assert len(out["points"]) < n0  # one face pyramid dropped

    d2 = make_scene()
    out2 = aug.random_local_pyramid_aug(
        dict(d2), {"DROP_PROB": 0.0, "SPARSIFY_PROB": 1.0,
                   "SPARSIFY_MAX_NUM": 5, "SWAP_PROB": 0.0})
    assert len(out2["points"]) <= len(d2["points"])


def test_road_plane_fix(tmp_path):
    """Sampled gt boxes land on the road plane (database_sampler z-fix)."""
    import sys

    sys.path.insert(0, str(tmp_path))
    from test_dataset_bootstrap import make_kitti_tree

    make_kitti_tree(tmp_path)
    # flat road plane z = -1.6 in lidar == cam y = +1.6 (y down):
    # rect frame: a*x + b*y + c*z + d = 0 with normal (0, -1, 0), d = -1.6
    (tmp_path / "training" / "planes").mkdir()
    (tmp_path / "training" / "planes" / "000000.txt").write_text(
        "# plane\nWidth 4\nHeight 1\n0 -1 0 -1.6\n")
    from findnpropagate_tpu.datasets.kitti import (
        KittiDataset, create_groundtruth_database, create_kitti_infos,
    )

    out = create_kitti_infos(tmp_path, splits=("train",))
    create_groundtruth_database(tmp_path, out["train"])
    cfg = {
        "DATASET": "KittiDataset",
        "DATA_PATH": str(tmp_path),
        "DATA_SPLIT": {"train": "train", "test": "val"},
        "INFO_PATH": {"train": ["kitti_infos_train.pkl"]},
        "POINT_CLOUD_RANGE": [0, -40, -3, 70.4, 40, 1],
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity"],
            "src_feature_list": ["x", "y", "z", "intensity"],
        },
        "DATA_PROCESSOR": [],
        "DATA_AUGMENTOR": {
            "AUG_CONFIG_LIST": [
                {"NAME": "gt_sampling",
                 "USE_ROAD_PLANE": True,
                 "NUM_POINT_FEATURES": 4,
                 "DB_INFO_PATH": ["kitti_dbinfos_train.pkl"],
                 "SAMPLE_GROUPS": ["Car:5"],
                 "PREPARE": {}},
            ],
        },
    }
    ds = KittiDataset(cfg, ["Car"], training=True, root_path=str(tmp_path))
    np.random.seed(7)
    item = ds[0]
    boxes = item["gt_boxes"]
    # every sampled Car bottom sits on z = -1.6 (within numeric tolerance);
    # the original gt stays where it was
    bottoms = boxes[:, 2] - boxes[:, 5] / 2
    sampled = bottoms[1:]
    if len(sampled):
        np.testing.assert_allclose(sampled, -1.6, atol=1e-2)
