"""Dataset bootstrap: KITTI calib/label parsing + info generation and the
devkit-free nuScenes info builder, exercised on tiny synthetic raw trees
that follow the official file layouts."""

import json
import pickle

import numpy as np
import pytest

from findnpropagate_tpu.datasets.kitti import (
    create_groundtruth_database,
    create_kitti_infos,
)
from findnpropagate_tpu.datasets.nuscenes_infos import (
    NuScenesTables,
    create_nuscenes_infos,
    quat_to_rot,
)
from findnpropagate_tpu.utils.calibration_kitti import Calibration


# ------------------------------------------------------------------ KITTI

def make_kitti_tree(root):
    (root / "training" / "velodyne").mkdir(parents=True)
    (root / "training" / "calib").mkdir(parents=True)
    (root / "training" / "label_2").mkdir(parents=True)
    (root / "ImageSets").mkdir()
    (root / "ImageSets" / "train.txt").write_text("000000\n")
    (root / "ImageSets" / "val.txt").write_text("")

    # identity-ish calib: camera at lidar origin, x_cam = -y_l, y_cam = -z_l,
    # z_cam = x_l (standard KITTI orientation)
    P2 = "P2: 700 0 600 0 0 700 200 0 0 0 1 0"
    R0 = "R0_rect: 1 0 0 0 1 0 0 0 1"
    TR = "Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0"
    (root / "training" / "calib" / "000000.txt").write_text(
        "P0: 0\nP1: 0\n" + P2 + "\nP3: 0 0 0 0 0 0 0 0 0 0 0 0\n"
        + R0 + "\n" + TR + "\n")

    # one car at lidar (10, 2, -0.5) = rect (-2, 0.5+h/2... ) — write the
    # label in RECT frame: loc is box BOTTOM center
    # lidar (10, 2, 0) center, dims l=4 w=2 h=1.5, heading 0
    # rect loc = (-y, -z, x) of lidar BOTTOM center (z_bottom = -0.75)
    label = "Car 0.0 0 0.0 100 100 200 180 1.5 2.0 4.0 -2.0 0.75 10.0 -1.5707963"
    (root / "training" / "label_2" / "000000.txt").write_text(label + "\n")

    pts = np.random.RandomState(0).uniform(-1, 1, (500, 4)).astype(np.float32)
    pts[:, 0] = pts[:, 0] * 1.9 + 10
    pts[:, 1] = pts[:, 1] * 0.9 + 2
    pts[:, 2] = pts[:, 2] * 0.7
    pts.tofile(str(root / "training" / "velodyne" / "000000.bin"))
    return pts


def test_kitti_info_generation(tmp_path):
    pts = make_kitti_tree(tmp_path)
    out = create_kitti_infos(tmp_path, splits=("train",))
    with open(out["train"], "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 1
    annos = infos[0]["annos"]
    assert list(annos["name"]) == ["Car"]
    box = annos["gt_boxes_lidar"][0]
    # heading -(pi/2 + ry) with ry = -pi/2 -> 0
    np.testing.assert_allclose(box, [10, 2, 0, 4, 2, 1.5, 0], atol=1e-3)
    assert annos["num_points_in_gt"][0] > 400  # most synthetic points inside

    db = create_groundtruth_database(tmp_path, out["train"])
    with open(db, "rb") as f:
        db_infos = pickle.load(f)
    assert "Car" in db_infos and db_infos["Car"][0]["num_points_in_gt"] > 400
    crop = np.fromfile(
        str(tmp_path / db_infos["Car"][0]["path"]), np.float32
    ).reshape(-1, 4)
    # crops are box-centered
    assert np.abs(crop[:, :3]).max() < 2.5


def test_kitti_calib_roundtrip(tmp_path):
    make_kitti_tree(tmp_path)
    calib = Calibration(str(tmp_path / "training" / "calib" / "000000.txt"))
    pts_lidar = np.array([[10.0, 2.0, -0.5], [5.0, -1.0, 0.3]], np.float32)
    rect = calib.lidar_to_rect(pts_lidar)
    back = calib.rect_to_lidar(rect)
    np.testing.assert_allclose(back, pts_lidar, atol=1e-4)
    img, depth = calib.lidar_to_img(pts_lidar)
    assert (depth > 0).all()


# ---------------------------------------------------------------- nuScenes

def make_nuscenes_tree(root, version="v1.0-mini"):
    tdir = root / version
    tdir.mkdir(parents=True)
    q_id = [1.0, 0.0, 0.0, 0.0]
    # ego at (100, 50), lidar mounted identity
    tables = {
        "scene": [{"token": "scene0", "name": "scene-0001"}],
        "sample": [{"token": "samp0", "timestamp": 1_000_000,
                    "scene_token": "scene0",
                    "data": {"LIDAR_TOP": "sd0"}, "prev": "", "next": ""}],
        "sample_data": [{
            "token": "sd0", "sample_token": "samp0",
            "ego_pose_token": "pose0", "calibrated_sensor_token": "cs0",
            "timestamp": 1_000_000, "filename": "samples/LIDAR_TOP/f0.bin",
            "prev": "", "next": "", "is_key_frame": True,
        }],
        "ego_pose": [{"token": "pose0", "translation": [100.0, 50.0, 0.0],
                      "rotation": q_id, "timestamp": 1_000_000}],
        "calibrated_sensor": [{"token": "cs0",
                               "translation": [0.0, 0.0, 1.8],
                               "rotation": q_id,
                               "camera_intrinsic": []}],
        "sample_annotation": [{
            "token": "ann0", "sample_token": "samp0",
            "instance_token": "inst0",
            "translation": [110.0, 52.0, 1.0],    # global
            "size": [2.0, 4.0, 1.5],              # w, l, h
            "rotation": q_id,
            "num_lidar_pts": 25, "num_radar_pts": 2,
            "prev": "", "next": "", "attribute_tokens": ["attr0"],
        }],
        "instance": [{"token": "inst0"}],
        "attribute": [{"token": "attr0", "name": "vehicle.parked"}],
        "category": [{"token": "cat0", "name": "vehicle.car"}],
    }
    tables["sample_annotation"][0]["category_name"] = "vehicle.car"
    for name, rows in tables.items():
        (tdir / f"{name}.json").write_text(json.dumps(rows))
    return root


def test_nuscenes_info_generation(tmp_path):
    make_nuscenes_tree(tmp_path)
    out = create_nuscenes_infos(tmp_path, version="v1.0-mini", max_sweeps=2)
    infos = []
    for fp in out.values():
        with open(fp, "rb") as f:
            infos.extend(pickle.load(f))
    assert len(infos) == 1
    info = infos[0]
    assert info["token"] == "samp0"
    assert info["lidar_path"] == "samples/LIDAR_TOP/f0.bin"
    assert len(info["sweeps"]) == 1  # max_sweeps-1, duplicated stub
    # gt box: global (110, 52, 1) - ego (100, 50, 0) - sensor z 1.8
    box = info["gt_boxes"][0]
    np.testing.assert_allclose(box[:3], [10.0, 2.0, -0.8], atol=1e-6)
    np.testing.assert_allclose(box[3:6], [4.0, 2.0, 1.5], atol=1e-6)  # l,w,h
    assert info["gt_names"][0] == "car"
    assert info["gt_attrs"][0] == "vehicle.parked"
    assert info["num_lidar_pts"][0] == 25


def test_quat_rotation_yaw():
    # 90-degree yaw quaternion
    q = [np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)]
    r = quat_to_rot(q)
    np.testing.assert_allclose(r @ [1, 0, 0], [0, 1, 0], atol=1e-9)


def test_shared_database_memmap(tmp_path):
    """USE_SHARED_MEMORY: the stacked-monolith memmap path returns the
    same points as per-file reads (database_sampler.py:385-394)."""
    import pickle

    from findnpropagate_tpu.datasets.augmentor.database_sampler import (
        DataBaseSampler,
        build_shared_database,
    )

    rng = np.random.RandomState(0)
    infos = {"Car": []}
    for i in range(3):
        pts = rng.randn(10 + i, 5).astype(np.float32)
        rel = f"gt_database/car_{i}.bin"
        (tmp_path / "gt_database").mkdir(exist_ok=True)
        pts.tofile(str(tmp_path / rel))
        infos["Car"].append({
            "path": rel, "num_points_in_gt": len(pts),
            "box3d_lidar": np.array([i * 10.0, 0, 0, 4, 2, 1.5, 0.0]),
        })
    infos = build_shared_database(infos, tmp_path, tmp_path / "sdb.npy")
    with open(tmp_path / "dbinfos.pkl", "wb") as f:
        pickle.dump(infos, f)

    cfg = {"DB_INFO_PATH": ["dbinfos.pkl"],
           "SAMPLE_GROUPS": ["Car:3"],
           "USE_SHARED_MEMORY": True,
           "DB_DATA_PATH": ["sdb.npy"],
           "NUM_POINT_FEATURES": 5}
    s = DataBaseSampler(cfg, tmp_path, ["Car"])
    assert s.db_data is not None
    for i, info in enumerate(infos["Car"]):
        via_mm = s._load_points(info)
        direct = np.fromfile(
            str(tmp_path / info["path"]), np.float32).reshape(-1, 5)
        np.testing.assert_array_equal(via_mm, direct)
    # sampler still places objects end-to-end
    out = s({"points": np.zeros((5, 5), np.float32),
             "gt_boxes": np.zeros((0, 7), np.float32), "gt_names": []})
    assert len(out["gt_boxes"]) == 3
