"""Devkit-free Lyft/Pandaset/Argo2 info GENERATION on synthetic raw trees.

Each test builds a miniature raw release in the dataset's native layout
(lyft: nuScenes-schema JSON tables; pandaset: gzipped pandas pickles +
poses.json; argo2: feather files), runs the generator, and checks the
emitted infos — including loading them back through the dataset classes
used at train time. Reference semantics: lyft_utils.py:86-220,
pandaset_dataset.py:150-255, argo2_dataset.py:19-167 (/root/reference).
"""

import json
import pickle

import numpy as np
import pytest

from findnpropagate_tpu.datasets.misc_infos import (
    create_argo2_infos,
    create_lyft_infos,
    create_pandaset_infos,
)

pd = pytest.importorskip("pandas")


# ---------------------------------------------------------------------------
# Lyft
# ---------------------------------------------------------------------------

def make_lyft_tree(root):
    """One scene, one sample; ego at (100, 50) yawed 90 deg; raw-schema
    annotations (instance_token only — category_name must come from the
    instance->category reverse index, as in the real release)."""
    tdir = root / "data"
    tdir.mkdir(parents=True)
    q_id = [1.0, 0.0, 0.0, 0.0]
    q_yaw90 = [np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)]
    tables = {
        "scene": [{"token": "scene0", "name": "host-a004-lidar0-1"}],
        "sample": [{"token": "samp0", "timestamp": 2_000_000,
                    "scene_token": "scene0",
                    "data": {"LIDAR_TOP": "sd1"}, "prev": "", "next": ""}],
        "sample_data": [
            {"token": "sd1", "sample_token": "samp0",
             "ego_pose_token": "pose1", "calibrated_sensor_token": "cs0",
             "timestamp": 2_000_000, "filename": "lidar/f1.bin",
             "prev": "sd0", "next": "", "is_key_frame": True},
            {"token": "sd0", "sample_token": "samp0",
             "ego_pose_token": "pose0", "calibrated_sensor_token": "cs0",
             "timestamp": 1_900_000, "filename": "lidar/f0.bin",
             "prev": "", "next": "sd1", "is_key_frame": False},
        ],
        "ego_pose": [
            {"token": "pose1", "translation": [100.0, 50.0, 0.0],
             "rotation": q_yaw90, "timestamp": 2_000_000},
            {"token": "pose0", "translation": [100.0, 45.0, 0.0],
             "rotation": q_yaw90, "timestamp": 1_900_000},
        ],
        "calibrated_sensor": [{"token": "cs0",
                               "translation": [0.0, 0.0, 1.5],
                               "rotation": q_id,
                               "camera_intrinsic": []}],
        "sample_annotation": [{
            "token": "ann0", "sample_token": "samp0",
            "instance_token": "inst0",
            "translation": [100.0, 60.0, 1.0],   # 10m ahead of the ego (+y)
            "size": [2.0, 5.0, 2.0],             # w, l, h
            "rotation": q_yaw90,
            "prev": "", "next": "", "attribute_tokens": [],
        }],
        "instance": [{"token": "inst0", "category_token": "cat_car"}],
        "category": [{"token": "cat_car", "name": "car"}],
        "attribute": [],
    }
    for name, rows in tables.items():
        (tdir / f"{name}.json").write_text(json.dumps(rows))
    (root.parent / "ImageSets").mkdir(exist_ok=True)
    (root.parent / "ImageSets" / "train.txt").write_text(
        "host-a004-lidar0-1\n")
    (root.parent / "ImageSets" / "val.txt").write_text("")


def test_lyft_info_generation(tmp_path):
    root = tmp_path / "trainval"
    make_lyft_tree(root)
    out = create_lyft_infos(root, max_sweeps=2)
    with open(out["train"], "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 1
    info = infos[0]
    assert info["lidar_path"] == "lidar/f1.bin"
    # ego yawed +90: global +y ahead becomes sensor +x; sensor 1.5m up
    box = info["gt_boxes"][0]
    np.testing.assert_allclose(box[:3], [10.0, 0.0, -0.5], atol=1e-6)
    np.testing.assert_allclose(box[3:6], [5.0, 2.0, 2.0], atol=1e-6)  # l,w,h
    # box yaw 90 global == 0 in the yawed ego/sensor frame
    assert abs(box[6]) < 1e-6
    assert info["gt_names"][0] == "car"
    assert info["gt_boxes_velocity"].shape == (1, 3)
    # sweep: prev sample_data 5m behind along global y -> -5 sensor x
    sw = info["sweeps"][0]
    assert sw["lidar_path"] == "lidar/f0.bin"
    tm = np.asarray(sw["transform_matrix"])
    np.testing.assert_allclose(tm[:3, 3], [-5.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(sw["time_lag"], 0.1, atol=1e-9)


def test_lyft_infos_load_through_dataset(tmp_path):
    root = tmp_path / "trainval"
    make_lyft_tree(root)
    # lidar bins: 5-float rows (x y z i ring)
    (root / "lidar").mkdir()
    pts = np.array([[10.0, 0.0, -0.5, 0.3, 0.0],
                    [5.0, 1.0, 0.0, 0.2, 1.0]], np.float32)
    pts.tofile(root / "lidar" / "f1.bin")
    (pts + np.float32([0, 1, 0, 0, 0])).tofile(root / "lidar" / "f0.bin")
    out = create_lyft_infos(root, max_sweeps=2)

    from findnpropagate_tpu.config import EDict
    from findnpropagate_tpu.datasets.misc_datasets import LyftDataset

    cfg = EDict({
        "DATA_PATH": str(root),
        "INFO_PATH": {"train": [out["train"].name]},
        "MAX_SWEEPS": 2,
        "POINT_CLOUD_RANGE": [-50, -50, -5, 50, 50, 3],
        "CAPACITIES": {"MAX_POINTS": 64, "MAX_GT": 4,
                       "MAX_VOXELS": 64, "MAX_POINTS_PER_VOXEL": 4},
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity"],
            "src_feature_list": ["x", "y", "z", "intensity", "timestamp"],
        },
        "DATA_PROCESSOR": [],
        "DATA_AUGMENTOR": {"AUG_CONFIG_LIST": []},
    })
    ds = LyftDataset(cfg, class_names=["car"], training=True)
    assert len(ds) == 1
    batch = ds.collate_batch([ds[0]])
    # key frame (2 pts) + 1 sweep (2 pts)
    assert int(batch["points_mask"].sum()) == 4
    assert int((batch["gt_boxes"][0, :, 7] > 0).sum()) == 1


# ---------------------------------------------------------------------------
# Pandaset
# ---------------------------------------------------------------------------

def make_pandaset_tree(root, n_seq=2):
    """Sequences with one frame each; sensor pose translated + yawed."""
    for s in range(n_seq):
        seq = f"{s:03d}"
        lidar_dir = root / "dataset" / seq / "lidar"
        cub_dir = root / "dataset" / seq / "annotations" / "cuboids"
        lidar_dir.mkdir(parents=True)
        cub_dir.mkdir(parents=True)
        # pose: sensor at (10, 0, 2) world, identity heading
        poses = [{"position": {"x": 10.0, "y": 0.0, "z": 2.0},
                  "heading": {"w": 1.0, "x": 0.0, "y": 0.0, "z": 0.0}}]
        (lidar_dir / "poses.json").write_text(json.dumps(poses))
        # world points: one ahead of the sensor along world +y
        lidar = pd.DataFrame({
            "x": [10.0, 12.0], "y": [5.0, 0.0], "z": [2.0, 2.5],
            "i": [128.0, 255.0], "t": [0.0, 0.0], "d": [0, 0],
        })
        lidar.to_pickle(lidar_dir / "00.pkl.gz")
        cub = pd.DataFrame({
            "position.x": [10.0], "position.y": [5.0], "position.z": [2.0],
            "dimensions.x": [2.0], "dimensions.y": [4.0],
            "dimensions.z": [1.5],
            "yaw": [0.0], "label": ["Car"], "cuboids.sensor_id": [-1],
        })
        cub.to_pickle(cub_dir / "00.pkl.gz")


def test_pandaset_info_generation(tmp_path):
    make_pandaset_tree(tmp_path, n_seq=2)
    out = create_pandaset_infos(
        tmp_path, sequences={"train": ["000"], "val": ["001"]})
    with open(out["train"], "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 1
    info = infos[0]
    pts = np.load(tmp_path / info["points_path"])
    # world (10, 5, 2) - pose (10, 0, 2) = pandaset-ego (0, 5, 0)
    # -> normative (y, -x, z) = (5, 0, 0); intensity 128/255
    np.testing.assert_allclose(pts[0, :3], [5.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(pts[0, 3], 128.0 / 255.0, atol=1e-6)
    box = info["gt_boxes"][0]
    np.testing.assert_allclose(box[:3], [5.0, 0.0, 0.0], atol=1e-6)
    # dims swap: (dy, dx, dz)
    np.testing.assert_allclose(box[3:6], [4.0, 2.0, 1.5], atol=1e-6)
    # identity heading: world y-axis = ego y-axis -> zrot 0
    np.testing.assert_allclose(box[6], 0.0, atol=1e-6)
    assert info["gt_names"][0] == "Car"


def test_pandaset_yawed_pose(tmp_path):
    """90-deg sensor yaw: the box yaw must absorb zrot_world_to_ego."""
    lidar_dir = tmp_path / "dataset" / "000" / "lidar"
    cub_dir = tmp_path / "dataset" / "000" / "annotations" / "cuboids"
    lidar_dir.mkdir(parents=True)
    cub_dir.mkdir(parents=True)
    qz = [np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)]
    poses = [{"position": {"x": 0.0, "y": 0.0, "z": 0.0},
              "heading": {"w": qz[0], "x": qz[1], "y": qz[2], "z": qz[3]}}]
    (lidar_dir / "poses.json").write_text(json.dumps(poses))
    pd.DataFrame({"x": [0.0], "y": [0.0], "z": [0.0], "i": [0.0],
                  "t": [0.0], "d": [0]}).to_pickle(lidar_dir / "00.pkl.gz")
    pd.DataFrame({
        "position.x": [-5.0], "position.y": [0.0], "position.z": [0.0],
        "dimensions.x": [2.0], "dimensions.y": [4.0], "dimensions.z": [1.5],
        "yaw": [0.0], "label": ["Car"], "cuboids.sensor_id": [-1],
    }).to_pickle(cub_dir / "00.pkl.gz")
    out = create_pandaset_infos(tmp_path, sequences={"train": ["000"]})
    with open(out["train"], "rb") as f:
        info = pickle.load(f)[0]
    # world (-5,0,0) under inverse 90-yaw -> pandaset-ego (0, 5, 0)
    # -> normative (5, 0, 0); zrot = -90 deg
    box = info["gt_boxes"][0]
    np.testing.assert_allclose(box[:3], [5.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(info["zrot_world_to_ego"], -np.pi / 2,
                               atol=1e-9)
    np.testing.assert_allclose(box[6], -np.pi / 2, atol=1e-9)


# ---------------------------------------------------------------------------
# Argo2
# ---------------------------------------------------------------------------

def make_argo2_tree(root):
    seg = root / "train" / "log-abc"
    lidar = seg / "sensors" / "lidar"
    lidar.mkdir(parents=True)
    pts = pd.DataFrame({
        "x": [1.0, 2.0], "y": [0.5, -0.5], "z": [0.1, 0.2],
        "intensity": [10.0, 20.0],
    })
    pts.to_feather(lidar / "315967376859506000.feather")
    yaw = np.pi / 2
    anno = pd.DataFrame({
        "timestamp_ns": [315967376859506000, 315967376859506000],
        "tx_m": [5.0, 9.0], "ty_m": [1.0, 9.0], "tz_m": [0.5, 9.0],
        "length_m": [4.0, 1.0], "width_m": [2.0, 1.0],
        "height_m": [1.5, 1.0],
        "qw": [np.cos(yaw / 2), 1.0], "qx": [0.0, 0.0], "qy": [0.0, 0.0],
        "qz": [np.sin(yaw / 2), 0.0],
        "num_interior_pts": [12, 0],   # second box filtered out
        "category": ["REGULAR_VEHICLE", "BOLLARD"],
    })
    anno.to_feather(seg / "annotations.feather")


def test_argo2_info_generation(tmp_path):
    make_argo2_tree(tmp_path)
    out = create_argo2_infos(tmp_path, splits=("train",))
    with open(out["train"], "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 1
    info = infos[0]
    assert info["sample_idx"] == "0000000"
    annos = info["annos"]
    assert list(annos["name"]) == ["Regular_vehicle"]  # interior-pts filter
    np.testing.assert_allclose(annos["rotation_y"][0], np.pi / 2, atol=1e-9)
    boxes = annos["gt_boxes_lidar"]
    np.testing.assert_allclose(boxes[0], [5, 1, 0.5, 4, 2, 1.5, np.pi / 2],
                               atol=1e-6)
    # bin round-trip
    bin_fp = tmp_path / info["point_cloud"]["velodyne_path"]
    pts = np.fromfile(bin_fp, np.float32).reshape(-1, 4)
    np.testing.assert_allclose(pts[:, 0], [1.0, 2.0])

    from findnpropagate_tpu.config import EDict
    from findnpropagate_tpu.datasets.misc_datasets import Argo2Dataset

    cfg = EDict({
        "DATA_PATH": str(tmp_path),
        "INFO_PATH": {"train": [out["train"].name]},
        "POINT_CLOUD_RANGE": [-50, -50, -5, 50, 50, 3],
        "CAPACITIES": {"MAX_POINTS": 64, "MAX_GT": 4,
                       "MAX_VOXELS": 64, "MAX_POINTS_PER_VOXEL": 4},
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity"],
            "src_feature_list": ["x", "y", "z", "intensity"],
        },
        "DATA_PROCESSOR": [],
        "DATA_AUGMENTOR": {"AUG_CONFIG_LIST": []},
    })
    ds = Argo2Dataset(cfg, class_names=["Regular_vehicle"], training=True)
    batch = ds.collate_batch([ds[0]])
    assert int(batch["points_mask"].sum()) == 2
    assert int((batch["gt_boxes"][0, :, 7] > 0).sum()) == 1


# ---------------------------------------------------------------------------
# ONCE
# ---------------------------------------------------------------------------

def make_once_tree(root, seq="000027"):
    """Raw ONCE layout: ImageSets split lists + per-sequence JSON + lidar
    bins (once_dataset.py:155-290 input schema)."""
    (root / "ImageSets").mkdir(parents=True)
    (root / "ImageSets" / "train.txt").write_text(seq + "\n")
    seq_dir = root / "data" / seq
    (seq_dir / "lidar_roof").mkdir(parents=True)

    box = [5.0, 2.0, -0.5, 4.0, 1.8, 1.6, 0.3]
    rng = np.random.RandomState(0)
    inside = rng.uniform(-0.45, 0.45, (50, 3)) * np.array(box[3:6])
    c, s = np.cos(box[6]), np.sin(box[6])
    inside = np.stack([inside[:, 0] * c - inside[:, 1] * s,
                       inside[:, 0] * s + inside[:, 1] * c,
                       inside[:, 2]], -1) + np.array(box[:3])
    outside = rng.uniform(20, 40, (30, 3))
    pts = np.concatenate([inside, outside]).astype(np.float32)
    pts4 = np.concatenate([pts, np.zeros((len(pts), 1), np.float32)], 1)

    frames = []
    for i, fid in enumerate(["1616100000100", "1616100000200",
                             "1616100000300"]):
        pts4.tofile(str(seq_dir / "lidar_roof" / f"{fid}.bin"))
        frame = {"frame_id": fid,
                 "pose": [0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]}
        if i == 1:
            frame["annos"] = {
                "names": ["Car"],
                "boxes_3d": [box],
                "boxes_2d": {"cam01": [[10, 10, 60, 40]]},
            }
        elif i == 2:
            # annotated frame with zero boxes -> must be skipped entirely
            frame["annos"] = {"names": [], "boxes_3d": [],
                              "boxes_2d": {"cam01": []}}
        frames.append(frame)
    seq_json = {
        "meta_info": {"weather": "sunny"},
        "calib": {"cam01": {
            "cam_to_velo": np.eye(4).tolist(),
            "cam_intrinsic": [[900.0, 0, 800], [0, 900.0, 450], [0, 0, 1]],
            "distortion": [0.0] * 7,
        }},
        "frames": frames,
    }
    with open(seq_dir / f"{seq}.json", "w") as f:
        json.dump(seq_json, f)
    return box


def test_once_info_generation(tmp_path):
    from findnpropagate_tpu.datasets.misc_infos import create_once_infos

    box = make_once_tree(tmp_path)
    out = create_once_infos(tmp_path, splits=("train",))
    with open(out["train"], "rb") as f:
        infos = pickle.load(f)
    # 3 frames, zero-box annotated frame skipped
    assert len(infos) == 2
    assert infos[0]["prev_id"] is None
    assert infos[0]["next_id"] == "1616100000200"
    assert "annos" not in infos[0]
    anno = infos[1]["annos"]
    assert list(anno["name"]) == ["Car"]
    np.testing.assert_allclose(anno["boxes_3d"][0], box, atol=1e-5)
    assert anno["num_points_in_gt"][0] == 50
    assert anno["boxes_2d"]["cam01"].shape == (1, 4)
    assert infos[1]["calib"]["cam01"]["cam_intrinsic"].shape == (3, 3)


def test_once_infos_load_through_dataset(tmp_path):
    from findnpropagate_tpu.config import EDict
    from findnpropagate_tpu.datasets.misc_infos import create_once_infos
    from findnpropagate_tpu.datasets.once import ONCEDataset

    make_once_tree(tmp_path)
    create_once_infos(tmp_path, splits=("train",))
    cfg = EDict({
        "DATA_PATH": str(tmp_path),
        "INFO_PATH": {"train": ["once_infos_train.pkl"]},
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity"],
            "src_feature_list": ["x", "y", "z", "intensity"],
        },
        "POINT_CLOUD_RANGE": [-75.2, -75.2, -5.0, 75.2, 75.2, 3.0],
        "DATA_PROCESSOR": [],
        "DATA_AUGMENTOR": {"DISABLE_AUG_LIST": ["placeholder"],
                           "AUG_CONFIG_LIST": []},
    })
    ds = ONCEDataset(cfg, class_names=["Car"], training=True,
                     root_path=str(tmp_path))
    assert len(ds) == 1  # only the annotated frame survives training filter
    item = ds[0]
    assert item["gt_boxes"].shape[0] >= 1
