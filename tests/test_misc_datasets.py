"""Info-pkl loaders for Lyft/Custom/Argo2/Pandaset (+ Waymo/ONCE): each
consumes a tiny synthetic tree in the official layout and yields padded
samples through prepare_data."""

import pickle

import numpy as np

from findnpropagate_tpu.config import EDict
from findnpropagate_tpu.datasets import DATASET_REGISTRY

BASE = {
    "POINT_CLOUD_RANGE": [-10.0, -10.0, -3.0, 10.0, 10.0, 1.0],
    "CAPACITIES": {"MAX_POINTS": 2048, "MAX_GT": 8, "MAX_VOXELS": 512,
                   "MAX_POINTS_PER_VOXEL": 8},
    "POINT_FEATURE_ENCODING": {
        "encoding_type": "absolute_coordinates_encoding",
        "used_feature_list": ["x", "y", "z", "intensity"],
        "src_feature_list": ["x", "y", "z", "intensity"],
    },
    "DATA_PROCESSOR": [
        {"NAME": "mask_points_and_boxes_outside_range",
         "REMOVE_OUTSIDE_BOXES": True},
    ],
    "DATA_SPLIT": {"train": "train", "test": "val"},
}


def pts(n=500, dims=4, seed=0):
    rng = np.random.RandomState(seed)
    p = rng.uniform(-9, 9, (n, dims)).astype(np.float32)
    p[:, 2] = rng.uniform(-2.5, 0.5, n)
    return p


BOX = np.array([[3.0, 1.0, -0.5, 4.0, 2.0, 1.5, 0.3]], np.float32)


def run_loader(cls_name, cfg, root, class_names=("Car",)):
    ds = DATASET_REGISTRY[cls_name](
        EDict({**BASE, **cfg}), list(class_names), training=True,
        root_path=str(root))
    assert len(ds) == 1
    batch = ds.collate_batch([ds[0]])  # padding happens at collate
    assert batch["points"].shape[1] == BASE["CAPACITIES"]["MAX_POINTS"]
    assert batch["gt_boxes"].shape[1] == BASE["CAPACITIES"]["MAX_GT"]
    assert (batch["gt_boxes"][0, :, 7] > 0).sum() == 1
    return ds


def test_lyft_loader(tmp_path):
    (tmp_path / "lidar").mkdir()
    pts(dims=5).tofile(str(tmp_path / "lidar" / "f0.bin"))
    infos = [{"lidar_path": "lidar/f0.bin", "token": "t0", "sweeps": [],
              "gt_boxes": BOX, "gt_names": np.array(["Car"], dtype=object)}]
    with open(tmp_path / "lyft_infos_train.pkl", "wb") as f:
        pickle.dump(infos, f)
    run_loader("LyftDataset",
               {"INFO_PATH": {"train": ["lyft_infos_train.pkl"]},
                "MAX_SWEEPS": 1}, tmp_path)


def test_custom_loader(tmp_path):
    (tmp_path / "points").mkdir()
    np.save(str(tmp_path / "points" / "000.npy"), pts())
    infos = [{"point_cloud": {"lidar_idx": "000"},
              "annos": {"name": np.array(["Car"], dtype=object),
                        "gt_boxes_lidar": BOX}}]
    with open(tmp_path / "custom_infos_train.pkl", "wb") as f:
        pickle.dump(infos, f)
    run_loader("CustomDataset",
               {"INFO_PATH": {"train": ["custom_infos_train.pkl"]}},
               tmp_path)


def test_argo2_loader(tmp_path):
    (tmp_path / "vel").mkdir()
    pts().tofile(str(tmp_path / "vel" / "a0.bin"))
    infos = [{"point_cloud": {"velodyne_path": "vel/a0.bin"},
              "annos": {"name": np.array(["Car"], dtype=object),
                        "gt_boxes_lidar": BOX}}]
    with open(tmp_path / "argo2_infos_train.pkl", "wb") as f:
        pickle.dump(infos, f)
    run_loader("Argo2Dataset",
               {"INFO_PATH": {"train": ["argo2_infos_train.pkl"]}},
               tmp_path)


def test_pandaset_loader(tmp_path):
    np.save(str(tmp_path / "p0.npy"), pts())
    infos = [{"points_path": "p0.npy", "sequence": "001", "frame_idx": 0,
              "gt_boxes": BOX,
              "gt_names": np.array(["Car"], dtype=object)}]
    with open(tmp_path / "pandaset_infos_train.pkl", "wb") as f:
        pickle.dump(infos, f)
    run_loader("PandasetDataset",
               {"INFO_PATH": {"train": ["pandaset_infos_train.pkl"]}},
               tmp_path)


def test_waymo_loader(tmp_path):
    seq = "segment-000"
    d = tmp_path / "waymo_processed_data" / seq
    d.mkdir(parents=True)
    p = np.concatenate([pts(dims=5), -np.ones((500, 1), np.float32)], axis=1)
    np.save(str(d / "0000.npy"), p)
    infos = [{"point_cloud": {"lidar_sequence": seq, "sample_idx": 0},
              "frame_id": f"{seq}_0",
              "annos": {"name": np.array(["Car"], dtype=object),
                        "gt_boxes_lidar": BOX,
                        "num_points_in_gt": np.array([10])}}]
    with open(d / f"{seq}.pkl", "wb") as f:
        pickle.dump(infos, f)
    (tmp_path / "ImageSets").mkdir()
    (tmp_path / "ImageSets" / "train.txt").write_text(seq + ".tfrecord\n")
    run_loader("WaymoDataset",
               {"DATA_SPLIT": {"train": "train", "test": "val"},
                "PROCESSED_DATA_TAG": "waymo_processed_data"}, tmp_path)


def test_once_loader(tmp_path):
    d = tmp_path / "data" / "000013" / "lidar_roof"
    d.mkdir(parents=True)
    pts().tofile(str(d / "frame1.bin"))
    infos = [{"sequence_id": "000013", "frame_id": "frame1",
              "annos": {"name": np.array(["Car"], dtype=object),
                        "boxes_3d": BOX}}]
    with open(tmp_path / "once_infos_train.pkl", "wb") as f:
        pickle.dump(infos, f)
    run_loader("ONCEDataset",
               {"INFO_PATH": {"train": ["once_infos_train.pkl"]}}, tmp_path)
