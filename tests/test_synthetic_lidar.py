"""Ring-pattern synthetic LiDAR scenes (SyntheticDataset PATTERN:
lidar_ring) — the bench/test proxy for real nuScenes 10-sweep aggregates
(nuscenes_dataset.py:104-121 under /root/reference). The sparse backbone's
throughput depends on per-level active-voxel statistics, so the proxy must
reproduce them: concentric ground rings, range-dependent density, walls,
object surface hits."""

import numpy as np

from findnpropagate_tpu.config import EDict
from findnpropagate_tpu.datasets.synthetic import SyntheticDataset

PCR = [-54, -54, -5, 54, 54, 3]


def _make(pattern, **syn):
    cfg = EDict({
        "DATASET": "SyntheticDataset",
        "POINT_CLOUD_RANGE": PCR,
        "SYNTHETIC": {"NUM_SCENES": 2, "NUM_OBJECTS": 30,
                      "NUM_RAW_POINTS": 250000, "PATTERN": pattern, **syn},
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity"],
            "src_feature_list": ["x", "y", "z", "intensity"]},
        "DATA_PROCESSOR": [],
    })
    return SyntheticDataset(cfg, ["car", "truck", "pedestrian"],
                            training=False)


def _voxel_stats(points):
    lo = np.asarray(PCR[:3], np.float64)
    vs = np.asarray([0.075, 0.075, 0.2])
    c = np.floor((points[:, :3] - lo) / vs).astype(np.int64)
    grid = np.asarray([1440, 1440, 40])
    m = ((c >= 0) & (c < grid)).all(1)
    c = c[m]
    ids = c[:, 0] * 1440 * 64 + c[:, 1] * 64 + c[:, 2]
    vox = np.unique(ids)
    cols = np.unique(ids // 64)
    return len(vox), len(cols), int(m.sum())


def test_ring_scene_statistics():
    ds = _make("lidar_ring")
    sc = ds.generate_scene(0)
    pts = sc["points"]
    assert pts.shape[1] == 4 and pts.dtype == np.float32
    assert pts.shape[0] <= 250000
    n_vox, n_cols, n_in = _voxel_stats(pts)
    # faithful 32-beam 10-sweep geometry lands around 80-130k L0 actives at
    # the 0.075 m grid — crucially UNDER the 120k/160k caps real sweeps
    # respect (the uniform scatter saturates them and silently truncates
    # the L1 active set)
    assert 60000 < n_vox < 130000, n_vox
    # thin vertical structure: ~1-1.5 active z cells per BEV column
    assert n_vox / n_cols < 1.6
    # rings: radial density decays — inner 20 m band must be denser per
    # unit area than the 40-54 m band
    r = np.hypot(pts[:, 0], pts[:, 1])
    inner = ((r > 5) & (r < 20)).sum() / (np.pi * (20**2 - 5**2))
    outer = ((r > 40) & (r < 54)).sum() / (np.pi * (54**2 - 40**2))
    assert inner > 4 * outer


def test_ring_scene_boxes_grounded_and_deterministic():
    ds = _make("lidar_ring")
    a = ds.generate_scene(1)
    b = ds.generate_scene(1)
    assert np.array_equal(a["points"], b["points"])
    boxes = a["gt_boxes"]
    ground = boxes[:, 2] - boxes[:, 5] / 2
    assert np.allclose(ground, -1.84, atol=1e-5)


def test_ring_scene_camera_attach():
    ds = _make("lidar_ring", CAMERA={"NUM": 2, "IMAGE_SIZE": [32, 32]})
    sc = ds.generate_scene(0)
    assert sc["lidar2image"].shape == (2, 4, 4)
    assert sc["camera_imgs"].shape == (2, 32, 32, 3)


def test_uniform_pattern_unchanged():
    ds = _make("uniform")
    sc = ds.generate_scene(0)
    ground = sc["gt_boxes"][:, 2] - sc["gt_boxes"][:, 5] / 2
    assert np.allclose(ground, -1.5, atol=1e-5)
