"""Devkit-free Waymo info generation round-trips.

Synthetic scenes are rendered INTO range images with the inverse of the
extraction math, encoded as Frame protos (waymo_proto's minimal encoder),
framed into a real TFRecord, and must come back out of
`waymo_infos.process_single_sequence` within float32 tolerance — points,
labels, pose, and the layout `WaymoDataset` consumes. TFRecord framing is
cross-checked against TensorFlow's writer/reader when TF is importable.
"""

import pickle

import numpy as np
import pytest

from findnpropagate_tpu.datasets import waymo_proto as wp
from findnpropagate_tpu.datasets import waymo_infos as wi


# ---------------------------------------------------------------------------
# framing + wire format
# ---------------------------------------------------------------------------


def test_tfrecord_roundtrip(tmp_path):
    payloads = [b"hello", b"", np.arange(100, dtype=np.int32).tobytes()]
    fp = tmp_path / "a.tfrecord"
    wp.write_tfrecord(fp, payloads)
    back = list(wp.read_tfrecord(fp, check_crc=True))
    assert back == payloads


def test_tfrecord_vs_tensorflow(tmp_path):
    tf = pytest.importorskip("tensorflow")
    payloads = [b"abc", bytes(range(256)) * 7]
    ours = tmp_path / "ours.tfrecord"
    wp.write_tfrecord(ours, payloads)
    # TF must accept our framing (it validates CRCs)...
    got = [bytes(r.numpy()) for r in tf.data.TFRecordDataset(str(ours))]
    assert got == payloads
    # ...and we must accept TF's.
    theirs = tmp_path / "tf.tfrecord"
    with tf.io.TFRecordWriter(str(theirs)) as w:
        for p in payloads:
            w.write(p)
    assert list(wp.read_tfrecord(theirs, check_crc=True)) == payloads


def test_matrix_float_roundtrip():
    arr = np.random.RandomState(0).randn(3, 5, 4).astype(np.float32)
    back = wp.decode_matrix_float(wp.encode_matrix_float(arr))
    assert back.shape == arr.shape and np.array_equal(back, arr)


# ---------------------------------------------------------------------------
# range image geometry
# ---------------------------------------------------------------------------


def _render_range_image(points_sensor, extrinsic, inclinations, width,
                        extra=None):
    """Inverse projection: sensor-frame points that sit EXACTLY on beam
    rows / column centers -> (H, W, 4) range image."""
    h = len(inclinations)
    ri = np.zeros((h, width, 4), np.float32)
    if extra is not None:
        ri[..., 3] = -1.0  # NLZ default: not in zone
    az_corr = np.arctan2(extrinsic[1, 0], extrinsic[0, 0])
    for p, (inten, elong, nlz) in zip(points_sensor, extra):
        r = np.linalg.norm(p)
        incl = np.arcsin(p[2] / r)
        az = np.arctan2(p[1], p[0])
        row = int(np.argmin(np.abs(inclinations - incl)))
        # az = ((W - col - 0.5)/W * 2 - 1) * pi - az_corr
        col = width - 0.5 - (az + az_corr + np.pi) * width / (2 * np.pi)
        col = int(np.round(col)) % width
        ri[row, col] = (r, inten, elong, nlz)
    return ri


def _beam_grid(inclinations, extrinsic, width, rows_cols_ranges):
    """Points generated exactly at (row, col) bin centers, sensor frame."""
    az_corr = np.arctan2(extrinsic[1, 0], extrinsic[0, 0])
    pts = []
    for row, col, r in rows_cols_ranges:
        incl = inclinations[row]
        az = ((width - col - 0.5) / width * 2 - 1) * np.pi - az_corr
        pts.append([r * np.cos(incl) * np.cos(az),
                    r * np.cos(incl) * np.sin(az),
                    r * np.sin(incl)])
    return np.array(pts)


def test_range_image_cartesian_identity_extrinsic():
    incl = np.linspace(-0.3, 0.2, 8)[::-1]       # row 0 = top
    extr = np.eye(4)
    cells = [(0, 3, 10.0), (4, 100, 25.0), (7, 511, 3.0)]
    pts = _beam_grid(incl, extr, 512, cells)
    ri = _render_range_image(pts, extr, incl, 512,
                             extra=[(0.5, 0.1, -1)] * 3)
    out = wi.range_image_to_cartesian(ri[..., 0], extr, incl)
    got = out[ri[..., 0] > 0]
    assert got.shape == (3, 3)
    # rendering sorts by (row, col); rebuild the same order
    order = np.lexsort(([c for _, c, _ in cells], [r for r, _, _ in cells]))
    np.testing.assert_allclose(got, pts[order], atol=1e-4)


def test_range_image_cartesian_with_extrinsic():
    rng = np.random.RandomState(1)
    incl = np.linspace(-0.4, 0.1, 16)[::-1]
    yaw = 0.7
    extr = np.eye(4)
    extr[:3, :3] = wi._rotation_zyx(0.0, 0.0, yaw)
    extr[:3, 3] = [1.2, -0.3, 2.0]
    cells = [(int(r), int(c), float(d)) for r, c, d in zip(
        rng.randint(0, 16, 20), rng.randint(0, 256, 20),
        rng.uniform(2, 40, 20))]
    cells = list({(r, c): (r, c, d) for r, c, d in cells}.values())
    pts_sensor = _beam_grid(incl, extr, 256, cells)
    ri = _render_range_image(pts_sensor, extr, incl, 256,
                             extra=[(0, 0, -1)] * len(cells))
    out = wi.range_image_to_cartesian(ri[..., 0], extr, incl)
    got = out[ri[..., 0] > 0]
    want = pts_sensor @ extr[:3, :3].T + extr[:3, 3]
    order = np.lexsort(([c[1] for c in cells], [c[0] for c in cells]))
    np.testing.assert_allclose(got, want[order], atol=1e-4)


def test_pixel_pose_path():
    """TOP lidar: per-pixel vehicle->global pose then back through
    inverse(frame_pose). With pixel_pose == frame_pose everywhere the
    correction must be an exact no-op; with a differing pixel pose the
    points must land at inv(frame_pose) @ pixel_pose @ p."""
    incl = np.linspace(-0.2, 0.2, 4)[::-1]
    extr = np.eye(4)
    cells = [(1, 10, 12.0), (2, 50, 7.0)]
    pts = _beam_grid(incl, extr, 64, cells)
    ri = _render_range_image(pts, extr, incl, 64, extra=[(0, 0, -1)] * 2)

    frame_pose = np.eye(4)
    frame_pose[:3, :3] = wi._rotation_zyx(0.0, 0.0, 0.4)
    frame_pose[:3, 3] = [100.0, -50.0, 1.0]
    rpy = np.array([0.0, 0.0, 0.4])
    pp = np.zeros((4, 64, 6))
    pp[..., :3] = rpy
    pp[..., 3:] = frame_pose[:3, 3]
    out = wi.range_image_to_cartesian(ri[..., 0], extr, incl,
                                      pixel_pose=pp, frame_pose=frame_pose)
    got = out[ri[..., 0] > 0]
    np.testing.assert_allclose(got, pts, atol=1e-5)

    pp2 = pp.copy()
    pp2[..., 2] = 0.9            # different per-pixel yaw
    pp2[..., 4] += 3.0
    out2 = wi.range_image_to_cartesian(ri[..., 0], extr, incl,
                                       pixel_pose=pp2,
                                       frame_pose=frame_pose)
    got2 = out2[ri[..., 0] > 0]
    pose2 = np.eye(4)
    pose2[:3, :3] = wi._rotation_zyx(0.0, 0.0, 0.9)
    pose2[:3, 3] = frame_pose[:3, 3] + [0, 3.0, 0]
    want = (np.linalg.inv(frame_pose) @ pose2 @ np.concatenate(
        [pts, np.ones((2, 1))], 1).T).T[:, :3]
    np.testing.assert_allclose(got2, want, atol=1e-5)


# ---------------------------------------------------------------------------
# full sequence round-trip through the generator + loader
# ---------------------------------------------------------------------------


def _make_sequence(tmp_path, seq="segment-0001"):
    rng = np.random.RandomState(3)
    width = 128
    incl_top = np.linspace(-0.3, 0.15, 8)          # low -> high (calib order)
    extr_top = np.eye(4)
    extr_top[:3, 3] = [1.0, 0.0, 2.0]
    extr_front = np.eye(4)
    extr_front[:3, :3] = wi._rotation_zyx(0.0, 0.0, 0.3)
    extr_front[:3, 3] = [3.0, 0.5, 0.8]

    frames = []
    expected_points = []
    labels_per_frame = []
    for t in range(2):
        pose = np.eye(4)
        pose[:3, 3] = [5.0 * t, 0.0, 0.0]
        # TOP: beam list; pixel pose == frame pose (exact no-op correction)
        cells_top = [(int(r), int(c), float(d)) for r, c, d in zip(
            rng.randint(0, 8, 12), rng.randint(0, width, 12),
            rng.uniform(3, 30, 12))]
        cells_top = list({(r, c): (r, c, d)
                          for r, c, d in cells_top}.values())
        incl_rows = incl_top[::-1]
        pts_top = _beam_grid(incl_rows, extr_top, width, cells_top)
        extra = [(float(i + 1), 0.25, -1.0 if i % 3 else 1.0)
                 for i in range(len(cells_top))]
        ri_top = _render_range_image(pts_top, extr_top, incl_rows, width,
                                     extra=extra)
        rpy = _matrix_to_rpy(pose[:3, :3])
        pp = np.zeros((8, width, 6), np.float32)
        pp[..., :3] = rpy
        pp[..., 3:] = pose[:3, 3]

        # FRONT: min/max inclination form, single return, no pose
        h_front = 4
        incl_front = wi.compute_inclination(-0.5, 0.0, h_front)[::-1]
        cells_front = [(0, 5, 8.0), (3, 60, 4.0)]
        pts_front = _beam_grid(incl_front, extr_front, width, cells_front)
        ri_front = _render_range_image(
            pts_front, extr_front, incl_front, width,
            extra=[(9.0, 0.5, -1.0), (10.0, 0.5, -1.0)])

        lasers = [
            wp.encode_laser(
                wp.LASER_TOP,
                wp.encode_range_image(ri_top, pose=pp),
                wp.encode_range_image(np.zeros_like(ri_top))),
            wp.encode_laser(wp.LASER_FRONT,
                            wp.encode_range_image(ri_front)),
        ]
        calibs = [
            wp.encode_laser_calibration(wp.LASER_TOP, extr_top,
                                        beam_inclinations=incl_top),
            wp.encode_laser_calibration(wp.LASER_FRONT, extr_front,
                                        incl_min=-0.5, incl_max=0.0),
        ]
        labels = [
            wp.encode_label([4.0, 1.0, 0.5], [4.2, 1.9, 1.6], 0.3, 1,
                            f"veh-{t}", difficulty=1, num_points=25,
                            speed=(3.0, 1.0)),
            wp.encode_label([-2.0, 5.0, 0.9], [0.8, 0.7, 1.7], -1.0, 2,
                            f"ped-{t}", difficulty=2, num_points=7),
            wp.encode_label([0.0, 0.0, 0.0], [1.0, 1.0, 1.0], 0.0, 0,
                            f"unk-{t}"),    # must be dropped
        ]
        frames.append(wp.encode_frame(seq, 1000 + t, pose, calibs,
                                      lasers, labels))
        # expected loader points: per-lidar sorted by name (TOP=1, FRONT=2),
        # row-major (row, col) order within each image
        order_t = np.lexsort(([c[1] for c in cells_top],
                              [c[0] for c in cells_top]))
        exp_top = np.concatenate(
            [pts_top @ extr_top[:3, :3].T + extr_top[:3, 3],
             np.array(extra)], axis=1)[order_t]
        exp_front = np.concatenate(
            [pts_front @ extr_front[:3, :3].T + extr_front[:3, 3],
             np.array([[9.0, 0.5, -1.0], [10.0, 0.5, -1.0]])], axis=1)
        expected_points.append((exp_top, exp_front))
        labels_per_frame.append(labels)

    raw = tmp_path / "raw_data"
    raw.mkdir(parents=True, exist_ok=True)
    wp.write_tfrecord(raw / f"{seq}.tfrecord", frames)
    (tmp_path / "ImageSets").mkdir(exist_ok=True)
    (tmp_path / "ImageSets" / "train.txt").write_text(f"{seq}.tfrecord\n")
    (tmp_path / "ImageSets" / "val.txt").write_text("")
    return seq, expected_points


def _matrix_to_rpy(r):
    """Inverse of _rotation_zyx for non-degenerate pitch."""
    return np.array([np.arctan2(r[2, 1], r[2, 2]),
                     -np.arcsin(r[2, 0]),
                     np.arctan2(r[1, 0], r[0, 0])])


def test_sequence_generation_roundtrip(tmp_path):
    seq, expected = _make_sequence(tmp_path)
    infos = wi.create_waymo_infos(tmp_path, sampled_interval=1)["train"]
    assert len(infos) == 2
    proc = tmp_path / "waymo_processed_data" / seq

    for t, info in enumerate(infos):
        assert info["frame_id"] == f"{seq}_%03d" % t
        assert info["metadata"]["context_name"] == seq
        assert info["metadata"]["timestamp_micros"] == 1000 + t
        np.testing.assert_allclose(info["pose"][:3, 3], [5.0 * t, 0, 0],
                                   atol=1e-6)
        exp_top, exp_front = expected[t]
        n_top, n_front = len(exp_top), len(exp_front)
        assert info["num_points_of_each_lidar"] == [n_top, n_front]
        pts = np.load(proc / ("%04d.npy" % t))
        assert pts.shape == (n_top + n_front, 6)
        np.testing.assert_allclose(pts[:n_top], exp_top, atol=2e-3)
        np.testing.assert_allclose(pts[n_top:], exp_front, atol=2e-3)

        annos = info["annos"]
        assert list(annos["name"]) == ["Vehicle", "Pedestrian"]
        np.testing.assert_allclose(annos["location"][0], [4.0, 1.0, 0.5])
        np.testing.assert_allclose(annos["dimensions"][0], [4.2, 1.9, 1.6])
        np.testing.assert_allclose(annos["heading_angles"], [0.3, -1.0])
        assert list(annos["difficulty"]) == [1, 2]
        assert list(annos["num_points_in_gt"]) == [25, 7]
        boxes = annos["gt_boxes_lidar"]
        assert boxes.shape == (2, 9)
        np.testing.assert_allclose(boxes[0, 7:], [3.0, 1.0], atol=1e-6)

    # idempotent: second run loads the existing pkl
    infos2 = wi.process_single_sequence(
        tmp_path / "raw_data" / f"{seq}.tfrecord",
        tmp_path / "waymo_processed_data")
    assert len(infos2) == 2


def test_loader_and_gt_database_consume_generated_tree(tmp_path):
    from findnpropagate_tpu.config import EDict
    from findnpropagate_tpu.datasets import DATASET_REGISTRY
    from tests.test_misc_datasets import BASE

    seq, _ = _make_sequence(tmp_path)
    wi.create_waymo_infos(tmp_path, sampled_interval=1)
    ds = DATASET_REGISTRY["WaymoDataset"](
        EDict({**BASE, "DATA_PATH": str(tmp_path),
               "POINT_CLOUD_RANGE": [-60.0, -60.0, -4.0, 60.0, 60.0, 4.0],
               "DISABLE_NLZ_FLAG_ON_POINTS": False}),
        ["Vehicle", "Pedestrian"], training=True, root_path=str(tmp_path))
    assert len(ds) == 2
    sample = ds[0]
    assert sample["gt_boxes"].shape[0] == 2        # unknown dropped upstream
    # NLZ filtering: every third synthetic TOP point had nlz=+1
    raw = np.load(tmp_path / "waymo_processed_data" / seq / "0000.npy")
    n_nlz = int((raw[:, 5] != -1).sum())
    assert n_nlz > 0

    db = wi.create_waymo_gt_database(tmp_path)
    with open(db, "rb") as f:
        db_infos = pickle.load(f)
    assert set(db_infos) <= {"Vehicle", "Pedestrian"}
    total = sum(len(v) for v in db_infos.values())
    assert total == 4                              # 2 frames x 2 kept labels
    one = db_infos["Vehicle"][0]
    crop = np.fromfile(tmp_path / one["path"], np.float32).reshape(-1, 5)
    assert crop.shape[1] == 5


def test_golden_byte_fixture():
    """Field-number pinning: the committed fixture bytes were hand-
    assembled from the PUBLIC waymo proto schema (tests/fixtures/
    make_waymo_golden.py) with no code shared with waymo_proto — a
    transposed field id in the decoder can no longer cancel against the
    in-module encoder. Caught live: the round-4 Box.length/width
    transposition."""
    import json
    from pathlib import Path

    from findnpropagate_tpu.datasets.waymo_proto import (
        Frame, read_tfrecord)

    fdir = Path(__file__).resolve().parent / "fixtures"
    recs = list(read_tfrecord(fdir / "waymo_golden.tfrecord"))
    assert len(recs) == 1
    exp = json.loads((fdir / "waymo_golden_expected.json").read_text())

    fr = Frame.parse(recs[0])
    assert fr.context_name == exp["context_name"]
    assert fr.timestamp_micros == exp["timestamp_micros"]
    np.testing.assert_allclose(fr.pose[:3, 3], exp["pose_translation"])
    cal = fr.laser_calibrations[0]
    assert cal.name == 1
    np.testing.assert_allclose(cal.beam_inclinations,
                               exp["beam_inclinations"])
    np.testing.assert_allclose(cal.extrinsic[2, 3], exp["extrinsic_z"])
    ri = fr.lasers[0].ri_return1.range_image
    assert list(ri.shape) == exp["range_image_shape"]
    np.testing.assert_allclose(ri[:, :, 0], exp["ranges"])
    assert len(fr.laser_labels) == 2
    for lab, e in zip(fr.laser_labels, exp["labels"]):
        np.testing.assert_allclose(lab.center, e["center"])
        np.testing.assert_allclose(
            [lab.length, lab.width, lab.height], e["lwh"])
        np.testing.assert_allclose(lab.heading, e["heading"])
        assert lab.type == e["type"] and lab.id == e["id"]
        assert lab.detection_difficulty_level == e["difficulty"]
        assert lab.num_lidar_points_in_box == e["num_points"]
        np.testing.assert_allclose(lab.speed, e["speed"])
