"""Remote Propagator unit tests: label store, aug inversion, loader
filtering (EMA/topk/min_score), NMS merge, sampler queue + copy-paste, and
PseudoProcessor relabel/combine."""

import numpy as np
import pytest

from findnpropagate_tpu.openvocab.pseudo_labels import (
    EGO_VEHICLE,
    ObjectSample,
    PseudoLabelStore,
    PseudoLoader,
    PseudoProcessor,
    PseudoSampler,
    bev_nms_cpu,
    reverse_augmentation,
)

ALL = ['car', 'truck', 'construction_vehicle', 'bus', 'trailer', 'barrier',
       'motorcycle', 'bicycle', 'pedestrian', 'traffic_cone']
KNOWN = ['car', 'truck', 'construction_vehicle', 'bus', 'trailer', 'barrier']


def test_store_roundtrip_and_missing(tmp_path):
    store = PseudoLabelStore(tmp_path / "labels")
    boxes = np.random.randn(5, 7).astype(np.float32)
    scores = np.random.rand(5).astype(np.float32)
    labels = np.arange(5, dtype=np.int32)
    store.save("frame_001", boxes, scores, labels)
    b, s, l = store.load("frame_001")
    np.testing.assert_allclose(b, boxes)
    b2, s2, l2 = store.load("missing_frame")
    assert len(b2) == 0 and "missing_frame" in store.missing
    store.stamp_epoch(7)
    assert store.stamped_epoch() == 7


def test_reverse_augmentation_roundtrip():
    rng = np.random.RandomState(0)
    boxes = np.zeros((6, 9), np.float32)
    boxes[:, :3] = rng.uniform(-20, 20, (6, 3))
    boxes[:, 3:6] = rng.uniform(1, 4, (6, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 6)
    boxes[:, 7:9] = rng.uniform(-3, 3, (6, 2))

    from findnpropagate_tpu.utils import geometry_np as G

    # apply augs in the augmentor's order: flip -> rotate -> scale -> translate
    dd = {"flip_x": 1.0, "noise_rot": 0.4, "noise_scale": 1.05,
          "noise_translate": np.array([0.5, -0.2, 0.1], np.float32)}
    aug = boxes.copy()
    _, aug = G.flip_along_x(np.zeros((0, 3), np.float32), aug)
    aug = G.rotate_boxes_along_z(aug, 0.4)
    aug[:, :6] *= 1.05
    aug[:, 7:9] *= 1.05
    aug[:, :3] += dd["noise_translate"]

    rec = reverse_augmentation(aug, dd)
    np.testing.assert_allclose(rec[:, :6], boxes[:, :6], atol=1e-4)
    d = np.mod(rec[:, 6] - boxes[:, 6] + np.pi, 2 * np.pi) - np.pi
    np.testing.assert_allclose(d, 0, atol=1e-4)
    np.testing.assert_allclose(rec[:, 7:9], boxes[:, 7:9], atol=1e-4)


def test_bev_nms_cpu():
    boxes = np.array([
        [0, 0, 0, 4, 2, 1.5, 0.0],
        [0.2, 0, 0, 4, 2, 1.5, 0.0],   # duplicate
        [20, 0, 0, 4, 2, 1.5, 0.0],
    ], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = bev_nms_cpu(boxes, scores, thresh=0.3)
    assert sorted(keep.tolist()) == [0, 2]


def test_loader_filters_unknowns_by_thresholds(tmp_path):
    loader = PseudoLoader(KNOWN, self_train_path=tmp_path / "st",
                          all_class_names=ALL, min_score=0.3)
    # motorcycle=7, bicycle=8, pedestrian=9, traffic_cone=10 are unknown
    boxes = np.tile(np.array([[5, 5, 0, 2, 1, 1.5, 0.0]], np.float32), (4, 1))
    boxes[1, 0] = 15
    boxes[2, 0] = 25
    boxes[3, 0] = 35
    scores = np.array([0.9, 0.2, 0.8, 0.5], np.float32)
    labels = np.array([7, 7, 1, 9], np.int32)  # label 1 = known (car)
    out, out_scores = loader._filter(boxes, scores, labels,
                                     filter_by_score=True)
    # known 'car' dropped; score 0.2 < min_score dropped
    assert len(out) == 2
    assert set(out[:, 7].astype(int).tolist()) == {7, 9}


def test_loader_selftrain_merge_removes_gt_overlaps(tmp_path):
    loader = PseudoLoader(KNOWN, self_train_path=tmp_path / "st",
                          all_class_names=ALL, min_score=0.0,
                          pseudo_nms_thresh=0.05)
    loader.selftrain_store.save(
        "f0",
        np.array([[10, 0, 0, 2, 1, 1.5, 0.0],
                  [30, 0, 0, 2, 1, 1.5, 0.0]], np.float32),
        np.array([0.9, 0.8], np.float32),
        np.array([7, 8], np.int32),
    )
    dd = {
        "frame_id": "f0",
        "gt_boxes": np.array([[10, 0, 0, 2.5, 1.5, 1.5, 0.0, 1]], np.float32),
        "pseudo_boxes": np.zeros((0, 8), np.float32),
        "pseudo_scores": np.zeros((0,), np.float32),
    }
    dd = loader.load_selftrain_pseudos(dd)
    # the box overlapping GT at (10, 0) must be removed
    assert len(dd["pseudo_boxes"]) == 1
    assert dd["pseudo_boxes"][0, 0] == pytest.approx(30, abs=1e-3)


def test_sampler_queue_and_copy_paste():
    rng = np.random.RandomState(0)
    np.random.seed(0)
    sampler = PseudoSampler([7, 8], [1, 2, 3, 4, 5, 6], min_pts=3,
                            max_queue_size_per_class=4)
    # scene points: cluster inside each pseudo box
    pts = []
    pseudo_boxes = []
    for i in range(3):
        c = np.array([10 + 8 * i, 5, 0], np.float32)
        pts.append(c + rng.uniform(-0.4, 0.4, (20, 3)).astype(np.float32))
        pseudo_boxes.append([c[0], c[1], c[2], 2, 1.2, 1.5, 0.2, 7])
    points = np.concatenate(pts).astype(np.float32)
    points = np.concatenate([points, rng.uniform(-40, 40, (500, 3)).astype(np.float32)])
    # pad to 5 features like real pipelines
    points = np.concatenate([points, np.zeros((len(points), 2), np.float32)], 1)
    pseudo_boxes = np.asarray(pseudo_boxes, np.float32)
    scores = np.array([0.9, 0.7, 0.8], np.float32)
    gt = np.array([[0, 20, 0, 4, 2, 1.5, 0.0, 1]], np.float32)

    dd = {"points": points}
    out, mask = sampler(dd, pseudo_boxes, scores, gt)
    assert len(sampler.unknown_queue[7]) == 3, "all pseudos should be queued"
    assert len(out) >= 3
    # copy-paste samples appended points to the scene
    if mask.any():
        assert len(dd["points"]) > len(points)
        # sampled boxes don't overlap gt
        from findnpropagate_tpu.utils.geometry_np import boxes_bev_iou_cpu

        samples = out[mask]
        iou = boxes_bev_iou_cpu(samples[:, :7], gt[:, :7])
        assert iou.max() < 0.1


def test_sampler_queue_replacement_keeps_best():
    np.random.seed(1)
    sampler = PseudoSampler([7], [1], min_pts=1, max_queue_size_per_class=2)
    rng = np.random.RandomState(1)
    for conf in (0.5, 0.6, 0.9, 0.1):
        c = rng.uniform(8, 30, 3).astype(np.float32)
        pts = np.concatenate(
            [c + rng.uniform(-0.3, 0.3, (10, 3)).astype(np.float32),
             np.zeros((10, 2), np.float32)], 1
        )
        box = np.array([[c[0], c[1], c[2], 2, 1, 1.5, 0, 7]], np.float32)
        sampler({"points": pts}, box, np.array([conf], np.float32),
                np.zeros((0, 8), np.float32))
    confs = sorted(s.conf for s in sampler.unknown_queue[7])
    assert confs == pytest.approx([0.6, 0.9]), confs  # low-conf replaced/rejected


def test_processor_relabel_and_combine():
    proc = PseudoProcessor(KNOWN, all_class_names=ALL)
    # known space: car=1..barrier=6 -> full space same here (prefix classes)
    gt = np.zeros((1, 3, 8), np.float32)
    gt[0, 0] = [1, 2, 0, 4, 2, 1.5, 0, 1]
    gt[0, 1] = [5, 5, 0, 4, 2, 1.5, 0, 6]
    relabeled = proc.relabel_gt_boxes(gt)
    assert relabeled[0, 0, -1] == 1 and relabeled[0, 1, -1] == 6
    pseudos = np.zeros((1, 2, 8), np.float32)
    pseudos[0, 0] = [10, 0, 0, 2, 1, 1.5, 0, 9]
    combined = proc.combine_gt_with_pseudos(relabeled, pseudos)
    labels = combined[0, :, -1].astype(int)
    assert set(labels[labels > 0].tolist()) == {1, 6, 9}
    assert proc.unknown_labels == [7, 8, 9, 10]


def test_processor_relabel_nonprefix_known():
    # knowns NOT a prefix of the full list: labels must be remapped
    known = ['car', 'pedestrian', 'bicycle']
    proc = PseudoProcessor(known, all_class_names=ALL)
    gt = np.zeros((1, 3, 8), np.float32)
    gt[0, 0, -1] = 1  # car -> 1
    gt[0, 1, -1] = 2  # pedestrian -> 9
    gt[0, 2, -1] = 3  # bicycle -> 8
    out = proc.relabel_gt_boxes(gt)
    assert out[0, :, -1].astype(int).tolist() == [1, 9, 8]


def test_save_predictions_drops_copy_paste_overlaps(tmp_path):
    proc = PseudoProcessor(KNOWN, self_training_folder=tmp_path / "st",
                           all_class_names=ALL)
    dd = {
        "frame_id": "f1",
        "pseudo_boxes": np.array([[10, 0, 0, 2, 1, 1.5, 0, 7],
                                  [20, 0, 0, 2, 1, 1.5, 0, 7]], np.float32),
        "pseudo_samples_mask": np.array([False, True]),
    }
    det = {
        "pred_boxes": np.array([[10, 0, 0, 2, 1, 1.5, 0],
                                [20, 0, 0, 2, 1, 1.5, 0],
                                [40, 0, 0, 2, 1, 1.5, 0]], np.float32),
        "pred_scores": np.array([0.9, 0.8, 0.7], np.float32),
        "pred_labels": np.array([7, 7, 8], np.int32),
    }
    proc.save_predictions([dd], [det])
    b, s, l = proc.store.load("f1")
    # the prediction overlapping the copy-paste sample at (20, 0) is dropped
    assert len(b) == 2
    assert set(np.round(b[:, 0]).astype(int).tolist()) == {10, 40}
