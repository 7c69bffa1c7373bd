import numpy as np
import pytest

from findnpropagate_tpu.utils import losses as L
from findnpropagate_tpu.utils.box_coders import PointResidualCoder, ResidualCoder


def test_sigmoid_focal_matches_formula():
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 5, 3).astype(np.float32)
    targets = (rng.rand(2, 5, 3) > 0.7).astype(np.float32)
    weights = rng.rand(2, 5).astype(np.float32)
    got = np.asarray(L.sigmoid_focal_loss(logits, targets, weights))

    p = 1 / (1 + np.exp(-logits))
    alpha_w = targets * 0.25 + (1 - targets) * 0.75
    pt = targets * (1 - p) + (1 - targets) * p
    bce = np.clip(logits, 0, None) - logits * targets + np.log1p(np.exp(-np.abs(logits)))
    want = alpha_w * pt**2 * bce * weights[..., None]
    assert np.allclose(got, want, atol=1e-5)


def test_weighted_smooth_l1_nan_ignored():
    preds = np.array([[[1.0, 2.0]]], dtype=np.float32)
    targets = np.array([[[np.nan, 2.5]]], dtype=np.float32)
    got = np.asarray(L.weighted_smooth_l1_loss(preds, targets, beta=1 / 9))
    assert got[0, 0, 0] == 0.0
    assert got[0, 0, 1] > 0


def test_smooth_l1_regions():
    beta = 1.0 / 9
    small = np.float32(0.05)
    big = np.float32(2.0)
    got_small = float(np.asarray(L.smooth_l1(small, beta)))
    got_big = float(np.asarray(L.smooth_l1(big, beta)))
    assert got_small == pytest.approx(0.5 * 0.05**2 / beta, abs=1e-6)
    assert got_big == pytest.approx(2.0 - 0.5 * beta, abs=1e-6)


def test_gaussian_focal_positive_pixel():
    pred = np.array([[0.9]], dtype=np.float32)
    target = np.array([[1.0]], dtype=np.float32)
    got = float(np.asarray(L.gaussian_focal_loss(pred, target)).sum())
    want = -np.log(0.9 + 1e-12) * (1 - 0.9) ** 2
    assert got == pytest.approx(want, rel=1e-4)


def test_focal_loss_centernet_no_positive():
    pred = np.full((1, 1, 4, 4), 0.1, dtype=np.float32)
    target = np.zeros((1, 1, 4, 4), dtype=np.float32)
    got = float(L.focal_loss_centernet(pred, target))
    want = -np.sum(np.log(1 - pred + 1e-12) * pred**2)
    assert got == pytest.approx(want, rel=1e-4)


def test_residual_coder_roundtrip():
    rng = np.random.RandomState(1)
    boxes = np.zeros((20, 7), dtype=np.float32)
    boxes[:, 0:3] = rng.uniform(-10, 10, (20, 3))
    boxes[:, 3:6] = rng.uniform(0.5, 5, (20, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 20)
    anchors = boxes + rng.uniform(-0.3, 0.3, boxes.shape).astype(np.float32)
    coder = ResidualCoder()
    dec = np.asarray(coder.decode(coder.encode(boxes, anchors), anchors))
    assert np.allclose(dec, boxes, atol=1e-4)


def test_residual_coder_sincos_roundtrip():
    rng = np.random.RandomState(2)
    boxes = np.zeros((10, 9), dtype=np.float32)  # +vx, vy extras
    boxes[:, 0:3] = rng.uniform(-10, 10, (10, 3))
    boxes[:, 3:6] = rng.uniform(0.5, 5, (10, 3))
    boxes[:, 6] = rng.uniform(-np.pi / 2, np.pi / 2, 10)
    boxes[:, 7:9] = rng.uniform(-3, 3, (10, 2))
    anchors = boxes.copy()
    anchors[:, 0:3] += 0.2
    coder = ResidualCoder(code_size=9, encode_angle_by_sincos=True)
    enc = coder.encode(boxes, anchors)
    assert enc.shape[-1] == 10
    dec = np.asarray(coder.decode(enc, anchors))
    assert np.allclose(dec[:, :6], boxes[:, :6], atol=5e-4)
    assert np.allclose(dec[:, 7:], boxes[:, 7:], atol=1e-4)
    # heading equal modulo 2pi
    d = np.mod(dec[:, 6] - boxes[:, 6] + np.pi, 2 * np.pi) - np.pi
    assert np.allclose(d, 0, atol=1e-4)


def test_point_residual_coder_roundtrip():
    rng = np.random.RandomState(3)
    boxes = np.zeros((15, 7), dtype=np.float32)
    boxes[:, 0:3] = rng.uniform(-5, 5, (15, 3))
    boxes[:, 3:6] = rng.uniform(0.5, 4, (15, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 15)
    points = boxes[:, 0:3] + rng.uniform(-1, 1, (15, 3)).astype(np.float32)
    classes = rng.randint(1, 4, 15)
    mean_size = ((4.0, 1.8, 1.6), (0.8, 0.6, 1.7), (1.8, 0.6, 1.7))
    coder = PointResidualCoder(mean_size=mean_size)
    enc = coder.encode(boxes, points, classes)
    dec = np.asarray(coder.decode(enc, points, classes))
    assert np.allclose(dec[:, :6], boxes[:, :6], atol=5e-4)
    d = np.mod(dec[:, 6] - boxes[:, 6] + np.pi, 2 * np.pi) - np.pi
    assert np.allclose(d, 0, atol=1e-4)
