"""Adversarial hand-computed Greedy Box Seeker fixture (VERDICT r3 #7).

Unlike tests/test_seeker_parity.py (which compares against the in-repo numpy
oracle), the expectations here are derived BY HAND from the reference
algorithm (frustum_proposals_v1.py:523-1067) on a degenerate configuration
where every stage has a closed form:

  * camera on the lidar origin looking down +x (R_c2l maps cam z->lidar x,
    cam x->-lidar y, cam y->-lidar z), f=100, c=(200, 150), image 300x400;
  * 21 points ON the optical axis at depths 10.0, 10.1, ..., 12.0 — all
    project exactly to the principal point with depth = lidar x;
  * one 2D detection (188, 140, 212, 160) centered on the principal point
    and sized to the projected proposal (the min_cam_iou=0.3 oracle gate
    must pass);
  * seeker config collapsed to ONE anchor (4, 2, 1.5), ONE size scale, ONE
    rotation (yaw 0), TWO depth magnitudes.

Hand derivation (committed below as closed forms, not seeker output):
  torch-style linear quantiles over the 21 depths:
    fmin = q(0.336) = 10.6 + 0.72*0.1  = 10.672
    fmax = q(0.356) = 10.7 + 0.12*0.1  = 10.712
  frustum BEV mids on the axis -> proposal centers (fmin,0,0), (fmax,0,0);
  front-centering: corners at x = c-/+2 (4 each, y=+-1, z=+-0.75) with
  softmin(||corner||) weights ->
    wx(c)   = ((c-2) e^{-n1} + (c+2) e^{-n2}) / (e^{-n1} + e^{-n2}),
    n1 = sqrt((c-2)^2 + 1 + 0.5625), n2 = sqrt((c+2)^2 + 1 + 0.5625)
    final x = c + (c - wx(c));   y = z = 0 by symmetry.
  dims stay (4, 2, 1.5); yaw 0; label 1 (the only class).
"""

import numpy as np

import jax.numpy as jnp

from findnpropagate_tpu.openvocab.frustum_proposer import FrustumProposerOG


def make_rig():
    r_c2l = np.array([[0, 0, 1.0], [-1.0, 0, 0], [0, -1.0, 0]])
    c2l = np.eye(4)
    c2l[:3, :3] = r_c2l
    k = np.array([[100.0, 0, 200.0], [0, 100.0, 150.0], [0, 0, 1.0]])
    l2c = np.linalg.inv(c2l)
    l2i = np.eye(4)
    l2i[:3, :3] = k @ l2c[:3, :3]
    l2i[:3, 3] = k @ l2c[:3, 3]
    intr = np.eye(4)
    intr[:3, :3] = k
    return (jnp.asarray(l2i, jnp.float32)[None],
            jnp.asarray(c2l, jnp.float32)[None],
            jnp.asarray(intr, jnp.float32)[None])


def expected_final_x(c):
    n1 = np.sqrt((c - 2.0) ** 2 + 1.0 + 0.5625)
    n2 = np.sqrt((c + 2.0) ** 2 + 1.0 + 0.5625)
    w1, w2 = np.exp(-n1), np.exp(-n2)
    wx = ((c - 2.0) * w1 + (c + 2.0) * w2) / (w1 + w2)
    return c + (c - wx)


def test_seeker_hand_fixture():
    depths = 10.0 + 0.1 * np.arange(21)
    pts = np.zeros((64, 3), np.float32)
    pts[:21, 0] = depths
    pmask = np.zeros(64, bool)
    pmask[:21] = True

    seeker = FrustumProposerOG(
        class_names=("car",),
        anchors=((4.0, 2.0, 1.5),),
        num_mags=2, num_sizes=1, num_rotations=1,
        size_min=1.0, size_max=1.0, ry_min=0.0, ry_max=0.0,
        image_size=(300, 400), det_chunk=1, topk=1,
        point_cloud_range=(-54.0, -54.0, -5.0, 54.0, 54.0, 5.0),
    )
    l2i, c2l, intr = make_rig()
    out = seeker.propose(
        jnp.asarray(pts), jnp.asarray(pmask),
        jnp.asarray([[188.0, 140.0, 212.0, 160.0]], jnp.float32),
        jnp.asarray([1], jnp.int32),
        jnp.asarray([0.9], jnp.float32),
        jnp.asarray([0], jnp.int32),
        jnp.asarray([True]),
        l2i, c2l, intr,
    )
    valid = np.asarray(out.valid)
    assert valid.sum() == 1, valid
    box = np.asarray(out.boxes)[valid][0]
    label = int(np.asarray(out.labels)[valid][0])

    # hand-computed quantiles
    fmin, fmax = 10.672, 10.712
    x_lo = expected_final_x(fmin)
    x_hi = expected_final_x(fmax)
    assert x_lo < x_hi

    assert label == 1
    np.testing.assert_allclose(box[1], 0.0, atol=1e-3)   # y symmetric
    np.testing.assert_allclose(box[2], 0.0, atol=1e-3)   # z symmetric
    np.testing.assert_allclose(box[3:6], [4.0, 2.0, 1.5], rtol=1e-5)
    np.testing.assert_allclose(box[6] % np.pi, 0.0, atol=1e-4)
    # the winner is one of the two hand-computed mag placements
    assert x_lo - 2e-3 <= box[0] <= x_hi + 2e-3, (box[0], x_lo, x_hi)
    close_to_one = min(abs(box[0] - x_lo), abs(box[0] - x_hi))
    assert close_to_one < 2e-3, (box[0], x_lo, x_hi)


def test_seeker_fixture_quantile_gate():
    """Move the point cluster: the frustum (and thus the box) must track
    the hand-computed quantiles — guards against silent changes to the
    lq/uq semantics."""
    depths = 20.0 + 0.2 * np.arange(21)   # q(0.336) = 21.344
    pts = np.zeros((64, 3), np.float32)
    pts[:21, 0] = depths
    pmask = np.zeros(64, bool)
    pmask[:21] = True
    seeker = FrustumProposerOG(
        class_names=("car",), anchors=((4.0, 2.0, 1.5),),
        num_mags=2, num_sizes=1, num_rotations=1,
        size_min=1.0, size_max=1.0, ry_min=0.0, ry_max=0.0,
        image_size=(300, 400), det_chunk=1, topk=1,
        point_cloud_range=(-54.0, -54.0, -5.0, 54.0, 54.0, 5.0),
    )
    l2i, c2l, intr = make_rig()
    out = seeker.propose(
        jnp.asarray(pts), jnp.asarray(pmask),
        jnp.asarray([[195.0, 146.0, 205.0, 154.0]], jnp.float32),
        jnp.asarray([1], jnp.int32), jnp.asarray([0.9], jnp.float32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), l2i, c2l, intr)
    valid = np.asarray(out.valid)
    assert valid.sum() == 1
    box = np.asarray(out.boxes)[valid][0]
    fmin = 20.0 + 0.2 * (0.336 * 20)      # 21.344
    fmax = 20.0 + 0.2 * (0.356 * 20)      # 21.424
    x_lo, x_hi = expected_final_x(fmin), expected_final_x(fmax)
    assert x_lo - 2e-3 <= box[0] <= x_hi + 2e-3, (box[0], x_lo, x_hi)
