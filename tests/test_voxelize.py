import numpy as np

from findnpropagate_tpu.ops.voxelize import dynamic_voxelize, voxelize


PC_RANGE = (0.0, 0.0, 0.0, 10.0, 10.0, 4.0)
VOXEL_SIZE = (1.0, 1.0, 2.0)
GRID = (10, 10, 2)


def _voxelize(points, mask=None, max_voxels=32, max_points=4):
    if mask is None:
        mask = np.ones(points.shape[0], dtype=bool)
    return voxelize(
        points.astype(np.float32), mask, PC_RANGE, VOXEL_SIZE, GRID,
        max_voxels, max_points,
    )


def test_basic_grouping():
    points = np.array(
        [
            [0.5, 0.5, 0.5, 1.0],   # voxel (0,0,0)
            [0.6, 0.4, 0.7, 2.0],   # voxel (0,0,0)
            [2.5, 3.5, 1.0, 3.0],   # voxel (2,3,0)
            [9.5, 9.5, 3.5, 4.0],   # voxel (9,9,1)
        ]
    )
    out = _voxelize(points)
    assert int(out.num_voxels) == 3
    coords = np.asarray(out.coords)[: int(out.num_voxels)]
    # zyx order
    want = {(0, 0, 0), (0, 3, 2), (1, 9, 9)}
    assert {tuple(c) for c in coords} == want
    nums = np.asarray(out.num_points)[: int(out.num_voxels)]
    # the (0,0,0) voxel has 2 points
    idx = [i for i, c in enumerate(coords) if tuple(c) == (0, 0, 0)][0]
    assert nums[idx] == 2
    v = np.asarray(out.voxels)[idx]
    assert {v[0, 3], v[1, 3]} == {1.0, 2.0}
    # stable order: first point kept first
    assert v[0, 3] == 1.0


def test_out_of_range_and_masked_points_dropped():
    points = np.array(
        [
            [0.5, 0.5, 0.5, 1.0],
            [-1.0, 0.5, 0.5, 2.0],   # out of range
            [0.5, 0.5, 0.5, 3.0],    # masked out
        ]
    )
    mask = np.array([True, True, False])
    out = _voxelize(points, mask)
    assert int(out.num_voxels) == 1
    assert int(out.num_points[0]) == 1
    pv = np.asarray(out.point_voxel_idx)
    assert pv[0] == 0 and pv[1] == -1 and pv[2] == -1


def test_max_points_per_voxel_truncates():
    points = np.zeros((10, 4))
    points[:, 0:3] = 0.5
    points[:, 3] = np.arange(10)
    out = _voxelize(points, max_points=4)
    assert int(out.num_voxels) == 1
    assert int(out.num_points[0]) == 4
    # first 4 in original order kept
    assert np.allclose(np.asarray(out.voxels)[0, :, 3], [0, 1, 2, 3])


def test_max_voxels_caps():
    points = np.zeros((20, 3))
    points[:, 0] = np.arange(20) % 10 + 0.5
    points[:, 1] = (np.arange(20) // 10) + 0.5
    out = _voxelize(points, max_voxels=5)
    assert int(out.num_voxels) == 5
    assert np.asarray(out.voxel_mask).sum() == 5


def test_empty_input():
    points = np.zeros((4, 3))
    mask = np.zeros(4, dtype=bool)
    out = _voxelize(points, mask)
    assert int(out.num_voxels) == 0
    assert not np.asarray(out.voxel_mask).any()


def test_dynamic_voxelize_mapping():
    points = np.array(
        [[0.5, 0.5, 0.5], [0.7, 0.7, 0.7], [5.5, 5.5, 1.0]], dtype=np.float32
    )
    mask = np.ones(3, dtype=bool)
    pv, coords, vmask, n = dynamic_voxelize(
        points, mask, PC_RANGE, VOXEL_SIZE, GRID, 8
    )
    pv = np.asarray(pv)
    assert int(n) == 2
    assert pv[0] == pv[1] != pv[2]
    assert pv[2] >= 0


def test_voxelize_gather_build_oracle_with_overflow():
    """The gather-based bucket build (first-T points per voxel via segment
    starts) must match a python oracle in both the plain and the
    CAPACITY-OVERFLOW case — kept voxel V-1 must end at the first cut
    segment's start, not swallow the remaining points."""
    import jax.numpy as jnp
    import numpy as np
    from collections import OrderedDict
    from findnpropagate_tpu.ops.voxelize import voxelize

    rng = np.random.RandomState(0)
    p = 200
    pts = rng.uniform(0, 4, (p, 4)).astype(np.float32)
    mask = rng.rand(p) > 0.1

    def oracle(v_cap, t_cap):
        groups = OrderedDict()
        for i in range(p):
            if not mask[i]:
                continue
            c = tuple(int(v) for v in np.floor(pts[i, :3]))
            if any(v < 0 or v >= 4 for v in c):
                continue
            groups.setdefault(c, []).append(i)
        lin = {c: (c[2] * 4 + c[1]) * 4 + c[0] for c in groups}
        return sorted(groups, key=lambda c: lin[c])[:v_cap], groups

    for v_cap in (32, 128):   # 62 true voxels: overflow and headroom
        vox, coords, npnts, vmask, nv, pv = map(np.asarray, voxelize(
            jnp.asarray(pts), jnp.asarray(mask), (0, 0, 0, 4, 4, 4),
            (1, 1, 1), (4, 4, 4), v_cap, 5))
        order, groups = oracle(v_cap, 5)
        assert int(nv) == len(order)
        for v, c in enumerate(order):
            idxs = groups[c][:5]
            assert tuple(coords[v]) == (c[2], c[1], c[0])
            assert npnts[v] == len(idxs), (v_cap, v, npnts[v], len(idxs))
            np.testing.assert_allclose(vox[v, :len(idxs)], pts[idxs])
            for i in idxs:
                assert pv[i] == v
        assert (vox[int(nv):] == 0).all()


def test_voxelize_mean_matches_bucket_mean():
    """voxelize_mean must equal the (bucket -> masked mean) composition for
    every voxel, including truncated (count > T) and capped-V cases."""
    from findnpropagate_tpu.ops.voxelize import voxelize_mean

    rng = np.random.RandomState(7)
    points = rng.uniform(0, 10, (400, 5)).astype(np.float32)
    points[:, 2] = rng.uniform(0, 4, 400)
    points[50:60] = 100.0  # out of range
    mask = np.ones(400, dtype=bool)
    mask[::17] = False

    for v_cap, t_cap in [(32, 4), (64, 3), (16, 10)]:
        bucket = voxelize(points, mask, PC_RANGE, VOXEL_SIZE, GRID,
                          v_cap, t_cap)
        fused = voxelize_mean(points, mask, PC_RANGE, VOXEL_SIZE, GRID,
                              v_cap, t_cap)
        np.testing.assert_array_equal(np.asarray(bucket.coords),
                                      np.asarray(fused.coords))
        np.testing.assert_array_equal(np.asarray(bucket.num_points),
                                      np.asarray(fused.num_points))
        np.testing.assert_array_equal(np.asarray(bucket.voxel_mask),
                                      np.asarray(fused.voxel_mask))
        np.testing.assert_array_equal(np.asarray(bucket.point_voxel_idx),
                                      np.asarray(fused.point_voxel_idx))
        nums = np.asarray(bucket.num_points).astype(np.float32)
        want = np.asarray(bucket.voxels).sum(axis=1) / np.clip(
            nums, 1.0, None)[:, None]
        np.testing.assert_allclose(np.asarray(fused.means), want,
                                   rtol=1e-6, atol=1e-6)
        # padding rows are exactly zero
        assert np.all(np.asarray(fused.means)[int(fused.num_voxels):] == 0)
