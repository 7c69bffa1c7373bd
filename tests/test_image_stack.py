"""Image-model stack: bev_pool oracle parity, Swin/FPN shapes, DepthLSS
geometry, ConvFuser, and a tiny BEVFusion end-to-end."""

import copy

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from findnpropagate_tpu.config import EDict
from findnpropagate_tpu.ops.bev_pool import bev_pool


def test_bev_pool_matches_naive_scatter():
    rng = np.random.RandomState(0)
    n, c, nx, ny, nz = 500, 8, 16, 12, 4
    feats = rng.standard_normal((n, c)).astype(np.float32)
    coords = rng.randint(-2, 18, (n, 3)).astype(np.int32)
    valid = rng.rand(n) > 0.2
    out = np.asarray(bev_pool(jnp.asarray(feats), jnp.asarray(coords),
                              jnp.asarray(valid), nx, ny, nz))
    want = np.zeros((ny, nx, nz, c), np.float32)
    for i in range(n):
        x, y, z = coords[i]
        if valid[i] and 0 <= x < nx and 0 <= y < ny and 0 <= z < nz:
            want[y, x, z] += feats[i]
    np.testing.assert_allclose(out, want.reshape(ny, nx, nz * c),
                               rtol=1e-5, atol=1e-5)


def test_bev_pool_grad_flows():
    feats = jnp.ones((10, 4))
    coords = jnp.zeros((10, 3), jnp.int32)
    g = jax.grad(lambda f: jnp.sum(
        bev_pool(f, coords, jnp.ones(10, bool), 4, 4, 2) ** 2))(feats)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.sum(g)) != 0


def test_swin_shapes():
    from findnpropagate_tpu.models.backbones_image.swin import SwinTransformer

    m = SwinTransformer(model_cfg={"EMBED_DIMS": 16, "DEPTHS": [1, 1, 2],
                                   "NUM_HEADS": [2, 2, 4],
                                   "WINDOW_SIZE": 4, "PATCH_SIZE": 4,
                                   "OUT_INDICES": [0, 1, 2]})
    batch = {"camera_imgs": jnp.zeros((2, 32, 48, 3))}
    vars_ = m.init(jax.random.PRNGKey(0), batch, train=False)
    out = m.apply(vars_, batch, train=False)
    feats = out["image_features"]
    assert [f.shape for f in feats] == [
        (2, 8, 12, 16), (2, 4, 6, 32), (2, 2, 3, 64)]


def test_fpn_shapes():
    from findnpropagate_tpu.models.backbones_image.fpn import GeneralizedLSSFPN

    m = GeneralizedLSSFPN(model_cfg={"OUT_CHANNELS": 24})
    batch = {"image_features": [jnp.zeros((2, 16, 16, 8)),
                                jnp.zeros((2, 8, 8, 16)),
                                jnp.zeros((2, 4, 4, 32))]}
    vars_ = m.init(jax.random.PRNGKey(0), batch, train=False)
    out = m.apply(vars_, batch, train=False,
                  mutable=["batch_stats"])[0]
    assert [f.shape for f in out["image_fpn"]] == [
        (2, 16, 16, 24), (2, 8, 8, 24), (2, 4, 4, 24)]


def test_depth_lss_geometry_center_ray():
    """A frustum point at the principal pixel with depth d must land at
    lidar (d, 0, 0) for a +x-looking camera with identity augs."""
    from findnpropagate_tpu.models.view_transforms.depth_lss import (
        DepthLSSTransform,
    )

    h = w = 32
    fx = float(w)
    K = np.eye(4, dtype=np.float32)
    K[:3, :3] = np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1]])
    c2l = np.eye(4, dtype=np.float32)
    c2l[:3, :3] = np.array([[0, 0, 1.0], [-1, 0, 0], [0, -1, 0]])
    m = DepthLSSTransform(model_cfg={
        "IN_CHANNEL": 8, "OUT_CHANNEL": 4,
        "IMAGE_SIZE": [h, w], "FEATURE_SIZE": [8, 8],
        "XBOUND": [-10, 10, 0.5], "YBOUND": [-10, 10, 0.5],
        "ZBOUND": [-4, 4, 8.0], "DBOUND": [1.0, 9.0, 1.0],
        "DOWNSAMPLE": 1,
    })
    geom = m.bind({}).get_geometry(
        jnp.asarray(c2l), jnp.asarray(K), jnp.eye(4), jnp.eye(4))
    # (D, fH, fW, 3); the frustum grid linspace(0, 31, 8) hits u=v at
    # indices mapping closest to the principal point between cells 3/4
    d_idx = 3   # depth bin 1.0 + 3 = 4.0
    g = np.asarray(geom)[d_idx]
    # interpolate the center: average the 4 central feature cells
    ctr = g[3:5, 3:5].mean(axis=(0, 1))
    np.testing.assert_allclose(ctr, [4.0, 0.0, 0.0], atol=0.35)


BEVFUSION_CFG = EDict({
    "NAME": "BevFusion",
    "VFE": {"NAME": "MeanVFE"},
    "BACKBONE_3D": {"NAME": "VoxelBackBone8x",
                    "CHANNELS": [4, 8, 8, 16, 16], "OUT_CHANNELS": 16,
                    "SUBM_MODE": "windowed", "DENSE_FROM_LEVEL": 2,
                    "WINDOWED_BLOCK": 128, "WINDOWED_WINDOW": 512},
    "MAP_TO_BEV": {"NAME": "HeightCompression", "NUM_BEV_FEATURES": 32},
    "IMAGE_BACKBONE": {"NAME": "SwinTransformer", "EMBED_DIMS": 8,
                       "DEPTHS": [1, 1], "NUM_HEADS": [2, 2],
                       "WINDOW_SIZE": 4, "PATCH_SIZE": 4,
                       "OUT_INDICES": [1]},  # stride 8 = dtransform stride
    "NECK": {"NAME": "GeneralizedLSSFPN", "OUT_CHANNELS": 16},
    "VTRANSFORM": {"NAME": "DepthLSSTransform", "IN_CHANNEL": 16,
                   "OUT_CHANNEL": 8, "IMAGE_SIZE": [64, 64],
                   "FEATURE_SIZE": [8, 8],
                   "XBOUND": [-12.8, 12.8, 0.8],
                   "YBOUND": [-12.8, 12.8, 0.8],
                   "ZBOUND": [-4, 4, 8.0],
                   "DBOUND": [1.0, 13.0, 1.5], "DOWNSAMPLE": 1},
    "FUSER": {"NAME": "ConvFuser", "OUT_CHANNEL": 32},
    "BACKBONE_2D": {"NAME": "BaseBEVBackbone", "LAYER_NUMS": [2],
                    "LAYER_STRIDES": [1], "NUM_FILTERS": [32],
                    "UPSAMPLE_STRIDES": [1], "NUM_UPSAMPLE_FILTERS": [32]},
    "DENSE_HEAD": {
        "NAME": "CenterHead",
        "CLASS_AGNOSTIC": False,
        "SHARED_CONV_CHANNEL": 32,
        "USE_BIAS_BEFORE_NORM": True,
        "NUM_HM_CONV": 2,
        "SEPARATE_HEAD_CFG": {
            "HEAD_ORDER": ["center", "center_z", "dim", "rot"],
            "HEAD_DICT": {
                "center": {"out_channels": 2, "num_conv": 2},
                "center_z": {"out_channels": 1, "num_conv": 2},
                "dim": {"out_channels": 3, "num_conv": 2},
                "rot": {"out_channels": 2, "num_conv": 2},
            },
        },
        "TARGET_ASSIGNER_CONFIG": {"FEATURE_MAP_STRIDE": 8,
                                   "NUM_MAX_OBJS": 500,
                                   "GAUSSIAN_OVERLAP": 0.1, "MIN_RADIUS": 2},
        "LOSS_CONFIG": {"LOSS_WEIGHTS": {"cls_weight": 1.0,
                                         "loc_weight": 2.0,
                                         "code_weights": [1.0] * 8}},
        "POST_PROCESSING": {
            "SCORE_THRESH": 0.1,
            "POST_CENTER_LIMIT_RANGE": [-15, -15, -10, 15, 15, 10],
            "MAX_OBJ_PER_SAMPLE": 100,
            "NMS_CONFIG": {"NMS_TYPE": "nms_bev", "NMS_THRESH": 0.2,
                           "NMS_PRE_MAXSIZE": 100, "NMS_POST_MAXSIZE": 32},
        },
    },
    "POST_PROCESSING": {"RECALL_THRESH_LIST": [0.3, 0.5, 0.7],
                        "SCORE_THRESH": 0.1},
})

DATA_CFG = EDict({
    "DATASET": "SyntheticDataset",
    "POINT_CLOUD_RANGE": [-12.8, -12.8, -3.0, 12.8, 12.8, 1.0],
    "SYNTHETIC": {"NUM_SCENES": 4, "NUM_OBJECTS": 6, "NUM_RAW_POINTS": 3000,
                  "CAMERA": {"NUM": 2, "IMAGE_SIZE": [64, 64]}},
    "CAPACITIES": {"MAX_POINTS": 4000, "MAX_GT": 16, "MAX_VOXELS": 4096,
                   "MAX_POINTS_PER_VOXEL": 8},
    "POINT_FEATURE_ENCODING": {
        "encoding_type": "absolute_coordinates_encoding",
        "used_feature_list": ["x", "y", "z", "intensity"],
        "src_feature_list": ["x", "y", "z", "intensity"],
    },
    "DATA_PROCESSOR": [
        {"NAME": "mask_points_and_boxes_outside_range",
         "REMOVE_OUTSIDE_BOXES": True},
        {"NAME": "transform_points_to_voxels",
         "VOXEL_SIZE": [0.2, 0.2, 0.1]},
    ],
})


def test_bevfusion_e2e():
    from findnpropagate_tpu.datasets import build_dataloader
    from findnpropagate_tpu.models import build_network
    from findnpropagate_tpu.runtime.optimization import build_optimizer
    from findnpropagate_tpu.runtime.trainer import (
        create_train_state,
        make_train_step,
    )

    ds, loader, _ = build_dataloader(
        copy.deepcopy(DATA_CFG), ["Car", "Pedestrian"], batch_size=2,
        training=True)
    det = build_network(copy.deepcopy(BEVFUSION_CFG), num_class=2, dataset=ds)
    batch = next(iter(loader))
    batch.pop("frame_id")
    batch.pop("batch_size")
    assert batch["camera_imgs"].shape == (2, 2, 64, 64, 3)
    variables = det.init(jax.random.PRNGKey(0), batch)
    out = det.apply(variables, batch, train=False)
    assert "spatial_features_img" in out
    dets = det.post_process(out)
    assert dets.boxes.shape[0] == 2

    tx, _ = build_optimizer(
        EDict({"OPTIMIZER": "adam", "LR": 0.002, "WEIGHT_DECAY": 0.0,
               "GRAD_NORM_CLIP": 10.0}), 100)
    state = create_train_state(det, batch, tx, jax.random.PRNGKey(0))
    step = make_train_step(det, tx, donate=False)
    losses = []
    for _ in range(6):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
