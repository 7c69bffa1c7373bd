"""Benchmark: detector inference scans/sec on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline context (BASELINE.md): the reference publishes no speed numbers;
the driver's north star is TransFusion-LiDAR scans/sec on nuScenes-scale
inputs at >= 3x an A100's ~20 scans/sec (OpenPCDet TransFusion-L inference
is ~50ms/scan on A100-class GPUs). vs_baseline is therefore scans_per_sec /
60.0 (3x-A100 target == 1.0). Current flagship on the bench is the
PointPillar pipeline at nuScenes-like scale until the sparse TransFusion
stack lands (round 1).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax

    from findnpropagate_tpu.config import EDict
    from findnpropagate_tpu.datasets import build_dataloader
    from findnpropagate_tpu.models import build_network

    # nuScenes-like scale: 51.2m range, 0.2m pillars -> 512x512 grid
    data_cfg = EDict({
        "DATASET": "SyntheticDataset",
        "POINT_CLOUD_RANGE": [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0],
        "SYNTHETIC": {"NUM_SCENES": 4, "NUM_OBJECTS": 40,
                      "NUM_RAW_POINTS": 120000},
        "CAPACITIES": {"MAX_POINTS": 140000, "MAX_GT": 128,
                       "MAX_VOXELS": 60000, "MAX_POINTS_PER_VOXEL": 20},
        "POINT_FEATURE_ENCODING": {
            "encoding_type": "absolute_coordinates_encoding",
            "used_feature_list": ["x", "y", "z", "intensity"],
            "src_feature_list": ["x", "y", "z", "intensity"],
        },
        "DATA_PROCESSOR": [
            {"NAME": "mask_points_and_boxes_outside_range",
             "REMOVE_OUTSIDE_BOXES": True},
            {"NAME": "shuffle_points",
             "SHUFFLE_ENABLED": {"train": False, "test": False}},
            {"NAME": "transform_points_to_voxels", "VOXEL_SIZE": [0.2, 0.2, 8.0]},
        ],
    })
    class_names = ["car", "truck", "bus", "pedestrian", "bicycle"]
    model_cfg = EDict({
        "NAME": "PointPillar",
        "VFE": {"NAME": "PillarVFE", "WITH_DISTANCE": False,
                "USE_ABSLOTE_XYZ": True, "USE_NORM": True, "NUM_FILTERS": [64]},
        "MAP_TO_BEV": {"NAME": "PointPillarScatter", "NUM_BEV_FEATURES": 64},
        "BACKBONE_2D": {"NAME": "BaseBEVBackbone", "LAYER_NUMS": [3, 5, 5],
                        "LAYER_STRIDES": [2, 2, 2],
                        "NUM_FILTERS": [64, 128, 256],
                        "UPSAMPLE_STRIDES": [1, 2, 4],
                        "NUM_UPSAMPLE_FILTERS": [128, 128, 128]},
        "DENSE_HEAD": {
            "NAME": "AnchorHeadSingle",
            "USE_DIRECTION_CLASSIFIER": True,
            "DIR_OFFSET": 0.78539, "DIR_LIMIT_OFFSET": 0.0, "NUM_DIR_BINS": 2,
            "ANCHOR_GENERATOR_CONFIG": [
                {"class_name": n, "anchor_sizes": [[4.6, 1.95, 1.7]],
                 "anchor_rotations": [0, 1.57], "anchor_bottom_heights": [-1.5],
                 "feature_map_stride": 2, "matched_threshold": 0.6,
                 "unmatched_threshold": 0.45}
                for n in class_names
            ],
            "TARGET_ASSIGNER_CONFIG": {"POS_FRACTION": -1.0, "SAMPLE_SIZE": 512,
                                       "NORM_BY_NUM_EXAMPLES": False,
                                       "MATCH_HEIGHT": False},
            "LOSS_CONFIG": {"LOSS_WEIGHTS": {
                "cls_weight": 1.0, "loc_weight": 2.0, "dir_weight": 0.2,
                "code_weights": [1.0] * 7}},
        },
        "POST_PROCESSING": {
            "SCORE_THRESH": 0.1,
            "NMS_CONFIG": {"NMS_THRESH": 0.2, "NMS_PRE_MAXSIZE": 1024,
                           "NMS_POST_MAXSIZE": 256},
        },
    })

    batch_size = 4
    ds, loader, _ = build_dataloader(
        data_cfg, class_names, batch_size=batch_size, training=False
    )
    det = build_network(model_cfg, num_class=len(class_names), dataset=ds)
    batch = next(iter(loader))
    batch.pop("frame_id", None)
    batch.pop("batch_size", None)
    variables = det.init(jax.random.PRNGKey(0), batch)

    import functools

    @jax.jit
    def infer(variables, batch):
        out = det.apply(variables, batch, train=False)
        dets = det.post_process(out)
        return dets.boxes, dets.scores, dets.labels, dets.count

    # warmup / compile
    out = infer(variables, batch)
    jax.block_until_ready(out)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(variables, batch)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    scans_per_sec = iters * batch_size / dt

    result = {
        "metric": "pointpillar_nusc_scale_inference",
        "value": round(scans_per_sec, 2),
        "unit": "scans/sec/chip",
        "vs_baseline": round(scans_per_sec / 60.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
