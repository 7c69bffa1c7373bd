"""Benchmark: TransFusion-LiDAR inference scans/sec on the available chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

North star (BASELINE.md / BASELINE.json): TransFusion-LiDAR inference on
nuScenes-scale inputs at >= 3x A100 scans/sec on TPU. The reference publishes
no speed numbers; an A100 runs OpenPCDet TransFusion-L (spconv, voxel 0.075,
1440x1440x41 grid) at roughly 80 ms/scan ~= 12.5 scans/sec, so the 3x target
is 37.5 scans/sec and vs_baseline = scans_per_sec / 37.5.

The measured program is the FULL deploy path on device: 300k-point
voxelization -> sparse VoxelResBackBone8x (windowed Pallas sparse convs)
-> HeightCompression -> BEV backbone -> TransFusion decoder -> box decode,
single chip. Throughput is measured at a saturating batch size (default 32):
per-execution overhead on this relay is ~0.48 s regardless of batch, so
per-scan marginal device cost is what the batch amortizes — exactly the
serving configuration the scans/sec metric describes. `--batch_size 1`
measures the latency configuration instead.

Parameters are materialized via eval_shape (zeros) — weight values don't
affect throughput, and a real init would add ~20 min of compile on the
remote-compile TPU path.
"""

from __future__ import annotations

import json
import time


def build_transfusion_bench(batch_size: int = 1):
    import jax
    import jax.numpy as jnp

    from findnpropagate_tpu.config import EDict, cfg_from_yaml_file
    from findnpropagate_tpu.datasets import build_dataloader
    from findnpropagate_tpu.models import build_network

    cfg = cfg_from_yaml_file("tools/cfgs/nuscenes_models/transfusion_lidar.yaml")
    data_cfg = EDict({
        "DATASET": "SyntheticDataset",
        "POINT_CLOUD_RANGE": cfg.DATA_CONFIG.POINT_CLOUD_RANGE,
        "SYNTHETIC": {"NUM_SCENES": 2, "NUM_OBJECTS": 40,
                      "NUM_RAW_POINTS": 250000},
        "CAPACITIES": dict(cfg.DATA_CONFIG.CAPACITIES),
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
            {"NAME": "transform_points_to_voxels",
             "VOXEL_SIZE": [0.075, 0.075, 0.2]},
        ],
    })
    ds, loader, _ = build_dataloader(
        data_cfg, cfg.CLASS_NAMES, batch_size=batch_size, training=False
    )
    det = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=ds)
    batch = next(iter(loader))
    batch.pop("frame_id", None)
    batch.pop("batch_size", None)

    shapes = jax.eval_shape(
        lambda b: det.init(jax.random.PRNGKey(0), b), batch
    )
    # random (non-degenerate) weights without paying the full init compile;
    # values don't affect throughput but must not be foldable/trivial
    import numpy as np

    rng = np.random.RandomState(0)

    def mat(s):
        if s.dtype == jnp.float32:
            return jnp.asarray(
                rng.standard_normal(s.shape).astype(np.float32) * 0.05)
        return jnp.zeros(s.shape, s.dtype)

    variables = jax.tree.map(mat, shapes)
    return det, variables, batch


def main():
    import argparse
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=32,
                    help="throughput batch; scans/sec is reported per chip")
    args, _ = ap.parse_known_args()
    batch_size = args.batch_size
    det, variables, batch = build_transfusion_bench(batch_size)

    import jax.numpy as jnp

    batch = jax.device_put(batch)

    # TRUTH PROTOCOL (PERF.md round-2): the axon relay memoizes repeated
    # executions BY INPUT VALUE and replays cost ~0.5 s, so a chain that
    # reaches a fixed point measures replay, not compute. Requirements:
    #  1. the seed perturbs the points MULTIPLICATIVELY at ~1e-3 (above
    #     f32 ulp) so every downstream value changes;
    #  2. an iteration-indexed term keeps the input fresh even if the
    #     chained value converges;
    #  3. the returned scalar consumes the FULL graph (features + boxes +
    #     scores + counts) so XLA cannot dead-code-eliminate stages;
    #  4. per-iteration sync, median over iterations.
    @jax.jit
    def infer_chain(variables, batch, seed):
        b = dict(batch)
        b["points"] = b["points"] * (1.0 + (seed % 1.0) * 1e-3)
        out = det.apply(variables, b, train=False)
        d = det.post_process(out)
        vf = jnp.nan_to_num(
            jnp.mean(jnp.abs(out["voxel_features"]).astype(jnp.float32)),
            nan=0.37)
        bx = jnp.nan_to_num(
            jnp.sum(jnp.abs(d.boxes)) + jnp.sum(jnp.abs(d.scores))
            + jnp.sum(d.count).astype(jnp.float32), nan=0.11)
        return vf % 1.0 + (bx % 7.0) * 1e-6

    s = infer_chain(variables, batch, jnp.float32(0.12345))
    float(s)  # compile + warm
    iters = 10
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        s = infer_chain(variables, batch, s + jnp.float32(i) * 0.013)
        float(s)
        times.append(time.perf_counter() - t0)
    per_batch = sorted(times)[len(times) // 2]
    scans_per_sec = batch_size / per_batch

    print(json.dumps({
        "metric": "transfusion_lidar_nuscenes_inference",
        "value": round(scans_per_sec, 2),
        "unit": "scans/sec/chip",
        "vs_baseline": round(scans_per_sec / 37.5, 3),
        "batch_size": batch_size,
    }))


if __name__ == "__main__":
    main()
