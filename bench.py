"""Benchmark: nuScenes-scale throughput on the available chip.

Prints one JSON line per metric; the PRIMARY metric (TransFusion-LiDAR
inference scans/sec) is printed LAST so drivers that record the final line
keep the round-over-round comparison, with the auxiliary numbers embedded in
it as extra keys.

Metrics (BASELINE.md north star = inference + seeker extraction):
  * transfusion_lidar_nuscenes_inference — full deploy path (300k-point
    device voxelization -> windowed/Pallas sparse backbone -> BEV ->
    TransFusion decode) at a saturating batch (default 32). vs_baseline
    divides by 37.5 scans/s (3x a ~80 ms/scan A100 assumption).
  * seeker_extraction — Greedy Box Seeker (FrustumProposerOG.propose) at
    nuScenes scale (200k points, 96 cached 2D detections, 6 cameras),
    frames/sec.
  * train_step — full jitted training step (Hungarian assignment, losses,
    value_and_grad, adam update) scans/sec at the training batch (default 4).

TRUTH PROTOCOL (PERF.md): the axon relay memoizes executions BY INPUT VALUE;
every timed iteration perturbs its inputs multiplicatively (~1e-3, above
f32 ulp) with an iteration-indexed term, the returned scalar consumes every
stage's output, and we sync per iteration taking the median.

Parameters are materialized via eval_shape + random values — weight values
don't affect throughput, and a real init would add ~20 min of remote
compile.
"""

from __future__ import annotations

import json
import time


def _chain_times(fn, state0, iters=10):
    s = state0
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        s = fn(s, i)
        float(s)
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def _random_variables(det, batch, train=False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    shapes = jax.eval_shape(
        lambda b: det.init(jax.random.PRNGKey(0), b), batch
    )
    rng = np.random.RandomState(0)

    def mat(s):
        if s.dtype == jnp.float32:
            return jnp.asarray(
                rng.standard_normal(s.shape).astype(np.float32) * 0.05)
        return jnp.zeros(s.shape, s.dtype)

    out = jax.tree.map(mat, shapes)
    # batch_stats sanity: zero BN variances amplify ~300x per conv and the
    # activations overflow bf16 to nan — a nan chain scalar then makes
    # every timed iteration's input identical, and the relay REPLAYS the
    # memoized execution (truth-protocol violation, PERF.md round 5:
    # measured a fake 66 ms "latency" vs the true ~134 ms). Unit variances
    # + zero means keep the random-weight forward finite.
    if "batch_stats" in out:
        def stats(path, leaf):
            name = path[-1].key if hasattr(path[-1], "key") else ""
            if leaf.dtype == jnp.float32 and name == "var":
                return jnp.ones_like(leaf)
            if leaf.dtype == jnp.float32 and name == "mean":
                return jnp.zeros_like(leaf)
            return leaf
        out["batch_stats"] = jax.tree_util.tree_map_with_path(
            stats, out["batch_stats"])
    return out


def build_transfusion_bench(batch_size: int = 1, training: bool = False):
    import jax

    from findnpropagate_tpu.config import EDict, cfg_from_yaml_file
    from findnpropagate_tpu.datasets import build_dataloader
    from findnpropagate_tpu.models import build_network

    cfg = cfg_from_yaml_file("tools/cfgs/nuscenes_models/transfusion_lidar.yaml")
    import os

    # perf-experiment overrides, e.g.
    #   BENCH_SET="MODEL.BACKBONE_3D.TAP_WINDOW=1280,MODEL.BACKBONE_3D.WINDOWED_BLOCK=512"
    # semicolons separate pairs when values contain commas (per-level lists):
    #   BENCH_SET="MODEL.BACKBONE_3D.TAP_WINDOW=[768,1536,1536];..."
    bench_set = os.environ.get("BENCH_SET", "")
    sep = ";" if ";" in bench_set or "[" in bench_set else ","
    for kv in filter(None, bench_set.split(sep)):
        key, val = kv.split("=")
        node = cfg
        parts = key.split(".")
        for part in parts[:-1]:
            node = node[part]
        try:
            import ast

            val = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            pass
        node[parts[-1]] = val
        print(f"BENCH_SET: {key} = {val}")
    data_cfg = EDict({
        "DATASET": "SyntheticDataset",
        "POINT_CLOUD_RANGE": cfg.DATA_CONFIG.POINT_CLOUD_RANGE,
        # PATTERN lidar_ring (r5, recalibrated): urban-canyon skyline,
        # fixed azimuth grid + city-speed ego so the 10-sweep aggregate
        # clusters like real data (L1 ~0.8-1.1x L0 vs the 1.6x dilation
        # of the first ring generator). L0 ~85-110k under the 120k cap;
        # LEVEL_CAPACITIES in the flagship yaml are sized to the TRUE
        # L1/L2 receptive-field sets (no silent rank-select truncation);
        # the active_voxels_per_level telemetry audits this per run.
        "SYNTHETIC": {"NUM_SCENES": max(2, batch_size), "NUM_OBJECTS": 40,
                      "NUM_RAW_POINTS": 200000, "PATTERN": "lidar_ring"},
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
        data_cfg, cfg.CLASS_NAMES, batch_size=batch_size, training=training
    )
    det = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=ds)
    batch = next(iter(loader))
    batch.pop("frame_id", None)
    batch.pop("batch_size", None)
    variables = _random_variables(det, batch)
    return det, variables, batch


def bench_inference(batch_size: int, iters: int = 10):
    import jax
    import jax.numpy as jnp

    det, variables, batch = build_transfusion_bench(batch_size)
    batch = jax.device_put(batch)

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
    float(s)
    per_batch = _chain_times(
        lambda s, i: infer_chain(variables, batch, s + jnp.float32(i) * 0.013),
        s, iters)

    # occupancy audit (VERDICT r2): sparse throughput depends on per-level
    # active counts; report them so the synthetic proxy is checkable
    # against real nuScenes sweeps (~60k/55k/27k/13k at batch 1). The
    # window-overflow counter MUST be zero — a non-zero value means the
    # configured per-level windows truncate real neighbor spans and every
    # perf number is measuring wrong activations.
    counts, overflow = None, None
    try:
        out = jax.jit(lambda v, b: (
            det.apply(v, b, train=False)["sparse_active_counts"],
            det.apply(v, b, train=False).get("sparse_window_overflow", -1),
        ))(variables, batch)
        counts = [int(c) // batch_size for c in out[0]]
        overflow = int(out[1])
        if overflow != 0:
            print(json.dumps({"warning": "sparse_window_overflow",
                              "value": overflow}))
    except Exception:
        pass
    return batch_size / per_batch, counts, overflow


def bench_train(batch_size: int, iters: int = 6, accum_steps: int = 1):
    import jax
    import jax.numpy as jnp

    from findnpropagate_tpu.config import EDict
    from findnpropagate_tpu.runtime.optimization import build_optimizer
    from findnpropagate_tpu.runtime.trainer import make_train_step

    det, variables, batch = build_transfusion_bench(batch_size, training=True)
    batch = jax.device_put(batch)
    tx, _ = build_optimizer(
        EDict({"OPTIMIZER": "adam", "LR": 1e-4, "WEIGHT_DECAY": 0.0,
               "GRAD_NORM_CLIP": 10.0}), 1000)
    from findnpropagate_tpu.runtime.trainer import TrainState

    params = variables["params"]
    state = TrainState(jnp.zeros((), jnp.int32), params,
                       variables.get("batch_stats", {}), tx.init(params))
    step = make_train_step(det, tx, donate=False, accum_steps=accum_steps)

    def chain(s, i):
        nonlocal state
        b = dict(batch)
        b["points"] = b["points"] * (1.0 + (s % 1.0) * 1e-3
                                     + jnp.float32(i) * 1e-5)
        state, metrics = step(state, b)
        return jnp.nan_to_num(metrics["loss"], nan=0.21) % 1.0

    s0 = chain(jnp.float32(0.123), 0)
    float(s0)
    per_batch = _chain_times(chain, s0, iters)
    return batch_size / per_batch


def bench_latency(chain_len: int = 8, iters: int = 6):
    """Device-side batch-1 latency: one execution runs `chain_len`
    SEQUENTIAL forwards, each consuming the previous link's scalar in its
    input perturbation (no replay, no DCE), so the per-execution relay/
    dispatch overhead is amortized out and the per-link time approximates
    true on-chip latency."""
    import jax
    import jax.numpy as jnp

    det, variables, batch = build_transfusion_bench(1)
    batch = jax.device_put(batch)

    # exactness audit: the windowed-conv overflow counter must be zero or
    # the measured program silently dropped neighbors (wrong activations)
    ovf = int(jax.jit(
        lambda v, b: det.apply(v, dict(b), train=False).get(
            "sparse_window_overflow", -1)
    )(variables, batch))
    if ovf > 0:
        print(json.dumps({"warning": "sparse_window_overflow",
                          "value": ovf, "mode": "latency"}))

    @jax.jit
    def chain(variables, batch, seed):
        s = seed
        for i in range(chain_len):
            b = dict(batch)
            b["points"] = b["points"] * (
                1.0 + (s % 1.0) * 1e-3 + jnp.float32(i) * 1e-5)
            out = det.apply(variables, b, train=False)
            d = det.post_process(out)
            s = (jnp.nan_to_num(
                jnp.sum(jnp.abs(d.boxes)) + jnp.sum(jnp.abs(d.scores)),
                nan=0.11) + jnp.sum(d.count).astype(jnp.float32)) % 1.0
        return s

    s = chain(variables, batch, jnp.float32(0.271))
    float(s)
    per_exec = _chain_times(
        lambda s, i: chain(variables, batch, s + jnp.float32(i) * 0.019),
        s, iters)
    return per_exec / chain_len


def bench_seeker(num_dets: int = 96, num_points: int = 200000,
                 iters: int = 10):
    """Greedy Box Seeker frames/sec at nuScenes scale (D cached 2D dets
    across 6 cameras)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from findnpropagate_tpu.openvocab.frustum_proposer import FrustumProposerOG

    class_names = ("car", "truck", "construction_vehicle", "bus", "trailer",
                   "barrier", "motorcycle", "bicycle", "pedestrian",
                   "traffic_cone")
    seeker = FrustumProposerOG(class_names=class_names)
    rng = np.random.RandomState(0)

    # 6-camera nuScenes-style rig (yaw ring)
    l2i, c2l, intr = [], [], []
    K = np.array([[1266.4, 0, 800.0], [0, 1266.4, 450.0], [0, 0, 1.0]])
    for ci in range(6):
        yaw = ci * np.pi / 3
        R_c2l = np.array([
            [0, 0, 1.0], [-1, 0, 0], [0, -1, 0]
        ])
        rot = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                        [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1.0]])
        c2l_i = np.eye(4)
        c2l_i[:3, :3] = rot @ R_c2l
        l2c = np.linalg.inv(c2l_i)
        l2i_i = np.eye(4)
        l2i_i[:3, :3] = K @ l2c[:3, :3]
        l2i_i[:3, 3] = K @ l2c[:3, 3]
        intr_i = np.eye(4)
        intr_i[:3, :3] = K
        l2i.append(l2i_i)
        c2l.append(c2l_i)
        intr.append(intr_i)
    l2i = jnp.asarray(np.stack(l2i), jnp.float32)
    c2l = jnp.asarray(np.stack(c2l), jnp.float32)
    intr = jnp.asarray(np.stack(intr), jnp.float32)

    pts = rng.uniform(-54, 54, (num_points, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-3, 1, num_points)
    det_boxes = np.zeros((num_dets, 4), np.float32)
    det_boxes[:, 0] = rng.uniform(0, 1400, num_dets)
    det_boxes[:, 1] = rng.uniform(0, 700, num_dets)
    det_boxes[:, 2] = det_boxes[:, 0] + rng.uniform(40, 200, num_dets)
    det_boxes[:, 3] = det_boxes[:, 1] + rng.uniform(40, 200, num_dets)
    det_labels = rng.randint(1, 11, num_dets).astype(np.int32)
    det_scores = rng.uniform(0.2, 1.0, num_dets).astype(np.float32)
    det_cams = rng.randint(0, 6, num_dets).astype(np.int32)

    @jax.jit
    def seek_chain(pts_j, seed):
        p = pts_j * (1.0 + (seed % 1.0) * 1e-3)
        out = seeker.propose(
            p, jnp.ones(num_points, bool),
            jnp.asarray(det_boxes), jnp.asarray(det_labels),
            jnp.asarray(det_scores), jnp.asarray(det_cams),
            jnp.ones(num_dets, bool), l2i, c2l, intr,
        )
        return (jnp.nan_to_num(jnp.sum(jnp.abs(out.boxes)), nan=0.3)
                + jnp.sum(out.valid)) % 1.0

    pts_j = jnp.asarray(pts)
    s = seek_chain(pts_j, jnp.float32(0.321))
    float(s)
    per_frame = _chain_times(
        lambda s, i: seek_chain(pts_j, s + jnp.float32(i) * 0.017), s, iters)
    return 1.0 / per_frame


def main():
    import argparse

    ap = argparse.ArgumentParser()
    # batch 8 measured throughput-optimal on v5e (PERF.md r4s1 sweep:
    # 7.15 @ 4, 9.47 @ 8, 9.39 @ 16, 8.2 @ 32 — per-scan work dominates,
    # HBM pressure degrades 32)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--train_batch_size", type=int, default=4)
    ap.add_argument("--train_accum", type=int, default=2)
    # a FLAT batch-4 train program crashes the axon relay compile helper
    # (HTTP 500); grad accumulation scans 2 microbatches of 2 in one
    # execution — same effective batch, microbatch-sized program
    ap.add_argument("--mode", default="all",
                    choices=["all", "infer", "seeker", "train", "latency"])
    ap.add_argument("--latency_chain", type=int, default=8)
    args, _ = ap.parse_known_args()

    extras = {}
    if args.mode in ("all", "latency"):
        try:
            ms = bench_latency(args.latency_chain) * 1000.0
            extras["latency_ms_per_scan"] = round(ms, 1)
            print(json.dumps({
                "metric": "inference_latency", "value": round(ms, 1),
                "unit": "ms/scan (batch 1, device-side)",
                "vs_baseline": round(80.0 / ms, 3),  # ~80 ms/scan A100
            }))
        except Exception as e:
            print(json.dumps({"metric": "inference_latency",
                              "error": repr(e)[:300]}))
    if args.mode in ("all", "seeker"):
        try:
            v = bench_seeker()
            extras["seeker_frames_per_sec"] = round(v, 2)
            print(json.dumps({
                "metric": "seeker_extraction", "value": round(v, 2),
                "unit": "frames/sec/chip",
                "vs_baseline": round(v / 2.0, 3),  # ~0.5 s/frame GPU python
            }))
        except Exception as e:  # keep the primary metric alive
            print(json.dumps({"metric": "seeker_extraction",
                              "error": repr(e)[:300]}))
    if args.mode in ("all", "train"):
        try:
            v = bench_train(args.train_batch_size,
                            accum_steps=args.train_accum)
            extras["train_scans_per_sec"] = round(v, 2)
            print(json.dumps({
                "metric": "train_step", "value": round(v, 2),
                "unit": "scans/sec/chip",
                "vs_baseline": round(v / 10.0, 3),  # ~10 scans/s A100 train
                "batch_size": args.train_batch_size,
                "accum_steps": args.train_accum,
            }))
        except Exception as e:
            print(json.dumps({"metric": "train_step", "error": repr(e)[:300]}))
    if args.mode in ("all", "infer"):
        # The primary metric line must ALWAYS print (the driver records the
        # last JSON line) — round 3 lost its whole record to one OOM here.
        try:
            v, counts, overflow = bench_inference(args.batch_size)
            if counts is not None:
                extras["active_voxels_per_level"] = counts
            if overflow is not None:
                extras["window_overflow"] = overflow
            print(json.dumps({
                "metric": "transfusion_lidar_nuscenes_inference",
                "value": round(v, 2),
                "unit": "scans/sec/chip",
                "vs_baseline": round(v / 37.5, 3),
                "batch_size": args.batch_size,
                **extras,
            }))
        except Exception as e:
            print(json.dumps({
                "metric": "transfusion_lidar_nuscenes_inference",
                "value": 0.0, "unit": "scans/sec/chip", "vs_baseline": 0.0,
                "batch_size": args.batch_size,
                "error": repr(e)[:300], **extras,
            }))


if __name__ == "__main__":
    main()
