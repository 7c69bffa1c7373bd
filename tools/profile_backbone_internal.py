"""Micro-profile the ACTUAL sparse backbone internals at batch-1 flagship
scale on the real chip: win_entry sort, each subm group, each downsample
(split into active-set build vs strided conv), and the dense tail —
chained timing per PERF.md. Uses module.bind to drive the internal
methods with the real trained-shape params and the real bench scene.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def chain(fn, *args, iters=6):
    s = fn(jnp.float32(0.0), *args)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    s = fn(jnp.float32(1.0), *args)
    jax.block_until_ready(s)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    s = jnp.float32(0.5)
    for _ in range(iters):
        s = fn(s, *args)
    jax.block_until_ready(s)
    tn = time.perf_counter() - t0
    return (tn - t1) / (iters - 1) * 1000.0


def consume(tree):
    leaves = [x for x in jax.tree.leaves(tree)
              if hasattr(x, "dtype") and
              jnp.issubdtype(x.dtype, jnp.floating)]
    return sum(jnp.sum(jnp.abs(x).astype(jnp.float32)) % 1000.0
               for x in leaves)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    args, _ = ap.parse_known_args()

    from bench import build_transfusion_bench

    det, variables, batch = build_transfusion_bench(args.batch)
    batch = jax.device_put(batch)

    # run voxelize+vfe once to get the backbone input
    @jax.jit
    def to_bb_input(variables, batch):
        b = det.apply(variables, dict(batch), train=False, upto=1)
        return b["voxel_features"], b["voxel_coords"], b["voxel_mask"]

    feats0, coords0, mask0 = jax.block_until_ready(
        to_bb_input(variables, batch))
    print("bb input:", feats0.shape, flush=True)

    bb = det.module.bind(variables).backbone_3d  # static attrs only

    def bound(fn):
        """fn(bb_bound, s, ...) -> scalar; returns jitted chained fn."""
        @jax.jit
        def run(s, *args):
            m = det.module.bind(variables).backbone_3d
            return fn(m, s, *args)
        return run

    s1, s2, s3, s4, s_out = bb.level_shapes

    # 1. win_entry (sort + pad)
    def f_entry(m, s):
        lv = m._win_entry(coords0, mask0, feats0 + s * 1e-7, s1, [])
        return consume(lv[1][3])
    t = chain(bound(f_entry))
    print(f"win_entry (sort+pad)      : {t:7.1f} ms", flush=True)

    # materialize the entry level once for downstream timings
    @jax.jit
    def entry(feats):
        m = det.module.bind(variables).backbone_3d
        lv = m._win_entry(coords0, mask0, feats, s1, [])
        return lv[1]
    e_ids, e_coords, e_valid, e_feats = jax.block_until_ready(entry(feats0))
    lvl0 = ("win", (e_ids, e_coords, e_valid, e_feats), s1)

    # 2. input subm + blocks1 (5 subm convs at L0)
    def f_l0(m, s):
        lv = ("win", (e_ids, e_coords, e_valid, e_feats + s * 1e-7), s1)
        lv = m._subm(lv, m.w_input, m.bn_input, False, [])
        lv = m._blocks(m.blocks1, lv, False, [])
        return consume(lv[1][3])
    t = chain(bound(f_l0))
    print(f"L0 subm x5 (C16)          : {t:7.1f} ms", flush=True)

    @jax.jit
    def run_l0(feats):
        m = det.module.bind(variables).backbone_3d
        lv = ("win", (e_ids, e_coords, e_valid, feats), s1)
        lv = m._subm(lv, m.w_input, m.bn_input, False, [])
        lv = m._blocks(m.blocks1, lv, False, [])
        return lv[1]
    l0 = jax.block_until_ready(run_l0(e_feats))
    lvl0b = ("win", tuple(l0), s1)

    # 3. down to L1: split active-set build vs strided conv
    from findnpropagate_tpu.ops.sparse_ops import win_downsample

    cap1 = bb.caps[2]
    block = int(bb.model_cfg.get("WINDOWED_BLOCK", 640))
    cap1 = -(-cap1 // block) * block

    def f_ds(m, s):
        oi, oc, ov = jax.vmap(
            lambda c, v: win_downsample(
                c, v, s1, s2, cap1, kernel_size=(3, 3, 3),
                stride=(2, 2, 2), padding=(1, 1, 1)))(
            l0[1], l0[2] & (s < 2.0))
        return jnp.sum(oi) % 1000.0
    t = chain(bound(f_ds))
    print(f"win_downsample L0->L1     : {t:7.1f} ms", flush=True)

    def f_down1(m, s):
        lv = ("win", (l0[0], l0[1], l0[2], l0[3] + s * 1e-7), s1)
        lv = m._down(lv, m.blocks2["down"], m.blocks2["down_bn"], False,
                     s2, bb.caps[2], [], padding=(1, 1, 1))
        return consume(lv[1][3])
    t = chain(bound(f_down1))
    print(f"down L0->L1 (full)        : {t:7.1f} ms", flush=True)

    @jax.jit
    def run_down1(feats):
        m = det.module.bind(variables).backbone_3d
        lv = ("win", (l0[0], l0[1], l0[2], feats), s1)
        lv = m._down(lv, m.blocks2["down"], m.blocks2["down_bn"], False,
                     s2, bb.caps[2], [], padding=(1, 1, 1))
        return lv[1]
    l1d = jax.block_until_ready(run_down1(l0[3]))

    # 4. blocks2 (4 subm at L1)
    def f_l1(m, s):
        lv = ("win", (l1d[0], l1d[1], l1d[2], l1d[3] + s * 1e-7), s2)
        lv = m._blocks(m.blocks2, lv, False, [])
        return consume(lv[1][3])
    t = chain(bound(f_l1))
    print(f"L1 subm x4 (C32)          : {t:7.1f} ms", flush=True)

    @jax.jit
    def run_l1(feats):
        m = det.module.bind(variables).backbone_3d
        lv = ("win", (l1d[0], l1d[1], l1d[2], feats), s2)
        lv = m._blocks(m.blocks2, lv, False, [])
        return lv[1]
    l1 = jax.block_until_ready(run_l1(l1d[3]))

    # 5. down to L2 + blocks3
    def f_down2(m, s):
        lv = ("win", (l1[0], l1[1], l1[2], l1[3] + s * 1e-7), s2)
        lv = m._down(lv, m.blocks3["down"], m.blocks3["down_bn"], False,
                     s3, bb.caps[3], [], padding=(1, 1, 1))
        return consume(lv[1][3])
    t = chain(bound(f_down2))
    print(f"down L1->L2 (full)        : {t:7.1f} ms", flush=True)

    @jax.jit
    def run_down2(feats):
        m = det.module.bind(variables).backbone_3d
        lv = ("win", (l1[0], l1[1], l1[2], feats), s2)
        lv = m._down(lv, m.blocks3["down"], m.blocks3["down_bn"], False,
                     s3, bb.caps[3], [], padding=(1, 1, 1))
        return lv[1]
    l2d = jax.block_until_ready(run_down2(l1[3]))

    def f_l2(m, s):
        lv = ("win", (l2d[0], l2d[1], l2d[2], l2d[3] + s * 1e-7), s3)
        lv = m._blocks(m.blocks3, lv, False, [])
        return consume(lv[1][3])
    t = chain(bound(f_l2))
    print(f"L2 subm x4 (C64)          : {t:7.1f} ms", flush=True)

    @jax.jit
    def run_l2(feats):
        m = det.module.bind(variables).backbone_3d
        lv = ("win", (l2d[0], l2d[1], l2d[2], feats), s3)
        lv = m._blocks(m.blocks3, lv, False, [])
        return lv[1]
    l2 = jax.block_until_ready(run_l2(l2d[3]))

    # 6. dense tail: down to L3 (densify) + blocks4 + out conv
    def f_tail(m, s):
        lv = ("win", (l2[0], l2[1], l2[2], l2[3] + s * 1e-7), s3)
        lv = m._down(lv, m.blocks4["down"], m.blocks4["down_bn"], False,
                     s4, bb.caps[4], [], padding=(0, 1, 1),
                     dense_out=True)
        lv = m._blocks(m.blocks4, lv, False, [])
        lv = m._down(lv, m.w_out, m.bn_out, False, s_out, bb.caps[4], [],
                     kernel=(3, 1, 1), stride=(2, 1, 1), padding=(0, 0, 0),
                     dense_out=True)
        return consume(lv[1])
    t = chain(bound(f_tail))
    print(f"dense tail (L3+L4+out)    : {t:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
