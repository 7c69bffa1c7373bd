"""Reference-checkpoint import: torch `.pth` state dicts -> flax variables.

Maps OpenPCDet/reference parameter names and tensor layouts (reference load
path: pcdet/models/detectors/detector3d_template.py:401-460 under
/root/reference, incl. the spconv v1<->v2 weight-shape adaptation at
:408-419) onto this repo's flax module tree, so the published 94 MB
TransFusion-LiDAR checkpoints can drive accuracy-parity evaluation.

Layout conventions handled:
  * Conv2d OIHW -> flax HWIO
  * ConvTranspose2d (I, O, kh, kw) -> flax ConvTranspose HWIO
  * Conv1d kernel-1 (O, I, 1) and Linear (O, I) -> Dense (I, O)
  * spconv v2 (O, kz, ky, kx, I) and v1 (kz, ky, kx, I, O)
      -> this repo's (K=kz*ky*kx C-order, I, O)
  * MultiheadAttention in_proj/out_proj -> flax q/k/v/out split heads
  * BatchNorm/LayerNorm weight/bias/running stats -> scale/bias/mean/var
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np


# ------------------------------------------------------------- transforms

def t_conv2d(w):
    return np.transpose(w, (2, 3, 1, 0))


def t_deconv2d(w):
    # torch ConvTranspose2d places w[..., a, b] at output offset (a, b);
    # flax/lax conv_transpose correlates the (input-dilated) signal with the
    # kernel, i.e. the SPATIALLY FLIPPED convention — verified numerically
    # in tests/test_ckpt_import.py
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()


def t_dense(w):
    if w.ndim == 3:  # Conv1d kernel-1
        w = w[:, :, 0]
    return np.transpose(w, (1, 0))


def t_spconv(w):
    if w.ndim != 5:
        raise ValueError(f"spconv weight must be 5D, got {w.shape}")
    # v2: (O, kz, ky, kx, I); v1: (kz, ky, kx, I, O)
    if w.shape[0] < w.shape[1] or True:
        pass
    # Disambiguate by assuming kernel dims <= 3 < channel dims is unreliable
    # for tiny nets; prefer v2 when the first axis equals the last-but-one of
    # nothing — use explicit heuristic: kernel dims are all equal and small.
    k_dims_v2 = w.shape[1:4]
    k_dims_v1 = w.shape[0:3]
    if all(d <= 7 for d in k_dims_v2) and not all(d <= 7 for d in k_dims_v1):
        v2 = True
    elif all(d <= 7 for d in k_dims_v1) and not all(d <= 7 for d in k_dims_v2):
        v2 = False
    else:
        # both plausible (e.g. tiny channels): spconv2 checkpoints dominate
        v2 = True
    if v2:
        o = w.shape[0]
        w = np.transpose(w, (1, 2, 3, 4, 0))  # (kz, ky, kx, I, O)
    k = int(np.prod(w.shape[:3]))
    return w.reshape(k, w.shape[3], w.shape[4])


def t_identity(w):
    return w


def make_attn_transforms(num_heads):
    def split_qkv(which):
        def f(w):
            d = w.shape[-1] if w.ndim == 2 else w.shape[0] // 3
            d = w.shape[1] if w.ndim == 2 else w.shape[0] // 3
            i = {"q": 0, "k": 1, "v": 2}[which]
            blk = w[i * d:(i + 1) * d] if w.ndim == 2 else \
                w[i * (w.shape[0] // 3):(i + 1) * (w.shape[0] // 3)]
            if w.ndim == 2:  # (3D, D) weight
                return np.transpose(blk, (1, 0)).reshape(
                    d, num_heads, d // num_heads)
            dd = w.shape[0] // 3  # (3D,) bias
            return blk.reshape(num_heads, dd // num_heads)
        return f

    def out_kernel(w):
        # torch out_proj.weight (D_out, D_in): y = attn @ W.T; flax `out`
        # kernel (H, Dh, D_out) contracts the split D_in axis
        d_out, d_in = w.shape
        return np.transpose(w, (1, 0)).reshape(
            num_heads, d_in // num_heads, d_out)

    return split_qkv, out_kernel


# ------------------------------------------------------------- rule builder

def _bn_rules(torch_prefix, flax_path):
    """BatchNorm/LayerNorm params + running stats."""
    return [
        (f"{torch_prefix}.weight", "params", f"{flax_path}/scale", t_identity),
        (f"{torch_prefix}.bias", "params", f"{flax_path}/bias", t_identity),
        (f"{torch_prefix}.running_mean", "batch_stats", f"{flax_path}/mean",
         t_identity),
        (f"{torch_prefix}.running_var", "batch_stats", f"{flax_path}/var",
         t_identity),
    ]


def transfusion_rules(model_cfg) -> list:
    """(torch_key, collection, flax_path, transform) rules for the
    TransFusion-LiDAR architecture (MeanVFE has no params)."""
    rules = []

    # ---- backbone_3d: VoxelResBackBone8x (spconv_backbone.py:184 ref) ----
    rules += [("backbone_3d.conv_input.0.weight", "params",
               "backbone_3d/w_input/kernel", t_spconv)]
    rules += _bn_rules("backbone_3d.conv_input.1", "backbone_3d/bn_input")
    for s in (1, 2, 3, 4):
        off = 0
        if s >= 2:  # stage opens with post_act_block(SparseConv3d, BN, ReLU)
            rules += [(f"backbone_3d.conv{s}.0.0.weight", "params",
                       f"backbone_3d/blocks{s}_down/kernel", t_spconv)]
            rules += _bn_rules(f"backbone_3d.conv{s}.0.1",
                               f"backbone_3d/blocks{s}_down_bn")
            off = 1
        for b in (0, 1):  # SparseBasicBlocks
            tb = f"backbone_3d.conv{s}.{b + off}"
            fb = f"backbone_3d/blocks{s}_res{b}"
            for cc in ("1", "2"):
                rules += [(f"{tb}.conv{cc}.weight", "params",
                           f"{fb}_conv{cc}/kernel", t_spconv)]
                # reference res blocks may carry bias (USE_BIAS)
                rules += [(f"{tb}.conv{cc}.bias", "params",
                           f"{fb}_conv{cc}/bias", t_identity)]
                rules += _bn_rules(f"{tb}.bn{cc}", f"{fb}_bn{cc}")
    rules += [("backbone_3d.conv_out.0.weight", "params",
               "backbone_3d/w_out/kernel", t_spconv)]
    rules += _bn_rules("backbone_3d.conv_out.1", "backbone_3d/bn_out")

    # ---- backbone_2d: BaseBEVBackbone (base_bev_backbone.py:28-76 ref) ---
    bev = model_cfg.get("BACKBONE_2D", {})
    layer_nums = list(bev.get("LAYER_NUMS", []))
    for i, n in enumerate(layer_nums):
        rules += [(f"backbone_2d.blocks.{i}.1.weight", "params",
                   f"backbone_2d/block{i}_down/Conv_0/kernel", t_conv2d)]
        rules += _bn_rules(f"backbone_2d.blocks.{i}.2",
                           f"backbone_2d/block{i}_down/BatchNorm_0")
        for j in range(n):
            rules += [(f"backbone_2d.blocks.{i}.{4 + 3 * j}.weight", "params",
                       f"backbone_2d/block{i}_conv{j}/Conv_0/kernel",
                       t_conv2d)]
            rules += _bn_rules(f"backbone_2d.blocks.{i}.{5 + 3 * j}",
                               f"backbone_2d/block{i}_conv{j}/BatchNorm_0")
        up = list(bev.get("UPSAMPLE_STRIDES", []))
        if i < len(up):
            kind = "ConvTranspose_0" if float(up[i]) >= 1 else "Conv_0"
            tr = t_deconv2d if float(up[i]) >= 1 else t_conv2d
            rules += [(f"backbone_2d.deblocks.{i}.0.weight", "params",
                       f"backbone_2d/deblock{i}/{kind}/kernel", tr)]
            rules += _bn_rules(f"backbone_2d.deblocks.{i}.1",
                               f"backbone_2d/deblock{i}/BatchNorm_0")

    # ---- dense_head: TransFusionHead (transfusion_head.py:58 ref) --------
    h = "dense_head"
    rules += [
        (f"{h}.shared_conv.weight", "params", f"{h}/shared_conv/kernel",
         t_conv2d),
        (f"{h}.shared_conv.bias", "params", f"{h}/shared_conv/bias",
         t_identity),
        (f"{h}.heatmap_head.0.conv.weight", "params",
         f"{h}/hm_block_conv/kernel", t_conv2d),
        (f"{h}.heatmap_head.0.conv.bias", "params",
         f"{h}/hm_block_conv/bias", t_identity),
        (f"{h}.heatmap_head.1.weight", "params", f"{h}/hm_out/kernel",
         t_conv2d),
        (f"{h}.heatmap_head.1.bias", "params", f"{h}/hm_out/bias",
         t_identity),
        (f"{h}.class_encoding.weight", "params", f"{h}/class_encoding/kernel",
         t_dense),
        (f"{h}.class_encoding.bias", "params", f"{h}/class_encoding/bias",
         t_identity),
    ]
    rules += _bn_rules(f"{h}.heatmap_head.0.bn", f"{h}/hm_block_bn")

    num_heads = int(model_cfg.get("DENSE_HEAD", {}).get("NUM_HEADS", 8))
    split_qkv, out_kernel = make_attn_transforms(num_heads)
    for tname, fname in (("self_attn", "self_attn"),
                         ("multihead_attn", "cross_attn")):
        for which in ("q", "k", "v"):
            fq = {"q": "query", "k": "key", "v": "value"}[which]
            rules += [
                (f"{h}.decoder.{tname}.in_proj_weight", "params",
                 f"{h}/decoder/{fname}/{fq}/kernel", split_qkv(which)),
                (f"{h}.decoder.{tname}.in_proj_bias", "params",
                 f"{h}/decoder/{fname}/{fq}/bias", split_qkv(which)),
            ]
        rules += [
            (f"{h}.decoder.{tname}.out_proj.weight", "params",
             f"{h}/decoder/{fname}/out/kernel", out_kernel),
            (f"{h}.decoder.{tname}.out_proj.bias", "params",
             f"{h}/decoder/{fname}/out/bias", t_identity),
        ]
    for i in (1, 2, 3):
        rules += [
            (f"{h}.decoder.norm{i}.weight", "params",
             f"{h}/decoder/norm{i}/scale", t_identity),
            (f"{h}.decoder.norm{i}.bias", "params",
             f"{h}/decoder/norm{i}/bias", t_identity),
        ]
    for i in (1, 2):
        rules += [
            (f"{h}.decoder.linear{i}.weight", "params",
             f"{h}/decoder/linear{i}/kernel", t_dense),
            (f"{h}.decoder.linear{i}.bias", "params",
             f"{h}/decoder/linear{i}/bias", t_identity),
        ]
    for emb in ("self_posembed", "cross_posembed"):
        pe = f"{h}.decoder.{emb}.position_embedding_head"
        fe = f"{h}/decoder/{emb}"
        rules += [
            (f"{pe}.0.weight", "params", f"{fe}/Dense_0/kernel", t_dense),
            (f"{pe}.0.bias", "params", f"{fe}/Dense_0/bias", t_identity),
            (f"{pe}.3.weight", "params", f"{fe}/Dense_1/kernel", t_dense),
            (f"{pe}.3.bias", "params", f"{fe}/Dense_1/bias", t_identity),
        ]
        rules += _bn_rules(f"{pe}.1", f"{fe}/BatchNorm_0")

    head_cfg = model_cfg.get("DENSE_HEAD", {}).get("SEPARATE_HEAD_CFG", {})
    heads = dict(head_cfg.get("HEAD_DICT", {}))
    heads["heatmap"] = {"num_conv":
                        int(model_cfg.get("DENSE_HEAD", {})
                            .get("NUM_HM_CONV", 2))}
    for name, hc in heads.items():
        n_conv = int(hc.get("num_conv", 2))
        tb = f"{h}.prediction_head.{name}"
        fb = f"{h}/prediction_head/{name}"
        for j in range(n_conv - 1):
            rules += [(f"{tb}.{j}.0.weight", "params", f"{fb}_fc{j}/kernel",
                       t_dense),
                      (f"{tb}.{j}.0.bias", "params", f"{fb}_fc{j}/bias",
                       t_identity)]
            rules += _bn_rules(f"{tb}.{j}.1", f"{fb}_bn{j}")
        rules += [
            (f"{tb}.{n_conv - 1}.weight", "params", f"{fb}_out/kernel",
             t_dense),
            (f"{tb}.{n_conv - 1}.bias", "params", f"{fb}_out/bias",
             t_identity),
        ]
    return rules


# ------------------------------------------------------------- application

def _get(tree, path):
    node = tree
    for p in path.split("/"):
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def _set(tree, path, value):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _to_mutable(tree):
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def import_state_dict(state_dict, variables, rules, dtype=np.float32):
    """Apply mapping rules; returns (variables, report). Unmatched torch keys
    and unfilled flax leaves are listed in the report for parity auditing."""
    import jax.numpy as jnp

    new_vars = {c: _to_mutable(variables.get(c, {}))
                for c in set(["params", "batch_stats"]) | set(variables)}
    used, loaded, mismatched = set(), [], []
    for tkey, coll, fpath, tr in rules:
        if tkey not in state_dict:
            continue
        target = _get(new_vars.get(coll, {}), fpath)
        if target is None:
            continue
        val = np.asarray(state_dict[tkey])
        val = tr(val)
        if tuple(val.shape) != tuple(target.shape):
            # spconv v1 fallback is inside t_spconv; anything else is a
            # genuine architecture mismatch
            mismatched.append((tkey, fpath, val.shape, tuple(target.shape)))
            continue
        _set(new_vars[coll], fpath, jnp.asarray(val, dtype=target.dtype))
        used.add(tkey)
        loaded.append((tkey, fpath))
    unmatched = [k for k in state_dict
                 if k not in used and not k.endswith("num_batches_tracked")
                 and "bev_pos" not in k and not k.startswith("vlm")
                 and "anchors" not in k]
    report = {"loaded": loaded, "unmatched_torch": unmatched,
              "mismatched": mismatched}
    return new_vars, report


def load_reference_checkpoint(path, variables, model_cfg):
    """End-to-end: torch-free read + TransFusion mapping."""
    from .torch_ckpt import load_torch_pth

    ckpt = load_torch_pth(path)
    state = ckpt.get("model_state", ckpt)
    rules = transfusion_rules(model_cfg)
    return import_state_dict(state, variables, rules)
