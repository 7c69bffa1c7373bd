"""Reference-checkpoint import: torch-free .pth reading, name/layout mapping
and ACTIVATION parity — fully torch-free at TEST time: the torch side was
captured once into committed fixtures (tests/fixtures/, regenerate with
tests/make_ckpt_fixtures.py where torch exists), pinning every layout
convention (conv transpose order, attention head splits, BN stats) the
94 MB reference checkpoint relies on."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from findnpropagate_tpu.utils.torch_ckpt import load_torch_pth
from findnpropagate_tpu.utils.ckpt_import import (
    import_state_dict,
    make_attn_transforms,
    t_conv2d,
    t_dense,
    t_spconv,
    transfusion_rules,
)

FIXTURES = Path(__file__).resolve().parent / "fixtures"

pytestmark = pytest.mark.slow


def test_load_torch_pth_roundtrip():
    """Committed torch-saved .pth (mixed dtypes, non-contiguous tensors)
    must read back exactly via the torch-free unpickler."""
    out = load_torch_pth(FIXTURES / "roundtrip.pth")
    exp = np.load(FIXTURES / "roundtrip_expected.npz")
    assert out["epoch"] == 3 and out["it"] == 11
    np.testing.assert_allclose(out["half"], exp["half"])
    np.testing.assert_allclose(out["bf16"], exp["bf16"])
    np.testing.assert_allclose(out["noncontig"], exp["noncontig"])
    for k in exp.files:
        if k.startswith("model_state/"):
            np.testing.assert_allclose(
                out["model_state"][k.split("/", 1)[1]], exp[k])


def test_bev_backbone_activation_parity():
    """Reference-shaped BaseBEVBackbone torch activations (fixture) vs the
    flax module with imported weights (base_bev_backbone.py:28-112)."""
    cfg = {"LAYER_NUMS": [2, 2], "LAYER_STRIDES": [1, 2],
           "NUM_FILTERS": [16, 32], "UPSAMPLE_STRIDES": [1, 2],
           "NUM_UPSAMPLE_FILTERS": [16, 16],
           "USE_CONV_FOR_NO_STRIDE": True}
    cin = 24
    exp = np.load(FIXTURES / "bev_expected.npz")
    x_np = exp["x"]
    want = exp["want"]

    from findnpropagate_tpu.models.backbones_2d.base_bev_backbone import (
        BaseBEVBackbone,
    )

    flax_bb = BaseBEVBackbone(model_cfg=cfg, input_channels=cin)
    variables = flax_bb.init(jax.random.PRNGKey(0),
                             {"spatial_features": jnp.asarray(x_np)},
                             train=False)
    state = load_torch_pth(FIXTURES / "bev.pth")["model_state"]
    wrapped = {c: {"backbone_2d": dict(variables[c])} for c in variables}
    rules = transfusion_rules({"BACKBONE_2D": cfg})
    new_vars, report = import_state_dict(state, wrapped, rules)
    assert not report["mismatched"], report["mismatched"]
    assert not report["unmatched_torch"], report["unmatched_torch"]
    vars2 = {c: new_vars[c]["backbone_2d"] for c in ("params", "batch_stats")}

    with jax.default_matmul_precision("highest"):
        got = flax_bb.apply(vars2, {"spatial_features": jnp.asarray(x_np)},
                            train=False)["spatial_features_2d"]
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_attention_import_parity():
    """torch nn.MultiheadAttention weights (fixture) -> flax
    MultiHeadDotProductAttention via the qkv/out split transforms."""
    import flax.linen as fnn

    fx = np.load(FIXTURES / "mha.npz")
    h = int(fx["num_heads"])
    d = fx["in_proj_weight"].shape[1]

    split_qkv, out_kernel = make_attn_transforms(h)
    params = {"params": {
        "query": {"kernel": jnp.asarray(split_qkv("q")(fx["in_proj_weight"])),
                  "bias": jnp.asarray(split_qkv("q")(fx["in_proj_bias"]))},
        "key": {"kernel": jnp.asarray(split_qkv("k")(fx["in_proj_weight"])),
                "bias": jnp.asarray(split_qkv("k")(fx["in_proj_bias"]))},
        "value": {"kernel": jnp.asarray(split_qkv("v")(fx["in_proj_weight"])),
                  "bias": jnp.asarray(split_qkv("v")(fx["in_proj_bias"]))},
        "out": {"kernel": jnp.asarray(out_kernel(fx["out_w"])),
                "bias": jnp.asarray(fx["out_b"])},
    }}
    attn = fnn.MultiHeadDotProductAttention(num_heads=h, qkv_features=d,
                                            out_features=d,
                                            deterministic=True)
    with jax.default_matmul_precision("highest"):
        got = attn.apply(params, jnp.asarray(fx["q"]), jnp.asarray(fx["k"]))
    np.testing.assert_allclose(np.asarray(got), fx["want"], atol=1e-5)


def test_spconv_layout_tap_correspondence():
    """t_spconv must place tap (dz, dy, dx) of the torch weight at flattened
    C-order index ((dz*ky)+dy)*kx+dx with (I, O) trailing."""
    o, i = 6, 4
    w_v2 = np.arange(o * 27 * i, dtype=np.float32).reshape(o, 3, 3, 3, i)
    got = t_spconv(w_v2)
    assert got.shape == (27, i, o)
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                k = (dz * 3 + dy) * 3 + dx
                np.testing.assert_array_equal(
                    got[k], w_v2[:, dz, dy, dx, :].T)
    o2, i2 = 32, 16
    w_v1b = np.random.randn(3, 3, 3, i2, o2).astype(np.float32)
    got1b = t_spconv(w_v1b)
    assert got1b.shape == (27, i2, o2)
    np.testing.assert_array_equal(got1b[13], w_v1b[1, 1, 1])


def test_transfusion_rule_coverage():
    """Every param/batch_stats leaf of the tiny flagship TransFusion model
    must be a target of some import rule (no silently random weights when
    loading the reference checkpoint)."""
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from __graft_entry__ import _build, _tiny_cfgs

    det, variables, _ = _build(1)
    _, model_cfg = _tiny_cfgs()
    rules = transfusion_rules(model_cfg)
    targets = {(c, p) for _, c, p, _ in rules}

    def leaves(tree, path=()):
        if hasattr(tree, "shape"):
            yield "/".join(path)
            return
        for k in tree:
            yield from leaves(tree[k], path + (k,))

    missing = []
    for coll in ("params", "batch_stats"):
        for leaf in leaves(variables.get(coll, {})):
            if (coll, leaf) not in targets:
                missing.append((coll, leaf))
    assert not missing, missing
