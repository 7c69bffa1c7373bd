"""MPPNet building blocks: MLP-Mixer spatial block, grouped 3-stage
transformer (intra-group mixing, token summarization, inter-group cross
attention), and the trajectory-box PointNet.

Parity target (/root/reference): pcdet/models/model_utils/mppnet_utils.py
(SpatialMixerBlock:109-153, Transformer:155-238, TransformerEncoderLayer:
264-363, PointNet:38-94, MLP:96-107).

TPU design notes: the reference concatenates the per-frame groups along the
BATCH axis and chunks them back at every layer; here groups live on their
own axis (B, NG, G, D) and every per-group op is a vmap/einsum over that
axis — one fused program, no chunk/cat traffic. All shapes are static.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class MLPStack(nn.Module):
    """num_layers-deep ReLU MLP (mppnet_utils.py:96-107)."""

    hidden_dim: int
    output_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, name=f"fc{i}")(x))
        return nn.Dense(self.output_dim, name=f"fc{self.num_layers - 1}")(x)


class FFNBlock(nn.Module):
    """Residual feed-forward with pre-add of an attention branch
    (mppnet_utils.py:377-403, FFN)."""

    d_model: int
    dim_feedforward: int = 512
    dropout: float = 0.1

    @nn.compact
    def __call__(self, tgt, tgt_input, train: bool):
        det = not train
        tgt = tgt + nn.Dropout(self.dropout, deterministic=det)(tgt_input)
        tgt = nn.LayerNorm(name="norm_tgt")(tgt)
        ff = nn.Dense(self.dim_feedforward, name="linear1")(tgt)
        ff = nn.Dropout(self.dropout, deterministic=det)(nn.relu(ff))
        ff = nn.Dense(self.d_model, name="linear2")(ff)
        tgt = tgt + nn.Dropout(self.dropout, deterministic=det)(ff)
        return nn.LayerNorm(name="norm_out")(tgt)


class SpatialMixerBlock(nn.Module):
    """Axis-wise MLP mixing over the proxy grid (mppnet_utils.py:109-153).

    Input (..., G, C) where G = grid**3 laid out x-major (meshgrid order
    of get_dense_grid_points); mixes along z, y, x axes then channels.
    """

    hidden_dim: int
    grid_size: int
    channels: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, src, train: bool):
        g = self.grid_size
        lead = src.shape[:-2]
        # (..., gx, gy, gz, C); ref permutes to (C, gz, gy, gx) and mixes the
        # trailing axis — x first, then y, then z in its permuted layout,
        # which is gx, gy, gz here.
        x = src.reshape(*lead, g, g, g, self.channels)

        def mix(name, arr, axis):
            moved = jnp.moveaxis(arr, axis, -1)
            mixed = MLPStack(self.hidden_dim, g, 3, name=name)(moved)
            mixed = jnp.moveaxis(mixed, -1, axis) + arr
            return nn.LayerNorm(name=f"norm_{name}")(mixed)

        # axes: -4 = gx, -3 = gy, -2 = gz (channel last)
        x = mix("mixer_x", x, -4)
        x = mix("mixer_y", x, -3)
        x = mix("mixer_z", x, -2)
        x = x.reshape(*lead, g * g * g, self.channels)
        ff = nn.Dense(2 * self.channels, name="ffn1")(x)
        ff = nn.Dropout(self.dropout, deterministic=not train)(nn.relu(ff))
        ff = nn.Dense(self.channels, name="ffn2")(ff)
        return nn.LayerNorm(name="norm_channel")(x + ff)


class MPPNetEncoderLayer(nn.Module):
    """One grouped encoder layer (mppnet_utils.py:264-363).

    state: token (B, NG, D), feats (B, NG, G, D).
    1. intra-group spatial mixing over each group's proxy grid;
    2. each group token attends over its own group;
    3. (all but last layer) groups are fused (concat->MLP) and each group
       cross-attends to the fusion with its own attention weights.
    """

    d_model: int
    nhead: int
    dim_feedforward: int
    num_groups: int
    grid_size: int
    mixer_hidden: int
    dropout: float = 0.1
    last_layer: bool = False

    @nn.compact
    def __call__(self, token, feats, pos, train: bool):
        det = not train
        b, ng, g, d = feats.shape
        feats = SpatialMixerBlock(
            self.mixer_hidden, self.grid_size, self.d_model,
            name="mlp_mixer_3d")(feats, train)

        # token <- group summary (self_attn: query = token, key = feats+pos)
        key = feats if pos is None else feats + pos[None, None]
        flat_t = token.reshape(b * ng, 1, d)
        flat_k = key.reshape(b * ng, g, d)
        flat_v = feats.reshape(b * ng, g, d)
        summary = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, dropout_rate=self.dropout,
            name="self_attn")(flat_t, flat_k, flat_v, deterministic=det)
        t = flat_t + nn.Dropout(self.dropout, deterministic=det)(summary)
        t = nn.LayerNorm(name="norm1")(t)
        ff = nn.Dense(self.dim_feedforward, name="linear1")(t)
        ff = nn.Dropout(self.dropout, deterministic=det)(nn.relu(ff))
        ff = nn.Dense(self.d_model, name="linear2")(ff)
        t = t + nn.Dropout(self.dropout, deterministic=det)(ff)
        token = nn.LayerNorm(name="norm2")(t).reshape(b, ng, d)

        if not self.last_layer:
            # inter-group fusion: concat groups on channels -> MLP
            fused_in = jnp.concatenate(
                [feats[:, i] for i in range(ng)], axis=-1)    # (B, G, NG*D)
            fused = MLPStack(self.d_model, self.d_model, 4,
                             name="fusion_all_groups")(fused_in)  # (B, G, D)
            fkey = fused if pos is None else fused + pos[None]
            new_groups = []
            for i in range(ng):
                q = feats[:, i] if pos is None else feats[:, i] + pos[None]
                ca = nn.MultiHeadDotProductAttention(
                    num_heads=self.nhead, dropout_rate=self.dropout,
                    name=f"cross_attn_{i}")(q, fkey, fused, deterministic=det)
                new_groups.append(
                    FFNBlock(self.d_model, self.dim_feedforward, self.dropout,
                             name=f"ffn_{i}")(feats[:, i], ca, train))
            feats = jnp.stack(new_groups, axis=1)
        return token, feats


class MPPNetTransformer(nn.Module):
    """Grouped encoder (mppnet_utils.py:155-238).

    src (B, F*G, D) frame-major; returns
      hs      (B, NG*D)  final per-group tokens, concatenated, and
      tokens  (L, B, NG, D) every layer's tokens (aux heads).
    For num_frames > num_groups the strided frame groups are fused into
    NG proxy sets first (Transformer.forward:203-227).
    """

    model_cfg: Any
    grid_size: int = 4

    @nn.compact
    def __call__(self, src, pos, train: bool):
        cfg = self.model_cfg
        d = int(cfg["hidden_dim"])
        ng = int(cfg["num_groups"])
        nf = int(cfg["num_frames"])
        g = int(cfg["num_proxy_points"])
        layers = int(cfg["enc_layers"])
        b = src.shape[0]

        src = src.reshape(b, nf, g, d)
        if nf > ng:
            # strided grouping: group i = frames (i, i+s, i+2s, ...),
            # concatenated on channels and fused (sequence_stride path)
            stride = int(cfg.get("sequence_stride", ng))
            glen = nf // ng
            groups = []
            for i in range(ng):
                idx = [i + j * stride for j in range(glen)]
                groups.append(jnp.concatenate(
                    [src[:, k] for k in idx], axis=-1))       # (B, G, glen*D)
            merged = jnp.stack(groups, axis=1)                # (B, NG, G, gl*D)
            fused = MLPStack(d, d, 4, name="fusion_all_group")(merged)
            base = src[:, :ng]                                # (B, NG, G, D)
            feats = FFNBlock(d, int(cfg["dim_feedforward"]),
                             name="fusion_norm")(base, fused, train)
        else:
            feats = src                                       # (B, NG, G, D)

        token0 = self.param(
            "token", nn.initializers.zeros, (ng, d), jnp.float32)
        token = jnp.broadcast_to(token0[None], (b, ng, d))

        tokens_per_layer = []
        for li in range(layers):
            token, feats = MPPNetEncoderLayer(
                d_model=d, nhead=int(cfg["nheads"]),
                dim_feedforward=int(cfg["dim_feedforward"]),
                num_groups=ng, grid_size=self.grid_size,
                mixer_hidden=int(cfg["use_mlp_mixer"]["hidden_dim"]),
                dropout=float(cfg.get("dropout", 0.1)),
                last_layer=(li == layers - 1),
                name=f"layer{li}")(token, feats, pos, train)
            tokens_per_layer.append(token)

        hs = token.reshape(b, ng * d)
        return hs, jnp.stack(tokens_per_layer, axis=0)


class SeqBoxPointNet(nn.Module):
    """Trajectory-box embedding branch (mppnet_utils.py:38-94, PointNet):
    1-D convs over the frame axis of the canonical box sequence, a global
    max-pool feature, and an auxiliary box regression.

    x (B, F, CH) -> (box_reg (B, code), feat (B, hidden))."""

    model_cfg: Any
    code_size: int = 7

    @nn.compact
    def __call__(self, x, train: bool):
        ch = int(self.model_cfg["TRANS_INPUT"])
        h = nn.relu(nn.Dense(ch, name="conv1")(x))
        h = nn.relu(nn.Dense(ch, name="conv2")(h))
        h = nn.relu(nn.Dense(ch * 2, name="conv3")(h))
        pooled = jnp.max(h, axis=1)                           # (B, 2*ch)
        feat = nn.relu(nn.Dense(ch, name="fc_feat")(pooled))
        reg = nn.Dense(self.code_size, name="fc_reg")(
            nn.relu(nn.Dense(ch, name="fc_pre")(feat)))
        return reg, feat
