"""Transformer decoder components for TransFusion.

Parity with pcdet/models/model_utils/transfusion_utils.py:5-102
(/root/reference): learned 2D position embedding (1x1 conv MLP w/ BN) and a
single decoder layer (self-attn + cross-attn + FFN, post-norm). Layout is
(B, N, C) throughout — XLA fuses the 200-query x 32k-key attention fine
without hand-scheduling.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..blocks import BN_KW


class PositionEmbeddingLearned(nn.Module):
    num_pos_feats: int

    @nn.compact
    def __call__(self, xy, train: bool):
        # xy: (B, N, 2)
        x = nn.Dense(self.num_pos_feats)(xy)
        x = nn.BatchNorm(use_running_average=not train, **BN_KW)(x)
        x = nn.relu(x)
        return nn.Dense(self.num_pos_feats)(x)


class TransformerDecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    cross_only: bool = False

    @nn.compact
    def __call__(self, query, key, query_pos, key_pos, train: bool):
        """query (B, P, C); key (B, K, C); query_pos (B, P, 2); key_pos (B, K, 2)."""
        q_embed = PositionEmbeddingLearned(self.d_model, name="self_posembed")(
            query_pos, train
        )
        k_embed = PositionEmbeddingLearned(self.d_model, name="cross_posembed")(
            key_pos, train
        )
        deterministic = not train

        if not self.cross_only:
            qkv = query + q_embed
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.nhead, dropout_rate=self.dropout, name="self_attn"
            )(qkv, qkv, qkv, deterministic=deterministic)
            query = query + nn.Dropout(self.dropout, deterministic=deterministic)(attn)
            query = nn.LayerNorm(name="norm1")(query)

        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, dropout_rate=self.dropout, name="cross_attn"
        )(query + q_embed, key + k_embed, key + k_embed,
          deterministic=deterministic)
        query = query + nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        query = nn.LayerNorm(name="norm2")(query)

        ffn = nn.Dense(self.dim_feedforward, name="linear1")(query)
        ffn = nn.relu(ffn)
        ffn = nn.Dropout(self.dropout, deterministic=deterministic)(ffn)
        ffn = nn.Dense(self.d_model, name="linear2")(ffn)
        query = query + nn.Dropout(self.dropout, deterministic=deterministic)(ffn)
        return nn.LayerNorm(name="norm3")(query)
