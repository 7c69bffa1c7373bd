"""Model layer: flax modules + pure target/loss/post-processing functions.

Mirrors the reference's `build_network` surface (pcdet/models/__init__.py:16-20
under /root/reference) with a functional JAX core: a detector is a flax module
(apply) plus pure loss/post-processing functions, assembled from the cfg by
registries, and everything runs inside one jit.
"""

from .detectors import build_detector


def build_network(model_cfg, num_class, dataset):
    """cfg-driven detector construction (reference pcdet/models/__init__.py:16)."""
    return build_detector(model_cfg=model_cfg, num_class=num_class, dataset=dataset)
