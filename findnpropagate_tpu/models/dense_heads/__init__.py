from .anchor_head import AnchorHeadSingle
from .transfusion_head import TransFusionHead

DENSE_HEAD_REGISTRY = {
    "AnchorHeadSingle": AnchorHeadSingle,
    "TransFusionHead": TransFusionHead,
}
