from .anchor_head import AnchorHeadSingle
from .center_head import CenterHead
from .transfusion_head import TransFusionHead
from .voxelnext_head import VoxelNeXtHead

DENSE_HEAD_REGISTRY = {
    "AnchorHeadSingle": AnchorHeadSingle,
    "CenterHead": CenterHead,
    "TransFusionHead": TransFusionHead,
    "VoxelNeXtHead": VoxelNeXtHead,
}
