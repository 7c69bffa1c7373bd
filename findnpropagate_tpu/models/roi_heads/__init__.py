from .mppnet_head import MPPNetHead, MPPNetHeadE2E  # noqa: F401
from .parta2_head import PartA2FCHead  # noqa: F401
from .pointrcnn_head import PointRCNNHead  # noqa: F401
from .pvrcnn_head import PVRCNNHead  # noqa: F401
from .second_head import SECONDHead  # noqa: F401
from .voxelrcnn_head import VoxelRCNNHead  # noqa: F401

ROI_HEAD_REGISTRY = {
    "SECONDHead": SECONDHead,
    "PVRCNNHead": PVRCNNHead,
    "PointRCNNHead": PointRCNNHead,
    "VoxelRCNNHead": VoxelRCNNHead,
    "PartA2FCHead": PartA2FCHead,
    "MPPNetHead": MPPNetHead,
    "MPPNetHeadE2E": MPPNetHeadE2E,
}
