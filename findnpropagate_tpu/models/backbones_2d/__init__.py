from .base_bev_backbone import BaseBEVBackbone
from .map_to_bev import HeightCompression, PointPillarScatter

BACKBONE_2D_REGISTRY = {
    "BaseBEVBackbone": BaseBEVBackbone,
}

MAP_TO_BEV_REGISTRY = {
    "PointPillarScatter": PointPillarScatter,
    "HeightCompression": HeightCompression,
}
