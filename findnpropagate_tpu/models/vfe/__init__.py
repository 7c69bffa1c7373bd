from .dynamic_vfe import (DynamicMeanVFE, DynamicPillarVFE,
                          DynamicPillarVFESimple2D)
from .image_vfe import ImageVFE
from .mean_vfe import MeanVFE
from .pillar_vfe import PillarVFE

VFE_REGISTRY = {
    "MeanVFE": MeanVFE,
    "PillarVFE": PillarVFE,
    "DynMeanVFE": DynamicMeanVFE,
    "DynamicMeanVFE": DynamicMeanVFE,
    "DynPillarVFE": DynamicPillarVFE,
    "DynamicPillarVFESimple2D": DynamicPillarVFESimple2D,
    "DynamicPillarVFE": DynamicPillarVFE,
    "ImageVFE": ImageVFE,
}
