from .dynamic_vfe import DynamicMeanVFE, DynamicPillarVFE
from .image_vfe import ImageVFE
from .mean_vfe import MeanVFE
from .pillar_vfe import PillarVFE

VFE_REGISTRY = {
    "MeanVFE": MeanVFE,
    "PillarVFE": PillarVFE,
    "DynMeanVFE": DynamicMeanVFE,
    "DynamicMeanVFE": DynamicMeanVFE,
    "DynPillarVFE": DynamicPillarVFE,
    "DynamicPillarVFE": DynamicPillarVFE,
    "ImageVFE": ImageVFE,
}
