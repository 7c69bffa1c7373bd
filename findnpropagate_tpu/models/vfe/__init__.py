from .mean_vfe import MeanVFE
from .pillar_vfe import PillarVFE

VFE_REGISTRY = {
    "MeanVFE": MeanVFE,
    "PillarVFE": PillarVFE,
}
