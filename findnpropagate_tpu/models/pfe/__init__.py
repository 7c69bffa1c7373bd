from .voxel_set_abstraction import VoxelSetAbstraction  # noqa: F401

PFE_REGISTRY = {
    "VoxelSetAbstraction": VoxelSetAbstraction,
}
