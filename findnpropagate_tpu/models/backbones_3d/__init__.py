from .spconv_backbone import VoxelBackBone8x, VoxelResBackBone8x

BACKBONE_3D_REGISTRY = {
    "VoxelResBackBone8x": VoxelResBackBone8x,
    "VoxelBackBone8x": VoxelBackBone8x,
}
