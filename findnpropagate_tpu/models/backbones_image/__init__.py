from .fpn import GeneralizedLSSFPN
from .maskclip import MaskCLIP
from .resnet import CLIPResNet, ResNet18
from .swin import SwinTransformer

IMAGE_BACKBONE_REGISTRY = {
    "SwinTransformer": SwinTransformer,
    "ResNet18": ResNet18,
    "CLIPResNet": CLIPResNet,
}

NECK_REGISTRY = {
    "GeneralizedLSSFPN": GeneralizedLSSFPN,
}
