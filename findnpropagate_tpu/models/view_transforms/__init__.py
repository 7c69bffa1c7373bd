from .depth_lss import DepthLSSTransform

VTRANSFORM_REGISTRY = {
    "DepthLSSTransform": DepthLSSTransform,
}
