from .detector3d import Detector3D, build_detector

DETECTOR_REGISTRY = {}
