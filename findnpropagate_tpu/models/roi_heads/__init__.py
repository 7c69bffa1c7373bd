from .second_head import ROI_HEAD_REGISTRY, SECONDHead  # noqa: F401
