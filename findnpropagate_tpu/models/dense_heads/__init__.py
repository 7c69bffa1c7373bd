from .anchor_head import AnchorHeadSingle

DENSE_HEAD_REGISTRY = {
    "AnchorHeadSingle": AnchorHeadSingle,
}
