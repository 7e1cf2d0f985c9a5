from tpuseg.ops.resize import (
    resize_bilinear,
    resize_nearest,
    resize_x,
    scale_as,
)

__all__ = ["resize_bilinear", "resize_nearest", "resize_x", "scale_as"]
