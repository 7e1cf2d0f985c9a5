from tpuseg.ops.normalize import device_label, device_normalize
from tpuseg.ops.resize import (
    resize_bilinear,
    resize_nearest,
    resize_x,
    scale_as,
)

__all__ = ["device_label", "device_normalize", "resize_bilinear",
           "resize_nearest", "resize_x", "scale_as"]
