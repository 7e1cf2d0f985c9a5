from tpuseg.kernels.bottleneck_fused import fold_bn, fused_bottleneck
from tpuseg.kernels.ocr_attention import fused_object_attention

__all__ = ["fold_bn", "fused_bottleneck", "fused_object_attention"]
