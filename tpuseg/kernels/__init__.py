from tpuseg.kernels.ocr_attention import fused_object_attention

__all__ = ["fused_object_attention"]
