"""Trunk registry (reference get_trunk: network/utils.py:102-141)."""
from __future__ import annotations

import jax.numpy as jnp

from tpuseg.models.hrnet import HRNetV2, TINY_SPEC, W48_SPEC
from tpuseg.models.resnet import ResNet
from tpuseg.models.seresnext import SEResNeXt
from tpuseg.models.wider_resnet import (
    TINY_WRN_CHANNELS,
    TINY_WRN_STRUCTURE,
    WRN38,
)
from tpuseg.models.xception import Xception71


def get_trunk(trunk_name: str, output_stride: int = 8, remat: bool = False,
              dtype=jnp.bfloat16, align_corners: bool = False,
              fused_stage1: bool = False):
    """-> (trunk_module, s2_ch, s4_ch, high_level_ch).

    Channel counts per the reference contract (network/utils.py:108-135).
    """
    assert output_stride == 8, "only stride 8 supported (like the reference)"
    if trunk_name == "wrn38":
        return (WRN38(remat=remat, dtype=dtype, name="backbone"),
                128, 256, 4096)
    if trunk_name == "wrn38_tiny":
        return (WRN38(TINY_WRN_STRUCTURE, TINY_WRN_CHANNELS, stem_ch=8,
                      remat=remat, dtype=dtype, name="backbone"),
                8, 16, 64)
    if trunk_name == "xception71":
        return (Xception71(output_stride, remat=remat, dtype=dtype,
                           name="backbone"), 64, 128, 2048)
    if trunk_name == "xception71_tiny":
        return (Xception71(output_stride, middle_blocks=2, remat=remat,
                           dtype=dtype, name="backbone"), 64, 128, 2048)
    if trunk_name == "resnet-50":
        return (ResNet((3, 4, 6, 3), output_stride=output_stride,
                       remat=remat, dtype=dtype, name="backbone"),
                256, -1, 2048)
    if trunk_name == "resnet-101":
        return (ResNet((3, 4, 23, 3), output_stride=output_stride,
                       remat=remat, dtype=dtype, name="backbone"),
                256, -1, 2048)
    if trunk_name == "seresnext-50":
        return (SEResNeXt((3, 4, 6, 3), output_stride=output_stride,
                          remat=remat, dtype=dtype, name="backbone"),
                256, -1, 2048)
    if trunk_name == "seresnext-101":
        return (SEResNeXt((3, 4, 23, 3), output_stride=output_stride,
                          remat=remat, dtype=dtype, name="backbone"),
                256, -1, 2048)
    if trunk_name == "efficientnet_b4":
        # the reference's own efficientnet_b4 path is DEAD CODE (get_trunk
        # network/utils.py:102-141 has no such branch; its EffB4 factories
        # raise at construction) — this working trunk goes beyond it
        # (tpuseg/models/efficientnet.py docstring)
        from tpuseg.models.efficientnet import EfficientNetB4

        return (EfficientNetB4(output_stride, remat=remat, dtype=dtype,
                               name="backbone"), 24, 32, 448)
    if trunk_name == "hrnetv2":
        return (HRNetV2(W48_SPEC, align_corners, remat, dtype,
                        fused_stage1=fused_stage1, name="backbone"),
                -1, -1, W48_SPEC.high_level_ch)
    if trunk_name == "hrnetv2_tiny":
        return (HRNetV2(TINY_SPEC, align_corners, remat, dtype,
                        fused_stage1=fused_stage1, name="backbone"),
                -1, -1, TINY_SPEC.high_level_ch)
    raise ValueError(f"unknown trunk {trunk_name}")
