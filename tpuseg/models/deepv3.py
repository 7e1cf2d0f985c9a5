"""DeepLabV3+ and DeepLabV3 (reference: network/deepv3.py)."""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from tpuseg.models.heads import make_aspp
from tpuseg.models.layers import ConvNormAct, SegHead, conv
from tpuseg.models.trunks import get_trunk
from tpuseg.ops import resize_bilinear, scale_as

Dtype = Any


class DeepV3Plus(nn.Module):
    """trunk -> ASPP -> bot_aspp(1x1->256) || bot_fine(s2->48) -> concat ->
    3-conv final head -> upsample (reference: deepv3.py:40-93). Stride 8."""

    num_classes: int
    trunk: str = "wrn38"
    use_dpc: bool = False
    align_corners: bool = False
    remat: bool = False
    fused_stage1: bool = False
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.backbone, self.s2_ch, _, high_ch = get_trunk(
            self.trunk, remat=self.remat, dtype=self.dtype,
            align_corners=self.align_corners,
            fused_stage1=self.fused_stage1)
        self.aspp, self.aspp_out_ch = make_aspp(
            256, output_stride=8, dpc=self.use_dpc,
            align_corners=self.align_corners, dtype=self.dtype, name="aspp")
        self.bot_fine = conv(48, 1, dtype=self.dtype, name="bot_fine")
        self.bot_aspp = conv(256, 1, dtype=self.dtype, name="bot_aspp")
        self.final1 = ConvNormAct(256, 3, dtype=self.dtype, name="final1")
        self.final2 = ConvNormAct(256, 3, dtype=self.dtype, name="final2")
        self.final_cls = conv(self.num_classes, 1, dtype=self.dtype,
                              name="final_cls")

    def __call__(self, x, train: bool = False):
        s2, _, high = self.backbone(x, train)
        aspp = self.aspp(high, train)
        conv_aspp = self.bot_aspp(aspp)
        conv_s2 = self.bot_fine(s2)
        conv_aspp = resize_bilinear(conv_aspp, s2.shape[-3:-1],
                                    self.align_corners).astype(self.dtype)
        cat_s4 = jnp.concatenate([conv_s2, conv_aspp], axis=-1)
        y = self.final1(cat_s4, train)
        y = self.final2(y, train)
        y = self.final_cls(y)
        pred = scale_as(y.astype(jnp.float32), x, self.align_corners)
        return {"pred": pred}


class DeepV3(nn.Module):
    """trunk -> ASPP -> seg head (reference: deepv3.py:126-161)."""

    num_classes: int
    trunk: str = "resnet-50"
    use_dpc: bool = False
    output_stride: int = 8
    align_corners: bool = False
    seg_bot_ch: int = 256  # reference make_seg_head reads SEGATTN_BOT_CH
    remat: bool = False
    fused_stage1: bool = False
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.backbone, _, _, high_ch = get_trunk(
            self.trunk, remat=self.remat, dtype=self.dtype,
            align_corners=self.align_corners,
            fused_stage1=self.fused_stage1)
        self.aspp, _ = make_aspp(256, output_stride=self.output_stride,
                                 dpc=self.use_dpc,
                                 align_corners=self.align_corners,
                                 dtype=self.dtype, name="aspp")
        self.final = SegHead(self.num_classes, self.seg_bot_ch,
                             dtype=self.dtype, name="final")

    def __call__(self, x, train: bool = False):
        _, _, high = self.backbone(x, train)
        aspp = self.aspp(high, train)
        y = self.final(aspp, train)
        pred = scale_as(y.astype(jnp.float32), x, self.align_corners)
        return {"pred": pred}


def _kw(cfg):
    return dict(num_classes=cfg.dataset.num_classes,
                align_corners=cfg.model.align_corners,
                remat=cfg.model.remat,
                fused_stage1=cfg.model.fused_stage1,
                dtype=jnp.dtype(cfg.model.compute_dtype))


# factories (reference: deepv3.py:96-166)
def DeepV3PlusSRNX50(cfg):
    return DeepV3Plus(trunk="seresnext-50", **_kw(cfg))


def DeepV3PlusR50(cfg):
    return DeepV3Plus(trunk="resnet-50", **_kw(cfg))


def DeepV3PlusSRNX101(cfg):
    return DeepV3Plus(trunk="seresnext-101", **_kw(cfg))


def DeepV3PlusW38(cfg):
    return DeepV3Plus(trunk="wrn38", **_kw(cfg))


def DeepV3PlusW38I(cfg):
    # init_all only changes torch init; identical here
    return DeepV3Plus(trunk="wrn38", **_kw(cfg))


def DeepV3PlusX71(cfg):
    return DeepV3Plus(trunk="xception71", **_kw(cfg))


def DeepV3PlusEffB4(cfg):
    """(reference: deepv3.py:121-123 — dead code there: get_trunk has no
    efficientnet_b4 branch; working flax trunk here)"""
    return DeepV3Plus(trunk="efficientnet_b4", **_kw(cfg))


def DeepWV3Plus(cfg):
    """Alias used by several recipes (reference README: deepv3.DeepWV3Plus)."""
    return DeepV3Plus(trunk="wrn38", **_kw(cfg))


def DeepV3R50(cfg):
    return DeepV3(trunk="resnet-50",
                  seg_bot_ch=cfg.model.segattn_bot_ch, **_kw(cfg))


def DeepV3PlusW38Tiny(cfg):
    return DeepV3Plus(trunk="wrn38_tiny", **_kw(cfg))
