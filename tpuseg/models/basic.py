"""Plain (non-mscale) trunk+head models (reference: network/basic.py)."""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from tpuseg.models.heads import make_aspp
from tpuseg.models.layers import SegHead, conv
from tpuseg.models.trunks import get_trunk
from tpuseg.ops import scale_as

Dtype = Any


class Basic(nn.Module):
    """trunk -> seg head (reference: basic.py:38-64)."""

    num_classes: int
    trunk: str = "hrnetv2"
    align_corners: bool = False
    seg_bot_ch: int = 256  # reference make_seg_head reads SEGATTN_BOT_CH
    remat: bool = False
    fused_stage1: bool = False
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.backbone, _, _, _ = get_trunk(
            self.trunk, remat=self.remat, dtype=self.dtype,
            align_corners=self.align_corners,
            fused_stage1=self.fused_stage1)
        self.seg_head = SegHead(self.num_classes, self.seg_bot_ch,
                                dtype=self.dtype, name="seg_head")

    def __call__(self, x, train: bool = False):
        _, _, high = self.backbone(x, train)
        pred = self.seg_head(high, train)
        return {"pred": scale_as(pred.astype(jnp.float32), x,
                                 self.align_corners)}


class ASPPModel(nn.Module):
    """trunk -> ASPP -> bot 1x1 -> seg head (reference: basic.py:67-101)."""

    num_classes: int
    trunk: str = "hrnetv2"
    aspp_bot_ch: int = 256
    align_corners: bool = False
    seg_bot_ch: int = 256  # reference make_seg_head reads SEGATTN_BOT_CH
    remat: bool = False
    fused_stage1: bool = False
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.backbone, _, _, _ = get_trunk(
            self.trunk, remat=self.remat, dtype=self.dtype,
            align_corners=self.align_corners,
            fused_stage1=self.fused_stage1)
        self.aspp, _ = make_aspp(self.aspp_bot_ch, 8, False,
                                 self.align_corners, self.dtype, name="aspp")
        self.bot_aspp = conv(256, 1, dtype=self.dtype, name="bot_aspp")
        self.final = SegHead(self.num_classes, self.seg_bot_ch,
                             dtype=self.dtype, name="final")

    def __call__(self, x, train: bool = False):
        _, _, high = self.backbone(x, train)
        y = self.aspp(high, train)
        y = self.bot_aspp(y)
        pred = self.final(y, train)
        return {"pred": scale_as(pred.astype(jnp.float32), x,
                                 self.align_corners)}


def _kw(cfg):
    return dict(num_classes=cfg.dataset.num_classes,
                align_corners=cfg.model.align_corners,
                seg_bot_ch=cfg.model.segattn_bot_ch,
                remat=cfg.model.remat,
                fused_stage1=cfg.model.fused_stage1,
                dtype=jnp.dtype(cfg.model.compute_dtype))


def HRNet(cfg):
    return Basic(trunk="hrnetv2", **_kw(cfg))


def HRNet_ASP(cfg):
    return ASPPModel(trunk="hrnetv2", aspp_bot_ch=cfg.model.aspp_bot_ch,
                     **_kw(cfg))
