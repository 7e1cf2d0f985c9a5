"""Panoptic-DeepLab-style decoder with s2+s4 skips, non-mscale
(reference: network/deeper.py:36-91)."""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from tpuseg.models.heads import make_aspp
from tpuseg.models.layers import ConvNormAct, conv
from tpuseg.models.trunks import get_trunk
from tpuseg.ops import resize_x

Dtype = Any


class DeeperS8(nn.Module):
    num_classes: int
    trunk: str = "wrn38"
    align_corners: bool = False
    remat: bool = False
    fused_stage1: bool = False
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.backbone, _, _, _ = get_trunk(
            self.trunk, remat=self.remat, dtype=self.dtype,
            align_corners=self.align_corners,
            fused_stage1=self.fused_stage1)
        self.aspp, _ = make_aspp(256, 8, False, self.align_corners,
                                 self.dtype, name="aspp")
        self.convs2 = conv(32, 1, dtype=self.dtype, name="convs2")
        self.convs4 = conv(64, 1, dtype=self.dtype, name="convs4")
        self.conv_up1 = conv(256, 1, dtype=self.dtype, name="conv_up1")
        self.conv_up2 = ConvNormAct(256, 5, padding=2, dtype=self.dtype,
                                    name="conv_up2")
        self.conv_up3 = ConvNormAct(256, 5, padding=2, dtype=self.dtype,
                                    name="conv_up3")
        self.conv_up5 = conv(self.num_classes, 1, dtype=self.dtype,
                             name="conv_up5")

    def __call__(self, x, train: bool = False):
        s2, s4, high = self.backbone(x, train)
        s2 = self.convs2(s2)
        s4 = self.convs4(s4)
        y = self.aspp(high, train)
        y = self.conv_up1(y)
        y = resize_x(y, 2.0, self.align_corners).astype(self.dtype)
        y = jnp.concatenate([y, s4], axis=-1)
        y = self.conv_up2(y, train)
        y = resize_x(y, 2.0, self.align_corners).astype(self.dtype)
        y = jnp.concatenate([y, s2], axis=-1)
        y = self.conv_up3(y, train)
        y = self.conv_up5(y)
        pred = resize_x(y.astype(jnp.float32), 2.0, self.align_corners)
        return {"pred": pred}


def _kw(cfg):
    return dict(num_classes=cfg.dataset.num_classes,
                align_corners=cfg.model.align_corners,
                remat=cfg.model.remat,
                fused_stage1=cfg.model.fused_stage1,
                dtype=jnp.dtype(cfg.model.compute_dtype))


def DeeperW38(cfg):
    return DeeperS8(trunk="wrn38", **_kw(cfg))


def DeeperX71(cfg):
    return DeeperS8(trunk="xception71", **_kw(cfg))
