"""Multi-scale attention variants over DeepLabV3+/Deeper/Basic heads.

Reference: network/mscale.py. These differ from MscaleOCR in three ways:
no aux head, the attention head reads the decoder's concat features, and
optional ``fuse_aspp`` feeds low-scale ASPP features into the high-scale
pass (attention-weighted), with an optional 2-channel attention head
(``attn_2b``) separating logit- and aspp-attention.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tpuseg.models.heads import make_aspp
from tpuseg.models.layers import AttnHead, ConvNormAct, SegHead, conv
from tpuseg.models.mscale_core import nscale_fuse, two_scale_fuse
from tpuseg.models.trunks import get_trunk
from tpuseg.ops import resize_bilinear, resize_x, scale_as

Dtype = Any


def _mscale_call(model, x, train):
    """Shared forward dispatch (reference MscaleBase.forward:
    mscale.py:222-229)."""
    if not train and model.n_scales:
        if model.fuse_aspp:
            return _nscale_fused(model, x, list(model.n_scales), train)
        fwd = lambda xi: model._fwd(xi, train=train)
        return nscale_fuse(fwd, x, model.n_scales, model.align_corners)
    return _two_scale(model, x, train)


def _two_scale(model, x_1x, train):
    """two_scale_forward with optional aspp feature fusion
    (reference: mscale.py:182-220). The fusion arithmetic is
    mscale_core.two_scale_fuse; fuse_aspp only changes how the
    high-scale pass consumes the low-scale output."""
    fwd = lambda xi: model._fwd(xi, train=train)
    fwd_hi = None
    if model.fuse_aspp:
        fwd_hi = lambda xi, lo: model._fwd(
            xi, aspp_lo=lo["aspp"], aspp_attn=lo["aspp_attn"], train=train)
    return two_scale_fuse(fwd, x_1x, model.lo_scale, model.align_corners,
                          fwd_hi=fwd_hi)


def _nscale_fused(model, x_1x, scales, train):
    """Recursive low->high fused-ASPP eval (reference recurse_fuse_fwd:
    mscale.py:53-112)."""
    assert 1.0 in [float(s) for s in scales]
    scales = sorted([float(s) for s in scales], reverse=True)

    def recurse(scales, aspp_lo, aspp_attn):
        this_scale = scales.pop()
        x = x_1x if this_scale == 1.0 else \
            resize_x(x_1x, this_scale, model.align_corners)
        o = model._fwd(x, aspp_lo=aspp_lo, aspp_attn=aspp_attn, train=train)
        p = o["cls_out"].astype(jnp.float32)
        attn = o["logit_attn"].astype(jnp.float32)
        if this_scale != 1.0:
            p = scale_as(p, x_1x, model.align_corners)
            attn = scale_as(attn, x_1x, model.align_corners)
        if not scales:
            return p, attn
        out = attn * p
        p_next, _ = recurse(scales, o["aspp"], o["aspp_attn"])
        return out + (1.0 - attn) * p_next, attn

    pred, attn = recurse(list(scales), None, None)
    return {"pred": pred, "attn_10x": attn}


class MscaleV3Plus(nn.Module):
    """DeepLabV3+ + multi-scale attention (reference: mscale.py:232-328)."""

    num_classes: int
    trunk: str = "wrn38"
    use_dpc: bool = False
    fuse_aspp: bool = False
    attn_2b: bool = False
    n_scales: Sequence[float] = ()
    lo_scale: float = 0.5
    align_corners: bool = False
    bot_ch: int = 256
    attn_inner_3x3: bool = True
    attn_old_arch: bool = False
    attn_dropout: bool = False
    remat: bool = False
    fused_stage1: bool = False
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.backbone, _, _, _ = get_trunk(
            self.trunk, remat=self.remat, dtype=self.dtype,
            align_corners=self.align_corners,
            fused_stage1=self.fused_stage1)
        self.aspp, _ = make_aspp(256, 8, self.use_dpc, self.align_corners,
                                 self.dtype, name="aspp")
        self.bot_fine = conv(48, 1, dtype=self.dtype, name="bot_fine")
        self.bot_aspp = conv(256, 1, dtype=self.dtype, name="bot_aspp")
        self.final1 = ConvNormAct(self.bot_ch, 3, dtype=self.dtype,
                                  name="final1")
        self.final2 = ConvNormAct(self.bot_ch, 3, dtype=self.dtype,
                                  name="final2")
        self.final_cls = conv(self.num_classes, 1, dtype=self.dtype,
                              name="final_cls")
        self.scale_attn = AttnHead(out_ch=2 if self.attn_2b else 1,
                                   bot_ch=self.bot_ch,
                                   inner_3x3=self.attn_inner_3x3,
                                   old_arch=self.attn_old_arch,
                                   dropout=self.attn_dropout,
                                   dtype=self.dtype, name="scale_attn")

    def _fwd(self, x, aspp_lo=None, aspp_attn=None, train=False):
        """(reference: mscale.py:296-328)"""
        s2, _, high = self.backbone(x, train)
        aspp = self.aspp(high, train)
        if aspp_lo is not None and aspp_attn is not None:
            aspp_attn = scale_as(aspp_attn, aspp, self.align_corners)
            aspp_lo = scale_as(aspp_lo, aspp, self.align_corners)
            aspp = (aspp_attn * aspp_lo +
                    (1.0 - aspp_attn) * aspp.astype(jnp.float32)
                    ).astype(self.dtype)

        conv_aspp = self.bot_aspp(aspp)
        conv_s2 = self.bot_fine(s2)
        conv_aspp = resize_bilinear(conv_aspp, s2.shape[-3:-1],
                                    self.align_corners).astype(self.dtype)
        cat_s4 = jnp.concatenate([conv_s2, conv_aspp], axis=-1)

        y = self.final1(cat_s4, train)
        y = self.final2(y, train)
        out = self.final_cls(y)
        attn = self.scale_attn(cat_s4, train)

        out = scale_as(out.astype(jnp.float32), x, self.align_corners)
        attn = scale_as(attn, x, self.align_corners)
        if self.attn_2b:
            logit_attn, aspp_attn_out = attn[..., 0:1], attn[..., 1:]
        else:
            logit_attn = aspp_attn_out = attn
        return {"cls_out": out, "logit_attn": logit_attn,
                "aspp_attn": aspp_attn_out, "aspp": aspp}

    def __call__(self, x, train: bool = False):
        return _mscale_call(self, x, train)


class MscaleDeeper(nn.Module):
    """Panoptic-DeepLab-style decoder + mscale
    (reference: mscale.py:363-433)."""

    num_classes: int
    trunk: str = "wrn38"
    fuse_aspp: bool = False
    attn_2b: bool = False
    n_scales: Sequence[float] = ()
    lo_scale: float = 0.5
    align_corners: bool = False
    bot_ch: int = 256
    attn_inner_3x3: bool = True
    attn_old_arch: bool = False
    attn_dropout: bool = False
    remat: bool = False
    fused_stage1: bool = False
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.backbone, s2_ch, s4_ch, high_ch = get_trunk(
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
        self.scale_attn = AttnHead(out_ch=2 if self.attn_2b else 1,
                                   bot_ch=self.bot_ch,
                                   inner_3x3=self.attn_inner_3x3,
                                   old_arch=self.attn_old_arch,
                                   dropout=self.attn_dropout,
                                   dtype=self.dtype, name="scale_attn")

    def _fwd(self, x, aspp_lo=None, aspp_attn=None, train=False):
        """(reference: mscale.py:399-433)"""
        s2, s4, high = self.backbone(x, train)
        s2 = self.convs2(s2)
        s4 = self.convs4(s4)
        aspp = self.aspp(high, train)
        if aspp_lo is not None and aspp_attn is not None:
            aspp_attn = scale_as(aspp_attn, aspp, self.align_corners)
            aspp_lo = scale_as(aspp_lo, aspp, self.align_corners)
            aspp = (aspp_attn * aspp_lo +
                    (1.0 - aspp_attn) * aspp.astype(jnp.float32)
                    ).astype(self.dtype)

        y = self.conv_up1(aspp)
        y = resize_x(y, 2.0, self.align_corners).astype(self.dtype)
        y = jnp.concatenate([y, s4], axis=-1)
        y = self.conv_up2(y, train)
        y = resize_x(y, 2.0, self.align_corners).astype(self.dtype)
        y = jnp.concatenate([y, s2], axis=-1)
        up3 = self.conv_up3(y, train)

        out = self.conv_up5(up3)
        out = resize_x(out.astype(jnp.float32), 2.0, self.align_corners)
        attn = self.scale_attn(up3, train)
        attn = resize_x(attn, 2.0, self.align_corners)

        if self.attn_2b:
            logit_attn, aspp_attn_out = attn[..., 0:1], attn[..., 1:]
        else:
            logit_attn = aspp_attn_out = attn
        return {"cls_out": out, "logit_attn": logit_attn,
                "aspp_attn": aspp_attn_out, "aspp": aspp}

    def __call__(self, x, train: bool = False):
        return _mscale_call(self, x, train)


class MscaleBasic(nn.Module):
    """Plain trunk + seg head + mscale (reference: mscale.py:450-476)."""

    num_classes: int
    trunk: str = "hrnetv2"
    n_scales: Sequence[float] = ()
    lo_scale: float = 0.5
    align_corners: bool = False
    bot_ch: int = 256
    attn_inner_3x3: bool = True
    attn_old_arch: bool = False
    attn_dropout: bool = False
    fuse_aspp: bool = False
    remat: bool = False
    fused_stage1: bool = False
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.backbone, _, _, high_ch = get_trunk(
            self.trunk, remat=self.remat, dtype=self.dtype,
            align_corners=self.align_corners,
            fused_stage1=self.fused_stage1)
        self.cls_head = SegHead(self.num_classes, self.bot_ch,
                                dtype=self.dtype, name="cls_head")
        self.scale_attn = AttnHead(out_ch=1, bot_ch=self.bot_ch,
                                   inner_3x3=self.attn_inner_3x3,
                                   old_arch=self.attn_old_arch,
                                   dropout=self.attn_dropout,
                                   dtype=self.dtype, name="scale_attn")

    def _fwd(self, x, aspp_lo=None, aspp_attn=None, train=False):
        _, _, high = self.backbone(x, train)
        pred = self.cls_head(high, train)
        attn = self.scale_attn(high, train)
        pred = scale_as(pred.astype(jnp.float32), x, self.align_corners)
        attn = scale_as(attn, x, self.align_corners)
        return {"cls_out": pred, "logit_attn": attn, "aspp_attn": attn,
                "aspp": high}

    def __call__(self, x, train: bool = False):
        return _mscale_call(self, x, train)


class MscaleASPP(nn.Module):
    """trunk -> ASPP -> bot 1x1 -> seg head + attn head, mscale
    (reference ASPP(MscaleBase): mscale.py:479-511)."""

    num_classes: int
    trunk: str = "hrnetv2"
    aspp_bot_ch: int = 256
    n_scales: Sequence[float] = ()
    lo_scale: float = 0.5
    align_corners: bool = False
    bot_ch: int = 256
    attn_inner_3x3: bool = True
    attn_old_arch: bool = False
    attn_dropout: bool = False
    fuse_aspp: bool = False
    remat: bool = False
    fused_stage1: bool = False
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.backbone, _, _, high_ch = get_trunk(
            self.trunk, remat=self.remat, dtype=self.dtype,
            align_corners=self.align_corners,
            fused_stage1=self.fused_stage1)
        self.aspp, _ = make_aspp(self.aspp_bot_ch, 8, False,
                                 self.align_corners, self.dtype,
                                 name="aspp")
        self.bot_aspp = conv(256, 1, dtype=self.dtype, name="bot_aspp")
        self.final = SegHead(self.num_classes, self.bot_ch,
                             dtype=self.dtype, name="final")
        self.scale_attn = AttnHead(out_ch=1, bot_ch=self.bot_ch,
                                   inner_3x3=self.attn_inner_3x3,
                                   old_arch=self.attn_old_arch,
                                   dropout=self.attn_dropout,
                                   dtype=self.dtype, name="scale_attn")

    def _fwd(self, x, aspp_lo=None, aspp_attn=None, train=False):
        """(reference: mscale.py:496-511)"""
        _, _, high = self.backbone(x, train)
        aspp = self.aspp(high, train)
        aspp = self.bot_aspp(aspp)
        pred = self.final(aspp, train)
        attn = self.scale_attn(aspp, train)
        pred = scale_as(pred.astype(jnp.float32), x, self.align_corners)
        attn = scale_as(attn, x, self.align_corners)
        return {"cls_out": pred, "logit_attn": attn, "aspp_attn": attn,
                "aspp": aspp}

    def __call__(self, x, train: bool = False):
        return _mscale_call(self, x, train)


def _common(cfg):
    return dict(num_classes=cfg.dataset.num_classes,
                n_scales=tuple(cfg.model.n_scales or ()),
                lo_scale=cfg.model.mscale_lo_scale,
                align_corners=cfg.model.align_corners,
                bot_ch=cfg.model.segattn_bot_ch,
                attn_inner_3x3=cfg.model.mscale_inner_3x3,
                attn_old_arch=cfg.model.mscale_old_arch,
                attn_dropout=cfg.model.mscale_dropout,
                remat=cfg.model.remat,
                fused_stage1=cfg.model.fused_stage1,
                dtype=jnp.dtype(cfg.model.compute_dtype))


# factories (reference: mscale.py:331-360, 436-447, 479-...)
def DeepV3R50(cfg):
    return MscaleV3Plus(trunk="resnet-50", **_common(cfg))


def DeepV3W38(cfg):
    return MscaleV3Plus(trunk="wrn38", **_common(cfg))


def DeepV3W38Fuse(cfg):
    return MscaleV3Plus(trunk="wrn38", fuse_aspp=True, **_common(cfg))


def DeepV3W38Fuse2(cfg):
    return MscaleV3Plus(trunk="wrn38", fuse_aspp=True, attn_2b=True,
                        **_common(cfg))


def DeepV3X71(cfg):
    return MscaleV3Plus(trunk="xception71", **_common(cfg))


def DeepV3EffB4(cfg):
    """(reference: mscale.py:349-351 — dead code there: get_trunk has no
    efficientnet_b4 branch; working flax trunk here)"""
    return MscaleV3Plus(trunk="efficientnet_b4", **_common(cfg))


def DeepV3EffB4Fuse(cfg):
    """(reference: mscale.py:354-357)"""
    return MscaleV3Plus(trunk="efficientnet_b4", fuse_aspp=True,
                        **_common(cfg))


def DeeperW38(cfg):
    return MscaleDeeper(trunk="wrn38", **_common(cfg))


def DeeperX71(cfg):
    return MscaleDeeper(trunk="xception71", **_common(cfg))


def DeeperEffB4(cfg):
    """(reference: mscale.py:445-447)"""
    return MscaleDeeper(trunk="efficientnet_b4", **_common(cfg))


def Basic(cfg):
    return MscaleBasic(trunk="hrnetv2", **_common(cfg))


def HRNet(cfg):
    """(reference: mscale.py:474-476)"""
    return MscaleBasic(trunk="hrnetv2", **_common(cfg))


def HRNet_ASP(cfg):
    """(reference: mscale.py:514-515)"""
    return MscaleASPP(trunk="hrnetv2", aspp_bot_ch=cfg.model.aspp_bot_ch,
                      **_common(cfg))


def DeepV3W38Tiny(cfg):
    return MscaleV3Plus(trunk="wrn38_tiny", **{**_common(cfg),
                                               "bot_ch": 16})
