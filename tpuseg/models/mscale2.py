"""mscale2: attention predicted from CONCATENATED features of both scales
(reference: network/mscale2.py — cat[feats_lo, feats_hi] -> scale_attn,
instead of low-scale features alone)."""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tpuseg.models.heads import make_aspp
from tpuseg.models.layers import AttnHead, ConvNormAct, SegHead, conv
from tpuseg.models.trunks import get_trunk
from tpuseg.ops import resize_bilinear, resize_x, scale_as

Dtype = Any


class _AttnHeadNoSigmoidLast(nn.Module):
    """conv3x3-BN-relu x2 -> 1x1 -> sigmoid with 256 bottleneck
    (reference mscale2.py:193-202 hard-codes this stack)."""

    bot_ch: int = 256
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvNormAct(self.bot_ch, 3, dtype=self.dtype, name="conv0")(x, train)
        x = ConvNormAct(self.bot_ch, 3, dtype=self.dtype, name="conv1")(x, train)
        x = conv(1, 1, dtype=self.dtype, name="cls")(x)
        return nn.sigmoid(x.astype(jnp.float32))


def _two_scale2(model, x_1x, train):
    """(reference: mscale2.py:131-157) — attention from both scales' feats,
    computed at the LOW-scale feature resolution for V3Plus."""
    x_lo = resize_x(x_1x, model.lo_scale, model.align_corners)
    p_lo, feats_lo = model._fwd(x_lo, train=train)
    p_1x, feats_hi = model._fwd(x_1x, train=train)

    feats_hi_s = scale_as(feats_hi, feats_lo, model.align_corners)
    cat_feats = jnp.concatenate(
        [feats_lo, feats_hi_s.astype(feats_lo.dtype)], axis=-1)
    attn = model.scale_attn(cat_feats, train)
    attn = scale_as(attn, p_lo, model.align_corners)

    p_lo = attn * p_lo.astype(jnp.float32)
    p_lo = scale_as(p_lo, p_1x, model.align_corners)
    attn_1x = scale_as(attn, p_1x, model.align_corners)
    joint = p_lo + (1.0 - attn_1x) * p_1x.astype(jnp.float32)
    return {"pred": joint, "attn_10x": attn_1x}


def _nscale2(model, x_1x, scales, train):
    """(reference: mscale2.py:55-129)"""
    assert 1.0 in [float(s) for s in scales]
    scales = sorted([float(s) for s in scales], reverse=True)
    pred = None
    last_feats = None
    attn = None
    for idx, s in enumerate(scales):
        x = x_1x if s == 1.0 else resize_x(x_1x, s, model.align_corners)
        p, feats = model._fwd(x, train=train)
        p = p.astype(jnp.float32)
        if idx > 0:
            last_feats_s = scale_as(last_feats, feats, model.align_corners)
            cat_feats = jnp.concatenate(
                [feats, last_feats_s.astype(feats.dtype)], axis=-1)
            attn = model.scale_attn(cat_feats, train)
            attn = scale_as(attn, p, model.align_corners)

        if pred is None:
            pred = p
        elif s >= 1.0:
            pred = scale_as(pred, p, model.align_corners)
            pred = attn * p + (1.0 - attn) * pred
        else:
            p = scale_as(attn * p, pred, model.align_corners)
            attn = scale_as(attn, pred, model.align_corners)
            pred = p + (1.0 - attn) * pred
        last_feats = feats
    return {"pred": pred, "attn_10x": attn}


class MscaleV3Plus2(nn.Module):
    """(reference: mscale2.py:165-225)"""

    num_classes: int
    trunk: str = "wrn38"
    n_scales: Sequence[float] = ()
    lo_scale: float = 0.5
    align_corners: bool = False
    attn_old_arch: bool = False
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
        self.bot_fine = conv(48, 1, dtype=self.dtype, name="bot_fine")
        self.bot_aspp = conv(256, 1, dtype=self.dtype, name="bot_aspp")
        self.final1 = ConvNormAct(256, 3, dtype=self.dtype, name="final1")
        self.final2 = ConvNormAct(256, 3, dtype=self.dtype, name="final2")
        self.final_cls = conv(self.num_classes, 1, dtype=self.dtype,
                              name="final_cls")
        self.scale_attn = _AttnHeadNoSigmoidLast(dtype=self.dtype,
                                                 name="scale_attn")

    def _fwd(self, x, train=False):
        s2, _, high = self.backbone(x, train)
        aspp = self.aspp(high, train)
        conv_aspp = self.bot_aspp(aspp)
        conv_s2 = self.bot_fine(s2)
        conv_aspp = resize_bilinear(conv_aspp, s2.shape[-3:-1],
                                    self.align_corners).astype(self.dtype)
        cat_s4 = jnp.concatenate([conv_s2, conv_aspp], axis=-1)
        y = self.final1(cat_s4, train)
        y = self.final2(y, train)
        out = self.final_cls(y)
        out = scale_as(out.astype(jnp.float32), x, self.align_corners)
        return out, cat_s4

    def __call__(self, x, train: bool = False):
        if not train and self.n_scales:
            return _nscale2(self, x, self.n_scales, train)
        return _two_scale2(self, x, train)


class Basic2(nn.Module):
    """Trunk + seg head, attention from both scales' trunk features
    (reference: mscale2.py:231-282). NOTE the reference's Basic scales
    feats_lo UP to feats_hi (mscale2.py:253-256), opposite of V3Plus.

    The reference class is broken as-shipped: it calls
    ``make_attn_head(in_ch=..., bot_ch=256, out_ch=1)`` (mscale2.py:243)
    but make_attn_head takes only (in_ch, out_ch) (utils.py:343) —
    TypeError on construction. This implements the evident intent:
    bot_ch 256, the standard attn head."""

    num_classes: int
    trunk: str = "hrnetv2"
    n_scales: Sequence[float] = ()
    lo_scale: float = 0.5
    align_corners: bool = False
    attn_old_arch: bool = False
    remat: bool = False
    fused_stage1: bool = False
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.backbone, _, _, high_ch = get_trunk(
            self.trunk, remat=self.remat, dtype=self.dtype,
            align_corners=self.align_corners,
            fused_stage1=self.fused_stage1)
        self.cls_head = SegHead(self.num_classes, 256, dtype=self.dtype,
                                name="cls_head")
        self.scale_attn = AttnHead(out_ch=1, bot_ch=256,
                                   old_arch=self.attn_old_arch,
                                   dtype=self.dtype, name="scale_attn")

    def _fwd(self, x, train=False):
        _, _, high = self.backbone(x, train)
        pred = self.cls_head(high, train)
        pred = scale_as(pred.astype(jnp.float32), x, self.align_corners)
        return pred, high

    def __call__(self, x, train: bool = False):
        if not train and self.n_scales:
            return _nscale2(self, x, self.n_scales, train)
        # two-scale with lo feats upscaled to hi (reference: mscale2.py:242-268)
        x_lo = resize_x(x, self.lo_scale, self.align_corners)
        p_lo, feats_lo = self._fwd(x_lo, train=train)
        p_1x, feats_hi = self._fwd(x, train=train)
        feats_lo_s = scale_as(feats_lo, feats_hi, self.align_corners)
        cat_feats = jnp.concatenate(
            [feats_lo_s.astype(feats_hi.dtype), feats_hi], axis=-1)
        attn = self.scale_attn(cat_feats, train)
        attn_lo = scale_as(attn, p_lo, self.align_corners)
        attn_1x = scale_as(attn, p_1x, self.align_corners)
        p_lo = scale_as(attn_lo * p_lo, p_1x, self.align_corners)
        joint = p_lo + (1.0 - attn_1x) * p_1x
        return {"pred": joint, "attn_10x": attn_1x}


def _common(cfg):
    return dict(num_classes=cfg.dataset.num_classes,
                n_scales=tuple(cfg.model.n_scales or ()),
                lo_scale=cfg.model.mscale_lo_scale,
                align_corners=cfg.model.align_corners,
                attn_old_arch=cfg.model.mscale_old_arch,
                remat=cfg.model.remat,
                fused_stage1=cfg.model.fused_stage1,
                dtype=jnp.dtype(cfg.model.compute_dtype))


def DeepV3R50(cfg):
    return MscaleV3Plus2(trunk="resnet-50", **_common(cfg))


def DeepV3W38(cfg):
    return MscaleV3Plus2(trunk="wrn38", **_common(cfg))


def HRNet(cfg):
    return Basic2(trunk="hrnetv2", **_common(cfg))
