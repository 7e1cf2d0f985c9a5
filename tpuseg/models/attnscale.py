"""Attention-to-scale style models: run all N scales, predict per-scale
attention maps jointly from concatenated multi-scale features, weighted sum
(reference: network/attnscale.py:39-199)."""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tpuseg.evaluation.metrics import fmt_scale
from tpuseg.models.heads import make_aspp
from tpuseg.models.layers import ConvNormAct, conv
from tpuseg.models.trunks import get_trunk
from tpuseg.ops import resize_bilinear, resize_x, scale_as

Dtype = Any


class _ScaleAttnBN(nn.Module):
    """BN attention head -> num_scales channels
    (reference: attnscale.py:84-93)."""

    num_scales: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvNormAct(256, 3, dtype=self.dtype, name="conv0")(x, train)
        x = ConvNormAct(256, 3, dtype=self.dtype, name="conv1")(x, train)
        return conv(self.num_scales, 1, dtype=self.dtype, name="cls")(x)


class _ScaleAttnPlain(nn.Module):
    """conv3x3(512)-relu -> 1x1(num_scales) with the reference's odd
    padding=1 on the 1x1 (reference: attnscale.py:95-99)."""

    num_scales: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv(512, 3, dtype=self.dtype, name="conv0")(x)
        x = nn.relu(x)
        return conv(self.num_scales, 1, padding=1, dtype=self.dtype,
                    name="cls")(x)


class ASDV3P(nn.Module):
    """DeepLabV3+ trunk/decoder with joint multi-scale attention
    (reference: attnscale.py:39-199). Same graph train and eval."""

    num_classes: int
    trunk: str = "wrn38"
    scales: Sequence[float] = (0.5, 1.0, 2.0)
    use_dpc: bool = False
    bn_head: bool = False
    align_corners: bool = False
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
        self.final1 = ConvNormAct(256, 3, dtype=self.dtype, name="final1")
        self.final2 = ConvNormAct(256, 3, dtype=self.dtype, name="final2")
        self.final_cls = conv(self.num_classes, 1, dtype=self.dtype,
                              name="final_cls")
        n = len(self.scales)
        self.scale_attn = (_ScaleAttnBN(n, self.dtype, name="scale_attn")
                           if self.bn_head else
                           _ScaleAttnPlain(n, self.dtype, name="scale_attn"))

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
        """_forward_fused (reference: attnscale.py:139-185)."""
        scales = sorted([float(s) for s in self.scales])
        assert 1.0 in scales
        preds = {}
        p_1x, feats_1x = self._fwd(x, train=train)
        preds[1.0] = p_1x
        concat_feats = [feats_1x]
        for s in scales:
            if s == 1.0:
                continue
            xs = resize_x(x, s, self.align_corners)
            p, feats = self._fwd(xs, train=train)
            preds[s] = scale_as(p, x, self.align_corners)
            concat_feats.append(
                scale_as(feats, feats_1x,
                         self.align_corners).astype(feats_1x.dtype))

        attn_tensor = self.scale_attn(
            jnp.concatenate(concat_feats, axis=-1), train)
        attn_tensor = attn_tensor.astype(jnp.float32)

        out = {}
        output = None
        for idx, s in enumerate(scales):
            attn = scale_as(attn_tensor[..., idx:idx + 1], x,
                            self.align_corners)
            contrib = preds[s] * attn
            output = contrib if output is None else output + contrib
            out[fmt_scale("pred", s)] = preds[s]
            out[fmt_scale("attn", s)] = attn
        out["pred"] = output
        return out


class ASDV3P_Paired(nn.Module):
    """Pairwise variant: attention is predicted for ADJACENT scale pairs
    from their concatenated features, then normalized into a chain so the
    per-scale weights sum to 1 (reference: attnscale.py:199-366).

    Trains on (0.5, 1.0); inference can chain any sorted scale list.
    """

    num_classes: int
    trunk: str = "wrn38"
    inf_scales: Sequence[float] = (0.5, 1.0, 2.0)
    trn_scales: Sequence[float] = (0.5, 1.0)
    use_dpc: bool = False
    bn_head: bool = False
    align_corners: bool = False
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
        self.final1 = ConvNormAct(256, 3, dtype=self.dtype, name="final1")
        self.final2 = ConvNormAct(256, 3, dtype=self.dtype, name="final2")
        self.final_cls = conv(self.num_classes, 1, dtype=self.dtype,
                              name="final_cls")
        # paired head always sees 2 scales; bn_head adds a sigmoid
        # (reference: attnscale.py:242-258)
        self.scale_attn = (_ScaleAttnBN(2, self.dtype, name="scale_attn")
                           if self.bn_head else
                           _ScaleAttnPlain(2, self.dtype, name="scale_attn"))

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
        """_forward_paired (reference: attnscale.py:293-359)."""
        scales = sorted(self.trn_scales if train else self.inf_scales)
        assert 1.0 in scales
        preds = {}
        feats = {}
        preds[1.0], feats[1.0] = self._fwd(x, train=train)
        for s in scales:
            if s == 1.0:
                continue
            p, f = self._fwd(resize_x(x, s, self.align_corners), train=train)
            preds[s] = scale_as(p, x, self.align_corners)
            feats[s] = scale_as(f, feats[1.0],
                                self.align_corners).astype(feats[1.0].dtype)

        # attention per adjacent pair; bn_head applies its own sigmoid,
        # plain head is raw logits (as in the reference)
        attn = {}
        for i in range(len(scales) - 1):
            lo, hi = scales[i], scales[i + 1]
            pa = self.scale_attn(
                jnp.concatenate([feats[lo], feats[hi]], axis=-1), train)
            attn[lo] = scale_as(pa.astype(jnp.float32), x,
                                self.align_corners)

        # chain-normalize (reference: attnscale.py:330-345)
        norm_attn = {}
        last_attn = None
        for i in range(len(scales) - 1):
            lo, hi = scales[i], scales[i + 1]
            attn_lo = attn[lo][..., 0:1]
            attn_hi = attn[lo][..., 1:2]
            if last_attn is None:
                norm_attn[lo] = attn_lo
                norm_attn[hi] = attn_hi
            else:
                renorm = last_attn / (attn_lo + attn_hi + 1e-12)
                norm_attn[lo] = attn_lo * renorm
                norm_attn[hi] = attn_hi * renorm
            last_attn = attn_hi

        output = None
        out = {}
        for s in scales:
            contrib = preds[s] * norm_attn[s]
            output = contrib if output is None else output + contrib
            out[fmt_scale("pred", s)] = preds[s]
            out[fmt_scale("attn", s)] = norm_attn[s]
        out["pred"] = output
        return out


def _common(cfg):
    return dict(num_classes=cfg.dataset.num_classes,
                scales=tuple(cfg.model.n_scales or (0.5, 1.0, 2.0)),
                bn_head=cfg.model.attnscale_bn_head,
                align_corners=cfg.model.align_corners,
                remat=cfg.model.remat,
                fused_stage1=cfg.model.fused_stage1,
                dtype=jnp.dtype(cfg.model.compute_dtype))


def DeepV3R50(cfg):
    return ASDV3P(trunk="resnet-50", **_common(cfg))


def DeepV3R50B(cfg):
    return ASDV3P(trunk="resnet-50", **{**_common(cfg), "bn_head": True})


def DeepV3W38(cfg):
    return ASDV3P(trunk="wrn38", **_common(cfg))


def DeepV3R50BP(cfg):
    """Paired attention + BN head (reference: attnscale.py:370-372)."""
    kw = _common(cfg)
    kw["inf_scales"] = kw.pop("scales")
    return ASDV3P_Paired(trunk="resnet-50", **{**kw, "bn_head": True})
