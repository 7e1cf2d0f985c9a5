"""OCRNet and the flagship hierarchical multi-scale attention model.

Reference: network/ocrnet.py. Differences by design (TPU-first):
- the loss is NOT inside the model (the reference embeds the criterion so
  DataParallel gathers a scalar, ocrnet.py:113-122); models return logits
  dicts and losses are pure functions in :mod:`tpuseg.losses`;
- multi-scale fusion is delegated to the pure combinators in
  :mod:`tpuseg.models.mscale_core`.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tpuseg.models.hrnet import HRNetSpec, HRNetV2, W48_SPEC, TINY_SPEC
from tpuseg.models.layers import AttnHead
from tpuseg.models.mscale_core import nscale_fuse, two_scale_fuse
from tpuseg.models.ocr import OCRBlock
from tpuseg.ops import scale_as

Dtype = Any


class OCRNet(nn.Module):
    """trunk -> OCR -> cls+aux, upsampled to input size
    (reference: network/ocrnet.py:94-122)."""

    num_classes: int
    spec: HRNetSpec = W48_SPEC
    mid_channels: int = 512
    key_channels: int = 256
    ocr_dropout: float = 0.05
    align_corners: bool = False
    remat: bool = False
    use_pallas: bool = False
    fused_stage1: bool = False
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        self.backbone = HRNetV2(self.spec, self.align_corners, self.remat,
                                self.dtype, fused_stage1=self.fused_stage1,
                                name="backbone")
        self.ocr = OCRBlock(self.num_classes, self.mid_channels,
                            self.key_channels, self.use_pallas,
                            self.dtype, dropout=self.ocr_dropout,
                            name="ocr")

    def __call__(self, x, train: bool = False):
        _, _, high = self.backbone(x, train)
        cls_out, aux_out, _ = self.ocr(high, train)
        # cast BEFORE the resize: the f32 island must include the bilinear
        # interpolation (reference fp32 Upsample, mynn.py:42-51), else the
        # full-res logits are quantized to bf16 on the way out
        return {
            "pred": scale_as(cls_out.astype(jnp.float32), x,
                             self.align_corners),
            "aux": scale_as(aux_out.astype(jnp.float32), x,
                            self.align_corners),
        }


class OCRNetASPP(nn.Module):
    """trunk -> ASPP -> OCR -> cls+aux (reference: network/ocrnet.py:125-155)."""

    num_classes: int
    spec: HRNetSpec = W48_SPEC
    mid_channels: int = 512
    key_channels: int = 256
    ocr_dropout: float = 0.05
    align_corners: bool = False
    remat: bool = False
    use_pallas: bool = False
    fused_stage1: bool = False
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        from tpuseg.models.heads import make_aspp

        self.backbone = HRNetV2(self.spec, self.align_corners, self.remat,
                                self.dtype, fused_stage1=self.fused_stage1,
                                name="backbone")
        self.aspp, _ = make_aspp(256, output_stride=8,
                                 align_corners=self.align_corners,
                                 dtype=self.dtype, name="aspp")
        self.ocr = OCRBlock(self.num_classes, self.mid_channels,
                            self.key_channels, self.use_pallas,
                            self.dtype, dropout=self.ocr_dropout,
                            name="ocr")

    def __call__(self, x, train: bool = False):
        _, _, high = self.backbone(x, train)
        aspp = self.aspp(high, train)
        cls_out, aux_out, _ = self.ocr(aspp, train)
        return {
            "pred": scale_as(cls_out.astype(jnp.float32), x,
                             self.align_corners),
            "aux": scale_as(aux_out.astype(jnp.float32), x,
                            self.align_corners),
        }


class MscaleOCR(nn.Module):
    """Hierarchical multi-scale attention over HRNet-OCR — "the" model
    (reference: network/ocrnet.py:158-334).

    Train: fused 0.5x + 1.0x two-scale forward.
    Eval: chained n-scale fusion over ``n_scales`` (default {0.5, 1.0, 2.0}).
    """

    num_classes: int
    spec: HRNetSpec = W48_SPEC
    mid_channels: int = 512
    key_channels: int = 256
    ocr_dropout: float = 0.05
    n_scales: Sequence[float] = (0.5, 1.0, 2.0)
    lo_scale: float = 0.5
    align_corners: bool = False
    attn_bot_ch: int = 256
    attn_inner_3x3: bool = True
    attn_dropout: bool = False
    attn_old_arch: bool = False
    remat: bool = False
    use_pallas: bool = False
    fused_stage1: bool = False
    dtype: Dtype = jnp.bfloat16
    # dtype of the full-resolution upsample + fusion chains at EVAL time.
    # float32 reproduces the reference's AMP-O1 fp32 islands exactly;
    # bfloat16 halves the dominant HBM traffic (the reference itself runs
    # Mapillary eval in pure fp16 O3, README.md:73).
    fusion_dtype: str = "float32"

    def setup(self):
        self.backbone = HRNetV2(self.spec, self.align_corners, self.remat,
                                self.dtype, fused_stage1=self.fused_stage1,
                                name="backbone")
        self.ocr = OCRBlock(self.num_classes, self.mid_channels,
                            self.key_channels, self.use_pallas,
                            self.dtype, dropout=self.ocr_dropout,
                            name="ocr")
        self.scale_attn = AttnHead(out_ch=1, bot_ch=self.attn_bot_ch,
                                   inner_3x3=self.attn_inner_3x3,
                                   dropout=self.attn_dropout,
                                   old_arch=self.attn_old_arch,
                                   dtype=self.dtype, name="scale_attn")

    def single_scale(self, x, train: bool = False, need_aux: bool = True):
        """One full trunk+OCR+attention pass, outputs at input resolution
        (reference _fwd: ocrnet.py:170-183). ``need_aux=False`` skips the
        full-resolution aux upsample — the aux logits only feed training
        losses, so inference drops ~19 channels of f32 resize per scale."""
        _, _, high = self.backbone(x, train)
        cls_out, aux_out, ocr_mid = self.ocr(high, train)
        attn = self.scale_attn(ocr_mid, train)
        fdt = jnp.dtype(self.fusion_dtype) if not train else jnp.float32
        out = {
            "cls_out": scale_as(cls_out.astype(fdt), x, self.align_corners),
            "logit_attn": scale_as(attn.astype(fdt), x, self.align_corners),
        }
        if need_aux:
            out["aux_out"] = scale_as(aux_out.astype(fdt), x,
                                      self.align_corners)
        return out

    def __call__(self, x, train: bool = False):
        if not train and self.n_scales:
            fwd = lambda xi: self.single_scale(xi, train, need_aux=False)
            return nscale_fuse(fwd, x, self.n_scales, self.align_corners)
        fwd = lambda xi: self.single_scale(xi, train)
        return two_scale_fuse(fwd, x, self.lo_scale, self.align_corners)


def _common(cfg):
    return dict(
        num_classes=cfg.dataset.num_classes,
        mid_channels=cfg.model.ocr.mid_channels,
        key_channels=cfg.model.ocr.key_channels,
        ocr_dropout=cfg.model.ocr.dropout,
        align_corners=cfg.model.align_corners,
        remat=cfg.model.remat,
        use_pallas=cfg.model.use_pallas,
        fused_stage1=cfg.model.fused_stage1,
        dtype=jnp.dtype(cfg.model.compute_dtype),
    )


def HRNet(cfg):
    """Factory: plain HRNet-OCR (reference: ocrnet.py:337-338)."""
    return OCRNet(spec=W48_SPEC, **_common(cfg))


def HRNet_ASPP_OCR(cfg):
    """Factory: HRNet -> ASPP -> OCR (reference OCRNetASPP: ocrnet.py:125)."""
    return OCRNetASPP(spec=W48_SPEC, **_common(cfg))


def HRNet_Mscale(cfg):
    """Factory: HRNet-OCR + multi-scale attention (reference: ocrnet.py:341-342)."""
    return MscaleOCR(
        spec=W48_SPEC,
        n_scales=tuple(cfg.model.n_scales or ()),
        lo_scale=cfg.model.mscale_lo_scale,
        attn_bot_ch=cfg.model.segattn_bot_ch,
        attn_inner_3x3=cfg.model.mscale_inner_3x3,
        attn_dropout=cfg.model.mscale_dropout,
        attn_old_arch=cfg.model.mscale_old_arch,
        fusion_dtype=cfg.model.eval_fusion_dtype,
        **_common(cfg),
    )


def HRNet_Mscale_Tiny(cfg):
    """Tiny-width variant for smoke tests and CI."""
    return MscaleOCR(
        spec=TINY_SPEC,
        n_scales=tuple(cfg.model.n_scales or ()),
        lo_scale=cfg.model.mscale_lo_scale,
        attn_bot_ch=16,
        attn_inner_3x3=cfg.model.mscale_inner_3x3,
        attn_old_arch=cfg.model.mscale_old_arch,
        fusion_dtype=cfg.model.eval_fusion_dtype,
        **{**_common(cfg), "mid_channels": 32, "key_channels": 16},
    )
