"""EfficientNet-B4 trunk, output stride 8 (dilated), NHWC flax.

The reference ships four EffB4 factories (DeepV3EffB4 / DeepV3EffB4Fuse:
network/mscale.py:349-357, DeeperEffB4: network/mscale.py:445-447,
DeepV3PlusEffB4: network/deepv3.py:121-123) but its own
``get_trunk`` (network/utils.py:102-141) has NO ``efficientnet_b4``
branch and no geffnet import exists anywhere in the tree — every one of
those factories raises ``unknown backbone`` at construction. They are
dead code as shipped. This module supplies a WORKING trunk for those
archs, built from the paper spec (Tan & Le, arXiv:1905.11946):

- B0 stage table scaled by width 1.4 / depth 1.8 (the B4 coefficients),
  with the standard round_filters (divisor 8, >=90% guard) and
  ceil-based round_repeats;
- MBConv: 1x1 expand -> k x k depthwise -> squeeze-excite (ratio 0.25 of
  the block INPUT channels) -> 1x1 project, SiLU activations, BN eps 1e-3
  (the EfficientNet convention), residual + stochastic depth (drop-path
  0.2 linearly scaled over depth) on stride-1 same-channel blocks;
- output stride 8 like get_resnet's dilated rewrite (network/
  utils.py:48-99): the s16 stage runs stride 1 / dilation 2 and the s32
  stage stride 1 / dilation 4.

Taps per the (s2, s4, high) trunk contract: s2 = stage-1 output (24ch,
stride 2), s4 = stage-2 output (32ch, stride 4), high = stage-7 output
(448ch, stride 8).

Parameter naming follows the timm/geffnet checkpoint layout
(conv_stem / bn1 / blocks.{stage}.{block}.{conv_pw,bn1,conv_dw,bn2,
se.conv_reduce,se.conv_expand,conv_pwl,bn3}) so released pretrained
weights convert mechanically (tools/convert_torch_ckpt.trunk_key_fn);
no such checkpoint or torch implementation exists in this environment,
so unlike the other five trunks this one has no numerics oracle — the
architecture is gated on the citation above instead.
"""
from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpuseg.models.layers import Norm, kaiming_normal

Dtype = Any

# B0 stage table: (expand, channels, repeats, stride, kernel)
_B0_STAGES = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)
_B4_WIDTH, _B4_DEPTH = 1.4, 1.8


def round_filters(ch: float, width_mult: float, divisor: int = 8) -> int:
    """Standard EfficientNet channel rounding (paper Sec. 3.3 impl.)."""
    ch = ch * width_mult
    new = max(divisor, int(ch + divisor / 2) // divisor * divisor)
    if new < 0.9 * ch:
        new += divisor
    return int(new)


def round_repeats(n: int, depth_mult: float) -> int:
    return int(math.ceil(n * depth_mult))


def _drop_path(x, rate: float, deterministic: bool, rng):
    """Stochastic depth on the residual branch (per-sample)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    return x * mask / keep


class SqueezeExcite(nn.Module):
    """Global-pool -> 1x1 reduce -> SiLU -> 1x1 expand -> sigmoid gate."""

    se_ch: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2),
                     keepdims=True).astype(x.dtype)
        s = nn.Conv(self.se_ch, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=kaiming_normal,
                    name="conv_reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=kaiming_normal,
                    name="conv_expand")(s)
        # gate in f32: sigmoid saturates early in bf16
        return x * nn.sigmoid(s.astype(jnp.float32)).astype(x.dtype)


class MBConv(nn.Module):
    """Mobile inverted bottleneck with SE (timm InvertedResidual naming)."""

    features: int
    expand: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    se_ratio: float = 0.25
    drop_path: float = 0.0
    bn_eps: float = 1e-3
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        y = x
        if self.expand != 1:
            y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, kernel_init=kaiming_normal,
                        name="conv_pw")(y)
            y = Norm(epsilon=self.bn_eps, dtype=self.dtype,
                     name="bn1")(y, train)
            y = nn.silu(y)
        pad = (self.kernel - 1) // 2 * self.dilation
        y = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)],
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=mid, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=kaiming_normal, name="conv_dw")(y)
        y = Norm(epsilon=self.bn_eps, dtype=self.dtype,
                 name="bn2" if self.expand != 1 else "bn1")(y, train)
        y = nn.silu(y)
        if self.se_ratio > 0:
            y = SqueezeExcite(max(1, int(in_ch * self.se_ratio)),
                              dtype=self.dtype, name="se")(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=kaiming_normal,
                    name="conv_pwl" if self.expand != 1 else "conv_pw")(y)
        y = Norm(epsilon=self.bn_eps, dtype=self.dtype,
                 name="bn3" if self.expand != 1 else "bn2")(y, train)
        if self.stride == 1 and in_ch == self.features:
            if train and self.drop_path > 0:
                y = _drop_path(y, self.drop_path, deterministic=not train,
                               rng=self.make_rng("dropout"))
            y = y + x
        return y


class EfficientNetB4(nn.Module):
    """B4 trunk -> (s2 24ch, s4 32ch, high 448ch) at output stride 8."""

    output_stride: int = 8
    width_mult: float = _B4_WIDTH
    depth_mult: float = _B4_DEPTH
    drop_path_rate: float = 0.2
    remat: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        assert self.output_stride == 8, "stride-8 only (like the reference)"
        stem_ch = round_filters(32, self.width_mult)
        x = nn.Conv(stem_ch, (3, 3), strides=(2, 2),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=kaiming_normal, name="conv_stem")(x)
        x = Norm(epsilon=1e-3, dtype=self.dtype, name="bn1")(x, train)
        x = nn.silu(x)

        # total blocks for the linear drop-path schedule
        repeats = [round_repeats(n, self.depth_mult)
                   for (_, _, n, _, _) in _B0_STAGES]
        total = sum(repeats)
        done = 0

        s2 = s4 = None
        current_stride = 2   # after stem
        dilation = 1
        for si, (expand, c, _, stride, kernel) in enumerate(_B0_STAGES):
            features = round_filters(c, self.width_mult)
            # dilated rewrite past the output stride (get_resnet analogue:
            # reference network/utils.py:48-99)
            if stride == 2 and current_stride >= self.output_stride:
                dilation *= 2
                stride = 1
            block_cls = nn.remat(MBConv) if self.remat else MBConv
            for bi in range(repeats[si]):
                x = block_cls(
                    features=features, expand=expand, kernel=kernel,
                    stride=stride if bi == 0 else 1,
                    dilation=dilation,
                    drop_path=self.drop_path_rate * done / total,
                    dtype=self.dtype, name=f"blocks_{si}_{bi}")(x, train)
                done += 1
            if stride == 2:
                current_stride *= 2
            if si == 0:
                s2 = x      # 24ch, stride 2
            elif si == 1:
                s4 = x      # 32ch, stride 4
        return s2, s4, x    # high: 448ch, stride 8
