"""SEResNeXt-50/101 trunks (squeeze-excite + grouped bottlenecks), stride 8.

Reference: network/SEresnext.py (SENet/SEModule/SEResNeXtBottleneck) with
the same stride-8 dilation rewrite as ResNet (network/utils.py:48-99:
layer3 conv2 dil 2, layer4 conv2 dil 4, downsample stride 1).
Channel contract per get_trunk: s2_ch=48... note the reference declares
s2_ch=48 but SEResNeXt layer1 outputs 256; DeepV3Plus only consumes
s2 via a 1x1 so we return the true tensor. high=2048.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tpuseg.models.layers import Norm, conv
from tpuseg.ops.resize import max_pool2d

Dtype = Any


class SEModule(nn.Module):
    """Squeeze-and-excite (reference: SEresnext.py:70-90)."""

    channels: int
    reduction: int = 16
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = conv(self.channels // self.reduction, 1, use_bias=True,
                 dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = conv(self.channels, 1, use_bias=True, dtype=self.dtype,
                 name="fc2")(s)
        return x * nn.sigmoid(s.astype(jnp.float32)).astype(x.dtype)


class SEResNeXtBottleneck(nn.Module):
    """ResNeXt bottleneck + SE (reference: SEresnext.py:170-191);
    base_width=4, groups=32."""

    planes: int
    groups: int = 32
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    base_width: int = 4
    dtype: Dtype = jnp.bfloat16
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        residual = x
        y = conv(width, 1, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(Norm(dtype=self.dtype, name="bn1")(y, train))
        y = nn.Conv(width, (3, 3), strides=(self.stride, self.stride),
                    padding=[(self.dilation,) * 2, (self.dilation,) * 2],
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv2")(y)
        y = nn.relu(Norm(dtype=self.dtype, name="bn2")(y, train))
        y = conv(self.planes * self.expansion, 1, dtype=self.dtype,
                 name="conv3")(y)
        y = Norm(dtype=self.dtype, name="bn3")(y, train)
        y = SEModule(self.planes * self.expansion,
                     dtype=self.dtype, name="se")(y)
        if self.downsample:
            residual = conv(self.planes * self.expansion, 1, self.stride,
                            dtype=self.dtype, name="downsample_conv")(x)
            residual = Norm(dtype=self.dtype, name="downsample_bn")(
                residual, train)
        return nn.relu(y + residual)


class SEResNeXt(nn.Module):
    """layers=(3,4,6,3) -> SEResNeXt-50; (3,4,23,3) -> -101. Returns
    (s2=layer1, None, high=layer4) at stride 8."""

    layers: Sequence[int] = (3, 4, 6, 3)
    output_stride: int = 8
    remat: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        BLK = nn.remat(SEResNeXtBottleneck, static_argnums=(2,)) \
            if self.remat else SEResNeXtBottleneck

        # SEResNeXt stem: single 7x7 s2 (reference input_3x3=False for
        # se_resnext variants, SEresnext.py:44-67) + Caffe-style maxpool
        # (padding 0, ceil_mode — SEresnext.py:269-272, NOT torchvision's
        # padding=1: same output size, different window alignment)
        x = conv(64, 7, 2, padding=3, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(Norm(dtype=self.dtype, name="bn1")(x, train))
        x = max_pool2d(x, 3, 2, 0, ceil_mode=True)

        if self.output_stride == 8:
            plan = [(64, 1, 1), (128, 2, 1), (256, 1, 2), (512, 1, 4)]
        else:
            plan = [(64, 1, 1), (128, 2, 1), (256, 2, 1), (512, 1, 2)]

        s2 = None
        for li, (n_blocks, (planes, stride, dil)) in enumerate(
                zip(self.layers, plan)):
            for b in range(n_blocks):
                x = BLK(planes, 32, stride if b == 0 else 1, dil,
                        downsample=(b == 0), dtype=self.dtype,
                        name=f"layer{li + 1}_block{b}")(x, train)
            if li == 0:
                s2 = x
        return s2, None, x


def se_resnext50(remat=False, dtype=jnp.bfloat16):
    return SEResNeXt((3, 4, 6, 3), remat=remat, dtype=dtype)


def se_resnext101(remat=False, dtype=jnp.bfloat16):
    return SEResNeXt((3, 4, 23, 3), remat=remat, dtype=dtype)
