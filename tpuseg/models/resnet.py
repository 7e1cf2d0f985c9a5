"""ResNet-50/101 trunks, dilated for output stride 8.

Reference: network/Resnet.py + the stride-8 rewrite in network/utils.py:48-99
(layer3 conv2 dilation 2, layer4 conv2 dilation 4, downsample strides 1).
Built directly with the dilation plan instead of post-hoc module surgery.
Returns (s2=layer1, s4=None, high=layer4); channel contract per
get_trunk: s2_ch=256, high=2048 (network/utils.py:127-131).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tpuseg.models.layers import Norm, conv
from tpuseg.ops.resize import max_pool2d

Dtype = Any


class ResNetBottleneck(nn.Module):
    """torchvision-style bottleneck (1x1 -> 3x3 -> 1x1 x4)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.bfloat16
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = conv(self.planes, 1, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(Norm(dtype=self.dtype, name="bn1")(y, train))
        y = conv(self.planes, 3, self.stride, dilation=self.dilation,
                 dtype=self.dtype, name="conv2")(y)
        y = nn.relu(Norm(dtype=self.dtype, name="bn2")(y, train))
        y = conv(self.planes * self.expansion, 1, dtype=self.dtype,
                 name="conv3")(y)
        y = Norm(dtype=self.dtype, name="bn3")(y, train)
        if self.downsample:
            residual = conv(self.planes * self.expansion, 1, self.stride,
                            dtype=self.dtype, name="downsample_conv")(x)
            residual = Norm(dtype=self.dtype, name="downsample_bn")(
                residual, train)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Dilated ResNet trunk. layers=(3,4,6,3) -> R50; (3,4,23,3) -> R101."""

    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    output_stride: int = 8
    remat: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        BLK = nn.remat(ResNetBottleneck, static_argnums=(2,)) if self.remat \
            else ResNetBottleneck
        w = self.width

        # stem: 7x7 s2 + maxpool s2
        x = conv(w, 7, 2, padding=3, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(Norm(dtype=self.dtype, name="bn1")(x, train))
        x = max_pool2d(x, 3, 2, 1)

        # (planes, stride, dilation) per layer for stride 8
        if self.output_stride == 8:
            plan = [(w, 1, 1), (2 * w, 2, 1), (4 * w, 1, 2), (8 * w, 1, 4)]
        elif self.output_stride == 16:
            plan = [(w, 1, 1), (2 * w, 2, 1), (4 * w, 2, 1), (8 * w, 1, 2)]
        else:
            raise ValueError(self.output_stride)

        s2 = None
        for li, (n_blocks, (planes, stride, dil)) in enumerate(
                zip(self.layers, plan)):
            for b in range(n_blocks):
                need_ds = b == 0
                x = BLK(planes, stride if b == 0 else 1, dil,
                        downsample=need_ds, dtype=self.dtype,
                        name=f"layer{li + 1}_block{b}")(x, train)
            if li == 0:
                s2 = x
        return s2, None, x


def resnet50(remat=False, dtype=jnp.bfloat16):
    return ResNet((3, 4, 6, 3), remat=remat, dtype=dtype)


def resnet101(remat=False, dtype=jnp.bfloat16):
    return ResNet((3, 4, 23, 3), remat=remat, dtype=dtype)
