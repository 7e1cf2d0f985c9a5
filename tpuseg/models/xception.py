"""Aligned Xception-71 trunk, output stride 8.

Reference: network/xception.py (entry/middle/exit flows; separable convs
with TF-style "fixed padding", dilation 2 in the 16 middle blocks and
(2, 4) in the exit flow at stride 8). Taps per the reference forward
(xception.py:201-256): at stride 8, low=stride-2 stem relu (64ch),
mid=stride-4 block1 output (128ch), high=exit conv5 (2048ch).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from tpuseg.models.layers import Norm, conv

Dtype = Any


class SeparableConv(nn.Module):
    """depthwise(3x3) -> BN -> pointwise(1x1), with TF fixed padding
    (reference: xception.py:15-40)."""

    features: int
    stride: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        eff = 3 + 2 * (self.dilation - 1)
        pad_beg = (eff - 1) // 2
        pad_end = eff - 1 - pad_beg
        y = nn.Conv(in_ch, (3, 3), strides=(self.stride, self.stride),
                    padding=[(pad_beg, pad_end), (pad_beg, pad_end)],
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=in_ch, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="depthwise")(x)
        y = Norm(dtype=self.dtype, name="bn")(y, train)
        return conv(self.features, 1, dtype=self.dtype, name="pointwise")(y)


class XceptionBlock(nn.Module):
    """(reference Block: xception.py:43-107)"""

    planes: int
    reps: int
    stride: int = 1
    dilation: int = 1
    start_with_relu: bool = True
    grow_first: bool = True
    is_last: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.start_with_relu:
            # the reference's leading ReLU is INPLACE (xception.py:56-60):
            # running rep() mutates the block input before the skip branch
            # reads it, so the skip (conv-skip AND identity-skip) actually
            # consumes relu(x). Trained checkpoints bake in this behavior —
            # reproduce it exactly.
            x = nn.relu(x)
        inp = x
        in_ch = x.shape[-1]
        first = True

        def maybe_relu(y):
            nonlocal first
            if first:
                first = False
                return y
            return nn.relu(y)

        idx = 0
        filters = in_ch
        if self.grow_first:
            x = maybe_relu(x)
            x = SeparableConv(self.planes, 1, self.dilation,
                              self.dtype, name=f"sep{idx}")(x, train)
            x = Norm(dtype=self.dtype, name=f"sepbn{idx}")(x, train)
            idx += 1
            filters = self.planes
        for _ in range(self.reps - 1):
            x = maybe_relu(x)
            x = SeparableConv(filters, 1, self.dilation,
                              self.dtype, name=f"sep{idx}")(x, train)
            x = Norm(dtype=self.dtype, name=f"sepbn{idx}")(x, train)
            idx += 1
        if not self.grow_first:
            x = maybe_relu(x)
            x = SeparableConv(self.planes, 1, self.dilation,
                              self.dtype, name=f"sep{idx}")(x, train)
            x = Norm(dtype=self.dtype, name=f"sepbn{idx}")(x, train)
            idx += 1
        if self.stride != 1:
            x = maybe_relu(x)
            x = SeparableConv(self.planes, 2, 1, self.dtype,
                              name=f"sep{idx}")(x, train)
            x = Norm(dtype=self.dtype, name=f"sepbn{idx}")(x, train)
            idx += 1
        elif self.is_last:
            x = maybe_relu(x)
            # the reference hard-codes dilation=1 for the is_last conv
            # (xception.py:87: SeparableConv2d(planes, planes, 3, 1)),
            # even when the block itself is dilated at output stride 8
            x = SeparableConv(self.planes, 1, 1, self.dtype,
                              name=f"sep{idx}")(x, train)
            x = Norm(dtype=self.dtype, name=f"sepbn{idx}")(x, train)
            idx += 1

        if self.planes != in_ch or self.stride != 1:
            skip = conv(self.planes, 1, self.stride, dtype=self.dtype,
                        name="skip_conv")(inp)
            skip = Norm(dtype=self.dtype, name="skip_bn")(skip, train)
        else:
            skip = inp
        return x + skip


class Xception71(nn.Module):
    """Returns (s2, s4, high) at output stride 8. ``middle_reps`` shrinks
    the 16-block middle flow for tests."""

    output_stride: int = 8
    middle_blocks: int = 16
    remat: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.output_stride == 8:
            mid_dil, exit_dils, exit_stride = 2, (2, 4), 1
        elif self.output_stride == 16:
            mid_dil, exit_dils, exit_stride = 1, (1, 2), 2
        else:
            raise ValueError(self.output_stride)
        BLK = nn.remat(XceptionBlock, static_argnums=(2,)) if self.remat \
            else XceptionBlock

        # entry flow
        x = conv(32, 3, 2, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(Norm(dtype=self.dtype, name="bn1")(x, train))
        x = conv(64, 3, dtype=self.dtype, name="conv2")(x)
        s2 = nn.relu(Norm(dtype=self.dtype, name="bn2")(x, train))

        s4 = BLK(128, 2, 2, 1, False, True, dtype=self.dtype,
                 name="block1")(s2, train)
        s4 = nn.relu(s4)
        x = BLK(256, 2, 1, 1, False, True, dtype=self.dtype,
                name="block2")(s4, train)
        x = BLK(728, 2, 2, 1, True, True, is_last=True, dtype=self.dtype,
                name="block3")(x, train)

        # middle flow
        for i in range(self.middle_blocks):
            x = BLK(728, 3, 1, mid_dil, True, True, dtype=self.dtype,
                    name=f"block{i + 4}")(x, train)

        # exit flow
        x = BLK(1024, 2, exit_stride, exit_dils[0], True, False,
                is_last=True, dtype=self.dtype, name="block20")(x, train)
        x = nn.relu(x)
        for i, ch in enumerate((1536, 1536, 2048)):
            x = SeparableConv(ch, 1, exit_dils[1], self.dtype,
                              name=f"conv{i + 3}")(x, train)
            x = nn.relu(Norm(dtype=self.dtype, name=f"bn{i + 3}")(x, train))
        return s2, s4, x
