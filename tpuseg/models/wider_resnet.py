"""WideResNet-38 trunk (pre-activation identity residual blocks), stride 8.

Reference: network/wider_resnet.py (WiderResNetA2 + wrn38 wrapper).
Structure [3, 3, 6, 3, 1, 1]; max-pool downsampling for mod2/mod3, strided
conv in mod4, dilation 2 in mod5 and 4 in mod6/mod7 for output stride 8;
dropout 0.3 / 0.5 in mod6 / mod7. Taps: s2 after mod2 (128ch), s4 after
mod3 (256ch), high-level after mod7 (4096ch, pre-activation — the
reference's wrn38 wrapper does NOT apply bn_out, wider_resnet.py:425-435).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tpuseg.models.layers import Norm, conv
from tpuseg.ops.resize import max_pool2d

Dtype = Any


class IdentityResidualBlock(nn.Module):
    """Pre-activation residual block, 2-conv (wide) or 3-conv (bottleneck)
    (reference: wider_resnet.py:67-185)."""

    channels: Sequence[int]
    stride: int = 1
    dilation: int = 1
    dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        is_bottleneck = len(self.channels) == 3
        need_proj = self.stride != 1 or x.shape[-1] != self.channels[-1]

        bn1 = nn.relu(Norm(dtype=self.dtype, name="bn1")(x, train))
        shortcut = x
        if need_proj:
            shortcut = conv(self.channels[-1], 1, self.stride,
                            dtype=self.dtype, name="proj_conv")(bn1)

        if not is_bottleneck:
            y = conv(self.channels[0], 3, self.stride,
                     dilation=self.dilation, dtype=self.dtype,
                     name="conv1")(bn1)
            y = nn.relu(Norm(dtype=self.dtype, name="bn2")(y, train))
            if self.dropout:
                y = nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                               deterministic=not train)(y)
            y = conv(self.channels[1], 3, dilation=self.dilation,
                     dtype=self.dtype, name="conv2")(y)
        else:
            y = conv(self.channels[0], 1, self.stride, dtype=self.dtype,
                     name="conv1")(bn1)
            y = nn.relu(Norm(dtype=self.dtype, name="bn2")(y, train))
            y = conv(self.channels[1], 3, dilation=self.dilation,
                     dtype=self.dtype, name="conv2")(y)
            y = nn.relu(Norm(dtype=self.dtype, name="bn3")(y, train))
            if self.dropout:
                y = nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                               deterministic=not train)(y)
            y = conv(self.channels[2], 1, dtype=self.dtype, name="conv3")(y)
        return y + shortcut


# module channel plans (reference: wider_resnet.py:317-318)
_CHANNELS = [(128, 128), (256, 256), (512, 512), (512, 1024),
             (512, 1024, 2048), (1024, 2048, 4096)]


class WRN38(nn.Module):
    """Dilated WideResNet-38-A2 trunk. Returns (s2, s4, high)."""

    structure: Sequence[int] = (3, 3, 6, 3, 1, 1)
    channels: Sequence = tuple(_CHANNELS)
    stem_ch: int = 64
    remat: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        IRB = nn.remat(IdentityResidualBlock, static_argnums=(2,)) \
            if self.remat else IdentityResidualBlock

        x = conv(self.stem_ch, 3, dtype=self.dtype, name="mod1_conv1")(x)

        feats = {}
        for mod_id, num in enumerate(self.structure):
            if mod_id < 2:  # maxpool before mod2/mod3
                x = max_pool2d(x, 3, 2, 1)
            for block_id in range(num):
                # dilated stride-8 config (reference: wider_resnet.py:326-333)
                if mod_id == 3:
                    dil = 2
                elif mod_id > 3:
                    dil = 4
                else:
                    dil = 1
                stride = 2 if block_id == 0 and mod_id == 2 else 1
                drop = 0.3 if mod_id == 4 else (0.5 if mod_id == 5 else 0.0)
                x = IRB(tuple(self.channels[mod_id]), stride, dil, drop,
                        dtype=self.dtype,
                        name=f"mod{mod_id + 2}_block{block_id + 1}")(x, train)
            if mod_id == 0:
                feats["s2"] = x
            elif mod_id == 1:
                feats["s4"] = x
        return feats["s2"], feats["s4"], x


# tiny variant for tests: same topology, 1 block and narrow channels per mod
TINY_WRN_STRUCTURE = (1, 1, 1, 1, 1, 1)
TINY_WRN_CHANNELS = ((8, 8), (16, 16), (16, 16), (16, 32),
                     (16, 32, 48), (32, 48, 64))
