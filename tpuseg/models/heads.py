"""ASPP / DPC context modules (reference: network/utils.py:162-311)."""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tpuseg.models.layers import ConvNormAct, Norm, conv
from tpuseg.ops import resize_bilinear

Dtype = Any


class ASPP(nn.Module):
    """Atrous Spatial Pyramid Pooling: 1x1 + three dilated 3x3 (rates
    doubled at stride 8 -> 12/24/36) + global image pooling, concatenated
    (reference AtrousSpatialPyramidPoolingModule: network/utils.py:162-218).
    Output channels = 5 * reduction_dim.
    """

    reduction_dim: int = 256
    output_stride: int = 8
    rates: Sequence[int] = (6, 12, 18)
    align_corners: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        rates = [2 * r for r in self.rates] if self.output_stride == 8 \
            else list(self.rates)

        # image-level features: global average pool -> 1x1 -> upsample
        img = jnp.mean(x, axis=(1, 2), keepdims=True)
        img = ConvNormAct(self.reduction_dim, 1, dtype=self.dtype,
                          name="img_conv")(img, train)
        img = resize_bilinear(img, x.shape[-3:-1], self.align_corners)
        outs = [img.astype(self.dtype)]

        outs.append(ConvNormAct(self.reduction_dim, 1, dtype=self.dtype,
                                name="branch0")(x, train))
        for i, r in enumerate(rates):
            outs.append(ConvNormAct(self.reduction_dim, 3, dilation=r,
                                    dtype=self.dtype,
                                    name=f"branch{i + 1}")(x, train))
        return jnp.concatenate(outs, axis=-1)


class _DPCConv(nn.Module):
    features: int
    rate: Tuple[int, int]
    separable: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        ry, rx = self.rate
        groups = self.features if self.separable else 1
        y = nn.Conv(self.features, (3, 3),
                    padding=[(ry, ry), (rx, rx)],
                    kernel_dilation=(ry, rx),
                    feature_group_count=groups,
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        y = Norm(dtype=self.dtype, name="norm")(y, train)
        return nn.relu(y)


class DPC(nn.Module):
    """Dense Prediction Cell (reference: network/utils.py:263-298)."""

    reduction_dim: int = 256
    output_stride: int = 8
    dropout: bool = False
    separable: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        rates = [(1, 6), (18, 15), (6, 21), (1, 1), (6, 3)]
        if self.output_stride == 8:
            rates = [(2 * ry, 2 * rx) for ry, rx in rates]
        a = _DPCConv(self.reduction_dim, rates[0], self.separable,
                     self.dtype, name="a")(x, train)
        b = _DPCConv(self.reduction_dim, rates[1], self.separable,
                     self.dtype, name="b")(a, train)
        c = _DPCConv(self.reduction_dim, rates[2], self.separable,
                     self.dtype, name="c")(a, train)
        d = _DPCConv(self.reduction_dim, rates[3], self.separable,
                     self.dtype, name="d")(a, train)
        e = _DPCConv(self.reduction_dim, rates[4], self.separable,
                     self.dtype, name="e")(b, train)
        out = jnp.concatenate([a, b, c, d, e], axis=-1)
        if self.dropout:
            out = nn.Dropout(0.1, deterministic=not train)(out)
        return out


def make_aspp(bottleneck_ch: int, output_stride: int, dpc: bool = False,
              align_corners: bool = False, dtype=jnp.bfloat16, name="aspp"):
    """-> (module, out_channels) (reference get_aspp:
    network/utils.py:301-311)."""
    if dpc:
        mod = DPC(bottleneck_ch, output_stride, dtype=dtype, name=name)
    else:
        mod = ASPP(bottleneck_ch, output_stride, align_corners=align_corners,
                   dtype=dtype, name=name)
    return mod, 5 * bottleneck_ch
