"""Shared flax building blocks: conv/norm/activation, seg & attn heads.

TPU-native notes:
- NHWC everywhere (XLA's native conv layout on TPU).
- Convs use explicit symmetric padding numbers to match torch's
  ``padding=p`` semantics exactly (XLA ``SAME`` pads asymmetrically for
  stride-2/even-size, torch does not) — required for checkpoint parity.
- Batch norm: under ``jit`` + GSPMD with the batch sharded over the data
  axis, ``jnp.mean`` over the batch is a *global* mean — the compiler
  inserts the cross-replica collectives. Plain flax BatchNorm is therefore
  already the TPU-native equivalent of apex SyncBatchNorm
  (reference: config.py:216-225); ``axis_name`` is only needed under
  pmap/shard_map.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

# torch kaiming_normal_ default: fan_in, gain sqrt(2)
# (reference: network/mynn.py:27-39)
kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
# HRNet trunk init: normal(std=0.001) (reference: network/hrnetv2.py:457-458)
hrnet_normal = nn.initializers.normal(stddev=0.001)

Dtype = Any


class TorchBatchNorm(nn.BatchNorm):
    """flax BatchNorm with torch's running-variance semantics.

    torch.nn.BatchNorm2d normalizes the batch with the BIASED variance but
    updates ``running_var`` with the UNBIASED estimator (Bessel-corrected,
    ``n/(n-1)``); flax updates with the biased one. The normalization path
    (both train and eval) is bit-identical to ``nn.BatchNorm`` — only the
    ``batch_stats`` update differs, which is what the train-parity oracle
    (tests/test_train_parity.py) compares against the reference's
    post-forward running stats."""

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None, *,
                 mask=None):
        from flax.linen import normalization as _n

        use_running_average = nn.merge_param(
            "use_running_average", self.use_running_average,
            use_running_average)
        feature_axes = _n._canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(i for i in range(x.ndim)
                               if i not in feature_axes)
        feature_shape = [x.shape[ax] for ax in feature_axes]

        stats_dtype = (jnp.float32 if self.force_float32_reductions
                       else self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, stats_dtype),
                                feature_shape)
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, stats_dtype),
                               feature_shape)

        if use_running_average:
            mean = (ra_mean.value if self.force_float32_reductions
                    else jnp.asarray(ra_mean.value, self.param_dtype))
            var = (ra_var.value if self.force_float32_reductions
                   else jnp.asarray(ra_var.value, self.param_dtype))
        else:
            mean, var = _n._compute_stats(
                x, reduction_axes, dtype=self.dtype,
                axis_name=(self.axis_name if not self.is_initializing()
                           else None),
                axis_index_groups=self.axis_index_groups,
                use_fast_variance=self.use_fast_variance, mask=mask,
                force_float32_reductions=self.force_float32_reductions)
            if not self.is_initializing():
                n = 1
                for ax in reduction_axes:
                    n *= x.shape[ax]
                bessel = n / max(n - 1, 1)
                ra_mean.value = (self.momentum * ra_mean.value +
                                 (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value +
                                (1 - self.momentum) * (var * bessel))

        return _n._normalize(
            self, x, mean, var, reduction_axes, feature_axes, self.dtype,
            self.param_dtype, self.epsilon, self.use_bias, self.use_scale,
            self.bias_init, self.scale_init, self.force_float32_reductions)


class Norm(nn.Module):
    """Batch norm matching torch BatchNorm2d defaults
    (momentum 0.1 torch == 0.9 flax, eps 1e-5; reference: network/mynn.py:18-24,
    hrnetv2.py:26). Running stats follow torch's unbiased-variance update
    (TorchBatchNorm)."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.bfloat16
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return TorchBatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            axis_name=self.axis_name,
            # two-pass variance, as torch: E[(x-mu)^2] rather than
            # E[x^2]-E[x]^2 — the fast form loses ~3 decimal digits when
            # |mean| >> std and breaks train-path parity (the eval path
            # never computes batch stats, so only training pays the extra
            # channel reduction)
            use_fast_variance=False,
            name="bn",
        )(x)


class ConvNormAct(nn.Module):
    """conv -> BN -> (relu) with torch-style explicit padding
    (reference ConvBnRelu: network/utils.py:144-159)."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int | None = None      # default: (kernel-1)//2 * dilation
    dilation: int = 1
    groups: int = 1
    use_bias: bool = False
    act: bool = True
    momentum: float = 0.9
    dtype: Dtype = jnp.bfloat16
    kernel_init: Callable = kaiming_normal

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.padding
        if pad is None:
            pad = (self.kernel - 1) // 2 * self.dilation
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=self.kernel_init,
            name="conv",
        )(x)
        x = Norm(momentum=self.momentum, dtype=self.dtype, name="norm")(x, train)
        if self.act:
            x = nn.relu(x)
        return x


def conv(features, kernel, stride=1, padding=None, dilation=1, use_bias=False,
         dtype=jnp.bfloat16, kernel_init=kaiming_normal, name=None):
    """Bare torch-padded conv."""
    pad = padding if padding is not None else (kernel - 1) // 2 * dilation
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        kernel_dilation=(dilation, dilation),
        use_bias=use_bias, dtype=dtype, param_dtype=jnp.float32,
        kernel_init=kernel_init, name=name,
    )


class SegHead(nn.Module):
    """3x3 -> BN -> relu -> 3x3 -> BN -> relu -> 1x1 classifier
    (reference make_seg_head: network/utils.py:320-329)."""

    out_ch: int
    bot_ch: int = 256
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvNormAct(self.bot_ch, 3, dtype=self.dtype, name="conv0")(x, train)
        x = ConvNormAct(self.bot_ch, 3, dtype=self.dtype, name="conv1")(x, train)
        return conv(self.out_ch, 1, dtype=self.dtype, name="cls")(x)


class AttnHead(nn.Module):
    """Scale-attention head: conv-BN-relu (x2) -> 1x1 -> sigmoid
    (reference make_attn_head: network/utils.py:343-367).

    ``old_arch`` reproduces the reference's --mscale_old_arch variant
    (old_make_attn_head + init_attn: network/utils.py:332-381): always two
    3x3 conv-BN-relu blocks, then a final conv whose kernel size equals
    ``out_ch`` with no padding (the reference passes ``kernel_size=out_ch``
    — a quirk kept faithfully; it is 1x1 for the usual 1-channel head), all
    conv weights zero-initialized (init_attn; convs are bias-free so only
    the zeros matter — BN init is the default weight=1/bias=0).
    """

    out_ch: int = 1
    bot_ch: int = 256
    inner_3x3: bool = True
    dropout: bool = False
    old_arch: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.old_arch:
            x = ConvNormAct(self.bot_ch, 3, dtype=self.dtype,
                            kernel_init=nn.initializers.zeros,
                            name="conv0")(x, train)
            x = ConvNormAct(self.bot_ch, 3, dtype=self.dtype,
                            kernel_init=nn.initializers.zeros,
                            name="conv1")(x, train)
            x = conv(self.out_ch, self.out_ch, padding=0, dtype=self.dtype,
                     kernel_init=nn.initializers.zeros, name="cls")(x)
            return nn.sigmoid(x.astype(jnp.float32))
        x = ConvNormAct(self.bot_ch, 3, dtype=self.dtype, name="conv0")(x, train)
        if self.inner_3x3:
            x = ConvNormAct(self.bot_ch, 3, dtype=self.dtype, name="conv1")(x, train)
        if self.dropout:
            x = nn.Dropout(0.5, deterministic=not train)(x)
        x = conv(self.out_ch, 1, dtype=self.dtype, name="cls")(x)
        # sigmoid in f32: attention weights feed long fusion chains
        return nn.sigmoid(x.astype(jnp.float32))
