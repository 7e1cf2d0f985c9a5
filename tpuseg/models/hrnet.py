"""HRNetV2-W48 trunk in flax (NHWC, stride-4 high-res branch).

Architecture per the reference trunk (network/hrnetv2.py:263-449, stage spec
config.py:161-190): stem (2x stride-2 3x3) -> 4 bottleneck blocks ->
three multi-resolution stages with repeated cross-resolution fusion ->
final upsample-concat of all four branches (48+96+192+384 = 720 ch).

TPU-first choices:
- bilinear upsample in fusion uses the torch-parity gather resize
  (align_corners=False default), computed in f32 islands;
- every HighResolutionModule is optionally rematerialized
  (``jax.checkpoint``) — the reference's dead ``--grad_ckpt`` flag made
  real, needed for 1024x2048 crops (SURVEY §2.8 row 8);
- module names mirror the torch state-dict tree so the checkpoint
  converter (tools/convert_torch_ckpt.py) is a mechanical key map.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tpuseg.models.layers import Norm, conv, hrnet_normal
from tpuseg.ops import resize_bilinear

Dtype = Any


@dataclass(frozen=True)
class HRNetSpec:
    """Stage spec; defaults = HRNetV2-W48 (reference: config.py:161-190)."""

    stage1_blocks: int = 4
    stage1_channels: int = 64
    stage2_modules: int = 1
    stage2_channels: Sequence[int] = (48, 96)
    stage2_blocks: int = 4
    stage3_modules: int = 4
    stage3_channels: Sequence[int] = (48, 96, 192)
    stage3_blocks: int = 4
    stage4_modules: int = 3
    stage4_channels: Sequence[int] = (48, 96, 192, 384)
    stage4_blocks: int = 4

    @property
    def high_level_ch(self) -> int:
        return int(sum(self.stage4_channels))


W48_SPEC = HRNetSpec()
# Smaller spec for tests/smoke runs (same topology, tiny widths)
TINY_SPEC = HRNetSpec(
    stage1_blocks=1, stage1_channels=8,
    stage2_modules=1, stage2_channels=(8, 16), stage2_blocks=1,
    stage3_modules=1, stage3_channels=(8, 16, 32), stage3_blocks=1,
    stage4_modules=1, stage4_channels=(8, 16, 32, 64), stage4_blocks=1,
)


class BasicBlock(nn.Module):
    """3x3 -> BN -> relu -> 3x3 -> BN + residual (reference: hrnetv2.py:37-66)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = conv(self.planes, 3, self.stride, dtype=self.dtype,
                 kernel_init=hrnet_normal, name="conv1")(x)
        y = Norm(dtype=self.dtype, name="bn1")(y, train)
        y = nn.relu(y)
        y = conv(self.planes, 3, dtype=self.dtype,
                 kernel_init=hrnet_normal, name="conv2")(y)
        y = Norm(dtype=self.dtype, name="bn2")(y, train)
        if self.downsample:
            residual = conv(self.planes, 1, self.stride, dtype=self.dtype,
                            kernel_init=hrnet_normal, name="downsample_conv")(x)
            residual = Norm(dtype=self.dtype, name="downsample_bn")(residual, train)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1(x4) bottleneck (reference: hrnetv2.py:69-106)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.bfloat16
    fused_kernel: bool = False
    expansion: int = 4

    # the fused Pallas megakernel's tile grid (th | H, tw | W required;
    # tw is lane-aligned at 128). Shapes that don't divide fall back to
    # the XLA path below — both compute the same folded eval math
    # (tests/test_pallas_kernels.py::test_fused_bottleneck_matches_model_block)
    _TH, _TW = 16, 128

    def _fused_eval(self, x):
        """Inference-only VMEM-resident fused block (BN folded on the fly
        from this module's own variables — tpuseg/kernels/bottleneck_fused)."""
        from tpuseg.kernels.bottleneck_fused import fold_bn, fused_bottleneck

        folded = []
        for name in ("conv1", "conv2", "conv3"):
            bn = self.get_variable("params", name.replace("conv", "bn"))["bn"]
            st = self.get_variable("batch_stats",
                                   name.replace("conv", "bn"))["bn"]
            k, b = fold_bn(self.get_variable("params", name)["kernel"],
                           bn["scale"], bn["bias"], st["mean"], st["var"])
            kh, kw, cin, cout = k.shape
            folded += [k.reshape(kh * kw, cin, cout).squeeze(0)
                       if kh == 1 else k.reshape(9, cin, cout), b]
        return fused_bottleneck(x.astype(jnp.bfloat16), *folded,
                                th=self._TH, tw=self._TW)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if (self.fused_kernel and not train and not self.downsample
                and self.stride == 1 and not self.is_initializing()
                and self.has_variable("params", "conv1")
                and self.dtype == jnp.bfloat16 and x.shape[0] == 1
                and x.shape[1] % self._TH == 0
                and x.shape[2] % self._TW == 0
                and x.shape[3] == self.planes * self.expansion):
            return self._fused_eval(x)
        residual = x
        y = conv(self.planes, 1, dtype=self.dtype,
                 kernel_init=hrnet_normal, name="conv1")(x)
        y = Norm(dtype=self.dtype, name="bn1")(y, train)
        y = nn.relu(y)
        y = conv(self.planes, 3, self.stride, dtype=self.dtype,
                 kernel_init=hrnet_normal, name="conv2")(y)
        y = Norm(dtype=self.dtype, name="bn2")(y, train)
        y = nn.relu(y)
        y = conv(self.planes * self.expansion, 1, dtype=self.dtype,
                 kernel_init=hrnet_normal, name="conv3")(y)
        y = Norm(dtype=self.dtype, name="bn3")(y, train)
        if self.downsample:
            residual = conv(self.planes * self.expansion, 1, self.stride,
                            dtype=self.dtype, kernel_init=hrnet_normal,
                            name="downsample_conv")(x)
            residual = Norm(dtype=self.dtype, name="downsample_bn")(residual, train)
        return nn.relu(y + residual)


class HRModule(nn.Module):
    """One HighResolutionModule: per-branch basic blocks + full cross-scale
    fusion (reference: hrnetv2.py:109-254)."""

    channels: Sequence[int]
    num_blocks: int
    align_corners: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, xs, train: bool = False):
        n = len(self.channels)
        # branches
        ys = []
        for i in range(n):
            y = xs[i]
            for b in range(self.num_blocks):
                need_ds = b == 0 and y.shape[-1] != self.channels[i]
                y = BasicBlock(self.channels[i], downsample=need_ds,
                               dtype=self.dtype, name=f"branch{i}_block{b}")(y, train)
            ys.append(y)
        if n == 1:
            return ys

        # full fusion: every output branch i sums contributions from every j
        fused = []
        for i in range(n):
            acc = None
            for j in range(n):
                if j == i:
                    contrib = ys[j]
                elif j > i:
                    # 1x1 to C_i, BN, then bilinear upsample to branch-i size
                    # (reference: hrnetv2.py:191-199, 243-249)
                    contrib = conv(self.channels[i], 1, dtype=self.dtype,
                                   kernel_init=hrnet_normal,
                                   name=f"fuse{i}_{j}_conv")(ys[j])
                    contrib = Norm(dtype=self.dtype,
                                   name=f"fuse{i}_{j}_bn")(contrib, train)
                    contrib = resize_bilinear(
                        contrib, ys[i].shape[-3:-1], self.align_corners)
                else:
                    # (i-j) stride-2 3x3 convs; last outputs C_i without relu
                    # (reference: hrnetv2.py:203-222)
                    contrib = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        out_ch = self.channels[i] if last else self.channels[j]
                        contrib = conv(out_ch, 3, 2, dtype=self.dtype,
                                       kernel_init=hrnet_normal,
                                       name=f"fuse{i}_{j}_conv{k}")(contrib)
                        contrib = Norm(dtype=self.dtype,
                                       name=f"fuse{i}_{j}_bn{k}")(contrib, train)
                        if not last:
                            contrib = nn.relu(contrib)
                acc = contrib if acc is None else acc + contrib
            fused.append(nn.relu(acc))
        return fused


class Transition(nn.Module):
    """Channel-adapt existing branches + spawn new lower-res branch
    (reference: hrnetv2.py:317-351)."""

    prev_channels: Sequence[int]
    next_channels: Sequence[int]
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, xs, train: bool = False):
        n_prev, n_next = len(self.prev_channels), len(self.next_channels)
        out = []
        for i in range(n_next):
            if i < n_prev:
                if self.prev_channels[i] != self.next_channels[i]:
                    y = conv(self.next_channels[i], 3, dtype=self.dtype,
                             kernel_init=hrnet_normal, name=f"t{i}_conv")(xs[i])
                    y = Norm(dtype=self.dtype, name=f"t{i}_bn")(y, train)
                    out.append(nn.relu(y))
                else:
                    out.append(xs[i])
            else:
                # new branch: stride-2 conv(s) from the lowest-res branch
                y = xs[-1]
                for j in range(i + 1 - n_prev):
                    out_ch = self.next_channels[i] if j == i - n_prev else \
                        self.prev_channels[-1]
                    y = conv(out_ch, 3, 2, dtype=self.dtype,
                             kernel_init=hrnet_normal, name=f"t{i}_conv{j}")(y)
                    y = Norm(dtype=self.dtype, name=f"t{i}_bn{j}")(y, train)
                    y = nn.relu(y)
                out.append(y)
        return out


class HRNetV2(nn.Module):
    """Full trunk. Returns ``(None, None, high_level_features)`` matching
    the reference trunk triple contract (network/hrnetv2.py:399-449)."""

    spec: HRNetSpec = W48_SPEC
    align_corners: bool = False
    # False = no remat; True = remat every stage; a tuple of stage numbers
    # (e.g. (1, 2, 3)) remats only those stages — selective remat trades a
    # little activation memory for skipping the recompute of the excluded
    # (usually most expensive) stages
    remat: bool = False
    dtype: Dtype = jnp.bfloat16
    # opt-in inference megakernel for the stage-1 identity bottlenecks
    # (tpuseg/kernels/bottleneck_fused.py; benched by tools/bench_megakernel.py)
    fused_stage1: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = self.spec
        stages = (tuple(self.remat) if isinstance(self.remat, (tuple, list))
                  else ((1, 2, 3, 4) if self.remat else ()))
        RHRM = nn.remat(HRModule, static_argnums=(2,))
        HRM2 = RHRM if 2 in stages else HRModule
        HRM3 = RHRM if 3 in stages else HRModule
        HRM4 = RHRM if 4 in stages else HRModule
        BNK = nn.remat(Bottleneck, static_argnums=(2,)) if 1 in stages \
            else Bottleneck

        # stem: two stride-2 3x3 convs (reference: hrnetv2.py:270-276)
        x = conv(64, 3, 2, dtype=self.dtype, kernel_init=hrnet_normal,
                 name="stem_conv1")(x)
        x = Norm(dtype=self.dtype, name="stem_bn1")(x, train)
        x = nn.relu(x)
        x = conv(64, 3, 2, dtype=self.dtype, kernel_init=hrnet_normal,
                 name="stem_conv2")(x)
        x = Norm(dtype=self.dtype, name="stem_bn2")(x, train)
        x = nn.relu(x)

        # stage 1: bottleneck stack (reference: hrnetv2.py:278-283)
        for b in range(s.stage1_blocks):
            need_ds = b == 0
            x = BNK(s.stage1_channels, downsample=need_ds, dtype=self.dtype,
                    fused_kernel=self.fused_stage1,
                    name=f"layer1_block{b}")(x, train)
        stage1_out = s.stage1_channels * Bottleneck.expansion

        xs = Transition((stage1_out,), tuple(s.stage2_channels),
                        dtype=self.dtype, name="transition1")([x], train)
        for m in range(s.stage2_modules):
            xs = HRM2(tuple(s.stage2_channels), s.stage2_blocks,
                      self.align_corners, self.dtype, name=f"stage2_m{m}")(xs, train)

        xs = Transition(tuple(s.stage2_channels), tuple(s.stage3_channels),
                        dtype=self.dtype, name="transition2")(xs, train)
        for m in range(s.stage3_modules):
            xs = HRM3(tuple(s.stage3_channels), s.stage3_blocks,
                      self.align_corners, self.dtype, name=f"stage3_m{m}")(xs, train)

        xs = Transition(tuple(s.stage3_channels), tuple(s.stage4_channels),
                        dtype=self.dtype, name="transition3")(xs, train)
        for m in range(s.stage4_modules):
            xs = HRM4(tuple(s.stage4_channels), s.stage4_blocks,
                      self.align_corners, self.dtype, name=f"stage4_m{m}")(xs, train)

        # final 4-branch upsample-concat (reference: hrnetv2.py:438-447)
        size = xs[0].shape[-3:-1]
        ups = [xs[0]] + [
            resize_bilinear(b, size, self.align_corners) for b in xs[1:]
        ]
        feats = jnp.concatenate([u.astype(self.dtype) for u in ups], axis=-1)
        return None, None, feats
