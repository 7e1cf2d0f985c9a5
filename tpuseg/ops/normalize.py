"""On-device input normalization for the uint8 transfer path.

The reference normalizes on the host (ToTensor + Normalize,
datasets/__init__.py:124-129) and ships float32 over PCIe. TPU-first,
the pixels travel as raw uint8 — 4x fewer host->device bytes — and the
jitted graph applies the exact same ImageNet normalization arithmetic in
float32 on device. The math is bit-identical to the host path
(``tpuseg.data.transforms.to_normalized_array``): same input bits, same
f32 op sequence ``(x / 255 - mean) / std`` (pinned by
tests/test_data.py::test_device_normalize_bitwise).

Every consumer gates on dtype, so float32 batches (host-normalized
loaders, synthetic data, existing tests) pass through untouched and the
wire format is purely a loader-side choice (``dataset.transfer_uint8``).
"""
from __future__ import annotations

import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def device_normalize(image, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """Normalize a uint8 (or any integer) NHWC image on device; float
    images are returned unchanged (already host-normalized). The dtype
    gate resolves at trace time — zero cost in the float32 graph."""
    if not jnp.issubdtype(image.dtype, jnp.integer):
        return image
    x = image.astype(jnp.float32) / jnp.float32(255.0)
    return ((x - jnp.asarray(mean, jnp.float32))
            / jnp.asarray(std, jnp.float32))


def device_label(label):
    """Cast a uint8-wire label map to the int32 the loss/metrics ops
    expect; int32 (and float relaxed-label tensors) pass through."""
    if jnp.issubdtype(label.dtype, jnp.integer) and label.dtype != jnp.int32:
        return label.astype(jnp.int32)
    return label
