"""On-device input normalization for the uint8 transfer path.

The reference normalizes on the host (ToTensor + Normalize,
datasets/__init__.py:124-129) and ships float32 over PCIe. TPU-first,
the pixels travel as raw uint8 — 4x fewer host->device bytes — and the
jitted graph reproduces the host normalization BIT-EXACTLY on device.

Bit-exactness is by construction, not by arithmetic: a uint8 channel has
only 256 values, so the host precomputes the 256 x C table of normalized
values with the exact host-path numpy arithmetic
(``tpuseg.data.transforms.to_normalized_array``'s
``(x / 255 - mean) / std`` in f32) and the device does a pure gather of
those constants. Re-deriving the arithmetic in-graph is NOT safe: XLA's
fast-math/fusion re-rounds it differently depending on the surrounding
graph (measured up to ~260 ulp on XLA:CPU — a table lookup cannot be
re-rounded by any compiler pass). Pinned by
tests/test_data.py::test_device_normalize_bitwise, incl. under jit.

Every consumer gates on dtype, so float32 batches (host-normalized
loaders, synthetic data, existing tests) pass through untouched and the
wire format is purely a loader-side choice (``dataset.transfer_uint8``).
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@lru_cache(maxsize=8)
def _normalize_lut(mean: tuple, std: tuple) -> np.ndarray:
    """(C, 256) f32 table: lut[c, v] = host-normalized value of byte v in
    channel c — the identical numpy op sequence as to_normalized_array."""
    v = np.arange(256, dtype=np.float32)[None, :] / 255.0
    mean = np.asarray(mean, np.float32)[:, None]
    std = np.asarray(std, np.float32)[:, None]
    return (v - mean) / std


def device_normalize(image, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """Normalize an integer NHWC image on device; float images are
    returned unchanged (already host-normalized). The dtype gate resolves
    at trace time — zero cost in the float32 graph.

    Only uint8 (the wire format) rides the bit-exact table gather: the
    gather index is ``channel*256 + byte`` and ``jnp.take`` clips, so a
    wider integer dtype with values outside 0..255 would silently alias
    into a NEIGHBORING channel's table segment. Non-uint8 integer inputs
    therefore take the plain ``(x/255 - mean)/std`` arithmetic (correct
    for any integer value, but subject to XLA's fast-math re-rounding —
    not the bitwise path)."""
    if not jnp.issubdtype(image.dtype, jnp.integer):
        return image
    if image.dtype != jnp.uint8:
        x = image.astype(jnp.float32) / jnp.float32(255.0)
        return ((x - jnp.asarray(mean, jnp.float32))
                / jnp.asarray(std, jnp.float32))
    lut = _normalize_lut(tuple(float(m) for m in mean),
                         tuple(float(s) for s in std))
    c = image.shape[-1]
    assert lut.shape[0] == c, (lut.shape, image.shape)
    # one flat gather: index = channel * 256 + byte
    idx = (image.astype(jnp.int32)
           + (jnp.arange(c, dtype=jnp.int32) * 256))
    return jnp.take(jnp.asarray(lut.reshape(-1)), idx)


def device_label(label):
    """Cast a uint8-wire label map to the int32 the loss/metrics ops
    expect; int32 (and float relaxed-label tensors) pass through."""
    if jnp.issubdtype(label.dtype, jnp.integer) and label.dtype != jnp.int32:
        return label.astype(jnp.int32)
    return label
