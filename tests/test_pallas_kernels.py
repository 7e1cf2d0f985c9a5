"""Pallas kernel correctness (interpret mode on CPU) — the real-TPU path is
exercised by bench.py / verify drives."""
import numpy as np
import pytest

import jax.numpy as jnp

from tpuseg.kernels.ocr_attention import (
    fused_object_attention,
    reference_object_attention,
)


@pytest.mark.parametrize("n,k,d", [(512, 19, 256), (700, 19, 256),
                                   (512, 65, 128), (100, 5, 128)])
def test_fused_attention_matches_reference(rng, n, k, d):
    q = jnp.asarray(rng.randn(2, n, d).astype(np.float32))
    key = jnp.asarray(rng.randn(2, k, d).astype(np.float32))
    val = jnp.asarray(rng.randn(2, k, d).astype(np.float32))
    got = fused_object_attention(q, key, val, interpret=True)
    want = reference_object_attention(q, key, val)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_attention_bf16(rng):
    q = jnp.asarray(rng.randn(1, 512, 256), jnp.bfloat16)
    key = jnp.asarray(rng.randn(1, 19, 256), jnp.bfloat16)
    val = jnp.asarray(rng.randn(1, 19, 256), jnp.bfloat16)
    got = fused_object_attention(q, key, val, interpret=True)
    want = reference_object_attention(q, key, val)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_softmax_ignores_padded_keys(rng):
    """Padded key slots (K -> 128 lanes) must not leak probability mass:
    compare K=19 against the same K embedded in a larger padded call."""
    q = jnp.asarray(rng.randn(1, 512, 256).astype(np.float32))
    key = jnp.asarray(rng.randn(1, 19, 256).astype(np.float32))
    val = jnp.asarray(rng.randn(1, 19, 256).astype(np.float32))
    base = np.asarray(fused_object_attention(q, key, val, interpret=True))
    # add huge-magnitude rows beyond K — they must be masked out
    key2 = jnp.concatenate([key, jnp.full((1, 10, 256), 50.0)], axis=1)
    val2 = jnp.concatenate([val, jnp.full((1, 10, 256), 99.0)], axis=1)
    with2 = np.asarray(reference_object_attention(q, key2, val2))
    assert not np.allclose(base, with2, atol=1e-2)  # sanity: they differ
