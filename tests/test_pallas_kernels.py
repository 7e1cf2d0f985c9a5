"""Pallas kernel correctness (interpret mode on CPU) — the real-TPU
lowering is exercised by tools/bench_pallas.py."""
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


def test_model_use_pallas_matches_xla_path(rng):
    """INTEGRATION: ObjectAttention with use_pallas=True produces the
    same output as the XLA einsum path from the same variables — pins
    the kernel to the model's real attention math (scaling, f32 softmax,
    reshapes), not just to its sibling reference function."""
    import jax
    import jax.numpy as jnp

    from tpuseg.models.ocr import ObjectAttention

    x = jnp.asarray(rng.randn(2, 8, 16, 32).astype(np.float32))
    proxy = jnp.asarray(rng.randn(2, 19, 32).astype(np.float32))
    mods = {}
    outs = {}
    for flag in (False, True):
        m = ObjectAttention(key_channels=16, out_channels=32,
                            use_pallas=flag, dtype=jnp.float32)
        mods[flag] = m
    variables = mods[False].init(jax.random.PRNGKey(0), x, proxy,
                                 train=False)
    for flag, m in mods.items():
        outs[flag] = np.asarray(m.apply(variables, x, proxy, train=False))
    np.testing.assert_allclose(outs[True], outs[False],
                               rtol=1e-4, atol=1e-4)
    # and in train mode the pallas flag must NOT change the path
    # (no custom_vjp — training always takes the differentiable einsum)
    def loss(v):
        out, _ = mods[True].apply(v, x, proxy, train=True,
                                  mutable=["batch_stats"])
        return jnp.mean(out)
    g = jax.grad(loss)(variables)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(g))


def test_softmax_masks_padded_keys(rng):
    """The kernel zero-pads K to 128 lanes, so a padded slot's sim is
    exactly 0 and an UNMASKED softmax would hand it exp(0)=1 of mass —
    with tiny-magnitude queries the real-key sims are also ~0, making the
    would-be leak ~(128-K)/128 of the total. Tight parity with the
    unpadded XLA reference under those conditions proves the -inf mask
    works; so does mass conservation (context of all-ones values must be
    exactly 1 everywhere, since padded slots carry val=0)."""
    q = jnp.asarray(0.01 * rng.randn(1, 512, 256).astype(np.float32))
    key = jnp.asarray(0.01 * rng.randn(1, 5, 256).astype(np.float32))
    val = jnp.asarray(rng.randn(1, 5, 256).astype(np.float32))
    got = np.asarray(fused_object_attention(q, key, val, interpret=True))
    want = np.asarray(reference_object_attention(q, key, val))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    ones = jnp.ones((1, 5, 256), jnp.float32)
    ctx = np.asarray(fused_object_attention(q, key, ones, interpret=True))
    np.testing.assert_allclose(ctx, 1.0, rtol=1e-5)
