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


def _bottleneck_weights(rng, c, m):
    w1 = rng.randn(c, m).astype(np.float32) * 0.1
    b1 = rng.randn(m).astype(np.float32) * 0.1
    w2 = rng.randn(9, m, m).astype(np.float32) * 0.1
    b2 = rng.randn(m).astype(np.float32) * 0.1
    w3 = rng.randn(m, c).astype(np.float32) * 0.1
    b3 = rng.randn(c).astype(np.float32) * 0.1
    return tuple(jnp.asarray(a) for a in (w1, b1, w2, b2, w3, b3))


@pytest.mark.parametrize("h,w,c,m,th,tw", [(32, 64, 64, 16, 16, 32),
                                           (16, 32, 128, 32, 8, 16)])
def test_fused_bottleneck_matches_reference(rng, h, w, c, m, th, tw):
    """Fused megakernel == the same folded math as three XLA convs,
    including the 3x3's zero padding at every image edge (tiles at all
    four borders are exercised by the 2x2 grid)."""
    from tpuseg.kernels.bottleneck_fused import (
        fused_bottleneck,
        reference_bottleneck,
    )

    x = jnp.asarray(rng.randn(1, h, w, c), jnp.bfloat16)
    ws = _bottleneck_weights(rng, c, m)
    y = fused_bottleneck(x, *ws, th=th, tw=tw, interpret=True)
    # the kernel's actual output dtype must match the XLA path it replaces
    assert y.dtype == jnp.bfloat16 and x.dtype == jnp.bfloat16
    got = np.asarray(y, np.float32)
    want = np.asarray(reference_bottleneck(x, *ws), np.float32)
    # both paths cast the two intermediates to bf16 and the CPU XLA conv
    # additionally quantizes internally (measured: BOTH sit ~2-6e-3
    # L1-relative from an f64 ground truth sharing their casts, growing
    # with channel depth) — compare with the L1-relative metric
    # (CLAUDE.md convention) at a bf16-noise threshold ~50x below the
    # ~0.3+ a mis-shifted tap/halo or wrong residual would produce
    l1 = np.abs(got - want).sum() / np.abs(want).sum()
    assert l1 < 2e-2, l1


def test_fused_bottleneck_matches_model_block(rng):
    """fold_bn + megakernel == the production Bottleneck module in eval
    mode from the SAME variables — pins the BN folding (scale/bias/mean/
    var wiring, eps) and the tap order to the real block, not just to the
    sibling reference function."""
    import jax

    from tpuseg.kernels.bottleneck_fused import fold_bn, fused_bottleneck
    from tpuseg.models.hrnet import Bottleneck

    c, m = 64, 16
    x = jnp.asarray(rng.randn(1, 32, 64, c), jnp.bfloat16)
    blk = Bottleneck(planes=m, downsample=False, dtype=jnp.bfloat16)
    variables = blk.init(jax.random.PRNGKey(0), x, False)
    # randomize BN leaves so a folding bug cannot hide behind init values
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.randn(*a.shape), a.dtype) * 0.2 + 1.0,
        variables["params"])
    stats = jax.tree.map(
        lambda a: jnp.abs(jnp.asarray(rng.randn(*a.shape), a.dtype)) + 0.5,
        variables["batch_stats"])
    variables = {"params": params, "batch_stats": stats}
    want = blk.apply(variables, x, False)

    folded = []
    for name, kshape in (("conv1", (1, 1)), ("conv2", (3, 3)),
                         ("conv3", (1, 1))):
        bn = name.replace("conv", "bn")
        k, b = fold_bn(params[name]["kernel"],
                       params[bn]["bn"]["scale"], params[bn]["bn"]["bias"],
                       stats[bn]["bn"]["mean"], stats[bn]["bn"]["var"])
        cout = k.shape[-1]
        folded += [k.reshape(-1, k.shape[-2], cout).squeeze(0)
                   if kshape == (1, 1) else k.reshape(9, *k.shape[-2:]), b]
    got = np.asarray(fused_bottleneck(x, *folded, th=16, tw=32,
                                      interpret=True), np.float32)
    want = np.asarray(want, np.float32)
    l1 = np.abs(got - want).sum() / np.abs(want).sum()
    assert l1 < 2e-2, l1


def test_fused_stage1_model_flag(rng, monkeypatch):
    """INTEGRATION: HRNetV2(fused_stage1=True) routes the stage-1
    identity bottlenecks (blocks 2-4; block 1 keeps its downsample
    projection on XLA) through the megakernel and matches the unfused
    trunk from the SAME variables. A call counter proves the fused path
    actually ran rather than silently falling back."""
    import jax

    import tpuseg.kernels.bottleneck_fused as bf
    from tpuseg.models.hrnet import HRNetSpec, HRNetV2

    calls = []
    real = bf.fused_bottleneck
    monkeypatch.setattr(
        bf, "fused_bottleneck",
        lambda *a, **k: (calls.append(1), real(*a, **k))[1])

    # real stage-1 width (64 planes -> 256 ch) so the kernel sees the
    # production channel shapes; tiny later stages keep the test fast
    spec = HRNetSpec(stage1_blocks=3, stage1_channels=64,
                     stage2_modules=1, stage2_channels=(8, 16),
                     stage2_blocks=1, stage3_modules=1,
                     stage3_channels=(8, 16, 32), stage3_blocks=1,
                     stage4_modules=1, stage4_channels=(8, 16, 32, 64),
                     stage4_blocks=1)
    x = jnp.asarray(rng.randn(1, 64, 512, 3), jnp.bfloat16)
    trunk = HRNetV2(spec, dtype=jnp.bfloat16)
    variables = trunk.init(jax.random.PRNGKey(0), x, False)
    # randomized BN leaves so a folding bug cannot hide behind init values
    variables = {
        "params": jax.tree.map(
            lambda a: jnp.asarray(rng.randn(*a.shape), a.dtype) * 0.1
            + (1.0 if a.ndim == 1 else 0.0), variables["params"]),
        "batch_stats": jax.tree.map(
            lambda a: jnp.abs(jnp.asarray(rng.randn(*a.shape), a.dtype))
            * 0.3 + 0.7, variables["batch_stats"]),
    }
    _, _, want = trunk.apply(variables, x, False)
    assert not calls
    fused = HRNetV2(spec, dtype=jnp.bfloat16, fused_stage1=True)
    _, _, got = fused.apply(variables, x, False)
    assert len(calls) == 2, len(calls)  # blocks 2-3 (block 1 downsamples)
    got, want = np.asarray(got, np.float32), np.asarray(want, np.float32)
    l1 = np.abs(got - want).sum() / max(np.abs(want).sum(), 1e-30)
    assert l1 < 5e-2, l1  # bf16 noise band after stages 2-4 propagation


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
