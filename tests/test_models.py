"""Model construction / shape / dtype tests (tiny widths, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.config import make_config
from tpuseg.models import get_model
from tpuseg.models.hrnet import HRNetV2, TINY_SPEC
from tpuseg.models.ocr import OCRBlock, spatial_gather


def tiny_cfg(**over):
    base = {
        "model.arch": "ocrnet.HRNet_Mscale_Tiny",
        "model.compute_dtype": "float32",
        "model.remat": False,
        "dataset.num_classes": 19,
    }
    base.update(over)
    return make_config(base)


def test_hrnet_trunk_shapes():
    m = HRNetV2(TINY_SPEC, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 128, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    _, _, feats = m.apply(vars_, x)
    # stride 4, channels = sum(stage4)
    assert feats.shape == (1, 16, 32, sum(TINY_SPEC.stage4_channels))


def test_spatial_gather_shapes_and_math():
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 4, 6, 8).astype(np.float32))
    probs = jnp.asarray(rng.randn(2, 4, 6, 5).astype(np.float32))
    ctx = spatial_gather(feats, probs)
    assert ctx.shape == (2, 5, 8)
    # manual check: softmax over pixels per class, weighted feature sum
    p = np.asarray(probs).reshape(2, 24, 5)
    p = np.exp(p) / np.exp(p).sum(1, keepdims=True)
    want = np.einsum("bnk,bnc->bkc", p, np.asarray(feats).reshape(2, 24, 8))
    np.testing.assert_allclose(np.asarray(ctx), want, rtol=1e-4, atol=1e-5)


def test_ocr_block_outputs():
    m = OCRBlock(num_classes=19, mid_channels=32, key_channels=16,
                 dtype=jnp.float32)
    x = jnp.zeros((1, 8, 16, 24))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    cls_out, aux_out, ocr_mid = m.apply(vars_, x)
    assert cls_out.shape == (1, 8, 16, 19)
    assert aux_out.shape == (1, 8, 16, 19)
    assert ocr_mid.shape == (1, 8, 16, 32)


def test_mscale_eval_output_keys_and_shapes():
    cfg = tiny_cfg(**{"model.n_scales": (0.5, 1.0, 2.0)})
    model = get_model(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(vars_, x, train=False)
    assert out["pred"].shape == (1, 64, 64, 19)
    for key in ["pred_0.5x", "pred_1.0x", "pred_2.0x",
                "attn_0.5x", "attn_1.0x"]:
        assert key in out, key
    assert "attn_2.0x" not in out  # reference skips 2.0 attn (ocrnet.py:230-231)
    assert out["pred"].dtype == jnp.float32


def test_mscale_train_two_scale():
    cfg = tiny_cfg()
    model = get_model(cfg)
    x = jnp.zeros((2, 32, 32, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    out, mutated = model.apply(
        vars_, x, train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)})
    assert out["pred"].shape == (2, 32, 32, 19)
    assert out["aux"].shape == (2, 32, 32, 19)
    assert out["attn_05x"].shape == (2, 16, 16, 1)
    assert "batch_stats" in mutated


def test_attention_fusion_identity():
    """If attn==1 everywhere, fused pred must equal the low-scale branch
    upsampled; if attn==0, the high-scale branch."""
    from tpuseg.models.mscale_core import two_scale_fuse
    from tpuseg.ops import scale_as

    rng = np.random.RandomState(0)
    full = jnp.asarray(rng.randn(1, 16, 16, 3).astype(np.float32))

    def make_fwd(attn_val):
        def fwd(x):
            cls = jnp.broadcast_to(
                jnp.arange(x.shape[1], dtype=jnp.float32)[None, :, None, None],
                (1, x.shape[1], x.shape[2], 3))
            return {"cls_out": cls, "aux_out": cls,
                    "logit_attn": jnp.full((1, x.shape[1], x.shape[2], 1),
                                           attn_val, jnp.float32)}
        return fwd

    out1 = two_scale_fuse(make_fwd(1.0), full)
    lo_up = scale_as(make_fwd(1.0)(full[:, ::2, ::2])["cls_out"],
                     out1["pred"])
    np.testing.assert_allclose(np.asarray(out1["pred"]), np.asarray(lo_up),
                               rtol=1e-5, atol=1e-5)

    out0 = two_scale_fuse(make_fwd(0.0), full)
    np.testing.assert_allclose(np.asarray(out0["pred"]),
                               np.asarray(make_fwd(0.0)(full)["cls_out"]),
                               rtol=1e-5, atol=1e-5)


def test_nscale_matches_reference_recursion():
    """nscale_fuse on synthetic outputs must reproduce a hand-rolled
    reference recursion (ocrnet.py:222-252) computed in numpy."""
    from tpuseg.models.mscale_core import nscale_fuse
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(42)
    H = W = 32
    scales = [0.5, 1.0, 2.0]
    x = rng.randn(1, H, W, 3).astype(np.float32)

    # synthetic deterministic per-scale outputs driven by input size
    def make_outputs(h, w):
        r = np.random.RandomState(h * 1000 + w)
        return (r.randn(1, h, w, 4).astype(np.float32),
                r.randn(1, h, w, 4).astype(np.float32),
                r.rand(1, h, w, 1).astype(np.float32))

    def fwd(xi):
        cls, aux, attn = make_outputs(xi.shape[1], xi.shape[2])
        return {"cls_out": jnp.asarray(cls), "aux_out": jnp.asarray(aux),
                "logit_attn": jnp.asarray(attn)}

    got = nscale_fuse(fwd, jnp.asarray(x), scales)

    # reference recursion in torch (NCHW)
    def t(a):
        return torch.from_numpy(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))

    def torch_scale_as(a, b):
        return F.interpolate(a, size=b.shape[2:], mode="bilinear",
                             align_corners=False)

    pred = None
    for s in sorted(scales, reverse=True):
        hs, ws = int(H * s), int(W * s)
        cls, aux, attn = [t(v) for v in make_outputs(hs, ws)]
        if pred is None:
            pred = cls
        elif s >= 1.0:
            pred = torch_scale_as(pred, cls)
            pred = attn * cls + (1 - attn) * pred
        else:
            cls = torch_scale_as(attn * cls, pred)
            attn_up = torch_scale_as(attn, pred)
            pred = cls + (1 - attn_up) * pred

    want = pred.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got["pred"]), want,
                               rtol=1e-4, atol=1e-4)


def test_fusion_dtype_bf16_close_to_f32():
    """bfloat16 fusion chains keep predictions essentially identical —
    the knob trades exact parity for halved full-res HBM traffic."""
    from tpuseg.models import get_model

    outs = {}
    for fdt in ("float32", "bfloat16"):
        cfg = tiny_cfg(**{"model.n_scales": (0.5, 1.0, 2.0),
                          "model.eval_fusion_dtype": fdt})
        model = get_model(cfg)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3),
                        jnp.float32)
        vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
        outs[fdt] = model.apply(vars_, x, train=False)["pred"]
    a = np.argmax(np.asarray(outs["float32"]), -1)
    b = np.argmax(np.asarray(outs["bfloat16"]), -1)
    assert (a == b).mean() > 0.95
    assert outs["bfloat16"].dtype == jnp.float32  # final cast preserved


def test_attn_head_old_arch():
    """--mscale_old_arch head: two 3x3 blocks then a kernel_size=out_ch
    valid conv, all convs zero-init -> sigmoid(0)=0.5 attention everywhere
    (reference old_make_attn_head/init_attn: network/utils.py:332-381)."""
    import jax
    import jax.numpy as jnp

    from tpuseg.models.layers import AttnHead

    head = AttnHead(out_ch=1, bot_ch=8, old_arch=True)
    x = jnp.ones((1, 16, 16, 4), jnp.bfloat16)
    v = head.init(jax.random.PRNGKey(0), x)
    y = head.apply(v, x)
    assert y.shape == (1, 16, 16, 1)
    assert np.allclose(np.asarray(y), 0.5)
    # parameter tree: conv0/conv1/cls like the new arch (converter-visible)
    assert set(v["params"]) == {"conv0", "conv1", "cls"}

    # the reference passes kernel_size=out_ch: a 2-channel head uses an
    # unpadded 2x2 conv and shrinks by one pixel — kept faithfully
    head2 = AttnHead(out_ch=2, bot_ch=8, old_arch=True)
    v2 = head2.init(jax.random.PRNGKey(0), x)
    assert head2.apply(v2, x).shape == (1, 15, 15, 2)


def test_mscale_old_arch_factory_plumbing():
    """model.mscale_old_arch reaches the scale_attn head of MscaleOCR."""
    import jax
    import jax.numpy as jnp

    from tpuseg.config import make_config
    from tpuseg.models import get_model

    cfg = make_config({"model.arch": "ocrnet.HRNet_Mscale_Tiny",
                       "model.mscale_old_arch": True,
                       "dataset.num_classes": 5})
    m = get_model(cfg)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3),
                                                jnp.bfloat16), train=False)
    # zero-init cls conv of the old arch
    cls_kernel = v["params"]["scale_attn"]["cls"]["kernel"]
    assert np.allclose(np.asarray(cls_kernel), 0.0)
    out = m.apply(v, jnp.ones((1, 32, 64, 3), jnp.bfloat16), train=False)
    assert out["pred"].shape == (1, 32, 64, 5)
    # attention stuck at 0.5 at init
    assert np.allclose(np.asarray(out["attn_05x"]), 0.5)
