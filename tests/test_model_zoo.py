"""Construction + forward smoke tests for every model family (tiny trunks,
tiny inputs, CPU). Mirrors the reference's arch registry coverage
(SURVEY §2.4-2.5)."""
import jax
import jax.numpy as jnp
import pytest

from tpuseg.config import make_config
from tpuseg.models import get_model

NC = 7
X = (1, 32, 32, 3)


def cfg_for(arch, **over):
    base = {
        "model.arch": arch,
        "model.compute_dtype": "float32",
        "model.remat": False,
        "model.n_scales": (0.5, 1.0, 2.0),
        "dataset.num_classes": NC,
    }
    base.update(over)
    return make_config(base)


def run_model(model, train=False):
    x = jnp.zeros(X)
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    if train:
        out, _ = model.apply(vars_, x, train=True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
    else:
        out = model.apply(vars_, x, train=False)
    return out


@pytest.mark.parametrize("arch", [
    "deepv3.DeepV3PlusW38Tiny",
    "mscale.DeepV3W38Tiny",
])
def test_w38_models_eval(arch):
    out = run_model(get_model(cfg_for(arch)))
    assert out["pred"].shape == (1, 32, 32, NC)


def test_mscale_v3plus_train_two_scale():
    out = run_model(get_model(cfg_for("mscale.DeepV3W38Tiny")), train=True)
    assert out["pred"].shape == (1, 32, 32, NC)
    assert "attn_05x" in out and "pred_05x" in out


def test_mscale_aspp_and_hrnet_factories():
    """mscale.HRNet / mscale.HRNet_ASP coverage (reference:
    mscale.py:474-515) via the underlying classes on the tiny trunk, plus
    the segattn_bot_ch / mscale_dropout plumbing shared by every mscale
    factory (reference make_attn_head reads both globally,
    network/utils.py:343-367)."""
    from tpuseg.models.mscale import MscaleASPP, MscaleBasic

    out = run_model(MscaleBasic(num_classes=NC, trunk="hrnetv2_tiny",
                                n_scales=(0.5, 1.0), dtype=jnp.float32))
    assert out["pred"].shape == (1, 32, 32, NC)

    model = MscaleASPP(num_classes=NC, trunk="hrnetv2_tiny",
                       aspp_bot_ch=16, bot_ch=24, attn_dropout=True,
                       n_scales=(0.5, 1.0), dtype=jnp.float32)
    out = run_model(model, train=True)  # train=True exercises the dropout
    assert out["pred"].shape == (1, 32, 32, NC)
    # the knob must actually reach the heads
    vars_ = model.init(jax.random.PRNGKey(0), jnp.zeros(X), train=False)
    k = vars_["params"]["scale_attn"]["conv0"]["conv"]["kernel"]
    assert k.shape[-1] == 24
    kf = vars_["params"]["final"]["conv0"]["conv"]["kernel"]
    assert kf.shape[-1] == 24

    # the factory strings resolve and read the cfg knobs
    for arch in ("mscale.HRNet", "mscale.HRNet_ASP"):
        m = get_model(cfg_for(arch, **{"model.segattn_bot_ch": 24,
                                       "model.mscale_dropout": True}))
        assert m.bot_ch == 24 and m.attn_dropout is True


def test_mscale_fuse_aspp_variant():
    from tpuseg.models.mscale import MscaleV3Plus
    model = MscaleV3Plus(num_classes=NC, trunk="wrn38_tiny", fuse_aspp=True,
                         attn_2b=True, n_scales=(0.5, 1.0), bot_ch=16,
                         dtype=jnp.float32)
    out = run_model(model)
    assert out["pred"].shape == (1, 32, 32, NC)
    assert "attn_10x" in out  # fused-aspp eval path
    out = run_model(model, train=True)
    assert out["pred"].shape == (1, 32, 32, NC)


def test_trunk_contracts():
    """Every trunk returns the (s2, s4, high) triple with documented
    channel counts (reference get_trunk: network/utils.py:102-141)."""
    from tpuseg.models.trunks import get_trunk

    for name, s2c, s4c, hic in [("wrn38_tiny", 8, 16, 64),
                                ("xception71_tiny", 64, 128, 2048)]:
        trunk, s2_ch, s4_ch, high_ch = get_trunk(name, dtype=jnp.float32)
        assert (s2_ch, s4_ch, high_ch) == (s2c, s4c, hic)
        x = jnp.zeros((1, 64, 64, 3))
        vars_ = trunk.init(jax.random.PRNGKey(0), x)
        s2, s4, high = trunk.apply(vars_, x)
        assert s2.shape[-1] == s2_ch and s2.shape[1] == 32   # stride 2
        assert s4.shape[-1] == s4_ch and s4.shape[1] == 16   # stride 4
        assert high.shape[-1] == high_ch and high.shape[1] == 8  # stride 8


def test_resnet_trunk_stride8():
    from tpuseg.models.resnet import ResNet
    trunk = ResNet((1, 1, 1, 1), width=8, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = trunk.init(jax.random.PRNGKey(0), x)
    s2, _, high = trunk.apply(vars_, x)
    assert s2.shape == (1, 16, 16, 32)    # layer1 @ stride 4, 4*width
    assert high.shape == (1, 8, 8, 256)   # stride 8, 8*width*expansion

def test_seresnext_trunk():
    from tpuseg.models.seresnext import SEResNeXt
    trunk = SEResNeXt((1, 1, 1, 1), dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3))
    vars_ = trunk.init(jax.random.PRNGKey(0), x)
    s2, _, high = trunk.apply(vars_, x)
    assert s2.shape == (1, 8, 8, 256)
    assert high.shape == (1, 4, 4, 2048)


def test_basic_and_deeper_and_aspp():
    from tpuseg.models.basic import ASPPModel, Basic
    from tpuseg.models.deeper import DeeperS8

    for model in [Basic(num_classes=NC, trunk="hrnetv2_tiny",
                        dtype=jnp.float32),
                  ASPPModel(num_classes=NC, trunk="hrnetv2_tiny",
                            dtype=jnp.float32),
                  DeeperS8(num_classes=NC, trunk="wrn38_tiny",
                           dtype=jnp.float32)]:
        out = run_model(model)
        assert out["pred"].shape == (1, 32, 32, NC)


def test_mscale2():
    from tpuseg.models.mscale2 import Basic2, MscaleV3Plus2
    m = MscaleV3Plus2(num_classes=NC, trunk="wrn38_tiny",
                      n_scales=(0.5, 1.0), dtype=jnp.float32)
    out = run_model(m)
    assert out["pred"].shape == (1, 32, 32, NC)
    out = run_model(m, train=True)
    assert out["pred"].shape == (1, 32, 32, NC)

    b = Basic2(num_classes=NC, trunk="hrnetv2_tiny", dtype=jnp.float32)
    out = run_model(b, train=True)
    assert out["pred"].shape == (1, 32, 32, NC)


def test_attnscale():
    from tpuseg.models.attnscale import ASDV3P
    for bn_head in (False, True):
        m = ASDV3P(num_classes=NC, trunk="wrn38_tiny",
                   scales=(0.5, 1.0, 2.0), bn_head=bn_head,
                   dtype=jnp.float32)
        out = run_model(m)
        assert out["pred"].shape == (1, 32, 32, NC)
        assert "attn_0.5x" in out and "pred_2.0x" in out


def test_attnscale_paired():
    from tpuseg.models.attnscale import ASDV3P_Paired
    m = ASDV3P_Paired(num_classes=NC, trunk="wrn38_tiny",
                      inf_scales=(0.5, 1.0, 2.0), bn_head=True,
                      dtype=jnp.float32)
    out = run_model(m)
    assert out["pred"].shape == (1, 32, 32, NC)
    # chained normalization: per-pixel attention weights sum to ~1 with a
    # sigmoid head... (only guaranteed for the first pair chain with bn
    # head when renormalized); just require all asset keys present + finite
    import numpy as np
    for k in ("attn_0.5x", "attn_1.0x", "attn_2.0x", "pred_0.5x"):
        assert k in out
        assert np.isfinite(np.asarray(out[k])).all()
    out = run_model(m, train=True)  # trains on (0.5, 1.0)
    assert out["pred"].shape == (1, 32, 32, NC)


def test_ocrnet_aspp():
    from tpuseg.models.hrnet import TINY_SPEC
    from tpuseg.models.ocrnet import OCRNetASPP
    m = OCRNetASPP(num_classes=NC, spec=TINY_SPEC, mid_channels=32,
                   key_channels=16, dtype=jnp.float32)
    out = run_model(m)
    assert out["pred"].shape == (1, 32, 32, NC)
    assert out["aux"].shape == (1, 32, 32, NC)
