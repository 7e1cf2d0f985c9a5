"""Checkpoint converter: key mapping coverage + numeric layout parity."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from convert_torch_ckpt import (  # noqa: E402
    convert_conv_weight,
    convert_state_dict,
    flax_to_torch_key,
    _flatten,
)


@pytest.fixture(scope="module")
def tiny_mscale():
    from tpuseg.config import make_config
    from tpuseg.models import get_model

    cfg = make_config({"model.arch": "ocrnet.HRNet_Mscale_Tiny",
                       "model.compute_dtype": "float32",
                       "model.remat": False,
                       "dataset.num_classes": 19})
    model = get_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    return model, variables


def _expected_torch_key(flat_key):
    parts = flat_key.split("/")
    leaf = parts[-1]
    mod_path = "/".join(p for p in parts[:-1] if p != "bn")
    prefix = flax_to_torch_key(mod_path)
    if prefix is None:
        return None
    suffix = {"kernel": "weight", "scale": "weight", "bias": "bias",
              "mean": "running_mean", "var": "running_var"}[leaf]
    return f"{prefix}.{suffix}"


def test_every_leaf_maps(tiny_mscale):
    """Every parameter/stat leaf of the flagship model must translate to a
    torch key — no silent gaps in the converter."""
    _, variables = tiny_mscale
    unmapped = []
    for coll in ("params", "batch_stats"):
        for k in _flatten(variables[coll]):
            if _expected_torch_key(k) is None:
                unmapped.append(k)
    assert not unmapped, unmapped[:10]


def test_representative_reference_keys(tiny_mscale):
    """Spot-check the exact torch key strings against the reference's
    naming scheme (hrnetv2.py / ocrnet.py / utils.py)."""
    cases = {
        "backbone/stem_conv1/kernel":
            "backbone.conv1.weight",
        "backbone/layer1_block0/downsample_conv/kernel":
            "backbone.layer1.0.downsample.0.weight",
        "backbone/transition1/t1_conv0/kernel":
            "backbone.transition1.1.0.0.weight",
        "backbone/stage4_m0/branch2_block1/conv2/kernel":
            "backbone.stage4.0.branches.2.1.conv2.weight",
        "backbone/stage3_m0/fuse0_2_conv/kernel":
            "backbone.stage3.0.fuse_layers.0.2.0.weight",
        "backbone/stage3_m0/fuse2_0_conv1/kernel":
            "backbone.stage3.0.fuse_layers.2.0.1.0.weight",
        "ocr/conv3x3_ocr/norm/bn/scale":
            "ocr.conv3x3_ocr.1.0.weight",
        "ocr/aux_cls/bias":
            "ocr.aux_head.2.bias",
        "ocr/ocr_distri/object_context/f_pixel1/norm/bn/mean":
            "ocr.ocr_distri_head.object_context_block.f_pixel.3.0."
            "running_mean",
        "ocr/ocr_distri/object_context/f_down/conv/kernel":
            "ocr.ocr_distri_head.object_context_block.f_down.0.weight",
        "ocr/cls/kernel": "ocr.cls_head.weight",
        "scale_attn/conv0/norm/bn/var": "scale_attn.bn0.running_var",
        "scale_attn/cls/kernel": "scale_attn.conv2.weight",
    }
    for flax_key, want in cases.items():
        assert _expected_torch_key(flax_key) == want, flax_key


def test_full_roundtrip_places_values(tiny_mscale):
    """Synthesize a torch state dict covering every leaf, convert, and
    verify values + conv transposition land exactly."""
    _, variables = tiny_mscale
    rng = np.random.RandomState(0)
    torch_state = {}
    originals = {}
    for coll in ("params", "batch_stats"):
        for k, v in _flatten(variables[coll]).items():
            tk = _expected_torch_key(k)
            val = rng.randn(*np.shape(v)).astype(np.float32)
            originals[k] = val
            if k.endswith("kernel") and val.ndim == 4:
                torch_state[tk] = np.transpose(val, (3, 2, 0, 1))  # HWIO->OIHW
            else:
                torch_state[tk] = val

    params, stats = convert_state_dict(
        torch_state, variables["params"], variables["batch_stats"],
        strict=True, log=lambda *_: None)
    for k, v in _flatten(params).items():
        np.testing.assert_array_equal(v, originals[k], err_msg=k)
    for k, v in _flatten(stats).items():
        np.testing.assert_array_equal(v, originals[k], err_msg=k)


def test_conv_bn_numeric_parity():
    """ConvNormAct with converted torch weights reproduces torch
    Conv2d+BatchNorm2d+ReLU in eval mode — validates layout transforms
    through actual math, not just shapes."""
    from tpuseg.models.layers import ConvNormAct

    rng = np.random.RandomState(1)
    x = rng.randn(2, 8, 8, 5).astype(np.float32)

    tconv = torch.nn.Conv2d(5, 7, 3, stride=2, padding=1, bias=False)
    tbn = torch.nn.BatchNorm2d(7)
    tbn.running_mean.data = torch.randn(7)
    tbn.running_var.data = torch.rand(7) + 0.5
    tbn.weight.data = torch.randn(7)
    tbn.bias.data = torch.randn(7)
    tbn.eval()
    with torch.no_grad():
        want = torch.relu(tbn(tconv(
            torch.from_numpy(x).permute(0, 3, 1, 2))))
    want = want.permute(0, 2, 3, 1).numpy()

    m = ConvNormAct(7, 3, stride=2, dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = {
        "conv": {"kernel": jnp.asarray(convert_conv_weight(
            tconv.weight.detach().numpy()))},
        "norm": {"bn": {"scale": jnp.asarray(tbn.weight.detach().numpy()),
                        "bias": jnp.asarray(tbn.bias.detach().numpy())}},
    }
    stats = {"norm": {"bn": {"mean": jnp.asarray(tbn.running_mean.numpy()),
                             "var": jnp.asarray(tbn.running_var.numpy())}}}
    got = m.apply({"params": params, "batch_stats": stats}, jnp.asarray(x),
                  train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_orbax_save_then_snapshot_load(tiny_mscale, tmp_path):
    """Converted trees survive the orbax save -> load_snapshot path used by
    the CLI (--checkpoint) and Trainer (train.snapshot)."""
    import orbax.checkpoint as ocp

    from tpuseg.train.checkpoint import load_snapshot

    _, variables = tiny_mscale
    rng = np.random.RandomState(3)
    params = jax.tree.map(
        lambda a: np.asarray(rng.randn(*np.shape(a)), np.float32),
        variables["params"])
    stats = jax.tree.map(
        lambda a: np.asarray(rng.randn(*np.shape(a)), np.float32),
        variables["batch_stats"])

    path = str(tmp_path / "ckpt")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": params, "batch_stats": stats})
    ckptr.wait_until_finished()

    loaded_p, loaded_s = load_snapshot(path, variables["params"],
                                       variables["batch_stats"],
                                       log=lambda *_: None)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(stats), jax.tree.leaves(loaded_s)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
