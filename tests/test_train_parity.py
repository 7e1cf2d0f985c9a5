"""TRAIN-path numerical parity vs the ACTUAL torch reference.

The eval path is oracle-proven by tests/test_torch_parity.py; this module
covers the TRAINING computation. The reference ``ocrnet.HRNet_Mscale`` is
built in train mode in a subprocess, one train step is run on CPU — the
two-scale train forward (network/ocrnet.py:264-318), criterion composition
``loss = OCR_ALPHA*aux + main`` (ocrnet.py:300-311, train.py:491-507) and
backward — and the dump must be reproduced by the production
``make_loss_fn`` (tpuseg/train/step.py) on the converted weights:

- the scalar loss;
- the FULL gradient tree, compared with the L1-relative metric over all
  leaves (per-leaf max-relative blows up on near-zero leaves);
- the post-forward BN running stats: torch updates them inside the train
  forward once per ``_fwd`` pass (lo then hi — sequential double update),
  with the UNBIASED batch variance (momentum 0.1). Our Norm reproduces
  exactly that (tpuseg/models/layers.py TorchBatchNorm).

WHY GRADIENTS ARE ASSERTED AT TINY DEPTH ONLY: train-mode gradients
through a deep batch-norm chain are CHAOTIC at random init. Measured
with the reference alone (torch vs torch): a 1e-7 relative input
perturbation changes its own gradients by 2.3e-3 on the tiny topology at
the reference's init (HRNet convs are normal(std=0.001),
network/hrnetv2.py:457-458 — every BN re-amplifies the backward by
~1/std), 9e-4 with kaiming-conditioned weights, and O(1) at W48 depth
under ANY init (~70 BN layers; conditioning the init makes the W48
forward noisier, not cleaner: loss parity degrades 1.7e-4 -> 1.8e-3).
Round 3's version of this test asserted W48 train-mode gradients at
1e-3 — mathematically unsatisfiable (it measured 0.84). The redesign:
- tiny topology + conditioned init (tools/torch_reference.randomize_convs):
  gradients well-posed (torch-own floor 9e-4), measured parity 3.9e-4
  with cosine 1.000000 — same code path, same converter map;
- W48: train-mode LOSS + BN running stats (averaged quantities — not
  chaotic) at the reference's own init, plus EVAL-mode full-depth
  gradient parity (test_eval_nscale_gradient_parity): eval BN is affine,
  so the W48 backward is well-conditioned there.
Structural bugs (wrong loss composition, biased-vs-unbiased variance,
momentum or update order, converter mis-mapping) measure orders of
magnitude above every tolerance here.

Gradients and running stats are converted with the SAME converter as the
weights (the OIHW->HWIO transpose is a permutation, so it maps gradients
identically), making this a second mutation-sensitive oracle over every
converter key map.

The ``tiny`` variant runs the identical code path on the tiny topology
(the reference's HRNet is config-driven, tools/torch_reference.py
``--tiny``), compiling in seconds — use it while iterating; the ``w48``
variant is the full converter-coverage oracle.
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
BATCH = 1  # the SOTA recipe trains bs=1/chip (scripts/train_cityscapes.yml)

# Measured parity (this box, CPU; tools/diag_train_parity.py):
#   tiny (conditioned): ce loss 5e-7, grads 3.9e-4 (cosine 1.000000),
#     stats 4e-7 — vs the 9e-4 torch-own sensitivity floor above;
#   w48 (reference's own init): ce loss 1.7e-4, stats 3.4e-4 (scale 1.0,
#     cosine 1.0 — pure f32 noise through ~70 train-mode BN layers).
# Tolerances keep ~3x margin over measurement. Structural-bug margins:
# a biased-variance (Bessel) bug measures ~6e-5 on tiny stats (> 1e-5
# tol), momentum/order/converter bugs measure orders of magnitude above.
# RMI additionally carries the f32-vs-f64 band of tests/test_rmi.py
# (the reference runs the covariance/Cholesky chain in float64,
# loss/rmi.py:171-172, which TPUs do not have).
TOL = {
    ("tiny", "ce"): dict(loss_rel=1e-5, grad_l1=1.5e-3, stats_l1=1e-5),
    ("tiny", "rmi"): dict(loss_rel=1e-3, grad_l1=5e-3, stats_l1=1e-5),
    ("w48", "ce"): dict(loss_rel=5e-4, grad_l1=None, stats_l1=1.5e-3),
    ("w48", "rmi"): dict(loss_rel=5e-3, grad_l1=None, stats_l1=1.5e-3),
}

PARAMS = [("tiny", "ce"), ("tiny", "rmi"), ("w48", "ce"), ("w48", "rmi")]


@pytest.fixture(scope="module", params=PARAMS,
                ids=[f"{s}-{c}" for s, c in PARAMS])
def train_dump(request, tmp_path_factory):
    size, crit = request.param
    out = str(tmp_path_factory.mktemp(f"train_dump_{size}_{crit}"))
    script = os.path.join(os.path.dirname(__file__), "..", "tools",
                          "torch_reference.py")
    cmd = [sys.executable, script, "--out", out, "--train-dump",
           "--criterion", crit, "--height", str(H), "--width", str(W),
           "--batch", str(BATCH), "--seed", "0"]
    if size == "tiny":
        cmd.append("--tiny")
    subprocess.run(cmd, check=True, timeout=1800)
    dump = {name: dict(np.load(os.path.join(out, f"{name}.npz")))
            for name in ("state_dict", "train", "grads", "post_stats")}
    return size, crit, dump


@pytest.fixture(scope="module")
def stepped(train_dump):
    """Converted model + one differentiated production loss_fn call."""
    size, crit_name, d = train_dump

    from tpuseg.config import make_config
    from tpuseg.losses.factory import get_loss
    from tpuseg.models import get_model
    from tpuseg.train.step import make_loss_fn

    cfg = make_config({
        "model.arch": ("ocrnet.HRNet_Mscale_Tiny" if size == "tiny"
                       else "ocrnet.HRNet_Mscale"),
        "model.compute_dtype": "float32",
        "model.remat": False,
        "model.n_scales": (),
        "model.ocr.dropout": 0.0,  # dump zeroes torch dropout likewise
        "dataset.num_classes": 19,
        "loss.loss_type": crit_name,
    })
    model = get_model(cfg)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3), jnp.float32))
    params, stats = convert_state_dict(
        d["state_dict"], variables["params"],
        variables.get("batch_stats", {}), strict=True)

    criterion, _ = get_loss(cfg)
    loss_fn = make_loss_fn(
        model, criterion, ocr_alpha=cfg.loss.ocr_alpha,
        aux_rmi=cfg.loss.ocr_aux_rmi,
        supervised_mscale_wt=cfg.loss.supervised_mscale_wt,
        align_corners=cfg.model.align_corners)

    batch = {
        "image": jnp.asarray(np.transpose(d["train"]["x"], (0, 2, 3, 1))),
        "label": jnp.asarray(d["train"]["gts"].astype(np.int32)),
    }

    @jax.jit
    def run(params, stats):
        (loss, mutated), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, stats, batch,
                                   jax.random.PRNGKey(0))
        return loss, mutated["batch_stats"], grads

    loss, new_stats, grads = run(params, stats)
    return (size, crit_name), d, variables, float(loss), new_stats, grads


def _l1_rel(got_tree, want_tree) -> float:
    """Tree-wide L1-relative distance: sum|a-b| / sum|b| over all leaves."""
    got, want = jax.tree.leaves(got_tree), jax.tree.leaves(want_tree)
    assert len(got) == len(want) and got, (len(got), len(want))
    num = sum(float(np.abs(np.asarray(a, np.float64)
                           - np.asarray(b, np.float64)).sum())
              for a, b in zip(got, want))
    den = sum(float(np.abs(np.asarray(b, np.float64)).sum()) for b in want)
    return num / max(den, 1e-30)


def test_train_loss_parity(stepped):
    """Production loss composition == reference train forward + criterion
    (ocrnet.py:300-311: RMI(main, do_rmi=True) + 0.4*criterion(aux))."""
    key, d, _, loss, _, _ = stepped
    want = float(d["train"]["loss"])
    rel = abs(loss - want) / max(1.0, abs(want))
    assert rel < TOL[key]["loss_rel"], (loss, want, rel)


def test_gradient_parity(stepped):
    """Full gradient tree vs torch autograd through the same step.

    Runs on the tiny topology only: at W48 depth the train-mode backward
    is chaotic at any random init (module docstring) — the W48-depth
    gradient oracle is test_eval_nscale_gradient_parity below."""
    key, d, variables, _, _, grads = stepped
    if TOL[key]["grad_l1"] is None:
        pytest.skip("W48 train-mode gradients are chaotic at random init; "
                    "covered by test_eval_nscale_gradient_parity")
    want_grads, _ = convert_state_dict(
        d["grads"], variables["params"], {}, strict=True,
        log=lambda *a: None)
    rel = _l1_rel(grads, want_grads)
    assert rel < TOL[key]["grad_l1"], f"grad L1-rel {rel:.3e}"


@pytest.fixture(scope="module", params=["tiny", "w48"])
def eval_grad_dump(request, tmp_path_factory):
    """EVAL-mode n-scale backward dump: the full-depth gradient oracle.

    Train-mode gradients at W48 depth are chaotic at any random init (the
    70-layer batch-stat normalization chain amplifies f32 noise
    exponentially; see the module docstring), so the W48 gradient
    comparison runs on the eval path, where BN is affine (fixed running
    stats) and the backward is well-conditioned. Exercises the full
    backward through convs, resizes (incl. the 2.0x pass), OCR attention,
    the n-scale fusion chain, and the converter's gradient mapping."""
    size = request.param
    out = str(tmp_path_factory.mktemp(f"eval_grad_{size}"))
    script = os.path.join(os.path.dirname(__file__), "..", "tools",
                          "torch_reference.py")
    cmd = [sys.executable, script, "--out", out, "--eval-grad-dump",
           "--height", str(H), "--width", str(W), "--batch", str(BATCH),
           "--seed", "0"]
    if size == "tiny":
        cmd.append("--tiny")
    subprocess.run(cmd, check=True, timeout=1800)
    dump = {name: dict(np.load(os.path.join(out, f"{name}.npz")))
            for name in ("state_dict", "eval_grad", "grads")}
    return size, dump


def test_eval_nscale_gradient_parity(eval_grad_dump):
    size, d = eval_grad_dump

    from tpuseg.config import make_config
    from tpuseg.models import get_model

    cfg = make_config({
        "model.arch": ("ocrnet.HRNet_Mscale_Tiny" if size == "tiny"
                       else "ocrnet.HRNet_Mscale"),
        "model.compute_dtype": "float32",
        "model.remat": False,
        "model.n_scales": (0.5, 1.0, 2.0),
        "model.ocr.dropout": 0.0,
        "dataset.num_classes": 19,
    })
    model = get_model(cfg)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3), jnp.float32))
    params, stats = convert_state_dict(
        d["state_dict"], variables["params"],
        variables.get("batch_stats", {}), strict=True)

    x = jnp.asarray(np.transpose(d["eval_grad"]["x"], (0, 2, 3, 1)))
    ct = jnp.asarray(np.transpose(d["eval_grad"]["ct"], (0, 2, 3, 1)))

    @jax.jit
    def readout(params):
        out = model.apply({"params": params, "batch_stats": stats}, x,
                          train=False)
        return jnp.sum(out["pred"].astype(jnp.float32) * ct), out["pred"]

    (_, pred), grads = jax.value_and_grad(
        readout, has_aux=True)(params)
    # forward pin (same model path as test_torch_parity, different init).
    # L1-relative, not elementwise: the randomized-BN init makes the eval
    # forward's magnitudes explode (~1e9 logits at W48 depth — each BN's
    # random affine multiplies), so a handful of elements exceed any
    # per-element rtol from pure f32 noise (measured: 12/155648 at 7e-2);
    # the CLAUDE.md tree metric is the right comparison here too
    want_pred = np.transpose(d["eval_grad"]["pred"], (0, 2, 3, 1))
    got_pred = np.asarray(pred, np.float64)
    fwd_rel = (np.abs(got_pred - want_pred).sum()
               / max(np.abs(want_pred).sum(), 1e-30))
    assert fwd_rel < 1e-3, f"eval forward L1-rel {fwd_rel:.3e}"

    # torch leaves without gradients (aux head: eval 'pred' does not
    # consume it) convert onto a ZERO default; our aux grads are exactly
    # zero likewise (need_aux=False skips the chain)
    zeros = jax.tree.map(lambda v: np.zeros(v.shape, np.float64),
                         variables["params"])
    want_grads, _ = convert_state_dict(
        d["grads"], zeros, {}, strict=False, log=lambda *a: None)
    rel = _l1_rel(grads, want_grads)
    assert rel < 1e-3, f"eval-mode grad L1-rel {rel:.3e}"


def test_bn_running_stats_parity(stepped):
    """Post-forward BN running stats: the two sequential train-mode _fwd
    passes (0.5x then 1.0x) must leave every running_mean/var leaf where
    torch leaves it — momentum convention, unbiased variance, two-pass
    precision, and update ORDER all covered (independent of criterion)."""
    key, d, variables, _, new_stats, _ = stepped
    _, want_stats = convert_state_dict(
        d["post_stats"], {}, variables["batch_stats"], strict=True,
        log=lambda *a: None)
    rel = _l1_rel(new_stats, want_stats)
    assert rel < TOL[key]["stats_l1"], f"BN running-stat L1-rel {rel:.3e}"
