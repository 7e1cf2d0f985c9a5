"""End-to-end train/eval step on an 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import chex
import pytest

from tpuseg.config import make_config
from tpuseg.data.synthetic import SyntheticDataset
from tpuseg.losses import get_loss
from tpuseg.models import get_model
from tpuseg.parallel import make_mesh, replicate, shard_batch
from tpuseg.train import (
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)


@pytest.fixture(scope="module")
def setup():
    cfg = make_config({
        "model.arch": "ocrnet.HRNet_Mscale_Tiny",
        "model.compute_dtype": "float32",
        "model.remat": False,
        "dataset.num_classes": 19,
        "dataset.crop_size": (32, 32),
        "train.batch_size": 8,
        "optim.lr": 1e-2,
    })
    model = get_model(cfg)
    tx, sched = make_optimizer(cfg, steps_per_epoch=10)
    x = jnp.zeros((1, 32, 32, 3))
    state = create_train_state(model, tx, jax.random.PRNGKey(0), x)
    return cfg, model, state, sched


def _batch(cfg, n=8):
    ds = SyntheticDataset(cfg.dataset.crop_size, cfg.dataset.num_classes,
                          length=n)
    return next(ds.batches(n, 1))


def test_single_device_train_step_decreases_loss(setup):
    cfg, model, state, _ = setup
    criterion, _ = get_loss(cfg)
    step = jax.jit(make_train_step(model, criterion,
                                   ocr_alpha=cfg.loss.ocr_alpha))
    batch = jax.tree.map(jnp.asarray, _batch(cfg, 2))
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 5


def test_mesh_train_step_8way(setup):
    """Full DP train step over 8 virtual devices: batch sharded on 'data',
    state replicated; XLA inserts the gradient allreduce."""
    cfg, model, state0, _ = setup
    assert len(jax.devices()) == 8
    criterion, _ = get_loss(cfg)
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}

    step = jax.jit(make_train_step(model, criterion))
    batch = _batch(cfg, 8)
    sharded = shard_batch(mesh, batch)
    state = replicate(mesh, state0)
    state, metrics = step(state, sharded, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))

    # the sharded-batch result must match the single-device result bitwise-ish
    state1, metrics1 = jax.jit(make_train_step(model, criterion))(
        state0, jax.tree.map(jnp.asarray, batch), jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(metrics1["loss"]), rtol=1e-5)
    # ALL params + BN stats agree after one step (global batch stats ==
    # sync BN semantics) — first-leaf-only would miss a reduction bug in
    # any later layer
    from conftest import tree_l1_rel
    assert tree_l1_rel(state.params, state1.params) < 1e-5
    assert tree_l1_rel(state.batch_stats, state1.batch_stats) < 1e-5


def test_eval_step_hist(setup):
    cfg, model, state, _ = setup
    eval_model = get_model(make_config({
        "model.arch": "ocrnet.HRNet_Mscale_Tiny",
        "model.compute_dtype": "float32",
        "model.remat": False,
        "model.n_scales": (0.5, 1.0, 2.0),
    }))
    estep = jax.jit(make_eval_step(eval_model, 19))
    batch = jax.tree.map(jnp.asarray, _batch(cfg, 1))
    pred, hist = estep(state, batch)
    assert pred.shape == (1, 32, 32)
    assert hist.shape == (19, 19)
    assert int(hist.sum()) == 32 * 32


def test_poly_schedule_epoch_quantized(setup):
    _, _, _, sched = setup
    # epoch-granular (reference uses per-epoch LambdaLR)
    assert sched(0) == sched(9)
    assert sched(10) < sched(9)


def test_poly_and_poly2_match_reference_lambda():
    """Value oracles against the reference's own lambdas
    (loss/optimizer.py:60-75): poly = lr*(1-epoch/max)^exp; poly2 doubles
    the exponent after poly_step. Jit/unjit-only checks are self-oracles
    and would not catch a wrong formula."""
    import math

    from tpuseg.train.optim import make_schedule

    poly = make_schedule(make_config({
        "optim.lr": 0.02, "optim.lr_schedule": "poly",
        "optim.poly_exp": 2.0, "train.max_epoch": 40}), steps_per_epoch=7)
    for epoch in [0, 1, 13, 39]:
        want = 0.02 * math.pow(1 - epoch / 40, 2.0)
        assert abs(float(poly(epoch * 7)) - want) < 1e-9, epoch

    poly2 = make_schedule(make_config({
        "optim.lr": 0.02, "optim.lr_schedule": "poly2",
        "optim.poly_exp": 2.0, "optim.poly_step": 20,
        "train.max_epoch": 40}), steps_per_epoch=7)
    for epoch in [0, 5, 19, 20, 30, 39]:
        exp = 2.0 if epoch < 20 else 4.0
        want = 0.02 * math.pow(1 - epoch / 40, exp)
        assert abs(float(poly2(epoch * 7)) - want) < 1e-9, epoch


def test_train_step_bf16_default_dtype():
    """One train step at the SHIPPED default compute dtype (bfloat16):
    the f32-forced suite would otherwise never exercise bf16 promotion
    or the f32 islands under grad."""
    cfg = make_config({
        "model.arch": "ocrnet.HRNet_Mscale_Tiny",
        "model.remat": False,
        "dataset.num_classes": 19,
        "dataset.crop_size": (32, 32),
        "train.batch_size": 2,
        "loss.loss_type": "rmi",   # the SOTA loss, incl. f32 cholesky
    })
    assert cfg.model.compute_dtype == "bfloat16"  # shipped default
    model = get_model(cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3), jnp.bfloat16))
    criterion, _ = get_loss(cfg)
    step = jax.jit(make_train_step(model, criterion,
                                   ocr_alpha=cfg.loss.ocr_alpha))
    batch = jax.tree.map(jnp.asarray, _batch(cfg, 2))
    for i in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["loss"])), i
    # params stay f32 (bf16 compute / f32 params convention)
    assert all(l.dtype == jnp.float32
               for l in jax.tree.leaves(state.params))


@pytest.mark.parametrize("arch", ["deepv3.DeepV3PlusW38Tiny",
                                  "mscale.DeepV3W38Tiny"])
def test_train_step_no_aux_archs(arch):
    """Non-OCR archs return {'pred'} only — the train step must not
    require an 'aux' output (regression: KeyError('aux') at first step
    for the shipped deepv3 recipe)."""
    cfg = make_config({
        "model.arch": arch,
        "model.compute_dtype": "float32",
        "model.remat": False,
        "dataset.num_classes": 19,
        "dataset.crop_size": (32, 32),
        "train.batch_size": 2,
        "loss.loss_type": "ce",
    })
    model = get_model(cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)))
    criterion, _ = get_loss(cfg)
    step = jax.jit(make_train_step(model, criterion,
                                   ocr_alpha=cfg.loss.ocr_alpha))
    batch = jax.tree.map(jnp.asarray, _batch(cfg, 2))
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_scl_poly_schedule_matches_reference_lambda():
    """scl-poly: poly(poly_exp) before the restart epoch, then
    rescale * (1 - frac)^repoly after (reference: loss/optimizer.py:77-88,
    --rescale/--repoly defaults 1.0/1.5: train.py:102-105)."""
    import math

    from tpuseg.train.optim import make_schedule

    cfg = make_config({
        "optim.lr": 0.01, "optim.lr_schedule": "scl-poly",
        "optim.poly_exp": 2.0, "optim.rescale_lr": 0.3,
        "optim.repoly": 1.5, "train.max_epoch": 20,
        "loss.reduce_border_epoch": 10,
    })
    sched = make_schedule(cfg, steps_per_epoch=5)

    def ref(epoch):
        if epoch < 10:
            return 0.01 * math.pow(1 - epoch / 20, 2.0)
        return 0.01 * 0.3 * math.pow(1 - (epoch - 10) / (20 - 10), 1.5)

    for epoch in [0, 3, 9, 10, 15, 19]:
        got = float(sched(epoch * 5))
        assert abs(got - ref(epoch)) < 1e-9, (epoch, got, ref(epoch))

    # scl-poly without a restart epoch is a config error (reference:
    # optimizer.py:78-79)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="scl-poly"):
        make_schedule(make_config({"optim.lr_schedule": "scl-poly"}), 5)


def test_schedules_jittable_with_traced_step():
    """poly2/scl-poly run under jit where the step is a tracer — the
    optax wrapper calls the schedule on the traced opt-state count, so a
    Python `if` on the epoch would raise TracerBoolConversionError at the
    first train step (regression)."""
    from tpuseg.train.optim import make_schedule

    poly2 = make_schedule(make_config({
        "optim.lr": 0.01, "optim.lr_schedule": "poly2",
        "optim.poly_exp": 2.0, "optim.poly_step": 10,
        "train.max_epoch": 20}), steps_per_epoch=5)
    scl = make_schedule(make_config({
        "optim.lr": 0.01, "optim.lr_schedule": "scl-poly",
        "optim.poly_exp": 2.0, "optim.rescale_lr": 0.3,
        "optim.repoly": 1.5, "train.max_epoch": 20,
        "loss.reduce_border_epoch": 10}), steps_per_epoch=5)
    for sched in (poly2, scl):
        jitted = jax.jit(sched)
        for epoch in [0, 9, 10, 19]:
            got = float(jitted(jnp.asarray(epoch * 5)))
            want = float(sched(epoch * 5))
            assert abs(got - want) < 1e-9, (epoch, got, want)
            assert np.isfinite(got)


def test_selective_remat_stages_grad():
    """model.remat_stages remats only the listed HRNet stages; gradients
    flow and match the full-remat configuration (same function, different
    checkpointing)."""
    def grads(stages):
        cfg = make_config({
            "model.arch": "ocrnet.HRNet_Mscale_Tiny",
            "model.compute_dtype": "float32",
            "model.remat": True,
            "model.remat_stages": stages,
            "dataset.num_classes": 5,
        })
        model = get_model(cfg)
        v = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 32, 64, 3)), train=False)

        def loss(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                jnp.ones((1, 32, 64, 3)), train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.mean(out["pred"] ** 2)

        return v["params"], jax.jit(jax.grad(loss))(v["params"])

    p1, g_sel = grads((1, 2, 3))
    p2, g_all = grads(None)
    # same params (remat does not change the function)
    chex.assert_trees_all_close(p1, p2, rtol=0, atol=0)
    # L1-relative over all leaves (per CLAUDE.md convention)
    num = sum(float(jnp.abs(a - b).sum())
              for a, b in zip(jax.tree.leaves(g_sel), jax.tree.leaves(g_all)))
    den = sum(float(jnp.abs(a).sum()) for a in jax.tree.leaves(g_all))
    assert num / max(den, 1e-9) < 1e-5
