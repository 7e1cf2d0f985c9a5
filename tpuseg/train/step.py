"""Jitted train/eval steps — the whole distributed runtime.

The reference's engine (train.py:465-533: DDP gradient allreduce, amp loss
scaling, loss-logging allreduce) collapses into one ``jax.jit`` over a
GSPMD mesh: with the batch sharded over the ``data`` axis and the state
replicated, XLA inserts the gradient/metric collectives (SURVEY §2.8
rows 2, 3, 6). bf16 needs no loss scaling.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from tpuseg.ops import device_label, device_normalize, scale_as
from tpuseg.ops.normalize import IMAGENET_MEAN, IMAGENET_STD


def make_loss_fn(
    model,
    criterion: Callable,
    ocr_alpha: float = 0.4,
    aux_rmi: bool = False,
    supervised_mscale_wt: float = 0.0,
    align_corners: bool = False,
    mean=IMAGENET_MEAN,
    std=IMAGENET_STD,
):
    """Train-mode forward + loss composition
    (reference: ocrnet.py:300-319) as a pure function of
    ``(params, batch_stats, batch, rng)`` -> ``(loss, mutated)``.

    Factored out of :func:`make_train_step` so the train-parity oracle
    (tests/test_train_parity.py) differentiates the EXACT production loss
    against the torch reference's train step."""

    def loss_fn(params, batch_stats, batch, rng):
        # uint8 transfer path: raw pixels over the wire, exact ImageNet
        # normalization on device (no-op for float32 batches); relaxed
        # float label tensors pass device_label untouched
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            device_normalize(batch["image"], mean, std), train=True,
            mutable=["batch_stats"], rngs={"dropout": rng})
        labels = device_label(batch["label"])
        loss = criterion(out["pred"], labels, do_rmi=True)
        # aux loss exists only for OCR-family models (reference:
        # ocrnet.py:118,300-311); DeepV3/mscale return {'pred'} only
        if "aux" in out:
            loss = loss + ocr_alpha * criterion(
                out["aux"], labels, do_rmi=aux_rmi)
        if supervised_mscale_wt and "pred_05x" in out:
            p05 = scale_as(out["pred_05x"], out["pred"], align_corners)
            loss_lo = criterion(p05, labels, do_rmi=False)
            loss_hi = criterion(out["pred_10x"], labels, do_rmi=False)
            loss = loss + supervised_mscale_wt * (loss_lo + loss_hi)
        return loss, mutated

    return loss_fn


def make_train_step(
    model,
    criterion: Callable,
    ocr_alpha: float = 0.4,
    aux_rmi: bool = False,
    supervised_mscale_wt: float = 0.0,
    align_corners: bool = False,
    mean=IMAGENET_MEAN,
    std=IMAGENET_STD,
):
    """Build the fused two-scale training step
    (loss composition per reference: ocrnet.py:300-319)."""
    loss_fn = make_loss_fn(model, criterion, ocr_alpha, aux_rmi,
                           supervised_mscale_wt, align_corners, mean, std)

    def train_step(state, batch, dropout_rng):
        rng = jax.random.fold_in(dropout_rng, state.step)
        (loss, mutated), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   batch, rng)
        new_state = state.apply_gradients(grads, mutated["batch_stats"])
        return new_state, {"loss": loss}

    return train_step


def make_eval_step(model, num_classes: int,
                   mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """Eval step: n-scale fused forward -> argmax -> on-device confusion
    matrix (replaces eval_minibatch's host softmax/argmax + NCCL hist
    allreduce, reference: utils/trnval_utils.py:170-198, misc.py:110-114)."""
    from tpuseg.evaluation.metrics import fast_hist_jax

    def eval_step(state, batch):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            device_normalize(batch["image"], mean, std), train=False)
        pred = jnp.argmax(out["pred"], axis=-1).astype(jnp.int32)
        hist = fast_hist_jax(pred, device_label(batch["label"]), num_classes)
        return pred, hist

    return eval_step
