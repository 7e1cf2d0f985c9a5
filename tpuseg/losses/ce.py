"""Cross-entropy losses (reference: loss/utils.py:70-134)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  ignore_label: int = 255) -> jnp.ndarray:
    """Mean CE over non-ignored pixels.

    Matches ``NLLLoss(log_softmax)`` with ``ignore_index``
    (reference CrossEntropyLoss2d: loss/utils.py:121-134).

    Args:
      logits: (B, H, W, C) float.
      labels: (B, H, W) int.
    """
    num_classes = logits.shape[-1]
    valid = (labels >= 0) & (labels < num_classes)
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # one-hot contraction, not take_along_axis: identical values (summing
    # exact zeros), but the backward is a dense multiply instead of a
    # full-resolution scatter (slow on TPU)
    onehot = jax.nn.one_hot(safe, num_classes, dtype=logp.dtype)
    nll = -jnp.sum(logp * onehot, axis=-1)
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1)


def _image_class_weights(labels: jnp.ndarray, num_classes: int,
                         upper_bound: float, norm: bool) -> jnp.ndarray:
    """Per-image class weights from the label histogram
    (reference calculate_weights: loss/utils.py:87-100).

    labels: (H, W) int -> (C,) weights. Ignore pixels (outside [0, C)) are
    excluded from the histogram, as torch.histc(min=0, max=C) excludes them.
    """
    valid = (labels >= 0) & (labels < num_classes)
    idx = jnp.where(valid, labels, num_classes)
    bins = jnp.bincount(idx.reshape(-1), length=num_classes + 1)[:-1]
    bins = bins.astype(jnp.float32)
    hist_norm = bins / jnp.maximum(bins.sum(), 1.0)
    present = (bins != 0).astype(jnp.float32)
    if norm:
        w = present * upper_bound * (1.0 / jnp.maximum(hist_norm, 1e-12)) + 1.0
    else:
        w = present * upper_bound * (1.0 - hist_norm) + 1.0
    return w


def image_weighted_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_label: int = 255,
    upper_bound: float = 1.0,
    norm: bool = False,
    batch_weighting: bool = False,
) -> jnp.ndarray:
    """Image-weighted CE (reference ImageBasedCrossEntropyLoss2d:
    loss/utils.py:70-118).

    The reference loops per-sample computing class weights from each image's
    own histogram, then sums the per-image mean NLLs. Vectorized here with
    ``vmap`` — the per-sample python loop is a GPU-ism.

    With ``batch_weighting`` the weights come from the whole batch histogram
    (reference: cfg.BATCH_WEIGHTING, loss/utils.py:104-106).
    """
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = (labels >= 0) & (labels < num_classes)
    safe = jnp.where(valid, labels, 0)
    # scatter-free backward (see cross_entropy)
    onehot = jax.nn.one_hot(safe, num_classes, dtype=logp.dtype)
    nll = -jnp.sum(logp * onehot, axis=-1)  # (B,H,W)

    if batch_weighting:
        w = _image_class_weights(labels, num_classes, upper_bound, norm)
        weights = jnp.broadcast_to(w[None], (labels.shape[0], num_classes))
    else:
        weights = jax.vmap(
            lambda lb: _image_class_weights(lb, num_classes, upper_bound, norm)
        )(labels)  # (B, C)

    pix_w = jax.vmap(lambda w, s: w[s])(weights, safe)  # (B, H, W)
    pix_w = jnp.where(valid, pix_w, 0.0)
    # torch NLLLoss(weight, reduction='mean') normalizes by the summed weights
    per_image = (nll * pix_w).sum(axis=(1, 2)) / jnp.maximum(
        pix_w.sum(axis=(1, 2)), 1e-8)
    return per_image.sum()
