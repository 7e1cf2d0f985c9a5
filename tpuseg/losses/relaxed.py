"""Boundary-relaxed soft NLL loss over multi-hot border targets.

Reference: ImgWtLossSoftNLL + customsoftmax (loss/utils.py:137-231), used
with the relaxed-boundary label tensors built by the data pipeline
(transforms/transforms.py:74-123 -> tpuseg.data.relaxed_labels).

Semantics: along class-boundary pixels the target is multi-hot (every class
present in the border window is acceptable); ``customsoftmax`` lets the
model place mass on any of the acceptable classes:

  smax = log(max(softmax(x), multihot * sum(softmax(x) * multihot)))

Deviation from the reference, on purpose: the reference's per-sample loop
passes the *whole-batch* border-weight tensor into each per-image term,
which broadcasts and double-counts when batch size/GPU > 1 (it shipped with
bs=1/GPU so the bug is latent — loss/utils.py:221-228). Here each image
uses its own border weights; identical at bs=1.

The epoch-dependent border-weight inversion after REDUCE_BORDER_EPOCH
(loss/utils.py:183-186) is an explicit ``invert_border`` flag — epoch state
is carried by the train loop, not a mutable global.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def relaxed_soft_nll(
    logits: jnp.ndarray,
    relaxed_target: jnp.ndarray,
    upper_bound: float = 1.0,
    norm: bool = False,
    batch_weighting: bool = False,
    invert_border: bool = False,
) -> jnp.ndarray:
    """Args:
      logits: (B, H, W, C).
      relaxed_target: (B, H, W, C+1) multi-hot float; channel C flags ignore.
      invert_border: after REDUCE_BORDER_EPOCH, weight borders *up* instead
        of down and collapse multi-hot targets to hard single-hot.
    """
    num_classes = logits.shape[-1]
    target = relaxed_target[..., :num_classes].astype(jnp.float32)

    border_weights = target.sum(axis=-1)                    # (B, H, W)
    ignore_mask = border_weights == 0
    border_weights = jnp.where(ignore_mask, 1.0, border_weights)

    if invert_border:
        target = jnp.clip(target, 0.0, 1.0)
        inv_weights = 1.0 / border_weights
        border_weights = inv_weights

    # per-image class weights from the FULL (C+1)-channel histogram — the
    # ignore channel participates in the denominator, then its weight is
    # dropped (reference calculate_weights: loss/utils.py:165-177)
    full = relaxed_target.astype(jnp.float32)

    def class_w(t):  # t: (H, W, C+1) -> (C,)
        hist = t.sum(axis=(0, 1)) / jnp.maximum(t.sum(), 1.0)
        present = (hist != 0).astype(jnp.float32)
        if norm:
            w = present * upper_bound * (1.0 / jnp.maximum(hist, 1e-12)) + 1.0
        else:
            w = present * upper_bound * (1.0 - hist) + 1.0
        return w[:num_classes]

    if batch_weighting:
        w = class_w(full.reshape(-1, full.shape[2], num_classes + 1))
        wts = jnp.broadcast_to(w[None], (target.shape[0], num_classes))
    else:
        wts = jax.vmap(class_w)(full)                       # (B, C)

    # customsoftmax (reference: loss/utils.py:137-147)
    soft = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    border_mass = (soft * target).sum(axis=-1, keepdims=True)
    smax = jnp.log(jnp.maximum(soft, target * border_mass) + 1e-30)

    weighted = (target * wts[:, None, None, :] * smax).sum(axis=-1)
    loss_matrix = (-1.0 / border_weights) * weighted * (1.0 - ignore_mask)

    # per-image normalization by non-ignored pixel count (+1 vs div-by-0,
    # reference: loss/utils.py:200-205), summed over the batch
    h, w_ = logits.shape[1], logits.shape[2]
    denom = h * w_ - ignore_mask.sum(axis=(1, 2)) + 1.0
    return (loss_matrix.sum(axis=(1, 2)) / denom).sum()
