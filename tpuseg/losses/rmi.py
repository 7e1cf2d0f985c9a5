"""Region Mutual Information loss in float32 (TPU has no f64).

Math per the reference (loss/rmi.py, loss/rmi_utils.py; RMI paper
arXiv:1910.12037):

  loss = 0.5 * BCE(logits, onehot(valid labels))
       + 0.5 * sum_c mean_b [ 0.5 * logdet(Sigma_y|p) / half_d ]

where ``Sigma_y|p = cov(y) - cov(y,p) cov(p)^-1 cov(y,p)^T`` over d=r*r=9
dimensional pixel-neighborhood vectors after a 4x4 average-pool downsample
(loss/rmi.py:148-163) — per class, per image.

Numerics: the reference computes the covariance/Cholesky chain in float64
(loss/rmi.py:171-172) because lower precision is unstable; TPU has no
f64, so the chain is reformulated to be f32-well-posed: covariances at
UNIT scale (divided by N) with the log-det compensated exactly by
d*log(N), relative jitter floors calibrated to the f32 error bounds, and
a NaN-rescue refactorization (see the inline analysis at the covariance
block — the reference's absolute 5e-4 jitter is ~5e-8 RELATIVE at the
1024x2048 recipe shape, below f32 epsilon, and real structured masks
make the Schur complement indefinite without this). ``logdet`` uses
``cholesky + 2*sum(log(diag))`` (loss/rmi_utils.py:95-107) and the 9x9
inverse uses ``cho_solve`` — tiny batched systems, MXU-irrelevant.
tests/test_rmi.py validates f32-vs-f64 agreement at loss level and
through gradients, plus finiteness at the production shape on
structured labels.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from tpuseg.ops.resize import avg_pool2d, max_pool2d

_CLIP_MIN = 1e-6      # post-sigmoid clip (reference: rmi.py:11)
_POS_ALPHA = 5e-4     # diagonal jitter for PD-ness (reference: rmi.py:12)


def _neighborhood_vectors(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Stack the r*r shifted views (reference map_get_pairs:
    rmi_utils.py:15-56).

    x: (B, H, W, C) -> (B, C, r*r, (H-r+1)*(W-r+1))
    """
    b, h, w, c = x.shape
    nh, nw = h - radius + 1, w - radius + 1
    views = [
        x[:, y:y + nh, xx:xx + nw, :]
        for y in range(radius) for xx in range(radius)
    ]
    v = jnp.stack(views, axis=1)                   # (B, r*r, nh, nw, C)
    v = v.transpose(0, 4, 1, 2, 3)                 # (B, C, r*r, nh, nw)
    return v.reshape(b, c, radius * radius, nh * nw)


def _safe_cholesky(m, eye, jitter, rescue: float = 1e-2):
    """Cholesky of ``m + jitter*I`` that cannot emit NaN: matrices the
    first factorization finds numerically indefinite (jnp cholesky
    silently returns NaN there) are refactored with a large
    unit-relative ``rescue`` jitter instead. The predicate is
    stop_gradient'ed and the bad INPUT is substituted before the
    differentiated factorization, so no NaN reaches the backward pass
    (the naive where-on-outputs pattern would)."""
    a = m + eye * jitter
    first = jnp.linalg.cholesky(a)
    bad = ~jnp.isfinite(first).all(axis=(-2, -1), keepdims=True)
    bad = jax.lax.stop_gradient(bad)
    return jnp.linalg.cholesky(jnp.where(bad, m + eye * rescue, a))


def _bce_with_logits(logits, targets, mask):
    """Sum-reduced masked binary CE with logits
    (reference: rmi.py:103-114)."""
    logits = logits.astype(jnp.float32)
    # numerically-stable BCE: max(x,0) - x*t + log(1+exp(-|x|))
    per = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    return (per * mask[..., None]).sum()


def rmi_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    num_classes: int | None = None,
    ignore_label: int = 255,
    radius: int = 3,
    pool_size: int = 4,
    pool_way: str = "avg",
    weight_lambda: float = 0.5,
    do_rmi: bool = True,
    pos_alpha: float = _POS_ALPHA,
) -> jnp.ndarray:
    """RMI loss (reference forward_sigmoid: loss/rmi.py:82-134).

    Args:
      logits: (B, H, W, C).
      labels: (B, H, W) int, ignore pixels >= num_classes.
      do_rmi: if False, returns only the BCE part (used for aux loss,
        reference: ocrnet.py:302-308).
    """
    num_classes = num_classes or logits.shape[-1]
    half_d = radius * radius

    valid = (labels >= 0) & (labels < num_classes)
    onehot = jax.nn.one_hot(jnp.where(valid, labels, 0), num_classes,
                            dtype=jnp.float32) * valid[..., None]

    valid_pixels = valid.sum().astype(jnp.float32)
    bce = _bce_with_logits(logits, onehot, valid.astype(jnp.float32))
    bce = bce / (valid_pixels + 1.0)
    if not do_rmi:
        return bce

    probs = jax.nn.sigmoid(logits.astype(jnp.float32)) * \
        valid[..., None].astype(jnp.float32) + _CLIP_MIN

    # 4x4 downsample before neighborhood stacking (reference: rmi.py:148-163)
    if pool_size > 1:
        pad = pool_size // 2
        if pool_way == "avg":
            onehot = avg_pool2d(onehot, pool_size, pool_size, pad)
            probs = avg_pool2d(probs, pool_size, pool_size, pad)
        elif pool_way == "max":
            onehot = max_pool2d(onehot, pool_size, pool_size, pad)
            probs = max_pool2d(probs, pool_size, pool_size, pad)
        else:
            raise ValueError(pool_way)

    la = _neighborhood_vectors(onehot, radius)     # (B, C, d, N)
    pr = _neighborhood_vectors(probs, radius)
    la = jax.lax.stop_gradient(la)

    la = la - la.mean(axis=3, keepdims=True)
    pr = pr - pr.mean(axis=3, keepdims=True)

    # f32 conditioning (the reference needs f64 here, rmi.py:171-172):
    # the covariances are SUMS over N ~ 1e5 positions, so their entries
    # reach ~1e4 and the reference's ABSOLUTE 5e-4 jitter is ~5e-8
    # RELATIVE — below f32 epsilon. On structured labels (large constant
    # regions, i.e. every real segmentation mask) la_cov is also rank-
    # deficient, and the f32 Schur complement comes out indefinite beyond
    # the jitter => cholesky silently returns NaN (reproduced at the
    # 1024x2048 recipe shape; tests/test_rmi.py::test_rmi_structured_
    # labels_production_scale_finite). Fix: compute at UNIT scale
    # (divide by N) and compensate the log-det EXACTLY with d*log(N)
    # (logdet(S + aI) = d*log(N) + logdet(S/N + (a/N)I)), flooring the
    # unit-scale jitters at levels calibrated to the f32 error bounds:
    # a Gram matrix's rounding is ~eps*|S| ~ 3e-8 << 1e-4, and the
    # cho_solve-amplified Schur error is ~eps*kappa*|S| <= 7.5e-5 < 3e-4.
    n = la.shape[-1]
    mm = partial(jnp.matmul, preferred_element_type=jnp.float32)
    inv_n = jnp.float32(1.0 / n)
    la_cov = mm(la, la.swapaxes(2, 3)) * inv_n     # (B, C, d, d), unit scale
    pr_cov = mm(pr, pr.swapaxes(2, 3)) * inv_n
    la_pr_cov = mm(la, pr.swapaxes(2, 3)) * inv_n

    eye = jnp.eye(half_d, dtype=jnp.float32)
    # a_pr floors the SOLVE's conditioning (kappa <= |pr_cov|/a_pr), which
    # bounds the f32 overshoot of the correction term to ~1e-3; a_va stays
    # at the reference-equivalent value so the log-det matches the f64
    # oracle wherever f32 can factor at all
    a_pr = max(pos_alpha / n, 1e-4)
    a_va = pos_alpha / n
    chol_pr = _safe_cholesky(pr_cov, eye, a_pr)
    rhs = la_pr_cov.swapaxes(2, 3)
    sol = jax.scipy.linalg.cho_solve((chol_pr, True), rhs)
    appro_var = la_cov - mm(la_pr_cov, sol)

    chol = _safe_cholesky(appro_var, eye, a_va)
    diag = jnp.diagonal(chol, axis1=-2, axis2=-1)
    logdet = 2.0 * jnp.sum(jnp.log(diag + 1e-8), axis=-1) \
        + jnp.float32(half_d * math.log(n))        # (B, C), sum-scale value

    rmi_per_class = (0.5 * logdet).mean(axis=0) / float(half_d)  # (C,)
    rmi = rmi_per_class.sum()

    # lambda_way=1 (reference: rmi.py:129-130)
    return weight_lambda * bce + (1.0 - weight_lambda) * rmi
