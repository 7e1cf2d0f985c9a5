"""Hierarchical multi-scale attention fusion — pure functions.

The paper's core mechanism (reference: network/ocrnet.py:185-327,
network/mscale.py:88-230): a dense attention map predicted at each scale
decides, pixel-wise, how much to trust that scale's prediction versus the
accumulated prediction from other scales.

These are *pure fusion combinators* over a single-scale forward callable —
the idiomatic JAX factoring of the reference's in-model branching. Any model
that returns ``{'cls_out', 'aux_out', 'logit_attn'}`` at input resolution
can be multi-scaled with them. All fusion arithmetic runs in float32.

Exact reference semantics preserved:
- evaluation order is high scale -> low scale;
- for s >= 1.0 the accumulated prediction is *downscaled* to the current
  scale before fusing (``p = attn*cls + (1-attn)*down(p)``);
- for s < 1.0 the current prediction is premultiplied by its attention,
  *then* upscaled, and fused as ``p = up(attn*cls) + (1-up(attn))*p``
  (reference: ocrnet.py:233-252).
"""
from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp

from tpuseg.evaluation.metrics import fmt_scale
from tpuseg.ops import resize_x, scale_as

ForwardFn = Callable[[jnp.ndarray], Dict[str, jnp.ndarray]]


def two_scale_fuse(fwd: ForwardFn, x_1x: jnp.ndarray, lo_scale: float = 0.5,
                   align_corners: bool = False,
                   fwd_hi=None) -> Dict[str, jnp.ndarray]:
    """Training-time fused two-scale forward (reference: ocrnet.py:264-327).

    Returns a dict with the attention-fused 'pred'/'aux' plus the raw
    per-scale outputs needed for supervised-mscale loss terms and eval
    asset dumps.

    ``fwd_hi(x, lo_out)``, when given, computes the high-scale pass with
    access to the low-scale output (the mscale.py fuse_aspp variant,
    reference: mscale.py:182-220); otherwise ``fwd`` is used at both
    scales.
    """
    x_lo = resize_x(x_1x, lo_scale, align_corners)
    lo = fwd(x_lo)
    hi = fwd_hi(x_1x, lo) if fwd_hi is not None else fwd(x_1x)

    pred_05x = lo["cls_out"].astype(jnp.float32)
    attn = lo["logit_attn"].astype(jnp.float32)
    p_1x = hi["cls_out"].astype(jnp.float32)
    has_aux = "aux_out" in lo

    # premultiply at low res, then upscale (reference: ocrnet.py:289-294)
    p_lo = scale_as(attn * pred_05x, p_1x, align_corners)
    attn_up = scale_as(attn, p_1x, align_corners)

    out = {
        "pred": p_lo + (1.0 - attn_up) * p_1x,
        "pred_05x": pred_05x,
        "pred_10x": p_1x,
        "attn_05x": attn,
    }
    if has_aux:
        aux_lo = lo["aux_out"].astype(jnp.float32)
        aux_1x = hi["aux_out"].astype(jnp.float32)
        aux_lo_up = scale_as(attn * aux_lo, p_1x, align_corners)
        out["aux"] = aux_lo_up + (1.0 - attn_up) * aux_1x
    return out


def nscale_fuse(fwd: ForwardFn, x_1x: jnp.ndarray, scales,
                align_corners: bool = False) -> Dict[str, jnp.ndarray]:
    """Inference-time hierarchical N-scale fusion (reference: ocrnet.py:185-262).

    ``scales`` must contain 1.0 (the target scale). Returns 'pred', 'aux'
    (only when the forward provides 'aux_out'), and per-scale
    'pred_{s}x' / 'attn_{s}x' assets.

    Perf note: the aux chain is only consumed by training losses; at
    inference, have ``fwd`` omit 'aux_out' to skip ~19 channels of f32
    full-resolution resizes per scale (the reference wastes this work,
    ocrnet.py:241-252 — 'pred' is unaffected).
    """
    assert 1.0 in [float(s) for s in scales], "1.0 must be among eval scales"
    scales = sorted([float(s) for s in scales], reverse=True)

    pred = None
    aux = None
    out: Dict[str, jnp.ndarray] = {}

    for s in scales:
        x = resize_x(x_1x, s, align_corners) if s != 1.0 else x_1x
        o = fwd(x)
        # fusion arithmetic inherits the forward's output dtype: f32 by
        # default (parity), bf16 when the model opts into fast fusion
        # (halves HBM traffic of the full-res chains; the reference itself
        # runs Mapillary eval in pure fp16 O3, README.md:73)
        cls_out = o["cls_out"]
        attn_out = o["logit_attn"].astype(cls_out.dtype)
        aux_out = o["aux_out"] if "aux_out" in o else None

        out[fmt_scale("pred", s)] = cls_out
        if s != 2.0:
            out[fmt_scale("attn", s)] = attn_out

        if pred is None:
            pred, aux = cls_out, aux_out
        elif s >= 1.0:
            # downscale accumulated, fuse at current resolution
            pred = scale_as(pred, cls_out, align_corners)
            pred = attn_out * cls_out + (1.0 - attn_out) * pred
            if aux is not None:
                aux = scale_as(aux, cls_out, align_corners)
                aux = attn_out * aux_out + (1.0 - attn_out) * aux
        else:
            # premultiply at low res, upscale, fuse at accumulated resolution
            cls_up = scale_as(attn_out * cls_out, pred, align_corners)
            attn_up = scale_as(attn_out, pred, align_corners)
            pred = cls_up + (1.0 - attn_up) * pred
            if aux is not None:
                aux_up = scale_as(attn_out * aux_out, pred, align_corners)
                aux = aux_up + (1.0 - attn_up) * aux

    out["pred"] = pred.astype(jnp.float32)
    if aux is not None:
        out["aux"] = aux.astype(jnp.float32)
    return out
