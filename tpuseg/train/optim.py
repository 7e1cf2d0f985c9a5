"""Optimizers + LR schedules in optax (reference: loss/optimizer.py:43-98).

The reference steps its LambdaLR once per epoch; schedules here are
functions of the global step but quantize to the epoch to match
(``epoch = step // steps_per_epoch``).

Weight decay follows torch semantics: ``grad += wd * param`` *before* the
momentum/moment updates, applied to every parameter (including BN affine),
matching ``optim.SGD(weight_decay=...)``.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import optax

from tpuseg.config import Config


def poly_schedule(base_lr: float, max_epoch: int, poly_exp: float,
                  steps_per_epoch: int) -> Callable[[int], float]:
    """lr = base * (1 - epoch/max_epoch)^poly_exp
    (reference poly_schd: loss/optimizer.py:67-68)."""
    def fn(step):
        epoch = step // steps_per_epoch
        return base_lr * (1.0 - epoch / max_epoch) ** poly_exp
    return fn


def poly2_schedule(base_lr: float, max_epoch: int, poly_exp: float,
                   poly_step: int, steps_per_epoch: int):
    """Exponent doubles after ``poly_step`` epochs
    (reference poly2_schd: loss/optimizer.py:70-75)."""
    def fn(step):
        # branch via jnp.where: `step` is a tracer inside the jitted
        # train step, so a Python `if` would crash at trace time
        epoch = step // steps_per_epoch
        exp = jnp.where(epoch < poly_step, poly_exp, 2.0 * poly_exp)
        return base_lr * (1.0 - epoch / max_epoch) ** exp
    return fn


def scl_poly_schedule(base_lr: float, max_epoch: int, poly_exp: float,
                      rescale_thresh: int, scale_value: float, repoly: float,
                      steps_per_epoch: int):
    """Warm-restart poly tied to REDUCE_BORDER_EPOCH
    (reference: loss/optimizer.py:77-87)."""
    def fn(step):
        # both branches are computed under jit (step is a tracer); clamp
        # the bases at 0 so the unselected branch can't produce nan
        epoch = step // steps_per_epoch
        pre = base_lr * jnp.maximum(1.0 - epoch / max_epoch, 0.0) ** poly_exp
        frac = (epoch - rescale_thresh) / (max_epoch - rescale_thresh)
        post = base_lr * scale_value * jnp.maximum(1.0 - frac, 0.0) ** repoly
        return jnp.where(epoch < rescale_thresh, pre, post)
    return fn


def make_schedule(cfg: Config, steps_per_epoch: int):
    oc = cfg.optim
    if oc.lr_schedule == "poly":
        return poly_schedule(oc.lr, cfg.train.max_epoch, oc.poly_exp,
                             steps_per_epoch)
    if oc.lr_schedule == "poly2":
        return poly2_schedule(oc.lr, cfg.train.max_epoch, oc.poly_exp,
                              oc.poly_step, steps_per_epoch)
    if oc.lr_schedule == "scl-poly":
        if cfg.loss.reduce_border_epoch == -1:
            raise ValueError("scl-poly requires loss.reduce_border_epoch")
        return scl_poly_schedule(oc.lr, cfg.train.max_epoch, oc.poly_exp,
                                 cfg.loss.reduce_border_epoch, oc.rescale_lr,
                                 oc.repoly, steps_per_epoch)
    raise ValueError(f"unknown lr schedule {oc.lr_schedule}")


def make_optimizer(cfg: Config, steps_per_epoch: int = 1):
    """-> (optax.GradientTransformation, schedule_fn)."""
    oc = cfg.optim
    schedule = make_schedule(cfg, steps_per_epoch)

    if oc.optimizer == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(oc.weight_decay),
            optax.trace(decay=oc.momentum, nesterov=False),
            optax.scale_by_learning_rate(schedule),
        )
    elif oc.optimizer == "adam":
        tx = optax.chain(
            optax.add_decayed_weights(oc.weight_decay),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(schedule),
        )
    elif oc.optimizer == "radam":
        # rectified Adam (reference: loss/radam.py:11-107). The reference
        # applies weight decay DECOUPLED (p -= lr*wd*p, radam.py:94-97),
        # not through the moments — so decay goes after scale_by_radam;
        # trajectory-matched against the torch original in
        # tests/test_optim_parity.py
        tx = optax.chain(
            optax.scale_by_radam(),
            optax.add_decayed_weights(oc.weight_decay),
            optax.scale_by_learning_rate(schedule),
        )
    else:
        raise ValueError(f"unknown optimizer {oc.optimizer}")
    return tx, schedule
