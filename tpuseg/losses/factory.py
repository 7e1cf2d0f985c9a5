"""Loss factory (reference get_loss: loss/utils.py:40-67).

Returns pure ``criterion(logits, labels, do_rmi=...) -> scalar`` callables.
The val criterion is always plain CE, as in the reference.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

from tpuseg.config import Config
from tpuseg.losses.ce import cross_entropy, image_weighted_cross_entropy
from tpuseg.losses.relaxed import relaxed_soft_nll
from tpuseg.losses.rmi import rmi_loss

Criterion = Callable


def get_loss(cfg: Config) -> tuple[Criterion, Criterion]:
    """-> (train criterion, val criterion).

    Train criterions accept ``do_rmi`` so the mscale aux-loss path can
    disable the expensive RMI term (reference: ocrnet.py:300-308).
    """
    lc = cfg.loss
    ignore = cfg.dataset.ignore_label
    n = cfg.dataset.num_classes

    if lc.loss_type == "rmi":
        def criterion(logits, labels, do_rmi=True):
            return rmi_loss(logits, labels, num_classes=n,
                            ignore_label=ignore, radius=lc.rmi_radius,
                            pool_size=lc.rmi_pool_size, do_rmi=do_rmi)
    elif lc.loss_type == "img_wt":
        def criterion(logits, labels, do_rmi=None):
            return image_weighted_cross_entropy(
                logits, labels, ignore_label=ignore,
                upper_bound=lc.img_wt_bound,
                batch_weighting=lc.batch_weighting)
    elif lc.loss_type == "relaxed":
        def criterion(logits, relaxed_target, do_rmi=None,
                      invert_border=False):
            return relaxed_soft_nll(
                logits, relaxed_target, upper_bound=lc.img_wt_bound,
                batch_weighting=lc.batch_weighting,
                invert_border=invert_border)
    elif lc.loss_type == "ce":
        def criterion(logits, labels, do_rmi=None):
            return cross_entropy(logits, labels, ignore_label=ignore)
    else:
        raise ValueError(f"unknown loss_type {lc.loss_type}")

    val_criterion = partial(cross_entropy, ignore_label=ignore)
    return criterion, val_criterion
