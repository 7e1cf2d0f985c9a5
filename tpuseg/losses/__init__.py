"""Pure-function losses over NHWC logits.

Replaces the reference's criterion-inside-the-model pattern
(loss/utils.py:40-67; SURVEY §1 "key architectural idiom"): here losses are
pure ``f(logits, labels) -> scalar`` composed outside the model under
``jax.value_and_grad``.
"""
from tpuseg.losses.ce import (
    cross_entropy,
    image_weighted_cross_entropy,
)
from tpuseg.losses.rmi import rmi_loss
from tpuseg.losses.relaxed import relaxed_soft_nll
from tpuseg.losses.factory import get_loss

__all__ = [
    "cross_entropy",
    "image_weighted_cross_entropy",
    "rmi_loss",
    "relaxed_soft_nll",
    "get_loss",
]
