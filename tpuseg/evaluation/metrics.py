"""Confusion-matrix metrics: mIoU, accuracies, per-class tables.

TPU-native analogue of the reference's numpy metrics core
(utils/misc.py:50-201): the confusion matrix is computed **on device** as a
jittable bincount so eval never funnels full-resolution predictions through
the host; cross-replica aggregation is a `psum` over the data axis (replaces
the NCCL allreduce at utils/misc.py:110-114).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


def fast_hist_jax(pred: jnp.ndarray, gt: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Jittable confusion matrix.

    ``hist[i, j]`` = #pixels with ground-truth class i predicted as class j
    (reference: utils/misc.py:50-67, ``np.bincount(n*gt+pred)``). Pixels with
    gt outside [0, num_classes) (e.g. ignore=255) are dropped.

    Args:
      pred: int array, any shape.
      gt:   int array, same shape.
    Returns:
      (num_classes, num_classes) int32 matrix.
    """
    pred = pred.reshape(-1).astype(jnp.int32)
    gt = gt.reshape(-1).astype(jnp.int32)
    valid = (gt >= 0) & (gt < num_classes)
    # invalid pixels are routed to an overflow bin then dropped
    idx = jnp.where(valid, gt * num_classes + jnp.clip(pred, 0, num_classes - 1),
                    num_classes * num_classes)
    counts = jnp.bincount(idx, length=num_classes * num_classes + 1)
    return counts[:-1].reshape(num_classes, num_classes).astype(jnp.int32)


def fast_hist(pred: np.ndarray, gt: np.ndarray, num_classes: int) -> np.ndarray:
    """Host (numpy) confusion matrix, same semantics as :func:`fast_hist_jax`."""
    pred = np.asarray(pred).reshape(-1).astype(np.int64)
    gt = np.asarray(gt).reshape(-1).astype(np.int64)
    valid = (gt >= 0) & (gt < num_classes)
    return np.bincount(
        num_classes * gt[valid] + np.clip(pred[valid], 0, num_classes - 1),
        minlength=num_classes ** 2,
    ).reshape(num_classes, num_classes)


@dataclass
class IoUMetrics:
    iou: np.ndarray          # per-class IoU
    mean_iou: float
    acc: float               # pixel accuracy
    acc_cls: float           # mean per-class accuracy
    fwavacc: float           # frequency-weighted IoU
    hist: np.ndarray


def eval_metrics_from_hist(hist: np.ndarray) -> IoUMetrics:
    """IoU / accuracy family from a confusion matrix
    (reference: utils/misc.py:78-114)."""
    hist = np.asarray(hist, dtype=np.float64)
    tp = np.diag(hist)
    gt_per_class = hist.sum(axis=1)
    pred_per_class = hist.sum(axis=0)
    denom = gt_per_class + pred_per_class - tp
    with np.errstate(divide="ignore", invalid="ignore"):
        iu = tp / denom
        acc_cls_per = tp / gt_per_class
    acc = tp.sum() / max(hist.sum(), 1)
    acc_cls = float(np.nanmean(acc_cls_per))
    mean_iou = float(np.nanmean(iu))
    freq = gt_per_class / max(hist.sum(), 1)
    fwavacc = float((freq[denom > 0] * iu[denom > 0]).sum())
    return IoUMetrics(iou=iu, mean_iou=mean_iou, acc=float(acc),
                      acc_cls=acc_cls, fwavacc=fwavacc, hist=hist)


def format_evaluate_results(hist: np.ndarray, class_names: list[str] | None = None,
                            epoch: int = 0,
                            iou_per_scale: dict | None = None) -> str:
    """Per-class IoU/precision/recall table
    (reference: utils/misc.py:420-473). ``iou_per_scale`` maps an outer
    avgpool scale to its confusion matrix, adding per-scale iU columns
    (reference iU_{scale} headers: misc.py:440-451 — degenerate there,
    eval_metrics hard-codes scales=[1.0]; here it is live)."""
    hist = np.asarray(hist, dtype=np.float64)
    n = hist.shape[0]
    if class_names is None:
        class_names = [str(i) for i in range(n)]
    tp = np.diag(hist)
    fp = hist.sum(axis=0) - tp
    fn = hist.sum(axis=1) - tp
    with np.errstate(divide="ignore", invalid="ignore"):
        iu = tp / (tp + fp + fn)
        precision = tp / (tp + fp)
        recall = tp / (tp + fn)
        scale_ius = {}
        for scale, shist in (iou_per_scale or {}).items():
            shist = np.asarray(shist, dtype=np.float64)
            stp = np.diag(shist)
            scale_ius[scale] = stp / (shist.sum(axis=0) + shist.sum(axis=1)
                                      - stp)
    scale_hdr = "".join(f" {'iU_' + str(s):>9}" for s in scale_ius)
    lines = [f"IoU results (epoch {epoch}):",
             f"{'id':>3} {'class':<16} {'iou':>7} {'precision':>10} "
             f"{'recall':>8} {'tp':>12} {'fp':>12} {'fn':>12}" + scale_hdr]
    for i in range(n):
        scale_cols = "".join(f" {siu[i] * 100:>8.2f}%"
                             for siu in scale_ius.values())
        lines.append(
            f"{i:>3} {class_names[i]:<16} {iu[i] * 100:>6.2f}% "
            f"{precision[i]:>10.4f} {recall[i]:>8.4f} "
            f"{tp[i]:>12.0f} {fp[i]:>12.0f} {fn[i]:>12.0f}" + scale_cols)
    lines.append(f"mean iou: {np.nanmean(iu) * 100:.2f}%")
    for scale, siu in scale_ius.items():
        lines.append(f"mean iou @{scale}x: {np.nanmean(siu) * 100:.2f}%")
    return "\n".join(lines)


class AverageMeter:
    """Running mean (reference: utils/misc.py:485-501)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val, self.sum, self.count, self.avg = 0.0, 0.0, 0, 0.0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def fmt_scale(prefix: str, scale: float) -> str:
    """'pred_0.5x'-style asset keys (reference: utils/misc.py:504-513).

    The reference's ``scale_str.replace('.', '')`` discards its result
    (strings are immutable), so its actual keys/filenames KEEP the dot —
    match that, e.g. fmt_scale('pred', 0.5) == 'pred_0.5x'.
    """
    return f"{prefix}_{float(scale)}x"
