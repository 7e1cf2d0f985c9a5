"""Per-class boundary F-score (Perazzi DAVIS benchmark method).

Reference: utils/f_boundary.py:61-233. For each class: extract binary
boundary maps of prediction and ground truth, dilate by a distance
threshold (bound_th fraction of the image diagonal), and compute
precision/recall of matched boundary pixels -> F-measure.
"""
from __future__ import annotations

from multiprocessing.dummy import Pool

import numpy as np
from scipy.ndimage import distance_transform_edt


def _seg2bmap(seg: np.ndarray) -> np.ndarray:
    """Binary boundary map of a binary segmentation (reference seg2bmap,
    f_boundary.py:176-233): a pixel is boundary if it differs from its
    right, lower, or lower-right neighbor — marked on BOTH sides of the
    edge (the boundary sits 1/2 px toward the origin, with no
    foreground masking)."""
    seg = np.asarray(seg, dtype=bool)
    b = np.zeros_like(seg)
    b[:-1, :-1] = ((seg[:-1, :-1] ^ seg[:-1, 1:])
                   | (seg[:-1, :-1] ^ seg[1:, :-1])
                   | (seg[:-1, :-1] ^ seg[1:, 1:]))
    # the reference overwrites the last row/column with one-directional
    # XORs (right-neighbor only / down-neighbor only) and zeroes the corner
    b[-1, :-1] = seg[-1, :-1] ^ seg[-1, 1:]
    b[:-1, -1] = seg[:-1, -1] ^ seg[1:, -1]
    b[-1, -1] = False
    return b


def _dilate_disk(b: np.ndarray, radius: int) -> np.ndarray:
    """Euclidean-disk dilation matching skimage
    binary_dilation(b, disk(radius)) (the reference, f_boundary.py:140-143)
    via a distance transform: pixel in dilation <=> nearest boundary pixel
    within `radius` — O(1)/pixel instead of a (2r+1)^2 dense footprint
    (r ~ 19 at Cityscapes resolution)."""
    if radius < 1 or not b.any():
        return b
    return distance_transform_edt(~b) <= radius


def db_eval_boundary(pred_mask: np.ndarray, gt_mask: np.ndarray,
                     bound_th: float = 0.008) -> float:
    """Boundary F-measure between two binary masks
    (reference: f_boundary.py:95-139)."""
    bound_pix = bound_th if bound_th >= 1 else \
        int(np.ceil(bound_th * np.linalg.norm(pred_mask.shape)))

    fg_boundary = _seg2bmap(pred_mask)
    gt_boundary = _seg2bmap(gt_mask)

    fg_dil = _dilate_disk(fg_boundary, int(bound_pix))
    gt_dil = _dilate_disk(gt_boundary, int(bound_pix))

    gt_match = gt_boundary & fg_dil
    fg_match = fg_boundary & gt_dil

    n_fg = fg_boundary.sum()
    n_gt = gt_boundary.sum()

    if n_fg == 0 and n_gt > 0:
        return 0.0
    if n_fg > 0 and n_gt == 0:
        return 0.0
    if n_fg == 0 and n_gt == 0:
        return 1.0
    precision = fg_match.sum() / n_fg
    recall = gt_match.sum() / n_gt
    if precision + recall == 0:
        return 0.0
    return 2.0 * precision * recall / (precision + recall)


def eval_mask_boundary(pred: np.ndarray, gt: np.ndarray, num_classes: int,
                       bound_th: float = 0.008, num_proc: int = 8):
    """Per-class boundary F-scores for a batch of masks
    (reference: f_boundary.py:61-92).

    Returns (fscore_sum[num_classes], count[num_classes]).
    """
    fs = np.zeros(num_classes)
    counts = np.zeros(num_classes)

    def one(args):
        b, c = args
        if (gt[b] == c).any() or (pred[b] == c).any():
            return c, db_eval_boundary(pred[b] == c, gt[b] == c, bound_th)
        return c, None

    jobs = [(b, c) for b in range(pred.shape[0]) for c in range(num_classes)]
    with Pool(num_proc) as pool:
        for c, f in pool.map(one, jobs):
            if f is not None:
                fs[c] += f
                counts[c] += 1
    return fs, counts
