"""Eval-time inference: outer flip x avgpool-scale loop around the
(possibly in-model multi-scale) forward.

Reference: eval_minibatch (utils/trnval_utils.py:82-198). Two multi-scale
mechanisms compose exactly as in the reference:
1. in-model hierarchical attention fusion (model's nscale path);
2. an OUTER averaging loop over ``extra_scales`` x horizontal flips.

TPU-first: softmax/argmax/confusion-matrix run on device inside the jitted
step; only int predictions and small assets come back to the host. Each
distinct input shape compiles once (val sets with fixed resolution compile
exactly two graphs: flip handled by jnp.flip inside the same graph).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.evaluation.metrics import fast_hist_jax, fmt_scale
from tpuseg.ops import resize_bilinear


def calc_err_mask_all(pred: np.ndarray, gt: np.ndarray,
                      num_classes: int, ignore_label: int = 255) -> np.ndarray:
    """Class-agnostic error mask (reference: trnval_utils.py:71-79)."""
    mask = (gt >= 0) & (gt != ignore_label)
    return (mask & (pred != gt)).astype(int)


def calc_err_mask(pred, gt, classid, ignore_label: int = 255):
    """Class-specific error mask (reference: trnval_utils.py:58-68)."""
    class_mask = (gt >= 0) & (gt == classid)
    fp = (pred == classid) & ~class_mask & (gt != ignore_label)
    fn = (pred != classid) & class_mask
    return (fp | fn).astype(int)


def make_eval_forward(
    model,
    num_classes: int,
    scales=(1.0,),
    do_flip: bool = False,
    align_corners: bool = False,
    is_mscale: bool = True,
):
    """Build the jitted full-eval forward.

    Returns fn(variables, image, label) ->
      (avg_logits f32, pred int32, prob f32, hist, asset_dict).
    """

    def forward(variables, image, label):
        input_size = image.shape[-3:-1]
        flips = (1, 0) if do_flip else (0,)
        output = 0.0
        output_dict = {}
        # flip-averaged logits per outer scale, for the per-scale IoU
        # breakdown (reference iU_{scale} reporting: utils/misc.py:440-451)
        per_scale = {s: 0.0 for s in scales} if len(scales) > 1 else {}
        for flip in flips:
            for scale in scales:
                x = jnp.flip(image, axis=-2) if flip else image
                if scale != 1.0:
                    size = [round(s * scale) for s in input_size]
                    x = resize_bilinear(x, size, align_corners)
                odict = model.apply(variables, x, train=False)
                pred = odict["pred"].astype(jnp.float32)
                if not is_mscale:
                    output_dict[fmt_scale("pred", scale)] = pred
                if flip == 0 and scale == scales[0]:
                    # keep per-scale assets from the canonical orientation
                    # at the base (default) scale
                    for k, v in odict.items():
                        if k.startswith(("pred_", "attn_")):
                            output_dict[k] = v.astype(jnp.float32)
                if scale != 1.0:
                    pred = resize_bilinear(pred, input_size, align_corners)
                pred = jnp.flip(pred, axis=-2) if flip else pred
                output = output + pred
                if per_scale:
                    per_scale[scale] = per_scale[scale] + pred
        output = output / (len(scales) * len(flips))

        probs = jax.nn.softmax(output, axis=-1)
        prob = jnp.max(probs, axis=-1)
        prediction = jnp.argmax(output, axis=-1).astype(jnp.int32)
        hist = fast_hist_jax(prediction, label, num_classes)
        scale_hists = {
            s: fast_hist_jax(jnp.argmax(v, axis=-1).astype(jnp.int32),
                             label, num_classes)
            for s, v in per_scale.items()}

        assets = {}
        for k, v in output_dict.items():
            if k.startswith("attn_"):
                assets[k] = v
            elif k.startswith("pred_"):
                assets[k] = jnp.argmax(v, axis=-1).astype(jnp.int32)
        return output, prediction, prob, hist, assets, scale_hists

    return jax.jit(forward)


class EvalRunner:
    """Drives eval over a loader, accumulating the confusion matrix on
    device and assembling host-side assets for dumping.

    Replaces the body of validate() + eval_minibatch
    (reference: train.py:536-597, trnval_utils.py:82-198).

    ``pad_multiple`` buckets variable-size val images (Mapillary) by
    padding H/W up to a multiple before the forward and cropping outputs
    back — every image in a bucket shares one compiled graph instead of
    recompiling per exact shape (SURVEY §7 hard part #3). Padded label
    pixels are ignore, so the confusion matrix is exact; predictions can
    shift slightly near the padded border (off by default).
    """

    def __init__(self, model, num_classes: int, scales=(1.0,),
                 do_flip: bool = False, align_corners: bool = False,
                 is_mscale: bool = True, ignore_label: int = 255,
                 criterion: Optional[Callable] = None,
                 pad_multiple: Optional[int] = None):
        self.num_classes = num_classes
        self.ignore_label = ignore_label
        # jit the val criterion: eager per-batch loss dispatches op-by-op
        # through the device relay (~30x slower); jit caches per shape
        self.criterion = jax.jit(criterion) if criterion is not None \
            else None
        self.pad_multiple = pad_multiple
        # static per-scale-hist key set (mirrors make_eval_forward's
        # `per_scale` gating) so multi-host reductions can run a fixed,
        # data-independent number of collectives even on hosts whose val
        # shard is empty
        self.scale_hist_scales = tuple(scales) if len(scales) > 1 else ()
        self.forward = make_eval_forward(model, num_classes, scales, do_flip,
                                         align_corners, is_mscale)

    def _pad(self, image: np.ndarray, label: np.ndarray):
        m = self.pad_multiple
        h, w = image.shape[1:3]
        ph = (-h) % m
        pw = (-w) % m
        if ph == 0 and pw == 0:
            return image, label, (h, w)
        image = np.pad(image, ((0, 0), (0, ph), (0, pw), (0, 0)))
        label = np.pad(label, ((0, 0), (0, ph), (0, pw)), mode="constant",
                       constant_values=self.ignore_label)
        return image, label, (h, w)

    def run_batch(self, variables, batch, calc_metrics: bool = True,
                  need_assets: bool = True):
        image = np.asarray(batch["image"])
        label = np.asarray(batch["label"])
        orig_hw = None
        if self.pad_multiple:
            image, label, orig_hw = self._pad(image, label)
        image = jnp.asarray(image)
        label = jnp.asarray(label)
        output, pred, prob, hist, assets, scale_hists = self.forward(
            variables, image, label)
        if orig_hw is not None:
            h, w = orig_hw
            output = output[:, :h, :w]
            pred = pred[:, :h, :w]
            prob = prob[:, :h, :w]
            assets = {k: v[:, :h, :w] if v.ndim >= 3 and
                      v.shape[1] >= h and v.shape[2] >= w else v
                      for k, v in assets.items()}
            label = label[:, :h, :w]
        out = {}
        if scale_hists:
            # per-outer-scale confusion matrices; callers accumulate these
            # for the iU_{scale} breakdown (not an image asset)
            out["scale_hists"] = {s: np.asarray(v)
                                  for s, v in scale_hists.items()}
        if need_assets:
            # full-resolution device->host transfers (pred/prob/attention
            # maps, ~tens of MB per image) — callers pass
            # need_assets=False on batches the dumper will skip
            # (dumper.wants), keeping metrics-only eval on-device
            pred_np = np.asarray(pred)
            out["predictions"] = pred_np
            out["prob_mask"] = np.asarray(prob)
            for k, v in assets.items():
                out[k] = np.asarray(v)
            if calc_metrics:
                out["err_mask"] = calc_err_mask_all(
                    pred_np, np.asarray(batch["label"]),
                    self.num_classes, self.ignore_label)
        val_loss = None
        if calc_metrics and self.criterion is not None:
            val_loss = float(self.criterion(output, label))
        return out, np.asarray(hist), val_loss
