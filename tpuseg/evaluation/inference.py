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
from tpuseg.ops import device_label, device_normalize, resize_bilinear
from tpuseg.ops.normalize import IMAGENET_MEAN, IMAGENET_STD

# pipelined eval: batches between device-accumulator drains. Each drain is
# one ~1.4 KB readback (the sync that bounds the dispatch queue); 8 deep
# keeps at most 8 input images enqueued (~200 MB at 1024x2048) while
# amortizing the relay RTT 8x.
DRAIN_EVERY = 8


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
    criterion: Optional[Callable] = None,
    donate_acc: bool = True,
    mean=IMAGENET_MEAN,
    std=IMAGENET_STD,
):
    """Build the jitted full-eval forward.

    Returns fn(variables, image, label, acc, valid_hw=None) ->
      (avg_logits f32, pred int32, prob f32, asset_dict, acc').

    ``valid_hw`` (int32 [2], optional) marks the un-padded region of a
    shape-bucketed batch (EvalRunner ``pad_multiple``): after on-device
    normalization the padded border is masked to 0.0 in NORMALIZED space
    — exactly the value the f32 wire's host-side zero-pad carries — so
    padded batches are bitwise-identical across wire formats (a raw
    uint8 zero-pad would otherwise normalize to ~-2.1 sigma black and
    shift predictions near the border through conv receptive fields).
    For float inputs the mask is a bitwise no-op (valid x*1.0, pad
    0.0*0.0); ``None`` (default) compiles no mask at all.

    ``acc`` is the device-resident metric accumulator (see
    ``EvalRunner.init_acc``): the confusion matrix, per-outer-scale
    matrices and the val-loss sum accumulate ON DEVICE across batches, so
    the host loop never forces a per-image device->host sync — through
    the device relay (~29 ms RTT) the per-image hist/loss readbacks were
    serializing dispatch (the reference reads logits back and scores on
    host every image, utils/trnval_utils.py:170-198; the TPU-first loop
    drains a 19x19 int box every few batches instead)."""

    def forward(variables, image, label, acc, valid_hw=None):
        # uint8 transfer path: raw pixels over the wire, exact ImageNet
        # normalization on device (no-op for float32 batches)
        image = device_normalize(image, mean, std)
        label = device_label(label)
        if valid_hw is not None:
            hh = jax.lax.broadcasted_iota(jnp.int32, image.shape[1:3], 0)
            ww = jax.lax.broadcasted_iota(jnp.int32, image.shape[1:3], 1)
            pad_mask = ((hh < valid_hw[0]) & (ww < valid_hw[1]))
            image = image * pad_mask[None, :, :, None].astype(image.dtype)
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
        new_acc = {
            "hist": acc["hist"] + fast_hist_jax(prediction, label,
                                                num_classes),
            "scale_hists": {
                s: acc["scale_hists"][s] + fast_hist_jax(
                    jnp.argmax(v, axis=-1).astype(jnp.int32), label,
                    num_classes)
                for s, v in per_scale.items()},
            "loss_sum": acc["loss_sum"],
            "loss_n": acc["loss_n"],
        }
        if criterion is not None:
            # padded label pixels are ignore, so the masked mean matches
            # the cropped-host computation up to fp summation order
            loss = criterion(output, label).astype(jnp.float32)
            bs = jnp.float32(image.shape[0])
            new_acc["loss_sum"] = acc["loss_sum"] + loss * bs
            new_acc["loss_n"] = acc["loss_n"] + bs

        assets = {}
        for k, v in output_dict.items():
            if k.startswith("attn_"):
                assets[k] = v
            elif k.startswith("pred_"):
                assets[k] = jnp.argmax(v, axis=-1).astype(jnp.int32)
        return output, prediction, prob, assets, new_acc

    return jax.jit(forward, donate_argnums=(3,) if donate_acc else ())


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
    shift slightly near the padded border (off by default). The padded
    image border is masked on device to 0.0 in normalized space, so
    padded batches are bitwise-identical across wire formats (see
    ``make_eval_forward`` ``valid_hw``; pinned by
    tests/test_data.py::test_padded_eval_bitwise_across_wires).
    """

    def __init__(self, model, num_classes: int, scales=(1.0,),
                 do_flip: bool = False, align_corners: bool = False,
                 is_mscale: bool = True, ignore_label: int = 255,
                 criterion: Optional[Callable] = None,
                 pad_multiple: Optional[int] = None,
                 donate_acc: bool = True,
                 mean=IMAGENET_MEAN, std=IMAGENET_STD):
        self.num_classes = num_classes
        self.ignore_label = ignore_label
        self.pad_multiple = pad_multiple
        # static per-scale-hist key set (mirrors make_eval_forward's
        # `per_scale` gating) so multi-host reductions can run a fixed,
        # data-independent number of collectives even on hosts whose val
        # shard is empty
        self.scale_hist_scales = tuple(scales) if len(scales) > 1 else ()
        self.has_criterion = criterion is not None
        # the criterion is fused into the jitted forward: a separate
        # jitted loss call was a second dispatch + scalar readback per
        # image through the device relay
        self.forward = make_eval_forward(model, num_classes, scales, do_flip,
                                         align_corners, is_mscale, criterion,
                                         donate_acc, mean, std)

    def init_acc(self):
        """Fresh device-resident metric accumulator (confusion matrix,
        per-outer-scale matrices, val-loss sum). int32 bins overflow only
        after ~2e9 same-cell pixels, far beyond any drain interval."""
        c = self.num_classes
        return {
            "hist": jnp.zeros((c, c), jnp.int32),
            "scale_hists": {s: jnp.zeros((c, c), jnp.int32)
                            for s in self.scale_hist_scales},
            "loss_sum": jnp.float32(0.0),
            "loss_n": jnp.float32(0.0),
        }

    def drain(self, acc):
        """Read an accumulator back to host (ONE small sync). Returns
        (hist f64, {scale: hist f64}, loss_sum, loss_n)."""
        return (np.asarray(acc["hist"], np.float64),
                {s: np.asarray(v, np.float64)
                 for s, v in acc["scale_hists"].items()},
                float(acc["loss_sum"]), float(acc["loss_n"]))

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
                  need_assets: bool = True, acc=None):
        """One eval batch.

        Pipelined mode (``acc`` given): dispatches the jitted forward and
        returns ``(out, acc')`` WITHOUT any device->host sync on
        metrics-only batches — the caller accumulates on device and
        ``drain``\\ s every few batches (Trainer.validate /
        evaluate_only). ``out`` carries image assets only when
        ``need_assets``.

        Legacy mode (``acc`` is None): one-shot — returns
        ``(out, hist_np, val_loss)`` like the pre-pipelined API, at the
        cost of a per-call sync (topn's two-pass scoring and the bench
        tools use this).
        """
        legacy = acc is None
        if legacy:
            acc = self.init_acc()
        image, label = batch["image"], batch["label"]
        orig_hw = None
        if self.pad_multiple:
            # padding is a host-side op: materialize numpy only here —
            # callers may hand in already-device_put arrays (prefetch),
            # and an unconditional np.asarray would drag them back D2H
            image, label, orig_hw = self._pad(np.asarray(image),
                                              np.asarray(label))
        image = jnp.asarray(image)
        label = jnp.asarray(label)
        if orig_hw is None:
            output, pred, prob, assets, acc = self.forward(
                variables, image, label, acc)
        else:
            output, pred, prob, assets, acc = self.forward(
                variables, image, label, acc,
                jnp.asarray(orig_hw, jnp.int32))
        if orig_hw is not None:
            h, w = orig_hw
            pred = pred[:, :h, :w]
            prob = prob[:, :h, :w]
            assets = {k: v[:, :h, :w] if v.ndim >= 3 and
                      v.shape[1] >= h and v.shape[2] >= w else v
                      for k, v in assets.items()}
        out = {}
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
        if not legacy:
            return out, acc
        hist, scale_hists, loss_sum, loss_n = self.drain(acc)
        if scale_hists:
            # per-outer-scale confusion matrices; callers accumulate these
            # for the iU_{scale} breakdown (not an image asset)
            out["scale_hists"] = scale_hists
        val_loss = None
        if calc_metrics and self.has_criterion and loss_n:
            val_loss = loss_sum / loss_n
        return out, hist, val_loss
