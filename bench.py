"""Headline benchmark: multi-scale attention inference throughput.

Flagship HRNetV2-W48 + OCR + hierarchical attention at 1024x2048, fused
n-scale {0.5, 1.0, 2.0} inference (the 86.92-mIoU eval configuration of the
reference, scripts/eval_cityscapes.yml), bf16, one chip.

Prints ONE JSON line:
  {"metric": "msc_inference_mpx_per_sec", "value": N,
   "unit": "megapixels/sec/chip", "vs_baseline": N}

Timing methodology: the device tunnel used here satisfies
``block_until_ready`` without waiting for execution, so naive wall-clock
timing reports dispatch time only (measured: "32 PFLOP/s"). We therefore
run K model evaluations *inside one jitted lax.scan* (inputs perturbed per
step so nothing collapses), force a scalar readback, and subtract the
measured relay round-trip. Methodology calibrated against a bf16 matmul
chain reaching 179 TFLOP/s (~91% of v5e peak).

Baseline: the reference publishes no throughput (SURVEY §6); BASELINE.json
sets the bar at ">= 2x A100 images/sec/chip". The denominator is DERIVED
(docs/ROOFLINE.md): the same graph moves >= 269 GB HBM/image (measured via
the v5e roofline it saturates), giving a 135 ms/image device floor on an
A100-80GB, x1.5-2.5 for torch-eager traffic, plus the reference's
synchronous per-image host path (160 MB logits to CPU, CPU argmax, numpy
hist: utils/trnval_utils.py:170-198) -> 0.32-0.56 s/image, central
~5 Mpx/s per A100. This build runs the whole pipeline on device at
>= 94% of the v5e HBM roofline (component breakdown + why that is the
chip's limit for this graph shape: docs/ROOFLINE.md).
"""
from __future__ import annotations

import json

import jax
import jax.numpy as jnp

from tools._timing import scan_k, timeit_scan

H, W = 1024, 2048
SCALES = (0.5, 1.0, 2.0)
A100_BASELINE_MPX_S = 5.0  # derived; see docs/ROOFLINE.md


def main():
    from tpuseg.config import make_config
    from tpuseg.models import get_model

    cfg = make_config({
        "model.arch": "ocrnet.HRNet_Mscale",
        "model.n_scales": SCALES,
        "model.remat": False,
        # production eval config: bf16 fusion chains mirror the
        # reference's own fp16 (apex O1) eval recipe
        # (scripts/eval_cityscapes.yml); the f32-fusion parity default
        # is ~1.4% slower (docs/ROOFLINE.md breakdown)
        "model.eval_fusion_dtype": "bfloat16",
        "dataset.num_classes": 19,
    })
    model = get_model(cfg)

    variables = jax.jit(lambda k, xi: model.init(k, xi, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3), jnp.bfloat16))

    fwd = scan_k(lambda v, xi: model.apply(v, xi, train=False)["pred"])
    x = jax.random.normal(jax.random.PRNGKey(1), (1, H, W, 3), jnp.bfloat16)
    dt = timeit_scan(fwd, variables, x)

    mpx_per_sec = (H * W / 1e6) / dt
    # BASELINE.json states the target as "A100 images/sec/chip"; at the
    # fixed 1024x2048 eval shape img/s = Mpx/s / 2.097, so the headline
    # carries both units against the same derived A100 denominator
    print(json.dumps({
        "metric": "msc_inference_mpx_per_sec",
        "value": round(mpx_per_sec, 3),
        "unit": "megapixels/sec/chip",
        "vs_baseline": round(mpx_per_sec / A100_BASELINE_MPX_S, 3),
        "images_per_sec_chip": round(1.0 / dt, 3),
        "a100_baseline_images_per_sec": round(
            A100_BASELINE_MPX_S / (H * W / 1e6), 3),
    }))


if __name__ == "__main__":
    main()
