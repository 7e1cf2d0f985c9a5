"""Mapillary-scale on-chip eval benchmark (VERDICT r2 item 3).

Runs the exact eval_mapillary recipe shape on the real chip with synthetic
input: 65 classes, pre_size 2177 (long side; a typical 4:3 Mapillary val
image lands at 1633x2177), in-model n-scale attention fusion over
{0.25, 0.5, 1.0, 2.0} plus the outer horizontal-flip average, bf16 fusion
chains (the reference needs amp O3 — pure fp16 — to fit this on 32 GB
GPUs: /root/reference/scripts/eval_mapillary.yml:8-18, README.md:73).

Ragged val shapes are bucketed by ``eval.pad_multiple=64`` (the recipe
default), so the benched graph is the padded 1664x2240 bucket — the one
compiled graph real eval would reuse; throughput is reported per TRUE
image megapixel (1633x2177) with the padding overhead carried honestly.

Writes BENCH_mapillary.json: Mpx/s per chip + compiled peak-HBM numbers
from XLA's memory_analysis (does this fit a 16 GB v5e without remat?).
"""
from __future__ import annotations

import json

import jax
import jax.numpy as jnp

from tools._timing import measure_rtt, timeit_scan

TRUE_H, TRUE_W = 1633, 2177   # pre_size 2177 on a 4:3 landscape image
PAD = 64                      # eval.pad_multiple recipe default
H = -(-TRUE_H // PAD) * PAD   # 1664
W = -(-TRUE_W // PAD) * PAD   # 2240
NUM_CLASSES = 65
N_SCALES = (0.25, 0.5, 1.0, 2.0)


def main():
    from tpuseg.config import make_config
    from tpuseg.evaluation.inference import make_eval_forward
    from tpuseg.models import get_model

    cfg = make_config({
        "model.arch": "ocrnet.HRNet_Mscale",
        "model.n_scales": N_SCALES,
        "model.remat": False,
        "model.eval_fusion_dtype": "bfloat16",  # the reference's O3 analog
        "dataset.num_classes": NUM_CLASSES,
        "dataset.ignore_label": 65,
    })
    model = get_model(cfg)

    variables = jax.jit(lambda k, xi: model.init(k, xi, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3), jnp.bfloat16))

    fwd = make_eval_forward(model, NUM_CLASSES, scales=(1.0,), do_flip=True,
                            align_corners=False, is_mscale=True)

    def hist_only(v, x, label):
        acc = {"hist": jnp.zeros((NUM_CLASSES, NUM_CLASSES), jnp.int32),
               "scale_hists": {}, "loss_sum": jnp.float32(0.0),
               "loss_n": jnp.float32(0.0)}
        _, _, _, _, acc = fwd(v, x, label, acc)
        return acc["hist"]

    label = jnp.full((1, H, W), 65, jnp.int32).at[:, :TRUE_H, :TRUE_W].set(0)

    def scan_eval(v, x):
        def body(carry, i):
            xi = x * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
            hist = hist_only(v, xi, label)
            return carry + jnp.sum(hist).astype(jnp.float32), None

        total, _ = jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(4, dtype=jnp.int32))
        return total

    x = jax.random.normal(jax.random.PRNGKey(1), (1, H, W, 3), jnp.bfloat16)
    x = x.at[:, TRUE_H:].set(0).at[:, :, TRUE_W:].set(0)

    # AOT memory analysis of the single-eval graph (the padded bucket)
    mem = {}
    try:
        compiled = jax.jit(hist_only).lower(variables, x, label).compile()
        ma = compiled.memory_analysis()
        gib = 1024 ** 3
        mem = {
            "peak_temp_gib": round(ma.temp_size_in_bytes / gib, 3),
            "argument_gib": round(ma.argument_size_in_bytes / gib, 3),
            "output_gib": round(ma.output_size_in_bytes / gib, 3),
            "fits_16gib_v5e": (ma.temp_size_in_bytes
                               + ma.argument_size_in_bytes) < 15.5 * gib,
        }
    except Exception as e:  # relay may not expose AOT analysis
        mem = {"memory_analysis_error": repr(e)}

    dt = timeit_scan(jax.jit(scan_eval), variables, x)
    mpx_per_sec = (TRUE_H * TRUE_W / 1e6) / dt

    result = {
        "metric": "mapillary_msc_flip_eval_mpx_per_sec",
        "value": round(mpx_per_sec, 3),
        "unit": "true-image megapixels/sec/chip",
        "sec_per_image": round(dt, 3),
        "padded_shape": [H, W],
        "true_shape": [TRUE_H, TRUE_W],
        "n_scales": list(N_SCALES),
        "do_flip": True,
        "num_classes": NUM_CLASSES,
        "fusion_dtype": "bfloat16",
        "rtt_sec": round(measure_rtt(), 4),
        **mem,
    }
    print(json.dumps(result))
    with open("BENCH_mapillary.json", "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
