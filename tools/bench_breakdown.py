"""Component breakdown of the multi-scale eval pipeline on one chip.

Times (relay-safe, see bench.py) jitted sub-graphs of the headline
1024x2048 nscale {0.5,1.0,2.0} inference to locate the HBM-roofline mass:
  full_f32fusion   - the parity default (BENCH configuration)
  full_bf16fusion  - bf16 fusion chains (reference runs fp16 O1/O3 anyway)
  full_bf16fusion_bf16w - + conv kernels stored in bf16 (BN stats stay f32)
  trunk20          - HRNet trunk alone at the 2.0x input (2048x4096)
  single20         - full single-scale pass at 2.0x (trunk+OCR+attn+upsample)

Prints one JSON line per entry as it completes (restart-friendly).
Timing methodology: tools/_timing.py (single source, shared with bench.py).
"""
import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools._timing import scan_k, timeit_scan as timeit  # noqa: E402

H, W = 1024, 2048


def main():
    from tpuseg.config import make_config
    from tpuseg.models import get_model

    def mk(fusion):
        cfg = make_config({
            "model.arch": "ocrnet.HRNet_Mscale",
            "model.n_scales": (0.5, 1.0, 2.0),
            "model.remat": False,
            "model.eval_fusion_dtype": fusion,
            "dataset.num_classes": 19,
        })
        return get_model(cfg)

    model = mk("float32")
    variables = jax.jit(lambda k, xi: model.init(k, xi, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3), jnp.bfloat16))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, H, W, 3), jnp.bfloat16)
    mpx = H * W / 1e6

    def report(name, dt, note=""):
        print(json.dumps({"name": name, "ms": round(dt * 1e3, 1),
                          "mpx_per_s": round(mpx / dt, 3), "note": note}),
              flush=True)

    # 1. parity default
    f = scan_k(lambda v, xi: model.apply(v, xi, train=False)["pred"])
    report("full_f32fusion", timeit(f, variables, x))

    # 2. bf16 fusion
    m2 = mk("bfloat16")
    f2 = scan_k(lambda v, xi: m2.apply(v, xi, train=False)["pred"])
    report("full_bf16fusion", timeit(f2, variables, x))

    # 3. bf16 fusion + bf16-stored conv kernels (BN stats/params stay f32)
    import flax
    flat = flax.traverse_util.flatten_dict(variables["params"])
    flat = {k: (v.astype(jnp.bfloat16) if k[-1] == "kernel" else v)
            for k, v in flat.items()}
    vb = {"params": flax.traverse_util.unflatten_dict(flat),
          "batch_stats": variables["batch_stats"]}
    report("full_bf16fusion_bf16w", timeit(f2, vb, x))

    # 4. trunk-only at the 2.0x input
    x20 = jax.random.normal(jax.random.PRNGKey(2), (1, 2 * H, 2 * W, 3),
                            jnp.bfloat16)
    trunk = scan_k(lambda v, xi: model.apply(
        v, xi, train=False,
        method=lambda m, xi2, train: m.backbone(xi2, train)[2]))
    report("trunk20", timeit(trunk, variables, x20), "trunk fwd @2048x4096")

    # 5. full single-scale pass at 2.0x
    s20 = scan_k(lambda v, xi: model.apply(
        v, xi, False, method="single_scale")["cls_out"])
    report("single20", timeit(s20, variables, x20), "single scale @2.0x")


if __name__ == "__main__":
    main()
