"""Per-layer activation diff harness for mIoU-parity debugging.

The reference ships no tests (SURVEY §4); bisecting a converted-checkpoint
mIoU gap needs per-layer comparison against the torch model (SURVEY §7 hard
part #7). Workflow:

1. On a GPU box with the reference installed, dump torch activations:
     acts = {}  # name -> numpy NCHW
     for name, module in net.named_modules():
         module.register_forward_hook(
             lambda m, i, o, name=name: acts.__setitem__(name, o.detach()
                 .cpu().numpy()) if torch.is_tensor(o) else None)
     net(inputs); np.savez("torch_acts.npz", **acts)
2. Here:
     python tools/compare_activations.py --arch ocrnet.HRNet_Mscale \
         --ckpt ckpt_jax/ --image img.png --torch-acts torch_acts.npz

Flax intermediates are captured with ``capture_intermediates=True`` and
matched to torch module names through the converter's key map
(tools/convert_torch_ckpt.py). NCHW dumps are transposed to NHWC before
diffing; the report lists max/mean abs diff per matched layer in forward
order so the first divergent layer is obvious.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from convert_torch_ckpt import flax_to_torch_key  # noqa: E402


def capture_flax_intermediates(model, variables, x):
    """-> dict flax_path -> activation (module __call__ outputs)."""
    import jax

    _, state = model.apply(variables, x, train=False,
                           capture_intermediates=True, mutable=["intermediates"])

    flat = {}

    def walk(tree, prefix=""):
        for k, v in tree.items():
            if k == "__call__":
                # keep the LAST invocation: the documented torch hook
                # overwrites acts[name] per forward, so for multi-scale
                # models (every module called once per scale pass) torch
                # holds the final pass — v[-1] matches that; v[0] would
                # compare the 0.5x pass against torch's 1.0x
                out = v[-1]
                if isinstance(out, (tuple, list)):
                    for i, o in enumerate(out):
                        if hasattr(o, "shape"):
                            flat[f"{prefix[:-1]}#{i}"] = np.asarray(o)
                elif isinstance(out, dict):
                    for dk, o in out.items():
                        flat[f"{prefix[:-1]}#{dk}"] = np.asarray(o)
                elif hasattr(out, "shape"):
                    flat[prefix[:-1]] = np.asarray(out)
            elif isinstance(v, dict):
                walk(v, f"{prefix}{k}/")

    walk(state["intermediates"])
    return flat


def compare(flax_acts: dict, torch_acts: dict, atol: float = 1e-2):
    """Match flax module paths to torch module names and diff."""
    rows = []
    for fk, fa in flax_acts.items():
        base = fk.split("#")[0]
        tk = flax_to_torch_key(base)
        if tk is None or tk not in torch_acts:
            continue
        ta = torch_acts[tk]
        if ta.ndim == 4:  # NCHW -> NHWC
            ta = np.transpose(ta, (0, 2, 3, 1))
        if ta.shape != fa.shape:
            rows.append((fk, tk, None, None, f"shape {fa.shape} vs {ta.shape}"))
            continue
        d = np.abs(fa.astype(np.float32) - ta.astype(np.float32))
        rows.append((fk, tk, float(d.max()), float(d.mean()), ""))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="ocrnet.HRNet_Mscale")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--image", required=True)
    ap.add_argument("--torch-acts", required=True)
    ap.add_argument("--num-classes", type=int, default=19)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from tpuseg.config import make_config
    from tpuseg.data.transforms import to_normalized_array
    from tpuseg.models import get_model
    from tpuseg.train.checkpoint import load_snapshot

    cfg = make_config({"model.arch": args.arch,
                       "model.compute_dtype": "float32",
                       "dataset.num_classes": args.num_classes})
    model = get_model(cfg)
    img = to_normalized_array(Image.open(args.image).convert("RGB"),
                              cfg.dataset.mean, cfg.dataset.std)[None]
    x = jnp.asarray(img)
    variables = jax.jit(lambda k, xi: model.init(k, xi, train=False))(
        jax.random.PRNGKey(0), x)
    params, stats = load_snapshot(args.ckpt, variables["params"],
                                  variables.get("batch_stats", {}))
    variables = {"params": params, "batch_stats": stats}

    flax_acts = capture_flax_intermediates(model, variables, x)
    torch_acts = dict(np.load(args.torch_acts))
    rows = compare(flax_acts, torch_acts)
    # npz member order preserves the torch dict's insertion order, which
    # is forward-hook call order — sorting by it (not alphabetically)
    # keeps the promise that the FIRST divergent layer prints first
    order = {k: i for i, k in enumerate(torch_acts)}
    rows.sort(key=lambda r: order.get(r[1], len(order)))
    print(f"{'layer':<60} {'maxdiff':>10} {'meandiff':>10}")
    for fk, tk, mx, mn, note in rows:
        if note:
            print(f"{fk:<60} {note}")
        else:
            flag = " <-- DIVERGES" if mx and mx > 1e-2 else ""
            print(f"{fk:<60} {mx:>10.4e} {mn:>10.4e}{flag}")


if __name__ == "__main__":
    main()
