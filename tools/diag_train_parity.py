"""Diagnose train-path parity vs a torch_reference.py --train-dump dir.

Prints the scalar-loss relative error, the tree-wide gradient L1-relative
metric, the top worst gradient leaves (by contribution to the L1 numerator
and by per-leaf relative error), and the same for post-forward BN running
stats — so a failure can be bisected to a subtree instead of a bare
assert. Companion to tests/test_train_parity.py.

  python tools/diag_train_parity.py --dump /tmp/dump_ce --criterion ce
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the W48 value_and_grad graph takes ~13 min to
# compile on one CPU core; cache hits make re-diagnosis instant
jax.config.update("jax_compilation_cache_dir", "/tmp/tpuseg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 30.0)
jax.config.update("jax_persistent_cache_enable_xla_caches",
                  "xla_gpu_per_fusion_autotune_cache_dir")
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from convert_torch_ckpt import convert_state_dict  # noqa: E402


def flat(tree):
    from flax.traverse_util import flatten_dict

    return {"/".join(k): np.asarray(v, np.float64)
            for k, v in flatten_dict(tree).items()}


def report(name, got_tree, want_tree, top=12):
    got, want = flat(got_tree), flat(want_tree)
    assert got.keys() == want.keys(), (
        set(got) ^ set(want) or "key sets equal")
    num = sum(np.abs(got[k] - want[k]).sum() for k in got)
    den = sum(np.abs(want[k]).sum() for k in want)
    # global least-squares scale + cosine: a pure got = c*want bug shows
    # c != 1 with cosine ~ 1; uncorrelated noise shows cosine ~ 0
    dot = sum((got[k] * want[k]).sum() for k in got)
    nw = sum((want[k] ** 2).sum() for k in want)
    ng = sum((got[k] ** 2).sum() for k in got)
    print(f"\n== {name}: tree L1-rel = {num / max(den, 1e-30):.4e} "
          f"({len(got)} leaves)  scale c = {dot / max(nw, 1e-30):.6f}  "
          f"cosine = {dot / max(np.sqrt(nw * ng), 1e-30):.6f}")
    rows = []
    for k in got:
        n = np.abs(got[k] - want[k]).sum()
        d = np.abs(want[k]).sum()
        rows.append((n, n / max(d, 1e-30), k))
    rows.sort(reverse=True)
    print("  top leaves by |diff| contribution:")
    for n, r, k in rows[:top]:
        print(f"    {n:12.4e}  leaf-rel {r:10.3e}  {k}")
    rows.sort(key=lambda t: -t[1])
    print("  top leaves by per-leaf relative:")
    for n, r, k in rows[:top]:
        print(f"    leaf-rel {r:10.3e}  |diff| {n:12.4e}  {k}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump", required=True)
    ap.add_argument("--criterion", default="ce", choices=["ce", "rmi"])
    ap.add_argument("--save", default=None,
                    help="save got/want grad+stat trees to this .npz for "
                         "offline analysis")
    ap.add_argument("--tiny", action="store_true",
                    help="compare HRNet_Mscale_Tiny against a --tiny "
                         "reference dump (fast iteration)")
    args = ap.parse_args()

    d = {name: dict(np.load(os.path.join(args.dump, f"{name}.npz")))
         for name in ("state_dict", "train", "grads", "post_stats")}

    from tpuseg.config import make_config
    from tpuseg.losses.factory import get_loss
    from tpuseg.models import get_model
    from tpuseg.train.step import make_loss_fn

    cfg = make_config({
        "model.arch": ("ocrnet.HRNet_Mscale_Tiny" if args.tiny
                       else "ocrnet.HRNet_Mscale"),
        "model.compute_dtype": "float32",
        "model.remat": False,
        "model.n_scales": (),
        "model.ocr.dropout": 0.0,
        "dataset.num_classes": 19,
        "loss.loss_type": args.criterion,
    })
    model = get_model(cfg)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3), jnp.float32))
    params, stats = convert_state_dict(
        d["state_dict"], variables["params"],
        variables.get("batch_stats", {}), strict=True)

    criterion, _ = get_loss(cfg)
    loss_fn = make_loss_fn(
        model, criterion, ocr_alpha=cfg.loss.ocr_alpha,
        aux_rmi=cfg.loss.ocr_aux_rmi,
        supervised_mscale_wt=cfg.loss.supervised_mscale_wt,
        align_corners=cfg.model.align_corners)

    batch = {
        "image": jnp.asarray(np.transpose(d["train"]["x"], (0, 2, 3, 1))),
        "label": jnp.asarray(d["train"]["gts"].astype(np.int32)),
    }

    @jax.jit
    def run(params, stats):
        (loss, mutated), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, stats, batch,
                                   jax.random.PRNGKey(0))
        return loss, mutated["batch_stats"], grads

    loss, new_stats, grads = run(params, stats)
    want_loss = float(d["train"]["loss"])
    print(f"loss: got {float(loss):.8f} want {want_loss:.8f} "
          f"rel {abs(float(loss) - want_loss) / max(1.0, abs(want_loss)):.3e}")

    want_grads, _ = convert_state_dict(
        d["grads"], variables["params"], {}, strict=True,
        log=lambda *a: None)
    report("gradients", grads, want_grads)

    _, want_stats = convert_state_dict(
        d["post_stats"], {}, variables["batch_stats"], strict=True,
        log=lambda *a: None)
    report("BN running stats", new_stats, want_stats)

    if args.save:
        out = {}
        for prefix, tree in (("gg", grads), ("gw", want_grads),
                             ("sg", new_stats), ("sw", want_stats)):
            for k, v in flat(tree).items():
                out[f"{prefix}:{k}"] = np.asarray(v, np.float32)
        np.savez_compressed(args.save, **out)
        print(f"saved trees to {args.save}")


if __name__ == "__main__":
    main()
