"""Single CLI entry point: ``python -m tpuseg.cli <train|eval|dump> ...``.

Replaces the reference's runx-YAML + torch.distributed.launch + 90-flag
argparse stack (reference: scripts/*.yml, train.py:62-300) with one
process per host and dotted-path config overrides:

  python -m tpuseg.cli train --config tpuseg/cli/recipes/train_cityscapes.yaml
  python -m tpuseg.cli eval  --config ... --set eval.scales=0.5,1.0,2.0
  python -m tpuseg.cli dump  --config ... --set dataset.eval_folder=/imgs
"""
from __future__ import annotations

import argparse
import ast
import sys

import yaml

from tpuseg.config import make_config


def _parse_value(v: str):
    # whole Python literal first so bracketed lists ("[64,64]") and
    # e-notation ("1e-3", a string to YAML 1.1) work
    try:
        return ast.literal_eval(v)
    except (ValueError, SyntaxError):
        pass
    # then YAML scalar resolution — same rules as the recipe files, so
    # 'false' becomes False (a leaked 'false' STRING is truthy and would
    # silently invert every boolean override) and 'null'/'~' become None
    try:
        y = yaml.safe_load(v)
    except yaml.YAMLError:
        y = v
    if not isinstance(y, str):
        return y
    # the bare comma form ("64,64") mirrors the reference's flag syntax
    if "," in v:
        return tuple(_parse_value(x) for x in v.split(",") if x != "")
    return v


def load_config(config_path: str | None, sets: list[str]):
    overrides = {}
    if config_path:
        with open(config_path) as f:
            overrides.update(yaml.safe_load(f) or {})
    for item in sets:
        key, _, val = item.partition("=")
        overrides[key] = _parse_value(val)
    return make_config(overrides)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="tpuseg")
    parser.add_argument("command",
                        choices=["train", "eval", "dump", "summary",
                                 "export", "serve"])
    parser.add_argument("--export-out", default="exported",
                        help="output dir for `export` (StableHLO artifact)")
    parser.add_argument("--artifact", default=None,
                        help="exported bundle dir for `serve`")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--export-size", default=None,
                        help="HxW serving resolution for `export` "
                             "(default: dataset.crop_size)")
    parser.add_argument("--config", default=None, help="YAML recipe")
    parser.add_argument("--set", dest="sets", action="append", default=[],
                        metavar="KEY=VALUE", help="dotted config override")
    parser.add_argument("--logdir", default="logs")
    parser.add_argument("--checkpoint", default=None,
                        help="weights for eval/dump/export; warm-start "
                             "snapshot for train (maps to train.snapshot)")
    parser.add_argument("--eval-mode", default="val",
                        choices=["val", "trn", "folder"])
    parser.add_argument("--multi-host", action="store_true",
                        help="call jax.distributed.initialize() first")
    args = parser.parse_args(argv)

    if args.multi_host:
        import jax

        jax.distributed.initialize()

    cfg = load_config(args.config, args.sets)

    import jax

    is_primary = jax.process_index() == 0

    if args.command == "train":
        from tpuseg.train.loop import Trainer

        if args.checkpoint:
            # warm-start weights (reference --snapshot, train.py:343-376);
            # silently ignoring the flag would burn a full training run
            # from fresh init
            import dataclasses

            cfg = cfg.replace(train=dataclasses.replace(
                cfg.train, snapshot=args.checkpoint))
        Trainer(cfg, logdir=args.logdir, is_primary=is_primary).fit()
    elif args.command == "eval":
        from tpuseg.train.loop import evaluate_only

        evaluate_only(cfg, logdir=args.logdir, eval_mode=args.eval_mode,
                      checkpoint=args.checkpoint, is_primary=is_primary)
    elif args.command == "summary":
        # params + compiled FLOPs, replaces the reference's thop --summary
        # (train.py:385-392)
        from tpuseg.models import get_model
        from tpuseg.utils.profiling import model_summary

        h, w = cfg.dataset.crop_size
        info = model_summary(get_model(cfg), (1, int(h), int(w), 3))
        print(f"params: {info['params'] / 1e6:.2f}M  "
              f"fwd GFLOPs: {info['flops'] / 1e9:.1f}  "
              f"bytes accessed: {info['bytes_accessed'] / 1e9:.2f}GB")
    elif args.command == "export":
        # serialize the eval forward (weights baked in) for serving
        import jax.numpy as jnp

        from tpuseg.config import eval_model_config
        from tpuseg.models import get_model
        from tpuseg.serving import export_model

        cfg = eval_model_config(cfg)
        model = get_model(cfg)
        example = jnp.zeros((1, 64, 64, 3),
                            jnp.dtype(cfg.model.compute_dtype))
        variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
            jax.random.PRNGKey(0), example)
        if args.checkpoint:
            from tpuseg.train.checkpoint import load_snapshot

            params, stats = load_snapshot(
                args.checkpoint, variables["params"],
                variables.get("batch_stats", {}), print)
            variables = {"params": params, "batch_stats": stats}
        if args.export_size:
            h, w = (int(s) for s in args.export_size.split("x"))
        else:
            h, w = cfg.dataset.crop_size
        manifest = export_model(model, variables, (h, w), args.export_out,
                                input_dtype=cfg.model.compute_dtype)
        print(f"exported {manifest['bytes'] / 1e6:.1f}MB artifact "
              f"for input {manifest['input']['shape']} "
              f"to {args.export_out}")
    elif args.command == "serve":
        # HTTP inference over an exported bundle (tpuseg/serving.py)
        from tpuseg.serving import serve_http

        if not args.artifact:
            parser.error("serve requires --artifact <exported bundle dir>")
        serve_http(args.artifact, host=args.host, port=args.port)
    elif args.command == "dump":
        from tpuseg.train.loop import evaluate_only

        import dataclasses

        cfg = cfg.replace(eval=dataclasses.replace(
            cfg.eval, dump_assets=True, dump_all_images=True))
        evaluate_only(cfg, logdir=args.logdir, eval_mode=args.eval_mode,
                      checkpoint=args.checkpoint, is_primary=is_primary)
    return 0


if __name__ == "__main__":
    sys.exit(main())
