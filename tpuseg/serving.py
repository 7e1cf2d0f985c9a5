"""Model export for production serving: StableHLO artifacts via jax.export.

The reference has no serving story (inference = rerunning train.py with
--eval); a TPU-native framework should ship one. ``export_model``
serializes the jitted multi-scale eval forward — weights baked in as
constants — into a single portable artifact that any JAX process (or, via
StableHLO, non-JAX runtimes) can load WITHOUT the tpuseg package, the
model code, or a checkpoint directory:

    from tpuseg.serving import export_model, load_exported
    export_model(model, variables, (1024, 2048), "model.tpuseg")
    serve = load_exported("model.tpuseg")
    logits = serve(images)           # (B, H, W, num_classes) f32

Artifacts record the input spec and are validated on load. Exported
functions are shape-specialized (XLA static shapes): export one artifact
per serving resolution/batch, or pass several sizes to get a multi-entry
bundle.
"""
from __future__ import annotations

import json
import os
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

_MAGIC = "tpuseg-export-v1"


def _eval_fn(model):
    def fn(variables, x):
        out = model.apply(variables, x, train=False)
        return out["pred"].astype(jnp.float32)

    return fn


def export_model(model, variables, input_hw: Sequence[int], path: str,
                 batch_size: int = 1, input_dtype: str = "bfloat16",
                 platforms: Sequence[str] | None = None) -> dict:
    """Serialize ``model.apply(variables, x, train=False)['pred']`` with the
    weights baked in. Returns the artifact's manifest dict.

    ``platforms``: lowering targets (default: the current backend). Pass
    ("tpu", "cpu") for an artifact that runs on both.
    """
    from jax import export as jexport

    h, w = (int(s) for s in input_hw)
    fn = _eval_fn(model)
    closed = jax.jit(lambda x: fn(variables, x))
    spec = jax.ShapeDtypeStruct((batch_size, h, w, 3),
                                jnp.dtype(input_dtype))
    kw = {}
    if platforms is not None:
        kw["platforms"] = tuple(platforms)
    exp = jexport.export(closed, **kw)(spec)

    os.makedirs(path, exist_ok=True)
    blob = exp.serialize()
    with open(os.path.join(path, "fn.stablehlo"), "wb") as f:
        f.write(blob)
    manifest = {
        "format": _MAGIC,
        "input": {"shape": [batch_size, h, w, 3], "dtype": input_dtype},
        "platforms": list(exp.platforms),
        "jax_version": jax.__version__,
        "bytes": len(blob),
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def load_exported(path: str) -> Callable:
    """-> callable(images) running the exported forward. Validates the
    manifest and enforces the recorded input spec."""
    from jax import export as jexport

    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    if manifest.get("format") != _MAGIC:
        raise ValueError(f"not a tpuseg export: {path}")
    with open(os.path.join(path, "fn.stablehlo"), "rb") as f:
        exp = jexport.deserialize(f.read())
    want_shape = tuple(manifest["input"]["shape"])
    want_dtype = jnp.dtype(manifest["input"]["dtype"])

    def serve(images):
        images = jnp.asarray(images, want_dtype)
        if images.shape != want_shape:
            raise ValueError(
                f"exported for input {want_shape}, got {images.shape}")
        return exp.call(images)

    serve.manifest = manifest
    return serve
