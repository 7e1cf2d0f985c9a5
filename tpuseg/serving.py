"""Model export for production serving: StableHLO artifacts via jax.export.

The reference has no serving story (inference = rerunning train.py with
--eval); a TPU-native framework should ship one. ``export_model``
serializes the jitted multi-scale eval forward — weights baked in as
constants — into a portable artifact that any JAX process (or, via
StableHLO, non-JAX runtimes) can load WITHOUT the tpuseg package, the
model code, or a checkpoint directory:

    from tpuseg.serving import export_model, load_exported
    export_model(model, variables, (1024, 2048), "model.tpuseg")
    serve = load_exported("model.tpuseg")
    logits = serve(images)           # (B, H, W, num_classes) f32

Exported functions are shape-specialized (XLA static shapes), so an
artifact is a BUNDLE of entries, one per (batch, H, W, dtype). Pass a
list of sizes — or call ``export_model`` repeatedly on the same path —
to accumulate entries; ``load_exported`` returns one callable that
dispatches on the input shape. Re-exporting an existing entry replaces
it; a path holding a foreign format is refused, never clobbered.
"""
from __future__ import annotations

import json
import os
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

# v2 = multi-entry bundle schema; v1 (single-entry) artifacts are
# rejected with a clear error rather than mis-read
_MAGIC = "tpuseg-export-v2"


def _eval_fn(model):
    def fn(variables, x):
        out = model.apply(variables, x, train=False)
        return out["pred"].astype(jnp.float32)

    return fn


def _read_manifest(path: str) -> dict | None:
    fn = os.path.join(path, "manifest.json")
    if not os.path.isfile(fn):
        return None
    with open(fn) as f:
        manifest = json.load(f)
    if manifest.get("format") != _MAGIC:
        raise ValueError(
            f"{path} holds a {manifest.get('format')!r} artifact, not "
            f"{_MAGIC}; refusing to touch it (re-export v1 bundles from "
            f"the checkpoint)")
    return manifest


def _export_one(closed, shape, dtype: str, path: str,
                platforms: Sequence[str] | None) -> dict:
    from jax import export as jexport

    spec = jax.ShapeDtypeStruct(shape, jnp.dtype(dtype))
    kw = {"platforms": tuple(platforms)} if platforms is not None else {}
    exp = jexport.export(closed, **kw)(spec)
    blob = exp.serialize()
    fname = ("fn_" + "x".join(str(s) for s in shape[:3])
             + f"_{dtype}.stablehlo")
    with open(os.path.join(path, fname), "wb") as f:
        f.write(blob)
    return {
        "file": fname,
        "input": {"shape": list(shape), "dtype": dtype},
        "platforms": list(exp.platforms),
        "bytes": len(blob),
    }


def export_model(model, variables, input_hw, path: str,
                 batch_size: int = 1, input_dtype: str = "bfloat16",
                 platforms: Sequence[str] | None = None) -> dict:
    """Serialize ``model.apply(variables, x, train=False)['pred']`` with the
    weights baked in.

    ``input_hw``: one ``(h, w)`` pair or a sequence of pairs (multi-entry
    bundle). Returns the new entry dict for a single size, or the full
    manifest for several.

    ``platforms``: lowering targets (default: the current backend). Pass
    ("tpu", "cpu") for an artifact that runs on both.
    """
    sizes = list(input_hw)
    if not hasattr(sizes[0], "__len__"):
        sizes = [sizes]

    fn = _eval_fn(model)
    closed = jax.jit(lambda x: fn(variables, x))
    os.makedirs(path, exist_ok=True)
    manifest = _read_manifest(path) or {
        "format": _MAGIC, "jax_version": jax.__version__, "entries": []}

    new_entries = []
    for hw in sizes:
        h, w = (int(s) for s in hw)
        shape = (batch_size, h, w, 3)
        entry = _export_one(closed, shape, input_dtype, path, platforms)
        # entries are keyed by (shape, dtype): re-exporting the same key
        # replaces it, a different dtype at the same size coexists
        key = (shape, input_dtype)
        manifest["entries"] = [
            e for e in manifest["entries"]
            if (tuple(e["input"]["shape"]), e["input"]["dtype"]) != key
        ] + [entry]
        new_entries.append(entry)

    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return new_entries[0] if len(new_entries) == 1 else manifest


def load_exported(path: str) -> Callable:
    """-> callable(images) running the exported forward. Validates the
    manifest and dispatches on the input shape across the bundle's
    entries."""
    from jax import export as jexport

    manifest = _read_manifest(path)
    if manifest is None:
        raise FileNotFoundError(f"no manifest.json under {path}")
    by_shape: dict = {}
    for entry in manifest["entries"]:
        with open(os.path.join(path, entry["file"]), "rb") as f:
            exp = jexport.deserialize(f.read())
        by_shape.setdefault(tuple(entry["input"]["shape"]), []).append(
            (jnp.dtype(entry["input"]["dtype"]), exp))

    def serve(images):
        images = jnp.asarray(images)
        shape = tuple(images.shape)
        if shape not in by_shape:
            raise ValueError(
                f"no entry exported for input {shape}; bundle has "
                f"{sorted(by_shape)}")
        candidates = by_shape[shape]
        # exact dtype match wins; a single-entry shape casts the input
        for dtype, exp in candidates:
            if dtype == images.dtype:
                return exp.call(images)
        if len(candidates) == 1:
            dtype, exp = candidates[0]
            return exp.call(images.astype(dtype))
        raise ValueError(
            f"input dtype {images.dtype} matches none of the "
            f"{[str(d) for d, _ in candidates]} entries at {shape}")

    serve.manifest = manifest
    return serve


def make_http_server(path: str, host: str = "0.0.0.0", port: int = 8000):
    """Minimal production-style inference server over an exported bundle
    (stdlib only — no framework deps on the serving host beyond jax).
    Returns an unstarted ThreadingHTTPServer; call ``serve_forever()``
    (or use ``serve_http`` / ``tpuseg serve`` which do).

    Protocol:
      GET  /healthz  -> 200, manifest JSON
      POST /predict  -> body: ``.npy``-serialized input batch (any entry's
                        shape/dtype); response: ``.npy`` f32 logits
                        (B, H, W, num_classes). 400 on shape mismatch.
    """
    import io
    import json as _json
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import numpy as np

    fn = load_exported(path)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet default stderr spam
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, _json.dumps(fn.manifest).encode(),
                           "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, b"not found", "text/plain")
                return
            n = int(self.headers.get("Content-Length", 0))
            try:
                arr = np.load(io.BytesIO(self.rfile.read(n)),
                              allow_pickle=False)
                out = np.asarray(fn(arr))
            except ValueError as e:
                self._send(400, str(e).encode(), "text/plain")
                return
            buf = io.BytesIO()
            np.save(buf, out, allow_pickle=False)
            self._send(200, buf.getvalue(), "application/octet-stream")

    httpd = ThreadingHTTPServer((host, port), Handler)
    httpd.artifact_manifest = fn.manifest
    return httpd


def serve_http(path: str, host: str = "0.0.0.0", port: int = 8000):
    """Blocking entry: build the server and run it until interrupted
    (``tpuseg serve --artifact model.tpuseg --port 8000``)."""
    httpd = make_http_server(path, host, port)
    print(f"tpuseg serving {path} on {host}:{httpd.server_address[1]} "
          f"({len(httpd.artifact_manifest['entries'])} entries)", flush=True)
    try:
        httpd.serve_forever()
    finally:
        httpd.server_close()
