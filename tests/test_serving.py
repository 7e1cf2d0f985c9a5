"""StableHLO export/serving round trip (tpuseg/serving.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuseg.config import make_config
from tpuseg.models import get_model


@pytest.fixture(scope="module")
def tiny_model():
    cfg = make_config({"model.arch": "ocrnet.HRNet_Mscale_Tiny",
                       "model.compute_dtype": "float32",
                       "model.remat": False,
                       "model.n_scales": (0.5, 1.0),
                       "dataset.num_classes": 19})
    model = get_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    return model, variables


def test_export_load_roundtrip(tiny_model, tmp_path):
    from tpuseg.serving import export_model, load_exported

    model, variables = tiny_model
    path = str(tmp_path / "artifact")
    manifest = export_model(model, variables, (32, 64), path,
                            input_dtype="float32")
    assert manifest["input"]["shape"] == [1, 32, 64, 3]

    serve = load_exported(path)
    x = np.random.RandomState(0).randn(1, 32, 64, 3).astype(np.float32)
    got = np.asarray(serve(x))
    want = np.asarray(model.apply(variables, jnp.asarray(x),
                                  train=False)["pred"])
    assert got.shape == (1, 32, 64, 19)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # artifact enforces its recorded input spec
    with pytest.raises(ValueError):
        serve(np.zeros((1, 64, 64, 3), np.float32))


def test_export_multi_entry_bundle(tiny_model, tmp_path):
    """Several sizes accumulate into one bundle; re-export replaces an
    entry instead of clobbering the artifact; serve() dispatches on the
    input shape."""
    from tpuseg.serving import export_model, load_exported

    model, variables = tiny_model
    path = str(tmp_path / "bundle")
    manifest = export_model(model, variables, [(32, 32), (32, 64)], path,
                            input_dtype="float32")
    assert len(manifest["entries"]) == 2

    # second export call on the same path appends a third entry
    export_model(model, variables, (64, 64), path, input_dtype="float32")
    # ... and re-exporting an existing size replaces, not duplicates
    export_model(model, variables, (32, 32), path, input_dtype="float32")

    serve = load_exported(path)
    assert len(serve.manifest["entries"]) == 3
    for hw in [(32, 32), (32, 64), (64, 64)]:
        pred = serve(np.zeros((1, *hw, 3), np.float32))
        assert pred.shape == (1, *hw, 19)
    with pytest.raises(ValueError, match="no entry"):
        serve(np.zeros((1, 16, 16, 3), np.float32))

    # a foreign artifact is refused, never clobbered — including an
    # old-schema v1 manifest (same project, incompatible layout)
    import json
    import os
    for fmt in ("something-else", "tpuseg-export-v1"):
        foreign = str(tmp_path / f"foreign-{fmt}")
        os.makedirs(foreign)
        with open(os.path.join(foreign, "manifest.json"), "w") as f:
            json.dump({"format": fmt, "input": {"shape": [1, 8, 8, 3]}}, f)
        with pytest.raises(ValueError, match="refusing"):
            export_model(model, variables, (32, 32), foreign,
                         input_dtype="float32")
        with pytest.raises(ValueError, match="refusing"):
            load_exported(foreign)


def test_http_server_roundtrip(tiny_model, tmp_path):
    """`tpuseg serve` protocol: /healthz returns the manifest, /predict
    round-trips an .npy batch, shape mismatches get a 400."""
    import io
    import json
    import threading
    import urllib.error
    import urllib.request

    from tpuseg.serving import export_model, make_http_server

    model, variables = tiny_model
    path = str(tmp_path / "srv")
    export_model(model, variables, (32, 32), path, input_dtype="float32")
    srv = make_http_server(path, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        health = json.loads(urllib.request.urlopen(
            f"{base}/healthz", timeout=30).read())
        assert len(health["entries"]) == 1

        buf = io.BytesIO()
        np.save(buf, np.zeros((1, 32, 32, 3), np.float32))
        req = urllib.request.Request(f"{base}/predict", data=buf.getvalue(),
                                     method="POST")
        out = np.load(io.BytesIO(
            urllib.request.urlopen(req, timeout=60).read()))
        assert out.shape == (1, 32, 32, 19)
        assert out.dtype == np.float32

        bad = io.BytesIO()
        np.save(bad, np.zeros((1, 8, 8, 3), np.float32))
        req = urllib.request.Request(f"{base}/predict", data=bad.getvalue(),
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
    finally:
        srv.shutdown()
        srv.server_close()


def test_export_two_dtypes_same_size(tiny_model, tmp_path):
    """Entries are keyed by (shape, dtype): two dtypes at one size
    coexist and serve() dispatches on the input dtype."""
    from tpuseg.serving import export_model, load_exported

    model, variables = tiny_model
    path = str(tmp_path / "dt")
    export_model(model, variables, (32, 32), path, input_dtype="float32")
    export_model(model, variables, (32, 32), path, input_dtype="bfloat16")
    serve = load_exported(path)
    assert len(serve.manifest["entries"]) == 2
    out32 = serve(np.zeros((1, 32, 32, 3), np.float32))
    assert out32.shape == (1, 32, 32, 19)
    import jax.numpy as jnp
    outbf = serve(jnp.zeros((1, 32, 32, 3), jnp.bfloat16))
    assert outbf.shape == (1, 32, 32, 19)
    with pytest.raises(ValueError, match="dtype"):
        serve(np.zeros((1, 32, 32, 3), np.int32))


def test_export_cli(tmp_path):
    from tpuseg.cli.main import main

    out = str(tmp_path / "exp")
    rc = main(["export", "--export-out", out, "--export-size", "32x32",
               "--set", "model.arch=ocrnet.HRNet_Mscale_Tiny",
               "--set", "model.compute_dtype=float32",
               "--set", "model.remat=False",
               "--set", "model.n_scales=0.5,1.0"])
    assert rc == 0
    from tpuseg.serving import load_exported

    serve = load_exported(out)
    pred = serve(np.zeros((1, 32, 32, 3), np.float32))
    assert pred.shape == (1, 32, 32, 19)
