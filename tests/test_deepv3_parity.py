"""Full-model conversion + forward parity for the DeepV3Plus family
(reference: network/deepv3.py:40-123), covering both trunk key-map styles
inside seg checkpoints: the wrn38 wrapper naming and the resnet
get_resnet 'layer0' positional-Sequential stem (utils.py:58-63).

Together with tests/test_torch_parity.py (HRNet-OCR mscale) this proves
checkpoint transfer works for every shipped recipe arch family.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.oracle  # torch-reference tier (slow)

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from convert_torch_ckpt import convert_state_dict, deepv3_key_fn  # noqa: E402

H, W = 64, 128
RTOL = 1e-4


@pytest.mark.parametrize("arch,trunk", [
    ("deepv3.DeepV3PlusR50", "resnet-50"),
    ("deepv3.DeepV3PlusW38", "wrn38"),
])
def test_deepv3plus_full_model_parity(arch, trunk, tmp_path):
    out = str(tmp_path)
    script = os.path.join(os.path.dirname(__file__), "..", "tools",
                          "torch_reference.py")
    subprocess.run(
        [sys.executable, script, "--out", out, "--arch", arch,
         "--height", str(H), "--width", str(W), "--seed", "0"],
        check=True, timeout=900)
    state = dict(np.load(os.path.join(out, "state_dict.npz")))
    outs = dict(np.load(os.path.join(out, "outputs.npz")))

    from tpuseg.config import make_config
    from tpuseg.models import get_model

    cfg = make_config({"model.arch": arch,
                       "model.compute_dtype": "float32",
                       "model.remat": False,
                       "dataset.num_classes": 19})
    model = get_model(cfg)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3), jnp.float32))
    params, stats = convert_state_dict(
        state, variables["params"], variables.get("batch_stats", {}),
        key_fn=deepv3_key_fn(trunk), strict=True)

    x = jnp.asarray(np.transpose(outs["x"], (0, 2, 3, 1)))
    got = jax.jit(lambda v, xi: model.apply(v, xi, train=False))(
        {"params": params, "batch_stats": stats}, x)
    want = np.transpose(outs["eval/pred"], (0, 2, 3, 1))
    g = np.asarray(got["pred"], np.float32)
    assert g.shape == want.shape
    scale = max(float(np.abs(want).max()), 1e-6)
    d = float(np.abs(g - want).max()) / scale
    assert d < RTOL, f"{arch}: rel diff {d:.3e}"
