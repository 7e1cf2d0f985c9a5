"""Per-trunk ImageNet-checkpoint conversion oracles.

For each pretrained trunk the reference loads (wrn38
wider_resnet.py:399-435, resnet Resnet.py:44-50 + utils.py:48-99,
seresnext SEresnext.py:365-406, xception71 xception.py:270-279), build the
REAL reference trunk at random init in a subprocess, export its state dict
in the pretrained-file naming, convert with the trunk key map, and require
the flax trunk to reproduce the (s2, s4, high) forward outputs.

HRNet's trunk map is exercised end-to-end by tests/test_torch_parity.py.
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

from convert_torch_ckpt import convert_state_dict, trunk_key_fn  # noqa: E402

H = W = 64
# tight on purpose: the xception is_last-conv dilation bug produced a
# 6.4e-5 rel diff that slipped under the old 1e-4 bound; true conversion
# error for f32 trunks is ~1e-6
RTOL = 1e-5


def _flax_trunk(name):
    from tpuseg.models.resnet import ResNet
    from tpuseg.models.seresnext import SEResNeXt
    from tpuseg.models.wider_resnet import WRN38
    from tpuseg.models.xception import Xception71

    return {
        "wrn38": lambda: WRN38(dtype=jnp.float32),
        "resnet-50": lambda: ResNet((3, 4, 6, 3), dtype=jnp.float32),
        "seresnext-50": lambda: SEResNeXt((3, 4, 6, 3), dtype=jnp.float32),
        "xception71": lambda: Xception71(8, dtype=jnp.float32),
    }[name]()


@pytest.mark.parametrize("trunk", ["wrn38", "resnet-50", "seresnext-50",
                                   "xception71"])
def test_trunk_checkpoint_conversion(trunk, tmp_path):
    out = str(tmp_path)
    script = os.path.join(os.path.dirname(__file__), "..", "tools",
                          "torch_reference.py")
    subprocess.run(
        [sys.executable, script, "--out", out, "--trunk", trunk,
         "--height", str(H), "--width", str(W), "--seed", "0"],
        check=True, timeout=900)
    state = dict(np.load(os.path.join(out, "state_dict.npz")))
    outs = dict(np.load(os.path.join(out, "outputs.npz")))

    model = _flax_trunk(trunk)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32))
    # strict: EVERY flax trunk leaf must map onto the checkpoint
    params, stats = convert_state_dict(
        state, variables["params"], variables.get("batch_stats", {}),
        key_fn=trunk_key_fn(trunk, flax_prefix=""), strict=True)

    x = jnp.asarray(np.transpose(outs["x"], (0, 2, 3, 1)))
    got = jax.jit(lambda v, xi: model.apply(v, xi, train=False))(
        {"params": params, "batch_stats": stats}, x)

    torch_outs = [outs[k] for k in ("out0", "out1", "out2") if k in outs]
    flax_outs = [g for g in got if g is not None]
    if len(flax_outs) == 2 and len(torch_outs) == 3:
        # resnet/seresnext expose only (s2, high) per the get_trunk
        # contract (s4_ch=-1, utils.py:122-131); torch returns all three
        torch_outs = [torch_outs[0], torch_outs[2]]
    assert len(flax_outs) == len(torch_outs), (len(flax_outs),
                                               len(torch_outs))
    for i, (g, t) in enumerate(zip(flax_outs, torch_outs)):
        t = np.transpose(t, (0, 2, 3, 1))
        g = np.asarray(g, np.float32)
        assert g.shape == t.shape, (trunk, i, g.shape, t.shape)
        scale = max(float(np.abs(t).max()), 1e-6)
        d = float(np.abs(g - t).max()) / scale
        assert d < RTOL, f"{trunk} out{i}: rel diff {d:.3e}"
