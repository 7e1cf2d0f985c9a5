"""Activation-diff harness roundtrip: flax intermediates -> synthesized
torch-named dump -> compare reports ~zero diffs."""
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from compare_activations import capture_flax_intermediates, compare  # noqa
from convert_torch_ckpt import flax_to_torch_key  # noqa


def test_roundtrip_zero_diff():
    from tpuseg.config import make_config
    from tpuseg.models import get_model

    cfg = make_config({"model.arch": "ocrnet.HRNet_Mscale_Tiny",
                       "model.compute_dtype": "float32",
                       "model.remat": False,
                       "model.n_scales": (1.0,),
                       "dataset.num_classes": 19})
    model = get_model(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    flax_acts = capture_flax_intermediates(model, variables, x)
    assert len(flax_acts) > 30  # deep capture

    # synthesize the torch dump: NHWC -> NCHW under the mapped names
    torch_acts = {}
    for fk, fa in flax_acts.items():
        tk = flax_to_torch_key(fk.split("#")[0])
        if tk is None:
            continue
        torch_acts[tk] = np.transpose(fa, (0, 3, 1, 2)) if fa.ndim == 4 \
            else fa
    assert len(torch_acts) > 10

    rows = compare(flax_acts, torch_acts)
    assert rows, "no layers matched"
    for fk, tk, mx, mn, note in rows:
        assert not note, (fk, note)
        assert mx == 0.0, (fk, mx)
