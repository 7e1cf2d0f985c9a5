"""Top-N failure analysis + model summary."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_validate_topn(tmp_path, rng):
    from tpuseg.config import make_config
    from tpuseg.data.loader import BatchLoader
    from tpuseg.data.synthetic import SyntheticDataset
    from tpuseg.evaluation.inference import EvalRunner
    from tpuseg.evaluation.topn import validate_topn
    from tpuseg.models import get_model

    cfg = make_config({"model.arch": "ocrnet.HRNet_Mscale_Tiny",
                       "model.compute_dtype": "float32",
                       "model.remat": False,
                       "dataset.num_classes": 19})
    model = get_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)

    ds = SyntheticDataset((32, 32), 19, length=4)
    loader = BatchLoader(ds, 1, num_workers=1)
    runner = EvalRunner(model, 19, is_mscale=True)

    metrics = validate_topn(loader, runner, variables, 19,
                            result_dir=str(tmp_path),
                            dump_topn=2, log=lambda *_: None)
    assert 0.0 <= metrics.mean_iou <= 1.0
    out = os.path.join(str(tmp_path), "best_images")
    assert os.path.exists(os.path.join(out, "topn_failures.html"))
    files = os.listdir(out)
    assert any(f.endswith("_err_mask.png") for f in files)
    assert any(f.endswith("_prediction.png") for f in files)


def test_model_summary():
    from tpuseg.config import make_config
    from tpuseg.models import get_model
    from tpuseg.utils.profiling import model_summary

    cfg = make_config({"model.arch": "ocrnet.HRNet_Mscale_Tiny",
                       "model.compute_dtype": "float32",
                       "model.remat": False,
                       "model.n_scales": (1.0,),
                       "dataset.num_classes": 19})
    info = model_summary(get_model(cfg), (1, 64, 64, 3), jnp.float32)
    assert info["params"] > 1e5
    assert info["flops"] > 1e6
