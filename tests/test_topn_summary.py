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


def test_pipelined_eval_matches_legacy(rng):
    """The device-resident accumulator path (run_batch(acc=...) + drain,
    used by Trainer.validate / evaluate_only) produces bit-identical
    confusion matrices and the same weighted val loss as the one-sync-per-
    image legacy path, including per-outer-scale hists and flips."""
    from tpuseg.config import make_config
    from tpuseg.evaluation.inference import EvalRunner
    from tpuseg.losses import get_loss
    from tpuseg.models import get_model

    cfg = make_config({"model.arch": "ocrnet.HRNet_Mscale_Tiny",
                       "model.compute_dtype": "float32",
                       "model.remat": False,
                       "dataset.num_classes": 19})
    model = get_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    _, val_criterion = get_loss(cfg)
    runner = EvalRunner(model, 19, scales=(0.5, 1.0), do_flip=True,
                        is_mscale=True, criterion=val_criterion)

    batches = [{"image": rng.randn(1, 32, 32, 3).astype(np.float32),
                "label": rng.randint(0, 25, (1, 32, 32)).astype(np.int32)}
               for _ in range(3)]

    hist_legacy = 0.0
    scale_legacy: dict = {}
    losses = []
    for b in batches:
        out, hist, loss = runner.run_batch(variables, b, need_assets=False)
        hist_legacy = hist_legacy + hist
        for s, sh in out["scale_hists"].items():
            scale_legacy[s] = scale_legacy.get(s, 0) + sh
        losses.append(loss)

    acc = runner.init_acc()
    for b in batches[:2]:
        _, acc = runner.run_batch(variables, b, need_assets=False, acc=acc)
    h1, sh1, ls1, ln1 = runner.drain(acc)     # mid-run drain
    acc = runner.init_acc()
    _, acc = runner.run_batch(variables, batches[2], need_assets=False,
                              acc=acc)
    h2, sh2, ls2, ln2 = runner.drain(acc)

    np.testing.assert_array_equal(h1 + h2, hist_legacy)
    for s in scale_legacy:
        np.testing.assert_array_equal(sh1[s] + sh2[s], scale_legacy[s])
    want_loss = float(np.mean(losses))        # all batches have bs=1
    got_loss = (ls1 + ls2) / (ln1 + ln2)
    np.testing.assert_allclose(got_loss, want_loss, rtol=1e-6)
