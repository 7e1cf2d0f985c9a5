"""Miniature of the Mapillary 61.05 eval configuration (VERDICT r1 item 6).

Reference recipe scripts/eval_mapillary.yml: 65 classes (ignore=65),
scales {0.25, 0.5, 1.0, 2.0} + horizontal flip, pre_size resize, palette
and class names from the dataset's own config.json
(reference: datasets/mapillary.py:43-106). Exercised here end-to-end
through evaluate_only on a tiny model with RAGGED val image sizes and
``pad_multiple`` bucketing — the confusion matrix must be exact (padded
label pixels are ignore).
"""
import json
import os

import numpy as np
import pytest
from PIL import Image

from tpuseg.config import make_config

SIZES = [(48, 67), (52, 80), (48, 67)]  # ragged; two share a pad bucket


@pytest.fixture(scope="module")
def fake_mapillary(tmp_path_factory):
    root = tmp_path_factory.mktemp("mapillary")
    rng = np.random.RandomState(0)
    labels = [{"color": [int(c) for c in rng.randint(0, 255, 3)],
               "readable": f"class {i}", "instances": False}
              for i in range(66)]
    (root / "config.json").write_text(json.dumps({"labels": labels}))
    img_dir = root / "validation" / "images"
    lbl_dir = root / "validation" / "labels"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    for i, (h, w) in enumerate(SIZES):
        Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(
            img_dir / f"img{i}.jpg")
        mask = rng.randint(0, 66, (h, w)).astype(np.uint8)  # incl. ignore
        Image.fromarray(mask).save(lbl_dir / f"img{i}.png")
    return str(root)


def test_mapillary_eval_miniature(fake_mapillary, tmp_path):
    from tpuseg.train.loop import evaluate_only

    cfg = make_config({
        "model.arch": "ocrnet.HRNet_Mscale_Tiny",
        "model.compute_dtype": "float32",
        "model.remat": False,
        "model.n_scales": (0.25, 0.5, 1.0, 2.0),
        "dataset.name": "mapillary",
        "dataset.mapillary_dir": fake_mapillary,
        "dataset.num_classes": 65,
        "dataset.ignore_label": 65,
        "dataset.pre_size": 64,           # reference: pre_size 2177
        "dataset.mapillary_crop_val": False,
        "dataset.num_workers": 2,
        "eval.scales": (0.25, 0.5, 1.0, 2.0),
        "eval.do_flip": True,
        "eval.pad_multiple": 32,
        "eval.dump_assets": True,
        "eval.dump_all_images": True,
    })
    logdir = str(tmp_path / "logs")
    metrics = evaluate_only(cfg, logdir=logdir)
    assert metrics is not None
    assert 0.0 <= metrics.mean_iou <= 1.0

    # palette/names came from config.json
    from tpuseg.data.setup import setup_data

    _, val_loader, _ = setup_data(cfg, eval_mode="val")
    ds = val_loader.dataset
    assert ds.palette is not None and len(ds.trainid_to_name) == 66
    assert ds.trainid_to_name[0] == "class_0"

    # asset dumps exist, named with the reference's dotted scale keys
    files = os.listdir(os.path.join(logdir, "eval_images"))
    assert "index.html" in files
    assert any("attn_0.5x" in f for f in files)
    assert any(f.endswith("_prediction.png") for f in files)


def test_mapillary_hist_accounting_under_padding(fake_mapillary, tmp_path):
    """pad_multiple bucketing: the confusion-matrix ACCOUNTING is exact
    (padded label pixels are ignore and never counted), and for an image
    whose size is already a multiple the pad is a no-op, so the hist is
    bitwise identical to the unpadded run. Ragged sizes may shift
    border predictions (the forward sees zero padding), which the
    accounting check bounds but equality cannot."""
    import jax

    from tpuseg.data.setup import setup_data
    from tpuseg.evaluation.inference import EvalRunner
    from tpuseg.models import get_model

    cfg = make_config({
        "model.arch": "ocrnet.HRNet_Mscale_Tiny",
        "model.compute_dtype": "float32",
        "model.remat": False,
        "model.n_scales": (0.5, 1.0),
        "dataset.name": "mapillary",
        "dataset.mapillary_dir": fake_mapillary,
        "dataset.num_classes": 65,
        "dataset.ignore_label": 65,
        "dataset.pre_size": 64,
        "dataset.mapillary_crop_val": False,
        "dataset.num_workers": 2,
    })
    model = get_model(cfg)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0),
        np.zeros((1, 32, 32, 3), np.float32))

    _, val_loader, _ = setup_data(cfg, eval_mode="val")
    for pad in (None, 32):
        runner = EvalRunner(model, 65, is_mscale=True, ignore_label=65,
                            pad_multiple=pad)
        for batch in val_loader:
            _, hist, _ = runner.run_batch(variables, batch)
            lbl = np.asarray(batch["label"])
            # exact accounting: only non-ignore ORIGINAL pixels counted
            assert int(hist.sum()) == int((lbl != 65).sum())

    # no-op pad (size already a multiple) -> bitwise-identical hist
    rng = np.random.RandomState(3)
    batch = {"image": rng.randn(1, 64, 96, 3).astype(np.float32),
             "label": rng.randint(0, 66, (1, 64, 96)).astype(np.int32),
             "name": ["aligned"]}
    h_nopad = EvalRunner(model, 65, is_mscale=True, ignore_label=65
                         ).run_batch(variables, batch)[1]
    h_pad = EvalRunner(model, 65, is_mscale=True, ignore_label=65,
                       pad_multiple=32).run_batch(variables, batch)[1]
    np.testing.assert_array_equal(h_nopad, h_pad)
