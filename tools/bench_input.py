"""Host-side input-pipeline benchmark: can the host feed the chips?

The train step consumes 2.28 img/s/chip at the SOTA shape (1024x2048,
BENCH_train_r02.json); with 4-8 chips per host the augmentation stack
must sustain ~9-18 samples/s/host or the TPUs starve — the reference
never measures this (its nullloader bypasses augmentation entirely,
datasets/nullloader.py:41-74). This tool times the full train transform
stack (RandomSizeAndCrop + flip + ColorJitter + normalize + label
remap) on synthetic 2048x1024 Cityscapes-sized images, single-thread
and at dataset.num_workers threads (PIL releases the GIL for most ops),
and prints one JSON line per configuration.

Pure host benchmark — safe to run anywhere, no TPU involved.

Measured in this (1-vCPU) dev container: ~3.9 samples/s/core. A v5e-8
TPU-VM host (112 vCPUs) therefore needs ~5 cores to feed all 8 chips at
the 2.28 img/s/chip train rate — augmentation is not the bottleneck at
production host shapes; use dataset.loader=grain (worker processes) if a
host measures below its chip demand.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpuseg.config import make_config  # noqa: E402
from tpuseg.data.setup import (  # noqa: E402
    build_train_img_transform,
    build_train_joint_transform,
)
from tpuseg.data.transforms import to_normalized_array  # noqa: E402

SRC_W, SRC_H = 2048, 1024  # Cityscapes source frame


def one_sample(args):
    jt, it, cfg, seed = args
    import random as _random
    rng = _random.Random(seed)  # the loader's per-sample rng type
    # fresh PIL objects per sample, as the loader produces them
    img = Image.fromarray(
        (np.arange(SRC_H * SRC_W * 3, dtype=np.uint32)
         .reshape(SRC_H, SRC_W, 3) % 255).astype(np.uint8))
    mask = Image.fromarray(
        (np.arange(SRC_H * SRC_W, dtype=np.uint32)
         .reshape(SRC_H, SRC_W) % 19).astype(np.uint8))
    img, mask, _scale = jt(img, mask, rng)
    if it is not None:
        img = it(img, rng)
    arr = to_normalized_array(img, cfg.dataset.mean, cfg.dataset.std)
    lbl = np.asarray(mask, np.int32)
    return arr.shape, lbl.shape


def bench(jt, it, cfg, n, workers):
    jobs = [(jt, it, cfg, i) for i in range(n)]
    t0 = time.perf_counter()
    if workers <= 1:
        for j in jobs:
            one_sample(j)
    else:
        with ThreadPoolExecutor(workers) as ex:
            list(ex.map(one_sample, jobs))
    return n / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--workers", type=int, default=None)
    args = ap.parse_args()

    cfg = make_config({"dataset.crop_size": (1024, 2048),
                       "dataset.name": "cityscapes"})
    jt = build_train_joint_transform(cfg, ignore_label=255)
    it = build_train_img_transform(cfg)
    workers = args.workers or cfg.dataset.num_workers

    cpus = len(os.sched_getaffinity(0))
    for w in sorted({1, workers}):
        if w > cpus and w != 1:
            # threads beyond physical cores only add GIL contention;
            # still measured when explicitly requested via --workers
            if args.workers is None:
                continue
        sps = bench(jt, it, cfg, args.n, w)
        print(json.dumps({
            "metric": "input_pipeline_samples_per_sec",
            "value": round(sps, 2), "unit": "samples/sec/host",
            "workers": w, "cpus": cpus, "crop": "1024x2048",
            "chips_fed_at_2.28_img_s": round(sps / 2.28, 1)}), flush=True)


if __name__ == "__main__":
    main()
