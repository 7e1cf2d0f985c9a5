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


class _SyntheticAugDataset:
    """In-memory dataset running the FULL train transform stack per item
    (incl. a centroid-constrained crop half the time, as the class-uniform
    epoch mix does — datasets/uniform.py build_epoch 50/50 semantics).
    Used by --mode loader to bench the actual loader machinery."""

    def __init__(self, jt, it, cfg, length=512):
        self.jt, self.it, self.cfg = jt, it, cfg
        self.length = length
        rng = np.random.RandomState(0)
        self._img = (rng.randint(0, 255, (SRC_H, SRC_W, 3))
                     .astype(np.uint8))
        self._mask = (rng.randint(0, 19, (SRC_H, SRC_W))
                      .astype(np.uint8))

    def __len__(self):
        return self.length

    def __getitem__(self, i):
        import random as _random
        rng = _random.Random(i)
        img = Image.fromarray(self._img)
        mask = Image.fromarray(self._mask)
        centroid = ((SRC_H // 2, SRC_W // 2)
                    if i % 2 else None)  # 50% centroid crops
        img, mask, scale = self.jt(img, mask, rng, centroid=centroid)
        if self.it is not None:
            img = self.it(img, rng)
        arr = to_normalized_array(img, self.cfg.dataset.mean,
                                  self.cfg.dataset.std)
        return {"image": arr, "label": np.asarray(mask, np.int32),
                "name": f"synth_{i}", "scale_float": np.float32(scale)}


def bench_loader(cfg, loader_kind: str, n_batches: int, batch: int,
                 workers: int) -> float:
    """Sustained samples/s through the REAL loader (BatchLoader threads or
    GrainLoader worker processes), the number the TPU step actually sees."""
    jt = build_train_joint_transform(cfg, ignore_label=255)
    it = build_train_img_transform(cfg)
    ds = _SyntheticAugDataset(jt, it, cfg,
                              length=max(64, n_batches * batch * 2))
    if loader_kind == "grain":
        from tpuseg.data.grain_loader import GrainLoader

        loader = GrainLoader(ds, batch, shuffle=False, drop_last=True,
                             num_workers=workers, seed=0)
    else:
        from tpuseg.data.loader import BatchLoader

        loader = BatchLoader(ds, batch, shuffle=False, drop_last=True,
                             num_workers=workers)
    itr = iter(loader)
    next(itr)  # warmup: spin up workers/prefetch
    t0 = time.perf_counter()
    done = 0
    for b in itr:
        done += b["image"].shape[0]
        if done >= n_batches * batch:
            break
    return done / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--workers", type=int, default=None)
    ap.add_argument("--mode", default="transforms",
                    choices=["transforms", "loader"])
    ap.add_argument("--loaders", default="threaded,grain")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--rand-augment", default=None,
                    help="N,M to include paired RandAugment in the stack")
    args = ap.parse_args()

    overrides = {"dataset.crop_size": (1024, 2048),
                 "dataset.name": "cityscapes"}
    if args.rand_augment:
        n_, m_ = (int(v) for v in args.rand_augment.split(","))
        overrides["dataset.rand_augment"] = (n_, m_)
    cfg = make_config(overrides)
    workers = args.workers or cfg.dataset.num_workers
    cpus = len(os.sched_getaffinity(0))

    if args.mode == "loader":
        for kind in args.loaders.split(","):
            try:
                sps = bench_loader(cfg, kind, n_batches=args.n // args.batch
                                   or 1, batch=args.batch, workers=workers)
            except ImportError as e:   # grain optional dep
                print(json.dumps({"metric": "input_pipeline_loader",
                                  "loader": kind, "skipped": str(e)}),
                      flush=True)
                continue
            print(json.dumps({
                "metric": "input_pipeline_samples_per_sec",
                "value": round(sps, 2), "unit": "samples/sec/host",
                "mode": "loader", "loader": kind, "workers": workers,
                "batch": args.batch, "cpus": cpus, "crop": "1024x2048",
                "rand_augment": bool(args.rand_augment),
                "chips_fed_at_2.25_img_s": round(sps / 2.25, 1)}),
                flush=True)
        return

    jt = build_train_joint_transform(cfg, ignore_label=255)
    it = build_train_img_transform(cfg)
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
            "mode": "transforms", "workers": w, "cpus": cpus,
            "crop": "1024x2048",
            "rand_augment": bool(args.rand_augment),
            "chips_fed_at_2.25_img_s": round(sps / 2.25, 1)}), flush=True)


if __name__ == "__main__":
    main()
