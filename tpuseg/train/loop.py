"""Training/eval orchestration — the engine.

Replaces the reference's main()/train()/validate() (train.py:324-597) with
a Trainer class around the jitted GSPMD steps. Epoch-mutable state the
reference kept in the frozen-then-unfrozen global cfg (EPOCH for label
relaxation, config.py:364-368) lives here as plain attributes.
"""
from __future__ import annotations

import os
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.config import Config, eval_model_config, infer_mscale
from tpuseg.data.setup import setup_data
from tpuseg.evaluation.dumper import ImageDumper
from tpuseg.evaluation.inference import DRAIN_EVERY, EvalRunner
from tpuseg.evaluation.metrics import (
    AverageMeter,
    eval_metrics_from_hist,
    format_evaluate_results,
)
from tpuseg.losses import get_loss
from tpuseg.models import get_model
from tpuseg.parallel import make_mesh, replicate, shard_batch, \
    shard_batch_spatial
from tpuseg.parallel.mesh import multihost_sum
from tpuseg.train.checkpoint import AutoResume, CheckpointManager, \
    load_snapshot
from tpuseg.train.optim import make_optimizer
from tpuseg.train.state import create_train_state
from tpuseg.train.step import make_train_step
from tpuseg.utils.logging import Logger


def _reduce_scale_hists(scale_hists: dict, runner, num_classes: int) -> dict:
    """Multi-host sum of the per-scale confusion matrices over the
    runner's STATIC scale set, in sorted order.

    Iterating the accumulated dict instead would make the number of
    collectives data-dependent: a host whose val shard is empty (the val
    sampler doesn't pad, datasets/sampler.py semantics) would issue fewer
    `multihost_sum` calls than its peers and deadlock the job.
    """
    zeros = np.zeros((num_classes, num_classes), np.float64)
    return {s: multihost_sum(np.asarray(scale_hists.get(s, zeros),
                                        np.float64))
            for s in sorted(runner.scale_hist_scales)}


class Trainer:
    def __init__(self, cfg: Config, logdir: str = "logs",
                 is_primary: bool = True):
        self.cfg = cfg
        self.logger = Logger(logdir, is_primary)
        self.is_primary = is_primary
        self.logdir = logdir

        # size the data axis to the largest device count dividing the batch
        devices = jax.devices()
        n_data = len(devices) // cfg.mesh.model_parallelism
        while n_data > 1 and cfg.train.batch_size % n_data != 0:
            n_data -= 1
        self.mesh = make_mesh(
            devices[: n_data * cfg.mesh.model_parallelism],
            model_parallelism=cfg.mesh.model_parallelism)
        self.logger.msg(f"mesh: {dict(self.mesh.shape)}")
        if cfg.mesh.model_parallelism > 1:
            # dp x sp: train batches are H-sharded over the `model` axis
            # (spatial_sharding). Guard against degenerate H-shards: the
            # two-scale train forward's 0.5x pass reaches H/2/32 rows at
            # the deepest trunk stage, and XLA's SPMD strided-conv kernel
            # gradient is silently wrong when that is sharded below one
            # row per device (tests/test_spatial_sharding.py canary).
            min_h = int(cfg.dataset.crop_size[0]) // 2 // 32
            assert min_h >= cfg.mesh.model_parallelism, (
                f"crop H {cfg.dataset.crop_size[0]} too small for "
                f"model_parallelism={cfg.mesh.model_parallelism}: the 0.5x "
                f"pass's deepest stage has {min_h} rows, which would shard "
                "below 1 row/device and hit the degenerate-shard XLA "
                "gradient bug (parallel/mesh.py:spatial_sharding)")

        self.model = get_model(cfg)
        self.eval_model = self._make_eval_model()
        self.criterion, self.val_criterion = get_loss(cfg)

        # per-host dataset shard (reference DistributedSampler semantics:
        # datasets/sampler.py:43-110); shard_batch assembles the global
        # batch from the per-host pieces
        self.train_loader, self.val_loader, self.train_set = setup_data(
            cfg, eval_mode=None, seed=cfg.train.seed,
            num_shards=jax.process_count(), shard=jax.process_index(),
            is_primary=is_primary)
        self.steps_per_epoch = max(1, len(self.train_loader))
        if cfg.train.test_mode:
            self.steps_per_epoch = min(self.steps_per_epoch, 10)

        self.tx, self.schedule = make_optimizer(cfg, self.steps_per_epoch)
        h, w = cfg.dataset.crop_size
        example = jnp.zeros((1, int(h), int(w), 3),
                            jnp.dtype(cfg.model.compute_dtype))
        self.state = create_train_state(self.model, self.tx,
                                        jax.random.PRNGKey(cfg.train.seed),
                                        example)
        n_params = sum(p.size for p in jax.tree.leaves(self.state.params))
        self.logger.msg(f"params: {n_params / 1e6:.2f}M")

        self.ckpt = CheckpointManager(
            os.path.join(logdir, cfg.train.checkpoint_dir),
            keep=cfg.train.keep_checkpoints)
        self.auto_resume = AutoResume(
            os.environ.get("TPUSEG_TERMINATE_FILE"))
        self.start_epoch = 0
        self.best_miou = 0.0
        self._restore()

        self.state = replicate(self.mesh, self.state)
        self._train_step = None
        self._train_step_invert = None
        # one EvalRunner for the whole run: a fresh runner per validate()
        # would re-jit the multi-scale eval graph every epoch (minutes per
        # compile on the remote TPU)
        self.eval_runner = EvalRunner(
            self.eval_model, cfg.dataset.num_classes,
            scales=(cfg.eval.default_scale,
                    *(cfg.eval.extra_scales or ())),
            do_flip=cfg.eval.do_flip,
            align_corners=cfg.model.align_corners,
            is_mscale=infer_mscale(cfg),
            ignore_label=cfg.dataset.ignore_label,
            criterion=self.val_criterion,
            pad_multiple=cfg.eval.pad_multiple,
            mean=cfg.dataset.mean, std=cfg.dataset.std)

    # ------------------------------------------------------------------
    def _make_eval_model(self):
        return get_model(eval_model_config(self.cfg))

    def _restore(self):
        cfg = self.cfg
        restored = None
        if cfg.train.resume:
            mgr = CheckpointManager(cfg.train.resume)
            restored = mgr.restore(target_state=self.state)
        elif self.ckpt.latest_step() is not None:  # auto-resume
            restored = self.ckpt.restore(target_state=self.state)
        if restored is not None:
            self.state = self.state.replace(
                params=restored["params"],
                batch_stats=restored["batch_stats"],
                opt_state=restored["opt_state"],
                step=jnp.asarray(restored["meta"]["step"], jnp.int32))
            self.start_epoch = int(restored["meta"]["epoch"]) + 1
            self.best_miou = float(restored["meta"].get("mean_iu", 0.0))
            self.logger.msg(
                f"resumed at epoch {self.start_epoch} "
                f"(best mIoU {self.best_miou:.4f})")
        elif cfg.train.snapshot:
            params, stats = load_snapshot(cfg.train.snapshot,
                                          self.state.params,
                                          self.state.batch_stats,
                                          self.logger.msg)
            self.state = self.state.replace(params=params, batch_stats=stats)
            self.logger.msg(f"loaded snapshot {cfg.train.snapshot}")

    def _get_train_step(self, invert_border: bool):
        """Two cached jitted steps: the relaxed-loss border inversion after
        REDUCE_BORDER_EPOCH is a static recompile (reference flips it via
        the global EPOCH, loss/utils.py:183-186)."""
        lc = self.cfg.loss
        crit = self.criterion
        if lc.loss_type == "relaxed":
            crit = partial(self.criterion, invert_border=invert_border)
        key = "_train_step_invert" if invert_border else "_train_step"
        if getattr(self, key) is None:
            # donate the state: XLA reuses the param/optimizer buffers
            # (~3x params) for the outputs instead of holding both copies
            # across the step — the difference between fitting and OOM for
            # 1024x2048 crops without remat (no-op on CPU)
            setattr(self, key, jax.jit(make_train_step(
                self.model, crit,
                ocr_alpha=lc.ocr_alpha,
                aux_rmi=lc.ocr_aux_rmi,
                supervised_mscale_wt=lc.supervised_mscale_wt,
                align_corners=self.cfg.model.align_corners,
                mean=self.cfg.dataset.mean, std=self.cfg.dataset.std),
                donate_argnums=(0,)))
        return getattr(self, key)

    def _maybe_reduce_border_labels(self, invert: bool):
        """Label side of the REDUCE_BORDER_EPOCH flip: halve the
        relaxation window and mark boundary pixels with weight 2
        (reference transforms/transforms.py:103-123 reads the global
        EPOCH; here the transform is swapped explicitly). Idempotent —
        the swapped-in partial is equivalent every epoch past the
        threshold. Workers (threaded or grain) pick it up because both
        loaders consult the live dataset at iteration time."""
        cfg = self.cfg
        if (invert and cfg.dataset.jointwtborder
                and self.train_set is not None
                and hasattr(self.train_set, "label_transform")):
            from tpuseg.data.setup import relaxed_label_transform
            ignore = getattr(self.train_set, "ignore_label",
                             cfg.dataset.ignore_label)
            self.train_set.label_transform = relaxed_label_transform(
                cfg, ignore, reduce_border=True)

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int):
        """(reference train(): train.py:465-533)"""
        cfg = self.cfg
        invert = (cfg.loss.reduce_border_epoch != -1 and
                  epoch > cfg.loss.reduce_border_epoch)
        self._maybe_reduce_border_labels(invert)
        step_fn = self._get_train_step(invert)
        rng = jax.random.PRNGKey(cfg.train.seed + 1)

        if self.train_set is not None and hasattr(self.train_set,
                                                  "build_epoch"):
            # coarse-sampling epoch schedule (reference: train.py:433-445):
            # only_coarse pins the coarse centroid set; otherwise the
            # class-uniform mix drops back to fine-only after max_cu_epoch
            if cfg.dataset.only_coarse and hasattr(self.train_set,
                                                   "only_coarse"):
                self.train_set.only_coarse()
            elif (cfg.dataset.class_uniform_pct and
                  epoch >= cfg.train.max_cu_epoch and
                  hasattr(self.train_set, "disable_coarse")):
                self.train_set.disable_coarse()
            self.train_set.build_epoch(epoch)
        self.train_loader.set_epoch(epoch)

        # loss accumulates ON DEVICE every step (true epoch mean, as the
        # reference's per-iter AverageMeter) and is only read back at log
        # points — keeps the relay-friendly sync cadence
        loss_sum = None
        t_start = time.time()
        n_done = 0
        # device-trace capture of the first profile_steps steady-state
        # steps (train.profile_steps; step 0 is the compile step)
        profile_on = (cfg.train.profile_steps > 0 and
                      epoch == self.start_epoch and self.is_primary)
        trace_dir = os.path.join(self.logdir, "trace")
        tracing = False
        for i, batch in enumerate(self.train_loader):
            if cfg.train.test_mode and i >= 10:
                break
            place = (shard_batch_spatial
                     if self.cfg.mesh.model_parallelism > 1 else shard_batch)
            device_batch = place(self.mesh, {
                "image": batch["image"], "label": batch["label"]})
            self.state, metrics = step_fn(self.state, device_batch, rng)
            loss_sum = metrics["loss"] if loss_sum is None \
                else loss_sum + metrics["loss"]
            n_done += 1
            if profile_on:
                if i == 0:
                    float(metrics["loss"])  # let the compile step finish
                    jax.profiler.start_trace(trace_dir)
                    tracing = True
                elif tracing and i >= cfg.train.profile_steps:
                    float(metrics["loss"])  # flush traced steps
                    jax.profiler.stop_trace()
                    tracing = False
                    self.logger.msg(f"device trace -> {trace_dir}")
            if (i + 1) % cfg.train.log_every == 0 or i == 0:
                loss = float(metrics["loss"])  # device sync point
                avg = float(loss_sum) / n_done
                step = int(self.state.step)
                lr = float(self.schedule(step))
                # batch rows are per-host shards; img/s reports GLOBAL rate
                imgs_s = (n_done * batch["image"].shape[0] *
                          jax.process_count() /
                          max(time.time() - t_start, 1e-6))
                self.logger.msg(
                    f"epoch {epoch} it {i + 1}/{self.steps_per_epoch} "
                    f"loss {loss:.4f} (avg {avg:.4f}) lr {lr:.6f} "
                    f"{imgs_s:.2f} img/s")
                self.logger.metric("train", {"loss": loss, "lr": lr,
                                             "imgs_per_sec": imgs_s}, step)
        if tracing:  # epoch shorter than profile_steps
            jax.profiler.stop_trace()
            self.logger.msg(f"device trace -> {trace_dir}")
        return float(loss_sum) / n_done if n_done else 0.0

    # ------------------------------------------------------------------
    def validate(self, epoch: int, dump_assets: bool = False,
                 dump_all_images: bool = False, calc_metrics: bool = True):
        """(reference validate(): train.py:536-597)"""
        cfg = self.cfg
        runner = self.eval_runner

        palette = getattr(self.val_loader.dataset, "palette", None)
        from tpuseg.data.cityscapes_labels import TRAINID_TO_ID
        dumper = ImageDumper(
            val_len=len(self.val_loader), dump_dir=os.path.join(
                self.logdir, "best_images"),
            palette=palette, mean=cfg.dataset.mean, std=cfg.dataset.std,
            trainid_to_id=TRAINID_TO_ID,
            dump_all_images=dump_all_images or cfg.eval.dump_all_images,
            dump_assets=dump_assets or cfg.eval.dump_assets,
            dump_for_auto_labelling=cfg.eval.dump_for_auto_labelling,
            dump_for_submission=cfg.eval.dump_for_submission)

        total_hist = np.zeros(
            (cfg.dataset.num_classes, cfg.dataset.num_classes), np.float64)
        scale_hists: dict = {}
        val_loss = AverageMeter()
        # variables for the eval model (same params/stats)
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        if jax.process_count() > 1:
            # eval is HOST-LOCAL (reference DDP eval: each rank scores its
            # val shard, hists allreduced at the end): per-host shards have
            # divergent batch counts, so dispatching them against the
            # globally-sharded train state would deadlock. Localize the
            # replicated params (every device holds the full value) and
            # pin them on the local device ONCE — passing numpy trees
            # would re-upload the full parameter set every batch.
            dev = jax.local_devices()[0]
            variables = jax.tree.map(
                lambda x: jax.device_put(x.addressable_data(0), dev),
                variables)

        # pipelined metrics-only loop: the confusion matrix / val loss
        # accumulate on device; drain every DRAIN_EVERY batches so host
        # dispatch overlaps device compute instead of syncing per image
        # (EvalRunner.run_batch docstring)
        acc = runner.init_acc()

        def _drain():
            nonlocal acc, total_hist
            h, sh, ls, ln = runner.drain(acc)
            total_hist += h
            for s, v in sh.items():
                scale_hists[s] = scale_hists.get(s, 0) + v
            if ln:
                val_loss.update(ls / ln, ln)
            acc = runner.init_acc()

        for val_idx, batch in enumerate(self.val_loader):
            if cfg.train.test_mode and val_idx >= 5:
                break
            need = dumper.wants(val_idx)
            assets, acc = runner.run_batch(variables, batch, calc_metrics,
                                           need_assets=need, acc=acc)
            if need:
                dumper.dump({"input_images": batch["image"],
                             "gt_images": batch["label"],
                             "img_names": batch["name"],
                             "assets": assets}, val_idx)
            if (val_idx + 1) % DRAIN_EVERY == 0:
                _drain()
            if val_idx % 20 == 0:
                self.logger.msg(f"validating [{val_idx}/"
                                f"{len(self.val_loader)}]")
        _drain()

        if not calc_metrics:
            dumper.write_webpage()
            return None

        total_hist = multihost_sum(total_hist)
        scale_hists = _reduce_scale_hists(scale_hists, runner,
                                          cfg.dataset.num_classes)
        metrics = eval_metrics_from_hist(total_hist)
        class_names = list(getattr(self.val_loader.dataset,
                                   "trainid_to_name", {}).values()) or None
        self.logger.msg("\n" + format_evaluate_results(
            total_hist, class_names, epoch, iou_per_scale=scale_hists))
        val_scalars = {"loss": val_loss.avg, "mIoU": metrics.mean_iou,
                       "acc": metrics.acc}
        for s, h in scale_hists.items():  # reference --log_msinf_to_tb
            val_scalars[f"mIoU_{s}x"] = eval_metrics_from_hist(h).mean_iou
        self.logger.metric("val", val_scalars, int(self.state.step))
        dumper.write_summaries(self.logger, int(self.state.step))
        dumper.write_webpage()

        # no is_primary gate: mean_iou comes from multihost_sum so it is
        # identical on every host, and the collective ckpt.save below
        # records best_miou — a primary-only update would write 0.0 from
        # non-primary hosts into the shared checkpoint metadata
        if metrics.mean_iou >= self.best_miou:
            self.best_miou = metrics.mean_iou
        self.ckpt.save(int(self.state.step), self.state, epoch,
                       metrics.mean_iou)
        return metrics

    # ------------------------------------------------------------------
    def fit(self):
        """(reference main() epoch loop: train.py:431-462)"""
        cfg = self.cfg
        max_epoch = 2 if cfg.train.test_mode else cfg.train.max_epoch
        for epoch in range(self.start_epoch, max_epoch):
            self.train_epoch(epoch)
            if (epoch + 1) % cfg.train.val_freq == 0 or \
                    epoch == max_epoch - 1:
                self.validate(epoch)
            if self.auto_resume.termination_requested():
                self.logger.msg("termination requested: checkpoint + exit")
                self.ckpt.save(int(self.state.step), self.state, epoch,
                               self.best_miou)
                self.ckpt.wait_until_finished()
                return
        self.ckpt.wait_until_finished()  # drain async checkpoint writes
        self.logger.msg(f"done; best mIoU {self.best_miou:.4f}")


def evaluate_only(cfg: Config, logdir: str = "logs",
                  eval_mode: str = "val", checkpoint: Optional[str] = None,
                  is_primary: bool = True):
    """Eval-only entry (reference: train.py:406-429 --eval paths)."""
    logger = Logger(logdir, is_primary)
    model = get_model(eval_model_config(cfg))
    _, val_criterion = get_loss(cfg)

    _, val_loader, _ = setup_data(cfg, eval_mode=eval_mode,
                                  seed=cfg.train.seed,
                                  num_shards=jax.process_count(),
                                  shard=jax.process_index(),
                                  is_primary=is_primary)

    # param shapes are input-size-independent (all-conv nets), so init on a
    # small example; eval forwards re-trace per actual input shape
    example = jnp.zeros((1, 64, 64, 3), jnp.dtype(cfg.model.compute_dtype))
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), example)
    if checkpoint:
        from tpuseg.train.checkpoint import load_snapshot

        params, stats = load_snapshot(checkpoint, variables["params"],
                                      variables.get("batch_stats", {}),
                                      logger.msg)
        variables = {"params": params, "batch_stats": stats}

    runner = EvalRunner(
        model, cfg.dataset.num_classes,
        scales=(cfg.eval.default_scale, *(cfg.eval.extra_scales or ())),
        do_flip=cfg.eval.do_flip, align_corners=cfg.model.align_corners,
        is_mscale=infer_mscale(cfg),
        ignore_label=cfg.dataset.ignore_label,
        criterion=val_criterion,
        pad_multiple=cfg.eval.pad_multiple,
        mean=cfg.dataset.mean, std=cfg.dataset.std)

    has_labels = eval_mode != "folder" and \
        not cfg.eval.dump_for_auto_labelling and \
        not cfg.eval.dump_for_submission
    if cfg.eval.dump_topn:
        if not has_labels:
            raise ValueError(
                "eval.dump_topn ranks images by ground-truth failures and "
                "needs labels: not available in folder/auto-label/"
                "submission modes (reference --dump_topn: train.py:163-168)")
        from tpuseg.evaluation.topn import validate_topn

        return validate_topn(
            val_loader, runner, variables, cfg.dataset.num_classes,
            result_dir=cfg.eval.result_dir or os.path.join(logdir,
                                                           "eval_images"),
            trainid_to_name=getattr(val_loader.dataset, "trainid_to_name",
                                    None),
            dump_topn=cfg.eval.dump_topn,
            dump_topn_all=cfg.eval.dump_topn_all,
            palette=getattr(val_loader.dataset, "palette", None),
            mean=cfg.dataset.mean, std=cfg.dataset.std, log=logger.msg,
            max_images=5 if cfg.train.test_mode else None)

    # reference --no_metrics (train.py:420-421): dump without scoring
    calc_metrics = has_labels and not cfg.eval.no_metrics

    palette = getattr(val_loader.dataset, "palette", None)
    from tpuseg.data.cityscapes_labels import TRAINID_TO_ID
    dumper = ImageDumper(
        val_len=len(val_loader),
        dump_dir=cfg.eval.result_dir or os.path.join(logdir, "eval_images"),
        palette=palette, mean=cfg.dataset.mean, std=cfg.dataset.std,
        trainid_to_id=TRAINID_TO_ID,
        dump_all_images=cfg.eval.dump_all_images or eval_mode == "folder",
        dump_assets=cfg.eval.dump_assets,
        dump_for_auto_labelling=cfg.eval.dump_for_auto_labelling,
        dump_for_submission=cfg.eval.dump_for_submission)

    total_hist = np.zeros(
        (cfg.dataset.num_classes, cfg.dataset.num_classes), np.float64)
    scale_hists: dict = {}
    # pipelined on-device accumulation (see Trainer.validate)
    acc = runner.init_acc()

    def _drain():
        nonlocal acc, total_hist
        h, sh, _, _ = runner.drain(acc)
        total_hist += h
        for s, v in sh.items():
            scale_hists[s] = scale_hists.get(s, 0) + v
        acc = runner.init_acc()

    for val_idx, batch in enumerate(val_loader):
        if cfg.train.test_mode and val_idx >= 5:
            break
        need = dumper.wants(val_idx)
        assets, acc = runner.run_batch(variables, batch, calc_metrics,
                                       need_assets=need, acc=acc)
        if need:
            dumper.dump({"input_images": batch["image"],
                         "gt_images": batch["label"],
                         "img_names": batch["name"],
                         "assets": assets}, val_idx)
        if (val_idx + 1) % DRAIN_EVERY == 0:
            _drain()
        if val_idx % 20 == 0:
            logger.msg(f"eval [{val_idx}/{len(val_loader)}]")
    _drain()
    dumper.write_summaries(logger, 0)
    dumper.write_webpage()
    if calc_metrics:
        total_hist = multihost_sum(total_hist)
        scale_hists = _reduce_scale_hists(scale_hists, runner,
                                          cfg.dataset.num_classes)
        metrics = eval_metrics_from_hist(total_hist)
        class_names = list(getattr(val_loader.dataset, "trainid_to_name",
                                   {}).values()) or None
        logger.msg("\n" + format_evaluate_results(
            total_hist, class_names, iou_per_scale=scale_hists))
        logger.msg(f"mean mIoU: {metrics.mean_iou:.4f}")
        return metrics
    return None
