"""Rank-aware logging + metric streams.

Replaces runx ``logx`` (reference: SURVEY §5.5): messages to stdout + file,
scalar metric streams to JSONL (machine-readable), optional TensorBoard via
flax.metrics when available. Only the primary process writes.
"""
from __future__ import annotations

import json
import os
import sys
import time
from typing import Mapping, Optional


class Logger:
    def __init__(self, logdir: Optional[str] = None, is_primary: bool = True,
                 tensorboard: bool = False):
        self.logdir = logdir
        self.is_primary = is_primary
        self._metrics_f = None
        self._log_f = None
        self._tb = None
        if logdir and is_primary:
            os.makedirs(logdir, exist_ok=True)
            self._metrics_f = open(os.path.join(logdir, "metrics.jsonl"), "a")
            self._log_f = open(os.path.join(logdir, "log.txt"), "a")
            if tensorboard:
                try:
                    from flax.metrics import tensorboard as tb

                    self._tb = tb.SummaryWriter(
                        os.path.join(logdir, "tb"))
                except Exception:
                    self._tb = None

    def msg(self, message: str):
        if not self.is_primary:
            return
        line = f"[{time.strftime('%H:%M:%S')}] {message}"
        print(line, flush=True)
        if self._log_f:
            self._log_f.write(line + "\n")
            self._log_f.flush()

    def metric(self, phase: str, metrics: Mapping[str, float], step: int):
        """(reference: logx.metric, train.py:525-528)"""
        if not self.is_primary:
            return
        if self._metrics_f:
            self._metrics_f.write(json.dumps(
                {"phase": phase, "step": int(step),
                 **{k: float(v) for k, v in metrics.items()}}) + "\n")
            self._metrics_f.flush()
        if self._tb:
            for k, v in metrics.items():
                self._tb.scalar(f"{phase}/{k}", float(v), step)

    def image(self, tag: str, img, step: int):
        """HWC float [0,1] image to TensorBoard (reference: logx.add_image
        via ImageDumper.write_summaries, utils/misc.py:388-417). No-op
        without a TB writer."""
        if self.is_primary and self._tb is not None:
            self._tb.image(tag, img, step)

    def flush(self):
        if self._tb:
            self._tb.flush()
