"""Model registry.

Arch strings keep the reference convention "module.Factory"
(e.g. "ocrnet.HRNet_Mscale" — reference: network/__init__.py:45-54) but
resolve against this package's flax model factories.
"""
from __future__ import annotations

import importlib
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from tpuseg.config import Config


def get_model(cfg: "Config"):
    """Resolve cfg.model.arch to a constructed flax module
    (reference: network/__init__.py:12-54, minus the criterion — losses are
    external pure functions here)."""
    if cfg.model.remat and cfg.model.remat_stages:
        # selective remat: the HRNet trunk remats only the listed stages
        # (other trunks treat any non-empty value as full remat)
        import dataclasses

        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, remat=tuple(cfg.model.remat_stages)))
    module_name, fn_name = cfg.model.arch.split(".")
    mod = importlib.import_module(f"tpuseg.models.{module_name}")
    factory = getattr(mod, fn_name)
    return factory(cfg)
