"""Checkpoint/resume + experiment logging — save_manager equivalent
(reference utils.py:28-104, main.py:755-775).

Format: .npz of the flattened param/opt pytrees + scalar meta, mirroring the
reference's combined dict {last_epoch, trainLoss, testLoss, testPSNR,
best_PSNR, state_dict_*}. Files: <model_dir>_latest.npz, copied to
_best_PSNR.npz on val-PSNR improvement, plus _epc<N>.npz every 10 epochs.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import numpy as np

import jax

from ..config import FLDRConfig
from ..tools.convert_ckpt import flatten_params, unflatten_params


class SaveManager:
    def __init__(self, cfg: FLDRConfig):
        self.cfg = cfg
        self.model_dir = cfg.model_dir
        self.ckpt_dir = os.path.join(cfg.checkpoint_dir, self.model_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        os.makedirs(cfg.text_dir, exist_ok=True)
        self.text_path = os.path.join(cfg.text_dir, f"{self.model_dir}.txt")

    # -- text log (utils.py:47-60) --------------------------------------
    def write_info(self, line: str):
        with open(self.text_path, "a") as f:
            f.write(line if line.endswith("\n") else line + "\n")

    def write_config(self):
        import dataclasses
        with open(self.text_path, "a") as f:
            for k, v in dataclasses.asdict(self.cfg).items():
                f.write(f"# {k} : {v}\n")

    # -- checkpoints -----------------------------------------------------
    def _path(self, tag: str) -> str:
        return os.path.join(self.ckpt_dir, f"{self.model_dir}_{tag}.npz")

    def save(self, params, meta: Dict[str, Any], opt_state=None,
             best: bool = False, epoch: Optional[int] = None, step=None):
        """Persist params + optimizer state + step counter — the equivalent of
        the reference's combined dict with state_dict_Optimizer /
        state_dict_Scheduler (main.py:755-770): optax keeps the LR-schedule
        position inside opt_state (scale_by_schedule count), so restoring it
        restores both Adam moments and the schedule."""
        flat = flatten_params(jax.tree.map(np.asarray, params))
        blob = {f"params/{k}": v for k, v in flat.items()}
        if opt_state is not None:
            # opt_state is an optax pytree whose structure is reproducible
            # from (params, cfg); serialize leaves by index
            for i, leaf in enumerate(jax.tree.leaves(opt_state)):
                blob[f"opt/{i:04d}"] = np.asarray(leaf)
        if step is not None:
            blob["meta/step"] = np.asarray(step)
        for k, v in meta.items():
            blob[f"meta/{k}"] = np.asarray(v)
        np.savez(self._path("latest"), **blob)
        if best:
            shutil.copyfile(self._path("latest"), self._path("best_PSNR"))
        if epoch is not None and (epoch + 1) % 10 == 0:
            shutil.copyfile(self._path("latest"), self._path(f"epc{epoch}"))

    def load(self, take_best: bool = False, specific_epoch: int = -1):
        """Returns (params, meta, opt_leaves) from best/latest/specific
        checkpoint (utils.py:85-97). opt_leaves is None for checkpoints saved
        without optimizer state; otherwise the flat leaf list to be
        tree_unflattened against a freshly-initialized opt_state's treedef
        (main.py:474-495 restore semantics)."""
        if specific_epoch >= 0:
            path = self._path(f"epc{specific_epoch}")
        elif take_best:
            path = self._path("best_PSNR")
        else:
            path = self._path("latest")
        z = np.load(path)
        flat = {k[len("params/"):]: z[k] for k in z.files if k.startswith("params/")}
        meta = {k[len("meta/"):]: z[k] for k in z.files if k.startswith("meta/")}
        opt_keys = sorted(k for k in z.files if k.startswith("opt/"))
        opt_leaves = [z[k] for k in opt_keys] if opt_keys else None
        return unflatten_params(flat), meta, opt_leaves

    def exists(self, take_best: bool = False) -> bool:
        tag = "best_PSNR" if take_best else "latest"
        return os.path.exists(self._path(tag))


class OrbaxSaveManager(SaveManager):
    """Async Orbax-backed checkpointing (SURVEY.md §5.4 rebuild note): saves
    overlap with the next training step; same latest/best/epoch layout. Falls
    back to the synchronous .npz SaveManager interface for text logs."""

    def __init__(self, cfg: FLDRConfig):
        super().__init__(cfg)
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def _opath(self, tag: str) -> str:
        return os.path.abspath(os.path.join(self.ckpt_dir,
                                            f"{self.model_dir}_{tag}.orbax"))

    def save(self, params, meta: Dict[str, Any], opt_state=None,
             best: bool = False, epoch: Optional[int] = None, step=None):
        state = {"params": jax.tree.map(np.asarray, params),
                 "meta": {k: np.asarray(v) for k, v in meta.items()}}
        if step is not None:
            state["meta"]["step"] = np.asarray(step)
        if opt_state is not None:
            state["opt"] = {f"{i:04d}": np.asarray(l)
                            for i, l in enumerate(jax.tree.leaves(opt_state))}
        self._ckptr.save(self._opath("latest"), state, force=True)
        if best:
            self._ckptr.wait_until_finished()
            self._ckptr.save(self._opath("best_PSNR"), state, force=True)
        if epoch is not None and (epoch + 1) % 10 == 0:
            self._ckptr.wait_until_finished()
            self._ckptr.save(self._opath(f"epc{epoch}"), state, force=True)

    def load(self, take_best: bool = False, specific_epoch: int = -1):
        self._ckptr.wait_until_finished()
        if specific_epoch >= 0:
            tag = f"epc{specific_epoch}"
        else:
            tag = "best_PSNR" if take_best else "latest"
        restored = self._ckptr.restore(self._opath(tag))
        opt = restored.get("opt")
        opt_leaves = ([opt[k] for k in sorted(opt)] if opt else None)
        return restored["params"], restored["meta"], opt_leaves

    def exists(self, take_best: bool = False) -> bool:
        tag = "best_PSNR" if take_best else "latest"
        return os.path.exists(self._opath(tag))

    def close(self):
        self._ckptr.wait_until_finished()
