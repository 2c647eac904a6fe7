"""Training driver — the reference train() loop (main.py:444-781) rebuilt
around the jitted SPMD train step.

Kept behaviours: PCA fit on the first training sample (once_preprocessed,
main.py:556-557 → to_pca fit → pick_pca), per-epoch validation at multiple=4
driving best-checkpoint selection, MultiStep LR schedule, per-batch PSNR
meter, text-log lines, T-optimization stage support.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import FLDRConfig
from ..data.datasets import XTrain, VimeoTrain
from ..data.loader import train_batches
from ..eval.evaluator import Meter, evaluate
from ..eval.pipeline import Interpolator
from ..model.fldrnet import init_params
from ..ops import metrics as M
from ..ops.block_pca import fit_block_pca
from .checkpoint import SaveManager
from .trainer import TrainState, make_train_step


def fit_pca_from_batch(frames: np.ndarray, cfg: FLDRConfig):
    """once_preprocessed equivalent: fit block-PCA on the first sample's six
    channel-images (main.py:556-557 uses input_frames[0] only)."""
    sample = frames[0]                       # [2,H,W,C]
    imgs = np.transpose(sample, (0, 3, 1, 2)).reshape(-1, *sample.shape[1:3])
    st = fit_block_pca(imgs, cfg.dctvfi_nf, cfg.wiS)
    return {
        "mean": jnp.asarray(st.mean, jnp.float32),
        "ev": jnp.asarray(st.eigenvectors, jnp.float32),
        "mean_vec": jnp.asarray(st.mean_vec, jnp.float32),
    }


def train(cfg: FLDRConfig, mesh=None, max_steps_per_epoch: Optional[int] = None,
          continue_training: bool = False, seed: int = 0,
          no_validation: bool = False, verbose: bool = True):
    """Full training run. Returns (params, best_psnr)."""
    SM = SaveManager(cfg)
    SM.write_config()
    dataset = XTrain(cfg) if cfg.dataset == "X4K1000FPS" else VimeoTrain(cfg)
    if len(dataset) < cfg.batch_size:
        raise ValueError(
            f"dataset has {len(dataset)} clips < batch_size {cfg.batch_size} "
            f"(drop_last would yield zero batches)")
    steps_per_epoch = max(1, len(dataset) // cfg.batch_size)
    if max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)

    start_epoch, best_psnr, pca_fitted = 0, 0.0, False
    if continue_training and SM.exists(take_best=cfg.t_optimization):
        params, meta = SM.load(take_best=cfg.t_optimization)
        params = jax.tree.map(jnp.asarray, params)
        start_epoch = int(meta.get("last_epoch", -1)) + 1
        best_psnr = float(meta.get("best_PSNR", 0.0))
        pca_fitted = True
        if cfg.t_optimization:
            start_epoch = int(meta.get("last_epoch", -1)) + 1
    else:
        params = init_params(jax.random.PRNGKey(seed), cfg)

    state = TrainState.create(params, cfg, steps_per_epoch)
    step_fn = make_train_step(cfg, mesh)

    if verbose:
        n = sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(params))
        print(f"Total Parameters: {n}")
        print(f"[*] Training starts: {steps_per_epoch} steps/epoch, "
              f"epochs {start_epoch}..{cfg.epochs - 1}")
        SM.write_info("Epoch\ttrainLoss\tWarpLoss\tValLoss\ttestPSNR\tbest_PSNR")

    for epoch in range(start_epoch, cfg.epochs):
        losses, warp_loss, batch_psnr = Meter(), Meter(), Meter()
        t_epoch = time.time()
        for i, batch in enumerate(train_batches(dataset, cfg.batch_size,
                                                seed, epoch)):
            if i >= steps_per_epoch:
                break
            if not pca_fitted:
                state = state.replace(params={
                    **state.params, "pca": fit_pca_from_batch(batch["frames"], cfg)})
                pca_fitted = True
            state, m = step_fn(state, batch)
            losses.update(float(m["loss"]))
            warp_loss.update(float(m["warp"]))
            if verbose and i % 100 == 0:
                print(f"Epoch [{epoch}][{i}/{steps_per_epoch}] "
                      f"loss {losses.avg:.4e} warp {warp_loss.avg:.4e}")

        if verbose:
            print(f"Time needed for epoch (min): {(time.time() - t_epoch) / 60:.2f}")

        # validation (main.py:743-748): X-Test val crops, multiple=4
        test_psnr, test_loss = 1.0, 1.0
        if not no_validation:
            val_cfg = cfg.replace(phase="train")    # div_pad uses S_trn
            interp = Interpolator(state.params, val_cfg)
            try:
                res = evaluate(interp, val_cfg, "X4K1000FPS", multiple=4,
                               validation=True, verbose=False)
                test_psnr = res.psnr
                test_loss = 0.0
            except (RuntimeError, FileNotFoundError):
                if verbose:
                    print("validation data unavailable — skipping validation")
                no_validation = True

        best = test_psnr > best_psnr
        best_psnr = max(best_psnr, test_psnr)
        SM.save(state.params, {
            "last_epoch": epoch, "batch_size": cfg.batch_size,
            "trainLoss": losses.avg, "testLoss": test_loss,
            "testPSNR": test_psnr, "best_PSNR": best_psnr,
        }, best=best, epoch=epoch)
        SM.write_info(f"{epoch}\t\t{losses.avg:.4}\t\t{warp_loss.avg:.4}\t\t"
                      f"{test_loss:.4}\t\t{test_psnr:.4}\t\t{best_psnr:.4}")

    return state.params, best_psnr


def train_it(cfg: FLDRConfig, toptim: bool = True, **kw):
    """Two-stage launcher (train_it.py:17-29): 200-epoch papermodel run, then
    optional T-optimization: 220 epochs from best, lr=1e-3, MSE rec loss."""
    params, best = train(cfg, **kw)
    if toptim:
        tcfg = cfg.replace(t_optimization=True, init_lr=1e-3, epochs=220)
        params, best = train(tcfg, continue_training=True, **kw)
    return params, best
