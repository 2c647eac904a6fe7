"""Training driver — the reference train() loop (main.py:444-781) rebuilt
around the jitted SPMD train step.

Kept behaviours: PCA fit on the first training sample (once_preprocessed,
main.py:556-557 → to_pca fit → pick_pca), per-epoch validation at multiple=4
driving best-checkpoint selection, MultiStep LR schedule, per-batch PSNR
meter, text-log lines, T-optimization stage support.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import FLDRConfig
from ..data.datasets import Inter4KTrain, XTrain, VimeoTrain
from ..data.loader import train_batches
from ..eval.evaluator import Meter, evaluate
from ..eval.pipeline import Interpolator
from ..model.fldrnet import init_params
from ..ops import metrics as M
from ..ops.block_pca import fit_block_pca
from .checkpoint import SaveManager
from .trainer import TrainState, make_train_step


def fit_pca_from_batch(frames: np.ndarray, cfg: FLDRConfig):
    """once_preprocessed equivalent: fit block-PCA on the FIRST TRAINING
    BATCH's frames (main.py:409-441 passes the whole first batch through
    to_pca; with the shipped ExacOneEV+allImUp preset only the scale-8 fit
    is installed, fLDRnet.py:136,146)."""
    imgs = np.transpose(frames, (0, 1, 4, 2, 3)).reshape(
        -1, *frames.shape[2:4])

    def fit(images):
        st = fit_block_pca(images, cfg.dctvfi_nf, cfg.wiS)
        return {
            "mean": jnp.asarray(st.mean, jnp.float32),
            "ev": jnp.asarray(st.eigenvectors, jnp.float32),
            "mean_vec": jnp.asarray(st.mean_vec, jnp.float32),
        }

    pca8 = fit(imgs)
    if cfg.exac_one_ev:
        return {"pca": pca8}
    # per-scale fits on allImUp-downscaled frames (main.py:424-434); scales
    # too small for a block fall back to the scale-8 fit (keeps the param
    # treedef identical to the init placeholders)
    from ..ops.resize import resize_2d
    multi = {"s8": pca8}
    for s in cfg.scales[1:4]:
        f = cfg.scales[0] / s
        oh, ow = int(imgs.shape[1] * f), int(imgs.shape[2] * f)
        if oh < cfg.wiS or ow < cfg.wiS:
            multi[f"s{s}"] = pca8
            continue
        ds = np.asarray(resize_2d(
            jnp.asarray(imgs[..., None], jnp.float32), (oh, ow),
            "bicubic"))[..., 0]
        multi[f"s{s}"] = fit(ds)
    return {"pca": pca8, "pca_multi": multi}


def train(cfg: FLDRConfig, mesh=None, max_steps_per_epoch: Optional[int] = None,
          continue_training: bool = False, seed: int = 0,
          no_validation: bool = False, verbose: bool = True):
    """Full training run. Returns (params, best_psnr)."""
    if cfg.use_orbax:
        from .checkpoint import OrbaxSaveManager
        SM = OrbaxSaveManager(cfg)
    else:
        SM = SaveManager(cfg)
    SM.write_config()
    if cfg.dataset == "X4K1000FPS":
        dataset = XTrain(cfg)
    elif cfg.dataset.startswith("Inter4K"):
        dataset = Inter4KTrain(cfg)
    else:
        dataset = VimeoTrain(cfg)
    if len(dataset) < cfg.batch_size:
        raise ValueError(
            f"dataset has {len(dataset)} clips < batch_size {cfg.batch_size} "
            f"(drop_last would yield zero batches)")
    steps_per_epoch = max(1, len(dataset) // cfg.batch_size)
    if max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)

    start_epoch, best_psnr, pca_fitted = 0, 0.0, False
    opt_leaves, saved_step = None, None
    if continue_training and SM.exists(take_best=cfg.t_optimization):
        params, meta, opt_leaves = SM.load(take_best=cfg.t_optimization)
        params = jax.tree.map(jnp.asarray, params)
        start_epoch = int(meta.get("last_epoch", -1)) + 1
        best_psnr = float(meta.get("best_PSNR", 0.0))
        saved_step = meta.get("step")
        pca_fitted = True
    else:
        params = init_params(jax.random.PRNGKey(seed), cfg)

    state = TrainState.create(params, cfg, steps_per_epoch)
    # restore optimizer state + LR-schedule position (main.py:474-495: the
    # reference reloads state_dict_Optimizer/Scheduler; optax keeps the
    # schedule count inside opt_state, so restoring the leaves restores both).
    # The T-optimization stage deliberately starts a FRESH optimizer (new lr,
    # frozen groups — main.py:517-524), so opt_state is not restored there.
    if opt_leaves is not None and not cfg.t_optimization:
        treedef = jax.tree.structure(state.opt_state)
        if treedef.num_leaves == len(opt_leaves):
            state = state.replace(
                opt_state=jax.tree.unflatten(
                    treedef, [jnp.asarray(l) for l in opt_leaves]))
        else:
            print("[resume] optimizer state incompatible "
                  f"({len(opt_leaves)} leaves vs {treedef.num_leaves}) — "
                  "keeping fresh optimizer")
    if saved_step is not None and not cfg.t_optimization:
        state = state.replace(step=jnp.asarray(int(saved_step), jnp.int32))
    step_fn = make_train_step(cfg, mesh)

    scalar_log = os.path.join(cfg.text_dir, f"{cfg.model_dir}_scalars.jsonl")
    # real TensorBoard event files next to the jsonl (the reference's
    # SummaryWriter scalars, main.py:23,449-452) — dependency-free writer
    from ..utils.tbevents import EventWriter
    tb = EventWriter(os.path.join(cfg.log_dir, f"exp_{cfg.exp_num}"))

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
                    **state.params, **fit_pca_from_batch(batch["frames"], cfg)})
                pca_fitted = True
            batch["epoch"] = np.float32(epoch)   # warping-loss annealing input
            state, m = step_fn(state, batch)
            losses.update(float(m["loss"]))
            warp_loss.update(float(m["warp"]))
            batch_psnr.update(float(m["psnr"]))
            if i % cfg.freq_display == 0:
                if verbose:
                    print(f"Epoch [{epoch}][{i}/{steps_per_epoch}] "
                          f"loss {losses.avg:.4e} warp {warp_loss.avg:.4e} "
                          f"PSNR {batch_psnr.avg:.2f}")
                if cfg.save_images:
                    _dump_pyramid(cfg, state.params, batch, epoch, i)

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
                test_loss = res.rec_loss
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
        }, opt_state=state.opt_state, step=np.asarray(state.step),
            best=best, epoch=epoch)
        SM.write_info(f"{epoch}\t\t{losses.avg:.4}\t\t{warp_loss.avg:.4}\t\t"
                      f"{test_loss:.4}\t\t{test_psnr:.4}\t\t{best_psnr:.4}")
        # TB-equivalent structured scalar series (main.py:449-452)
        with open(scalar_log, "a") as f:
            f.write(json.dumps({
                "epoch": epoch, "step": int(state.step),
                "train_loss": losses.avg, "warp_loss": warp_loss.avg,
                "train_psnr": batch_psnr.avg, "val_loss": test_loss,
                "val_psnr": test_psnr, "best_psnr": best_psnr,
            }) + "\n")
        tb.add_scalars({
            "Loss/train": losses.avg, "Loss/warp": warp_loss.avg,
            "PSNR/train": batch_psnr.avg, "Loss/val": test_loss,
            "PSNR/val": test_psnr, "PSNR/best": best_psnr,
        }, step=int(state.step))
        tb.flush()

    tb.close()
    return state.params, best_psnr


def _dump_pyramid(cfg: FLDRConfig, params, batch, epoch: int, it: int):
    """Training-time pyramid image dump (main.py:683-690 → get_pyramid_images,
    utils.py:945-995): prediction pyramid + flow visualizations + GT + mean
    image, written every freq_display iterations under log_dir/pyramid."""
    from ..eval.pipeline import build_pyramid
    from ..eval.visualize import pyramid_grid, save_image
    from ..model.fldrnet import forward_train

    frames = jnp.asarray(batch["frames"][:1])
    t = jnp.asarray(batch["t"][:1])
    pyr = build_pyramid(frames, cfg, cfg.S_trn + 1)
    out = forward_train(params, cfg, pyr, t)
    grid = pyramid_grid(
        [np.asarray(o) for o in out["out_pyramid"]],
        [np.asarray(f) for f in out["unrefined_flow_pyramid"]],
        target=np.asarray(batch["target"][:1]),
        mean_img=np.asarray(out["mean_pics"][:1]), n_rows=1)
    d = os.path.join(cfg.log_dir, f"exp_{cfg.exp_num}", "pyramid")
    save_image(os.path.join(d, f"{epoch:03d}_{it:04d}_training.png"), grid)


def train_it(cfg: FLDRConfig, toptim: bool = True, **kw):
    """Two-stage launcher (train_it.py:17-29): 200-epoch papermodel run, then
    optional T-optimization: 220 epochs from best, lr=1e-3, MSE rec loss."""
    params, best = train(cfg, **kw)
    if toptim:
        tcfg = cfg.replace(t_optimization=True, init_lr=1e-3, epochs=220)
        params, best = train(tcfg, continue_training=True, **kw)
    return params, best
