"""Benchmark evaluation loop — the reference test() (main.py:784-980)
rebuilt around the jitted Interpolator.

Key behaviours kept: per-(multiple−1) reuse of the loaded frame pair, PSNR
(skimage data_range=255) + SSIM (Y of BGR), per-t PSNR breakdown for Inter4K,
malformed-sample skip list, stop/jump knobs, prediction-time meter.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from ..config import FLDRConfig
from ..data.datasets import TEST_MULTIPLES, get_test_dataset
from ..data.loader import test_samples
from ..ops import metrics
from .pipeline import Interpolator


class Meter:
    """AverageClass equivalent (utils.py:587-611)."""

    def __init__(self, name="", fmt=":f"):
        self.name = name
        self.fmt = fmt
        self.sum = 0.0
        self.count = 0.0
        self.val = 0.0

    def update(self, v, n=1.0):
        self.val = v
        self.sum += v * n
        self.count += n

    @property
    def avg(self):
        return self.sum / self.count if self.count else 0.0

    def __str__(self):
        fmtstr = "{name} {val" + self.fmt + "} (avg:{avg" + self.fmt + "})"
        return fmtstr.format(name=self.name, val=self.val, avg=self.avg)


class ProgressMeter:
    """Console progress printer (utils.py:614-632)."""

    def __init__(self, num_batches, *meters, prefix=""):
        num_digits = len(str(num_batches))
        fmt = "{:" + str(num_digits) + "d}"
        self._batch_fmt = "[" + fmt + "/" + fmt.format(num_batches) + "]"
        self.meters = meters
        self.prefix = prefix

    def print(self, batch):
        entries = [self.prefix + self._batch_fmt.format(batch)]
        entries += [str(m) for m in self.meters]
        print("\t".join(entries))


@dataclass
class EvalResult:
    psnr: float
    ssim: float
    pred_time_avg: float
    frames_per_sec: float
    per_t_psnr: List[float] = field(default_factory=list)
    n_samples: int = 0
    skipped: List[int] = field(default_factory=list)
    rec_loss: float = 0.0     # rec_lambda·L1 on normalized frames (validation
                              # ValLoss, main.py:874-877)


def evaluate(interp: Interpolator, cfg: FLDRConfig, dataset_name: str,
             multiple: Optional[int] = None, validation: bool = False,
             stop_at: int = -1, save_dir: Optional[str] = None,
             verbose: bool = True, half_res: bool = False,
             jump_to: int = -1, compute_metrics: bool = True,
             xvfi_psnr: bool = False, save_flow: bool = False,
             parallel_eval=None) -> EvalResult:
    """compute_metrics=False is the reference's test_custom phase
    (main.py:891: predictions written, no PSNR/SSIM — no GT assumed);
    xvfi_psnr selects the XVFI RMSE formula (--XVFIPSNR, utils.py:644-659).

    save_flow (with save_dir): writes test-time prediction-flow dumps —
    the colorwheel image of the ×8-bicubic-upsampled level-0 flow and the
    |gray(pred)−gray(gt)| difference image per target, under
    <save_dir>/<dataset>/Test_flow_preds/<scene>/ — matching the
    reference's get_test_pred_flow dump (main.py:929-952,
    utils.py:998-1022; flow channels [0:2] = the t→0 direction).

    parallel_eval: optional multi-chip callable
    (frames [1,2,H,W,3], t_values) → [T, H, W, 3] built by
    fldrx.parallel.build_parallel_eval — replaces the single-chip chunked
    multi-t synthesis for each frame pair (SURVEY §2.9)."""
    multiple = multiple or TEST_MULTIPLES.get(dataset_name, cfg.multiple)
    ds = get_test_dataset(cfg, dataset_name, multiple, validation,
                          half_res=half_res)
    patch = (cfg.validation_patch_size if validation and
             dataset_name in ("X4K1000FPS", "X-Test") else cfg.test_patch_size)

    psnrs, ssims, pred_time, rec_losses = Meter(), Meter(), Meter(), Meter()
    per_t = [Meter() for _ in range(multiple - 1)]
    skipped: List[int] = []

    # host/device overlap: PSNR/SSIM (and PNG writes) are host-heavy at 4K;
    # they run on worker threads while the device synthesizes the next
    # pair. Futures drain in submission order so meters/printing stay
    # deterministic.
    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(max_workers=4)
    metric_q: List = []

    def metrics_job(frames, t, scene, pred, flow_fut=None):
        if pred.shape[-1] != 3:       # cfg.planes_out: u-plane form — the
            # unpack (one memcpy) rides this worker thread instead of
            # costing ~12 ms/t of device interleave DMAs
            from ..ops.repack import planes_to_plain_np
            pred = planes_to_plain_np(pred)
        target = frames[2]
        if target.dtype == np.uint8:  # FLDRX_RAW_FRAMES: normalize here
            from ..data.datasets import frames_to_tensor
            target = frames_to_tensor(target[None])[0]
        out_img = np.around(metrics.denorm255(pred))
        p = s = rec = None
        if compute_metrics:
            if validation:
                rec = float(np.mean(np.abs(pred - target)))
            tgt_img = metrics.denorm255(target)
            p = (metrics.psnr_xvfi(tgt_img, out_img) if xvfi_psnr
                 else metrics.psnr(tgt_img, out_img))
            s = metrics.ssim_bgr(tgt_img, out_img)
        if save_dir:
            from PIL import Image
            d = os.path.join(save_dir, dataset_name,
                             scene.replace(os.sep, "_"))
            os.makedirs(d, exist_ok=True)
            Image.fromarray(out_img[..., ::-1].astype(np.uint8)).save(
                os.path.join(d, f"{t:.4f}.png"))
            if save_flow:
                # Test_flow_preds dump (main.py:940-947): flow colorwheel +
                # gray-difference image per target. Gray weights follow the
                # reference's channel-order quirk (utils.py:1007-1008:
                # 0.2989/0.5870/0.1140 applied to BGR as stored).
                fd = os.path.join(save_dir, dataset_name, "Test_flow_preds",
                                  scene.replace(os.sep, "_"))
                os.makedirs(fd, exist_ok=True)
                if flow_fut is not None:
                    Image.fromarray(flow_fut.result()).save(
                        os.path.join(fd, f"flow{t:.4f}.png"))
                if compute_metrics:
                    w = np.array([0.2989, 0.5870, 0.1140], np.float32)
                    diff = np.abs(out_img @ w - tgt_img @ w)
                    diff = np.clip(diff, 0, 255).astype(np.uint8)
                    Image.fromarray(np.repeat(diff[..., None], 3, -1)).save(
                        os.path.join(fd, f"diff{t:.4f}.png"))
        return p, s, rec

    def drain(limit=0):
        while len(metric_q) > limit:
            idx, t, fut = metric_q.pop(0)
            p, s, rec = fut.result()
            if rec is not None:
                rec_losses.update(rec)
            if p is not None:
                psnrs.update(p)
                ssims.update(s)
                if dataset_name.startswith("Inter4K"):
                    per_t[int(round(t * multiple)) - 1].update(p)
            if verbose and idx % (multiple - 1) == multiple - 2:
                print(f"[{idx + 1}/{len(ds)}] PSNR {psnrs.avg:.4f}  "
                      f"SSIM {ssims.avg:.4f}  "
                      f"pred {pred_time.avg * 1000:.1f} ms")

    # multi-t reuse: consecutive items share a frame pair every (multiple-1)
    # targets (make_2D_dataset_X_Test layout); the pair's flow is computed
    # once and the t-values synthesize in chunked multi-t programs of
    # cfg.t_chunk (sweep results in config.py)
    tchunk = max(1, cfg.t_chunk)

    def process_item(idx, frames, t, scene, pred, flow_fut=None):
        metric_q.append((idx, t, pool.submit(metrics_job, frames, t, scene,
                                             pred, flow_fut)))
        drain(limit=24)               # bound queued predictions (~25 MB ea)

    pending: List = []          # buffered (idx, frames, t, scene) of one pair
    pending_key = [None]

    # device/host pipelining: all of a pair's synthesis chunks are
    # DISPATCHED before any output is fetched (JAX async dispatch → chunk
    # k's D2H rides under chunk k+1's compute; the relay's D2H of 7×38 MB
    # per pair otherwise serializes against an idle device).
    # (A FLDRX_EVAL_DEFER mode additionally deferring the fetch one pair
    # deep was TPU-measured in r5 and removed: 0.695 vs 0.692 frames/s on
    # the real evaluator — async dispatch already keeps the device busy, so
    # the cross-pair defer only held ~266 MB of dead outputs. The bench's
    # dispatch-overlap protocol agreed: 4.696 vs 4.686.)
    defer = False
    deferred: List = []

    # FLDRX_DEVICE_METRICS (default ON): PSNR/SSIM computed ON-CHIP per
    # chunk (ops/metrics_jax.py) — only two scalars per frame cross the
    # relay. The 38 MB/frame D2H and the ~2.8 s/frame of 1-core host SSIM
    # both disappear (metric evals were host-SSIM-bound ~12×). Engaged only
    # when nothing else needs the frames on host (no PNG dump, no
    # validation rec-loss); it forces plain-layout synthesis (the 12 ms/t
    # device interleave is far cheaper than fetching frames for host SSIM,
    # so it beats cfg.planes_out whenever both apply).
    devmet = (bool(int(os.environ.get("FLDRX_DEVICE_METRICS", "1")))
              and compute_metrics and not save_dir and not validation)
    _metfn = [None]

    def chunk_metrics(out, items_chunk):
        if out.shape[-1] != 3:
            return None                   # u-plane form → host path
        import jax.numpy as jnp
        from ..ops.metrics_jax import make_chunk_metrics
        if _metfn[0] is None:
            _metfn[0] = make_chunk_metrics(xvfi_psnr)
        tgts = jnp.asarray(np.stack([it[1][2] for it in items_chunk], 0))
        return _metfn[0](out[:, 0], tgts)

    def finish(entry):
        items, outs, t0, mets, flow_fut = entry
        if mets is not None and all(m is not None for m in mets):
            flat = [(float(p), float(s))
                    for ps, ss in mets
                    for p, s in zip(np.asarray(ps), np.asarray(ss))]
            dt = (time.time() - t0) / len(items)
            for (idx, frames, t, scene), (p, s) in zip(items, flat):
                pred_time.update(dt)
                metric_q.append((idx, t, pool.submit(
                    lambda p=p, s=s: (p, s, None))))
                drain(limit=24)
            return
        preds: List[np.ndarray] = []
        for out in outs:
            preds.extend(np.asarray(out)[:, 0])
        dt = (time.time() - t0) / len(items)
        for (idx, frames, t, scene), pred in zip(items, preds):
            pred_time.update(dt)
            process_item(idx, frames, t, scene, pred, flow_fut)

    def finish_all():
        while deferred:
            finish(deferred.pop(0))

    def flush_group():
        if not pending:
            return
        inputs = pending[0][1][None, :2]              # [1,2,H,W,C]
        H, W = inputs.shape[2], inputs.shape[3]
        t0 = time.time()
        ts = [it[2] for it in pending]
        if parallel_eval is not None:
            # parallel_eval returns [T, H, W, 3]: normalize to chunk shape
            entry = (list(pending),
                     [np.asarray(parallel_eval(inputs, ts))[:, None]], t0,
                     None, None)
        else:
            flow, padded, extras = interp.precompute_flow(inputs)
            flow_fut = None
            if save_flow and save_dir:
                # render the pair's flow colorwheel on a worker thread:
                # ×upscale bicubic upsample of the t→0 channels, cropped to
                # the original size (main.py:934-937 flowMul·interpolate)
                import jax.numpy as jnp
                from ..ops.resize import resize_2d
                from .visualize import flow_to_image
                Hp, Wp = padded.shape[2], padded.shape[3]
                up = Hp // flow.shape[1]
                fl = up * resize_2d(flow[:1, ..., 0:2].astype(jnp.float32),
                                    (Hp, Wp), "bicubic", cfg.align_corners)
                flow_fut = pool.submit(
                    lambda a: flow_to_image(np.asarray(a)[0, :H, :W]), fl)
            outs = [interp.synthesize_multi_at(flow, padded,
                                               ts[k:k + tchunk],
                                               (H, W), extras,
                                               planes_out=(
                                                   False if devmet else None))
                    for k in range(0, len(ts), tchunk)]
            mets = None
            if devmet:
                items_l = list(pending)
                mets = [chunk_metrics(out, items_l[k:k + tchunk])
                        for out, k in zip(outs,
                                          range(0, len(ts), tchunk))]
                if all(m is not None for m in mets):
                    # metrics fully on-device: drop the frame buffers now
                    # (finish() only needs the metric scalars)
                    outs = None
            entry = (list(pending), outs, t0, mets, flow_fut)
        pending.clear()
        deferred.append(entry)
        while len(deferred) > (1 if defer else 0):
            finish(deferred.pop(0))

    stop = False
    # FLDRX_RAW_FRAMES (default ON, r4-measured): frames stay uint8 to the
    # device (4× less H2D over the relay; normalization happens in-jit,
    # bitwise the host chain). Off for validation (host rec-loss wants the
    # f32 tensors it had) and for the multi-chip bridges (their programs
    # expect f32 frames).
    raw = (bool(int(os.environ.get("FLDRX_RAW_FRAMES", "1")))
           and not validation and parallel_eval is None)
    for idx, (frames, t, scene) in enumerate(test_samples(ds, patch,
                                                          raw=raw)):
        if stop:
            break
        if jump_to > 1 and idx < jump_to:    # --jumptotest (main.py:817-819)
            continue
        if frames is None or frames.ndim < 4:
            skipped.append(idx)
            continue
        pair_key = ds.items[idx].paths[:2] if hasattr(ds, "items") else None
        if pair_key is None:
            flush_group()
            finish_all()        # drain queued device work before timing
            t0 = time.time()
            pred = interp.interpolate_np(frames[None, :2],
                                         np.full((1, 1), t, np.float32))[0]
            pred_time.update(time.time() - t0)
            process_item(idx, frames, t, scene, pred)
        else:
            if pending and pending_key[0] != pair_key:
                flush_group()
            pending.append((idx, frames, t, scene))
            pending_key[0] = pair_key
        if stop_at != -1 and idx > stop_at:   # --stoptestat (main.py:972-974)
            stop = True
    flush_group()
    finish_all()
    drain()
    pool.shutdown()

    if skipped and verbose:
        print("These indices were skipped:", skipped)
    return EvalResult(
        psnr=psnrs.avg, ssim=ssims.avg, pred_time_avg=pred_time.avg,
        frames_per_sec=(1.0 / pred_time.avg if pred_time.avg else 0.0),
        per_t_psnr=[m.avg for m in per_t], n_samples=int(psnrs.count),
        skipped=skipped, rec_loss=cfg.rec_lambda * rec_losses.avg)
