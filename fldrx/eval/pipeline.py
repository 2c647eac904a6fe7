"""Inference pipeline: pad → pyramid → jitted forward, with a shape-keyed
compilation cache.

Parity targets: the test-time preprocessing in the reference driver
(main.py:833-867: reflect-pad to (2^S_tst)*8 divisibility, bicubic pyramid
with scale factor 8/s_i, no-grad forward, crop to original size).

TPU-first: the whole thing — pad, 6-level pyramid build, PCA, flow recurrence,
4K synthesis — is ONE jitted XLA program per input shape. Pyramid resizes are
MXU matmuls; there is no host↔device ping-pong between levels. Compiled
executables are cached keyed on (H, W, B, S_tst) since 4K eval uses a handful
of shapes.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FLDRConfig
from ..model.fldrnet import (flow_extras, forward_flow, forward_synthesis,
                             forward_synthesis_multi, forward_test)
from ..ops.pad import pad_amount
from ..ops.resize import resize_2d


def build_pyramid(frames: jnp.ndarray, cfg: FLDRConfig, n_levels: int):
    """frames: [B, 2, H, W, C] (already padded). Level i is a bicubic
    downscale by 8/scales[i] (main.py:855-856), always DIRECT from full
    resolution.

    (A cascade variant — level i from level i−1, FLDRX_PYR_CASCADE — was
    TPU-measured in r5 and deleted: 0.232 fps and −0.25 dB goldenclip
    (R5B-3/6). Composed bicubic overshoot at the reflect-pad boundaries
    spikes the flow there, pushing edge tiles past the warp engine's
    spill-tier caps → whole-frame exact fallback. The reference's direct
    per-level resize is also the parity semantics.)"""
    B, T, H, W, C = frames.shape
    pyr = [frames]
    flat = frames.reshape(B * T, H, W, C)
    for i in range(1, n_levels):
        f = cfg.scales[0] / cfg.scales[i]
        oh, ow = int(H * f), int(W * f)
        lev = resize_2d(flat, (oh, ow), "bicubic", cfg.align_corners)
        pyr.append(lev.reshape(B, T, oh, ow, C))
    return pyr


def to_model_frames(frames: jnp.ndarray) -> jnp.ndarray:
    """uint8 device frames → f32 [-1,1] INSIDE the jitted program, with a
    4× smaller H2D over the axon relay (FLDRX_RAW_FRAMES). Same f32 op
    chain as the host frames_to_tensor, but XLA lowers the /255 division
    differently (reciprocal-multiply) — inputs deviate by ≤1 ulp
    (measured ≤6e-8; model outputs ≤2e-6, i.e. ~120 dB — far inside the
    parity budget)."""
    if frames.dtype == jnp.uint8:
        return (frames.astype(jnp.float32) / 255.0 - 0.5) * 2.0
    return frames


def _prec_scope(cfg: FLDRConfig):
    """Trace-time resize precision: the fast path runs its resize matmuls
    at HIGH (3-pass bf16 split; r5-measured 4.708 vs 4.686 fps, goldenclip
    bit-flat 44.1040 vs 44.1039 dB — R5B-2/5); strict parity keeps
    HIGHEST."""
    from ..ops.resize import resize_precision
    return resize_precision(
        "high" if getattr(cfg, "fast_warp", False) else None)


def _interp_fn(cfg: FLDRConfig, padded_hw: Tuple[int, int],
               orig_hw: Tuple[int, int], compute_dtype):
    def fn(params, frames, t):
        with _prec_scope(cfg):
            frames = to_model_frames(frames)
            ph, pw = pad_amount(frames.shape[2], cfg.div_pad), pad_amount(
                frames.shape[3], cfg.div_pad)
            if ph or pw:
                frames = jnp.pad(
                    frames, [(0, 0), (0, 0), (0, ph), (0, pw), (0, 0)],
                    mode="reflect" if cfg.padding == "reflect" else "constant")
            pyr = build_pyramid(frames, cfg, cfg.S_tst + 1)
            return forward_test(params, cfg, pyr, t, orig_hw=orig_hw,
                                compute_dtype=compute_dtype)
    return fn


class Interpolator:
    """User-facing engine: holds params + config, jit-compiles per shape.

    frames: [B, 2, H, W, 3] float32 in [-1,1] (RGB or BGR — the model is
    colour-agnostic; the reference pipeline feeds BGR from cv2).
    """

    def __init__(self, params, cfg: FLDRConfig, donate: bool = False):
        self.params = params
        self.cfg = cfg
        self._cache: Dict[Tuple, object] = {}
        cd = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[cfg.compute_dtype]
        self._compute_dtype = cd

    @staticmethod
    def _ingest(frames) -> jnp.ndarray:
        """uint8 passes through (normalized on device — to_model_frames);
        everything else is cast to f32 on host as before."""
        frames = jnp.asarray(frames)
        if frames.dtype != jnp.uint8:
            frames = frames.astype(jnp.float32)
        return frames

    def _compiled(self, shape, dtype):
        key = tuple(shape) + (str(dtype),)
        if key not in self._cache:
            B, T, H, W, C = shape
            fn = _interp_fn(self.cfg, (H, W), (H, W), self._compute_dtype)
            self._cache[key] = jax.jit(fn)
        return self._cache[key]

    def __call__(self, frames, t) -> jnp.ndarray:
        """Interpolate: returns [B, H, W, 3] at time(s) t [B,1]."""
        frames = self._ingest(frames)
        t = jnp.asarray(t, jnp.float32).reshape(frames.shape[0], 1)
        return self._compiled(frames.shape, frames.dtype)(
            self.params, frames, t)

    def interpolate_np(self, frames: np.ndarray, t) -> np.ndarray:
        return np.asarray(self(frames, t))

    # -- multi-t throughput mode ---------------------------------------
    # Flow is t-independent (fLDRnet.py:400-405 scales it by t only at
    # synthesis); the reference re-runs the whole model per t (main.py:867).
    # Here ×N interpolation computes features+flow once per frame pair.

    def _compiled_flow(self, shape, dtype=jnp.float32):
        key = ("flow", str(dtype)) + tuple(shape)
        if key not in self._cache:
            cfg = self.cfg

            def fn(params, frames):
                with _prec_scope(cfg):
                    frames = to_model_frames(frames)
                    ph = pad_amount(frames.shape[2], cfg.div_pad)
                    pw = pad_amount(frames.shape[3], cfg.div_pad)
                    if ph or pw:
                        frames = jnp.pad(
                            frames,
                            [(0, 0), (0, 0), (0, ph), (0, pw), (0, 0)],
                            mode=("reflect" if cfg.padding == "reflect"
                                  else "constant"))
                    pyr = build_pyramid(frames, cfg, cfg.S_tst + 1)
                    flow = forward_flow(params, cfg, pyr,
                                        self._compute_dtype)
                    extras = flow_extras(params, cfg, flow, frames)
                    return flow, frames, extras
            self._cache[key] = jax.jit(fn)
        return self._cache[key]

    def _compiled_synth(self, shape):
        key = ("synth",) + tuple(shape)
        if key not in self._cache:
            cfg = self.cfg

            def fn(params, flow, padded_frames, t, extras):
                with _prec_scope(cfg):
                    return forward_synthesis(
                        params, cfg, flow, padded_frames, t,
                        precomputed=extras,
                        compute_dtype=self._compute_dtype)
            self._cache[key] = jax.jit(fn)
        return self._cache[key]

    def precompute_flow(self, frames):
        """frames [B,2,H,W,3] f32 in [-1,1] — or uint8, normalized on
        device (4× less H2D) → (flow, padded_frames, extras)."""
        frames = self._ingest(frames)
        return self._compiled_flow(frames.shape, frames.dtype)(
            self.params, frames)

    def synthesize_at(self, flow, padded_frames, t, orig_hw, extras=None):
        t = jnp.asarray(t, jnp.float32).reshape(flow.shape[0], 1)
        out = self._compiled_synth(padded_frames.shape)(
            self.params, flow, padded_frames, t, extras)
        return out[:, :orig_hw[0], :orig_hw[1]]

    # -- t-batched synthesis: all T time values in ONE jitted program -----
    # (amortizes dispatch overhead and lets XLA overlap the per-t work;
    # flow/extras are broadcast, so only synthesis memory scales with T)

    def _compiled_synth_multi(self, shape, T, planes=False):
        key = ("synthT", T, planes) + tuple(shape)
        if key not in self._cache:
            cfg = self.cfg

            def fn(params, flow, padded_frames, ts, extras):
                with _prec_scope(cfg):
                    return forward_synthesis_multi(
                        params, cfg, flow, padded_frames,
                        [ts[k] for k in range(T)], precomputed=extras,
                        compute_dtype=self._compute_dtype,
                        planes_out=planes)
            self._cache[key] = jax.jit(fn)
        return self._cache[key]

    def synthesize_multi_at(self, flow, padded_frames, t_values, orig_hw,
                            extras=None, planes_out=None):
        """t_values: sequence of scalars → [T, B, H, W, 3] (cropped) — or,
        with cfg.planes_out on the packed path, the u-plane form
        [T, B, 4, H/4, W·3] (shape[-1] != 3; consumers unpack host-side
        via ops.repack.planes_to_plain_np). planes_out overrides
        cfg.planes_out (the evaluator forces plain layout when its
        on-device metrics consume the frames on chip)."""
        B = flow.shape[0]
        if planes_out is None:
            planes_out = getattr(self.cfg, "planes_out", False)
        planes = planes_out and orig_hw[0] % 4 == 0
        ts = jnp.asarray(np.asarray(t_values, np.float32).reshape(-1, 1)
                         * np.ones((1, B), np.float32))[..., None]
        out = self._compiled_synth_multi(padded_frames.shape, len(t_values),
                                         planes)(
            self.params, flow, padded_frames, ts, extras)
        if out.shape[-1] != 3:                 # u-plane form
            return out[:, :, :, :orig_hw[0] // 4, :orig_hw[1] * 3]
        return out[:, :, :orig_hw[0], :orig_hw[1]]

    def interpolate_multi_np(self, frames: np.ndarray, t_values) -> np.ndarray:
        """×N mode: one flow computation, then chunked multi-t synthesis
        programs of cfg.t_chunk t-values each (the throughput configuration
        the bench measures). Returns [len(t_values), B, H, W, 3]."""
        H, W = frames.shape[2], frames.shape[3]
        flow, padded, extras = self.precompute_flow(frames)
        chunk = max(1, getattr(self.cfg, "t_chunk", 3))
        outs = []
        for k in range(0, len(t_values), chunk):
            out = self.synthesize_multi_at(flow, padded,
                                           t_values[k:k + chunk],
                                           (H, W), extras)
            a = np.asarray(out)
            if a.shape[-1] != 3:               # u-plane form → host unpack
                from ..ops.repack import planes_to_plain_np
                a = planes_to_plain_np(a)
            outs.append(a)
        return np.concatenate(outs, 0)
