"""Golden-clip end-to-end quality regression (VERDICT r2 item 3).

A deterministic procedurally generated scene with occlusion + large motion
and ANALYTIC ground truth runs the full ×8 interpolation protocol with the
real converted checkpoint; the mean PSNR is pinned. Any kernel / precision
/ pipeline change that moves end-to-end quality by more than the tolerance
fails here — the proxy for the real X-Test protocol this environment can't
run (datasets absent). The TPU 4K/test5scales numbers live in PARITY.md
(regenerate with python -m fldrx.tools.goldenclip_report).
"""

import os

import numpy as np
import pytest

CKPT = os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                    "fldrnet_best.npz")

# measured on CPU-jax (f32, deterministic): strict and fast paths are
# identical here (the Pallas kernels and the low-res flowback only engage
# on TPU-scale shapes). Baseline naive frame-average: 30.09 dB.
PINNED_MEAN_PSNR = 44.828
TOL_DB = 0.05


@pytest.mark.skipif(not os.path.exists(CKPT), reason="checkpoint missing")
@pytest.mark.parametrize("fast_warp", [False, True])
def test_golden_clip_quality_pinned(fast_warp):
    from fldrx.api import prepare_model
    from fldrx.config import papermodel
    from fldrx.eval.goldenclip import golden_psnrs

    cfg = papermodel().replace(S_tst=3, fast_warp=fast_warp,
                               compute_dtype="float32")
    interp, cfg, _ = prepare_model(CKPT, cfg)
    ps, mean = golden_psnrs(interp, 512, 768, 8)
    assert abs(mean - PINNED_MEAN_PSNR) < TOL_DB, (mean, ps)
    # symmetric protocol: the edge t-values are easiest
    assert ps[0] > ps[3] and ps[6] > ps[3]


# Additional scene families (VERDICT r3 weak #7): spatially varying flow
# (affine), thin structures, and flat gradients — measured CPU-jax f32,
# strict==fast on CPU shapes. Naive frame-average baselines: affine
# 33.29 dB, thin 32.57 dB, flat 60.09 dB (flat is a precision canary:
# averaging beats the model on smooth gradients; the pin still catches
# any precision/banding regression).
FAMILY_PINS = {"affine": 47.125, "thin": 36.169, "flat": 57.999}


@pytest.mark.skipif(not os.path.exists(CKPT), reason="checkpoint missing")
@pytest.mark.parametrize("family", sorted(FAMILY_PINS))
def test_golden_clip_families_pinned(family):
    from fldrx.api import prepare_model
    from fldrx.config import papermodel
    from fldrx.eval.goldenclip import golden_psnrs

    cfg = papermodel().replace(S_tst=3, fast_warp=True,
                               compute_dtype="float32")
    interp, cfg, _ = prepare_model(CKPT, cfg)
    ps, mean = golden_psnrs(interp, 512, 768, 8, family=family)
    assert abs(mean - FAMILY_PINS[family]) < TOL_DB, (family, mean, ps)


def test_golden_scene_is_deterministic():
    from fldrx.eval.goldenclip import render_golden
    a = render_golden(128, 192, 0.375)
    b = render_golden(128, 192, 0.375)
    np.testing.assert_array_equal(a, b)
    # motion: frames at t=0 and t=1 differ substantially
    c = render_golden(128, 192, 1.0)
    assert np.mean(np.abs(a - c)) > 0.05
