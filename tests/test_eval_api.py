"""Eval pipeline + public API + CLI tests (tiny shapes, random weights)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fldrx.config import papermodel, papermodel_test5
from fldrx.eval.pipeline import Interpolator, build_pyramid
from fldrx.model.fldrnet import init_params
from fldrx.ops import metrics


def _interp(S=1, compute="float32"):
    cfg = papermodel().replace(S_tst=S, compute_dtype=compute)
    params = init_params(jax.random.PRNGKey(0), cfg)
    return Interpolator(params, cfg), cfg


def test_build_pyramid_shapes():
    cfg = papermodel_test5()
    x = jnp.zeros((1, 2, 256, 512, 3))
    pyr = build_pyramid(x, cfg, cfg.S_tst + 1)
    assert [p.shape[2:4] for p in pyr] == [
        (256, 512), (128, 256), (64, 128), (32, 64), (16, 32), (8, 16)]


def test_interpolator_pads_and_crops():
    interp, _ = _interp(S=1)
    # 70x100 is not divisible by 16 (=2^1*8): must pad internally, crop back
    frames = np.random.RandomState(0).rand(1, 2, 70, 100, 3).astype(np.float32)
    out = interp.interpolate_np(frames * 2 - 1, [[0.5]])
    assert out.shape == (1, 70, 100, 3)
    assert np.isfinite(out).all()


def test_interpolator_shape_cache():
    interp, _ = _interp(S=1)
    f = np.zeros((1, 2, 32, 32, 3), np.float32)
    interp.interpolate_np(f, [[0.5]])
    interp.interpolate_np(f, [[0.25]])
    assert len(interp._cache) == 1
    interp.interpolate_np(np.zeros((1, 2, 64, 32, 3), np.float32), [[0.5]])
    assert len(interp._cache) == 2


def test_identical_frames_roundtrip():
    """With zero motion (identical frames) and TRAINED weights, the output
    should stay close to the input frame (all 6 blend candidates agree)."""
    from fldrx.tools.convert_ckpt import (DEFAULT_SRC,
                                          load_reference_state_dict,
                                          state_dict_to_params)
    if not os.path.exists(DEFAULT_SRC):
        pytest.skip("reference checkpoint not available")
    sd, _ = load_reference_state_dict(DEFAULT_SRC)
    params = jax.tree.map(jnp.asarray, state_dict_to_params(sd)[0])
    cfg = papermodel().replace(S_tst=2)
    interp = Interpolator(params, cfg)
    rng = np.random.RandomState(3)
    base = rng.rand(1, 12, 16, 3).astype(np.float32) * 2 - 1
    from fldrx.ops.resize import resize_2d
    base = np.asarray(resize_2d(jnp.asarray(base), (96, 128)))  # smooth
    frames = np.stack([base, base], 1)
    out = interp.interpolate_np(frames, [[0.5]])
    assert np.abs(out - base).mean() < 0.05


def test_planes_out_knob_small_shapes_fall_back():
    """cfg.planes_out on shapes the packed path rejects must degrade to the
    plain output transparently (consumers detect the form by shape)."""
    cfg = papermodel().replace(S_tst=1, planes_out=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    interp = Interpolator(params, cfg)
    f = (np.random.RandomState(0).rand(1, 2, 64, 64, 3).astype(np.float32)
         * 2 - 1)
    out = interp.interpolate_multi_np(f, [0.25, 0.5])
    assert out.shape == (2, 1, 64, 64, 3)
    assert np.isfinite(out).all()


def test_bfloat16_path_runs():
    interp, _ = _interp(S=1, compute="bfloat16")
    f = np.random.RandomState(0).rand(1, 2, 32, 32, 3).astype(np.float32)
    out = interp.interpolate_np(f * 2 - 1, [[0.5]])
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(out).all()


def test_run_on_images_api(tmp_path):
    from fldrx.api import run_on_images
    interp, cfg = _interp(S=1)
    rng = np.random.RandomState(1)
    # torch layout [B,C,T,H,W] with T=3 (I0, I1, It)
    frames = (rng.rand(1, 3, 3, 32, 48) * 2 - 1).astype(np.float32)
    psnr = run_on_images(interp, cfg, None, frames, [[0.5]],
                         resfold=str(tmp_path), evalit=True)
    assert np.isfinite(psnr) and psnr > 0
    assert os.path.exists(tmp_path / "4.png")
    # NHWC layout also accepted
    frames_nhwc = np.transpose(frames, (0, 2, 3, 4, 1))
    psnr2 = run_on_images(interp, cfg, None, frames_nhwc, [[0.5]], evalit=True)
    np.testing.assert_allclose(psnr, psnr2, rtol=1e-6)


def test_evaluator_on_synthetic_dataset(tmp_path):
    from PIL import Image
    from fldrx.eval.evaluator import evaluate
    rng = np.random.RandomState(0)
    root = tmp_path / "xtest"
    for scene in ("TEST01",):
        d = root / "Type1" / scene
        d.mkdir(parents=True)
        for i in range(33):
            Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(
                d / f"{i:04d}.png")
    interp, cfg = _interp(S=1)
    cfg = cfg.replace(x_test_data_path=str(root))
    res = evaluate(interp, cfg, "X4K1000FPS", multiple=2, verbose=False)
    assert res.n_samples == 1
    assert np.isfinite(res.psnr) and np.isfinite(res.ssim)
    assert res.frames_per_sec > 0
    # eval-time flow dumps (reference get_test_pred_flow, utils.py:998-1022)
    save = tmp_path / "dumps"
    res2 = evaluate(interp, cfg, "X4K1000FPS", multiple=2, verbose=False,
                    save_dir=str(save), save_flow=True)
    np.testing.assert_allclose(res2.psnr, res.psnr, rtol=1e-6)
    fd = save / "X4K1000FPS" / "Test_flow_preds" / "Type1_TEST01_"
    assert (fd / "flow0.5000.png").exists()
    assert (fd / "diff0.5000.png").exists()
    img = np.asarray(Image.open(fd / "flow0.5000.png"))
    assert img.shape == (64, 64, 3)


def test_evaluator_deferred_pipeline_matches(tmp_path, monkeypatch):
    """FLDRX_EVAL_DEFER=1 (1-pair-deep fetch pipeline) must produce the
    same metrics as the synchronous evaluator."""
    from PIL import Image
    from fldrx.eval.evaluator import evaluate
    rng = np.random.RandomState(2)
    root = tmp_path / "xtest"
    for scene in ("TEST01", "TEST02"):      # ≥2 pairs so deferral engages
        d = root / "Type1" / scene
        d.mkdir(parents=True)
        for i in range(33):
            Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(
                d / f"{i:04d}.png")
    interp, cfg = _interp(S=1)
    cfg = cfg.replace(x_test_data_path=str(root))
    ref = evaluate(interp, cfg, "X4K1000FPS", multiple=2, verbose=False)
    monkeypatch.setenv("FLDRX_EVAL_DEFER", "1")
    res = evaluate(interp, cfg, "X4K1000FPS", multiple=2, verbose=False)
    assert res.n_samples == ref.n_samples == 2
    np.testing.assert_allclose(res.psnr, ref.psnr, atol=1e-6)
    np.testing.assert_allclose(res.ssim, ref.ssim, atol=1e-6)


def test_uint8_ingestion_matches_f32():
    """uint8 frames normalized ON DEVICE (to_model_frames) must match the
    host frames_to_tensor + f32 transfer to input-ulp tolerance (XLA
    lowers the /255 as a reciprocal multiply: inputs ≤1 ulp apart)."""
    interp, _ = _interp(S=1)
    rng = np.random.RandomState(7)
    u8 = rng.randint(0, 256, (1, 2, 64, 64, 3), np.uint8)
    f = u8.astype(np.float32)
    f /= 255.0
    f -= 0.5
    f *= 2.0
    a = interp.interpolate_np(u8, [[0.5]])
    b = interp.interpolate_np(f, [[0.5]])
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_evaluator_raw_frames_matches(tmp_path, monkeypatch):
    """uint8-to-device ingestion (FLDRX_RAW_FRAMES, default ON) must
    reproduce the f32 pipeline's metrics to input-ulp tolerance — alone
    and combined with device metrics (also default ON; both pinned off
    for the baseline run)."""
    from PIL import Image
    from fldrx.eval.evaluator import evaluate
    rng = np.random.RandomState(8)
    root = tmp_path / "xtest"
    d = root / "Type1" / "TEST01"
    d.mkdir(parents=True)
    base = rng.randint(0, 255, (64, 64, 3), np.uint8)
    for i in range(33):
        Image.fromarray(np.roll(base, i, axis=1)).save(d / f"{i:04d}.png")
    interp, cfg = _interp(S=1)
    cfg = cfg.replace(x_test_data_path=str(root))
    monkeypatch.setenv("FLDRX_RAW_FRAMES", "0")
    monkeypatch.setenv("FLDRX_DEVICE_METRICS", "0")
    ref = evaluate(interp, cfg, "X4K1000FPS", multiple=4, verbose=False)
    monkeypatch.setenv("FLDRX_RAW_FRAMES", "1")
    res = evaluate(interp, cfg, "X4K1000FPS", multiple=4, verbose=False)
    np.testing.assert_allclose(res.psnr, ref.psnr, atol=1e-3)
    np.testing.assert_allclose(res.ssim, ref.ssim, atol=1e-5)
    monkeypatch.setenv("FLDRX_DEVICE_METRICS", "1")
    res2 = evaluate(interp, cfg, "X4K1000FPS", multiple=4, verbose=False)
    np.testing.assert_allclose(res2.psnr, ref.psnr, atol=1e-3)
    np.testing.assert_allclose(res2.ssim, ref.ssim, atol=1e-4)


def test_evaluator_device_metrics_matches(tmp_path, monkeypatch):
    """FLDRX_DEVICE_METRICS=1 (PSNR/SSIM on-chip, scalar fetch) must agree
    with the host metric chain."""
    from PIL import Image
    from fldrx.eval.evaluator import evaluate
    rng = np.random.RandomState(6)
    root = tmp_path / "xtest"
    d = root / "Type1" / "TEST01"
    d.mkdir(parents=True)
    base = rng.randint(0, 255, (64, 64, 3), np.uint8)
    for i in range(33):
        Image.fromarray(np.roll(base, i, axis=1)).save(d / f"{i:04d}.png")
    interp, cfg = _interp(S=1)
    cfg = cfg.replace(x_test_data_path=str(root))
    monkeypatch.setenv("FLDRX_DEVICE_METRICS", "0")
    ref = evaluate(interp, cfg, "X4K1000FPS", multiple=4, verbose=False)
    monkeypatch.setenv("FLDRX_DEVICE_METRICS", "1")
    res = evaluate(interp, cfg, "X4K1000FPS", multiple=4, verbose=False)
    assert res.n_samples == ref.n_samples == 3
    np.testing.assert_allclose(res.psnr, ref.psnr, atol=1e-3)
    np.testing.assert_allclose(res.ssim, ref.ssim, atol=1e-4)


def test_evaluator_planes_out_matches(tmp_path, monkeypatch):
    """The ACTUAL evaluate() loop with cfg.planes_out on packed-path
    geometry (≥768 px so can_use_packed accepts): metrics must equal the
    plain-output run bit-for-bit (host unpack is a pure layout op).
    Device metrics pinned off — they force plain layout (the u-plane host
    path is what this test exercises)."""
    from PIL import Image
    from fldrx.eval.evaluator import evaluate
    monkeypatch.setenv("FLDRX_DEVICE_METRICS", "0")
    rng = np.random.RandomState(4)
    root = tmp_path / "xtest"
    d = root / "Type1" / "TEST01"
    d.mkdir(parents=True)
    base = rng.randint(0, 255, (768, 768, 3), np.uint8)
    for i in range(33):
        Image.fromarray(np.roll(base, i, axis=1)).save(d / f"{i:04d}.png")
    cfg = papermodel().replace(S_tst=1, compute_dtype="float32",
                               fast_warp=True, packed_synth=True,
                               planes_out=False,
                               x_test_data_path=str(root))
    params = init_params(jax.random.PRNGKey(0), cfg)
    ref = evaluate(Interpolator(params, cfg), cfg, "X4K1000FPS",
                   multiple=2, verbose=False)
    cfgp = cfg.replace(planes_out=True)
    res = evaluate(Interpolator(params, cfgp), cfgp, "X4K1000FPS",
                   multiple=2, verbose=False)
    assert res.n_samples == ref.n_samples == 1
    np.testing.assert_allclose(res.psnr, ref.psnr, atol=0)
    np.testing.assert_allclose(res.ssim, ref.ssim, atol=0)


def test_evaluator_multichip_t_parallel(tmp_path):
    """The ACTUAL evaluate() loop driven through the multi-chip t-parallel
    bridge on the 8-device CPU mesh (VERDICT r2 item 4): ×8 protocol's 7
    t-values shard over 8 devices (padded), results match the single-chip
    evaluator bitwise-ish."""
    import jax
    from PIL import Image
    from fldrx.eval.evaluator import evaluate
    from fldrx.parallel.spatial import build_parallel_eval
    rng = np.random.RandomState(1)
    root = tmp_path / "xtest"
    d = root / "Type1" / "TEST01"
    d.mkdir(parents=True)
    for i in range(33):
        Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(
            d / f"{i:04d}.png")
    interp, cfg = _interp(S=1)
    cfg = cfg.replace(x_test_data_path=str(root))
    ref = evaluate(interp, cfg, "X4K1000FPS", multiple=8, verbose=False)
    pe = build_parallel_eval(interp.params, cfg, mode="t",
                             devices=jax.devices()[:8])
    res = evaluate(interp, cfg, "X4K1000FPS", multiple=8, verbose=False,
                   parallel_eval=pe)
    assert res.n_samples == ref.n_samples == 7
    np.testing.assert_allclose(res.psnr, ref.psnr, atol=1e-3)
    np.testing.assert_allclose(res.ssim, ref.ssim, atol=1e-4)


def test_cli_config_building():
    import main as cli
    args = cli.parse_args(["--papermodel", "--test5scales", "--exp_num", "3"])
    cfg = cli.build_config(args)
    assert cfg.S_tst == 5
    assert cfg.scales == (8, 16, 32, 64, 128, 256)
    assert cfg.exp_num == 3
    assert cfg.phase == "test"
    assert cfg.dctvfi_nf == 16

    args = cli.parse_args(["--phase", "train", "--papermodel",
                           "--batch_size", "4"])
    cfg = cli.build_config(args)
    assert cfg.phase == "train"
    assert cfg.batch_size == 4
    assert cfg.S_trn == 3

    # unknown reference flags are tolerated
    args = cli.parse_args(["--papermodel", "--pin_memory_test", "--gpu", "0"])
    assert args.papermodel


def test_metrics_match_skimage_formulas():
    rng = np.random.RandomState(0)
    a = rng.rand(32, 32, 3) * 255
    b = np.clip(a + rng.randn(32, 32, 3) * 5, 0, 255)
    p = metrics.psnr(a, b)
    mse = np.mean((a - b) ** 2)
    np.testing.assert_allclose(p, 10 * np.log10(255 ** 2 / mse), rtol=1e-9)
    s = metrics.ssim_bgr(a, b)
    assert 0.5 < s <= 1.0
    assert metrics.ssim_bgr(a, a) > 0.999


def test_multi_t_matches_single_t():
    """×N mode (flow computed once) must match the single-shot forward.

    Tolerance: the multi-t path scales the PRECOMPUTED full-res flow by t
    (t commutes through the linear resize exactly; fp rounding differs in
    the last bits), the single-shot path resizes the t-scaled low-res flow
    — a few-ulp coordinate drift, not a semantic difference."""
    interp, _ = _interp(S=1)
    rng = np.random.RandomState(7)
    frames = (rng.rand(1, 2, 64, 96, 3) * 2 - 1).astype(np.float32)
    t_values = [0.25, 0.5, 0.75]
    multi = interp.interpolate_multi_np(frames, t_values)
    for k, tv in enumerate(t_values):
        single = interp.interpolate_np(frames, [[tv]])
        np.testing.assert_allclose(multi[k], single, atol=1e-4)


def test_multi_t_with_padding():
    interp, _ = _interp(S=1)
    rng = np.random.RandomState(8)
    frames = (rng.rand(1, 2, 50, 70, 3) * 2 - 1).astype(np.float32)
    multi = interp.interpolate_multi_np(frames, [0.5])
    assert multi.shape == (1, 1, 50, 70, 3)
    single = interp.interpolate_np(frames, [[0.5]])
    np.testing.assert_allclose(multi[0], single, atol=1e-6)
