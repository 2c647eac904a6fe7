"""PARITY.md evidence generator.

Three measurements (run on TPU unless --cpu):
  1. strict-path (fast_warp=False, f32) vs torch-CPU oracle at test5scales
     geometry (768x1280, S_tst=5, real converted checkpoint).
  2. fast-path (Pallas warp engine + low-res flowback) vs strict path at 4K:
     PSNR of each against the other on naturalistic moving content.
  3. bf16 compute (UNet + flow path) vs f32, same content.

Writes PARITY_gen.md (PARITY.md is hand-maintained and carries golden-clip
tables + deviation-class notes this tool does not regenerate — pass
--write-parity to overwrite it anyway). Usage:
python -m fldrx.tools.parity_report [--skip-oracle] [--write-parity]
"""
import sys
import time

import numpy as np


def natural_frames(H, W, shift=18):
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)

    def tex(px, py):
        return (np.sin((xx + px) / 17) * np.cos((yy + py) / 23)
                + 0.5 * np.sin((xx + px) / 5.3) * np.sin((yy + py) / 7.1)
                + 0.3 * np.sin((xx - px) / 61) * np.cos((yy + py) / 47))

    f0 = np.stack([tex(0, 0), tex(9, 4), tex(3, 11)], -1)
    f1 = np.stack([tex(shift, shift * 0.6), tex(9 + shift, 4 + shift * 0.6),
                   tex(3 + shift, 11 + shift * 0.6)], -1)
    return np.stack([f0, f1], 0)[None].astype(np.float32) * 0.6


def psnr_between(a, b):
    mse = np.mean((np.asarray(a, np.float64) / 2 - np.asarray(b, np.float64) / 2) ** 2)
    return -10 * np.log10(max(mse, 1e-12))


def main():
    import jax
    import jax.numpy as jnp
    from fldrx.api import prepare_model, DEFAULT_NPZ
    from fldrx.config import papermodel_test5
    from fldrx.eval.pipeline import Interpolator

    skip_oracle = "--skip-oracle" in sys.argv
    lines = ["# PARITY — measured parity evidence (round 2)", "",
             "Protocol: naturalistic band-limited moving content (camera-pan"
             " style motion, ~18 px), real converted checkpoint"
             " (checkpoints/fldrnet_best.npz), papermodel test5scales.",
             ""]

    cfg32 = papermodel_test5().replace(compute_dtype="float32",
                                       fast_warp=False)
    interp, cfg32, _ = prepare_model(DEFAULT_NPZ, cfg32)
    params = interp.params

    # --- 1. oracle comparison at test5scales geometry -----------------
    if not skip_oracle:
        import torch
        sys.path.insert(0, "tests")
        from reference_oracle import oracle_forward_test
        from fldrx.tools.convert_ckpt import load_reference_state_dict
        from fldrx.eval.pipeline import build_pyramid
        from fldrx.model.fldrnet import forward_test

        H, W = 768, 1280
        frames = natural_frames(H, W, shift=10)
        sd, _ = load_reference_state_dict(
            "/root/reference/checkpoint_dir/fLDRnet_X4K1000FPS_exp1/"
            "fLDRnet_X4K1000FPS_exp1_best_PSNR.pt")
        sd_t = {k: torch.from_numpy(v) for k, v in sd.items()}
        t = np.full((1, 1), 0.375, np.float32)
        pyr_j = build_pyramid(jnp.asarray(frames), cfg32, cfg32.S_tst + 1)
        # oracle layout: numpy [B, 3, 2, H, W]
        pyr_t = [np.transpose(np.asarray(p), (0, 4, 1, 2, 3)) for p in pyr_j]
        t0 = time.time()
        ref = oracle_forward_test(sd_t, pyr_t, t, cfg32.S_tst)
        print(f"oracle forward: {time.time()-t0:.0f}s")
        got = forward_test(params, cfg32, pyr_j, jnp.asarray(t))
        got_nchw = np.moveaxis(np.asarray(got), -1, 1)
        d = np.abs(got_nchw - np.asarray(ref))
        p = psnr_between(got_nchw, np.asarray(ref))
        lines += [
            "## 1. Strict path vs torch-CPU oracle (768x1280, S_tst=5, t=0.375)",
            "",
            f"- max abs diff: **{d.max():.2e}**, mean abs diff: {d.mean():.2e}",
            f"- PSNR(jax strict, oracle): **{p:.2f} dB** "
            "(f32-vs-f64 PCA + conv accumulation order)",
            "",
        ]
        print(f"oracle: max {d.max():.3e} mean {d.mean():.3e} psnr {p:.2f}")

    # --- 2/3. fast path + bf16 at 4K ----------------------------------
    H, W = 2160, 4096
    frames = jnp.asarray(natural_frames(H, W))
    tv = [[0.375]]

    def run(cfg):
        it = Interpolator(params, cfg)
        flow, padded, extras = it.precompute_flow(frames)
        return np.asarray(it.synthesize_at(flow, padded, tv, (H, W), extras))

    out_strict = run(papermodel_test5().replace(compute_dtype="float32",
                                                fast_warp=False))
    out_fast32 = run(papermodel_test5().replace(compute_dtype="float32",
                                                fast_warp=True))
    out_fast16 = run(papermodel_test5().replace(compute_dtype="bfloat16",
                                                fast_warp=True))
    p_fast = psnr_between(out_fast32, out_strict)
    p_bf16 = psnr_between(out_fast16, out_strict)
    p_b_vs_f = psnr_between(out_fast16, out_fast32)
    lines += [
        "## 2. Fast warp engine (Pallas kernels + low-res flowback) vs "
        "strict XLA path (4K, t=0.375)",
        "",
        f"- PSNR(fast-f32, strict-f32): **{p_fast:.2f} dB** — the bench/"
        "deploy configuration's warp-engine deviation",
        "",
        "## 3. bf16 compute (s2d UNet + flow path) on top of the fast engine",
        "",
        f"- PSNR(fast-bf16, strict-f32): **{p_bf16:.2f} dB** (deployed bench "
        "config vs strict parity path)",
        f"- PSNR(fast-bf16, fast-f32): {p_b_vs_f:.2f} dB (bf16-only effect)",
        "",
        "Interpretation: PSNR here is computed between two model OUTPUTS "
        "(range [-1,1] mapped to [0,1]). A deviation PSNR of X dB between "
        "configurations bounds the benchmark PSNR-vs-GT change at roughly "
        "10^(-X/10) in MSE terms — e.g. 50 dB deviation shifts a ~30 dB "
        "benchmark score by < 0.05 dB.",
        "",
    ]
    print(f"fast32 vs strict: {p_fast:.2f} dB; bf16 vs strict: {p_bf16:.2f}")

    out = "PARITY.md" if "--write-parity" in sys.argv else "PARITY_gen.md"
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"{out} written")


if __name__ == "__main__":
    main()
