"""Golden-clip 4K quality report for PARITY.md: runs the full test5scales
×8 protocol on the deterministic golden scene (occlusion + large motion,
analytic GT) on the current backend for each deployable configuration.

Usage: python -u -m fldrx.tools.goldenclip_report   (real TPU; minutes of
compile per config on a cold cache)
"""

import numpy as np

from fldrx.api import prepare_model, DEFAULT_NPZ
from fldrx.config import papermodel_test5
from fldrx.eval.goldenclip import golden_pair, golden_psnrs
from fldrx.ops import metrics


def main():
    H, W = 2160, 4096
    frames, ts, gts = golden_pair(H, W, 8)
    avg = 0.5 * (frames[0, 0] + frames[0, 1])
    base = np.mean([metrics.psnr(metrics.denorm255(g),
                                 metrics.denorm255(avg)) for g in gts])
    print(f"naive frame-average baseline: {base:.3f} dB", flush=True)

    # f32 configs run t_chunk=1: three exact-synthesis graphs at once
    # exceed HBM
    configs = [
        ("strict (fast_warp=False, f32)",
         dict(fast_warp=False, compute_dtype="float32", t_chunk=1)),
        ("fast-f32 (Pallas engine)",
         dict(fast_warp=True, packed_synth=True,
              compute_dtype="float32", t_chunk=1)),
        ("fast mixed (f32 flow + bf16 UNet)",
         dict(fast_warp=True, packed_synth=True,
              compute_dtype="bfloat16", flow_dtype="float32")),
        ("fast-bf16 (all-bf16)",
         dict(fast_warp=True, packed_synth=True,
              compute_dtype="bfloat16")),
    ]
    # FLDRX_GOLDEN_CONFIGS=deploy: only the deploy (fast mixed) config —
    # the cheap per-measurement-batch quality gate; every adopted default
    # flip gets its −Δ dB logged next to its +Δ fps in queue_results.log
    import os
    sel = os.environ.get("FLDRX_GOLDEN_CONFIGS", "all")
    if sel == "deploy":
        configs = [configs[2]]
    for name, over in configs:
        cfg = papermodel_test5().replace(**over)
        interp, cfg, _ = prepare_model(DEFAULT_NPZ, cfg)
        ps, mean = golden_psnrs(interp, H, W, 8)
        print(f"{name}: mean {mean:.4f} dB  per-t "
              f"{np.round(ps, 3).tolist()}", flush=True)

    # FLDRX_GOLDEN_FAMILIES=1: also report the extra scene families
    # (affine/thin/flat — tests/test_goldenclip.py pins them on CPU) at 4K
    # for the strict and deploy configs, for PARITY.md
    if bool(int(os.environ.get("FLDRX_GOLDEN_FAMILIES", "0"))):
        from fldrx.eval.goldenclip import GOLDEN_FAMILIES
        for name, over in (configs[0], configs[2]):
            cfg = papermodel_test5().replace(**over)
            interp, cfg, _ = prepare_model(DEFAULT_NPZ, cfg)
            for fam in GOLDEN_FAMILIES[1:]:
                ps, mean = golden_psnrs(interp, H, W, 8, family=fam)
                print(f"{name} [{fam}]: mean {mean:.4f} dB  per-t "
                      f"{np.round(ps, 3).tolist()}", flush=True)


if __name__ == "__main__":
    main()
