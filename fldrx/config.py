"""Configuration for fldrx — the TPU-native fLDRnet rebuild.

The reference drives everything through ~110 argparse flags mutated in layers
(/root/reference/main.py:25-215 → useful.py:163-190 papermodel preset →
main.py:243-269 testNscales presets → main.py:270-273 derived values). Here the
same surface is a single frozen dataclass with preset constructors; only the
flags that change shipped behaviour are kept (the reference's dead/experimental
flags — --noPCA, --interpBackwForw, weightMat/maxmin_vec — are deliberately not
ported, see SURVEY.md §7).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple


@dataclass(frozen=True)
class FLDRConfig:
    """Model + pipeline configuration (reference: main.py argparse + presets)."""

    # --- core model geometry (main.py:122-125, 270-273) ---
    img_ch: int = 3
    wiS: int = 8                      # PCA block size (DCTParams.wiS, pca_comp.py:301)
    scales: Tuple[int, ...] = (8, 16, 32, 64)
    fractions: Tuple[int, ...] = (4, 16, 64, 256)
    S_trn: int = 3                    # lowest pyramid level used in training
    S_tst: int = 3                    # lowest pyramid level used at test

    # --- papermodel switches that survive into the shipped forward pass ---
    # (useful.py:163-190; switches that only gate dead branches are dropped)
    mean_vector_norm: bool = True     # divide PCA comps by mean |comp| vector
    ref_feat_extrac: bool = True      # rec_ctx_ds residual feature conv
    # ExacOneEV (papermodel): the scale-8 EV/Mean/meanVec are shared across
    # every pyramid level (fLDRnet.py:136,146). False consumes the per-scale
    # EV16/32/64 params the checkpoint carries (pick_pca non-simpleEVs
    # branch, fLDRnet.py:225-278), falling back to scale-8 beyond scale 64.
    exac_one_ev: bool = True
    sminterp: bool = True             # softmax 6-way candidate blend w/ T_param
    impmasksoftsplat: bool = True     # learned z importance metric for splatting
    align_corners: bool = False       # align_cornerse flag: always False in shipped cfg

    # --- refine UNet (fLDRnet.py:584-617) ---
    unet_nf: int = 16                 # noResidAddup sets nf=16 (fLDRnet.py:609)
    unet_in: int = 26                 # sminterp input maps (fLDRnet.py:599)
    unet_out: int = 6                 # 7+2-3 via sminterp/sminterpInpIm/noResidAddup

    # --- training hyperparameters (main.py:181-205, useful.py:175) ---
    epochs: int = 200
    init_lr: float = 1e-4
    evlr: float = 0.1                 # EV/Mean param-group LR multiplier (main.py:460)
    lr_milestones: Tuple[int, ...] = (70, 120, 170)
    lr_dec_fac: float = 0.25
    batch_size: int = 8
    weight_decay: float = 0.0
    loss_type: str = "L1"             # L1 | MSE | L1_Charbonnier_loss
    rec_lambda: float = 1.0
    smoothness: float = 0.5           # ownsmooth weight (main.py:165)
    warp_alpha: float = 0.05          # forwendflowloss weight (useful.py:181)
    patch_size: int = 512
    validation_patch_size: int = 512
    test_patch_size: int = -1
    t_optimization: bool = False      # freeze-all-but-T_param stage (main.py:517-524)
    no_ev_optimization: bool = False
    # optional loss switches (off in the papermodel preset, useful.py:163-190)
    warping_loss: bool = False        # epoch-annealed backward-warp photometric
                                      # loss (main.py:613-616)
    orth_loss: bool = False           # EV orthogonality loss, added only when
                                      # >= 0.1 (main.py:624-651)
    # train-loop observability (main.py:679-690)
    save_images: bool = False         # dump pyramid grids every freq_display it
    freq_display: int = 100
    use_orbax: bool = False           # async Orbax checkpointing instead of
                                      # the synchronous npz SaveManager

    # --- eval / data ---
    multiple: int = 8
    # t-values per chunked multi-t synthesis program (evaluator/bench/API):
    # one jitted program synthesizes t_chunk frames per launch, sharing the
    # pair's flow. r2 sweep on v5e 4K: 1→2.53, 2→2.61, 3→2.64, 4→2.50 fps
    # (memory pressure). Re-swept r4 after planes_out/u8/blend24 freed HBM:
    # 2→4.633, 3→4.653, 4→4.698 — chunk 4 now wins (7 = 4+3 per pair).
    t_chunk: int = 4
    # return packed-path synthesis in u-plane form and unpack on the HOST
    # (the evaluator fetches frames anyway; a numpy memcpy on the metric
    # worker threads replaces ~12 ms/t of device interleave DMAs — pure
    # layout, bit-equal values). TPU-measured r4: 4.598 vs 4.577 fps —
    # adopted as the default. (A cross-t launch-fusion knob `t_fuse` was
    # measured neutral twice — r3 4.23 vs 4.28, r4 4.577 vs 4.577 — and
    # removed.)
    planes_out: bool = True
    # PCA min-max reduction scope: False = batch-wide (the reference's
    # pca_comp.py:521-526 semantics — required for train parity, where the
    # reference runs batch 8). True = per batch item; bitwise-identical at
    # B=1 and exactly what reference batch=1 EVAL produces per pair — the
    # correct setting when several independent frame pairs are batched
    # through one eval program (FLDRX_BENCH_PAIRS / pair-batched eval).
    per_item_minmax: bool = False
    padding: str = "reflect"          # pcanet → reflect (main.py:273)
    dataset: str = "X4K1000FPS"
    testsets: Tuple[str, ...] = ("Inter4K-S", "Inter4K-L", "X4K1000FPS", "Xiph-4K")
    phase: str = "test"

    # --- numerics policy (TPU-specific; reference computes PCA in f64) ---
    # f64 has no native TPU support; PCA transform runs in f32 by default with a
    # documented tolerance (SURVEY.md §7 hard-part 3).
    compute_dtype: str = "float32"    # bfloat16 for speed path, float32 for parity
    # per-stage overrides ("" = follow compute_dtype): the flow/feature path
    # and the refine UNet have different quality sensitivities — the deploy
    # config mixes them to stay inside the 0.05 dB parity budget (PARITY.md)
    flow_dtype: str = ""
    unet_dtype: str = ""
    param_dtype: str = "float32"
    # Pallas warp engine (ops/fastwarp.py) on the inference path; the exact
    # XLA ops remain the strict-parity path and the fallback for
    # non-tile-divisible / small shapes.
    fast_warp: bool = True
    # Packed-domain synthesis (inference): every full-res tensor between the
    # warp kernels and the final output lives in a cell-major
    # space-to-depth-4 layout, so no narrow-channel 4K transpose is paid
    # until the single final depth-to-space. Numerically identical to the
    # plain fast path (layout permutation only). Requires fast_warp.
    packed_synth: bool = True
    # Training via the warp engine's custom VJPs: r2-measured 2.16 s/step vs
    # 3.75 s on the XLA ops; re-measured r4 after the kernel work at
    # 1.663 s/step = 4.81 samples/s (batch 8, 512², v5e —
    # probes/trainprobe.py; cold compile 2416 s, then persistent-cached).
    # Default ON — training is
    # exactly the long run where steady-state speed dominates; the first
    # compile takes tens of minutes through the remote TPU compiler but is
    # cached persistently (~/.cache/fldrx/xla) across processes. Set False
    # for one-off smoke runs on a cold cache.
    fast_warp_train: bool = True

    # --- paths ---
    checkpoint_dir: str = "./checkpoint_dir"
    text_dir: str = "./text_dir"
    log_dir: str = "./log_dir"
    exp_num: int = 1
    net_type: str = "fLDRnet"
    x_train_data_path: str = "./../../X-Train/train"
    x_val_data_path: str = "./../../X-Train/val"
    x_test_data_path: str = "X_test/test"
    vimeo_data_path: str = "./../../vimeo_triplet"
    xiph_data_path: str = "../XVFI-main/XiphDataset/netflix"
    inter4k_data_path: str = "inter4ktestset/"

    # ------------------------------------------------------------------
    @property
    def dctvfi_nf(self) -> int:
        # main.py:272 — number of PCA components kept per image channel
        return self.scales[0] ** 2 // self.fractions[0]

    @property
    def nf(self) -> int:
        # DCTVFInet.nf = dctvfi_nf * img_ch (fLDRnet.py:308)
        return self.dctvfi_nf * self.img_ch

    @property
    def div_pad(self) -> int:
        # main.py:842 — test frames are padded to this divisibility
        s = self.S_tst if self.phase == "test" else self.S_trn
        return (2 ** s) * self.wiS

    @property
    def model_dir(self) -> str:
        return f"{self.net_type}_X4K1000FPS_exp{self.exp_num}"

    def replace(self, **kw) -> "FLDRConfig":
        return dataclasses.replace(self, **kw)


def papermodel(**overrides) -> FLDRConfig:
    """The --papermodel preset (useful.py:163-190)."""
    cfg = FLDRConfig()
    return cfg.replace(**overrides) if overrides else cfg


_TEST_SCALE_PRESETS = {
    # --testNscales presets (main.py:243-269)
    3: ((8, 16, 32, 64), (4, 16, 64, 256)),
    4: ((8, 16, 32, 64, 128), (4, 16, 64, 256, 1024)),
    5: ((8, 16, 32, 64, 128, 256), (4, 16, 64, 256, 1024, 4096)),
    6: ((8, 16, 32, 64, 128, 256, 512), (4, 16, 64, 256, 1024, 4096, 16384)),
    7: ((8, 16, 32, 64, 128, 256, 512, 1024),
        (4, 16, 64, 256, 1024, 4096, 16384, 65536)),
}


def apply_test_scales(cfg: FLDRConfig, n: int) -> FLDRConfig:
    """Apply the --testNscales preset: deepen the pyramid for test only."""
    scales, fractions = _TEST_SCALE_PRESETS[n]
    return cfg.replace(scales=scales, fractions=fractions, S_tst=n, phase="test")


def papermodel_test5() -> FLDRConfig:
    """--papermodel --test5scales: the headline benchmark configuration
    (README.md:62, run_on_your_images.py:183-203)."""
    return apply_test_scales(papermodel(), 5)
