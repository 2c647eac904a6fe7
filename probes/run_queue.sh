#!/bin/bash
# TPU measurement queue, time-critical order (driver runs bench.py at round
# end anyway, so probes that decide default flips come first).
#
# QUICK=1: bench-decision subset only (~40 min) — for a short relay window
# near round end: B1 re-baseline, then each env knob's bench delta, so the
# winners can be default-flipped before the driver's final bench.
cd /root/repo
L() { echo "=== $* — $(date)"; }
git rev-parse --short HEAD

L "sanity"
timeout 180 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,8)))))" || exit 1

if [ -n "$QUICK" ]; then
  L "Q1. bench defaults (re-baseline)"
  timeout 2400 python bench.py
  L "Q2. bench group"
  FLDRX_GWIN=group timeout 2400 python bench.py
  L "Q3. bench group+pipe+zkernel"
  FLDRX_PIPE_BF16=1 FLDRX_GWIN=group FLDRX_ZKERNEL=1 timeout 2400 python bench.py
  L "Q4. bench planes_out+flow_fused+u8 (on top of whatever won above: rerun manually)"
  FLDRX_BENCH_PLANES_OUT=1 FLDRX_FLOW_FUSED=1 FLDRX_BENCH_U8=1 timeout 2400 python bench.py
  L "Q5. bench t_fuse+tcoords+zkernel+blend24 (the cross-t composition)"
  FLDRX_BENCH_T_FUSE=1 FLDRX_TCOORDS=1 FLDRX_ZKERNEL=1 FLDRX_BLEND24=1 timeout 2400 python bench.py
  L "Q6. bench resize stencil (pyramid/flow-upsample constant-tap path)"
  FLDRX_RESIZE_STENCIL=1 timeout 2400 python bench.py
  L "quick queue complete"
  exit 0
fi

L "A1. gwprobe tile (baseline)"
FLDRX_GWIN=tile  timeout 1200 python -u probes/gwprobe.py
L "A2. gwprobe group"
FLDRX_GWIN=group timeout 1200 python -u probes/gwprobe.py
L "A3. spprobe baseline"
timeout 1200 python -u probes/spprobe.py
L "A4. spprobe PIPE_BF16"
FLDRX_PIPE_BF16=1 timeout 1200 python -u probes/spprobe.py
L "A5. gwprobe PIPE_BF16 (+group)"
FLDRX_PIPE_BF16=1 timeout 1200 python -u probes/gwprobe.py
FLDRX_PIPE_BF16=1 FLDRX_GWIN=group timeout 1200 python -u probes/gwprobe.py

L "B1. bench defaults (re-baseline after always-on r3 changes)"
timeout 2400 python bench.py
L "B2. bench group"
FLDRX_GWIN=group timeout 2400 python bench.py
L "B3. bench group+pipe"
FLDRX_PIPE_BF16=1 FLDRX_GWIN=group timeout 2400 python bench.py

L "A6. zprobe (in-kernel z reduction; composes with group/pipe)"
timeout 1200 python -u probes/zprobe.py
FLDRX_GWIN=group timeout 1200 python -u probes/zprobe.py

L "A7. fused flow feature warps, now PLAIN-layout (r3 remeasure: u-plane
   form lost 156->279 ms to interleaves; plain strip output removes them)"
FLDRX_FLOW_FUSED=1 timeout 2400 python bench.py

L "A8. bench BLEND24 (24-minor softmax — no (4,6) narrow-minor
   intermediate; ~ulp vs jax.nn.softmax, tests pin it)"
FLDRX_BLEND24=1 timeout 2400 python bench.py

L "B4. bench t_fuse (cross-t fused launches, NOW with kernel vals sharing:
   2 vals arrays for 2T problems — r3 measured 4.23 vs 4.28 WITHOUT sharing;
   the ~450 MB less pinning may flip it)"
FLDRX_BENCH_T_FUSE=1 timeout 2400 python bench.py
L "B5. bench t_fuse + zkernel"
FLDRX_BENCH_T_FUSE=1 FLDRX_ZKERNEL=1 timeout 2400 python bench.py

L "B5b. bench t_fuse + in-kernel per-t coords (FLDRX_TCOORDS: the 2T splat
   problems ship 2 base flow fields + t scalars instead of 2T coord
   arrays — another ~300 MB less pinned at chunk-3/4K on top of vals
   sharing; coords equal up to 1 ulp of FMA freedom)"
FLDRX_BENCH_T_FUSE=1 FLDRX_TCOORDS=1 timeout 2400 python bench.py
L "B5c. bench t_fuse + tcoords + zkernel"
FLDRX_BENCH_T_FUSE=1 FLDRX_TCOORDS=1 FLDRX_ZKERNEL=1 timeout 2400 python bench.py

L "B6. bench planes_out (host-side final unpack; ~12 ms/t device saving,
   bit-equal layout — adopt as evaluator/bench default if it wins)"
FLDRX_BENCH_PLANES_OUT=1 timeout 2400 python bench.py

L "B7. bench u8 ingestion (4x less H2D; device-side normalize)"
FLDRX_BENCH_U8=1 timeout 2400 python bench.py

L "B8. bench resize stencil (integer-factor resizes as <=4 strided-slice
   VPU multiply-adds instead of dense C/128-lane-util matmuls — pyramid
   ~58 ms/pair + flow upsamples; <=1 ulp, tests pin it)"
FLDRX_RESIZE_STENCIL=1 timeout 2400 python bench.py

L "C1. group K=16"
FLDRX_GWIN=group FLDRX_GK=16 timeout 1200 python -u probes/gwprobe.py
L "C2. winy 256 (DMA-row theory)"
FLDRX_WINY_G=256 timeout 1200 python -u probes/wprobe.py
L "C3. GTILE=64 tile/group"
FLDRX_GTILE=64 timeout 1800 python -u probes/wprobe.py
FLDRX_GTILE=64 FLDRX_GWIN=group timeout 1800 python -u probes/gwprobe.py
L "C3b. splat strip reach 256 (OYR_S=128: +32 px vertical spill margin;
   MXU-free — the [STRIPH, N] one-hot K-dim pads to 256 anyway; only the
   extra hat rows + VMEM cost anything. Adopt if the bench delta is ~0)"
FLDRX_OYR_S=128 timeout 2400 python bench.py

L "C4. UNet conv BH sweep"
for bh in 8 16 32 64; do
  FLDRX_CONV_BH=$bh timeout 1800 python -u probes/convprobe.py
done

L "D. goldenclip quality gate for PIPE_BF16 (only meaningful if A4/A5 won)"
FLDRX_PIPE_BF16=1 timeout 3600 python -u -m fldrx.tools.goldenclip_report || true

# Composed-candidate benches: the per-knob deltas above don't compose
# linearly (HBM pinning, scheduler pressure) — measure the three most
# likely adoption bundles directly so a default flip can cite a composed
# number even if the relay window closes right after.
L "E1. bench composed independent winners (group+zkernel+flow_fused+planes_out+u8+stencil)"
FLDRX_GWIN=group FLDRX_ZKERNEL=1 FLDRX_FLOW_FUSED=1 \
  FLDRX_BENCH_PLANES_OUT=1 FLDRX_BENCH_U8=1 FLDRX_RESIZE_STENCIL=1 \
  timeout 2400 python bench.py
L "E2. bench E1 + pipe_bf16 + blend24"
FLDRX_GWIN=group FLDRX_ZKERNEL=1 FLDRX_FLOW_FUSED=1 \
  FLDRX_BENCH_PLANES_OUT=1 FLDRX_BENCH_U8=1 FLDRX_RESIZE_STENCIL=1 \
  FLDRX_PIPE_BF16=1 FLDRX_BLEND24=1 timeout 2400 python bench.py
L "E3. bench E1 + t_fuse + tcoords + blend24"
FLDRX_GWIN=group FLDRX_ZKERNEL=1 FLDRX_FLOW_FUSED=1 \
  FLDRX_BENCH_PLANES_OUT=1 FLDRX_BENCH_U8=1 FLDRX_RESIZE_STENCIL=1 \
  FLDRX_BENCH_T_FUSE=1 FLDRX_TCOORDS=1 FLDRX_BLEND24=1 \
  timeout 2400 python bench.py

L "F. perfprobe2 per-stage refresh (PROFILE.md table source)"
timeout 2400 python -u -m fldrx.tools.perfprobe2 || true

L "queue complete"
