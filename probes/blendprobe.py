"""Blend-stage decomposition probe (VERDICT r5 item 3: blend measured
14 ms/t vs a 1.2 ms HBM floor — find where the time goes before building
anything; two algebra rewrites already measured NEGATIVE in r4).

    python -u probes/blendprobe.py          # timings
    python -u probes/blendprobe.py --hlo    # dump optimized TPU HLO stats

Times blend_planes_24 STANDALONE at 4K deploy shapes (B=1, Hp4=576,
Wp4=1024, W=4096) plus decomposed variants:
  full      — the production blend
  softmax   — logits → p24 only (no candidate reads)
  wsum      — candidate weighted sum with PRECOMPUTED p24 input
  bf16cand  — full blend with candidates cast to bf16 at the multiply
              (halves the 679 MB of candidate reads; NOT production — a
              quality gate would be needed before adopting)
Standalone numbers carry the ~3-5 ms relay dispatch; compare BETWEEN rows,
not against the in-context 14 ms.
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp


def main():
    from fldrx.model.fldrnet import blend_planes_24

    B = 1
    Hp4 = int(os.environ.get("FLDRX_BLENDPROBE_HP4", "576"))
    Wp4 = int(os.environ.get("FLDRX_BLENDPROBE_WP4", "1024"))
    W = Wp4 * 4
    rng = np.random.RandomState(0)
    out = jnp.asarray(rng.randn(B, Hp4, Wp4, 96).astype(np.float32))
    cands = tuple(
        jnp.asarray(rng.rand(B, 4, Hp4, W * 3).astype(np.float32) * 2 - 1)
        for _ in range(6))
    tb5 = jnp.full((B, 1, 1, 1, 1), 0.375, jnp.float32)
    Tp = jnp.asarray(1.0, jnp.float32)

    def softmax24(out):
        G24 = jnp.asarray(np.kron(np.eye(4, dtype=np.float32),
                                  np.ones((6, 6), np.float32)))
        ps = []
        for u in range(4):
            xu = out[..., u * 24:u * 24 + 24] / Tp
            e = jnp.exp(xu - jnp.max(xu, axis=-1, keepdims=True))
            denom = jnp.einsum("bhwq,qr->bhwr", e, G24,
                               precision=jax.lax.Precision.HIGHEST)
            ps.append(e / denom)
        return jnp.concatenate(ps, -1)                    # [B,Hp4,Wp4,96]

    def wsum(p96, cands):
        outs = []
        for u in range(4):
            p6 = p96[..., u * 24:u * 24 + 24].reshape(B, Hp4, Wp4, 4, 6)
            acc = None
            for ci in range(6):
                c = cands[ci][:, u].reshape(B, Hp4, Wp4, 4, 3)
                term = p6[..., ci:ci + 1] * c
                acc = term if acc is None else acc + term
            outs.append(acc.reshape(B, Hp4, W * 3))
        return jnp.stack(outs, 1)

    def bf16cand(out, cands, tb5):
        return blend_planes_24(out, tuple(c.astype(jnp.bfloat16)
                                          for c in cands), tb5, Tp)

    def full96(o, c, t):
        # RESOLVED r5 (R5C-0/1): the wide-minor form measured 34.4 vs 32.9
        # standalone and 4.665 vs 4.708 in context — deleted from
        # blend_planes_24 (this row now duplicates `full`; kept as the
        # record's venue). env read at TRACE time (now a no-op).
        os.environ["FLDRX_BLEND96"] = "1"
        try:
            return blend_planes_24(o, c, t, Tp)
        finally:
            os.environ["FLDRX_BLEND96"] = "0"

    jfull = jax.jit(lambda o, c, t: blend_planes_24(o, c, t, Tp))
    jfull96 = jax.jit(full96)
    jsoftmax = jax.jit(softmax24)
    jbf16 = jax.jit(bf16cand)
    jwsum = jax.jit(wsum)
    p96 = jsoftmax(out)
    variants = {
        "full": lambda: jfull(out, cands, tb5),
        "full96": lambda: jfull96(out, cands, tb5),
        "softmax": lambda: jsoftmax(out),
        "bf16cand": lambda: jbf16(out, cands, tb5),
        "wsum": lambda: jwsum(p96, cands),
    }

    if "--hlo" in sys.argv:
        fn = jax.jit(lambda o, c, t: blend_planes_24(o, c, t, Tp))
        txt = fn.lower(out, cands, tb5).compile().as_text()
        import collections
        ops = collections.Counter()
        for line in txt.splitlines():
            line = line.strip()
            for op in ("fusion", "copy", "transpose", "convert", "reshape",
                       "bitcast"):
                if line.startswith(f"%{op}") or f" = " in line and f" {op}(" in line:
                    ops[op] += 1
        print("optimized HLO op counts:", dict(ops))
        print(f"HLO chars: {len(txt)}")
        with open("/tmp/blend_hlo.txt", "w") as f:
            f.write(txt)
        print("full HLO → /tmp/blend_hlo.txt")
        return

    for name, f in variants.items():
        r = f()
        float(jnp.sum(r))                     # compile + fence
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            r = f()
            float(jnp.sum(r))
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"{name:>9s}: {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
