"""Device quality gate for the flat-wide resize form (FLDRX_WIDE_RESIZE).

The wide form is bitwise-equal to the naive einsum pair on CPU
(tests/test_resize.py); this gate checks the same holds through the full
deploy-config model ON THE TPU, where layout changes could in principle
reassociate the HIGHEST-precision K-loop. Renders the golden clip at 4K,
runs the deploy interpolator with the knob off and on in subprocesses
(the flag is read at trace time), and reports per-t PSNR + max |Δ|.

    python -u probes/goldengate.py [H W]
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHILD = r"""
import json, os, sys
import numpy as np
sys.path.insert(0, %(repo)r)
from fldrx.api import DEFAULT_NPZ, prepare_model
from fldrx.config import papermodel_test5
H, W = %(h)d, %(w)d
cfg = papermodel_test5().replace(compute_dtype="bfloat16",
                                 flow_dtype="float32", t_chunk=3)
interp, cfg, _ = prepare_model(DEFAULT_NPZ, cfg)
from fldrx.eval.goldenclip import golden_pair
frames, ts, gts = golden_pair(H, W)
out = interp.interpolate_multi_np(frames, list(ts))
np.save(%(out)r, out.astype(np.float32))
psnrs = [float(-10 * np.log10(np.mean((out[i, 0] - gts[i]) ** 2) / 4 + 1e-12))
         for i in range(len(ts))]
print(json.dumps({"psnr": psnrs}))
"""


def main():
    H = int(sys.argv[1]) if len(sys.argv) > 1 else 2160
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    outs = {}
    for wide in ("0", "1"):
        env = dict(os.environ, FLDRX_WIDE_RESIZE=wide)
        out = f"/tmp/goldengate_wide{wide}.npy"
        code = CHILD % {"repo": REPO, "h": H, "w": W, "out": out}
        r = subprocess.run([sys.executable, "-u", "-c", code], env=env,
                           capture_output=True, text=True, timeout=3600)
        tail = r.stdout.strip().splitlines()
        print(f"wide={wide}: {tail[-1] if tail else ''} (rc={r.returncode})",
              flush=True)
        if r.returncode:
            print(r.stderr[-2000:], flush=True)
            sys.exit(1)
        outs[wide] = out
    import numpy as np
    a = np.load(outs["0"])
    b = np.load(outs["1"])
    d = float(np.abs(a - b).max())
    print(f"max |wide-naive| over golden clip: {d:.3e} "
          f"({'BITWISE' if d == 0.0 else 'nonzero — inspect'})", flush=True)


if __name__ == "__main__":
    main()
