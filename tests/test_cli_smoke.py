"""End-to-end CLI smoke: run main.py as a subprocess on a generated
mini X-Test-layout dataset, so the first day with real data is
measurement, not debugging (VERDICT r3 item 9; matches the reference
headline command, /root/reference/README.md:62).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "checkpoints", "fldrnet_best.npz")


def _write_xtest_layout(root, H=96, W=128, n_scenes=1):
    """33-frame scenes in the X-Test layout, rendered from the golden-clip
    scene model (smooth analytic motion) so the model's PSNR is meaningful."""
    sys.path.insert(0, REPO)
    from PIL import Image
    from fldrx.eval.goldenclip import render_golden
    for s in range(n_scenes):
        d = os.path.join(root, "Type1", f"TEST{s:02d}")
        os.makedirs(d)
        for i in range(33):
            img = render_golden(H, W, i / 32.0)
            u8 = np.clip((img + 1) * 127.5, 0, 255).astype(np.uint8)
            Image.fromarray(u8).save(os.path.join(d, f"{i:04d}.png"))


@pytest.mark.skipif(not os.path.exists(CKPT), reason="checkpoint missing")
def test_cli_eval_sweep_end_to_end(tmp_path):
    data = tmp_path / "xtest"
    data.mkdir()
    _write_xtest_layout(str(data))
    log_dir = tmp_path / "logs"

    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1",
               PYTHONPATH=REPO)
    cmd = [sys.executable, os.path.join(REPO, "main.py"),
           "--papermodel", "--test3scales", "--testsets", "X4K1000FPS",
           "--x_test_data_path", str(data), "--stoptestat", "8",
           "--save_images", "--testgetflowout",
           "--log_dir", str(log_dir), "--text_dir", str(tmp_path / "txt"),
           "--exp_num", "9"]
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         timeout=1500)
    assert out.returncode == 0, out.stderr[-4000:]
    assert "Final 4k frames PSNR X4K1000FPS" in out.stdout, out.stdout[-2000:]
    # PSNR parsed from the summary line must be a sane number
    line = [l for l in out.stdout.splitlines()
            if l.startswith("Final 4k frames PSNR")][0]
    psnr = float(line.split(":")[1].split()[0])
    assert 15.0 < psnr < 100.0, line
    # prediction + flow dumps landed
    preds = list((log_dir / "X4K1000FPS").rglob("*.png"))
    assert any("Test_flow_preds" in str(p) for p in preds), preds
    assert any(p.name.startswith("flow") for p in preds)


@pytest.mark.skipif(not os.path.exists(CKPT), reason="checkpoint missing")
def test_cli_test_custom_writes_predictions_only(tmp_path):
    """test_custom phase (reference main.py:891): predictions written,
    no metrics computed, exits cleanly."""
    data = tmp_path / "xtest"
    data.mkdir()
    _write_xtest_layout(str(data))
    log_dir = tmp_path / "logs"
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1",
               PYTHONPATH=REPO)
    cmd = [sys.executable, os.path.join(REPO, "main.py"),
           "--papermodel", "--test3scales", "--phase", "test_custom",
           "--testsets", "X4K1000FPS",
           "--x_test_data_path", str(data), "--stoptestat", "3",
           "--log_dir", str(log_dir), "--text_dir", str(tmp_path / "txt"),
           "--exp_num", "9"]
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         timeout=1500)
    assert out.returncode == 0, out.stderr[-4000:]
    preds = [p for p in (log_dir / "X4K1000FPS").rglob("*.png")]
    assert preds, out.stdout[-2000:]
