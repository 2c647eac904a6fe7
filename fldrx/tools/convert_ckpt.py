"""Convert the reference PyTorch checkpoint to an fldrx .npz parameter file.

Source format: `save_manager` combined dict (reference utils.py:28-104,
main.py:755-770) — a torch .pt zip whose pickle references the reference's
`pca_comp.DCTParams` / `useful.MYPCA` classes; we stub those so no reference
code is imported. Key map documented in SURVEY.md §5.4.

Weight layout conversion: torch conv [O,I,kh,kw] → HWIO [kh,kw,I,O]; f64
scalars (T_param, z_alpha, EV/Mean/meanVec) → f32 (TPU has no native f64;
tolerance documented in SURVEY.md §7).

Usage:
    python -m fldrx.tools.convert_ckpt [src.pt] [dst.npz]
    python -m fldrx.tools.convert_ckpt --pwc [pwc-checkpoint.pt] [dst.npz]

The --pwc branch converts the PWCNet teacher checkpoint the reference loads
in useful.py:105-117 ('./OpticalFlow/pwc-checkpoint.pt') via
model.pwcnet.convert_pwc_checkpoint (key map: moduleExtractor.module{One..Six},
module{Two..Six} decoders incl. flipped-HWIO deconvs, moduleRefiner.moduleMain).
The blob is absent from the repo mirror (.MISSING_LARGE_BLOBS) — the branch
exists so the first day with the real file is one command, not a key-map hunt.
"""

from __future__ import annotations

import sys
import types

import numpy as np

DEFAULT_SRC = ("/root/reference/checkpoint_dir/fLDRnet_X4K1000FPS_exp1/"
               "fLDRnet_X4K1000FPS_exp1_best_PSNR.pt")
DEFAULT_DST = "checkpoints/fldrnet_best.npz"


def _stub_reference_modules():
    """The .pt pickle references classes from the reference repo; register
    minimal stand-ins so torch.load works without importing reference code."""
    if "pca_comp" not in sys.modules:
        pm = types.ModuleType("pca_comp")

        class DCTParams:           # noqa: N801 - name must match pickle
            pass

        class DCTParamsAdap:       # noqa: N801
            pass

        pm.DCTParams = DCTParams
        pm.DCTParamsAdap = DCTParamsAdap
        sys.modules["pca_comp"] = pm
    if "useful" not in sys.modules:
        um = types.ModuleType("useful")

        class MYPCA:               # noqa: N801
            pass

        um.MYPCA = MYPCA
        sys.modules["useful"] = um


def load_reference_state_dict(path: str):
    """Returns (state_dict {name: np.ndarray}, meta dict)."""
    import torch  # CPU torch, conversion-time only

    _stub_reference_modules()
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.detach().numpy() for k, v in ckpt["state_dict_Model"].items()}
    meta = {k: ckpt[k] for k in
            ("last_epoch", "best_PSNR", "trainLoss", "testLoss", "testPSNR")}
    return sd, meta


def _conv(sd, name, dtype=np.float32):
    w = sd[f"{name}.weight"].astype(dtype)
    return {"w": np.transpose(w, (2, 3, 1, 0)),          # OIHW → HWIO
            "b": sd[f"{name}.bias"].astype(dtype)}


def state_dict_to_params(sd, dtype=np.float32):
    """Build the fldrx param pytree from the reference state dict.

    The checkpoint stores every tensor twice (vfinet.* and base_modules.1.*
    aliases, fLDRnet.py:41-55); we read the vfinet.* names."""
    p = {
        "pca": {
            "mean": sd["Mean8"].astype(dtype),
            "ev": sd["EV8"].astype(dtype),
            "mean_vec": sd["meanVec8"].astype(dtype),
        },
        "rec_ctx": {
            "conv0": _conv(sd, "rec_ctx_ds.0", dtype),
            "conv1": _conv(sd, "rec_ctx_ds.2", dtype),
        },
        "vfinet": {
            "T_param": sd["vfinet.T_param"].astype(dtype),
            "z_alpha": sd["vfinet.z_alpha"].astype(dtype),
            "flow_bottom": [
                _conv(sd, f"vfinet.conv_flow_bottom.{i}", dtype)
                for i in (0, 2, 4, 6, 8)
            ],
            "conv_flow1": _conv(sd, "vfinet.conv_flow1", dtype),
            "conv_flow2": [
                _conv(sd, f"vfinet.conv_flow2.{i}", dtype)
                for i in (0, 2, 4, 6, 8)
            ],
            "refine": {
                k: _conv(sd, f"vfinet.refine_unet.{k}", dtype)
                for k in ("enc1", "enc2", "enc3", "dec0", "dec1", "dec2", "dec3")
            },
        },
    }
    # per-scale EV variants (pick_pca non-simpleEVs surface): consumed by the
    # model when cfg.exac_one_ev=False (fldrnet.extract_features); also kept
    # flat in extras for tooling
    p["pca_multi"] = {
        f"s{s}": {
            "mean": sd[f"Mean{s}"].astype(dtype),
            "ev": sd[f"EV{s}"].astype(dtype),
            "mean_vec": sd[f"meanVec{s}"].astype(dtype),
        } for s in (8, 16, 32, 64)
    }
    p["pca_multi"]["s8"] = dict(p["pca"])
    extras = {}
    for s in (16, 32, 64):
        extras[f"EV{s}"] = sd[f"EV{s}"].astype(dtype)
        extras[f"Mean{s}"] = sd[f"Mean{s}"].astype(dtype)
        extras[f"meanVec{s}"] = sd[f"meanVec{s}"].astype(dtype)
    return p, extras


def flatten_params(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_params(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_params(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_params(flat):
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for pt in parts[:-1]:
            node = node.setdefault(pt, {})
        node[parts[-1]] = v

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(tree)


def save_params_npz(path: str, params, extras=None, meta=None):
    flat = flatten_params(params)
    if extras:
        flat.update({f"__extra__/{k}": v for k, v in extras.items()})
    if meta:
        flat.update({f"__meta__/{k}": np.asarray(v) for k, v in meta.items()})
    np.savez(path, **flat)


def load_params_npz(path: str):
    """Returns (params pytree, extras dict, meta dict)."""
    z = np.load(path)
    flat, extras, meta = {}, {}, {}
    for k in z.files:
        if k.startswith("__extra__/"):
            extras[k[len("__extra__/"):]] = z[k]
        elif k.startswith("__meta__/"):
            meta[k[len("__meta__/"):]] = z[k]
        else:
            flat[k] = z[k]
    return unflatten_params(flat), extras, meta


def convert(src: str = DEFAULT_SRC, dst: str = DEFAULT_DST) -> str:
    import os

    sd, meta = load_reference_state_dict(src)
    params, extras = state_dict_to_params(sd)
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    save_params_npz(dst, params, extras, meta)
    return dst


DEFAULT_PWC_SRC = "/root/reference/OpticalFlow/pwc-checkpoint.pt"
DEFAULT_PWC_DST = "checkpoints/pwc_teacher.npz"


def convert_pwc(src: str = DEFAULT_PWC_SRC, dst: str = DEFAULT_PWC_DST) -> str:
    """PWCNet teacher checkpoint → npz (loadable with load_params_npz;
    consumed by train losses' distillation path via model.pwcnet)."""
    import os

    from ..model.pwcnet import convert_pwc_checkpoint

    params = convert_pwc_checkpoint(src)
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    save_params_npz(dst, params)
    return dst


if __name__ == "__main__":
    argv = sys.argv[1:]
    if argv and argv[0] == "--pwc":
        src = argv[1] if len(argv) > 1 else DEFAULT_PWC_SRC
        dst = argv[2] if len(argv) > 2 else DEFAULT_PWC_DST
        out = convert_pwc(src, dst)
    else:
        src = argv[0] if argv else DEFAULT_SRC
        dst = argv[1] if len(argv) > 1 else DEFAULT_DST
        out = convert(src, dst)
    print(f"wrote {out}")
