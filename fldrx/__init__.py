"""fldrx — TPU-native rebuild of fLDRnet (visinf/fldr-vfi, BMVC 2022).

High-resolution video frame interpolation with learned block-PCA features,
a shared recurrent coarse-to-fine flow estimator, softmax splatting and a
refinement UNet — redesigned for JAX/XLA/Pallas on TPU.
"""

__version__ = "0.1.0"

import os as _os


def _enable_persistent_compile_cache():
    """The 4K test5scales program takes minutes to compile; persist XLA
    executables across processes (kill-switch: FLDRX_NO_COMPILE_CACHE=1)."""
    if _os.environ.get("FLDRX_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = _os.environ.get(
            "FLDRX_COMPILE_CACHE",
            _os.path.join(_os.path.expanduser("~"), ".cache", "fldrx", "xla"))
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:          # pragma: no cover - cache is best-effort
        pass


_enable_persistent_compile_cache()

from . import config
