"""fldrx — TPU-native rebuild of fLDRnet (visinf/fldr-vfi, BMVC 2022).

High-resolution video frame interpolation with learned block-PCA features,
a shared recurrent coarse-to-fine flow estimator, softmax splatting and a
refinement UNet — redesigned for JAX/XLA/Pallas on TPU.
"""

__version__ = "0.1.0"

from . import config
