from .resize import resize_2d, resize_bicubic, resize_bilinear, resize_matrix
from .warp import bwarp, grid_sample_bilinear
from .splat import splat_sum, softsplat
from .block_pca import block_pca_features, fit_block_pca, PCAState, blocks_from_images
from .pad import pad_to_divisible, pad_amount
from . import metrics
