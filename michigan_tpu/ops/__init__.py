"""Numerics layer: parity-exact image ops + TPU kernels.

Everything operates on NHWC float arrays (TPU-native layout). Functions that
mirror a PyTorch op reproduce its exact indexing/rounding semantics so that
converted reference checkpoints produce pixel-identical outputs.
"""

from michigan_tpu.ops.resize import (
    resize_nearest,
    resize_bilinear,
    upsample2x_nearest,
    avg_pool_3x3s2,
    max_pool_same,
    dilate_mask,
)
from michigan_tpu.ops.color import rgb_to_lab
from michigan_tpu.ops.filters import (
    gabor_bank,
    dog_bank,
    orientation_response,
    cal_orientation_two_channel,
)
from michigan_tpu.ops.masks import (
    one_hot_label,
    wide_edges,
    wide_edges_outer,
    instance_edges,
)
from michigan_tpu.ops.stats import masked_mean_std, masked_region_mean, hair_avg
from michigan_tpu.ops.noise import generate_noise
