"""Compute kernels: assignment, convolution (jnp + Pallas variants)."""
from .assign import nearest_palette, palette_usage, assign_with_usage, quantize_image
from .conv import conv1d_symmetric, separable_conv2d_symmetric

__all__ = [
    "nearest_palette",
    "palette_usage",
    "assign_with_usage",
    "quantize_image",
    "conv1d_symmetric",
    "separable_conv2d_symmetric",
]
