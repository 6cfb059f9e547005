"""Device-side compute ops: image preprocessing kernels."""

from .image import grayscale, maxpool2, resize_area, resize_matrices

__all__ = ["grayscale", "maxpool2", "resize_area", "resize_matrices"]
