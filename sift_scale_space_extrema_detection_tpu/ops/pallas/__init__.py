"""Pallas TPU kernels (fall back to XLA paths off-TPU)."""

from .blur import blur_pallas, pallas_blur_supported

__all__ = ["blur_pallas", "pallas_blur_supported"]
