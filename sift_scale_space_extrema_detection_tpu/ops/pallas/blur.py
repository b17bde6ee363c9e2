"""Pallas TPU kernel: fused separable Gaussian blur.

The TPU-native descendant of the reference's 32×32 chunked blur
(reference/src/image-utils.js:295-332, src/sift.js:72-149 — SURVEY.md
§2.1 C9): the chunk decomposition becomes the Pallas grid, and the
clamp-to-edge halo becomes an edge-padded input (the reference clamps
per tap; padding once is algebraically identical for a convolution).

Both 1-D passes run in ONE kernel with the image tile resident in VMEM:
row convolution into a VMEM scratch, column convolution into the output
block. XLA's generic conv path round-trips the intermediate through HBM
and lowers 1×K convolutions poorly (measured ~220 ms for the 64×480p
pyramid where the bandwidth bound is ~10 ms); here each scale costs one
HBM read + one write.

The kernel holds the full (padded) image per grid step, so it applies
when ``3 · H·W · 4 B ≲ VMEM``; larger images fall back to the XLA
separable path. Batch elements pipeline through the grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..gaussian import blur_separable, gaussian_kernel_1d, kernel_radius

# VMEM budget for input + scratch + output tiles (16 MB/core minus
# headroom; a 960×1280 f32 tile set at ~14.9 MB compiles and runs).
_VMEM_BUDGET_BYTES = int(15.5 * 1024 * 1024)
# Mosaic's scoped stack grows with the UNROLLED tap count on small tiles
# (measured: 95 taps on a 120×160 tile → 16.8 MB scoped OOM, while 15
# taps on a 960×1280 tile ran fine), so cap the taps independently.
_MAX_TAPS = 31


def _blur_kernel(in_ref, out_ref, tmp_ref, *, taps, h, w):
    """One batch element: row pass (padded rows) then column pass.

    Accumulation goes through the refs in place: building the whole
    unrolled tap sum as one expression kept every shifted slice live and
    blew the Mosaic scoped-VMEM stack (23 MB for a 480p tile).
    """
    size = len(taps)
    tmp_ref[:, :] = in_ref[0, :, 0:w] * taps[0]
    for t in range(1, size):
        tmp_ref[:, :] += in_ref[0, :, t : t + w] * taps[t]
    out_ref[0] = tmp_ref[0:h, :] * taps[0]
    for t in range(1, size):
        out_ref[0] += tmp_ref[t : t + h, :] * taps[t]


def pallas_blur_supported(h: int, w: int, sigma: float, radius_sigmas: float = 3.0) -> bool:
    radius = kernel_radius(sigma, radius_sigmas)
    hp, wp = h + 2 * radius, w + 2 * radius
    taps = 2 * radius + 1
    need = 4 * (hp * wp + hp * w + h * w)
    return taps <= _MAX_TAPS and need <= _VMEM_BUDGET_BYTES


def blur_pallas(
    image: jax.Array, sigma: float, radius_sigmas: float = 3.0
) -> jax.Array:
    """Fused separable Gaussian blur on TPU; image ``(..., H, W)``.

    Falls back to :func:`..gaussian.blur_separable` when the padded tile
    would not fit VMEM or when not running on TPU.
    """
    h, w = image.shape[-2], image.shape[-1]
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu or not pallas_blur_supported(h, w, sigma, radius_sigmas):
        return blur_separable(image, sigma, radius_sigmas)

    radius = kernel_radius(sigma, radius_sigmas)
    k1 = gaussian_kernel_1d(sigma, radius_sigmas)
    taps = tuple(float(v) for v in k1)

    batch_shape = image.shape[:-2]
    flat = image.reshape((-1, h, w))
    b = flat.shape[0]
    padded = jnp.pad(
        flat, [(0, 0), (radius, radius), (radius, radius)], mode="edge"
    )
    hp, wp = h + 2 * radius, w + 2 * radius

    kernel = functools.partial(_blur_kernel, taps=taps, h=h, w=w)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, hp, wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w), image.dtype),
        scratch_shapes=[pltpu.VMEM((hp, w), image.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * len(taps) * h * w,
            bytes_accessed=4 * (hp * wp + h * w),
            transcendentals=0,
        ),
    )(padded)
    return out.reshape(batch_shape + (h, w))
