"""Pallas TPU kernel: fused separable Gaussian blur.

The TPU-native descendant of the reference's 32×32 chunked blur
(reference/src/image-utils.js:295-332, src/sift.js:72-149 — SURVEY.md
§2.1 C9): the chunk decomposition becomes the Pallas grid, and the
clamp-to-edge halo becomes an edge-padded input (the reference clamps
per tap; padding once is algebraically identical for a convolution).

Both 1-D passes run in ONE kernel with a row STRIPE of the image
resident in VMEM: the kernel DMAs a (tile_h + 2·radius, W + 2·radius)
stripe from HBM (stripes overlap by the halo, which BlockSpec cannot
express — hence the manual copy), row-convolves into a VMEM scratch,
column-convolves into the output block. Per scale the image is read and
written once.

Mosaic sizing (measured, not documented): the scoped-VMEM stack grows as
``taps × stripe_bytes`` — each unrolled lane/sublane-shifted slice of
the stripe materializes a stripe-sized temporary. A whole-image tile at
480p octave 0 OOMs at FIVE taps (24.5 MB scoped); the stripe height
below is chosen so ``(taps + 1) × stripe_bytes`` stays under the limit,
and σ too large for even one-row stripes falls back to the XLA path
(tiny upper-octave images — cost there is negligible anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..gaussian import blur_separable, gaussian_kernel_1d, kernel_radius

_SCOPED_VMEM_BUDGET = 14 * 1024 * 1024


def _aligned_stripe(tile_h: int, radius: int) -> int:
    """Stripe slice height incl. halo, rounded up to the sublane tile (8):
    Mosaic rejects DMA slices whose second-minor dim is not 8-aligned."""
    return ((tile_h + 2 * radius + 7) // 8) * 8


def _aligned_width(w: int, radius: int) -> int:
    """Padded width incl. halo, rounded up to the lane tile (128) —
    same Mosaic DMA-slice alignment rule on the minor dimension."""
    return ((w + 2 * radius + 127) // 128) * 128


def _stripe_rows(h: int, w: int, radius: int) -> int | None:
    """Largest power-of-two stripe height that fits the Mosaic budget."""
    taps = 2 * radius + 1
    wp = _aligned_width(w, radius)
    for tile_h in (256, 128, 64, 32, 16, 8):
        stripe_bytes = 4 * _aligned_stripe(tile_h, radius) * wp
        # Measured scoped usage ≈ taps × stripe (+1 stripe slack).
        if (taps + 1) * stripe_bytes <= _SCOPED_VMEM_BUDGET:
            return tile_h
    return None


def pallas_blur_supported(
    h: int, w: int, sigma: float, radius_sigmas: float = 3.0
) -> bool:
    radius = kernel_radius(sigma, radius_sigmas)
    return _stripe_rows(h, w, radius) is not None


def _blur_stripe_kernel(
    in_hbm, out_ref, stripe, tmp, sem, *, taps, radius, tile_h, h, w
):
    """One (batch, stripe) grid step: DMA stripe+halo, two conv passes."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    row0 = i * tile_h  # top of this stripe in the PADDED image
    hp_stripe = _aligned_stripe(tile_h, radius)
    size = len(taps)

    copy = pltpu.make_async_copy(
        in_hbm.at[b, pl.ds(row0, hp_stripe), :],
        stripe,
        sem,
    )
    copy.start()
    copy.wait()

    # Row pass over all stripe rows (they all feed the column pass).
    tmp[:, :] = stripe[:, 0:w] * taps[0]
    for t in range(1, size):
        tmp[:, :] += stripe[:, t : t + w] * taps[t]
    # Column pass into the output block; mask the tail stripe's overhang.
    out_ref[0] = tmp[0:tile_h, :] * taps[0]
    for t in range(1, size):
        out_ref[0] += tmp[t : t + tile_h, :] * taps[t]


def blur_pallas(
    image: jax.Array,
    sigma: float,
    radius_sigmas: float = 3.0,
    interpret: bool = False,
) -> jax.Array:
    """Fused separable Gaussian blur on TPU; image ``(..., H, W)``.

    Falls back to :func:`..gaussian.blur_separable` off-TPU or when no
    stripe height fits the Mosaic scoped-VMEM model. ``interpret=True``
    runs the kernel in the Pallas interpreter (any backend — used by
    tests to pin the kernel math without TPU hardware).
    """
    h, w = image.shape[-2], image.shape[-1]
    radius = kernel_radius(sigma, radius_sigmas)
    tile_h = _stripe_rows(h, w, radius)
    on_tpu = jax.default_backend() == "tpu"
    if (not on_tpu and not interpret) or tile_h is None:
        return blur_separable(image, sigma, radius_sigmas)

    k1 = gaussian_kernel_1d(sigma, radius_sigmas)
    taps = tuple(float(v) for v in k1)

    batch_shape = image.shape[:-2]
    flat = image.reshape((-1, h, w))
    b = flat.shape[0]
    # Pad H so every stripe's ALIGNED slice stays in bounds: the last
    # stripe starts at (n_stripes-1)*tile_h and reads _aligned_stripe
    # rows.
    n_stripes = -(-h // tile_h)
    hp_stripe = _aligned_stripe(tile_h, radius)
    rows_needed = (n_stripes - 1) * tile_h + hp_stripe
    bottom_pad = rows_needed - h - radius
    wp = _aligned_width(w, radius)
    right_pad = wp - w - radius
    padded = jnp.pad(
        flat,
        [(0, 0), (radius, max(bottom_pad, 0)), (radius, right_pad)],
        mode="edge",
    )

    kernel = functools.partial(
        _blur_stripe_kernel,
        taps=taps,
        radius=radius,
        tile_h=tile_h,
        h=h,
        w=w,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, n_stripes),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, tile_h, w), lambda bi, si: (bi, si, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_stripes * tile_h, w), image.dtype),
        scratch_shapes=[
            pltpu.VMEM((hp_stripe, wp), image.dtype),
            pltpu.VMEM((hp_stripe, w), image.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * len(taps) * h * w,
            bytes_accessed=4 * (hp_stripe * wp * n_stripes + h * w),
            transcendentals=0,
        ),
        interpret=interpret,
    )(padded)
    return out[:, :h, :].reshape(batch_shape + (h, w))
