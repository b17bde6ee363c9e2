"""Bilinear sampling and scale-space gradients.

Building blocks for the descriptor extension (green-field: the reference
stops before orientation/descriptors, reference/readme.md:11). Gradients
follow the IPOL Anatomy-of-SIFT convention: central differences on the
Gaussian scale-space images, matching the reference's own gradient
operator used in refinement (reference/src/sift.js:333-353).

All functions are shape-polymorphic over leading batch dims and
jit/vmap-friendly; samplers clamp to the image border (the reference's
clamp-to-edge rule, reference/src/sift.js:116-119).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scale_space_gradients(stack: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-pixel central-difference gradients of a scale-space stack.

    ``stack``: ``(..., H, W)``. Returns ``(gy, gx)`` with the same shape;
    border rows/columns are exactly zero. (An earlier jnp.roll version
    wrapped around the border, silently mixing opposite image edges —
    masked out by callers today, but a trap for any future caller
    sampling within one pixel of the border.)
    """
    zero = jnp.zeros_like(stack)
    gy = zero.at[..., 1:-1, :].set(
        (stack[..., 2:, :] - stack[..., :-2, :]) / 2.0
    )
    gx = zero.at[..., 1:-1].set(
        (stack[..., 2:] - stack[..., :-2]) / 2.0
    )
    return gy, gx


def bilinear_sample(image: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Bilinearly sample ``image`` (H, W) at float positions (ys, xs).

    Positions outside the image are clamped to the border (clamp-to-edge,
    consistent with the reference border rule). ``ys``/``xs`` may have any
    broadcastable shape; returns samples of that shape.
    """
    h, w = image.shape[-2], image.shape[-1]
    # Clamp the COORDINATES, not just the integer corners: clipping
    # corners after taking the fractional part left fy/fx nonzero for
    # negative positions, blending border and interior pixels instead
    # of returning the border value (asymmetric with the positive side,
    # which saturated correctly).
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = ys - y0
    fx = xs - x0

    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)

    v00 = image[y0i, x0i]
    v01 = image[y0i, x1i]
    v10 = image[y1i, x0i]
    v11 = image[y1i, x1i]
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy
