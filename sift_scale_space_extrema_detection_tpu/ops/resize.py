"""Nearest-neighbor resampling matching the reference's ``Matrix2D_linearResize``.

The reference resamples with a fractional stride and ``Math.floor``
(reference/src/matrix2d.js:112-138):

- sampling rate 0.5 (2× upsample): indices floor(0, .5, 1, 1.5, …) =
  0,0,1,1,… — i.e. each pixel repeated 2×2. Despite the name this is
  nearest-neighbor, not bilinear (SURVEY.md §2.3).
- sampling rate 2.0 (2× decimate): indices 0,2,4,… — i.e. strided
  slicing, output dims ``ceil(n/2)``.

The string round-trip copy in the reference is an exact identity for
floats and needs no replication.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample2x_nn(image: jax.Array) -> jax.Array:
    """2× nearest-neighbor upsample over the trailing two axes
    (reference/background.js:84 with rate 0.5)."""
    out = jnp.repeat(image, 2, axis=-2)
    return jnp.repeat(out, 2, axis=-1)


def downsample2x_nn(image: jax.Array) -> jax.Array:
    """2× decimation over the trailing two axes, keeping even indices
    (reference/background.js:118 with rate 2.0). Output dims ceil(n/2)."""
    return image[..., ::2, ::2]
