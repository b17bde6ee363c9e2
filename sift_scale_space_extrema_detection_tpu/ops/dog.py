"""Difference-of-Gaussians.

The reference computes ``DoG[s-1] = L(σ_{s-1}) − L(σ_s)`` — operand order
``pair[0] − pair[1]`` (reference/background.js:276-277,
reference/src/sift.js:172) — which is the *negative* of the conventional
DoG. Maxima/minima swap roles but every accept/reject test uses absolute
values, so the final keypoint set is unchanged (SURVEY.md §2.3 stage 2).
We keep the reference's sign for bit parity.
"""

from __future__ import annotations

import jax


def difference_of_gaussians(scale_space: jax.Array) -> jax.Array:
    """``(..., S, H, W)`` Gaussian stack → ``(..., S-1, H, W)`` DoG stack."""
    lower = scale_space[..., :-1, :, :]
    upper = scale_space[..., 1:, :, :]
    return lower - upper
