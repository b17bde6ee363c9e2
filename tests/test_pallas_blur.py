"""Pallas blur kernel tests (interpret mode — no TPU needed).

The production entry point ``blur_pallas`` falls back to the XLA path
off-TPU, so these tests run the striped-DMA kernel in interpreter mode
to pin its math, plus cover the support gate and fallback behavior.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sift_scale_space_extrema_detection_tpu.ops.gaussian import (
    blur_separable,
)
from sift_scale_space_extrema_detection_tpu.ops.pallas.blur import (
    _stripe_rows,
    blur_pallas,
    pallas_blur_supported,
)


@pytest.mark.parametrize("sigma", [0.8, 1.6, 2.5])
def test_kernel_matches_separable(sigma):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 40, 56)).astype(np.float32))
    out = blur_pallas(x, sigma, interpret=True)
    ref = blur_separable(x, sigma)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_kernel_multiple_stripes(interpret=True):
    """Image taller than one stripe exercises the halo/overlap path."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 300, 130)).astype(np.float32))
    sigma = 2.0
    assert _stripe_rows(300, 130, 6) is not None
    out = blur_pallas(x, sigma, interpret=True)
    ref = blur_separable(x, sigma)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_kernel_non_multiple_height():
    """H not divisible by the stripe height exercises the tail padding."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((1, 275, 96)).astype(np.float32))
    out = blur_pallas(x, 1.4, interpret=True)
    ref = blur_separable(x, 1.4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_support_gate():
    # 480p octave-0 shape with realistic sigma: supported via stripes.
    assert pallas_blur_supported(960, 1280, 2.3)
    # Huge sigma on a wide image: even an 8-row stripe blows the budget.
    assert not pallas_blur_supported(960, 1280, 40.0)


def test_blur_pallas_falls_back_off_tpu():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((32, 48)).astype(np.float32))
    out = blur_pallas(x, 1.2)  # CPU backend in tests → XLA fallback
    ref = blur_separable(x, 1.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
