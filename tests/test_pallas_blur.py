"""Pallas blur kernel tests (interpret mode — no TPU needed).

The production entry point ``blur_pallas`` falls back to the XLA path
off-TPU, so these tests invoke the kernel directly in interpreter mode
to pin its math, plus cover the support gate and fallback behavior.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sift_scale_space_extrema_detection_tpu.ops.gaussian import (
    blur_separable,
    gaussian_kernel_1d,
    kernel_radius,
)
from sift_scale_space_extrema_detection_tpu.ops.pallas.blur import (
    _blur_kernel,
    blur_pallas,
    pallas_blur_supported,
)


def _run_kernel_interpret(x, sigma):
    radius = kernel_radius(sigma)
    taps = tuple(float(v) for v in gaussian_kernel_1d(sigma))
    b, h, w = x.shape
    hp, wp = h + 2 * radius, w + 2 * radius
    padded = jnp.pad(
        jnp.asarray(x), [(0, 0), (radius, radius), (radius, radius)], mode="edge"
    )
    kernel = functools.partial(_blur_kernel, taps=taps, h=h, w=w)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((hp, w), jnp.float32)],
        interpret=True,
    )(padded)


@pytest.mark.parametrize("sigma", [0.8, 1.6, 2.5])
def test_kernel_matches_separable(sigma):
    rng = np.random.default_rng(0)
    x = rng.random((2, 40, 56)).astype(np.float32)
    out = _run_kernel_interpret(x, sigma)
    ref = blur_separable(jnp.asarray(x), sigma)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_support_gate():
    # Small image, moderate sigma: supported.
    assert pallas_blur_supported(480, 640, 2.0)
    # Huge unrolled tap count on a big tile: not supported (measured
    # Mosaic scoped-VMEM OOM at 95 taps on a 120x160 tile).
    assert not pallas_blur_supported(960, 1280, 16.0)


def test_blur_pallas_falls_back_off_tpu():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((32, 48)).astype(np.float32))
    out = blur_pallas(x, 1.2)  # CPU backend in tests → XLA fallback
    ref = blur_separable(x, 1.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
