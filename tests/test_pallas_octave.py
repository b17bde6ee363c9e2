"""Fused whole-octave Pallas kernel tests (interpret mode — no TPU).

The fused kernel produces an octave's entire Gaussian stack + DoG + seed
scale from a single read of the base image (VERDICT.md round-1 item #1).
These tests pin its math against the XLA separable path in interpreter
mode, covering both emit modes and the octave≥1 unblurred-scale-0 rule
(reference/background.js:110-143).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sift_scale_space_extrema_detection_tpu.config import SiftConfig
from sift_scale_space_extrema_detection_tpu.models.frontend import (
    build_dog,
    build_pyramid_fused,
    build_scale_space,
)
from sift_scale_space_extrema_detection_tpu.ops.dog import (
    difference_of_gaussians,
)
from sift_scale_space_extrema_detection_tpu.ops.gaussian import blur_separable
from sift_scale_space_extrema_detection_tpu.ops.pallas.octave import (
    fused_octave,
    fused_octave_supported,
)


def _reference_octave(base, sigmas, spo):
    planes = [
        base if s is None else blur_separable(base, s) for s in sigmas
    ]
    scales = jnp.stack(planes, axis=-3)
    return scales, difference_of_gaussians(scales), planes[spo]


@pytest.mark.parametrize("with_unblurred_base", [False, True])
def test_fused_octave_matches_separable(with_unblurred_base):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 40, 56)).astype(np.float32))
    cfg = SiftConfig()
    octave = 1 if with_unblurred_base else 0
    sigmas = [
        None if (octave > 0 and s == 0) else cfg.offset_sigma(octave, s)
        for s in range(cfg.scales_per_octave_total)
    ]
    assert fused_octave_supported(40, 56, sigmas, cfg.scales_per_octave)

    scales, dog, seed, _ = fused_octave(
        x, sigmas, cfg.scales_per_octave, emit_scales=True, interpret=True
    )
    ref_scales, ref_dog, ref_seed = _reference_octave(
        x, sigmas, cfg.scales_per_octave
    )
    np.testing.assert_allclose(
        np.asarray(scales), np.asarray(ref_scales), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(dog), np.asarray(ref_dog), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(seed), np.asarray(ref_seed), atol=1e-5
    )


def test_fused_octave_no_scales_emits_dog_and_seed_only():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 33, 47)).astype(np.float32))
    cfg = SiftConfig()
    sigmas = [cfg.offset_sigma(0, s) for s in range(cfg.scales_per_octave_total)]
    scales, dog, seed, _ = fused_octave(
        x, sigmas, cfg.scales_per_octave, emit_scales=False, interpret=True
    )
    assert scales is None
    _, ref_dog, ref_seed = _reference_octave(x, sigmas, cfg.scales_per_octave)
    np.testing.assert_allclose(np.asarray(dog), np.asarray(ref_dog), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(seed), np.asarray(ref_seed), atol=1e-5
    )


def test_build_pyramid_fused_matches_xla_pipeline():
    """Full multi-octave fused build vs the XLA separable pipeline."""
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((2, 36, 44)).astype(np.float32))
    cfg = SiftConfig(num_octaves=3)
    scale_space, dogs, _ = build_pyramid_fused(
        img, cfg, emit_scales=True, interpret=True
    )
    ref_scales = build_scale_space(img, cfg, blur="separable")
    ref_dogs = build_dog(ref_scales)
    assert len(scale_space) == len(ref_scales) == 3
    for got, ref in zip(scale_space, ref_scales):
        assert got.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5
        )
    for got, ref in zip(dogs, ref_dogs):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5
        )


def test_build_pyramid_fused_detect_only_path():
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((30, 38)).astype(np.float32))
    cfg = SiftConfig(num_octaves=2)
    scale_space, dogs, _ = build_pyramid_fused(
        img, cfg, emit_scales=False, interpret=True
    )
    assert scale_space is None
    ref_dogs = build_dog(build_scale_space(img, cfg, blur="separable"))
    for got, ref in zip(dogs, ref_dogs):
        assert got.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5
        )


def test_fused_octave_masks_match_xla_scan():
    """In-kernel extrema masks == XLA scan masks on the same DoG."""
    from sift_scale_space_extrema_detection_tpu.ops.extrema import (
        _neighborhood_min_max,
        _trio_masks,
        find_extrema,
        find_extrema_from_masks,
    )

    rng = np.random.default_rng(4)
    x = jnp.asarray(
        (rng.random((2, 40, 56)) ** 2).astype(np.float32)
    )
    cfg = SiftConfig()
    sigmas = [cfg.offset_sigma(0, s) for s in range(cfg.scales_per_octave_total)]
    assert fused_octave_supported(
        40, 56, sigmas, cfg.scales_per_octave, emit_masks=True
    )
    _, dog, _, masks = fused_octave(
        x,
        sigmas,
        cfg.scales_per_octave,
        emit_scales=False,
        emit_masks=True,
        contrast_thr=cfg.contrast_prefilter_threshold,
        interpret=True,
    )
    assert masks.shape == (2, 40, 56)
    assert masks.dtype == jnp.int32

    for b in range(2):
        d = dog[b]
        min3, max3 = _neighborhood_min_max(d)
        for s in range(1, cfg.dog_per_octave - 1):
            cand, low = _trio_masks(d, min3, max3, s, cfg)
            code = (np.asarray(masks[b]) >> (2 * (s - 1))) & 3
            got = code[1:-1, 1:-1]
            np.testing.assert_array_equal(got == 1, np.asarray(cand))
            np.testing.assert_array_equal(got == 2, np.asarray(low))

        # And the Extrema built from masks equals the XLA-scan Extrema.
        e_ref = find_extrema(d, cfg, 64)
        e_got = find_extrema_from_masks(masks[b], d, cfg, 64)
        for field in ("y", "x", "scale_level", "value", "valid",
                      "num_candidates", "num_low_contrast"):
            np.testing.assert_array_equal(
                np.asarray(getattr(e_got, field)),
                np.asarray(getattr(e_ref, field)),
            )
