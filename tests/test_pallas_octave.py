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


def test_fused_detect_path_matches_separable_end_to_end():
    """Full detect via kernel masks + packed selection == XLA pipeline.

    Integration cover for the production detect path (fused kernel →
    packed int16 mask plane → packed-plane candidate selection →
    refinement): keypoint sets and the per-trio rejection counters must
    match the plain separable XLA path (coordinates to fp tolerance —
    the two blur implementations differ in tap order).
    """
    from sift_scale_space_extrema_detection_tpu.models.frontend import (
        build_pyramid_fused,
        detect,
        detect_from_dog,
    )

    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float64)
    img = (
        0.4
        + 0.25 * np.sin(xx / 5) * np.cos(yy / 7)
        + 0.3 * np.exp(-((yy - 32) ** 2 + (xx - 32) ** 2) / 30.0)
    )
    img = np.clip(img + 0.04 * rng.standard_normal((64, 64)), 0, 1)
    img = jnp.asarray(img.astype(np.float32))
    cfg = SiftConfig(num_octaves=2, max_keypoints_per_trio=128)

    _, dog_f, masks_f = build_pyramid_fused(
        img, cfg, emit_scales=False, emit_masks=True, interpret=True
    )
    kp_f, ex_f = detect_from_dog(dog_f, cfg, masks_f)
    kp_s, ex_s = detect(img, cfg, blur="separable")

    vf, vs = np.asarray(kp_f.valid), np.asarray(kp_s.valid)
    assert vf.sum() == vs.sum() > 0
    set_f = set(
        zip(
            np.asarray(kp_f.octave)[vf],
            np.asarray(kp_f.abs_x)[vf].round(3),
            np.asarray(kp_f.abs_y)[vf].round(3),
        )
    )
    set_s = set(
        zip(
            np.asarray(kp_s.octave)[vs],
            np.asarray(kp_s.abs_x)[vs].round(3),
            np.asarray(kp_s.abs_y)[vs].round(3),
        )
    )
    assert set_f == set_s
    for ef, es in zip(ex_f, ex_s):
        np.testing.assert_array_equal(
            np.asarray(ef.num_candidates), np.asarray(es.num_candidates)
        )
        np.testing.assert_array_equal(
            np.asarray(ef.num_low_contrast),
            np.asarray(es.num_low_contrast),
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
    assert masks.dtype == jnp.int16  # <=8 trios pack into int16

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


def test_fused_bf16_dog_same_candidates_close_keypoints():
    """bf16-compressed DoG storage: identical candidate set, close keypoints.

    The compressed mode (ops/pallas/octave.py ``dog_dtype``) quantizes
    only the STORED DoG planes; the in-VMEM extrema scan reads full
    precision, so the packed mask plane — and with it every candidate
    and the rejection counters — must be bit-identical to the f32 path.
    Refinement re-reads the quantized planes, so accepted keypoints may
    shift slightly or flip near thresholds; require a high-agreement
    match with sub-pixel-scale position deltas.
    """
    from sift_scale_space_extrema_detection_tpu.models.frontend import (
        detect_from_dog,
    )

    rng = np.random.default_rng(6)
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float64)
    img = (
        0.4
        + 0.25 * np.sin(xx / 5) * np.cos(yy / 7)
        + 0.3 * np.exp(-((yy - 32) ** 2 + (xx - 32) ** 2) / 30.0)
    )
    img = np.clip(img + 0.04 * rng.standard_normal((64, 64)), 0, 1)
    img = jnp.asarray(img.astype(np.float32))
    cfg = SiftConfig(num_octaves=2, max_keypoints_per_trio=128)

    _, dog32, m32 = build_pyramid_fused(
        img, cfg, emit_scales=False, emit_masks=True, interpret=True
    )
    _, dog16, m16 = build_pyramid_fused(
        img, cfg, emit_scales=False, emit_masks=True, interpret=True,
        dog_dtype=jnp.bfloat16,
    )
    for a, b in zip(m32, m16):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for d32, d16 in zip(dog32, dog16):
        assert d16.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(d16, np.float32), np.asarray(d32), atol=4e-3
        )

    kp32, ex32 = detect_from_dog(dog32, cfg, m32)
    kp16, ex16 = detect_from_dog(dog16, cfg, m16)
    # Candidate accounting identical (mask-derived).
    for e32, e16 in zip(ex32, ex16):
        np.testing.assert_array_equal(
            np.asarray(e32.num_candidates), np.asarray(e16.num_candidates)
        )
    assert kp16.abs_x.dtype == kp32.abs_x.dtype  # refine widened to f32
    v32 = np.asarray(kp32.valid)
    v16 = np.asarray(kp16.valid)
    n32, n16 = v32.sum(), v16.sum()
    assert n32 > 0
    # Same slots accepted for ~all keypoints (threshold flips are rare).
    agree = (v32 == v16).mean()
    assert agree > 0.98, f"accept/reject agreement {agree:.3f}"
    both = v32 & v16
    dx = np.abs(np.asarray(kp32.abs_x)[both] - np.asarray(kp16.abs_x)[both])
    dy = np.abs(np.asarray(kp32.abs_y)[both] - np.asarray(kp16.abs_y)[both])
    assert max(dx.max(), dy.max()) < 0.1, (dx.max(), dy.max())


def test_flat_detect_layout_bit_identical():
    """Stripe-major flat-2D DoG (production detect layout) == plane.

    The fused kernel's flat_detect mode writes one contiguous
    (D·tile_h, W) chunk per grid step (per-chunk DMA setup made the
    plane-stacked block the write bottleneck; see ops/pallas/octave.py).
    Planes reassembled from the stripe-major buffer must be bit-equal,
    masks bit-equal, and the full detect pipeline (selection +
    refinement through the unified flat-index addressing) must produce
    bit-identical keypoints.
    """
    from sift_scale_space_extrema_detection_tpu.models.frontend import (
        detect_from_dog,
    )

    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float64)
    img = (
        0.4
        + 0.25 * np.sin(xx / 5) * np.cos(yy / 7)
        + 0.3 * np.exp(-((yy - 32) ** 2 + (xx - 32) ** 2) / 30.0)
    )
    img = jnp.asarray(
        np.clip(img + 0.04 * rng.standard_normal((64, 64)), 0, 1).astype(
            np.float32
        )
    )
    cfg = SiftConfig(num_octaves=2, max_keypoints_per_trio=128)

    _, dog_p, masks_p = build_pyramid_fused(
        img, cfg, emit_scales=False, emit_masks=True, interpret=True
    )
    _, dog_s, masks_s = build_pyramid_fused(
        img, cfg, emit_scales=False, emit_masks=True, interpret=True,
        flat_detect=True,
    )
    for o, (dp, ds) in enumerate(zip(dog_p, dog_s)):
        assert ds.ndim == 4, f"octave {o} did not take the flat layout"
        ns, d, t, w = ds.shape
        plane = jnp.transpose(ds, (1, 0, 2, 3)).reshape(d, ns * t, w)
        np.testing.assert_array_equal(
            np.asarray(plane[:, : dp.shape[1], :]), np.asarray(dp)
        )
        np.testing.assert_array_equal(
            np.asarray(masks_p[o]), np.asarray(masks_s[o])
        )

    kp_p, _ = detect_from_dog(dog_p, cfg, masks_p)
    kp_s, _ = detect_from_dog(dog_s, cfg, masks_s)
    np.testing.assert_array_equal(np.asarray(kp_p.valid), np.asarray(kp_s.valid))
    np.testing.assert_array_equal(
        np.asarray(kp_p.reject_reason), np.asarray(kp_s.reject_reason)
    )
    v = np.asarray(kp_p.valid)
    assert v.sum() > 0
    for field in ("abs_x", "abs_y", "abs_sigma", "value"):
        np.testing.assert_array_equal(
            np.asarray(getattr(kp_p, field))[v],
            np.asarray(getattr(kp_s, field))[v],
        )
