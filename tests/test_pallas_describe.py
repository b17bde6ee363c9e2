"""Window-DMA describe kernel vs the gather path (interpret mode).

The Pallas window-sampling path (ops/pallas/describe.py) must produce
the same oriented keypoints and descriptors as the XLA gather path
(ops/descriptor.py::describe_compact): identical compaction (same slot
order), identical valid masks, and descriptors equal up to MXU
accumulation-order rounding (the interp matmul adds exact zeros to the
2x2-corner bilinear arithmetic, so in interpret mode on CPU the samples
are near-bit-equal).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sift_scale_space_extrema_detection_tpu import SiftConfig
from sift_scale_space_extrema_detection_tpu.models.frontend import (
    build_dog,
    build_scale_space,
)
from sift_scale_space_extrema_detection_tpu.ops.descriptor import (
    describe_compact,
    describe_compact_batched_windowed,
)
from sift_scale_space_extrema_detection_tpu.ops.extrema import (
    compact_extrema,
    find_extrema,
)
from sift_scale_space_extrema_detection_tpu.ops.refine import refine_keypoints


def _pipeline(cfg, images):
    scale_space = build_scale_space(images, cfg, "separable")
    dog = build_dog(scale_space)

    def detect_one(*dogs):
        kps = []
        for octave, d in enumerate(dogs):
            extrema = compact_extrema(
                find_extrema(d, cfg, cfg.keypoints_per_trio(octave)),
                cfg.refine_capacity(octave),
            )
            kps.append(refine_keypoints(d, extrema, octave, cfg))
        return kps

    kps_list = jax.vmap(detect_one)(*dog)
    return scale_space, kps_list


def _textured(rng, b, h, w):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    imgs = []
    for k in range(b):
        img = 0.5 + 0.1 * np.sin(xx / 6.0 + k) * np.cos(yy / 8.0)
        for _ in range(60):
            cy, cx = rng.uniform(8, h - 8), rng.uniform(8, w - 8)
            r = rng.uniform(1.5, 5.0)
            img += rng.uniform(-0.35, 0.35) * np.exp(
                -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * r * r)
            )
        imgs.append(np.clip(img, 0.0, 1.0))
    return jnp.asarray(np.stack(imgs))


@pytest.mark.parametrize("upright", [False, True])
def test_windowed_describe_matches_gather_path(upright):
    cfg = SiftConfig(
        num_octaves=3, max_keypoints_per_trio=128, upright=upright
    )
    rng = np.random.default_rng(7)
    images = _textured(rng, 2, 128, 160)
    scale_space, kps_list = _pipeline(cfg, images)

    ref = jax.vmap(lambda *a: describe_compact(list(a[:3]), list(a[3:]), cfg))(
        *scale_space, *kps_list
    )
    got = describe_compact_batched_windowed(
        scale_space, kps_list, cfg, interpret=True
    )

    ref_valid = np.asarray(ref.valid)
    got_valid = np.asarray(got.valid)
    assert ref_valid.shape == got_valid.shape
    np.testing.assert_array_equal(got_valid, ref_valid)
    assert ref_valid.sum() > 30, "degenerate test: too few keypoints"

    v = ref_valid
    np.testing.assert_array_equal(
        np.asarray(got.octave)[v], np.asarray(ref.octave)[v]
    )
    np.testing.assert_allclose(
        np.asarray(got.theta)[v], np.asarray(ref.theta)[v],
        rtol=0, atol=1e-4,
    )
    d_ref = np.asarray(ref.descriptor)[v]
    d_got = np.asarray(got.descriptor)[v]
    np.testing.assert_allclose(d_got, d_ref, rtol=0, atol=2e-4)
    # Descriptors are unit-ish vectors; cosine agreement should be ~1.
    cos = np.sum(d_ref * d_got, -1) / np.maximum(
        np.linalg.norm(d_ref, axis=-1) * np.linalg.norm(d_got, axis=-1),
        1e-9,
    )
    assert cos.min() > 1.0 - 1e-6, cos.min()
