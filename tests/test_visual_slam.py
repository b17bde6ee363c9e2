"""Full visual SLAM from rendered images (frontend + backend composed)."""

import numpy as np
import jax.numpy as jnp

from sift_scale_space_extrema_detection_tpu import SiftConfig
from sift_scale_space_extrema_detection_tpu.models.slam import (
    SlamConfig,
    evaluate_ate,
    run_slam_from_images,
)
from sift_scale_space_extrema_detection_tpu.sfm import geometry as geo
from sift_scale_space_extrema_detection_tpu.utils.synthetic import (
    render_blob_image,
    textured_blob_field,
)


def _render_sequence(rng, num_frames=8, w=320, h=240):
    """Slow lateral dolly past a textured blob field."""
    k_mat = np.array([[260.0, 0, w / 2], [0, 260.0, h / 2], [0, 0, 1.0]])
    pts = rng.uniform([-3.5, -1.8, 4.0], [3.5, 1.8, 9.0], size=(110, 3))
    rpts, amps, ss = textured_blob_field(rng, pts)

    rots, ts, imgs = [], [], []
    for f in range(num_frames):
        w_vec = jnp.asarray([0.004 * f, -0.01 * f, 0.002 * f])
        r = np.asarray(geo.so3_exp(w_vec))
        center = np.array([0.28 * f, 0.02 * f, 0.0])
        t = -r @ center
        img = render_blob_image(
            rpts, r, t, k_mat, (w, h),
            amplitudes=amps, sigma_scales=ss,
            rng=np.random.default_rng(100 + f),
        )
        rots.append(r)
        ts.append(t)
        imgs.append(img)
    return np.stack(imgs), np.stack(rots), np.stack(ts), k_mat


def test_visual_slam_end_to_end():
    rng = np.random.default_rng(0)
    images, gt_r, gt_t, k_mat = _render_sequence(rng)

    sift_cfg = SiftConfig(num_octaves=3, max_keypoints_per_trio=256)
    result = run_slam_from_images(
        images, k_mat, sift_cfg, SlamConfig(ba_interval=3, ba_window=6)
    )
    assert result.landmark_valid.sum() > 20
    ate = evaluate_ate(result, gt_r, gt_t)
    # Pixel-level keypoints on synthetic blob texture, monocular
    # scale-aligned: ~3% of the ~2-unit trajectory extent.
    assert ate < 0.06, f"ATE {ate:.4f}" 
