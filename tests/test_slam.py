"""End-to-end incremental SLAM on synthetic sequences (config[3])."""

import numpy as np
import jax.numpy as jnp
import pytest

from sift_scale_space_extrema_detection_tpu.models.slam import (
    SlamConfig,
    evaluate_ate,
    run_slam,
)
from sift_scale_space_extrema_detection_tpu.sfm.evaluate import (
    absolute_trajectory_error,
    umeyama_alignment,
)
from sift_scale_space_extrema_detection_tpu.utils.synthetic import orbit_sequence


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(40, 3))
    from sift_scale_space_extrema_detection_tpu.sfm import geometry as geo

    r = np.asarray(geo.so3_exp(jnp.asarray([0.3, -0.5, 0.2])))
    s, t = 2.5, np.array([1.0, -2.0, 0.5])
    dst = s * src @ r.T + t
    s_e, r_e, t_e = umeyama_alignment(jnp.asarray(src), jnp.asarray(dst))
    assert abs(float(s_e) - s) < 1e-6
    np.testing.assert_allclose(np.asarray(r_e), r, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t_e), t, atol=1e-6)


def test_ate_zero_for_identical_trajectories():
    rng = np.random.default_rng(1)
    seq = orbit_sequence(rng, num_frames=10, num_landmarks=50)
    ate = absolute_trajectory_error(
        jnp.asarray(seq.rotations),
        jnp.asarray(seq.translations),
        jnp.asarray(seq.rotations),
        jnp.asarray(seq.translations),
    )
    assert float(ate) < 1e-6


@pytest.mark.slow
def test_slam_50_keyframes_ate():
    """BASELINE config[3]: 50-keyframe incremental reconstruction.

    ATE bound: 1% of the trajectory radius (8.0) — i.e. 0.08 units —
    on a clean-ish sequence (0.4 px noise, 2% outliers).
    """
    rng = np.random.default_rng(2)
    seq = orbit_sequence(
        rng, num_frames=50, num_landmarks=400, noise_px=0.4, outlier_frac=0.02
    )
    result = run_slam(seq.pixels, seq.visible, seq.k_mat, SlamConfig())
    assert result.landmark_valid.sum() > 200
    ate = evaluate_ate(result, seq.rotations, seq.translations)
    assert ate < 0.08, f"ATE {ate:.4f} exceeds bound"


def test_slam_short_sequence_runs():
    rng = np.random.default_rng(3)
    seq = orbit_sequence(rng, num_frames=8, num_landmarks=150, noise_px=0.3)
    result = run_slam(seq.pixels, seq.visible, seq.k_mat, SlamConfig(ba_interval=3))
    ate = evaluate_ate(result, seq.rotations, seq.translations)
    assert ate < 0.1, f"ATE {ate:.4f}"
    assert result.num_observations > 100


def test_slam_with_pose_graph_step():
    """The pose-graph backend layer runs and does not degrade accuracy."""
    rng = np.random.default_rng(4)
    seq = orbit_sequence(rng, num_frames=12, num_landmarks=200, noise_px=0.3)
    result = run_slam(
        seq.pixels,
        seq.visible,
        seq.k_mat,
        SlamConfig(ba_interval=4, use_pose_graph=True),
    )
    ate = evaluate_ate(result, seq.rotations, seq.translations)
    assert ate < 0.1, f"ATE {ate:.4f}"
