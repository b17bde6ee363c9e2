"""Trajectory evaluation: ATE / RPE (BASELINE.json accuracy metrics).

Absolute trajectory error with Umeyama similarity alignment (the
standard TUM-RGBD evaluation protocol): estimated camera centers are
aligned to ground truth with the closed-form similarity (R, t, s), then
ATE is the RMS of residual center distances. RPE measures frame-to-frame
relative pose drift.
"""

from __future__ import annotations

import jax.numpy as jnp


def camera_centers(rotations, translations):
    """World-space camera centers from world→camera poses: ``-Rᵀt``."""
    return -jnp.einsum("nji,nj->ni", rotations, translations)


def umeyama_alignment(src, dst, with_scale: bool = True):
    """Closed-form similarity aligning ``src`` → ``dst`` (N, 3) each.

    Returns ``(s, R, t)`` with ``dst ≈ s·R·src + t``.
    """
    mu_s = jnp.mean(src, axis=0)
    mu_d = jnp.mean(dst, axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / src.shape[0]
    u, d, vt = jnp.linalg.svd(cov)
    sgn = jnp.sign(jnp.linalg.det(u @ vt))
    s_mat = jnp.diag(jnp.asarray([1.0, 1.0, sgn], cov.dtype))
    rot = u @ s_mat @ vt
    if with_scale:
        var_s = jnp.mean(jnp.sum(xs * xs, axis=-1))
        scale = jnp.sum(d * jnp.asarray([1.0, 1.0, sgn], cov.dtype)) / jnp.maximum(
            var_s, 1e-12
        )
    else:
        scale = jnp.asarray(1.0, cov.dtype)
    t = mu_d - scale * rot @ mu_s
    return scale, rot, t


def absolute_trajectory_error(
    est_rotations,
    est_translations,
    gt_rotations,
    gt_translations,
    with_scale: bool = True,
):
    """ATE RMSE after Umeyama alignment of camera centers.

    ``with_scale=True`` is the monocular convention (scale is
    unobservable). Returns a scalar RMSE in ground-truth units.
    """
    est_c = camera_centers(est_rotations, est_translations)
    gt_c = camera_centers(gt_rotations, gt_translations)
    s, rot, t = umeyama_alignment(est_c, gt_c, with_scale)
    aligned = s * est_c @ rot.T + t
    err2 = jnp.sum((aligned - gt_c) ** 2, axis=-1)
    return jnp.sqrt(jnp.mean(err2))


def relative_pose_error(est_rotations, est_translations, gt_rotations, gt_translations):
    """Frame-to-frame relative translation drift RMSE (scale-aligned)."""
    est_c = camera_centers(est_rotations, est_translations)
    gt_c = camera_centers(gt_rotations, gt_translations)
    d_est = est_c[1:] - est_c[:-1]
    d_gt = gt_c[1:] - gt_c[:-1]
    num = jnp.sum(jnp.sum(d_est * d_gt, axis=-1))
    den = jnp.maximum(jnp.sum(jnp.sum(d_est * d_est, axis=-1)), 1e-12)
    s = num / den
    err2 = jnp.sum((s * d_est - d_gt) ** 2, axis=-1)
    return jnp.sqrt(jnp.mean(err2))
