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


def relative_pose_error(
    est_rotations,
    est_translations,
    gt_rotations,
    gt_translations,
    delta: int = 1,
    with_scale: bool = True,
):
    """Translational RPE, TUM ``evaluate_rpe.py`` protocol.

    Per pair ``(i, i+delta)`` the error motion is
    ``E_i = (Q_i⁻¹ Q_{i+δ})⁻¹ (P_i⁻¹ P_{i+δ})`` (Q ground truth, P
    estimate, both cam→world); reported value is the RMSE of
    ``‖trans(E_i)‖``, which reduces to ``‖R_i^est·(c_{i+δ}−c_i)^est −
    R_i^gt·(c_{i+δ}−c_i)^gt‖`` for world→camera inputs. A monocular
    estimate is pre-scaled by the Umeyama similarity scale of the
    ATE alignment (the official script's ``--scale`` argument);
    ``with_scale=False`` skips that.
    """
    est_c = camera_centers(est_rotations, est_translations)
    gt_c = camera_centers(gt_rotations, gt_translations)
    if with_scale:
        s, _, _ = umeyama_alignment(est_c, gt_c)
    else:
        s = jnp.asarray(1.0, est_c.dtype)
    tb = s * jnp.einsum(
        "nij,nj->ni", est_rotations[:-delta], est_c[delta:] - est_c[:-delta]
    )
    ta = jnp.einsum(
        "nij,nj->ni", gt_rotations[:-delta], gt_c[delta:] - gt_c[:-delta]
    )
    err2 = jnp.sum((tb - ta) ** 2, axis=-1)
    return jnp.sqrt(jnp.mean(err2))


def relative_rotation_error(
    est_rotations, gt_rotations, delta: int = 1
):
    """Rotational RPE (radians, RMSE): angle of ``rot(E_i)`` per pair
    ``(i, i+delta)`` under the TUM protocol (scale-free)."""
    rb = jnp.einsum(
        "nij,nkj->nik", est_rotations[:-delta], est_rotations[delta:]
    )  # R_i·R_{i+δ}ᵀ (estimate)
    ra = jnp.einsum(
        "nij,nkj->nik", gt_rotations[:-delta], gt_rotations[delta:]
    )
    rel = jnp.einsum("nji,njk->nik", ra, rb)  # Raᵀ·Rb
    cos = jnp.clip(
        (jnp.trace(rel, axis1=-2, axis2=-1) - 1.0) / 2.0, -1.0, 1.0
    )
    ang = jnp.arccos(cos)
    return jnp.sqrt(jnp.mean(ang * ang))
