"""Synthetic SLAM sequences: scenes, trajectories, and measurements.

This environment has no network access, so TUM-RGBD/KITTI sequences
cannot be downloaded; the SLAM stack is validated on synthetic sequences
with known ground truth instead (BASELINE.json configs[3-4] ATE bounds
are asserted against these). The generator mimics the relevant dataset
properties: smooth 6-DOF trajectories, bounded-FOV visibility, pixel
noise, outlier matches, and landmark churn.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..sfm import geometry as geo

import jax.numpy as jnp


@dataclasses.dataclass
class SyntheticSequence:
    rotations: np.ndarray  # (F, 3, 3) world→camera
    translations: np.ndarray  # (F, 3)
    points: np.ndarray  # (L, 3) world landmarks
    k_mat: np.ndarray  # (3, 3)
    # Per frame: (L,) visibility mask + (L, 2) pixel measurements
    visible: np.ndarray  # (F, L) bool
    pixels: np.ndarray  # (F, L, 2)
    is_outlier: np.ndarray  # (F, L) bool (measurement corrupted)


def orbit_sequence(
    rng: np.random.Generator,
    num_frames: int = 50,
    num_landmarks: int = 400,
    radius: float = 8.0,
    noise_px: float = 0.4,
    outlier_frac: float = 0.02,
    image_size: tuple[int, int] = (640, 480),
    focal: float = 500.0,
) -> SyntheticSequence:
    """Camera orbiting a point cloud, always looking at the origin."""
    w, h = image_size
    k_mat = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1.0]])
    pts = rng.uniform([-3, -3, -3], [3, 3, 3], size=(num_landmarks, 3))

    rots, ts = [], []
    for f in range(num_frames):
        ang = 0.7 * 2 * np.pi * f / num_frames
        center = np.array(
            [
                radius * np.sin(ang),
                1.5 * np.sin(2.2 * ang),
                -radius * np.cos(ang),
            ]
        )
        # Look-at: camera z-axis toward origin.
        fwd = -center / np.linalg.norm(center)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        r = np.stack([right, up2, fwd])  # rows = camera axes
        t = -r @ center
        rots.append(r)
        ts.append(t)
    rots = np.stack(rots)
    ts = np.stack(ts)

    visible = np.zeros((num_frames, num_landmarks), bool)
    pixels = np.zeros((num_frames, num_landmarks, 2))
    is_outlier = np.zeros((num_frames, num_landmarks), bool)
    for f in range(num_frames):
        xc = pts @ rots[f].T + ts[f]
        z = xc[:, 2]
        uv = np.empty((num_landmarks, 2))
        np.divide(xc[:, 0], z, out=uv[:, 0], where=z != 0)
        np.divide(xc[:, 1], z, out=uv[:, 1], where=z != 0)
        uv = uv * focal + [w / 2, h / 2]
        ok = (z > 0.5) & (uv[:, 0] >= 0) & (uv[:, 0] < w) & (uv[:, 1] >= 0) & (uv[:, 1] < h)
        uv = uv + noise_px * rng.normal(size=uv.shape)
        out_mask = ok & (rng.random(num_landmarks) < outlier_frac)
        uv[out_mask] = rng.uniform([0, 0], [w, h], size=(out_mask.sum(), 2))
        visible[f] = ok
        pixels[f] = uv
        is_outlier[f] = out_mask

    return SyntheticSequence(
        rotations=rots,
        translations=ts,
        points=pts,
        k_mat=k_mat,
        visible=visible,
        pixels=pixels,
        is_outlier=is_outlier,
    )
