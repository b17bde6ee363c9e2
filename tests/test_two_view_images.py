"""Image-driven two-view pipeline (BASELINE config[2], end to end).

Renders a 3-D Gaussian-blob field from two viewpoints with real
parallax, then runs the FULL pipeline on pixels only: detect+describe →
ratio/mutual matching → RANSAC essential → pose recovery → triangulation
— and checks the recovered relative pose and structure against ground
truth (up to the monocular scale gauge).
"""

import numpy as np
import jax
import jax.numpy as jnp

from sift_scale_space_extrema_detection_tpu import (
    SiftConfig,
    detect_and_describe,
    estimate_essential_ransac,
    match_descriptors,
)
from sift_scale_space_extrema_detection_tpu.sfm import geometry as geo
from sift_scale_space_extrema_detection_tpu.utils.synthetic import (
    render_blob_image,
    textured_blob_field,
)


def test_two_view_pose_from_images():
    rng = np.random.default_rng(0)
    w, h = 320, 240
    k_mat = np.array([[260.0, 0, w / 2], [0, 260.0, h / 2], [0, 0, 1.0]])

    # Blob field: spread in depth for parallax.
    n_pts = 90
    pts = rng.uniform([-2.2, -1.6, 4.0], [2.2, 1.6, 9.0], size=(n_pts, 3))

    r1, t1 = np.eye(3), np.zeros(3)
    r2 = np.asarray(geo.so3_exp(jnp.asarray([0.02, -0.08, 0.01])))
    t_dir = np.array([-0.8, 0.05, 0.1])
    t2 = -r2 @ (-(r2.T @ t_dir))  # == t_dir; keep explicit form
    t2 = t_dir

    rpts, amps, sscales = textured_blob_field(rng, pts)
    img1 = render_blob_image(
        rpts, r1, t1, k_mat, (w, h), amplitudes=amps, sigma_scales=sscales, rng=rng
    )
    img2 = render_blob_image(
        rpts, r2, t2, k_mat, (w, h), amplitudes=amps, sigma_scales=sscales, rng=rng
    )

    cfg = SiftConfig(num_octaves=3, max_keypoints_per_trio=256)
    d1 = detect_and_describe(jnp.asarray(img1, jnp.float32), cfg)
    d2 = detect_and_describe(jnp.asarray(img2, jnp.float32), cfg)
    n1, n2 = int(d1.valid.sum()), int(d2.valid.sum())
    assert n1 > 20 and n2 > 20, (n1, n2)

    m = match_descriptors(d1.descriptor, d1.valid, d2.descriptor, d2.valid)
    mv = np.asarray(m.valid)
    assert mv.sum() >= 15, mv.sum()

    ia = np.where(mv)[0]
    ib = np.asarray(m.index)[mv]
    uv1 = np.stack([np.asarray(d1.abs_x)[ia], np.asarray(d1.abs_y)[ia]], -1)
    uv2 = np.stack([np.asarray(d2.abs_x)[ib], np.asarray(d2.abs_y)[ib]], -1)
    rays1 = np.asarray(geo.backproject(jnp.asarray(uv1), jnp.asarray(k_mat)))
    rays2 = np.asarray(geo.backproject(jnp.asarray(uv2), jnp.asarray(k_mat)))

    res = estimate_essential_ransac(
        jnp.asarray(rays1, jnp.float32),
        jnp.asarray(rays2, jnp.float32),
        jnp.ones(len(ia), bool),
        jax.random.PRNGKey(0),
        num_hypotheses=256,
        inlier_threshold=2.0 / 260.0,  # 2 px
    )
    assert int(res.num_inliers) >= 12

    # Pose: rotation within 1°, translation direction within ~4°.
    r_err = np.asarray(res.rotation) @ r2.T
    ang = np.degrees(np.arccos(np.clip((np.trace(r_err) - 1) / 2, -1, 1)))
    assert ang < 1.0, f"rotation error {ang:.2f} deg"
    t_est = np.asarray(res.translation)
    cos_t = abs(float(t_est @ (t_dir / np.linalg.norm(t_dir))))
    assert cos_t > 0.995, f"translation cos {cos_t:.4f}"  # within ~5.7°

    # Triangulate inliers and compare depths (up to global scale).
    inl = np.asarray(res.inliers)
    tri, depths = geo.triangulate_midpoint(
        jnp.eye(3),
        jnp.zeros(3),
        res.rotation,
        res.translation,
        jnp.asarray(rays1[inl]),
        jnp.asarray(rays2[inl]),
    )
    assert bool(np.all(np.asarray(depths) > 0))
    # Depth ratios vs true depths of the matched blobs: scale-consistent.
    # Associate matched keypoints to true blobs by projected position.
    xc = pts  # cam1 frame == world
    proj = xc[:, :2] / xc[:, 2:3] * 260.0 + [w / 2, h / 2]
    true_z = []
    for u, v in uv1[inl]:
        d2_all = ((proj - [u, v]) ** 2).sum(-1)
        true_z.append(xc[np.argmin(d2_all), 2])
    true_z = np.array(true_z)
    est_z = np.asarray(depths)[:, 0]
    ratio = est_z / true_z
    # Triangulated depth error grows as z²/(f·baseline) and the blob
    # association is nearest-projection (satellites can alias), so use a
    # robust criterion: most ratios within 10% of the median scale.
    med = np.median(ratio)
    frac_consistent = np.mean(np.abs(ratio / med - 1.0) < 0.1)
    assert frac_consistent > 0.75, (
        f"only {frac_consistent:.2f} of depth ratios near median {med:.3f}"
    )
