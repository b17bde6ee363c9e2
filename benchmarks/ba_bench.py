"""Bundle-adjustment throughput benchmark (single chip).

Measures LM iterations/s of the Schur-complement BA on a synthetic
multi-view problem at SLAM scale, plus the observation-residual
throughput. Run: ``python benchmarks/ba_bench.py [--cams N] [--pts N]``.

The dominant kernels are the per-observation Jacobian builds
(vmapped jacfwd), the segment_sum assembly, and the two Schur einsums
``W·H_ll⁻¹`` (C·L·6·3·3) and ``(W·H_ll⁻¹)·Wᵀ`` (C²·L·6·6·3 FLOPs on the
MXU) — the einsum FLOP model below is reported against the measured time
for a rough fraction-of-peak.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=50)
    ap.add_argument("--pts", type=int, default=4096)
    ap.add_argument("--obs-per-cam", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from sift_scale_space_extrema_detection_tpu.sfm import geometry as geo
    from sift_scale_space_extrema_detection_tpu.sfm.ba import (
        BAState,
        Observations,
        bundle_adjust,
    )

    rng = np.random.default_rng(0)
    c, l, opc = args.cams, args.pts, args.obs_per_cam
    pts = rng.uniform([-4, -4, 6], [4, 4, 14], size=(l, 3)).astype(np.float32)
    k_mat = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)

    rots, ts, cams, lms, uvs = [], [], [], [], []
    for ci in range(c):
        r = np.asarray(geo.so3_exp(jnp.asarray([0.0, 0.02 * ci, 0.0])))
        t = np.array([0.1 * ci, 0, 0], np.float32)
        sel = rng.choice(l, opc, replace=False)
        xc = pts[sel] @ r.T + t
        uv = xc[:, :2] / xc[:, 2:3] * 500.0 + [320, 240]
        uv += 0.5 * rng.normal(size=uv.shape)
        rots.append(r)
        ts.append(t)
        cams.append(np.full(opc, ci))
        lms.append(sel)
        uvs.append(uv)

    state = BAState(
        rotations=jnp.asarray(np.stack(rots), jnp.float32),
        translations=jnp.asarray(np.stack(ts), jnp.float32),
        points=jnp.asarray(
            pts + 0.05 * rng.normal(size=pts.shape).astype(np.float32)
        ),
        k_mat=jnp.asarray(k_mat),
    )
    obs = Observations(
        camera=jnp.asarray(np.concatenate(cams), jnp.int32),
        landmark=jnp.asarray(np.concatenate(lms), jnp.int32),
        uv=jnp.asarray(np.concatenate(uvs), jnp.float32),
        valid=jnp.ones(c * opc, bool),
    )

    # Warm-up / compile.
    out, cost = bundle_adjust(state, obs, num_iterations=args.iters)
    float(jnp.sum(out.points))

    t0 = time.perf_counter()
    out, cost = bundle_adjust(state, obs, num_iterations=args.iters)
    final = float(cost)
    t1 = time.perf_counter()
    dt = t1 - t0
    n_obs = c * opc

    # Schur einsum FLOPs per iteration (dominant dense work).
    flops_iter = 2 * c * l * 6 * 3 * 3 + 2 * c * c * l * 6 * 6 * 3
    print(
        f"BA {c} cams x {l} pts x {n_obs} obs: "
        f"{args.iters / dt:.2f} LM iters/s "
        f"({1e3 * dt / args.iters:.1f} ms/iter, final cost {final:.1f})"
    )
    print(
        f"Schur einsums: {flops_iter / 1e9:.2f} GFLOP/iter -> "
        f"{flops_iter * args.iters / dt / 1e12:.2f} TFLOP/s achieved"
    )


if __name__ == "__main__":
    main()
