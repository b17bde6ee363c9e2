"""Multi-device scaling efficiency on a virtual CPU mesh.

Real multi-chip hardware is not reachable from this environment (one
tunneled TPU chip), so scaling is measured the way the test suite
validates sharding: N virtual CPU devices via
``--xla_force_host_platform_device_count`` (SURVEY.md §4). Numbers are
RELATIVE — the point is parallel efficiency of the sharded programs
(DP frontend, landmark-sharded BA), not absolute CPU speed.

Run: ``python benchmarks/scaling_bench.py [--devices 8]``.

Caveat: virtual devices share one host's cores, so ideal scaling is
bounded by core count and memory bandwidth, not ICI — treat the
efficiency numbers as a lower bound on what real chips (independent
HBM + compute per device) would reach; the collective topology
(`psum` over the mesh axis) is identical. The report therefore
includes ``host_cores`` and the single-device CPU utilization: a
program that already keeps ``u`` cores busy on one virtual device has
a hard wall-clock speedup ceiling of ``cores/u`` no matter how well
the sharded program divides work (measured here: BA keeps ~2.6 of 4
cores busy single-device → ceiling ~1.5x, and the sharded run sits at
it; the frontend is dispatch-bound single-device and reaches ~7x).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--batch-per-device", type=int, default=2)
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, ".")
    from benchmarks.ba_bench import make_problem
    from sift_scale_space_extrema_detection_tpu import SiftConfig
    from sift_scale_space_extrema_detection_tpu.parallel import (
        detect_and_describe_data_parallel,
        distributed_bundle_adjust,
        make_mesh,
    )

    assert len(jax.devices()) >= args.devices

    def sync(x):
        return float(np.asarray(jnp.sum(jnp.asarray(x, jnp.float32))))

    results = {"host_cores": os.cpu_count()}

    # --- data-parallel frontend --------------------------------------
    cfg = SiftConfig(num_octaves=2, max_keypoints_per_trio=128)
    rng = np.random.default_rng(0)
    img = rng.random((args.batch_per_device * args.devices, 120, 160)).astype(
        np.float32
    )
    for n_dev in (1, args.devices):
        print(f"frontend {n_dev}dev...", file=sys.stderr, flush=True)
        mesh = make_mesh(n_dev)
        batch = img[: args.batch_per_device * n_dev]
        out = detect_and_describe_data_parallel(
            jnp.asarray(batch), cfg, mesh
        )
        sync(out.abs_sigma)  # compile+run
        t0 = time.perf_counter()
        for _ in range(3):
            out = detect_and_describe_data_parallel(jnp.asarray(batch), cfg, mesh)
            sync(out.abs_sigma)
        dt = (time.perf_counter() - t0) / 3
        results[f"frontend_fps_{n_dev}dev"] = round(batch.shape[0] / dt, 2)

    eff = results[f"frontend_fps_{args.devices}dev"] / (
        results["frontend_fps_1dev"] * args.devices
    )
    results["frontend_scaling_efficiency"] = round(eff, 3)

    # --- landmark-sharded distributed BA ------------------------------
    # Big enough that each of the 8 shards holds a real landmark block
    # (2048 landmarks/8 = 256/device measured 10% efficiency — psum
    # latency dominated; 32k/8 = 4k/device is a realistic SLAM map).
    state, obs = make_problem(np.random.default_rng(0), 48, 32768, 512)
    busy_1dev = None
    for n_dev in (1, args.devices):
        print(f"ba {n_dev}dev...", file=sys.stderr, flush=True)
        mesh = make_mesh(n_dev)
        _, cost = distributed_bundle_adjust(state, obs, mesh, num_iterations=5)
        float(cost)
        t0, c0 = time.perf_counter(), time.process_time()
        for _ in range(3):
            _, cost = distributed_bundle_adjust(
                state, obs, mesh, num_iterations=5
            )
            float(cost)
        dt = (time.perf_counter() - t0) / 3
        if n_dev == 1:
            busy_1dev = (time.process_time() - c0) / (3 * dt)
        results[f"ba_iters_per_s_{n_dev}dev"] = round(5 / dt, 2)

    speedup = (
        results[f"ba_iters_per_s_{args.devices}dev"]
        / results["ba_iters_per_s_1dev"]
    )
    results["ba_speedup"] = round(speedup, 2)
    results["ba_scaling_efficiency"] = round(speedup / args.devices, 3)
    # Hard wall-clock ceiling on shared cores: 1-device BA already uses
    # busy_1dev cores, so N virtual devices can at best reach
    # cores/busy_1dev x. Real chips have no such ceiling.
    ceiling = max(results["host_cores"] / max(busy_1dev, 1e-6), 1.0)
    results["ba_1dev_cores_busy"] = round(busy_1dev, 2)
    results["ba_speedup_vs_core_ceiling"] = round(min(speedup / ceiling, 1.0), 3)
    # --- composed end-to-end SLAM (VERDICT round-2 item #5) -----------
    # The full pipeline — DP frontend, keyframe-sharded window matching,
    # landmark-sharded BA — composed through run_slam_from_images, at
    # 1 vs N devices on identical inputs. The per-frame geometric
    # backend is host-sequential by nature, so the composed efficiency
    # is bounded by the sharded fraction (Amdahl), not a bug.
    from benchmarks.slam_bench import render_sequence
    from sift_scale_space_extrema_detection_tpu.models.slam import (
        SlamConfig,
        evaluate_ate,
        run_slam_from_images,
    )

    # 16 frames: divisible by the device count, so the 8-device arm
    # runs the SAME total frontend work (the earlier 12-frame config
    # padded 12 → 2×8 on the mesh — +33 % work on a core-bound host,
    # which read as "sharding made it slower"). Stage attribution
    # (round 4): the frontend is 76–92 % of composed wall-clock here,
    # and XLA:CPU intra-op parallelism already saturates all 4 host
    # cores at 1 device — so the composed ceiling on shared cores is
    # ~1.0x by construction; real chips (own cores/HBM per device) are
    # where the DP frontend's sharding pays (dryrun_multichip compiles
    # and runs that path; the per-component rows above isolate what
    # CAN be measured here).
    n_frames = 16
    rng = np.random.default_rng(1)
    images, gt_r, gt_t, k_mat = render_sequence(rng, n_frames, 320, 240)
    s_cfg = SiftConfig(num_octaves=3, max_keypoints_per_trio=256)
    sl_cfg = SlamConfig(ba_interval=4, ba_window=6)
    for n_dev in (1, args.devices):
        print(f"composed slam {n_dev}dev...", file=sys.stderr, flush=True)
        mesh = make_mesh(n_dev)
        kw = dict(
            mesh=mesh, reassoc_window=2, blur="separable",
            frontend_chunk=max(1, n_frames // n_dev),
        )
        run_slam_from_images(images, k_mat, s_cfg, sl_cfg, **kw)  # compile
        t0 = time.perf_counter()
        res = run_slam_from_images(images, k_mat, s_cfg, sl_cfg, **kw)
        dt = time.perf_counter() - t0
        results[f"composed_slam_fps_{n_dev}dev"] = round(
            images.shape[0] / dt, 3
        )
        if n_dev == args.devices:
            results["composed_slam_ate"] = round(
                evaluate_ate(res, gt_r, gt_t), 4
            )
    results["composed_slam_speedup"] = round(
        results[f"composed_slam_fps_{args.devices}dev"]
        / results["composed_slam_fps_1dev"],
        2,
    )

    results["devices"] = args.devices
    results["note"] = "virtual CPU mesh; relative parallel efficiency"
    print(json.dumps(results))


if __name__ == "__main__":
    main()
