"""Benchmark: batched SIFT frontend frames/s per chip (BASELINE.json config[1]).

Measures steady-state throughput of the full batched detection pipeline
(Gaussian pyramid -> DoG -> extrema -> refinement) at 640x480 with
4 octaves / 5 scales per octave over a 64-image batch, float32, on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numbers (readme.md:1-29; see
BASELINE.md). The recorded baseline is the measured wall-clock of this
repo's reference-exact oracle (utils/oracle.py — which replays the JS
algorithm with numpy-vectorized taps, i.e. strictly faster than the JS
per-pixel loops) on one 640x480 frame at the same 4-octave/5-scale
config on this machine's host CPU: see ORACLE_BASELINE_FPS below.
"""

from __future__ import annotations

import json
import time

import numpy as np

# Measured 2026-08-16 via utils/oracle.py on a 640x480 synthetic frame,
# octaves=4 spo=5 (single-core host CPU, numpy-vectorized reference
# semantics): 10.58 s/frame. The JS original (scalar per-pixel loops,
# full 2-D kernels) is strictly slower than this vectorized replay.
ORACLE_BASELINE_FPS = 0.0945


def _make_batch(batch: int, h: int, w: int) -> np.ndarray:
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = 0.4 + 0.2 * np.sin(xx / 9.0) * np.cos(yy / 11.0)
    for cy, cx, r, a in [
        (120, 160, 6.0, 0.5),
        (300, 400, 10.0, -0.35),
        (200, 520, 4.0, 0.45),
        (380, 100, 8.0, 0.3),
    ]:
        base = base + a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * r * r))
    imgs = base[None] + 0.05 * rng.standard_normal((batch, h, w))
    return (np.round(np.clip(imgs, 0.0, 1.0) * 255.0) / 255.0).astype(np.float32)


def main() -> None:
    import os
    import sys
    import threading

    # Watchdog: initializing the tunneled axon backend blocks forever
    # (not an exception) when the relay's TPU leg is down — observed
    # 2026-08-18. Fail loudly after 15 min instead of hanging the
    # driver; warmup (backend init + first compile) normally takes
    # 2-4 min.
    warmed = threading.Event()

    def _watchdog() -> None:
        if not warmed.wait(900):
            print(
                "bench.py: TPU backend init/compile did not complete "
                "within 900 s — the axon tunnel is likely down; aborting",
                file=sys.stderr,
                flush=True,
            )
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax

    # Persistent compilation cache: first-compile through the tunneled
    # TPU backend is minutes; cached reruns are seconds.
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sift_scale_space_extrema_detection_tpu import SiftConfig, detect_batched_jit

    batch, h, w = 64, 480, 640
    cfg = SiftConfig(
        num_octaves=4, scales_per_octave=5, max_keypoints_per_trio=512
    )
    images = jax.device_put(_make_batch(batch, h, w))

    def sync(kp) -> float:
        # Force a device->host transfer of a scalar reduction: on the
        # axon-tunneled TPU backend, block_until_ready alone has been
        # observed to return before execution completes.
        import jax.numpy as jnp

        return float(np.asarray(jnp.sum(kp.abs_sigma)))

    # Warmup / compile. Blur strategy: the fused whole-octave Pallas
    # kernel (all scales + DoG from ONE HBM read of the octave base;
    # Gaussian stacks never leave the chip on the detect path) is the
    # fastest accurate path: 64x480p pyramid+DoG 83 ms vs 243 ms for the
    # round-1 per-scale striped kernel. Exact f32.
    #
    # Fallback ladder: if Mosaic ever rejects the double-buffered DMA
    # form of the kernel (toolchain drift), retry with the serialized
    # copy; if the kernel fails outright, drop to the pure-XLA matmul
    # path rather than failing the benchmark.
    blur = "fused"
    try:
        keypoints, _ = detect_batched_jit(images, cfg, blur)
        sync(keypoints)
    except Exception as exc:  # Mosaic/compile failure, not OOM-safe paths
        print(f"bench.py: fused path failed ({exc!r});", file=sys.stderr)
        from sift_scale_space_extrema_detection_tpu.ops.pallas import octave

        try:
            octave.DOUBLE_BUFFER_DMA = False
            jax.clear_caches()
            print(
                "bench.py: retrying with serialized stripe DMA",
                file=sys.stderr,
            )
            keypoints, _ = detect_batched_jit(images, cfg, blur)
            sync(keypoints)
        except Exception as exc2:
            print(
                f"bench.py: fused kernel unusable ({exc2!r}); "
                "falling back to blur='matmul'",
                file=sys.stderr,
            )
            blur = "matmul"
            keypoints, _ = detect_batched_jit(images, cfg, blur)
            sync(keypoints)
    warmed.set()

    # Sustained throughput: dispatch all iterations back-to-back and
    # sync ONCE on the on-device sum of per-batch scalars. Each host
    # transfer costs a ~30 ms tunnel round-trip even when the value is
    # already computed (measured: a trivial jit dispatch+sync costs
    # ~30 ms through the axon relay regardless of work) — that is
    # client latency, not chip time; serving pipelines dispatch. The
    # single end-of-loop sync keeps the timing honest (every result
    # feeds the materialized scalar), and the measured launch latency
    # is subtracted so the number is per-chip throughput.
    import jax.numpy as jnp

    def _run_all(n):
        acc = []
        for _ in range(n):
            kp, _ = detect_batched_jit(images, cfg, blur)
            acc.append(jnp.sum(kp.abs_sigma))
        return float(np.asarray(sum(acc)))

    # Launch+sync round-trip latency (subtracted below).
    tiny = jax.jit(lambda v: v + 1.0)
    t8 = jnp.zeros((8, 128), jnp.float32)
    float(np.asarray(jnp.sum(tiny(t8))))
    lats = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(np.asarray(jnp.sum(tiny(t8))))
        lats.append(time.perf_counter() - t0)
    t_launch = float(np.median(lats))

    iters = 6
    _run_all(2)  # the first post-compile run measures ~1.7x steady state
    t0 = time.perf_counter()
    _run_all(iters)
    t1 = time.perf_counter()

    keypoints, _ = detect_batched_jit(images, cfg, blur)
    fps = batch * iters / max(t1 - t0 - t_launch, 1e-9)
    n_kp = int(np.asarray(jnp.sum(keypoints.valid.astype(jnp.int32))))
    baseline = ORACLE_BASELINE_FPS
    print(
        json.dumps(
            {
                "metric": "sift_frontend_frames_per_s_per_chip",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline, 2),
                "keypoints_per_s": round(fps * n_kp / batch, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
