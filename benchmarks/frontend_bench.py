"""Frontend stage breakdown + HBM roofline accounting (single chip).

Answers "is the pyramid at speed-of-light?" with numbers instead of
adjectives (BASELINE.md targets: Gaussian/DoG kernels at
speed-of-light per chip). Measures, on the bench config
(64 x 640x480, 4 octaves / 5 scales per octave, float32):

1. pyramid+DoG(+extrema masks) alone — the fused whole-octave Pallas
   kernel path (ops/pallas/octave.py) — against its ideal HBM traffic
   model, reporting achieved GB/s vs the chip's peak;
2. the full detection pipeline (pyramid -> extrema -> refine), giving
   the detection-tail time by subtraction;
3. frames/s and keypoints/s per chip.

Run: ``python benchmarks/frontend_bench.py [--batch 64]``.

Traffic model for the detect path (per octave, B images of H x W f32,
S scales, T = S-3 mask trios): the kernel reads each input stripe once
with halo overlap (~1.05x the base plane), writes S-1 DoG planes, one
seed plane, and ONE packed int32 mask plane (2-bit code per trio); the
XLA-side selection re-reads the packed plane once (the candidate picks
decode it in-register — ops/extrema.py::_first_k_candidates_packed —
so no unpacked bool volume exists; the DoG value gather is
~capacity-sized, negligible). Octave o has 4^-o as many pixels; the
2x-upsampled base doubles the octave-0 linear dims
(reference/background.js:84).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

# Peak HBM bandwidth of one v5e chip (public spec: 819 GB/s).
V5E_HBM_GBPS = 819.0
# Empirical sustained streaming rates measured on THIS chip by
# benchmarks/bw_probe.py (2026-08-19, dispatch-latency-subtracted):
# Pallas write 885 GB/s, read+write copy 682 GB/s combined, read-reduce
# 242 GB/s. Round 2's "~100 GB/s effective writes" was a measurement
# artifact — every per-call sync paid a ~30 ms tunnel round-trip. The
# floor below uses the copy rate (mixed read+write stream), the shape
# of the fused kernel's traffic. Re-run bw_probe.py on any new
# chip/toolchain and update these.
MEASURED_STREAM_GBPS = 682.0


def make_batch(batch: int, h: int, w: int) -> np.ndarray:
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


def detect_traffic_bytes(
    batch: int, h: int, w: int, cfg, dog_bytes: int = 4
) -> int:
    """Ideal HBM bytes for the detect-path pyramid+DoG+masks build.

    ``dog_bytes``: stored bytes/px of the DoG planes (2 in the
    bf16-compressed mode).
    """
    total = 0
    bh, bw = 2 * h, 2 * w  # 2x NN upsample (reference/background.js:84)
    s = cfg.scales_per_octave_total
    mask_bytes = 2 if (s - 3) <= 8 else 4  # int16-packed trio codes
    for _ in range(cfg.num_octaves):
        px = batch * bh * bw
        plane = 4 * px
        read_base = int(1.05 * plane)  # stripe halo overlap ~5%
        # (S-1) DoG planes at dog_bytes + f32 seed + packed mask plane.
        write = (s - 1) * dog_bytes * px + plane + mask_bytes * px
        # Selection: one re-read of the packed plane (candidates decode
        # from it in-register; no unpacked volume is materialized).
        reread = mask_bytes * px
        total += read_base + write + reread
        bh //= 2
        bw //= 2
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument(
        "--blur",
        default="fused",
        choices=["fused", "separable", "matmul"],
        help="pyramid strategy (fused = production TPU kernel path)",
    )
    ap.add_argument(
        "--stages",
        action="store_true",
        help="also time candidate selection and refinement separately",
    )
    ap.add_argument(
        "--unified",
        action="store_true",
        help="one cross-octave refinement pass (cfg.unified_refine)",
    )
    ap.add_argument(
        "--profile",
        default=None,
        metavar="DIR",
        help="dump a jax.profiler (Perfetto) trace of one timed "
        "iteration to DIR",
    )
    ap.add_argument(
        "--describe",
        action="store_true",
        help="also time the detect+describe path (orientations + 128-D "
        "descriptors) — BASELINE config[2]'s throughput leg",
    )
    ap.add_argument(
        "--octaves", type=int, default=4, help="num_octaves (bench default 4)"
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from sift_scale_space_extrema_detection_tpu import SiftConfig
    from sift_scale_space_extrema_detection_tpu.models.frontend import (
        build_pyramid_fused,
        detect_batched_jit,
    )

    batch, h, w = args.batch, 480, 640
    cfg = SiftConfig(
        num_octaves=args.octaves,
        scales_per_octave=5,
        max_keypoints_per_trio=512,
    )
    if args.unified:
        import dataclasses

        cfg = dataclasses.replace(cfg, unified_refine=True)
    images = jax.device_put(make_batch(batch, h, w))

    def sync_scalar(x) -> float:
        # Host transfer of a scalar reduction: block_until_ready alone
        # does not reliably sync on the tunneled TPU backend.
        return float(np.asarray(x))

    # Fixed dispatch+sync round-trip latency (measured ~30 ms through
    # the axon tunnel — see bw_probe.py). All timed loops below dispatch
    # every iteration back-to-back and sync ONCE, then subtract this,
    # so stage times are sustained-throughput numbers, not
    # latency-dominated ones (round 2's per-iteration syncs overstated
    # the pyramid stage by ~30 ms).
    _tiny = jax.jit(lambda v: v + 1.0)
    _t8 = jax.device_put(np.zeros((8, 128), np.float32))
    sync_scalar(jnp.sum(_tiny(_t8)))
    _lat = []
    for _ in range(5):
        _t0 = time.perf_counter()
        sync_scalar(jnp.sum(_tiny(_t8)))
        _lat.append(time.perf_counter() - _t0)
    t_launch = float(np.median(_lat))

    def time_sustained(thunk) -> float:
        """Per-iteration seconds: dispatch args.iters thunks, sync once.

        ``thunk()`` must return a scalar-reducible device value.
        """
        outs = [thunk() for _ in range(args.iters)]
        sync_scalar(sum(outs))  # warm-up pass is the caller's job
        t0 = time.perf_counter()
        outs = [thunk() for _ in range(args.iters)]
        sync_scalar(sum(outs))
        return max((time.perf_counter() - t0) - t_launch, 1e-9) / args.iters

    # --- full pipeline (measured FIRST: measuring the pyramid stage
    # first was observed to leave the allocator in a state that slowed
    # the full-pipeline executable ~1.6x) ------------------------------
    for _ in range(2):  # compile + first-run warm-up
        kp, _ = detect_batched_jit(images, cfg, args.blur)
        sync_scalar(jnp.sum(kp.abs_sigma))
    # Keypoint count OUTSIDE the timed loop: its astype+sum eager ops
    # have their own first-call compile cost (~190 ms once) that would
    # pollute a short timed loop.
    n_kp = int(sync_scalar(jnp.sum(kp.valid.astype(jnp.int32))))
    if args.profile:
        with jax.profiler.trace(args.profile):
            kp, _ = detect_batched_jit(images, cfg, args.blur)
            sync_scalar(jnp.sum(kp.abs_sigma))
        print(f"profiler trace -> {args.profile}", file=sys.stderr)
    def _full():
        kp, _ = detect_batched_jit(images, cfg, args.blur)
        return jnp.sum(kp.abs_sigma)

    total_s = time_sustained(_full)

    # --- stage: pyramid + DoG + masks alone (detect path) ---------------
    @jax.jit
    def pyramid_only(imgs):
        import jax.numpy as _jnp

        _, dogs, masks = build_pyramid_fused(
            imgs, cfg, emit_scales=False, emit_masks=True,
            flat_detect=True,
        )
        return sum(jnp.sum(d[..., ::64, ::64]) for d in dogs) + sum(
            jnp.sum(m[..., ::64, ::64]) for m in masks
        )

    # Two warm-ups: compile + first post-compile run (the first run
    # after compilation measures ~1.7x steady state on the tunneled
    # backend).
    sync_scalar(pyramid_only(images))
    pyr_s = time_sustained(lambda: pyramid_only(images))

    # --- optional finer tail split: selection vs refinement --------------
    sel_s = ref_s = None
    if args.stages:
        from sift_scale_space_extrema_detection_tpu.models.frontend import (
            _dog_pyramid,
        )
        from sift_scale_space_extrema_detection_tpu.ops.extrema import (
            select_refine_candidates,
        )
        from sift_scale_space_extrema_detection_tpu.ops.refine import (
            refine_keypoints,
        )

        # Materialize the pyramid once; time selection and refinement
        # separately against it (all per-image work vmapped like the
        # production path).
        dogs, masks = _dog_pyramid(images, cfg, args.blur)
        dogs = [jax.block_until_ready(d) for d in dogs]
        if any(m is None for m in masks):
            raise SystemExit(
                "--stages needs the fused mask path (TPU/interpret only)"
            )

        @jax.jit
        def select_only(*arrs):
            n = len(arrs) // 2
            out = []
            for o in range(n):
                sel = jax.vmap(
                    lambda m, d, o=o: select_refine_candidates(
                        m, d, cfg, cfg.refine_capacity(o)
                    )
                )(arrs[n + o], arrs[o])
                out.append(jnp.sum(sel.y) + jnp.sum(sel.valid))
            return sum(out)

        @jax.jit
        def select_and_refine(*arrs):
            n = len(arrs) // 2
            out = []
            for o in range(n):
                def one(m, d, o=o):
                    sel = select_refine_candidates(
                        m, d, cfg, cfg.refine_capacity(o)
                    )
                    ih = m.shape[-2] if d.ndim == 4 else None
                    kp = refine_keypoints(d, sel, o, cfg, image_h=ih)
                    return jnp.sum(kp.abs_sigma)
                out.append(jnp.sum(jax.vmap(one)(arrs[n + o], arrs[o])))
            return sum(out)

        arrs = tuple(dogs) + tuple(masks)
        for fn in (select_only, select_and_refine):
            sync_scalar(fn(*arrs))
        sel_s = time_sustained(lambda: select_only(*arrs))
        ref_s = time_sustained(lambda: select_and_refine(*arrs)) - sel_s

    # --- detect + describe (config[2]'s throughput leg) ------------------
    desc_s = n_desc = None
    if args.describe:
        from sift_scale_space_extrema_detection_tpu.models.frontend import (
            detect_and_describe_batched_jit,
        )

        for _ in range(2):
            dd = detect_and_describe_batched_jit(images, cfg, args.blur)
            sync_scalar(jnp.sum(dd.abs_sigma))
        n_desc = int(sync_scalar(jnp.sum(dd.valid.astype(jnp.int32))))

        def _desc():
            dd = detect_and_describe_batched_jit(images, cfg, args.blur)
            return jnp.sum(dd.abs_sigma)

        desc_s = time_sustained(_desc)

    ideal_bytes = detect_traffic_bytes(
        batch, h, w, cfg,
    )
    ideal_s = ideal_bytes / (V5E_HBM_GBPS * 1e9)
    achieved_gbps = ideal_bytes / pyr_s / 1e9
    # Floor: the same bytes at the probe-measured mixed-stream rate.
    floor_s = ideal_bytes / (MEASURED_STREAM_GBPS * 1e9)

    tail_s = total_s - pyr_s
    out = {
        "batch": batch,
        "blur": args.blur,
        "pyramid_dog_masks_ms": round(pyr_s * 1e3, 2),
        "ideal_roofline_ms": round(ideal_s * 1e3, 2),
        "measured_bw_floor_ms": round(floor_s * 1e3, 2),
        "achieved_gb_s": round(achieved_gbps, 1),
        "peak_gb_s": V5E_HBM_GBPS,
        "roofline_fraction": round(achieved_gbps / V5E_HBM_GBPS, 3),
        "detection_tail_ms": round(tail_s * 1e3, 2),
        "total_ms": round(total_s * 1e3, 2),
        "frames_per_s": round(batch / total_s, 1),
        "keypoints_per_image": round(n_kp / batch, 1),
        "keypoints_per_s": round(n_kp / total_s, 1),
    }
    if sel_s is not None:
        out["selection_ms"] = round(sel_s * 1e3, 2)
        out["refinement_ms"] = round(ref_s * 1e3, 2)
    if desc_s is not None:
        out["describe_total_ms"] = round(desc_s * 1e3, 2)
        out["describe_frames_per_s"] = round(batch / desc_s, 1)
        out["described_keypoints_per_s"] = round(n_desc / desc_s, 1)
        out["described_keypoints_per_image"] = round(n_desc / batch, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
