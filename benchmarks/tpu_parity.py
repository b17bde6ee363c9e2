"""TPU float32 parity artifact (SURVEY.md §4; VERDICT r4 weak #7).

The pytest suite is CPU-only (environment-imposed), so "the TPU f32
path matches CPU within documented tolerance" was previously enforced
only inside ad-hoc bench A/Bs. This benchmark is the recorded artifact:
a fixed deterministic image set runs through

  - the TPU path as benched (fused Pallas pyramid + TPU detection
    tail + window-DMA describe), and
  - the CPU f32 path (separable blur + XLA gather describe) in the
    same process via ``jax.default_device``,

and emits slot agreement / position deltas / descriptor agreement as
JSON (``TPU_PARITY_r05.json`` at the repo root), asserting the
recorded thresholds:

  - keypoint slot agreement >= 99.9 %  (valid mask + octave + scale)
  - p99 position delta       < 0.1 px (common valid slots)
  - descriptor min cosine    > 0.999  (common valid describe slots)

Run: ``python benchmarks/tpu_parity.py`` (needs the TPU chip).
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import numpy as np

THRESH_AGREEMENT = 0.999
THRESH_P99_PX = 0.1
THRESH_MIN_COS = 0.999


def textured_batch(b, h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    imgs = []
    for k in range(b):
        r = np.random.default_rng(seed * 1000 + k)
        img = 0.5 + 0.1 * np.sin(xx / 6.0 + k) * np.cos(yy / 8.0)
        for _ in range(120):
            cy, cx = r.uniform(8, h - 8), r.uniform(8, w - 8)
            s = r.uniform(1.5, 6.0)
            img += r.uniform(-0.35, 0.35) * np.exp(
                -((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s)
            )
        imgs.append(np.clip(img, 0.0, 1.0))
    return np.stack(imgs)


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sift_scale_space_extrema_detection_tpu import SiftConfig
    from sift_scale_space_extrema_detection_tpu.models.frontend import (
        detect_and_describe_batched_jit,
    )

    assert jax.default_backend() != "cpu", "needs the TPU chip"
    cfg = SiftConfig()
    images = textured_batch(16, 480, 640)

    tpu_out = detect_and_describe_batched_jit(
        jnp.asarray(images), cfg, "fused"
    )
    tpu = {
        k: np.asarray(getattr(tpu_out, k))
        for k in ("valid", "octave", "scale_level", "abs_x", "abs_y",
                  "descriptor")
    }

    cpu_dev = jax.devices("cpu")[0]
    with jax.default_device(cpu_dev):
        cpu_out = detect_and_describe_batched_jit(
            jax.device_put(jnp.asarray(images), cpu_dev), cfg, "separable"
        )
        cpu = {
            k: np.asarray(getattr(cpu_out, k))
            for k in ("valid", "octave", "scale_level", "abs_x", "abs_y",
                      "descriptor")
        }

    slot_eq = (tpu["valid"] == cpu["valid"]) & (
        ~tpu["valid"]
        | ((tpu["octave"] == cpu["octave"])
           & (tpu["scale_level"] == cpu["scale_level"]))
    )
    agreement = float(slot_eq.mean())

    both = tpu["valid"] & cpu["valid"]
    d = np.hypot(
        tpu["abs_x"][both] - cpu["abs_x"][both],
        tpu["abs_y"][both] - cpu["abs_y"][both],
    )
    p99 = float(np.percentile(d, 99)) if d.size else float("nan")
    dt, dc = tpu["descriptor"][both], cpu["descriptor"][both]
    cos = np.sum(dt * dc, -1) / np.maximum(
        np.linalg.norm(dt, axis=-1) * np.linalg.norm(dc, axis=-1), 1e-9
    )
    min_cos = float(cos.min()) if cos.size else float("nan")

    out = {
        "images": list(images.shape),
        "valid_tpu": int(tpu["valid"].sum()),
        "valid_cpu": int(cpu["valid"].sum()),
        "slot_agreement": round(agreement, 6),
        "p99_position_px": round(p99, 5),
        "mean_position_px": round(float(d.mean()), 6) if d.size else None,
        "descriptor_min_cos": round(min_cos, 6),
        "thresholds": {
            "slot_agreement": THRESH_AGREEMENT,
            "p99_position_px": THRESH_P99_PX,
            "descriptor_min_cos": THRESH_MIN_COS,
        },
        "pass": bool(
            agreement >= THRESH_AGREEMENT
            and p99 < THRESH_P99_PX
            and min_cos > THRESH_MIN_COS
        ),
    }
    print(json.dumps(out))
    with open("TPU_PARITY_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    if not out["pass"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
