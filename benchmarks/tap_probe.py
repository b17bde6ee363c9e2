"""Pyramid tap-accumulation precision probe (VERDICT r4 next-item #7).

Question: do bf16 tap multiplies (f32 carry, or full-bf16 row pass)
run faster than f32 taps on the VPU? bf16 tiles pack (16,128) — 2 vals
per 32-bit lane — so 2x elementwise throughput is plausible but was
never separated from the rejected bf16 *storage* mode.

Kernel: T sequential shifted multiply-adds over a (rows, W) VMEM block,
mimicking the octave kernel's row pass. Variants:
  f32        — production: f32 data, f32 taps, f32 acc
  bf16_carry — bf16 data/taps multiplies, f32 accumulate (per-tap cast)
  bf16_full  — bf16 data/taps/acc (cast to f32 once at the end)
  bf16_pair  — bf16 mul, pairs summed bf16, pair sums accumulated f32
"""

import functools
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ROWS = 256
W = 1024
NTAPS = 13  # sigma~2 kernel
REPS = 64  # repeat the tap loop in-kernel to swamp DMA
ITERS = 60


def sync(v):
    return float(np.asarray(v))


@jax.jit
def tiny(v):
    return v + 1.0


t8 = jax.device_put(np.zeros((8, 128), np.float32))
sync(jnp.sum(tiny(t8)))
lat = []
for _ in range(5):
    t0 = time.perf_counter()
    sync(jnp.sum(tiny(t8)))
    lat.append(time.perf_counter() - t0)
T_LAUNCH = float(np.median(lat))


def time_one(fn, *a, iters=ITERS):
    def run_all():
        outs = [fn(*a) for _ in range(iters)]
        return sync(sum(jnp.sum(o[:8, :8].astype(jnp.float32)) for o in outs))

    sync(jnp.sum(fn(*a)[:8, :8].astype(jnp.float32)))
    run_all()
    t0 = time.perf_counter()
    run_all()
    return max((time.perf_counter() - t0) - T_LAUNCH, 1e-9) / iters


taps = np.exp(-0.5 * ((np.arange(NTAPS) - NTAPS // 2) / 2.0) ** 2)
taps = (taps / taps.sum()).astype(np.float32)
x_np = np.random.default_rng(0).standard_normal(
    (ROWS + NTAPS, W)
).astype(np.float32)


def make(mode):
    def kern(i_ref, o_ref):
        if mode == "f32":
            rows = i_ref[...]
            acc = rows[0:ROWS] * float(taps[0])
            for rep in range(REPS):
                for t in range(1 if rep == 0 else 0, NTAPS):
                    acc = acc + rows[t : t + ROWS] * float(taps[t])
            o_ref[...] = acc
        elif mode == "bf16_carry":
            rows = i_ref[...].astype(jnp.bfloat16)
            acc = (rows[0:ROWS] * jnp.bfloat16(taps[0])).astype(jnp.float32)
            for rep in range(REPS):
                for t in range(1 if rep == 0 else 0, NTAPS):
                    acc = acc + (
                        rows[t : t + ROWS] * jnp.bfloat16(taps[t])
                    ).astype(jnp.float32)
            o_ref[...] = acc
        elif mode == "bf16_full":
            rows = i_ref[...].astype(jnp.bfloat16)
            acc = rows[0:ROWS] * jnp.bfloat16(taps[0])
            for rep in range(REPS):
                for t in range(1 if rep == 0 else 0, NTAPS):
                    acc = acc + rows[t : t + ROWS] * jnp.bfloat16(taps[t])
            o_ref[...] = acc.astype(jnp.float32)
        elif mode == "bf16_pair":
            rows = i_ref[...].astype(jnp.bfloat16)
            acc = (rows[0:ROWS] * jnp.bfloat16(taps[0])).astype(jnp.float32)
            for rep in range(REPS):
                ts = list(range(1 if rep == 0 else 0, NTAPS))
                for k in range(0, len(ts) - 1, 2):
                    a, b = ts[k], ts[k + 1]
                    pair = (
                        rows[a : a + ROWS] * jnp.bfloat16(taps[a])
                        + rows[b : b + ROWS] * jnp.bfloat16(taps[b])
                    )
                    acc = acc + pair.astype(jnp.float32)
                if len(ts) % 2:
                    t = ts[-1]
                    acc = acc + (
                        rows[t : t + ROWS] * jnp.bfloat16(taps[t])
                    ).astype(jnp.float32)
            o_ref[...] = acc

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((ROWS, W), jnp.float32),
        )(x)

    return run


x = jax.device_put(x_np)
res = {}
ntap_total = REPS * NTAPS
base = None
for mode in ("f32", "bf16_carry", "bf16_full", "bf16_pair"):
    fn = make(mode)
    t = time_one(fn, x)
    per_tap_ps = t * 1e12 / (ROWS * W * ntap_total)
    res[mode] = {"ms": round(t * 1e3, 3), "ps_per_el_tap": round(per_tap_ps, 2)}
    if mode == "f32":
        base = t
        ref_out = np.asarray(fn(x))
    else:
        out = np.asarray(fn(x))
        res[mode]["speedup"] = round(base / t, 3)
        res[mode]["max_rel_err"] = float(
            np.max(np.abs(out - ref_out))
            / (np.max(np.abs(ref_out)) + 1e-9)
        )
print(json.dumps(res, indent=1))
