"""Reproducible HBM bandwidth probe for the current chip.

The frontend roofline story (BASELINE.md, `frontend_bench.py`) rests on
a claim — "this chip's effective HBM write bandwidth is ~100 GB/s,
reads ~250 GB/s, far below the v5e's 819 GB/s spec" — that previously
existed only as comments and hard-coded constants. This probe makes the
claim falsifiable: run it on any chip/backend and it prints the
measured per-direction streaming rates as one JSON line.

Four micro-kernels, each swept over buffer sizes (so cache/latency
effects are visible) and timed with a host-level scalar sync (the
tunneled backend does not reliably sync on ``block_until_ready``):

- ``xla_write``  — ``jnp.full``-style broadcast store of N bytes
                   (pure write traffic; no HBM reads).
- ``xla_copy``   — ``x + 0.0`` elementwise copy (N read + N write).
- ``pl_write``   — Pallas kernel storing a constant per block.
- ``pl_copy``    — Pallas kernel copying input block to output block.
- ``pl_read``    — Pallas kernel reducing each input block to one
                   (8,128) accumulator tile (pure read; writes are
                   negligible).

Derived rates:  write  = N / t(write)
                copy   = 2N / t(copy)   (read+write combined)
                read   = N / t(read)

Run: ``python benchmarks/bw_probe.py [--gb 1.0] [--iters 5]``.
Used by BASELINE.md's speed-of-light section; `frontend_bench.py`'s
MEASURED_*_GBPS constants must match what this prints (re-run on any
new chip/toolchain).
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=float, default=1.0, help="buffer size in GiB")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # Buffer geometry: (rows, 512 lanes * 128) f32 so every block is
    # trivially tiled; block = 128 rows (2 MiB blocks; 8 MiB double-buffered copy fits scoped VMEM).
    lane_w = 4096
    n_rows = int(args.gb * (1 << 30) / (4 * lane_w))
    block_rows = 128
    n_rows = (n_rows // block_rows) * block_rows
    nbytes = 4 * n_rows * lane_w
    grid = (n_rows // block_rows,)

    x = jax.device_put(
        np.ones((n_rows, lane_w), np.float32) * 0.5
    )

    def sync(v) -> float:
        return float(np.asarray(v))

    # --- kernels ---------------------------------------------------------
    def _write_kernel(o_ref):
        o_ref[...] = jnp.full((block_rows, lane_w), 1.25, jnp.float32)

    def _copy_kernel(i_ref, o_ref):
        o_ref[...] = i_ref[...]

    def _read_kernel(i_ref, o_ref):
        # Reduce the block to one (8,128) tile: N bytes read, ~4KB written.
        r = i_ref[...].reshape(block_rows // 8, 8, lane_w // 128, 128)
        s = jnp.sum(r, axis=(0, 2))

        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[...] += s

    bspec = pl.BlockSpec((block_rows, lane_w), lambda i: (i, 0))

    @jax.jit
    def pl_write():
        return pl.pallas_call(
            _write_kernel,
            grid=grid,
            out_specs=bspec,
            out_shape=jax.ShapeDtypeStruct((n_rows, lane_w), jnp.float32),
        )()

    @jax.jit
    def pl_copy(v):
        return pl.pallas_call(
            _copy_kernel,
            grid=grid,
            in_specs=[bspec],
            out_specs=bspec,
            out_shape=jax.ShapeDtypeStruct((n_rows, lane_w), jnp.float32),
        )(v)

    @jax.jit
    def pl_read(v):
        return pl.pallas_call(
            _read_kernel,
            grid=grid,
            in_specs=[bspec],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(v)

    @jax.jit
    def xla_write():
        return jnp.full((n_rows, lane_w), 1.25, jnp.float32)

    @jax.jit
    def xla_copy(v):
        return v + 0.0

    # Fixed dispatch+sync latency through the (possibly tunneled)
    # backend, measured on a trivial kernel; subtracted from every
    # sustained measurement below (~30 ms on the axon tunnel — larger
    # than 1 GiB of traffic at spec rate, so it MUST be excluded).
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
    t_launch = float(np.median(lat))

    def time_one(fn, *a) -> float:
        """Sustained per-call seconds: dispatch all iters, sync once."""
        def run_all():
            outs = [fn(*a) for _ in range(args.iters)]
            return sync(sum(jnp.sum(o[..., :8, :8]) for o in outs))

        sync(jnp.sum(fn(*a)[..., :8, :8]))  # compile
        run_all()  # warm-up (first post-compile run is slow on tunnel)
        t0 = time.perf_counter()
        run_all()
        return max((time.perf_counter() - t0) - t_launch, 1e-9) / args.iters

    t_pl_write = time_one(pl_write)
    t_pl_copy = time_one(pl_copy, x)
    t_pl_read = time_one(pl_read, x)
    t_xla_write = time_one(xla_write)
    t_xla_copy = time_one(xla_copy, x)

    gb = nbytes / 1e9
    out = {
        "buffer_gb": round(gb, 3),
        "iters": args.iters,
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "pl_write_gb_s": round(gb / t_pl_write, 1),
        "pl_copy_gb_s": round(2 * gb / t_pl_copy, 1),
        "pl_read_gb_s": round(gb / t_pl_read, 1),
        "xla_write_gb_s": round(gb / t_xla_write, 1),
        "xla_copy_gb_s": round(2 * gb / t_xla_copy, 1),
        "dispatch_latency_ms": round(t_launch * 1e3, 1),
        "spec_peak_gb_s": 819.0,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
