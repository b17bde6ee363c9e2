"""Pallas TPU kernel: fused whole-octave pyramid + DoG + extrema masks.

Round-1's kernel blurred ONE scale per ``pallas_call``: every scale
re-read the octave base from HBM, DoG was a separate XLA pass, and the
in-kernel ``copy.start(); copy.wait()`` serialized every stripe's DMA
against its compute (16 invocations × ~2k grid steps of stalled DMA —
measured 243 ms/64-batch where the HBM roofline is ~16 ms).

This kernel produces an octave's ENTIRE output from a single read of the
base image:

- The grid is ``(batch, row-stripes)``. The input is a pre-materialized
  overlapping-stripe tensor ``(B, n_stripes, hp, wp)`` (stripes overlap
  by the largest scale's halo; BlockSpec cannot express overlap, so XLA
  materializes it once — an extra ~1.1× read+write of the *base*, which
  is 15× smaller than the output traffic it replaces). Regular BlockSpec
  input pipelining then double-buffers stripe DMA against compute for
  free.
- Per grid step, all S blurred scales are computed in VMEM (separable
  row pass over the stripe, column pass into the output row block;
  clamp-to-edge is folded into the XLA edge-pad of the base, exactly the
  reference's border rule, reference/src/sift.js:116-119).
- The S−1 DoG planes (reference sign: ``L(σ_{s-1}) − L(σ_s)``,
  reference/background.js:276-277) are formed in-register from adjacent
  scales and written alongside.
- ``emit_masks=True`` additionally runs the 26-neighbor strict extrema
  scan (reference/src/sift.js:212-316) while the DoG planes sit in
  VMEM: each scale is blurred on a 1-pixel halo ``(tile_h+2, w+2)``
  window, per-plane separable 3-column min/max rows are shared across
  trios, and ONE packed int16 mask plane is emitted (int32 past 8 trios) for the whole
  octave — trio ``t`` owns bits ``[2t, 2t+2)`` with code 0 = not
  extremum, 1 = candidate, 2 = low-contrast reject
  (reference/src/sift.js:285-307). This removes the entire XLA
  re-read + shifted-slice mask pass (measured ~300 ms of the 64-image
  frontend batch), and packing all T trios into one plane instead of
  T f32 planes cuts the kernel's write traffic by T−1 planes/octave
  and the selection pass's read by ~4× (the detect path is
  write-bandwidth-bound; at the bench config the masks were 5 of 13
  written planes per octave).
- ``emit_scales=False`` (the detect-only path: reference stages 3–4
  need only DoG) skips writing the Gaussian stack to HBM entirely —
  only DoG and the next octave's seed scale (index ``spo``,
  reference/background.js:110-143) leave the chip.

Ideal HBM traffic per octave at 64×(960×1280) f32 (octave 0 of the
bench config): read stripes ~0.36 GB + write 7 DoG + 1 seed ~2.5 GB
(+ 5 mask planes ~1.6 GB when emitted); the whole 4-octave pyramid+DoG
lands at ~3.9 GB → ~5 ms at a v5e's 819 GB/s, vs 243 ms for the
round-1 per-scale kernel.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..gaussian import gaussian_kernel_1d, kernel_radius

# Scoped-VMEM budget for choosing the stripe height. Mosaic materializes
# a stripe-sized temporary per unrolled tap slice (measured in round 1),
# so the dominant term is ~max-taps × stripe bytes; outputs are double
# buffered by the pipeline. Env-overridable for tile-height A/Bs
# (SIFT_FUSED_VMEM_MB) — the hardware cap is ~16 MB/core. Default 15:
# the round-4 sliding-window scan freed enough live-set that the
# taller stripes it admits measured pyramid 78 → 74 ms / 372 → 382 fps
# (interleaved A/B, identical keypoints); 13 remains the fallback if a
# larger geometry trips Mosaic's hard cap.
_VMEM_BUDGET = int(os.environ.get("SIFT_FUSED_VMEM_MB", "15")) * 1024 * 1024

# Cross-step double-buffered stripe DMA (see _octave_kernel). Module
# global rather than a per-call arg so bench.py can flip it and
# re-trace (jax.clear_caches()) if Mosaic ever rejects the pipelined
# form on a new toolchain; env knob for manual A/B.
DOUBLE_BUFFER_DMA = os.environ.get("SIFT_FUSED_DB_DMA", "1") != "0"


def _align(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _plan(
    h: int,
    w: int,
    radii: list[int],
    n_out_planes: int,
    n_halo_planes: int = 0,
):
    """Pick a stripe height; None if no configuration fits VMEM.

    ``n_halo_planes`` counts the per-scale DoG halo planes kept live in
    VMEM for the in-kernel extrema scan (plus its min/max temporaries).
    """
    r_max = max(radii)
    taps_max = 2 * r_max + 1
    # +1 halo pixel for the extrema windows when masks are emitted.
    rh = r_max + (1 if n_halo_planes else 0)
    wp = _align(w + 2 * rh, 128)
    # (tile_h, row-pass accumulation chunk): Mosaic materializes a
    # temporary per unrolled tap slice, so chunking the row pass over
    # column blocks shrinks the per-tap term by wp/chunk and unlocks
    # taller stripes — fewer grid steps at ~7 µs of per-step overhead
    # each (tile 32 no-chunk / 32+512 / 64+256 measured 21.1 / 18.3 /
    # 16.0 ms on the octave-0 IO+taps core).
    for tile_h, chunk in (
        (128, 256),
        (64, 256),
        (48, 256),
        (32, 512),
        (32, 0),
        (16, 0),
        (8, 0),
    ):
        hp = _align(tile_h + 2 * rh, 8)
        stripe_bytes = 4 * hp * wp
        out_bytes = 4 * n_out_planes * tile_h * w
        # The scan runs on a SLIDING 3-plane window folded into the
        # blur loop (round 4) — only 3 DoG halo planes (+ their min/max
        # temporaries) are ever live, independent of S, which is what
        # admits taller stripes for mask-emitting octaves.
        eff_halo = min(n_halo_planes, 3)
        halo_bytes = 4 * eff_halo * (tile_h + 2) * _align(w + 2, 128)
        # Row min/max (2 per live plane, tile_h+2 rows) + col min/max
        # (2 per live plane) + packed/interior/ring scratch.
        mask_bytes = (
            4 * 2 * eff_halo * (tile_h + 2) * _align(w, 128)
            + 12 * 4 * tile_h * _align(w, 128)
            if n_halo_planes
            else 0
        )
        # Terms: two DMA'd stripe scratch slots (the input is manually
        # DMA'd from HBM — overlapping windows are inexpressible as a
        # BlockSpec) + one stripe-sized temp (the in-kernel 2x
        # upsample / full row-pass buffer) + per-tap temporaries (chunk
        # width when chunked) + rp/cur accumulators + scan scratch +
        # double-buffered outputs.
        # NOTE on the bandwidth story (round 3, benchmarks/bw_probe.py):
        # round 2's "~100 GB/s effective writes" was a measurement
        # artifact (a ~30 ms per-sync tunnel round-trip); sustained
        # rates are 276-885 GB/s writes (tenancy-variable), ~250 GB/s
        # reads. The kernel's remaining gap to its traffic floor is
        # in-kernel compute + per-step overhead, not HBM.
        tap_w = _align(chunk + 2 * rh, 128) if chunk else wp
        need = (
            3 * stripe_bytes
            + (taps_max + 1) * 4 * hp * tap_w
            + 2 * 4 * hp * wp  # rp + cur accumulators
            + halo_bytes
            + mask_bytes
            + 2 * out_bytes
        )
        if need <= _VMEM_BUDGET:
            return tile_h, hp, wp, rh, chunk
    return None


def fused_octave_supported(
    h: int, w: int, sigmas, spo: int, emit_masks: bool = False
) -> bool:
    radii = [kernel_radius(s) for s in sigmas if s is not None]
    if not radii:
        return False
    n_scales = len(sigmas)
    n_planes = n_scales + (n_scales - 1) + 1 + (1 if emit_masks else 0)
    n_halo = (n_scales - 1) if emit_masks else 0
    return _plan(h, w, radii, n_planes, n_halo) is not None


def _octave_kernel(
    padded_hbm,
    *out_refs,
    taps_per_scale,
    rh,
    tile_h,
    hp,
    w,
    spo,
    emit_scales,
    emit_masks,
    contrast_thr,
    h,
    double_buffer,
    upsample2x=False,
    hp_in=None,
    row_chunk=0,
):
    """One (batch, stripe) grid step: all scales + DoG (+ masks).

    ``upsample2x``: the HBM input is the ORIGINAL-resolution image;
    each step DMAs a half-size ``(hp_in, wp_in)`` window and performs
    the reference's 2x nearest-neighbor upsample (pure pixel
    duplication, reference/src/matrix2d.js:119-133 — bit-identical by
    construction) in VMEM. Saves the XLA-materialized upsampled base +
    its padded copy (~0.85 GB of HBM traffic per 64-batch at 480p) and
    reads 4x fewer input bytes.

    ``taps_per_scale[s]`` is a tuple of float taps, or None when scale s
    is the unblurred base (octave ≥1 scale 0, background.js:110-143).
    ``out_refs`` is ``([scales], dog, seed, [masks], stripe_scratch,
    dma_sem)`` — the input stays in HBM (``memory_space=ANY``) and each
    grid step DMAs its overlapping ``(hp, wp)`` window into the scratch
    (BlockSpec blocks cannot overlap; see ``_plan``).

    """
    refs = list(out_refs)
    sem = refs.pop()
    stripe_scratch = refs.pop()
    scales_ref = refs.pop(0) if emit_scales else None
    dog_ref = refs.pop(0)
    seed_ref = refs.pop(0)
    masks_ref = refs.pop(0) if emit_masks else None
    # Flat-2D DoG block: (D*tile_h, w) rather than (1, D, tile_h, w).
    # HBM DMA cost is dominated by a ~1.4 us per-chunk setup on this
    # chip: the plane-stack block issues D discontiguous 32-row chunks
    # per step and sustains ~116 GB/s, the single contiguous 224-row
    # block sustains ~540 GB/s (interleaved-median A/B, 2026-08-19).
    dog_flat2d = dog_ref is not None and len(dog_ref.shape) == 2

    # Double-buffered stripe DMA across grid steps: each step starts the
    # NEXT step's copy before waiting on its own, so the HBM read rides
    # under the previous stripe's compute (TPU grid steps run
    # sequentially; the scratch persists across them).
    # ``double_buffer=False`` (env SIFT_FUSED_DB_DMA=0, or bench.py's
    # automatic retry) falls back to the round-1 serialized copy.
    b = pl.program_id(0)
    si = pl.program_id(1)
    n_si = pl.num_programs(1)
    k = b * n_si + si
    total_steps = pl.num_programs(0) * n_si

    def dma_for(slot, kk):
        bb = kk // n_si
        ss = kk - bb * n_si
        stride = tile_h // 2 if upsample2x else tile_h
        rows = hp_in if upsample2x else hp
        return pltpu.make_async_copy(
            padded_hbm.at[bb, pl.ds(ss * stride, rows), :],
            stripe_scratch.at[slot],
            sem.at[slot],
        )

    if double_buffer:
        slot = k % 2

        @pl.when(k == 0)
        def _():
            dma_for(slot, k).start()

        @pl.when(k + 1 < total_steps)
        def _():
            dma_for(1 - slot, k + 1).start()

        dma_for(slot, k).wait()
    else:
        slot = 0
        copy = dma_for(0, k)
        copy.start()
        copy.wait()

    # Blur on a 1-px halo window when masks are needed (the extrema scan
    # reads each DoG plane's 8/9-neighborhoods); hx=1 shifts every slice
    # so the emitted (tile_h, w) block is bit-identical either way.
    hx = 1 if emit_masks else 0
    th2 = tile_h + 2 * hx
    w2 = w + 2 * hx

    # --- sliding-window in-VMEM extrema scan helpers -------------------
    # The scan needs DoG planes (s-1, s, s+1) per trio; processing each
    # trio AS SOON as its third plane exists keeps only a 3-plane window
    # (+ its row min/max temporaries) live in VMEM instead of all S-1
    # halo planes — the smaller live set is what lets _plan pick taller
    # stripes (fewer grid steps at ~7 µs fixed overhead each). Math and
    # emitted bits are identical to the round-3 scan-at-the-end form.
    y_glob_i = pl.program_id(1)

    def plane_minmax(d):
        a = d[:, 0:w]
        bb_ = d[:, 1 : 1 + w]
        c = d[:, 2 : 2 + w]
        rmin = jnp.minimum(jnp.minimum(a, bb_), c)
        rmax = jnp.maximum(jnp.maximum(a, bb_), c)
        cmin = jnp.minimum(
            jnp.minimum(rmin[0:tile_h], rmin[1 : 1 + tile_h]),
            rmin[2 : 2 + tile_h],
        )
        cmax = jnp.maximum(
            jnp.maximum(rmax[0:tile_h], rmax[1 : 1 + tile_h]),
            rmax[2 : 2 + tile_h],
        )
        return d, rmin, rmax, cmin, cmax

    def trio_code(win, interior):
        (_, _, _, cmin_lo, cmax_lo), (d, rmin, rmax, _, _), (
            _,
            _,
            _,
            cmin_hi,
            cmax_hi,
        ) = win
        center = d[1 : 1 + tile_h, 1 : 1 + w]
        mid_min = jnp.minimum(d[1 : 1 + tile_h, 0:w], d[1 : 1 + tile_h, 2 : 2 + w])
        mid_max = jnp.maximum(d[1 : 1 + tile_h, 0:w], d[1 : 1 + tile_h, 2 : 2 + w])
        ring_min = jnp.minimum(
            jnp.minimum(rmin[0:tile_h], rmin[2 : 2 + tile_h]), mid_min
        )
        ring_max = jnp.maximum(
            jnp.maximum(rmax[0:tile_h], rmax[2 : 2 + tile_h]), mid_max
        )
        nb_min = jnp.minimum(jnp.minimum(cmin_lo, cmin_hi), ring_min)
        nb_max = jnp.maximum(jnp.maximum(cmax_lo, cmax_hi), ring_max)
        is_ext = (center > nb_max) | (center < nb_min)
        passes = jnp.abs(center) >= contrast_thr
        return jnp.where(
            is_ext & interior,
            jnp.where(passes, jnp.int32(1), jnp.int32(2)),
            jnp.int32(0),
        )

    if upsample2x:
        # NN 2x upsample of the half-res window, then align: the
        # upsampled window starts 2*ceil(rh/2) - rh ∈ {0, 1} rows/cols
        # before the logical stripe window (stripe starts are even, so
        # the parity offset is a compile-time constant). Rows duplicate
        # via sublane repeat; lanes via a 0/1 dup-matrix matmul per
        # 64→128 lane block (bit-exact: each output is 1.0 × value) —
        # Mosaic rejects the lane-axis repeat/reshape forms
        # ("unsupported shape cast").
        par = rh & 1
        orig = stripe_scratch[slot]  # (hp_in, wp_in)
        rows2 = jnp.repeat(orig, 2, axis=0)  # (2*hp_in, wp_in)
        r_i = jax.lax.broadcasted_iota(jnp.int32, (64, 128), 0)
        c_i = jax.lax.broadcasted_iota(jnp.int32, (64, 128), 1)
        dup = ((c_i >> 1) == r_i).astype(rows2.dtype)
        wp_in = orig.shape[-1]
        up = jnp.concatenate(
            [
                jax.lax.dot_general(
                    rows2[:, 64 * j : 64 * (j + 1)],
                    dup,
                    (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=rows2.dtype,
                )
                for j in range(wp_in // 64)
            ],
            axis=1,
        )  # (2*hp_in, 2*wp_in)
        stripe = up[par:, par:]  # consumed below as if (hp, wp)
    else:
        stripe = stripe_scratch[slot]  # (hp, wp)
    prev = None
    win = []  # sliding (plane, rmin, rmax, cmin, cmax) window, len <= 3
    packed = None
    interior = None
    if emit_masks:
        y_glob = y_glob_i * tile_h + jax.lax.broadcasted_iota(
            jnp.int32, (tile_h, w), 0
        )
        x_glob = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w), 1)
        interior = (
            (y_glob >= 1)
            & (y_glob <= h - 2)
            & (x_glob >= 1)
            & (x_glob <= w - 2)
        )
        packed = jnp.zeros((tile_h, w), jnp.int32)
    for s, taps in enumerate(taps_per_scale):
        if taps is None:
            # Unblurred base: crop the stripe to the (haloed) window.
            cur = stripe[rh - hx : rh - hx + th2, rh - hx : rh - hx + w2]
        else:
            r = (len(taps) - 1) // 2
            # Row pass over the rows the column pass will consume,
            # accumulated in column chunks: Mosaic materializes one
            # temporary per unrolled tap slice, and chunk-width temps
            # (vs stripe-width) are what lets the plan pick taller
            # stripes (see _plan).
            y0 = rh - r - hx
            x0 = rh - r - hx
            rows = stripe[y0 : y0 + th2 + 2 * r]
            cw_full = row_chunk if row_chunk else w2
            parts = []
            for cx in range(0, w2, cw_full):
                cw = min(cw_full, w2 - cx)
                acc = rows[:, x0 + cx : x0 + cx + cw] * taps[0]
                for t in range(1, len(taps)):
                    acc = acc + rows[:, x0 + cx + t : x0 + cx + t + cw] * taps[t]
                parts.append(acc)
            rp = (
                jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
            )
            # Column pass → (th2, w2).
            cur = rp[0:th2] * taps[0]
            for t in range(1, len(taps)):
                cur = cur + rp[t : t + th2] * taps[t]
        inner = cur[hx : hx + tile_h, hx : hx + w]
        if emit_scales:
            scales_ref[0, s] = inner
        if s == spo:
            seed_ref[0, 0] = inner
        if prev is not None:
            # Reference DoG sign: lower − upper (background.js:276-277).
            # Stored at the ref's dtype (bf16 in the compressed mode);
            # the in-VMEM extrema scan below reads the full-precision d.
            d = prev - cur
            d_store = d[hx : hx + tile_h, hx : hx + w].astype(dog_ref.dtype)
            if dog_flat2d:
                dog_ref[(s - 1) * tile_h : s * tile_h] = d_store
            else:
                dog_ref[0, s - 1] = d_store
            if emit_masks:
                # Per-plane separable 3-column row min/max + full 3x3
                # (shared by the two trios touching the plane — same
                # decomposition as ops/extrema.py), then emit trio
                # s-2's 2-bit code once its upper plane exists.
                win.append(plane_minmax(d))
                if len(win) == 3:
                    code = trio_code(win, interior)
                    packed = packed | (code << (2 * (s - 3)))
                    win.pop(0)  # plane s-3 is dead: free its VMEM
        prev = cur

    if not emit_masks:
        return

    # Stored at the narrowest dtype that holds 2 bits/trio (int16 for
    # <=8 trios): the mask plane is pure write traffic on a stage whose
    # effective HBM rate fluctuates with tenancy — bytes are the only
    # reliable lever. The scan math above stays int32 in registers.
    masks_ref[0, 0] = packed.astype(masks_ref.dtype)


def fused_octave(
    base: jax.Array,
    sigmas: list[float | None],
    spo: int,
    emit_scales: bool = True,
    emit_masks: bool = False,
    contrast_thr: float = 0.0,
    interpret: bool = False,
    dog_dtype=None,
    flat_detect: bool = False,
    upsample2x: bool = False,
):
    """Whole-octave pyramid+DoG (+ extrema masks) from the octave base.

    ``upsample2x=True``: ``base`` is the ORIGINAL-resolution image and
    the reference's 2x nearest-neighbor upsample
    (reference/background.js:84) happens inside the kernel by pixel
    duplication — bit-identical to ``resize.upsample2x_nn`` but the
    upsampled base and its padded copy never touch HBM.

    ``flat_detect=True`` (detect path, requires ``emit_scales=False``)
    emits the DoG in STRIPE-MAJOR layout — ``(B, n_stripes, S-1,
    tile_h, W)`` with ``hout = n_stripes·tile_h ≥ H`` pad rows kept
    (the mask zeroes them) — so each grid step writes ONE contiguous
    ``(S-1)·tile_h``-row chunk instead of S-1 discontiguous 32-row
    chunks. HBM DMA pays ~1.4 µs of setup per chunk on this chip:
    measured write rate 116 → 542 GB/s for the same bytes
    (interleaved-median A/B, 2026-08-19). Consumers address it via
    ``ops.extrema.dog_flat_index`` (the plane layout is the
    ``tile_h = H`` special case of the same formula); the layout is
    self-describing (``tile_h = dog.shape[-2]``).

    ``base``: ``(B, H, W)`` float32. ``sigmas[s]`` is the *offset* sigma
    blurring the base to scale ``s`` (semigroup relation,
    reference/background.js:157-177), or ``None`` for the unblurred
    base plane. Returns ``(scales, dog, seed, masks)`` with ``scales``
    of shape ``(B, S, H, W)`` (or ``None`` when ``emit_scales=False``),
    ``dog`` ``(B, S-1, H, W)``, ``seed = scales[:, spo]`` ``(B, H, W)``,
    and ``masks`` ``(B, H, W)`` int16 (int32 past 8 trios) — trio ``t`` (centered at DoG
    scale ``t+1``) owns bits ``[2t, 2t+2)`` with code 0 = none,
    1 = candidate, 2 = low-contrast reject — or ``None`` when
    ``emit_masks=False``. Mask pixels are valid over the image interior
    only; the kernel zeroes the border (reference/src/sift.js:221-222).

    ``dog_dtype`` (default: ``base.dtype``) sets the STORAGE dtype of
    the emitted DoG planes only — all blur/DoG/extrema arithmetic stays
    in ``base.dtype`` in VMEM, and the seed/scales stay full precision
    (the seed feeds the next octave's blur ladder). ``bfloat16`` halves
    the dominant HBM write traffic of the detect path (the stage is
    write-bandwidth-bound); with ``emit_masks=True`` the candidate SET
    is unchanged (the in-VMEM scan reads full-precision values) — only
    the refinement inputs quantize.
    """
    b, h, w = base.shape
    if upsample2x:
        h, w = 2 * h, 2 * w  # logical (upsampled) geometry
    n_scales = len(sigmas)
    dog_dtype = base.dtype if dog_dtype is None else jnp.dtype(dog_dtype)
    radii = [kernel_radius(s) for s in sigmas if s is not None]
    n_out_planes = (
        (n_scales if emit_scales else 0)
        + (n_scales - 1)
        + 1
        + (1 if emit_masks else 0)
    )
    n_halo = (n_scales - 1) if emit_masks else 0
    plan = _plan(h, w, radii, n_out_planes, n_halo)
    if plan is None:
        raise ValueError("no stripe plan fits VMEM; use the XLA fallback")
    tile_h, hp, wp, rh, row_chunk = plan

    taps_per_scale = tuple(
        None
        if s is None
        else tuple(float(v) for v in gaussian_kernel_1d(s))
        for s in sigmas
    )

    n_stripes = -(-h // tile_h)
    # Pad so every stripe's aligned slice stays in bounds, and the width
    # to the aligned lane count (clamp-to-edge on real borders; the
    # alignment tail replicates the edge too, harmless — it is cropped).
    hp_in = None
    if upsample2x:
        # Pad the ORIGINAL image: rh2 = ceil(rh/2) original pixels of
        # clamp halo cover the logical rh (NN duplication replicates
        # the clamp border exactly). Stripe ss's logical window
        # [ss*tile_h - rh, +hp) maps to original rows starting at
        # padded row ss*(tile_h//2) — same regular stride structure.
        rh2 = (rh + 1) // 2
        hp_in = _align(hp // 2 + 1, 8)  # sublane-repeat needs 8-aligned
        wp_in = _align(wp // 2 + 1, 128)
        rows_needed = (n_stripes - 1) * (tile_h // 2) + hp_in
        h0, w0 = base.shape[-2], base.shape[-1]
        padded = jnp.pad(
            base,
            [
                (0, 0),
                (rh2, max(rows_needed - h0 - rh2, 0)),
                (rh2, wp_in - w0 - rh2),
            ],
            mode="edge",
        )
    else:
        rows_needed = (n_stripes - 1) * tile_h + hp
        bottom_pad = max(rows_needed - h - rh, 0)
        right_pad = wp - w - rh
        padded = jnp.pad(
            base,
            [(0, 0), (rh, bottom_pad), (rh, right_pad)],
            mode="edge",
        )
    # The kernel DMAs each overlapping (hp, wp) window straight from the
    # HBM-resident padded image (BlockSpec blocks cannot overlap, and
    # materializing an overlapping-stripe tensor in XLA measured 62 ms
    # of octave 0's 122 ms at batch 64 — more than the kernel itself).

    hout = n_stripes * tile_h
    out_shapes = []
    out_specs = []
    if emit_scales:
        out_shapes.append(
            jax.ShapeDtypeStruct((b, n_scales, hout, w), base.dtype)
        )
        out_specs.append(
            pl.BlockSpec(
                (1, n_scales, tile_h, w),
                lambda bi, si: (bi, 0, si, 0),
                memory_space=pltpu.VMEM,
            )
        )
    if flat_detect:
        assert not emit_scales, "flat_detect is the detect-only layout"
        d_planes = n_scales - 1
        out_shapes.append(
            jax.ShapeDtypeStruct(
                (b * n_stripes * d_planes * tile_h, w), dog_dtype
            )
        )
        out_specs.append(
            pl.BlockSpec(
                (d_planes * tile_h, w),
                lambda bi, si, _n=n_stripes: (bi * _n + si, 0),
                memory_space=pltpu.VMEM,
            )
        )
    else:
        out_shapes.append(
            jax.ShapeDtypeStruct((b, n_scales - 1, hout, w), dog_dtype)
        )
        out_specs.append(
            pl.BlockSpec(
                (1, n_scales - 1, tile_h, w),
                lambda bi, si: (bi, 0, si, 0),
                memory_space=pltpu.VMEM,
            )
        )
    out_shapes.append(jax.ShapeDtypeStruct((b, 1, hout, w), base.dtype))
    out_specs.append(
        pl.BlockSpec(
            (1, 1, tile_h, w),
            lambda bi, si: (bi, 0, si, 0),
            memory_space=pltpu.VMEM,
        )
    )
    if emit_masks:
        mask_dtype = jnp.int16 if (n_scales - 3) <= 8 else jnp.int32
        out_shapes.append(jax.ShapeDtypeStruct((b, 1, hout, w), mask_dtype))
        out_specs.append(
            pl.BlockSpec(
                (1, 1, tile_h, w),
                lambda bi, si: (bi, 0, si, 0),
                memory_space=pltpu.VMEM,
            )
        )

    kernel = functools.partial(
        _octave_kernel,
        taps_per_scale=taps_per_scale,
        rh=rh,
        tile_h=tile_h,
        hp=hp,
        w=w,
        spo=spo,
        emit_scales=emit_scales,
        emit_masks=emit_masks,
        contrast_thr=float(contrast_thr),
        h=h,
        double_buffer=DOUBLE_BUFFER_DMA,
        upsample2x=upsample2x,
        hp_in=hp_in,
        row_chunk=row_chunk,
    )
    flops = 0
    for taps in taps_per_scale:
        if taps is not None:
            flops += 2 * 2 * len(taps) * h * w * b
    if emit_masks:
        flops += 40 * (n_scales - 3) * h * w * b
    outs = pl.pallas_call(
        kernel,
        grid=(b, n_stripes),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM(
                (2, hp_in, wp_in) if upsample2x else (2, hp, wp),
                base.dtype,
            ),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * b * (n_stripes * hp * wp + n_out_planes * h * w),
            transcendentals=0,
        ),
        interpret=interpret,
    )(padded)

    outs = list(outs)
    masks = outs.pop()[:, 0, :h, :] if emit_masks else None
    seed = outs.pop()[:, 0, :h, :]
    if flat_detect:
        # Free view of the 2D buffer; pad rows (hout > h) stay — the
        # mask zeroes them, so no consumer ever selects one.
        dog = outs.pop().reshape(b, n_stripes, n_scales - 1, tile_h, w)
    else:
        dog = outs.pop()[:, :, :h, :]
    scales = outs.pop()[:, :, :h, :] if emit_scales else None
    return scales, dog, seed, masks
