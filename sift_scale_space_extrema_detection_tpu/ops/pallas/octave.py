"""Pallas TPU kernel: fused whole-octave pyramid + DoG.

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
- ``emit_scales=False`` (the detect-only path: reference stages 3–4
  need only DoG) skips writing the Gaussian stack to HBM entirely —
  only DoG and the next octave's seed scale (index ``spo``,
  reference/background.js:110-143) leave the chip.

Ideal HBM traffic per octave at 64×(960×1280) f32 (octave 0 of the
bench config): read stripes ~0.36 GB + write 7 DoG + 1 seed ~2.5 GB;
the whole 4-octave pyramid+DoG lands at ~3.9 GB → ~5 ms at a v5e's
819 GB/s, vs 243 ms for the round-1 per-scale kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..gaussian import gaussian_kernel_1d, kernel_radius

# Scoped-VMEM budget for choosing the stripe height. Mosaic materializes
# a stripe-sized temporary per unrolled tap slice (measured in round 1),
# so the dominant term is ~max-taps × stripe bytes; outputs are double
# buffered by the pipeline.
_VMEM_BUDGET = 13 * 1024 * 1024


def _align(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _plan(h: int, w: int, radii: list[int], n_out_planes: int):
    """Pick a stripe height; None if no configuration fits VMEM."""
    r_max = max(radii)
    taps_max = 2 * max(radii) + 1
    wp = _align(w + 2 * r_max, 128)
    for tile_h in (128, 64, 32, 16, 8):
        hp = _align(tile_h + 2 * r_max, 8)
        stripe_bytes = 4 * hp * wp
        out_bytes = 4 * n_out_planes * tile_h * w
        # in double-buffered + tap temporaries + double-buffered outputs.
        need = 2 * stripe_bytes + (taps_max + 1) * stripe_bytes + 2 * out_bytes
        if need <= _VMEM_BUDGET:
            return tile_h, hp, wp, r_max
    return None


def fused_octave_supported(h: int, w: int, sigmas, spo: int) -> bool:
    radii = [kernel_radius(s) for s in sigmas if s is not None]
    if not radii:
        return False
    n_planes = len(sigmas) + (len(sigmas) - 1) + 1
    return _plan(h, w, radii, n_planes) is not None


def _octave_kernel(
    stripes_ref,
    *out_refs,
    taps_per_scale,
    r_max,
    tile_h,
    w,
    spo,
    emit_scales,
):
    """One (batch, stripe) grid step: all scales + DoG from one stripe.

    ``taps_per_scale[s]`` is a tuple of float taps, or None when scale s
    is the unblurred base (octave ≥1 scale 0, background.js:110-143).
    ``out_refs`` is ``(scales, dog, seed)`` or ``(dog, seed)`` when the
    Gaussian stack is not emitted.
    """
    if emit_scales:
        scales_ref, dog_ref, seed_ref = out_refs
    else:
        dog_ref, seed_ref = out_refs
    stripe = stripes_ref[0, 0]  # (hp, wp)
    prev = None
    for s, taps in enumerate(taps_per_scale):
        if taps is None:
            # Unblurred base: crop the stripe to the output window.
            cur = stripe[r_max : r_max + tile_h, r_max : r_max + w]
        else:
            r = (len(taps) - 1) // 2
            # Row pass over the rows the column pass will consume:
            # stripe rows [r_max - r, r_max + tile_h + r) → (tile_h+2r, w).
            y0 = r_max - r
            x0 = r_max - r
            rows = stripe[y0 : y0 + tile_h + 2 * r]
            rp = rows[:, x0 : x0 + w] * taps[0]
            for t in range(1, len(taps)):
                rp = rp + rows[:, x0 + t : x0 + t + w] * taps[t]
            # Column pass → (tile_h, w).
            cur = rp[0:tile_h] * taps[0]
            for t in range(1, len(taps)):
                cur = cur + rp[t : t + tile_h] * taps[t]
        if emit_scales:
            scales_ref[0, s] = cur
        if s == spo:
            seed_ref[0, 0] = cur
        if prev is not None:
            # Reference DoG sign: lower − upper (background.js:276-277).
            dog_ref[0, s - 1] = prev - cur
        prev = cur


def fused_octave(
    base: jax.Array,
    sigmas: list[float | None],
    spo: int,
    emit_scales: bool = True,
    interpret: bool = False,
):
    """Whole-octave pyramid+DoG from the octave base image.

    ``base``: ``(B, H, W)`` float32. ``sigmas[s]`` is the *offset* sigma
    blurring the base to scale ``s`` (semigroup relation,
    reference/background.js:157-177), or ``None`` for the unblurred
    base plane. Returns ``(scales, dog, seed)`` with ``scales`` of shape
    ``(B, S, H, W)`` (or ``None`` when ``emit_scales=False``), ``dog``
    ``(B, S-1, H, W)``, and ``seed = scales[:, spo]`` ``(B, H, W)``.
    """
    b, h, w = base.shape
    n_scales = len(sigmas)
    radii = [kernel_radius(s) for s in sigmas if s is not None]
    n_out_planes = (n_scales if emit_scales else 0) + (n_scales - 1) + 1
    plan = _plan(h, w, radii, n_out_planes)
    if plan is None:
        raise ValueError("no stripe plan fits VMEM; use the XLA fallback")
    tile_h, hp, wp, r_max = plan

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
    rows_needed = (n_stripes - 1) * tile_h + hp
    bottom_pad = max(rows_needed - h - r_max, 0)
    right_pad = wp - w - r_max
    padded = jnp.pad(
        base,
        [(0, 0), (r_max, bottom_pad), (r_max, right_pad)],
        mode="edge",
    )
    # Materialize overlapping stripes (B, n_stripes, hp, wp): static
    # slices + stack compile to plain copies.
    stripes = jnp.stack(
        [padded[:, i * tile_h : i * tile_h + hp, :] for i in range(n_stripes)],
        axis=1,
    )

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
    out_shapes.append(
        jax.ShapeDtypeStruct((b, n_scales - 1, hout, w), base.dtype)
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

    kernel = functools.partial(
        _octave_kernel,
        taps_per_scale=taps_per_scale,
        r_max=r_max,
        tile_h=tile_h,
        w=w,
        spo=spo,
        emit_scales=emit_scales,
    )
    flops = 0
    for taps in taps_per_scale:
        if taps is not None:
            flops += 2 * 2 * len(taps) * h * w * b
    outs = pl.pallas_call(
        kernel,
        grid=(b, n_stripes),
        in_specs=[
            pl.BlockSpec(
                (1, 1, hp, wp),
                lambda bi, si: (bi, si, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * b * (n_stripes * hp * wp + n_out_planes * h * w),
            transcendentals=0,
        ),
        interpret=interpret,
    )(stripes)

    dog = outs[-2][:, :, :h, :]
    seed = outs[-1][:, 0, :h, :]
    if emit_scales:
        return outs[0][:, :, :h, :], dog, seed
    return None, dog, seed
