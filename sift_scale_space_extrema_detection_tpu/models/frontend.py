"""End-to-end SIFT frontend: scale space → DoG → extrema → refinement.

TPU-first redesign of the reference pipeline orchestrator
(reference/background.js). Differences from the reference architecture
(SURVEY.md §7):

- The whole pipeline is one pure jitted function over dense arrays; the
  pyramid stays resident on device between stages instead of bouncing
  through a postMessage protocol (SURVEY.md §3.2 round-trip anti-pattern).
- Per-octave geometry is static, so octaves unroll at trace time; XLA
  compiles one program for a given input shape.
- Keypoints live in fixed-capacity masked buffers (core/types.py).

Blur strategies:
- ``"exact"``   — reference accumulation order; float64 CPU bit-parity.
- ``"separable"`` — edge-pad + two 1-D convolutions (default fast path).
- ``"matmul"``  — banded matmuls on the MXU.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from ..config import SiftConfig
from ..core.types import Extrema, Keypoints, concat_keypoints
from ..ops.descriptor import (
    DescribedKeypoints,
    concat_described,
    describe_compact,
    describe_compact_batched_windowed,
    describe_octave,
)
from ..ops.pallas.describe import window_describe_supported
from ..ops.dog import difference_of_gaussians
from ..ops.extrema import (
    compact_extrema,
    find_extrema,
    find_extrema_from_masks,
    select_refine_candidates,
)
from ..ops.gaussian import blur_exact, blur_matmul, blur_separable
from ..ops.pallas.blur import blur_pallas
from ..ops.pallas.octave import fused_octave, fused_octave_supported
from ..ops.refine import refine_keypoints, refine_keypoints_multi
from ..ops.resize import downsample2x_nn, upsample2x_nn

BLUR_STRATEGIES: dict[str, Callable] = {
    "exact": blur_exact,
    "separable": blur_separable,
    "matmul": blur_matmul,
    "pallas": blur_pallas,
}


def _as_unit_float(images: jax.Array) -> jax.Array:
    """Accept integer images, converting on DEVICE to unit-range float.

    uint8 uses the reference's exact ``/255`` rule
    (reference/src/image-utils.js:114) — lossless for real camera data,
    whose source is uint8. uint16 (``/65535``) is the transport for
    float-native sources that exceed 8-bit depth: the SLAM bench's
    synthetic texture measured ATE 1.55 vs 0.30 under uint8
    quantization, while uint16 still halves upload bytes vs f32.
    Host→device image upload is pure tunnel traffic on this setup
    (measured ~13 ms/frame of the SLAM loop for f32 at 480p, round-4
    breakdown); the conversion fuses into the jitted pipeline. Float
    inputs pass through untouched.
    """
    if images.dtype == jnp.uint8:
        return images.astype(jnp.float32) / 255.0
    if images.dtype == jnp.uint16:
        return images.astype(jnp.float32) / 65535.0
    return images


def build_pyramid_fused(
    images: jax.Array,
    cfg: SiftConfig,
    emit_scales: bool = True,
    emit_masks: bool = False,
    interpret: bool = False,
    dog_dtype=None,
    flat_detect: bool = False,
) -> tuple[list[jax.Array] | None, list[jax.Array], list[jax.Array | None]]:
    """Pyramid + DoG (+ extrema masks) via the fused octave Pallas kernel.

    ``images``: ``(..., H, W)``. Returns ``(scale_space, dog, masks)``
    per octave; ``scale_space`` is ``None`` when ``emit_scales=False``
    (the detect-only path — the Gaussian stacks never leave the chip,
    only DoG and each octave's seed scale are written to HBM), and
    ``masks[o]`` is the kernel's in-VMEM 26-neighbor extrema result as
    ONE packed int32 plane ``(..., H, W)`` (2-bit code per trio; see
    ops/pallas/octave.py) when ``emit_masks=True``, else ``None``.
    Octaves whose kernel plan does not fit VMEM fall back to the XLA
    separable path (mask ``None`` — callers run the XLA extrema scan
    there).

    ``dog_dtype`` (e.g. ``jnp.bfloat16``) compresses the STORED DoG
    planes on kernel-path octaves — the in-VMEM extrema scan still
    reads full precision, so the candidate set is unchanged; only
    refinement's gathered neighborhoods quantize (ops/pallas/octave.py).
    Fallback octaves keep full precision (their scan runs in XLA on the
    stored planes).
    """
    batch_shape = images.shape[:-2]
    flat = images.reshape((-1,) + images.shape[-2:])
    base = flat  # octave 0's 2x NN upsample happens lazily (see below)
    # Same default_device-aware check as window_describe_supported: a
    # CPU-pinned trace must not pick the Pallas kernel path.
    _dd = jax.config.jax_default_device
    on_tpu = (
        getattr(_dd, "platform", None) == "tpu"
        if _dd is not None
        else jax.default_backend() == "tpu"
    )
    scale_space: list[jax.Array] = []
    dogs: list[jax.Array] = []
    masks_out: list[jax.Array | None] = []
    for octave in range(cfg.num_octaves):
        sigmas = [
            None if (octave > 0 and s == 0) else cfg.offset_sigma(octave, s)
            for s in range(cfg.scales_per_octave_total)
        ]
        # Octave 0 works at 2x the input resolution
        # (reference/background.js:84); the fused kernel upsamples
        # in-VMEM (bit-identical pixel duplication) so the upsampled
        # base never touches HBM — the XLA fallback materializes it.
        up2 = octave == 0
        h, w = base.shape[-2], base.shape[-1]
        if up2:
            h, w = 2 * h, 2 * w
        masks = None
        if (on_tpu or interpret) and fused_octave_supported(
            h, w, sigmas, cfg.scales_per_octave, emit_masks=emit_masks
        ):
            scales, dog, seed, masks = fused_octave(
                base,
                sigmas,
                cfg.scales_per_octave,
                emit_scales=emit_scales,
                emit_masks=emit_masks,
                contrast_thr=cfg.contrast_prefilter_threshold,
                interpret=interpret,
                dog_dtype=dog_dtype,
                # Stripe-major DoG only helps when the in-kernel masks
                # exist (they zero the layout's pad rows; consumers
                # select exclusively through them).
                flat_detect=flat_detect and emit_masks and not emit_scales,
                upsample2x=up2,
            )
        elif (on_tpu or interpret) and fused_octave_supported(
            h, w, sigmas, cfg.scales_per_octave
        ):
            scales, dog, seed, _ = fused_octave(
                base,
                sigmas,
                cfg.scales_per_octave,
                emit_scales=emit_scales,
                interpret=interpret,
                dog_dtype=dog_dtype,
                upsample2x=up2,
            )
        else:
            if up2:
                base = upsample2x_nn(base)
            planes = [
                base if s is None else blur_separable(base, s) for s in sigmas
            ]
            scales = jnp.stack(planes, axis=-3)
            dog = difference_of_gaussians(scales)
            seed = planes[cfg.scales_per_octave]
            if not emit_scales:
                scales = None
        if emit_scales:
            scale_space.append(
                scales.reshape(batch_shape + scales.shape[-3:])
            )
        n_tail = 4 if dog.ndim == 5 else 3  # stripe-major keeps 4 dims
        dogs.append(dog.reshape(batch_shape + dog.shape[-n_tail:]))
        masks_out.append(
            None if masks is None
            else masks.reshape(batch_shape + masks.shape[-2:])
        )
        base = downsample2x_nn(seed)
    return (scale_space if emit_scales else None), dogs, masks_out


def build_scale_space(
    image: jax.Array, cfg: SiftConfig, blur: str = "separable"
) -> list[jax.Array]:
    """Gaussian scale space (reference/background.js:71-237).

    ``image``: ``(..., H, W)`` grayscale in [0,1]. Returns one stacked
    array per octave, shape ``(..., spo+3, H_o, W_o)``.

    Octave 0 blurs every scale from the 2×-upsampled base image with the
    semigroup offset sigma; octaves ≥1 seed from the previous octave's
    scale ``spo`` image decimated 2×, pushed unblurred as scale 0
    (background.js:110-143).
    """
    blur_fn = BLUR_STRATEGIES[blur]
    octaves: list[jax.Array] = []
    base = upsample2x_nn(image)
    for octave in range(cfg.num_octaves):
        scales = []
        if octave == 0:
            for s in range(cfg.scales_per_octave_total):
                scales.append(blur_fn(base, cfg.offset_sigma(octave, s)))
        else:
            base = downsample2x_nn(
                octaves[octave - 1][..., cfg.scales_per_octave, :, :]
            )
            scales.append(base)
            for s in range(1, cfg.scales_per_octave_total):
                scales.append(blur_fn(base, cfg.offset_sigma(octave, s)))
        octaves.append(jnp.stack(scales, axis=-3))
    return octaves


def build_dog(scale_space: list[jax.Array]) -> list[jax.Array]:
    """Per-octave DoG stacks ``(..., spo+2, H_o, W_o)``."""
    return [difference_of_gaussians(octave) for octave in scale_space]


def detect_from_dog(
    dog: list[jax.Array],
    cfg: SiftConfig,
    masks: list[jax.Array | None] | None = None,
) -> tuple[Keypoints, list[Extrema]]:
    """Extrema scan + refinement over per-octave DoG stacks (unbatched).

    ``masks[o]`` (optional) is the fused kernel's pre-computed extrema
    mask for octave ``o`` — when present the XLA neighbor scan is
    skipped. The returned ``Extrema`` keep the raw per-trio slot layout
    (segment ``t`` = slots ``[t·cap, (t+1)·cap)``) for introspection/
    parity; refinement internally consumes a compacted copy (cost is
    per slot).
    """
    if masks is None:
        masks = [None] * len(dog)
    extrema = []
    sels = []
    image_hs = []
    for octave, (d, m) in enumerate(zip(dog, masks)):
        # Stripe-major DoG (4-D per image) carries pad rows; the
        # logical image height comes from the (cropped) mask plane.
        image_hs.append(m.shape[-2] if d.ndim == 4 else None)
        if m is None:
            e = find_extrema(d, cfg, cfg.keypoints_per_trio(octave))
            sel = compact_extrema(e, cfg.refine_capacity(octave))
        else:
            # Mask path: ONE cross-trio selection serves as both the
            # candidate output (positions + per-trio counters, the
            # reference's stage-3 product, background.js:433-436) and
            # the refinement input — the per-trio slot layout of
            # find_extrema_from_masks remains available for
            # introspection but is off the hot path.
            e = sel = select_refine_candidates(
                m, d, cfg, cfg.refine_capacity(octave)
            )
        extrema.append(e)
        sels.append(sel)
    if cfg.unified_refine and len({d.dtype for d in dog}) == 1:
        return refine_keypoints_multi(dog, sels, cfg, image_hs), extrema
    if (
        cfg.refine_tail_pool
        and len(dog) > 2
        and len({d.dtype for d in dog[1:]}) == 1
    ):
        # Octave 0 refines alone (76 % of the DoG bytes at the bench
        # config — concatenating it measured a net loss, round-4 A/B:
        # 342.5 vs 374.0 fps full-unified vs per-octave); octaves >= 1
        # refine as ONE pooled pass: their DoG concat is small (~0.75 GB
        # /64-batch) and their static caps sit mostly empty (occupancy
        # probe: 3 % / 89 % / 0 %), which is exactly what the
        # cross-octave pool (cfg.refine_pool_compaction) reclaims.
        kp0 = refine_keypoints(dog[0], sels[0], 0, cfg, image_h=image_hs[0])
        kp_tail = refine_keypoints_multi(
            dog[1:], sels[1:], cfg, image_hs[1:], octave_offset=1
        )
        return concat_keypoints([kp0, kp_tail]), extrema
    keypoints = [
        refine_keypoints(d, sel, octave, cfg, image_h=ih)
        for octave, (d, sel, ih) in enumerate(zip(dog, sels, image_hs))
    ]
    return concat_keypoints(keypoints), extrema


def _dog_pyramid(
    images: jax.Array, cfg: SiftConfig, blur: str
) -> tuple[list[jax.Array], list[jax.Array | None]]:
    """Per-octave (DoG stacks, extrema masks); ``blur="fused"`` takes
    the whole-octave Pallas kernel path (Gaussian stacks never written
    to HBM, extrema masks computed in-VMEM). A bf16 DoG-storage mode
    ("fused_bf16") existed through round 3 and was DELETED: measured
    280 vs 266 fps but 97.87 % slot agreement (bar >=98 %) and p99
    position delta 0.20 px (bar <0.1) — it failed its own quality gate
    for ~5 % fps. The kernel keeps ``dog_dtype`` as an internal
    parameter."""
    if blur == "fused":
        _, dog, masks = build_pyramid_fused(
            images,
            cfg,
            emit_scales=False,
            emit_masks=True,
            flat_detect=True,
        )
        return dog, masks
    return build_dog(build_scale_space(images, cfg, blur)), [None] * cfg.num_octaves


def detect(
    image: jax.Array, cfg: SiftConfig, blur: str = "separable"
) -> tuple[Keypoints, list[Extrema]]:
    """Full single-image detection: ``(H, W)`` grayscale → keypoints."""
    dog, masks = _dog_pyramid(_as_unit_float(image), cfg, blur)
    return detect_from_dog(dog, cfg, masks)


def detect_batched(
    images: jax.Array, cfg: SiftConfig, blur: str = "separable"
) -> tuple[Keypoints, list[Extrema]]:
    """Batched detection: ``(B, H, W)`` → keypoints with leading batch axis.

    The pyramid build is natively batched (blur ops accept leading dims);
    extrema/refinement vmap over the batch.
    """
    dog, masks = _dog_pyramid(_as_unit_float(images), cfg, blur)
    n = len(dog)
    have_mask = [m is not None for m in masks]
    arrays = list(dog) + [m for m in masks if m is not None]

    def _detect_one(*arrs):
        dogs = list(arrs[:n])
        mask_iter = iter(arrs[n:])
        ms = [next(mask_iter) if hm else None for hm in have_mask]
        return detect_from_dog(dogs, cfg, ms)

    return jax.vmap(_detect_one)(*arrays)


def detect_and_describe(
    image: jax.Array, cfg: SiftConfig, blur: str = "separable"
) -> DescribedKeypoints:
    """Full frontend: ``(H, W)`` grayscale → oriented, described keypoints.

    Stages 1–4 of the reference pipeline plus the descriptor extension
    (BASELINE.json config[2]): per octave, refined keypoints are assigned
    up to ``max_orientations_per_keypoint`` orientations and 128-D
    descriptors from the octave's Gaussian stack.
    """
    image = _as_unit_float(image)
    if image.ndim == 2 and window_describe_supported(cfg):
        return jax.tree.map(
            lambda a: a[0], detect_and_describe_batched(image[None], cfg, blur)
        )
    if blur == "fused":
        scale_space, dog, masks = build_pyramid_fused(
            image, cfg, emit_scales=True, emit_masks=True,
        )
    else:
        scale_space = build_scale_space(image, cfg, blur)
        dog = build_dog(scale_space)
        masks = [None] * cfg.num_octaves
    kps = []
    for octave, (stack, d, m) in enumerate(zip(scale_space, dog, masks)):
        if m is None:
            extrema = compact_extrema(
                find_extrema(d, cfg, cfg.keypoints_per_trio(octave)),
                cfg.refine_capacity(octave),
            )
        else:
            extrema = select_refine_candidates(
                m, d, cfg, cfg.refine_capacity(octave)
            )
        kps.append(refine_keypoints(d, extrema, octave, cfg))
    if cfg.compact_describe:
        return describe_compact(list(scale_space), kps, cfg)
    return concat_described(
        [
            describe_octave(stack, kp, octave, cfg)
            for octave, (stack, kp) in enumerate(zip(scale_space, kps))
        ]
    )


def detect_and_describe_batched(
    images: jax.Array, cfg: SiftConfig, blur: str = "separable"
) -> DescribedKeypoints:
    """Batched frontend: ``(B, H, W)`` → described keypoints per image.

    The pyramid build is natively batched; per-image stages vmap over the
    leading axis.
    """
    images = _as_unit_float(images)
    if blur == "fused":
        scale_space, dog, masks = build_pyramid_fused(
            images, cfg, emit_scales=True, emit_masks=True,
        )
    else:
        scale_space = build_scale_space(images, cfg, blur)
        dog = build_dog(scale_space)
        masks = [None] * cfg.num_octaves
    n = cfg.num_octaves
    have_mask = [m is not None for m in masks]
    mask_arrays = [m for m in masks if m is not None]

    def detect_one(*arrs):
        dogs = arrs[:n]
        mask_iter = iter(arrs[n:])
        ms = [next(mask_iter) if hm else None for hm in have_mask]
        kps = []
        for octave, (d, m) in enumerate(zip(dogs, ms)):
            if m is None:
                extrema = compact_extrema(
                    find_extrema(d, cfg, cfg.keypoints_per_trio(octave)),
                    cfg.refine_capacity(octave),
                )
            else:
                extrema = select_refine_candidates(
                    m, d, cfg, cfg.refine_capacity(octave)
                )
            kps.append(refine_keypoints(d, extrema, octave, cfg))
        return kps

    if window_describe_supported(cfg):
        # Window-DMA describe runs over ALL images' compacted slots in
        # one Pallas dispatch — only detection vmaps per image.
        kps_list = jax.vmap(detect_one)(*dog, *mask_arrays)
        return describe_compact_batched_windowed(
            list(scale_space), kps_list, cfg
        )

    def one(*arrs):
        stacks = arrs[:n]
        kps = detect_one(*arrs[n:])
        if cfg.compact_describe:
            return describe_compact(list(stacks), kps, cfg)
        return concat_described(
            [
                describe_octave(stack, kp, octave, cfg)
                for octave, (stack, kp) in enumerate(zip(stacks, kps))
            ]
        )

    return jax.vmap(one)(*scale_space, *dog, *mask_arrays)


@functools.partial(jax.jit, static_argnames=("cfg", "blur"))
def detect_and_describe_jit(
    image: jax.Array, cfg: SiftConfig, blur: str = "separable"
) -> DescribedKeypoints:
    return detect_and_describe(image, cfg, blur)


@functools.partial(jax.jit, static_argnames=("cfg", "blur"))
def detect_and_describe_batched_jit(
    images: jax.Array, cfg: SiftConfig, blur: str = "separable"
) -> DescribedKeypoints:
    return detect_and_describe_batched(images, cfg, blur)


@functools.partial(jax.jit, static_argnames=("cfg", "blur"))
def detect_jit(image: jax.Array, cfg: SiftConfig, blur: str = "separable"):
    return detect(image, cfg, blur)


@functools.partial(jax.jit, static_argnames=("cfg", "blur"))
def detect_batched_jit(images: jax.Array, cfg: SiftConfig, blur: str = "separable"):
    return detect_batched(images, cfg, blur)
