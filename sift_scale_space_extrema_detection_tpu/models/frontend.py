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
from ..ops.descriptor import DescribedKeypoints, concat_described, describe_octave
from ..ops.dog import difference_of_gaussians
from ..ops.extrema import compact_extrema, find_extrema
from ..ops.gaussian import blur_exact, blur_matmul, blur_separable
from ..ops.pallas.blur import blur_pallas
from ..ops.pallas.octave import fused_octave, fused_octave_supported
from ..ops.refine import refine_keypoints
from ..ops.resize import downsample2x_nn, upsample2x_nn

BLUR_STRATEGIES: dict[str, Callable] = {
    "exact": blur_exact,
    "separable": blur_separable,
    "matmul": blur_matmul,
    "pallas": blur_pallas,
}


def build_pyramid_fused(
    images: jax.Array,
    cfg: SiftConfig,
    emit_scales: bool = True,
    interpret: bool = False,
) -> tuple[list[jax.Array] | None, list[jax.Array]]:
    """Pyramid + DoG via the fused whole-octave Pallas kernel.

    ``images``: ``(..., H, W)``. Returns ``(scale_space, dog)`` per
    octave; ``scale_space`` is ``None`` when ``emit_scales=False`` (the
    detect-only path — the Gaussian stacks never leave the chip, only
    DoG and each octave's seed scale are written to HBM). Octaves whose
    kernel plan does not fit VMEM fall back to the XLA separable path.
    """
    batch_shape = images.shape[:-2]
    flat = images.reshape((-1,) + images.shape[-2:])
    base = upsample2x_nn(flat)
    on_tpu = jax.default_backend() == "tpu"
    scale_space: list[jax.Array] = []
    dogs: list[jax.Array] = []
    for octave in range(cfg.num_octaves):
        sigmas = [
            None if (octave > 0 and s == 0) else cfg.offset_sigma(octave, s)
            for s in range(cfg.scales_per_octave_total)
        ]
        h, w = base.shape[-2], base.shape[-1]
        if (on_tpu or interpret) and fused_octave_supported(
            h, w, sigmas, cfg.scales_per_octave
        ):
            scales, dog, seed = fused_octave(
                base,
                sigmas,
                cfg.scales_per_octave,
                emit_scales=emit_scales,
                interpret=interpret,
            )
        else:
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
        dogs.append(dog.reshape(batch_shape + dog.shape[-3:]))
        base = downsample2x_nn(seed)
    return (scale_space if emit_scales else None), dogs


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
    dog: list[jax.Array], cfg: SiftConfig
) -> tuple[Keypoints, list[Extrema]]:
    """Extrema scan + refinement over per-octave DoG stacks (unbatched).

    The returned ``Extrema`` keep the raw per-trio slot layout (segment
    ``t`` = slots ``[t·cap, (t+1)·cap)``) for introspection/parity;
    refinement internally consumes a compacted copy (cost is per slot).
    """
    extrema = [
        find_extrema(d, cfg, cfg.keypoints_per_trio(octave))
        for octave, d in enumerate(dog)
    ]
    keypoints = [
        refine_keypoints(
            d, compact_extrema(e, cfg.refine_capacity(octave)), octave, cfg
        )
        for octave, (d, e) in enumerate(zip(dog, extrema))
    ]
    return concat_keypoints(keypoints), extrema


def _dog_pyramid(
    images: jax.Array, cfg: SiftConfig, blur: str
) -> list[jax.Array]:
    """DoG stacks per octave; ``blur="fused"`` takes the whole-octave
    Pallas kernel path (Gaussian stacks never written to HBM)."""
    if blur == "fused":
        _, dog = build_pyramid_fused(images, cfg, emit_scales=False)
        return dog
    return build_dog(build_scale_space(images, cfg, blur))


def detect(
    image: jax.Array, cfg: SiftConfig, blur: str = "separable"
) -> tuple[Keypoints, list[Extrema]]:
    """Full single-image detection: ``(H, W)`` grayscale → keypoints."""
    return detect_from_dog(_dog_pyramid(image, cfg, blur), cfg)


def detect_batched(
    images: jax.Array, cfg: SiftConfig, blur: str = "separable"
) -> tuple[Keypoints, list[Extrema]]:
    """Batched detection: ``(B, H, W)`` → keypoints with leading batch axis.

    The pyramid build is natively batched (blur ops accept leading dims);
    extrema/refinement vmap over the batch.
    """
    dog = _dog_pyramid(images, cfg, blur)

    def _detect_one(*dog_octaves):
        return detect_from_dog(list(dog_octaves), cfg)

    return jax.vmap(_detect_one)(*dog)


def detect_and_describe(
    image: jax.Array, cfg: SiftConfig, blur: str = "separable"
) -> DescribedKeypoints:
    """Full frontend: ``(H, W)`` grayscale → oriented, described keypoints.

    Stages 1–4 of the reference pipeline plus the descriptor extension
    (BASELINE.json config[2]): per octave, refined keypoints are assigned
    up to ``max_orientations_per_keypoint`` orientations and 128-D
    descriptors from the octave's Gaussian stack.
    """
    if blur == "fused":
        scale_space, dog = build_pyramid_fused(image, cfg, emit_scales=True)
    else:
        scale_space = build_scale_space(image, cfg, blur)
        dog = build_dog(scale_space)
    described = []
    for octave, (stack, d) in enumerate(zip(scale_space, dog)):
        extrema = compact_extrema(
            find_extrema(d, cfg, cfg.keypoints_per_trio(octave)),
            cfg.refine_capacity(octave),
        )
        keypoints = refine_keypoints(d, extrema, octave, cfg)
        described.append(describe_octave(stack, keypoints, octave, cfg))
    return concat_described(described)


def detect_and_describe_batched(
    images: jax.Array, cfg: SiftConfig, blur: str = "separable"
) -> DescribedKeypoints:
    """Batched frontend: ``(B, H, W)`` → described keypoints per image.

    The pyramid build is natively batched; per-image stages vmap over the
    leading axis.
    """
    if blur == "fused":
        scale_space, dog = build_pyramid_fused(images, cfg, emit_scales=True)
    else:
        scale_space = build_scale_space(images, cfg, blur)
        dog = build_dog(scale_space)

    def one(*stacks_and_dogs):
        stacks = stacks_and_dogs[: cfg.num_octaves]
        dogs = stacks_and_dogs[cfg.num_octaves :]
        described = []
        for octave, (stack, d) in enumerate(zip(stacks, dogs)):
            extrema = compact_extrema(
                find_extrema(d, cfg, cfg.keypoints_per_trio(octave)),
                cfg.refine_capacity(octave),
            )
            keypoints = refine_keypoints(d, extrema, octave, cfg)
            described.append(describe_octave(stack, keypoints, octave, cfg))
        return concat_described(described)

    return jax.vmap(one)(*scale_space, *dog)


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
