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
from ..ops.refine import refine_keypoints
from ..ops.resize import downsample2x_nn, upsample2x_nn

BLUR_STRATEGIES: dict[str, Callable] = {
    "exact": blur_exact,
    "separable": blur_separable,
    "matmul": blur_matmul,
    "pallas": blur_pallas,
}


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


def detect(
    image: jax.Array, cfg: SiftConfig, blur: str = "separable"
) -> tuple[Keypoints, list[Extrema]]:
    """Full single-image detection: ``(H, W)`` grayscale → keypoints."""
    dog = build_dog(build_scale_space(image, cfg, blur))
    return detect_from_dog(dog, cfg)


def detect_batched(
    images: jax.Array, cfg: SiftConfig, blur: str = "separable"
) -> tuple[Keypoints, list[Extrema]]:
    """Batched detection: ``(B, H, W)`` → keypoints with leading batch axis.

    The pyramid build is natively batched (blur ops accept leading dims);
    extrema/refinement vmap over the batch.
    """
    dog = build_dog(build_scale_space(images, cfg, blur))

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
