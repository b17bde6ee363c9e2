"""Vectorized 26-neighbor scale-space extrema detection.

The reference scans interior pixels of each DoG trio with a scalar loop
and strict comparisons against all 26 neighbors, plus a contrast
pre-filter (reference/src/sift.js:212-316, background.js:359-450). Here
the scan is a dense masked computation over the whole ``(D, H, W)`` DoG
stack — shifted slices, a min/max reduction over the 26 neighbors, and a
sort-based compaction into a fixed-capacity candidate buffer whose slot
order matches the reference's row-major emission order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SiftConfig
from ..core.types import Extrema


def _neighborhood_min_max(dog: jax.Array):
    """Per-plane separable 3×3 min/max over the interior, shared by trios.

    Each DoG plane's 3×3-neighborhood extrema are computed ONCE with two
    separable passes (rows then columns) and reused by every trio that
    touches the plane — the naive per-trio version re-sliced 26
    neighbors per trio (130 slice-ops per octave vs ~30 here).
    Returns ``(min3, max3)`` of shape ``(D, H-2, W-2)``.
    """
    h, w = dog.shape[-2], dog.shape[-1]
    a = dog[:, :, 0 : w - 2]
    b = dog[:, :, 1 : w - 1]
    c = dog[:, :, 2:w]
    row_min = jnp.minimum(jnp.minimum(a, b), c)
    row_max = jnp.maximum(jnp.maximum(a, b), c)
    min3 = jnp.minimum(
        jnp.minimum(row_min[:, 0 : h - 2], row_min[:, 1 : h - 1]),
        row_min[:, 2:h],
    )
    max3 = jnp.maximum(
        jnp.maximum(row_max[:, 0 : h - 2], row_max[:, 1 : h - 1]),
        row_max[:, 2:h],
    )
    return min3, max3


def _trio_masks(dog: jax.Array, min3: jax.Array, max3: jax.Array, s: int, cfg: SiftConfig):
    """Candidate / low-contrast masks for the trio centered at DoG scale s.

    Returns boolean masks of shape (H-2, W-2) over interior pixels.
    Strict extremality: center > max(26 neighbors) or < min(26) — ties and
    plateaus rejected, matching ``Array.every`` with strict comparisons
    (reference/src/sift.js:261-266). The adjacent planes use the shared
    full-3×3 ``min3``/``max3``; the center plane needs its own 8-neighbor
    RING min/max (center excluded — the full 3×3 would include the center
    and break strictness), assembled from the same separable row pieces.
    """
    h, w = dog.shape[-2], dog.shape[-1]
    center = dog[s, 1 : h - 1, 1 : w - 1]
    plane = dog[s]

    # Ring (8-neighbor) min/max of the center plane: top and bottom rows
    # via the separable row min/max, the middle row from the two lateral
    # neighbors only (center excluded).
    a = plane[:, 0 : w - 2]
    b = plane[:, 1 : w - 1]
    c = plane[:, 2:w]
    row_min = jnp.minimum(jnp.minimum(a, b), c)
    row_max = jnp.maximum(jnp.maximum(a, b), c)
    mid_min = jnp.minimum(a, c)[1 : h - 1]
    mid_max = jnp.maximum(a, c)[1 : h - 1]
    ring_min = jnp.minimum(
        jnp.minimum(row_min[0 : h - 2], row_min[2:h]), mid_min
    )
    ring_max = jnp.maximum(
        jnp.maximum(row_max[0 : h - 2], row_max[2:h]), mid_max
    )

    neighbor_min = jnp.minimum(jnp.minimum(min3[s - 1], min3[s + 1]), ring_min)
    neighbor_max = jnp.maximum(jnp.maximum(max3[s - 1], max3[s + 1]), ring_max)

    is_extremum = (center > neighbor_max) | (center < neighbor_min)
    passes = jnp.abs(center) >= jnp.asarray(
        cfg.contrast_prefilter_threshold, dog.dtype
    )
    return is_extremum & passes, is_extremum & ~passes


def _compact(mask: jax.Array, values: jax.Array, capacity: int):
    """Compact a 2-D interior mask into (y, x, value, valid) buffers.

    Slot order is row-major over the interior — identical to the
    reference's scan order (src/sift.js:221-222) — via group-compressed
    ``top_k`` over negated indices (details below; a naive full
    ``lax.sort`` of the H·W index vector measured ~1.3 s of the original
    9.6 s frontend batch, a flat partial sort still ~0.3 s). Indices stay
    < 2²⁴ at realistic image sizes so the float32 keys used by TPU
    ``top_k`` are exact; a guard enforces this.
    """
    hh, ww = mask.shape
    size = hh * ww
    assert size < (1 << 24), "image too large for exact float32 top_k keys"
    flat_mask = mask.reshape(-1)

    # Group-compressed selection: top_k over the full H·W vector is the
    # wrong tool for a ~0.1%-dense mask (a direct partial sort measured
    # ~300 ms of the frontend batch). Compress 16 pixels per group, take
    # the first `capacity` NONEMPTY groups in row-major order (one top_k
    # over H·W/16 keys), then expand the selected groups' bits and make
    # the final in-order selection over capacity·16 keys. Exact: every
    # candidate in a selected group survives to the expansion; candidates
    # are only lost to capacity overflow itself (still counted by the
    # per-trio `num_candidates` counter, so it stays observable).
    group = 16
    if size > 64 * group:
        pad = (-size) % group
        m = flat_mask
        if pad:
            m = jnp.pad(m, (0, pad))
        mg = m.reshape(-1, group)  # (G, 16)
        n_groups = mg.shape[0]
        any_g = jnp.any(mg, axis=1)
        g_idx = jax.lax.broadcasted_iota(jnp.int32, (n_groups, 1), 0).squeeze(-1)
        g_keys = jnp.where(any_g, -g_idx.astype(jnp.float32), -jnp.inf)
        g_cap = min(capacity, n_groups)
        top_g, _ = jax.lax.top_k(g_keys, g_cap)
        g_ok = jnp.isfinite(top_g)
        g_sel = jnp.where(g_ok, (-top_g).astype(jnp.int32), 0)
        bits = mg[g_sel] & g_ok[:, None]  # (g_cap, 16)
        pos = g_sel[:, None] * group + jnp.arange(group)[None, :]
        keys = jnp.where(bits, -pos.astype(jnp.float32), -jnp.inf).reshape(-1)
    else:
        idx = jax.lax.broadcasted_iota(jnp.int32, (size, 1), 0).squeeze(-1)
        keys = jnp.where(flat_mask, -idx.astype(jnp.float32), -jnp.inf)

    if keys.shape[0] < capacity:
        keys = jnp.pad(
            keys, (0, capacity - keys.shape[0]), constant_values=-jnp.inf
        )
    top_keys, _ = jax.lax.top_k(keys, capacity)
    valid = jnp.isfinite(top_keys)
    safe = jnp.where(valid, (-top_keys).astype(jnp.int32), 0)
    y = safe // ww + 1
    x = safe % ww + 1
    value = values.reshape(-1)[safe]
    return y.astype(jnp.int32), x.astype(jnp.int32), value, valid


def compact_extrema(extrema: Extrema, capacity: int) -> Extrema:
    """Squeeze valid candidate slots into a smaller buffer.

    The per-trio buffers are sized for worst-case density, so after the
    scan most slots are invalid — but refinement pays per SLOT (its
    gathers dominate the frontend). One more top_k over slot indices
    packs the valid candidates (order preserved: ascending slot = the
    reference's trio-major, row-major emission order) into ``capacity``
    slots. Overflow drops trailing candidates; the per-trio
    ``num_candidates`` counters still count everything, so it stays
    observable.
    """
    n = extrema.y.shape[0]
    if capacity >= n:
        return extrema
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    keys = jnp.where(extrema.valid, -idx.astype(jnp.float32), -jnp.inf)
    top_keys, _ = jax.lax.top_k(keys, capacity)
    ok = jnp.isfinite(top_keys)
    slot = jnp.where(ok, (-top_keys).astype(jnp.int32), 0)
    return Extrema(
        y=extrema.y[slot],
        x=extrema.x[slot],
        scale_level=extrema.scale_level[slot],
        value=extrema.value[slot],
        valid=ok & extrema.valid[slot],
        num_candidates=extrema.num_candidates,
        num_low_contrast=extrema.num_low_contrast,
    )


def find_extrema(
    dog: jax.Array, cfg: SiftConfig, capacity: int | None = None
) -> Extrema:
    """Candidate extrema for one octave's DoG stack ``(D, H, W)``.

    Trios are centered at DoG scales ``1..D-2`` (background.js:377); the
    output buffer concatenates per-trio compactions so the global slot
    order matches the reference's (trio, row-major) iteration order used
    later by refinement (background.js:468-479). ``capacity`` overrides
    the per-trio slot count (upper octaves have 4x fewer pixels per
    octave, so callers shrink it — see SiftConfig.keypoints_per_trio).
    """
    h, w = dog.shape[-2], dog.shape[-1]
    cap = cfg.max_keypoints_per_trio if capacity is None else capacity
    min3, max3 = _neighborhood_min_max(dog)
    ys, xs, scale_levels, vals, valids = [], [], [], [], []
    n_cand, n_low = [], []
    for s in range(1, cfg.dog_per_octave - 1):
        cand_mask, low_mask = _trio_masks(dog, min3, max3, s, cfg)
        center = dog[s, 1 : h - 1, 1 : w - 1]
        y, x, value, valid = _compact(cand_mask, center, cap)
        ys.append(y)
        xs.append(x)
        scale_levels.append(jnp.full((cap,), s, jnp.int32))
        vals.append(value)
        valids.append(valid)
        n_cand.append(jnp.sum(cand_mask, dtype=jnp.int32))
        n_low.append(jnp.sum(low_mask, dtype=jnp.int32))

    return Extrema(
        y=jnp.concatenate(ys),
        x=jnp.concatenate(xs),
        scale_level=jnp.concatenate(scale_levels),
        value=jnp.concatenate(vals),
        valid=jnp.concatenate(valids),
        num_candidates=jnp.stack(n_cand),
        num_low_contrast=jnp.stack(n_low),
    )
