"""Bundle adjustment with landmark-block Schur complement (TPU-native).

Green-field extension (BASELINE.json config[3]). Classic sparse BA
builds CSR Jacobians and runs sparse Cholesky on the host; none of that
maps to TPU. This design is dense-blocked and fixed-capacity throughout:

- Observations live in a struct-of-arrays buffer ``(O,)`` with
  ``(camera index, landmark index, pixel, valid)`` — masked, static
  shape, vmap-friendly.
- Per-observation 2×6 / 2×3 Jacobians come from ``jax.jacfwd`` of the
  reprojection residual, vmapped over the buffer (no hand-derived
  Jacobians to get wrong).
- The normal equations are assembled with ``segment_sum`` into dense
  per-camera ``(C, 6, 6)``, per-landmark ``(L, 3, 3)`` blocks and a
  dense camera-landmark coupling ``W (C, L, 6, 3)`` — at SLAM scales
  (C ≲ 10², L ≲ 10⁴) W fits HBM easily and turns the Schur reduction
  ``S = H_cc − W·H_ll⁻¹·Wᵀ`` into two einsums on the MXU.
- The reduced camera system (6C × 6C) is solved densely (Cholesky via
  ``jnp.linalg.solve``); landmarks back-substitute with batched 3×3
  inverses.
- Levenberg-Marquardt: branchless accept/reject with adaptive λ (the
  same scheme as ops/ransac.refine_relative_pose, which plain GN
  measurably needed).

The landmark axis is the natural shard axis for multi-host BA: each
device owns a landmark slice of (H_ll, W, b_l) and the Schur reduction
is a ``psum`` over the mesh (see parallel/distributed.py).

Gauge: the first ``num_fixed_cameras`` poses are frozen (their δ is
zeroed) — the standard gauge fix for monocular BA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from .geometry import so3_exp


@struct.dataclass
class Observations:
    """Fixed-capacity reprojection observations."""

    camera: jax.Array  # (O,) int32
    landmark: jax.Array  # (O,) int32
    uv: jax.Array  # (O, 2) float pixels
    valid: jax.Array  # (O,) bool

    @property
    def capacity(self) -> int:
        return self.camera.shape[-1]


@struct.dataclass
class BAState:
    """Poses (world→camera), landmarks, and intrinsics."""

    rotations: jax.Array  # (C, 3, 3)
    translations: jax.Array  # (C, 3)
    points: jax.Array  # (L, 3)
    k_mat: jax.Array  # (3, 3) shared intrinsics


def reprojection_residuals(
    state: BAState, obs: Observations
) -> jax.Array:
    """Masked residuals ``(O, 2)``: predicted − observed pixels.

    Points behind a camera get their residual zeroed via the valid mask
    only if marked; callers should pre-filter cheirality.
    """
    r = state.rotations[obs.camera]  # (O, 3, 3)
    t = state.translations[obs.camera]  # (O, 3)
    x = state.points[obs.landmark]  # (O, 3)
    xc = jnp.einsum("oij,oj->oi", r, x) + t
    z = jnp.where(jnp.abs(xc[:, 2:3]) < 1e-6, 1e-6, xc[:, 2:3])
    fx = state.k_mat[0, 0]
    fy = state.k_mat[1, 1]
    cx = state.k_mat[0, 2]
    cy = state.k_mat[1, 2]
    u = fx * xc[:, 0] / z[:, 0] + cx
    v = fy * xc[:, 1] / z[:, 0] + cy
    res = jnp.stack([u, v], axis=-1) - obs.uv
    return res * obs.valid[:, None]


def _per_obs_residual(rot, t, point, uv, k_mat, dc, dl):
    """Residual of ONE observation under pose increment dc=(ω,v) and
    landmark increment dl — the function we differentiate."""
    r_new = so3_exp(dc[:3]) @ rot
    t_new = t + dc[3:]
    x = point + dl
    xc = r_new @ x + t_new
    z = jnp.where(jnp.abs(xc[2]) < 1e-6, 1e-6, xc[2])
    u = k_mat[0, 0] * xc[0] / z + k_mat[0, 2]
    v = k_mat[1, 1] * xc[1] / z + k_mat[1, 2]
    return jnp.stack([u - uv[0], v - uv[1]])


def _jacobians(state: BAState, obs: Observations):
    """Per-observation residuals and (2,6)/(2,3) Jacobians, masked."""
    zeros6 = jnp.zeros((6,), state.points.dtype)
    zeros3 = jnp.zeros((3,), state.points.dtype)

    def one(c, l, uv, ok):
        rot = state.rotations[c]
        t = state.translations[c]
        x = state.points[l]
        res = _per_obs_residual(rot, t, x, uv, state.k_mat, zeros6, zeros3)
        jc = jax.jacfwd(_per_obs_residual, argnums=5)(
            rot, t, x, uv, state.k_mat, zeros6, zeros3
        )
        jl = jax.jacfwd(_per_obs_residual, argnums=6)(
            rot, t, x, uv, state.k_mat, zeros6, zeros3
        )
        m = ok.astype(res.dtype)
        return res * m, jc * m, jl * m

    return jax.vmap(one)(obs.camera, obs.landmark, obs.uv, obs.valid)


def _schur_normal_equations(
    state: BAState,
    obs: Observations,
    num_cameras: int,
    num_points: int,
    obs_weight: jax.Array | None = None,
):
    """Assemble (H_cc, H_ll, W, b_c, b_l) dense blocks via segment_sum."""
    res, jc, jl = _jacobians(state, obs)  # (O,2) (O,2,6) (O,2,3)
    if obs_weight is not None:
        sw = jnp.sqrt(obs_weight)[:, None]
        res = res * sw
        jc = jc * sw[..., None]
        jl = jl * sw[..., None]

    h_cc = jax.ops.segment_sum(
        jnp.einsum("oki,okj->oij", jc, jc), obs.camera, num_cameras
    )  # (C, 6, 6)
    h_ll = jax.ops.segment_sum(
        jnp.einsum("oki,okj->oij", jl, jl), obs.landmark, num_points
    )  # (L, 3, 3)
    b_c = jax.ops.segment_sum(
        -jnp.einsum("oki,ok->oi", jc, res), obs.camera, num_cameras
    )  # (C, 6)
    b_l = jax.ops.segment_sum(
        -jnp.einsum("oki,ok->oi", jl, res), obs.landmark, num_points
    )  # (L, 3)

    # Dense coupling W: one scatter-add of per-observation (6,3) blocks
    # into the flattened (C*L) pair axis.
    w_blocks = jnp.einsum("oki,okj->oij", jc, jl)  # (O, 6, 3)
    pair = obs.camera * num_points + obs.landmark
    w = jax.ops.segment_sum(w_blocks, pair, num_cameras * num_points)
    w = w.reshape(num_cameras, num_points, 6, 3)
    return h_cc, h_ll, w, b_c, b_l, res


def _solve_schur(
    h_cc, h_ll, w, b_c, b_l, lam, num_fixed_cameras: int
):
    """One damped Schur solve → (δ_cameras (C,6), δ_points (L,3))."""
    c = h_cc.shape[0]
    l = h_ll.shape[0]
    dtype = h_cc.dtype
    eye3 = jnp.eye(3, dtype=dtype)
    eye6 = jnp.eye(6, dtype=dtype)

    # LM damping (multiplicative on diagonals + small absolute floor).
    def damp(h, eye):
        diag = jnp.diagonal(h, axis1=-2, axis2=-1)
        d = lam * jnp.maximum(diag, 1e-8) + 1e-8
        return h + d[..., :, None] * eye

    h_cc_d = damp(h_cc, eye6)
    h_ll_d = damp(h_ll, eye3)

    h_ll_inv = jnp.linalg.inv(h_ll_d)  # (L, 3, 3) batched

    # S = H_cc − W·H_ll⁻¹·Wᵀ ; rhs = b_c − W·H_ll⁻¹·b_l. The reduction is
    # flattened to ONE (6C × 3L)·(3L × 6C) matmul: the direct block
    # einsum over (6,3) tiles measured ~0.1 TFLOP/s on the MXU, the
    # flattened form is a properly tiled large matmul.
    w_hinv = jnp.einsum("clij,ljk->clik", w, h_ll_inv)  # (C, L, 6, 3)
    w2 = jnp.transpose(w, (0, 2, 1, 3)).reshape(c * 6, l * 3)
    wh2 = jnp.transpose(w_hinv, (0, 2, 1, 3)).reshape(c * 6, l * 3)
    s_off = jnp.dot(
        wh2,
        w2.T,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=dtype,
    ).reshape(c, 6, c, 6)
    s_mat = -s_off
    s_mat = s_mat.at[jnp.arange(c), :, jnp.arange(c), :].add(h_cc_d)
    rhs = b_c - (wh2 @ b_l.reshape(l * 3)).reshape(c, 6)

    # Gauge fix: zero out rows/cols of frozen cameras, identity diagonal.
    free = (jnp.arange(c) >= num_fixed_cameras).astype(dtype)
    mask = free[:, None, None, None] * free[None, None, :, None]
    s_mat = s_mat * mask
    s_mat = s_mat.at[jnp.arange(c), :, jnp.arange(c), :].add(
        (1.0 - free)[:, None, None] * eye6
    )
    rhs = rhs * free[:, None]

    delta_c = jnp.linalg.solve(
        s_mat.reshape(c * 6, c * 6), rhs.reshape(c * 6)
    ).reshape(c, 6)
    delta_c = delta_c * free[:, None]

    # Back-substitute landmarks: δl = H_ll⁻¹ (b_l − Wᵀ δc).
    wt_dc = (w2.T @ delta_c.reshape(c * 6)).reshape(l, 3)
    delta_l = jnp.einsum("lij,lj->li", h_ll_inv, b_l - wt_dc)
    return delta_c, delta_l


def apply_step(state: BAState, delta_c, delta_l) -> BAState:
    rot_new = so3_exp(delta_c[:, :3]) @ state.rotations
    return state.replace(
        rotations=rot_new,
        translations=state.translations + delta_c[:, 3:],
        points=state.points + delta_l,
    )


@functools.partial(
    jax.jit, static_argnames=("num_iterations", "num_fixed_cameras")
)
def bundle_adjust(
    state: BAState,
    obs: Observations,
    num_iterations: int = 10,
    num_fixed_cameras: int = 1,
    huber_delta: float | None = None,
) -> tuple[BAState, jax.Array]:
    """Levenberg-Marquardt BA. Returns (refined state, final cost).

    ``huber_delta`` (pixels) enables IRLS robust weighting of
    observations; ``None`` is plain least squares.
    """
    num_cameras = state.rotations.shape[0]
    num_points = state.points.shape[0]
    dtype = state.points.dtype

    def cost_of(s):
        r = reprojection_residuals(s, obs)
        if huber_delta is None:
            return 0.5 * jnp.sum(r * r)
        # Huber cost.
        nrm = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12)
        quad = 0.5 * nrm * nrm
        lin = huber_delta * (nrm - 0.5 * huber_delta)
        return jnp.sum(jnp.where(nrm <= huber_delta, quad, lin))

    def weights_of(s):
        if huber_delta is None:
            return None
        r = reprojection_residuals(s, obs)
        nrm = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-12)
        return jnp.where(nrm <= huber_delta, 1.0, huber_delta / nrm).astype(
            dtype
        )

    lam = jnp.asarray(1e-4, dtype)
    cost = cost_of(state)
    for _ in range(num_iterations):
        h_cc, h_ll, w, b_c, b_l, _ = _schur_normal_equations(
            state, obs, num_cameras, num_points, weights_of(state)
        )
        delta_c, delta_l = _solve_schur(
            h_cc, h_ll, w, b_c, b_l, lam, num_fixed_cameras
        )
        cand = apply_step(state, delta_c, delta_l)
        cand_cost = cost_of(cand)
        accept = cand_cost < cost
        state = jax.tree.map(
            lambda new, old: jnp.where(accept, new, old), cand, state
        )
        cost = jnp.where(accept, cand_cost, cost)
        lam = jnp.clip(
            jnp.where(accept, lam * 0.3, lam * 6.0), 1e-9, 1e5
        )
    return state, cost
