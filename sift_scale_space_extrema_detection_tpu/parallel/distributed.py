"""Multi-device execution: data-parallel frontend + landmark-sharded BA.

TPU-native replacement for the reference's 2-thread postMessage model
(SURVEY.md §5.8): the only inter-participant channel here is XLA
collectives over the device mesh (``psum`` on ICI), driven by
``shard_map``.

Sharding layout (BASELINE.json config[4]):

- **Frontend**: images are data-parallel — batch axis sharded over the
  mesh; the whole detect+describe pipeline runs independently per shard.
- **Bundle adjustment**: the landmark block is the big axis, so
  landmarks (and their normal-equation blocks ``H_ll``, ``W``, ``b_l``)
  are sharded; every device computes the Schur contribution of ITS
  landmarks and one ``psum`` produces the reduced camera system, which
  is solved replicated (cameras are small). Landmark updates
  back-substitute locally — no gather of the landmark block ever
  materializes on one device.

Observation buffers are replicated; each observation is *owned* by the
device holding its landmark (ownership mask), so psum'd camera-side
sums count every observation exactly once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SiftConfig
from ..models.frontend import detect_and_describe_batched
from ..sfm.ba import BAState, Observations
from ..sfm.geometry import so3_exp


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    """1-D mesh over available devices (CPU-backend fallback included)."""
    import numpy as np

    devices = jax.devices()
    if n_devices is not None and len(devices) < n_devices:
        devices = jax.devices("cpu")
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=(axis,))


def detect_and_describe_data_parallel(
    images: jax.Array, cfg: SiftConfig, mesh: Mesh, blur: str = "separable"
):
    """Batched frontend with the batch axis sharded over the mesh."""
    axis = mesh.axis_names[0]
    sharding = NamedSharding(mesh, P(axis))
    images = jax.device_put(images, sharding)
    fn = jax.jit(
        functools.partial(detect_and_describe_batched, cfg=cfg, blur=blur),
        in_shardings=sharding,
    )
    return fn(images)


def match_against_keyframes_sharded(
    query_desc: jax.Array,
    query_valid: jax.Array,
    keyframe_desc: jax.Array,
    keyframe_valid: jax.Array,
    mesh: Mesh,
    ratio: float = 0.8,
):
    """Match one query set against many keyframes, sharded by keyframe.

    BASELINE.json config[4]: "batched keypoint matching sharded by
    keyframe". ``keyframe_desc``: ``(K, M, 128)`` with K a multiple of
    the mesh size (pad with invalid keyframes otherwise). The query is
    replicated; each device runs the MXU distance matmul + ratio/mutual
    test for its keyframe slice — no collectives needed, results come
    back keyframe-sharded.

    Returns ``(index (K, N), distance (K, N), valid (K, N))``.
    """
    from ..ops.matching import match_descriptors

    axis = mesh.axis_names[0]

    def local(q_desc, q_valid, kf_d, kf_v):
        def one(kd, kv):
            m = match_descriptors(q_desc, q_valid, kd, kv, ratio=ratio)
            return m.index, m.distance, m.valid

        return jax.vmap(one)(kf_d, kf_v)

    sharded = P(axis)
    rep = P()
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(rep, rep, sharded, sharded),
        out_specs=(sharded, sharded, sharded),
    )
    return jax.jit(fn)(query_desc, query_valid, keyframe_desc, keyframe_valid)


def _pad_landmarks(state: BAState, n_shards: int) -> tuple[BAState, int]:
    """Pad the landmark axis to a multiple of the mesh size."""
    l = state.points.shape[0]
    pad = (-l) % n_shards
    if pad:
        state = state.replace(
            points=jnp.concatenate(
                [state.points, jnp.zeros((pad, 3), state.points.dtype)]
            )
        )
    return state, l + pad


def distributed_bundle_adjust(
    state: BAState,
    obs: Observations,
    mesh: Mesh,
    num_iterations: int = 10,
    num_fixed_cameras: int = 1,
) -> tuple[BAState, jax.Array]:
    """Landmark-sharded LM bundle adjustment over a device mesh.

    Semantics match :func:`..sfm.ba.bundle_adjust` (plain least squares);
    the Schur reduction of the landmark block is a ``psum`` over the
    mesh axis. Returns (refined state, final cost).
    """
    axis = mesh.axis_names[0]
    n_shards = mesh.shape[axis]
    orig_l = state.points.shape[0]
    state, l_padded = _pad_landmarks(state, n_shards)
    l_local = l_padded // n_shards
    num_cameras = state.rotations.shape[0]
    dtype = state.points.dtype
    eye3 = jnp.eye(3, dtype=dtype)
    eye6 = jnp.eye(6, dtype=dtype)
    cam_ids = jnp.arange(num_cameras)
    free = (cam_ids >= num_fixed_cameras).astype(dtype)

    def residual_terms(rots, ts, kmat, points_local, cam, lm_local, uv, own):
        """Masked residuals + Jacobians for locally-owned observations."""
        r = rots[cam]
        t = ts[cam]
        x = points_local[jnp.clip(lm_local, 0, l_local - 1)]
        m = own.astype(dtype)

        def one(rot_o, t_o, x_o, uv_o, m_o):
            def res_fn(dc, dl):
                r_new = so3_exp(dc[:3]) @ rot_o
                t_new = t_o + dc[3:]
                xc = r_new @ (x_o + dl) + t_new
                z = jnp.where(jnp.abs(xc[2]) < 1e-6, 1e-6, xc[2])
                u = kmat[0, 0] * xc[0] / z + kmat[0, 2]
                v = kmat[1, 1] * xc[1] / z + kmat[1, 2]
                return jnp.stack([u - uv_o[0], v - uv_o[1]])

            z6 = jnp.zeros(6, dtype)
            z3 = jnp.zeros(3, dtype)
            res = res_fn(z6, z3)
            jc = jax.jacfwd(res_fn, argnums=0)(z6, z3)
            jl = jax.jacfwd(res_fn, argnums=1)(z6, z3)
            return res * m_o, jc * m_o, jl * m_o

        return jax.vmap(one)(r, t, x, uv, m)

    def step(points_local, rots, ts, kmat, cam, lm, uv, valid, lam, cost):
        shard = jax.lax.axis_index(axis)
        offset = shard * l_local
        lm_local = lm - offset
        own = valid & (lm_local >= 0) & (lm_local < l_local)

        res, jc, jl = residual_terms(
            rots, ts, kmat, points_local, cam, lm_local, uv, own
        )

        # Camera-side sums: each obs owned by exactly one device → psum.
        h_cc = jax.lax.psum(
            jax.ops.segment_sum(
                jnp.einsum("oki,okj->oij", jc, jc), cam, num_cameras
            ),
            axis,
        )
        b_c = jax.lax.psum(
            jax.ops.segment_sum(
                -jnp.einsum("oki,ok->oi", jc, res), cam, num_cameras
            ),
            axis,
        )
        # Landmark-side sums stay local.
        seg = jnp.where(own, lm_local, l_local)  # overflow bucket
        h_ll = jax.ops.segment_sum(
            jnp.einsum("oki,okj->oij", jl, jl), seg, l_local + 1
        )[:l_local]
        b_l = jax.ops.segment_sum(
            -jnp.einsum("oki,ok->oi", jl, res), seg, l_local + 1
        )[:l_local]
        pair = cam * (l_local + 1) + seg
        w = jax.ops.segment_sum(
            jnp.einsum("oki,okj->oij", jc, jl),
            pair,
            num_cameras * (l_local + 1),
        ).reshape(num_cameras, l_local + 1, 6, 3)[:, :l_local]

        def damp(h, eye):
            diag = jnp.diagonal(h, axis1=-2, axis2=-1)
            d = lam * jnp.maximum(diag, 1e-8) + 1e-8
            return h + d[..., :, None] * eye

        h_cc_d = damp(h_cc, eye6)
        h_ll_d = damp(h_ll, eye3)
        h_ll_inv = jnp.linalg.inv(h_ll_d)

        # Schur reduction: local landmark contribution as ONE flattened
        # (6C × 3L_local) matmul (see sfm/ba._solve_schur), then one psum.
        w_hinv = jnp.einsum("clij,ljk->clik", w, h_ll_inv)
        w2 = jnp.transpose(w, (0, 2, 1, 3)).reshape(num_cameras * 6, l_local * 3)
        wh2 = jnp.transpose(w_hinv, (0, 2, 1, 3)).reshape(
            num_cameras * 6, l_local * 3
        )
        s_off_local = jnp.dot(
            wh2,
            w2.T,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=dtype,
        ).reshape(num_cameras, 6, num_cameras, 6)
        rhs_local = (wh2 @ b_l.reshape(l_local * 3)).reshape(num_cameras, 6)
        s_off = jax.lax.psum(s_off_local, axis)
        rhs = b_c - jax.lax.psum(rhs_local, axis)

        s_mat = -s_off
        s_mat = s_mat.at[cam_ids, :, cam_ids, :].add(h_cc_d)
        mask = free[:, None, None, None] * free[None, None, :, None]
        s_mat = s_mat * mask
        s_mat = s_mat.at[cam_ids, :, cam_ids, :].add(
            (1.0 - free)[:, None, None] * eye6
        )
        rhs = rhs * free[:, None]

        delta_c = jnp.linalg.solve(
            s_mat.reshape(num_cameras * 6, num_cameras * 6),
            rhs.reshape(num_cameras * 6),
        ).reshape(num_cameras, 6) * free[:, None]

        wt_dc = (w2.T @ delta_c.reshape(num_cameras * 6)).reshape(l_local, 3)
        delta_l = jnp.einsum("lij,lj->li", h_ll_inv, b_l - wt_dc)

        rots_new = so3_exp(delta_c[:, :3]) @ rots
        ts_new = ts + delta_c[:, 3:]
        points_new = points_local + delta_l

        # New cost (local residuals → psum).
        res_new, _, _ = residual_terms(
            rots_new, ts_new, kmat, points_new, cam, lm_local, uv, own
        )
        cost_new = jax.lax.psum(0.5 * jnp.sum(res_new * res_new), axis)

        accept = cost_new < cost
        rots = jnp.where(accept, rots_new, rots)
        ts = jnp.where(accept, ts_new, ts)
        points_local = jnp.where(accept, points_new, points_local)
        cost = jnp.where(accept, cost_new, cost)
        lam = jnp.clip(
            jnp.where(accept, lam * 0.3, lam * 6.0), 1e-9, 1e5
        )
        return points_local, rots, ts, lam, cost

    def run(points, rots, ts, kmat, cam, lm, uv, valid):
        # Initial cost.
        shard = jax.lax.axis_index(axis)
        offset = shard * l_local
        lm_local = lm - offset
        own = valid & (lm_local >= 0) & (lm_local < l_local)
        res0, _, _ = residual_terms(rots, ts, kmat, points, cam, lm_local, uv, own)
        cost = jax.lax.psum(0.5 * jnp.sum(res0 * res0), axis)
        lam = jnp.asarray(1e-4, dtype)
        for _ in range(num_iterations):
            points, rots, ts, lam, cost = step(
                points, rots, ts, kmat, cam, lm, uv, valid, lam, cost
            )
        return points, rots, ts, cost

    sharded = P(axis)
    rep = P()
    run_sharded = shard_map(
        run,
        mesh=mesh,
        in_specs=(sharded, rep, rep, rep, rep, rep, rep, rep),
        out_specs=(sharded, rep, rep, rep),
    )
    points, rots, ts, cost = jax.jit(run_sharded)(
        state.points,
        state.rotations,
        state.translations,
        state.k_mat,
        obs.camera,
        obs.landmark,
        obs.uv,
        obs.valid,
    )
    out_state = BAState(
        rotations=rots,
        translations=ts,
        points=points[:orig_l],
        k_mat=state.k_mat,
    )
    return out_state, cost
