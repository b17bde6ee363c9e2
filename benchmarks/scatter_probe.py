"""Scatter-side BA probe (VERDICT r4 next-item #4).

Primitive-level probe of the BA assembly's scatter-adds
(`jax.ops.segment_sum`, measured ~12 ns/scattered element in round 3)
against sort-by-landmark structural alternatives:

  A. segment_sum baseline        (O,W) -> (L,W)        [scatter engine]
  B. padded row-gather + dense sum over the slot axis   [gather rows +
     bandwidth reduction]: obs sorted by landmark once per window; the
     padded (L, M) index table is static across LM iterations.
  C. one-hot slot einsum for the W coupling: padded (L,M,18) blocks x
     onehot (L,M,C) -> (C,L,18) on the MXU, vs the pair-id scatter.
  D. sorted cumsum + boundary gather (precision-suspect; for the record)
  E. raw row-gather rate: ns per contiguous row vs row width.

Timing methodology copied from benchmarks/bw_probe.py (dispatch all
iters, one scalar sync, subtract measured launch latency).
"""

import functools
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

O = 25600
L = 4096
C = 50
ITERS = 20


def sync(v):
    return float(np.asarray(v))


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
T_LAUNCH = float(np.median(lat))
print(f"launch latency {T_LAUNCH*1e3:.1f} ms", flush=True)


def time_one(fn, *a, iters=ITERS):
    def run_all():
        outs = [fn(*a) for _ in range(iters)]
        return sync(sum(jnp.sum(o.reshape(-1)[:8]) for o in outs))

    sync(jnp.sum(fn(*a).reshape(-1)[:8]))
    run_all()
    t0 = time.perf_counter()
    run_all()
    return max((time.perf_counter() - t0) - T_LAUNCH, 1e-9) / iters


rng = np.random.default_rng(0)

# Realistic landmark id distribution: every landmark 1..C obs, mean O/L.
counts = rng.integers(1, 13, size=L)
counts = np.maximum(1, (counts * (O / counts.sum())).astype(np.int64))
while counts.sum() < O:
    counts[rng.integers(0, L)] += 1
while counts.sum() > O:
    i = rng.integers(0, L)
    if counts[i] > 1:
        counts[i] -= 1
seg_sorted = np.repeat(np.arange(L), counts).astype(np.int32)
perm = rng.permutation(O)
seg_unsorted = seg_sorted[perm]
cam_ids = rng.integers(0, C, size=O).astype(np.int32)

data12 = rng.standard_normal((O, 12)).astype(np.float32)
data18 = rng.standard_normal((O, 18)).astype(np.float32)

M = int(1 << int(np.ceil(np.log2(counts.max()))))
starts = np.zeros(L, np.int64)
starts[1:] = np.cumsum(counts)[:-1]
pad_idx = np.minimum(starts[:, None] + np.arange(M)[None, :], O - 1)
pad_mask = (np.arange(M)[None, :] < counts[:, None]).astype(np.float32)
print(f"counts: mean {counts.mean():.2f} max {counts.max()} pad M={M} "
      f"LxM={L*M}", flush=True)

d12 = jax.device_put(data12)
d18 = jax.device_put(data18)
seg_u = jax.device_put(seg_unsorted)
seg_s = jax.device_put(seg_sorted)
pidx = jax.device_put(pad_idx.astype(np.int32))
pmask = jax.device_put(pad_mask)
cam_d = jax.device_put(cam_ids)

results = {}

# --- A: segment_sum baseline (unsorted ids, as production) -----------
@jax.jit
def seg_scatter12(d, s):
    return jax.ops.segment_sum(d, s, L)


@jax.jit
def seg_scatter18_pair(d, s, c):
    pair = c.astype(jnp.int32) * (L + 1) + s
    return jax.ops.segment_sum(d, pair, C * (L + 1))


t = time_one(seg_scatter12, d12, seg_u)
results["A_segment_sum_12w"] = {"ms": t * 1e3, "ns_per_el": t * 1e9 / (O * 12)}

t = time_one(seg_scatter18_pair, d18, seg_u, cam_d)
results["A_pair_scatter_18w"] = {"ms": t * 1e3, "ns_per_el": t * 1e9 / (O * 18)}

# --- B: padded row-gather + dense sum --------------------------------
@jax.jit
def padded_gather_sum(d, idx, mask):
    g = jnp.take(d, idx.reshape(-1), axis=0).reshape(L, M, -1)
    return jnp.sum(g * mask[:, :, None], axis=1)


t = time_one(padded_gather_sum, d12, pidx, pmask)
results["B_padded_gather_sum_12w"] = {
    "ms": t * 1e3,
    "ns_per_row": t * 1e9 / (L * M),
    "vs_A": results["A_segment_sum_12w"]["ms"] / (t * 1e3),
}

# --- C: W coupling via one-hot slot einsum ---------------------------
onehot_np = np.zeros((L, M, C), np.float32)
cam_sorted = cam_ids[np.argsort(seg_unsorted, kind="stable")]
cam_pad = cam_sorted[pad_idx]  # (L, M)
onehot_np[np.arange(L)[:, None], np.arange(M)[None, :], cam_pad] = pad_mask
onehot_d = jax.device_put(onehot_np)
cam_pad_d = jax.device_put(cam_pad.astype(np.int32))


@jax.jit
def w_onehot(d, idx, mask, oh):
    g = jnp.take(d, idx.reshape(-1), axis=0).reshape(L, M, -1)
    g = g * mask[:, :, None]
    return jnp.einsum(
        "lmw,lmc->clw", g, oh,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


@jax.jit
def w_onehot_build(d, idx, mask, cpad):
    # include one-hot construction cost (it is lam-independent but cheap)
    oh = (
        cpad[:, :, None] == jnp.arange(C, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.float32) * mask[:, :, None]
    g = jnp.take(d, idx.reshape(-1), axis=0).reshape(L, M, -1)
    g = g * mask[:, :, None]
    return jnp.einsum(
        "lmw,lmc->clw", g, oh,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


t = time_one(w_onehot, d18, pidx, pmask, onehot_d)
results["C_w_onehot_18w"] = {
    "ms": t * 1e3,
    "vs_A_pair": results["A_pair_scatter_18w"]["ms"] / (t * 1e3),
}
t = time_one(w_onehot_build, d18, pidx, pmask, cam_pad_d)
results["C_w_onehot_incl_build"] = {"ms": t * 1e3}

# --- D: sorted cumsum + boundary gather ------------------------------
ends = jax.device_put((starts + counts - 1).astype(np.int32))
starts_d = jax.device_put(starts.astype(np.int32))


@jax.jit
def cumsum_bound(d):
    p = jnp.cumsum(d, axis=0)
    hi = jnp.take(p, ends, axis=0)
    lo = jnp.where(
        (starts_d == 0)[:, None], 0.0, jnp.take(p, starts_d - 1, axis=0)
    )
    return hi - lo


t = time_one(cumsum_bound, d12)
ref = jax.ops.segment_sum(d12, seg_s, L)
got = cumsum_bound(d12)
err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9))
results["D_cumsum_boundary_12w"] = {
    "ms": t * 1e3,
    "vs_A": results["A_segment_sum_12w"]["ms"] / (t * 1e3),
    "rel_err": err,
}

# --- E: raw row-gather rate vs width ---------------------------------
for w in (4, 12, 18, 32, 128):
    dw = jax.device_put(rng.standard_normal((O, w)).astype(np.float32))
    gi = jax.device_put(rng.integers(0, O, size=L * M).astype(np.int32))

    @jax.jit
    def rowgather(d, i):
        return jnp.take(d, i, axis=0)

    t = time_one(rowgather, dw, gi)
    results[f"E_rowgather_w{w}"] = {
        "ms": t * 1e3,
        "ns_per_row": t * 1e9 / (L * M),
        "ns_per_el": t * 1e9 / (L * M * w),
    }

# correctness of B vs A
ref12 = jax.ops.segment_sum(d12, seg_u, L)
gotB = padded_gather_sum(d12, pidx, pmask)
errB = float(jnp.max(jnp.abs(ref12 - gotB)))
results["B_padded_gather_sum_12w"]["abs_err_vs_A"] = errB

print(json.dumps(results, indent=1), flush=True)
