"""Multi-process (fake-cluster) distributed BA test (SURVEY.md §4).

Spawns 2 OS processes, each with 4 virtual CPU devices, joined via
``jax.distributed.initialize`` into one 8-device global mesh, and runs
the landmark-sharded bundle adjustment over it. Process 0 writes its
result; the parent compares it against the single-process solution.
This is the multi-host execution path (parallel/multihost.py) minus
real DCN — the collective topology (cross-process psum through gloo)
is identical.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys, json
import numpy as np

sys.path.insert(0, os.environ["REPO_ROOT"])

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from sift_scale_space_extrema_detection_tpu.parallel.multihost import (
    initialize_multihost, global_mesh, put_global, replicate_global,
)
from jax.sharding import PartitionSpec as P

initialize_multihost(
    coordinator_address=os.environ["COORD"],
    num_processes=int(os.environ["NPROC"]),
    process_id=int(os.environ["PID_IDX"]),
)
assert jax.process_count() == int(os.environ["NPROC"])
assert len(jax.devices()) == 8, len(jax.devices())

mesh = global_mesh()

from sift_scale_space_extrema_detection_tpu.parallel.distributed import (
    distributed_bundle_adjust,
)
from sift_scale_space_extrema_detection_tpu.sfm.ba import BAState, Observations
from tests.ba_problem import make_problem  # shared deterministic problem

state_np, obs_np = make_problem()
state = BAState(
    rotations=replicate_global(state_np["rotations"], mesh),
    translations=replicate_global(state_np["translations"], mesh),
    points=put_global(state_np["points"], mesh, P("shard")),
    k_mat=replicate_global(state_np["k_mat"], mesh),
)
obs = Observations(
    camera=replicate_global(obs_np["camera"], mesh),
    landmark=replicate_global(obs_np["landmark"], mesh),
    uv=replicate_global(obs_np["uv"], mesh),
    valid=replicate_global(obs_np["valid"], mesh),
)
refined, cost = distributed_bundle_adjust(state, obs, mesh, num_iterations=8)
# Rotations/translations/cost are replicated -> locally addressable.
if jax.process_index() == 0:
    np.savez(
        os.environ["OUT_NPZ"],
        rotations=np.asarray(refined.rotations),
        translations=np.asarray(refined.translations),
        cost=np.asarray(cost),
    )
print("worker", jax.process_index(), "done", float(cost))
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_ba_matches_single(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    out_npz = str(tmp_path / "p0.npz")
    worker_py = str(tmp_path / "worker.py")
    with open(worker_py, "w") as f:
        f.write(WORKER)

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        # The axon sitecustomize registers its PJRT plugin at interpreter
        # start (initializing the backend before jax.distributed can);
        # unsetting its trigger keeps worker processes CPU-pure.
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["REPO_ROOT"] = repo
        env["COORD"] = f"localhost:{port}"
        env["NPROC"] = "2"
        env["PID_IDX"] = str(pid)
        env["OUT_NPZ"] = out_npz
        procs.append(
            subprocess.Popen(
                [sys.executable, worker_py],
                env=env,
                cwd=repo,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    # Single-process reference on the same problem.
    import jax.numpy as jnp

    from sift_scale_space_extrema_detection_tpu.sfm.ba import (
        BAState,
        Observations,
        bundle_adjust,
    )
    from tests.ba_problem import make_problem

    state_np, obs_np = make_problem()
    state = BAState(
        rotations=jnp.asarray(state_np["rotations"]),
        translations=jnp.asarray(state_np["translations"]),
        points=jnp.asarray(state_np["points"]),
        k_mat=jnp.asarray(state_np["k_mat"]),
    )
    obs = Observations(
        camera=jnp.asarray(obs_np["camera"]),
        landmark=jnp.asarray(obs_np["landmark"]),
        uv=jnp.asarray(obs_np["uv"]),
        valid=jnp.asarray(obs_np["valid"]),
    )
    ref, ref_cost = bundle_adjust(state, obs, num_iterations=8)

    got = np.load(out_npz)
    np.testing.assert_allclose(
        got["rotations"], np.asarray(ref.rotations), atol=1e-6
    )
    np.testing.assert_allclose(
        got["translations"], np.asarray(ref.translations), atol=1e-6
    )
    assert abs(float(got["cost"]) - float(ref_cost)) < 1e-3 * max(
        1.0, float(ref_cost)
    )
