"""Worker for the 2-process ``jax.distributed`` test (not a pytest module).

Each of two OS processes runs this script with its process id; both join a
single JAX runtime through ``multihost.initialize`` (the wrapper under
test — ``parallel/multihost.py``), build the hybrid ``(dcn=2, ici=2)``
mesh over 2 local CPU devices per process, run one sequence-partitioned
sparse-BA solve, and assert parity with the process-local single-device
solve. Exit code 0 from BOTH workers = the multi-process branch works.

Usage: python tests/multiprocess_worker.py PORT PROCESS_ID
"""

import os
import sys

PORT = sys.argv[1]
PID = int(sys.argv[2])

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402

# jax may already be imported at interpreter startup (site hooks), so env
# vars are too late here — pin everything through the config API: CPU
# platform, 2 local devices per process, and an explicit cross-process
# collectives implementation (the default "none" leaves each process
# with only its local devices).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_enable_x64", True)   # oracle-precision parity

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mvslam_tpu.ops import ba_sparse  # noqa: E402
from mvslam_tpu.parallel import multihost  # noqa: E402
from mvslam_tpu.parallel.dist_ba_sparse import (  # noqa: E402
    distributed_sparse_ba_solve_hybrid,
)
from mvslam_tpu.parallel.synthetic import make_sequence_ba_problem  # noqa: E402


def main() -> int:
    active = multihost.initialize(
        coordinator_address=f"127.0.0.1:{PORT}", num_processes=2,
        process_id=PID,
    )
    assert active, "initialize() must report a live multi-process runtime"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()
    assert len(jax.local_devices()) == 2

    mesh = multihost.make_hybrid_mesh()          # dcn=process_count=2, ici=2
    assert mesh.shape == {"dcn": 2, "ici": 2}, mesh.shape
    # every ICI row must be single-process (the make_hybrid_mesh guarantee)
    for row in mesh.devices:
        assert len({d.process_index for d in row}) == 1, mesh.devices

    # identical problem in both processes (same PRNG seed)
    prob, poses_true, _ = make_sequence_ba_problem(
        jax.random.PRNGKey(11), num_frames=16, points_per_frame=8, window=4,
        dtype=jnp.float64,
    )
    params = ba_sparse.SparseBAParams(max_iterations=12, cg_iterations=40)

    result = distributed_sparse_ba_solve_hybrid(prob, mesh, params)
    # poses are replicated (psum'd camera system): addressable everywhere
    t_dist = np.asarray(jax.device_get(result.poses.t))

    local = ba_sparse.sparse_ba_solve(prob, params)
    t_local = np.asarray(jax.device_get(local.poses.t))

    err = float(np.max(np.abs(t_dist - t_local)))
    print(f"[proc {PID}] pose parity max|Δt| = {err:.2e}", flush=True)
    assert err < 1e-8, err
    # and the solve actually moved toward the ground truth (monocular
    # gauge leaves a bounded global drift mode — same contract as
    # test_sparse_sequence_recovers_truth)
    gt = float(np.max(np.abs(t_dist - np.asarray(poses_true.t))))
    print(f"[proc {PID}] max|t - truth| = {gt:.2e}", flush=True)
    assert gt < 0.2, gt
    print(f"[proc {PID}] OK", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
