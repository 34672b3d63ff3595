"""Instantiate and solve the named BASELINE scale configuration:
10,000 keyframes / 1,000,000 landmarks, distributed sparse BA on the
8-device virtual CPU mesh (BASELINE.json config 4; SURVEY §7 step 7).

This is the capability gtsam's sparse graph gives the reference
(``vision/ba.cpp:96-117``) taken to blueprint scale: the fixed-degree
sparse layout stores O(P*D), so the million-landmark problem is a few
hundred MB of arrays, and the sequence-partitioned solve shards the
landmark/time axis over the mesh.

Run:  python tools/bench_baseline_scale.py
Writes the result block into SCALING.json under "baseline_scale".
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

# NOTE: env vars are too late here — site hooks import jax at interpreter
# startup, so the platform/device count must go through the config API.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mvslam_tpu.ops import ba_sparse  # noqa: E402
from mvslam_tpu.parallel.dist_ba_sparse import (  # noqa: E402
    distributed_sparse_ba_solve,
)
from mvslam_tpu.parallel.mesh import make_mesh  # noqa: E402
from mvslam_tpu.parallel.synthetic import make_sequence_ba_problem  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


def main() -> int:
    frames, ppf, window = 10_000, 100, 4      # 1e6 landmarks, 4e6 obs
    t0 = time.time()
    prob, poses_true, _ = make_sequence_ba_problem(
        jax.random.PRNGKey(0), num_frames=frames, points_per_frame=ppf,
        window=window, dtype=jnp.float32,
    )
    jax.block_until_ready(prob.points0)
    P = prob.points0.shape[0]
    bytes_problem = sum(
        np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(prob)
    )
    log(f"problem built: F={frames} P={P} D={window} "
        f"({bytes_problem / 1e6:.0f} MB of arrays, {time.time()-t0:.1f}s)")

    iters = 4
    params = ba_sparse.SparseBAParams(
        max_iterations=iters, cg_iterations=10, rel_decrease=0.0,
        lambda_max=1e30,                      # fixed work: measure rate
    )
    mesh = make_mesh(jax.devices())
    t0 = time.time()
    res = distributed_sparse_ba_solve(prob, mesh, params)
    jax.block_until_ready(res.points)
    t_first = time.time() - t0
    log(f"first solve (compile + run): {t_first:.1f}s")

    t0 = time.time()
    res = distributed_sparse_ba_solve(prob, mesh, params)
    jax.block_until_ready(res.points)
    t_solve = time.time() - t0
    it = int(res.iterations)
    finite = bool(jnp.all(jnp.isfinite(res.poses.t))) and bool(
        jnp.all(jnp.isfinite(res.points))
    )
    drift = float(jnp.max(jnp.abs(res.poses.t - poses_true.t)))
    cost = float(res.error)
    peak_rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    log(f"warm solve: {t_solve:.1f}s, {it} LM iters "
        f"({it / t_solve:.2f} iters/s), cost {cost:.4g}, finite={finite}, "
        f"max|t-truth|={drift:.3f}, peak RSS {peak_rss_gb:.1f} GB")

    out = {
        "config": {"keyframes": frames, "landmarks": P,
                   "obs_per_landmark": window, "dtype": "float32",
                   "lm_iterations": iters, "cg_iterations": 10,
                   "mesh_devices": len(jax.devices())},
        "problem_mb": round(bytes_problem / 1e6, 1),
        "compile_plus_first_solve_s": round(t_first, 1),
        "warm_solve_s": round(t_solve, 1),
        "lm_iters_per_s": round(it / t_solve, 3),
        "final_cost": cost,
        "all_finite": finite,
        "max_pose_drift_vs_truth": round(drift, 4),
        "peak_rss_gb": round(peak_rss_gb, 2),
    }
    path = os.path.join(os.path.dirname(__file__), "..", "SCALING.json")
    try:
        with open(path) as f:
            scaling = json.load(f)
    except Exception:
        scaling = {}
    scaling["baseline_scale"] = out
    with open(path, "w") as f:
        json.dump(scaling, f, indent=1)
    print(json.dumps(out))
    return 0 if finite else 1


if __name__ == "__main__":
    raise SystemExit(main())
