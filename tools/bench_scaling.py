"""Scaling-efficiency evidence for the sharded sparse-BA solve.

The BASELINE north star is >=75% scaling efficiency at 4 hosts. Real
multi-chip/multi-host hardware is unavailable (one tunneled chip; this
host has 2 cores), so strong-scaling wall-clock curves are unmeasurable:
the 8 virtual CPU devices time-share 2 cores and any wall-clock
"efficiency" off this box is noise in EITHER direction (round-3 showed
super-linear 8.5x "efficiencies"; round-4's work-normalized table showed
negative overheads because the dense reduced-camera solve is replicated
once in the sharded run but repeated N times across serialized reference
slices — honest numbers that could only mislead; VERDICT r4 weak #4).

What this tool reports instead (r5):

1. MEASURED per-shard compute time vs shard count — the time a single
   device takes to solve its 1/N landmark slice of the fixed problem
   (median of 5 warm repetitions + IQR). This is the clean measurement
   the analytic model consumes: it needs no virtual-mesh concurrency
   story, and its 1/N trend is the real per-shard work curve.
2. EXECUTION checks: the edge-sharded 8-device solve and the hybrid
   (dcn=2, ici=4) solve run to completion with finite results (numeric
   parity with the single-device solve is asserted by
   tests/test_parallel.py / test_multiprocess.py). Their wall clocks are
   intentionally NOT reported.
3. The ANALYTIC collective-cost model: per LM iteration each shard psums
   one (F, 6, 6) + (F, 6) partial camera system (assembly) and one
   (F, 6) vector per CG application. With measured per-shard compute and
   published v5e link numbers (ICI ~45 GB/s/link, DCN ~25 GB/s/host,
   ~10-25 us/collective), efficiency(N) = t_compute / (t_compute +
   t_comm). Every efficiency number is labeled model-derived.
   Validation points include the 10k-keyframe/1M-landmark BASELINE-scale
   run (tools/bench_baseline_scale.py writes its measured solve time into
   SCALING.json's ``baseline_scale``; the model row here reuses it).

Writes SCALING.json at the repo root and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

# NOTE: env vars are too late here — site hooks import jax at interpreter
# startup, so the platform/device count must go through the config API.

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402

from mvslam_tpu.ops import ba_sparse  # noqa: E402
from mvslam_tpu.parallel.dist_ba_sparse import (  # noqa: E402
    distributed_sparse_ba_solve, distributed_sparse_ba_solve_hybrid,
)
from mvslam_tpu.parallel.mesh import make_mesh  # noqa: E402
from mvslam_tpu.parallel.multihost import make_hybrid_mesh  # noqa: E402
from mvslam_tpu.parallel.synthetic import make_sequence_ba_problem  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


def slice_landmarks(prob: ba_sparse.SparseBAProblem, n: int
                    ) -> ba_sparse.SparseBAProblem:
    """First ``n`` landmarks (time-ordered ⇒ a contiguous sequence block);
    frames/poses unchanged — the per-shard slice of the distributed solve."""
    return prob._replace(
        points0=prob.points0[:n],
        obs_frame=prob.obs_frame[:n],
        obs=prob.obs[:n],
        obs_mask=prob.obs_mask[:n],
        obs_weight=prob.obs_weight[:n],
        point_prior=prob.point_prior[:n],
        point_prior_info=prob.point_prior_info[:n],
    )


def main() -> int:
    frames, ppf = 1024, 64                     # 65k landmarks, 262k obs
    prob, _, _ = make_sequence_ba_problem(
        jax.random.PRNGKey(0), num_frames=frames, points_per_frame=ppf,
        window=4, dtype=jnp.float32,
    )
    P_total = prob.points0.shape[0]
    iters = 4
    params = ba_sparse.SparseBAParams(
        max_iterations=iters, cg_iterations=10, rel_decrease=0.0,
        lambda_max=1e30,                       # fixed work per solve
    )

    def timed(tag, solve_fn, reps=5):
        """Median + IQR of warm repetitions (compile + 1 warmup discarded)."""
        res = solve_fn()                       # compile
        jax.block_until_ready(res.points)
        res = solve_fn()                       # warmup (caches hot)
        jax.block_until_ready(res.points)
        ts = []
        for _ in range(reps):
            t0 = time.time()
            res = solve_fn()
            jax.block_until_ready(res.points)
            ts.append(time.time() - t0)
        ts.sort()
        med = ts[len(ts) // 2]
        iqr = ts[(3 * len(ts)) // 4] - ts[len(ts) // 4]
        log(f"{tag:22s} median {med*1e3:9.1f} ms  IQR {iqr*1e3:7.1f} ms "
            f"({int(res.iterations)/med:6.2f} LM iters/s)")
        return med, iqr

    devices = jax.devices()
    one = make_mesh(devices[:1])
    shard_t = {}
    for n in (1, 2, 4, 8):
        sub = slice_landmarks(prob, P_total // n)
        shard_t[n] = timed(
            f"per-shard slice P/{n}",
            lambda p=sub: distributed_sparse_ba_solve(p, one, params),
        )

    # execution checks (no wall clock reported: virtual devices serialize)
    res8 = distributed_sparse_ba_solve(prob, make_mesh(devices), params)
    jax.block_until_ready(res8.points)
    ok8 = bool(jnp.all(jnp.isfinite(res8.poses.t)))
    hybrid = make_hybrid_mesh(devices, dcn_size=2)
    resh = distributed_sparse_ba_solve_hybrid(prob, hybrid, params)
    jax.block_until_ready(resh.points)
    okh = bool(jnp.all(jnp.isfinite(resh.poses.t)))
    log(f"execution checks: 8-shard finite={ok8}, hybrid 2x4 finite={okh}")

    # ---- analytic collective-cost model (real-mesh efficiency basis) ----
    F = frames
    bytes_assembly = F * (36 + 6) * 4          # (F,6,6)+(F,6) psum / LM it
    bytes_cg = F * 6 * 4                       # (F,6) psum / CG application
    bytes_per_lm_iter = bytes_assembly + 10 * bytes_cg

    def model(t_compute_iter, n_shards, bw_gbps, lat_us, tag,
              bytes_iter=bytes_per_lm_iter, basis="measured per-shard slice"):
        n_coll = 1 + 10                        # assembly + CG psums
        t_comm = n_coll * lat_us * 1e-6 + bytes_iter / (bw_gbps * 1e9)
        eff = t_compute_iter / (t_compute_iter + t_comm)
        log(f"model {tag}: compute {t_compute_iter*1e3:.1f} ms/iter, "
            f"comm {t_comm*1e6:.0f} us/iter -> efficiency {eff:.4f}")
        return {
            "shards": n_shards,
            "t_compute_ms_per_lm_iter": round(t_compute_iter * 1e3, 2),
            "t_comm_us_per_lm_iter": round(t_comm * 1e6, 1),
            "bytes_psum_per_lm_iter": bytes_iter,
            "link": tag,
            "compute_basis": basis,
            "efficiency_model_derived": round(eff, 4),
        }

    models = [
        model(shard_t[4][0] / iters, 4, 45.0, 10.0, "ici_45GBps_10us"),
        model(shard_t[4][0] / iters, 4, 25.0, 25.0, "dcn_25GBps_25us"),
        model(shard_t[8][0] / iters, 8, 25.0, 25.0, "dcn_25GBps_25us_8shard"),
    ]

    # baseline-scale validation point: reuse the measured 10k-kf/1M-landmark
    # solve time recorded by tools/bench_baseline_scale.py
    path = os.path.join(os.path.dirname(__file__), "..", "SCALING.json")
    baseline_scale = None
    try:
        with open(path) as f:
            prev = json.load(f)
        baseline_scale = prev.get("baseline_scale")
    except Exception:
        pass
    if baseline_scale and "warm_solve_s" in baseline_scale:
        cfg_b = baseline_scale.get("config", {})
        F_b = int(cfg_b.get("keyframes", 10240))
        it_b = max(int(cfg_b.get("lm_iterations", 4)), 1)
        t_iter_b = float(baseline_scale["warm_solve_s"]) / it_b
        bytes_b = (F_b * (36 + 6) * 4) + 10 * (F_b * 6 * 4)
        models.append(model(
            t_iter_b, 8, 25.0, 25.0, "dcn_25GBps_25us_baseline_scale",
            bytes_iter=bytes_b,
            basis="measured 10k-kf/1M-landmark 8-shard solve "
                  "(bench_baseline_scale.py)",
        ))

    out = {
        "problem": {"keyframes": frames, "landmarks": P_total,
                    "obs_per_landmark": 4, "lm_iterations": iters,
                    "cg_iterations": 10, "dtype": "float32"},
        "method": ("Every number is either a clean single-device "
                   "measurement (median-of-5 warm repetitions + IQR of the "
                   "1/N-landmark slice solve on ONE virtual CPU device) or "
                   "explicitly model-derived. Virtual-mesh wall clocks are "
                   "not reported: 8 virtual devices time-share 2 cores, so "
                   "concurrent-execution timings on this host are noise "
                   "(see module docstring of tools/bench_scaling.py)."),
        "t_per_shard_compute_ms": {
            str(n): [round(t * 1e3, 1), round(q * 1e3, 1)]
            for n, (t, q) in shard_t.items()},
        "execution_checks": {"sharded_8dev_finite": ok8,
                             "hybrid_dcn2_ici4_finite": okh},
        "collective_cost_model": {
            "bytes_psum_per_lm_iteration": bytes_per_lm_iter,
            "note": ("per LM iteration each shard psums the (F,6,6)+(F,6) "
                     "partial camera system once plus one (F,6) vector per "
                     "CG application; compute time measured from the warm "
                     "single-device slice solve"),
            "models": models,
        },
    }
    if baseline_scale is not None:
        out["baseline_scale"] = baseline_scale
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
