"""Distribution-overhead measurement for the sharded sparse-BA solve.

The BASELINE north star is >=75% scaling efficiency at 4 hosts. Real
multi-chip/multi-host hardware is unavailable (one tunneled chip; this
host has 2 cores), so classic strong-scaling wall-clock curves are
unmeasurable: the 8 virtual CPU devices time-share 2 cores, and any
wall-clock "efficiency" off this box is noise (round-3 SCALING.json
showed super-linear 8.5x "efficiencies" — garbage).

Two things ARE defensible here, and both are reported:

1. MEASURED work-normalized distribution overhead, median-of-N with
   spread: t_dist(N) = sharded solve of the full problem on N virtual
   devices; t_ref(N) = single-device solve of its 1/N landmark slice.
   On serialized virtual devices the ideal is t_dist = N * t_ref;
   overhead(N) = t_dist(N) / (N * t_ref(N)) - 1 is the op-level cost of
   distribution. Medians over warm-cache repetitions; IQR reported so
   the reader can judge. Expect NEGATIVE values at larger N: the dense
   reduced-camera solve (6F x 6F) is replicated once in the sharded run
   but repeated N times across the serialized slices, while the
   landmark-side work scales 1/N — the sharded solve amortizes it.

2. ANALYTIC collective-cost model for the real-mesh claim: per LM
   iteration each shard psums one (F, 6, 6) + (F, 6) partial camera
   system (assembly) and one (F, 6) vector per CG application. With the
   measured per-shard compute time and published v5e link numbers
   (ICI ~45 GB/s/link, DCN ~25 GB/s/host, ~10 us/collective latency),
   efficiency(N) = t_compute / (t_compute + t_comm) — the reviewable
   basis for the >=75%-at-4-hosts target that a virtual mesh cannot
   fake.

Writes SCALING.json at the repo root and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

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
    dist_t, ref_t = {}, {}
    for n in (1, 2, 4, 8):
        mesh = make_mesh(devices[:n])
        dist_t[n] = timed(
            f"dist N={n} (P={P_total})",
            lambda m=mesh: distributed_sparse_ba_solve(prob, m, params),
        )
        sub = slice_landmarks(prob, P_total // n)
        ref_t[n] = timed(
            f"ref  1-shard P/{n}",
            lambda p=sub: distributed_sparse_ba_solve(
                p, make_mesh(devices[:1]), params),
        )
    hybrid = make_hybrid_mesh(devices, dcn_size=2)
    t_h, t_h_iqr = timed(
        "hybrid 2x4",
        lambda: distributed_sparse_ba_solve_hybrid(prob, hybrid, params),
    )

    # measured op-level distribution overhead (see docstring: ideal on
    # serialized virtual devices is t_dist = N * t_ref)
    overhead = {
        n: dist_t[n][0] / (n * ref_t[n][0]) - 1.0 for n in dist_t
    }

    # ---- analytic collective-cost model (real-mesh efficiency basis) ----
    F = frames
    bytes_assembly = F * (36 + 6) * 4          # (F,6,6)+(F,6) psum / LM it
    bytes_cg = F * 6 * 4                       # (F,6) psum / CG application
    bytes_per_lm_iter = bytes_assembly + 10 * bytes_cg
    # per-shard compute per LM iteration, measured from the warm
    # single-device slice solve (the only trustworthy wall-clock here)
    def model(n_shards, bw_gbps, lat_us, tag):
        t_compute_iter = ref_t[n_shards][0] / iters
        n_coll = 1 + 10                        # assembly + CG psums
        t_comm = n_coll * lat_us * 1e-6 + bytes_per_lm_iter / (bw_gbps * 1e9)
        eff = t_compute_iter / (t_compute_iter + t_comm)
        log(f"model {tag}: compute {t_compute_iter*1e3:.1f} ms/iter, "
            f"comm {t_comm*1e6:.0f} us/iter -> efficiency {eff:.4f}")
        return {
            "shards": n_shards,
            "t_compute_ms_per_lm_iter": round(t_compute_iter * 1e3, 2),
            "t_comm_us_per_lm_iter": round(t_comm * 1e6, 1),
            "bytes_psum_per_lm_iter": bytes_per_lm_iter,
            "link": tag,
            "efficiency": round(eff, 4),
        }

    models = [
        model(4, 45.0, 10.0, "ici_45GBps_10us"),     # 4 chips in a slice
        model(4, 25.0, 25.0, "dcn_25GBps_25us"),     # 4 single-chip hosts
        model(8, 25.0, 25.0, "dcn_25GBps_25us_8shard"),
    ]

    out = {
        "problem": {"keyframes": frames, "landmarks": P_total,
                    "obs_per_landmark": 4, "lm_iterations": iters,
                    "cg_iterations": 10, "dtype": "float32"},
        "method": ("median-of-5 warm repetitions on the 8-device virtual "
                   "CPU mesh (2-core host => shards serialize; ideal "
                   "t_dist = N*t_ref; see module docstring). The analytic "
                   "model, not the virtual-mesh wall clock, is the basis "
                   "for real-mesh efficiency claims."),
        "t_dist_ms": {str(n): [round(t * 1e3, 1), round(q * 1e3, 1)]
                      for n, (t, q) in dist_t.items()},
        "t_ref_1shard_slice_ms": {str(n): [round(t * 1e3, 1),
                                           round(q * 1e3, 1)]
                                  for n, (t, q) in ref_t.items()},
        "measured_overhead_vs_serialized_ideal": {
            str(n): round(o, 3) for n, o in overhead.items()},
        "lm_iters_per_s_8shard": round(iters / dist_t[8][0], 2),
        "hybrid_dcn2_ici4_ms": [round(t_h * 1e3, 1), round(t_h_iqr * 1e3, 1)],
        "collective_cost_model": {
            "bytes_psum_per_lm_iteration": bytes_per_lm_iter,
            "note": ("per LM iteration each shard psums the (F,6,6)+(F,6) "
                     "partial camera system once plus one (F,6) vector per "
                     "CG application; compute time measured from the warm "
                     "single-device slice solve"),
            "models": models,
        },
    }
    path = os.path.join(os.path.dirname(__file__), "..", "SCALING.json")
    try:
        with open(path) as f:
            prev = json.load(f)
        if "baseline_scale" in prev:
            out["baseline_scale"] = prev["baseline_scale"]
    except Exception:
        pass
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
