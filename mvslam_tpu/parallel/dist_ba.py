"""Distributed bundle adjustment: landmark-sharded Schur-complement LM.

The scaling story of SURVEY §7 step 7: landmarks (and their observations,
priors, Jacobian blocks, and 3x3 eliminations) are sharded over the mesh's
``data`` axis; poses and their priors are replicated. Each LM iteration:

1. every shard builds its local Jacobian blocks and eliminates its own
   landmark 3x3 blocks (zero communication),
2. the reduced 6F x 6F camera system and gradient are assembled with psums
   over ICI (the only cross-shard traffic — O(F^2) floats per iteration,
   independent of the landmark count),
3. the dense camera solve is replicated; landmark back-substitution is
   shard-local.

The compute core is literally :func:`mvslam_tpu.ops.ba.ba_solve` with an
``axis_name`` — single-device and distributed BA share one implementation,
so the 1-shard-vs-N-shard equivalence tests compare the same code path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mvslam_tpu.math.lie import SE3
from mvslam_tpu.ops import ba as ba_mod
from mvslam_tpu.parallel.mesh import DATA_AXIS, pad_to_multiple


def pad_problem(prob: ba_mod.BAProblem, multiple: int) -> ba_mod.BAProblem:
    """Pad the landmark axis to a multiple of the mesh size; padded rows are
    fully masked (zero obs weight, zero priors) so results are unchanged."""
    Pn = prob.points0.shape[0]
    target = pad_to_multiple(Pn, multiple)
    extra = target - Pn
    if extra == 0:
        return prob

    def pad_p(x, value=0.0):
        cfg = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=value)

    def pad_fp(x, value=0.0):
        cfg = [(0, 0), (0, extra)] + [(0, 0)] * (x.ndim - 2)
        return jnp.pad(x, cfg, constant_values=value)

    return prob._replace(
        points0=pad_p(prob.points0),
        obs=pad_fp(prob.obs),
        obs_mask=pad_fp(prob.obs_mask, False),
        obs_weight=pad_fp(prob.obs_weight),
        point_prior=pad_p(prob.point_prior),
        point_prior_info=pad_p(prob.point_prior_info),
    )


def _shard_specs(axis: str):
    """(in_specs, out_specs) PartitionSpecs for BAProblem -> BAResult."""
    prob_spec = ba_mod.BAProblem(
        poses0=SE3(P(), P()),
        points0=P(axis),
        obs=P(None, axis),
        obs_mask=P(None, axis),
        obs_weight=P(None, axis),
        pose_prior=SE3(P(), P()),
        pose_prior_info=P(),
        point_prior=P(axis),
        point_prior_info=P(axis),
    )
    result_spec = ba_mod.BAResult(
        poses=SE3(P(), P()),
        points=P(axis),
        pose_covariance=P(),
        point_covariance=P(axis),
        error=P(),
        iterations=P(),
        converged=P(),
    )
    return prob_spec, result_spec


def distributed_ba_solve(
    prob: ba_mod.BAProblem,
    mesh: Mesh,
    params: ba_mod.BAParams = ba_mod.BAParams(),
    axis: str = DATA_AXIS,
) -> ba_mod.BAResult:
    """Solve a BA problem with landmarks sharded across ``mesh``.

    The landmark axis is padded to the mesh size; outputs are sliced back.
    """
    n_dev = mesh.shape[axis]
    orig_p = prob.points0.shape[0]
    prob = pad_problem(prob, n_dev)
    prob_spec, result_spec = _shard_specs(axis)

    solve = jax.shard_map(
        partial(ba_mod.ba_solve, params=params, axis_name=axis),
        mesh=mesh,
        in_specs=(prob_spec,),
        out_specs=result_spec,
    )
    result = jax.jit(solve)(prob)
    if prob.points0.shape[0] != orig_p:
        result = result._replace(
            points=result.points[:orig_p],
            point_covariance=result.point_covariance[:orig_p],
        )
    return result
