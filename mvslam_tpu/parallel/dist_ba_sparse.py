"""Distributed sparse BA: keyframe-sequence partitioning over the mesh.

The SP/CP row of SURVEY §2.8: a long keyframe sequence is partitioned in
TIME. Landmarks are stored ordered by their anchor keyframe (the synthetic
generator and any real map builder emit them that way), so sharding the
landmark axis into equal contiguous blocks hands each device one time
block's landmarks and observations. Poses are replicated (6F floats);
boundary keyframes observed from two blocks (the halo) are coupled only
through the psum'd (F, 6)/(F, 6, 6) camera-system reductions inside
:func:`mvslam_tpu.ops.ba_sparse.sparse_ba_solve` — there is no explicit
halo exchange to orchestrate, XLA lowers the psums onto ICI.

Single-device and distributed solves share one implementation (the
``axis_name`` threading), so the 1-vs-N-shard equivalence tests compare the
same code path, like :mod:`mvslam_tpu.parallel.dist_ba` for the dense core.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from mvslam_tpu.math.lie import SE3
from mvslam_tpu.ops import ba_sparse
from mvslam_tpu.parallel.mesh import DATA_AXIS, pad_to_multiple


def pad_problem(
    prob: ba_sparse.SparseBAProblem, multiple: int
) -> ba_sparse.SparseBAProblem:
    """Pad the landmark axis to a mesh multiple; padding rows are fully
    masked (zero weight/prior, frame index 0) so results are unchanged."""
    Pn = prob.points0.shape[0]
    target = pad_to_multiple(Pn, multiple)
    extra = target - Pn
    if extra == 0:
        return prob

    def pad_p(x, value=0.0):
        cfg = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=value)

    return prob._replace(
        points0=pad_p(prob.points0),
        obs_frame=pad_p(prob.obs_frame, 0),
        obs=pad_p(prob.obs),
        obs_mask=pad_p(prob.obs_mask, False),
        obs_weight=pad_p(prob.obs_weight),
        point_prior=pad_p(prob.point_prior),
        point_prior_info=pad_p(prob.point_prior_info),
    )


def _shard_specs(axis: str):
    prob_spec = ba_sparse.SparseBAProblem(
        poses0=SE3(P(), P()),
        points0=P(axis),
        obs_frame=P(axis),
        obs=P(axis),
        obs_mask=P(axis),
        obs_weight=P(axis),
        pose_prior=SE3(P(), P()),
        pose_prior_info=P(),
        point_prior=P(axis),
        point_prior_info=P(axis),
    )
    result_spec = ba_sparse.SparseBAResult(
        poses=SE3(P(), P()),
        points=P(axis),
        error=P(),
        iterations=P(),
        converged=P(),
    )
    return prob_spec, result_spec


def distributed_sparse_ba_solve(
    prob: ba_sparse.SparseBAProblem,
    mesh: Mesh,
    params: ba_sparse.SparseBAParams = ba_sparse.SparseBAParams(),
    axis: str = DATA_AXIS,
) -> ba_sparse.SparseBAResult:
    """Solve with landmarks (= time blocks, see module docstring) sharded
    across ``mesh``. The landmark axis is padded to the mesh size; outputs
    are sliced back."""
    n_dev = mesh.shape[axis]
    orig_p = prob.points0.shape[0]
    prob = pad_problem(prob, n_dev)
    prob_spec, result_spec = _shard_specs(axis)
    solve = jax.shard_map(
        partial(ba_sparse.sparse_ba_solve, params=params, axis_name=axis),
        mesh=mesh,
        in_specs=(prob_spec,),
        out_specs=result_spec,
    )
    result = jax.jit(solve)(prob)
    if prob.points0.shape[0] != orig_p:
        result = result._replace(points=result.points[:orig_p])
    return result


def distributed_sparse_ba_solve_hybrid(
    prob: ba_sparse.SparseBAProblem,
    mesh: Mesh,
    params: ba_sparse.SparseBAParams = ba_sparse.SparseBAParams(),
) -> ba_sparse.SparseBAResult:
    """Sparse BA over a 2-D ``(dcn, ici)`` hybrid mesh (multi-host layout,
    :mod:`mvslam_tpu.parallel.multihost`).

    Landmarks stay time-ordered, so sharding their axis over the
    flattened ``(dcn, ici)`` grid gives each HOST one coarse time window
    (outer/dcn split) and each chip within the host one fine block of it
    (inner/ici split). The camera-system reductions psum over BOTH axes;
    XLA lowers that hierarchically — intra-host partials ride ICI, only
    the (F, 6)+(F, 6, 6)-sized partial normal equations cross DCN once
    per CG/LM application, which is the boundary-halo-sized traffic the
    layout promises (module docstring of ``multihost``).
    """
    from mvslam_tpu.parallel.multihost import DCN_AXIS, ICI_AXIS

    axes = (DCN_AXIS, ICI_AXIS)
    n_dev = mesh.shape[DCN_AXIS] * mesh.shape[ICI_AXIS]
    orig_p = prob.points0.shape[0]
    prob = pad_problem(prob, n_dev)
    prob_spec, result_spec = _shard_specs(axes)
    solve = jax.shard_map(
        partial(ba_sparse.sparse_ba_solve, params=params, axis_name=axes),
        mesh=mesh,
        in_specs=(prob_spec,),
        out_specs=result_spec,
    )
    result = jax.jit(solve)(prob)
    if prob.points0.shape[0] != orig_p:
        result = result._replace(points=result.points[:orig_p])
    return result
