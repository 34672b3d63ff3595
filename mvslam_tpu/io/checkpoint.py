"""Checkpoint / resume of the visual-odometer state (map + trajectory).

The reference has **no** checkpointing — its VO state (tracked points, pose)
is not serializable (SURVEY §5); only the camera model and parameter files
persist. Long-running distributed jobs need real resume, so the full
tracking state round-trips here: the map (positions, descriptors, KLT
templates, bookkeeping), the last frame's feature set + refined
observations, the current pose, and the trajectory.

Format: a single ``.npz`` with a JSON-encoded meta entry (schema-versioned).
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from mvslam_tpu.frontend.data_types import Frame
from mvslam_tpu.frontend.visual_odometer import VisualOdometer, VoState
from mvslam_tpu.math.lie import SE3
from mvslam_tpu.ops.features import FeatureSet

SCHEMA_VERSION = 1


def save_checkpoint(vo: VisualOdometer, path: str) -> None:
    """Serialize a tracking (or initializing) VO to ``path`` (.npz)."""
    arrays: dict = {}
    meta = {
        "schema": SCHEMA_VERSION,
        "state": vo.state.name,
        "step": vo._step,
        "frame_total": vo.frame_total,
        "frame_tracked": vo.frame_tracked,
    }
    m = vo._map
    arrays.update(
        map_positions=m.positions, map_desc=m.desc, map_templates=m.templates,
        map_valid=m.valid, map_last_seen=m.last_seen,
    )
    traj_ids = np.asarray([t[0] for t in vo.trajectory], np.int64)
    traj_times = np.asarray([t[1] for t in vo.trajectory], np.float64)
    traj_R = np.stack(
        [np.asarray(t[2].R, np.float64) for t in vo.trajectory]
    ) if vo.trajectory else np.zeros((0, 3, 3))
    traj_t = np.stack(
        [np.asarray(t[2].t, np.float64) for t in vo.trajectory]
    ) if vo.trajectory else np.zeros((0, 3))
    arrays.update(traj_ids=traj_ids, traj_times=traj_times,
                  traj_R=traj_R, traj_t=traj_t)

    if vo.state == VoState.TRACKING:
        f = vo._last_frame
        meta["last_frame"] = {
            "id": f.id, "capture_time": f.capture_time, "focal": f.focal,
        }
        arrays.update(
            last_pose_R=np.asarray(vo._last_pose.R, np.float64),
            last_pose_t=np.asarray(vo._last_pose.t, np.float64),
            last_assoc=vo._last_assoc,
            last_obs_rays=vo._last_obs_rays,
            last_obs_sigma=vo._last_obs_sigma,
            last_templates=vo._last_templates,
            feat_xy=np.asarray(f.features.xy),
            feat_response=np.asarray(f.features.response),
            feat_angle=np.asarray(f.features.angle),
            feat_octave=np.asarray(f.features.octave),
            feat_sigma=np.asarray(f.features.sigma),
            feat_desc=np.asarray(f.features.desc),
            feat_mask=np.asarray(f.features.mask),
            frame_rays=np.asarray(f.rays),
            frame_sigma=np.asarray(f.sigma),
        )
    np.savez_compressed(path, meta=json.dumps(meta), **arrays)


def load_checkpoint(path: str, vo: VisualOdometer) -> VisualOdometer:
    """Restore state into ``vo`` (constructed with the desired params).

    Returns ``vo``. The restored last frame carries no image — the next
    tracked frame's KLT runs against the checkpointed map/frame templates,
    which is exactly what live tracking does too.
    """
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    if meta["schema"] != SCHEMA_VERSION:
        raise ValueError(f"unsupported checkpoint schema {meta['schema']}")
    vo.reset()
    vo._step = meta["step"]
    vo.frame_total = meta["frame_total"]
    vo.frame_tracked = meta["frame_tracked"]
    m = vo._map
    if z["map_positions"].shape != m.positions.shape:
        raise ValueError("checkpoint map capacity differs from params")
    m.positions[:] = z["map_positions"]
    m.desc[:] = z["map_desc"]
    m.templates[:] = z["map_templates"]
    m.valid[:] = z["map_valid"]
    m.last_seen[:] = z["map_last_seen"]
    vo.trajectory = [
        (int(i), float(t), SE3(jnp.asarray(R), jnp.asarray(tt)))
        for i, t, R, tt in zip(
            z["traj_ids"], z["traj_times"], z["traj_R"], z["traj_t"]
        )
    ]
    if meta["state"] == "TRACKING":
        fmeta = meta["last_frame"]
        feats = FeatureSet(
            xy=jnp.asarray(z["feat_xy"]),
            response=jnp.asarray(z["feat_response"]),
            angle=jnp.asarray(z["feat_angle"]),
            octave=jnp.asarray(z["feat_octave"]),
            sigma=jnp.asarray(z["feat_sigma"]),
            desc=jnp.asarray(z["feat_desc"]),
            mask=jnp.asarray(z["feat_mask"]),
        )
        vo._last_frame = Frame(
            id=fmeta["id"],
            capture_time=fmeta["capture_time"],
            features=feats,
            rays=jnp.asarray(z["frame_rays"]),
            sigma=jnp.asarray(z["frame_sigma"]),
            focal=fmeta["focal"],
        )
        vo._last_pose = SE3(
            jnp.asarray(z["last_pose_R"]), jnp.asarray(z["last_pose_t"])
        )
        vo._last_assoc = z["last_assoc"].copy()
        vo._last_obs_rays = z["last_obs_rays"].copy()
        vo._last_obs_sigma = z["last_obs_sigma"].copy()
        vo._last_templates = z["last_templates"].copy()
        vo.state = VoState.TRACKING
    return vo


# ---------------------------------------------------------------------------
# Fused (vo_jit) tracker state: the state is already one flat pytree of
# fixed-shape arrays, so checkpointing is a field->array dump.
# ---------------------------------------------------------------------------

JIT_SCHEMA_VERSION = 2   # v2: + gate_pair_err traced-gate scalar in the state


def save_vo_jit_state(state, path: str) -> None:
    """Serialize a :class:`~mvslam_tpu.frontend.vo_jit.VoJitState` (.npz)."""
    arrays = {name: np.asarray(leaf) for name, leaf in zip(
        type(state)._fields, state)}
    np.savez_compressed(
        path, meta=json.dumps({"schema": JIT_SCHEMA_VERSION}), **arrays
    )


def load_vo_jit_state(path: str, template):
    """Restore a VoJitState saved by :func:`save_vo_jit_state`.

    ``template``: a state from ``vo_init_state`` with the same params —
    shapes/dtypes are validated against it so a capacity mismatch fails
    loudly instead of mistracking.
    """
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    if meta["schema"] != JIT_SCHEMA_VERSION:
        raise ValueError(f"unsupported vo_jit checkpoint schema {meta['schema']}")
    leaves = []
    for name, ref in zip(type(template)._fields, template):
        arr = z[name]
        if tuple(arr.shape) != tuple(ref.shape):
            raise ValueError(
                f"checkpoint field {name!r} shape {arr.shape} != params "
                f"shape {tuple(ref.shape)}"
            )
        leaves.append(jnp.asarray(arr, dtype=ref.dtype))
    return type(template)(*leaves)
