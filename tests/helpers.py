"""Shared synthetic-geometry fixtures.

Rebuild of the reference test machinery (``test/unit-test-helper.{hpp,cpp}``):
Gaussian samplers, random SE3 perturbations via exp of Gaussian twists, the
CUBE / L_SHAPE 8-point rigs, and tolerance-based SE3 comparison.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mvslam_tpu.math.lie import SE3, so3_from_rpy

CUBE = "cube"
L_SHAPE = "l_shape"

_RIGS = {
    # reference unit-test-helper.cpp:51-61
    CUBE: np.array(
        [
            [-1, -1, -1],
            [-1, -1, +1],
            [-1, +1, -1],
            [-1, +1, +1],
            [+1, -1, -1],
            [+1, -1, +1],
            [+1, +1, -1],
            [+1, +1, +1],
        ],
        dtype=np.float64,
    ),
    # reference unit-test-helper.cpp:62-72
    L_SHAPE: np.array(
        [
            [1, 0, 0],
            [0, 0, 0],
            [0, 2, 0],
            [1, 0, 3],
            [0, 0, 3],
            [0, 2, 3],
            [0.5, 0.0, 1.5],
            [0.0, 1.0, 1.5],
        ],
        dtype=np.float64,
    ),
}


def get_rig_points(rig_type, rotation=None, translation=(0.0, 0.0, 0.0),
                   scale=1.0, dtype=jnp.float64):
    """8-point rig transformed by ``R @ (scale * p) + t``
    (reference ``unit-test-helper.cpp:29-79``)."""
    pts = jnp.asarray(_RIGS[rig_type], dtype=dtype)
    t = jnp.asarray(translation, dtype=dtype)
    if rotation is None:
        rotation = jnp.eye(3, dtype=dtype)
    rotation = jnp.asarray(rotation, dtype=dtype)
    return (scale * pts) @ rotation.T + t


def rig_rotation(roll, pitch, yaw, dtype=jnp.float64):
    return so3_from_rpy(roll, pitch, yaw, dtype=dtype)


def random_se3(rng: np.random.Generator, stddev: float, dtype=jnp.float64) -> SE3:
    """Random SE3 = exp of an isotropic Gaussian twist
    (reference ``unit-test-helper.cpp:15-27``)."""
    xi = jnp.asarray(rng.normal(0.0, stddev, size=6), dtype=dtype)
    return SE3.exp(xi)


def check_similar_se3(T1: SE3, T2: SE3, tol: float) -> bool:
    """Componentwise |ln(T1) - ln(T2)| <= tol
    (reference ``unit-test-helper.cpp:81-96``)."""
    d = np.asarray(T1.log() - T2.log())
    return bool(np.all(np.abs(d) <= tol))


def se3_from_parts(R, t, dtype=None) -> SE3:
    R = jnp.asarray(R, dtype=dtype)
    t = jnp.asarray(t, dtype=dtype)
    return SE3(R, t)


# ---------------------------------------------------------------------------
# Synthetic two-plane scene renderer (generalized from the 110-frame
# long-sequence test): camera translates along an arbitrary path looking +z
# at a z=8 background plane with a z=4 foreground band. Corner-rich block
# texture so FAST/ORB has clean structure.
# ---------------------------------------------------------------------------


def _texture(rng, h, w, blur=2):
    t = rng.uniform(size=(h, w)).astype(np.float32)
    for _ in range(blur):
        t = 0.25 * (np.roll(t, 1, 0) + np.roll(t, -1, 0)
                    + np.roll(t, 1, 1) + np.roll(t, -1, 1))
    sq = rng.uniform(size=(h // 16 + 1, w // 16 + 1)) > 0.5
    blocks = np.kron(sq, np.ones((16, 16))).astype(np.float32)[:h, :w]
    return 0.6 * t + 0.4 * blocks


def _sample_bilinear(tex, u, v):
    h, w = tex.shape
    u = np.clip(u, 0.0, w - 1.001)
    v = np.clip(v, 0.0, h - 1.001)
    u0 = np.floor(u).astype(np.int32)
    v0 = np.floor(v).astype(np.int32)
    du = u - u0
    dv = v - v0
    return ((1 - dv) * ((1 - du) * tex[v0, u0] + du * tex[v0, u0 + 1])
            + dv * ((1 - du) * tex[v0 + 1, u0] + du * tex[v0 + 1, u0 + 1]))


def render_planes_sequence(ts, h=240, w=320, focal=280.0, seed=42,
                           bg_slope=0.0, yaws=None):
    """Render frames for camera translations ``ts`` (N, 3) over the
    two-plane scene (optical axis +z). Returns (N, h, w) float32 frames.
    Revisiting a pose reproduces the same view — the fixture for
    loop-closure tests.

    ``bg_slope`` tilts the background plane to ``z = 8 + slope*(x - mid)``:
    two fronto-parallel planes give monocular VO only two discrete depths,
    whose weak conditioning drifts scale enough to trip the self-heal reset
    every ~15-25 frames; the slanted background's continuous depth spread
    keeps long sequences in ONE tracked segment.

    ``yaws`` (N,) rotates the camera about +y (radians, right-handed:
    positive yaw looks toward -x); rays are intersected with the planes
    analytically, so rotation ground truth is exact."""
    ts = np.asarray(ts, np.float64)
    n = ts.shape[0]
    yaws = np.zeros(n) if yaws is None else np.asarray(yaws, np.float64)
    rng = np.random.default_rng(seed)
    ppu_bg, z_bg = 40.0, 8.0
    ppu_fg, z_fg = 70.0, 4.0
    x_lo = float(ts[:, 0].min()) - z_bg * w / focal * 1.5
    x_hi = float(ts[:, 0].max()) + z_bg * w / focal * 1.5
    tex_bg = _texture(rng, int(z_bg * h / focal * ppu_bg) + 160,
                      int((x_hi - x_lo) * ppu_bg) + 160)
    tex_fg = _texture(rng, int(z_fg * h / focal * ppu_fg) + 160,
                      int((x_hi - x_lo) * ppu_fg) + 160)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    rx = (xs - cx) / focal
    ry = (ys - cy) / focal
    mid = 0.5 * (x_lo + x_hi)
    frames = []
    for t, psi in zip(ts, yaws):
        # world ray direction: R_y(psi) @ (rx, ry, 1)
        c, si = np.cos(psi), np.sin(psi)
        dx = c * rx + si * 1.0
        dy = ry
        dz = -si * rx + c * 1.0

        def plane_hit(z0, slope=0.0):
            # plane z = z0 + slope*(x - mid): t_z + s*dz = z0 +
            # slope*(t_x + s*dx - mid)
            s = (z0 + slope * (t[0] - mid) - t[2]) / (dz - slope * dx)
            return t[0] + s * dx, t[1] + s * dy

        wx, wy = plane_hit(z_bg, bg_slope)
        img = _sample_bilinear(
            tex_bg, (wx - x_lo) * ppu_bg + 80,
            (wy + z_bg * h / focal / 2) * ppu_bg + 80,
        )
        wxf, wyf = plane_hit(z_fg)
        fg = _sample_bilinear(
            tex_fg, (wxf - x_lo) * ppu_fg + 80,
            (wyf + z_bg * h / focal / 2) * ppu_fg + 80,
        )
        band = ys > (0.62 * h)
        frames.append(np.where(band, fg, img).astype(np.float32))
    return np.stack(frames)
