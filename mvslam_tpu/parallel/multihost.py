"""Multi-host (multi-process) distributed runtime: DCN x ICI meshes.

No reference equivalent — the reference is a single-process CPU system
(SURVEY §2.8); its closest analog is the pthread fan-out inside
``front-end/visual-odometer.cpp``. This module is the TPU-native
scale-out story past one host:

- :func:`initialize` wraps ``jax.distributed.initialize`` so a SLAM job
  launched as N processes (one per host) forms a single JAX runtime whose
  ``jax.devices()`` spans every chip in the pod slice.
- :func:`make_hybrid_mesh` builds a 2-D ``(dcn, ici)`` mesh with
  slow-axis-outermost layout: the ``ici`` (intra-host / pod-slice) axis
  carries the bandwidth-hungry collectives of the landmark-sharded Schur
  reduction (``parallel/dist_ba*.py`` psums), while the ``dcn``
  (cross-host network) axis carries only the low-rate keyframe-window
  boundary exchange of the sequence-partitioned solves. This is the
  standard hybrid-mesh recipe: shard so collectives ride ICI, keep DCN
  traffic to boundary halos.
- Single-process fallback: with one process (tests, the virtual CPU
  mesh, single-chip benches) everything degrades to a local mesh with a
  size-1 ``dcn`` axis, so call sites never branch.

Axis contract for the solvers:

==========  =========================================================
axis        what shards over it
==========  =========================================================
``dcn``     keyframe-sequence windows (time partitioning, halo poses)
``ici``     landmarks / observations / pose-graph edges (psum reduce)
==========  =========================================================
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DCN_AXIS = "dcn"
ICI_AXIS = "ici"


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Join (or form) a multi-process JAX runtime; returns True when a
    multi-host runtime is active after the call.

    Arguments default to the standard env vars
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
    ``JAX_PROCESS_ID``) so launchers can configure purely by
    environment. A no-op (returning False) when neither arguments nor
    env vars ask for more than one process — the single-host path never
    pays distributed-init latency.
    """
    num = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS"),
        num_processes=num,
        process_id=process_id if process_id is not None else int(
            os.environ.get("JAX_PROCESS_ID", "0")),
    )
    return jax.process_count() > 1


def make_hybrid_mesh(devices: Sequence[jax.Device] | None = None,
                     dcn_size: int | None = None) -> Mesh:
    """2-D ``(dcn, ici)`` mesh, slow axis outermost.

    ``dcn_size`` defaults to ``jax.process_count()`` — one DCN group per
    host — and must divide the device count. Devices are grouped
    **explicitly by ``process_index``** (stable-sorted) before the
    reshape: JAX sorts ``jax.devices()`` by id and does not guarantee
    process-contiguous ordering on every platform/topology, and a DCN
    row that silently mixes processes would put the bandwidth-hungry
    Schur psums on DCN instead of ICI. When ``dcn_size`` matches the
    process count each mesh row is asserted single-process. With one
    process this is a ``(1, n)`` mesh and every collective runs over
    ICI.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dcn_size is None:
        dcn_size = jax.process_count()
    if n % dcn_size != 0:
        raise ValueError(
            f"device count {n} not divisible by dcn axis {dcn_size}")
    devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    grid = np.asarray(devices).reshape(dcn_size, n // dcn_size)
    if dcn_size == jax.process_count() and dcn_size > 1:
        for row in grid:
            procs = {d.process_index for d in row}
            if len(procs) != 1:
                raise ValueError(
                    f"mesh ICI row spans processes {sorted(procs)}; "
                    "per-host device counts are uneven")
    return Mesh(grid, (DCN_AXIS, ICI_AXIS))


def local_batch_slice(global_n: int, axis_size: int, axis_index: int
                      ) -> tuple[int, int]:
    """(start, size) of this shard's contiguous slice of a length-
    ``global_n`` axis padded to a multiple of ``axis_size``."""
    per = -(-global_n // axis_size)
    return axis_index * per, per
