"""Multi-host orchestration (SURVEY.md §2b "Multi-host orchestration").

The reference has nothing to orchestrate; here one JAX process per host
joins a global mesh over the pod slice. The 65k-agent configuration of
BASELINE.json is this module + ``make_sharded_step`` with a mesh whose
``agents`` axis spans hosts (DP slabs ride DCN only at checkpoint/metric
boundaries; scan collectives stay intra-host on ICI when the ``beams`` axis
is mapped to intra-host devices — ``make_pod_mesh`` lays devices out that
way).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """``jax.distributed.initialize`` wrapper, idempotent, env-var driven
    when args are None (standard TPU pod metadata)."""
    global _initialized
    if _initialized or jax.process_count() > 1:
        _initialized = True
        return
    try:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
        _initialized = True
    except Exception:
        # single-process (tests, one host): fine.
        _initialized = False


def make_pod_mesh(beams_axis: int = 1) -> Mesh:
    """Global mesh over every device in the slice.

    Device order groups each host's local devices contiguously, and the
    ``beams`` axis is carved from *local* devices first so beam-wedge
    collectives (TTC psum, gradient psum) ride ICI, not DCN.
    """
    procs = jax.process_count()
    local = jax.local_device_count()
    if beams_axis > local or local % beams_axis:
        raise ValueError(
            f"beams_axis={beams_axis} must divide local devices {local} "
            "(keeps beam collectives on ICI)")
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    arr = np.asarray(devs).reshape(procs * (local // beams_axis),
                                   beams_axis)
    return Mesh(arr, ("agents", "beams"))


def global_agent_count(per_device_agents: int, mesh: Mesh) -> int:
    return per_device_agents * mesh.shape["agents"]
