"""Checkpoint / resume (SURVEY.md §5 "Checkpoint / resume").

The reference's getState/setState is a struct copy; here sim state is a
pytree, so checkpointing is (de)serializing (CarState, PRNG key, step
counter). Orbax is used when available (multi-host-safe, async); a plain
NumPy ``.npz`` fallback keeps single-host workflows dependency-light.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..state import CarState


def save_npz(path: str, state: CarState, key=None, step: int = 0) -> None:
    arrays = {f"state_{k}": np.asarray(v)
              for k, v in zip(
                  ("x", "y", "theta", "velocity", "steer_angle",
                   "angular_velocity", "slip_angle", "st_dyn", "collision"),
                  jax.tree.leaves(state))}
    if key is not None:
        arrays["key"] = np.asarray(key)
    arrays["step"] = np.asarray(step)
    tmp = path + ".tmp.npz"      # savez keeps the name when it ends in .npz
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def load_npz(path: str) -> Tuple[CarState, Optional[Any], int]:
    with np.load(path) as z:
        fields = {}
        for k in ("x", "y", "theta", "velocity", "steer_angle",
                  "angular_velocity", "slip_angle", "st_dyn", "collision"):
            fields[k] = jnp.asarray(z[f"state_{k}"])
        key = jnp.asarray(z["key"]) if "key" in z else None
        step = int(z["step"])
    return CarState(**fields), key, step


def save_orbax(path: str, state: CarState, key=None, step: int = 0) -> None:
    """Orbax checkpoint (multi-host safe). Falls back to npz if orbax is
    unavailable."""
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        return save_npz(path, state, key, step)
    ckpt = {"state": state, "step": step}
    if key is not None:
        ckpt["key"] = key
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), ckpt, force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str, template_state: CarState,
               with_key: bool = True):
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        return load_npz(path)
    target = {"state": template_state, "step": 0}
    if with_key:
        target["key"] = jax.random.PRNGKey(0)
    ckptr = ocp.StandardCheckpointer()
    out = ckptr.restore(os.path.abspath(path), target)
    return out["state"], out.get("key"), int(out["step"])


def save_pytree(path: str, tree: Any) -> None:
    """Checkpoint an ARBITRARY pytree (e.g. training state: policy
    params + optax optimizer state + CarState + counters) as a ``.npz``
    of its leaves. The tree structure is not stored — ``load_pytree``
    takes a template with the same structure (the natural pattern for
    resuming: the code that builds the state also rebuilds its
    skeleton). Round 5, backing ``parallel.train`` checkpoint/resume."""
    leaves = jax.tree.leaves(tree)
    np.savez(path if path.endswith(".npz") else path + ".npz",
             n=np.asarray(len(leaves)),
             **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def load_pytree(path: str, template: Any) -> Any:
    """Restore a pytree saved by ``save_pytree`` into the structure of
    ``template`` (leaf count is validated)."""
    p = path if path.endswith(".npz") else path + ".npz"
    treedef = jax.tree.structure(template)
    with np.load(p) as z:
        n = int(z["n"])
        if n != treedef.num_leaves:
            raise ValueError(
                f"checkpoint holds {n} leaves but the template has "
                f"{treedef.num_leaves}")
        leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(n)]
    return jax.tree.unflatten(treedef, leaves)
