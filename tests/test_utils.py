"""Checkpoint round-trip + multihost mesh layout + profiling harness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyracecarsimulator_tpu.state import zero_state, set_field
from pyracecarsimulator_tpu.utils.checkpoint import (
    save_npz, load_npz, save_orbax, load_orbax)
from pyracecarsimulator_tpu.parallel.multihost import make_pod_mesh
from pyracecarsimulator_tpu.utils.profiling import timed_loop


def _state():
    s = zero_state((4,))
    return set_field(s, x=jnp.arange(4.0), velocity=jnp.full((4,), 2.5),
                     collision=jnp.array([True, False, False, True]))


def test_npz_roundtrip(tmp_path):
    s = _state()
    key = jax.random.PRNGKey(42)
    p = str(tmp_path / "ck.npz")
    save_npz(p, s, key, step=17)
    s2, key2, step = load_npz(p)
    for a, b in zip(jax.tree.leaves(s), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(key), np.asarray(key2))
    assert step == 17


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    s = _state()
    key = jax.random.PRNGKey(3)
    p = str(tmp_path / "orbax_ck")
    save_orbax(p, s, key, step=5)
    s2, key2, step = load_orbax(p, zero_state((4,)))
    for a, b in zip(jax.tree.leaves(s), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert step == 5


def test_pod_mesh_layout():
    mesh = make_pod_mesh(beams_axis=2)
    assert mesh.shape["beams"] == 2
    assert mesh.shape["agents"] == len(jax.devices()) // 2
    with pytest.raises(ValueError):
        make_pod_mesh(beams_axis=3)   # doesn't divide 8


def test_timed_loop_runs():
    x = jnp.ones((128, 128))
    sec = timed_loop(lambda a: jnp.sum(a * 2.0), x, reps=5, overhead_s=0.0)
    assert sec > 0
