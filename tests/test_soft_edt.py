"""Differentiable chamfer EDT: accuracy vs exact EDT + occupancy grads."""

import numpy as np
import jax
import jax.numpy as jnp

from pyracecarsimulator_tpu.maps.edt import edt_numpy
from pyracecarsimulator_tpu.ops.soft_edt import soft_edt, scan_from_occupancy


def test_chamfer_close_to_euclidean(rng):
    occ = (rng.rand(96, 96) < 0.02).astype(np.float32)
    occ[0, 0] = 1.0
    exact = edt_numpy(occ > 0.5)
    cham = np.asarray(soft_edt(jnp.asarray(occ), 1.0, iters=96))
    # chamfer(1, sqrt2) over-estimates euclidean by <= ~8%
    mask = exact < 60
    rel = (cham[mask] - exact[mask]) / np.maximum(exact[mask], 1e-9)
    assert rel.min() > -1e-5          # never underestimates
    assert rel.max() < 0.09, rel.max()


def test_zero_inside_obstacles():
    occ = np.zeros((32, 32), np.float32)
    occ[10:14, 10:14] = 1.0
    d = np.asarray(soft_edt(jnp.asarray(occ), 1.0, iters=16))
    assert d[11, 11] == 0.0
    assert d[11, 16] > 0.0


def test_occupancy_gradient_flows():
    """d(range)/d(occupancy) is nonzero at the hit obstacle and moves the
    range the right way (more occupancy -> shorter range)."""
    occ = np.zeros((64, 64), np.float32)
    occ[:2, :] = 1; occ[-2:, :] = 1; occ[:, :2] = 1; occ[:, -2:] = 1
    occ[30:34, 40:44] = 1.0           # block ahead of the ray
    occ_j = jnp.asarray(occ)
    pose = jnp.array([10.0, 32.0, 0.0])   # shoot +x toward the block

    def loss(occ):
        r = scan_from_occupancy(occ, 1.0, (0.0, 0.0), pose, num_beams=1,
                                fov=0.01, max_range=50.0, max_iters=64,
                                edt_iters=48)
        return r[0]

    r0 = float(loss(occ_j))
    assert 28.0 < r0 < 32.0           # hits the block face (~30 - 10)
    g = np.asarray(jax.grad(loss)(occ_j))
    assert (g != 0).any()
    # hard-min semantics: the gradient concentrates on the argmin-chain
    # roots — the hit obstacle's own cells — and is negative there (more
    # occupancy -> shorter range)
    block = g[30:34, 40:44]
    assert block.min() < 0.0, block


def test_log_init_reconstruction_gradients():
    """init='log': cells holding PARTIAL occupancy beliefs get nonzero
    gradients — the occupancy-reconstruction mode."""
    occ = np.full((64, 64), 0.15, np.float32)   # uncertain background
    occ[30:34, 40:44] = 0.9
    pose = jnp.array([10.0, 32.0, 0.0])

    def loss(occ):
        from pyracecarsimulator_tpu.ops.soft_edt import soft_edt
        from pyracecarsimulator_tpu.ops.raymarch_xla import scan_poses
        edf = soft_edt(occ, 1.0, iters=48, temperature=0.25, init="log",
                       init_lambda=3.0)
        r = scan_poses(edf, 1.0, (0.0, 0.0), pose, num_beams=1, fov=0.01,
                       max_range=50.0, max_iters=64, interp="bilinear")
        return r[0]

    g = np.asarray(jax.grad(loss)(jnp.asarray(occ)))
    near_ray = g[28:36, 12:40]        # background cells along the beam
    assert (near_ray != 0).any()
    # raising occupancy along the beam shortens the range
    assert near_ray.min() < 0.0


def test_fractional_occupancy_interpolates():
    occ = np.zeros((32, 32), np.float32)
    occ[16, 20] = 1.0
    d_full = float(soft_edt(jnp.asarray(occ), 1.0, 24)[16, 10])
    occ[16, 20] = 0.5
    d_half = float(soft_edt(jnp.asarray(occ), 1.0, 24)[16, 10])
    assert d_half > d_full            # weaker obstacle -> larger distance
