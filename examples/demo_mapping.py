"""Demo: occupancy-grid reconstruction from lidar scans by gradient descent.

The full differentiable chain (ops/soft_edt.py):

    occupancy --(chamfer soft-EDT, log init)--> EDF --(bilinear DT
    march)--> ranges --> MSE vs observed scans --> grad --> occupancy

A capability with no reference equivalent: the reference simulates scans
FROM a map; this inverts the sensor to recover the map.

    python examples/demo_mapping.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from pyracecarsimulator_tpu.ops.soft_edt import soft_edt
    from pyracecarsimulator_tpu.ops.raymarch_xla import scan_poses
    from pyracecarsimulator_tpu.maps.edt import edt

    # ground-truth world: a room with two blocks (grid units, res=1 cell)
    H = W = 96
    occ_true = np.zeros((H, W), np.float32)
    occ_true[:3, :] = 1; occ_true[-3:, :] = 1
    occ_true[:, :3] = 1; occ_true[:, -3:] = 1
    occ_true[40:52, 60:70] = 1.0
    occ_true[20:28, 25:32] = 1.0

    # observe scans from a handful of poses with the EXACT pipeline
    edf_true = jnp.asarray(edt(occ_true > 0.5, 1.0))
    rng = np.random.RandomState(0)
    poses = jnp.asarray(np.stack([
        rng.uniform(12, 80, 24), rng.uniform(12, 80, 24),
        rng.uniform(-np.pi, np.pi, 24)], -1), jnp.float32)
    # keep only poses in free space
    ok = np.array([occ_true[int(p[1]), int(p[0])] == 0 for p in poses])
    poses = poses[np.where(ok)[0]]
    observed = scan_poses(edf_true, 1.0, jnp.zeros(2), poses,
                          num_beams=180, fov=2 * np.pi * 0.999,
                          max_range=80.0, max_iters=128)

    # reconstruct with a TSDF-style loss on the differentiable EDF:
    # observed hit points must lie ON surfaces (edf -> 0) and sampled
    # points along each beam before the hit must stay FREE (edf large).
    # (A naive MSE on re-simulated ranges saturates: through a transparent
    # initial map every ray clamps at max_range with zero gradient.)
    from pyracecarsimulator_tpu.ops.raymarch_xla import (
        beam_angles, sample_edf_bilinear)
    offs = beam_angles(180, 2 * np.pi * 0.999)
    ang = poses[:, 2:3] + offs[None, :]
    ux, uy = jnp.cos(ang), jnp.sin(ang)
    hit_mask = observed < 79.0
    hx = poses[:, 0:1] + observed * ux
    hy = poses[:, 1:2] + observed * uy
    # free samples stop at 0.8*r: samples closer to the hit would demand
    # clearance where the surface itself must sit (margin conflict drove
    # reconstruction to empty maps)
    FREE_FRACS = jnp.asarray([0.2, 0.4, 0.6, 0.8])
    fx = poses[:, 0:1, None] + observed[..., None] * FREE_FRACS * ux[..., None]
    fy = poses[:, 1:2, None] + observed[..., None] * FREE_FRACS * uy[..., None]

    logits0 = jnp.zeros((H, W)) - 1.5         # sigmoid -> occ ~ 0.18

    @jax.jit
    def loss(logits):
        occ = jax.nn.sigmoid(logits)
        edf = soft_edt(occ, 1.0, iters=64, temperature=0.25,
                       init="log", init_lambda=3.0)
        d_hit = sample_edf_bilinear(edf, hx, hy)
        d_free = sample_edf_bilinear(edf, fx, fy)
        hit_term = jnp.mean(jnp.where(hit_mask, d_hit, 0.0) ** 2)
        free_term = jnp.mean(jax.nn.relu(0.8 - d_free) ** 2)
        return hit_term + free_term

    opt = optax.adam(0.3)
    state = opt.init(logits0)
    logits = logits0
    grad_fn = jax.jit(jax.value_and_grad(loss))
    t0 = time.time()
    for i in range(400):
        l, g = grad_fn(logits)
        upd, state = opt.update(g, state)
        logits = optax.apply_updates(logits, upd)
        if i % 80 == 0:
            print(f"iter {i:3d}  tsdf loss {float(l):8.3f}")
    occ_rec = np.asarray(jax.nn.sigmoid(logits))
    # score on the OBSERVABLE surface: lidar can only see obstacle
    # boundary cells (not block interiors / outside the outer walls)
    from scipy.ndimage import binary_dilation
    true = occ_true > 0.5
    surface = true & binary_dilation(~true)
    pred_near = binary_dilation(occ_rec > 0.5, iterations=1)
    recall = (pred_near & surface).sum() / surface.sum()
    print(f"done in {time.time()-t0:.1f}s  surface recall = {recall:.2f} "
          f"({(pred_near & surface).sum()}/{surface.sum()} boundary cells "
          f"within 1 cell of a reconstructed obstacle)")


if __name__ == "__main__":
    main()
