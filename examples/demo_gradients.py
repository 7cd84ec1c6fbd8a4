"""Demo: differentiable simulation — localize a car from a lidar scan.

Uses d(ranges)/d(pose) through the scan to run gradient descent on the
pose until the simulated scan matches an observed scan. This is the
capability the reference cannot offer (no gradients anywhere, SURVEY.md
§2b "Gradient parallelism" row) and the core of the differentiable-lidar
north star.

    python examples/demo_gradients.py
"""

import os
import sys

import numpy as np

# allow running straight from a checkout without installation
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import pyracecarsimulator_tpu as rc
    from pyracecarsimulator_tpu.config import ScanParams

    bundle = rc.build_sim("levine", scan=ScanParams(num_beams=256))
    scan = rc.make_scan_fn(bundle, backend="segments")

    # ground-truth pose in open space
    t = bundle.track
    edf = np.asarray(t.edf)[: t.height, : t.width]
    iy, ix = np.unravel_index(np.argmax(edf), edf.shape)
    true_pose = jnp.asarray([
        t.origin_x + (ix + 0.5) * t.resolution,
        t.origin_y + (iy + 0.5) * t.resolution, 0.8], jnp.float32)
    observed = scan(true_pose)

    @jax.jit
    def loss(pose):
        return jnp.mean((scan(pose) - observed) ** 2)

    grad = jax.jit(jax.grad(loss))
    pose = true_pose + jnp.asarray([0.4, -0.3, 0.15])   # perturbed guess
    lr = jnp.asarray([0.05, 0.05, 0.01])
    print(f"start: err={np.asarray(pose - true_pose)}")
    for i in range(200):
        pose = pose - lr * grad(pose)
    err = np.asarray(pose - true_pose)
    print(f"after 200 GD steps: err={err}  (|xy| = {np.hypot(*err[:2]):.4f} m)")


if __name__ == "__main__":
    main()
