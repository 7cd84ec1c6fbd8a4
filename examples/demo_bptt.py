"""Demo: trajectory optimization by BPTT through the closed-loop rollout.

Gradient-descends a per-step steering sequence through T simulation steps
(dynamics + lidar + TTC latch, one `lax.scan`) to maximize worst-beam
clearance along the path — the gradient-based counterpart of the
sampling MPC in demo_mpc.py, and a capability the reference (forward
simulation only, SURVEY.md §2b) cannot offer. The whole unrolled
optimization objective compiles to ONE XLA program; the raycast backward
is the analytic O(rays) VJP (ops/raycast_grad.py).

    python examples/demo_bptt.py [--steps T] [--iters N]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--map", default="levine")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import pyracecarsimulator_tpu as rc
    from pyracecarsimulator_tpu.config import ScanParams, SimParams
    from pyracecarsimulator_tpu.state import state_from_pose

    # planner-scale timestep: T=30 x 50 ms x 3 m/s covers ~4.5 m of track
    bundle = rc.build_sim(args.map, scan=ScanParams(num_beams=256),
                          sim=SimParams(dynamics="ackermann", dt=0.05))
    step = rc.make_step_fn(bundle, with_noise=False)

    # start in open space, heading at a wall-ish angle
    t = bundle.track
    edf = np.asarray(t.edf)[: t.height, : t.width]
    iy, ix = np.unravel_index(np.argmax(edf), edf.shape)
    x = t.origin_x + (ix + 0.5) * t.resolution
    y = t.origin_y + (iy + 0.5) * t.resolution
    s0 = state_from_pose(jnp.array([x]), y, 0.9)
    T, V = args.steps, 3.0

    def unroll(steers):
        def body(state, s_des):
            out = step(state, (jnp.full((1,), V),
                               jnp.full((1,), s_des)), None)
            return out.state, (jnp.min(out.ranges), out.collision)
        final, (clear, coll) = jax.lax.scan(body, s0, steers)
        return final, clear, coll

    @jax.jit
    def objective(steers):
        _, clear, _ = unroll(steers)
        # maximize worst clearance along the path; mild smoothness prior
        return -jnp.mean(clear) + 0.05 * jnp.sum(jnp.diff(steers) ** 2)

    vg = jax.jit(jax.value_and_grad(objective))
    steers = jnp.zeros((T,), jnp.float32)
    l0, _ = vg(steers)
    print(f"initial objective {float(l0):+.4f}")
    lr = 0.08
    for i in range(args.iters):
        l, g = vg(steers)
        steers = jnp.clip(steers - lr * g, -0.4, 0.4)
        if (i + 1) % 10 == 0:
            print(f"iter {i+1:3d}  objective {float(l):+.4f}  "
                  f"|g| {float(jnp.abs(g).max()):.3f}")
    lT = float(objective(steers))
    _, clear0, _ = unroll(jnp.zeros((T,)))
    _, clearT, coll = unroll(steers)
    print(f"final objective  {lT:+.4f}  (improved {float(l0) - lT:+.4f})")
    print(f"worst clearance along path: {float(jnp.min(clear0)):.3f} m -> "
          f"{float(jnp.min(clearT)):.3f} m; collisions: "
          f"{int(np.asarray(coll).sum())}")
    assert lT < float(l0), "BPTT failed to improve the objective"


if __name__ == "__main__":
    main()
