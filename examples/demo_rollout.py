"""Demo: thousands of cars driving the levine map in lockstep.

The reference's demo scripts step ONE simulator in a Python loop
(SURVEY.md §3.5); here the entire (agents x timesteps) rollout is a single
compiled XLA program.

    python examples/demo_rollout.py [--agents 4096] [--steps 500]
"""

import argparse
import time

import os
import sys

import numpy as np

# allow running straight from a checkout without installation
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--agents", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--map", default="levine")
    ap.add_argument("--beams", type=int, default=1080)
    ap.add_argument("--render", default="",
                    help="write a PNG of trajectories + final scans")
    args = ap.parse_args()

    import jax.numpy as jnp
    import pyracecarsimulator_tpu as rc
    from pyracecarsimulator_tpu.config import ScanParams
    from pyracecarsimulator_tpu.parallel import (
        rollout, make_gap_follower_policy)

    bundle = rc.build_sim(args.map, scan=ScanParams(num_beams=args.beams))
    step = rc.make_step_fn(bundle, backend="segments", with_noise=False)

    # spawn everyone at open poses
    t = bundle.track
    edf = np.asarray(t.edf)[: t.height, : t.width]
    ys, xs = np.where(edf > 0.5)
    rng = np.random.RandomState(0)
    k = rng.randint(len(ys), size=args.agents)
    x0 = t.origin_x + (xs[k] + 0.5) * t.resolution
    y0 = t.origin_y + (ys[k] + 0.5) * t.resolution
    th0 = rng.uniform(-np.pi, np.pi, args.agents)
    s0 = rc.state_from_pose(jnp.asarray(x0, jnp.float32),
                            jnp.asarray(y0, jnp.float32),
                            jnp.asarray(th0, jnp.float32))

    policy = make_gap_follower_policy(args.beams, float(bundle.scan.fov),
                                      speed=3.0)
    print(f"compiling + running {args.agents} agents x {args.steps} steps...")
    t0 = time.time()
    final, traj = rollout(step, s0, policy, args.steps, args.beams,
                          keep_scans=bool(args.render))
    crashed = float(np.asarray(final.collision).mean())
    wall = time.time() - t0
    steps_s = args.agents * args.steps / wall
    print(f"done in {wall:.1f}s  ({steps_s:.3e} agent-steps/s incl compile)")
    print(f"crashed: {crashed * 100:.1f}%   "
          f"mean speed: {float(np.asarray(final.velocity).mean()):.2f} m/s")
    if args.render:
        from pyracecarsimulator_tpu.utils.viz import render
        n_draw = min(args.agents, 16)
        render(bundle.track,
               poses=np.asarray(final.pose)[:n_draw],
               scans=np.asarray(traj["ranges"])[-1, :n_draw],
               trajectories=np.asarray(traj["pose"])[:, :n_draw],
               path=args.render, fov=float(bundle.scan.fov))
        print(f"rendered {args.render}")


if __name__ == "__main__":
    main()
