"""Demo: sampling-based MPC via cloned-state rollouts (felrock's use case).

The reference exists so "many simulations can run fast without ROS" for
tree/rollout search over drive actions (SURVEY.md §0, §3.5: MCTS racing
experiments over cloned sim states). Here cloning a simulator is
broadcasting a state pytree, and evaluating N candidate action sequences is
ONE batched device rollout:

  every control step: clone current state N times -> rollout horizon H
  under N sampled steering sequences -> score (progress, crash penalty)
  -> execute the best sequence's first action.

    python examples/demo_mpc.py [--candidates 256] [--horizon 30]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--candidates", type=int, default=256)
    ap.add_argument("--horizon", type=int, default=30)
    ap.add_argument("--control-steps", type=int, default=40)
    ap.add_argument("--beams", type=int, default=128)
    ap.add_argument("--map", default="levine")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import pyracecarsimulator_tpu as rc
    from pyracecarsimulator_tpu.config import ScanParams

    N, H = args.candidates, args.horizon
    bundle = rc.build_sim(args.map, scan=ScanParams(num_beams=args.beams))
    step = rc.make_step_fn(bundle, with_noise=False)

    def clone(state, n):
        """Reference 'clone sim state for rollouts' == broadcast the pytree."""
        return jax.tree.map(
            lambda a: jnp.broadcast_to(a, (n,) + jnp.shape(a)), state)

    @jax.jit
    def evaluate(state1, steer_seqs, key):
        """Rollout N clones under (N, H) steering plans; return scores."""
        states = clone(state1, N)

        def body(carry, t):
            s, dist = carry
            out = step(s, (jnp.full((N,), 3.0), steer_seqs[:, t]), None)
            dist = dist + out.state.velocity * 0.01
            return (out.state, dist), None

        (final, dist), _ = jax.lax.scan(
            body, (states, jnp.zeros(N)), jnp.arange(H))
        return dist - 50.0 * final.collision.astype(jnp.float32)

    t = bundle.track
    edf = np.asarray(t.edf)[: t.height, : t.width]
    iy, ix = np.unravel_index(np.argmax(edf), edf.shape)
    state = rc.state_from_pose(
        jnp.asarray(t.origin_x + (ix + .5) * t.resolution),
        jnp.asarray(t.origin_y + (iy + .5) * t.resolution), jnp.asarray(0.))

    key = jax.random.PRNGKey(0)
    crashed = False
    t0 = time.time()
    for k in range(args.control_steps):
        key, k1 = jax.random.split(key)
        # smooth random steering plans around straight
        seqs = 0.25 * jax.random.normal(k1, (N, H))
        seqs = jnp.cumsum(seqs, axis=1) * 0.15
        seqs = jnp.clip(seqs, -0.4, 0.4)
        scores = evaluate(state, seqs, k1)
        best = int(jnp.argmax(scores))
        out = step(state, (jnp.asarray(3.0), seqs[best, 0]), None)
        state = out.state
        crashed = bool(out.collision)
        if crashed:
            break
    wall = time.time() - t0
    sims = args.control_steps * N * H
    print(f"MPC: {args.control_steps} control steps x {N} candidates x "
          f"H={H} = {sims} cloned sim-steps in {wall:.1f}s "
          f"({sims / wall:.3e} sim-steps/s incl compile)")
    print(f"survived: {not crashed}   final speed "
          f"{float(state.velocity):.2f} m/s   pose "
          f"({float(state.x):.1f}, {float(state.y):.1f})")


if __name__ == "__main__":
    main()
