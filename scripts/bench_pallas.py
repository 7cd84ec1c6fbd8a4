"""Measure the Pallas segment-raycast kernel vs the XLA path on the TPU.

Methodology per CLAUDE.md: repetitions inside one jit (lax.scan) with
per-iteration input perturbation (defeats CSE hoisting), one scalar fetch,
~35 ms tunnel overhead subtracted.

Usage: python scripts/bench_pallas.py [levine|berlin] [A]
"""
import os
import sys
import time

import numpy as np

# runnable straight from a checkout: scripts/ is not the package root
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "levine"
    A = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    B = 1080
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from pyracecarsimulator_tpu.maps.loader import load_builtin
    from pyracecarsimulator_tpu.maps.segments import build_segment_map
    from pyracecarsimulator_tpu.ops.raycast_grad import (
        raycast_all_diff, raycast_tiled_diff)
    from pyracecarsimulator_tpu.ops.raycast_pallas import (
        raycast_pallas, raycast_pallas_tiled)
    from pyracecarsimulator_tpu.ops.raymarch_xla import beam_angles

    m = load_builtin(name)
    sm = build_segment_map(np.asarray(m.occupancy), m.resolution,
                           (m.origin_x, m.origin_y), max_range=10.0,
                           tile_size=4.0, real_hw=(m.height, m.width))
    print(f"{name}: {sm.n_segments} segs, kv={sm.kv}, "
          f"meta={np.asarray(sm.sweep_meta)}", file=sys.stderr)
    rng = np.random.RandomState(0)
    edf = np.asarray(m.edf)[: m.height, : m.width]
    ys, xs = np.where(edf > 0.3)
    k = rng.randint(len(ys), size=A)
    X = (m.origin_x + (xs[k] + .5) * m.resolution).astype(np.float32)
    Y = (m.origin_y + (ys[k] + .5) * m.resolution).astype(np.float32)
    TH = rng.uniform(-np.pi, np.pi, A).astype(np.float32)
    offs = np.asarray(beam_angles(B, 4.712388980384690), np.float32)
    ANG = TH[:, None] + offs[None, :]
    xb = jnp.broadcast_to(jnp.asarray(X)[:, None], (A, B))
    yb = jnp.broadcast_to(jnp.asarray(Y)[:, None], (A, B))
    ct, st = jnp.asarray(np.cos(ANG)), jnp.asarray(np.sin(ANG))

    REPS = 50 if name == "levine" else 20

    def timed(fn, *args):
        t0 = time.perf_counter()
        s = float(fn(*args))
        assert np.isfinite(s)
        return max(time.perf_counter() - t0 - 0.035, 1e-9)

    def loop(fwd):
        @jax.jit
        def run(xb, yb, ct, st):
            def rep(acc, i):
                d = i.astype(jnp.float32) * 1e-7
                return acc + jnp.sum(fwd(xb + d, yb + d, ct, st)), None
            acc, _ = jax.lax.scan(rep, 0.0, jnp.arange(REPS))
            return acc
        return run

    def loop_bwd(fwd):
        @jax.jit
        def run(xb, yb, ct, st):
            def rep(acc, i):
                d = i.astype(jnp.float32) * 1e-7
                l, g = jax.value_and_grad(
                    lambda a, b: jnp.sum(fwd(a, b, ct, st)))(xb + d, yb + d)
                return acc + l + jnp.sum(g[0]), None
            acc, _ = jax.lax.scan(rep, 0.0, jnp.arange(10))
            return acc
        return run

    # the framework's real XLA path (analytic VJP; tiled when it culls)
    use_tiles = sm.tiles is not None and sm.tiles.shape[2] < sm.params.shape[1]
    if use_tiles:
        x0, y0 = jnp.asarray(X), jnp.asarray(Y)
        xla_fwd = lambda a, b, c, s: raycast_tiled_diff(
            sm.tiles, sm.tiles_shape, sm.tile_size, sm.tile_origin,
            x0, y0, a, b, c, s, 10.0, 512, sm.kv_tile)
    else:
        xla_fwd = lambda a, b, c, s: raycast_all_diff(
            sm.params, a, b, c, s, 10.0, 1024, sm.kv)
    if use_tiles:
        x0t, y0t = jnp.asarray(X), jnp.asarray(Y)
        pal_fwd = lambda a, b, c, s: raycast_pallas_tiled(
            sm.tiles, sm.tile_sweep_meta, sm.tiles_shape, sm.tile_size,
            sm.tile_origin, x0t, y0t, a, b, c, s, 10.0, False)
        print(f"tiles: {sm.tiles.shape}, kv_tile={sm.kv_tile}",
              file=sys.stderr)
    else:
        pal_fwd = lambda a, b, c, s: raycast_pallas(sm.params, sm.sweep_meta,
                                                    a, b, c, s, 10.0, False)

    # parity first (one scan)
    r1 = np.asarray(jax.jit(xla_fwd)(xb, yb, ct, st))
    r2 = np.asarray(jax.jit(pal_fwd)(xb, yb, ct, st))
    print(f"parity max |xla - pallas| = {np.abs(r1 - r2).max():.2e}",
          file=sys.stderr)

    for label, fwd in (("xla", xla_fwd), ("pallas", pal_fwd)):
        run = loop(fwd)
        timed(run, xb, yb, ct, st)
        dt = timed(run, xb, yb, ct, st) / REPS
        print(f"{name} {label:7s} fwd     {A*B/dt:.3e} rays/s "
              f"({dt*1e3:.2f} ms/scan)")
        run = loop_bwd(fwd)
        timed(run, xb, yb, ct, st)
        dt = timed(run, xb, yb, ct, st) / 10
        print(f"{name} {label:7s} fwd+bwd {A*B/dt:.3e} rays/s "
              f"({dt*1e3:.2f} ms/scan)")


if __name__ == "__main__":
    main()
