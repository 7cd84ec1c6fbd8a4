"""A/B bench: sector-culled raycast (XLA + Pallas) vs the tiled paths.

Methodology per CLAUDE.md: reps inside one jit with per-iteration input
perturbation (CSE guard) + min-of-3 timed fetches (tunnel jitter guard).

Usage: python scripts/bench_sectors.py [map] [tile_size] [ns]
"""

import os
import sys
import time

import numpy as np

# runnable straight from a checkout: scripts/ is not the package root
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "berlin"
    tile_size = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    ns = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp
    from pyracecarsimulator_tpu.maps.loader import load_builtin
    from pyracecarsimulator_tpu.maps.segments import build_segment_map
    from pyracecarsimulator_tpu.maps.sectors import build_sector_map
    from pyracecarsimulator_tpu.ops.raycast_sectors import raycast_sectors
    from pyracecarsimulator_tpu.ops.raycast_pallas import (
        raycast_pallas, raycast_pallas_tiled)
    from pyracecarsimulator_tpu.ops.raymarch_xla import beam_angles

    A, B = 4096, 1080
    m = load_builtin(name)
    t0 = time.time()
    smap = build_sector_map(
        np.asarray(m.occupancy), m.resolution, (m.origin_x, m.origin_y),
        max_range=10.0, tile_size=tile_size, ns=ns,
        real_hw=(m.height, m.width))
    t_build = time.time() - t0
    meta = np.asarray(smap.meta)
    real = meta[:, 0] + (meta[:, 2] - meta[:, 1])
    print(f"[sector build] {t_build:.1f}s table={smap.table.shape} "
          f"kv_sec={smap.kv_sec} real K mean={real.mean():.0f} "
          f"max={real.max()}", file=sys.stderr, flush=True)
    sm = build_segment_map(
        np.asarray(m.occupancy), m.resolution, (m.origin_x, m.origin_y),
        max_range=10.0, tile_size=4.0, real_hw=(m.height, m.width))

    edf = np.asarray(m.edf)[: m.height, : m.width]
    rng = np.random.RandomState(0)
    ys, xs = np.where(edf > 0.3)
    k = rng.randint(len(ys), size=A)
    X = (m.origin_x + (xs[k] + .5) * m.resolution).astype(np.float32)
    Y = (m.origin_y + (ys[k] + .5) * m.resolution).astype(np.float32)
    TH = rng.uniform(-np.pi, np.pi, A).astype(np.float32)
    offs = np.asarray(beam_angles(B, 4.712388980384690), np.float32)
    ANG = TH[:, None] + offs[None, :]
    x0 = jnp.asarray(X); y0 = jnp.asarray(Y)
    xb = jnp.broadcast_to(x0[:, None], (A, B))
    yb = jnp.broadcast_to(y0[:, None], (A, B))
    ct = jnp.asarray(np.cos(ANG)); st = jnp.asarray(np.sin(ANG))

    def timed(fn, *args, overhead=0.035):
        t0 = time.perf_counter()
        s = float(fn(*args))
        assert np.isfinite(s)
        return max(time.perf_counter() - t0 - overhead, 1e-9)

    def bench(once, reps, label):
        @jax.jit
        def loop(xb, yb, ct, st):
            def rep(acc, i):
                d = i.astype(jnp.float32) * 1e-7
                return acc + jnp.sum(once(xb + d, yb + d, ct, st)), None
            acc, _ = jax.lax.scan(rep, 0.0, jnp.arange(reps))
            return acc

        @jax.jit
        def fb(xb, yb, ct, st):
            def rep(acc, i):
                d = i.astype(jnp.float32) * 1e-7
                l, g = jax.value_and_grad(
                    lambda a, b: jnp.sum(once(a, b, ct, st)),
                    argnums=(0, 1))(xb + d, yb + d)
                return acc + l + jnp.sum(g[0]), None
            acc, _ = jax.lax.scan(rep, 0.0, jnp.arange(max(reps // 2, 4)))
            return acc

        print(f"[bench] {label}: compiling fwd ...", file=sys.stderr,
              flush=True)
        timed(loop, xb, yb, ct, st)
        dt = min(timed(loop, xb, yb, ct, st) for _ in range(3)) / reps
        print(f"{label}_fwd rays/s = {A * B / dt:.3e}", flush=True)
        print(f"[bench] {label}: compiling fwd+bwd ...", file=sys.stderr,
              flush=True)
        timed(fb, xb, yb, ct, st)
        dt = min(timed(fb, xb, yb, ct, st)
                 for _ in range(3)) / max(reps // 2, 4)
        print(f"{label}_fwdbwd rays/s = {A * B / dt:.3e}", flush=True)

    def sec_pallas_g(grp):
        def fn(xb_, yb_, ct_, st_):
            return raycast_sectors(
                smap.table, smap.meta, smap.tiles_shape, smap.tile_size,
                smap.tile_origin, smap.ns, smap.kv_sec, x0, y0,
                xb_, yb_, ct_, st_, 10.0, 128, 64, True, False, grp)
        return fn

    def sec_xla(xb_, yb_, ct_, st_):
        return raycast_sectors(
            smap.table, smap.meta, smap.tiles_shape, smap.tile_size,
            smap.tile_origin, smap.ns, smap.kv_sec, x0, y0,
            xb_, yb_, ct_, st_, 10.0, 128, 64, False, False)

    grps = [int(g) for g in os.environ.get("SECTOR_GRPS", "8").split(",")]
    for grp in grps:
        bench(sec_pallas_g(grp), 20, f"{name}_sector_pallas_g{grp}")
    sec_pallas = sec_pallas_g(grps[-1])
    bench(sec_xla, 20, f"{name}_sector_xla")

    if sm.tiles is not None:
        def tiled_pal(xb_, yb_, ct_, st_):
            return raycast_pallas_tiled(
                sm.tiles, sm.tile_sweep_meta, sm.tiles_shape, sm.tile_size,
                sm.tile_origin, x0, y0, xb_, yb_, ct_, st_, 10.0, False)
        bench(tiled_pal, 20, f"{name}_tiled_pallas")
    else:
        def full_pal(xb_, yb_, ct_, st_):
            return raycast_pallas(sm.params, sm.sweep_meta, xb_, yb_,
                                  ct_, st_, 10.0, False)
        bench(full_pal, 20, f"{name}_full_pallas")

    # parity spot check on hardware
    r_p = sec_pallas(xb, yb, ct, st)
    r_x = sec_xla(xb, yb, ct, st)
    print("pallas_vs_xla max |d| =",
          float(jnp.max(jnp.abs(r_p - r_x))), flush=True)


if __name__ == "__main__":
    main()
