"""Ablate the levine sector sweep's per-ray FIXED cost (docs/BOTTLENECK.md:
a ~= 0.53 ns/ray is 86% of the flagship budget; this names its parts).

Bench-only variants of ops/raycast_sectors._sweep_xla at the production
K=32 config; each removes one suspected fixed-cost component:

  full      the production XLA path (raycast_sectors, fwd)
  noeplg    raw sweep minima only — drops min(bv,bh)/clamp/extent/slice
  nogather  cull-table rows replaced by a STATIC row 0 slice (no
            dynamic gather; same sweep math on the same shapes)
  take2d    gather on a (L, 4K) 2D-reshaped table (one contiguous
            128-float row per list at K=32) instead of the production
            3D column-sliced take — candidate production fix
  noids     block ids forced constant 0 (drops the arctan2/sector math
            AND makes the gather trivially coherent)

Timing per CLAUDE.md: perturbed reps inside one jit, difference estimator
(T3 - T1)/(2*reps), min-of-3.

    python scripts/ablate_fixed.py            # on the TPU
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp
    from pyracecarsimulator_tpu.maps.loader import load_builtin
    from pyracecarsimulator_tpu.maps.sectors import build_sector_map
    from pyracecarsimulator_tpu.ops.raycast_sectors import (
        raycast_sectors, _list_ids, _pad_beams)
    from pyracecarsimulator_tpu.ops.raycast_segments import _ray_invs
    from pyracecarsimulator_tpu.ops.raymarch_xla import beam_angles

    A = int(os.environ.get("ABL_A", "4096"))
    B = 1080
    BB = 128
    BIG = np.float32(3.0e38)
    m = load_builtin("levine")
    smap = build_sector_map(
        np.asarray(m.occupancy), m.resolution, (m.origin_x, m.origin_y),
        max_range=10.0, tile_size=2.0, ns=16, real_hw=(m.height, m.width))
    K = smap.table.shape[2]
    print(f"table={smap.table.shape} kv_sec={smap.kv_sec}", flush=True)

    rng = np.random.RandomState(0)
    edf = np.asarray(m.edf)[: m.height, : m.width]
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
    table2d = smap.table.reshape(smap.table.shape[0], -1)  # (L, 4K)

    nblk = -(-B // BB)
    b_pad = nblk * BB - B
    gdim = A * nblk

    def sweep_variant(mode, x0_, y0_, xb_, yb_, ct_, st_):
        ids = _list_ids(smap.tiles_shape, smap.tile_size, smap.tile_origin,
                        smap.ns, x0_, y0_, ct_, st_, BB)
        if mode == "noids":
            ids = jnp.zeros_like(ids)
        inv_c, inv_s = _ray_invs(ct_, st_)
        args = [_pad_beams(v, b_pad) for v in (xb_, yb_, ct_, st_,
                                               inv_c, inv_s)]
        x, y, c, s, ic, is_ = [v.reshape(gdim, BB) for v in args]
        idsf = ids.reshape(gdim)
        best_v = jnp.full((gdim, BB), BIG)
        best_h = jnp.full((gdim, BB), BIG)
        if mode == "take2d":
            g2 = jnp.take(table2d, idsf, axis=0).reshape(gdim, 4, K)
        for lo_i, hi_i, vert in ((0, smap.kv_sec, True),
                                 (smap.kv_sec, K, False)):
            ck = hi_i - lo_i
            if mode == "nogather":
                g = jnp.broadcast_to(smap.table[0:1, :, lo_i:hi_i],
                                     (gdim, 4, ck))
                # defeat loop-invariant hoisting: mix a (negligible)
                # per-rep term in — x*0 could be folded by the
                # algebraic simplifier, 1e-30*x cannot
                g = g + (x[:, :1] * 1e-30)[:, :, None]
            elif mode == "take2d":
                g = g2[:, :, lo_i:hi_i]
            else:
                g = jnp.take(smap.table[:, :, lo_i:hi_i], idsf, axis=0)
            p = g[:, 0, :, None]
            lo = g[:, 1, :, None]
            hi = g[:, 2, :, None]
            if vert:
                t = (p - x[:, None, :]) * ic[:, None, :]
                a = y[:, None, :] + t * s[:, None, :]
            else:
                t = (p - y[:, None, :]) * is_[:, None, :]
                a = x[:, None, :] + t * c[:, None, :]
            valid = (t >= 0.0) & ((a - lo) * (hi - a) >= 0.0)
            best = jnp.minimum(
                best_v if vert else best_h,
                jnp.min(jnp.where(valid, t, BIG), axis=1))
            if vert:
                best_v = best
            else:
                best_h = best
        if mode == "noeplg":
            # keep min+clamp (sums must stay finite); ablate only the
            # 1152->1080 slice, reshape and extent mask
            return jnp.minimum(jnp.minimum(best_v, best_h), 10.0)
        r = jnp.minimum(jnp.minimum(best_v, best_h), 10.0)
        r = r.reshape(A, -1)[:, :B]
        from pyracecarsimulator_tpu.ops.common import apply_extent_mask
        return apply_extent_mask(r, x0_, y0_, smap.extent, 10.0)

    def prod(x0_, y0_, xb_, yb_, ct_, st_):
        return raycast_sectors(
            smap.table, smap.meta, smap.tiles_shape, smap.tile_size,
            smap.tile_origin, smap.ns, smap.kv_sec, x0_, y0_, xb_, yb_,
            ct_, st_, 10.0, BB, 64, False, False)

    REPS = int(os.environ.get("ABL_REPS", "50"))

    def bench(fn, label):
        @jax.jit
        def loop(xb_, yb_, ct_, st_):
            def rep(acc, i):
                d = i.astype(jnp.float32) * 1e-7
                r = fn(x0 + d, y0 + d, xb_ + d, yb_ + d, ct_, st_)
                return acc + jnp.sum(r), None
            acc, _ = jax.lax.scan(rep, 0.0, jnp.arange(REPS))
            return acc

        def t1():
            t0 = time.perf_counter()
            s = float(loop(xb, yb, ct, st))
            assert np.isfinite(s)
            return time.perf_counter() - t0

        def t3():
            t0 = time.perf_counter()
            a = loop(xb, yb, ct, st)
            b = loop(xb, yb, ct, st)
            c = loop(xb, yb, ct, st)
            float(a + b + c)
            return time.perf_counter() - t0

        t1()
        dt = (min(t3() for _ in range(3)) - min(t1() for _ in range(3))) \
            / (2 * REPS)
        print(f"{label:10s} rays/s={A * B / dt:.3e}  "
              f"ns/ray={dt / (A * B) * 1e9:.3f}", flush=True)
        return dt / (A * B)

    t_full = bench(prod, "full")
    for mode in ("noeplg", "nogather", "take2d", "noids"):
        t = bench(lambda *a, m=mode: sweep_variant(m, *a), mode)
        print(f"  -> {mode} saves {1e9 * (t_full - t):+.3f} ns/ray "
              f"({100 * (t_full - t) / t_full:+.0f}% of full)", flush=True)


if __name__ == "__main__":
    main()
