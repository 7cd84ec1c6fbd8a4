"""A/B bench: length-sorted tiled sector sweep vs the dense sweep.

The sorted sweep (ops/raycast_sectors._sweep_xla_sorted) bounds work by
per-tile max real list length instead of padded capacity K — the attack
on berlin's 4.4x padding waste (VERDICT r3 #1, docs/BOTTLENECK.md).
This script measures all its variants against the dense baseline on one
map, with the round-3 difference estimator (T3-T1 cancels the tunnel
constant) and per-rep input perturbation (CSE guard). Tables ride as jit
ARGUMENTS (berlin's 130 MB table overflows the remote-compile payload
when closed over — CLAUDE.md).

Usage: python scripts/bench_sorted.py [map] [reps]
  MODES=dense,sorted@64:32,...   override the variant list
  ("mode@TR:C" = sweep mode with tile_rows TR and chunk C)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEFAULT_MODES = ("dense:64", "sorted@2048:64", "sorted_pt@2048:32",
                 "sorted_pl@128:24", "sorted_pl@128:32",
                 "sorted_pl@256:32")   # the measured ladder (BOTTLENECK.md)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "berlin"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
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
        raycast_sectors, sector_table_arg)
    from pyracecarsimulator_tpu.ops.raymarch_xla import beam_angles

    A = int(os.environ.get("AGENTS", "4096"))
    B = 1080
    # NS/TILE override the table geometry: used to synthesize
    # intermediate capacities from the two builtin maps for the
    # auto-threshold calibration (resolve_sector_mode._AUTO_MIN_K)
    ns_ = int(os.environ.get("NS", "16"))
    tile_ = float(os.environ.get("TILE", "2.0"))
    mr_ = float(os.environ.get("MR", "10.0"))   # max_range: capacity lever
    m = load_builtin(name)
    t0 = time.time()
    smap = build_sector_map(
        np.asarray(m.occupancy), m.resolution, (m.origin_x, m.origin_y),
        max_range=mr_, tile_size=tile_, ns=ns_,
        real_hw=(m.height, m.width))
    meta = np.asarray(smap.meta)
    real = meta[:, 0] + (meta[:, 2] - meta[:, 1])
    k_cap = smap.table.shape[2]
    print(f"[build] {time.time()-t0:.1f}s table={smap.table.shape} "
          f"kv={smap.kv_sec} real mean={real.mean():.0f} max={real.max()}",
          file=sys.stderr, flush=True)

    edf = np.asarray(m.edf)[: m.height, : m.width]
    rng = np.random.RandomState(0)
    ys, xs = np.where(edf > 0.3)
    kk = rng.randint(len(ys), size=A)
    X = (m.origin_x + (xs[kk] + .5) * m.resolution).astype(np.float32)
    Y = (m.origin_y + (ys[kk] + .5) * m.resolution).astype(np.float32)
    TH = rng.uniform(-np.pi, np.pi, A).astype(np.float32)
    bp = -(-B // 128) * 128
    offs = np.asarray(beam_angles(B, 4.712388980384690), np.float32)
    offs = np.concatenate([offs, np.repeat(offs[-1:], bp - B)])
    ANG = TH[:, None] + offs[None, :]
    x0 = jnp.asarray(X); y0 = jnp.asarray(Y)
    xb = jnp.broadcast_to(x0[:, None], (A, bp))
    yb = jnp.broadcast_to(y0[:, None], (A, bp))
    ct = jnp.asarray(np.cos(ANG)); st = jnp.asarray(np.sin(ANG))

    # predicted work ratio from the batch's actual id distribution (the
    # analysis number for docs/BOTTLENECK.md)
    nr, nc = smap.tiles_shape
    tox, toy = smap.tile_origin
    ci = np.clip(((X - tox) / smap.tile_size).astype(int), 0, nc - 1)
    ri = np.clip(((Y - toy) / smap.tile_size).astype(int), 0, nr - 1)
    tid = ri * nc + ci
    mids = np.minimum(np.arange(bp // 128) * 128 + 64, B - 1)
    th = np.mod(ANG[:, mids], 2 * np.pi)
    sec = np.clip((th * (smap.ns / (2 * np.pi))).astype(int), 0,
                  smap.ns - 1)
    ids = (tid[:, None] * smap.ns + sec).reshape(-1)
    n_of = real[ids]
    print(f"[batch] list-length mean={n_of.mean():.0f} p50="
          f"{np.percentile(n_of, 50):.0f} p90={np.percentile(n_of, 90):.0f}"
          f" max={n_of.max()} capacity={k_cap}", flush=True)
    s = np.sort(n_of)[::-1]
    for tr in (64, 1024, 2048, 4096):
        tiles = s[: len(s) // tr * tr].reshape(-1, tr)
        work = tiles.max(1).sum() * tr
        print(f"[batch] sorted tile max work ratio tr={tr}: "
              f"{work / (len(s) * k_cap):.3f} of dense", flush=True)

    def timed1(fn, *args):
        t0 = time.perf_counter()
        sres = float(fn(*args))
        assert np.isfinite(sres)
        return time.perf_counter() - t0

    def timed3(fn, *args):
        t0 = time.perf_counter()
        a = fn(*args)
        b = fn(*args)
        c = fn(*args)
        sres = float(a + b + c)
        assert np.isfinite(sres)
        return time.perf_counter() - t0

    def bench(label, mode, chunk, fwdbwd=False):
        def once(table, meta_j, xb_, yb_, ct_, st_):
            d = xb_[0, 0] - x0[0]
            return raycast_sectors(
                table, meta_j, smap.tiles_shape, smap.tile_size,
                smap.tile_origin, smap.ns, smap.kv_sec, x0 + d, y0 + d,
                xb_, yb_, ct_, st_, mr_, 128, chunk, False, False, 8,
                mode)

        @jax.jit
        def loop(table, meta_j, xb, yb, ct, st):
            def rep(acc, i):
                d = i.astype(jnp.float32) * 1e-7
                return acc + jnp.sum(once(table, meta_j, xb + d, yb + d,
                                          ct, st)), None
            acc, _ = jax.lax.scan(rep, 0.0, jnp.arange(reps))
            return acc

        @jax.jit
        def fb(table, meta_j, xb, yb, ct, st):
            def rep(acc, i):
                d = i.astype(jnp.float32) * 1e-7
                l, g = jax.value_and_grad(
                    lambda a, b: jnp.sum(once(table, meta_j, a, b, ct,
                                              st)), argnums=(0, 1))(
                    xb + d, yb + d)
                return acc + l + jnp.sum(g[0]), None
            acc, _ = jax.lax.scan(rep, 0.0, jnp.arange(reps))
            return acc

        for tag, fn in (("fwd", loop),) + ((("fwdbwd", fb),) if fwdbwd
                                           else ()):
            print(f"[bench] {label}_{tag}: compiling ...", file=sys.stderr,
                  flush=True)
            args = (sector_table_arg(smap, mode), smap.meta, xb, yb,
                    ct, st)
            timed1(fn, *args)
            t1 = min(timed1(fn, *args) for _ in range(3))
            t3 = min(timed3(fn, *args) for _ in range(3))
            dt = (t3 - t1) / (2.0 * reps)
            if dt <= 0:
                dt = max(t1 / reps, 1e-9)
            print(f"{label}_{tag} rays/s = {A * B / dt:.3e}   "
                  f"(t1={t1:.3f} t3={t3:.3f} reps={reps})", flush=True)

    modes = os.environ.get("MODES")
    modes = modes.split(",") if modes else list(DEFAULT_MODES)
    for spec in modes:
        mode, chunk = spec.rsplit(":", 1)
        fwdbwd = os.environ.get("FWDBWD", "0") == "1"
        try:
            bench(f"{name}_{spec.replace(':', '_c').replace('@', '_tr')}",
                  mode, int(chunk), fwdbwd)
        except Exception as e:
            print(f"[bench] {spec} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    # hardware parity gate: each measured mode vs dense, full batch
    @jax.jit
    def run_mode(table, meta_j, xb, yb, ct, st, mode, chunk):
        return raycast_sectors(
            table, meta_j, smap.tiles_shape, smap.tile_size,
            smap.tile_origin, smap.ns, smap.kv_sec, x0, y0, xb, yb, ct,
            st, mr_, 128, chunk, False, False, 8, mode)

    from functools import partial
    r_ref = None
    for spec in modes:
        mode, chunk = spec.rsplit(":", 1)
        r = jax.jit(partial(run_mode.__wrapped__, mode=mode,
                            chunk=int(chunk)))(
            sector_table_arg(smap, mode), smap.meta, xb, yb, ct, st)
        if r_ref is None:
            r_ref = r
        else:
            print(f"parity {spec} vs {modes[0]}: max|d| = "
                  f"{float(jnp.max(jnp.abs(r - r_ref))):.3e}", flush=True)


if __name__ == "__main__":
    main()
