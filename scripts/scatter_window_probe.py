"""Windowed gather/scatter probe: can the 4-tap bilinear patch ops ride
contiguous-pair windows?

scripts/dmap_roofline.py (TPU v5e, round 4) measured the hybrid
∂range/∂map path AT the pointwise roofline: wmg_bwd 1.54e7 rays/s with
4 pointwise gathers (_bilinear_patch) + 4 pointwise scatter-adds
(_wmg_bwd), each ~1.3e8 elem/s. A bilinear 2x2 patch is two CONTIGUOUS
row pairs (base, base+1) and (base+W, base+W+1) — expressible as
windowed lax.gather / lax.scatter_add with a 2-wide window, halving the
op count; a (2,2) 2D window would quarter it. This measures each form's
throughput in isolation (same difference-estimator discipline).

Usage: python scripts/scatter_window_probe.py [n] [reps]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512 * 1080
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp
    from jax import lax

    H, W = 1280, 1280
    rng = np.random.RandomState(0)
    yi = rng.randint(0, H - 2, n).astype(np.int32)
    xi = rng.randint(0, W - 2, n).astype(np.int32)
    base = jnp.asarray(yi * W + xi)
    yx = jnp.stack([jnp.asarray(yi), jnp.asarray(xi)], axis=1)   # (N, 2)
    w4 = jnp.asarray(rng.rand(4, n).astype(np.float32))
    w22 = jnp.asarray(rng.rand(n, 2, 2).astype(np.float32))
    img = jnp.asarray(rng.rand(H, W).astype(np.float32))

    def timed1(fn, *args):
        t0 = time.perf_counter()
        s = float(fn(*args))
        assert np.isfinite(s)
        return time.perf_counter() - t0

    def timed3(fn, *args):
        t0 = time.perf_counter()
        a = fn(*args); b = fn(*args); c = fn(*args)
        s = float(a + b + c)
        assert np.isfinite(s)
        return time.perf_counter() - t0

    def report(label, fn, *args):
        print(f"[probe] {label}: compiling ...", file=sys.stderr, flush=True)
        timed1(fn, *args)
        t1 = min(timed1(fn, *args) for _ in range(3))
        t3 = min(timed3(fn, *args) for _ in range(3))
        dt = (t3 - t1) / (2.0 * reps)
        if dt <= 0:
            dt = max(t1 / reps, 1e-9)
        print(f"{label}: {n / dt:.3e} patches/s  (t1={t1:.3f} t3={t3:.3f})",
              flush=True)

    import functools

    @jax.jit
    def scatter4(b, w):
        def rep(acc, i):
            flat = jnp.zeros(H * W, jnp.float32)
            for t, off in enumerate((0, 1, W, W + 1)):
                flat = flat.at[b + off + i].add(w[t])
            return acc + flat[0] + flat[-1], None
        acc, _ = lax.scan(rep, 0.0, jnp.arange(reps))
        return acc

    # two windowed scatters: updates (N, 2) at starts (N, 1) into (M,)
    sc_dn = lax.ScatterDimensionNumbers(
        update_window_dims=(1,), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,))

    @jax.jit
    def scatter2w(b, w):
        def rep(acc, i):
            flat = jnp.zeros(H * W, jnp.float32)
            up = jnp.stack([w[0], w[1]], axis=1)
            dn = jnp.stack([w[2], w[3]], axis=1)
            flat = lax.scatter_add(flat, (b + i)[:, None], up, sc_dn)
            flat = lax.scatter_add(flat, (b + W + i)[:, None], dn, sc_dn)
            return acc + flat[0] + flat[-1], None
        acc, _ = lax.scan(rep, 0.0, jnp.arange(reps))
        return acc

    # one (2, 2)-windowed scatter into the 2D image
    sc_dn2 = lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0, 1))

    @jax.jit
    def scatter1w22(yx_, w):
        def rep(acc, i):
            im = jnp.zeros((H, W), jnp.float32)
            im = lax.scatter_add(im, yx_ + i, w, sc_dn2)
            return acc + im[0, 0] + im[-1, -1], None
        acc, _ = lax.scan(rep, 0.0, jnp.arange(reps))
        return acc

    @jax.jit
    def gather4(b):
        flat = img.reshape(-1)
        def rep(acc, i):
            s = 0.0
            for off in (0, 1, W, W + 1):
                s = s + jnp.sum(jnp.take(flat, b + off + i))
            return acc + s, None
        acc, _ = lax.scan(rep, 0.0, jnp.arange(reps))
        return acc

    g_dn = lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(),
        start_index_map=(0,))

    @jax.jit
    def gather2w(b):
        flat = img.reshape(-1)
        def rep(acc, i):
            up = lax.gather(flat, (b + i)[:, None], g_dn, (2,))
            dn = lax.gather(flat, (b + W + i)[:, None], g_dn, (2,))
            return acc + jnp.sum(up) + jnp.sum(dn), None
        acc, _ = lax.scan(rep, 0.0, jnp.arange(reps))
        return acc

    g_dn2 = lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    @jax.jit
    def gather1w22(yx_):
        def rep(acc, i):
            p = lax.gather(img, yx_ + i, g_dn2, (2, 2))   # (N, 2, 2)
            return acc + jnp.sum(p), None
        acc, _ = lax.scan(rep, 0.0, jnp.arange(reps))
        return acc

    # value-parity of the windowed scatters vs pointwise (one rep, no jit
    # loop) before timing
    f4 = jnp.zeros(H * W, jnp.float32)
    for t, off in enumerate((0, 1, W, W + 1)):
        f4 = f4.at[base + off].add(w4[t])
    up = jnp.stack([w4[0], w4[1]], axis=1)
    dn = jnp.stack([w4[2], w4[3]], axis=1)
    f2 = lax.scatter_add(jnp.zeros(H * W, jnp.float32), base[:, None], up,
                         sc_dn)
    f2 = lax.scatter_add(f2, (base + W)[:, None], dn, sc_dn)
    print("parity scatter2w vs scatter4: max|d| =",
          float(jnp.max(jnp.abs(f4 - f2))), flush=True)
    w22p = jnp.stack([jnp.stack([w4[0], w4[1]], 1),
                      jnp.stack([w4[2], w4[3]], 1)], 1)    # (N, 2, 2)
    f1 = lax.scatter_add(jnp.zeros((H, W), jnp.float32), yx, w22p, sc_dn2)
    print("parity scatter1w22 vs scatter4: max|d| =",
          float(jnp.max(jnp.abs(f4.reshape(H, W) - f1))), flush=True)

    report("gather4_pointwise", gather4, base)
    report("gather2_window2", gather2w, base)
    report("gather1_window2x2", gather1w22, yx)
    report("scatter4_pointwise", scatter4, base, w4)
    report("scatter2_window2", scatter2w, base, w4)
    report("scatter1_window2x2", scatter1w22, yx, w22)


if __name__ == "__main__":
    main()
