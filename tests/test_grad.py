"""Gradient correctness (SURVEY.md §4 item 3 / §7 step 5):
- analytic custom-VJP vs plain autodiff of the dense formula
- both vs central finite differences of the oracle
- EDF-bilinear march: d range/d map scatter-structure + FD check
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyracecarsimulator_tpu.maps.segments import (
    build_segment_map, extract_segments, pad_segments)
from pyracecarsimulator_tpu.ops.raycast_segments import raycast_all
from pyracecarsimulator_tpu.ops.raycast_grad import (
    raycast_all_diff, raycast_tiled_diff)
from pyracecarsimulator_tpu.ops.raymarch_xla import march_rays


def _params(small_track):
    occ = np.asarray(small_track.occupancy)
    segs = extract_segments(occ, small_track.resolution,
                            (small_track.origin_x, small_track.origin_y))
    return jnp.asarray(pad_segments(segs).T, jnp.float32)


def _rand_rays(small_track, rng, n=64):
    edf = np.asarray(small_track.edf)[: small_track.height,
                                      : small_track.width]
    ys, xs = np.where(edf > 0.4)
    k = rng.randint(len(ys), size=n)
    x = small_track.origin_x + (xs[k] + 0.5) * small_track.resolution
    y = small_track.origin_y + (ys[k] + 0.5) * small_track.resolution
    th = rng.uniform(-np.pi, np.pi, n)
    return (jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
            jnp.asarray(np.cos(th), jnp.float32),
            jnp.asarray(np.sin(th), jnp.float32))


def test_values_match_plain(small_track, rng):
    params = _params(small_track)
    x, y, ct, st = _rand_rays(small_track, rng)
    a = raycast_all(params, x, y, ct, st, 10.0)
    b = raycast_all_diff(params, x, y, ct, st, 10.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_diff_primal_ulp_contract(small_track, rng):
    """UNDER autodiff the mixed-layout winner forward packs the orientation
    bit into t's mantissa LSB, so its primal may sit <=1 ulp below the
    plain forward (and never above). Pins the tolerated deviation the
    raycast_all_diff docstring documents."""
    params = _params(small_track)          # mixed layout (kv=0)
    x, y, ct, st = _rand_rays(small_track, rng, n=256)
    r_plain = np.asarray(raycast_all(params, x, y, ct, st, 10.0))
    # jax.vjp forces the custom_vjp fwd rule (the winner-tracking path)
    r_diff, _ = jax.vjp(
        lambda x, y: raycast_all_diff(params, x, y, ct, st, 10.0), x, y)
    r_diff = np.asarray(r_diff)
    assert (r_diff <= r_plain).all()
    ulp = np.spacing(r_plain.astype(np.float32))
    assert (r_plain - r_diff <= ulp + 1e-30).all()


def test_custom_vjp_matches_autodiff(small_track, rng):
    params = _params(small_track)
    x, y, ct, st = _rand_rays(small_track, rng)

    def loss_plain(x, y, ct, st):
        return jnp.sum(raycast_all(params, x, y, ct, st, 10.0) ** 2)

    def loss_custom(x, y, ct, st):
        return jnp.sum(raycast_all_diff(params, x, y, ct, st, 10.0) ** 2)

    g1 = jax.grad(loss_plain, argnums=(0, 1, 2, 3))(x, y, ct, st)
    g2 = jax.grad(loss_custom, argnums=(0, 1, 2, 3))(x, y, ct, st)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_grad_matches_finite_differences(small_track, rng):
    params = _params(small_track)
    x, y, ct, st = _rand_rays(small_track, rng, n=32)

    def f(xv):
        return jnp.sum(raycast_all_diff(params, xv, y, ct, st, 10.0))

    g = np.asarray(jax.grad(f)(x))
    eps = 1e-3
    fd = (float(f(x + eps)) - float(f(x - eps))) / (2 * eps)
    # FD of the sum: compare against summed analytic grad. Individual rays
    # can straddle corner discontinuities; the aggregate must agree well.
    assert abs(fd - g.sum()) < 0.05 * max(1.0, abs(g.sum())), (fd, g.sum())


def test_tiled_diff_matches_full(small_track, rng):
    # dense pillar field + short range so tile culling actually reduces
    # the per-tile lists (build_segment_map drops no-benefit tiles)
    occ = np.zeros((256, 256), np.float32)
    prng = np.random.RandomState(5)
    for _ in range(120):
        i, j = prng.randint(8, 248, 2)
        occ[i:i + 2, j:j + 2] = 1.0
    sm = build_segment_map(occ, small_track.resolution, (-6.4, -6.4),
                           max_range=2.0, tile_size=2.0)
    assert sm.tiles is not None, "expected effective culling in this setup"
    x, y, ct, st = _rand_rays(small_track, rng, n=16)
    xb, yb = x[:, None], y[:, None]
    ctb, stb = ct[:, None], st[:, None]

    def loss_t(xb):
        # max_range must not exceed the cull reach the tiles were built for
        return jnp.sum(raycast_tiled_diff(
            sm.tiles, sm.tiles_shape, sm.tile_size, sm.tile_origin,
            x, y, xb, yb, ctb, stb, 2.0))

    def loss_f(xb):
        return jnp.sum(raycast_all_diff(sm.params, xb, yb, ctb, stb, 2.0))

    np.testing.assert_allclose(float(loss_t(xb)), float(loss_f(xb)),
                               rtol=1e-6)
    gt = np.asarray(jax.grad(loss_t)(xb))
    gf = np.asarray(jax.grad(loss_f)(xb))
    np.testing.assert_allclose(gt, gf, rtol=1e-4, atol=1e-5)


def test_no_hit_zero_grad():
    occ = np.zeros((16, 16))
    occ[:, 12] = 1.0
    params = jnp.asarray(
        pad_segments(extract_segments(occ, 1.0, (0.0, 0.0))).T, jnp.float32)

    def f(x):
        # pointing away from the wall -> clamp -> zero gradient
        return raycast_all_diff(params, x[None], jnp.array([8.0]),
                                jnp.array([-1.0]), jnp.array([0.0]), 5.0)[0]

    assert float(f(jnp.asarray(2.0))) == 5.0
    assert float(jax.grad(f)(jnp.asarray(2.0))) == 0.0


def test_edf_bilinear_map_gradient(small_track):
    """d range/d map is a scatter along the visited cells (SURVEY.md §7
    step 5): nonzero only near the ray's path, and FD-consistent."""
    edf = small_track.edf
    org = jnp.asarray((small_track.origin_x, small_track.origin_y))
    # a ray across open space that hits the interior block face-on
    # (a clamped ray would legitimately have zero gradient)
    x0 = jnp.array([small_track.origin_x + 1.0])
    y0 = jnp.array([small_track.origin_y
                    + 96 * small_track.resolution])   # block mid-height

    def f(edf):
        return march_rays(edf, small_track.resolution, org,
                          x0, y0, jnp.array([1.0]), jnp.array([0.0]),
                          max_range=8.0, max_iters=128,
                          interp="bilinear")[0]

    g = np.asarray(jax.grad(f)(edf))
    assert (g != 0).any()
    nz_frac = (g != 0).mean()
    assert nz_frac < 0.01, f"map grad not sparse: {nz_frac}"
    # FD check on an influential *mid-path* cell: cells at the hit point
    # sit on the d<=eps kink where central differences straddle the
    # discontinuity (observed FD = analytic/2 there); mid-path cells are
    # locally smooth.
    r_hit = float(f(edf))
    gx_hit = int((float(x0[0]) + r_hit - small_track.origin_x)
                 / small_track.resolution)
    gmask = np.abs(g).copy()
    gmask[:, max(0, gx_hit - 6):] = 0.0      # exclude cells near the hit
    iy, ix = np.unravel_index(np.argmax(gmask), g.shape)
    eps = 1e-3
    e = np.asarray(edf).copy(); e[iy, ix] += eps
    fp = float(f(jnp.asarray(e)))
    e[iy, ix] -= 2 * eps
    fm = float(f(jnp.asarray(e)))
    fd = (fp - fm) / (2 * eps)
    np.testing.assert_allclose(fd, g[iy, ix], rtol=0.05, atol=1e-3)
