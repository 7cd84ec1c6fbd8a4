"""Pallas fused raycast kernel: parity + VJP (interpret mode on CPU;
the TPU-compiled path is exercised by bench.py on hardware)."""

import numpy as np
import jax
import jax.numpy as jnp

from pyracecarsimulator_tpu.maps.segments import (
    extract_segments, pad_segments)
from pyracecarsimulator_tpu.ops.raycast_pallas import (
    sweep_meta_mixed, sweep_meta_split)
from pyracecarsimulator_tpu.ops.raycast_segments import raycast_all
from pyracecarsimulator_tpu.ops.raycast_pallas import (
    raycast_pallas, ROWS, LANES)
RAY_BLOCK = ROWS * LANES


def _setup(small_track, rng, n):
    occ = np.asarray(small_track.occupancy)
    raw = extract_segments(occ, small_track.resolution,
                           (small_track.origin_x, small_track.origin_y))
    segs = pad_segments(raw)
    params = jnp.asarray(segs.T, jnp.float32)
    meta = sweep_meta_mixed(int((raw[:, 3] > 0.5).sum()), len(raw))
    x = jnp.asarray(rng.uniform(-4, 4, n).astype(np.float32))
    y = jnp.asarray(rng.uniform(-4, 4, n).astype(np.float32))
    th = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
    return params, meta, x, y, jnp.asarray(np.cos(th)), jnp.asarray(np.sin(th))


def test_matches_xla_exact(small_track, rng):
    params, meta, x, y, ct, st = _setup(small_track, rng, RAY_BLOCK)
    ref = raycast_all(params, x, y, ct, st, 10.0)
    got = raycast_pallas(params, meta, x, y, ct, st, 10.0, True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_non_block_multiple_and_2d_shape(small_track, rng):
    params, meta, x, y, ct, st = _setup(small_track, rng, 700)
    ref = raycast_all(params, x, y, ct, st, 10.0)
    got = raycast_pallas(params, meta, x, y, ct, st, 10.0, True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    # 2D ray batch
    x2 = x[:690].reshape(30, 23)
    y2, ct2, st2 = (a[:690].reshape(30, 23) for a in (y, ct, st))
    got2 = raycast_pallas(params, meta, x2, y2, ct2, st2, 10.0, True)
    assert got2.shape == (30, 23)
    np.testing.assert_array_equal(np.asarray(got2).ravel(),
                                  np.asarray(ref)[:690])


def test_vjp_matches_autodiff(small_track, rng):
    params, meta, x, y, ct, st = _setup(small_track, rng, 256)

    def l_ref(x, y, ct, st):
        return jnp.sum(raycast_all(params, x, y, ct, st, 10.0) ** 2)

    def l_pal(x, y, ct, st):
        return jnp.sum(raycast_pallas(params, meta, x, y, ct, st, 10.0, True) ** 2)

    g1 = jax.grad(l_ref, argnums=(0, 1, 2, 3))(x, y, ct, st)
    g2 = jax.grad(l_pal, argnums=(0, 1, 2, 3))(x, y, ct, st)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_split_layout_matches(small_track, rng):
    from pyracecarsimulator_tpu.maps.segments import (
        extract_segments, split_pad_segments)
    occ = np.asarray(small_track.occupancy)
    segs = extract_segments(occ, small_track.resolution,
                            (small_track.origin_x, small_track.origin_y))
    paramsT, kv, kh = split_pad_segments(segs)
    params = jnp.asarray(paramsT, jnp.float32)
    x = jnp.asarray(rng.uniform(-4, 4, 512).astype(np.float32))
    y = jnp.asarray(rng.uniform(-4, 4, 512).astype(np.float32))
    th = rng.uniform(-np.pi, np.pi, 512).astype(np.float32)
    ct, st = jnp.asarray(np.cos(th)), jnp.asarray(np.sin(th))
    ref = raycast_all(params, x, y, ct, st, 10.0, 1024, kv)
    meta = sweep_meta_split(kv, int((segs[:, 3] > 0.5).sum()), len(segs))
    got = raycast_pallas(params, meta, x, y, ct, st, 10.0, True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def _tiled_setup(small_track, rng, a=24, b=256):
    # pillar lattice: enough segments that per-tile culling engages
    # (the build disables tiles when K_tile >= K)
    del small_track
    from pyracecarsimulator_tpu.maps.segments import build_segment_map
    h = w = 300
    occ = np.zeros((h, w), np.float32)
    occ[:3, :] = occ[-3:, :] = occ[:, :3] = occ[:, -3:] = 1
    for r in range(20, h - 20, 20):
        for c in range(20, w - 20, 20):
            occ[r:r + 4, c:c + 4] = 1
    res = 0.05
    org = (-7.5, -7.5)
    sm = build_segment_map(occ, res, org, max_range=2.0, tile_size=1.5,
                           real_hw=(h, w))
    assert sm.tiles is not None, "tile build skipped; shrink tile_size"
    free_y, free_x = np.where(occ < 0.5)
    k = rng.randint(len(free_y), size=a)
    x0 = (org[0] + (free_x[k] + .5) * res).astype(np.float32)
    y0 = (org[1] + (free_y[k] + .5) * res).astype(np.float32)
    th = rng.uniform(-np.pi, np.pi, (a, b)).astype(np.float32)
    xb = np.broadcast_to(x0[:, None], (a, b))
    yb = np.broadcast_to(y0[:, None], (a, b))
    return sm, (jnp.asarray(x0), jnp.asarray(y0), jnp.asarray(xb),
                jnp.asarray(yb), jnp.asarray(np.cos(th)),
                jnp.asarray(np.sin(th)))


def test_tiled_matches_xla(small_track, rng):
    from pyracecarsimulator_tpu.ops.raycast_segments import raycast_tiled
    from pyracecarsimulator_tpu.ops.raycast_pallas import (
        raycast_pallas_tiled)
    sm, (x0, y0, xb, yb, ct, st) = _tiled_setup(small_track, rng)
    ref = raycast_tiled(sm.tiles, sm.tiles_shape, sm.tile_size,
                        sm.tile_origin, x0, y0, xb, yb, ct, st, 2.0,
                        512, sm.kv_tile)
    got = raycast_pallas_tiled(sm.tiles, sm.tile_sweep_meta,
                               sm.tiles_shape, sm.tile_size,
                               sm.tile_origin, x0, y0, xb, yb, ct, st,
                               2.0, True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_tiled_tail_row_matches_xla(small_track, rng):
    """1080 beams -> 9 ray rows: one full 8-row tile + a single-row tail,
    exercising the squeezed 2D (SEG_BLK, LANES) tail path of _sweep_rows
    (berlin's production layout)."""
    from pyracecarsimulator_tpu.ops.raycast_segments import raycast_tiled
    from pyracecarsimulator_tpu.ops.raycast_pallas import (
        raycast_pallas_tiled)
    sm, (x0, y0, xb, yb, ct, st) = _tiled_setup(small_track, rng, a=6,
                                                b=1080)
    ref = raycast_tiled(sm.tiles, sm.tiles_shape, sm.tile_size,
                        sm.tile_origin, x0, y0, xb, yb, ct, st, 2.0,
                        512, sm.kv_tile)
    got = raycast_pallas_tiled(sm.tiles, sm.tile_sweep_meta,
                               sm.tiles_shape, sm.tile_size,
                               sm.tile_origin, x0, y0, xb, yb, ct, st,
                               2.0, True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_tiled_vjp_matches_autodiff(small_track, rng):
    from pyracecarsimulator_tpu.ops.raycast_segments import raycast_tiled
    from pyracecarsimulator_tpu.ops.raycast_pallas import (
        raycast_pallas_tiled)
    sm, (x0, y0, xb, yb, ct, st) = _tiled_setup(small_track, rng, a=8, b=128)

    def l_ref(xb, yb, ct, st):
        return jnp.sum(raycast_tiled(sm.tiles, sm.tiles_shape, sm.tile_size,
                                     sm.tile_origin, x0, y0, xb, yb, ct, st,
                                     2.0, 512, sm.kv_tile) ** 2)

    def l_pal(xb, yb, ct, st):
        return jnp.sum(raycast_pallas_tiled(
            sm.tiles, sm.tile_sweep_meta, sm.tiles_shape, sm.tile_size,
            sm.tile_origin, x0, y0, xb, yb, ct, st, 2.0, True) ** 2)

    g1 = jax.grad(l_ref, argnums=(0, 1, 2, 3))(xb, yb, ct, st)
    g2 = jax.grad(l_pal, argnums=(0, 1, 2, 3))(xb, yb, ct, st)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
