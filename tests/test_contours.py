"""Contour extraction + simplified general-segment backend
(maps/contours.py, ops/raycast_general.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from pyracecarsimulator_tpu.maps.contours import (
    build_general_segment_map, contours_to_general_segments,
    extract_general_segments, pad_general_segments, trace_contours)
from pyracecarsimulator_tpu.maps.segments import (
    extract_segments, pad_segments, raycast_segments_numpy)
from pyracecarsimulator_tpu.ops.raycast_general import (
    raycast_general, raycast_general_numpy, scan_poses_general)


def test_single_cell_loop():
    occ = np.zeros((8, 8), bool)
    occ[3, 5] = True
    loops = trace_contours(occ)
    assert len(loops) == 1 and len(loops[0]) == 4


def test_ring_gives_two_loops():
    occ = np.zeros((16, 16), bool)
    occ[4:12, 4:12] = True
    occ[6:10, 6:10] = False     # hole
    loops = trace_contours(occ)
    assert len(loops) == 2
    lens = sorted(len(l) for l in loops)
    assert lens == [16, 32]     # inner 4x4 hole ring, outer 8x8 ring


def test_unsimplified_matches_axis_segments(small_track, rng):
    """tol=0 general segments describe the same geometry as the axis set."""
    occ = np.asarray(small_track.occupancy)
    org = (small_track.origin_x, small_track.origin_y)
    g = contours_to_general_segments(
        trace_contours(occ >= 0.5), small_track.resolution, org, 0.0)
    a = pad_segments(extract_segments(occ, small_track.resolution, org))
    edf = np.asarray(small_track.edf)[: small_track.height,
                                      : small_track.width]
    ys, xs = np.where(edf > 0.4)
    k = rng.randint(len(ys), size=128)
    x = small_track.origin_x + (xs[k] + 0.5) * small_track.resolution
    y = small_track.origin_y + (ys[k] + 0.5) * small_track.resolution
    th = rng.uniform(-np.pi, np.pi, 128)
    r_g = raycast_general_numpy(pad_general_segments(g), x, y,
                                np.cos(th), np.sin(th), 10.0)
    r_a = raycast_segments_numpy(a, x, y, np.cos(th), np.sin(th), 10.0)
    np.testing.assert_allclose(r_g, r_a, atol=1e-9)


def test_simplified_error_bound(small_track, rng):
    """At tol cells, p95 range error stays within ~2 tol cells (grazing
    incidence amplifies the boundary deviation)."""
    occ = np.asarray(small_track.occupancy)
    org = (small_track.origin_x, small_track.origin_y)
    res = small_track.resolution
    tol = 1.0
    g = pad_general_segments(extract_general_segments(occ, res, org, tol))
    a = pad_segments(extract_segments(occ, res, org))
    edf = np.asarray(small_track.edf)[: small_track.height,
                                      : small_track.width]
    ys, xs = np.where(edf > 0.4)
    k = rng.randint(len(ys), size=256)
    x = small_track.origin_x + (xs[k] + 0.5) * res
    y = small_track.origin_y + (ys[k] + 0.5) * res
    th = rng.uniform(-np.pi, np.pi, 256)
    r_g = raycast_general_numpy(g, x, y, np.cos(th), np.sin(th), 10.0)
    r_a = raycast_segments_numpy(a, x, y, np.cos(th), np.sin(th), 10.0)
    d = np.abs(r_g - r_a)
    assert np.quantile(d, 0.95) < 2 * tol * res, np.quantile(d, 0.95)


def test_jax_matches_numpy(small_track, rng):
    occ = np.asarray(small_track.occupancy)
    org = (small_track.origin_x, small_track.origin_y)
    g = pad_general_segments(extract_general_segments(
        occ, small_track.resolution, org, 1.0))
    x = rng.uniform(-3, 3, 64)
    y = rng.uniform(-3, 3, 64)
    th = rng.uniform(-np.pi, np.pi, 64)
    ref = raycast_general_numpy(g, x, y, np.cos(th), np.sin(th), 10.0)
    got = np.asarray(raycast_general(
        jnp.asarray(g.T, jnp.float32), jnp.asarray(x, jnp.float32),
        jnp.asarray(y, jnp.float32), jnp.asarray(np.cos(th), jnp.float32),
        jnp.asarray(np.sin(th), jnp.float32), 10.0))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_tiled_equals_full_and_grads(small_track, rng):
    occ = np.asarray(small_track.occupancy)
    gm = build_general_segment_map(
        occ, small_track.resolution,
        (small_track.origin_x, small_track.origin_y), tol_cells=1.0,
        tile_size=2.0, real_hw=(small_track.height, small_track.width))
    edf = np.asarray(small_track.edf)[: small_track.height,
                                      : small_track.width]
    ys, xs = np.where(edf > 0.4)
    k = rng.randint(len(ys), size=16)
    x = small_track.origin_x + (xs[k] + 0.5) * small_track.resolution
    y = small_track.origin_y + (ys[k] + 0.5) * small_track.resolution
    poses = jnp.asarray(np.stack([x, y, rng.uniform(-3, 3, 16)], -1),
                        jnp.float32)
    rt = np.asarray(scan_poses_general(gm, poses, num_beams=32))
    rf = np.asarray(scan_poses_general(gm, poses, num_beams=32,
                                       use_tiles=False))
    np.testing.assert_array_equal(rt, rf)

    # gradient: analytic VJP vs finite differences (aggregate)
    def loss(poses):
        return jnp.sum(scan_poses_general(gm, poses, num_beams=32))

    g = np.asarray(jax.grad(loss)(poses))
    eps = 1e-3
    dp = np.zeros_like(np.asarray(poses)); dp[:, 0] = eps
    fd = (float(loss(poses + dp)) - float(loss(poses - dp))) / (2 * eps)
    # tolerance scaled to the gradient MAGNITUDE, not the (cancelling) sum:
    # FD can straddle winner-switch kinks for a few rays
    scale = np.abs(g[:, 0]).sum()
    assert abs(fd - g[:, 0].sum()) < 0.05 * max(1.0, scale)


def test_facade_simplified_backend(small_track):
    from pyracecarsimulator_tpu.simulator import build_sim, make_step_fn
    from pyracecarsimulator_tpu.config import ScanParams
    from pyracecarsimulator_tpu.state import state_from_pose
    bundle = build_sim(small_track, scan=ScanParams(num_beams=32),
                       backend="segments_simplified")
    step = make_step_fn(bundle, backend="segments_simplified",
                        with_noise=False)
    s = state_from_pose(jnp.zeros(2), jnp.full((2,), -3.5), jnp.zeros(2))
    out = step(s, (jnp.full((2,), 2.0), jnp.zeros(2)), None)
    assert out.ranges.shape == (2, 32)
    assert np.isfinite(np.asarray(out.ranges)).all()
