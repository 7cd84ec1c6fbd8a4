"""Ray-march parity: XLA march vs CPU oracle (SURVEY.md §4 item 3)."""

import numpy as np
import jax.numpy as jnp

from pyracecarsimulator_tpu.oracle import raycast as orc
from pyracecarsimulator_tpu.ops.raymarch_xla import march_rays, scan_poses


def _free_pose(track, rng, margin=0.5):
    edf = np.asarray(track.edf)
    ys, xs = np.where(edf > margin)
    k = rng.randint(len(ys))
    x = track.origin_x + (xs[k] + 0.5) * track.resolution
    y = track.origin_y + (ys[k] + 0.5) * track.resolution
    return x, y


def test_scan_matches_oracle_nearest(small_track, rng):
    edf = np.asarray(small_track.edf)
    org = (small_track.origin_x, small_track.origin_y)
    for trial in range(5):
        x, y = _free_pose(small_track, rng)
        th = float(rng.uniform(-np.pi, np.pi))
        ref = orc.scan(edf, small_track.resolution, org, (x, y, th),
                       num_beams=180, max_range=8.0)
        got = np.asarray(scan_poses(
            small_track.edf, small_track.resolution, jnp.asarray(org),
            jnp.array([x, y, th]), num_beams=180, max_range=8.0,
            max_iters=256))
        d = np.abs(got - ref)
        # f32 vs f64 cell-boundary rounding can shift individual beams by
        # up to ~1 cell; overwhelming majority must match tightly.
        assert (d < 1e-3).mean() > 0.99, (trial, d.max(), (d > 1e-3).sum())
        assert d.max() < 3 * small_track.resolution


def test_scan_theta_table_mode(small_track, rng):
    edf = np.asarray(small_track.edf)
    org = (small_track.origin_x, small_track.origin_y)
    x, y = _free_pose(small_track, rng)
    ref = orc.scan(edf, small_track.resolution, org, (x, y, 0.4),
                   num_beams=90, theta_discretization=2000)
    got = np.asarray(scan_poses(
        small_track.edf, small_track.resolution, jnp.asarray(org),
        jnp.array([x, y, 0.4]), num_beams=90, theta_discretization=2000,
        max_iters=256))
    d = np.abs(got - ref)
    assert (d < 1e-3).mean() > 0.97, (d.max(), (d > 1e-3).sum())


def test_scan_bilinear_close_to_nearest(small_track, rng):
    """Bilinear sampling changes step sizes but ranges stay within ~2 cells
    (the smooth twin used for gradients, SURVEY.md §7 step 5)."""
    org = jnp.asarray((small_track.origin_x, small_track.origin_y))
    x, y = _free_pose(small_track, rng, margin=0.8)
    a = np.asarray(scan_poses(small_track.edf, small_track.resolution, org,
                              jnp.array([x, y, 1.0]), num_beams=120,
                              max_iters=256, interp="nearest"))
    b = np.asarray(scan_poses(small_track.edf, small_track.resolution, org,
                              jnp.array([x, y, 1.0]), num_beams=120,
                              max_iters=400, interp="bilinear"))
    assert np.abs(a - b).max() < 4 * small_track.resolution


def test_bilinear_matches_oracle(small_track, rng):
    edf = np.asarray(small_track.edf)
    org = (small_track.origin_x, small_track.origin_y)
    x, y = _free_pose(small_track, rng)
    ref = orc.scan(edf, small_track.resolution, org, (x, y, -0.9),
                   num_beams=60, interp="bilinear", max_iters=400)
    got = np.asarray(scan_poses(
        small_track.edf, small_track.resolution, jnp.asarray(org),
        jnp.array([x, y, -0.9]), num_beams=60, interp="bilinear",
        max_iters=400))
    d = np.abs(got - ref)
    assert (d < 2e-3).mean() > 0.98, (d.max(), (d > 2e-3).sum())


def test_out_of_map_returns_max_range(small_track):
    org = jnp.asarray((small_track.origin_x, small_track.origin_y))
    r = march_rays(small_track.edf, small_track.resolution, org,
                   jnp.array([1000.0]), jnp.array([1000.0]),
                   jnp.array([1.0]), jnp.array([0.0]),
                   max_range=10.0, max_iters=16)
    assert float(r[0]) == 10.0


def test_range_clamp(small_track):
    """A ray down the long corridor axis clamps at max_range."""
    org = jnp.asarray((small_track.origin_x, small_track.origin_y))
    edf = np.asarray(small_track.edf)
    iy, ix = np.unravel_index(np.argmax(edf), edf.shape)
    x = small_track.origin_x + (ix + 0.5) * small_track.resolution
    y = small_track.origin_y + (iy + 0.5) * small_track.resolution
    r = march_rays(small_track.edf, small_track.resolution, org,
                   jnp.array([x]), jnp.array([y]),
                   jnp.array([1.0]), jnp.array([0.0]),
                   max_range=0.5, max_iters=64)
    assert float(r[0]) <= 0.5 + 1e-6


def test_batched_poses_shape(small_track):
    org = jnp.asarray((small_track.origin_x, small_track.origin_y))
    poses = jnp.zeros((4, 7, 3))
    out = scan_poses(small_track.edf, small_track.resolution, org, poses,
                     num_beams=32, max_iters=8)
    assert out.shape == (4, 7, 32)
