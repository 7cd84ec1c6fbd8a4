"""Theta-discretization parity + noise-model statistics
(reference ScanSimulator2D features, SURVEY.md §2a)."""

import numpy as np
import jax
import jax.numpy as jnp

from pyracecarsimulator_tpu.maps.segments import build_segment_map
from pyracecarsimulator_tpu.ops.raycast_segments import scan_poses_segments
from pyracecarsimulator_tpu.ops.noise import add_scan_noise
from pyracecarsimulator_tpu.oracle import raycast as orc


def _segmap(track):
    return build_segment_map(np.asarray(track.occupancy), track.resolution,
                             (track.origin_x, track.origin_y),
                             real_hw=(track.height, track.width))


def test_theta_table_quantizes_directions(small_track):
    """With theta_discretization, nearby headings within one bucket give
    IDENTICAL scans (the reference's quantized-trig behavior)."""
    sm = _segmap(small_track)
    bucket = 2 * np.pi / 2000
    th0 = 0.37
    # tiny shift: (almost surely) no beam crosses a bucket boundary
    p1 = jnp.array([0.0, -3.5, th0])
    p2 = jnp.array([0.0, -3.5, th0 + 1e-4 * bucket])
    p3 = jnp.array([0.0, -3.5, th0 + 1.0 * bucket])   # all beams shift
    r1 = np.asarray(scan_poses_segments(sm, p1, num_beams=64,
                                        theta_discretization=2000))
    r2 = np.asarray(scan_poses_segments(sm, p2, num_beams=64,
                                        theta_discretization=2000))
    r3 = np.asarray(scan_poses_segments(sm, p3, num_beams=64,
                                        theta_discretization=2000))
    np.testing.assert_array_equal(r1, r2)
    assert not np.array_equal(r1, r3)


def test_theta_table_matches_oracle_buckets(small_track):
    """Quantized beam directions must match the oracle's bucket table."""
    edf = np.asarray(small_track.edf)
    org = (small_track.origin_x, small_track.origin_y)
    sm = _segmap(small_track)
    pose = (0.2, -3.4, 1.234)
    r_seg = np.asarray(scan_poses_segments(
        sm, jnp.asarray(pose), num_beams=90, theta_discretization=2000))
    r_orc = orc.scan(edf, small_track.resolution, org, pose, num_beams=90,
                     theta_discretization=2000,
                     bounds_hw=(small_track.height, small_track.width))
    # different algorithms (geometry vs DT march) but identical ray
    # directions: differences stay within the march's O(res) overshoot
    d = np.abs(r_seg - r_orc)
    assert np.quantile(d, 0.9) < 2 * small_track.resolution


def test_noise_statistics():
    key = jax.random.PRNGKey(0)
    base = jnp.full((200, 1080), 5.0)
    noisy = add_scan_noise(base, key, std_dev=0.01, max_range=10.0)
    resid = np.asarray(noisy - base)
    assert abs(resid.mean()) < 1e-4
    assert abs(resid.std() - 0.01) < 5e-4


def test_noise_zero_std_identity():
    base = jnp.full((8,), 5.0)
    out = add_scan_noise(base, jax.random.PRNGKey(0), std_dev=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(base))


def test_noise_clamps():
    key = jax.random.PRNGKey(0)
    base = jnp.full((1000,), 10.0)   # at max range
    noisy = add_scan_noise(base, key, std_dev=0.5, max_range=10.0)
    assert float(noisy.max()) <= 10.0
    assert float(noisy.min()) < 10.0


def test_checked_step_catches_nan(small_track):
    from pyracecarsimulator_tpu.simulator import build_sim, make_step_fn
    from pyracecarsimulator_tpu.config import ScanParams
    from pyracecarsimulator_tpu.state import state_from_pose
    from pyracecarsimulator_tpu.utils.debug import checked
    bundle = build_sim(small_track, scan=ScanParams(num_beams=32))
    step = make_step_fn(bundle, with_noise=False)
    safe = checked(step)
    s = state_from_pose(jnp.zeros(2), jnp.zeros(2), jnp.zeros(2))
    out, err = safe(s, (jnp.full((2,), 2.0), jnp.zeros(2)), None)
    assert err.get() is None            # clean step -> no error
    bad = state_from_pose(jnp.array([jnp.nan, 0.0]), jnp.zeros(2),
                          jnp.zeros(2))
    out, err = safe(bad, (jnp.zeros(2), jnp.zeros(2)), None)
    assert err.get() is not None        # NaN surfaced, not silent
