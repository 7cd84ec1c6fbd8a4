"""Native (C++/ctypes) host library parity (SURVEY.md §2c tier).

Skipped wholesale when the toolchain/library is unavailable — every native
entry point has a NumPy twin that the rest of the suite already covers.
"""

import numpy as np
import pytest

from pyracecarsimulator_tpu._native import loader as nat

pytestmark = pytest.mark.skipif(not nat.available(),
                                reason="native library unavailable")


def test_edt_matches_scipy(rng):
    scipy_ndimage = pytest.importorskip("scipy.ndimage")
    occ = rng.rand(257, 129) < 0.01
    occ[0, 0] = True
    ref = scipy_ndimage.distance_transform_edt(~occ)
    np.testing.assert_allclose(nat.edt(occ), ref, atol=1e-4)


def test_extract_segments_matches_python(rng):
    from pyracecarsimulator_tpu.maps.segments import extract_segments
    occ = rng.rand(64, 96) < 0.1
    py = extract_segments(occ.astype(np.float32), 1.0, (0.0, 0.0))
    c = nat.extract_segments(occ)
    assert set(map(tuple, np.round(py, 9))) == set(map(tuple, np.round(c, 9)))


def test_trace_rays_matches_oracle(small_track, rng):
    from pyracecarsimulator_tpu.oracle import raycast as orc
    edf = np.asarray(small_track.edf)
    org = (small_track.origin_x, small_track.origin_y)
    bounds = (small_track.height, small_track.width)
    xs = rng.uniform(-3, 3, 64)
    ys = rng.uniform(-3, 3, 64)
    th = rng.uniform(-np.pi, np.pi, 64)
    got = nat.trace_rays(edf, bounds, small_track.resolution, org,
                         xs, ys, np.cos(th), np.sin(th))
    ref = np.array([orc.trace_ray(edf, small_track.resolution, org,
                                  xs[i], ys[i], np.cos(th[i]),
                                  np.sin(th[i]), 10.0, 1e-4,
                                  bounds_hw=bounds) for i in range(64)])
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_raycast_segments_matches_numpy(small_track, rng):
    from pyracecarsimulator_tpu.maps.segments import (
        extract_segments, raycast_segments_numpy)
    occ = np.asarray(small_track.occupancy)
    segs = extract_segments(occ, small_track.resolution,
                            (small_track.origin_x, small_track.origin_y))
    xs = rng.uniform(-3, 3, 64)
    ys = rng.uniform(-3, 3, 64)
    th = rng.uniform(-np.pi, np.pi, 64)
    got = nat.raycast_segments(segs, xs, ys, np.cos(th), np.sin(th))
    ref = raycast_segments_numpy(segs, xs, ys, np.cos(th), np.sin(th), 10.0)
    np.testing.assert_allclose(got, ref, atol=1e-9)


def test_scan_batch_matches_scalar(small_track, rng):
    from pyracecarsimulator_tpu.oracle.raycast import scan_batch, scan
    edf = np.asarray(small_track.edf)
    org = (small_track.origin_x, small_track.origin_y)
    bounds = (small_track.height, small_track.width)
    poses = np.stack([rng.uniform(-3, 3, 4), rng.uniform(-3, 3, 4),
                      rng.uniform(-np.pi, np.pi, 4)], -1)
    batch = scan_batch(edf, small_track.resolution, org, poses,
                       num_beams=32, bounds_hw=bounds)
    for i, p in enumerate(poses):
        ref = scan(edf, small_track.resolution, org, p, num_beams=32,
                   bounds_hw=bounds)
        np.testing.assert_allclose(batch[i], ref, atol=1e-5)


def test_sector_membership_matches_numpy(small_track):
    """Native rc_sector_membership == the NumPy _membership fallback,
    entry for entry (same geometry; the 1e-3 rad pad epsilon dwarfs the
    f32-vs-f64 rounding difference, so the covers coincide exactly on
    non-degenerate maps)."""
    from pyracecarsimulator_tpu._native import loader as nat
    from pyracecarsimulator_tpu.maps import sectors as S
    from pyracecarsimulator_tpu.maps.segments import extract_segments
    if not nat.available() or nat.sector_membership(
            np.zeros((1, 4)), 1, 1, 1, 1.0, 0, 0, 0.1, 1.0, 0.1) is None:
        import pytest
        pytest.skip("native library unavailable")
    t = small_track
    occ = np.asarray(t.occupancy)[: t.height, : t.width]
    segs = extract_segments(occ, t.resolution, (t.origin_x, t.origin_y))
    nr = int(np.ceil(occ.shape[0] * t.resolution / 2.0))
    nc = int(np.ceil(occ.shape[1] * t.resolution / 2.0))
    rt = 2.0 * np.sqrt(2.0) / 2.0 + 2.0 * t.resolution
    args = (segs, nr, nc, 16, 2.0, t.origin_x, t.origin_y, rt, 10.0 + rt,
            0.285)
    got = nat.sector_membership(*args)
    # force the NumPy body (native path short-circuits inside _membership)
    lib_save, fail_save = nat._lib, nat._load_failed
    try:
        nat._lib, nat._load_failed = None, True
        ref = S._membership(*args)
    finally:
        nat._lib, nat._load_failed = lib_save, fail_save
    np.testing.assert_array_equal(got, ref)
