"""Parity report: every device backend vs the frozen CPU oracles.

Produces the allclose-gate evidence table (BASELINE.json "metric":
"grad allclose"; SURVEY.md §4) on both builtin maps. CPU-runnable:

    JAX_PLATFORMS=cpu python scripts/parity_report.py [--poses 32]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def q(d, p):
    return float(np.quantile(d, p))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=16)
    ap.add_argument("--beams", type=int, default=180)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from pyracecarsimulator_tpu.maps import load_builtin, sample_free_poses
    from pyracecarsimulator_tpu.maps.segments import (
        build_segment_map, extract_segments, pad_segments,
        raycast_segments_numpy)
    from pyracecarsimulator_tpu.maps.contours import build_general_segment_map
    from pyracecarsimulator_tpu.ops.raymarch_xla import scan_poses
    from pyracecarsimulator_tpu.ops.raycast_segments import (
        scan_poses_segments)
    from pyracecarsimulator_tpu.ops.raycast_general import scan_poses_general
    from pyracecarsimulator_tpu.ops.raycast_pallas import raycast_pallas
    from pyracecarsimulator_tpu.ops.common import rays_from_poses
    from pyracecarsimulator_tpu.oracle.raycast import scan_batch

    B = args.beams
    rows = []
    for name in ("levine", "berlin"):
        t = load_builtin(name)
        edf = np.asarray(t.edf)
        org = (t.origin_x, t.origin_y)
        bounds = (t.height, t.width)
        poses = sample_free_poses(t, args.poses, np.random.RandomState(0))

        # oracle A: DT march (reference semantics)
        o_march = scan_batch(edf, t.resolution, org, poses, num_beams=B,
                             bounds_hw=bounds)
        # oracle B: exact geometry
        segs = extract_segments(np.asarray(t.occupancy), t.resolution, org)
        _, p2, xb, yb, ct, st = rays_from_poses(poses, B, 4.712388980384690)
        o_geom = raycast_segments_numpy(
            pad_segments(segs), np.asarray(xb).ravel(),
            np.asarray(yb).ravel(), np.asarray(ct).ravel(),
            np.asarray(st).ravel(), 10.0).reshape(args.poses, B)

        sm = build_segment_map(np.asarray(t.occupancy), t.resolution, org,
                               max_range=10.0, tile_size=4.0,
                               real_hw=bounds)
        gm = build_general_segment_map(np.asarray(t.occupancy),
                                       t.resolution, org, tol_cells=1.0,
                                       max_range=10.0, tile_size=4.0,
                                       real_hw=bounds)
        jp = jnp.asarray(poses)
        backends = {
            "edf march (XLA)": np.asarray(scan_poses(
                t.edf, t.resolution, jnp.asarray(org), jp, num_beams=B,
                max_iters=200, bounds_hw=bounds)),
            "segments exact (XLA)": np.asarray(scan_poses_segments(
                sm, jp, num_beams=B)),
            "segments exact (Pallas)": np.asarray(raycast_pallas(
                sm.params, sm.sweep_meta, xb, yb, ct, st, 10.0,
                jax.default_backend() == "cpu")),
            "simplified tol=1 (XLA)": np.asarray(scan_poses_general(
                gm, jp, num_beams=B)),
        }
        oracles = {"edf march (XLA)": ("DT-march oracle", o_march),
                   "segments exact (XLA)": ("geometry oracle", o_geom),
                   "segments exact (Pallas)": ("geometry oracle", o_geom),
                   "simplified tol=1 (XLA)": ("geometry oracle", o_geom)}
        for bname, r in backends.items():
            oname, o = oracles[bname]
            d = np.abs(r - o)
            rows.append((name, bname, oname, d.mean(), q(d, 0.99), d.max()))

        # cross-semantics: march vs geometry (documents corner tunneling)
        d = np.abs(o_march - o_geom)
        rows.append((name, "DT-march oracle", "geometry oracle",
                     d.mean(), q(d, 0.99), d.max()))

    print(f"{'map':<8} {'backend':<26} {'oracle':<16} "
          f"{'mean':>8} {'p99':>8} {'max':>8}")
    for r in rows:
        print(f"{r[0]:<8} {r[1]:<26} {r[2]:<16} "
              f"{r[3]:>8.4f} {r[4]:>8.4f} {r[5]:>8.4f}")


if __name__ == "__main__":
    main()
