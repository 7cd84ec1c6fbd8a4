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
    try:   # persistent compile cache (the TPU compiles dominate wall time)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp
    from pyracecarsimulator_tpu.maps import load_builtin, sample_free_poses
    from pyracecarsimulator_tpu.maps.segments import (
        build_segment_map, extract_segments, pad_segments,
        raycast_segments_numpy)
    from pyracecarsimulator_tpu.maps.contours import build_general_segment_map
    from pyracecarsimulator_tpu.maps.sectors import build_sector_map
    from pyracecarsimulator_tpu.ops.raymarch_xla import scan_poses
    from pyracecarsimulator_tpu.ops.raymarch_diff import scan_poses_implicit
    from pyracecarsimulator_tpu.ops.raycast_segments import (
        scan_poses_segments)
    from pyracecarsimulator_tpu.ops.raycast_general import scan_poses_general
    from pyracecarsimulator_tpu.ops.raycast_pallas import (
        raycast_pallas, scan_poses_pallas)
    from pyracecarsimulator_tpu.ops.raycast_sectors import scan_poses_sectors
    from pyracecarsimulator_tpu.ops.common import rays_from_poses
    from pyracecarsimulator_tpu.oracle.raycast import scan_batch
    interp = jax.default_backend() == "cpu"    # compiled kernels on TPU

    B = args.beams
    rows = []
    grows = []
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
        smap = build_sector_map(np.asarray(t.occupancy), t.resolution, org,
                                max_range=10.0, tile_size=2.0, ns=16,
                                real_hw=bounds)
        jp = jnp.asarray(poses)
        backends = {
            "edf march (XLA)": np.asarray(scan_poses(
                t.edf, t.resolution, jnp.asarray(org), jp, num_beams=B,
                max_iters=200, bounds_hw=bounds)),
            "segments exact (XLA)": np.asarray(scan_poses_segments(
                sm, jp, num_beams=B)),
            "segments exact (Pallas)": np.asarray(raycast_pallas(
                sm.params, sm.sweep_meta, xb, yb, ct, st, 10.0, interp)),
            "sectors exact (XLA)": np.asarray(scan_poses_sectors(
                smap, jp, num_beams=B)),
            "sectors exact (sorted sweep)": np.asarray(scan_poses_sectors(
                smap, jp, num_beams=B, mode="sorted")),
            "simplified tol=1 (XLA)": np.asarray(scan_poses_general(
                gm, jp, num_beams=B)),
            "edf implicit (XLA)": np.asarray(scan_poses_implicit(
                t.edf, t.resolution, jnp.asarray(org), jp, num_beams=B,
                max_iters=256, bounds_hw=bounds)),
        }
        # kernel rows that need the flagship 1080-beam geometry: the
        # Pallas sector route requires 128-beam blocks within block_half,
        # and the tiled kernel only exists where culling tables do
        o_geom_1080 = None
        if jax.default_backend() != "cpu" or True:
            _, _, xb18, yb18, ct18, st18 = rays_from_poses(
                jp, 1080, 4.712388980384690)
            o_geom_1080 = raycast_segments_numpy(
                pad_segments(segs), np.asarray(xb18).ravel(),
                np.asarray(yb18).ravel(), np.asarray(ct18).ravel(),
                np.asarray(st18).ravel(), 10.0).reshape(args.poses, 1080)
            backends_1080 = {
                "sectors exact (Pallas, 1080b)": np.asarray(
                    scan_poses_sectors(smap, jp, num_beams=1080,
                                       use_pallas=True, interpret=interp)),
                "segments exact (Pallas full/tiled, 1080b)": np.asarray(
                    scan_poses_pallas(sm, jp, num_beams=1080,
                                      interpret=interp)),
                "sectors exact (sorted-tile kernel, 1080b)": np.asarray(
                    scan_poses_sectors(smap, jp, num_beams=1080,
                                       mode="sorted_pl@128",
                                       interpret=interp)),
            }
            if smap.table_ck is not None:
                backends_1080["sectors exact (fused kernel, 1080b)"] = \
                    np.asarray(scan_poses_sectors(
                        smap, jp, num_beams=1080, mode="sorted_plf@128",
                        interpret=interp))
        oracles = {"edf march (XLA)": ("DT-march oracle", o_march),
                   "segments exact (XLA)": ("geometry oracle", o_geom),
                   "segments exact (Pallas)": ("geometry oracle", o_geom),
                   "sectors exact (XLA)": ("geometry oracle", o_geom),
                   "sectors exact (sorted sweep)": ("geometry oracle",
                                                    o_geom),
                   "simplified tol=1 (XLA)": ("geometry oracle", o_geom),
                   "edf implicit (XLA)": ("geometry oracle", o_geom)}
        for bname, r in backends.items():
            oname, o = oracles[bname]
            d = np.abs(r - o)
            rows.append((name, bname, oname, d.mean(), q(d, 0.99), d.max()))
        for bname, r in backends_1080.items():
            d = np.abs(r - o_geom_1080)
            rows.append((name, bname, "geometry oracle",
                         d.mean(), q(d, 0.99), d.max()))

        # cross-semantics: march vs geometry (documents corner tunneling)
        d = np.abs(o_march - o_geom)
        rows.append((name, "DT-march oracle", "geometry oracle",
                     d.mean(), q(d, 0.99), d.max()))

        # gradient parity: pose cotangents of every exact fast path vs the
        # dense analytic VJP (BASELINE.json "grad allclose" gate)
        from pyracecarsimulator_tpu.ops.raycast_grad import raycast_all_diff
        from pyracecarsimulator_tpu.ops.raycast_sectors import (
            raycast_sectors)
        from pyracecarsimulator_tpu.ops.raycast_pallas import (
            raycast_pallas as rp)

        def g_of(fn):
            return np.stack([np.asarray(a) for a in jax.grad(
                lambda xb_, yb_, ct_, st_: jnp.sum(fn(xb_, yb_, ct_, st_)),
                argnums=(0, 1, 2, 3))(xb, yb, ct, st)])

        g_ref = g_of(lambda a, b, c, d: raycast_all_diff(
            sm.params, a, b, c, d, 10.0, 1024, sm.kv))
        bb = max(1, min(128, 2 * int(smap.block_half
                                     / (4.712388980384690 / (B - 1)))))
        g_sec = g_of(lambda a, b, c, d: raycast_sectors(
            smap.table, smap.meta, smap.tiles_shape, smap.tile_size,
            smap.tile_origin, smap.ns, smap.kv_sec, p2[:, 0], p2[:, 1],
            a, b, c, d, 10.0, bb, 64, False, False))
        g_pal = g_of(lambda a, b, c, d: rp(
            sm.params, sm.sweep_meta, a, b, c, d, 10.0, interp))
        grows.append((name, "sectors vs dense VJP",
                      float(np.abs(g_sec - g_ref).max())))
        grows.append((name, "pallas vs dense VJP",
                      float(np.abs(g_pal - g_ref).max())))

    import jax as _jax
    print(f"device: {_jax.devices()[0]}  backend: {_jax.default_backend()}")
    print(f"{'map':<8} {'backend':<42} {'oracle':<16} "
          f"{'mean':>8} {'p99':>8} {'max':>8}")
    for r in rows:
        print(f"{r[0]:<8} {r[1]:<42} {r[2]:<16} "
              f"{r[3]:>8.4f} {r[4]:>8.4f} {r[5]:>8.4f}")
    print()
    print(f"{'map':<8} {'gradient check (pose cotangents)':<42} "
          f"{'max|d|':>10}")
    for g in grows:
        print(f"{g[0]:<8} {g[1]:<42} {g[2]:>10.2e}")


if __name__ == "__main__":
    main()
