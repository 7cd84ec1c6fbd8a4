"""CPU sweep of sector-table geometry: list-length stats vs (ns,
tile_size, block_half).

The dense sector sweep pays the per-orientation CAPACITY (global max
list) per ray; the batch-visited mean sets the sorted sweep's bound.
Both are driven by the angular wedge a list must cover: sector arc
(2*pi/ns) + 2*block_half (beam-block fan) + tile parallax (shrinks with
tile_size). This script builds a map's table across a parameter grid
and prints, per combo: capacity K (kv+kh), table MB, real list
mean/max, and the standard 4096-agent batch's visited mean — the data
for choosing a finer-routed sweep layout (e.g. 8-beam sublane blocks
that only need block_half ~0.02).

Usage: python scripts/sweep_geometry.py [map] [combos...]
  combo = ns:tile_size:block_half, e.g. 32:2.0:0.025
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

DEFAULT = ("16:2.0:0.285", "32:2.0:0.285", "32:2.0:0.15", "32:2.0:0.025",
           "64:2.0:0.025", "128:2.0:0.025", "64:1.0:0.025",
           "128:1.0:0.025", "32:1.0:0.025")


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    name = sys.argv[1] if len(sys.argv) > 1 else "berlin"
    combos = sys.argv[2:] or list(DEFAULT)
    from pyracecarsimulator_tpu.maps.loader import load_builtin
    from pyracecarsimulator_tpu.maps.sectors import build_sector_map

    A, B = 4096, 1080
    m = load_builtin(name)
    edf = np.asarray(m.edf)[: m.height, : m.width]
    rng = np.random.RandomState(0)
    ys, xs = np.where(edf > 0.3)
    kk = rng.randint(len(ys), size=A)
    X = (m.origin_x + (xs[kk] + .5) * m.resolution).astype(np.float32)
    Y = (m.origin_y + (ys[kk] + .5) * m.resolution).astype(np.float32)
    TH = rng.uniform(-np.pi, np.pi, A).astype(np.float32)

    for combo in combos:
        ns, ts, bh = combo.split(":")
        ns, ts, bh = int(ns), float(ts), float(bh)
        t0 = time.time()
        try:
            smap = build_sector_map(
                np.asarray(m.occupancy), m.resolution,
                (m.origin_x, m.origin_y), max_range=10.0, tile_size=ts,
                ns=ns, block_half=bh, real_hw=(m.height, m.width))
        except Exception as e:
            print(f"{combo}: build failed: {e!r}", flush=True)
            continue
        dt = time.time() - t0
        meta = np.asarray(smap.meta)
        real = meta[:, 0] + (meta[:, 2] - meta[:, 1])
        k_cap = smap.table.shape[2]
        mb = smap.table.nbytes / 1e6

        # visited stats for the standard batch: every (agent, block)
        # lookup a bb-block would do; bb implied by block_half
        spacing = (4.712388980384690 / (B - 1))
        bb = max(1, min(128, 2 * int(bh / spacing)))
        nblk = -(-B // bb)
        nr, nc = smap.tiles_shape
        tox, toy = smap.tile_origin
        ci = np.clip(((X - tox) / ts).astype(int), 0, nc - 1)
        ri = np.clip(((Y - toy) / ts).astype(int), 0, nr - 1)
        tid = ri * nc + ci
        offs = (np.arange(B) - (B - 1) / 2.0) * spacing
        mids = np.minimum(np.arange(nblk) * bb + bb // 2, B - 1)
        ang = TH[:, None] + offs[None, mids]
        th = np.mod(ang, 2 * np.pi)
        sec = np.clip((th * (ns / (2 * np.pi))).astype(int), 0, ns - 1)
        ids = (tid[:, None] * ns + sec).reshape(-1)
        n_of = real[ids]
        print(f"{combo}: build {dt:5.1f}s  bb={bb:3d} K={k_cap:4d} "
              f"(kv={smap.kv_sec}) table={mb:6.1f}MB  "
              f"real mean={real.mean():5.1f} p99={np.percentile(real, 99):5.0f} "
              f"max={real.max():4d}  visited mean={n_of.mean():5.1f} "
              f"p90={np.percentile(n_of, 90):4.0f} max={n_of.max():4d}",
              flush=True)


if __name__ == "__main__":
    main()
