"""Angular-sector culling tables for the dense segment raycast.

Why: on curvy maps (berlin-class) the exact boundary is a staircase of
thousands of tiny segments; per-*tile* culling (segments.py) still leaves
~1.3k segments within lidar reach of every tile, and the dense sweep pays
for ALL of them on EVERY ray. But a single ray only ever hits segments in
its own direction — and lidar beams are sorted by angle, so a contiguous
block of beams spans a narrow angular wedge. This module compiles, per
(map tile, angular sector), the list of segments VISIBLE from anywhere in
the tile in directions within that sector (padded by the beam-block
half-width and by parallax). At scan time each 128-beam block intersects
only its own (tile, sector) list: ~2x fewer pairs/ray for the dense XLA
sweep (max-count bound) and ~5-10x for the Pallas kernel (mean-count
bound, via per-list dynamic sweep bounds).

Semantics: IDENTICAL to the exact `segments` backend — culling is
conservative (a segment is dropped for a block only if no ray of that
block, from any origin in the tile, can point at it). Proof obligation per
segment: the set of directions from origin o to segment points is an arc;
over all o within tile-radius ``rt`` of the tile center it is contained in
the center's arc padded by ``asin(rt / d)`` (d = center-to-segment
distance); blocks assigned to sector s only contain beams within
``block_half`` of a direction inside s. Tested against the geometric
oracle in tests/test_sectors.py.

No reference equivalent (the reference raycaster is a sequential DT march,
SURVEY.md §3.3); this is TPU-native acceleration structure in the CDDT
lineage (precompute per-heading structure; arXiv:1705.01167, PAPERS.md) —
re-designed dense because TPUs trade random access for vector math.

Host-side init-time NumPy, like the reference's EDT precompute.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .segments import extract_segments, _FAR

_SUB = 8  # sublane quantum: the Pallas sweep loads SEG_BLK=8 segment rows


def _align(n: int, q: int = _SUB) -> int:
    return max(q, ((n + q - 1) // q) * q)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SectorSegmentMap:
    """Per-(tile, sector) culled segment lists (exact-boundary geometry).

    ``table``: (T*NS, 4, K) float32 — rows [p, lo, hi, is_vertical]; each
    list is V-block | H-block, independently padded with never-hit
    sentinels (segments.pad_segments convention) to the static split
    ``kv_sec`` / ``K - kv_sec``.
    ``meta``: (T*NS, 3) int32 — [n_v, h_lo, h_end] real-segment sweep
    bounds per list (raycast_pallas._sweep_rows convention), a LEAF so
    obstacle rebuilds with different counts reuse compiled kernels.
    """

    table: Any                       # (T*NS, 4, K)
    meta: Any                        # (T*NS, 3) int32
    n_segments: int
    ns: int = 16                     # angular sectors per full circle
    kv_sec: int = 0                  # static V/H split inside each list
    block_half: float = 0.285        # max supported beam-block half-width
    tile_size: float = 0.0
    tiles_shape: Tuple[int, int] = (0, 0)
    tile_origin: Tuple[float, float] = (0.0, 0.0)
    extent: Tuple[float, float, float, float] = (-_FAR, _FAR, -_FAR, _FAR)

    def tree_flatten(self):
        return (self.table, self.meta, self.n_segments), (
            self.ns, self.kv_sec, self.block_half, self.tile_size,
            self.tiles_shape, self.tile_origin, self.extent)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        table, meta, n = leaves
        ns, kv, bh, ts, tshape, torg, ext = aux
        return cls(table=table, meta=meta, n_segments=n, ns=ns, kv_sec=kv,
                   block_half=bh, tile_size=ts, tiles_shape=tshape,
                   tile_origin=torg, extent=ext)


def _seg_endpoints(segs: np.ndarray):
    p, lo, hi, isv = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3] > 0.5
    ax = np.where(isv, p, lo)
    ay = np.where(isv, lo, p)
    bx = np.where(isv, p, hi)
    by = np.where(isv, hi, p)
    return ax, ay, bx, by


def _seg_point_distance(segs: np.ndarray, cx: float, cy: float):
    p, lo, hi, isv = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3] > 0.5
    along = np.where(isv, cy, cx)
    perp = np.where(isv, cx, cy)
    d_along = np.maximum(np.maximum(lo - along, along - hi), 0.0)
    return np.hypot(d_along, np.abs(perp - p))


def build_sector_map(occupancy: np.ndarray, resolution: float,
                     origin_xy=(0.0, 0.0), occupied_thresh: float = 0.5,
                     max_range: float = 10.0, tile_size: float = 2.0,
                     ns: int = 16, block_half: float = 0.285,
                     k_sec: int = 0, real_hw=None) -> SectorSegmentMap:
    """Compile the occupancy boundary into per-(tile, sector) cull lists.

    Args:
      tile_size: spatial tile edge (meters). Smaller tiles shrink the
        parallax pad (tighter lists) but grow the table linearly.
      ns: angular sectors over the full circle.
      block_half: the largest beam-block angular half-width (radians) the
        runtime may use with this map; lists are padded to cover it. The
        default 0.285 covers 128-beam blocks of the flagship 1080-beam /
        270 deg scan (half-width 0.277) with margin.
      k_sec: optional per-orientation capacity override (obstacle-rebuild
        shape stability, cf. segments.build_segment_map k_tile). 0 = auto.
    """
    segs = extract_segments(occupancy, resolution, origin_xy,
                            occupied_thresh)
    if len(segs) == 0:
        raise ValueError("map has no boundary segments")
    rh, rw = real_hw if real_hw is not None else occupancy.shape
    ox, oy = float(origin_xy[0]), float(origin_xy[1])
    extent = (ox, ox + rw * resolution, oy, oy + rh * resolution)

    h, w = occupancy.shape
    nc = int(np.ceil(w * resolution / tile_size))
    nr = int(np.ceil(h * resolution / tile_size))
    rt = tile_size * np.sqrt(2.0) / 2.0 + 2.0 * resolution
    reach = max_range + rt
    wsec = 2.0 * np.pi / ns

    ax, ay, bx, by = _seg_endpoints(segs)
    sec_starts = np.arange(ns) * wsec

    lists_v, lists_h = [], []
    kv_need = kh_need = 0
    for r in range(nr):
        for c in range(nc):
            cx = ox + (c + 0.5) * tile_size
            cy = oy + (r + 0.5) * tile_size
            d = _seg_point_distance(segs, cx, cy)
            near = d <= reach
            th1 = np.arctan2(ay - cy, ax - cx)
            th2 = np.arctan2(by - cy, bx - cx)
            # short-way arc between endpoint directions (width < pi: the
            # segment lies on one side of any external viewpoint)
            diff = np.mod(th2 - th1, 2.0 * np.pi)
            flip = diff > np.pi
            arc_lo = np.where(flip, th2, th1)
            width = np.where(flip, 2.0 * np.pi - diff, diff)
            par = np.arcsin(np.minimum(1.0, rt / np.maximum(d, 1e-9)))
            pad = par + block_half + 1e-3
            full = (d <= rt) | (width + 2.0 * pad >= 2.0 * np.pi - wsec)
            lo_pad = arc_lo - pad
            span = width + 2.0 * pad
            # sector s = [s*wsec, (s+1)*wsec) intersects the padded arc iff
            # its start lands inside the arc (mod 2pi) or within wsec before
            rel = np.mod(sec_starts[None, :] - lo_pad[:, None], 2.0 * np.pi)
            memb = ((rel <= span[:, None]) | (rel >= 2.0 * np.pi - wsec)
                    | full[:, None]) & near[:, None]
            for s in range(ns):
                sub = segs[memb[:, s]]
                v = sub[sub[:, 3] > 0.5]
                hseg = sub[sub[:, 3] <= 0.5]
                lists_v.append(v)
                lists_h.append(hseg)
                kv_need = max(kv_need, len(v))
                kh_need = max(kh_need, len(hseg))

    kv_sec = _align(k_sec // 2 if k_sec > 0 else kv_need)
    kh_sec = _align(k_sec - k_sec // 2 if k_sec > 0 else kh_need)

    def _pad_group(group, kp, isv):
        if len(group) > kp:
            raise ValueError(
                f"k_sec too small: a (tile, sector) list needs {len(group)} "
                f"{'V' if isv else 'H'} segments but the block holds {kp}; "
                "raise k_sec or leave it 0 (auto) - silent truncation would "
                "punch invisible holes in walls")
        blk = np.zeros((kp, 4), np.float64)
        blk[:, 0] = _FAR          # never-hit sentinel (segments.pad_segments)
        blk[:, 1] = 1.0
        blk[:, 2] = -1.0
        blk[:, 3] = 1.0 if isv else 0.0
        blk[: len(group)] = group
        return blk

    tnl = len(lists_v)
    table = np.zeros((tnl, kv_sec + kh_sec, 4), np.float32)
    meta = np.zeros((tnl, 3), np.int32)
    for i, (v, hseg) in enumerate(zip(lists_v, lists_h)):
        table[i, :kv_sec] = _pad_group(v, kv_sec, True)
        table[i, kv_sec:] = _pad_group(hseg, kh_sec, False)
        meta[i] = (len(v), kv_sec, kv_sec + len(hseg))

    # contiguous f32 on host BEFORE the device put: a (T*NS, K, 4) f64
    # transpose costs a 2x transfer + device-side convert over the tunnel
    table = np.ascontiguousarray(table.transpose(0, 2, 1), np.float32)
    return SectorSegmentMap(
        table=jnp.asarray(table),
        meta=jnp.asarray(meta),
        n_segments=len(segs), ns=ns, kv_sec=kv_sec,
        block_half=float(block_half), tile_size=float(tile_size),
        tiles_shape=(nr, nc), tile_origin=(ox, oy), extent=extent)
