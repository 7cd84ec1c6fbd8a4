"""Sector-culled dense segment raycast (XLA sweep + fused Pallas kernel).

Beams are grouped into angle-contiguous blocks of ``bb`` (default 128 =
one TPU lane register); each block intersects only its (tile, sector)
cull list from ``maps/sectors.py``. Same exact-boundary semantics as
``raycast_segments`` (culling is conservative; tests/test_sectors.py).

Two execution paths over the same tables:
  * XLA dense sweep: beam-minor layout — the (block, segment) intermediate
    puts BEAMS on lanes and segments on sublanes, so list capacity pads to
    the 8-sublane quantum instead of the 128-lane quantum. Work per ray is
    bound by the MAX list length (dense shapes).
  * Pallas kernel: one program per (agent, beam-block), segment block
    routed by scalar-prefetched ids (raycast_pallas._kernel_tiled), with
    per-list dynamic sweep bounds — work per ray is bound by the MEAN real
    list length, typically several x shorter than the max.

Both carry the analytic O(rays) VJP (raycast_grad._winner_vjp).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .raycast_segments import _ray_invs

_BIG = np.float32(3.0e38)
_TWO_PI = np.float32(2.0 * np.pi)


def _pad_beams(a, b_pad):
    """Pad the beam axis by edge replication (padded beams keep valid
    directions; their outputs are sliced off)."""
    if b_pad == 0:
        return a
    return jnp.concatenate(
        [a, jnp.broadcast_to(a[:, -1:], (a.shape[0], b_pad))], axis=1)


def _list_ids(tiles_shape, tile_size, tile_origin, ns, x0, y0, ct, st,
              bb: int):
    """(A,) agent positions + (A, B) beam directions -> (A, NBLK) int32
    rows into the (T*NS, ...) sector table. Block sector is read from one
    in-block beam within half-a-block of every real beam (maps/sectors.py
    coverage contract)."""
    a_n, b_n = ct.shape
    nblk = -(-b_n // bb)
    nr, nc = tiles_shape
    tox, toy = tile_origin
    ci = jnp.clip(((x0 - tox) / tile_size).astype(jnp.int32), 0, nc - 1)
    ri = jnp.clip(((y0 - toy) / tile_size).astype(jnp.int32), 0, nr - 1)
    tid = ri * nc + ci                                     # (A,)
    mids = np.minimum(np.arange(nblk) * bb + bb // 2, b_n - 1)
    th = jnp.arctan2(st[:, mids], ct[:, mids])             # (A, NBLK)
    th = jnp.mod(th, _TWO_PI)
    sec = jnp.clip((th * (ns / _TWO_PI)).astype(jnp.int32), 0, ns - 1)
    return tid[:, None] * ns + sec                         # (A, NBLK)


def _sweep_xla(table, kv_sec, ids, x, y, cos_t, sin_t, inv_c, inv_s,
               chunk: int):
    """Beam-minor dense sweep. Ray args are (A, NBLK, BB); ids (A, NBLK).
    Returns per-orientation minima (best_v, best_h), shaped (A, NBLK, BB).

    The (agent, block) axes are flattened to ONE major axis G before the
    sweep: with the 4D (A, NBLK, ck, BB) intermediates, a non-power-of-2
    NBLK cost 1.6x (measured v5e: 1080 beams/9 blocks 1.09e9 true rays/s
    vs 8 blocks 1.83e9 — XLA's layout handling of the odd middle dim);
    flattening leaves the odd factor on a single major dim.

    The cull rows are gathered ONCE per ray-block from the 2D-flattened
    (L, 4K) table view — one contiguous row per list — and the
    orientation chunks are static slices of the gathered buffer. The
    previous per-chunk 3D column-sliced takes were the sweep's dominant
    fixed cost (measured v5e, scripts/ablate_fixed.py: levine raw
    1.31e9 -> 2.37e9 rays/s from this change alone; a gather-free
    variant only reaches 2.53e9, so the 2D row gather itself is nearly
    free).
    """
    a_n, nblk, bb = jnp.shape(x)
    gdim = a_n * nblk
    flat = lambda v: v.reshape(gdim, bb)
    x, y, cos_t, sin_t, inv_c, inv_s = map(
        flat, (x, y, cos_t, sin_t, inv_c, inv_s))
    ids = ids.reshape(gdim)
    k = table.shape[2]
    g_all = jnp.take(table.reshape(table.shape[0], 4 * k), ids,
                     axis=0).reshape(gdim, 4, k)
    best_v = jnp.full((gdim, bb), _BIG)
    best_h = jnp.full((gdim, bb), _BIG)
    for lo_i, hi_i, vertical in ((0, kv_sec, True), (kv_sec, k, False)):
        best = best_v if vertical else best_h
        c0 = lo_i
        while c0 < hi_i:
            ck = min(chunk, hi_i - c0)
            g = g_all[:, :, c0:c0 + ck]
            # g: (G, 4, ck); beam-minor broadcast -> (G, ck, BB)
            p = g[:, 0, :, None]
            lo = g[:, 1, :, None]
            hi = g[:, 2, :, None]
            if vertical:
                t = (p - x[:, None, :]) * inv_c[:, None, :]
                a = y[:, None, :] + t * sin_t[:, None, :]
            else:
                t = (p - y[:, None, :]) * inv_s[:, None, :]
                a = x[:, None, :] + t * cos_t[:, None, :]
            valid = (t >= 0.0) & ((a - lo) * (hi - a) >= 0.0)
            best = jnp.minimum(
                best, jnp.min(jnp.where(valid, t, _BIG), axis=1))
            c0 += ck
        if vertical:
            best_v = best
        else:
            best_h = best
    unflat = lambda v: v.reshape(a_n, nblk, bb)
    return unflat(best_v), unflat(best_h)


def _fwd_impl(table, meta, tiles_shape, tile_size, tile_origin, ns, kv_sec,
              x0, y0, x, y, cos_t, sin_t, max_range, bb, chunk,
              use_pallas, interpret, grp):
    a_n, b_n = x.shape
    nblk = -(-b_n // bb)
    b_pad = nblk * bb - b_n
    ids = _list_ids(tiles_shape, tile_size, tile_origin, ns, x0, y0,
                    cos_t, sin_t, bb)
    inv_c, inv_s = _ray_invs(cos_t, sin_t)
    args = [_pad_beams(v, b_pad) for v in (x, y, cos_t, sin_t, inv_c,
                                           inv_s)]
    if use_pallas:
        from .raycast_pallas import _raycast_pallas_ids_grp_raw, LANES
        if bb % LANES:
            raise ValueError(
                f"the Pallas sector path needs bb to be a multiple of "
                f"{LANES} lanes (got bb={bb}); use the XLA path for "
                "smaller blocks")
        rows = bb // LANES
        flat = [v.reshape(a_n * nblk * rows, LANES) for v in args]
        ids_flat = ids.reshape(-1)
        if rows > 1:
            ids_flat = jnp.repeat(ids_flat, rows)
        bv, bh = _raycast_pallas_ids_grp_raw(ids_flat, meta, table,
                                             *flat, grp=grp,
                                             interpret=interpret)
        bv = bv.reshape(a_n, nblk * bb)[:, :b_n]
        bh = bh.reshape(a_n, nblk * bb)[:, :b_n]
    else:
        shaped = [v.reshape(a_n, nblk, bb) for v in args]
        bv, bh = _sweep_xla(table, kv_sec, ids, *shaped, chunk)
        bv = bv.reshape(a_n, -1)[:, :b_n]
        bh = bh.reshape(a_n, -1)[:, :b_n]
    r = jnp.minimum(jnp.minimum(bv, bh), max_range)
    isv = bv <= bh
    hit = jnp.minimum(bv, bh) < max_range
    return r, isv, hit


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 13, 14,
                                                    15, 16, 17, 18))
def raycast_sectors(table, meta, tiles_shape, tile_size, tile_origin,
                    ns, kv_sec, x0, y0, x, y, cos_t, sin_t,
                    max_range: float = 10.0, bb: int = 128,
                    chunk: int = 64, use_pallas: bool = False,
                    interpret: bool = False, grp: int = 8):
    """Differentiable sector-culled raycast; rays are (A, B).

    Values match ``raycast_all`` over the same boundary geometry (culling
    is conservative). ``table``/``meta``/``x0``/``y0`` receive zero
    cotangents; the VJP is the analytic O(rays) closed form.

    The caller must guarantee that every beam of a ``bb``-block lies
    within the map's ``block_half`` of the block's lookup beam (checked in
    ``scan_poses_sectors``, where beam spacing is known).
    """
    r, _, _ = _fwd_impl(table, meta, tiles_shape, tile_size, tile_origin,
                        ns, kv_sec, x0, y0, x, y, cos_t, sin_t, max_range,
                        bb, chunk, use_pallas, interpret, grp)
    return r


def _rs_fwd(table, meta, tiles_shape, tile_size, tile_origin, ns, kv_sec,
            x0, y0, x, y, cos_t, sin_t, max_range, bb, chunk, use_pallas,
            interpret, grp):
    r, isv, hit = _fwd_impl(table, meta, tiles_shape, tile_size,
                            tile_origin, ns, kv_sec, x0, y0, x, y, cos_t,
                            sin_t, max_range, bb, chunk, use_pallas,
                            interpret, grp)
    return r, (jnp.shape(table), jnp.shape(meta), jnp.shape(x0),
               r, isv, hit, cos_t, sin_t)


def _rs_bwd(tiles_shape, tile_size, tile_origin, ns, kv_sec, max_range,
            bb, chunk, use_pallas, interpret, grp, res, g):
    from .raycast_grad import _winner_vjp
    tshape, mshape, ashape, r, isv, hit, cos_t, sin_t = res
    gx, gy, gct, gst = _winner_vjp(r, isv, hit, cos_t, sin_t, g)
    z = jnp.zeros(ashape, jnp.float32)
    meta_ct = np.zeros(mshape, jax.dtypes.float0)
    return (jnp.zeros(tshape, jnp.float32), meta_ct, z, z, gx, gy,
            gct, gst)


raycast_sectors.defvjp(_rs_fwd, _rs_bwd)


def scan_poses_sectors(smap, poses, num_beams: int = 1080,
                       fov: float = 4.712388980384690, max_range=10.0,
                       theta_discretization: int = 0, bb=None,
                       use_pallas=None, interpret=None,
                       grp: int = 8) -> jnp.ndarray:
    """Full lidar scans for poses (..., 3) via the sector backend.

    ``use_pallas=None`` picks the XLA dense sweep everywhere — measured on
    TPU v5e (round 3, scripts/bench_sectors.py): berlin 4096x1080 sector
    XLA 1.82e8 rays/s fwd vs sector Pallas 4.3e7 (with bb=128 each kernel
    program owns a single (1, 128) ray block and a ~109-segment mean list,
    so program/DMA overhead dominates; the batched XLA sweep amortizes it).
    The Pallas route stays available for A/B and parity testing.
    """
    from .common import beam_angles, quantize_angles, apply_extent_mask
    if use_pallas is None:
        use_pallas = False
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # coverage contract: every real beam of a block within block_half of
    # the block's lookup beam (lookup sits <= bb/2 indices from any beam)
    spacing = fov / max(num_beams - 1, 1)
    if bb is None:
        # widest block the map's block_half supports, capped at one lane
        # register (128 = the flagship 1080-beam/270 deg block size)
        bb = max(1, min(128, 2 * int(smap.block_half / spacing)))
    need = (bb // 2) * spacing
    if need > smap.block_half:
        raise ValueError(
            f"beam blocks span +-{need:.3f} rad but the sector map was "
            f"built for block_half={smap.block_half:.3f}; rebuild the map "
            "with a larger block_half or use a smaller bb")
    # Generate the beam fan at the PADDED width (edge-replicated offsets):
    # padding six (A, B) ray arrays inside the raycast instead costs real
    # HBM copies every scan — measured 46% of the flagship ray budget
    # (docs/BOTTLENECK.md); padding the (B,) offset row is free.
    nblk = -(-num_beams // bb)
    b_pad = nblk * bb - num_beams
    poses = jnp.asarray(poses)
    batch = poses.shape[:-1]
    poses2 = poses.reshape(-1, 3)
    offs = beam_angles(num_beams, fov)
    if b_pad:
        offs = jnp.concatenate(
            [offs, jnp.broadcast_to(offs[-1:], (b_pad,))])
    ang = quantize_angles(poses2[:, 2:3] + offs[None, :],
                          theta_discretization)
    ct, st = jnp.cos(ang), jnp.sin(ang)
    xb = jnp.broadcast_to(poses2[:, 0:1], ang.shape)
    yb = jnp.broadcast_to(poses2[:, 1:2], ang.shape)
    r = raycast_sectors(
        smap.table, smap.meta, smap.tiles_shape, smap.tile_size,
        smap.tile_origin, smap.ns, smap.kv_sec, poses2[:, 0], poses2[:, 1],
        xb, yb, ct, st, max_range, bb, 64, bool(use_pallas),
        bool(interpret), int(grp))[:, :num_beams]
    r = apply_extent_mask(r, poses2[:, 0], poses2[:, 1], smap.extent,
                          max_range)
    return r.reshape(*batch, num_beams)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 8, 9))
def raycast_sectors_ids(table, meta, ids, kv_sec, x, y, cos_t, sin_t,
                        max_range: float = 10.0, chunk: int = 64):
    """Sector sweep over PRECOMPUTED list ids (multi-map serving path).

    ray args are (A, NBLK, BB); ``ids`` (A, NBLK) rows into ``table``.
    Same values/VJP as ``raycast_sectors`` — only the id routing differs
    (per-agent map offsets, maps/sectors.StackedSectorMap). Returns
    (A, NBLK*BB) clamped ranges.
    """
    from .raycast_segments import _ray_invs
    inv_c, inv_s = _ray_invs(cos_t, sin_t)
    bv, bh = _sweep_xla(table, kv_sec, ids, x, y, cos_t, sin_t, inv_c,
                        inv_s, chunk)
    a_n = x.shape[0]
    return jnp.minimum(jnp.minimum(bv, bh), max_range).reshape(a_n, -1)


def _rsi_fwd(table, meta, ids, kv_sec, x, y, cos_t, sin_t, max_range,
             chunk):
    from .raycast_segments import _ray_invs
    inv_c, inv_s = _ray_invs(cos_t, sin_t)
    bv, bh = _sweep_xla(table, kv_sec, ids, x, y, cos_t, sin_t, inv_c,
                        inv_s, chunk)
    a_n = x.shape[0]
    r = jnp.minimum(jnp.minimum(bv, bh), max_range).reshape(a_n, -1)
    isv = (bv <= bh).reshape(a_n, -1)
    hit = (jnp.minimum(bv, bh) < max_range).reshape(a_n, -1)
    return r, (jnp.shape(table), jnp.shape(meta), jnp.shape(ids),
               jnp.shape(x), r, isv, hit, cos_t, sin_t)


def _rsi_bwd(kv_sec, max_range, chunk, res, g):
    from .raycast_grad import _winner_vjp
    tshape, mshape, ishape, rshape, r, isv, hit, cos_t, sin_t = res
    gx, gy, gct, gst = _winner_vjp(
        r, isv, hit, cos_t.reshape(r.shape), sin_t.reshape(r.shape), g)
    f0 = lambda s: np.zeros(s, jax.dtypes.float0)
    return (jnp.zeros(tshape, jnp.float32), f0(mshape), f0(ishape),
            gx.reshape(rshape), gy.reshape(rshape), gct.reshape(rshape),
            gst.reshape(rshape))


raycast_sectors_ids.defvjp(_rsi_fwd, _rsi_bwd)


def scan_poses_sectors_multi(stack, map_ids, poses, num_beams: int = 1080,
                             fov: float = 4.712388980384690,
                             max_range=10.0, theta_discretization: int = 0,
                             bb=None) -> jnp.ndarray:
    """Multi-track batched scan: agent i scans on map ``map_ids[i]``.

    ``stack``: maps/sectors.StackedSectorMap. One fused sweep serves the
    whole agent batch across all stacked tracks — per-agent map routing is
    a handful of O(agents) scalar gathers on top of the single-map path.
    """
    from .common import beam_angles, quantize_angles
    spacing = fov / max(num_beams - 1, 1)
    if bb is None:
        bb = max(1, min(128, 2 * int(stack.block_half / spacing)))
    need = (bb // 2) * spacing
    if need > stack.block_half:
        raise ValueError(
            f"beam blocks span +-{need:.3f} rad but the stacked maps were "
            f"built for block_half={stack.block_half:.3f}")
    nblk = -(-num_beams // bb)
    b_pad = nblk * bb - num_beams
    poses = jnp.asarray(poses)
    batch = poses.shape[:-1]
    poses2 = poses.reshape(-1, 3)
    mid = jnp.asarray(map_ids, jnp.int32).reshape(-1)
    offs = beam_angles(num_beams, fov)
    if b_pad:
        offs = jnp.concatenate(
            [offs, jnp.broadcast_to(offs[-1:], (b_pad,))])
    ang = quantize_angles(poses2[:, 2:3] + offs[None, :],
                          theta_discretization)
    ct, st = jnp.cos(ang), jnp.sin(ang)
    a_n = poses2.shape[0]
    xb = jnp.broadcast_to(poses2[:, 0:1], ang.shape)
    yb = jnp.broadcast_to(poses2[:, 1:2], ang.shape)
    # per-agent map geometry (O(agents) scalar gathers)
    g = jnp.take(stack.grids, mid, axis=0)          # [nr, nc, tox, toy]
    base = jnp.take(stack.offsets, mid)             # (A,)
    nr = g[:, 0].astype(jnp.int32)
    nc = g[:, 1].astype(jnp.int32)
    ci = jnp.clip(((poses2[:, 0] - g[:, 2]) / stack.tile_size)
                  .astype(jnp.int32), 0, nc - 1)
    ri = jnp.clip(((poses2[:, 1] - g[:, 3]) / stack.tile_size)
                  .astype(jnp.int32), 0, nr - 1)
    tid = ri * nc + ci
    mids = np.minimum(np.arange(nblk) * bb + bb // 2, num_beams - 1)
    th = jnp.mod(jnp.arctan2(st[:, mids], ct[:, mids]), _TWO_PI)
    sec = jnp.clip((th * (stack.ns / _TWO_PI)).astype(jnp.int32), 0,
                   stack.ns - 1)
    ids = (base + tid * stack.ns)[:, None] + sec    # (A, NBLK)
    shp = (a_n, nblk, bb)
    r = raycast_sectors_ids(
        stack.table, stack.meta, ids, stack.kv_sec, xb.reshape(shp),
        yb.reshape(shp), ct.reshape(shp), st.reshape(shp), max_range,
        64)[:, :num_beams]
    # per-agent extent mask (reference out-of-map => max_range)
    e = jnp.take(stack.extents, mid, axis=0)
    inside = ((poses2[:, 0] >= e[:, 0]) & (poses2[:, 0] < e[:, 1])
              & (poses2[:, 1] >= e[:, 2]) & (poses2[:, 1] < e[:, 3]))
    r = jnp.where(inside[:, None], r, max_range)
    return r.reshape(*batch, num_beams)
