"""Dense raycast against general (arbitrary-direction) segments.

Companion to ``maps/contours.py``: simplified boundary polylines produce
segments at any angle, so the axis-aligned specialization of
``raycast_segments.py`` no longer applies. Same dense zero-gather design;
~1.5x more math per (ray, segment) pair, repaid many times over by the
5-10x segment-count reduction on curvy maps.

Math per pair (p0 = segment start, e = unit direction, L = length,
n = (-ey, ex) the normal):
    t = ((p0 - o) . n) / (u . n)        range along the ray
    s = ((o + t u) - p0) . e            position along the segment
    valid = t >= 0 and 0 <= s <= L and (u . n) != 0

Custom VJP: with w = n/(u.n) of the winning segment saved, the backward is
closed-form and elementwise (cf. raycast_grad.py):
    dr/do  = -w
    dr/du  = -t w          (chain to theta via cos/sin outside)
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .raycast_segments import _fit_chunk

_BIG = np.float32(3.0e38)


def _fwd_general(seg_params, x, y, cos_t, sin_t, max_range, chunk):
    """seg_params: (6, K) [p0x, p0y, ex, ey, L, pad]. Returns
    (ranges, wx_win, wy_win, hit)."""
    k = seg_params.shape[1]
    chunk = _fit_chunk(k, chunk)
    chunks = seg_params.reshape(6, k // chunk, chunk).transpose(1, 0, 2)

    def body(carry, seg):
        best_t, best_wx, best_wy = carry
        p0x, p0y, ex, ey, L = seg[0], seg[1], seg[2], seg[3], seg[4]
        nx, ny = -ey, ex
        denom = cos_t[..., None] * nx + sin_t[..., None] * ny
        d_safe = jnp.where(denom == 0.0, 1e-30, denom)
        t = ((p0x - x[..., None]) * nx + (p0y - y[..., None]) * ny) / d_safe
        hx = x[..., None] + t * cos_t[..., None] - p0x
        hy = y[..., None] + t * sin_t[..., None] - p0y
        s = hx * ex + hy * ey
        valid = (t >= 0.0) & (s >= 0.0) & (s <= L) & (denom != 0.0)
        t = jnp.where(valid, t, _BIG)
        tmin = jnp.min(t, axis=-1)
        # winner attributes via tie-max select (gather-free; at an exact
        # corner tie wx/wy may mix two tied lanes — a measure-zero
        # subgradient ambiguity, same caveat as raycast_grad.py)
        m = t == tmin[..., None]
        wx_win = jnp.max(jnp.where(m, nx / d_safe, -_BIG), axis=-1)
        wy_win = jnp.max(jnp.where(m, ny / d_safe, -_BIG), axis=-1)
        upd = tmin < best_t
        return (jnp.where(upd, tmin, best_t),
                jnp.where(upd, wx_win, best_wx),
                jnp.where(upd, wy_win, best_wy)), None

    init = (jnp.full(jnp.shape(x), _BIG),
            jnp.zeros(jnp.shape(x), jnp.float32),
            jnp.zeros(jnp.shape(x), jnp.float32))
    (best_t, wx, wy), _ = jax.lax.scan(body, init, chunks)
    hit = best_t < max_range
    return jnp.minimum(best_t, max_range), wx, wy, hit


def _fwd_general_plain(seg_params, x, y, cos_t, sin_t, max_range, chunk):
    """Cheap forward: min only, no winner tracking (runs outside autodiff)."""
    k = seg_params.shape[1]
    chunk = _fit_chunk(k, chunk)
    chunks = seg_params.reshape(6, k // chunk, chunk).transpose(1, 0, 2)

    def body(best_t, seg):
        p0x, p0y, ex, ey, L = seg[0], seg[1], seg[2], seg[3], seg[4]
        nx, ny = -ey, ex
        denom = cos_t[..., None] * nx + sin_t[..., None] * ny
        d_safe = jnp.where(denom == 0.0, 1e-30, denom)
        t = ((p0x - x[..., None]) * nx + (p0y - y[..., None]) * ny) / d_safe
        hx = x[..., None] + t * cos_t[..., None] - p0x
        hy = y[..., None] + t * sin_t[..., None] - p0y
        s = hx * ex + hy * ey
        valid = (t >= 0.0) & (s >= 0.0) & (s <= L) & (denom != 0.0)
        t = jnp.where(valid, t, _BIG)
        return jnp.minimum(best_t, jnp.min(t, axis=-1)), None

    init = jnp.full(jnp.shape(x), _BIG)
    best_t, _ = jax.lax.scan(body, init, chunks)
    return jnp.minimum(best_t, max_range)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def raycast_general(seg_params, x, y, cos_t, sin_t,
                    max_range=10.0, chunk: int = 512):
    """Differentiable raycast vs general segments (analytic O(rays) VJP).
    Winner tracking runs only under autodiff (custom_vjp fwd rule)."""
    return _fwd_general_plain(seg_params, x, y, cos_t, sin_t, max_range,
                              chunk)


def _rg_fwd(seg_params, x, y, cos_t, sin_t, max_range, chunk):
    r, wx, wy, hit = _fwd_general(seg_params, x, y, cos_t, sin_t,
                                  max_range, chunk)
    return r, (jnp.shape(seg_params), r, wx, wy, hit)


def _rg_bwd(max_range, chunk, res, g):
    shape, r, wx, wy, hit = res
    wx = jnp.where(hit, wx, 0.0)
    wy = jnp.where(hit, wy, 0.0)
    gx = -g * wx
    gy = -g * wy
    gct = -g * r * wx
    gst = -g * r * wy
    return jnp.zeros(shape, jnp.float32), gx, gy, gct, gst


raycast_general.defvjp(_rg_fwd, _rg_bwd)


def raycast_general_numpy(segs: np.ndarray, x, y, cos_t, sin_t,
                          max_range: float) -> np.ndarray:
    """NumPy oracle for the general-segment raycast. segs: (K, 6)."""
    x = np.atleast_1d(np.asarray(x, np.float64))
    y, cos_t, sin_t = (np.broadcast_to(np.asarray(a, np.float64), x.shape)
                       for a in (y, cos_t, sin_t))
    p0x, p0y, ex, ey, L = (segs[:, i] for i in range(5))
    nx, ny = -ey, ex
    with np.errstate(divide="ignore", invalid="ignore"):
        denom = cos_t[:, None] * nx + sin_t[:, None] * ny
        t = ((p0x - x[:, None]) * nx + (p0y - y[:, None]) * ny) / denom
        hx = x[:, None] + t * cos_t[:, None] - p0x
        hy = y[:, None] + t * sin_t[:, None] - p0y
        s = hx * ex + hy * ey
    valid = (t >= 0) & (s >= 0) & (s <= L) & np.isfinite(t) & (denom != 0)
    t = np.where(valid, t, np.inf)
    return np.minimum(t.min(axis=1), max_range)


def _fwd_general_tiled(tiles, tiles_shape, tile_size, tile_origin,
                       x0, y0, x, y, cos_t, sin_t, max_range, chunk):
    """Tile-culled variant. tiles: (T, 6, K_tile); rays (A, B)."""
    nr, nc = tiles_shape
    tox, toy = tile_origin
    ci = jnp.clip(((x0 - tox) / tile_size).astype(jnp.int32), 0, nc - 1)
    ri = jnp.clip(((y0 - toy) / tile_size).astype(jnp.int32), 0, nr - 1)
    agent_segs = jnp.take(tiles, ri * nc + ci, axis=0)   # (A, 6, K_tile)
    k = tiles.shape[2]
    chunk = _fit_chunk(k, chunk)
    ch = agent_segs.reshape(x0.shape[0], 6, k // chunk, chunk)
    ch = ch.transpose(2, 0, 1, 3)                        # (n, A, 6, KC)

    def body(carry, seg):
        best_t, best_wx, best_wy = carry
        get = lambda i: seg[:, i][:, None, :]            # (A, 1, KC)
        p0x, p0y, ex, ey, L = get(0), get(1), get(2), get(3), get(4)
        nx, ny = -ey, ex
        denom = cos_t[..., None] * nx + sin_t[..., None] * ny
        d_safe = jnp.where(denom == 0.0, 1e-30, denom)
        t = ((p0x - x[..., None]) * nx + (p0y - y[..., None]) * ny) / d_safe
        hx = x[..., None] + t * cos_t[..., None] - p0x
        hy = y[..., None] + t * sin_t[..., None] - p0y
        s = hx * ex + hy * ey
        valid = (t >= 0.0) & (s >= 0.0) & (s <= L) & (denom != 0.0)
        t = jnp.where(valid, t, _BIG)
        tmin = jnp.min(t, axis=-1)
        m = t == tmin[..., None]
        wx_win = jnp.max(jnp.where(m, nx / d_safe, -_BIG), axis=-1)
        wy_win = jnp.max(jnp.where(m, ny / d_safe, -_BIG), axis=-1)
        upd = tmin < best_t
        return (jnp.where(upd, tmin, best_t),
                jnp.where(upd, wx_win, best_wx),
                jnp.where(upd, wy_win, best_wy)), None

    init = (jnp.full(jnp.shape(x), _BIG),
            jnp.zeros(jnp.shape(x), jnp.float32),
            jnp.zeros(jnp.shape(x), jnp.float32))
    (best_t, wx, wy), _ = jax.lax.scan(body, init, ch)
    hit = best_t < max_range
    return jnp.minimum(best_t, max_range), wx, wy, hit


def _fwd_general_tiled_plain(tiles, tiles_shape, tile_size, tile_origin,
                             x0, y0, x, y, cos_t, sin_t, max_range,
                             chunk):
    nr, nc = tiles_shape
    tox, toy = tile_origin
    ci = jnp.clip(((x0 - tox) / tile_size).astype(jnp.int32), 0, nc - 1)
    ri = jnp.clip(((y0 - toy) / tile_size).astype(jnp.int32), 0, nr - 1)
    agent_segs = jnp.take(tiles, ri * nc + ci, axis=0)
    k = tiles.shape[2]
    chunk = _fit_chunk(k, chunk)
    ch = agent_segs.reshape(x0.shape[0], 6, k // chunk, chunk)
    ch = ch.transpose(2, 0, 1, 3)

    def body(best_t, seg):
        get = lambda i: seg[:, i][:, None, :]
        p0x, p0y, ex, ey, L = get(0), get(1), get(2), get(3), get(4)
        nx, ny = -ey, ex
        denom = cos_t[..., None] * nx + sin_t[..., None] * ny
        d_safe = jnp.where(denom == 0.0, 1e-30, denom)
        t = ((p0x - x[..., None]) * nx + (p0y - y[..., None]) * ny) / d_safe
        hx = x[..., None] + t * cos_t[..., None] - p0x
        hy = y[..., None] + t * sin_t[..., None] - p0y
        s = hx * ex + hy * ey
        valid = (t >= 0.0) & (s >= 0.0) & (s <= L) & (denom != 0.0)
        t = jnp.where(valid, t, _BIG)
        return jnp.minimum(best_t, jnp.min(t, axis=-1)), None

    init = jnp.full(jnp.shape(x), _BIG)
    best_t, _ = jax.lax.scan(body, init, ch)
    return jnp.minimum(best_t, max_range)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 10, 11))
def raycast_general_tiled(tiles, tiles_shape, tile_size, tile_origin,
                          x0, y0, x, y, cos_t, sin_t,
                          max_range=10.0, chunk: int = 512):
    """Tile-culled differentiable general-segment raycast (cheap forward
    outside autodiff)."""
    return _fwd_general_tiled_plain(tiles, tiles_shape, tile_size,
                                    tile_origin, x0, y0, x, y, cos_t,
                                    sin_t, max_range, chunk)


def _rgt_fwd(tiles, tiles_shape, tile_size, tile_origin,
             x0, y0, x, y, cos_t, sin_t, max_range, chunk):
    r, wx, wy, hit = _fwd_general_tiled(
        tiles, tiles_shape, tile_size, tile_origin, x0, y0, x, y,
        cos_t, sin_t, max_range, chunk)
    return r, (jnp.shape(tiles), jnp.shape(x0), r, wx, wy, hit)


def _rgt_bwd(tiles_shape, tile_size, tile_origin, max_range, chunk,
             res, g):
    tshape, ashape, r, wx, wy, hit = res
    wx = jnp.where(hit, wx, 0.0)
    wy = jnp.where(hit, wy, 0.0)
    z = jnp.zeros(ashape, jnp.float32)
    return (jnp.zeros(tshape, jnp.float32), z, z,
            -g * wx, -g * wy, -g * r * wx, -g * r * wy)


raycast_general_tiled.defvjp(_rgt_fwd, _rgt_bwd)


def scan_poses_general(gmap, poses, num_beams: int = 1080,
                       fov: float = 4.712388980384690, max_range=10.0,
                       theta_discretization: int = 0,
                       use_tiles: bool = True) -> jnp.ndarray:
    """Full lidar scans via the simplified-geometry backend.

    Mirrors raycast_segments.scan_poses_segments (same semantics contract
    plus the tol_cells geometric tolerance of maps/contours.py).
    """
    from .common import rays_from_poses, apply_extent_mask
    batch, poses2, xb, yb, ct, st = rays_from_poses(
        poses, num_beams, fov, theta_discretization)
    if use_tiles and gmap.tiles is not None:
        r = raycast_general_tiled(gmap.tiles, gmap.tiles_shape,
                                  gmap.tile_size, gmap.tile_origin,
                                  poses2[:, 0], poses2[:, 1],
                                  xb, yb, ct, st, max_range)
    else:
        r = raycast_general(gmap.params, xb, yb, ct, st, max_range)
    r = apply_extent_mask(r, poses2[:, 0], poses2[:, 1], gmap.extent,
                          max_range)
    return r.reshape(*batch, num_beams)
