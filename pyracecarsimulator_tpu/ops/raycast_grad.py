"""Analytic custom-VJP segment raycast — O(rays) backward pass.

Plain autodiff of the dense min-intersection (raycast_segments.py) replays
the full (rays x segments) comparison in the backward pass. But the range of
a ray is ``t = (p - o_perp)/u_perp`` of just its *winning* segment, so with
the winner's ``(u_perp, is_vertical)`` saved as residuals the VJP is closed
form and elementwise over rays:

    vertical hit:    dr/dx = -1/u_perp   dr/dcos = -t/u_perp   (dy = dsin = 0)
    horizontal hit:  dr/dy = -1/u_perp   dr/dsin = -t/u_perp   (dx = dcos = 0)
    clamped/no hit:  all zero

(the implicit-surface gradient of SURVEY.md §7 step 5 — the hit surface is
axis-aligned, so its normal is the fixed axis and the implicit-function form
coincides with exact autodiff of the winning branch). ``d/dtheta`` chains
through cos/sin outside this boundary automatically. Cost: fwd+bwd ~= fwd.

Map gradients (``d range/d map``) go through the EDF-march backend
(raymarch_xla.py bilinear mode), per the SURVEY.md §7 step 5 contract: the
occupancy grid is the differentiable map representation; compiled segment
geometry is not (boundary extraction is combinatorial).

Validated against plain ``jax.grad`` of the dense formula and against finite
differences in tests/test_grad.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .raycast_segments import _fit_chunk

_BIG = np.float32(3.0e38)


def _chunk_body(seg, x, y, cos_t, sin_t, carry):
    """One segment-chunk update of (best_t, best_u, best_isv).

    seg: p/lo/hi/isv arrays already broadcast to (..., KC) against rays.
    """
    best_t, best_u, best_v = carry
    p, lo, hi, isv = seg
    o_perp = jnp.where(isv, x[..., None], y[..., None])
    o_along = jnp.where(isv, y[..., None], x[..., None])
    u_perp = jnp.where(isv, cos_t[..., None], sin_t[..., None])
    u_along = jnp.where(isv, sin_t[..., None], cos_t[..., None])
    u_safe = jnp.where(u_perp == 0.0, 1e-30, u_perp)
    t = (p - o_perp) / u_safe
    a = o_along + t * u_along
    valid = (t >= 0.0) & (a >= lo) & (a <= hi) & (u_perp != 0.0)
    t = jnp.where(valid, t, _BIG)
    tmin = jnp.min(t, axis=-1)
    # winner attributes via tie-max select (any tied lane is a valid
    # subgradient choice at corner ties)
    m = t == tmin[..., None]
    u_win = jnp.max(jnp.where(m, u_perp, -_BIG), axis=-1)
    v_win = jnp.max(jnp.where(m, isv.astype(jnp.float32), -1.0), axis=-1)
    upd = tmin < best_t
    return (jnp.where(upd, tmin, best_t),
            jnp.where(upd, u_win, best_u),
            jnp.where(upd, v_win, best_v))


def _fwd_with_winner(segment_params, x, y, cos_t, sin_t, max_range, chunk):
    """Full-set min-reduction tracking the winner. Returns
    (ranges, u_win, isv_win, hit)."""
    k = segment_params.shape[1]
    chunk = _fit_chunk(k, chunk)
    chunks = segment_params.reshape(4, k // chunk, chunk).transpose(1, 0, 2)

    def body(carry, seg_chunk):
        seg = (seg_chunk[0], seg_chunk[1], seg_chunk[2], seg_chunk[3] > 0.5)
        return _chunk_body(seg, x, y, cos_t, sin_t, carry), None

    init = (jnp.full(jnp.shape(x), _BIG),
            jnp.ones(jnp.shape(x), jnp.float32),
            jnp.full(jnp.shape(x), -1.0))
    (best_t, best_u, best_v), _ = jax.lax.scan(body, init, chunks)
    hit = best_t < max_range
    return jnp.minimum(best_t, max_range), best_u, best_v, hit


def _fwd_tiled_winner(tiles, tiles_shape, tile_size, tile_origin,
                      x0, y0, x, y, cos_t, sin_t, max_range, chunk):
    """Tile-culled variant: rays (A, B), per-agent segment lists."""
    nr, nc = tiles_shape
    tox, toy = tile_origin
    ci = jnp.clip(((x0 - tox) / tile_size).astype(jnp.int32), 0, nc - 1)
    ri = jnp.clip(((y0 - toy) / tile_size).astype(jnp.int32), 0, nr - 1)
    agent_segs = jnp.take(tiles, ri * nc + ci, axis=0)   # (A, 4, K_tile)
    k = tiles.shape[2]
    chunk = _fit_chunk(k, chunk)
    ch = agent_segs.reshape(x0.shape[0], 4, k // chunk, chunk)
    ch = ch.transpose(2, 0, 1, 3)                        # (n, A, 4, KC)

    def body(carry, seg_chunk):
        seg = (seg_chunk[:, 0][:, None, :], seg_chunk[:, 1][:, None, :],
               seg_chunk[:, 2][:, None, :],
               seg_chunk[:, 3][:, None, :] > 0.5)
        return _chunk_body(seg, x, y, cos_t, sin_t, carry), None

    init = (jnp.full(jnp.shape(x), _BIG),
            jnp.ones(jnp.shape(x), jnp.float32),
            jnp.full(jnp.shape(x), -1.0))
    (best_t, best_u, best_v), _ = jax.lax.scan(body, init, ch)
    hit = best_t < max_range
    return jnp.minimum(best_t, max_range), best_u, best_v, hit


def _winner_vjp(r, u_win, v_win, hit, g):
    """Shared closed-form cotangents (gx, gy, gcos, gsin)."""
    u_safe = jnp.where(u_win == 0.0, 1e-30, u_win)
    inv_u = jnp.where(hit, 1.0 / u_safe, 0.0)
    isv = v_win > 0.5
    gx = jnp.where(isv, -g * inv_u, 0.0)
    gy = jnp.where(isv, 0.0, -g * inv_u)
    gt = -g * r * inv_u
    gct = jnp.where(isv, gt, 0.0)
    gst = jnp.where(isv, 0.0, gt)
    return gx, gy, gct, gst


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def raycast_all_diff(segment_params, x, y, cos_t, sin_t,
                     max_range=10.0, chunk: int = 1024, kv: int = 0):
    """Differentiable full-set raycast (analytic VJP, O(rays) backward).

    Same values as ``raycast_all``. ``segment_params`` receives a zero
    cotangent (map grads use the EDF backend, module doc).

    The primal path below runs only OUTSIDE autodiff, so it uses the cheap
    forward; the winner-tracking forward runs only under jax.grad (the
    custom_vjp fwd rule)."""
    from .raycast_segments import raycast_all
    return raycast_all(segment_params, x, y, cos_t, sin_t, max_range,
                       chunk=chunk, kv=kv)


def _rc_fwd(segment_params, x, y, cos_t, sin_t, max_range, chunk, kv):
    # winner-tracking forward: the split layout keeps the orientation row,
    # so the mixed-path tracker stays correct (runs only under autodiff)
    r, u_win, v_win, hit = _fwd_with_winner(
        segment_params, x, y, cos_t, sin_t, max_range, chunk)
    return r, (jnp.shape(segment_params), r, u_win, v_win, hit)


def _rc_bwd(max_range, chunk, kv, res, g):
    shape, r, u_win, v_win, hit = res
    gx, gy, gct, gst = _winner_vjp(r, u_win, v_win, hit, g)
    return jnp.zeros(shape, jnp.float32), gx, gy, gct, gst


raycast_all_diff.defvjp(_rc_fwd, _rc_bwd)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(1, 2, 3, 10, 11, 12))
def raycast_tiled_diff(tiles, tiles_shape, tile_size, tile_origin,
                       x0, y0, x, y, cos_t, sin_t,
                       max_range=10.0, chunk: int = 512,
                       kv_tile: int = 0):
    """Differentiable tile-culled raycast (analytic VJP, O(rays) backward).

    ``tiles``/``x0``/``y0`` receive zero cotangents (tile selection is
    piecewise constant in position). Cheap forward outside autodiff."""
    from .raycast_segments import raycast_tiled
    return raycast_tiled(tiles, tiles_shape, tile_size, tile_origin,
                         x0, y0, x, y, cos_t, sin_t, max_range,
                         chunk=chunk, kv_tile=kv_tile)


def _rct_fwd(tiles, tiles_shape, tile_size, tile_origin,
             x0, y0, x, y, cos_t, sin_t, max_range, chunk, kv_tile):
    r, u_win, v_win, hit = _fwd_tiled_winner(
        tiles, tiles_shape, tile_size, tile_origin, x0, y0, x, y,
        cos_t, sin_t, max_range, chunk)
    return r, (jnp.shape(tiles), jnp.shape(x0), r, u_win, v_win, hit)


def _rct_bwd(tiles_shape, tile_size, tile_origin, max_range, chunk,
             kv_tile, res, g):
    tshape, ashape, r, u_win, v_win, hit = res
    gx, gy, gct, gst = _winner_vjp(r, u_win, v_win, hit, g)
    z = jnp.zeros(ashape, jnp.float32)
    return (jnp.zeros(tshape, jnp.float32), z, z, gx, gy, gct, gst)


raycast_tiled_diff.defvjp(_rct_fwd, _rct_bwd)
