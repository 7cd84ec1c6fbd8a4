"""Fused Pallas TPU kernel for the dense segment raycast.

This is the framework's hand-written hot kernel (the "fused Pallas forward
kernel" of SURVEY.md §7 step 4, re-targeted at the dense-geometry backend
that the gather-bound DT march graduated into — see raycast_segments.py).

Design (see /opt/skills/guides/pallas_guide.md):
  * Grid over ray blocks; each program handles ``RAY_BLOCK`` rays laid on
    sublanes — ray inputs arrive as (N, 1) columns so every ray owns a
    sublane row with no in-kernel relayout.
  * The whole segment table (4, K) sits in VMEM and is swept in 128-lane
    chunks by a ``fori_loop``; the running (best_t, u_win, isv_win) stay in
    vector registers for the entire sweep — unlike the XLA scan version,
    whose loop carry round-trips HBM every chunk (the measured berlin gap).
  * The backward pass needs no kernel at all: the forward also writes the
    winning segment's (u_perp, is_vertical), making the VJP closed-form and
    elementwise over rays (raycast_grad.py module doc).

The kernel computes exactly the same values as ``raycast_all`` (tested in
tests/test_pallas.py, CPU interpret mode + TPU when available).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = np.float32(3.0e38)
RAY_BLOCK = 512          # rays per program (sublane axis), multiple of 8
SEG_CHUNK = 128          # segments per sweep step (lane axis)


def _kernel(seg_ref, x_ref, y_ref, ct_ref, st_ref,
            out_ref, u_ref, v_ref, *, max_range, n_chunks):
    x = x_ref[:, :]       # (RB, 1)
    y = y_ref[:, :]
    ct = ct_ref[:, :]
    st = st_ref[:, :]

    def body(c, carry):
        best_t, best_u, best_v = carry
        sl = pl.ds(c * SEG_CHUNK, SEG_CHUNK)
        p = seg_ref[0, sl][None, :]          # (1, CK)
        lo = seg_ref[1, sl][None, :]
        hi = seg_ref[2, sl][None, :]
        isv = seg_ref[3, sl][None, :] > 0.5

        o_perp = jnp.where(isv, x, y)        # (RB, CK)
        o_along = jnp.where(isv, y, x)
        u_perp = jnp.where(isv, ct, st)
        u_along = jnp.where(isv, st, ct)
        u_safe = jnp.where(u_perp == 0.0, 1e-30, u_perp)
        t = (p - o_perp) / u_safe
        a = o_along + t * u_along
        valid = (t >= 0.0) & (a >= lo) & (a <= hi) & (u_perp != 0.0)
        t = jnp.where(valid, t, _BIG)
        tmin = jnp.min(t, axis=1, keepdims=True)           # (RB, 1)
        m = t == tmin
        u_win = jnp.max(jnp.where(m, u_perp, -_BIG), axis=1, keepdims=True)
        v_win = jnp.max(jnp.where(m, isv.astype(jnp.float32), -1.0),
                        axis=1, keepdims=True)
        upd = tmin < best_t
        return (jnp.where(upd, tmin, best_t),
                jnp.where(upd, u_win, best_u),
                jnp.where(upd, v_win, best_v))

    init = (jnp.full((x.shape[0], 1), _BIG, jnp.float32),
            jnp.ones((x.shape[0], 1), jnp.float32),
            jnp.full((x.shape[0], 1), -1.0, jnp.float32))
    best_t, best_u, best_v = jax.lax.fori_loop(0, n_chunks, body, init)
    out_ref[:, :] = jnp.minimum(best_t, max_range)
    u_ref[:, :] = best_u
    v_ref[:, :] = best_v


@functools.partial(jax.jit,
                   static_argnames=("max_range", "interpret"))
def _raycast_pallas_raw(segment_params, x, y, cos_t, sin_t,
                        max_range: float = 10.0, interpret: bool = False):
    """Flat-ray Pallas raycast. Rays are (N,) with N % RAY_BLOCK == 0.

    Returns (ranges, u_win, isv_win) each (N,).
    """
    n = x.shape[0]
    if n % RAY_BLOCK:
        raise ValueError(f"ray count {n} not a multiple of {RAY_BLOCK}")
    k = segment_params.shape[1]
    if k % SEG_CHUNK:
        raise ValueError(f"segment count {k} not a multiple of {SEG_CHUNK}")
    col = lambda a: a.reshape(n, 1)
    grid = (n // RAY_BLOCK,)
    ray_spec = pl.BlockSpec((RAY_BLOCK, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    seg_spec = pl.BlockSpec((4, k), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [pl.BlockSpec((RAY_BLOCK, 1), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] * 3
    out_shape = [jax.ShapeDtypeStruct((n, 1), jnp.float32)] * 3
    kernel = functools.partial(_kernel, max_range=max_range,
                               n_chunks=k // SEG_CHUNK)
    r, u, v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[seg_spec, ray_spec, ray_spec, ray_spec, ray_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(segment_params, col(x), col(y), col(cos_t), col(sin_t))
    return r.reshape(n), u.reshape(n), v.reshape(n)


def _pad_to_block(a, n_pad):
    return jnp.pad(a, (0, n_pad))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def raycast_pallas(segment_params, x, y, cos_t, sin_t,
                   max_range: float = 10.0, interpret: bool = False):
    """Differentiable fused-Pallas raycast; ray args of any common shape.

    Values match ``raycast_all``; VJP is the analytic O(rays) form with
    residuals produced by the same kernel launch.
    """
    r, _, _ = _rp_fwd_impl(segment_params, x, y, cos_t, sin_t, max_range,
                           interpret)
    return r


def _rp_fwd_impl(segment_params, x, y, cos_t, sin_t, max_range, interpret):
    shape = jnp.shape(x)
    n = int(np.prod(shape)) if shape else 1
    n_pad = (-n) % RAY_BLOCK
    flat = lambda a: _pad_to_block(jnp.ravel(a), n_pad)
    r, u, v = _raycast_pallas_raw(
        segment_params, flat(x), flat(y), flat(cos_t), flat(sin_t),
        max_range=float(max_range), interpret=interpret)
    unflat = lambda a: a[:n].reshape(shape)
    return unflat(r), unflat(u), unflat(v)


def _rp_fwd(segment_params, x, y, cos_t, sin_t, max_range, interpret):
    r, u, v = _rp_fwd_impl(segment_params, x, y, cos_t, sin_t, max_range,
                           interpret)
    return r, (jnp.shape(segment_params), r, u, v)


def _rp_bwd(max_range, interpret, res, g):
    shape, r, u_win, v_win = res
    hit = r < max_range
    u_safe = jnp.where(u_win == 0.0, 1e-30, u_win)
    inv_u = jnp.where(hit, 1.0 / u_safe, 0.0)
    isv = v_win > 0.5
    gx = jnp.where(isv, -g * inv_u, 0.0)
    gy = jnp.where(isv, 0.0, -g * inv_u)
    gt = -g * r * inv_u
    gct = jnp.where(isv, gt, 0.0)
    gst = jnp.where(isv, 0.0, gt)
    return jnp.zeros(shape, jnp.float32), gx, gy, gct, gst


raycast_pallas.defvjp(_rp_fwd, _rp_bwd)
