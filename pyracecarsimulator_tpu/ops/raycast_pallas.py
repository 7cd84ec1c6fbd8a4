"""Fused Pallas TPU kernel for the dense segment raycast.

This is the framework's hand-written hot kernel (the "fused Pallas forward
kernel" of SURVEY.md §7 step 4, re-targeted at the dense-geometry backend
that the gather-bound DT march graduated into — see raycast_segments.py).

Design (see /opt/skills/guides/pallas_guide.md):
  * Rays are laid out RAY-MAJOR: each program owns a (ROWS, 128) block of
    rays — full lane utilization (a first draft used (N, 1) ray columns,
    wasting 127/128 lanes and drowning in grid overhead).
  * The whole segment table sits in VMEM as (K, 4) rows (dynamic scalar
    loads must index along SUBLANES; Mosaic has no dynamic lane indexing);
    a ``fori_loop`` sweeps it one segment at a time: 4 scalar loads
    broadcast against the whole ray block, ~8 VPU ops per (ray, segment)
    pair, running (best, winner) state held on-chip for the entire sweep.
  * Orientation-specialized: with the split layout
    (maps/segments.py::split_pad_segments) the vertical and horizontal
    sweeps carry no per-pair orientation selects.
  * The backward pass needs no kernel: the forward also writes the winning
    segment's (u_perp, is_vertical), making the VJP closed-form and
    elementwise over rays (raycast_grad.py module doc).

Matches ``raycast_all`` exactly (tests/test_pallas.py: interpret mode on
CPU, compiled on TPU via bench/verify drives).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = np.float32(3.0e38)
ROWS = 32             # ray rows per program -> 32*128 = 4096 rays/program
LANES = 128


def _kernel(seg_ref, x_ref, y_ref, ct_ref, st_ref, ic_ref, is_ref,
            out_ref, u_ref, v_ref, *, max_range, kv, k_total):
    # seg_ref layout: (K, 4) rows [p, lo, hi, isv] - the sweep's dynamic
    # index runs along SUBLANES (Mosaic does not lower dynamic LANE-indexed
    # scalar loads; observed remote-compile failure on seg_ref[0, k]).
    x = x_ref[:, :]
    y = y_ref[:, :]
    ct = ct_ref[:, :]
    st = st_ref[:, :]
    inv_c = ic_ref[:, :]
    inv_s = is_ref[:, :]

    def sweep(lo, hi, vertical, carry):
        o_perp = x if vertical else y
        o_along = y if vertical else x
        u_inv = inv_c if vertical else inv_s
        u_along = st if vertical else ct

        def body(k, carry):
            best_t, best_u, best_v = carry
            p = seg_ref[k, 0]
            slo = seg_ref[k, 1]
            shi = seg_ref[k, 2]
            t = (p - o_perp) * u_inv
            a = o_along + t * u_along
            valid = (t >= 0.0) & ((a - slo) * (shi - a) >= 0.0)
            t = jnp.where(valid, t, _BIG)
            upd = t < best_t
            u_here = ct if vertical else st
            return (jnp.where(upd, t, best_t),
                    jnp.where(upd, u_here, best_u),
                    jnp.where(upd, 1.0 if vertical else 0.0, best_v))

        return jax.lax.fori_loop(lo, hi, body, carry)

    shape = x.shape
    carry = (jnp.full(shape, _BIG, jnp.float32),
             jnp.ones(shape, jnp.float32),
             jnp.full(shape, -1.0, jnp.float32))
    if kv > 0:
        carry = sweep(0, kv, True, carry)
        carry = sweep(kv, k_total, False, carry)
    else:
        # mixed layout: orientation per segment via two guarded updates
        def body(k, carry):
            best_t, best_u, best_v = carry
            p = seg_ref[k, 0]
            slo = seg_ref[k, 1]
            shi = seg_ref[k, 2]
            isv = seg_ref[k, 3] > 0.5
            o_perp = jnp.where(isv, x, y)
            o_along = jnp.where(isv, y, x)
            u_inv = jnp.where(isv, inv_c, inv_s)
            u_along = jnp.where(isv, st, ct)
            t = (p - o_perp) * u_inv
            a = o_along + t * u_along
            valid = (t >= 0.0) & ((a - slo) * (shi - a) >= 0.0)
            t = jnp.where(valid, t, _BIG)
            upd = t < best_t
            u_here = jnp.where(isv, ct, st)
            v_here = jnp.where(isv, 1.0, 0.0)
            return (jnp.where(upd, t, best_t),
                    jnp.where(upd, u_here, best_u),
                    jnp.where(upd, v_here, best_v))

        carry = jax.lax.fori_loop(0, k_total, body, carry)

    best_t, best_u, best_v = carry
    out_ref[:, :] = jnp.minimum(best_t, max_range)
    u_ref[:, :] = best_u
    v_ref[:, :] = best_v


@functools.partial(jax.jit,
                   static_argnames=("max_range", "kv", "interpret"))
def _raycast_pallas_raw(segment_params, x, y, cos_t, sin_t, inv_c, inv_s,
                        max_range: float = 10.0, kv: int = 0,
                        interpret: bool = False):
    """Ray-major Pallas raycast. Ray args are (Nr, 128) 2D."""
    nr = x.shape[0]
    if nr % ROWS:
        raise ValueError(f"ray rows {nr} not a multiple of {ROWS}")
    k = segment_params.shape[1]
    segment_rows = segment_params.T          # (K, 4): see _kernel note
    grid = (nr // ROWS,)
    ray_spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    seg_spec = pl.BlockSpec((k, 4), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [ray_spec] * 3
    out_shape = [jax.ShapeDtypeStruct((nr, LANES), jnp.float32)] * 3
    kernel = functools.partial(_kernel, max_range=max_range, kv=kv,
                               k_total=k)
    r, u, v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[seg_spec] + [ray_spec] * 6,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(segment_rows, x, y, cos_t, sin_t, inv_c, inv_s)
    return r, u, v


def _rp_fwd_impl(segment_params, x, y, cos_t, sin_t, max_range, kv,
                 interpret):
    from .raycast_segments import _ray_invs
    shape = jnp.shape(x)
    n = int(np.prod(shape)) if shape else 1
    block = ROWS * LANES
    n_pad = (-n) % block
    inv_c, inv_s = _ray_invs(cos_t, sin_t)

    def prep(a):
        f = jnp.ravel(a)
        if n_pad:
            f = jnp.pad(f, (0, n_pad))
        return f.reshape(-1, LANES)

    r, u, v = _raycast_pallas_raw(
        segment_params, prep(x), prep(y), prep(cos_t), prep(sin_t),
        prep(inv_c), prep(inv_s),
        max_range=float(max_range), kv=kv, interpret=interpret)
    unflat = lambda a: a.reshape(-1)[:n].reshape(shape)
    return unflat(r), unflat(u), unflat(v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def raycast_pallas(segment_params, x, y, cos_t, sin_t,
                   max_range: float = 10.0, kv: int = 0,
                   interpret: bool = False):
    """Differentiable fused-Pallas raycast; ray args of any common shape.

    Values match ``raycast_all``; VJP is the analytic O(rays) form with
    residuals produced by the same kernel launch. ``kv`` is the static V/H
    split point of the table (0 = mixed layout)."""
    r, _, _ = _rp_fwd_impl(segment_params, x, y, cos_t, sin_t, max_range,
                           kv, interpret)
    return r


def _rp_fwd(segment_params, x, y, cos_t, sin_t, max_range, kv, interpret):
    r, u, v = _rp_fwd_impl(segment_params, x, y, cos_t, sin_t, max_range,
                           kv, interpret)
    return r, (jnp.shape(segment_params), r, u, v)


def _rp_bwd(max_range, kv, interpret, res, g):
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
