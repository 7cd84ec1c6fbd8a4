"""Fused Pallas TPU kernel for the dense segment raycast.

This is the framework's hand-written hot kernel (the "fused Pallas forward
kernel" of SURVEY.md §7 step 4, re-targeted at the dense-geometry backend
that the gather-bound DT march graduated into — see raycast_segments.py).

Kernel design, round 2 (see /opt/skills/guides/pallas_guide.md):
  * Rays are RAY-MAJOR: each program owns a (ROWS, 128) block of rays.
  * Segments ride on SUBLANES: the sweep loads (SEG_BLK=8, 1) column
    vectors [p, lo, hi] and broadcasts them against (RB, 128) ray rows —
    every VPU op is a full (8, RB, 128) register tile, 8 segments x RB*128
    rays per instruction. This replaced the round-1 scalar sweep (3 scalar
    loads + fori bookkeeping PER SEGMENT, which lost to the XLA lowering);
    now loads and loop overhead amortize over 8 segments x RB rows.
  * The interval test stays in the two-sided product form
    ``(a - lo)*(hi - a) >= 0`` — one VPU op more than a midpoint/half-width
    form, but bit-identical to the XLA path's acceptance boundary (the
    rounded midpoint would flip ulp-boundary hits and break the exact
    parity gate of tests/test_pallas.py).
  * DYNAMIC sweep bounds (scalar-prefetch SMEM): the vertical sweep covers
    segment rows [0, v_hi) and the horizontal [h_lo, h_end); the bounds
    ride as an int32 leaf built at map-load time, so the kernel sweeps
    only REAL segments (no padding sentinels, no per-pair orientation
    selects) and obstacle-rebuilt maps with different V/H counts reuse the
    compiled kernel. Group masks come from an (8,1) iota against the
    bounds; the group load index is clamped to the table.
  * Winner tracking is free: the V and H sweeps are sequential, so the
    separate (best_v, best_h) outputs cost nothing extra, and the VJP's
    orientation bit is just ``best_v <= best_h`` (cf. raycast_grad.py —
    the XLA path needs a packed-key trick for this; the kernel does not).
  * The backward needs no kernel: with the orientation bit the VJP is
    closed-form and elementwise over rays (raycast_grad._winner_vjp).

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
SEG_BLK = 8           # segments per sublane column group
RB = 8                # ray rows per inner tile -> (8, RB, 128) registers


def _sweep_rows(seg_ref, lo, hi, o_perp, o_along, u_inv, u_along,
                out_ref, seg_base=(), row0=0):
    """One orientation sweep: segment rows [lo, hi) of ``seg_ref`` against
    the (ROWS, LANES) ray block, writing per-ray minima to ``out_ref``.

    seg_ref: (K, 4) rows [p, lo, hi, isv] (``seg_base`` prefixes the index
    for the tiled (1, K, 4) layout). lo/hi are traced scalars. ``row0``
    offsets the output rows (the grouped kernel sweeps one ray row at a
    time into a shared (GRP, LANES) output block).
    """
    k_rows = seg_ref.shape[len(seg_base)]
    nrows = o_perp.shape[0]
    ids0 = jax.lax.broadcasted_iota(jnp.int32, (SEG_BLK, 1, 1), 0)
    lo_g = lo // SEG_BLK
    hi_g = (hi + SEG_BLK - 1) // SEG_BLK

    for r0 in range(0, nrows, RB):
        rb = min(RB, nrows - r0)
        # (1, rb, 128) ray tiles; single-row tails squeeze to (rb=1 ->
        # (8, 128)) 2D tiles — segments on sublanes x rays on lanes — so a
        # tail row runs at FULL vreg utilization instead of 1/8 (a 9-row
        # agent block would otherwise spend as long on row 9 as on rows
        # 1-8; measured 1.8x on berlin's 1080-beam (9, 128) layout).
        if rb == 1:
            op = o_perp[r0:r0 + 1, :]            # (1, 128)
            oa = o_along[r0:r0 + 1, :]
            ui = u_inv[r0:r0 + 1, :]
            ua = u_along[r0:r0 + 1, :]
            ids2 = ids0.reshape(SEG_BLK, 1)
            col = lambda v: v.reshape(SEG_BLK, 1)
            shape = (SEG_BLK, LANES)
            reduce_axis = 0
        else:
            op = o_perp[r0:r0 + rb][None]        # (1, rb, 128)
            oa = o_along[r0:r0 + rb][None]
            ui = u_inv[r0:r0 + rb][None]
            ua = u_along[r0:r0 + rb][None]
            ids2 = ids0
            col = lambda v: v.reshape(SEG_BLK, 1, 1)
            shape = (SEG_BLK, rb, LANES)
            reduce_axis = 0

        def body(g, best, op=op, oa=oa, ui=ui, ua=ua, ids2=ids2, col=col):
            k = jnp.minimum(g * SEG_BLK, k_rows - SEG_BLK)
            idx = seg_base + (pl.ds(k, SEG_BLK),)
            p = col(seg_ref[idx + (pl.ds(0, 1),)])
            slo = col(seg_ref[idx + (pl.ds(1, 1),)])
            shi = col(seg_ref[idx + (pl.ds(2, 1),)])
            ids = ids2 + k
            live = (ids >= lo) & (ids < hi)
            t = (p - op) * ui                      # (8[, rb], 128)
            a = oa + t * ua
            valid = live & (t >= 0.0) & ((a - slo) * (shi - a) >= 0.0)
            return jnp.minimum(best, jnp.where(valid, t, _BIG))

        init = jnp.full(shape, _BIG, jnp.float32)
        best = jax.lax.fori_loop(lo_g, hi_g, body, init)
        out_ref[row0 + r0:row0 + r0 + rb, :] = jnp.min(
            best, axis=reduce_axis, keepdims=(rb == 1))


def _kernel(meta_ref, seg_ref, x_ref, y_ref, ct_ref, st_ref, ic_ref,
            is_ref, bv_ref, bh_ref):
    # seg_ref layout: (K, 4) rows [p, lo, hi, isv] - the sweep's dynamic
    # index runs along SUBLANES (Mosaic does not lower dynamic LANE-indexed
    # loads). meta_ref (SMEM): [v_hi, h_lo, h_end] real-segment bounds.
    x = x_ref[:, :]
    y = y_ref[:, :]
    ct = ct_ref[:, :]
    st = st_ref[:, :]
    inv_c = ic_ref[:, :]
    inv_s = is_ref[:, :]
    _sweep_rows(seg_ref, 0, meta_ref[0], x, y, inv_c, st, bv_ref)
    _sweep_rows(seg_ref, meta_ref[1], meta_ref[2], y, x, inv_s, ct, bh_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _raycast_pallas_raw(sweep_meta, segment_params, x, y, cos_t, sin_t,
                        inv_c, inv_s, interpret: bool = False):
    """Ray-major Pallas raycast. Ray args are (Nr, 128) 2D. Returns the
    per-orientation minima (best_v, best_h), unclamped."""
    nr = x.shape[0]
    if nr % ROWS:
        raise ValueError(f"ray rows {nr} not a multiple of {ROWS}")
    k = segment_params.shape[1]
    segment_rows = segment_params.T          # (K, 4): see _kernel note
    grid = (nr // ROWS,)
    ray_spec = pl.BlockSpec((ROWS, LANES), lambda i, meta: (i, 0),
                            memory_space=pltpu.VMEM)
    seg_spec = pl.BlockSpec((k, 4), lambda i, meta: (0, 0),
                            memory_space=pltpu.VMEM)
    bv, bh = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[seg_spec] + [ray_spec] * 6,
            out_specs=[ray_spec, ray_spec],
        ),
        out_shape=[jax.ShapeDtypeStruct((nr, LANES), jnp.float32)] * 2,
        interpret=interpret,
    )(sweep_meta, segment_rows, x, y, cos_t, sin_t, inv_c, inv_s)
    return bv, bh


def _rp_fwd_impl(segment_params, sweep_meta, x, y, cos_t, sin_t,
                 max_range, interpret):
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

    bv, bh = _raycast_pallas_raw(
        sweep_meta, segment_params, prep(x), prep(y), prep(cos_t),
        prep(sin_t), prep(inv_c), prep(inv_s), interpret=interpret)
    unflat = lambda a: a.reshape(-1)[:n].reshape(shape)
    bv, bh = unflat(bv), unflat(bh)
    r = jnp.minimum(jnp.minimum(bv, bh), max_range)
    isv = bv <= bh
    hit = jnp.minimum(bv, bh) < max_range
    return r, isv, hit


def _kernel_tiled(tids_ref, tmeta_ref, seg_ref, x_ref, y_ref, ct_ref,
                  st_ref, ic_ref, is_ref, bv_ref, bh_ref):
    # Per-list program: the BlockSpec index map already routed this
    # program's cull-list block (1, K, 4) here via tids; the per-list
    # sweep bounds are read from the FLATTENED (L*3,) SMEM table — 2D
    # SMEM operands are lane-padded to 128 ints/row, which blows the 1 MB
    # SMEM budget at sector-table list counts (measured: (14400, 3) ->
    # "8388608 would exceed memory 1048576").
    i = pl.program_id(0)
    tid = tids_ref[i]
    x = x_ref[0]
    y = y_ref[0]
    ct = ct_ref[0]
    st = st_ref[0]
    inv_c = ic_ref[0]
    inv_s = is_ref[0]
    _sweep_rows(seg_ref, 0, tmeta_ref[3 * tid], x, y, inv_c, st,
                bv_ref.at[0], seg_base=(pl.ds(0, 1),))
    _sweep_rows(seg_ref, tmeta_ref[3 * tid + 1], tmeta_ref[3 * tid + 2],
                y, x, inv_s, ct, bh_ref.at[0], seg_base=(pl.ds(0, 1),))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _raycast_pallas_ids_raw(ids, meta, lists, x, y, cos_t, sin_t,
                            inv_c, inv_s, interpret: bool = False):
    """Ids-routed ray-major Pallas raycast: program i sweeps cull list
    ``ids[i]`` against its (rows, 128) ray block. ``lists`` is (L, 4, K)
    [p, lo, hi, isv]; ``meta`` (L, 3) per-list real-segment sweep bounds.
    Shared by the tile-culled path (one program per agent) and the
    sector-culled path (one program per (agent, beam-block),
    raycast_sectors.py). Returns per-orientation minima, unclamped."""
    n, rows, _ = x.shape
    seg_rows = lists.transpose(0, 2, 1)       # (L, K, 4): see _kernel note
    k = seg_rows.shape[1]
    meta = jnp.ravel(meta)                    # 1D SMEM: see _kernel_tiled
    ray_spec = pl.BlockSpec((1, rows, LANES), lambda i, ids, tm: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    seg_spec = pl.BlockSpec((1, k, 4), lambda i, ids, tm: (ids[i], 0, 0),
                            memory_space=pltpu.VMEM)
    bv, bh = pl.pallas_call(
        _kernel_tiled,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n,),
            in_specs=[seg_spec] + [ray_spec] * 6,
            out_specs=[ray_spec, ray_spec],
        ),
        out_shape=[jax.ShapeDtypeStruct((n, rows, LANES), jnp.float32)] * 2,
        interpret=interpret,
    )(ids, meta, seg_rows, x, y, cos_t, sin_t, inv_c, inv_s)
    return bv, bh


def _make_kernel_grp(grp: int):
    """Grouped per-list kernel: one grid step owns ``grp`` ray rows of 128
    lanes, each routed to its OWN cull list (``grp`` block operands of the
    same table, index-mapped by the prefetched ids). Amortizes the per-step
    DMA/control overhead that starves the 1-row `_kernel_tiled` (measured
    v5e, berlin sector path: 4.3e7 rays/s at 128 rays/step — ~3 us/step of
    overhead against ~0.1 us of mean-bound sweep) while keeping the sweep
    bound by each list's REAL length from the SMEM meta, not the padded
    capacity the dense XLA sweep pays (berlin: mean 109 real vs K=496)."""

    def kernel(tids_ref, tmeta_ref, *refs):
        seg_refs = refs[:grp]
        (x_ref, y_ref, ct_ref, st_ref, ic_ref, is_ref,
         bv_ref, bh_ref) = refs[grp:]
        i = pl.program_id(0)
        x = x_ref[0]
        y = y_ref[0]
        ct = ct_ref[0]
        st = st_ref[0]
        inv_c = ic_ref[0]
        inv_s = is_ref[0]
        bv = bv_ref.at[0]
        bh = bh_ref.at[0]
        for j in range(grp):
            tid = tids_ref[i * grp + j]
            r = slice(j, j + 1)
            _sweep_rows(seg_refs[j], 0, tmeta_ref[3 * tid], x[r], y[r],
                        inv_c[r], st[r], bv, seg_base=(pl.ds(0, 1),),
                        row0=j)
            _sweep_rows(seg_refs[j], tmeta_ref[3 * tid + 1],
                        tmeta_ref[3 * tid + 2], y[r], x[r], inv_s[r],
                        ct[r], bh, seg_base=(pl.ds(0, 1),), row0=j)

    return kernel


@functools.partial(jax.jit, static_argnames=("grp", "interpret"))
def _raycast_pallas_ids_grp_raw(ids, meta, lists, x, y, cos_t, sin_t,
                                inv_c, inv_s, grp: int = 8,
                                interpret: bool = False):
    """Grouped ids-routed Pallas raycast: ray row g (shape (G, 128)) sweeps
    cull list ``ids[g]``; grid steps process ``grp`` rows each (see
    _make_kernel_grp). ``lists`` is (L, 4, K); ``meta`` (L, 3) per-list
    real-segment sweep bounds. Returns per-orientation minima (G, 128).

    Known cost (ADVICE r3, kept with the negative-result analysis in
    docs/BOTTLENECK.md): the ``grp`` seg operands are index-mapped
    independently, so a grid step DMAs up to ``grp`` copies of a
    (1, K, 4) block even when consecutive rows share a list id —
    duplicated traffic on the rows>1 repeat path and a plausible part of
    the measured ~100 ns/step latency floor. Deduping per-step lists
    (one operand per unique id) is the first thing to try if this kernel
    is ever revisited; the dense XLA sweep currently beats it anyway."""
    g_n = x.shape[0]
    pad = (-g_n) % grp
    if pad:
        rep = lambda a: jnp.concatenate(
            [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])])
        x, y, cos_t, sin_t, inv_c, inv_s, ids = map(
            rep, (x, y, cos_t, sin_t, inv_c, inv_s, ids))
    gg = (g_n + pad) // grp
    shp = lambda a: a.reshape(gg, grp, LANES)
    seg_rows = lists.transpose(0, 2, 1)       # (L, K, 4): see _kernel note
    k = seg_rows.shape[1]
    meta = jnp.ravel(meta)                    # 1D SMEM: see _kernel_tiled
    ray_spec = pl.BlockSpec((1, grp, LANES), lambda i, ids, tm: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    seg_specs = [
        pl.BlockSpec((1, k, 4),
                     functools.partial(
                         lambda i, ids, tm, j: (ids[i * grp + j], 0, 0),
                         j=j),
                     memory_space=pltpu.VMEM)
        for j in range(grp)
    ]
    bv, bh = pl.pallas_call(
        _make_kernel_grp(grp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(gg,),
            in_specs=seg_specs + [ray_spec] * 6,
            out_specs=[ray_spec, ray_spec],
        ),
        out_shape=[jax.ShapeDtypeStruct((gg, grp, LANES), jnp.float32)] * 2,
        interpret=interpret,
    )(ids, meta, *([seg_rows] * grp), shp(x), shp(y), shp(cos_t),
      shp(sin_t), shp(inv_c), shp(inv_s))
    unflat = lambda a: a.reshape(-1, LANES)[:g_n]
    return unflat(bv), unflat(bh)


def _raycast_pallas_tiled_raw(tiles, tile_sweep_meta, tiles_shape,
                              tile_size, tile_origin, x0, y0,
                              x, y, cos_t, sin_t, inv_c, inv_s,
                              interpret: bool = False):
    """Tile-culled ray-major Pallas raycast. Ray args are (A, R, 128);
    x0/y0 are (A,) agent positions for tile lookup. Returns per-orientation
    minima (best_v, best_h), unclamped."""
    nr_t, nc_t = tiles_shape
    tox, toy = tile_origin
    ci = jnp.clip(((x0 - tox) / tile_size).astype(jnp.int32), 0, nc_t - 1)
    ri = jnp.clip(((y0 - toy) / tile_size).astype(jnp.int32), 0, nr_t - 1)
    tids = ri * nc_t + ci                     # (A,) int32
    return _raycast_pallas_ids_raw(tids, tile_sweep_meta, tiles, x, y,
                                   cos_t, sin_t, inv_c, inv_s,
                                   interpret=interpret)


def _rpt_fwd_impl(tiles, tile_sweep_meta, tiles_shape, tile_size,
                  tile_origin, x0, y0, x, y, cos_t, sin_t, max_range,
                  interpret):
    from .raycast_segments import _ray_invs
    a_n, b_n = x.shape
    b_pad = (-b_n) % LANES
    inv_c, inv_s = _ray_invs(cos_t, sin_t)

    def prep(a):
        if b_pad:
            a = jnp.pad(a, ((0, 0), (0, b_pad)))
        return a.reshape(a_n, -1, LANES)

    bv, bh = _raycast_pallas_tiled_raw(
        tiles, tile_sweep_meta, tuple(tiles_shape), tile_size,
        tile_origin, x0, y0, prep(x), prep(y), prep(cos_t), prep(sin_t),
        prep(inv_c), prep(inv_s), interpret=interpret)
    unflat = lambda a: a.reshape(a_n, -1)[:, :b_n]
    bv, bh = unflat(bv), unflat(bh)
    r = jnp.minimum(jnp.minimum(bv, bh), max_range)
    isv = bv <= bh
    hit = jnp.minimum(bv, bh) < max_range
    return r, isv, hit


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 11, 12))
def raycast_pallas_tiled(tiles, tile_sweep_meta, tiles_shape, tile_size,
                         tile_origin, x0, y0, x, y, cos_t, sin_t,
                         max_range: float = 10.0, interpret: bool = False):
    """Differentiable tile-culled Pallas raycast; rays are (A, B).

    Values match ``raycast_tiled`` (same per-tile cull lists); each agent
    program sweeps only its tile's real segments via the (T, 3)
    ``tile_sweep_meta`` bounds (segments.py::build_segment_map)."""
    r, _, _ = _rpt_fwd_impl(tiles, tile_sweep_meta, tiles_shape, tile_size,
                            tile_origin, x0, y0, x, y, cos_t, sin_t,
                            max_range, interpret)
    return r


def _rpt_fwd(tiles, tile_sweep_meta, tiles_shape, tile_size, tile_origin,
             x0, y0, x, y, cos_t, sin_t, max_range, interpret):
    r, isv, hit = _rpt_fwd_impl(tiles, tile_sweep_meta, tiles_shape,
                                tile_size, tile_origin, x0, y0, x, y,
                                cos_t, sin_t, max_range, interpret)
    return r, (jnp.shape(tiles), jnp.shape(tile_sweep_meta), jnp.shape(x0),
               r, isv, hit, cos_t, sin_t)


def _rpt_bwd(tiles_shape, tile_size, tile_origin, max_range, interpret,
             res, g):
    from .raycast_grad import _winner_vjp
    tshape, mshape, ashape, r, isv, hit, cos_t, sin_t = res
    gx, gy, gct, gst = _winner_vjp(r, isv, hit, cos_t, sin_t, g)
    zero_a = jnp.zeros(ashape, jnp.float32)
    tmeta_ct = np.zeros(mshape, jax.dtypes.float0)
    return (jnp.zeros(tshape, jnp.float32), tmeta_ct, zero_a, zero_a,
            gx, gy, gct, gst)


raycast_pallas_tiled.defvjp(_rpt_fwd, _rpt_bwd)


def scan_poses_pallas(segmap, poses, num_beams: int = 1080,
                      fov: float = 4.712388980384690, max_range=10.0,
                      theta_discretization: int = 0,
                      interpret=None) -> jnp.ndarray:
    """Full lidar scans for poses (..., 3) via the Pallas kernels.

    Values match ``scan_poses_segments`` (same cull lists and extent mask);
    dispatches to the tiled kernel when the map carries tile tables. On a
    non-TPU backend the kernel runs in interpret mode (tests); pass
    ``interpret=False`` to force compilation.
    """
    from .common import rays_from_poses, apply_extent_mask
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch, poses2, xb, yb, ct, st = rays_from_poses(
        poses, num_beams, fov, theta_discretization)
    if segmap.tiles is not None and segmap.tile_sweep_meta is not None:
        r = raycast_pallas_tiled(
            segmap.tiles, segmap.tile_sweep_meta, segmap.tiles_shape,
            segmap.tile_size, segmap.tile_origin, poses2[:, 0],
            poses2[:, 1], xb, yb, ct, st, max_range, interpret)
    else:
        r = raycast_pallas(segmap.params, segmap.sweep_meta, xb, yb, ct, st,
                           max_range, interpret)
    r = apply_extent_mask(r, poses2[:, 0], poses2[:, 1], segmap.extent,
                          max_range)
    return r.reshape(*batch, num_beams)


def sweep_meta_mixed(n_vertical, n_segments):
    """Sweep bounds for the mixed layout (extract_segments order:
    verticals, then horizontals, then padding sentinels)."""
    return jnp.asarray([n_vertical, n_vertical, n_segments], jnp.int32)


def sweep_meta_split(kv, n_vertical, n_segments):
    """Sweep bounds for the split layout (vertical block padded to ``kv``):
    V reals in [0, n_vertical), H reals in [kv, kv + n_h)."""
    return jnp.asarray(
        [n_vertical, kv, kv + (n_segments - n_vertical)], jnp.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def raycast_pallas(segment_params, sweep_meta, x, y, cos_t, sin_t,
                   max_range: float = 10.0, interpret: bool = False):
    """Differentiable fused-Pallas raycast; ray args of any common shape.

    Values match ``raycast_all``; VJP is the analytic O(rays) form with
    residuals produced by the same kernel launch. ``sweep_meta`` is the
    int32 [v_hi, h_lo, h_end] bounds leaf (sweep_meta_mixed/_split)."""
    r, _, _ = _rp_fwd_impl(segment_params, sweep_meta, x, y, cos_t, sin_t,
                           max_range, interpret)
    return r


def _rp_fwd(segment_params, sweep_meta, x, y, cos_t, sin_t, max_range,
            interpret):
    r, isv, hit = _rp_fwd_impl(segment_params, sweep_meta, x, y, cos_t,
                               sin_t, max_range, interpret)
    return r, (jnp.shape(segment_params), r, isv, hit, cos_t, sin_t)


def _rp_bwd(max_range, interpret, res, g):
    from .raycast_grad import _winner_vjp
    shape, r, isv, hit, cos_t, sin_t = res
    gx, gy, gct, gst = _winner_vjp(r, isv, hit, cos_t, sin_t, g)
    meta_ct = np.zeros((3,), jax.dtypes.float0)
    return jnp.zeros(shape, jnp.float32), meta_ct, gx, gy, gct, gst


raycast_pallas.defvjp(_rp_fwd, _rp_bwd)


# ---------------------------------------------------------------------------
# Ragged sorted-tile kernel: the mean-bound sector sweep as a Pallas
# program per row tile.
#
# The XLA per-tile sorted sweep (raycast_sectors._sweep_xla_sorted_pt)
# realises only ~60% of its work-ratio bound on v5e: a lax.while_loop
# executes its chunk iterations strictly serially (slice -> sweep -> min
# each iteration, no cross-iteration overlap), and the measured overhead
# grows with both chunk count and tile size (BENCH notes in
# docs/BOTTLENECK.md). This kernel owns the loop instead: one program
# per SORTED row tile, per-tile chunk counts scalar-prefetched into
# SMEM, and the (C, 4, TR) slot-major cull chunks double-buffered
# HBM->VMEM with make_async_copy so the next chunk's DMA rides under the
# current chunk's VPU sweep.
#
# Layout: everything lane-major in TR (rays (BB=128, TR), chunk
# (C, 4, TR)) so a slot's [p, lo, hi] rows broadcast across the 128
# beam sublanes with no relayout, and the dynamic slot index is served
# by the DMA (Mosaic cannot lower dynamic lane-indexed vector loads).
# ---------------------------------------------------------------------------


def _make_sorted_tiles_kernel(c: int, kv: int, kh: int, tr: int):
    big = _BIG

    def kernel(ncs_ref, xr_ref, yr_ref, ct_ref, st_ref, ic_ref, is_ref,
               g_hbm, bv_ref, bh_ref, seg_buf, sem):
        # ncs rides FLATTENED (GT*2,) in SMEM: 2D SMEM operands are
        # lane-padded to 128 ints/row (cf. _kernel_tiled), which blows
        # the 1 MB SMEM budget at ~2300+ tiles (measured: 32k agents ->
        # "Allocation (size=1179648) would exceed memory (size=1048576)")
        t = pl.program_id(0)
        nv = ncs_ref[2 * t]
        nh = ncs_ref[2 * t + 1]
        n = nv + nh

        def slot0_of(i):
            # every term is a multiple of 8 (c and the kv/kh capacities
            # are sublane multiples); Mosaic needs the proof hint for the
            # sublane-dim DMA start into the (K, 4*TR) tiled source
            iv = jnp.minimum(i * c, kv - c)
            ih = kv + jnp.minimum((i - nv) * c, kh - c)
            return pl.multiple_of(jnp.where(i < nv, iv, ih), 8)

        def dma(i):
            slot = jax.lax.rem(i, 2)
            return pltpu.make_async_copy(
                g_hbm.at[t, pl.ds(slot0_of(i), c)],
                seg_buf.at[slot], sem.at[slot])

        @pl.when(n > 0)
        def _():
            dma(0).start()

        def body(i, carry):
            bv, bh = carry
            @pl.when(i + 1 < n)
            def _():
                dma(i + 1).start()
            dma(i).wait()
            seg = seg_buf[jax.lax.rem(i, 2)]       # (C, 4, TR)
            is_v = i < nv
            # x/y ride as (1, TR) per-row constants (beams of a row share
            # the agent position); the orientation-selected operands
            # broadcast over the 128 beam sublanes inside the formulas
            o1 = jnp.where(is_v, xr_ref[0], yr_ref[0])       # (1, TR)
            oa = jnp.where(is_v, yr_ref[0], xr_ref[0])       # (1, TR)
            oi = jnp.where(is_v, ic_ref[0], is_ref[0])       # (LANES, TR)
            od = jnp.where(is_v, st_ref[0], ct_ref[0])
            best = jnp.full((LANES, tr), big, jnp.float32)
            for s in range(c):                     # static unroll
                p = seg[s, 0, :][None]             # (1, TR) -> sublanes
                lo = seg[s, 1, :][None]
                hi = seg[s, 2, :][None]
                t_ = (p - o1) * oi
                a_ = oa + t_ * od
                valid = (t_ >= 0.0) & ((a_ - lo) * (hi - a_) >= 0.0)
                best = jnp.minimum(best, jnp.where(valid, t_, big))
            # accumulate in the fori carry (plain elementwise mins —
            # nothing for Mosaic to copy-on-write) and write the output
            # refs ONCE after the loop
            bv = jnp.minimum(bv, jnp.where(is_v, best, big))
            bh = jnp.minimum(bh, jnp.where(is_v, big, best))
            return bv, bh

        init = jnp.full((LANES, tr), big, jnp.float32)
        bv, bh = jax.lax.fori_loop(0, n, body, (init, init))
        bv_ref[0] = bv
        bh_ref[0] = bh

    return kernel


def sweep_sorted_tiles_pallas(table, meta, kv_sec, ids, x0, y0, cos_t,
                              sin_t, inv_c, inv_s, chunk: int = 32,
                              tile_rows: int = 1024,
                              interpret: bool = False):
    """Mean-bound sorted sector sweep, Pallas-executed. Drop-in for
    raycast_sectors._sweep_xla_sorted_pt (same args minus do_sort; always
    sorts): ray args (G, 128), ids (G,) rows into ``table`` (L, 4, K).
    Returns (best_v, best_h) each (G, 128), bit-identical to the XLA
    sweeps (same slots, same formulas, min idempotent under the clamped
    final chunk).

    ``x0``/``y0`` are PER-ROW (G,) ray origins — a row's 128 beams share
    one origin by construction (the sector layout: a row is one agent's
    beam block). Taking scalars instead of (G, 128) blocks makes that
    invariant structural (a per-beam-origin caller cannot silently get
    wrong ranges; ADVICE r4) and rides 1/128th of the VMEM."""
    g_n, bb = cos_t.shape
    if bb != LANES:
        raise ValueError(f"sorted-tile kernel needs bb == {LANES}")
    if jnp.shape(x0) != (g_n,) or jnp.shape(y0) != (g_n,):
        raise ValueError(
            f"x0/y0 must be per-row (G,) origins (got {jnp.shape(x0)}, "
            f"{jnp.shape(y0)} for G={g_n}); pass xb[:, 0] for the "
            "broadcast block layout")
    k = table.shape[2]
    kv = int(kv_sec)
    kh = k - kv
    c = min(chunk, kv, kh)
    if c <= 0 or c % 8 or kv % 8 or kh % 8:
        raise ValueError(
            f"sorted-tile kernel needs positive sublane-multiple "
            f"chunk/capacities (c={c}, kv={kv}, kh={kh}); single-"
            "orientation tables (kv or kh == 0) must use the dense sweep, "
            "and build_sector_map pads capacities to sublane multiples — "
            "pass a chunk that is a multiple of 8")
    tr = tile_rows
    nv = jnp.take(meta[:, 0], ids)
    nh = jnp.take(meta[:, 2] - meta[:, 1], ids)
    pad = (-g_n) % tr
    if pad:
        rep = lambda a: jnp.concatenate(
            [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])], axis=0)
        x0, y0, cos_t, sin_t, inv_c, inv_s, ids = map(
            rep, (x0, y0, cos_t, sin_t, inv_c, inv_s, ids))
        z = jnp.zeros((pad,), nv.dtype)
        nv = jnp.concatenate([nv, z])
        nh = jnp.concatenate([nh, z])
    gp = g_n + pad
    order = jnp.argsort(-(nv + nh))
    take0 = lambda a: jnp.take(a, order, axis=0)
    x0, y0, cos_t, sin_t, inv_c, inv_s, ids, nv, nh = map(
        take0, (x0, y0, cos_t, sin_t, inv_c, inv_s, ids, nv, nh))
    gt = gp // tr
    g_all = jnp.take(table.reshape(table.shape[0], 4 * k), ids,
                     axis=0).reshape(gp, 4, k)
    # keep the slot-major buffer 4D: a (gt, K, 4*TR) flattening re-tiles
    # the last-two-dims layout (the K axis becomes sublane-tiled), which
    # costs a physical relayout of the whole ~300 MB gather buffer AND a
    # tile-strided chunk DMA source (measured v5e: 3.9e8 -> 3.4e8 rays/s)
    g_tiles = g_all.reshape(gt, tr, 4, k).transpose(0, 3, 2, 1)
    tmax_v = jnp.max(nv.reshape(gt, tr), axis=1)
    tmax_h = jnp.max(nh.reshape(gt, tr), axis=1)
    ncs = jnp.stack([-(-tmax_v // c), -(-tmax_h // c)],
                    axis=1).astype(jnp.int32).reshape(-1)   # 1D: SMEM note
    tp = lambda a: a.reshape(gt, tr, LANES).transpose(0, 2, 1)
    rays = [tp(a) for a in (cos_t, sin_t, inv_c, inv_s)]
    rows = [a.reshape(gt, 1, tr) for a in (x0, y0)]

    ray_spec = pl.BlockSpec((1, LANES, tr), lambda i, ncs: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, tr), lambda i, ncs: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    bv, bh = pl.pallas_call(
        _make_sorted_tiles_kernel(c, kv, kh, tr),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(gt,),
            in_specs=[row_spec] * 2 + [ray_spec] * 4
            + [pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[ray_spec, ray_spec],
            scratch_shapes=[pltpu.VMEM((2, c, 4, tr), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))],
        ),
        out_shape=[jax.ShapeDtypeStruct((gt, LANES, tr), jnp.float32)] * 2,
        interpret=interpret,
    )(ncs, *rows, *rays, g_tiles)
    unt = lambda a: a.transpose(0, 2, 1).reshape(gp, LANES)
    bv, bh = unt(bv), unt(bh)
    inv = jnp.argsort(order)
    bv = jnp.take(bv, inv, axis=0)
    bh = jnp.take(bh, inv, axis=0)
    return bv[:g_n], bh[:g_n]


# ---------------------------------------------------------------------------
# Fused-gather sorted-tile kernel (round 5).
#
# sweep_sorted_tiles_pallas still pays an XLA prep tax: the (G, 4, K)
# capacity-wide pre-gather plus the slot-major transpose are ~69% of its
# remaining gap to the work bound (293 MB + 2x293 MB of HBM traffic on
# berlin at 4096 agents, docs/BOTTLENECK.md round 4), and the O(G*K)
# working set is what degrades 32k-agent batches 26%. This kernel owns
# the gather too:
#
#   * the table rides in HBM in a chunk-grouped layout ``table_ck``
#     (L, NG, 3, CG) — groups of CG slots, params [p, lo, hi] on
#     sublanes (maps/sectors.build_table_ck; a pure reshape of the
#     sentinel-padded table, built once at map-compile time);
#   * per tile, the kernel DMAs each ROW's visited chunk groups
#     (row-major stage buffer, one (3, CG) copy per (row, group) —
#     leading-dim indices only, so Mosaic needs no lane-dim slicing);
#     DMA traffic is VISITED slots at CG granularity, not capacity;
#   * the staged rows are transposed to slot-major IN-KERNEL — the prep
#     lacks the 128-beam factor the sweep carries, so at VMEM speeds it
#     is ~9% of the sweep even at full capacity (vs ~17% through HBM in
#     XLA). Transpose engine selectable: "xlu" (lax.transpose) or "mxu"
#     (identity dot_general — runs on the otherwise-idle MXU);
#   * the sweep then reads (C, TR) chunk values from the slot-major
#     VMEM planes — identical arithmetic to the sorted-tile kernel,
#     bit-identical results.
#
# Pipelining: tile t's row DMAs are issued at step t-1 (scratch persists
# across grid steps), so they ride under step t-1's transpose + sweep;
# the scalar core issues ~tr*(nvg+nhg) copies per tile while the VPU
# sweeps.
# ---------------------------------------------------------------------------


def _make_fused_tiles_kernel(c: int, kv: int, kh: int, tr: int, cg: int,
                             ng: int, transpose_mode: str,
                             fetch_full: bool):
    big = _BIG
    h0g = kv // cg

    def kernel(ncs_ref, ids_ref, xr_ref, yr_ref, ct_ref, st_ref, ic_ref,
               is_ref, tck_hbm, bv_ref, bh_ref, stage, pb, lb, hb, sem):
        t = pl.program_id(0)
        nt = pl.num_programs(0)

        def counts(tt):
            nvc = ncs_ref[2 * tt]
            nhc = ncs_ref[2 * tt + 1]
            sv = jnp.minimum(nvc * c, kv)            # V slots visited
            sh = jnp.minimum(nhc * c, kh)            # H slots visited
            nvg = -(-sv // cg)                       # V groups to fetch
            hend = -(-(kv + sh) // cg)               # H fetch end group
            hstart = jnp.maximum(h0g, nvg)           # V fetch covers below
            nhg = jnp.where(nhc > 0,
                            jnp.maximum(hend - hstart, 0), 0)
            return nvc, nhc, nvg, hstart, nhg

        def row_dmas(tt, slot, start: bool):
            # issue (start=True) or drain (False) tile tt's row fetches;
            # the drain loop recomputes identical descriptors, so the
            # start/wait counts always match. fetch_full: ONE static
            # capacity-wide DMA per row — 2-3x fewer issues than the
            # ragged per-group form, and the extra bytes hide under the
            # sweep (full-capacity streaming is ~0.3 ms/scan at HBM
            # peak vs ~8 ms of sweep on berlin@4096).
            _, _, nvg, hstart, nhg = counts(tt)

            def per_row(r, _):
                rid = ids_ref[tt * tr + r]

                if fetch_full:
                    d = pltpu.make_async_copy(
                        tck_hbm.at[rid], stage.at[slot, r], sem.at[slot])
                    if start:
                        d.start()
                    else:
                        d.wait()
                    return 0

                def grp(g):
                    d = pltpu.make_async_copy(
                        tck_hbm.at[rid, g], stage.at[slot, r, g],
                        sem.at[slot])
                    if start:
                        d.start()
                    else:
                        d.wait()

                jax.lax.fori_loop(0, nvg,
                                  lambda j, _: (grp(j), 0)[1], 0)
                jax.lax.fori_loop(0, nhg,
                                  lambda j, _: (grp(hstart + j), 0)[1], 0)
                return 0

            jax.lax.fori_loop(0, tr, per_row, 0)

        def transpose_tile(tt, slot):
            _, _, nvg, hstart, nhg = counts(tt)
            hend = hstart + nhg
            if transpose_mode == "mxu":
                ident = (jax.lax.broadcasted_iota(jnp.int32, (tr, tr), 0)
                         == jax.lax.broadcasted_iota(jnp.int32, (tr, tr),
                                                     1)).astype(jnp.float32)
            for g in range(ng):
                fetched = (jnp.bool_(True) if fetch_full
                           else (g < nvg) | ((g >= hstart) & (g < hend)))

                @pl.when(fetched)
                def _(g=g):
                    for pidx, buf in ((0, pb), (1, lb), (2, hb)):
                        a = stage[slot, :, g, pidx, :]       # (TR, CG)
                        if transpose_mode == "mxu":
                            # HIGHEST: default MXU f32 precision is bf16
                            # passes — truncates segment coordinates and
                            # flips ulp-boundary hits (measured max|d|
                            # 9.3 m on berlin)
                            at = jax.lax.dot_general(
                                a, ident, (((0,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
                        else:
                            at = a.T                          # (CG, TR)
                        buf[g * cg:(g + 1) * cg, :] = at

        def sweep_tile(tt):
            nvc, nhc, *_ = counts(tt)

            def body(i, carry):
                bv, bh = carry
                is_v = i < nvc
                j = jnp.where(is_v, i, i - nvc)
                slot0 = jnp.where(is_v,
                                  jnp.minimum(j * c, kv - c),
                                  kv + jnp.minimum(j * c, kh - c))
                slot0 = pl.multiple_of(slot0, 8)
                cp = pb[pl.ds(slot0, c)]                 # (C, TR)
                cl = lb[pl.ds(slot0, c)]
                ch = hb[pl.ds(slot0, c)]
                o1 = jnp.where(is_v, xr_ref[0], yr_ref[0])      # (1, TR)
                oa = jnp.where(is_v, yr_ref[0], xr_ref[0])
                oi = jnp.where(is_v, ic_ref[0], is_ref[0])      # (L, TR)
                od = jnp.where(is_v, st_ref[0], ct_ref[0])
                best = jnp.full((LANES, tr), big, jnp.float32)
                for s in range(c):                       # static unroll
                    p = cp[s][None]
                    lo = cl[s][None]
                    hi = ch[s][None]
                    t_ = (p - o1) * oi
                    a_ = oa + t_ * od
                    valid = (t_ >= 0.0) & ((a_ - lo) * (hi - a_) >= 0.0)
                    best = jnp.minimum(best, jnp.where(valid, t_, big))
                bv = jnp.minimum(bv, jnp.where(is_v, best, big))
                bh = jnp.minimum(bh, jnp.where(is_v, big, best))
                return bv, bh

            init = jnp.full((LANES, tr), big, jnp.float32)
            bv, bh = jax.lax.fori_loop(0, nvc + nhc, body, (init, init))
            bv_ref[0] = bv
            bh_ref[0] = bh

        slot = jax.lax.rem(t, 2)

        @pl.when(t == 0)
        def _():
            row_dmas(0, 0, start=True)      # pipeline fill (tile 0 only)

        row_dmas(t, slot, start=False)      # drain tile t's fetches
        transpose_tile(t, slot)

        @pl.when(t + 1 < nt)
        def _():
            row_dmas(t + 1, 1 - slot, start=True)   # overlap next fetch

        sweep_tile(t)

    return kernel


def sweep_sorted_tiles_fused(table_ck, meta, kv_sec, k, ids, x0, y0,
                             cos_t, sin_t, inv_c, inv_s, chunk: int = 24,
                             tile_rows: int = 128,
                             transpose_mode: str = "xlu",
                             fetch: str = "full",
                             interpret: bool = False):
    """Fused-gather sorted sector sweep (module section above): values
    bit-identical to ``sweep_sorted_tiles_pallas`` over the same table,
    with the gather + slot-major transpose INSIDE the kernel.

    ``table_ck``: (L, NG, 3, CG) chunk-grouped table
    (maps/sectors.build_table_ck). ``k``: the original table capacity
    (kv + kh; NG*CG >= k). Other args as sweep_sorted_tiles_pallas."""
    g_n, bb = cos_t.shape
    if bb != LANES:
        raise ValueError(f"fused sorted-tile kernel needs bb == {LANES}")
    if jnp.shape(x0) != (g_n,) or jnp.shape(y0) != (g_n,):
        raise ValueError("x0/y0 must be per-row (G,) origins")
    l, ng, three, cg = table_ck.shape
    if three != 3:
        raise ValueError(f"table_ck must carry 3 params (got {three})")
    kv = int(kv_sec)
    kh = int(k) - kv
    c = min(chunk, kv, kh)
    if c <= 0 or c % 8 or kv % 8 or kh % 8 or cg % 8:
        raise ValueError(
            f"fused kernel needs positive sublane-multiple chunk/"
            f"capacities (c={c}, kv={kv}, kh={kh}, cg={cg})")
    if ng * cg < kv + kh:
        raise ValueError(f"table_ck groups cover {ng * cg} < K={kv + kh}")
    tr = tile_rows
    nv = jnp.take(meta[:, 0], ids)
    nh = jnp.take(meta[:, 2] - meta[:, 1], ids)
    pad = (-g_n) % tr
    if pad:
        rep = lambda a: jnp.concatenate(
            [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])], axis=0)
        x0, y0, cos_t, sin_t, inv_c, inv_s, ids = map(
            rep, (x0, y0, cos_t, sin_t, inv_c, inv_s, ids))
        z = jnp.zeros((pad,), nv.dtype)
        nv = jnp.concatenate([nv, z])
        nh = jnp.concatenate([nh, z])
    gp = g_n + pad
    order = jnp.argsort(-(nv + nh))
    take0 = lambda a: jnp.take(a, order, axis=0)
    x0, y0, cos_t, sin_t, inv_c, inv_s, ids, nv, nh = map(
        take0, (x0, y0, cos_t, sin_t, inv_c, inv_s, ids, nv, nh))
    gt = gp // tr
    tmax_v = jnp.max(nv.reshape(gt, tr), axis=1)
    tmax_h = jnp.max(nh.reshape(gt, tr), axis=1)
    ncs = jnp.stack([-(-tmax_v // c), -(-tmax_h // c)],
                    axis=1).astype(jnp.int32).reshape(-1)   # 1D: SMEM note
    tp = lambda a: a.reshape(gt, tr, LANES).transpose(0, 2, 1)
    rays = [tp(a) for a in (cos_t, sin_t, inv_c, inv_s)]
    rows = [a.reshape(gt, 1, tr) for a in (x0, y0)]

    ray_spec = pl.BlockSpec((1, LANES, tr), lambda i, ncs, ids: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, tr), lambda i, ncs, ids: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    bv, bh = pl.pallas_call(
        _make_fused_tiles_kernel(c, kv, kh, tr, cg, ng, transpose_mode,
                                 fetch == "full"),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(gt,),
            in_specs=[row_spec] * 2 + [ray_spec] * 4
            + [pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[ray_spec, ray_spec],
            scratch_shapes=[pltpu.VMEM((2, tr, ng, 3, cg), jnp.float32),
                            pltpu.VMEM((ng * cg, tr), jnp.float32),
                            pltpu.VMEM((ng * cg, tr), jnp.float32),
                            pltpu.VMEM((ng * cg, tr), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))],
        ),
        out_shape=[jax.ShapeDtypeStruct((gt, LANES, tr), jnp.float32)] * 2,
        interpret=interpret,
    )(ncs, ids.astype(jnp.int32), *rows, *rays, table_ck)
    unt = lambda a: a.transpose(0, 2, 1).reshape(gp, LANES)
    bv, bh = unt(bv), unt(bh)
    inv = jnp.argsort(order)
    bv = jnp.take(bv, inv, axis=0)
    bh = jnp.take(bh, inv, axis=0)
    return bv[:g_n], bh[:g_n]
