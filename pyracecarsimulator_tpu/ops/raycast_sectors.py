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


def sector_block_width(smap, num_beams: int, fov: float,
                       bb: int | None = None) -> int:
    """Derive (bb=None) or validate a beam-block width for a sector map.

    The SINGLE definition of the block-width/coverage contract: every real
    beam of a ``bb``-block must lie within the map's ``block_half`` of the
    block's lookup beam (the lookup sits <= bb/2 beam spacings from any
    in-block beam; maps/sectors.py proof obligation). Used by
    ``scan_poses_sectors``, ``scan_poses_sectors_multi`` and the sharded
    paths in ``parallel/mesh.py`` — a drift between per-path copies would
    silently violate the coverage contract only on one of them (VERDICT r3
    weak #6). Works for ``SectorSegmentMap`` and ``StackedSectorMap``
    (anything with ``block_half``).

    With ``bb=None`` returns the widest supported block, capped at one
    lane register (128 = the flagship 1080-beam/270 deg block size).
    Raises ValueError when the requested/derived ``bb`` exceeds what the
    map was built for.
    """
    spacing = fov / max(num_beams - 1, 1)
    if bb is None:
        bb = max(1, min(128, 2 * int(smap.block_half / spacing)))
    need = (bb // 2) * spacing
    if need > smap.block_half:
        raise ValueError(
            f"beam blocks span +-{need:.3f} rad but the sector map was "
            f"built for block_half={smap.block_half:.3f}; rebuild the map "
            "with a larger block_half or use a smaller bb")
    return bb


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

    Memory note (ADVICE r3): the gathered buffer ``g_all`` is
    (A*NBLK, 4, K) floats and is NOT bounded by ``chunk`` (which only
    sizes the compute intermediate) — berlin-class K=496 at 4096 agents
    is ~0.6 GB, at the 65k-agent config ~9.4 GB per un-sharded device.
    Very large single-device batches should shard agents (parallel/mesh)
    or call in agent chunks; the flagship configs fit with margin.
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
    bv, bh = _sweep_gathered(g_all, kv_sec, x, y, cos_t, sin_t, inv_c,
                             inv_s, chunk)
    unflat = lambda v: v.reshape(a_n, nblk, bb)
    return unflat(bv), unflat(bh)


def _sweep_gathered(g_all, kv_sec, x, y, cos_t, sin_t, inv_c, inv_s,
                    chunk: int):
    """The dense sweep's compute over PRE-GATHERED cull rows: ``g_all``
    (G, 4, K) is ray row g's cull list; ray args are (G, BB). Factored
    out of ``_sweep_xla`` so sharded-map paths that assemble rows by
    other means (the ring map-pass, parallel/ringmap.py) reuse the
    identical arithmetic. Returns (best_v, best_h), each (G, BB)."""
    gdim, bb = x.shape
    k = g_all.shape[2]
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
    return best_v, best_h


def _sweep_xla_sorted(table, meta, kv_sec, ids, x, y, cos_t, sin_t,
                      inv_c, inv_s, chunk: int = 64, tile_rows: int = 64,
                      do_sort: bool = True, lazy_gather: bool = False):
    """Length-sorted tiled sweep: work bound by per-tile MAX real list
    length (~= the mean, after sorting) instead of the padded capacity K.

    The dense ``_sweep_xla`` pays K slots per ray — on berlin-class maps
    well past the real need. Note the honest prize is the BATCH-visited
    mean, not the table mean: rays concentrate in long-list (open
    free-space) tiles, so berlin's visited lists average ~198 of K=496
    (table mean 109) — predicted sorted-tile work ratio 0.40 of dense
    (scripts/bench_sorted.py [batch] analysis), i.e. ~2.5x, not the 4.4x
    the round-3 table-mean framing suggested. This variant recovers that
    bound with XLA-legal control flow:

      1. gather each ray row's real V/H counts from ``meta`` (a leaf);
      2. sort ray rows by total count, descending (row gathers of the six
         (G, BB) ray arrays — the same 2D-row-gather form the dense sweep
         uses for the table, measured nearly free);
      3. tile the sorted rows into groups of ``tile_rows``; a tile needs
         ceil(tile_max_nv/C) V-chunks + ceil(tile_max_nh/C) H-chunks of
         ``C = chunk`` slots — after sorting, tile maxes hug the mean;
      4. enumerate all possible (tile, chunk, orientation) work items
         statically, mask the needed ones, compact them to the front with
         one stable argsort, and run ONE ``lax.while_loop`` over the
         needed prefix. Each iteration sweeps a static
         (tile_rows, C, BB) block with the standard formulas and
         min-accumulates into the output via dynamic_update_slice.

    Exactness: identical values to ``_sweep_xla`` — every real slot is
    covered (chunk counts come from the meta bounds), padded slots hold
    never-hit sentinels, and the final V chunk is CLAMPED to the V block
    (re-sweeping overlapped slots is idempotent under min). Work items
    never cross the V/H boundary, so no orientation mismatch is possible.

    ``lazy_gather=False`` pre-gathers the full (G, 4, K) cull buffer once
    (the dense sweep's form); ``True`` instead gathers each work item's
    (tile_rows, C, 4) chunk inside the loop from a slot-major (L, K*4)
    view — mean-bound HBM traffic too, for the large-K regime where the
    full-row gather itself is the bottleneck (BASELINE.md: the K=256->512
    dense plateau). ``do_sort=False`` skips step 2 (A/B lever: saves the
    row gathers, pays looser tile maxes).
    """
    g_n, bb = x.shape
    k = table.shape[2]
    kv = int(kv_sec)
    kh = k - kv
    c_v = min(chunk, kv)
    c_h = min(chunk, kh)
    tr = tile_rows
    nv = jnp.take(meta[:, 0], ids)                    # (G,) real V counts
    nh = jnp.take(meta[:, 2] - meta[:, 1], ids)       # (G,) real H counts
    pad = (-g_n) % tr
    if pad:
        rep = lambda a: jnp.concatenate(
            [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])], axis=0)
        x, y, cos_t, sin_t, inv_c, inv_s, ids = map(
            rep, (x, y, cos_t, sin_t, inv_c, inv_s, ids))
        # padded rows cost nothing: zero counts spawn no work items
        z = jnp.zeros((pad,), nv.dtype)
        nv = jnp.concatenate([nv, z])
        nh = jnp.concatenate([nh, z])
    gp = g_n + pad
    if do_sort:
        order = jnp.argsort(-(nv + nh))
        take0 = lambda a: jnp.take(a, order, axis=0)
        x, y, cos_t, sin_t, inv_c, inv_s, ids, nv, nh = map(
            take0, (x, y, cos_t, sin_t, inv_c, inv_s, ids, nv, nh))
    if lazy_gather:
        # slot-major view: one (K, 4) row per list, so a C-slot chunk is a
        # contiguous 4C-float strip gathered per work item
        table_sm = table.transpose(0, 2, 1).reshape(table.shape[0], k * 4)
    else:
        g_all = jnp.take(table.reshape(table.shape[0], 4 * k), ids,
                         axis=0).reshape(gp, 4, k)
    gt = gp // tr
    mj_v = -(-kv // c_v)                              # static chunk caps
    mj_h = -(-kh // c_h)
    tmax_v = jnp.max(nv.reshape(gt, tr), axis=1)      # (GT,)
    tmax_h = jnp.max(nh.reshape(gt, tr), axis=1)
    jv = np.arange(mj_v, dtype=np.int32)
    jh = np.arange(mj_h, dtype=np.int32)
    need_v = (jv[None, :] * c_v) < tmax_v[:, None]    # (GT, mj_v)
    need_h = (jh[None, :] * c_h) < tmax_h[:, None]
    ts = np.repeat(np.arange(gt, dtype=np.int32), mj_v + mj_h)
    js = np.tile(np.concatenate([jv, jh]), gt)
    osv = np.tile(np.concatenate([np.ones(mj_v, np.int32),
                                  np.zeros(mj_h, np.int32)]), gt)
    need = jnp.concatenate([need_v, need_h], axis=1).reshape(-1)
    # compact needed items to the front, preserving order (stable sort)
    perm = jnp.argsort(jnp.where(need, 0, 1), stable=True)
    ts = jnp.take(jnp.asarray(ts), perm)
    js = jnp.take(jnp.asarray(js), perm)
    osv = jnp.take(jnp.asarray(osv), perm)
    n_items = jnp.sum(need.astype(jnp.int32))

    big = jnp.full((gp, bb), _BIG)

    def body(carry):
        i, bv, bh = carry
        t = ts[i]
        j = js[i]
        is_v = osv[i] == 1
        row0 = t * tr
        sl = lambda a: jax.lax.dynamic_slice(a, (row0, 0), (tr, bb))
        xs, ys, cts, sts, ics, iss = map(sl, (x, y, cos_t, sin_t,
                                              inv_c, inv_s))
        # clamp the final chunk inside its orientation block (idempotent
        # overlap; never crosses the V/H boundary)
        slot0 = jnp.where(is_v,
                          jnp.minimum(j * c_v, kv - c_v),
                          kv + jnp.minimum(j * c_h, kh - c_h))

        def seg_chunk(c_static):
            if lazy_gather:
                rows = jax.lax.dynamic_slice(ids, (row0,), (tr,))
                strip = jax.vmap(lambda r: jax.lax.dynamic_slice(
                    table_sm, (r, slot0 * 4), (1, c_static * 4))[0])(rows)
                return strip.reshape(tr, c_static, 4).transpose(0, 2, 1)
            return jax.lax.dynamic_slice(
                g_all, (row0, 0, slot0), (tr, 4, c_static))

        def sweep(c_static):
            seg = seg_chunk(c_static)                 # (TR, 4, C)
            p = seg[:, 0, :, None]
            lo = seg[:, 1, :, None]
            hi = seg[:, 2, :, None]
            o1 = jnp.where(is_v, xs, ys)[:, None, :]
            oi = jnp.where(is_v, ics, iss)[:, None, :]
            oa = jnp.where(is_v, ys, xs)[:, None, :]
            od = jnp.where(is_v, sts, cts)[:, None, :]
            t_ = (p - o1) * oi
            a_ = oa + t_ * od
            valid = (t_ >= 0.0) & ((a_ - lo) * (hi - a_) >= 0.0)
            return jnp.min(jnp.where(valid, t_, _BIG), axis=1)  # (TR, BB)

        # the two orientations may use different static chunk widths;
        # both sweeps return (TR, BB) so lax.cond unifies them
        if c_v == c_h:
            m = sweep(c_v)
        else:
            m = jax.lax.cond(is_v, lambda: sweep(c_v),
                             lambda: sweep(c_h))

        # update BOTH carry buffers with masked mins (no lax.cond around
        # the carries: cond branches returning whole buffers defeat
        # XLA's in-place while-carry analysis and copy ~40 MB/iteration
        # — measured v5e: the cond form ran 8x SLOWER than dense)
        def upd(b, mm):
            cur = jax.lax.dynamic_slice(b, (row0, 0), (tr, bb))
            return jax.lax.dynamic_update_slice(
                b, jnp.minimum(cur, mm), (row0, 0))

        bv = upd(bv, jnp.where(is_v, m, _BIG))
        bh = upd(bh, jnp.where(is_v, _BIG, m))
        return i + 1, bv, bh

    _, bv, bh = jax.lax.while_loop(
        lambda c: c[0] < n_items, body, (jnp.int32(0), big, big))
    if do_sort:
        inv = jnp.argsort(order)
        bv = jnp.take(bv, inv, axis=0)
        bh = jnp.take(bh, inv, axis=0)
    return bv[:g_n], bh[:g_n]


def _sweep_xla_sorted_pt(table, meta, kv_sec, ids, x, y, cos_t, sin_t,
                         inv_c, inv_s, chunk: int = 64,
                         tile_rows: int = 2048, do_sort: bool = True,
                         transpose_chunks: bool = False):
    """Per-tile variant of the length-sorted sweep: ``lax.scan`` over row
    tiles, a small-carry ``lax.while_loop`` per tile.

    `_sweep_xla_sorted` min-accumulates every work item into the two
    full (G, BB) output buffers via dynamic_update_slice on the
    while-loop carry; measured on v5e that form reaches only ~50% of its
    predicted work ratio (berlin: 2.65e8 vs an 0.43-ratio ideal of
    ~5.4e8 — the per-iteration gap ~= one 19 MB buffer copy, i.e. XLA
    materializes copy-on-write for the sliced carry updates). Here the
    outer loop is a ``lax.scan`` whose per-tile (TR, BB) results are
    written once by scan's output stacking, and the inner while-loop
    carry is only the per-tile accumulators (TR, BB ~ 1 MB) updated by
    FULL elementwise mins — nothing for XLA to copy-on-write.

    Work bound, exactness and sorting are identical to
    `_sweep_xla_sorted` (same chunk-count derivation from ``meta``, same
    clamped final chunk, work never crosses the V/H boundary).

    ``transpose_chunks=True`` stores each tile's gathered cull rows
    slot-major — (K, 4, TR) instead of (TR, 4, K) — so the per-iteration
    chunk slice is a MAJOR-axis dynamic_slice: contiguous and
    vreg-aligned for every slot offset. The row-major form slices the
    minor axis at 32/64-slot offsets of a 496-wide dim, which Mosaic can
    only serve with lane relayouts (suspected source of the measured
    ~40 us/iteration overhead; the A/B in scripts/bench_sorted.py
    discriminates).
    """
    g_n, bb = x.shape
    k = table.shape[2]
    kv = int(kv_sec)
    kh = k - kv
    c_v = min(chunk, kv)
    c_h = min(chunk, kh)
    tr = tile_rows
    nv = jnp.take(meta[:, 0], ids)
    nh = jnp.take(meta[:, 2] - meta[:, 1], ids)
    pad = (-g_n) % tr
    if pad:
        rep = lambda a: jnp.concatenate(
            [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])], axis=0)
        x, y, cos_t, sin_t, inv_c, inv_s, ids = map(
            rep, (x, y, cos_t, sin_t, inv_c, inv_s, ids))
        z = jnp.zeros((pad,), nv.dtype)
        nv = jnp.concatenate([nv, z])
        nh = jnp.concatenate([nh, z])
    gp = g_n + pad
    if do_sort:
        order = jnp.argsort(-(nv + nh))
        take0 = lambda a: jnp.take(a, order, axis=0)
        x, y, cos_t, sin_t, inv_c, inv_s, ids, nv, nh = map(
            take0, (x, y, cos_t, sin_t, inv_c, inv_s, ids, nv, nh))
    g_all = jnp.take(table.reshape(table.shape[0], 4 * k), ids,
                     axis=0).reshape(gp, 4, k)
    gt = gp // tr
    tmax_v = jnp.max(nv.reshape(gt, tr), axis=1)
    tmax_h = jnp.max(nh.reshape(gt, tr), axis=1)
    nvc = -(-tmax_v // c_v)                      # per-tile V chunk counts
    nhc = -(-tmax_h // c_h)
    tile = lambda a: a.reshape((gt, tr) + a.shape[1:])
    xs_t = tuple(map(tile, (x, y, cos_t, sin_t, inv_c, inv_s)))
    g_tiles = tile(g_all)
    if transpose_chunks:
        g_tiles = g_tiles.transpose(0, 3, 2, 1)      # (gt, K, 4, tr)

    big = jnp.full((tr, bb), _BIG)

    def per_tile(_, xs):
        (xs_, ys_, cts, sts, ics, iss), g_t, nvc_t, nhc_t = xs

        def body(carry):
            i, bv, bh = carry
            is_v = i < nvc_t
            j = jnp.where(is_v, i, i - nvc_t)
            slot0 = jnp.where(is_v,
                              jnp.minimum(j * c_v, kv - c_v),
                              kv + jnp.minimum(j * c_h, kh - c_h))

            def sweep(c_static):
                o1 = jnp.where(is_v, xs_, ys_)
                oi = jnp.where(is_v, ics, iss)
                oa = jnp.where(is_v, ys_, xs_)
                od = jnp.where(is_v, sts, cts)
                if transpose_chunks:
                    seg = jax.lax.dynamic_slice(
                        g_t, (slot0, 0, 0), (c_static, 4, tr))
                    p = seg[:, 0, :, None]           # (C, TR, 1)
                    lo = seg[:, 1, :, None]
                    hi = seg[:, 2, :, None]
                    t_ = (p - o1[None]) * oi[None]   # (C, TR, BB)
                    a_ = oa[None] + t_ * od[None]
                    valid = (t_ >= 0.0) & ((a_ - lo) * (hi - a_) >= 0.0)
                    return jnp.min(jnp.where(valid, t_, _BIG), axis=0)
                seg = jax.lax.dynamic_slice(
                    g_t, (0, 0, slot0), (tr, 4, c_static))
                p = seg[:, 0, :, None]
                lo = seg[:, 1, :, None]
                hi = seg[:, 2, :, None]
                t_ = (p - o1[:, None, :]) * oi[:, None, :]
                a_ = oa[:, None, :] + t_ * od[:, None, :]
                valid = (t_ >= 0.0) & ((a_ - lo) * (hi - a_) >= 0.0)
                return jnp.min(jnp.where(valid, t_, _BIG), axis=1)

            if c_v == c_h:
                m = sweep(c_v)
            else:
                m = jax.lax.cond(is_v, lambda: sweep(c_v),
                                 lambda: sweep(c_h))
            bv = jnp.minimum(bv, jnp.where(is_v, m, _BIG))
            bh = jnp.minimum(bh, jnp.where(is_v, _BIG, m))
            return i + 1, bv, bh

        _, bv, bh = jax.lax.while_loop(
            lambda c: c[0] < nvc_t + nhc_t, body, (jnp.int32(0), big, big))
        return None, (bv, bh)

    _, (bv, bh) = jax.lax.scan(
        per_tile, None,
        (xs_t, g_tiles, nvc.astype(jnp.int32), nhc.astype(jnp.int32)))
    bv = bv.reshape(gp, bb)
    bh = bh.reshape(gp, bb)
    if do_sort:
        inv = jnp.argsort(order)
        bv = jnp.take(bv, inv, axis=0)
        bh = jnp.take(bh, inv, axis=0)
    return bv[:g_n], bh[:g_n]


_AUTO_MIN_K = 112     # lowest MEASURED capacity where the fused kernel
                      # beats dense (round-5 ladder; see resolve docstring)
_AUTO_TR = 128        # best of the measured v5e tile ladder (BOTTLENECK.md)
_AUTO_CHUNK = 24
_AUTO_KIND = "sorted_plf"   # round 5: fused-gather kernel (berlin 7.3e8
                            # vs 4.6e8 for the XLA-pre-gather kernel)


def resolve_sector_mode(mode: str, k: int, bb: int,
                        interpret: bool = False,
                        kv: int | None = None,
                        has_ck: bool = True) -> tuple:
    """Resolve "auto" to a concrete (mode, chunk | None) for a table of
    capacity ``k`` swept in ``bb``-beam blocks.

    "auto" picks the fused-gather sorted-tile Pallas kernel
    (raycast_pallas.sweep_sorted_tiles_fused) when the capacity is large
    enough that capacity-bound dense work dominates, and only on a real
    TPU backend with ``interpret=False`` (the interpret-mode kernel is
    orders slower than the XLA sweep, so debug/parity runs that force
    ``interpret=True`` on a TPU fall back to "dense"; ADVICE r4).
    Everything else stays "dense".

    Threshold calibration, round 5 — a MEASURED ladder, not the round-4
    interpolation (v5e, 4096x1080, scripts/bench_sorted.py with MR/NS/
    TILE capacity levers on berlin + forced-table_ck probes; parity 0.0
    at every point):

        K (batch mean)   dense      sorted_plf   ratio
        32   (levine)    2.43e9     1.01e9       0.41x  <- dense wins
        112  (23)        8.92e8     9.42e8       1.06x  <- crossover
        160  (37)        6.65e8     9.95e8       1.50x
        256  (69)        3.87e8     9.22e8       2.38x
        496  (198)       2.34e8     7.33e8       3.13x

    The cut sits at the lowest measured winning capacity (112); the
    interval (32, 112) is unrealizable with the builtin geometry and is
    conceded to "dense" (at 112 the kernel's edge is only 6%, and the
    kernel's per-ray fixed costs — sort, ray transposes, per-row DMA —
    dominate as K shrinks).
    """
    if mode != "auto":
        return mode, None
    # single-orientation tables (kv or kh below the sublane quantum)
    # cannot run the sorted kernels (c = min(chunk, kv, kh) would be 0);
    # auto concedes them to dense instead of erroring (code-review r5)
    both_orient = kv is None or (kv >= 8 and k - kv >= 8)
    if (k >= _AUTO_MIN_K and bb == 128 and both_orient and not interpret
            and jax.default_backend() == "tpu"):
        if not has_ck:
            # a map without the fused-kernel layout (pre-round-5 pickle)
            # degrades to the round-4 kernel instead of erroring
            # (code-review r5): same values, ~4.7e8 vs 7.3e8 on berlin
            return f"sorted_pl@{_AUTO_TR}", _AUTO_CHUNK
        return f"{_AUTO_KIND}@{_AUTO_TR}", _AUTO_CHUNK
    return "dense", None


def _parse_mode(mode: str):
    """"dense" | "sorted[@TR]" | "sorted_lazy[@TR]" | "sorted_nosort[@TR]"
    | "sorted_pt[@TR]" | "sorted_pt_nosort[@TR]"
    -> (kind, tile_rows, do_sort, lazy_gather)."""
    tr = 64
    if "@" in mode:
        mode, tr_s = mode.split("@", 1)
        tr = int(tr_s)
    if mode == "dense":
        return "dense", tr, True, False
    if mode == "sorted":
        return "sorted", tr, True, False
    if mode == "sorted_lazy":
        return "sorted", tr, True, True
    if mode == "sorted_nosort":
        return "sorted", tr, False, False
    if mode == "sorted_pt":
        return "sorted_pt", tr, True, False
    if mode == "sorted_pt_nosort":
        return "sorted_pt", tr, False, False
    if mode == "sorted_ptt":
        return "sorted_ptt", tr, True, False
    if mode == "sorted_pl":
        return "sorted_pl", tr, True, False
    if mode in ("sorted_plf", "sorted_plfm", "sorted_plfr",
                "sorted_plfmr"):
        # fused-gather sorted-tile kernel (raycast_pallas.
        # sweep_sorted_tiles_fused); the table argument must be the
        # (table, table_ck) pair. "m" = MXU-transpose engine; trailing
        # "r" = ragged per-group fetch (A/B; default is the one-DMA
        # full-capacity row fetch).
        return mode, tr, True, False
    raise ValueError(f"unknown sector sweep mode {mode!r}")


def _fwd_impl(table, meta, tiles_shape, tile_size, tile_origin, ns, kv_sec,
              x0, y0, x, y, cos_t, sin_t, max_range, bb, chunk,
              use_pallas, interpret, grp, mode):
    a_n, b_n = x.shape
    nblk = -(-b_n // bb)
    b_pad = nblk * bb - b_n
    ids = _list_ids(tiles_shape, tile_size, tile_origin, ns, x0, y0,
                    cos_t, sin_t, bb)
    inv_c, inv_s = _ray_invs(cos_t, sin_t)
    args = [_pad_beams(v, b_pad) for v in (x, y, cos_t, sin_t, inv_c,
                                           inv_s)]
    kind, tile_rows, do_sort, lazy = _parse_mode(mode)
    if kind in ("sorted", "sorted_pt", "sorted_ptt", "sorted_pl",
                "sorted_plf", "sorted_plfm", "sorted_plfr",
                "sorted_plfmr") and not use_pallas:
        flat = [v.reshape(a_n * nblk, bb) for v in args]
        if kind.startswith("sorted_plf"):
            from .raycast_pallas import sweep_sorted_tiles_fused
            tab, tck = table
            bv, bh = sweep_sorted_tiles_fused(
                tck, meta, kv_sec, tab.shape[2], ids.reshape(-1),
                flat[0][:, 0], flat[1][:, 0], *flat[2:], chunk=chunk,
                tile_rows=tile_rows,
                transpose_mode=("mxu" if kind.startswith("sorted_plfm")
                                else "xlu"),
                fetch=("ragged" if kind.endswith("r") else "full"),
                interpret=interpret)
        elif kind == "sorted_pl":
            from .raycast_pallas import sweep_sorted_tiles_pallas
            bv, bh = sweep_sorted_tiles_pallas(
                table, meta, kv_sec, ids.reshape(-1), flat[0][:, 0],
                flat[1][:, 0], *flat[2:], chunk=chunk,
                tile_rows=tile_rows, interpret=interpret)
        elif kind in ("sorted_pt", "sorted_ptt"):
            bv, bh = _sweep_xla_sorted_pt(table, meta, kv_sec,
                                          ids.reshape(-1), *flat,
                                          chunk=chunk,
                                          tile_rows=tile_rows,
                                          do_sort=do_sort,
                                          transpose_chunks=(
                                              kind == "sorted_ptt"))
        else:
            bv, bh = _sweep_xla_sorted(table, meta, kv_sec,
                                       ids.reshape(-1), *flat,
                                       chunk=chunk, tile_rows=tile_rows,
                                       do_sort=do_sort, lazy_gather=lazy)
        bv = bv.reshape(a_n, -1)[:, :b_n]
        bh = bh.reshape(a_n, -1)[:, :b_n]
        r = jnp.minimum(jnp.minimum(bv, bh), max_range)
        isv = bv <= bh
        hit = jnp.minimum(bv, bh) < max_range
        return r, isv, hit
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


def _table_zero_ct(mode: str, tshape):
    """Zero cotangent for the ``table`` argument of the sector VJPs: a
    (table, table_ck) pair of zeros in fused-kernel modes (the pair is
    what rode forward), a single zeros array otherwise."""
    if mode.split("@", 1)[0].startswith("sorted_plf"):
        return tuple(jnp.zeros(s, jnp.float32) for s in tshape)
    return jnp.zeros(tshape, jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 13, 14,
                                                    15, 16, 17, 18, 19))
def raycast_sectors(table, meta, tiles_shape, tile_size, tile_origin,
                    ns, kv_sec, x0, y0, x, y, cos_t, sin_t,
                    max_range: float = 10.0, bb: int = 128,
                    chunk: int = 64, use_pallas: bool = False,
                    interpret: bool = False, grp: int = 8,
                    mode: str = "dense"):
    """Differentiable sector-culled raycast; rays are (A, B).

    Values match ``raycast_all`` over the same boundary geometry (culling
    is conservative). ``table``/``meta``/``x0``/``y0`` receive zero
    cotangents; the VJP is the analytic O(rays) closed form.

    ``mode``: "dense" (capacity-bound `_sweep_xla`) or the
    "sorted"-family mean-bound sweeps (`_sweep_xla_sorted`) for
    large-capacity maps; identical values either way.

    The caller must guarantee that every beam of a ``bb``-block lies
    within the map's ``block_half`` of the block's lookup beam (checked in
    ``scan_poses_sectors``, where beam spacing is known).
    """
    r, _, _ = _fwd_impl(table, meta, tiles_shape, tile_size, tile_origin,
                        ns, kv_sec, x0, y0, x, y, cos_t, sin_t, max_range,
                        bb, chunk, use_pallas, interpret, grp, mode)
    return r


def _rs_fwd(table, meta, tiles_shape, tile_size, tile_origin, ns, kv_sec,
            x0, y0, x, y, cos_t, sin_t, max_range, bb, chunk, use_pallas,
            interpret, grp, mode):
    r, isv, hit = _fwd_impl(table, meta, tiles_shape, tile_size,
                            tile_origin, ns, kv_sec, x0, y0, x, y, cos_t,
                            sin_t, max_range, bb, chunk, use_pallas,
                            interpret, grp, mode)
    # table is the (table, table_ck) pair in fused modes: carry plain
    # shape tuples (static ints ride residuals fine; array-typed shape
    # carriers do not survive shard_map's transpose) — the bwd picks the
    # pair/single form from the static ``mode``
    tshape = jax.tree.map(jnp.shape, table)
    return r, (tshape, jnp.shape(meta), jnp.shape(x0),
               r, isv, hit, cos_t, sin_t)


def _rs_bwd(tiles_shape, tile_size, tile_origin, ns, kv_sec, max_range,
            bb, chunk, use_pallas, interpret, grp, mode, res, g):
    from .raycast_grad import _winner_vjp
    tshape, mshape, ashape, r, isv, hit, cos_t, sin_t = res
    gx, gy, gct, gst = _winner_vjp(r, isv, hit, cos_t, sin_t, g)
    z = jnp.zeros(ashape, jnp.float32)
    meta_ct = np.zeros(mshape, jax.dtypes.float0)
    t_ct = _table_zero_ct(mode, tshape)
    return (t_ct, meta_ct, z, z, gx, gy, gct, gst)


raycast_sectors.defvjp(_rs_fwd, _rs_bwd)


# Auto agent-chunking: the sweeps pre-gather each ray row's (4, K) cull
# list, a working set NOT bounded by the compute chunk — berlin-class
# K=496 at 32k agents rides ~9.4 GB through the gather + slot-major
# transposes and measured 26% slower per ray than 4096 agents
# (BASELINE.md round 4); 65k un-chunked approaches the HBM limit. Large
# batches are therefore split into agent chunks executed sequentially by
# ``lax.map`` (values identical: rays are independent). The budget keeps
# the flagship 4096-agent configs un-chunked on both bundled maps.
_CHUNK_BYTES_BUDGET = 1.8e9


def sector_table_arg(smap, mode: str):
    """The ``table`` argument for ``raycast_sectors[_ids]`` given the
    resolved sweep mode: fused-kernel modes take the (table, table_ck)
    pair (sweep_sorted_tiles_fused reads the chunk-grouped layout), all
    other modes the plain table."""
    kind = mode.split("@", 1)[0]
    if kind.startswith("sorted_plf"):
        if getattr(smap, "table_ck", None) is None:
            raise ValueError(
                f"mode {mode!r} needs the fused-kernel table layout; this "
                "map was built without one (capacity < "
                "the _AUTO_MIN_K crossover, or a pre-round-5 pickle) — "
                "rebuild via build_sector_map or attach "
                "maps.sectors.build_table_ck(table)")
        return (smap.table, smap.table_ck)
    return smap.table


def _auto_agent_chunk(a_n: int, nblk: int, k: int, mode: str) -> int:
    """Agents per chunk (0 = no chunking) for a batch of ``a_n`` agents,
    ``nblk`` beam blocks, capacity-``k`` table swept in ``mode``.

    The fused-gather kernel (sorted_plf*) has an O(table) working set —
    its only large-batch limit is the scalar-prefetch SMEM budget for
    the per-row ids (1 MB; 32k x 9 blocks = 1.2 MB overflows, measured)
    — so it chunks at a fixed 8192 agents (ids 295 KB at nblk=9; divides
    the 32k/65k configs exactly; measured within 3% of the unchunked
    4096 rate on v5e). The XLA sweeps chunk on the pre-gather bytes
    budget instead."""
    def balanced(cap):
        # smallest chunk count that fits under ``cap``, then the chunk
        # size balanced across chunks (128-aligned = the kernel's tile
        # rows) — a 33k batch pads ~1% instead of the 24% a fixed
        # cap-sized chunk would
        if a_n <= cap:
            return 0
        nc = -(-a_n // cap)
        return min(cap, -(-(-(-a_n // nc)) // 128) * 128)

    if mode.startswith("sorted_plf"):
        # scalar-prefetch SMEM holds chunk*nblk int32 ids (1 MB budget;
        # 295k rows measured to overflow). 73728 rows = the measured-good
        # 8192x9 flagship point, scaled down for wider beam configs.
        rows_cap = 73728
        return balanced(max(128, (rows_cap // max(nblk, 1))
                            // 128 * 128))
    per_agent = nblk * 4 * k * 4.0          # (NBLK, 4, K) f32 rows
    if mode.startswith("sorted_pl"):
        per_agent *= 3.0                    # + slot-major transpose bufs
    cap = int(_CHUNK_BYTES_BUDGET // per_agent)
    cap = max(2048, (cap // 1024) * 1024)
    return balanced(cap)


def _padded_offsets(num_beams, fov, bb):
    """The (B_padded,) beam-offset row: padding the offset row is free
    vs real HBM copies for six (A, B) ray arrays inside the raycast
    (docs/BOTTLENECK.md — 46% of the flagship ray budget)."""
    from .common import beam_angles
    nblk = -(-num_beams // bb)
    b_pad = nblk * bb - num_beams
    offs = beam_angles(num_beams, fov)
    if b_pad:
        offs = jnp.concatenate(
            [offs, jnp.broadcast_to(offs[-1:], (b_pad,))])
    return offs


def _scan_chunk(smap, poses2, ct, st, num_beams, max_range, bb,
                auto_chunk, use_pallas, interpret, grp, mode):
    """Raycast + extent mask for one (A, 3) pose chunk whose beam fan
    (ct, st) was built OUTSIDE the chunk loop — one fusion context, so
    chunked and unchunked execution stay bit-identical (XLA may
    contract the rotation fan's mul-sub into FMAs differently per
    fusion context otherwise; measured on CPU)."""
    from .common import apply_extent_mask
    xb = jnp.broadcast_to(poses2[:, 0:1], ct.shape)
    yb = jnp.broadcast_to(poses2[:, 1:2], ct.shape)
    r = raycast_sectors(
        sector_table_arg(smap, mode), smap.meta, smap.tiles_shape,
        smap.tile_size, smap.tile_origin, smap.ns, smap.kv_sec,
        poses2[:, 0], poses2[:, 1],
        xb, yb, ct, st, max_range, bb, auto_chunk or 64,
        bool(use_pallas), bool(interpret), int(grp), mode)[:, :num_beams]
    return apply_extent_mask(r, poses2[:, 0], poses2[:, 1], smap.extent,
                             max_range)


def scan_poses_sectors(smap, poses, num_beams: int = 1080,
                       fov: float = 4.712388980384690, max_range=10.0,
                       theta_discretization: int = 0, bb=None,
                       use_pallas=None, interpret=None,
                       grp: int = 8, mode: str = "auto",
                       agent_chunk=None) -> jnp.ndarray:
    """Full lidar scans for poses (..., 3) via the sector backend.

    ``mode="auto"`` (default) resolves per table/backend
    (resolve_sector_mode): large-capacity tables on a real TPU take the
    ragged sorted-tile Pallas kernel (mean-bound work; berlin 3.9e8+ vs
    dense 2.34e8 rays/s), everything else the dense XLA sweep. All modes
    are value-identical (tests/test_sectors.py).

    ``agent_chunk``: agents per sequential execution chunk for very
    large batches (``None`` = auto-derive from the table capacity so the
    pre-gathered cull working set stays HBM-friendly — the 32k/65k
    single-device configs; ``0`` = never chunk). Values are identical
    either way (rays are independent); gradients flow through the
    chunked path unchanged (lax.map differentiates as a scan).

    ``use_pallas=None`` keeps the per-(agent, block) ids-routed Pallas
    kernel OFF — measured on TPU v5e (round 3, scripts/bench_sectors.py):
    berlin 4096x1080 sector XLA 1.82e8 rays/s fwd vs that kernel 4.3e7
    (each program owns a single (1, 128) ray block and a ~109-segment
    mean list, so program/DMA overhead dominates). It stays available
    for A/B and parity testing; the sorted-tile kernel (mode) is the
    one that wins.
    """
    if use_pallas is None:
        use_pallas = False
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bb = sector_block_width(smap, num_beams, fov, bb)
    if use_pallas:
        # the grp-kernel A/B route ignores sweep modes; keep the table
        # argument plain (fused modes pass a (table, table_ck) pair the
        # grp kernel cannot take)
        mode, auto_chunk = "dense", None
    else:
        mode, auto_chunk = resolve_sector_mode(
            mode, smap.table.shape[2], bb, bool(interpret), smap.kv_sec,
            getattr(smap, "table_ck", None) is not None)
    poses = jnp.asarray(poses)
    batch = poses.shape[:-1]
    poses2 = poses.reshape(-1, 3)
    a_n = poses2.shape[0]
    nblk = -(-num_beams // bb)
    if agent_chunk is None:
        agent_chunk = _auto_agent_chunk(a_n, nblk, smap.table.shape[2],
                                        mode)
    from .common import fan_cos_sin
    offs = _padded_offsets(num_beams, fov, bb)
    # the fan is built ONCE for the whole batch (see _scan_chunk note)
    ct, st = fan_cos_sin(poses2[:, 2], offs, theta_discretization)
    args = (smap, num_beams, max_range, bb, auto_chunk, use_pallas,
            interpret, grp, mode)
    if agent_chunk and a_n > agent_chunk:
        nc = -(-a_n // agent_chunk)
        pad = nc * agent_chunk - a_n
        if pad:
            rep = lambda a: jnp.concatenate(
                [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])])
            poses2, ct, st = rep(poses2), rep(ct), rep(st)
        bp = ct.shape[1]
        r = jax.lax.map(
            lambda sl: _scan_chunk(args[0], sl[0], sl[1], sl[2],
                                   *args[1:]),
            (poses2.reshape(nc, agent_chunk, 3),
             ct.reshape(nc, agent_chunk, bp),
             st.reshape(nc, agent_chunk, bp)))
        r = r.reshape(nc * agent_chunk, num_beams)[:a_n]
    else:
        r = _scan_chunk(args[0], poses2, ct, st, *args[1:])
    return r.reshape(*batch, num_beams)


def scan_poses_sectors_mapgrad(smap, edf, resolution, origin_xy, poses,
                               num_beams: int = 1080,
                               fov: float = 4.712388980384690,
                               max_range=10.0,
                               theta_discretization: int = 0,
                               eps: float = 1e-4, bounds_hw=None,
                               bb=None, dedup: bool = False) -> jnp.ndarray:
    """Sector-culled scan with a ∂range/∂map cotangent: the production
    ∂range/∂map path (BASELINE.json configs[2]).

    Values are BIT-IDENTICAL to ``scan_poses_sectors`` (the compiled-
    geometry forward; with_map_gradient is straight-through). Backward:
    pose/direction cotangents via the sector backend's analytic O(rays)
    VJP, plus the implicit-function map cotangent into ``edf`` attached at
    each hit (ops/raymarch_diff.with_map_gradient — 4 bilinear taps/ray).
    Measured v5e round 3: 1.66e7 rays/s fwd+bwd at 512x1080 — 385x the
    bilinear-march autodiff reference.

    ``edf``: the euclidean distance field the map cotangent lands in
    (e.g. ``track.edf``; grid convention of ops/raymarch_xla). It must
    describe the SAME occupancy boundary the sector map was compiled
    from — the IFT gradient is the derivative of that shared surface.
    ``bounds_hw``: real (h, w) if ``edf`` is padded.
    """
    from .raymarch_diff import with_map_gradient
    from .common import fan_cos_sin, apply_extent_mask
    bb = sector_block_width(smap, num_beams, fov, bb)
    poses = jnp.asarray(poses)
    batch = poses.shape[:-1]
    poses2 = poses.reshape(-1, 3)
    offs = _padded_offsets(num_beams, fov, bb)
    ct, st = fan_cos_sin(poses2[:, 2], offs, theta_discretization)
    xb = jnp.broadcast_to(poses2[:, 0:1], ct.shape)
    yb = jnp.broadcast_to(poses2[:, 1:2], ct.shape)
    r = raycast_sectors(
        smap.table, smap.meta, smap.tiles_shape, smap.tile_size,
        smap.tile_origin, smap.ns, smap.kv_sec, poses2[:, 0], poses2[:, 1],
        xb, yb, ct, st, max_range, bb, 64, False, False)[:, :num_beams]
    r = apply_extent_mask(r, poses2[:, 0], poses2[:, 1], smap.extent,
                          max_range)
    r = with_map_gradient(edf, r, xb[:, :num_beams], yb[:, :num_beams],
                          ct[:, :num_beams], st[:, :num_beams],
                          resolution, origin_xy, eps, bounds_hw, dedup)
    return r.reshape(*batch, num_beams)


def _ids_sweep(table, meta, ids, kv_sec, x, y, cos_t, sin_t, chunk,
               mode, interpret):
    """Shared sweep dispatch for the precomputed-ids path: ray args
    (A, NBLK, BB). Returns (bv, bh) shaped (A, NBLK, BB)."""
    from .raycast_segments import _ray_invs
    inv_c, inv_s = _ray_invs(cos_t, sin_t)
    kind, tile_rows, do_sort, lazy = _parse_mode(mode)
    if kind == "dense":
        return _sweep_xla(table, kv_sec, ids, x, y, cos_t, sin_t, inv_c,
                          inv_s, chunk)
    a_n, nblk, bb = jnp.shape(x)
    flat = [v.reshape(a_n * nblk, bb)
            for v in (x, y, cos_t, sin_t, inv_c, inv_s)]
    if kind.startswith("sorted_plf"):
        from .raycast_pallas import sweep_sorted_tiles_fused
        tab, tck = table
        bv, bh = sweep_sorted_tiles_fused(
            tck, meta, kv_sec, tab.shape[2], ids.reshape(-1),
            flat[0][:, 0], flat[1][:, 0], *flat[2:], chunk=chunk,
            tile_rows=tile_rows,
            transpose_mode=("mxu" if kind.startswith("sorted_plfm")
                            else "xlu"),
            fetch=("ragged" if kind.endswith("r") else "full"),
            interpret=interpret)
    elif kind == "sorted_pl":
        from .raycast_pallas import sweep_sorted_tiles_pallas
        bv, bh = sweep_sorted_tiles_pallas(
            table, meta, kv_sec, ids.reshape(-1), flat[0][:, 0],
            flat[1][:, 0], *flat[2:], chunk=chunk,
            tile_rows=tile_rows, interpret=interpret)
    elif kind in ("sorted_pt", "sorted_ptt"):
        bv, bh = _sweep_xla_sorted_pt(
            table, meta, kv_sec, ids.reshape(-1), *flat, chunk=chunk,
            tile_rows=tile_rows, do_sort=do_sort,
            transpose_chunks=(kind == "sorted_ptt"))
    else:
        bv, bh = _sweep_xla_sorted(
            table, meta, kv_sec, ids.reshape(-1), *flat, chunk=chunk,
            tile_rows=tile_rows, do_sort=do_sort, lazy_gather=lazy)
    unflat = lambda v: v.reshape(a_n, nblk, bb)
    return unflat(bv), unflat(bh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 8, 9, 10, 11))
def raycast_sectors_ids(table, meta, ids, kv_sec, x, y, cos_t, sin_t,
                        max_range: float = 10.0, chunk: int = 64,
                        mode: str = "dense", interpret: bool = False):
    """Sector sweep over PRECOMPUTED list ids (multi-map serving path).

    ray args are (A, NBLK, BB); ``ids`` (A, NBLK) rows into ``table``.
    Same values/VJP as ``raycast_sectors`` — only the id routing differs
    (per-agent map offsets, maps/sectors.StackedSectorMap). ``mode``
    takes the same sweep family as ``raycast_sectors`` (the sorted-tile
    kernel works unchanged here: ids are already rows into the stacked
    table, so multi-track batches sort/tile across ALL their maps at
    once). Returns (A, NBLK*BB) clamped ranges.
    """
    bv, bh = _ids_sweep(table, meta, ids, kv_sec, x, y, cos_t, sin_t,
                        chunk, mode, interpret)
    a_n = x.shape[0]
    return jnp.minimum(jnp.minimum(bv, bh), max_range).reshape(a_n, -1)


def _rsi_fwd(table, meta, ids, kv_sec, x, y, cos_t, sin_t, max_range,
             chunk, mode, interpret):
    bv, bh = _ids_sweep(table, meta, ids, kv_sec, x, y, cos_t, sin_t,
                        chunk, mode, interpret)
    a_n = x.shape[0]
    r = jnp.minimum(jnp.minimum(bv, bh), max_range).reshape(a_n, -1)
    isv = (bv <= bh).reshape(a_n, -1)
    hit = (jnp.minimum(bv, bh) < max_range).reshape(a_n, -1)
    tshape = jax.tree.map(jnp.shape, table)     # pair in fused modes
    return r, (tshape, jnp.shape(meta), jnp.shape(ids),
               jnp.shape(x), r, isv, hit, cos_t, sin_t)


def _rsi_bwd(kv_sec, max_range, chunk, mode, interpret, res, g):
    from .raycast_grad import _winner_vjp
    tshape, mshape, ishape, rshape, r, isv, hit, cos_t, sin_t = res
    gx, gy, gct, gst = _winner_vjp(
        r, isv, hit, cos_t.reshape(r.shape), sin_t.reshape(r.shape), g)
    f0 = lambda s: np.zeros(s, jax.dtypes.float0)
    t_ct = _table_zero_ct(mode, tshape)
    return (t_ct, f0(mshape), f0(ishape),
            gx.reshape(rshape), gy.reshape(rshape), gct.reshape(rshape),
            gst.reshape(rshape))


raycast_sectors_ids.defvjp(_rsi_fwd, _rsi_bwd)


def stack_block_ids(stack, mid, x0, y0, ct, st, b_real: int, bb: int):
    """Per-agent routing for the stacked multi-map sweep.

    ``mid``: (A,) int32 map ids; ``x0``/``y0``: (A,) agent positions;
    ``ct``/``st``: (A, NBLK*BB) padded beam fan; ``b_real``: real beam
    count (block lookup indices are capped there so padded beams never
    route). Returns ``(ids, inside)`` — (A, NBLK) rows into
    ``stack.table`` and the (A,) per-agent map-extent mask. A handful of
    O(agents) scalar gathers on top of the single-map path; shared by
    ``scan_poses_sectors_multi`` and the sharded step
    (parallel/mesh.make_sharded_step with a StackedSectorMap)."""
    nblk = ct.shape[1] // bb
    g = jnp.take(stack.grids, mid, axis=0)          # [nr, nc, tox, toy]
    base = jnp.take(stack.offsets, mid)             # (A,)
    nr = g[:, 0].astype(jnp.int32)
    nc = g[:, 1].astype(jnp.int32)
    ci = jnp.clip(((x0 - g[:, 2]) / stack.tile_size)
                  .astype(jnp.int32), 0, nc - 1)
    ri = jnp.clip(((y0 - g[:, 3]) / stack.tile_size)
                  .astype(jnp.int32), 0, nr - 1)
    tid = ri * nc + ci
    mids = np.minimum(np.arange(nblk) * bb + bb // 2, b_real - 1)
    th = jnp.mod(jnp.arctan2(st[:, mids], ct[:, mids]), _TWO_PI)
    sec = jnp.clip((th * (stack.ns / _TWO_PI)).astype(jnp.int32), 0,
                   stack.ns - 1)
    ids = (base + tid * stack.ns)[:, None] + sec    # (A, NBLK)
    e = jnp.take(stack.extents, mid, axis=0)
    inside = ((x0 >= e[:, 0]) & (x0 < e[:, 1])
              & (y0 >= e[:, 2]) & (y0 < e[:, 3]))
    return ids, inside


def scan_poses_sectors_multi(stack, map_ids, poses, num_beams: int = 1080,
                             fov: float = 4.712388980384690,
                             max_range=10.0, theta_discretization: int = 0,
                             bb=None, mode: str = "auto",
                             interpret=None,
                             agent_chunk=None) -> jnp.ndarray:
    """Multi-track batched scan: agent i scans on map ``map_ids[i]``.

    ``agent_chunk``: as ``scan_poses_sectors`` — auto-derived chunking
    for very large batches (None = auto; 0 = off), which also bounds
    the fused kernel's per-row ids scalar-prefetch SMEM (1 MB budget;
    a 32k x 9-block un-chunked batch overflows it).

    ``stack``: maps/sectors.StackedSectorMap. One fused sweep serves the
    whole agent batch across all stacked tracks — per-agent map routing is
    a handful of O(agents) scalar gathers on top of the single-map path.
    ``mode="auto"`` resolves exactly as ``scan_poses_sectors`` (the
    sorted-tile kernel for large-capacity stacks on a real TPU).
    """
    bb = sector_block_width(stack, num_beams, fov, bb)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    mode, auto_chunk = resolve_sector_mode(
        mode, stack.table.shape[2], bb, bool(interpret), stack.kv_sec,
        getattr(stack, "table_ck", None) is not None)
    poses = jnp.asarray(poses)
    batch = poses.shape[:-1]
    poses2 = poses.reshape(-1, 3)
    mid = jnp.asarray(map_ids, jnp.int32).reshape(-1)
    a_n = poses2.shape[0]
    nblk = -(-num_beams // bb)
    if agent_chunk is None:
        agent_chunk = _auto_agent_chunk(a_n, nblk, stack.table.shape[2],
                                        mode)
    from .common import fan_cos_sin
    offs = _padded_offsets(num_beams, fov, bb)
    # fan built ONCE for the whole batch (see _scan_chunk note)
    ct, st = fan_cos_sin(poses2[:, 2], offs, theta_discretization)
    args = (stack, num_beams, max_range, bb, auto_chunk, interpret, mode)
    if agent_chunk and a_n > agent_chunk:
        nc = -(-a_n // agent_chunk)
        pad = nc * agent_chunk - a_n
        if pad:
            rep = lambda a: jnp.concatenate(
                [a, jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])])
            poses2, mid, ct, st = (rep(poses2), rep(mid), rep(ct),
                                   rep(st))
        bp = ct.shape[1]
        r = jax.lax.map(
            lambda sl: _scan_chunk_multi(args[0], sl[0], sl[1], sl[2],
                                         sl[3], *args[1:]),
            (poses2.reshape(nc, agent_chunk, 3),
             mid.reshape(nc, agent_chunk),
             ct.reshape(nc, agent_chunk, bp),
             st.reshape(nc, agent_chunk, bp)))
        r = r.reshape(nc * agent_chunk, num_beams)[:a_n]
    else:
        r = _scan_chunk_multi(args[0], poses2, mid, ct, st, *args[1:])
    return r.reshape(*batch, num_beams)


def _scan_chunk_multi(stack, poses2, mid, ct, st, num_beams, max_range,
                      bb, auto_chunk, interpret, mode):
    """Stacked raycast + per-agent extent mask for one (A, 3) pose
    chunk; the fan (ct, st) rides in pre-built (chunking bounds the
    fused kernel's per-row ids scalar-prefetch SMEM exactly as in
    ``scan_poses_sectors``, and the shared fan keeps chunked execution
    bit-identical; code-review r5)."""
    nblk = ct.shape[1] // bb
    a_n = poses2.shape[0]
    xb = jnp.broadcast_to(poses2[:, 0:1], ct.shape)
    yb = jnp.broadcast_to(poses2[:, 1:2], ct.shape)
    ids, inside = stack_block_ids(stack, mid, poses2[:, 0], poses2[:, 1],
                                  ct, st, num_beams, bb)
    shp = (a_n, nblk, bb)
    r = raycast_sectors_ids(
        sector_table_arg(stack, mode), stack.meta, ids, stack.kv_sec,
        xb.reshape(shp), yb.reshape(shp), ct.reshape(shp),
        st.reshape(shp), max_range,
        auto_chunk or 64, mode, bool(interpret))[:, :num_beams]
    # per-agent extent mask (reference out-of-map => max_range)
    return jnp.where(inside[:, None], r, max_range)
