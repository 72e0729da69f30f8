"""Pallas TPU visibility kernel: per-tile depth-tested triangle search.

The XLA formulation of the tile-binned search (ops/rasterize.py
rasterize_ids_tiled) round-trips every (tiles, chunk, tile_h, tile_w) edge
intermediate through HBM across scan steps; measured on a v5e it spends
~100 ms/view at 512^2 and minutes in compilation. This kernel keeps the
whole per-tile loop in VMEM/registers:

  grid = (views, tiles); block = one (tile_h x tile_w) pixel tile, the VPU's
  native (8, 128) f32 shape. Per-tile candidate triangles (XLA pre-binned
  and pre-gathered into a (12, K) screen-data block) are walked with a
  fori_loop bounded by the tile's *actual* candidate count (scalar-prefetch),
  so empty tiles cost nothing. Each iteration evaluates three inside-positive
  edge functions + depth interpolation on the full pixel tile and updates a
  running (best_z, best_id) in registers.

Output and tie-breaking match the XLA/brute-force searches: smallest z/w in
[-1, 1] wins, earliest candidate (ascending triangle id) on exact ties.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rasterize import (_screen, _bbox_tile_overlap, _next_pow2,
                        default_tile_capacity, _AREA_EPS,
                        overflow_checks_enabled, emit_overflow_warning)

_INF = float("inf")

# SMEM budget for the shared per-triangle table + flat pair list. The v5e
# has 1.00 MB of SMEM (measured: "Ran out of memory in memory space smem.
# Used 1.08M of 1.00M"); input windows are DOUBLE-buffered by default, but
# the table/list windows are constant across a view's whole tile grid, so
# they ride pl.Buffered(buffer_count=1) and cost their plain size. 768 KB
# leaves ~25% headroom for the prefetch scalars + small windows. Round 5:
# the old 384 KB double-buffered budget silently dropped the production
# 8-sphere scene (6.6k faces x 16ch = 421 KB table) to the dense
# pre-gather path — 15.5 ms/step of binning gathers, 44% of the step.
# 880 KB: the 12-sphere GSO-Mario production scene (~9.9k faces) needs
# 824 KB single-buffered (633 KB table + 191 KB pair list) + ~20 KB of
# prefetch scalars — compile-probed under the 1.00 MB cap
_SMEM_TBL_BUDGET = 880 * 1024
_SINGLE_BUF = pl.Buffered(buffer_count=1)


def _vis_kernel(counts_ref, row0_ref, data_ref, ids_ref, out_ref, zout_ref,
                *, tile_h, tile_w, ntx, H, W, shared_tbl=False):
    b = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)

    ty = t // ntx
    tx = t % ntx
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0) \
        .astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1) \
        .astype(jnp.float32)
    # row0 offsets slab-local rows to absolute image rows (spatial sharding)
    py = ((ty * tile_h + row0_ref[0]).astype(jnp.float32) + row + 0.5) \
        / H * 2.0 - 1.0
    px = ((tx * tile_w).astype(jnp.float32) + col + 0.5) / W * 2.0 - 1.0

    count = counts_ref[b * nt + t]

    def body(i, carry):
        best_z, best_id = carry
        tid = ids_ref[0, 0, 0, i]
        if shared_tbl:
            # whole per-triangle table lives in SMEM, shared by every tile
            # of the view — no per-tile pre-gather (row = tid - 1)
            rd = lambda ch: data_ref[0, ch, tid - 1]     # noqa: E731
        else:
            rd = lambda ch: data_ref[0, 0, ch, i]        # noqa: E731
        ax = rd(0)
        ay = rd(1)
        bx = rd(2)
        by = rd(3)
        cx = rd(4)
        cy = rd(5)
        z0 = rd(6)
        z1 = rd(7)
        z2 = rd(8)
        inv_area = rd(9)

        e0 = ((cx - bx) * (py - by) - (cy - by) * (px - bx)) * inv_area
        e1 = ((ax - cx) * (py - cy) - (ay - cy) * (px - cx)) * inv_area
        e2 = ((bx - ax) * (py - ay) - (by - ay) * (px - ax)) * inv_area
        z = e0 * z0 + e1 * z1 + e2 * z2
        cov = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (inv_area != 0.0) \
            & (z >= -1.0) & (z <= 1.0)
        zc = jnp.where(cov, z, _INF)
        # tie-break on exact z by smaller triangle id: candidate lists from
        # the pair-sort binning are NOT id-ordered, and the brute-force
        # oracle resolves ties to the earliest (smallest) id
        take = (zc < best_z) | ((zc == best_z) & cov & (tid < best_id))
        return (jnp.where(take, zc, best_z),
                jnp.where(take, tid, best_id))

    init = (jnp.full((tile_h, tile_w), _INF, jnp.float32),
            jnp.zeros((tile_h, tile_w), jnp.int32))
    best_z, best_id = jax.lax.fori_loop(0, count, body, init)
    out_ref[0] = best_id
    zout_ref[0] = jnp.where(best_id > 0, best_z, 0.0)


def _vis_kernel_g(counts_ref, row0_ref, data_ref, ids_ref, out_ref, zout_ref,
                  g6_ref, gaux_ref, *, tile_h, tile_w, ntx, H, W,
                  shared_tbl=False):
    """Visibility + winner-row emission: carries the winning candidate's
    screen data (xy, edge-neighbor ids, orientation) through the depth loop
    and writes it per pixel as split channel-major rows — 6 differentiable
    xy channels + 4 non-diff aux — replacing the per-pixel row gather that
    dominated the silhouette forward pass. Background pixels emit the
    all-zero row."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)

    ty = t // ntx
    tx = t % ntx
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0) \
        .astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1) \
        .astype(jnp.float32)
    py = ((ty * tile_h + row0_ref[0]).astype(jnp.float32) + row + 0.5) \
        / H * 2.0 - 1.0
    px = ((tx * tile_w).astype(jnp.float32) + col + 0.5) / W * 2.0 - 1.0

    count = counts_ref[b * nt + t]

    def body(i, carry):
        best_z, best_id, chans = carry
        tid = ids_ref[0, 0, 0, i]
        if shared_tbl:
            rd = lambda ch: data_ref[0, ch, tid - 1]     # noqa: E731
        else:
            rd = lambda ch: data_ref[0, 0, ch, i]        # noqa: E731
        ax = rd(0)
        ay = rd(1)
        bx = rd(2)
        by = rd(3)
        cx = rd(4)
        cy = rd(5)
        z0 = rd(6)
        z1 = rd(7)
        z2 = rd(8)
        inv_area = rd(9)
        n0 = rd(11)
        n1 = rd(12)
        n2 = rd(13)

        e0 = ((cx - bx) * (py - by) - (cy - by) * (px - bx)) * inv_area
        e1 = ((ax - cx) * (py - cy) - (ay - cy) * (px - cx)) * inv_area
        e2 = ((bx - ax) * (py - ay) - (by - ay) * (px - ax)) * inv_area
        z = e0 * z0 + e1 * z1 + e2 * z2
        cov = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (inv_area != 0.0) \
            & (z >= -1.0) & (z <= 1.0)
        zc = jnp.where(cov, z, _INF)
        # same smaller-id tie-break as _vis_kernel (see note there)
        take = (zc < best_z) | ((zc == best_z) & cov & (tid < best_id))
        sgn = jnp.sign(inv_area)
        # channel order matches _gather_tri_screen: ax,bx,cx, ay,by,cy,
        # (z/iw slots stay zero), nbr0..2, sign
        new_vals = (ax, bx, cx, ay, by, cy, n0, n1, n2, sgn)
        chans = tuple(jnp.where(take, v, c) for v, c in zip(new_vals, chans))
        return (jnp.where(take, zc, best_z),
                jnp.where(take, tid, best_id), chans)

    zero = jnp.zeros((tile_h, tile_w), jnp.float32)
    init = (jnp.full((tile_h, tile_w), _INF, jnp.float32),
            jnp.zeros((tile_h, tile_w), jnp.int32),
            tuple(zero for _ in range(10)))
    best_z, best_id, chans = jax.lax.fori_loop(0, count, body, init)
    fg = best_id > 0
    out_ref[0] = best_id
    zout_ref[0] = jnp.where(fg, best_z, 0.0)
    fgf = fg.astype(jnp.float32)
    # split emission: 6 DIFFERENTIABLE xy channels + 4 non-diff aux
    # channels (edge-neighbor ids, orientation) — the custom-VJP cotangent
    # then materializes at 6 channels instead of 16 (the d_g pad/add
    # assembly at 16ch moved ~660 MB/step of structurally-zero data)
    for j in range(6):                   # ax,bx,cx,ay,by,cy
        g6_ref[0, j] = chans[j] * fgf
    gaux_ref[0, 0] = chans[6] * fgf      # nbr0
    gaux_ref[0, 1] = chans[7] * fgf      # nbr1
    gaux_ref[0, 2] = chans[8] * fgf      # nbr2
    gaux_ref[0, 3] = chans[9] * fgf      # sign(area)


def _vis_kernel_flat(counts_ref, starts_ref, npool_ref, row0_ref,
                     data_ref, vals_ref, pool_ref, *out_refs,
                     tile_h, tile_w, ntx, H, W, pool_cap, emit_g,
                     z_sorted=False):
    """Visibility search over the FLAT candidate layout: per-tile ids are
    read from the view's sorted (tile, id) pair list at the tile's start
    offset (both SMEM, shared across the view's tile grid) plus a small
    per-view pool of big triangles — no dense (ntiles, k) candidate
    matrix exists anywhere, so binning memory stays proportional to the
    actual overlap pairs and no per-tile capacity can drop triangles.
    ``emit_g`` additionally emits the winner's split AA rows (6 xy + 4
    aux channels) like _vis_kernel_g.

    ``z_sorted``: each tile's binned candidates are ordered by quantized
    face z-min (bin_triangles z-aware key packing) and table row 11 holds
    the quantization-bucket LOWER bound — the walk then EXITS as soon as
    every pixel of the tile is covered nearer than the next candidate's
    bound. Exact: a skipped candidate's interpolated z >= its bucket
    bound >= the cut candidate's bound > max(best_z), so it loses the
    depth test at every pixel strictly (no ties either). On occlusion-
    heavy scenes (the 8-sphere production stack-up) most depth layers are
    never walked."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)

    ty = t // ntx
    tx = t % ntx
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0) \
        .astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1) \
        .astype(jnp.float32)
    py = ((ty * tile_h + row0_ref[0]).astype(jnp.float32) + row + 0.5) \
        / H * 2.0 - 1.0
    px = ((tx * tile_w).astype(jnp.float32) + col + 0.5) / W * 2.0 - 1.0

    count = counts_ref[b * nt + t]
    start = starts_ref[b * nt + t]
    npool = npool_ref[b]

    L = vals_ref.shape[-1]

    def read_tid(i):
        # clamp: the while-loop's cond probes index i == count after the
        # last candidate — keep the (ignored) read in bounds
        ip = jnp.minimum(i, pool_cap - 1)
        iv = jnp.minimum(start + jnp.maximum(i - npool, 0), L - 1)
        return jnp.where(i < npool, pool_ref[0, 0, ip], vals_ref[0, 0, iv])

    def body_at(i, carry, live=None):
        best_z, best_id = carry[0], carry[1]
        tid0 = read_tid(i)
        tid = tid0 + 1                       # winner convention: id + 1
        rd = lambda ch: data_ref[0, ch, tid0]            # noqa: E731
        ax = rd(0)
        ay = rd(1)
        bx = rd(2)
        by = rd(3)
        cx = rd(4)
        cy = rd(5)
        z0 = rd(6)
        z1 = rd(7)
        z2 = rd(8)
        inv_area = rd(9)

        e0 = ((cx - bx) * (py - by) - (cy - by) * (px - bx)) * inv_area
        e1 = ((ax - cx) * (py - cy) - (ay - cy) * (px - cx)) * inv_area
        e2 = ((bx - ax) * (py - ay) - (by - ay) * (px - ax)) * inv_area
        z = e0 * z0 + e1 * z1 + e2 * z2
        cov = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (inv_area != 0.0) \
            & (z >= -1.0) & (z <= 1.0)
        zc = jnp.where(cov, z, _INF)
        # same smaller-id tie-break as _vis_kernel (see note there)
        take = (zc < best_z) | ((zc == best_z) & cov & (tid < best_id))
        if live is not None:
            take = take & live               # chunk tail past count
        out = (jnp.where(take, zc, best_z), jnp.where(take, tid, best_id))
        if emit_g:
            sgn = jnp.sign(inv_area)
            new_vals = (ax, rd(2), rd(4), ay, rd(3), rd(5),
                        rd(11), rd(12), rd(13), sgn)
            chans = tuple(jnp.where(take, v, c)
                          for v, c in zip(new_vals, carry[2]))
            out = out + (chans,)
        return out

    zero = jnp.zeros((tile_h, tile_w), jnp.float32)
    init = (jnp.full((tile_h, tile_w), _INF, jnp.float32),
            jnp.zeros((tile_h, tile_w), jnp.int32))
    if emit_g:
        init = init + (tuple(zero for _ in range(10)),)
    if not z_sorted:
        # 2x-unrolled walk: candidate i+1's SMEM row loads + edge math
        # are independent of candidate i (only the best_z/best_id compare
        # chain serializes), so pairing them per iteration lets Mosaic
        # overlap load latency with compute
        # UN=4 measured best: 2x -> 66.8, 4x -> 68.6, 8x -> 64.3 it/s on
        # the 8-sphere scene (8x pays tail waste + register pressure)
        UN = 4
        trips = (count + UN - 1) // UN

        def bodyu(j, carry):
            c = carry
            for u in range(UN):
                c = body_at(UN * j + u, c, live=(UN * j + u) < count)
            return c

        res = jax.lax.fori_loop(0, trips, bodyu, init)
    elif z_sorted:
        # chunked occlusion cut: a bare while-loop serializes every
        # iteration behind its cond's tile-wide max reduce (measured 113 ->
        # 75 it/s on the toy scene); a fori_loop of CK iterations inside
        # the while keeps Mosaic's loop pipelining and amortizes the cut
        # check — the walk overshoots the optimal exit by < CK candidates
        CK = 16

        def cond(carry):
            i, best_z = carry[0], carry[1]
            zlb = data_ref[0, 10, read_tid(i)]   # bucket lower bound
            cut = (i >= npool) & (zlb > jnp.max(best_z))
            return (i < count) & ~cut

        def wbody(carry):
            i0 = carry[0]

            def inner(j, st):
                idx = i0 + j
                return body_at(idx, st, live=idx < count)

            return (i0 + CK,) + jax.lax.fori_loop(0, CK, inner, carry[1:])

        res = jax.lax.while_loop(cond, wbody, (jnp.int32(0),) + init)[1:]
    best_z, best_id = res[0], res[1]
    fg = best_id > 0
    out_refs[0][0] = best_id
    out_refs[1][0] = jnp.where(fg, best_z, 0.0)
    if emit_g:
        chans = res[2]
        g6_ref = out_refs[2]
        gaux_ref = out_refs[3]
        fgf = fg.astype(jnp.float32)
        for j in range(6):                   # ax,bx,cx,ay,by,cy
            g6_ref[0, j] = chans[j] * fgf
        gaux_ref[0, 0] = chans[6] * fgf      # nbr0
        gaux_ref[0, 1] = chans[7] * fgf      # nbr1
        gaux_ref[0, 2] = chans[8] * fgf      # nbr2
        gaux_ref[0, 3] = chans[9] * fgf      # sign(area)


def _z_cut_enabled() -> bool:
    """Occlusion early-exit in the flat visibility kernel
    (TSSPLAT_Z_CUT=on). Default OFF — a measured NEGATIVE result: with
    z-ordered candidates and a chunked while-loop cut (CK=16) the kernel
    read 89 it/s default / 43 it/s 8-sphere vs 113 / 51 for the plain
    fori walk (a bare per-iteration cut was worse still, 75 / 30). The
    tile-wide max reduce in the loop condition serializes chunks that the
    fixed-trip fori pipelines, and it costs more than the skipped depth
    layers save even on the occlusion-heavy production scene. The flag
    enables BOTH the z-ordered candidate packing and the kernel cut, and
    is resolved at TRACE time in rasterize_ids_pallas (a jit-internal env
    read would be baked into cached executables — the TSSPLAT_OVERFLOW
    bug class, ADVICE r3)."""
    import os
    return os.environ.get("TSSPLAT_Z_CUT", "off") == "on"


def _z_sort_levels(ntiles: int, F: int) -> int:
    """Power-of-2 z-quantization level count that still packs
    (tile, z-bucket, id) into one int32 sort key; 0 disables z ordering
    (< 4 levels isn't worth the while-loop overhead)."""
    room = (2 ** 31) // ((ntiles + 1) * (F + 1))
    lv = 1
    while lv * 2 <= room:
        lv *= 2
    return lv if lv >= 4 else 0


def _face_zmin_q(sz, tri, corner, F, zlv):
    """Per-face quantized z-min bucket (int32 in [0, zlv)). MUST be the
    single source of truth for both the sort key (bin_triangles) and the
    table's bucket-lower-bound row (_prepare_candidates) — the early-exit
    proof needs them consistent. Faces with invalid (w<=eps) vertices get
    garbage buckets; they are excluded from the key expansion by ``ok``
    and depth-rejected in the kernel (inv_area == 0 exactly for invalid
    faces), so their bucket value never matters."""
    if corner:
        zf = sz.reshape(F, 3)
    else:
        zf = sz[tri]
    zmin = zf.min(axis=1)
    return jnp.clip(((zmin + 1.0) * (0.5 * zlv)).astype(jnp.int32),
                    0, zlv - 1)


def _tile_range(lo, hi, tile_px, ntiles_axis):
    """Inclusive tile-index range [t0, t1] whose pixel-center span
    [t*tile_px - 0.5, (t+1)*tile_px - 0.5] intersects the bbox [lo, hi]
    (pixel-center coordinates) — the same ±0.5-slack predicate as
    _bbox_tile_overlap. Empty when t1 < t0 after clamping."""
    t0 = jnp.ceil((lo + 0.5) / tile_px - 1.0).astype(jnp.int32)
    t1 = jnp.floor((hi + 0.5) / tile_px).astype(jnp.int32)
    empty = (t1 < 0) | (t0 > ntiles_axis - 1)
    return (jnp.clip(t0, 0, ntiles_axis - 1),
            jnp.clip(t1, 0, ntiles_axis - 1), empty)


def bin_triangles(pos, tri, resolution, tile_h, tile_w, k, corner=False,
                  med_cap: int = 256, pool_cap: int = 64,
                  row0=0, full_h=None, flat=False, z_cut=False):
    """Output-proportional tile binning for one view.

    Returns (counts (ntiles,) i32, cand (ntiles,k) i32 triangle indices,
    F = padding, n_drop scalar i32 dropped-slot count).
    Work scales with the number of actual (triangle, tile)
    overlap pairs, not F x ntiles: each triangle expands to a static
    handful of (tile, id) pairs, one flat unstable sort groups them by
    tile, and searchsorted recovers per-tile offsets. Tiers bound the
    expansion with static shapes:

      tier 0 — spans <= 2x2 tiles (the vast majority): 4 slots/triangle;
      tier 1 — spans <= 8x4 tiles: up to ``med_cap`` triangles get 32
               slots each;
      tier 2 — larger spans + tier-1 overflow: up to ``pool_cap`` ids
               walked by EVERY tile (correct, just unbinned).

    Candidate lists are NOT id-ordered — the visibility kernels tie-break
    equal depths by smaller id, so order cannot change the output. Tiles
    whose candidate count exceeds ``k`` drop an arbitrary subset; size
    caps with tile_overlap_counts/validate_tile_capacity when changing
    scenes (the trainer does this at startup).

    ``flat=True`` skips the dense (ntiles, k) materialization (an
    ntiles*k-row gather — it dominated binning cost) and returns the
    sorted pair list itself: (counts, starts (ntiles,), vals (L,),
    pool (P,), n_pool, n_drop) where tile t's binned candidates are
    vals[starts[t] : starts[t] + counts[t] - n_pool] plus pool[:n_pool].
    counts have no per-tile k cap (the flat layout cannot overflow a
    tile); the only possible drop is the tier-2 pool cap, counted in
    n_drop.
    """
    H, W = resolution
    F = tri.shape[0]
    sx, sy, sz, v_ok = _screen(pos)
    nty, ntx = H // tile_h, W // tile_w
    ntiles = nty * ntx
    if corner:
        vx = sx.reshape(F, 3)
        vy = sy.reshape(F, 3)
        ok = v_ok.reshape(F, 3).all(axis=1)
    else:
        vx = sx[tri]
        vy = sy[tri]
        ok = v_ok[tri].all(axis=1)
    px = (vx + 1.0) * 0.5 * W - 0.5
    py = (vy + 1.0) * 0.5 * (full_h if full_h is not None else H) - 0.5 \
        - row0                                           # slab-local rows
    tx0, tx1, ex = _tile_range(px.min(axis=1), px.max(axis=1), tile_w, ntx)
    ty0, ty1, ey = _tile_range(py.min(axis=1), py.max(axis=1), tile_h, nty)
    ok = ok & ~ex & ~ey
    spanx = tx1 - tx0 + 1
    spany = ty1 - ty0 + 1

    iota_f = jnp.arange(F, dtype=jnp.int32)
    MY, MX = 8, 4                       # tier-1 span bounds (tiles)
    med_cap = min(med_cap, F)
    pool_cap = min(pool_cap, F)
    small = ok & (spanx <= 2) & (spany <= 2)
    medium = ok & ~small & (spanx <= MX) & (spany <= MY)
    big = ok & ~small & ~medium

    def expand(t0y, t0x, s_y, s_x, sel, SY, SX):
        """(T, SY*SX) pair keys for the selected triangles (T = len(sel))."""
        dy = jnp.arange(SY * SX, dtype=jnp.int32) // SX
        dx = jnp.arange(SY * SX, dtype=jnp.int32) % SX
        tyv = t0y[:, None] + dy[None]
        txv = t0x[:, None] + dx[None]
        valid = sel[:, None] & (dy[None] < s_y[:, None]) \
            & (dx[None] < s_x[:, None])
        return jnp.where(valid, tyv * ntx + txv, ntiles)

    # tier 0: every triangle, 4 slots
    keys0 = expand(ty0, tx0, spany, spanx, small, 2, 2)          # (F,4)
    vals0 = jnp.broadcast_to(iota_f[:, None], (F, 4))

    # tier 1: compact medium ids first (1-D sort of F keys), expand 32 slots
    med_sorted = jax.lax.sort(jnp.where(medium, iota_f, F),
                              is_stable=False)
    med_ids = med_sorted[:med_cap]                               # (M,)
    med_safe = jnp.minimum(med_ids, F - 1)
    keys1 = expand(ty0[med_safe], tx0[med_safe], spany[med_safe],
                   spanx[med_safe], med_ids < F, MY, MX)         # (M,32)
    vals1 = jnp.broadcast_to(med_ids[:, None], (med_cap, MY * MX))

    keys = jnp.concatenate([keys0.reshape(-1), keys1.reshape(-1)])
    vals = jnp.concatenate([vals0.reshape(-1), vals1.reshape(-1)])
    zlv = _z_sort_levels(ntiles, F) if (flat and z_cut) else 0
    if zlv:
        # pack (tile, z-bucket, id): within each tile candidates come out
        # ordered by quantized face z-min, enabling the flat kernel's
        # occlusion early-exit (see _vis_kernel_flat). id stays in the low
        # bits, preserving the ascending-id tie-break within a bucket.
        zq = _face_zmin_q(sz, tri, corner, F, zlv)
        # per-slot z buckets by BROADCAST, not zq[vals] — that 34k-row
        # gather per view measured ~12% of the whole step (row-bound);
        # tier-0 slots are iota-aligned and tier-1 needs only med_cap rows
        zq_slot = jnp.concatenate(
            [jnp.broadcast_to(zq[:, None], (F, 4)).reshape(-1),
             jnp.broadcast_to(zq[med_safe][:, None],
                              (med_cap, MY * MX)).reshape(-1)])
        code = jax.lax.sort((keys * zlv + zq_slot) * (F + 1) + vals,
                            is_stable=False)
        starts = jnp.searchsorted(
            code, jnp.arange(ntiles + 1, dtype=jnp.int32) * (zlv * (F + 1)))
        vals_s = code % (F + 1)
    elif (ntiles + 1) * (F + 1) < 2 ** 31:
        # pack (tile, id) into one int32 — a single-operand sort is ~2x a
        # two-operand sort on TPU, and tile starts fall out of searchsorted
        # on the packed code directly
        code = jax.lax.sort(keys * (F + 1) + vals, is_stable=False)
        starts = jnp.searchsorted(
            code, jnp.arange(ntiles + 1, dtype=jnp.int32) * (F + 1))
        vals_s = code % (F + 1)
    else:
        keys_s, vals_s = jax.lax.sort((keys, vals), is_stable=False,
                                      num_keys=1)
        starts = jnp.searchsorted(keys_s, jnp.arange(ntiles + 1,
                                                     dtype=jnp.int32))
    tile_counts = (starts[1:] - starts[:-1]).astype(jnp.int32)   # (ntiles,)

    # tier 2: big triangles + tier-1 overflow, walked by every tile
    n_med = jnp.sum(medium.astype(jnp.int32))
    pool = jnp.concatenate([jnp.where(big, iota_f, F),
                            med_sorted[med_cap:med_cap + pool_cap]])
    pool = jax.lax.sort(pool, is_stable=False)[:pool_cap]        # (P,)
    pool_true = jnp.sum(big.astype(jnp.int32)) \
        + jnp.maximum(n_med - med_cap, 0)
    n_pool = jnp.minimum(pool_true, pool_cap).astype(jnp.int32)

    # dropped-candidate counter: triangles beyond the tier-2 pool cap
    # vanish from EVERY tile (counted once per view); dense mode
    # additionally drops per-tile slots beyond k. Returned to the caller —
    # this function runs under vmap, where a lax.cond debug callback would
    # lower to select and fire unconditionally; the unbatched caller warns
    # (emit_overflow_warning).
    n_drop = jnp.maximum(pool_true - pool_cap, 0)

    if flat:
        counts = (n_pool + tile_counts).astype(jnp.int32)        # exact
        return (counts, starts[:-1].astype(jnp.int32),
                vals_s.astype(jnp.int32), pool, n_pool, n_drop)

    counts = jnp.minimum(n_pool + tile_counts, k).astype(jnp.int32)
    n_drop = n_drop + jnp.sum(jnp.maximum(n_pool + tile_counts - k, 0))

    j = jnp.arange(k, dtype=jnp.int32)[None, :]                  # (1,k)
    js = j - n_pool
    idx = jnp.clip(starts[:-1, None] + js, 0, keys.shape[0] - 1)
    small_vals = vals_s[idx.reshape(-1)].reshape(ntiles, k)
    pool_vals = pool[jnp.minimum(j, pool_cap - 1)]               # (1,k)
    cand = jnp.where(j < n_pool, pool_vals,
                     jnp.where((js >= 0) & (js < tile_counts[:, None]),
                               small_vals, F))
    return counts, cand, n_drop


def _prepare_candidates(pos, tri, resolution, tile_h, tile_w, k,
                        corner=False, edge_nbrs=None, shared=False,
                        row0=0, full_h=None, flat=False, z_cut=False):
    """One view: bin + candidate screen data.

    ``shared=False``: returns (counts (ntiles,) i32, data (ntiles,R,K) f32
    pre-gathered per tile, ids (ntiles,1,K) i32 — triangle id + 1).
    ``shared=True``: returns (counts, tbl (R,F+1) f32 — ONE per-triangle
    table the kernel holds in SMEM and indexes by candidate id directly,
    ids) — no per-tile gather at all (the pre-gather duplicates each
    triangle row into every overlapped tile's K-slot block; the shared
    table is F-sized).
    ``flat=True`` (implies shared table): returns (counts, starts, n_pool,
    tbl, vals, pool) — the sorted pair list itself rides SMEM next to the
    table; no (ntiles, K) array of any kind is built (the dense candidate
    materialization was an ntiles*k-row gather dominating binning cost)
    and counts are exact (no per-tile capacity).

    Structure matters: bin_triangles keeps the binning cost proportional
    to actual (triangle, tile) overlap pairs (the round-1 (F, ntiles)
    overlap matrix + full-width sort was 20x the kernel's cost), and the
    per-triangle table is built with F-sized ops.
    """
    H, W = resolution
    F = tri.shape[0]
    sx, sy, sz, v_ok = _screen(pos)
    if flat:
        counts, starts, vals, pool, n_pool, n_drop = bin_triangles(
            pos, tri, resolution, tile_h, tile_w, k, corner=corner,
            row0=row0, full_h=full_h, flat=True, z_cut=z_cut)
        cand = None
    else:
        counts, cand, n_drop = bin_triangles(pos, tri, resolution, tile_h,
                                             tile_w, k, corner=corner,
                                             row0=row0, full_h=full_h)
    if corner:
        vx = sx.reshape(F, 3)
        vy = sy.reshape(F, 3)
        ok = v_ok.reshape(F, 3).all(axis=1)
    else:
        vx = sx[tri]
        vy = sy[tri]
        ok = v_ok[tri].all(axis=1)

    # per-triangle screen table (F+1, 11 or 14); row F = invalid dummy
    if corner:
        zr = sz.reshape(F, 3)
        ax, bx, cx = vx[:, 0], vx[:, 1], vx[:, 2]
        ay, by, cy = vy[:, 0], vy[:, 1], vy[:, 2]
        z0, z1, z2 = zr[:, 0], zr[:, 1], zr[:, 2]
    else:
        ax, ay = sx[tri[:, 0]], sy[tri[:, 0]]
        bx, by = sx[tri[:, 1]], sy[tri[:, 1]]
        cx, cy = sx[tri[:, 2]], sy[tri[:, 2]]
        z0, z1, z2 = sz[tri[:, 0]], sz[tri[:, 1]], sz[tri[:, 2]]
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    ok2 = ok & (jnp.abs(area) > _AREA_EPS)
    inv_area = jnp.where(ok2, 1.0 / jnp.where(ok2, area, 1.0), 0.0)
    # row 11: the z-sort bucket LOWER bound of the face (flat mode with
    # z-ordered candidates) — the kernel's early-exit threshold. Must come
    # from the same quantizer as the sort key (_face_zmin_q).
    nty_, ntx_ = H // tile_h, W // tile_w
    zlv = _z_sort_levels(nty_ * ntx_, F) if (flat and z_cut) else 0
    if zlv:
        zlb = _face_zmin_q(sz, tri, corner, F, zlv) \
            .astype(jnp.float32) * (2.0 / zlv) - 1.0
    else:
        zlb = jnp.zeros_like(ax)
    # no separate validity column: invalid faces have inv_area == 0
    # exactly (the where() above), which the kernels' coverage test uses —
    # one fewer SMEM scalar read per candidate per tile, and 4(F+1) bytes
    # of flat-path budget
    cols = [ax, ay, bx, by, cx, cy, z0, z1, z2, inv_area, zlb]
    if edge_nbrs is not None:
        # R = 14, no pad column (the kernels read neighbor channels
        # 11..13): every dropped column is 4(F+1) bytes of SMEM — a pad
        # column is exactly what once put the 12-sphere GSO-Mario scene
        # (11016 faces) over the flat-path budget and onto the
        # ~5x-slower dense pre-gather path
        en = edge_nbrs.astype(pos.dtype)
        cols += [en[:, 0], en[:, 1], en[:, 2]]
    R = len(cols)
    if flat:
        tbl = jnp.stack(cols, axis=0)                    # (R,F)
        tbl = jnp.concatenate([tbl, jnp.zeros((R, 1), tbl.dtype)], axis=1)
        return counts, starts, n_pool, tbl, vals, pool, n_drop

    ids = (cand + 1)[:, None, :]                         # (ntiles,1,K)

    if shared:
        tbl = jnp.stack(cols, axis=0)                    # (R,F)
        tbl = jnp.concatenate([tbl, jnp.zeros((R, 1), tbl.dtype)], axis=1)
        return counts, tbl, ids, n_drop

    tbl = jnp.stack(cols, axis=-1)
    tbl = jnp.concatenate([tbl, jnp.zeros((1, R), tbl.dtype)], axis=0)
    data = tbl[cand.reshape(-1)].reshape(cand.shape[0], k, R) \
        .transpose(0, 2, 1)                              # (ntiles,R,K)
    return counts, data, ids, n_drop


def rasterize_ids_pallas(pos_clip: jnp.ndarray, tri: jnp.ndarray,
                         resolution: Tuple[int, int], tile_h: int = 8,
                         tile_w: int = 128, k: Optional[int] = None,
                         interpret: bool = False, with_z: bool = False,
                         corner: bool = False,
                         with_g=None, row0=None,
                         full_h: Optional[int] = None,
                         drops_out: Optional[list] = None):
    """Public wrapper: resolves the overflow-warning decision at TRACE time
    and passes it as a static jit arg, so TSSPLAT_OVERFLOW flips take
    effect on the next trace instead of silently doing nothing (the
    compiled-program cache otherwise never re-reads the env — ADVICE r3).

    ``drops_out``: optional list; when given, the per-view (B,) i32
    dropped-candidate-slot counters are appended to it (computed
    unconditionally — they are nearly free) so callers can thread them out
    of the program as a step OUTPUT and check them host-side on backends
    that reject debug callbacks (axon)."""
    want_drops = drops_out is not None
    out = _rasterize_ids_pallas_jit(
        pos_clip, tri, resolution=resolution, tile_h=tile_h, tile_w=tile_w,
        k=k, interpret=interpret, with_z=with_z, corner=corner,
        with_g=with_g, row0=row0, full_h=full_h,
        overflow_warn=overflow_checks_enabled(), with_drops=want_drops,
        z_cut=_z_cut_enabled())
    if want_drops:
        out, n_drop = out[:-1], out[-1]
        drops_out.append(n_drop)
        if len(out) == 1:
            return out[0]
    return out


@functools.partial(jax.jit,
                   static_argnames=("resolution", "tile_h", "tile_w", "k",
                                    "interpret", "with_z", "corner",
                                    "full_h", "overflow_warn", "with_drops",
                                    "z_cut"))
def _rasterize_ids_pallas_jit(pos_clip: jnp.ndarray, tri: jnp.ndarray,
                              resolution: Tuple[int, int], tile_h: int = 8,
                              tile_w: int = 128, k: Optional[int] = None,
                              interpret: bool = False, with_z: bool = False,
                              corner: bool = False,
                              with_g=None, row0=None,
                              full_h: Optional[int] = None,
                              overflow_warn: bool = False,
                              with_drops: bool = False,
                              z_cut: bool = False):
    """Winning (triangle id + 1) per pixel, (B,H,W) int32 — Pallas TPU path.

    Same contract and capacity heuristic as rasterize_ids_tiled; set
    ``interpret=True`` to run the kernel in interpreter mode off-TPU.
    ``with_z=True`` additionally returns the winner's z/w (B,H,W) f32.
    ``with_g=edge_nbrs`` additionally returns the winner's AA rows as TWO
    channel-major arrays: g_xy (B,6,H,W) screen-xy (reattach gradients
    with winner_screen_rows) and g_aux (B,4,H,W) edge-neighbor ids +
    orientation (non-differentiable by construction) — splitting them
    keeps the custom-VJP cotangent at 6 channels.
    ``(row0, full_h)`` rasterizes a horizontal slab: local rows map to
    absolute rows row0 + r of a full_h-tall image (row0 may be traced — it
    rides the scalar-prefetch channel into the kernel; full_h is static).
    """
    H, W = resolution
    if row0 is None:
        row0 = 0
    fh = full_h if full_h is not None else H
    assert H % tile_h == 0 and W % tile_w == 0, "resolution must tile"
    B = pos_clip.shape[0]
    F = tri.shape[0]
    if k is None:
        k = default_tile_capacity(F, (fh, W), tile_h, tile_w)
    k = min(_next_pow2(k), _next_pow2(F))
    nty, ntx = H // tile_h, W // tile_w
    ntiles = nty * ntx
    R = 11 if with_g is None else 14

    pos_clip = jax.lax.stop_gradient(pos_clip)
    # shared-table mode: the whole (R, F+1) per-triangle table fits SMEM
    # (fetched once per view — the b-index is constant across the tile
    # grid axis), and the kernel indexes it by candidate id — skipping the
    # (B, ntiles, R, K) pre-gather that duplicates each triangle row into
    # every overlapped tile
    shared_tbl = (F + 1) * R * 4 <= _SMEM_TBL_BUDGET
    # flat mode: the sorted pair list + per-view pool ride SMEM next to
    # the table; binning never materializes a dense (ntiles, K) candidate
    # matrix (that was an ntiles*k-row gather dominating binning cost) and
    # no per-tile capacity exists to drop triangles
    med_cap = min(256, F)
    pool_cap = min(64, F)
    L = 4 * F + 32 * med_cap
    # + the batch-scaled scalar-prefetch arrays (counts/starts are
    # (B*ntiles,) i32 and SMEM-resident in full): at B=8/ntiles=256 that
    # is 16 KB, but a near-budget scene with a large UNCHUNKED batch
    # would otherwise blow the 1.00 MB cap at compile time
    prefetch_bytes = (2 * B * ntiles + B + 1) * 4
    flat_bytes = ((F + 1) * R + L + pool_cap) * 4 + prefetch_bytes
    flat_mode = shared_tbl and flat_bytes <= _SMEM_TBL_BUDGET
    if not flat_mode:
        # trace-time (once per compile): the dense pre-gather fallback is
        # ~5x slower at production scale (the Mario scene sat 34 KB over
        # the ceiling and silently ran at 0.43 instead of 2.5 it/s) —
        # never let that happen quietly again
        print(f"WARNING: visibility scene ({F} faces) exceeds the "
              f"flat-binning SMEM budget ({flat_bytes // 1024} KB > "
              f"{_SMEM_TBL_BUDGET // 1024} KB) — falling back to the "
              f"~5x-slower dense pre-gather path. Reduce faces or raise "
              f"_SMEM_TBL_BUDGET if the chip allows.", flush=True)
    # double-buffer the per-view windows when BOTH copies fit (small
    # scenes): the fetch then overlaps the previous view's compute;
    # single-buffer only when the second copy would blow the 1 MB SMEM
    # (the production 8-sphere scene: 26.9 -> 50.3 it/s vs the dense
    # fallback the old budget forced)
    view_buf = None if 2 * flat_bytes <= _SMEM_TBL_BUDGET else _SINGLE_BUF

    # outputs are written in FINAL layout — the tile grid maps straight to
    # (row-block, col-block) of (B,H,W) / channel-major (B,16,H,W), so no
    # detile/transpose pass exists downstream (the (B,ntiles,16,th,tw) ->
    # (B,16,H,W) transpose alone moved 2x128 MB, ~1.2 ms/step)
    out_shapes = [jax.ShapeDtypeStruct((B, H, W), jnp.int32),
                  jax.ShapeDtypeStruct((B, H, W), jnp.float32)]
    tile_spec = pl.BlockSpec((1, tile_h, tile_w),
                             lambda b, t, *_: (b, t // ntx, t % ntx),
                             memory_space=pltpu.VMEM)
    out_specs = [tile_spec, tile_spec]
    if with_g is not None:
        out_shapes.append(jax.ShapeDtypeStruct(
            (B, 6, H, W), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 6, tile_h, tile_w),
                                      lambda b, t, *_: (b, 0, t // ntx,
                                                        t % ntx),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct(
            (B, 4, H, W), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 4, tile_h, tile_w),
                                      lambda b, t, *_: (b, 0, t // ntx,
                                                        t % ntx),
                                      memory_space=pltpu.VMEM))
    row0_arr = jnp.asarray(row0, jnp.int32).reshape(1)

    if flat_mode:
        prep = jax.vmap(lambda p: _prepare_candidates(
            p, tri, resolution, tile_h, tile_w, k, corner=corner,
            edge_nbrs=with_g, row0=row0, full_h=full_h, flat=True,
            z_cut=z_cut))
        counts, starts, npool, tbl, vals, pool, n_drop = prep(pos_clip)
        if overflow_warn:
            emit_overflow_warning(n_drop, "pallas-flat")   # unbatched here
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B, ntiles),
            in_specs=[
                # single-buffered: these windows are constant across the
                # view's whole tile grid (index_map ignores t), so a second
                # revolving buffer would only burn SMEM (1 MB total)
                pl.BlockSpec((1, R, F + 1), lambda b, t, *_: (b, 0, 0),
                             memory_space=pltpu.SMEM,
                             pipeline_mode=view_buf),
                # TPU lowering requires the last two block dims to equal
                # the array dims — ride a singleton middle axis so the
                # per-view (L,) list is a full (1, L) trailing block
                pl.BlockSpec((1, 1, L), lambda b, t, *_: (b, 0, 0),
                             memory_space=pltpu.SMEM,
                             pipeline_mode=view_buf),
                pl.BlockSpec((1, 1, pool_cap), lambda b, t, *_: (b, 0, 0),
                             memory_space=pltpu.SMEM,
                             pipeline_mode=view_buf),
            ],
            out_specs=tuple(out_specs),
        )
        kernel = functools.partial(_vis_kernel_flat, tile_h=tile_h,
                                   tile_w=tile_w, ntx=ntx, H=fh, W=W,
                                   pool_cap=pool_cap,
                                   emit_g=with_g is not None,
                                   z_sorted=z_cut
                                   and _z_sort_levels(ntiles, F) > 0)
        results = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=tuple(out_shapes),
            interpret=interpret,
        )(counts.reshape(-1), starts.reshape(-1), npool, row0_arr,
          tbl, vals[:, None, :], pool[:, None, :])
    else:
        prep = jax.vmap(lambda p: _prepare_candidates(
            p, tri, resolution, tile_h, tile_w, k, corner=corner,
            edge_nbrs=with_g, shared=shared_tbl, row0=row0,
            full_h=full_h))
        counts, data, ids, n_drop = prep(pos_clip)       # (B,ntiles,…)
        if overflow_warn:
            emit_overflow_warning(n_drop, "pallas-dense")  # unbatched here

        if shared_tbl:
            shared_buf = None if 2 * (F + 1) * R * 4 <= _SMEM_TBL_BUDGET \
                else _SINGLE_BUF
            data_spec = pl.BlockSpec((1, R, F + 1),
                                     lambda b, t, *_: (b, 0, 0),
                                     memory_space=pltpu.SMEM,
                                     pipeline_mode=shared_buf)
            data_arg = data                              # (B,R,F+1)
        else:
            data_spec = pl.BlockSpec((1, 1, R, k),
                                     lambda b, t, *_: (b, t, 0, 0),
                                     memory_space=pltpu.SMEM)
            data_arg = data.reshape(B, ntiles, R, k)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, ntiles),
            in_specs=[
                # SMEM: the K-loop reads per-candidate scalars at dynamic
                # offsets, which VMEM vector loads cannot do
                data_spec,
                pl.BlockSpec((1, 1, 1, k), lambda b, t, *_: (b, t, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=tuple(out_specs),
        )
        kern = _vis_kernel if with_g is None else _vis_kernel_g
        kernel = functools.partial(kern, tile_h=tile_h, tile_w=tile_w,
                                   ntx=ntx, H=fh, W=W,
                                   shared_tbl=shared_tbl)
        results = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=tuple(out_shapes),
            interpret=interpret,
        )(counts.reshape(-1), row0_arr, data_arg, ids)

    if with_g is not None:
        # channel-MAJOR (B,6,H,W)+(B,4,H,W): a channel slice g[:, j] keeps
        # W on the VPU lane axis; the split keeps the differentiable xy
        # channels (6) apart from the non-diff neighbor/orientation aux (4)
        out, zout, g6, gaux = results
        return (out, zout, g6, gaux, n_drop) if with_drops \
            else (out, zout, g6, gaux)
    out, zout = results
    if with_z:
        return (out, zout, n_drop) if with_drops else (out, zout)
    return (out, n_drop) if with_drops else out


# ---------------------------------------------------------------------------
# AA-backward table gradient: per-tile distinct-winner reduction
# ---------------------------------------------------------------------------

def _wsr_grad_kernel(flags_ref, ids_ref, ct_ref, out_ref, *, ca):
    """Accumulate per-pixel AA cotangents into the per-face table rows.

    One (tile_h, tile_w) tile per grid step: extract the tile's DISTINCT
    winner ids that carry a nonzero cotangent (silhouette tiles have a
    handful; most tiles have none) by iterated max-extraction, reduce each
    channel under the id's mask, and accumulate the 6-wide row into the
    (F1, 128) VMEM table at the face's row. Replaces the XLA two-stage
    compaction + sort + lax.cond + segment-sum pipeline (and its static
    caps/dense-fallback hazard) with one exact pass over ids + ct.

    ``flags_ref`` (scalar prefetch, (B*ntiles,) i32) marks tiles with any
    nonzero cotangent — inactive tiles skip the body AND collapse their
    ids/ct block fetches to tile 0 (the index-map gate), the same
    active-tile pattern as the AA halo kernels.
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(t == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(flags_ref[b * nt + t] != 0)
    def _active_tile():
        ids = ids_ref[0]                                 # (th,tw) i32
        active = ids > 0
        any_ct = ct_ref[0, 0] != 0.0
        for ch in range(1, ca):
            any_ct = any_ct | (ct_ref[0, ch] != 0.0)
        active = active & any_ct

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        # the loop-carried mask is i32, not bool: Mosaic rejects
        # loop-carried i1 vectors ("failed to legalize scf.yield")
        def cond(carry):
            act, _ = carry
            return jnp.max(act) > 0

        big = jnp.int32(1 << 28)

        def accum(cur, act):
            m = (act > 0) & (ids == cur)
            mf = m.astype(jnp.float32)
            # 16 faces pack into each 128-lane row (8 lanes per face
            # slot) — the VMEM face table is F/16 rows instead of F (a
            # dense (F,128) row-per-face table at 50k+ faces would blow
            # VMEM)
            slot = ((cur - 1) % 16) * 8
            row = jnp.zeros((1, 128), jnp.float32)
            for ch in range(ca):
                s = jnp.sum(ct_ref[0, ch] * mf)
                row = row + jnp.where(lane == slot + ch, s, 0.0)
            out_ref[0, pl.ds((cur - 1) // 16, 1), :] += row
            return jnp.where(ids == cur, 0, act)

        def body(carry):
            act, n = carry
            # extract TWO distinct ids per trip (the tile max and min of
            # the remaining actives) — halves the serial trips whenever
            # more than one distinct silhouette face remains
            cur_hi = jnp.max(jnp.where(act > 0, ids, 0))
            cur_lo = jnp.min(jnp.where(act > 0, ids, big))
            act = accum(cur_hi, act)
            act = jax.lax.cond(cur_lo < cur_hi,
                               lambda a: accum(cur_lo, a),
                               lambda a: a, act)
            return act, n + 1

        jax.lax.while_loop(cond, body,
                           (active.astype(jnp.int32), jnp.int32(0)))


def wsr_table_grad_pallas(ids: jnp.ndarray, ct6: jnp.ndarray, F: int,
                          tile_h: int = 0, tile_w: int = 128,
                          interpret: bool = False) -> jnp.ndarray:
    """(B,H,W) winner ids + channel-major (B,CA,H,W) cotangents ->
    (B, F+1, CA) per-face summed cotangents (row F, the background/dummy
    row, is never written — background pixels carry no AA cotangent by
    construction of the owner selection in _aa_pairs).

    tile_h=0 auto-picks the largest of {32,16,8} dividing H: a face
    crossing several 8-row tiles is one while-loop iteration in a 32-row
    tile, and fewer grid steps amortize the per-tile block DMA (measured
    2.9 -> 2.4 ms at 8x512^2 on v5e; beyond 32 rows the per-iteration
    tile-wide reduces start paying the win back)."""
    B, CA, H, W = ct6.shape
    if tile_h == 0:
        tile_h = next((th for th in (32, 16, 8) if H % th == 0), 0)
        if tile_h == 0:
            raise ValueError(
                f"wsr_table_grad_pallas: H={H} is not divisible by any "
                f"supported tile height (32, 16, 8) — pad the image or "
                f"pass an explicit tile_h dividing H")
    assert CA <= 8 and H % tile_h == 0 and W % tile_w == 0
    nty, ntx = H // tile_h, W // tile_w
    nt = nty * ntx
    # 16 faces per 128-lane row; row count sublane-aligned
    R = (((F + 1 + 15) // 16 + 7) // 8) * 8

    # per-tile activity flags: AA cotangents live only on silhouette
    # tiles, so inactive tiles (the vast majority) skip the extraction
    # loop AND their block DMA entirely (gated index maps below)
    flags = jnp.any(ct6 != 0.0, axis=1) \
        .reshape(B, nty, tile_h, ntx, tile_w).any(axis=(2, 4)) \
        .reshape(B * nt).astype(jnp.int32)

    def gate(b, t, f):
        act = f[b * nt + t] != 0
        return (jnp.where(act, t // ntx, 0), jnp.where(act, t % ntx, 0))

    out = pl.pallas_call(
        functools.partial(_wsr_grad_kernel, ca=CA),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nt),
            in_specs=[
                pl.BlockSpec((1, tile_h, tile_w),
                             lambda b, t, f: (b,) + gate(b, t, f),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, CA, tile_h, tile_w),
                             lambda b, t, f: (b, 0) + gate(b, t, f),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, R, 128), lambda b, t, f: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((B, R, 128), jnp.float32),
        interpret=interpret,
    )(flags, ids, ct6)
    # unpack: (B,R,128) -> (B,R,16,8) face slots -> (B,R*16,8)
    return out.reshape(B, R, 16, 8).reshape(B, R * 16, 8)[:, :F + 1, :CA]


# ---------------------------------------------------------------------------
# Antialias halo kernel: active-tile silhouette AA (forward + backward)
# ---------------------------------------------------------------------------
#
# The XLA antialias chain evaluates the 3-edge crossing selection on EVERY
# adjacent pixel pair although only ~1% straddle a silhouette; XLA-level
# sparsification measured 5x SLOWER (blockify transposes + row gathers,
# CLAUDE.md). Pallas block indexing slices (1, 8, 128) tiles straight out
# of the native (B, H, W) layout, and a prefetched per-tile activity flag
# lets inactive tiles (a) skip the pair math entirely and (b) collapse
# their expensive input fetches (z, g6, gaux, ct) to block 0 — consecutive
# inactive tiles then re-use the cached block with no DMA. Tile-boundary
# pairs (the a-pixel columns 127::128 and rows 7::8) are evaluated by a
# cheap dense XLA pass on strided slices (ops/rasterize.py
# _aa_boundary_deltas) — ~6% of all pairs — so the kernel needs NO halo
# fetches at all. Semantics match ops/rasterize._aa_pairs exactly
# (tests/test_aa_halo.py diffs fwd AND grads against the dense chain).


def _aa_pair_core(id_a, id_b, z_a, z_b, col_a, col_b, g_a, g_b,
                  aux_a, aux_b, pax, pay, pbx, pby):
    """One axis of pixel-pair AA deltas on tile-local arrays — the exact
    math of ops/rasterize._aa_pairs with channel tuples instead of a
    channel-major array axis (kernel-friendly: every value stays a full
    (th, tw) VPU tile). g_*: 6-tuples (ax,bx,cx,ay,by,cy); aux_*: 4-tuples
    (nbr0,nbr1,nbr2,sign). Returns (delta_a, delta_b)."""
    differ = (id_a != id_b) & ((id_a > 0) | (id_b > 0))
    # boolean algebra, not where-with-scalar-bools: Mosaic rejects select_n
    # on Python bool literals ("Unsupported target bitwidth for truncation")
    owner_a = (id_a != 0) & ((id_b == 0) | (z_a <= z_b))
    other_tri = jnp.where(owner_a, id_b, id_a) - 1

    def oc(j):
        return jnp.where(owner_a, g_a[j], g_b[j])

    def oa(j):
        return jnp.where(owner_a, aux_a[j], aux_b[j])

    vx0, vx1, vx2 = oc(0), oc(1), oc(2)
    vy0, vy1, vy2 = oc(3), oc(4), oc(5)
    sgn = oa(3)

    def edge(x0, y0, x1, y1, X, Y):
        return ((x1 - x0) * (Y - y0) - (y1 - y0) * (X - x0)) * sgn

    def crossing(x0, y0, x1, y1):
        sa = edge(x0, y0, x1, y1, pax, pay)
        sb = edge(x0, y0, x1, y1, pbx, pby)
        denom = sa - sb
        safe = jnp.where(jnp.abs(denom) > 1e-20, denom, 1.0)
        t_all = sa / safe
        t_exit = jnp.where((sa >= 0) & (sb < 0), t_all, _INF)
        t_entry = jnp.where((sa < 0) & (sb >= 0), t_all, -_INF)
        return t_exit, t_entry

    te0, tn0 = crossing(vx0, vy0, vx1, vy1)
    te1, tn1 = crossing(vx1, vy1, vx2, vy2)
    te2, tn2 = crossing(vx2, vy2, vx0, vy0)

    def pick3(v0, v1, v2, better):
        k01 = jnp.where(better(v1, v0), 1, 0)
        b01 = jnp.where(better(v1, v0), v1, v0)
        k = jnp.where(better(v2, b01), 2, k01)
        return jnp.where(better(v2, b01), v2, b01), k

    te, k_exit = pick3(te0, te1, te2, lambda x, y: x < y)
    tn, k_entry = pick3(tn0, tn1, tn2, lambda x, y: x > y)

    k = jnp.where(owner_a, k_exit, k_entry)
    t = jnp.where(owner_a, te, tn)
    found = jnp.isfinite(t)

    nbr = jnp.where(k == 0, oa(0), jnp.where(k == 1, oa(1), oa(2)))
    # ((owner_a & b_fg) | (~owner_a & a_fg)) instead of an i1 select —
    # Mosaic rejects select_n producing i1 vectors (same class as above)
    other_fg = (owner_a & (id_b > 0)) | (~owner_a & (id_a > 0))
    shared = (nbr == other_tri.astype(nbr.dtype)) & (other_tri >= 0) & \
        other_fg

    valid = differ & found & ~shared
    t = jnp.clip(jnp.where(valid, t, 0.5), 0.0, 1.0)
    w_a = jnp.maximum(0.5 - t, 0.0) * valid
    w_b = jnp.maximum(t - 0.5, 0.0) * valid
    delta_a = (col_b - col_a) * w_a
    delta_b = (col_a - col_b) * w_b
    return delta_a, delta_b


def _tile_interior_delta(ids, z, g, aux, px, py, dx, dy, th, tw):
    """Summed AA delta of all pairs fully interior to one (th, tw) tile.

    ids/z/px/py: (th, tw); g: 6-tuple, aux: 4-tuple of (th, tw).
    dx/dy: NDC pixel pitch. Boundary pairs (a at col tw-1 or row th-1)
    are excluded — the XLA boundary pass owns them."""
    fg = (ids > 0).astype(z.dtype)

    def sl(x):      # value at (r, c+1); col tw-1 garbage (masked out)
        return jnp.concatenate([x[:, 1:], x[:, :1]], axis=1)

    def sr(x):      # shift right one col, zero-fill
        return jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, :-1]],
                               axis=1)

    def su(x):      # value at (r+1, c); row th-1 garbage (masked out)
        return jnp.concatenate([x[1:], x[:1]], axis=0)

    def sd(x):      # shift down one row, zero-fill
        return jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)

    col = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0)
    maskc = (col < tw - 1).astype(z.dtype)
    maskr = (row < th - 1).astype(z.dtype)

    da, db = _aa_pair_core(
        ids, sl(ids), z, sl(z), fg, sl(fg),
        g, tuple(sl(c) for c in g), aux, tuple(sl(c) for c in aux),
        px, py, px + dx, py)
    delta = da * maskc + sr(db * maskc)

    da, db = _aa_pair_core(
        ids, su(ids), z, su(z), fg, su(fg),
        g, tuple(su(c) for c in g), aux, tuple(su(c) for c in aux),
        px, py, px, py + dy)
    return delta + da * maskr + sd(db * maskr)


def _aa_halo_fwd_kernel(flags_ref, ids_ref, z_ref, g6_ref, gaux_ref,
                        out_ref, *, th, tw, ntx, H, W):
    b = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    ids = ids_ref[0]
    fg = (ids > 0).astype(jnp.float32)

    @pl.when(flags_ref[b * nt + t] == 0)
    def _passthrough():
        out_ref[0] = fg

    @pl.when(flags_ref[b * nt + t] != 0)
    def _active():
        ty = t // ntx
        tx = t % ntx
        row = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) \
            .astype(jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) \
            .astype(jnp.float32)
        py = ((ty * th).astype(jnp.float32) + row + 0.5) / H * 2.0 - 1.0
        px = ((tx * tw).astype(jnp.float32) + col + 0.5) / W * 2.0 - 1.0
        g = tuple(g6_ref[0, j] for j in range(6))
        aux = tuple(gaux_ref[0, j] for j in range(4))
        delta = _tile_interior_delta(ids, z_ref[0], g, aux, px, py,
                                     2.0 / W, 2.0 / H, th, tw)
        out_ref[0] = fg + delta


def _aa_halo_bwd_kernel(flags_ref, ids_ref, z_ref, g6_ref, gaux_ref, ct_ref,
                        dg_ref, *, th, tw, ntx, H, W):
    b = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(flags_ref[b * nt + t] == 0)
    def _inactive():
        dg_ref[0] = jnp.zeros((6, th, tw), jnp.float32)

    @pl.when(flags_ref[b * nt + t] != 0)
    def _active():
        ids = ids_ref[0]
        ty = t // ntx
        tx = t % ntx
        row = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) \
            .astype(jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) \
            .astype(jnp.float32)
        py = ((ty * th).astype(jnp.float32) + row + 0.5) / H * 2.0 - 1.0
        px = ((tx * tw).astype(jnp.float32) + col + 0.5) / W * 2.0 - 1.0
        aux = tuple(gaux_ref[0, j] for j in range(4))
        z = z_ref[0]

        def f(g6):
            g = tuple(g6[j] for j in range(6))
            return _tile_interior_delta(ids, z, g, aux, px, py,
                                        2.0 / W, 2.0 / H, th, tw)

        _, vjp = jax.vjp(f, g6_ref[0])
        (d_g,) = vjp(ct_ref[0])
        dg_ref[0] = d_g


def _aa_tile_specs(ntx, nt, th, tw):
    """Tile BlockSpecs shared by the halo fwd/bwd kernels. ``full3/full4``
    visit tile (ty, tx) of a (B,H,W) / (B,C,H,W) array; ``gated3/gated4``
    collapse INACTIVE tiles to block 0 so consecutive inactive tiles
    re-use the fetched block with no DMA (flags ride scalar prefetch)."""
    def gate(b, t, flags):
        act = flags[b * nt + t] != 0
        return (jnp.where(act, t // ntx, 0), jnp.where(act, t % ntx, 0))

    def spec(c, index_map):
        shape = (1, th, tw) if c is None else (1, c, th, tw)
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    return {
        "full3": spec(None, lambda b, t, f: (b, t // ntx, t % ntx)),
        "gated3": spec(None, lambda b, t, f: (b,) + gate(b, t, f)),
        "gated6": spec(6, lambda b, t, f: (b, 0) + gate(b, t, f)),
        "gated4": spec(4, lambda b, t, f: (b, 0) + gate(b, t, f)),
        "full6": spec(6, lambda b, t, f: (b, 0, t // ntx, t % ntx)),
    }


def aa_halo_forward(flags, ids, z, g6, gaux, th=8, tw=128,
                    interpret=False):
    """(B,H,W) antialiased silhouette coverage from tile-INTERIOR pairs:
    fg + in-tile deltas (add _aa_boundary_deltas for the full image).
    ``flags`` (B*ntiles,) i32 marks tiles with any active interior pair."""
    B, H, W = ids.shape
    nty, ntx = H // th, W // tw
    nt = nty * ntx
    sp = _aa_tile_specs(ntx, nt, th, tw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[
            sp["full3"],                                  # ids: always
            sp["gated3"],                                 # z: actives only
            sp["gated6"],                                 # g6
            sp["gated4"],                                 # gaux
        ],
        out_specs=sp["full3"],
    )
    kernel = functools.partial(_aa_halo_fwd_kernel, th=th, tw=tw, ntx=ntx,
                               H=H, W=W)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        interpret=interpret,
    )(flags, ids, z, g6, gaux)


def aa_halo_backward(flags, ids, z, g6, gaux, ct, th=8, tw=128,
                     interpret=False):
    """d_g6 (B,6,H,W) of the tile-interior deltas under cotangent ``ct``
    (B,H,W) — inactive tiles write zeros and fetch nothing."""
    B, H, W = ids.shape
    nty, ntx = H // th, W // tw
    nt = nty * ntx
    sp = _aa_tile_specs(ntx, nt, th, tw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[
            sp["gated3"],                                 # ids
            sp["gated3"],                                 # z
            sp["gated6"],                                 # g6
            sp["gated4"],                                 # gaux
            sp["gated3"],                                 # ct
        ],
        out_specs=sp["full6"],
    )
    kernel = functools.partial(_aa_halo_bwd_kernel, th=th, tw=tw, ntx=ntx,
                               H=H, W=W)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 6, H, W), jnp.float32),
        interpret=interpret,
    )(flags, ids, z, g6, gaux, ct)
