"""Pallas TPU kernel for the dense all-pairs intersection, with
tile-granular spatial culling — the TPU-native replacement for per-thread
BVH traversal.

Same math as ops/dense.py (world-space per-instance-triangle coefficients,
see `models/scene.py:_dense_coefficients`) but hand-scheduled for the TPU
memory hierarchy:

- the whole coefficient table (up to ~64k instance-triangles) is
  VMEM-resident and reused across every ray tile (constant index_map);
- rays are tiled onto the 128-wide lane dimension, triangle chunks onto the
  sublane dimension, so each (TC, TR) test block is a pure VPU broadcast
  pattern with zero gathers;
- **chunk culling**: per (ray tile, triangle chunk) an XLA-precomputed
  predicate says whether ANY ray in the tile enters the AABB of the chunk's
  owning object(s); dead chunks are skipped with `@pl.when`.  This is packet
  traversal restructured for a vector machine — coherence replaces per-lane
  stackless walks (SURVEY.md §7 hard part #1), and per-tile work scales with
  the objects a tile actually sees instead of the whole scene;
- bf16 coefficients widen to fp32 at the multiply (bf16 storage, fp32
  accumulate); the z-row/t always uses the fp32 shadow coefficients
  (`rt/rtrt/cuda.hpp:234-240`);
- closest hit tracked in the output refs (min-reduce + winner-mask, no
  argmin gathers).

The dtype error-band + fp32 re-test ('both') is evaluated unconditionally:
on a 128-lane vector unit the band is almost always non-empty somewhere in
the tile, so predication there would rarely pay.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from low_precision_raytracer_tpu.config import Precision
from low_precision_raytracer_tpu.ops.traversal import Hit

F32 = jnp.float32

TR = 512  # rays per tile (lane axis, multiple of 128).  Measured: bigger
# tiles do NOT pay — 4096-ray tiles run 1.3x SLOWER on a 1-chunk scene
# (24.6 vs 18.7 ms / 2.07M coherent rays) and compile 10x slower; the
# per-tile fixed cost is small against the VPU body even at 1 chunk.
# triangles per chunk (sublane axis) — single source of truth lives next to
# the host-side chunk-AABB precompute
from low_precision_raytracer_tpu.models.scene import DENSE_CHUNK_TRIS as TC  # noqa: E402
MAXC = 512  # max compacted active chunks per tile; the adaptive per-tile
# budget (SMEM ~1MB / n_tiles) is usually the binding cap at high ray
# counts — e.g. 54 ids/tile at 1080p — but small grids on chunk-heavy
# scenes need the headroom (overflow falls back to iterating every chunk)


def _kernel(
    active_ref,  # (G + G*maxc/2,) i32: [counts | packed i16 chunk ids]
    *refs,
    n_chunks: int,
    maxc: int,
    d1: float,
    d2: float,
    fallback: str,
    is_f32: bool,
    find_any: bool,
    stream: bool = False,
    tc: int = TC,
):
    """Resident mode (stream=False): the five coefficient tables are whole
    VMEM refs.  Streaming mode (stream=True): ONE lane-padded f32 table
    (TIp, 128) stays in HBM and each active chunk's (TC, 128) slab is
    DMA'd into a VMEM scratch on demand — lifts the VMEM cap on scene
    size (column layout: n_dt 0:9 | n_f32 9:18 | e 18:21 | tri 21 |
    obj 22; tri/obj ride as exact f32 integers)."""
    if stream:
        (tbl_hbm, o_ref, d_ref, skip_ref, mind_ref, maxd_ref,
         t_out, u_out, v_out, tri_out, obj_out, scratch, sem) = refs
    else:
        (n_dt_ref,  # (TI, 9) dtype   rows 0,1 used
         n_f32_ref,  # (TI, 9) f32    all rows
         e_ref,  # (TI, 3) f32
         tri_ref,  # (TI, 1) i32
         obj_ref,  # (TI, 1) i32
         o_ref,  # (3, TR) f32 (recentered)
         d_ref,  # (3, TR) f32
         skip_ref,  # (1, TR) i32
         mind_ref,  # (1, TR) f32
         maxd_ref,  # (1, TR) f32
         t_out,  # (1, TR) f32 — double as running-best accumulators
         u_out,
         v_out,
         tri_out,  # (1, TR) i32
         obj_out) = refs
    tr = o_ref.shape[1]  # rays per tile (static block shape: TR or BIG_TR)
    ox = o_ref[0:1, :]
    oy = o_ref[1:2, :]
    oz = o_ref[2:3, :]
    dx = d_ref[0:1, :]
    dy = d_ref[1:2, :]
    dz = d_ref[2:3, :]
    skip = skip_ref[0:1, :]
    mind = mind_ref[0:1, :]
    maxd = maxd_ref[0:1, :]

    d12 = jnp.float32(d1 + d2)
    d1f = jnp.float32(d1)

    t_out[:, :] = jnp.full((1, tr), 1e5, F32)
    u_out[:, :] = jnp.zeros((1, tr), F32)
    v_out[:, :] = jnp.zeros((1, tr), F32)
    tri_out[:, :] = jnp.full((1, tr), -1, jnp.int32)
    obj_out[:, :] = jnp.full((1, tr), -1, jnp.int32)

    i = pl.program_id(0)
    g_total = pl.num_programs(0)
    count = active_ref[i]
    # count < 0 encodes overflow: run every chunk
    n_iter = jnp.where(count < 0, n_chunks, count)
    ids_base = g_total + i * maxc
    # word layout: low id_bits = chunk id, high bits = truncated f32 bit
    # pattern of the tile's conservative slab-entry distance to the chunk
    # (positive floats compare like their bit patterns; truncation rounds
    # DOWN, so the decoded tmin never exceeds the true entry distance)
    id_bits = max(1, (n_chunks - 1).bit_length())
    id_mask = (1 << id_bits) - 1

    def word_at(j):
        return active_ref[ids_base + jnp.minimum(j, maxc - 1)]

    def chunk_tmin_bits(j):
        """Truncated f32 BIT PATTERN of the conservative entry distance of
        the j-th nearest active chunk (0 on overflow tiles — no early
        exit).  Comparisons happen in the integer bit domain: positive
        floats order like their bit patterns, and Mosaic has no scalar
        i32->f32 bitcast."""
        return jnp.where(count < 0, 0, word_at(j) & ~id_mask)

    def chunk_body(j, _):
        decoded = word_at(j) & id_mask
        c = jnp.where(count < 0, j, decoded)
        if True:
            sl = pl.ds(c * tc, tc)
            if stream:
                cp = pltpu.make_async_copy(tbl_hbm.at[sl, :], scratch, sem)
                cp.start()
                cp.wait()
                n_dt = scratch[:, 0:9]  # pre-rounded to the render dtype
                n_f = scratch[:, 9:18]
                e = scratch[:, 18:21]
                tri = scratch[:, 21:22].astype(jnp.int32)  # (TC, 1)
                obj = scratch[:, 22:23].astype(jnp.int32)
            else:
                n_dt = n_dt_ref[sl, :].astype(F32)  # bf16 storage -> f32 math
                n_f = n_f32_ref[sl, :]
                e = e_ref[sl, :]
                tri = tri_ref[sl, :]  # (TC, 1)
                obj = obj_ref[sl, :]

            def row(nmat, k, e_col):
                o_val = (
                    nmat[:, 3 * k : 3 * k + 1] * ox
                    + nmat[:, 3 * k + 1 : 3 * k + 2] * oy
                    + nmat[:, 3 * k + 2 : 3 * k + 3] * oz
                    + e_col
                )
                d_val = (
                    nmat[:, 3 * k : 3 * k + 1] * dx
                    + nmat[:, 3 * k + 1 : 3 * k + 2] * dy
                    + nmat[:, 3 * k + 2 : 3 * k + 3] * dz
                )
                return o_val, d_val

            Ox, Dx = row(n_dt, 0, e[:, 0:1])
            Oy, Dy = row(n_dt, 1, e[:, 1:2])
            Oz, Dz = row(n_f, 2, e[:, 2:3])  # z row always fp32

            t = -Oz / Dz  # (TC, TR)
            t_dx = t * Dx
            t_dy = t * Dy
            u = Ox + t_dx
            v = Oy + t_dy

            def arow(nmat, k, e_col):
                a = (
                    jnp.abs(nmat[:, 3 * k : 3 * k + 1]) * jnp.abs(ox)
                    + jnp.abs(nmat[:, 3 * k + 1 : 3 * k + 2]) * jnp.abs(oy)
                    + jnp.abs(nmat[:, 3 * k + 2 : 3 * k + 3]) * jnp.abs(oz)
                    + jnp.abs(e_col)
                )
                b = (
                    jnp.abs(nmat[:, 3 * k : 3 * k + 1]) * jnp.abs(dx)
                    + jnp.abs(nmat[:, 3 * k + 1 : 3 * k + 2]) * jnp.abs(dy)
                    + jnp.abs(nmat[:, 3 * k + 2 : 3 * k + 3]) * jnp.abs(dz)
                )
                return a, b

            s_ox, s_dx = arow(n_dt, 0, e[:, 0:1])
            s_oy, s_dy = arow(n_dt, 1, e[:, 1:2])
            error_u = (d12 * s_ox + t * d12 * s_dx + d1f * (jnp.abs(Ox) + 3 * jnp.abs(t_dx))) * 0.2
            error_v = (d12 * s_oy + t * d12 * s_dy + d1f * (jnp.abs(Oy) + 3 * jnp.abs(t_dy))) * 0.2

            w = 1.0 - u - v
            in_band = lambda x, err: (x >= -err) & (x <= 0)
            ambiguous = in_band(u, error_u) | in_band(v, error_v) | in_band(w, error_u + error_v)
            dtype_accept = (u > -error_u) & (v > -error_v) & (u + v < 1 + error_u + error_v)

            if fallback == "both" and not is_f32:
                Ox32, Dx32 = row(n_f, 0, e[:, 0:1])
                Oy32, Dy32 = row(n_f, 1, e[:, 1:2])
                u32 = Ox32 + t * Dx32
                v32 = Oy32 + t * Dy32
                ok32 = (u32 > 0) & (v32 > 0) & (u32 + v32 < 1)
                u_sel = jnp.where(ambiguous, u32, u)
                v_sel = jnp.where(ambiguous, v32, v)
                accept_geom = (ambiguous & ok32) | (~ambiguous & dtype_accept)
            elif fallback == "both":
                strict = (u > 0) & (v > 0) & (u + v < 1)
                u_sel, v_sel = u, v
                accept_geom = (ambiguous & strict) | (~ambiguous & dtype_accept)
            else:
                u_sel, v_sel = u, v
                accept_geom = dtype_accept

            accept = (
                accept_geom
                & (t > mind)
                & (t < maxd)
                & (tri != skip)
                & jnp.isfinite(t)
            )

            t_masked = jnp.where(accept, t, jnp.inf)
            t_min = jnp.min(t_masked, axis=0, keepdims=True)  # (1, TR)
            at_min = t_masked == t_min
            big = jnp.int32(2**30)
            tri_win = jnp.min(jnp.where(at_min, tri, big), axis=0, keepdims=True)
            win = at_min & (tri == tri_win)
            neg = jnp.float32(-3e38)
            u_win = jnp.max(jnp.where(win, u_sel, neg), axis=0, keepdims=True)
            v_win = jnp.max(jnp.where(win, v_sel, neg), axis=0, keepdims=True)
            obj_win = jnp.max(jnp.where(win, obj, -1), axis=0, keepdims=True)

            better = jnp.isfinite(t_min) & (t_min < t_out[:, :])
            t_out[:, :] = jnp.where(better, t_min, t_out[:, :])
            u_out[:, :] = jnp.where(better, u_win, u_out[:, :])
            v_out[:, :] = jnp.where(better, v_win, v_out[:, :])
            tri_out[:, :] = jnp.where(better, tri_win, tri_out[:, :])
            obj_out[:, :] = jnp.where(better, obj_win, obj_out[:, :])
        return 0

    # branchless sparse iteration with ORDERED early termination: the
    # per-tile chunk list arrives sorted by conservative entry distance, so
    # the walk stops as soon as no live lane can improve on its current
    # best inside the next (hence any remaining) chunk — the dense-kernel
    # analogue of ordered BVH traversal, and the reason bounce rays on big
    # scenes don't pay for the whole candidate list.  (Fine-grained
    # per-chunk @pl.when branching costs ~1us/branch; one while_loop
    # condition per chunk does not.)
    def w_body(j):
        chunk_body(j, 0)
        return j + 1

    as_bits = lambda v: jax.lax.bitcast_convert_type(v, jnp.int32)
    if n_chunks == 1 and not find_any:
        # nothing to exit early from; skip the per-iteration cond
        jax.lax.fori_loop(0, n_iter, chunk_body, 0)
    elif find_any:
        # any-hit rays (shadows): a lane is done at its FIRST hit; dead
        # lanes (maxd <= mind, e.g. invalid command slots) count as done
        def w_cond(j):
            live = (
                (tri_out[:, :] < 0)
                & (maxd > mind)
                & (chunk_tmin_bits(j) < as_bits(jnp.maximum(maxd, 0.0)))
            )
            return (j < n_iter) & jnp.any(live)

        jax.lax.while_loop(w_cond, w_body, jnp.int32(0))
    else:
        def w_cond(j):
            cap = jnp.maximum(jnp.minimum(t_out[:, :], maxd), 0.0)
            improvable = (maxd > mind) & (chunk_tmin_bits(j) < as_bits(cap))
            return (j < n_iter) & jnp.any(improvable)

        jax.lax.while_loop(w_cond, w_body, jnp.int32(0))


BLOCK_H, BLOCK_W = 8, 64  # screen-space ray tile (= TR rays), keeps tiles
# spatially compact so the chunk culling sees few objects per tile


def to_blocks(x, H: int, W: int):
    """Reorder scan-order pixel rays into (BLOCK_H x BLOCK_W) screen-block
    order (pure reshapes/transposes, no gathers).  x: (k*H*W, ...) ->
    same shape, block-major."""
    lead = x.shape[0] // (H * W)
    tail = x.shape[1:]
    y = x.reshape(lead, H // BLOCK_H, BLOCK_H, W // BLOCK_W, BLOCK_W, *tail)
    y = jnp.swapaxes(y, 2, 3)
    return y.reshape(x.shape)


def from_blocks(x, H: int, W: int):
    """Inverse of to_blocks."""
    lead = x.shape[0] // (H * W)
    tail = x.shape[1:]
    y = x.reshape(lead, H // BLOCK_H, W // BLOCK_W, BLOCK_H, BLOCK_W, *tail)
    y = jnp.swapaxes(y, 2, 3)
    return y.reshape(x.shape)


def blockable(R: int, tile_hw) -> bool:
    if tile_hw is None:
        return False
    H, W = tile_hw
    return (
        R % (H * W) == 0
        and H % BLOCK_H == 0
        and W % BLOCK_W == 0
        and (BLOCK_H * BLOCK_W) == TR
    )


def _chunk_object_matrix(obj_layout, ti_padded: int):
    """Static (NC, O) 0/1 matrix: chunk c covers object o.  Chunks are
    contiguous instance-triangle ranges of TC; instances are laid out
    object-by-object in `_dense_coefficients`."""
    nc = ti_padded // TC
    n_obj = len(obj_layout)
    m = np.zeros((nc, n_obj), np.float32)
    pos = 0
    for o, (_mesh, t0, t1) in enumerate(obj_layout):
        n = t1 - t0
        if n == 0:
            continue
        first = pos // TC
        last = (pos + n - 1) // TC
        m[first : last + 1, o] = 1.0
        pos += n
    return m


def _chunk_predicates(frame, origins_f32, dirs_f32, min_dist, max_dist, grid, r_pad):
    """XLA-side tile-granular chunk predicates: (grid, NCp) i32.

    A chunk is active for a ray tile iff ANY ray in the tile enters the
    world AABB of any object the chunk covers (slab test with the scene
    slop, like the reference's TLAS leaf test)."""
    o = origins_f32  # (Rp, 3)
    d = dirs_f32
    inv = 1.0 / d
    big = jnp.float32(3e38)

    def obj_hit(args):
        lo, hi = args  # (3,)
        t1 = (lo[None, :] - o) * inv
        t2 = (hi[None, :] - o) * inv
        a = jnp.minimum(t1, t2)
        b = jnp.maximum(t1, t2)
        fin = jnp.isfinite(a) & jnp.isfinite(b)
        tmin = jnp.max(jnp.where(fin, a, -big), axis=-1)
        tmax = jnp.min(jnp.where(fin, b, big), axis=-1)
        hit = (
            jnp.any(fin, axis=-1)
            & (tmin <= tmax + 0.02)
            & (0 <= tmax + 0.02)
            & (tmin < max_dist)
            & (tmax > min_dist)
        )  # (Rp,)
        return jnp.any(hit.reshape(grid, TR), axis=1)  # (G,)

    tile_obj = jax.lax.map(
        obj_hit, (frame.obj_aabb_lo, frame.obj_aabb_hi)
    ).T.astype(jnp.float32)  # (G, O)

    m = _chunk_object_matrix(frame.obj_layout, r_pad)
    chunk_obj = jnp.asarray(m)  # (NC, O) static constant
    active = jnp.dot(tile_obj, chunk_obj.T, preferred_element_type=F32) > 0

    if frame.dense_chunk_lo is not None:
        hit, tmin = _tile_chunk_predicates(frame, o, d, min_dist, max_dist, grid)
        active = active & hit
    else:
        tmin = jnp.zeros(active.shape, jnp.float32)
    return active.astype(jnp.int32), tmin


def _tile_chunk_predicates(frame, o, d, min_dist, max_dist, grid):
    """Conservative (G, NC) tile-frustum vs chunk-AABB test via interval
    arithmetic: per tile, bound live-ray origins/directions componentwise,
    then slab-test every chunk AABB against the whole interval bundle.
    Strictly conservative — an axis whose direction interval straddles zero
    contributes no constraint; dead lanes (max_dist <= min_dist) don't
    widen the bounds.  Chunk AABBs subdivide big objects, so this culls far
    tighter than the per-object test for multi-chunk meshes."""
    big = jnp.float32(3e38)
    live = (max_dist > min_dist).reshape(grid, TR, 1)

    def bound(x, up):
        x = x.reshape(grid, TR, 3)
        if up:
            return jnp.max(jnp.where(live, x, -big), axis=1)  # (G, 3)
        return jnp.min(jnp.where(live, x, big), axis=1)

    olo, ohi = bound(o, False), bound(o, True)
    dlo, dhi = bound(d, False), bound(d, True)
    any_live = jnp.any(live[:, :, 0], axis=1)  # (G,)
    t_hi = jnp.max(jnp.where(live[:, :, 0], max_dist.reshape(grid, TR), 0.0), axis=1)

    straddle = (dlo <= 0) & (dhi >= 0)  # (G, 3)
    inv_a = 1.0 / jnp.where(straddle, 1.0, dlo)
    inv_b = 1.0 / jnp.where(straddle, 1.0, dhi)

    lo = frame.dense_chunk_lo  # (NC, 3)
    hi = frame.dense_chunk_hi

    # numerator intervals per axis: (box_plane - origin) over both planes
    # and the origin interval -> [n_lo, n_hi]
    n_lo = lo[None] - ohi[:, None]  # (G, NC, 3)
    n_hi = hi[None] - olo[:, None]
    # interval product [n_lo, n_hi] x [inv_a, inv_b]: 4 corner products
    p1 = n_lo * inv_a[:, None]
    p2 = n_lo * inv_b[:, None]
    p3 = n_hi * inv_a[:, None]
    p4 = n_hi * inv_b[:, None]
    t_lo = jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4))
    t_hi_ax = jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4))
    # straddling axes constrain nothing UNLESS the origin interval is
    # entirely outside the slab on that axis (then rays may still enter —
    # keep it unconstrained; conservative)
    t_lo = jnp.where(straddle[:, None], -big, t_lo)
    t_hi_ax = jnp.where(straddle[:, None], big, t_hi_ax)
    tmin = jnp.max(t_lo, axis=-1)  # (G, NC)
    tmax = jnp.min(t_hi_ax, axis=-1)
    slop = jnp.float32(0.02)  # scene-level slab slop, like the object test
    hit = (tmin <= tmax + slop) & (tmax + slop >= 0) & (tmin < t_hi[:, None])
    # conservative non-negative entry distance per (tile, chunk): feeds the
    # kernel's ordered early termination (slop keeps it a lower bound)
    return hit & any_live[:, None], jnp.maximum(tmin - slop, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("prec", "fallback", "find_any", "cull", "tile_hw", "interpret", "stream"),
)
def trace_rays_dense_pallas(
    scene,
    frame,
    origins,
    directions,
    *,
    prec: Precision,
    fallback: str = "both",
    skip_tri=None,
    min_dist=0.0,
    max_dist=1e5,
    find_any: bool = False,  # dense computes all pairs anyway
    cull: bool = True,
    tile_hw=None,  # static (H, W): enables screen-block ray tiling
    interpret: bool = False,
    stream: bool = False,  # HBM-streamed coefficient table (large scenes)
) -> Hit:
    assert frame.dense_n is not None, "dense coefficients missing"
    dt = prec.dtype
    R = origins.shape[0]
    if skip_tri is None:
        skip_tri = jnp.full((R,), -1, jnp.int32)
    min_dist = jnp.broadcast_to(jnp.asarray(min_dist, F32), (R,))
    max_dist = jnp.broadcast_to(jnp.asarray(max_dist, F32), (R,))

    tr = TR
    use_blocks = cull and blockable(R, tile_hw)
    if use_blocks:
        H_t, W_t = tile_hw
        origins = to_blocks(origins, H_t, W_t)
        directions = to_blocks(directions, H_t, W_t)
        skip_tri = to_blocks(skip_tri, H_t, W_t)
        min_dist = to_blocks(min_dist, H_t, W_t)
        max_dist = to_blocks(max_dist, H_t, W_t)

    # recentered fp32 ray components, (3, R) layout (rays on lanes)
    c = frame.dense_center
    o_f32 = origins.astype(F32)
    d_f32 = directions.astype(F32)
    if cull and frame.obj_aabb_lo is not None and frame.dense_n.shape[0] > TC:
        # cap every lane's reach at its scene-AABB exit distance: no hit
        # can lie beyond it, and without the cap a single MISS lane
        # (t = 1e5) in a tile blocks the ordered early exit for everyone.
        # (single-chunk scenes skip it — nothing to exit early from)
        lo = jnp.min(frame.obj_aabb_lo, axis=0)
        hi = jnp.max(frame.obj_aabb_hi, axis=0)
        big = jnp.float32(3e38)
        inv = 1.0 / d_f32
        t1 = (lo[None, :] - o_f32) * inv
        t2 = (hi[None, :] - o_f32) * inv
        far = jnp.maximum(t1, t2)
        far = jnp.where(jnp.isfinite(far), far, big)
        texit = jnp.min(far, axis=-1)
        slop = 1e-3 * jnp.linalg.norm(hi - lo) + jnp.float32(0.05)
        max_dist = jnp.minimum(max_dist, jnp.maximum(texit, 0.0) * 1.01 + slop)
    o = (o_f32 - c).T
    d = d_f32.T

    TI = frame.dense_n.shape[0]
    # small scenes fit one chunk: shrink the chunk height to the triangle
    # count (16-row sublane multiple — bf16 tiling) instead of padding to
    # TC.  Cornell's 34 tris in a 128-row chunk would waste 73% of the
    # VPU body; measured 1.9x on the whole trace stage.
    tc = TC if TI > TC else max(16, -(-TI // 16) * 16)
    ti_pad = (-TI) % tc
    n_dt = frame.dense_n.reshape(TI, 9).astype(dt)
    n_f32 = frame.dense_n_f32.reshape(TI, 9)
    e = frame.dense_e
    if ti_pad:
        # degenerate padding: Dz = 0, Oz = 1 -> t = -inf, rejected by isfinite
        n_dt = jnp.pad(n_dt, ((0, ti_pad), (0, 0)))
        n_f32 = jnp.pad(n_f32, ((0, ti_pad), (0, 0)))
        e = jnp.pad(e, ((0, ti_pad), (0, 0)), constant_values=1.0)
    tri_ids = jnp.pad(frame.dense_tri, (0, ti_pad), constant_values=-2)[:, None]
    obj_ids = jnp.pad(frame.dense_obj, (0, ti_pad), constant_values=-1)[:, None]
    n_chunks = (TI + ti_pad) // tc

    r_pad = (-R) % tr
    if r_pad:
        o = jnp.pad(o, ((0, 0), (0, r_pad)))
        d = jnp.pad(d, ((0, 0), (0, r_pad)), constant_values=1.0)
        o_f32 = jnp.pad(o_f32, ((0, r_pad), (0, 0)))
        d_f32 = jnp.pad(d_f32, ((0, r_pad), (0, 0)), constant_values=1.0)
        skip_tri = jnp.pad(skip_tri, (0, r_pad), constant_values=-1)
        min_dist = jnp.pad(min_dist, (0, r_pad))
        max_dist = jnp.pad(max_dist, (0, r_pad))
    Rp = R + r_pad
    grid = Rp // tr

    if (
        cull
        and n_chunks > 1  # single chunk: predicates can cull nothing
        and frame.obj_aabb_lo is not None
        and len(frame.obj_layout) > 1
    ):
        active, chunk_tmin = _chunk_predicates(
            frame, o_f32, d_f32, min_dist, max_dist, grid, TI + ti_pad
        )
    else:
        active = jnp.ones((grid, n_chunks), jnp.int32)
        chunk_tmin = jnp.zeros((grid, n_chunks), jnp.float32)
    # compact the active-chunk ids per tile, NEAREST FIRST: [counts (G,) |
    # words (G, maxc)], each word = truncated f32 bits of the tile's
    # conservative entry distance (high bits) | chunk id (low id_bits) —
    # positive-float bit patterns order like the floats, and truncating the
    # low mantissa bits only rounds the bound DOWN.  The kernel walks the
    # list in this near-to-far order and stops when no live lane can
    # improve (ordered-traversal early exit).  SMEM prefetch capacity is
    # ~1MB, so the per-tile list length adapts to the tile count; tiles
    # whose active set overflows it fall back to iterating every chunk
    # unordered (count = -1).
    budget_words = (900 * 1024) // 4
    maxc = min(MAXC, max(8, budget_words // max(grid, 1) - 1))
    id_bits = max(1, (n_chunks - 1).bit_length())
    big = jnp.float32(3e38)
    tkey = jnp.where(active > 0, jnp.maximum(chunk_tmin, 0.0), big)
    order = jnp.argsort(tkey, axis=1)
    take = min(maxc, n_chunks)
    ids = order[:, :take].astype(jnp.int32)
    tnear = jnp.take_along_axis(tkey, order, axis=1)[:, :take]
    tbits = jax.lax.bitcast_convert_type(tnear, jnp.int32)
    words = (tbits & ~((1 << id_bits) - 1)) | ids
    if take < maxc:
        words = jnp.pad(words, ((0, 0), (0, maxc - take)))
    count = jnp.sum(active, axis=1, dtype=jnp.int32)
    count = jnp.where(count > maxc, -1, count)  # overflow -> run all chunks
    active = jnp.concatenate([count, words.reshape(-1)])

    kernel = functools.partial(
        _kernel,
        n_chunks=n_chunks,
        maxc=maxc,
        d1=prec.delta1,
        d2=prec.delta2,
        fallback=fallback,
        is_f32=prec.is_f32,
        find_any=find_any,
        stream=stream,
        tc=tc,
    )

    # index maps take (grid index, scalar-prefetch ref)
    const = lambda shape: pl.BlockSpec(shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
    ray_block = lambda rows: pl.BlockSpec((rows, tr), lambda i, *_: (0, i), memory_space=pltpu.VMEM)

    if stream:
        # ONE lane-padded f32 table, DMA'd chunk-by-chunk (DMA slices must
        # be 128-lane aligned, hence the padded column layout)
        tbl = jnp.concatenate(
            [n_dt.astype(F32), n_f32, e,
             tri_ids.astype(F32), obj_ids.astype(F32)],
            axis=1,
        )
        tbl = jnp.pad(tbl, ((0, 0), (0, 128 - tbl.shape[1])))
        table_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
        table_args = (tbl,)
        scratch_shapes = [
            pltpu.VMEM((tc, 128), F32),
            pltpu.SemaphoreType.DMA,
        ]
    else:
        table_specs = [
            const(n_dt.shape),
            const(n_f32.shape),
            const(e.shape),
            const(tri_ids.shape),
            const(obj_ids.shape),
        ]
        table_args = (n_dt, n_f32, e, tri_ids, obj_ids)
        scratch_shapes = []

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=table_specs + [
            ray_block(3),
            ray_block(3),
            ray_block(1),
            ray_block(1),
            ray_block(1),
        ],
        out_specs=[ray_block(1)] * 5,
        scratch_shapes=scratch_shapes,
    )
    t, u, v, tri, obj = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, Rp), F32),
            jax.ShapeDtypeStruct((1, Rp), F32),
            jax.ShapeDtypeStruct((1, Rp), F32),
            jax.ShapeDtypeStruct((1, Rp), jnp.int32),
            jax.ShapeDtypeStruct((1, Rp), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        active,
        *table_args,
        o,
        d,
        skip_tri[None, :],
        min_dist[None, :],
        max_dist[None, :],
    )
    def cut(x):
        x = x[0, :R]
        return from_blocks(x, H_t, W_t) if use_blocks else x

    return Hit(t=cut(t), u=cut(u), v=cut(v), tri=cut(tri), obj=cut(obj))


def _morton_key(origins, directions, live=None):
    """Sort key for ray coherence recovery: liveness (top bit — dead lanes
    cluster into packets that terminate immediately, the stream-compaction
    effect of the reference's wavefront queues), then direction octant
    (3 bits), then a 21-bit morton code of the origin quantized to the
    launch's own bounding box.  Rays sharing a key prefix start near each
    other and head the same way — their 512-ray kernel tile sees few
    object AABBs."""
    of = origins.astype(F32)
    df = directions.astype(F32)
    lo = jnp.min(of, axis=0)
    hi = jnp.max(of, axis=0)
    q = jnp.clip((of - lo) / jnp.maximum(hi - lo, 1e-6) * 127, 0, 127).astype(jnp.int32)

    def spread(x):  # 7 bits -> every 3rd bit
        x = (x | (x << 8)) & 0x0100F00F
        x = (x | (x << 4)) & 0x010C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    m = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    octant = (
        (df[:, 0] > 0).astype(jnp.int32)
        | ((df[:, 1] > 0).astype(jnp.int32) << 1)
        | ((df[:, 2] > 0).astype(jnp.int32) << 2)
    )
    key = (octant << 21) | m
    if live is not None:
        key = key | jnp.where(live, 0, jnp.int32(1 << 24))
    return key


@functools.partial(
    jax.jit, static_argnames=("prec", "fallback", "find_any", "interpret", "stream")
)
def trace_rays_dense_pallas_sorted(
    scene,
    frame,
    origins,
    directions,
    *,
    prec: Precision,
    fallback: str = "both",
    skip_tri=None,
    min_dist=0.0,
    max_dist=1e5,
    find_any: bool = False,
    interpret: bool = False,
    stream: bool = False,
) -> Hit:
    """Coherence-recovering launch for INCOHERENT rays (GI bounces,
    secondary shadow rays): a key-value `lax.sort` groups rays by
    (direction octant, origin morton) so each kernel tile is spatially
    compact and the chunk culling bites again, then the hits are unsorted
    back to caller order with a second key-value sort (sorts cost ~10 ms
    per 2M rays on TPU; a gather-based permute costs more).  Measured ~2x
    on colonnade-5k bounce traces.  Results can differ from the unsorted
    launch only where two triangles tie on t across different chunks
    (evaluation-order tiebreak, ~1e-5 of lanes)."""
    R = origins.shape[0]
    if skip_tri is None:
        skip_tri = jnp.full((R,), -1, jnp.int32)
    min_dist = jnp.broadcast_to(jnp.asarray(min_dist, F32), (R,))
    max_dist = jnp.broadcast_to(jnp.asarray(max_dist, F32), (R,))
    key = _morton_key(origins, directions, live=max_dist > min_dist)
    of = origins.astype(F32)
    df = directions.astype(F32)
    idx = jnp.arange(R, dtype=jnp.int32)
    srt = jax.lax.sort(
        [key, of[:, 0], of[:, 1], of[:, 2], df[:, 0], df[:, 1], df[:, 2],
         skip_tri, min_dist, max_dist, idx],
        num_keys=1,
    )
    o_s = jnp.stack(srt[1:4], axis=1).astype(origins.dtype)
    d_s = jnp.stack(srt[4:7], axis=1).astype(directions.dtype)
    hit = trace_rays_dense_pallas(
        scene,
        frame,
        o_s,
        d_s,
        prec=prec,
        fallback=fallback,
        skip_tri=srt[7],
        min_dist=srt[8],
        max_dist=srt[9],
        find_any=find_any,
        cull=True,
        tile_hw=None,  # tiles = consecutive 512 sorted rays
        interpret=interpret,
        stream=stream,
    )
    back = jax.lax.sort([srt[10], hit.t, hit.u, hit.v, hit.tri, hit.obj], num_keys=1)
    return Hit(t=back[1], u=back[2], v=back[3], tri=back[4], obj=back[5])
