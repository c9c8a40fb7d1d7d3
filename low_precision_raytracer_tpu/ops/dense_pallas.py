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
_M32_PRECISION = jax.lax.Precision.HIGHEST  # f32 dot precision (perf-probe knob)
MAXC = 512  # max compacted active chunks per tile; the adaptive per-tile
# budget (SMEM ~1MB / n_tiles) is usually the binding cap at high ray
# counts — e.g. 54 ids/tile at 1080p — but small grids on chunk-heavy
# scenes need the headroom (overflow falls back to iterating every chunk)


def _finish_chunk(accept_geom, u_sel, v_sel, t, tri, obj,
                  mind, maxd, skip, outf_ref, ids_ref, tr, ablate):
    """Shared chunk epilogue: distance/skip gating + closest-hit winner
    tracking into the running-best output refs (min-reduce + winner mask,
    no argmin gathers)."""
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
    neg = jnp.float32(-3e38)
    if "ids" in ablate:  # perf probe: no winner-id tracking
        u_win = jnp.max(jnp.where(at_min, u_sel, neg), axis=0, keepdims=True)
        v_win = jnp.max(jnp.where(at_min, v_sel, neg), axis=0, keepdims=True)
        better = jnp.isfinite(t_min) & (t_min < outf_ref[0:1, :])
        b3 = jnp.broadcast_to(better, (3, tr))
        outf_ref[:, :] = jnp.where(
            b3, jnp.concatenate([t_min, u_win, v_win], axis=0), outf_ref[:, :]
        )
        return 0
    big = jnp.float32(3e38)
    tri_win = jnp.min(jnp.where(at_min, tri, big), axis=0, keepdims=True)
    win = at_min & (tri == tri_win)
    u_win = jnp.max(jnp.where(win, u_sel, neg), axis=0, keepdims=True)
    v_win = jnp.max(jnp.where(win, v_sel, neg), axis=0, keepdims=True)
    obj_win = jnp.max(jnp.where(win, obj, neg), axis=0, keepdims=True)

    better = jnp.isfinite(t_min) & (t_min < outf_ref[0:1, :])
    b3 = jnp.broadcast_to(better, (3, tr))
    outf_ref[:, :] = jnp.where(
        b3, jnp.concatenate([t_min, u_win, v_win], axis=0), outf_ref[:, :]
    )
    ids_new = jnp.concatenate([tri_win, obj_win], axis=0).astype(jnp.int32)
    b2 = jnp.broadcast_to(better, (2, tr))
    ids_ref[:, :] = jnp.where(b2, ids_new, ids_ref[:, :])
    return 0


def _finish_chunk_any(accept_geom, t, tri, mind, maxd, skip,
                      outf_ref, ids_ref, tr):
    """Any-hit epilogue (shadow rays): occlusion is a boolean, so winner
    selection collapses to ONE cross-sublane reduction (the chunk's masked
    t min) instead of reduce5's five — and at small chunk counts (Cornell)
    the reductions are most of the body.  The stored t is the closest
    accept among the chunks walked before the early exit fired; tri
    becomes a 0/-1 hit marker (find_any consumers read only `tri >= 0`,
    `render/renderer.py:86`, matching the reference's boolean
    `di_intensity = visible ? multiplier : 0`, `rt/rtrt/cuda.hpp:2073-78`)
    and obj stays -1."""
    accept = (
        accept_geom
        & (t > mind)
        & (t < maxd)
        & (tri != skip)
        & jnp.isfinite(t)
    )
    t_masked = jnp.where(accept, t, jnp.inf)
    t_min = jnp.min(t_masked, axis=0, keepdims=True)  # (1, TR)
    better = jnp.isfinite(t_min) & (t_min < outf_ref[0:1, :])
    outf_ref[0:1, :] = jnp.where(better, t_min, outf_ref[0:1, :])
    ids_ref[0:1, :] = jnp.where(better, jnp.int32(0), ids_ref[0:1, :])
    return 0


def _finish_chunk_packed(accept_geom, u_sel, v_sel, t, tri, c, tc,
                         mind, maxd, skip, outf_ref, ids_ref, tr):
    """Packed chunk epilogue ('pack' mode): 3 cross-sublane reductions per
    chunk instead of 5, and 3 output rows instead of 5.

    The winner is chosen by ONE min-reduction over a packed key
    (t bits with the low lb mantissa bits replaced by the sublane-local
    row index — positive floats order like their bit patterns, and the
    local index makes every key unique).  Two more reductions extract the
    winner's EXACT t and its (u, v) as 15-bit fixed point; tri/obj ids
    are NOT reduced at all — the winner's global coefficient-table ROW
    (chunk * tc + local) is stored and decoded to (tri, obj) outside the
    kernel with one 2-channel table take.

    Semantics deviation vs `_finish_chunk` (documented, bf16/fp16 only):
    triangles whose t differ by less than the truncation window
    (2^-lb relative, lb = ceil(log2 tc) <= 7 at the production chunk
    height) may resolve to either one (the reference's fp16 kernel has
    the same ambiguity at ~2^-10); u/v quantize to 1/16384 absolute —
    finer than the bf16 mantissa this mode shades with.  The STORED t is
    exact (no truncation accumulates across chunks)."""
    accept = (
        accept_geom
        & (t > mind)
        & (t < maxd)
        & (t > 0)
        & (tri != skip)
        & jnp.isfinite(t)
    )
    lb = max(1, (tc - 1).bit_length())
    lmask = (1 << lb) - 1
    sent = jnp.int32(0x7FFFFFFF)
    local = jax.lax.broadcasted_iota(jnp.int32, (t.shape[0], tr), 0)
    tb = jax.lax.bitcast_convert_type(t, jnp.int32)
    key = jnp.where(accept, (tb & ~lmask) | local, sent)
    kmin = jnp.min(key, axis=0, keepdims=True)  # (1, TR)
    got = kmin != sent
    win = (key == kmin) & accept
    t_win = jnp.min(jnp.where(win, t, jnp.inf), axis=0, keepdims=True)
    qu = jnp.clip((u_sel + 0.5) * 16384.0, 0.0, 32767.0).astype(jnp.int32)
    qv = jnp.clip((v_sel + 0.5) * 16384.0, 0.0, 32767.0).astype(jnp.int32)
    pk = (qu << 15) | qv
    pk_win = jnp.max(jnp.where(win, pk, -1), axis=0, keepdims=True)
    row_win = c * tc + (kmin & lmask)  # (1, TR) global coefficient row

    better = got & (t_win < outf_ref[0:1, :])
    outf_ref[0:1, :] = jnp.where(better, t_win, outf_ref[0:1, :])
    ids_new = jnp.concatenate([row_win, pk_win], axis=0)
    b2 = jnp.broadcast_to(better, (2, tr))
    ids_ref[:, :] = jnp.where(b2, ids_new, ids_ref[:, :])
    return 0


def _kernel(
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
    single: bool = False,
    n32: int = 8,  # A32 block count (9 with the TriHi radix block)
    guarded: bool = True,  # single-chunk: emit the dead-tile skip?
    ablate: str = "",
    pack: bool = False,  # packed epilogue (see _finish_chunk_packed)
    di_lights: int = 0,  # fused DI phase: lights to shadow-test per winner
    d_mov: float = 0.0,  # self-intersection moveforward for the DI phase
):
    """MXU-staged chunk body: the 14 linear-in-ray quantities of the
    triangle test come from lhs-transposed `dot_general`s per chunk
    instead of ~50 VPU broadcast-madd passes —

    - A32 slab: blocks [Oz, Dz, Ox32, Oy32, Dx32, Dy32, TriLo, Obj
      (, TriHi)] against B32 = [o; 1; d; 0] (8, TR).  The z row and the
      fp32 re-test rows carry the fp32 shadow coefficients.  In fp32
      render mode this is one true-f32 dot (Precision.HIGHEST — Mosaic's
      6-pass bf16 decomposition; exact, and the f32 u/v ARE the primary
      results there).  In bf16 render mode Mosaic has no cheap f32 dot
      (HIGHEST costs ~5 ms/launch at 1080p, HIGH is unimplemented), so
      the slab is stored as interleaved hi/lo bf16 halves (16, P32) and
      the kernel runs a MANUAL bf16x3: ah*bh + al*bh + ah*bl, three
      single-pass MXU dots with f32 accumulate.  Error: the dropped
      al*bl term bounds relative error by ~2^-16 — far below the bf16
      dtype path this mode shades with, and the fp32-retest band has its
      own slop.  Ids stay EXACT: tri rides as radix-2^16 blocks (TriLo
      + 65536*TriHi, each half exact under an 8+8-bit bf16 split, and
      the ones-row B entries split as 1+0 so no cross term is dropped),
      which also lifts the dense-path id range to 2^24.
    - Aabt slab (16, Pab) in the render dtype: dtype rows [Ox, Oy, Dx,
      Dy] + error-band rows [Sox, Soy, Sdx, Sdy] (|coeff| x |ray|)
      against Bab = [o; 1; d; 0; |o|; 1; |d|; 0].  In bf16 mode the rays
      round to bf16 here — covered by the dtype error band (the CUDA
      reference's DataT kernel rounds its rays the same way) and
      resolved by the fp32 re-test inside the band.  fp32 mode keeps
      only the 4 S blocks (u/v come from the f32 dot).

    Measured vs the VPU body (Cornell chunk, 2.07M rays): 13.3 -> 10.6 ms
    AND ~1000x faster Mosaic compiles (0.9 s vs 300-650 s).

    Resident mode (stream=False): both A tables are whole VMEM refs,
    flattened 2-D as (NC*8, P32) / (NC*16, Pab); chunk c is the sublane
    slice [c*8, (c+1)*8) / [c*16, (c+1)*16).  Streaming mode: the same
    tables live in HBM and each chunk's slabs are DMA'd into VMEM
    scratch on demand (slices are whole sublane-tiles, trivially
    aligned) — lifts the VMEM cap on scene size.

    single=True (one chunk, e.g. Cornell): no scalar-prefetch list, no
    per-chunk decode, STATIC slab loads — the whole scheduling apparatus
    of the multi-chunk walk costs ~2x on single-chunk scenes."""
    mxu3 = fallback == "mxu3"  # bf16 mode only: no Aab slab at all (see
    # trace_rays_dense_pallas docstring) — the bf16x3 dot's f32-grade u/v
    # are the ONLY triangle test, strict acceptance, no error band
    if not single:
        active_ref, *refs = refs  # (G + G*maxc,) i32: [counts | packed ids]
    r32 = 8 if is_f32 else 16  # A32 rows/chunk (bf16: 8 hi + 8 lo halves)
    if di_lights:
        # fused DI phase (single-chunk only): broadcast light-param rows in,
        # per-lane visibility bitmask out (pallas ref order: inputs, outputs)
        assert single and not stream and not pack and not find_any
        if mxu3:
            (a32_ref, rays_ref, lights_ref, outf_ref, ids_ref, vis_ref) = refs
        else:
            (a32_ref, aab_ref, rays_ref, lights_ref, outf_ref, ids_ref,
             vis_ref) = refs
    elif stream and mxu3:
        (a32_hbm, rays_ref, outf_ref, ids_ref, scr32, sem32) = refs
    elif stream:
        (a32_hbm, aab_hbm, rays_ref, outf_ref, ids_ref,
         scr32, scrab, sem32, semab) = refs
    elif mxu3:
        (a32_ref, rays_ref, outf_ref, ids_ref) = refs
    else:
        (a32_ref,  # (NC*r32, P32) f32 | interleaved-bf16 hi/lo
         aab_ref,  # (NC*16, Pab) dtype
         rays_ref,  # (11, TR) f32: [B32 rows 0-7 | skip | mind | maxd]
         outf_ref,  # (3, TR) f32 [t, u, v] — running-best accumulators
         ids_ref,  # (2, TR) i32 [tri, obj]
         ) = refs
    # the rays block arrives PRE-PACKED in the f32 dot's feature layout
    # ([ox, oy, oz, 1, dx, dy, dz, 0]): one blocked operand instead of
    # five, zero in-kernel assembly.  Per-tile blocked-operand windows
    # carry fixed Mosaic overhead — packing operands measured ~25% off
    # the whole launch at 4050 tiles.
    tr = rays_ref.shape[1]
    B32 = rays_ref[0:8, :]
    skip = rays_ref[8:9, :]  # ids as exact f32 integers
    mind = rays_ref[9:10, :]
    maxd = rays_ref[10:11, :]
    if not mxu3:
        Bab = jnp.concatenate([B32, jnp.abs(B32)], axis=0)  # |1| = 1, |0| = 0
        if not is_f32:
            Bab = Bab.astype(jnp.bfloat16)
    DN = (((0,), (0,)), ((), ()))

    c1 = jnp.float32(0.2 * d1)
    c3 = jnp.float32(0.6 * d1)

    if pack:
        outf_ref[:, :] = jnp.full((1, tr), 1e5, F32)
    else:
        outf_ref[:, :] = jnp.concatenate(
            [jnp.full((1, tr), 1e5, F32), jnp.zeros((2, tr), F32)], axis=0
        )
    ids_ref[:, :] = jnp.full((2, tr), -1, jnp.int32)

    def load_slabs(c):
        """-> (a32, aab | None) for chunk c (VMEM slice or HBM-streamed)."""
        if stream:
            cp32 = pltpu.make_async_copy(
                a32_hbm.at[pl.ds(c * r32, r32), :], scr32, sem32
            )
            cp32.start()
            if not mxu3:
                cpab = pltpu.make_async_copy(
                    aab_hbm.at[pl.ds(c * 16, 16), :], scrab, semab
                )
                cpab.start()
                cp32.wait()
                cpab.wait()
                return scr32[:, :], scrab[:, :]
            cp32.wait()
            return scr32[:, :], None
        a32 = a32_ref[pl.ds(c * r32, r32), :]
        aab = None if mxu3 else aab_ref[pl.ds(c * 16, 16), :]
        return a32, aab

    def chunk_quants(a32, aab, B32v, Babv):
        """All chunk math up to (but excluding) the distance/skip epilogue:
        -> (t, tri, obj, u_sel, v_sel, accept_geom), each (tc, TR).
        Parameterized on the ray operand so the fused DI phase can re-run
        the same test block on in-kernel-built shadow rays."""
        # precision must be explicit: the framework's global
        # jax_default_matmul_precision='highest' would stamp fp32
        # contract precision onto the bf16 dots, which Mosaic rejects
        # ("Bad lhs type"); DEFAULT on bf16 inputs is the MXU-native
        # single-pass bf16 x bf16 -> f32-accumulate mode.
        dflt = jax.lax.Precision.DEFAULT
        if is_f32:
            m32 = jax.lax.dot_general(
                a32, B32v, DN, preferred_element_type=F32,
                precision=_M32_PRECISION,
            )
        else:
            # manual bf16x3 (see docstring): Mosaic's HIGHEST costs
            # ~5 ms/launch at 1080p and HIGH is unimplemented.  The
            # three partial products ride ONE dot by concatenating
            # along the contraction axis (K=24 — still well under the
            # MXU's 128-deep array, so it costs one pass where three
            # separate K=8 dots cost three): measured 2.1 ms/launch
            # at 1080p (11.0 -> 8.9 ms).
            bh = B32v.astype(jnp.bfloat16)
            bl = (B32v - bh.astype(F32)).astype(jnp.bfloat16)
            ah = a32[0:8, :]
            al = a32[8:16, :]
            d3 = lambda x, y: jax.lax.dot_general(
                x, y, DN, preferred_element_type=F32, precision=dflt
            )
            if "prec" in ablate:  # perf probe: single-pass (inexact)
                m32 = d3(ah, bh)
            else:
                a_cat = jnp.concatenate([ah, al, ah], axis=0)
                b_cat = jnp.concatenate([bh, bh, bl], axis=0)
                m32 = d3(a_cat, b_cat)
        if not mxu3:
            mab = jax.lax.dot_general(
                aab, Babv, DN, preferred_element_type=F32,
                precision=(jax.lax.Precision.HIGHEST if is_f32 else dflt),
            )
            bab = lambda k: mab[k * tc : (k + 1) * tc]
        b32 = lambda k: m32[k * tc : (k + 1) * tc]
        Oz, Dz = b32(0), b32(1)
        tri = b32(6)  # (tc, TR) exact f32 integers (radix-2^16 split)
        if n32 == 9:
            tri = tri + 65536.0 * b32(8)
        obj = b32(7)
        if mxu3:
            # single f32-grade test: u/v ARE the bf16x3 rows; strict
            # acceptance, no band, no dtype pass (the Aab slab does not
            # even ride the launch)
            Ox, Oy, Dx, Dy = b32(2), b32(3), b32(4), b32(5)
        elif is_f32:
            # u/v ARE the f32 rows; Aab carries only the 4 S blocks
            Ox, Oy, Dx, Dy = b32(2), b32(3), b32(4), b32(5)
            s_ox, s_oy, s_dx, s_dy = bab(0), bab(1), bab(2), bab(3)
        else:
            Ox, Oy, Dx, Dy = bab(0), bab(1), bab(2), bab(3)
            s_ox, s_oy, s_dx, s_dy = bab(4), bab(5), bab(6), bab(7)

        t = -Oz / Dz  # (tc, TR)
        t_dx = t * Dx
        t_dy = t * Dy
        u = Ox + t_dx
        v = Oy + t_dy

        if mxu3:
            u_sel, v_sel = u, v
            accept_geom = (u > 0) & (v > 0) & (u + v < 1)
            return t, tri, obj, u_sel, v_sel, accept_geom

        # the 0.2*(d1+d2) factor on the S terms is folded into the S
        # rows at table build (host side); only the |.|-of-computed
        # terms keep kernel-side constants
        error_u = s_ox + t * s_dx + c1 * jnp.abs(Ox) + c3 * jnp.abs(t_dx)
        error_v = s_oy + t * s_dy + c1 * jnp.abs(Oy) + c3 * jnp.abs(t_dy)

        w = 1.0 - u - v
        in_band = lambda x, err: (x >= -err) & (x <= 0)
        ambiguous = in_band(u, error_u) | in_band(v, error_v) | in_band(w, error_u + error_v)
        dtype_accept = (u > -error_u) & (v > -error_v) & (u + v < 1 + error_u + error_v)

        if "band" in ablate:  # perf probe: no band, no fp32 re-test
            u_sel, v_sel = u, v
            accept_geom = (u > 0) & (v > 0) & (u + v < 1)
        elif fallback == "both" and not is_f32:
            Ox32, Oy32, Dx32, Dy32 = b32(2), b32(3), b32(4), b32(5)
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
        return t, tri, obj, u_sel, v_sel, accept_geom

    def run_chunk(c):
        a32, aab = load_slabs(c)
        # Bab is hoisted outside the chunk walk (computed once per tile)
        t, tri, obj, u_sel, v_sel, accept_geom = chunk_quants(
            a32, aab, B32, None if mxu3 else Bab
        )
        if find_any and "anyfull" not in ablate:
            return _finish_chunk_any(
                accept_geom, t, tri, mind, maxd, skip,
                outf_ref, ids_ref, tr,
            )
        if pack:
            return _finish_chunk_packed(
                accept_geom, u_sel, v_sel, t, tri, c, tc,
                mind, maxd, skip, outf_ref, ids_ref, tr,
            )
        return _finish_chunk(
            accept_geom, u_sel, v_sel, t, tri, obj,
            mind, maxd, skip, outf_ref, ids_ref, tr, ablate,
        )

    def run_di_phase():
        """Fused DI shadow phase (single-chunk launches): from each lane's
        closest-hit winner, build its <=L shadow rays IN-KERNEL (f32 hit
        position o + t*d, light params as broadcast rows) and re-run the
        chunk test block per light in any-hit mode.  Output: per-lane
        visibility bitmask (bit l = light l unoccluded).  Replaces the
        separate `trace_di_light` launch (`rt/rtrt/cuda.hpp:2058-2081`) —
        the BRDF multiplier stays outside (ops/shade.py), exactly like the
        reference's  `di_intensity = visible ? multiplier : 0` split.
        Deviation (documented in trace_rays_dense_pallas): shadow direction
        and range are computed in f32 from the kernel's own winner, where
        the unfused path uses the dtype-rounded interpolated hit position —
        boolean visibility differs only within the dtype epsilon of an
        occluder silhouette, and moves TOWARD the fp32 oracle."""
        a32, aab = load_slabs(0)
        t_w = outf_ref[0:1, :]
        got = ids_ref[0:1, :] >= 0
        skipw = ids_ref[0:1, :].astype(F32)  # winner tri as exact f32 int
        px = B32[0:1, :] + t_w * B32[4:5, :]
        py = B32[1:2, :] + t_w * B32[5:6, :]
        pz = B32[2:3, :] + t_w * B32[6:7, :]
        one = jnp.ones((1, tr), F32)
        zero = jnp.zeros((1, tr), F32)
        vis = jnp.zeros((1, tr), jnp.int32)
        for l in range(di_lights):
            r0 = 4 * l
            isdir = lights_ref[r0 : r0 + 1, :] > 0
            ax = lights_ref[r0 + 1 : r0 + 2, :]
            ay = lights_ref[r0 + 2 : r0 + 3, :]
            az = lights_ref[r0 + 3 : r0 + 4, :]
            dx = ax - px
            dy = ay - py
            dz = az - pz
            dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)
            inv = 1.0 / jnp.maximum(dist, jnp.float32(1e-20))
            sdx = jnp.where(isdir, ax, dx * inv)
            sdy = jnp.where(isdir, ay, dy * inv)
            sdz = jnp.where(isdir, az, dz * inv)
            maxd_l = jnp.where(isdir, jnp.float32(1000.0), dist)
            B32s = jnp.concatenate(
                [px, py, pz, one, sdx, sdy, sdz, zero], axis=0
            )
            Babs = None
            if not mxu3:
                Babs = jnp.concatenate([B32s, jnp.abs(B32s)], axis=0)
                if not is_f32:
                    Babs = Babs.astype(jnp.bfloat16)
            t2, tri2, _obj2, _u2, _v2, acc2 = chunk_quants(a32, aab, B32s, Babs)
            blocked = jnp.any(
                acc2
                & (t2 > jnp.float32(d_mov))
                & (t2 < maxd_l)
                & (tri2 != skipw)
                & jnp.isfinite(t2),
                axis=0,
                keepdims=True,
            )
            vis = vis | jnp.where(got & ~blocked, jnp.int32(1 << l), 0)
        vis_ref[:, :] = vis

    if single:
        # one chunk: c = 0 is STATIC (static slab loads, no prefetch list,
        # no decode, no loop).  The ONE cross-lane reduction guards the
        # whole body: fused DI+GI launches arrive lane-major with invalid
        # command slots (maxd = 0) clustered into whole tiles, and an
        # all-dead tile skips its chunk entirely (~0.3us vs ~4us body).
        if di_lights:
            vis_ref[:, :] = jnp.zeros((1, tr), jnp.int32)
        if not guarded or "guard" in ablate:  # all-live launch: straight line
            run_chunk(0)
            if di_lights:
                run_di_phase()
            return

        @pl.when(jnp.any(maxd > mind))
        def _():
            run_chunk(0)
            if di_lights:
                run_di_phase()
        return

    i = pl.program_id(0)
    g_total = pl.num_programs(0)
    count = active_ref[i]
    # t_cut: the entry bound (f32 bits) of the nearest ACTIVE chunk that
    # did NOT fit on this tile's list; +inf bits when the list holds the
    # whole active set.  After the ordered prefix, a lane whose best t (or
    # maxd) is <= t_cut cannot be improved by any off-list chunk.
    tcut_bits = active_ref[g_total + i]
    ids_base = 2 * g_total + i * maxc
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
        the j-th nearest active chunk.  Comparisons happen in the integer
        bit domain: positive floats order like their bit patterns, and
        Mosaic has no scalar i32->f32 bitcast."""
        return word_at(j) & ~id_mask

    # branchless sparse iteration with ORDERED early termination: the
    # per-tile chunk list arrives sorted by conservative entry distance, so
    # the walk stops as soon as no live lane can improve on its current
    # best inside the next (hence any remaining) chunk — the dense-kernel
    # analogue of ordered BVH traversal, and the reason bounce rays on big
    # scenes don't pay for the whole candidate list.  (Fine-grained
    # per-chunk @pl.when branching costs ~1us/branch; one while_loop
    # condition per chunk does not.)
    def w_body(j):
        run_chunk(word_at(j) & id_mask)
        return j + 1

    as_bits = lambda v: jax.lax.bitcast_convert_type(v, jnp.int32)
    if find_any:
        # any-hit rays (shadows): a lane is done at its FIRST hit; dead
        # lanes (maxd <= mind, e.g. invalid command slots) count as done
        def w_cond(j):
            live = (
                (ids_ref[0:1, :] < 0)
                & (maxd > mind)
                & (chunk_tmin_bits(j) < as_bits(jnp.maximum(maxd, 0.0)))
            )
            return (j < count) & jnp.any(live)

        def unresolved():
            # a blocker may hide in an off-list chunk only if the ray
            # interval extends past t_cut
            return (
                (ids_ref[0:1, :] < 0)
                & (maxd > mind)
                & (as_bits(jnp.maximum(maxd, 0.0)) > tcut_bits)
            )
    else:
        def w_cond(j):
            cap = jnp.maximum(jnp.minimum(outf_ref[0:1, :], maxd), 0.0)
            improvable = (maxd > mind) & (chunk_tmin_bits(j) < as_bits(cap))
            return (j < count) & jnp.any(improvable)

        def unresolved():
            cap = jnp.maximum(jnp.minimum(outf_ref[0:1, :], maxd), 0.0)
            return (maxd > mind) & (as_bits(cap) > tcut_bits)

    jax.lax.while_loop(w_cond, w_body, jnp.int32(0))

    # overflow sweep: runs bodies only while a lane could still improve
    # beyond t_cut (never on tiles whose active set fit the list).  The
    # loop exists only when a list CAN overflow (n_chunks > maxc): its
    # cond's cross-lane any() costs ~1-2us per tile even at zero
    # iterations, which measured as +3.3 ms/launch on Cornell (2 chunks,
    # 4045 tiles) — the bench regression 8.9 -> 12.2 ms/launch.
    if n_chunks > maxc:
        def s_body(j):
            run_chunk(j)
            return j + 1

        def s_cond(j):
            return (j < n_chunks) & jnp.any(unresolved())

        jax.lax.while_loop(s_cond, s_body, jnp.int32(0))


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


def _chunk_predicates(frame, origins_f32, dirs_f32, min_dist, max_dist, grid, r_pad,
                      obj_test: bool | None = None):
    """XLA-side tile-granular chunk predicates: (grid, NCp) i32.

    A chunk is active for a ray tile iff ANY ray in the tile enters the
    world AABB of any object the chunk covers (slab test with the scene
    slop, like the reference's TLAS leaf test)."""
    o = origins_f32  # (Rp, 3)
    d = dirs_f32
    inv = 1.0 / d
    big = jnp.float32(3e38)

    # NOTE: deliberately NOT ray_aabb_entry (the rays x boxes form below at
    # :1143): this runs one box vs all rays under lax.map to bound the
    # intermediates, and additionally rejects boxes entirely behind the
    # lane's min_dist (tmax > min_dist) — the entry-bound form has no exit
    # value to test.  Keep the 0.02 scene slop in sync with it.
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

    n_obj = len(frame.obj_layout)
    # the serial per-object lax.map only *tightens* the per-chunk slab
    # test below; past a few hundred objects its O(n_obj) sweep costs more
    # than it culls, so big-object-count scenes rely on the chunk AABBs
    # alone (this is what retires the old 512-object routing cliff)
    use_obj_test = (
        obj_test
        if obj_test is not None
        # morton-ordered tables: chunks span many objects and the chunk
        # AABBs are tight spatial blobs — the object sweep is both WRONG
        # to derive from obj_layout (rows are permuted) and redundant
        else (
            not getattr(frame, "dense_morton", False)
            and (n_obj <= 512 or frame.dense_chunk_lo is None)
        )
    )
    if use_obj_test:
        tile_obj = jax.lax.map(
            obj_hit, (frame.obj_aabb_lo, frame.obj_aabb_hi)
        ).T.astype(jnp.float32)  # (G, O)

        m = _chunk_object_matrix(frame.obj_layout, r_pad)
        chunk_obj = jnp.asarray(m)  # (NC, O) static constant
        active = jnp.dot(tile_obj, chunk_obj.T, preferred_element_type=F32) > 0
    else:
        active = None

    if frame.dense_chunk_lo is not None:
        hit, tmin = _tile_chunk_predicates(frame, o, d, min_dist, max_dist, grid)
        active = hit if active is None else (active & hit)
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

    # box-to-box DISTANCE lower bound: any unit-direction ray starting in
    # the tile's origin box reaches the chunk box no earlier than the
    # euclidean gap between the boxes.  On INCOHERENT tiles the slab
    # bundle degenerates (all direction axes straddle -> tmin == 0 for
    # every chunk: no active-set cut, no ordering, so the kernel's ordered
    # early exit dies exactly where it is needed most); the distance bound
    # is direction-free, restoring both.  0.98 covers render-dtype
    # direction normalization error (bf16 |d| = 1 +- 2^-8).
    gap = jnp.maximum(
        jnp.maximum(lo[None] - ohi[:, None], olo[:, None] - hi[None]), 0.0
    )  # (G, NC, 3)
    dist = jnp.sqrt(jnp.sum(gap * gap, axis=-1)) * jnp.float32(0.98)

    slop = jnp.float32(0.02)  # scene-level slab slop, like the object test
    entry = jnp.maximum(jnp.maximum(tmin - slop, 0.0), dist)
    hit = (
        (tmin <= tmax + slop)
        & (tmax + slop >= 0)
        & (entry < t_hi[:, None])
    )
    # conservative non-negative entry distance per (tile, chunk): feeds the
    # kernel's ordered early termination (slop keeps it a lower bound)
    return hit & any_live[:, None], entry


def _pad128(x: int) -> int:
    return ((x + 127) // 128) * 128


def _mxu_tables(n_dt, n_f32, e, tri_ids, obj_ids, tc, dt, is_f32,
                need_hi: bool, d1: float = 0.0, d2: float = 0.0,
                no_aab: bool = False):
    """Per-chunk lhs-transposed A slabs for the kernel's dots.

    -> (a32t, aabt, n32).  fp32 mode: a32t is (NC*8, P32) f32.  bf16
    mode: a32t is (NC*16, P32) bf16 — per chunk 8 hi rows then 8 lo rows
    (lo = f32 - f32(hi)) for the kernel's manual bf16x3 dot; interleaving
    at chunk granularity keeps the dynamic slice 16-row aligned (the
    bf16 sublane tile).  Column (lane) layout inside a chunk slab:
    block-major [blk0 tri0..tc | blk1 ... ], zero-padded to a 128
    multiple (padded columns produce garbage output rows that are never
    sliced).  The sublane axis is the contraction: K = 8 rows
    [ox, oy, oz, 1, dx, dy, dz, 0] for a32t, K = 16 (the same plus the
    |.| half) for aabt.  `need_hi`: ids may exceed 15 bits — add the
    TriHi radix-2^16 block (n32 = 9).  Cost: a handful of XLA reshapes
    per frame, CSE'd across a frame's trace launches."""
    f32 = jnp.float32
    TIp = n_dt.shape[0]
    nc = TIp // tc
    z3 = jnp.zeros((TIp, 3), f32)
    z1 = jnp.zeros((TIp, 1), f32)
    tri_i = tri_ids.astype(jnp.int32)
    if need_hi:
        # arithmetic radix split: lo in [0, 65535], hi carries the sign
        # (sentinel -2 -> hi -1, lo 65534; reconstructs exactly in f32)
        tri_lo = (tri_i & 0xFFFF).astype(f32)
        tri_hi = (tri_i >> 16).astype(f32)
    else:
        tri_lo = tri_i.astype(f32)  # (TIp, 1) exact 16-bit integers
        tri_hi = None
    objf = obj_ids.astype(f32)
    nf = n_f32
    cat = lambda *xs: jnp.concatenate(xs, axis=1)
    rows32 = [
        cat(nf[:, 6:9], e[:, 2:3], z3, z1),   # Oz
        cat(z3, z1, nf[:, 6:9], z1),          # Dz
        cat(nf[:, 0:3], e[:, 0:1], z3, z1),   # Ox32
        cat(nf[:, 3:6], e[:, 1:2], z3, z1),   # Oy32
        cat(z3, z1, nf[:, 0:3], z1),          # Dx32
        cat(z3, z1, nf[:, 3:6], z1),          # Dy32
        cat(z3, tri_lo, z3, z1),              # TriLo (rides the ones row)
        cat(z3, objf, z3, z1),                # Obj
    ]
    if need_hi:
        rows32.append(cat(z3, tri_hi, z3, z1))  # TriHi
    n32 = len(rows32)

    def slabs3(rows, k):
        # (TIp, k) blocks -> (NC, K, P) lane-padded
        nblk = len(rows)
        a = jnp.stack([r.reshape(nc, tc, k) for r in rows], axis=1)
        at = a.transpose(0, 3, 1, 2).reshape(nc, k, nblk * tc)
        pad = _pad128(nblk * tc) - nblk * tc
        if pad:
            at = jnp.pad(at, ((0, 0), (0, 0), (0, pad)))
        return at

    def slabs(rows, k):
        at = slabs3(rows, k)
        return at.reshape(nc * k, at.shape[2])

    if is_f32:
        a32t = slabs(rows32, 8)
    else:
        a3 = slabs3(rows32, 8)  # (NC, 8, P32) f32
        hi = a3.astype(jnp.bfloat16)
        lo = (a3 - hi.astype(f32)).astype(jnp.bfloat16)
        a32t = jnp.concatenate([hi, lo], axis=1).reshape(nc * 16, a3.shape[2])

    if no_aab:  # mxu3: the bf16x3 dot is the only triangle test
        return a32t, None, n32

    ndf = n_dt.astype(f32)  # dtype-rounded coefficients (exact in f32)
    # the kernel's error bands read 0.2*(d1+d2)*s_* — fold the constant
    # into the S rows here (two fewer VPU passes per chunk)
    sband = jnp.float32(0.2 * (d1 + d2))
    na = jnp.abs(ndf) * sband
    ea = jnp.abs(e) * sband
    z8 = jnp.zeros((TIp, 8), f32)
    s_rows = [
        cat(z8, na[:, 0:3], ea[:, 0:1], z3, z1),  # Sox
        cat(z8, na[:, 3:6], ea[:, 1:2], z3, z1),  # Soy
        cat(z8, z3, z1, na[:, 0:3], z1),           # Sdx
        cat(z8, z3, z1, na[:, 3:6], z1),           # Sdy
    ]
    if is_f32:
        rows_ab = s_rows  # u/v come from the f32 dot
    else:
        rows_ab = [
            cat(ndf[:, 0:3], e[:, 0:1], z3, z1, z8),  # Ox (dtype)
            cat(ndf[:, 3:6], e[:, 1:2], z3, z1, z8),  # Oy
            cat(z3, z1, ndf[:, 0:3], z1, z8),          # Dx
            cat(z3, z1, ndf[:, 3:6], z1, z8),          # Dy
        ] + s_rows
    aabt = slabs(rows_ab, 16).astype(f32 if is_f32 else jnp.bfloat16)
    return a32t, aabt, n32


@functools.partial(
    jax.jit,
    static_argnames=(
        "prec", "fallback", "find_any", "cull", "tile_hw", "interpret",
        "stream", "ablate", "epilogue", "select",
    ),
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
    ablate: str = "",  # perf-probe switches, see _kernel (not for production)
    epilogue: str = "reduce5",  # 'pack' = packed winner key epilogue
    select: str = "topk",  # chunk-list selection: 'topk' | 'sort' (topk measured faster or tied at every size, parity 1.0)
    di_lights=None,  # dict(light_type (L,), light_pos (L,3), light_dir (L,3)):
    # fuse the per-light shadow phase into this launch (single-chunk scenes
    # only — the per-tile chunk schedule is built for THIS launch's rays, so
    # multi-chunk shadow rays need their own launch).  Returns (Hit, vis)
    # where vis (R,) i32 holds bit l = light l visible from the winner hit.
) -> Hit:
    assert frame.dense_n is not None, "dense coefficients missing"
    # 'mxu3' (bf16/fp16 only): the manual bf16x3 MXU dot — already required
    # for the fp32-shadow z-row and the band re-test — is uniformly accurate
    # to ~2^-16 relative, BETTER than the dtype test it would be guarding,
    # so the dtype Aab slab + error band + re-test select are strictly more
    # work for strictly less accuracy.  This mode drops them: one dot, one
    # strict accept.  Deviation from the reference's DataT kernel semantics
    # (`rt/rtrt/cuda.hpp:206-283`) is conservative — results move TOWARD the
    # fp32 oracle.  fp32 mode has no shadow dot to reuse, so it keeps 'both'.
    if fallback == "mxu3" and prec.is_f32:
        fallback = "both"
    mxu3 = fallback == "mxu3"
    # the packed epilogue quantizes u/v to 15-bit fixed point — finer than
    # the bf16 mantissa but a deviation from exact fp32 semantics, so fp32
    # render mode (and the no-id ablation probe) keeps the full epilogue
    pack = epilogue == "pack" and not prec.is_f32 and "ids" not in ablate
    dt = prec.dtype
    R = origins.shape[0]
    if skip_tri is None:
        skip_tri = jnp.full((R,), -1, jnp.int32)
    # scalar min/max dist (primary launches) -> every lane is live, so the
    # single-chunk dead-tile guard's cross-lane reduction (~0.5 ms at 1080p)
    # is pure overhead; command launches pass per-lane max_dist arrays
    all_live = (
        isinstance(min_dist, (int, float))
        and isinstance(max_dist, (int, float))
        and max_dist > min_dist
    )
    min_dist = jnp.broadcast_to(jnp.asarray(min_dist, F32), (R,))
    max_dist = jnp.broadcast_to(jnp.asarray(max_dist, F32), (R,))

    tr = TR
    # screen-block coherence only matters when there are chunks to cull;
    # single-chunk scenes skip the reorder (measured 2.5 ms/launch at 1080p)
    use_blocks = cull and blockable(R, tile_hw) and frame.dense_n.shape[0] > TC
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
        # (single-chunk scenes skip it — nothing to exit early from)
        max_dist = scene_exit_cap(frame, o_f32, d_f32, max_dist)
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
    tri_pad = jnp.pad(frame.dense_tri, (0, ti_pad), constant_values=-2)
    obj_pad = jnp.pad(frame.dense_obj, (0, ti_pad), constant_values=-1)
    tri_ids = tri_pad[:, None]
    obj_ids = obj_pad[:, None]
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

    single = n_chunks == 1
    fuse_di = 0
    if di_lights is not None:
        Ld = int(di_lights["light_type"].shape[0])
        fuse_di = Ld if (single and not find_any and not pack and Ld > 0) else 0
        assert fuse_di, "di_lights requires a single-chunk closest-hit launch"
    if single:
        # no chunk scheduling at all: the kernel runs chunk 0 statically
        active = None
        maxc = 1
    else:
        if (
            cull
            and frame.obj_aabb_lo is not None
            and len(frame.obj_layout) > 1
        ):
            active, chunk_tmin = _chunk_predicates(
                frame, o_f32, d_f32, min_dist, max_dist, grid, TI + ti_pad
            )
        else:
            active = jnp.ones((grid, n_chunks), jnp.int32)
            chunk_tmin = jnp.zeros((grid, n_chunks), jnp.float32)
        # compact the active-chunk ids per tile, NEAREST FIRST: [counts (G,)
        # | t_cut bits (G,) | words (G, maxc)], each word = truncated f32
        # bits of the tile's conservative entry distance (high bits) |
        # chunk id (low id_bits) — positive-float bit patterns order like
        # the floats, and truncating the low mantissa bits only rounds the
        # bound DOWN.  The kernel walks the list in this near-to-far order
        # and stops when no live lane can improve (ordered-traversal early
        # exit).  SMEM prefetch capacity is ~1MB, so the per-tile list
        # length adapts to the tile count.
        #
        # OVERFLOW (active set larger than the list): t_cut = the entry
        # bound of the nearest chunk NOT on the list (+inf otherwise).
        # Every off-list chunk enters at >= t_cut, so after the ordered
        # prefix a lane is RESOLVED iff its best t (or maxd) is <= t_cut;
        # the kernel then sweeps all chunks only while some lane is still
        # unresolved — on big scenes the nearest-512 prefix resolves whole
        # tiles and the sweep never runs a body (the old encoding ran every
        # chunk UNORDERED for every overflow tile, the large-scene cliff).
        budget_words = (900 * 1024) // 4
        maxc = min(MAXC, max(8, budget_words // max(grid, 1) - 2))
        id_bits = max(1, (n_chunks - 1).bit_length())
        big = jnp.float32(3e38)
        tkey = jnp.where(active > 0, jnp.maximum(chunk_tmin, 0.0), big)
        take = min(maxc, n_chunks)
        if select == "topk" and n_chunks > take:
            # Exact nearest-(take+1) selection via `top_k` on the negated
            # key: O(NC log k) per tile instead of the full-width argsort's
            # O(NC log NC) — the schedule-phase lever at 1M+ tris, where
            # NC = TI/tc reaches the thousands while take stays in the tens
            # (BASELINE.md round-4 handoff item 4).  Ties may pick/order a
            # different (equally-near) subset than the stable argsort; the
            # ordered early exit and the t_cut overflow logic only need *a*
            # nearest set plus the (take+1)-th smallest bound, so results
            # differ from 'sort' only by evaluation-order tiebreaks.
            neg, ids_k = jax.lax.top_k(-tkey, take + 1)
            t_small = -neg
            ids = ids_k[:, :take].astype(jnp.int32)
            t_sel = t_small[:, :take]
            t_cut = t_small[:, take]
        else:
            order = jnp.argsort(tkey, axis=1)
            ids = order[:, :take].astype(jnp.int32)
            t_sorted = jnp.take_along_axis(tkey, order, axis=1)
            t_sel = t_sorted[:, :take]
            if n_chunks > take:
                t_cut = t_sorted[:, take]  # big where the active set fits
            else:
                t_cut = jnp.full((grid,), big, jnp.float32)
        tbits = jax.lax.bitcast_convert_type(t_sel, jnp.int32)
        words = (tbits & ~((1 << id_bits) - 1)) | ids
        if take < maxc:
            words = jnp.pad(words, ((0, 0), (0, maxc - take)))
        tcut_bits = jax.lax.bitcast_convert_type(t_cut, jnp.int32)
        count = jnp.minimum(jnp.sum(active, axis=1, dtype=jnp.int32), take)
        active = jnp.concatenate([count, tcut_bits, words.reshape(-1)])

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
        single=single,
        guarded=not all_live,
        ablate=ablate,
        pack=pack,
        di_lights=fuse_di,
        # in-kernel shadow origins are f32 (o + t*d from the split rays);
        # the mxu3/f32 tests keep ~f32 t accuracy, so only the exact
        # epsilon applies — the dtype test re-quantizes and keeps the
        # dtype offset (config.Precision.ray_moveforward_t_exact)
        d_mov=float(
            prec.ray_moveforward_t_exact
            if (fallback == "mxu3" or prec.is_f32)
            else prec.ray_moveforward_t
        ),
    )

    # index maps take (grid index[, scalar-prefetch ref])
    const = lambda shape: pl.BlockSpec(shape, lambda i, *_: (0,) * len(shape), memory_space=pltpu.VMEM)
    ray_block = lambda rows: pl.BlockSpec((rows, tr), lambda i, *_: (0, i), memory_space=pltpu.VMEM)

    # bf16 mode carries tri ids through the hi/lo split, which is exact
    # only below 2^16; larger id spaces add the TriHi radix block.  The
    # bound must be static: dense_tri indexes the global mesh triangle
    # table, so its size is the id ceiling.
    need_hi = (not prec.is_f32) and scene.tri_idx.shape[0] > (1 << 16)
    a32t, aabt, n32 = _mxu_tables(
        n_dt, n_f32, e, tri_ids, obj_ids, tc, dt, prec.is_f32, need_hi,
        d1=prec.delta1, d2=prec.delta2, no_aab=mxu3,
    )
    kernel = functools.partial(kernel, n32=n32)
    tables = (a32t,) if mxu3 else (a32t, aabt)
    if stream:
        # the A tables stay in HBM; each chunk's slabs (whole sublane
        # tiles, trivially DMA-aligned) stream into VMEM scratch on demand
        table_specs = [pl.BlockSpec(memory_space=pl.ANY) for _ in tables]
        table_args = tables
        scratch_shapes = [
            pltpu.VMEM((8 if prec.is_f32 else 16, a32t.shape[1]), a32t.dtype),
        ]
        if not mxu3:
            scratch_shapes.append(pltpu.VMEM((16, aabt.shape[1]), aabt.dtype))
        scratch_shapes.append(pltpu.SemaphoreType.DMA)
        if not mxu3:
            scratch_shapes.append(pltpu.SemaphoreType.DMA)
    else:
        table_specs = [const(t.shape) for t in tables]
        table_args = tables
        scratch_shapes = []

    # ONE packed ray operand, pre-laid in the kernel's B32 feature order
    # [o; 1; d; 0 | skip; mind; maxd] — fewer per-tile blocked windows
    rays = jnp.concatenate(
        [
            o,
            jnp.ones((1, Rp), F32),
            d,
            jnp.zeros((1, Rp), F32),
            skip_tri[None, :].astype(F32),
            min_dist[None, :],
            max_dist[None, :],
        ],
        axis=0,
    )  # (11, Rp)
    in_specs = table_specs + [ray_block(11)]
    extra_args = []
    if fuse_di:
        # per-light broadcast parameter rows, 4 per light: [is_directional,
        # ax, ay, az] where a = -normalize(dir) (directional) or the
        # RECENTERED position (point/spot) — same recentering as the rays
        from low_precision_raytracer_tpu.models.hierarchy import (
            LIGHT_DIRECTIONAL,
        )

        lt = di_lights["light_type"]
        lp = di_lights["light_pos"].astype(F32) - c[None, :]
        ld = di_lights["light_dir"].astype(F32)
        nrm2 = jnp.sum(ld * ld, axis=1, keepdims=True)
        ldn = ld / jnp.sqrt(jnp.maximum(nrm2, 1e-20))
        isdir = lt == LIGHT_DIRECTIONAL
        avec = jnp.where(isdir[:, None], -ldn, lp)
        rows = jnp.concatenate([isdir.astype(F32)[:, None], avec], axis=1)
        flat = rows.reshape(-1)  # (4L,)
        flat = jnp.pad(flat, (0, (-(4 * fuse_di)) % 8))
        light_rows = jnp.broadcast_to(flat[:, None], (flat.shape[0], tr))
        in_specs = in_specs + [const(light_rows.shape)]
        extra_args = [light_rows]
    nf = 1 if pack else 3
    out_specs = [ray_block(nf), ray_block(2)]
    out_shape = [
        jax.ShapeDtypeStruct((nf, Rp), F32),
        jax.ShapeDtypeStruct((2, Rp), jnp.int32),
    ]
    if fuse_di:
        out_specs.append(ray_block(1))
        out_shape.append(jax.ShapeDtypeStruct((1, Rp), jnp.int32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0 if single else 1,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    args = ([] if single else [active]) + [*table_args, rays] + extra_args
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    if fuse_di:
        outf, ids, vis = outs
    else:
        outf, ids = outs
    def cut(x):
        x = x[:R]
        return from_blocks(x, H_t, W_t) if use_blocks else x

    if pack:
        # decode the packed epilogue outputs: winner coefficient-table ROW
        # -> (tri, obj) via one 2-channel table take, 15-bit fixed-point
        # (u, v) -> f32.  Misses carry row = -1 from the init.
        row = cut(ids[0])
        pk = cut(ids[1])
        valid = row >= 0
        rc = jnp.clip(row, 0, tri_pad.shape[0] - 1)
        tri_o = jnp.where(valid, jnp.take(tri_pad, rc), -1)
        obj_o = jnp.where(valid, jnp.take(obj_pad, rc), -1)
        inv_q = jnp.float32(1.0 / 16384.0)
        u_o = jnp.where(valid, (pk >> 15).astype(F32) * inv_q - 0.5, 0.0)
        v_o = jnp.where(valid, (pk & 0x7FFF).astype(F32) * inv_q - 0.5, 0.0)
        return Hit(t=cut(outf[0]), u=u_o, v=v_o, tri=tri_o, obj=obj_o)

    hit = Hit(t=cut(outf[0]), u=cut(outf[1]), v=cut(outf[2]),
              tri=cut(ids[0]), obj=cut(ids[1]))
    if fuse_di:
        return hit, cut(vis[0])
    return hit


def _spread3(x):  # 7 bits -> every 3rd bit
    x = (x | (x << 8)) & 0x0100F00F
    x = (x | (x << 4)) & 0x010C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _morton_key(origins, directions, live=None, mode: str = "beam"):
    """Sort key for ray coherence recovery: liveness (top bit — dead lanes
    cluster into packets that terminate immediately, the stream-compaction
    effect of the reference's wavefront queues), then direction octant
    (3 bits), then a 6-D position+direction code.

    The tile-level chunk cull is an interval-bundle slab test
    (`_tile_chunk_predicates`): its tightness is the PRODUCT of the tile's
    origin extent and direction cone.  Position-only keys (mode='origin',
    the round-2 key) leave bounce tiles with a ~90-degree cone (full
    octant) and the cull collapses on multi-chunk scenes; interleaving
    quantized |direction| bits with the origin bits (mode='beam') makes
    each 512-ray tile a narrow BEAM."""
    of = origins.astype(F32)
    df = directions.astype(F32)
    lo = jnp.min(of, axis=0)
    hi = jnp.max(of, axis=0)
    octant = (
        (df[:, 0] > 0).astype(jnp.int32)
        | ((df[:, 1] > 0).astype(jnp.int32) << 1)
        | ((df[:, 2] > 0).astype(jnp.int32) << 2)
    )
    if mode == "origin":
        q = jnp.clip(
            (of - lo) / jnp.maximum(hi - lo, 1e-6) * 127, 0, 127
        ).astype(jnp.int32)
        m = _spread3(q[:, 0]) | (_spread3(q[:, 1]) << 1) | (_spread3(q[:, 2]) << 2)
        key = (octant << 21) | m
    else:  # 'beam': [oct | (o,d) interleaved 4+4 bits/axis, origin-major]
        qo = jnp.clip(
            (of - lo) / jnp.maximum(hi - lo, 1e-6) * 15, 0, 15
        ).astype(jnp.int32)
        qd = jnp.clip(jnp.abs(df) * 15, 0, 15).astype(jnp.int32)

        def spread6(x):  # 4 bits -> bits 0, 6, 12, 18
            x = (x | (x << 10)) & 0x00003003  # b0,b1 @ 0,1; b2,b3 @ 12,13
            x = (x | (x << 5)) & 0x00041041  # -> 0, 6, 12, 18
            return x

        m = (
            (spread6(qo[:, 0]) << 5)
            | (spread6(qo[:, 1]) << 4)
            | (spread6(qo[:, 2]) << 3)
            | (spread6(qd[:, 0]) << 2)
            | (spread6(qd[:, 1]) << 1)
            | spread6(qd[:, 2])
        )
        key = (octant << 24) | m
    if live is not None:
        key = key | jnp.where(live, 0, jnp.int32(1 << 28))
    return key


def ray_aabb_entry(lo, hi, o, d, maxd):
    """Conservative slab-test entry bound of rays (RS, 3) against boxes
    (N, 3): -> (entry (RS, N) f32 >= 0, ok (RS, N) bool).  Single source of
    truth for the 0.02 slop and the isfinite handling — the anchor key,
    the wavefront schedule, and the analysis tool all consume this."""
    inv = 1.0 / d
    big = jnp.float32(3e38)
    t1 = (lo[None] - o[:, None]) * inv[:, None]  # (RS, N, 3)
    t2 = (hi[None] - o[:, None]) * inv[:, None]
    a = jnp.minimum(t1, t2)
    b = jnp.maximum(t1, t2)
    fin = jnp.isfinite(a) & jnp.isfinite(b)
    tmin = jnp.max(jnp.where(fin, a, -big), axis=-1)
    tmax = jnp.min(jnp.where(fin, b, big), axis=-1)
    slop = jnp.float32(0.02)
    entry = jnp.maximum(tmin - slop, 0.0)
    ok = (
        jnp.any(fin, axis=-1)
        & (tmin <= tmax + slop)
        & (tmax + slop >= 0)
        & (entry < maxd[:, None])
    )
    return entry, ok


def scene_exit_cap(frame, o_f32, d_f32, max_dist):
    """Cap every lane's reach at its scene-AABB exit distance: no hit can
    lie beyond it, and an uncapped miss lane (t = 1e5) pins every ordered
    early exit it shares a tile with."""
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
    return jnp.minimum(max_dist, jnp.maximum(texit, 0.0) * 1.01 + slop)


def _anchor_key(frame, origins, directions, max_dist, live):
    """EXACT per-ray scheduling collapsed into a sort key: the anchor is
    the ray's nearest chunk by slab-test entry bound (computed per RAY,
    not per tile — the tile-level interval bundle degenerates on
    incoherent launches, this does not), followed by direction bits.

    Rays grouped by (anchor, direction) form tiles whose origin bundle is
    chunk-tight AND whose direction cone is narrow, so the kernel's
    interval-bundle candidate list and box-distance ordered early exit
    both work at per-ray quality — the cheap form of the per-ray
    chunk-list wavefront (docs/TPU_NOTES.md design sketch): each tile's
    ordered walk IS the per-ray ordered traversal at tile granularity.

    Chunks group into <= 1024 anchors (consecutive-id supersets share
    spatial locality by construction) to bound the (R, NA) sweep; the
    argmin is one VPU pass over it, evaluated in ray slabs via lax.map so
    the intermediate stays ~16M elements regardless of R."""
    of = origins.astype(F32)
    df = directions.astype(F32)
    lo = frame.dense_chunk_lo
    hi = frame.dense_chunk_hi
    nc = lo.shape[0]
    s = -(-nc // 1024)  # supergroup size -> <= 1024 anchors
    if s > 1:
        pad = (-nc) % s
        big = jnp.float32(3e38)
        lo_g = jnp.pad(lo, ((0, pad), (0, 0)), constant_values=big)
        hi_g = jnp.pad(hi, ((0, pad), (0, 0)), constant_values=-big)
        lo_g = lo_g.reshape(-1, s, 3).min(axis=1)
        hi_g = hi_g.reshape(-1, s, 3).max(axis=1)
    else:
        lo_g, hi_g = lo, hi
    na = lo_g.shape[0]

    R = of.shape[0]
    # slab size: (rs, NA, 3) temporaries are the budget (3x the (rs, NA)
    # sweep itself) — keep them ~64MB f32 before fusion
    rs = max(4096, min(R, (1 << 24) // (3 * na)))
    r_pad = (-R) % rs
    mx = jnp.broadcast_to(jnp.asarray(max_dist, F32), (R,))
    if r_pad:
        of_p = jnp.pad(of, ((0, r_pad), (0, 0)))
        df_p = jnp.pad(df, ((0, r_pad), (0, 0)), constant_values=1.0)
        mx_p = jnp.pad(mx, (0, r_pad))
    else:
        of_p, df_p, mx_p = of, df, mx

    def slab_anchor(args):
        o, d, mxd = args  # (rs, 3), (rs, 3), (rs,)
        entry, ok = ray_aabb_entry(lo_g, hi_g, o, d, mxd)
        big = jnp.float32(3e38)
        return jnp.argmin(jnp.where(ok, entry, big), axis=1).astype(jnp.int32)

    n_slabs = (R + r_pad) // rs
    anchor = jax.lax.map(
        slab_anchor,
        (
            of_p.reshape(n_slabs, rs, 3),
            df_p.reshape(n_slabs, rs, 3),
            mx_p.reshape(n_slabs, rs),
        ),
    ).reshape(-1)[:R]

    octant = (
        (df[:, 0] > 0).astype(jnp.int32)
        | ((df[:, 1] > 0).astype(jnp.int32) << 1)
        | ((df[:, 2] > 0).astype(jnp.int32) << 2)
    )
    qd = jnp.clip(jnp.abs(df) * 3, 0, 3).astype(jnp.int32)  # 2 bits/axis
    dirbits = (octant << 6) | (qd[:, 0] << 4) | (qd[:, 1] << 2) | qd[:, 2]
    key = (anchor << 9) | dirbits
    return key | jnp.where(live, 0, jnp.int32(1 << 28))


@functools.partial(
    jax.jit,
    static_argnames=(
        "prec", "fallback", "find_any", "interpret", "stream", "key_mode",
        "epilogue", "select",
    ),
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
    key_mode: str = "beam",
    epilogue: str = "reduce5",
    select: str = "topk",
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
    if key_mode == "anchor" and frame.dense_chunk_lo is not None:
        key = _anchor_key(
            frame, origins, directions, max_dist, live=max_dist > min_dist,
        )
    else:
        if key_mode == "anchor":
            key_mode = "beam"  # no chunk AABBs to anchor on
        key = _morton_key(
            origins, directions, live=max_dist > min_dist, mode=key_mode
        )
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
        epilogue=epilogue,
        select=select,
    )
    back = jax.lax.sort([srt[10], hit.t, hit.u, hit.v, hit.tri, hit.obj], num_keys=1)
    return Hit(t=back[1], u=back[2], v=back[3], tri=back[4], obj=back[5])
