"""Pallas TPU kernel for the dense all-pairs intersection.

Same math as ops/dense.py (world-space per-instance-triangle coefficients,
see `models/scene.py:_dense_coefficients`) but hand-scheduled for the TPU
memory hierarchy:

- the whole coefficient table (up to ~8k instance-triangles) is VMEM-resident
  and reused across every ray tile (constant index_map => loaded once);
- rays are tiled onto the 128-wide lane dimension, triangle chunks onto the
  sublane dimension, so each (TC, TR) test block is a pure VPU broadcast
  pattern with zero gathers and zero HBM traffic beyond the ray tile itself;
- bf16 coefficients are widened to fp32 at the multiply (bf16 storage, fp32
  accumulate — the MXU-mode equivalent for the VPU), the z-row/t always uses
  the fp32 shadow coefficients (`rt/rtrt/cuda.hpp:234-240`);
- the closest hit is tracked tile-locally with a min-reduce + winner-mask
  trick (no argmin gathers).

The dtype error-band + fp32 re-test ('both') is evaluated unconditionally:
on a 128-lane vector unit the band is almost always non-empty somewhere in
the tile, so predication would rarely pay.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from low_precision_raytracer_tpu.config import Precision
from low_precision_raytracer_tpu.ops.traversal import Hit

F32 = jnp.float32

TR = 512  # rays per tile (lane axis, multiple of 128)
TC = 128  # triangles per chunk (sublane axis)


def _kernel(
    n_dt_ref,  # (TI, 9) dtype   rows 0,1 used
    n_f32_ref,  # (TI, 9) f32    all rows
    e_ref,  # (TI, 3) f32
    tri_ref,  # (TI, 1) i32
    obj_ref,  # (TI, 1) i32
    o_ref,  # (3, TR) f32 (recentered)
    d_ref,  # (3, TR) f32
    skip_ref,  # (1, TR) i32
    mind_ref,  # (1, TR) f32
    maxd_ref,  # (1, TR) f32
    t_out,  # (1, TR) f32
    u_out,
    v_out,
    tri_out,  # (1, TR) i32
    obj_out,
    *,
    n_chunks: int,
    d1: float,
    d2: float,
    fallback: str,
    is_f32: bool,
):
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

    best_t = jnp.full((1, TR), 1e5, F32)
    best_u = jnp.zeros((1, TR), F32)
    best_v = jnp.zeros((1, TR), F32)
    best_tri = jnp.full((1, TR), -1, jnp.int32)
    best_obj = jnp.full((1, TR), -1, jnp.int32)

    for c in range(n_chunks):
        sl = pl.ds(c * TC, TC)
        n_dt = n_dt_ref[sl, :].astype(F32)  # bf16 storage -> f32 math
        n_f = n_f32_ref[sl, :]
        e = e_ref[sl, :]
        tri = tri_ref[sl, :]  # (TC, 1)
        obj = obj_ref[sl, :]

        def row(nmat, k, e_col):
            # (TC, 1) coeffs broadcast against (1, TR) ray components
            o_val = nmat[:, 3 * k : 3 * k + 1] * ox + nmat[:, 3 * k + 1 : 3 * k + 2] * oy + nmat[:, 3 * k + 2 : 3 * k + 3] * oz + e_col
            d_val = nmat[:, 3 * k : 3 * k + 1] * dx + nmat[:, 3 * k + 1 : 3 * k + 2] * dy + nmat[:, 3 * k + 2 : 3 * k + 3] * dz
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
            a = jnp.abs(nmat[:, 3 * k : 3 * k + 1]) * jnp.abs(ox) \
                + jnp.abs(nmat[:, 3 * k + 1 : 3 * k + 2]) * jnp.abs(oy) \
                + jnp.abs(nmat[:, 3 * k + 2 : 3 * k + 3]) * jnp.abs(oz) + jnp.abs(e_col)
            b = jnp.abs(nmat[:, 3 * k : 3 * k + 1]) * jnp.abs(dx) \
                + jnp.abs(nmat[:, 3 * k + 1 : 3 * k + 2]) * jnp.abs(dy) \
                + jnp.abs(nmat[:, 3 * k + 2 : 3 * k + 3]) * jnp.abs(dz)
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
        # winner = smallest tri id among entries achieving t_min
        at_min = t_masked == t_min
        big = jnp.int32(2**30)
        tri_win = jnp.min(jnp.where(at_min, tri, big), axis=0, keepdims=True)
        win = at_min & (tri == tri_win)
        neg = jnp.float32(-3e38)
        u_win = jnp.max(jnp.where(win, u_sel, neg), axis=0, keepdims=True)
        v_win = jnp.max(jnp.where(win, v_sel, neg), axis=0, keepdims=True)
        obj_win = jnp.max(jnp.where(win, obj, -1), axis=0, keepdims=True)

        better = jnp.isfinite(t_min) & (t_min < best_t)
        best_t = jnp.where(better, t_min, best_t)
        best_u = jnp.where(better, u_win, best_u)
        best_v = jnp.where(better, v_win, best_v)
        best_tri = jnp.where(better, tri_win, best_tri)
        best_obj = jnp.where(better, obj_win, best_obj)

    t_out[:, :] = best_t
    u_out[:, :] = best_u
    v_out[:, :] = best_v
    tri_out[:, :] = best_tri
    obj_out[:, :] = best_obj


@functools.partial(
    jax.jit, static_argnames=("prec", "fallback", "find_any", "interpret")
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
    interpret: bool = False,
) -> Hit:
    assert frame.dense_n is not None, "dense coefficients missing"
    dt = prec.dtype
    R = origins.shape[0]
    if skip_tri is None:
        skip_tri = jnp.full((R,), -1, jnp.int32)
    min_dist = jnp.broadcast_to(jnp.asarray(min_dist, F32), (R,))
    max_dist = jnp.broadcast_to(jnp.asarray(max_dist, F32), (R,))

    # recentered fp32 ray components, (3, R) layout (rays on lanes)
    c = frame.dense_center
    o = (origins.astype(F32) - c).T
    d = directions.astype(F32).T

    TI = frame.dense_n.shape[0]
    ti_pad = (-TI) % TC
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

    r_pad = (-R) % TR
    if r_pad:
        o = jnp.pad(o, ((0, 0), (0, r_pad)))
        d = jnp.pad(d, ((0, 0), (0, r_pad)), constant_values=1.0)
        skip_tri = jnp.pad(skip_tri, (0, r_pad), constant_values=-1)
        min_dist = jnp.pad(min_dist, (0, r_pad))
        max_dist = jnp.pad(max_dist, (0, r_pad))
    Rp = R + r_pad
    grid = Rp // TR

    kernel = functools.partial(
        _kernel,
        n_chunks=(TI + ti_pad) // TC,
        d1=prec.delta1,
        d2=prec.delta2,
        fallback=fallback,
        is_f32=prec.is_f32,
    )

    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    ray_block = lambda rows: pl.BlockSpec((rows, TR), lambda i: (0, i), memory_space=pltpu.VMEM)

    t, u, v, tri, obj = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            const(n_dt.shape),
            const(n_f32.shape),
            const(e.shape),
            const(tri_ids.shape),
            const(obj_ids.shape),
            ray_block(3),
            ray_block(3),
            ray_block(1),
            ray_block(1),
            ray_block(1),
        ],
        out_specs=[ray_block(1)] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((1, Rp), F32),
            jax.ShapeDtypeStruct((1, Rp), F32),
            jax.ShapeDtypeStruct((1, Rp), F32),
            jax.ShapeDtypeStruct((1, Rp), jnp.int32),
            jax.ShapeDtypeStruct((1, Rp), jnp.int32),
        ],
        interpret=interpret,
    )(
        n_dt,
        n_f32,
        e,
        tri_ids,
        obj_ids,
        o,
        d,
        skip_tri[None, :],
        min_dist[None, :],
        max_dist[None, :],
    )
    cut = lambda x: x[0, :R]
    return Hit(t=cut(t), u=cut(u), v=cut(v), tri=cut(tri), obj=cut(obj))
