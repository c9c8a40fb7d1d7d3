"""Dense (BVH-free) ray-scene intersection for small scenes — the MXU path.

TPU-native insight: the reference's M-shift triangle test
(`rt/rtrt/cuda.hpp:205-240`) transforms the ray by per-triangle matrix rows,
which across a *batch of rays x batch of triangles* is exactly a pair of
``(R, 3) @ (3, T)`` matmuls per row — systolic-array food.  For scenes up to
a few thousand triangles, testing every ray against every triangle on the
MXU beats any divergent traversal: zero gathers, zero control flow, bf16
inputs with fp32 accumulation (`preferred_element_type`), which is exactly
the "low-precision trace with fp32 accumulation" the design calls for.

Semantics vs the traversal path:
- partial products are accumulated in fp32 by the MXU instead of the
  reference's term-by-term dtype adds; the error bounds use the same
  delta constants on the sum of |partials| (computed as |O| @ |m|, also a
  matmul), which keeps them conservative;
- (Oz, Dz, t) stay fp32 exactly like the reference (fp32 matmul);
- the ambiguous-band fp32 fallback, skip-geometry, min/max distance and
  closest-hit semantics are identical.

Per-object world->local transforms use a static Python loop over objects
(object count is small by construction when this path is selected).
"""

from __future__ import annotations

import jax.numpy as jnp

from low_precision_raytracer_tpu.config import Precision
from low_precision_raytracer_tpu.ops.traversal import Hit, _transform_ray

F32 = jnp.float32


def _matmul(a, b, out_dtype=F32):
    return jnp.dot(a, b, preferred_element_type=out_dtype)


def trace_rays_dense(
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
    find_any: bool = False,  # no early-out in dense mode; same result
) -> Hit:
    """All-pairs closest-hit over every object instance.  Shapes: (R, 3) in."""
    dt = prec.dtype
    R = origins.shape[0]
    o_w = origins.astype(dt)
    d_w = directions.astype(dt)
    min_dist = jnp.broadcast_to(jnp.asarray(min_dist, F32), (R,))
    max_dist = jnp.broadcast_to(jnp.asarray(max_dist, F32), (R,))
    if skip_tri is None:
        skip_tri = jnp.full((R,), -1, jnp.int32)

    d1 = jnp.asarray(prec.delta1, F32)
    d2 = jnp.asarray(prec.delta2, F32)

    best_t = jnp.full((R,), 1e5, F32)
    best_u = jnp.zeros((R,), F32)
    best_v = jnp.zeros((R,), F32)
    best_tri = jnp.full((R,), -1, jnp.int32)
    best_obj = jnp.full((R,), -1, jnp.int32)

    assert frame.obj_layout, "FrameInput.obj_layout required for the dense backend"
    for o, (_mesh, t0, t1) in enumerate(frame.obj_layout):
        T = t1 - t0
        if T == 0:
            continue
        tri_ids = jnp.arange(t0, t1, dtype=jnp.int32)

        o_loc, d_loc = _transform_ray(frame.obj_w2l[o].astype(dt), o_w, d_w)

        v2 = scene.tri_v2[t0:t1]  # (T, 3) dtype
        m = scene.tri_m[t0:t1]  # (T, 3, 3) dtype
        m0 = m[:, 0, :].T  # (3, T)
        m1 = m[:, 1, :].T
        m2f = m[:, 2, :].astype(F32).T

        # Ox = (o_loc - v2_t) . m0_t  =  o_loc@m0 - diag(v2@m0) per triangle
        c0 = jnp.sum(v2 * m[:, 0, :], axis=-1).astype(F32)  # (T,)
        c1 = jnp.sum(v2 * m[:, 1, :], axis=-1).astype(F32)
        c2 = jnp.sum(v2.astype(F32) * m[:, 2, :].astype(F32), axis=-1)

        Ox = _matmul(o_loc, m0) - c0  # (R, T) f32 accum
        Dx = _matmul(d_loc, m0)
        Oy = _matmul(o_loc, m1) - c1
        Dy = _matmul(d_loc, m1)
        Oz = _matmul(o_loc.astype(F32), m2f) - c2
        Dz = _matmul(d_loc.astype(F32), m2f)

        t = -Oz / Dz  # (R, T) f32
        t_dx = t * Dx
        t_dy = t * Dy
        u = Ox + t_dx
        v = Oy + t_dy

        # error bounds: sum|partials| via abs-matmuls (conservative)
        s_ox = _matmul(jnp.abs(o_loc), jnp.abs(m0)) + jnp.abs(c0)
        s_dx = _matmul(jnp.abs(d_loc), jnp.abs(m0))
        s_oy = _matmul(jnp.abs(o_loc), jnp.abs(m1)) + jnp.abs(c1)
        s_dy = _matmul(jnp.abs(d_loc), jnp.abs(m1))
        d12 = d1 + d2
        e_ox = d12 * s_ox
        e_dx = d12 * s_dx
        e_oy = d12 * s_oy
        e_dy = d12 * s_dy
        error_u = (e_ox + t * e_dx + d1 * (jnp.abs(Ox) + 3 * jnp.abs(t_dx))) * 0.2
        error_v = (e_oy + t * e_dy + d1 * (jnp.abs(Oy) + 3 * jnp.abs(t_dy))) * 0.2

        w = 1.0 - u - v
        in_band = lambda x, e: (x >= -e) & (x <= 0)
        ambiguous = (
            in_band(u, error_u) | in_band(v, error_v) | in_band(w, error_u + error_v)
        )
        dtype_accept = (u > -error_u) & (v > -error_v) & (u + v < 1 + error_u + error_v)

        if fallback == "both" and not prec.is_f32:
            v2f = scene.tri_v2_f32[t0:t1]
            mf = scene.tri_m_f32[t0:t1]
            m0f = mf[:, 0, :].T
            m1f = mf[:, 1, :].T
            m2ff = mf[:, 2, :].T
            c0f = jnp.sum(v2f * mf[:, 0, :], axis=-1)
            c1f = jnp.sum(v2f * mf[:, 1, :], axis=-1)
            c2f = jnp.sum(v2f * mf[:, 2, :], axis=-1)
            olf = o_loc.astype(F32)
            dlf = d_loc.astype(F32)
            Ox32 = _matmul(olf, m0f) - c0f
            Dx32 = _matmul(dlf, m0f)
            Oy32 = _matmul(olf, m1f) - c1f
            Dy32 = _matmul(dlf, m1f)
            Oz32 = _matmul(olf, m2ff) - c2f
            Dz32 = _matmul(dlf, m2ff)
            t32 = -Oz32 / Dz32
            u32 = Ox32 + t32 * Dx32
            v32 = Oy32 + t32 * Dy32
            ok32 = (u32 > 0) & (v32 > 0) & (u32 + v32 < 1)
            t_sel = jnp.where(ambiguous, t32, t)
            u_sel = jnp.where(ambiguous, u32, u)
            v_sel = jnp.where(ambiguous, v32, v)
            accept_geom = jnp.where(ambiguous, ok32, dtype_accept)
        elif fallback == "both":
            # fp32 precision: the "fallback" is the same numbers with the
            # strict (unwidened) acceptance inside the band, like the
            # reference's fp32 template instantiation
            strict = (u > 0) & (v > 0) & (u + v < 1)
            t_sel, u_sel, v_sel = t, u, v
            accept_geom = jnp.where(ambiguous, strict, dtype_accept)
        else:
            t_sel, u_sel, v_sel = t, u, v
            accept_geom = dtype_accept

        accept = (
            accept_geom
            & (t_sel > min_dist[:, None])
            & (t_sel < max_dist[:, None])
            & (tri_ids[None, :] != skip_tri[:, None])
            & jnp.isfinite(t_sel)
        )

        t_masked = jnp.where(accept, t_sel, jnp.inf)
        k = jnp.argmin(t_masked, axis=1)  # (R,)
        tk = jnp.take_along_axis(t_masked, k[:, None], axis=1)[:, 0]
        any_hit = jnp.isfinite(tk) & (tk < best_t)
        uk = jnp.take_along_axis(u_sel, k[:, None], axis=1)[:, 0]
        vk = jnp.take_along_axis(v_sel, k[:, None], axis=1)[:, 0]

        best_u = jnp.where(any_hit, uk, best_u)
        best_v = jnp.where(any_hit, vk, best_v)
        best_tri = jnp.where(any_hit, tri_ids[k], best_tri)
        best_obj = jnp.where(any_hit, jnp.int32(o), best_obj)
        best_t = jnp.where(any_hit, tk, best_t)

    return Hit(t=best_t, u=best_u, v=best_v, tri=best_tri, obj=best_obj)
