"""Traced primary-visibility G-buffer (`fill_gbuffer_in_cuda`,
`rt/rtrt/cuda.hpp:950-1012`).

On TPU this is THE primary-ray pass — the reference's OpenGL raster path
(SURVEY.md 2.13) has no equivalent and its traced alternative becomes the
default.  Produces a dict of SoA pixel arrays instead of 7 MRT surfaces.
"""

from __future__ import annotations

import jax.numpy as jnp

from low_precision_raytracer_tpu.config import Precision, RenderConfig
from low_precision_raytracer_tpu.math.vec import normalize
from low_precision_raytracer_tpu.ops.trace import trace
from low_precision_raytracer_tpu.ops.traversal import Hit


def interpolate_hit_attributes(scene, frame, hit: Hit, dtype):
    """Barycentric attribute interpolation + local-to-world transform
    (shared by the G-buffer pass and `trace_gi`, `rt/rtrt/cuda.hpp:966-988,
    2108-2131`).

    Like the reference, normals/tangents are transformed by L2W directly
    (no inverse-transpose), so non-uniform scale skews them identically.
    """
    dt = dtype
    tri = jnp.maximum(hit.tri, 0)
    obj = jnp.maximum(hit.obj, 0)
    idx = jnp.take(scene.tri_idx, tri, axis=0, mode="clip")  # (R, 3)

    u = hit.u.astype(dt)[..., None]
    v = hit.v.astype(dt)[..., None]
    w = (1.0 - hit.u - hit.v).astype(dt)[..., None]

    def lerp(attr):
        a0 = jnp.take(attr, idx[..., 0], axis=0, mode="clip")
        a1 = jnp.take(attr, idx[..., 1], axis=0, mode="clip")
        a2 = jnp.take(attr, idx[..., 2], axis=0, mode="clip")
        return (u * a0 + v * a1 + w * a2).astype(dt)

    position = lerp(scene.v_pos)
    normal = normalize(lerp(scene.v_normal))
    tangent = normalize(lerp(scene.v_tangent))
    color = lerp(scene.v_color)
    uv0 = lerp(scene.v_uv0)
    uv1 = lerp(scene.v_uv1)

    l2w = jnp.take(frame.obj_l2w, obj, axis=0, mode="clip")  # (R, 4, 4) dtype
    rot = l2w[..., :3, :3]
    normal = normalize((rot @ normal[..., :, None])[..., 0])
    tangent = normalize((rot @ tangent[..., :, None])[..., 0])
    pos_w = (rot @ position[..., :, None])[..., 0] + l2w[..., :3, 3]

    material = jnp.take(frame.obj_material, obj, mode="clip")
    return dict(
        position=pos_w,
        normal=normal,
        tangent=tangent,
        color=color,
        uv0=uv0,
        uv1=uv1,
        material=material,
        obj=hit.obj,
        tri=hit.tri,
    )


def fill_gbuffer(scene, frame, origins, directions, prec: Precision, *, cfg: RenderConfig):
    """Trace primary rays and produce the G-buffer pixel arrays.

    origins/directions: (R, 3) dtype.  Returns dict with `valid` mask plus
    the interpolated surface attributes (zeros on miss, like the reference's
    zero-fill, `rt/rtrt/cuda.hpp:1003-1011`) and `depth` (clip-space w aka
    ray t; the reference packs clip depth into normal_depth.w — we store the
    world-space hit distance which feeds SVGF's depth gradients).
    """
    hit = trace(
        scene,
        frame,
        origins,
        directions,
        prec=prec,
        cfg=cfg,
        find_any=False,
    )
    attrs = interpolate_hit_attributes(scene, frame, hit, prec.dtype)
    valid = hit.tri >= 0
    vz = valid[..., None]
    zero3 = jnp.zeros_like(attrs["position"])
    g = dict(
        valid=valid,
        position=jnp.where(vz, attrs["position"], zero3),
        normal=jnp.where(vz, attrs["normal"], zero3),
        tangent=jnp.where(vz, attrs["tangent"], zero3),
        color=jnp.where(vz, attrs["color"], zero3),
        uv0=jnp.where(vz, attrs["uv0"], jnp.zeros_like(attrs["uv0"])),
        uv1=jnp.where(vz, attrs["uv1"], jnp.zeros_like(attrs["uv1"])),
        obj=jnp.where(valid, hit.obj, 0),
        tri=jnp.where(valid, hit.tri, 0),
        material=jnp.where(valid, attrs["material"], 0),
        depth=jnp.where(valid, hit.t, 0.0).astype(prec.dtype),
        t=hit.t,
    )
    return g, hit
