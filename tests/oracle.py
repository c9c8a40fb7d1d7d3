"""fp64 numpy brute-force ray tracer used as the test oracle.

Intersects every triangle of every object in world space (valid because the
reference's W2L ray transform is affine, so the local-space t equals the
world-space t).  Barycentric convention matches the M-shift test:
(u, v, w) weight vertices (0, 1, 2)."""

from __future__ import annotations

import numpy as np


def world_triangles(flat, meshes):
    """-> (tris (T, 3, 3) f64 world space, tri_obj (T,) i32, tri_global (T,) i32)."""
    out, obj_ids, glob_ids = [], [], []
    t_off = np.cumsum([0] + [m.n_triangles for m in meshes])
    for o in range(flat.obj_mesh.shape[0]):
        mesh = meshes[int(flat.obj_mesh[o])]
        l2w = flat.obj_l2w[o].astype(np.float64)
        v = mesh.positions.astype(np.float64)
        vw = (l2w[:3, :3] @ v.T).T + l2w[:3, 3]
        tris = vw[mesh.indices]
        out.append(tris)
        obj_ids.append(np.full(len(tris), o, np.int32))
        glob_ids.append(np.arange(len(tris), dtype=np.int32) + t_off[int(flat.obj_mesh[o])])
    return np.concatenate(out), np.concatenate(obj_ids), np.concatenate(glob_ids)


def brute_force_trace(
    flat,
    meshes,
    origins,
    directions,
    min_dist=0.0,
    max_dist=1e5,
    skip_tri=None,
    find_any=False,
):
    """-> dict(t, u, v, tri, obj, hit) fp64/int32 arrays of shape (R,)."""
    tris, tri_obj, tri_glob = world_triangles(flat, meshes)
    o = np.asarray(origins, np.float64)
    d = np.asarray(directions, np.float64)
    R = o.shape[0]
    best_t = np.full(R, 1e5)
    best_u = np.zeros(R)
    best_v = np.zeros(R)
    best_tri = np.full(R, -1, np.int32)
    best_obj = np.full(R, -1, np.int32)

    v0, v1, v2 = tris[:, 0], tris[:, 1], tris[:, 2]
    e0 = v0 - v2
    e1 = v1 - v2
    n = np.cross(e0, e1)

    for k in range(tris.shape[0]):
        denom = d @ n[k]
        with np.errstate(divide="ignore", invalid="ignore"):
            t = ((v2[k] - o) @ n[k]) / denom
        p = o + t[:, None] * d - v2[k]
        # solve p = u e0 + v e1 via normal-aligned 2x2 system
        m = np.stack([e0[k], e1[k], n[k]], axis=1)
        try:
            minv = np.linalg.inv(m)
        except np.linalg.LinAlgError:
            continue
        uvw = p @ minv.T
        u, v = uvw[:, 0], uvw[:, 1]
        ok = (
            np.isfinite(t)
            & (t > min_dist)
            & (t < best_t)
            & (t < max_dist)
            & (u > 0)
            & (v > 0)
            & (u + v < 1)
        )
        if skip_tri is not None:
            ok &= np.asarray(skip_tri) != tri_glob[k]
        best_t = np.where(ok, t, best_t)
        best_u = np.where(ok, u, best_u)
        best_v = np.where(ok, v, best_v)
        best_tri = np.where(ok, tri_glob[k], best_tri)
        best_obj = np.where(ok, tri_obj[k], best_obj)

    return dict(
        t=best_t, u=best_u, v=best_v, tri=best_tri, obj=best_obj, hit=best_tri >= 0
    )
