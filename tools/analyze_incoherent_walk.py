"""Predict the dense kernel's incoherent-launch cost per sort mode WITHOUT
TPU hardware: count the chunk bodies the ordered walk would execute.

For each candidate sort key ('anchor', 'beam', 'origin', 'none') this
reorders a bounce-like ray set, rebuilds the per-tile compacted chunk lists
exactly like `trace_rays_dense_pallas` (interval-bundle predicates +
nearest-first order + t_cut), and then evaluates the kernel's while-loop
stopping rule with the FINAL per-lane best t as the improvement cap (an
optimistic-but-mode-comparable proxy for the evolving running best):

    bodies(tile) = first j where no lane has min(best_t, maxd) > entry_j
    sweep(tile)  = does any lane end unresolved past t_cut?

Total bodies ~ kernel wall time (each body is a fixed-cost MXU/VPU block),
so the mode ranking here predicts the TPU A/B ranking.

Usage: python tools/analyze_incoherent_walk.py [pillar_grid] [sphere_subdiv] [res]
"""

import os as _os, sys as _sys
# runnable as `python tools/<name>.py` from anywhere: put the repo root
# (this file's parent's parent) on sys.path before package imports
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_platforms", "cpu")
    g = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    res = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    import low_precision_raytracer_tpu.ops.dense_pallas as DP
    from low_precision_raytracer_tpu.config import get_precision
    from low_precision_raytracer_tpu.models.hierarchy import build_flat_scene
    from low_precision_raytracer_tpu.models.procedural import sponza_like_scene
    from low_precision_raytracer_tpu.models.scene import (
        build_scene_arrays,
        frame_input_from_flat,
    )
    from low_precision_raytracer_tpu.ops.camera import primary_ray_grid
    from low_precision_raytracer_tpu.ops.sampling import uniform_hemisphere_trig

    prec = get_precision("bf16")
    host = sponza_like_scene(pillar_grid=g, sphere_subdiv=s)
    scene = build_scene_arrays(host, prec, leaf_size=4)
    flat = build_flat_scene(host.root, host.active_camera)
    frame = frame_input_from_flat(flat, host, prec)
    H = W = res
    o, d = primary_ray_grid(frame.cam_l2w, flat.cam_fov_y, W, H, prec.dtype)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    R = o.shape[0]
    ti = int(frame.dense_n.shape[0])
    nc = ti // DP.TC + (ti % DP.TC > 0)
    print(f"scene: {ti} instance tris, {nc} chunks, {R} rays at {res}x{res}")

    # primary hits -> bounce-like rays (interpret kernel, exact)
    hit = DP.trace_rays_dense_pallas(
        scene, frame, o, d, prec=prec, cull=True, tile_hw=(H, W), interpret=True
    )
    t32 = hit.t.astype(jnp.float32)
    live = hit.tri >= 0
    pos = o.astype(jnp.float32) + t32[:, None] * d.astype(jnp.float32)
    n = (-d).astype(prec.dtype)
    t_axis = jnp.stack([n[:, 1], -n[:, 0], jnp.zeros_like(n[:, 0])], axis=-1)
    t_axis = t_axis / jnp.maximum(
        jnp.linalg.norm(t_axis, axis=-1, keepdims=True), 1e-3
    ).astype(prec.dtype)
    b_axis = jnp.cross(n, t_axis).astype(prec.dtype)
    uu = jax.random.uniform(jax.random.PRNGKey(5), (2 * R,), prec.dtype)
    bd, _ = uniform_hemisphere_trig(n, t_axis, b_axis, uu[:R], uu[R:])
    bo = pos.astype(prec.dtype)
    mind = jnp.full((R,), 0.1, jnp.float32)
    maxd = jnp.where(live, 1e5, 0.0).astype(jnp.float32)

    # ground-truth best t for the cap (bounce trace, exact kernel)
    bh = DP.trace_rays_dense_pallas(
        scene, frame, bo, bd, prec=prec, cull=True, tile_hw=None,
        interpret=True, min_dist=0.1, max_dist=maxd,
    )
    best_t = np.minimum(np.asarray(bh.t, np.float64), np.asarray(maxd))

    of = bo.astype(jnp.float32)
    df = bd.astype(jnp.float32)

    def eval_mode(name, key):
        if key is None:
            order = np.arange(R)
        else:
            order = np.asarray(jnp.argsort(key))
        o_s = of[order]
        d_s = df[order]
        mn_s = mind[order]
        mx_s = jnp.asarray(maxd)[order]
        cap_s = np.minimum(best_t[order], np.asarray(mx_s, np.float64))
        grid = R // DP.TR
        # scene-exit cap, as in the production launch
        lo_all = jnp.min(frame.obj_aabb_lo, axis=0)
        hi_all = jnp.max(frame.obj_aabb_hi, axis=0)
        inv = 1.0 / d_s
        t1 = (lo_all[None] - o_s) * inv
        t2 = (hi_all[None] - o_s) * inv
        far = jnp.maximum(t1, t2)
        far = jnp.where(jnp.isfinite(far), far, 3e38)
        texit = jnp.min(far, axis=-1)
        slop = 1e-3 * float(jnp.linalg.norm(hi_all - lo_all)) + 0.05
        mx_c = jnp.minimum(mx_s, jnp.maximum(texit, 0.0) * 1.01 + slop)
        cap_s = np.minimum(cap_s, np.asarray(mx_c, np.float64))

        active, tmin = DP._chunk_predicates(
            frame, o_s, d_s, mn_s, mx_c, grid, (ti + (-ti) % DP.TC)
        )
        active = np.asarray(active) > 0
        entry = np.where(active, np.maximum(np.asarray(tmin, np.float64), 0.0), np.inf)
        # nearest-first order + t_cut, like the production compaction
        maxc = min(DP.MAXC, max(8, (900 * 1024 // 4) // max(grid, 1) - 2))
        srt = np.sort(entry, axis=1)
        take = min(maxc, entry.shape[1])
        lists = srt[:, :take]                      # (G, take) entries
        t_cut = srt[:, take] if entry.shape[1] > take else np.full(grid, np.inf)
        caps = cap_s.reshape(grid, DP.TR)
        live_l = np.asarray(mx_c).reshape(grid, DP.TR) > np.asarray(mn_s).reshape(grid, DP.TR)
        caps = np.where(live_l, caps, -np.inf)
        tile_cap = caps.max(axis=1)                # any-lane-improvable bound
        # bodies: first j where lists[g, j] >= tile_cap (lists sorted asc)
        bodies = (lists < tile_cap[:, None]).sum(axis=1)
        n_active = np.isfinite(lists).sum(axis=1)
        bodies = np.minimum(bodies, n_active)
        unresolved = tile_cap > t_cut              # overflow sweep trigger
        sweep_bodies = np.where(unresolved, entry.shape[1], 0)
        tot = bodies.sum()
        swp = sweep_bodies.sum()
        print(
            f"[{name:7s}] bodies/tile mean {bodies.mean():7.1f}  p95 "
            f"{np.quantile(bodies, 0.95):7.0f}  total {tot / 1e3:8.1f}k"
            f"  +sweep {swp / 1e3:8.1f}k  (tiles {grid}, maxc {take})"
        )
        return tot + swp

    live_b = jnp.asarray(maxd) > mind
    modes = {
        "none": None,
        "origin": DP._morton_key(bo, bd, live=live_b, mode="origin"),
        "beam": DP._morton_key(bo, bd, live=live_b, mode="beam"),
        "anchor": DP._anchor_key(frame, bo, bd, maxd, live=live_b)
        if frame.dense_chunk_lo is not None
        else None,
    }
    totals = {}
    for name, key in modes.items():
        if name == "anchor" and key is None:
            continue
        totals[name] = eval_mode(name, key)
    best = min(totals, key=totals.get)
    print(f"predicted best mode: {best}")


def window_model():
    """Model A: per-ray ideal visit floor.  Model B: K-round windowed
    compaction — round k walks with cap min(best, maxd, t_k), survivors
    (best >= t_k) re-sort densely into fresh tiles for round k+1.

    Prints total chunk bodies for each (key, window ladder) combination —
    the decision input for building the windowed wavefront launch.

    Usage: python tools/analyze_incoherent_walk.py model [g] [s] [res]
    """
    jax.config.update("jax_platforms", "cpu")
    g = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    s = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    res = int(sys.argv[4]) if len(sys.argv) > 4 else 128

    import low_precision_raytracer_tpu.ops.dense_pallas as DP
    from low_precision_raytracer_tpu.config import get_precision
    from low_precision_raytracer_tpu.models.hierarchy import build_flat_scene
    from low_precision_raytracer_tpu.models.procedural import sponza_like_scene
    from low_precision_raytracer_tpu.models.scene import (
        build_scene_arrays,
        frame_input_from_flat,
    )
    from low_precision_raytracer_tpu.ops.camera import primary_ray_grid
    from low_precision_raytracer_tpu.ops.sampling import uniform_hemisphere_trig

    prec = get_precision("bf16")
    host = sponza_like_scene(pillar_grid=g, sphere_subdiv=s)
    scene = build_scene_arrays(host, prec, leaf_size=4)
    flat = build_flat_scene(host.root, host.active_camera)
    frame = frame_input_from_flat(flat, host, prec)
    H = W = res
    o, d = primary_ray_grid(frame.cam_l2w, flat.cam_fov_y, W, H, prec.dtype)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    R = o.shape[0]
    ti = int(frame.dense_n.shape[0])
    print(f"scene: {ti} tris, rays {R}")

    hit = DP.trace_rays_dense_pallas(
        scene, frame, o, d, prec=prec, cull=True, tile_hw=(H, W), interpret=True
    )
    t32 = hit.t.astype(jnp.float32)
    live = hit.tri >= 0
    pos = o.astype(jnp.float32) + t32[:, None] * d.astype(jnp.float32)
    n = (-d).astype(prec.dtype)
    t_axis = jnp.stack([n[:, 1], -n[:, 0], jnp.zeros_like(n[:, 0])], axis=-1)
    t_axis = t_axis / jnp.maximum(
        jnp.linalg.norm(t_axis, axis=-1, keepdims=True), 1e-3
    ).astype(prec.dtype)
    b_axis = jnp.cross(n, t_axis).astype(prec.dtype)
    uu = jax.random.uniform(jax.random.PRNGKey(5), (2 * R,), prec.dtype)
    bd, _ = uniform_hemisphere_trig(n, t_axis, b_axis, uu[:R], uu[R:])
    bo = pos.astype(prec.dtype)
    mind = jnp.full((R,), 0.1, jnp.float32)
    maxd = jnp.where(live, 1e5, 0.0).astype(jnp.float32)
    bh = DP.trace_rays_dense_pallas(
        scene, frame, bo, bd, prec=prec, cull=True, tile_hw=None,
        interpret=True, min_dist=0.1, max_dist=maxd,
    )

    of = np.asarray(bo, np.float64)
    df = np.asarray(bd, np.float64)
    # scene-exit cap as in production
    lo_all = np.asarray(jnp.min(frame.obj_aabb_lo, axis=0), np.float64)
    hi_all = np.asarray(jnp.max(frame.obj_aabb_hi, axis=0), np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / df
        far = np.maximum((lo_all[None] - of) * inv, (hi_all[None] - of) * inv)
    far = np.where(np.isfinite(far), far, 3e38)
    texit = far.min(axis=-1)
    slop = 1e-3 * np.linalg.norm(hi_all - lo_all) + 0.05
    mx = np.minimum(np.asarray(maxd, np.float64), np.maximum(texit, 0.0) * 1.01 + slop)
    best = np.minimum(np.asarray(bh.t, np.float64), mx)
    live_r = np.asarray(maxd) > np.asarray(mind)
    cap_full = np.where(live_r, best, -np.inf)

    # exact PER-RAY chunk entry bounds (R, NC)
    clo = np.asarray(frame.dense_chunk_lo, np.float64)
    chi = np.asarray(frame.dense_chunk_hi, np.float64)
    NC = clo.shape[0]
    entry = np.empty((R, NC))
    blk = max(1, (1 << 22) // NC)
    for i in range(0, R, blk):
        oI = of[i : i + blk]
        dI = df[i : i + blk]
        with np.errstate(divide="ignore", invalid="ignore"):
            invI = 1.0 / dI
            t1 = (clo[None] - oI[:, None]) * invI[:, None]
            t2 = (chi[None] - oI[:, None]) * invI[:, None]
        a = np.fmin(t1, t2)
        b = np.fmax(t1, t2)
        fin = np.isfinite(a) & np.isfinite(b)
        tmn = np.where(fin, a, -3e38).max(-1)
        tmx = np.where(fin, b, 3e38).min(-1)
        e = np.maximum(tmn - 0.02, 0.0)
        ok = fin.any(-1) & (tmn <= tmx + 0.02) & (tmx + 0.02 >= 0)
        entry[i : i + blk] = np.where(ok, e, np.inf)

    # A: per-ray ideal (the floor for ANY grouping scheme)
    visits = (entry < cap_full[:, None]).sum(1)
    print(
        f"per-ray ideal: mean {visits[live_r].mean():6.2f} chunks/ray, "
        f"p95 {np.quantile(visits[live_r], 0.95):4.0f}, "
        f"floor(total/512) {visits.sum() / 512 / 1e3:7.1f}k bodies"
    )
    # A': PRE-trace candidates (entry < min(maxd, scene exit) — what a
    # one-shot pair expansion must enumerate, no best-t knowledge)
    pre = (entry < np.where(live_r, mx, 0.0)[:, None]).sum(1)
    pl = pre[live_r]
    print(
        f"pre-trace candidates: mean {pl.mean():6.2f}, p50 "
        f"{np.quantile(pl, 0.5):4.0f}, p95 {np.quantile(pl, 0.95):4.0f}, "
        f"p99 {np.quantile(pl, 0.99):4.0f}, max {pl.max():5.0f}; "
        f"pairs/ray at K=16 {np.minimum(pl, 16).mean():5.2f}, overflow "
        f"{(pl > 16).mean() * 100:4.1f}%"
    )
    # A'': ordered per-ray walk depth (nearest-first, stop when the next
    # entry exceeds best-so-far) — what rank-major rounds would execute
    es = np.sort(entry, axis=1)
    depth = (es < cap_full[:, None]).sum(1)  # first rank with entry >= cap
    dl = depth[live_r]
    print(
        f"ordered walk depth: mean {dl.mean():6.2f}, p95 "
        f"{np.quantile(dl, 0.95):4.0f}, p99 {np.quantile(dl, 0.99):4.0f}, "
        f"max {dl.max():5.0f}"
    )

    key_anchor = np.asarray(
        DP._anchor_key(frame, bo, bd, maxd, live=jnp.asarray(live_r))
    )
    key_beam = np.asarray(DP._morton_key(bo, bd, live=jnp.asarray(live_r), mode="beam"))

    def tiles_bodies(order, cap, active_rays):
        """Tile-union walk bodies for rays[order] with per-lane cap (entry
        unions approximated per tile by per-ray entries — the production
        interval bundle is LOOSER, so this favors... both models equally)."""
        o_idx = order[active_rays[order]]
        pad = (-len(o_idx)) % DP.TR
        if pad:
            o_idx = np.concatenate([o_idx, o_idx[:1].repeat(pad)])
        G = len(o_idx) // DP.TR
        total = 0
        for t in range(G):
            idx = o_idx[t * DP.TR : (t + 1) * DP.TR]
            c = cap[idx]
            e = entry[idx]
            # chunk active for the tile if ANY lane enters it; walk depth =
            # chunks whose min-entry < max-lane cap, ordered by min-entry
            emin = e.min(axis=0)
            cmax = c.max()
            total += int(((emin < cmax) & np.isfinite(emin)).sum())
        return total, G

    ladders = {
        "1-shot": [np.inf],
        "2-round x0.1D": [0.1, np.inf],
        "3-round geo": [0.05, 0.25, np.inf],
    }
    D = float(np.linalg.norm(hi_all - lo_all))
    for kname, key in (("anchor", key_anchor), ("beam", key_beam)):
        order = np.argsort(key, kind="stable")
        for lname, lad in ladders.items():
            total = 0
            resolved = ~live_r.copy()
            sorts = 0
            for t1 in lad:
                win = t1 * D if np.isfinite(t1) else np.inf
                capw = np.minimum(cap_full, win)
                act = ~resolved
                if act.sum() == 0:
                    break
                b, G = tiles_bodies(order, capw, act)
                total += b
                sorts += 1
                # resolved: found-best < window (or dead)
                resolved = resolved | (cap_full < win)
            print(
                f"[{kname:6s}|{lname:13s}] total {total / 1e3:8.1f}k bodies, "
                f"{sorts} sorts, live after r1 "
                f"{(~(cap_full < lad[0] * D)).mean() * 100 if np.isfinite(lad[0]) else 0:5.1f}%"
            )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "model":
        window_model()
    else:
        main()
