"""Wavefront hyperparameter sweep on real bounce rays (TPU).

Sweeps (K_CAND, Q_RANKS, N_ROUNDS, GROUP_WIDTH) on a colonnade scene's
hemisphere bounce launch and prints ms + Mrays/s per point, plus the tile
path for reference.  Module constants are patched per point (jit caches
cleared — constant changes don't invalidate them).

Usage: python tools/bench_wavefront_tune.py [pillar_grid] [sphere_subdiv]
"""

import os as _os, sys as _sys
# runnable as `python tools/<name>.py` from anywhere: put the repo root
# (this file's parent's parent) on sys.path before package imports
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    np.asarray(jax.tree.leaves(x)[0].reshape(-1)[:1])
    return x


def timeit(fn, iters=3):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    g = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    import low_precision_raytracer_tpu.ops.dense_pallas as DP
    import low_precision_raytracer_tpu.ops.wavefront as WF
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
    H, W = 1080, 1920
    o, d = primary_ray_grid(frame.cam_l2w, flat.cam_fov_y, W, H, prec.dtype)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    R = o.shape[0]
    ti = int(frame.dense_n.shape[0])
    stream = ti > 65536
    print(f"scene: {ti} instance tris, {R / 1e6:.2f} M rays", flush=True)

    hit = DP.trace_rays_dense_pallas(
        scene, frame, o, d, prec=prec, cull=True, tile_hw=(H, W), stream=stream
    )
    sync(hit)
    t32 = hit.t.astype(jnp.float32)
    live = hit.tri >= 0
    pos = (o.astype(jnp.float32) + t32[:, None] * d.astype(jnp.float32)).astype(
        prec.dtype
    )
    n = (-d).astype(prec.dtype)
    t_axis = jnp.stack([n[:, 1], -n[:, 0], jnp.zeros_like(n[:, 0])], axis=-1)
    t_axis = t_axis / jnp.maximum(
        jnp.linalg.norm(t_axis, axis=-1, keepdims=True), 1e-3
    ).astype(prec.dtype)
    b_axis = jnp.cross(n, t_axis).astype(prec.dtype)
    u = jax.random.uniform(jax.random.PRNGKey(5), (2 * R,), prec.dtype)
    bd, _ = uniform_hemisphere_trig(n, t_axis, b_axis, u[:R], u[R:])
    maxd = jnp.where(live, 1e5, 0.0).astype(jnp.float32)

    t_tile, h_tile = timeit(lambda: DP.trace_rays_dense_pallas_sorted(
        scene, frame, pos, bd, prec=prec, min_dist=0.1, max_dist=maxd,
        stream=stream,
    ))
    print(f"[tile beam        ] {t_tile * 1e3:8.1f} ms = {R / t_tile / 1e6:5.1f} Mrays/s",
          flush=True)

    points = [
        # (K, Q, rounds, group_width)
        (16, 4, 4, 2048),   # defaults
        (16, 4, 2, 2048),   # fewer rounds, lean on the refill/sweep
        (16, 8, 2, 2048),   # wider rank batches
        (8, 4, 2, 2048),    # shorter candidate lists
        (16, 4, 4, 4096),   # finer groups (big scenes only; no-op when NC small)
        # Q=1: the per-round sort groups the ONE rank actually tested, so
        # tile distinct-id counts collapse to the rank's true spread (the
        # Q=4 rounds scatter ranks 1..3 across ~CH_CAP ids per tile — the
        # measured 46.5k shortfall).  More rounds pay more sorts; the p95
        # per-ray visit depth is ~9.
        (16, 1, 8, 2048),
        (16, 1, 12, 2048),
        (8, 1, 6, 2048),
    ]
    for (k, q, r, gw) in points:
        WF.K_CAND, WF.Q_RANKS, WF.N_ROUNDS, WF.GROUP_WIDTH = k, q, r, gw
        jax.clear_caches()
        try:
            t, h = timeit(lambda: WF.trace_rays_wavefront(
                scene, frame, pos, bd, prec=prec, min_dist=0.1, max_dist=maxd,
            ), iters=2)
            agree = float((np.asarray(h.tri) == np.asarray(h_tile.tri)).mean())
            print(
                f"[wf K={k:2d} Q={q} r={r} gw={gw:4d}] {t * 1e3:8.1f} ms = "
                f"{R / t / 1e6:5.1f} Mrays/s  agree={agree:.4f}", flush=True,
            )
        except Exception as ex:  # keep sweeping
            print(f"[wf K={k:2d} Q={q} r={r} gw={gw:4d}] FAILED {type(ex).__name__}: {ex}",
                  flush=True)


if __name__ == "__main__":
    main()
