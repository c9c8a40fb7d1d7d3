"""Sweep the one-shot wavefront's tuning surface (ONESHOT_K, ONESHOT_SGROUP,
ONESHOT_WTR) on the real 46.5k-tri incoherent bounce — each variant traced
fresh via the unjitted function so monkeypatched module constants take
effect.

Usage: python tools/bench_oneshot_tune.py [pillar_grid] [sphere_subdiv]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from low_precision_raytracer_tpu.config import get_precision
from low_precision_raytracer_tpu.models.hierarchy import build_flat_scene
from low_precision_raytracer_tpu.models.procedural import sponza_like_scene
from low_precision_raytracer_tpu.models.scene import (
    build_scene_arrays,
    frame_input_from_flat,
)
from low_precision_raytracer_tpu.ops.camera import primary_ray_grid
from low_precision_raytracer_tpu.ops.sampling import uniform_hemisphere_trig
from low_precision_raytracer_tpu.ops import wavefront as WF
from low_precision_raytracer_tpu.ops import dense_pallas as DP

F32 = jnp.float32


def sync(x):
    np.asarray(jax.tree.leaves(x)[0].reshape(-1)[:1])
    return x


def timeit(fn, iters=3):
    sync(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    pg = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sd = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    prec = get_precision("bf16")
    host = sponza_like_scene(pillar_grid=pg, sphere_subdiv=sd, with_skybox=False)
    scene = build_scene_arrays(host, prec, leaf_size=4)
    flat = build_flat_scene(host.root, host.active_camera)
    frame = frame_input_from_flat(flat, host, prec)
    H, W = 1080, 1920
    o, d = primary_ray_grid(frame.cam_l2w, flat.cam_fov_y, W, H, prec.dtype)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    R = o.shape[0]

    hit = DP.trace_rays_dense_pallas(scene, frame, o, d, prec=prec,
                                     tile_hw=(H, W))
    t32 = hit.t.astype(F32)
    live = hit.tri >= 0
    pos = (o.astype(F32) + t32[:, None] * d.astype(F32)).astype(prec.dtype)
    # hemisphere bounce directions (production-shaped)
    from low_precision_raytracer_tpu.ops.gbuffer import interpolate_hit_attributes

    attrs = interpolate_hit_attributes(scene, frame, hit, prec.dtype)
    n = attrs["normal"]
    up = jnp.asarray([0.0, 1.0, 0.0], prec.dtype)
    t_axis = jnp.cross(jnp.broadcast_to(up, n.shape), n)
    t_axis = t_axis / jnp.maximum(
        jnp.linalg.norm(t_axis, axis=-1, keepdims=True), 1e-3
    ).astype(prec.dtype)
    b_axis = jnp.cross(n, t_axis).astype(prec.dtype)
    u = jax.random.uniform(jax.random.PRNGKey(5), (2 * R,), prec.dtype)
    bd, _ = uniform_hemisphere_trig(n, t_axis, b_axis, u[:R], u[R:])
    maxd = jnp.where(live, 1e5, 0.0).astype(F32)

    raw = WF.trace_rays_wavefront.__wrapped__
    base_hit = None
    ti = frame.dense_n.shape[0]
    print(f"scene {ti} tris, {R/1e6:.2f}M rays", flush=True)
    for kc, sg, wtr in [
        (8, 1, 512), (8, 1, 1024), (8, 1, 2048),
        (4, 2, 1024), (4, 2, 2048), (6, 2, 1024),
        (4, 4, 2048), (8, 2, 1024), (6, 1, 1024),
    ]:
        WF.ONESHOT_K, WF.ONESHOT_SGROUP, WF.ONESHOT_WTR = kc, sg, wtr
        fn = jax.jit(lambda: raw(
            scene, frame, pos, bd, prec=prec, min_dist=0.1, max_dist=maxd,
            find_any=False, interpret=False, mode="oneshot"))
        try:
            t, h = timeit(fn)
        except Exception as ex:  # noqa: BLE001
            print(f"K={kc} sg={sg} wtr={wtr}: FAILED {type(ex).__name__}: {ex}"[:160])
            continue
        if base_hit is None:
            base_hit = h
            agree = 1.0
        else:
            agree = float((np.asarray(h.tri) == np.asarray(base_hit.tri)).mean())
        print(f"K={kc} sg={sg} wtr={wtr}: {t*1e3:8.1f} ms = "
              f"{R/t/1e6:5.1f} Mrays/s  (agree {agree:.4f})", flush=True)


if __name__ == "__main__":
    main()
