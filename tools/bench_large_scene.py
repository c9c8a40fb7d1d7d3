"""Large-scene backend benchmark (round-3 verdict items 2/3): standalone
launches AND full frames for BOTH trace backends on a colonnade scene of the
given size, 1080p bf16.

Usage: python tools/bench_large_scene.py [pillar_grid] [sphere_subdiv]
  (6, 3) = 46.5k instance tris; (8, 4) = 328k; (10, 5) ~ 2M.

Prints per-launch numbers (coherent primary, morton-sorted incoherent,
any-hit shadow) and in-frame ms/frame per backend — the data that sets
`packet_bvh_min_tris`.
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


def timeit(fn, *args, iters=5, **kw):
    sync(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    sync(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    g = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from low_precision_raytracer_tpu.config import RenderConfig, get_precision
    from low_precision_raytracer_tpu.models.hierarchy import build_flat_scene
    from low_precision_raytracer_tpu.models.procedural import sponza_like_scene
    from low_precision_raytracer_tpu.models.scene import (
        build_scene_arrays,
        flatten_frame,
        frame_input_from_flat,
    )
    from low_precision_raytracer_tpu.ops.camera import primary_ray_grid
    from low_precision_raytracer_tpu.ops.dense_pallas import (
        trace_rays_dense_pallas,
        trace_rays_dense_pallas_sorted,
    )
    from low_precision_raytracer_tpu.ops.traversal_pallas import (
        trace_rays_packet,
        trace_rays_packet_sorted,
    )

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
    print(f"scene ({g},{s}): {ti} instance tris, {len(frame.obj_layout)} objects,"
          f" stream={stream}", flush=True)
    perm = jax.random.permutation(jax.random.PRNGKey(3), R)
    op, dp = o[perm], d[perm]

    def row(name, t):
        print(f"  {name:34s} {t*1e3:8.2f} ms = {R/t/1e6:6.1f} Mrays/s", flush=True)

    print("[packet]", flush=True)
    t, hp = timeit(trace_rays_packet, scene, frame, o, d, prec=prec,
                   tile_hw=(H, W), stream=stream)
    row("coherent primary", t)
    t, _ = timeit(trace_rays_packet_sorted, scene, frame, op, dp, prec=prec,
                  stream=stream)
    row("incoherent morton-sorted", t)
    t, _ = timeit(trace_rays_packet, scene, frame, o, d, prec=prec,
                  tile_hw=(H, W), stream=stream, find_any=True, max_dist=30.0)
    row("any-hit coherent (maxd 30)", t)

    print("[dense_pallas]", flush=True)
    t, hd = timeit(trace_rays_dense_pallas, scene, frame, o, d, prec=prec,
                   tile_hw=(H, W), stream=stream)
    row("coherent primary", t)
    t, _ = timeit(trace_rays_dense_pallas_sorted, scene, frame, op, dp,
                  prec=prec, stream=stream)
    row("incoherent morton-sorted", t)
    t, _ = timeit(trace_rays_dense_pallas, scene, frame, o, d, prec=prec,
                  tile_hw=(H, W), stream=stream, find_any=True, max_dist=30.0)
    row("any-hit coherent (maxd 30)", t)
    agree = (np.asarray(hp.tri) == np.asarray(hd.tri)).mean()
    print(f"packet/dense agreement: {agree:.6f}", flush=True)

    from low_precision_raytracer_tpu.ops.wavefront import trace_rays_wavefront

    print("[wavefront]", flush=True)
    try:
        t, hw = timeit(trace_rays_wavefront, scene, frame, op, dp, prec=prec)
        row("incoherent per-ray", t)
        agree = (np.asarray(hw.tri) == np.asarray(hd.tri)[perm]).mean()
        print(f"wavefront/dense agreement: {agree:.6f}", flush=True)
    except Exception as ex:
        print(f"  wavefront FAILED: {type(ex).__name__}: {ex}", flush=True)

    # ---- in-frame: full pipeline per backend
    from low_precision_raytracer_tpu.render.framestate import init_frame_state
    from low_precision_raytracer_tpu.render.renderer import render_frame
    from low_precision_raytracer_tpu.utils.rng import render_key

    frame_cfgs = [("pallas", "tile"), ("dense_pallas", "tile"),
                  ("dense_pallas", "wavefront")]
    for impl, inc in frame_cfgs:
        cfg = RenderConfig(width=W, height=H, precision="bf16", gi_on=True,
                           traversal_impl=impl, incoherent_impl=inc)
        fr = flatten_frame(host, prec, max_direct_lights=cfg.max_direct_lights,
                           width=W, height=H)
        state = init_frame_state(cfg, len(fr.obj_layout))
        key = render_key(0)
        img = None
        for _ in range(2):
            key, sub = jax.random.split(key)
            img, aux, state = render_frame(scene, fr, state, cfg, sub)
        np.asarray(img[0, 0])
        n_rays = int(aux["n_rays"])
        # dispatch-free timed loop: in-loop splits cost a tunnel round
        # trip per frame (see bench.py)
        subs = list(jax.random.split(key, 5))
        np.asarray(jax.random.key_data(subs[-1]))
        t0 = time.perf_counter()
        for i in range(5):
            img, aux, state = render_frame(scene, fr, state, cfg, subs[i])
        np.asarray(img[0, 0])
        dt = (time.perf_counter() - t0) / 5
        print(f"[frame {impl}/{inc}] {dt*1e3:8.1f} ms/frame ({1/dt:.2f} fps), "
              f"{n_rays/1e6:.2f} Mrays -> {n_rays/dt/1e6:.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
