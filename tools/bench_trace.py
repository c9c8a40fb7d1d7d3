"""Standalone trace-kernel benchmark: dense all-pairs vs packet BVH
traversal, coherent primary rays + incoherent scrambled rays.

Usage: python tools/bench_trace.py [pillar_grid] [sphere_subdiv]
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

from low_precision_raytracer_tpu.config import get_precision
from low_precision_raytracer_tpu.models.hierarchy import build_flat_scene
from low_precision_raytracer_tpu.models.procedural import sponza_like_scene
from low_precision_raytracer_tpu.models.scene import (
    build_scene_arrays,
    frame_input_from_flat,
)
from low_precision_raytracer_tpu.ops.camera import primary_ray_grid


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
    grid_n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    subdiv = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    prec = get_precision("bf16")
    host = sponza_like_scene(pillar_grid=grid_n, sphere_subdiv=subdiv, with_skybox=False)
    scene = build_scene_arrays(host, prec, leaf_size=4)
    flat = build_flat_scene(host.root, host.active_camera)
    frame = frame_input_from_flat(flat, host, prec)
    ti = int(frame.dense_n.shape[0])
    H, W = 1080, 1920
    o, d = primary_ray_grid(frame.cam_l2w, flat.cam_fov_y, W, H, prec.dtype)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    R = o.shape[0]
    print(f"scene: {ti} instance tris, {len(frame.obj_layout)} objects, {R / 1e6:.2f} Mrays")

    from low_precision_raytracer_tpu.ops.dense_pallas import (
        trace_rays_dense_pallas,
        trace_rays_dense_pallas_sorted,
    )
    from low_precision_raytracer_tpu.ops.traversal_pallas import (
        trace_rays_packet,
        trace_rays_packet_sorted,
    )

    # diagnostics: mean active leaves per packet
    from low_precision_raytracer_tpu.ops.traversal_pallas import (
        TR,
        _packet_leaf_predicates,
    )

    grid = (R + TR - 1) // TR
    act, _, _ = jax.jit(_packet_leaf_predicates, static_argnums=(6,))(
        frame.dense_leaf_lo, frame.dense_leaf_hi,
        o.astype(jnp.float32), d.astype(jnp.float32),
        jnp.zeros((R,), jnp.float32), jnp.full((R,), 1e5, jnp.float32), grid,
    )
    counts = np.asarray(jnp.sum(act, axis=1))
    print(f"leaves: {act.shape[1]} total; active/packet mean {counts.mean():.1f} "
          f"p95 {np.percentile(counts, 95):.0f} max {counts.max()}")

    stream = ti > 65536
    results = {}
    t_dense, hd = timeit(
        trace_rays_dense_pallas, scene, frame, o, d,
        prec=prec, tile_hw=(H, W), stream=stream,
    )
    results["dense coherent"] = t_dense
    t_pkt, hp = timeit(
        trace_rays_packet, scene, frame, o, d, prec=prec, tile_hw=(H, W),
        stream=stream,
    )
    results["packet coherent"] = t_pkt
    same = np.asarray(hd.tri) == np.asarray(hp.tri)
    print(f"coherent agreement dense-vs-packet: {same.mean():.6f}")

    # incoherent: scramble ray order (simulates bounce/shadow launches)
    perm = jax.random.permutation(jax.random.PRNGKey(3), R)
    o_s, d_s = o[perm], d[perm]
    t_dsort, hds = timeit(
        trace_rays_dense_pallas_sorted, scene, frame, o_s, d_s,
        prec=prec, stream=stream,
    )
    results["dense sorted incoherent"] = t_dsort
    t_psort, hps = timeit(
        trace_rays_packet_sorted, scene, frame, o_s, d_s, prec=prec,
        stream=stream,
    )
    results["packet sorted incoherent"] = t_psort

    for k, v in results.items():
        print(f"{k:>28s}: {v * 1e3:8.2f} ms  = {R / v / 1e6:7.1f} Mrays/s")


if __name__ == "__main__":
    main()
