"""Incoherent-launch strategy A/B on realistic bounce rays (round 3).

Generates GI-bounce-like rays (origins = primary hit points in PIXEL order,
directions = uniform hemisphere around the hit normal) on a colonnade scene
and measures the dense Pallas backend under:
  1. sorted by 'anchor' key (exact per-ray nearest-chunk + direction bits)
  2. morton-sorted, 'beam' 6-D key (origin+direction interleaved)
  3. morton-sorted, 'origin' 21-bit key (the round-2 key)
  4. UNSORTED pixel-order screen-block tiles (tight origin bundles +
     the box-distance ordered early exit carry the culling)

Usage: python tools/bench_incoherent_ab.py [pillar_grid] [sphere_subdiv]
  (2, 2) = 5.3k instance tris; (6, 3) = 46.5k; (8, 4) = 328k.
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
    print(f"scene: {ti} instance tris, stream={stream}, {R / 1e6:.2f} M rays")

    # primary hits -> bounce-like origins/directions (pixel order)
    hit = DP.trace_rays_dense_pallas(
        scene, frame, o, d, prec=prec, cull=True, tile_hw=(H, W), stream=stream
    )
    sync(hit)
    t32 = hit.t.astype(jnp.float32)
    live = hit.tri >= 0
    pos = (o.astype(jnp.float32) + t32[:, None] * d.astype(jnp.float32)).astype(
        prec.dtype
    )
    # crude shading normal: -d mirrored is fine for a bench; draw hemisphere
    # around -d (only direction randomness matters for the cull)
    n = (-d).astype(prec.dtype)
    t_axis = jnp.stack([n[:, 1], -n[:, 0], jnp.zeros_like(n[:, 0])], axis=-1)
    t_axis = t_axis / jnp.maximum(
        jnp.linalg.norm(t_axis, axis=-1, keepdims=True), 1e-3
    ).astype(prec.dtype)
    b_axis = jnp.cross(n, t_axis).astype(prec.dtype)
    u = jax.random.uniform(jax.random.PRNGKey(5), (2 * R,), prec.dtype)
    bd, _ = uniform_hemisphere_trig(n, t_axis, b_axis, u[:R], u[R:])
    maxd = jnp.where(live, 1e5, 0.0).astype(jnp.float32)

    variants = [
        ("wf oneshot", "wavefront:oneshot", True),
        ("wf rounds", "wavefront:rounds", True),
        ("sorted anchor", "anchor", True),
        ("sorted beam", "beam", True),
        ("sorted origin", "origin", True),
        ("unsorted blocks", None, False),
    ]
    results = {}
    base = None
    for name, mode, do_sort in variants:
        if mode and mode.startswith("wavefront"):
            from low_precision_raytracer_tpu.ops.wavefront import (
                trace_rays_wavefront,
            )

            wf_mode = mode.split(":")[1]
            fn = lambda wf_mode=wf_mode: trace_rays_wavefront(
                scene, frame, pos, bd, prec=prec, min_dist=0.1, max_dist=maxd,
                mode=wf_mode,
            )
        elif do_sort:
            fn = lambda: DP.trace_rays_dense_pallas_sorted(
                scene, frame, pos, bd, prec=prec, min_dist=0.1, max_dist=maxd,
                stream=stream, key_mode=mode,
            )
        else:
            fn = lambda: DP.trace_rays_dense_pallas(
                scene, frame, pos, bd, prec=prec, min_dist=0.1, max_dist=maxd,
                cull=True, tile_hw=(H, W), stream=stream,
            )
        try:
            t, h = timeit(fn)
        except Exception as ex:  # keep the A/B alive if one variant dies
            print(f"bounce launch [{name:16s}]: FAILED {type(ex).__name__}")
            continue
        results[name] = t
        print(f"bounce launch [{name:16s}]: {t * 1e3:8.1f} ms = {R / t / 1e6:5.1f} Mrays/s")
        if base is None:
            base = h
        else:
            agree = float((np.asarray(h.tri) == np.asarray(base.tri)).mean())
            print(f"   tri agreement vs first variant: {agree:.4f}")


if __name__ == "__main__":
    main()
