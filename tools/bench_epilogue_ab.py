"""Dense-kernel chunk-epilogue A/B: 'reduce5' (5 cross-sublane reductions,
exact winner tracking) vs 'pack' (3 reductions, packed winner key, outside
row decode — see ops/dense_pallas._finish_chunk_packed).

Measures the three production launch shapes at 1080p bf16:
  - coherent primary (screen-block tiles)
  - any-hit shadow (find_any)
  - incoherent bounce (morton-sorted)
on Cornell (single chunk — the epilogue is ~half the body there) and a
colonnade (multi-chunk scheduling path).

Usage: python tools/bench_epilogue_ab.py [pillar_grid] [sphere_subdiv]
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


def bench_scene(name, host, H=1080, W=1920):
    import low_precision_raytracer_tpu.ops.dense_pallas as DP
    from low_precision_raytracer_tpu.config import get_precision
    from low_precision_raytracer_tpu.models.hierarchy import build_flat_scene
    from low_precision_raytracer_tpu.models.scene import (
        build_scene_arrays,
        frame_input_from_flat,
    )
    from low_precision_raytracer_tpu.ops.camera import primary_ray_grid

    prec = get_precision("bf16")
    scene = build_scene_arrays(host, prec, leaf_size=4)
    flat = build_flat_scene(host.root, host.active_camera)
    frame = frame_input_from_flat(flat, host, prec)
    o, d = primary_ray_grid(frame.cam_l2w, flat.cam_fov_y, W, H, prec.dtype)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    R = o.shape[0]
    ti = int(frame.dense_n.shape[0])
    stream = ti > 65536
    print(f"--- {name}: {ti} instance tris, {R / 1e6:.2f} M rays")

    base = {}
    for ep in ("reduce5", "pack"):
        try:
            t, h = timeit(lambda: DP.trace_rays_dense_pallas(
                scene, frame, o, d, prec=prec, fallback="mxu3", cull=True,
                tile_hw=(H, W), stream=stream, epilogue=ep,
            ))
        except Exception as ex:  # keep the A/B alive if one variant dies
            print(f"primary  [{ep:8s}]: FAILED {type(ex).__name__}: {ex}")
            continue
        print(f"primary  [{ep:8s}]: {t * 1e3:7.2f} ms = {R / t / 1e6:6.1f} Mrays/s")
        base[ep] = h

    if "pack" in base and "reduce5" in base:
        agree = float((np.asarray(base["pack"].tri) == np.asarray(base["reduce5"].tri)).mean())
        print(f"primary tri agreement pack vs reduce5: {agree:.5f}")
    if "reduce5" not in base:
        return

    # shadow-like any-hit launch toward a fixed light
    light = jnp.asarray([0.0, 1.5, 0.0], jnp.float32)
    hit = base["reduce5"]
    t32 = hit.t.astype(jnp.float32)
    pos = o.astype(jnp.float32) + t32[:, None] * d.astype(jnp.float32)
    tol = light[None, :] - pos
    dist = jnp.linalg.norm(tol, axis=-1)
    sd = (tol / jnp.maximum(dist, 1e-6)[:, None]).astype(prec.dtype)
    maxd = jnp.where(hit.tri >= 0, dist - 0.01, 0.0)
    for ep in ("reduce5", "pack"):
        try:
            t, _ = timeit(lambda: DP.trace_rays_dense_pallas(
                scene, frame, pos.astype(prec.dtype), sd, prec=prec,
                fallback="mxu3", cull=True, tile_hw=(H, W), stream=stream,
                find_any=True, min_dist=0.01, max_dist=maxd, epilogue=ep,
            ))
        except Exception as ex:
            print(f"shadow   [{ep:8s}]: FAILED {type(ex).__name__}: {ex}")
            continue
        print(f"shadow   [{ep:8s}]: {t * 1e3:7.2f} ms = {R / t / 1e6:6.1f} Mrays/s")

    if ti > 4 * DP.TC:
        # incoherent bounce-like launch (sorted path)
        key = jax.random.PRNGKey(3)
        bd = jax.random.normal(key, (R, 3), jnp.float32)
        bd = (bd / jnp.linalg.norm(bd, axis=-1, keepdims=True)).astype(prec.dtype)
        bmax = jnp.where(hit.tri >= 0, 1e5, 0.0).astype(jnp.float32)
        for ep in ("reduce5", "pack"):
            try:
                t, _ = timeit(lambda: DP.trace_rays_dense_pallas_sorted(
                    scene, frame, pos.astype(prec.dtype), bd, prec=prec,
                    fallback="mxu3", stream=stream, min_dist=0.1, max_dist=bmax,
                    epilogue=ep,
                ))
            except Exception as ex:
                print(f"bounce   [{ep:8s}]: FAILED {type(ex).__name__}: {ex}")
                continue
            print(f"bounce   [{ep:8s}]: {t * 1e3:7.2f} ms = {R / t / 1e6:6.1f} Mrays/s")


def main():
    from low_precision_raytracer_tpu.models.procedural import (
        cornell_box_scene,
        sponza_like_scene,
    )

    g = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    bench_scene("cornell", cornell_box_scene())
    bench_scene(f"colonnade({g},{s})", sponza_like_scene(pillar_grid=g, sphere_subdiv=s))


if __name__ == "__main__":
    main()
