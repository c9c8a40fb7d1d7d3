"""Dense-kernel schedule-phase A/B: chunk-list selection via full argsort
('sort', O(NC log NC) per tile) vs exact nearest-(take+1) top_k ('topk',
O(NC log take)) — BASELINE.md round-4 handoff item 4.  The selection runs
in XLA outside the Pallas kernel, so whole-launch times capture it; the
gap should open with chunk count (NC = TI/128), i.e. on streamed scenes.

Measures coherent primary + incoherent morton-sorted bounce launches at
1080p bf16 on two colonnade sizes (pass pillar_grid/sphere_subdiv pairs).

Usage: python tools/bench_schedule_ab.py [g1 s1 [g2 s2]]
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
    nc = -(-ti // DP.TC)
    print(f"--- {name}: {ti} instance tris, NC~{nc} chunks, {R / 1e6:.2f} M rays")

    base = {}
    for sel in ("sort", "topk"):
        try:
            t, h = timeit(lambda: DP.trace_rays_dense_pallas(
                scene, frame, o, d, prec=prec, fallback="mxu3", cull=True,
                tile_hw=(H, W), stream=stream, select=sel,
            ))
        except Exception as ex:  # keep the A/B alive if one variant dies
            print(f"primary  [{sel:4s}]: FAILED {type(ex).__name__}: {ex}")
            continue
        print(f"primary  [{sel:4s}]: {t * 1e3:7.2f} ms = {R / t / 1e6:6.1f} Mrays/s")
        base[sel] = h

    if "topk" in base and "sort" in base:
        agree = float((np.asarray(base["topk"].tri) == np.asarray(base["sort"].tri)).mean())
        print(f"primary tri agreement topk vs sort: {agree:.5f}")
    if "sort" not in base:
        return

    if ti > 4 * DP.TC:
        hit = base["sort"]
        t32 = hit.t.astype(jnp.float32)
        pos = o.astype(jnp.float32) + t32[:, None] * d.astype(jnp.float32)
        key = jax.random.PRNGKey(3)
        bd = jax.random.normal(key, (R, 3), jnp.float32)
        bd = (bd / jnp.linalg.norm(bd, axis=-1, keepdims=True)).astype(prec.dtype)
        bmax = jnp.where(hit.tri >= 0, 1e5, 0.0).astype(jnp.float32)
        for sel in ("sort", "topk"):
            try:
                t, _ = timeit(lambda: DP.trace_rays_dense_pallas_sorted(
                    scene, frame, pos.astype(prec.dtype), bd, prec=prec,
                    fallback="mxu3", stream=stream, min_dist=0.1, max_dist=bmax,
                    select=sel,
                ))
            except Exception as ex:
                print(f"bounce   [{sel:4s}]: FAILED {type(ex).__name__}: {ex}")
                continue
            print(f"bounce   [{sel:4s}]: {t * 1e3:7.2f} ms = {R / t / 1e6:6.1f} Mrays/s")


def main():
    from low_precision_raytracer_tpu.models.procedural import sponza_like_scene

    a = [int(x) for x in sys.argv[1:]]
    pairs = [(a[0], a[1])] if len(a) >= 2 else [(6, 3)]
    if len(a) >= 4:
        pairs.append((a[2], a[3]))
    else:
        pairs.append((10, 5))
    for g, s in pairs:
        bench_scene(
            f"colonnade({g},{s})",
            sponza_like_scene(pillar_grid=g, sphere_subdiv=s),
        )


if __name__ == "__main__":
    main()
