"""Dense-kernel ablation microbench on the Cornell single-chunk launch:
times each perf-probe variant of the kernel body to locate the VPU passes
worth cutting (band math, winner-id select tail, precision dots).

Usage: python tools/bench_dense_ablate.py [W] [H]
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
from low_precision_raytracer_tpu.models.procedural import cornell_box_scene
from low_precision_raytracer_tpu.models.scene import (
    build_scene_arrays,
    frame_input_from_flat,
)
from low_precision_raytracer_tpu.ops.camera import primary_ray_grid
from low_precision_raytracer_tpu.ops.dense_pallas import trace_rays_dense_pallas


def sync(x):
    np.asarray(jax.tree.leaves(x)[0].reshape(-1)[:1])
    return x


def timeit(fn, iters=10):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    prec = get_precision("bf16")
    host = cornell_box_scene()
    scene = build_scene_arrays(host, prec, leaf_size=4)
    flat = build_flat_scene(host.root, host.active_camera)
    frame = frame_input_from_flat(flat, host, prec)
    o, d = primary_ray_grid(frame.cam_l2w, flat.cam_fov_y, W, H, prec.dtype)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    R = o.shape[0]
    ti = int(frame.dense_n.shape[0])
    print(f"cornell: {ti} instance tris, {R/1e6:.2f} Mrays")

    variants = [
        ("full-closest", dict()),
        ("full-anyhit", dict(find_any=True)),
        ("no-band", dict(ablate="band")),
        ("no-ids", dict(ablate="ids")),
        ("1pass-prec", dict(ablate="prec")),
        ("no-guard", dict(ablate="guard")),
        ("no-band-ids", dict(ablate="band,ids")),
        ("all-off", dict(ablate="band,ids,prec")),
    ]
    base = None
    for name, kw in variants:
        fa = kw.pop("find_any", False)
        ab = kw.pop("ablate", "")
        fn = lambda fa=fa, ab=ab: trace_rays_dense_pallas(
            scene, frame, o, d, prec=prec, find_any=fa,
            tile_hw=(H, W), ablate=ab,
        )
        dt = timeit(fn)
        if name == "full-closest":
            base = dt
        print(f"{name:>14s}: {dt*1e3:7.2f} ms  ({R/dt/1e6:6.1f} Mrays/s)"
              + (f"  save {(base-dt)*1e3:5.2f} ms" if base and name != "full-closest" else ""),
              flush=True)


if __name__ == "__main__":
    main()
