"""Clean A/B: packet kernel with and without the MXU-staged body."""
import os as _os, sys as _sys
# runnable as `python tools/<name>.py` from anywhere: put the repo root
# (this file's parent's parent) on sys.path before package imports
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys, time
import jax, jax.numpy as jnp, numpy as np
from low_precision_raytracer_tpu.config import get_precision
from low_precision_raytracer_tpu.models.hierarchy import build_flat_scene
from low_precision_raytracer_tpu.models.procedural import sponza_like_scene
from low_precision_raytracer_tpu.models.scene import build_scene_arrays, frame_input_from_flat
from low_precision_raytracer_tpu.ops.camera import primary_ray_grid
from low_precision_raytracer_tpu.ops.traversal_pallas import trace_rays_packet, trace_rays_packet_sorted

def sync(x):
    np.asarray(jax.tree.leaves(x)[0].reshape(-1)[:1]); return x

def timeit(fn, *args, iters=5, **kw):
    sync(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args, **kw)
    sync(out)
    return (time.perf_counter() - t0) / iters, out

g = int(sys.argv[1]) if len(sys.argv) > 1 else 4
s = int(sys.argv[2]) if len(sys.argv) > 2 else 2
prec = get_precision("bf16")
host = sponza_like_scene(pillar_grid=g, sphere_subdiv=s, with_skybox=False)
scene = build_scene_arrays(host, prec, leaf_size=4)
flat = build_flat_scene(host.root, host.active_camera)
frame = frame_input_from_flat(flat, host, prec)
H, W = 1080, 1920
o, d = primary_ray_grid(frame.cam_l2w, flat.cam_fov_y, W, H, prec.dtype)
o, d = o.reshape(-1, 3), d.reshape(-1, 3)
R = o.shape[0]
ti = int(frame.dense_n.shape[0])
stream = ti > 65536
print(f"{ti} tris stream={stream}", flush=True)
perm = jax.random.permutation(jax.random.PRNGKey(3), R)
hits = {}
for mxu in (False, True):
    t1, h1 = timeit(trace_rays_packet, scene, frame, o, d, prec=prec,
                    tile_hw=(H, W), stream=stream, mxu=mxu)
    hits[mxu] = h1
    print(f"mxu={mxu} coherent: {t1*1e3:8.2f} ms = {R/t1/1e6:6.1f} Mrays/s", flush=True)
    t2, _ = timeit(trace_rays_packet_sorted, scene, frame, o[perm], d[perm],
                   prec=prec, stream=stream, mxu=mxu)
    print(f"mxu={mxu} sorted:   {t2*1e3:8.2f} ms = {R/t2/1e6:6.1f} Mrays/s", flush=True)
agree = (np.asarray(hits[False].tri) == np.asarray(hits[True].tri)).mean()
print(f"mxu on/off agreement: {agree:.6f}")
