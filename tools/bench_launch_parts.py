"""Where do the frame's ~21 ms of trace launches go — kernel body vs XLA
glue (lane_k transposes, broadcast prep, epilogue extraction)?

Times the three in-frame launch shapes of the Cornell 1080p frame in
dispatch-free loops:
  1. primary      : coherent R-lane closest-hit (tile_hw screen blocks)
  2. digi fused   : lane_k = L+1 closest-hit (round-0 DI + GI share a launch)
  3. di2          : lane_k = L find_any (last round's shadow rays)
plus glue-isolation variants of 2/3 that call the Pallas entry directly on
pre-transposed arrays (no lane_k transpose, no broadcast/concat prep).

Usage: python tools/bench_launch_parts.py [width height iters]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from low_precision_raytracer_tpu.config import RenderConfig, get_precision
from low_precision_raytracer_tpu.models import procedural
from low_precision_raytracer_tpu.models.scene import build_scene_arrays, flatten_frame
from low_precision_raytracer_tpu.ops.camera import primary_ray_grid
from low_precision_raytracer_tpu.ops.dense_pallas import trace_rays_dense_pallas
from low_precision_raytracer_tpu.ops.trace import resolve_cfg, trace


def sync(x):
    np.asarray(jax.tree.leaves(x)[0].reshape(-1)[:1])
    return x


def timeit(fn, *args, iters=20, **kw):
    sync(fn(*args, **kw))
    sync(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    prec = get_precision("bf16")
    dt = prec.dtype
    host = procedural.cornell_box_scene()
    cfg = RenderConfig(width=W, height=H, precision="bf16")
    scene = build_scene_arrays(host, prec, leaf_size=cfg.bvh_leaf_size)
    frame = flatten_frame(host, prec, max_direct_lights=cfg.max_direct_lights,
                          width=W, height=H)
    cfg = resolve_cfg(scene, frame, cfg)
    L = min(frame.n_lights, cfg.max_direct_lights)
    R = W * H
    print(f"impl={cfg.traversal_impl} L={L} R={R/1e6:.2f}M "
          f"tris={frame.dense_n.shape[0]}")

    o, d = primary_ray_grid(frame.cam_l2w, frame.cam_fov_y, W, H, dt)
    o = o.reshape(R, 3)
    d = d.reshape(R, 3)

    # synthetic but realistic post-shade rays: hit position = o + t*d from a
    # real primary trace; shadow dirs toward light 0; GI dirs = reflect-ish
    hit = jax.jit(partial(trace, prec=prec, cfg=cfg))(scene, frame, o, d)
    sync(hit)
    t32 = hit.t
    pos = (o.astype(jnp.float32) + t32[:, None] * d.astype(jnp.float32)).astype(dt)
    key = jax.random.PRNGKey(0)
    gi_d = jax.random.normal(key, (R, 3), jnp.float32)
    gi_d = (gi_d / jnp.linalg.norm(gi_d, axis=1, keepdims=True)).astype(dt)
    skip = hit.tri
    valid = hit.tri >= 0

    lpos = frame.light_pos[:L].astype(jnp.float32)  # (L, 3)
    dvec = lpos[None] - pos.astype(jnp.float32)[:, None]  # (R, L, 3)
    dist = jnp.linalg.norm(dvec, axis=-1)
    ldir = (dvec / dist[..., None]).astype(dt)
    maxt = jnp.where(valid[:, None], dist, 0.0)

    K = L + 1
    o_k = jnp.broadcast_to(pos[:, None, :], (R, K, 3)).reshape(R * K, 3)
    d_k = jnp.concatenate([ldir, gi_d[:, None]], axis=1).reshape(R * K, 3)
    mx_k = jnp.concatenate(
        [maxt, jnp.where(valid, 1e5, 0.0)[:, None]], axis=1
    ).reshape(R * K)
    sk_k = jnp.broadcast_to(skip[:, None], (R, K)).reshape(R * K)

    o_l = jnp.broadcast_to(pos[:, None, :], (R, L, 3)).reshape(R * L, 3)
    d_l = ldir.reshape(R * L, 3)
    mx_l = maxt.reshape(R * L)
    sk_l = jnp.broadcast_to(skip[:, None], (R, L)).reshape(R * L)

    mn = prec.ray_moveforward_t

    t_prim = timeit(
        jax.jit(partial(trace, prec=prec, cfg=cfg)), scene, frame, o, d,
        iters=iters,
    )
    print(f"primary  (R, coherent)        : {t_prim*1e3:7.2f} ms")

    f_digi = jax.jit(partial(
        trace, prec=prec, cfg=cfg, find_any=False, coherent=False, lane_k=K,
        min_dist=mn,
    ))
    t_digi = timeit(f_digi, scene, frame, o_k, d_k,
                    skip_tri=sk_k, max_dist=mx_k, iters=iters)
    print(f"digi fused (R*{K}, lane_k)      : {t_digi*1e3:7.2f} ms")

    f_di2 = jax.jit(partial(
        trace, prec=prec, cfg=cfg, find_any=True, coherent=False, lane_k=L,
        min_dist=mn,
    ))
    t_di2 = timeit(f_di2, scene, frame, o_l, d_l,
                   skip_tri=sk_l, max_dist=mx_l, iters=iters)
    print(f"di2 find_any (R*{L}, lane_k)    : {t_di2*1e3:7.2f} ms")

    # ---- glue isolation: same lane counts, pre-transposed, direct kernel
    def pre(o_, d_, s_, m_, k):
        Rk = o_.shape[0]
        R0 = Rk // k
        t3 = lambda x: jnp.swapaxes(x.reshape(R0, k, 3), 0, 1).reshape(Rk, 3)
        t1 = lambda x: x.reshape(R0, k).T.reshape(Rk)
        return t3(o_), t3(d_), t1(s_), t1(m_)

    o_kt, d_kt, sk_kt, mx_kt = map(sync, pre(o_k, d_k, sk_k, mx_k, K))
    f_raw = jax.jit(partial(
        trace_rays_dense_pallas, prec=prec, fallback="mxu3",
        find_any=False, min_dist=mn, tile_hw=None,
    ))
    t_raw = timeit(f_raw, scene, frame, o_kt, d_kt,
                   skip_tri=sk_kt, max_dist=mx_kt, iters=iters)
    print(f"digi kernel-only (R*{K} pre-T)  : {t_raw*1e3:7.2f} ms  "
          f"(glue = {(t_digi-t_raw)*1e3:.2f} ms)")

    o_lt, d_lt, sk_lt, mx_lt = map(sync, pre(o_l, d_l, sk_l, mx_l, L))
    f_raw2 = jax.jit(partial(
        trace_rays_dense_pallas, prec=prec, fallback="mxu3",
        find_any=True, min_dist=mn, tile_hw=None,
    ))
    t_raw2 = timeit(f_raw2, scene, frame, o_lt, d_lt,
                    skip_tri=sk_lt, max_dist=mx_lt, iters=iters)
    print(f"di2 kernel-only (R*{L} pre-T)   : {t_raw2*1e3:7.2f} ms  "
          f"(glue = {(t_di2-t_raw2)*1e3:.2f} ms)")

    total = t_prim + t_digi + t_di2
    print(f"TOTAL in-frame launch shapes  : {total*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
