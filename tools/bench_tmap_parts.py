"""Cost split of the temporal-map stage (generate_temporal_maps) at
steady state: full vs no-payload vs no-validation variants, dispatch-free
loops on realistic second-frame inputs (static camera, all history valid —
the shifted-select fast path's steady state, which is what the headline
bench pays).

Usage: python tools/bench_tmap_parts.py [width height iters]
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
from low_precision_raytracer_tpu.ops.gbuffer import fill_gbuffer
from low_precision_raytracer_tpu.ops.reproject import generate_temporal_maps
from low_precision_raytracer_tpu.ops.trace import resolve_cfg
from low_precision_raytracer_tpu.render.framestate import init_frame_state


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
    R = W * H

    o, d = primary_ray_grid(frame.cam_l2w, frame.cam_fov_y, W, H, dt)
    g_flat, _ = jax.jit(partial(fill_gbuffer, prec=prec, cfg=cfg))(
        scene, frame, o.reshape(R, 3), d.reshape(R, 3)
    )
    g2d = {k: v.reshape((H, W) + v.shape[1:]) for k, v in g_flat.items()}
    sync(g2d)

    # steady-state frame state: history present everywhere it matters
    state = init_frame_state(cfg, len(frame.obj_layout))
    mesh_id = jnp.where(
        g2d["valid"], jnp.take(frame.obj_mesh, g2d["obj"], mode="clip"), -1
    ).astype(jnp.int32)
    import dataclasses
    state = dataclasses.replace(
        state,
        last_mesh_id=mesh_id,
        last_l2w=frame.obj_l2w_f32,
        last_w2c=frame.cam_w2c,
        svgf_frame_count=jnp.where(g2d["valid"], 8, 0).astype(jnp.int32),
    )
    o32, d32 = primary_ray_grid(frame.cam_l2w_f32, frame.cam_fov_y_f32, W, H,
                                jnp.float32)
    pos32 = o32 + g2d["t"].reshape(H, W)[..., None].astype(jnp.float32) * d32
    sync(pos32)

    svgf_payload = jnp.zeros((H, W, 10), dt) + 0.25
    taa_payload = jnp.zeros((H, W, 3), dt) + 0.25
    key = jax.random.PRNGKey(7)

    f = jax.jit(
        partial(generate_temporal_maps, n_meshes=scene.n_meshes),
        static_argnums=(3, 4, 5),  # width, height, dtype
        static_argnames=("packed",),
    )

    t_full = timeit(f, g2d, frame, state, W, H, dt, key,
                    svgf_payload=svgf_payload, taa_payload=taa_payload,
                    position_f32=pos32, iters=iters)
    print(f"tmap full (maps + validation + payload): {t_full*1e3:7.2f} ms")

    t_nopay = timeit(f, g2d, frame, state, W, H, dt, key,
                     svgf_payload=None, taa_payload=None,
                     position_f32=pos32, iters=iters)
    print(f"tmap no-payload (maps + validation)    : {t_nopay*1e3:7.2f} ms"
          f"   -> payload fetch = {(t_full-t_nopay)*1e3:.2f} ms")

    # packed ctr-layout fetch (the single-chip fused-SVGF path): the SVGF
    # payload goes channel-major through the Pallas coefficient-plane
    # kernel, the TAA payload keeps the coefficient-plane XLA form
    svgf_cm = jnp.moveaxis(svgf_payload, -1, 0)
    t_packed = timeit(f, g2d, frame, state, W, H, dt, key,
                      svgf_payload=svgf_cm, taa_payload=taa_payload,
                      position_f32=pos32, packed=True, iters=iters)
    print(f"tmap packed (pallas ctr fetch + taa)   : {t_packed*1e3:7.2f} ms"
          f"   -> vs full {t_full*1e3:.2f} ms")

    # fast-path vs take-path steady state check
    svgf_map, taa_map, pre_s, pre_t = f(
        g2d, frame, state, W, H, dt, key,
        svgf_payload=svgf_payload, taa_payload=taa_payload, position_f32=pos32)
    print("frame_count>0 fraction:",
          float(jnp.mean((svgf_map["frame_count"] > 0).astype(jnp.float32))))
    print("svgf_pre mean:", float(jnp.mean(pre_s)))
    _, _, pre_ctr, _ = f(
        g2d, frame, state, W, H, dt, key,
        svgf_payload=svgf_cm, taa_payload=taa_payload, position_f32=pos32,
        packed=True)
    from low_precision_raytracer_tpu.ops.svgf_pallas import PAD
    ctr_img = pre_ctr[:10, PAD : PAD + H, PAD : PAD + W]
    ref = jnp.moveaxis(pre_s, -1, 0)
    print("packed-vs-unpacked fetch max|diff|:",
          float(jnp.max(jnp.abs(ctr_img - ref))))


if __name__ == "__main__":
    main()
