"""Stage-level timing for the per-ray wavefront launch (TPU).

Times, on the same bounce-ray inputs the tune sweep uses:
  1. the schedule phase alone (exact per-ray candidate lists),
  2. one forward round sort alone (key + full ray payload),
  3. one back sort alone (org key + results),
  4. the full launch at the current module constants.

Usage: python tools/profile_wavefront.py [pillar_grid] [sphere_subdiv] [K Q R]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    np.asarray(jax.tree.leaves(x)[0].reshape(-1)[:1])
    return x


def timeit(fn, iters=5):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    g = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    import low_precision_raytracer_tpu.ops.dense_pallas as DP
    import low_precision_raytracer_tpu.ops.wavefront as WF
    if len(sys.argv) > 5:
        WF.K_CAND, WF.Q_RANKS, WF.N_ROUNDS = (
            int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5])
        )
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
    print(f"scene: {ti} tris, {R/1e6:.2f} M rays, "
          f"K={WF.K_CAND} Q={WF.Q_RANKS} rounds={WF.N_ROUNDS}", flush=True)

    hit = DP.trace_rays_dense_pallas(
        scene, frame, o, d, prec=prec, cull=True, tile_hw=(H, W), stream=stream
    )
    sync(hit)
    t32 = hit.t.astype(jnp.float32)
    live = hit.tri >= 0
    pos = (o.astype(jnp.float32) + t32[:, None] * d.astype(jnp.float32)).astype(
        prec.dtype
    )
    n = (-d).astype(prec.dtype)
    t_axis = jnp.stack([n[:, 1], -n[:, 0], jnp.zeros_like(n[:, 0])], axis=-1)
    t_axis = t_axis / jnp.maximum(
        jnp.linalg.norm(t_axis, axis=-1, keepdims=True), 1e-3
    ).astype(prec.dtype)
    b_axis = jnp.cross(n, t_axis).astype(prec.dtype)
    u = jax.random.uniform(jax.random.PRNGKey(5), (2 * R,), prec.dtype)
    bd, _ = uniform_hemisphere_trig(n, t_axis, b_axis, u[:R], u[R:])
    maxd = jnp.where(live, 1e5, 0.0).astype(jnp.float32)

    o32 = pos.astype(jnp.float32)
    d32 = bd.astype(jnp.float32)

    # --- 1. schedule alone (chunk AABBs as groups; s_group=1 regime)
    clo, chi = frame.dense_chunk_lo, frame.dense_chunk_hi
    n_groups = clo.shape[0]
    id_bits = max(2, int(n_groups).bit_length())
    k = min(WF.K_CAND, n_groups)

    sched = jax.jit(functools.partial(
        WF._schedule, n_chunks=n_groups, id_bits=id_bits, k=k))
    t_sched = timeit(lambda: sched(clo, chi, o32, d32, maxd))
    print(f"schedule (K={k}): {t_sched*1e3:8.1f} ms", flush=True)

    # --- 2. forward sort alone (key + 10 payload + q ids)
    q = min(WF.Q_RANKS, k)
    key = jnp.arange(R, dtype=jnp.int32) % 997
    skip = jnp.full((R,), -1, jnp.int32)
    mind = jnp.zeros((R,), jnp.float32)
    orig = jnp.arange(R, dtype=jnp.int32)
    ids_q = [key + j for j in range(q)]

    @jax.jit
    def fsort():
        return jax.lax.sort(
            [key, o32[:, 0], o32[:, 1], o32[:, 2],
             d32[:, 0], d32[:, 1], d32[:, 2],
             skip, mind, maxd, orig] + ids_q,
            num_keys=1,
        )

    t_f = timeit(fsort)
    print(f"forward sort ({11+q} arrays): {t_f*1e3:8.1f} ms", flush=True)

    # --- 3. back sort alone (org + t/row/pk + q covered)
    @jax.jit
    def bsort():
        return jax.lax.sort(
            [orig, maxd, skip, skip] + [(key + j) for j in range(q)],
            num_keys=1,
        )

    t_b = timeit(bsort)
    print(f"back sort ({4+q} arrays): {t_b*1e3:8.1f} ms", flush=True)
    print(f"per-round sort pair: {(t_f+t_b)*1e3:8.1f} ms "
          f"x {WF.N_ROUNDS} rounds = {(t_f+t_b)*WF.N_ROUNDS*1e3:8.1f} ms",
          flush=True)

    # --- 4. full launch
    t_full = timeit(lambda: WF.trace_rays_wavefront(
        scene, frame, pos, bd, prec=prec, min_dist=0.1, max_dist=maxd,
    ), iters=3)
    print(f"full wavefront launch: {t_full*1e3:8.1f} ms = "
          f"{R/t_full/1e6:5.1f} Mrays/s", flush=True)
    rounds_cost = (t_f + t_b) * WF.N_ROUNDS
    print(f"residual (kernel + combine + sweep-cond): "
          f"{(t_full - t_sched - rounds_cost)*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
