"""Stage breakdown of the one-shot wavefront (ops/wavefront.py
mode='oneshot') on the 46.5k bounce launch: schedule sweep, pair sort,
assigned kernel, back sort — measured as separately-jitted stages with
dispatch-free timed loops.

Usage: python tools/profile_oneshot.py [pillar_grid] [sphere_subdiv]
"""

import os as _os, sys as _sys
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
from low_precision_raytracer_tpu.ops import wavefront as WF
from low_precision_raytracer_tpu.ops import dense_pallas as DP

F32 = jnp.float32


def sync(x):
    np.asarray(jax.tree.leaves(x)[0].reshape(-1)[:1])
    return x


def timeit(fn, *args, iters=5):
    sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    pg = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sd = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    prec = get_precision("bf16")
    host = sponza_like_scene(pillar_grid=pg, sphere_subdiv=sd, with_skybox=False)
    scene = build_scene_arrays(host, prec, leaf_size=4)
    flat = build_flat_scene(host.root, host.active_camera)
    frame = frame_input_from_flat(flat, host, prec)
    H, W = 1080, 1920
    o, d = primary_ray_grid(frame.cam_l2w, flat.cam_fov_y, W, H, prec.dtype)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    R = o.shape[0]

    hit = DP.trace_rays_dense_pallas(
        scene, frame, o, d, prec=prec, tile_hw=(H, W),
    )
    t32 = hit.t.astype(F32)
    live = hit.tri >= 0
    pos = (o.astype(F32) + t32[:, None] * d.astype(F32))
    from low_precision_raytracer_tpu.ops.sampling import uniform_hemisphere_trig
    from low_precision_raytracer_tpu.math.vec import normalize

    g = hit
    n = jnp.where(live[:, None], jnp.asarray([0, 1, 0], prec.dtype), 0)
    rnd = jax.random.normal(jax.random.PRNGKey(5), (R, 3), F32)
    bd = (rnd / jnp.linalg.norm(rnd, axis=-1, keepdims=True)).astype(prec.dtype)
    maxd0 = jnp.where(live, 1e5, 0.0).astype(F32)
    pos = pos.astype(prec.dtype)

    o_f32 = pos.astype(F32)
    d_f32 = bd.astype(F32)
    maxd = WF.scene_exit_cap(frame, o_f32, d_f32, maxd0)
    skip_tri = jnp.full((R,), -1, jnp.int32)
    min_dist = jnp.full((R,), 0.1, F32)

    # mirror the oneshot setup
    TI = frame.dense_n.shape[0]
    tc = WF.TC
    n_chunks = -(-TI // tc)
    s_group = max(1, -(-n_chunks // WF.GROUP_WIDTH))
    n_groups = -(-n_chunks // s_group)
    id_bits = max(2, n_groups.bit_length())
    id_mask = (1 << id_bits) - 1
    k = min(WF.K_CAND, n_groups)
    glo = frame.dense_chunk_lo
    ghi = frame.dense_chunk_hi
    print(f"R={R} TI={TI} n_chunks={n_chunks} k={k}", flush=True)

    sched = jax.jit(lambda mx: WF._schedule(
        glo, ghi, o_f32, d_f32, mx, n_groups, id_bits, k, wmin=None))
    t_sched, (cand, tcut_e) = timeit(sched, maxd)
    print(f"schedule: {t_sched*1e3:8.1f} ms")

    cand_id = cand & id_mask
    P = R * k
    pidx = jnp.arange(P, dtype=jnp.int32)

    @jax.jit
    def fwd(cand_id, o_f32, d_f32, skip_tri, min_dist, maxd):
        pid = cand_id.reshape(P)
        rrep = lambda x: jnp.repeat(x, k, axis=0)
        live_p = pid < id_mask
        key = jnp.where(live_p, pid, jnp.int32(id_mask))
        return jax.lax.sort(
            [key,
             rrep(o_f32[:, 0]), rrep(o_f32[:, 1]), rrep(o_f32[:, 2]),
             rrep(d_f32[:, 0]), rrep(d_f32[:, 1]), rrep(d_f32[:, 2]),
             rrep(skip_tri), rrep(min_dist),
             jnp.where(live_p, rrep(maxd), 0.0), pidx],
            num_keys=1,
        )
    t_fwd, srt = timeit(fwd, cand_id, o_f32, d_f32, skip_tri, min_dist, maxd)
    print(f"fwd sort (11 ops, {P/1e6:.1f}M lanes): {t_fwd*1e3:8.1f} ms")

    # list build + kernel: reuse the production function but time the whole
    # launch minus the parts above by differencing
    full = jax.jit(lambda: WF.trace_rays_wavefront(
        scene, frame, pos, bd, prec=prec, min_dist=0.1, max_dist=maxd0,
        mode="oneshot"))
    t_full, _ = timeit(full)
    print(f"full oneshot: {t_full*1e3:8.1f} ms")

    @jax.jit
    def back(srt0, srt10):
        return jax.lax.sort([srt10, srt0, srt0, srt0], num_keys=1)
    t_back, _ = timeit(back, srt[0], srt[10])
    print(f"back sort (4 ops): {t_back*1e3:8.1f} ms")
    print(f"=> kernel + list build + glue ~ {(t_full - t_sched - t_fwd - t_back)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
