"""Standalone wavelet-chain + fused-temporal-kernel timing at 1080p.

Times (a) one packed a-trous iteration per stride, (b) the full 5-stride
chain, (c) the fused temporal accumulation kernel — dispatch-free timed
loops (chain N iterations, one host sync).  Decision feed: the per-stride
halo-DMA sizing and double-buffering work in ops/svgf_pallas.py.

Usage: python tools/bench_wavelet_micro.py [width height] [iters]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    from low_precision_raytracer_tpu.config import SVGFConfig
    from low_precision_raytracer_tpu.ops import svgf_pallas as sp

    cfg = SVGFConfig()
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    f32 = jnp.float32
    color2 = jax.random.uniform(ks[0], (2, H, W, 3), f32)
    var2 = jax.random.uniform(ks[1], (2, H, W), f32)
    depth = jax.random.uniform(ks[2], (H, W), f32) * 10
    grad = jax.random.uniform(ks[3], (H, W, 2), f32) + 0.1
    normal = jax.random.normal(ks[4], (H, W, 3), f32)
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    illum2 = jax.random.uniform(ks[5], (2, H, W), f32)

    geo = sp.pack_geometry_pair(depth, grad, normal, illum2, cfg)
    fgeo2 = sp.geometry_valid2(depth, normal, illum2)
    cv = sp.pack_cv_pair(color2, var2, fgeo2)
    geo = jax.block_until_ready(geo)
    cv = jax.block_until_ready(cv)

    def timed(fn, *args):
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        _ = np.asarray(jax.tree.leaves(outs[-1])[0].ravel()[0])
        return (time.perf_counter() - t0) / iters

    for s in (1, 2, 4, 8, 16):
        for reuse in (False, True):
            dt = timed(lambda cv=cv, s=s, r=reuse: sp.wavelet_iter_pallas(
                geo, cv, s, cfg, H=H, W=W, reuse=r))
            tag = "reuse" if reuse else "plain"
            print(f"[wavelet] stride {s:2d} {tag}: {dt * 1e3:7.3f} ms")

    @jax.jit
    def chain(geo, cv):
        out, hist = sp._run_chain(geo, cv, (1, 2, 4, 8, 16), cfg, H, W, False)
        return out

    dt = timed(chain, geo, cv)
    print(f"[wavelet] full 5-stride chain (default scheme): {dt * 1e3:7.3f} ms")

    # fused temporal kernel
    tiles, hp, wp = sp._padded_dims(H, W)
    geo7, _ = sp.pack_geometry_base(depth, grad, normal, cfg)
    col6 = sp._pad0(
        jnp.stack([color2[0, ..., 0], color2[0, ..., 1], color2[0, ..., 2],
                   color2[1, ..., 0], color2[1, ..., 1], color2[1, ..., 2]]),
        H, W, hp, wp)
    ctr11 = sp._pad0(jax.random.uniform(ks[6], (sp.N_CTR, H, W), f32), H, W, hp, wp)
    geo7 = jax.block_until_ready(geo7)
    dt = timed(lambda: sp.temporal_accum_pallas_pair(
        col6, geo7, ctr11, cfg, H=H, W=W, color_w=0.1, moments_w=0.1))
    print(f"[temporal] fused kernel: {dt * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
