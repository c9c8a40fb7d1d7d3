"""Per-stage profiling (reference §5.1: `Renderer::timing` around every
kernel + sync, `rt/gui/imgui_window.cu:86-91`).

Production frames are ONE fused jit program; this harness re-executes the
schedule as separately-jitted stages with `block_until_ready` between them,
producing a timing dict keyed by the reference's stage names.  Use only for
profiling — stage boundaries inhibit XLA fusion, exactly like the
reference's sync-after-every-launch discipline."""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp

from low_precision_raytracer_tpu.config import get_precision
from low_precision_raytracer_tpu.models.scene import flatten_frame
from low_precision_raytracer_tpu.ops.camera import primary_ray_grid
from low_precision_raytracer_tpu.ops.gbuffer import fill_gbuffer
from low_precision_raytracer_tpu.ops.reproject import generate_temporal_maps
from low_precision_raytracer_tpu.ops.shade import gbuffer_to_shade_input, shade
from low_precision_raytracer_tpu.ops.svgf import preprocess_normal_depth, svgf_denoise
from low_precision_raytracer_tpu.render.renderer import _gi_shade_input, _trace_di


def _timed(name, stats, fn, *args):
    from low_precision_raytracer_tpu.utils.timing import sync

    t0 = time.perf_counter()
    out = fn(*args)
    sync(out)  # host transfer — block_until_ready returns early on tunnels
    stats[name] = time.perf_counter() - t0
    return out


def profile_frame(renderer, time_value: float = 0.0) -> dict[str, float]:
    """-> {stage name: seconds} using the reference's stage names."""
    cfg = renderer.cfg
    prec = get_precision(cfg.precision)
    dt = prec.dtype
    H, W = cfg.height, cfg.width
    R = H * W
    scene = renderer.scene
    state = renderer.state
    frame = flatten_frame(
        renderer.host, prec, time=time_value,
        max_direct_lights=cfg.max_direct_lights, width=W, height=H,
    )
    key = jax.random.PRNGKey(1)
    k_taa, k0, k1 = jax.random.split(key, 3)
    stats: dict[str, float] = {}

    @jax.jit
    def primary(frame):
        o, d = primary_ray_grid(frame.cam_l2w, frame.cam_fov_y, W, H, dt)
        o = o.reshape(R, 3)
        d = d.reshape(R, 3)
        g, _ = fill_gbuffer(scene, frame, o, d, prec, cfg=cfg)
        return g, d

    # warm up each stage once (compile), then measure
    for _ in range(2):
        g_flat, d = _timed("Primary Ray", stats, primary, frame)
    g2d = {k: v.reshape((H, W) + v.shape[1:]) for k, v in g_flat.items()}

    tmap_fn = jax.jit(
        lambda g2d, frame, state, k: generate_temporal_maps(g2d, frame, state, W, H, dt, k)
    )
    for _ in range(2):
        svgf_map, taa_map, _, _ = _timed("Generate Temporal Map", stats, tmap_fn, g2d, frame, state, k_taa)

    shade_fn = jax.jit(
        lambda sin0, d, k: shade(
            scene, frame, sin0, view_dir=-d, prec=prec, cfg=cfg,
            first_round=True, no_gi=not cfg.gi_on, key=k,
        )
    )
    sin0 = gbuffer_to_shade_input(g_flat)
    for _ in range(2):
        out0 = _timed("Pixel Shade #1", stats, shade_fn, sin0, d, k0)

    di_fn = jax.jit(
        lambda src, lights, skips: _trace_di(scene, frame, src, lights, skips, prec, cfg)
    )
    for _ in range(2):
        di0 = _timed("Trace DI Ray #1", stats, di_fn, out0.source, out0.lights, out0.skip_tri)

    if cfg.gi_on:
        from low_precision_raytracer_tpu.ops.trace import trace as _trace

        def gi_trace(o):
            maxt = jnp.where(o.gi_valid, 1e5, 0.0)
            hit = _trace(
                scene, frame, o.source, o.gi_direction, prec=prec, cfg=cfg,
                find_any=False, skip_tri=o.skip_tri,
                min_dist=prec.ray_moveforward_t, max_dist=maxt, coherent=False,
            )
            return _gi_shade_input(scene, frame, o, hit, prec)

        gi_fn = jax.jit(gi_trace)
        for _ in range(2):
            sin1 = _timed("Trace GI #1", stats, gi_fn, out0)
        shade1_fn = jax.jit(
            lambda sin1, vd, k: shade(
                scene, frame, sin1, view_dir=vd, prec=prec, cfg=cfg,
                first_round=False, no_gi=True, key=k,
            )
        )
        for _ in range(2):
            out1 = _timed("Shade #2", stats, shade1_fn, sin1, out0.view_dir_out, k1)
        for _ in range(2):
            _timed("Trace DI #2", stats, di_fn, out1.source, out1.lights, out1.skip_tri)

    if cfg.demo.svgf:
        mul = jnp.abs(out0.gi_multiplier.reshape(H, W, 3))
        grad_fn = jax.jit(lambda n, z: preprocess_normal_depth(n, z))
        grad = grad_fn(g2d["normal"], g2d["depth"])
        svgf_fn = jax.jit(
            lambda c, st, m, n, z, gr: svgf_denoise(
                c, st, m, n, z, gr, cfg.svgf,
                cfg.svgf.color_mix_weight, cfg.svgf.moments_mix_weight,
            )
        )
        for _ in range(2):
            _timed(
                "SVGF", stats, svgf_fn,
                mul, state.svgf_colored, svgf_map, g2d["normal"], g2d["depth"], grad,
            )
        stats["SVGF"] *= 2  # run twice per frame (colored + white)

    total = sum(stats.values())
    stats["TOTAL (staged)"] = total
    return stats
