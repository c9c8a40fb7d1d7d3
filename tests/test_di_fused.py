"""Fused in-kernel DI shadow phase (ops/dense_pallas.run_di_phase) vs the
separate `trace_di_light`-style launch (`rt/rtrt/cuda.hpp:2058-2081`).

The fused phase computes shadow rays from the kernel's own winner hit in
f32, where the separate launch uses the dtype-rounded interpolated hit
position — visibility may differ only for rays whose occluder distance is
within the dtype epsilon of the light distance, so the tests assert
(a) identical closest-hit results, (b) near-total visibility agreement and
(c) full-frame image parity between the two paths."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from low_precision_raytracer_tpu.config import RenderConfig, get_precision
from low_precision_raytracer_tpu.models.procedural import cornell_box_scene
from low_precision_raytracer_tpu.models.scene import build_scene_arrays, flatten_frame
from low_precision_raytracer_tpu.ops.camera import primary_ray_grid
from low_precision_raytracer_tpu.ops.gbuffer import fill_gbuffer
from low_precision_raytracer_tpu.ops.shade import gbuffer_to_shade_input, shade
from low_precision_raytracer_tpu.ops.trace import di_fusible
from low_precision_raytracer_tpu.render.renderer import (
    Renderer,
    _di_from_vis,
    _di_light_spec,
    _trace_di,
)
from low_precision_raytracer_tpu.utils.image import psnr


def _setup(precision, w=64, h=48):
    # force the Pallas backend (interpret mode on CPU) — 'auto' routes to
    # the XLA dense path off-TPU, which has no fused DI phase
    cfg = RenderConfig(width=w, height=h, precision=precision, gi_on=True,
                       traversal_impl="dense_pallas")
    host = cornell_box_scene()
    scene = build_scene_arrays(host, get_precision(precision))
    prec = get_precision(precision)
    frame = flatten_frame(host, prec, time=0.0,
                          max_direct_lights=cfg.max_direct_lights,
                          width=w, height=h)
    return cfg, scene, frame, prec


def test_fused_di_visibility_matches_separate_launch():
    for precision in ("bf16", "fp32"):
        cfg, scene, frame, prec = _setup(precision)
        assert di_fusible(scene, frame, cfg, prec)
        dt = prec.dtype
        W, H = cfg.width, cfg.height
        R = W * H
        o, d = primary_ray_grid(frame.cam_l2w, frame.cam_fov_y, W, H, dt)
        o, d = o.reshape(R, 3), d.reshape(R, 3)
        di_spec = _di_light_spec(frame, cfg)

        g_fused, hit_fused = fill_gbuffer(
            scene, frame, o, d, prec, cfg=cfg, di_lights=di_spec
        )
        g_sep, hit_sep = fill_gbuffer(scene, frame, o, d, prec, cfg=cfg)

        # the primary closest-hit result must be bitwise unaffected
        for a, b in zip(jax.tree.leaves(hit_fused), jax.tree.leaves(hit_sep)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        out0 = shade(scene, frame, gbuffer_to_shade_input(g_sep),
                     view_dir=-d, prec=prec, cfg=cfg, first_round=True,
                     no_gi=False, key=jax.random.PRNGKey(0))
        di_sep = np.asarray(
            _trace_di(scene, frame, out0.source, out0.lights,
                      out0.skip_tri, prec, cfg), np.float32)
        di_fus = np.asarray(
            _di_from_vis(g_fused["di_vis"], out0.lights, dt), np.float32)

        # visibility agreement (boolean per (ray, light) where a light
        # command exists)
        valid = np.asarray(out0.lights.valid)
        vis_sep = (di_sep.sum(-1) > 0) & valid
        vis_fus = (di_fus.sum(-1) > 0) & valid
        agree = (vis_sep == vis_fus)[valid].mean() if valid.any() else 1.0
        assert agree > 0.995, f"{precision}: DI agreement {agree:.4f}"
        # and the DI contribution fields must match closely overall
        num = np.abs(di_sep - di_fus).sum()
        den = max(np.abs(di_sep).sum(), 1e-6)
        assert num / den < 0.02, f"{precision}: DI L1 rel diff {num / den:.4f}"


def test_fused_di_full_frame_parity():
    imgs = {}
    for mode in ("auto", "off"):
        cfg = RenderConfig(width=64, height=48, precision="bf16", gi_on=True,
                           di_fuse=mode, traversal_impl="dense_pallas")
        r = Renderer(cornell_box_scene(), cfg)
        img = None
        for _ in range(3):
            img, _ = r.render()
        imgs[mode] = np.asarray(img, np.float32)
    p = psnr(imgs["auto"], imgs["off"])
    assert p > 35.0, f"fused-vs-separate DI frame PSNR {p:.2f} dB"


def test_di_fuse_off_is_respected():
    cfg, scene, frame, prec = _setup("bf16")
    assert not di_fusible(scene, frame, cfg.replace(di_fuse="off"), prec)
