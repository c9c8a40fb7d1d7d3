"""Feature-ablation frame profiler: full pipeline vs pipeline-minus-one-
feature at 1080p, with host-transfer sync.  Attribution method from round 1
(the staged profiler changes fusion; ablation measures what production pays).

Usage: python tools/profile_ablate.py [scene] [precision] [width] [height]
"""

import os as _os, sys as _sys
# runnable as `python tools/<name>.py` from anywhere: put the repo root
# (this file's parent's parent) on sys.path before package imports
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import numpy as np


def run(cfg_kw, scene_name, frames=8, warmup=2):
    from low_precision_raytracer_tpu.config import DemoSettings, RenderConfig
    from low_precision_raytracer_tpu.models import procedural
    from low_precision_raytracer_tpu.models.scene import build_scene_arrays, flatten_frame
    from low_precision_raytracer_tpu.ops.trace import resolve_cfg
    from low_precision_raytracer_tpu.render.framestate import init_frame_state
    from low_precision_raytracer_tpu.render.renderer import render_frame

    builders = {
        "cornell": procedural.cornell_box_scene,
        "sponza": procedural.sponza_like_scene,
    }
    host = builders[scene_name]()
    cfg = RenderConfig(**cfg_kw)
    scene = build_scene_arrays(host, cfg.prec, leaf_size=cfg.bvh_leaf_size)
    frame = flatten_frame(host, cfg.prec, max_direct_lights=cfg.max_direct_lights,
                          width=cfg.width, height=cfg.height)
    cfg = resolve_cfg(scene, frame, cfg)
    state = init_frame_state(cfg, len(frame.obj_layout))
    from low_precision_raytracer_tpu.utils.rng import render_key
    key = render_key(0)
    # dispatch-free timed loop (BASELINE.md "headline metrology bug"):
    # pre-split every frame key on the host; in-loop dispatches bill
    # real wall time on this tunnel
    subs = list(jax.random.split(key, warmup + frames))
    for i in range(warmup):
        img, aux, state = render_frame(scene, frame, state, cfg, subs[i])
    np.asarray(img[0, 0])
    t0 = time.perf_counter()
    for i in range(frames):
        img, aux, state = render_frame(scene, frame, state, cfg, subs[warmup + i])
    np.asarray(img[0, 0])
    return (time.perf_counter() - t0) / frames, cfg.traversal_impl


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "cornell"
    precision = sys.argv[2] if len(sys.argv) > 2 else "bf16"
    width = int(sys.argv[3]) if len(sys.argv) > 3 else 1920
    height = int(sys.argv[4]) if len(sys.argv) > 4 else 1080
    from low_precision_raytracer_tpu.config import DemoSettings

    base = dict(width=width, height=height, precision=precision, gi_on=True)
    variants = {
        "full": base,
        "-SVGF": {**base, "demo": DemoSettings(svgf=False)},
        "-TAA": {**base, "taa_on": False},
        "-GI": {**base, "gi_on": False},
        "-GI-SVGF-TAA": {**base, "gi_on": False, "taa_on": False,
                         "demo": DemoSettings(svgf=False)},
    }
    full = None
    for name, kw in variants.items():
        dt, impl = run(kw, scene)
        if name == "full":
            full = dt
        delta = f"  (feature cost ~{(full - dt) * 1e3:7.1f} ms)" if full and name != "full" else ""
        print(f"{name:>14s}: {dt * 1e3:8.1f} ms/frame [{impl}]{delta}", flush=True)


if __name__ == "__main__":
    main()
