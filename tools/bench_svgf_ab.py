"""Frame-level A/B of the SVGF implementation modes (TPU).

Times the full Cornell 1080p bf16 frame under each wavelet_impl:
  pallas         — fused Pallas temporal kernel + Pallas wavelet chain
  pallas_wavelet — XLA temporal stages + Pallas wavelet chain
  xla            — everything XLA

Usage: python tools/bench_svgf_ab.py [width height frames]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import numpy as np


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    from low_precision_raytracer_tpu.config import (
        RenderConfig, SVGFConfig, get_precision,
    )
    from low_precision_raytracer_tpu.models.procedural import cornell_box_scene
    from low_precision_raytracer_tpu.models.scene import (
        build_scene_arrays, flatten_frame,
    )
    from low_precision_raytracer_tpu.render.framestate import init_frame_state
    from low_precision_raytracer_tpu.render.renderer import render_frame
    from low_precision_raytracer_tpu.utils.rng import render_key

    host = cornell_box_scene()
    prec = get_precision("bf16")
    scene = build_scene_arrays(host, prec)

    for impl in ("pallas", "pallas_wavelet", "xla"):
        cfg = RenderConfig(width=W, height=H, precision="bf16", gi_on=True,
                           svgf=SVGFConfig(wavelet_impl=impl))
        frame = flatten_frame(host, prec, max_direct_lights=cfg.max_direct_lights,
                              width=W, height=H)
        state = init_frame_state(cfg, len(frame.obj_layout))
        key = render_key(0)
        try:
            img = None
            for _ in range(2):
                key, sub = jax.random.split(key)
                img, aux, state = render_frame(scene, frame, state, cfg, sub)
            np.asarray(img[0, 0])
            # pre-materialized keys: an in-loop split is an extra execute
            # dispatch = one more tunnel round trip per frame
            subs = list(jax.random.split(key, frames))
            np.asarray(jax.random.key_data(subs[-1]))
            t0 = time.perf_counter()
            for i in range(frames):
                img, aux, state = render_frame(scene, frame, state, cfg, subs[i])
            np.asarray(img[0, 0])
            dt = (time.perf_counter() - t0) / frames
            print(f"[{impl:15s}] {dt*1e3:7.1f} ms/frame ({1/dt:5.2f} fps)",
                  flush=True)
        except Exception as ex:  # keep sweeping
            print(f"[{impl:15s}] FAILED {type(ex).__name__}: {ex}", flush=True)


if __name__ == "__main__":
    main()
