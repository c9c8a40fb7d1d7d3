"""Count collectives in the compiled sharded render step (8-device virtual
CPU mesh) — the multi-chip communication audit for parallel/tiling.py.

Usage: python tools/hlo_collectives.py [height] [width]
"""

import os as _os, sys as _sys
# runnable as `python tools/<name>.py` from anywhere: put the repo root
# (this file's parent's parent) on sys.path before package imports
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import re
import sys


def collective_counts(height=128, width=128, n_devices=8, precision="bf16",
                      wavelet_impl=None):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from jax.sharding import NamedSharding, PartitionSpec as P

    from low_precision_raytracer_tpu.config import RenderConfig
    from low_precision_raytracer_tpu.models.procedural import cornell_box_scene
    from low_precision_raytracer_tpu.models.scene import build_scene_arrays, flatten_frame
    from low_precision_raytracer_tpu.parallel.tiling import (
        PIXEL_AXIS,
        make_pixel_mesh,
        shard_specs,
    )
    from low_precision_raytracer_tpu.render.framestate import init_frame_state
    from low_precision_raytracer_tpu.render.renderer import render_frame

    cfg = RenderConfig(width=width, height=height, precision=precision, gi_on=True)
    if wavelet_impl:
        from low_precision_raytracer_tpu.config import SVGFConfig

        cfg = cfg.replace(svgf=SVGFConfig(wavelet_impl=wavelet_impl))
    host = cornell_box_scene()
    scene = build_scene_arrays(host, cfg.prec, leaf_size=cfg.bvh_leaf_size)
    frame = flatten_frame(host, cfg.prec, max_direct_lights=4, width=width, height=height)
    cfg = cfg.replace(traversal_impl="dense_pallas")
    state = init_frame_state(cfg, len(frame.obj_layout))
    key = jax.random.PRNGKey(0)

    mesh = make_pixel_mesh(n_devices)
    cfg = cfg.replace(mesh=mesh)
    scene_spec, frame_spec, state_spec = shard_specs(scene, frame, state)
    ns = lambda spec: jax.tree.map(lambda s: NamedSharding(mesh, s), spec)
    fn = jax.jit(
        lambda scene, frame, state, key: render_frame(scene, frame, state, cfg, key),
        in_shardings=(ns(scene_spec), ns(frame_spec), ns(state_spec), None),
        out_shardings=(NamedSharding(mesh, P(PIXEL_AXIS)), None, ns(state_spec)),
    )
    compiled = fn.lower(scene, frame, state, key).compile()
    hlo = compiled.as_text()
    ops = ("all-gather", "collective-permute", "all-reduce", "all-to-all", "reduce-scatter")
    counts, bytes_ = {}, {}
    for op in ops:
        # count op INSTANCES (lines defining the op), not mentions; the
        # captured result shape gives the per-instance payload bytes (the
        # ICI wire volume one execution of the step moves)
        defs = re.findall(rf"=\s+(\([^)]*\)|\S+)\s+{op}(?:-start)?\(", hlo)
        counts[op] = len(defs)
        bytes_[op] = sum(_shape_bytes(s) for s in defs)
    return counts, bytes_


_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}


def _shape_bytes(shape_str: str) -> int:
    """Byte size of an HLO result shape string, e.g. 'bf16[2,128,16]' or a
    tuple '(f32[8,4]{1,0}, u32[])'."""
    total = 0
    for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", shape_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total



if __name__ == "__main__":
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    impl = sys.argv[3] if len(sys.argv) > 3 else None
    counts, nbytes = collective_counts(h, w, wavelet_impl=impl)
    print("instances:", counts)
    print("payload bytes/step:", nbytes, f"(total {sum(nbytes.values())/1e6:.2f} MB)")
