"""Pixel-tile sharding of the render step.

Design (SURVEY.md §5.8): shard the image row dimension across chips over ICI;
replicate the scene (BVH, vertices, materials, textures — they are read-only
per frame).  The carried FrameState's pixel arrays shard the same way, so
temporal state stays tile-local; reprojection gathers that cross tile
boundaries and SVGF stencil halos lower to XLA collectives automatically
under GSPMD sharding propagation.  Zero per-frame communication otherwise.
"""

from __future__ import annotations



import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from low_precision_raytracer_tpu.config import RenderConfig
from low_precision_raytracer_tpu.render.renderer import render_frame

PIXEL_AXIS = "px"


def make_pixel_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (PIXEL_AXIS,))


def _state_spec(state):
    """Rows-sharded spec for pixel-shaped FrameState leaves, replicated for
    scene-shaped ones (last_l2w, last_w2c)."""
    from low_precision_raytracer_tpu.ops.svgf import SVGFState
    from low_precision_raytracer_tpu.render.framestate import FrameState

    row = P(PIXEL_AXIS)
    rep = P()
    return FrameState(
        svgf_colored=SVGFState(miu1=row, miu2=row, color_history=row),
        svgf_white=SVGFState(miu1=row, miu2=row, color_history=row),
        taa_history=row,
        svgf_frame_count=row,
        last_mesh_id=row,
        last_prim=row,
        last_l2w=rep,
        last_w2c=rep,
    )


def shard_specs(scene, frame, state):
    """(scene_spec, frame_spec, state_spec) PartitionSpec pytrees."""
    rep = P()
    scene_spec = jax.tree.map(lambda _: rep, scene)
    frame_spec = jax.tree.map(lambda _: rep, frame)
    return scene_spec, frame_spec, _state_spec(state)


def render_frame_sharded(mesh: Mesh, scene, frame, state, cfg: RenderConfig, key):
    """Jit the full render step with pixel rows sharded over the mesh.

    The trace stages run under `shard_map` (rays partitioned over the pixel
    axis, scene replicated — see ops/trace.py) so the Pallas kernels execute
    per-shard by construction; the elementwise/stencil stages stay under
    GSPMD propagation, where the cross-tile reads (reprojection history
    taps, SVGF wavelet halos) lower to XLA-inserted collectives.

    Verified from the compiled HLO (8-device mesh, 128x128, bf16,
    tools/hlo_collectives.py): the optimized sharded step contains ZERO
    all-gathers and zero all-reduces (2 scalar-payload all-reduces for
    n_rays aside) — every cross-tile read is a bounded-halo
    collective-permute riding ICI (1523 of them: the unrolled-tap
    'xla_halo' wavelet/moments stencils emit one small row-halo exchange
    per statically shifted slice; the temporal fetch uses the K-halo
    ppermute exchange in ops/reproject.py).  Nothing re-replicates the
    pixel arrays.  History: round 2 had 117 all-gathers (whole history
    rows, temporal fetch), round 3 interim 27 (fori_loop wavelet taps
    whose traced slice offsets defeat XLA's halo analysis).  With
    wavelet_impl='pallas' (the TPU default) the WHOLE fused SVGF —
    temporal-accumulation kernel + wavelet chain — runs per shard via
    svgf_pallas.svgf_pallas_pair_full_sharded: 9 explicit 2*PAD-row
    _fill_pads ppermutes per step replace the hundreds of xla_halo
    stencil exchanges; only the CPU-mesh tests keep the 'xla_halo'
    form.

    Cost model (per-collective payloads summed from the HLO result
    shapes, tools/hlo_collectives.py): 23.3 MB/step total permute
    payload at 128x128x8 (~15 KB per instance).  Halo payload scales
    with image WIDTH times the per-stencil halo rows (stride-bounded,
    <= 16 rows + the K=1 temporal window), NOT with shard height, so at
    1080p the same 1523 permutes move ~ 23.3 MB * (1920/128) ~ 350 MB —
    on v5e-class per-neighbour ICI links (tens of GB/s each way,
    nearest-neighbour only: every exchange here is +-1 ring hop) that
    is single-digit ms/step wire time, plus ~1-2 ms of dispatch for the
    1523 instances.  Both terms are O(W), independent of device count —
    the design scales rows-out without growing the halo bill per chip.

    cfg.height must be divisible by the mesh size."""
    assert cfg.height % mesh.devices.size == 0, (
        f"height {cfg.height} not divisible by {mesh.devices.size} devices"
    )
    if cfg.mesh is None:
        cfg = cfg.replace(mesh=mesh)
    scene_spec, frame_spec, state_spec = shard_specs(scene, frame, state)
    ns = lambda spec: jax.tree.map(lambda s: NamedSharding(mesh, s), spec)

    scene_s = jax.device_put(scene, ns(scene_spec))
    frame_s = jax.device_put(frame, ns(frame_spec))
    state_s = jax.device_put(state, ns(state_spec))

    # jit caches by callable IDENTITY: a fresh lambda per call would retrace
    # and recompile the whole pipeline EVERY frame.  Cache the jitted step
    # per (mesh, cfg) — frames 2+ of a sharded run hit the compiled program.
    fn = _sharded_step(mesh, cfg, jax.tree.structure(scene), jax.tree.structure(state))
    return fn(scene_s, frame_s, state_s, key)


import functools as _functools


@_functools.lru_cache(maxsize=8)
def _sharded_step(mesh, cfg, _scene_treedef, _state_treedef):
    """Jitted sharded render step, cached on (mesh, cfg) — the treedefs key
    structural changes (e.g. different FrameState versions) without holding
    array references."""
    ns = lambda spec: jax.tree.map(lambda s: NamedSharding(mesh, s), spec)
    rep = P()  # scene/frame are fully replicated: one prefix sharding each
    state_spec = _state_spec(None)
    return jax.jit(
        lambda scene, frame, state, key: render_frame(scene, frame, state, cfg, key),
        in_shardings=(
            NamedSharding(mesh, rep),
            NamedSharding(mesh, rep),
            ns(state_spec),
            None,
        ),
        out_shardings=(
            NamedSharding(mesh, P(PIXEL_AXIS)),
            None,
            ns(state_spec),
        ),
    )
