"""Trace dispatcher: picks the intersection backend per cfg + scene size.

- 'dense': MXU all-pairs (ops/dense.py) — fastest for small scenes;
- 'jax'  : lane-parallel two-level BVH walk (ops/traversal.py);
- 'pallas': Pallas BVH kernel (ops/traversal_pallas.py);
- 'auto' : dense when the instance-triangle count is small, else BVH.

Scene size is static (array shapes), so the choice is made at trace time
and baked into the compiled program.
"""

from __future__ import annotations

import numpy as np

from low_precision_raytracer_tpu.config import Precision, RenderConfig
from low_precision_raytracer_tpu.ops.dense import trace_rays_dense
from low_precision_raytracer_tpu.ops.traversal import Hit, trace_rays


def _instance_tris(frame) -> int:
    return int(sum(t1 - t0 for _m, t0, t1 in frame.obj_layout))


def resolve_impl(scene, frame, cfg: RenderConfig) -> str:
    """Resolve 'auto' to a concrete backend from the static instance layout."""
    import jax

    impl = cfg.traversal_impl
    if impl == "auto":
        n_obj = len(frame.obj_layout)
        ti = _instance_tris(frame)
        on_tpu = jax.default_backend() == "tpu"
        if on_tpu and cfg.precision == "fp16":
            # Mosaic rejects f16 on this toolchain ("Unsupported type in
            # mosaic dialect: 'f16'"), so fp16 renders take the XLA
            # backends on TPU; bf16 is the native low-precision mode
            on_tpu = False
        if on_tpu and ti > 0:
            # The dense Pallas kernel wins IN-FRAME at every measured size
            # (5.3k tris: dense 625 ms vs packet-routed 882 ms, round 2;
            # 46.5k tris: dense 2510 ms vs packet 2894 ms, round 3 —
            # tools/bench_large_scene.py), so 'auto' routes to it up to its
            # HBM-streaming ceiling.  No object-count cap: scenes with >512
            # objects skip the per-object lax.map predicate and cull on the
            # per-chunk AABBs alone (ops/dense_pallas._chunk_predicates).
            # The packet BVH traversal covers the band the dense streaming
            # path can't reach; its standalone-coherent wins have never
            # survived in-frame (docs/TPU_NOTES.md).
            if ti <= cfg.packet_bvh_min_tris and n_obj > 0:
                return "dense_pallas"
            if ti <= cfg.packet_bvh_max_tris:
                return "pallas"
        if 0 < n_obj <= 64 and ti <= cfg.dense_max_tris:
            return "dense"
        return "jax"
    return impl


def resolve_cfg(scene, frame, cfg: RenderConfig) -> RenderConfig:
    if cfg.traversal_impl == "auto":
        return cfg.replace(traversal_impl=resolve_impl(scene, frame, cfg))
    return cfg


def incoherent_reorders(scene, frame, cfg: RenderConfig, prec: Precision) -> bool:
    """Would a `coherent=False` launch leave pixel order?  True when trace()
    below would route it through the morton-sorted tile path, the per-ray
    wavefront, or the sorted packet walk.  The fuse/unfuse decision in
    render/renderer.py consults THIS (single source of truth) — a stale
    copy of these gates there silently unfuses launches trace() would have
    kept pixel-ordered, or vice versa."""
    impl = cfg.traversal_impl
    if impl == "auto":
        impl = resolve_impl(scene, frame, cfg)
    ti = _instance_tris(frame)
    n_obj = len(frame.obj_layout)
    if impl == "dense_pallas":
        from low_precision_raytracer_tpu.ops.dense_pallas import TC

        fb = resolve_fallback(cfg.triangle_fallback, prec, "dense_pallas")
        if (
            cfg.incoherent_impl == "wavefront"
            and not prec.is_f32
            and fb == "mxu3"
            and frame.dense_chunk_lo is not None
            and ti > max(4 * TC, cfg.wavefront_min_tris)
            and ti <= cfg.packet_bvh_max_tris
        ):
            return True
        return n_obj > 1 and ti > 4 * TC and cfg.incoherent_sort != "none"
    if impl == "pallas":
        # the packet walk's own sort gate (see trace() below)
        return n_obj > 1 and ti > 4096
    return False  # 'dense' / 'jax' never reorder


def di_fusible(scene, frame, cfg: RenderConfig, prec: Precision) -> bool:
    """Can closest-hit launches on this scene carry the fused in-kernel DI
    shadow phase (ops/dense_pallas run_di_phase)?  True only for
    single-chunk dense_pallas scenes with at least one light: the per-tile
    chunk schedule is built from the LAUNCH's rays, so in-kernel shadow
    rays (which head toward the lights instead) are only covered when the
    whole scene is one statically-loaded chunk."""
    from low_precision_raytracer_tpu.ops.dense_pallas import TC

    if cfg.di_fuse == "off":
        return False
    impl = cfg.traversal_impl
    if impl == "auto":
        impl = resolve_impl(scene, frame, cfg)
    if impl != "dense_pallas":
        return False
    if cfg.dense_epilogue == "pack":
        return False  # the DI phase needs the full (unpacked) winner epilogue
    ti = _instance_tris(frame)
    return 0 < ti <= TC and frame.n_lights > 0


def moveforward_eps(scene, frame, cfg: RenderConfig, prec: Precision,
                    coherent: bool = True) -> float:
    """Self-intersection epsilon for a secondary-ray launch.

    The dtype-keyed `ray_moveforward_t` (1e-1 in bf16) exists to clear a
    DTYPE-QUANTIZED origin's position error; launches whose origins ride
    exactly — f32 hit positions through the dense kernel's high+low bf16
    split (mxu3) — only need to clear the test's own t error and take
    `ray_moveforward_t_exact` (1e-2, measured plateau of the r5 epsilon sweep).  Backends that re-quantize the
    origin keep the dtype epsilon: the XLA reference-shape paths (cast to
    the render dtype) and the per-ray wavefront (its pair sort packs the
    origin as dtype bit patterns)."""
    impl = cfg.traversal_impl
    if impl == "auto":
        impl = resolve_impl(scene, frame, cfg)
    if prec.is_f32 or impl != "dense_pallas":
        return prec.ray_moveforward_t
    fb = resolve_fallback(cfg.triangle_fallback, prec, "dense_pallas")
    if fb != "mxu3":
        return prec.ray_moveforward_t  # dtype triangle test re-quantizes
    if not coherent:
        from low_precision_raytracer_tpu.ops.dense_pallas import TC

        ti = _instance_tris(frame)
        if (
            cfg.incoherent_impl == "wavefront"
            and frame.dense_chunk_lo is not None
            and ti > max(4 * TC, cfg.wavefront_min_tris)
            and ti <= cfg.packet_bvh_max_tris
        ):
            # routes to the wavefront (trace() below): packed dt origins
            return prec.ray_moveforward_t
    return prec.ray_moveforward_t_exact


def resolve_fallback(fb: str, prec: Precision, impl: str) -> str:
    """Per-backend triangle-fallback resolution: 'mxu3' exists only in the
    Pallas kernels (dense + packet) and only for sub-fp32 dtypes (see
    config.py); every other (mode, backend) combination gets the
    exact-reference 'both'."""
    if fb == "auto":
        fb = "mxu3"
    if fb == "mxu3" and (
        impl not in ("dense_pallas", "pallas") or prec.is_f32
    ):
        return "both"
    return fb


def trace(
    scene,
    frame,
    origins,
    directions,
    *,
    prec: Precision,
    cfg: RenderConfig,
    find_any: bool = False,
    skip_tri=None,
    min_dist=0.0,
    max_dist=1e5,
    coherent: bool = True,
    lane_k: int = 1,
    di_lights=None,  # gate with di_fusible(); returns (Hit, vis) when set
) -> Hit:
    """`coherent=False` marks launches whose rays are NOT in screen order
    (GI bounces, secondary shadow rays).  On multi-chunk scenes the dense
    Pallas backend then recovers tile coherence with a morton sort
    (`trace_rays_dense_pallas_sorted`) — incoherent tiles otherwise defeat
    its packet culling.

    `lane_k=K`: the caller packed K command lanes per pixel, PIXEL-major
    (row i*K+l = pixel i's lane l — the layout that stays local under the
    pixel-row mesh).  The trace transposes to LANE-major (K blocks of
    pixel-ordered rays) before the kernel and back after: each lane block
    is screen-coherent, and statically-dead command slots (e.g. the
    invalid-light shadow lanes, maxd = 0) cluster into all-dead kernel
    tiles that the dense kernel skips wholesale.  Under `cfg.mesh` the
    transpose happens INSIDE the per-shard function — a local reshape,
    never a GSPMD reshard.

    With `cfg.mesh` set (multi-chip, parallel/tiling.py), the whole launch
    runs under `shard_map`: rays partition over the mesh's pixel axis and
    the scene/frame stay replicated, so every Pallas kernel executes
    per-shard by construction (never GSPMD-replicated).  Any contiguous ray
    partition is valid — the trace is ray-wise independent."""
    if cfg.mesh is not None:
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        mesh = cfg.mesh
        axis = mesh.axis_names[0]
        n_dev = int(mesh.devices.size)
        R = origins.shape[0]
        assert R % n_dev == 0, f"{R} rays not divisible by {n_dev} devices"
        if skip_tri is None:
            skip_tri = jnp.full((R,), -1, jnp.int32)
        min_dist = jnp.broadcast_to(jnp.asarray(min_dist, jnp.float32), (R,))
        max_dist = jnp.broadcast_to(jnp.asarray(max_dist, jnp.float32), (R,))
        cfg_local = cfg.replace(mesh=None)

        assert R % (n_dev * lane_k) == 0

        def local_trace(scene, frame, o, d, s, mn, mx, dl):
            return trace(
                scene, frame, o, d, prec=prec, cfg=cfg_local,
                find_any=find_any, skip_tri=s, min_dist=mn, max_dist=mx,
                coherent=coherent, lane_k=lane_k, di_lights=dl,
            )

        rep = lambda tree: jax.tree.map(lambda _: P(), tree)
        ray = P(axis)
        hit_spec = Hit(t=ray, u=ray, v=ray, tri=ray, obj=ray)
        return jax.shard_map(
            local_trace,
            mesh=mesh,
            in_specs=(rep(scene), rep(frame), ray, ray, ray, ray, ray,
                      rep(di_lights)),
            out_specs=(hit_spec, ray) if di_lights is not None else hit_spec,
            check_vma=False,
        )(scene, frame, origins, directions, skip_tri, min_dist, max_dist,
          di_lights)

    if lane_k > 1:
        import jax
        import jax.numpy as jnp

        assert di_lights is None, "di fusion is for lane_k=1 launches"
        K = lane_k
        Rk = origins.shape[0]
        R0 = Rk // K
        if skip_tri is None:
            skip_tri = jnp.full((Rk,), -1, jnp.int32)
        min_dist = jnp.broadcast_to(jnp.asarray(min_dist, jnp.float32), (Rk,))
        max_dist = jnp.broadcast_to(jnp.asarray(max_dist, jnp.float32), (Rk,))
        t3 = lambda x: jnp.swapaxes(x.reshape(R0, K, 3), 0, 1).reshape(Rk, 3)
        t1 = lambda x: x.reshape(R0, K).T.reshape(Rk)
        hit = trace(
            scene, frame, t3(origins), t3(directions), prec=prec, cfg=cfg,
            find_any=find_any, skip_tri=t1(skip_tri), min_dist=t1(min_dist),
            max_dist=t1(max_dist), coherent=coherent, lane_k=1,
        )
        u1 = lambda x: x.reshape(K, R0).T.reshape(Rk)
        return jax.tree.map(u1, hit)

    impl = cfg.traversal_impl
    if impl == "auto":  # resolve_cfg not applied — fall back inside trace
        impl = resolve_impl(scene, frame, cfg)
    # di_lights is only honored by the single-chunk dense_pallas launch
    # (see di_fusible); reaching any other backend with it is a caller bug
    assert di_lights is None or impl == "dense_pallas"
    if impl == "dense_pallas":
        import jax

        from low_precision_raytracer_tpu.ops.dense_pallas import (
            TC,
            trace_rays_dense_pallas,
            trace_rays_dense_pallas_sorted,
        )

        interpret = jax.default_backend() == "cpu"
        ti = _instance_tris(frame)
        stream = ti > cfg.dense_pallas_max_tris  # table too big for VMEM
        fb = resolve_fallback(cfg.triangle_fallback, prec, "dense_pallas")
        ep = "reduce5" if cfg.dense_epilogue == "auto" else cfg.dense_epilogue
        # measured (tools/bench_schedule_ab.py, v5e 2026-08-19): topk wins
        # or ties at every size — 46.5k primary 79.9 -> 65.1 ms, 2M primary
        # 6550 -> 5372 ms, bounce 1690 -> 1658 ms — with tri agreement
        # 1.00000 (it falls back to the argsort internally when the active
        # set fits the list, so small scenes are unchanged)
        sel = (
            "topk"
            if cfg.dense_schedule_select == "auto"
            else cfg.dense_schedule_select
        )
        # sorting pays only when there are chunks to cull; cfg.incoherent_sort
        # picks the recovery strategy ('none' keeps pixel-order screen
        # blocks and relies on the box-distance ordered early exit)
        if (
            not coherent
            and cfg.incoherent_impl == "wavefront"
            and not prec.is_f32
            and fb == "mxu3"
            and frame.dense_chunk_lo is not None
            # below wavefront_min_tris the anchor-sorted tile path wins
            # outright (measured — see config.py); above it the wavefront
            and ti > max(4 * TC, cfg.wavefront_min_tris)
            and ti <= cfg.packet_bvh_max_tris  # HBM-streamed table band
        ):
            from low_precision_raytracer_tpu.ops.wavefront import (
                trace_rays_wavefront,
            )

            return trace_rays_wavefront(
                scene,
                frame,
                origins,
                directions,
                prec=prec,
                skip_tri=skip_tri,
                min_dist=min_dist,
                max_dist=max_dist,
                find_any=find_any,
                interpret=interpret,
                mode=cfg.wavefront_mode,
            )
        if (
            not coherent
            and len(frame.obj_layout) > 1
            and ti > 4 * TC
            and cfg.incoherent_sort != "none"
        ):
            # Measured hard limit (v5e, 2026-08-19, BASELINE.md): at 2M
            # instance-tris the tile path's overflow sweep can run for
            # minutes inside one kernel and trip the TPU watchdog, killing
            # the worker.  The wavefront path completes there (6.3 s) —
            # refuse the user-reachable crash instead of launching it.
            if ti > (1 << 20) and jax.default_backend() == "tpu":
                raise ValueError(
                    f"incoherent tile path refused at {ti} instance-"
                    "triangles (> 2^20): its overflow sweep trips the TPU "
                    "watchdog at this scale (BASELINE.md round-3 "
                    "measurements). Use incoherent_impl='wavefront' (the "
                    "default) for incoherent launches on scenes this size."
                )
            return trace_rays_dense_pallas_sorted(
                scene,
                frame,
                origins,
                directions,
                prec=prec,
                fallback=fb,
                skip_tri=skip_tri,
                min_dist=min_dist,
                max_dist=max_dist,
                find_any=find_any,
                interpret=interpret,
                stream=stream,
                key_mode=cfg.incoherent_sort,
                epilogue=ep,
                select=sel,
            )
        return trace_rays_dense_pallas(
            scene,
            frame,
            origins,
            directions,
            prec=prec,
            fallback=fb,
            skip_tri=skip_tri,
            min_dist=min_dist,
            max_dist=max_dist,
            find_any=find_any,
            tile_hw=(cfg.height, cfg.width),
            interpret=interpret,
            stream=stream,
            epilogue=ep,
            select=sel,
            di_lights=di_lights,
        )
    if impl == "dense":
        return trace_rays_dense(
            scene,
            frame,
            origins,
            directions,
            prec=prec,
            fallback=resolve_fallback(cfg.triangle_fallback, prec, "dense"),
            skip_tri=skip_tri,
            min_dist=min_dist,
            max_dist=max_dist,
            find_any=find_any,
        )
    if impl == "pallas":
        import jax

        from low_precision_raytracer_tpu.ops.traversal_pallas import trace_rays_pallas

        # the morton sort only pays once the leaf set is large enough that
        # incoherent packets would otherwise touch many leaves each
        ti = _instance_tris(frame)
        return trace_rays_pallas(
            scene,
            frame,
            origins,
            directions,
            prec=prec,
            find_any=find_any,
            fallback=resolve_fallback(cfg.triangle_fallback, prec, "pallas"),
            skip_tri=skip_tri,
            min_dist=min_dist,
            max_dist=max_dist,
            tile_hw=(cfg.height, cfg.width),
            coherent=coherent or len(frame.obj_layout) <= 1 or ti <= 4096,
            interpret=jax.default_backend() == "cpu",
        )
    return trace_rays(
        scene,
        frame,
        origins,
        directions,
        prec=prec,
        find_any=find_any,
        fallback=resolve_fallback(cfg.triangle_fallback, prec, "jax"),
        leaf_size=cfg.bvh_leaf_size,
        skip_tri=skip_tri,
        min_dist=min_dist,
        max_dist=max_dist,
    )
