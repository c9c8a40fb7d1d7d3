"""Per-ray wavefront launch (ops/wavefront.py) vs the tile-path kernel.

All interpret mode on CPU.  The oracle is the unsorted exact dense kernel
with the same mxu3 triangle test — the wavefront must reproduce its hits
up to cross-chunk exact-t tie ordering.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from low_precision_raytracer_tpu.config import get_precision
from low_precision_raytracer_tpu.models.hierarchy import build_flat_scene
from low_precision_raytracer_tpu.models.procedural import sponza_like_scene
from low_precision_raytracer_tpu.models.scene import (
    build_scene_arrays,
    frame_input_from_flat,
)
from low_precision_raytracer_tpu.ops.camera import primary_ray_grid
from low_precision_raytracer_tpu.ops.dense_pallas import trace_rays_dense_pallas
from low_precision_raytracer_tpu.ops.wavefront import trace_rays_wavefront


def _setup(res=(16, 128)):
    prec = get_precision("bf16")
    host = sponza_like_scene(pillar_grid=2, sphere_subdiv=1, with_skybox=False)
    scene = build_scene_arrays(host, prec, leaf_size=4)
    flat = build_flat_scene(host.root, host.active_camera)
    frame = frame_input_from_flat(flat, host, prec)
    h, w = res
    o, d = primary_ray_grid(frame.cam_l2w, flat.cam_fov_y, w, h, prec.dtype)
    return prec, scene, frame, o.reshape(-1, 3), d.reshape(-1, 3)


def _bounce_rays(prec, scene, frame, o, d, key=7):
    """Hemisphere-scattered rays from primary hit points (the production
    incoherent launch shape)."""
    hit = trace_rays_dense_pallas(
        scene, frame, o, d, prec=prec, cull=True, tile_hw=None, interpret=True
    )
    t32 = hit.t.astype(jnp.float32)
    live = hit.tri >= 0
    pos = (o.astype(jnp.float32) + t32[:, None] * d.astype(jnp.float32))
    rnd = jax.random.normal(jax.random.PRNGKey(key), (o.shape[0], 3), jnp.float32)
    bd = rnd / jnp.linalg.norm(rnd, axis=-1, keepdims=True)
    maxd = jnp.where(live, 1e5, 0.0).astype(jnp.float32)
    return pos.astype(prec.dtype), bd.astype(prec.dtype), maxd


def _agree(ref, wf, tol=1e-6):
    np.testing.assert_array_equal(
        np.asarray(ref.tri) >= 0, np.asarray(wf.tri) >= 0
    )
    same = np.asarray(ref.tri) == np.asarray(wf.tri)
    assert same.mean() > 0.999, f"tri agreement {same.mean()}"
    both = same & (np.asarray(ref.tri) >= 0)
    np.testing.assert_allclose(
        np.asarray(ref.t)[both], np.asarray(wf.t)[both], rtol=tol, atol=tol
    )
    np.testing.assert_array_equal(
        np.asarray(ref.obj)[both], np.asarray(wf.obj)[both]
    )


@pytest.mark.parametrize("mode", ["rounds", "oneshot"])
def test_wavefront_matches_dense_primary(mode):
    """Scrambled primary rays (multi-chunk scene, 42 chunks)."""
    prec, scene, frame, o, d = _setup()
    perm = jax.random.permutation(jax.random.PRNGKey(3), o.shape[0])
    o, d = o[perm], d[perm]
    ref = trace_rays_dense_pallas(
        scene, frame, o, d, prec=prec, fallback="mxu3", cull=True,
        tile_hw=None, interpret=True,
    )
    wf = trace_rays_wavefront(scene, frame, o, d, prec=prec, interpret=True, mode=mode)
    _agree(ref, wf)


@pytest.mark.parametrize("mode", ["rounds", "oneshot"])
def test_wavefront_matches_dense_bounce(mode):
    """Hemisphere bounce rays with per-lane maxd (dead lanes included)."""
    prec, scene, frame, o, d = _setup()
    bo, bd, maxd = _bounce_rays(prec, scene, frame, o, d)
    ref = trace_rays_dense_pallas(
        scene, frame, bo, bd, prec=prec, fallback="mxu3", cull=True,
        tile_hw=None, interpret=True, min_dist=0.1, max_dist=maxd,
    )
    wf = trace_rays_wavefront(
        scene, frame, bo, bd, prec=prec, interpret=True, mode=mode,
        min_dist=0.1, max_dist=maxd,
    )
    _agree(ref, wf)
    # dead lanes stay dead
    dead = np.asarray(maxd) == 0.0
    assert (np.asarray(wf.tri)[dead] == -1).all()


@pytest.mark.parametrize("mode", ["rounds", "oneshot"])
def test_wavefront_find_any(mode):
    """Any-hit launches: occlusion mask must match the tile path's."""
    prec, scene, frame, o, d = _setup()
    bo, bd, maxd = _bounce_rays(prec, scene, frame, o, d, key=11)
    maxd = jnp.minimum(maxd, 6.0)
    ref = trace_rays_dense_pallas(
        scene, frame, bo, bd, prec=prec, fallback="mxu3", cull=True,
        tile_hw=None, interpret=True, find_any=True,
        min_dist=0.1, max_dist=maxd,
    )
    wf = trace_rays_wavefront(
        scene, frame, bo, bd, prec=prec, interpret=True, find_any=True,
        mode=mode, min_dist=0.1, max_dist=maxd,
    )
    np.testing.assert_array_equal(
        np.asarray(ref.tri) >= 0, np.asarray(wf.tri) >= 0
    )


def test_wavefront_overflow_sweep(monkeypatch):
    """Starve the candidate list (K=2, one round) so most rays resolve via
    the fallback sweep — results must still match."""
    import low_precision_raytracer_tpu.ops.wavefront as WF

    monkeypatch.setattr(WF, "K_CAND", 2)
    monkeypatch.setattr(WF, "N_ROUNDS", 1)
    jax.clear_caches()  # module-constant changes don't invalidate jit caches
    prec, scene, frame, o, d = _setup()
    perm = jax.random.permutation(jax.random.PRNGKey(5), o.shape[0])
    o, d = o[perm], d[perm]
    ref = trace_rays_dense_pallas(
        scene, frame, o, d, prec=prec, fallback="mxu3", cull=True,
        tile_hw=None, interpret=True,
    )
    wf = WF.trace_rays_wavefront(scene, frame, o, d, prec=prec, interpret=True)
    _agree(ref, wf)


@pytest.mark.parametrize("mode", ["rounds", "oneshot"])
def test_wavefront_skip_tri(mode):
    """skip_tri threading: re-tracing from hit points with the hit triangle
    skipped must not re-hit it at zero distance."""
    prec, scene, frame, o, d = _setup()
    hit = trace_rays_dense_pallas(
        scene, frame, o, d, prec=prec, fallback="mxu3", cull=True,
        tile_hw=None, interpret=True,
    )
    live = hit.tri >= 0
    t32 = hit.t.astype(jnp.float32)
    pos = (o.astype(jnp.float32) + t32[:, None] * d.astype(jnp.float32))
    maxd = jnp.where(live, 1e5, 0.0).astype(jnp.float32)
    wf = trace_rays_wavefront(
        scene, frame, pos.astype(prec.dtype), d, prec=prec, interpret=True,
        mode=mode, skip_tri=hit.tri, max_dist=maxd,
    )
    re_hit = np.asarray(wf.tri) == np.asarray(hit.tri)
    near = np.asarray(wf.t) < 1e-3
    assert not (re_hit & near & np.asarray(live)).any()


def test_wavefront_grouped_and_streamed(monkeypatch):
    """Group granularity (s_group > 1) and the HBM-streamed table must
    reproduce the resident chunk-granularity results exactly — forced on
    the small scene by shrinking the thresholds."""
    import low_precision_raytracer_tpu.ops.wavefront as WF

    prec, scene, frame, o, d = _setup()
    perm = jax.random.permutation(jax.random.PRNGKey(9), o.shape[0])
    o, d = o[perm], d[perm]
    ref = WF.trace_rays_wavefront(scene, frame, o, d, prec=prec, interpret=True)

    monkeypatch.setattr(WF, "GROUP_WIDTH", 8)      # 42 chunks -> 6-chunk groups
    monkeypatch.setattr(WF, "RESIDENT_BYTES", 1)   # force streaming
    jax.clear_caches()  # module-constant changes don't invalidate jit caches
    grp = WF.trace_rays_wavefront(scene, frame, o, d, prec=prec, interpret=True)
    _agree(ref, grp)


def test_wavefront_second_cycle(monkeypatch):
    """Candidate-refill cycle: starve K so the first cycle overflows, force
    a second schedule cycle, and require exact agreement without leaning on
    the fallback sweep (N_ROUNDS covers K per cycle)."""
    import low_precision_raytracer_tpu.ops.wavefront as WF

    monkeypatch.setattr(WF, "K_CAND", 4)
    monkeypatch.setattr(WF, "N_ROUNDS", 1)
    monkeypatch.setattr(WF, "CYCLE2_MIN_GROUPS", 1)  # always 2 cycles
    jax.clear_caches()  # module-constant changes don't invalidate jit caches
    prec, scene, frame, o, d = _setup()
    perm = jax.random.permutation(jax.random.PRNGKey(13), o.shape[0])
    o, d = o[perm], d[perm]
    ref = trace_rays_dense_pallas(
        scene, frame, o, d, prec=prec, fallback="mxu3", cull=True,
        tile_hw=None, interpret=True,
    )
    wf = WF.trace_rays_wavefront(scene, frame, o, d, prec=prec, interpret=True)
    _agree(ref, wf)


def test_wavefront_fp16():
    """fp16 render dtype through the wavefront (the mxu3 bf16x3 dot widens
    fp16 rays/coefficients identically — hits must match the fp16 tile
    path)."""
    prec16 = get_precision("fp16")
    host = sponza_like_scene(pillar_grid=2, sphere_subdiv=1, with_skybox=False)
    scene = build_scene_arrays(host, prec16, leaf_size=4)
    flat = build_flat_scene(host.root, host.active_camera)
    frame = frame_input_from_flat(flat, host, prec16)
    o, d = primary_ray_grid(frame.cam_l2w, flat.cam_fov_y, 128, 16, prec16.dtype)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    perm = jax.random.permutation(jax.random.PRNGKey(21), o.shape[0])
    o, d = o[perm], d[perm]
    ref = trace_rays_dense_pallas(
        scene, frame, o, d, prec=prec16, fallback="mxu3", cull=True,
        tile_hw=None, interpret=True,
    )
    wf = trace_rays_wavefront(scene, frame, o, d, prec=prec16, interpret=True)
    _agree(ref, wf)


@pytest.mark.parametrize("mode", ["rounds", "oneshot"])
def test_wavefront_matches_fp64_oracle(mode):
    """Independent oracle (fp64 brute force), not just the sibling kernel:
    catches modes both Pallas paths could share."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from oracle import brute_force_trace

    prec = get_precision("bf16")
    host = sponza_like_scene(pillar_grid=2, sphere_subdiv=1, with_skybox=False)
    scene = build_scene_arrays(host, prec, leaf_size=4)
    flat = build_flat_scene(host.root, host.active_camera)
    frame = frame_input_from_flat(flat, host, prec)
    o, d = primary_ray_grid(frame.cam_l2w, flat.cam_fov_y, 128, 16, prec.dtype)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    perm = jax.random.permutation(jax.random.PRNGKey(17), o.shape[0])
    o, d = o[perm], d[perm]
    wf = trace_rays_wavefront(scene, frame, o, d, prec=prec, interpret=True, mode=mode)
    want = brute_force_trace(
        flat, host.meshes, np.asarray(o, np.float64), np.asarray(d, np.float64)
    )
    got_hit = np.asarray(wf.tri) >= 0
    assert (got_hit == want["hit"]).mean() > 0.995
    both = got_hit & want["hit"]
    same = np.asarray(wf.tri)[both] == want["tri"][both]
    assert same.mean() > 0.98
    t_err = np.abs(np.asarray(wf.t)[both][same] - want["t"][both][same])
    assert np.quantile(t_err, 0.95) < 0.03


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_wavefront_random_rays_property(seed):
    """Property sweep: random origins (inside and outside the scene AABB),
    random directions, random per-lane max_dist — hit masks and winning
    triangles must match the exact dense kernel."""
    prec, scene, frame, o, d = _setup()
    key = jax.random.PRNGKey(100 + seed)
    k1, k2, k3 = jax.random.split(key, 3)
    R = 2048
    lo = jnp.min(frame.obj_aabb_lo, axis=0)
    hi = jnp.max(frame.obj_aabb_hi, axis=0)
    span = hi - lo
    ro = lo - 0.5 * span + jax.random.uniform(k1, (R, 3)) * 2.0 * span
    rd = jax.random.normal(k2, (R, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    maxd = jax.random.uniform(k3, (R,)) * 30.0
    ro = ro.astype(prec.dtype)
    rd = rd.astype(prec.dtype)
    ref = trace_rays_dense_pallas(
        scene, frame, ro, rd, prec=prec, fallback="mxu3", cull=True,
        tile_hw=None, interpret=True, max_dist=maxd,
    )
    wf = trace_rays_wavefront(
        scene, frame, ro, rd, prec=prec, interpret=True, max_dist=maxd,
    )
    _agree(ref, wf)
