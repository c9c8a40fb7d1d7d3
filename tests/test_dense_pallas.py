"""Pallas dense kernel (interpret mode on CPU) vs the XLA dense backend."""

import jax
import numpy as np
import pytest

from low_precision_raytracer_tpu.config import get_precision
from low_precision_raytracer_tpu.models.hierarchy import build_flat_scene
from low_precision_raytracer_tpu.models.procedural import cornell_box_scene, sponza_like_scene
from low_precision_raytracer_tpu.models.scene import build_scene_arrays, frame_input_from_flat
from low_precision_raytracer_tpu.ops.camera import primary_ray_grid
from low_precision_raytracer_tpu.ops.dense import trace_rays_dense
from low_precision_raytracer_tpu.ops.dense_pallas import (
    from_blocks,
    to_blocks,
    trace_rays_dense_pallas,
)


def _setup(host, prec_name="fp32", res=(16, 128)):
    prec = get_precision(prec_name)
    scene = build_scene_arrays(host, prec, leaf_size=4)
    flat = build_flat_scene(host.root, host.active_camera)
    frame = frame_input_from_flat(flat, host, prec)
    h, w = res
    o, d = primary_ray_grid(frame.cam_l2w, flat.cam_fov_y, w, h, prec.dtype)
    return prec, scene, frame, o.reshape(-1, 3), d.reshape(-1, 3), (h, w)


def test_block_reorder_roundtrip():
    import jax.numpy as jnp

    H, W = 16, 128
    x = jnp.arange(H * W * 3, dtype=jnp.float32).reshape(H * W, 3)
    np.testing.assert_array_equal(
        np.asarray(from_blocks(to_blocks(x, H, W), H, W)), np.asarray(x)
    )


@pytest.mark.parametrize("cull", [False, True])
def test_pallas_interpret_matches_xla_cornell(cull):
    prec, scene, frame, o, d, hw = _setup(cornell_box_scene())
    hx = trace_rays_dense(scene, frame, o, d, prec=prec)
    hp = trace_rays_dense_pallas(
        scene, frame, o, d, prec=prec, cull=cull, tile_hw=hw, interpret=True
    )
    same = np.asarray(hx.tri) == np.asarray(hp.tri)
    assert same.mean() > 0.995, f"tri agreement {same.mean()}"
    both = same & (np.asarray(hx.tri) >= 0)
    np.testing.assert_allclose(
        np.asarray(hx.t)[both], np.asarray(hp.t)[both], rtol=1e-4, atol=1e-4
    )


def test_pallas_interpret_culled_sponza():
    """Multi-object scene: the compacted-chunk path must agree with XLA."""
    host = sponza_like_scene(pillar_grid=2, sphere_subdiv=1, with_skybox=False)
    prec, scene, frame, o, d, hw = _setup(host)
    hx = trace_rays_dense(scene, frame, o, d, prec=prec)
    hp = trace_rays_dense_pallas(
        scene, frame, o, d, prec=prec, cull=True, tile_hw=hw, interpret=True
    )
    same = np.asarray(hx.tri) == np.asarray(hp.tri)
    assert same.mean() > 0.99, f"tri agreement {same.mean()}"
    # misses agree too (culling must not create false misses)
    np.testing.assert_array_equal(
        np.asarray(hx.tri) >= 0, np.asarray(hp.tri) >= 0
    )


def test_pallas_sorted_matches_plain_sponza():
    """Morton-sorted incoherent launch must return the same hits as the
    plain launch (up to exact-t tie ordering across chunks)."""
    import jax
    import jax.numpy as jnp

    from low_precision_raytracer_tpu.ops.dense_pallas import (
        trace_rays_dense_pallas_sorted,
    )

    host = sponza_like_scene(pillar_grid=2, sphere_subdiv=1, with_skybox=False)
    prec, scene, frame, o, d, hw = _setup(host)
    # scramble ray order to simulate an incoherent bounce launch
    perm = jax.random.permutation(jax.random.PRNGKey(11), o.shape[0])
    o, d = o[perm], d[perm]
    hp = trace_rays_dense_pallas(
        scene, frame, o, d, prec=prec, cull=True, tile_hw=None, interpret=True
    )
    hs = trace_rays_dense_pallas_sorted(
        scene, frame, o, d, prec=prec, interpret=True
    )
    same = np.asarray(hp.tri) == np.asarray(hs.tri)
    assert same.mean() > 0.999, f"tri agreement {same.mean()}"
    # sorting must not create or destroy hits
    np.testing.assert_array_equal(
        np.asarray(hp.tri) >= 0, np.asarray(hs.tri) >= 0
    )
    both = same & (np.asarray(hp.tri) >= 0)
    np.testing.assert_allclose(
        np.asarray(hp.t)[both], np.asarray(hs.t)[both], rtol=1e-4, atol=1e-4
    )


def test_pallas_streamed_matches_resident():
    """HBM-streamed coefficient table (large-scene mode) must match the
    VMEM-resident kernel exactly."""
    host = sponza_like_scene(pillar_grid=2, sphere_subdiv=1, with_skybox=False)
    prec, scene, frame, o, d, hw = _setup(host)
    hr = trace_rays_dense_pallas(
        scene, frame, o, d, prec=prec, cull=True, tile_hw=hw, interpret=True
    )
    hs = trace_rays_dense_pallas(
        scene, frame, o, d, prec=prec, cull=True, tile_hw=hw, interpret=True,
        stream=True,
    )
    np.testing.assert_array_equal(np.asarray(hr.tri), np.asarray(hs.tri))
    np.testing.assert_allclose(
        np.asarray(hr.t), np.asarray(hs.t), rtol=1e-5, atol=1e-5
    )


def test_mxu3_matches_fp32_oracle():
    """'mxu3' (bf16, single bf16x3 MXU test, no band): hits must agree with
    the fp32 XLA dense path on ~every lane — the mode's whole claim is that
    the bf16x3 dot is f32-grade.  Also: fp32 + 'mxu3' silently resolves to
    'both' (no Aab slab exists to skip there)."""
    prec16, scene16, frame16, o16, d16, hw = _setup(
        cornell_box_scene(), prec_name="bf16"
    )
    h3 = trace_rays_dense_pallas(
        scene16, frame16, o16, d16, prec=prec16, fallback="mxu3",
        tile_hw=hw, interpret=True,
    )
    prec32, scene32, frame32, o32, d32, _ = _setup(cornell_box_scene())
    # SAME rays as the bf16 launch (bf16-quantized, cast up): the mode's
    # claim is about the intersection math, not the ray generation dtype
    import jax.numpy as jnp

    h32 = trace_rays_dense(
        scene32, frame32, o16.astype(jnp.float32), d16.astype(jnp.float32),
        prec=prec32,
    )
    tri3 = np.asarray(h3.tri)
    tri32 = np.asarray(h32.tri)
    assert np.mean(tri3 == tri32) > 0.999
    same = tri3 == tri32
    # t from the fp32 shadow z-row: close to the fp32 path everywhere
    t3 = np.asarray(h3.t)[same & (tri3 >= 0)]
    t32 = np.asarray(h32.t)[same & (tri3 >= 0)]
    np.testing.assert_allclose(t3, t32, rtol=2e-3, atol=2e-3)

    h_fb = trace_rays_dense_pallas(
        scene32, frame32, o32, d32, prec=prec32, fallback="mxu3",
        tile_hw=hw, interpret=True,
    )
    h_both = trace_rays_dense_pallas(
        scene32, frame32, o32, d32, prec=prec32, fallback="both",
        tile_hw=hw, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(h_fb.tri), np.asarray(h_both.tri))


def test_mxu3_multichunk_sponza():
    """mxu3 through the multi-chunk scheduling path (chunk lists, ordered
    early exit) — the single-chunk Cornell case above doesn't exercise it.
    Oracle: the fp32 XLA dense path on the same (bf16-quantized) rays.
    Measured here: mxu3 matches it on >99.9% of lanes where 'both' (bf16
    decisions outside the band) manages only ~96.6% — the mode is strictly
    more accurate, not just faster."""
    import jax.numpy as jnp

    prec, scene, frame, o, d, hw = _setup(
        sponza_like_scene(), prec_name="bf16", res=(16, 128)
    )
    h3 = trace_rays_dense_pallas(
        scene, frame, o, d, prec=prec, fallback="mxu3", tile_hw=hw,
        interpret=True,
    )
    p32, s32, f32, _, _, _ = _setup(sponza_like_scene())
    h32 = trace_rays_dense(
        s32, f32, o.astype(jnp.float32), d.astype(jnp.float32), prec=p32
    )
    assert np.mean(np.asarray(h3.tri) == np.asarray(h32.tri)) > 0.999


def test_chunk_predicates_without_object_test_are_superset():
    """Scenes with >512 objects skip the serial per-object lax.map and cull
    on chunk AABBs alone; that set must be a conservative superset of the
    combined (object & chunk) predicate set with identical entry
    distances, so the kernel walk stays correct (just less tightly
    culled)."""
    import jax.numpy as jnp

    from low_precision_raytracer_tpu.ops.dense_pallas import (
        TR,
        _chunk_predicates,
        to_blocks,
    )

    host = sponza_like_scene(pillar_grid=2, sphere_subdiv=1, with_skybox=False)
    prec, scene, frame, o, d, hw = _setup(host)
    r = o.shape[0]
    pad = (-r) % TR
    o = jnp.pad(to_blocks(o, *hw), ((0, pad), (0, 0)))
    d = jnp.pad(to_blocks(d, *hw), ((0, pad), (0, 0)), constant_values=1.0)
    grid = (r + pad) // TR
    mind = jnp.zeros((r + pad,), jnp.float32)
    maxd = jnp.where(jnp.arange(r + pad) < r, 1e5, 0.0).astype(jnp.float32)
    from low_precision_raytracer_tpu.ops.dense_pallas import TC

    r_pad = frame.dense_chunk_lo.shape[0] * TC
    both_act, both_t = _chunk_predicates(
        frame, o, d, mind, maxd, grid, r_pad, obj_test=True
    )
    chunk_act, chunk_t = _chunk_predicates(
        frame, o, d, mind, maxd, grid, r_pad, obj_test=False
    )
    both_act = np.asarray(both_act).astype(bool)
    chunk_act = np.asarray(chunk_act).astype(bool)
    assert (chunk_act | ~both_act).all(), "chunk-only set must cover obj&chunk"
    np.testing.assert_array_equal(np.asarray(both_t), np.asarray(chunk_t))


def test_overflow_sweep_matches_xla(monkeypatch):
    """Tiles whose active-chunk set exceeds the list cap must still find
    every hit: the ordered prefix + t_cut-gated sweep replaces the old
    run-everything overflow encoding."""
    import low_precision_raytracer_tpu.ops.dense_pallas as DP

    host = sponza_like_scene(pillar_grid=2, sphere_subdiv=1, with_skybox=False)
    prec, scene, frame, o, d, hw = _setup(host)
    n_chunks = frame.dense_chunk_lo.shape[0]
    assert n_chunks > 1  # the cap below must actually overflow
    monkeypatch.setattr(DP, "MAXC", 1)
    hx = trace_rays_dense_pallas(
        scene, frame, o, d, prec=prec, cull=True, tile_hw=hw, interpret=True
    )
    monkeypatch.undo()
    href = trace_rays_dense(scene, frame, o, d, prec=prec)
    np.testing.assert_array_equal(
        np.asarray(hx.tri) >= 0, np.asarray(href.tri) >= 0
    )
    same = np.asarray(hx.tri) == np.asarray(href.tri)
    assert same.mean() > 0.99, f"tri agreement {same.mean()}"


def test_many_objects_route_and_trace():
    """>512-object scenes must route to the dense Pallas backend (the old
    cliff fell to the 0.006 Mrays/s walk) and trace correctly with the
    chunk-only cull."""
    import numpy as np2

    from low_precision_raytracer_tpu.models.hierarchy import CameraObject
    from low_precision_raytracer_tpu.models.materials import Material
    from low_precision_raytracer_tpu.models.procedural import (
        _mesh_node,
        cube_mesh,
    )
    from low_precision_raytracer_tpu.models.scene import HostScene

    scene_h = HostScene()
    cube = scene_h.add_mesh(cube_mesh(0.4))
    mat = scene_h.add_material(Material(color=np2.array([0.7, 0.7, 0.7], np2.float32)))
    rng = np2.random.default_rng(0)
    n_obj = 530
    for k in range(n_obj):
        t = rng.uniform(-6, 6, 3).astype(np2.float32)
        t[2] -= 10
        scene_h.root.add(_mesh_node(scene_h, cube, mat, f"cube{k}", t=t))
    cam = CameraObject(name="cam", fov_y=np2.pi / 3)
    scene_h.root.add(cam)
    scene_h.active_camera = cam

    prec, scene, frame, o, d, hw = _setup(scene_h)
    assert len(frame.obj_layout) > 512
    assert frame.dense_chunk_lo is not None  # tables built past 512 objects

    from low_precision_raytracer_tpu.config import RenderConfig
    from low_precision_raytracer_tpu.ops.trace import resolve_impl

    cfg = RenderConfig(width=hw[1], height=hw[0])
    # routing is TPU-gated; assert the CPU-visible invariant instead: the
    # backend the TPU branch would pick must trace correctly here
    assert resolve_impl(scene, frame, cfg) in ("dense", "jax")  # cpu fallback
    hx = trace_rays_dense(scene, frame, o, d, prec=prec)
    hp = trace_rays_dense_pallas(
        scene, frame, o, d, prec=prec, cull=True, tile_hw=hw, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(hx.tri) >= 0, np.asarray(hp.tri) >= 0
    )
    same = np.asarray(hx.tri) == np.asarray(hp.tri)
    assert same.mean() > 0.99, f"tri agreement {same.mean()}"


@pytest.mark.parametrize("scene_kind", ["cornell", "sponza"])
def test_pack_epilogue_matches_reduce5(scene_kind):
    """'pack' chunk epilogue (3 reductions + outside row decode) vs the
    exact 'reduce5' epilogue: identical hit masks, exact-equal t on agreeing
    lanes, tri/obj agreement everywhere except sub-truncation-window t ties,
    u/v within the 1/16384 quantization step."""
    host = (
        cornell_box_scene()
        if scene_kind == "cornell"
        else sponza_like_scene(pillar_grid=2, sphere_subdiv=1, with_skybox=False)
    )
    prec, scene, frame, o, d, hw = _setup(host, prec_name="bf16")
    kw = dict(prec=prec, fallback="mxu3", cull=True, tile_hw=hw, interpret=True)
    h5 = trace_rays_dense_pallas(scene, frame, o, d, epilogue="reduce5", **kw)
    hp = trace_rays_dense_pallas(scene, frame, o, d, epilogue="pack", **kw)
    np.testing.assert_array_equal(
        np.asarray(h5.tri) >= 0, np.asarray(hp.tri) >= 0
    )
    same = np.asarray(h5.tri) == np.asarray(hp.tri)
    assert same.mean() > 0.999, f"tri agreement {same.mean()}"
    both = same & (np.asarray(h5.tri) >= 0)
    # winner t is extracted exactly (not truncated) in pack mode
    np.testing.assert_allclose(
        np.asarray(h5.t)[both], np.asarray(hp.t)[both], rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(h5.obj)[both], np.asarray(hp.obj)[both]
    )
    for a, b in ((h5.u, hp.u), (h5.v, hp.v)):
        err = np.abs(np.asarray(a)[both] - np.asarray(b)[both])
        assert err.max() <= 1.0 / 16384 + 1e-6, f"uv quantization {err.max()}"


def test_pack_epilogue_fp32_falls_back():
    """fp32 render mode keeps exact reference semantics: 'pack' silently
    resolves to the full epilogue (bit-identical outputs)."""
    prec, scene, frame, o, d, hw = _setup(cornell_box_scene())
    h5 = trace_rays_dense_pallas(
        scene, frame, o, d, prec=prec, tile_hw=hw, interpret=True
    )
    hp = trace_rays_dense_pallas(
        scene, frame, o, d, prec=prec, tile_hw=hw, interpret=True,
        epilogue="pack",
    )
    np.testing.assert_array_equal(np.asarray(h5.tri), np.asarray(hp.tri))
    np.testing.assert_array_equal(np.asarray(h5.u), np.asarray(hp.u))


def test_pack_epilogue_find_any_shadows():
    """Any-hit (shadow) launches through the packed epilogue: the hit mask
    must match the full epilogue's (occlusion is a boolean — tie-breaking
    differences cannot change it)."""
    import jax.numpy as jnp

    host = sponza_like_scene(pillar_grid=2, sphere_subdiv=1, with_skybox=False)
    prec, scene, frame, o, d, hw = _setup(host, prec_name="bf16")
    kw = dict(
        prec=prec, fallback="mxu3", cull=True, tile_hw=hw, interpret=True,
        find_any=True, min_dist=0.01, max_dist=50.0,
    )
    h5 = trace_rays_dense_pallas(scene, frame, o, d, epilogue="reduce5", **kw)
    hp = trace_rays_dense_pallas(scene, frame, o, d, epilogue="pack", **kw)
    np.testing.assert_array_equal(
        np.asarray(h5.tri) >= 0, np.asarray(hp.tri) >= 0
    )


def test_anchor_sorted_matches_plain():
    """'anchor' incoherent key (exact per-ray nearest-chunk + direction
    bits) must return the same hits as the unsorted launch."""
    import jax

    from low_precision_raytracer_tpu.ops.dense_pallas import (
        trace_rays_dense_pallas_sorted,
    )

    host = sponza_like_scene(pillar_grid=2, sphere_subdiv=1, with_skybox=False)
    prec, scene, frame, o, d, hw = _setup(host)
    perm = jax.random.permutation(jax.random.PRNGKey(7), o.shape[0])
    o, d = o[perm], d[perm]
    hp = trace_rays_dense_pallas(
        scene, frame, o, d, prec=prec, cull=True, tile_hw=None, interpret=True
    )
    ha = trace_rays_dense_pallas_sorted(
        scene, frame, o, d, prec=prec, interpret=True, key_mode="anchor"
    )
    same = np.asarray(hp.tri) == np.asarray(ha.tri)
    assert same.mean() > 0.999, f"tri agreement {same.mean()}"
    np.testing.assert_array_equal(
        np.asarray(hp.tri) >= 0, np.asarray(ha.tri) >= 0
    )
    both = same & (np.asarray(hp.tri) >= 0)
    np.testing.assert_allclose(
        np.asarray(hp.t)[both], np.asarray(ha.t)[both], rtol=1e-4, atol=1e-4
    )


def test_topk_select_matches_sort(monkeypatch):
    """'topk' chunk-list selection (exact nearest-(take+1) via lax.top_k)
    must agree with the full argsort: same hit set, same t, tri differing
    only on equal-entry-bound tiebreaks.  MAXC is pinned small so the
    selection actually truncates (n_chunks > take) and the t_cut overflow
    path is exercised under both selectors."""
    import low_precision_raytracer_tpu.ops.dense_pallas as DP

    host = sponza_like_scene(pillar_grid=2, sphere_subdiv=1, with_skybox=False)
    prec, scene, frame, o, d, hw = _setup(host)
    n_chunks = frame.dense_chunk_lo.shape[0]
    assert n_chunks > 2  # the cap below must actually truncate
    # MAXC is read at trace time but jit caches on (shapes, static args);
    # drop any entries traced by earlier tests under the default MAXC
    trace_rays_dense_pallas.clear_cache()
    monkeypatch.setattr(DP, "MAXC", 2)
    hs = trace_rays_dense_pallas(
        scene, frame, o, d, prec=prec, cull=True, tile_hw=hw, interpret=True,
        select="sort",
    )
    ht = trace_rays_dense_pallas(
        scene, frame, o, d, prec=prec, cull=True, tile_hw=hw, interpret=True,
        select="topk",
    )
    monkeypatch.undo()
    trace_rays_dense_pallas.clear_cache()
    np.testing.assert_array_equal(
        np.asarray(hs.tri) >= 0, np.asarray(ht.tri) >= 0
    )
    same = np.asarray(hs.tri) == np.asarray(ht.tri)
    assert same.mean() > 0.999, f"tri agreement {same.mean()}"
    both = same & (np.asarray(hs.tri) >= 0)
    np.testing.assert_allclose(
        np.asarray(hs.t)[both], np.asarray(ht.t)[both], rtol=1e-5, atol=1e-5
    )
    # and against the XLA oracle backend, full equality of the hit mask
    href = trace_rays_dense(scene, frame, o, d, prec=prec)
    np.testing.assert_array_equal(
        np.asarray(ht.tri) >= 0, np.asarray(href.tri) >= 0
    )


def test_any_epilogue_matches_closest_occlusion():
    """find_any launches now use the 1-reduction any-hit epilogue; its
    occlusion mask must equal the closest-hit launch's (a blocker exists
    within (mind, maxd) iff the closest hit does)."""
    host = sponza_like_scene(pillar_grid=2, sphere_subdiv=1, with_skybox=False)
    prec, scene, frame, o, d, hw = _setup(host, prec_name="bf16")
    kw = dict(
        prec=prec, fallback="mxu3", cull=True, tile_hw=hw, interpret=True,
        min_dist=0.01, max_dist=50.0,
    )
    ha = trace_rays_dense_pallas(scene, frame, o, d, find_any=True, **kw)
    hc = trace_rays_dense_pallas(scene, frame, o, d, find_any=False, **kw)
    np.testing.assert_array_equal(
        np.asarray(ha.tri) >= 0, np.asarray(hc.tri) >= 0
    )
    # the any-hit t is still a real accept distance: never closer than the
    # true closest hit, never beyond the cap
    hit = np.asarray(ha.tri) >= 0
    assert (np.asarray(ha.t)[hit] >= np.asarray(hc.t)[hit] - 1e-4).all()
    assert (np.asarray(ha.t)[hit] < 50.0).all()
