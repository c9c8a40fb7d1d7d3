"""Packet BVH traversal kernel (interpret mode on CPU) vs the XLA dense
backend and the fp64 brute-force oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from low_precision_raytracer_tpu.config import get_precision
from low_precision_raytracer_tpu.models.hierarchy import build_flat_scene
from low_precision_raytracer_tpu.models.procedural import (
    cornell_box_scene,
    sponza_like_scene,
)
from low_precision_raytracer_tpu.models.scene import (
    build_scene_arrays,
    frame_input_from_flat,
)
from low_precision_raytracer_tpu.ops.camera import primary_ray_grid
from low_precision_raytracer_tpu.ops.dense import trace_rays_dense
from low_precision_raytracer_tpu.ops.traversal_pallas import (
    trace_rays_packet,
    trace_rays_packet_sorted,
)
from tests.oracle import brute_force_trace


def _setup(host, prec_name="fp32", res=(16, 128)):
    prec = get_precision(prec_name)
    scene = build_scene_arrays(host, prec, leaf_size=4)
    flat = build_flat_scene(host.root, host.active_camera)
    frame = frame_input_from_flat(flat, host, prec)
    h, w = res
    o, d = primary_ray_grid(frame.cam_l2w, flat.cam_fov_y, w, h, prec.dtype)
    return prec, scene, frame, flat, o.reshape(-1, 3), d.reshape(-1, 3), (h, w)


@pytest.mark.parametrize("scene_name", ["cornell", "sponza"])
def test_packet_matches_xla_dense(scene_name):
    host = (
        cornell_box_scene()
        if scene_name == "cornell"
        else sponza_like_scene(pillar_grid=2, sphere_subdiv=1, with_skybox=False)
    )
    prec, scene, frame, flat, o, d, hw = _setup(host)
    hx = trace_rays_dense(scene, frame, o, d, prec=prec)
    hp = trace_rays_packet(
        scene, frame, o, d, prec=prec, tile_hw=hw, interpret=True
    )
    same = np.asarray(hx.tri) == np.asarray(hp.tri)
    assert same.mean() > 0.995, f"tri agreement {same.mean()}"
    np.testing.assert_array_equal(np.asarray(hx.tri) >= 0, np.asarray(hp.tri) >= 0)
    both = same & (np.asarray(hx.tri) >= 0)
    np.testing.assert_allclose(
        np.asarray(hx.t)[both], np.asarray(hp.t)[both], rtol=1e-4, atol=1e-4
    )


def test_packet_matches_fp64_oracle():
    host = sponza_like_scene(pillar_grid=2, sphere_subdiv=1, with_skybox=False)
    prec, scene, frame, flat, o, d, hw = _setup(host)
    hp = trace_rays_packet(
        scene, frame, o, d, prec=prec, tile_hw=hw, interpret=True
    )
    oracle = brute_force_trace(flat, host.meshes, np.asarray(o), np.asarray(d))
    hit_p = np.asarray(hp.tri) >= 0
    agree = hit_p == oracle["hit"]
    assert agree.mean() > 0.999, f"hit agreement {agree.mean()}"
    both = hit_p & oracle["hit"]
    terr = np.abs(np.asarray(hp.t)[both] - oracle["t"][both])
    assert np.quantile(terr, 0.95) < 1e-4


def test_packet_find_any_shadow_semantics():
    """Any-hit rays with bounded max_t: a hit means blocked; max_t shorter
    than the blocker means clear."""
    host = cornell_box_scene()
    prec, scene, frame, flat, o, d, hw = _setup(host)
    hc = trace_rays_packet(
        scene, frame, o, d, prec=prec, tile_hw=hw, interpret=True
    )
    t_hit = np.asarray(hc.t)
    has = np.asarray(hc.tri) >= 0
    # max_t beyond the closest hit -> any-hit must find something
    ha = trace_rays_packet(
        scene, frame, o, d, prec=prec, find_any=True, tile_hw=hw,
        max_dist=1e5, interpret=True,
    )
    assert (np.asarray(ha.tri) >= 0)[has].all()
    # max_t in front of every surface -> nothing can be hit
    hn = trace_rays_packet(
        scene, frame, o, d, prec=prec, find_any=True, tile_hw=hw,
        max_dist=jnp.full((o.shape[0],), 1e-3, jnp.float32), interpret=True,
    )
    assert (np.asarray(hn.tri) < 0).all()


def test_packet_skip_tri():
    host = cornell_box_scene()
    prec, scene, frame, flat, o, d, hw = _setup(host)
    hc = trace_rays_packet(scene, frame, o, d, prec=prec, tile_hw=hw, interpret=True)
    skip = jnp.asarray(hc.tri)
    h2 = trace_rays_packet(
        scene, frame, o, d, prec=prec, skip_tri=skip, tile_hw=hw, interpret=True
    )
    hit0 = np.asarray(hc.tri)
    hit1 = np.asarray(h2.tri)
    mask = hit0 >= 0
    assert (hit1[mask] != hit0[mask]).all(), "skipped triangle re-hit"


def test_packet_sorted_matches_plain():
    host = sponza_like_scene(pillar_grid=2, sphere_subdiv=1, with_skybox=False)
    prec, scene, frame, flat, o, d, hw = _setup(host)
    perm = jax.random.permutation(jax.random.PRNGKey(11), o.shape[0])
    o, d = o[perm], d[perm]
    hp = trace_rays_packet(scene, frame, o, d, prec=prec, tile_hw=None, interpret=True)
    hs = trace_rays_packet_sorted(scene, frame, o, d, prec=prec, interpret=True)
    same = np.asarray(hp.tri) == np.asarray(hs.tri)
    assert same.mean() > 0.999, f"tri agreement {same.mean()}"
    np.testing.assert_array_equal(np.asarray(hp.tri) >= 0, np.asarray(hs.tri) >= 0)


def test_packet_streamed_matches_resident():
    """HBM-streamed coefficient table (large-scene mode) must match the
    VMEM-resident kernel exactly."""
    host = sponza_like_scene(pillar_grid=2, sphere_subdiv=1, with_skybox=False)
    prec, scene, frame, flat, o, d, hw = _setup(host)
    hr = trace_rays_packet(scene, frame, o, d, prec=prec, tile_hw=hw, interpret=True)
    hs = trace_rays_packet(
        scene, frame, o, d, prec=prec, tile_hw=hw, interpret=True, stream=True
    )
    np.testing.assert_array_equal(np.asarray(hr.tri), np.asarray(hs.tri))
    np.testing.assert_allclose(np.asarray(hr.t), np.asarray(hs.t), rtol=1e-5, atol=1e-5)


def test_packet_bf16_parity_with_dense():
    """bf16 path: same dtype semantics as the dense kernel (bf16 storage,
    fp32 accumulate, error-band fp32 fallback)."""
    host = cornell_box_scene()
    prec, scene, frame, flat, o, d, hw = _setup(host, prec_name="bf16")
    hx = trace_rays_dense(scene, frame, o, d, prec=prec)
    hp = trace_rays_packet(scene, frame, o, d, prec=prec, tile_hw=hw, interpret=True)
    same = np.asarray(hx.tri) == np.asarray(hp.tri)
    assert same.mean() > 0.99, f"tri agreement {same.mean()}"


def test_packet_two_level_schedule_large_scene():
    """Two-level cull path (NL > L1_MIN_LEAVES): colonnade-46k has ~1450
    leaves, so the schedule goes block AABBs -> per-packet candidate leaves
    (the round-2 verdict item-3 fix).  Oracle: the XLA dense path."""
    from low_precision_raytracer_tpu.models.scene import BVH_LEAF_TRIS
    from low_precision_raytracer_tpu.ops.traversal_pallas import L1_MIN_LEAVES

    host = sponza_like_scene(pillar_grid=6, sphere_subdiv=3, with_skybox=False)
    prec, scene, frame, flat, o, d, hw = _setup(host, res=(8, 128))
    n_leaves = -(-frame.dense_n.shape[0] // BVH_LEAF_TRIS)
    assert n_leaves > L1_MIN_LEAVES, "scene too small to exercise level 1"
    hx = trace_rays_dense(scene, frame, o, d, prec=prec)
    hp = trace_rays_packet(
        scene, frame, o, d, prec=prec, tile_hw=hw, interpret=True
    )
    same = np.asarray(hx.tri) == np.asarray(hp.tri)
    assert same.mean() > 0.995, f"tri agreement {same.mean()}"
    np.testing.assert_array_equal(np.asarray(hx.tri) >= 0, np.asarray(hp.tri) >= 0)
    both = same & (np.asarray(hx.tri) >= 0)
    np.testing.assert_allclose(
        np.asarray(hx.t)[both], np.asarray(hp.t)[both], rtol=1e-4, atol=1e-4
    )


def test_packet_mxu3_matches_fp32_oracle():
    """'mxu3' in the packet kernel (bf16, f32-rows-only test, no band):
    hits agree with the fp32 XLA dense path on the same quantized rays."""
    host = sponza_like_scene(pillar_grid=2, sphere_subdiv=1, with_skybox=False)
    prec, scene, frame, flat, o, d, hw = _setup(host, prec_name="bf16")
    h3 = trace_rays_packet(
        scene, frame, o, d, prec=prec, fallback="mxu3", tile_hw=hw,
        interpret=True,
    )
    p32, s32, f32, _, _, _, _ = _setup(host)
    h32 = trace_rays_dense(
        s32, f32, o.astype(jnp.float32), d.astype(jnp.float32), prec=p32
    )
    assert np.mean(np.asarray(h3.tri) == np.asarray(h32.tri)) > 0.999
