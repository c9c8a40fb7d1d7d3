"""Stacked-pair fused Pallas wavelet chain vs the XLA stencil chain
(interpret mode): same math, index-masked borders must reproduce the
NaN-pad border semantics exactly (SURVEY.md 2.17; `rt/rtrt/cuda.hpp:
1339-1440`)."""

import jax
import jax.numpy as jnp
import numpy as np

from low_precision_raytracer_tpu.config import RenderConfig
from low_precision_raytracer_tpu.ops.svgf import wavelet_filter
from low_precision_raytracer_tpu.ops.svgf_pallas import (
    geometry_valid2,
    pack_cv_pair,
    pack_geometry_pair,
    unpack_cv_pair,
    wavelet_iter_pallas,
)


def _data(H=40, W=96, seed=0, with_nans=True):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 6)
    dt = jnp.float32
    color2 = jax.random.uniform(ks[0], (2, H, W, 3), dt)
    var2 = jax.random.uniform(ks[1], (2, H, W), dt) + 0.01
    depth = jax.random.uniform(ks[2], (H, W), dt) * 5
    normal = jax.random.normal(ks[3], (H, W, 3), dt)
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    grad = jax.random.normal(ks[4], (H, W, 2), dt) * 0.1
    illum2 = jax.random.uniform(ks[5], (2, H, W), dt)
    if with_nans:
        # invalid pixels: NaN color/var/depth patches (sky), like production
        color2 = color2.at[:, 5:9, 10:20].set(jnp.nan)
        var2 = var2.at[:, 5:9, 10:20].set(jnp.nan)
        depth = depth.at[30:34, 50:60].set(jnp.nan)
    return color2, var2, depth, normal, grad, illum2


def test_pallas_iter_matches_xla():
    cfg = RenderConfig(width=96, height=40, precision="fp32").svgf
    color2, var2, depth, normal, grad, illum2 = _data()
    H, W = depth.shape
    for stride in (1, 4, 16):
        geo = pack_geometry_pair(depth, grad, normal, illum2, cfg)
        cv = pack_cv_pair(color2, var2, geometry_valid2(depth, normal, illum2))
        out = wavelet_iter_pallas(geo, cv, stride, cfg, H=H, W=W, interpret=True)
        c_p, v_p = unpack_cv_pair(out, H, W)
        for i in range(2):
            c_x, v_x = wavelet_filter(
                color2[i], var2[i], depth, grad, normal, illum2[i], stride, cfg
            )
            np.testing.assert_allclose(
                np.asarray(c_p[i]), np.asarray(c_x), rtol=2e-5, atol=2e-5,
                err_msg=f"color stride={stride} inst={i}",
            )
            np.testing.assert_allclose(
                np.asarray(v_p[i]), np.asarray(v_x), rtol=2e-5, atol=2e-5,
                err_msg=f"var stride={stride} inst={i}",
            )


def test_pallas_chain_packed_reuse():
    """The packed chain (pads garbage after iter 1) must still agree with
    the XLA chain after several iterations."""
    cfg = RenderConfig(width=96, height=40, precision="fp32").svgf
    color2, var2, depth, normal, grad, illum2 = _data(seed=3)
    H, W = depth.shape
    geo = pack_geometry_pair(depth, grad, normal, illum2, cfg)
    cv = pack_cv_pair(color2, var2, geometry_valid2(depth, normal, illum2))
    c_x2, v_x2 = color2, var2
    for stride in (1, 2, 4):
        cv = wavelet_iter_pallas(geo, cv, stride, cfg, H=H, W=W, interpret=True)
        outs = [
            wavelet_filter(c_x2[i], v_x2[i], depth, grad, normal, illum2[i], stride, cfg)
            for i in range(2)
        ]
        c_x2 = jnp.stack([o[0] for o in outs])
        v_x2 = jnp.stack([o[1] for o in outs])
    c_p, v_p = unpack_cv_pair(cv, H, W)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_x2), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_x2), rtol=1e-4, atol=1e-4)


def test_fused_temporal_matches_xla():
    """temporal_accum_pallas_pair (box9 clamp + history lerp + bilateral/
    temporal moments) must match the XLA temporal stages on valid pixels
    and produce the same validity masks."""
    from low_precision_raytracer_tpu.ops.svgf import (
        temporal_accumulation_color,
        temporal_accumulation_moments,
    )
    from low_precision_raytracer_tpu.ops.svgf_pallas import (
        C_FC,
        C_VAR,
        N_CVI,
        PAD,
        pack_geometry_base,
        svgf_pallas_pair_full,
        temporal_accum_pallas_pair,
        _pad0,
        _padded_dims,
    )

    H, W = 40, 96
    cfg = RenderConfig().svgf
    color2, var2, depth, normal, grad, _ = _data(H=H, W=W)
    k = jax.random.PRNGKey(7)
    ks = jax.random.split(k, 5)
    f32 = jnp.float32
    hist2 = jax.random.uniform(ks[0], (2, H, W, 3), f32)
    m1_2 = jax.random.uniform(ks[1], (2, H, W), f32)
    m2_2 = jax.random.uniform(ks[2], (2, H, W), f32) + 1.0
    fc = jax.random.randint(ks[3], (H, W), 0, 8)
    svgf_map = {"frame_count": fc}
    w_c, w_m = 0.1, 0.1

    # ---- XLA reference
    def temporal(color, h, m1p, m2p):
        integ, illum = temporal_accumulation_color(
            color, None, svgf_map, w_c, hist_pre=h
        )
        miu1, miu2, var = temporal_accumulation_moments(
            svgf_map, depth, grad, normal, None, None, illum, w_m, cfg,
            m1_pre=m1p, m2_pre=m2p,
        )
        return integ, illum, miu1, miu2, var

    integ_r, illum_r, miu1_r, miu2_r, var_r = jax.vmap(temporal)(
        color2, hist2, m1_2, m2_2
    )

    # ---- fused kernel
    tiles, hp, wp = _padded_dims(H, W)
    geo7, _ = pack_geometry_base(depth, grad, normal, cfg)
    col6 = _pad0(
        jnp.stack([color2[i, ..., c] for i in (0, 1) for c in range(3)]),
        H, W, hp, wp,
    )
    ctr11 = _pad0(
        jnp.stack(
            [hist2[i, ..., c] for i in (0, 1) for c in range(3)]
            + [m1_2[0], m1_2[1], m2_2[0], m2_2[1], fc.astype(f32)]
        ),
        H, W, hp, wp,
    )
    cv, extra, mst = temporal_accum_pallas_pair(
        col6, geo7, ctr11, cfg, H=H, W=W, color_w=w_c, moments_w=w_m,
        interpret=True,
    )
    img = lambda a: np.asarray(a[:, PAD : PAD + H, PAD : PAD + W])
    cvi, exti, msti = img(cv), img(extra), img(mst)

    def close(a, b, name, atol=2e-4):
        a, b = np.asarray(a), np.asarray(b)
        fin = np.isfinite(a) & np.isfinite(b)
        assert np.isfinite(a).mean() > 0.5, f"{name}: mostly NaN"
        np.testing.assert_allclose(a[fin], b[fin], rtol=2e-4, atol=atol,
                                   err_msg=name)

    for i, b in enumerate((0, N_CVI)):
        for c in range(3):
            close(cvi[b + c], integ_r[i, ..., c], f"integ[{i}][{c}]")
        close(cvi[b + C_VAR], var_r[i], f"var[{i}]")
        close(exti[i], jnp.where(jnp.isfinite(illum_r[i]), illum_r[i], 0.0),
              f"illum[{i}]")
        close(msti[i], miu1_r[i], f"miu1[{i}]")
        close(msti[2 + i], miu2_r[i], f"miu2[{i}]")
    # masks: 0/1 and zero wherever geometry/colour is invalid
    fcm = cvi[C_FC]
    assert set(np.unique(fcm)).issubset({0.0, 1.0})

    # ---- end-to-end wrapper smoke test (full chain, both instances)
    out2, new_state2 = svgf_pallas_pair_full(
        color2, svgf_map, depth, grad, normal, cfg, w_c, w_m,
        (hist2, m1_2, m2_2), (1, 2), interpret=True,
    )
    assert out2.shape == (2, H, W, 3)
    assert new_state2.miu1.shape == (2, H, W)
    assert np.isfinite(np.asarray(out2)).mean() > 0.5


def test_denoise_pair_pallas_no_prefetch():
    """svgf_denoise_pair(impl='pallas') without a prefetch must compute its
    own finished fetches and roughly agree with the XLA implementation."""
    from low_precision_raytracer_tpu.ops.svgf import SVGFState, svgf_denoise_pair

    H, W = 40, 96
    cfg = RenderConfig().svgf
    color2, var2, depth, normal, grad, _ = _data(H=H, W=W, with_nans=False)
    k = jax.random.PRNGKey(3)
    ks = jax.random.split(k, 4)
    f32 = jnp.float32
    state2 = SVGFState(
        miu1=jax.random.uniform(ks[0], (2, H, W), f32),
        miu2=jax.random.uniform(ks[1], (2, H, W), f32) + 1.0,
        color_history=jax.random.uniform(ks[2], (2, H, W, 3), f32),
    )
    row = jnp.arange(H, dtype=jnp.int32)[:, None]
    col = jnp.arange(W, dtype=jnp.int32)[None, :]
    svgf_map = {
        "frame_count": jax.random.randint(ks[3], (H, W), 0, 8),
        "weights": jnp.full((H, W, 4), 0.25, f32),
        "base_y": jnp.broadcast_to(row + 1, (H, W)),
        "base_x": jnp.broadcast_to(col + 1, (H, W)),
    }
    args = (color2, state2, svgf_map, normal, depth, grad, cfg, 0.1, 0.1)
    out_p, st_p = svgf_denoise_pair(*args, wavelet_impl="pallas", interpret=True)
    out_x, st_x = svgf_denoise_pair(*args, wavelet_impl="xla")
    a, b = np.asarray(out_p), np.asarray(out_x)
    fin = np.isfinite(a) & np.isfinite(b)
    assert fin.mean() > 0.9
    np.testing.assert_allclose(a[fin], b[fin], rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(st_p.miu1), np.asarray(st_x.miu1), rtol=5e-3, atol=5e-3
    )
