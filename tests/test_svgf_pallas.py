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
