"""Fused Pallas TPU kernel for the SVGF a-trous wavelet iteration
(`wavelet_filter<stride>`, `rt/rtrt/cuda.hpp:1339-1440`) — the north-star
"fused Pallas stencil" component.

One launch per iteration: every input channel is read from HBM exactly once
per tile (manual halo DMA into VMEM scratch), all 25 bilateral taps + the
3x3 variance prefilter happen in VMEM, and the filtered colour + variance
are written once.  The XLA fori_loop version re-reads every channel 25x;
this kernel is memory-optimal.

Tiling: row tiles of RT rows across the full (pre-padded) width.  Rows and
columns are NaN-padded by PAD=32 >= 2*stride_max, so border taps fall on NaN
and are dropped by the kernel's isfinite masks — identical semantics to the
reference's bounds checks.  A validity channel reproduces the variance
prefilter's in-bounds-only denominator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from low_precision_raytracer_tpu.config import SVGFConfig

PAD = 32  # >= 2 * max stride (strides 1..16)
RT = 16  # output rows per tile

GAUSS_G = (1.0 / 2.0, 1.0 / 4.0)
WAVELET_H = (3.0 / 8.0, 1.0 / 4.0, 1.0 / 16.0)

# geometry channel indices in the packed (8, Hp, Wp) array
C_DEPTH, C_GX, C_GY, C_NX, C_NY, C_NZ, C_ILLUM, C_MASK = range(8)
# colour/variance channels in the packed (4, Hp, Wp) array
C_R, C_G, C_B, C_VAR = range(4)


def _wavelet_kernel(
    geo_hbm,  # (8, Hp, Wp) dtype, ANY
    cv_hbm,  # (4, Hp, Wp) dtype, ANY
    out_ref,  # (4, RT, W) dtype, VMEM block
    geo_s,  # scratch (8, RT + 2h, Wp)
    cv_s,  # scratch (4, RT + 2h, Wp)
    sems,
    *,
    stride: int,
    W: int,
    cfg_sigma_z: float,
    cfg_sigma_n: float,
    cfg_sigma_l: float,
    cfg_eps: float,
):
    # fixed tile-aligned slab: rows [i*RT, i*RT + RT + 2*PAD) of the padded
    # arrays (offsets must be divisible by the sublane tiling, so the slab is
    # PAD-aligned regardless of stride; the centre row is at PAD in scratch)
    i = pl.program_id(0)
    row0 = i * RT

    c1 = pltpu.make_async_copy(
        geo_hbm.at[:, pl.ds(row0, RT + 2 * PAD), :], geo_s, sems.at[0]
    )
    c2 = pltpu.make_async_copy(
        cv_hbm.at[:, pl.ds(row0, RT + 2 * PAD), :], cv_s, sems.at[1]
    )
    c1.start()
    c2.start()
    c1.wait()
    c2.wait()

    # kernel math runs in f32 (Mosaic's isfinite/weird op requires F32);
    # storage stays in the render dtype
    dt = jnp.float32
    sz = jnp.asarray(cfg_sigma_z, dt)
    sn = jnp.asarray(cfg_sigma_n, dt)
    sl = jnp.asarray(cfg_sigma_l, dt)
    eps = jnp.asarray(cfg_eps, dt)
    zero = jnp.asarray(0.0, dt)

    def gslice(c, di, dj):
        return geo_s[c, PAD + di : PAD + di + RT, PAD + dj : PAD + dj + W].astype(dt)

    def cvslice(c, di, dj):
        return cv_s[c, PAD + di : PAD + di + RT, PAD + dj : PAD + dj + W].astype(dt)

    depth_p = gslice(C_DEPTH, 0, 0)
    gx = gslice(C_GX, 0, 0)
    gy = gslice(C_GY, 0, 0)
    nx_p = gslice(C_NX, 0, 0)
    ny_p = gslice(C_NY, 0, 0)
    nz_p = gslice(C_NZ, 0, 0)
    illum_p = gslice(C_ILLUM, 0, 0)

    # 3x3 gaussian prefilter on variance: in-bounds taps only (mask channel),
    # interior NaN variance propagates like the reference
    gnum = jnp.zeros((RT, W), dt)
    gden = jnp.zeros((RT, W), dt)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            g = jnp.asarray(GAUSS_G[abs(di)] * GAUSS_G[abs(dj)], dt)
            m = gslice(C_MASK, di, dj)
            vq = cvslice(C_VAR, di, dj)
            gnum = gnum + g * jnp.where(m > 0.5, vq, zero)
            gden = gden + g * m
    sqrt_g_var = jnp.sqrt(gnum / gden)

    num_r = jnp.zeros((RT, W), dt)
    num_g = jnp.zeros((RT, W), dt)
    num_b = jnp.zeros((RT, W), dt)
    den_c = jnp.zeros((RT, W), dt)
    num_v = jnp.zeros((RT, W), dt)
    den_v = jnp.zeros((RT, W), dt)

    for ti in (-2, -1, 0, 1, 2):
        for tj in (-2, -1, 0, 1, 2):
            di, dj = ti * stride, tj * stride
            hval = jnp.asarray(WAVELET_H[abs(ti)] * WAVELET_H[abs(tj)], dt)
            depth_q = gslice(C_DEPTH, di, dj)
            illum_q = gslice(C_ILLUM, di, dj)
            ndot = (
                nx_p * gslice(C_NX, di, dj)
                + ny_p * gslice(C_NY, di, dj)
                + nz_p * gslice(C_NZ, di, dj)
            )
            d_dot = gx * jnp.asarray(float(di), dt) + gy * jnp.asarray(float(dj), dt)
            arg = (-jnp.abs(depth_p - depth_q) / (sz * jnp.abs(d_dot + eps))
                   - jnp.abs(illum_p - illum_q) / (sl * sqrt_g_var + eps))
            from low_precision_raytracer_tpu.ops.svgf import _pow_int
            w_n = _pow_int(jnp.maximum(zero, ndot), int(cfg_sigma_n)) \
                if float(cfg_sigma_n).is_integer() else jnp.maximum(zero, ndot) ** sn
            hw = hval * jnp.exp(arg) * w_n
            hw_fin = jnp.isfinite(hw)

            var_q = cvslice(C_VAR, di, dj)
            ok_v = hw_fin & jnp.isfinite(var_q)
            hv = jnp.where(ok_v, hw, zero)
            num_v = num_v + hv * hv * jnp.where(ok_v, var_q, zero)
            den_v = den_v + hv

            r_q = cvslice(C_R, di, dj)
            g_q = cvslice(C_G, di, dj)
            b_q = cvslice(C_B, di, dj)
            ok_c = hw_fin & jnp.isfinite(r_q) & jnp.isfinite(g_q) & jnp.isfinite(b_q)
            hc = jnp.where(ok_c, hw, zero)
            num_r = num_r + hc * jnp.where(ok_c, r_q, zero)
            num_g = num_g + hc * jnp.where(ok_c, g_q, zero)
            num_b = num_b + hc * jnp.where(ok_c, b_q, zero)
            den_c = den_c + hc

    next_var = num_v / (den_v * den_v)
    out_r = num_r / den_c
    out_g = num_g / den_c
    out_b = num_b / den_c

    # value_or fallbacks to the unfiltered centre (`rt/rtrt/cuda.hpp:1432-1436`)
    ctr_r = cvslice(C_R, 0, 0)
    ctr_g = cvslice(C_G, 0, 0)
    ctr_b = cvslice(C_B, 0, 0)
    ctr_v = cvslice(C_VAR, 0, 0)
    odt = out_ref.dtype
    out_ref[C_R, :, :] = jnp.where(jnp.isfinite(out_r), out_r, ctr_r).astype(odt)
    out_ref[C_G, :, :] = jnp.where(jnp.isfinite(out_g), out_g, ctr_g).astype(odt)
    out_ref[C_B, :, :] = jnp.where(jnp.isfinite(out_b), out_b, ctr_b).astype(odt)
    out_ref[C_VAR, :, :] = jnp.where(jnp.isfinite(next_var), next_var, ctr_v).astype(odt)


def pack_geometry(depth, grad, normal, illum):
    """Pack + NaN-pad the per-frame geometry channels once per denoise call.
    -> (8, Hp, Wp) in the input dtype, plus the padded sizes."""
    H, W = depth.shape
    dt = depth.dtype
    h_tiles = -(-H // RT)
    Hp = h_tiles * RT + 2 * PAD
    Wp = -(-(W + 2 * PAD) // 128) * 128  # lane-tiling aligned width
    mask = jnp.ones((H, W), dt)
    chans = [
        depth,
        grad[..., 0],
        grad[..., 1],
        normal[..., 0],
        normal[..., 1],
        normal[..., 2],
        illum,
        mask,
    ]
    stack = jnp.stack(chans)  # (8, H, W)
    return jnp.pad(
        stack,
        ((0, 0), (PAD, Hp - H - PAD), (PAD, Wp - W - PAD)),
        constant_values=jnp.nan,
    )


def pack_cv(color, var):
    H, W = var.shape
    h_tiles = -(-H // RT)
    Hp = h_tiles * RT + 2 * PAD
    Wp = -(-(W + 2 * PAD) // 128) * 128
    stack = jnp.stack([color[..., 0], color[..., 1], color[..., 2], var])
    return jnp.pad(
        stack,
        ((0, 0), (PAD, Hp - H - PAD), (PAD, Wp - W - PAD)),
        constant_values=jnp.nan,
    )


@functools.partial(jax.jit, static_argnames=("stride", "cfg", "W", "interpret"))
def wavelet_filter_pallas(geo_packed, cv_packed, stride: int, cfg: SVGFConfig,
                          W: int = None, interpret: bool = False):
    """One fused a-trous iteration.  geo/cv are pack_geometry/pack_cv outputs.
    W: the true (unpadded) image width (static).
    -> (color (Hr, W, 3), var (Hr, W)) — rows padded up to the tile grid."""
    dt = geo_packed.dtype
    Hp, Wp = geo_packed.shape[1:]
    assert W is not None and W <= Wp - 2 * PAD
    Hr = Hp - 2 * PAD  # rounded-up height
    tiles = Hr // RT
    rows_in = RT + 2 * PAD

    kernel = functools.partial(
        _wavelet_kernel,
        stride=stride,
        W=W,
        cfg_sigma_z=cfg.sigma_z,
        cfg_sigma_n=cfg.sigma_n,
        cfg_sigma_l=cfg.sigma_l,
        cfg_eps=cfg.eps,
    )
    out = pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (4, RT, W), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((4, Hr, W), dt),
        scratch_shapes=[
            pltpu.VMEM((8, rows_in, Wp), dt),
            pltpu.VMEM((4, rows_in, Wp), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(geo_packed, cv_packed)
    color = jnp.moveaxis(out[0:3], 0, -1)  # (Hr, W, 3)
    return color, out[3]
