"""Fused Pallas TPU kernel for the SVGF a-trous wavelet chain
(`wavelet_filter<stride>`, `rt/rtrt/cuda.hpp:1339-1440`).

One launch per iteration for BOTH denoiser instances (GI-colored and
GI-white, stacked vertically): every channel is read from HBM exactly once
per tile (halo DMA into VMEM scratch), all 25 bilateral taps + the 3x3
variance prefilter happen in VMEM, and the filtered colour + variance are
written once.  The XLA fori_loop version re-reads every channel 25x per
iteration; this kernel is memory-optimal.

Two design points that differ from the naive version (and from round 1's
kernel, which measured no faster than XLA):

- **The chain stays packed.**  `wavelet_iter_pallas` consumes AND produces
  the padded channel-major (4, Hs, Wp) colour/variance layout, so the
  5-stride chain pays one pack and one unpack total instead of one per
  iteration (pack/unpack was ~40% of the round-1 kernel's runtime).
- **Borders are index-masked, not NaN-padded.**  The out-of-centre border
  semantics (reference bounds checks -> tap dropped) come from comparing
  per-tap row/column iotas against the static image extent, so the pad
  regions of the packed buffers may hold garbage — which is exactly what
  the packed chain produces (pallas output pads are never written).
  Interior NaNs (invalid pixels) are still value-masked by isfinite, like
  the reference treats in-band NaN.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from low_precision_raytracer_tpu.config import SVGFConfig

PAD = 32  # >= 2 * max stride (strides 1..16); multiple of RT
RT = 32  # output rows per tile.  DMA amplification is (RT + 2*PAD) / RT:
# 5x at RT=16, 3x at RT=32 — the halo is fixed, so taller center tiles
# read each HBM row fewer times.  RT > PAD would need element-offset out
# blocks (PAD must stay a multiple of RT for the center-row index map).

GAUSS_G = (1.0 / 2.0, 1.0 / 4.0)
WAVELET_H = (3.0 / 8.0, 1.0 / 4.0, 1.0 / 16.0)

# geometry channel indices in the packed (7, Hs, Wp) array
C_DEPTH, C_GX, C_GY, C_NX, C_NY, C_NZ, C_ILLUM = range(7)
# colour/variance channels in the packed (4, Hs, Wp) array
C_R, C_G, C_B, C_VAR = range(4)


def _pow_int(x, n: int):
    result = None
    base = x
    while n > 0:
        if n & 1:
            result = base if result is None else result * base
        base = base * base
        n >>= 1
    return result


def _wavelet_kernel(
    geo_hbm,  # (7, Hs, Wp) dtype, ANY
    cv_hbm,  # (4, Hs, Wp) dtype, ANY
    out_ref,  # (4, RT, Wp) dtype, VMEM block at the tile's CENTER rows
    geo_s,  # scratch (7, RT + 2*PAD, Wp)
    cv_s,  # scratch (4, RT + 2*PAD, Wp)
    sems,
    *,
    stride: int,
    H: int,
    W: int,
    tiles: int,  # center tiles per instance
    hp: int,  # padded rows per instance
    cfg_sigma_z: float,
    cfg_sigma_n: float,
    cfg_sigma_l: float,
    cfg_eps: float,
):
    i = pl.program_id(0)
    inst = i // tiles  # which stacked instance
    j = i % tiles  # center tile within the instance
    slab0 = inst * hp + j * RT  # first slab row (abs); center row0 = slab0+PAD

    c1 = pltpu.make_async_copy(
        geo_hbm.at[:, pl.ds(slab0, RT + 2 * PAD), :], geo_s, sems.at[0]
    )
    c2 = pltpu.make_async_copy(
        cv_hbm.at[:, pl.ds(slab0, RT + 2 * PAD), :], cv_s, sems.at[1]
    )
    c1.start()
    c2.start()
    c1.wait()
    c2.wait()

    dt = jnp.float32  # kernel math in f32 (Mosaic isfinite needs F32)
    Wp = geo_s.shape[2]
    sz = jnp.asarray(cfg_sigma_z, dt)
    sl = jnp.asarray(cfg_sigma_l, dt)
    eps = jnp.asarray(cfg_eps, dt)
    zero = jnp.asarray(0.0, dt)

    # index masks: tap at (di, dj) from the center is valid iff it lands in
    # the instance's true image extent (replaces NaN border padding)
    row_in_img = j * RT + jax.lax.broadcasted_iota(jnp.int32, (RT, 1), 0)

    # hoist the LANE rotations: slicing at a column offset costs a vector
    # rotate, so build one full-slab rotated view per distinct dj and
    # channel (9 channels x <=7 offsets) instead of one per tap read
    # (25 taps x 9 reads); row offsets below are cheap sublane slices.
    dj_set = sorted({t * stride for t in (-2, -1, 0, 1, 2)} | {-1, 0, 1})
    g_rot = {
        dj: {
            ch: geo_s[ch, :, PAD + dj : PAD + dj + W]
            for ch in (C_DEPTH, C_NX, C_NY, C_NZ, C_ILLUM)
        }
        for dj in dj_set
    }
    c_rot = {
        dj: {ch: cv_s[ch, :, PAD + dj : PAD + dj + W] for ch in (C_R, C_G, C_B, C_VAR)}
        for dj in dj_set
    }

    def g_at(ch, di, dj):
        return g_rot[dj][ch][PAD + di : PAD + di + RT, :].astype(dt)

    def cv_at(ch, di, dj):
        return c_rot[dj][ch][PAD + di : PAD + di + RT, :].astype(dt)

    depth_p = g_at(C_DEPTH, 0, 0)
    gx = geo_s[C_GX, PAD : PAD + RT, PAD : PAD + W].astype(dt)  # center-only
    gy = geo_s[C_GY, PAD : PAD + RT, PAD : PAD + W].astype(dt)
    nx_p = g_at(C_NX, 0, 0)
    ny_p = g_at(C_NY, 0, 0)
    nz_p = g_at(C_NZ, 0, 0)
    illum_p = g_at(C_ILLUM, 0, 0)

    def center_mask(di, dj):
        r = row_in_img + di
        c = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1) + dj
        return (r >= 0) & (r < H) & (c >= 0) & (c < W)

    # 3x3 gaussian prefilter on variance (in-bounds taps only; interior NaN
    # variance propagates, like the reference)
    gnum = jnp.zeros((RT, W), dt)
    gden = jnp.zeros((RT, W), dt)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            g = jnp.asarray(GAUSS_G[abs(di)] * GAUSS_G[abs(dj)], dt)
            m = center_mask(di, dj)
            vq = cv_at(C_VAR, di, dj)
            gnum = gnum + g * jnp.where(m, vq, zero)
            gden = gden + g * m.astype(dt)
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
            m_idx = center_mask(di, dj)
            depth_q = g_at(C_DEPTH, di, dj)
            illum_q = g_at(C_ILLUM, di, dj)
            ndot = (
                nx_p * g_at(C_NX, di, dj)
                + ny_p * g_at(C_NY, di, dj)
                + nz_p * g_at(C_NZ, di, dj)
            )
            d_dot = gx * jnp.asarray(float(di), dt) + gy * jnp.asarray(float(dj), dt)
            arg = (-jnp.abs(depth_p - depth_q) / (sz * jnp.abs(d_dot + eps))
                   - jnp.abs(illum_p - illum_q) / (sl * sqrt_g_var + eps))
            w_n = _pow_int(jnp.maximum(zero, ndot), int(cfg_sigma_n)) \
                if float(cfg_sigma_n).is_integer() \
                else jnp.maximum(zero, ndot) ** jnp.asarray(cfg_sigma_n, dt)
            hw = hval * jnp.exp(arg) * w_n
            ok = jnp.isfinite(hw) & m_idx

            var_q = cv_at(C_VAR, di, dj)
            ok_v = ok & jnp.isfinite(var_q)
            hv = jnp.where(ok_v, hw, zero)
            num_v = num_v + hv * hv * jnp.where(ok_v, var_q, zero)
            den_v = den_v + hv

            r_q = cv_at(C_R, di, dj)
            g_q = cv_at(C_G, di, dj)
            b_q = cv_at(C_B, di, dj)
            ok_c = ok & jnp.isfinite(r_q) & jnp.isfinite(g_q) & jnp.isfinite(b_q)
            hc = jnp.where(ok_c, hw, zero)
            num_r = num_r + hc * jnp.where(ok_c, r_q, zero)
            num_g = num_g + hc * jnp.where(ok_c, g_q, zero)
            num_b = num_b + hc * jnp.where(ok_c, b_q, zero)
            den_c = den_c + hc

    next_var = num_v / (den_v * den_v)
    out_r = num_r / den_c
    out_g = num_g / den_c
    out_b = num_b / den_c

    # value_or fallback to the unfiltered centre (`rt/rtrt/cuda.hpp:1432-1436`)
    ctr_r = cv_at(C_R, 0, 0)
    ctr_g = cv_at(C_G, 0, 0)
    ctr_b = cv_at(C_B, 0, 0)
    ctr_v = cv_at(C_VAR, 0, 0)
    odt = out_ref.dtype

    def put(ch, val, ctr):
        row = jnp.where(jnp.isfinite(val), val, ctr).astype(odt)
        # only the image columns are written; the block's column pads stay
        # garbage — index masks ignore them next iteration
        out_ref[ch, :, PAD : PAD + W] = row

    put(C_R, out_r, ctr_r)
    put(C_G, out_g, ctr_g)
    put(C_B, out_b, ctr_b)
    put(C_VAR, next_var, ctr_v)


def _padded_dims(H, W):
    tiles = -(-H // RT)
    hp = tiles * RT + 2 * PAD
    wp = -(-(W + 2 * PAD) // 128) * 128
    return tiles, hp, wp


def pack_geometry_pair(depth, grad, normal, illum2):
    """Pack geometry for both stacked instances: (7, 2*hp, wp).  depth,
    grad, normal are shared; illum differs per instance."""
    H, W = depth.shape
    dt = depth.dtype
    tiles, hp, wp = _padded_dims(H, W)

    def one(illum):
        chans = jnp.stack([
            depth, grad[..., 0], grad[..., 1],
            normal[..., 0], normal[..., 1], normal[..., 2], illum,
        ])  # (7, H, W)
        return jnp.pad(
            chans,
            ((0, 0), (PAD, hp - H - PAD), (PAD, wp - W - PAD)),
            constant_values=jnp.nan,
        )

    return jnp.concatenate([one(illum2[0]), one(illum2[1])], axis=1)


def pack_cv_pair(color2, var2):
    """(2, H, W, 3) colour + (2, H, W) variance -> (4, 2*hp, wp)."""
    H, W = var2.shape[1:]
    tiles, hp, wp = _padded_dims(H, W)

    def one(color, var):
        chans = jnp.stack([color[..., 0], color[..., 1], color[..., 2], var])
        return jnp.pad(
            chans,
            ((0, 0), (PAD, hp - H - PAD), (PAD, wp - W - PAD)),
            constant_values=jnp.nan,
        )

    return jnp.concatenate([one(color2[0], var2[0]), one(color2[1], var2[1])], axis=1)


def unpack_cv_pair(cv, H, W):
    """(4, 2*hp, wp) -> (color (2, H, W, 3), var (2, H, W))."""
    tiles, hp, wp = _padded_dims(H, W)
    halves = [cv[:, k * hp + PAD : k * hp + PAD + H, PAD : PAD + W] for k in (0, 1)]
    stack = jnp.stack(halves)  # (2, 4, H, W)
    color = jnp.moveaxis(stack[:, 0:3], 1, -1)  # (2, H, W, 3)
    return color, stack[:, 3]


@functools.partial(jax.jit, static_argnames=("stride", "cfg", "H", "W", "interpret"))
def wavelet_iter_pallas(geo, cv, stride: int, cfg: SVGFConfig, H: int, W: int,
                        interpret: bool = False):
    """One fused a-trous iteration over the stacked pair.
    geo: (7, 2*hp, wp); cv: (4, 2*hp, wp) -> next cv, same layout (pads
    untouched/garbage — consumed only via index-masked taps)."""
    dt = cv.dtype
    tiles, hp, wp = _padded_dims(H, W)
    rows_in = RT + 2 * PAD
    kernel = functools.partial(
        _wavelet_kernel,
        stride=stride,
        H=H,
        W=W,
        tiles=tiles,
        hp=hp,
        cfg_sigma_z=cfg.sigma_z,
        cfg_sigma_n=cfg.sigma_n,
        cfg_sigma_l=cfg.sigma_l,
        cfg_eps=cfg.eps,
    )
    rows_per_inst = hp // RT
    return pl.pallas_call(
        kernel,
        grid=(2 * tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (4, RT, wp),
            # block row index of this tile's CENTER rows
            lambda i: (0, (i // tiles) * rows_per_inst + PAD // RT + (i % tiles), 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((4, 2 * hp, wp), dt),
        scratch_shapes=[
            pltpu.VMEM((7, rows_in, wp), dt),
            pltpu.VMEM((4, rows_in, wp), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(geo, cv)


def wavelet_chain_pallas_pair(color2, var2, depth, grad, normal, illum2,
                              strides, cfg: SVGFConfig, interpret: bool = False):
    """The full 5-stride chain for both instances.
    -> (color2 (2, H, W, 3), history2 (2, H, W, 3)) — history is the
    stride[0] output (`rt/rtrt/cuda.hpp:1676-1688`)."""
    H, W = var2.shape[1:]
    geo = pack_geometry_pair(depth, grad, normal, illum2)
    cv = pack_cv_pair(color2, var2)
    history2 = None
    for it, s in enumerate(strides):
        cv = wavelet_iter_pallas(geo, cv, s, cfg, H=H, W=W, interpret=interpret)
        if it == 0:
            history2, _ = unpack_cv_pair(cv, H, W)
    out_color2, _ = unpack_cv_pair(cv, H, W)
    if history2 is None:
        history2 = out_color2
    return out_color2, history2
