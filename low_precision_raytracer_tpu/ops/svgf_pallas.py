"""Fused Pallas TPU kernel for the SVGF a-trous wavelet chain
(`wavelet_filter<stride>`, `rt/rtrt/cuda.hpp:1339-1440`).

One launch per iteration for BOTH denoiser instances (GI-colored and
GI-white) *in the same tile*: the geometry edge weights — the depth term
|dz|/(sigma_z*|grad.dp|) and the normal term max(0, n.n')^128 — are
identical between the two instances (they share the G-buffer), so the
kernel computes them once per tap and only the per-instance luminance
term + exp + accumulation run twice.  The round-2 kernel stacked the
instances vertically and paid the full geometry math twice.

Validity is carried as data, not recomputed per tap: the pack stage
pre-computes 0/1 mask channels (fc = colour finite & geometry finite &
in-image; fv = same for variance) and sanitises the value channels
(NaN colour/normal/illum -> 0, NaN depth -> BIG so the depth term kills
the tap).  Per tap the kernel multiplies by the mask view instead of the
round-2 isfinite/where/index-iota chains (~15 vector ops per tap per
instance).  Centre-side invalidity (the reference's "all taps NaN ->
value_or fallback", `rt/rtrt/cuda.hpp:1432-1436`) is reproduced by a
per-pixel additive penalty BIG*(1-valid_p) inside the exp argument, which
zeroes every tap weight and routes the pixel through the same
divide-by-zero -> NaN -> fallback path as the reference.

Colour and variance ride RAW (NaN-preserving) through the chain so the
fallback keeps the reference semantics exactly: a pixel whose geometry is
invalid but whose colour is finite keeps its colour (it just never
filters), and genuinely-NaN values stay NaN for downstream laundering.
Sanitised copies for the tap MACs are one select per slab.

The chain stays packed across all 5 strides (one pack + one unpack
total), and the tap loop is dj-major so only one column-offset's rotated
slabs are live at a time (the round-2 all-offsets hoist needed ~2x the
rotated-slab VMEM of this layout at half the channel count).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from low_precision_raytracer_tpu.config import SVGFConfig

PAD = 32  # >= 2 * max stride (strides 1..16); multiple of RT
RT = 32  # output rows per tile; halo DMA amplification (RT + 2*PAD) / RT = 3x

GAUSS_G = (1.0 / 2.0, 1.0 / 4.0)
WAVELET_H = (3.0 / 8.0, 1.0 / 4.0, 1.0 / 16.0)
BIG = 1e30  # sentinel: exp(-BIG) == 0, BIG * finite_recip -> inf, exp(-inf) == 0

# geometry channels, packed once per chain: sanitised depth, grad pre-scaled
# by sigma_z, sanitised normal, in-image indicator, per-instance sanitised
# illuminance, per-instance centre penalty BIG*(1 - geometry_valid)
(C_DEPTH, C_GX, C_GY, C_NX, C_NY, C_NZ, C_ONE,
 C_IL0, C_IL1, C_PEN0, C_PEN1) = range(11)
N_GEO = 11
# colour/variance channels, carried through the chain (x2 instances):
# raw rgb, raw variance, colour mask, variance mask
C_R, C_G, C_B, C_VAR, C_FC, C_FV = range(6)
N_CVI = 6  # per instance
N_CV = 2 * N_CVI


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
    geo_hbm,  # (N_GEO, hp, wp) f32, ANY
    cv_hbm,  # (N_CV, hp, wp) f32, ANY
    out_ref,  # (N_CV, RT, wp) f32, VMEM block at the tile's CENTER rows
    geo_s,  # scratch (N_GEO, RT + 2*PAD, wp)
    cv_s,  # scratch (N_CV, RT + 2*PAD, wp)
    sems,
    *,
    stride: int,
    H: int,
    W: int,
    cfg_sigma_n: float,
    cfg_sigma_l: float,
    cfg_eps: float,
    cfg_eps_z: float,  # sigma_z * eps (grad pre-scaling folds sigma_z in)
):
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    # tiles 0 and n-1 own the output buffer's top/bottom PAD rows (PAD == RT):
    # the masks' correctness relies on pad rows being ZERO, and the out
    # buffer is fresh (uninitialised) every iteration, so they must be written
    is_pad_tile = (i == 0) | (i == n_tiles - 1)

    @pl.when(is_pad_tile)
    def _zero_pads():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(~is_pad_tile)
    def _body():
        _wavelet_tile_body(
            geo_hbm, cv_hbm, out_ref, geo_s, cv_s, sems,
            j=i - 1, stride=stride, H=H, W=W,
            cfg_sigma_n=cfg_sigma_n, cfg_sigma_l=cfg_sigma_l,
            cfg_eps=cfg_eps, cfg_eps_z=cfg_eps_z,
        )


def _wavelet_tile_body(
    geo_hbm, cv_hbm, out_ref, geo_s, cv_s, sems, *,
    j, stride: int, H: int, W: int,
    cfg_sigma_n: float, cfg_sigma_l: float, cfg_eps: float, cfg_eps_z: float,
):
    slab0 = j * RT  # first slab row (abs); center row0 = slab0 + PAD

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

    dt = jnp.float32
    sl = jnp.asarray(cfg_sigma_l, dt)
    eps = jnp.asarray(cfg_eps, dt)
    zero = jnp.asarray(0.0, dt)

    def rot(ch_slab, dj):
        # full-slab view at column offset dj (one lane rotate per call);
        # row offsets slice the result cheaply per tap
        return ch_slab[:, PAD + dj : PAD + dj + W]

    def rows(view, di):
        return view[PAD + di : PAD + di + RT, :]

    # sanitised tap copies: raw * mask is NaN-unsafe (0 * NaN), so select
    # once per slab; q-side invalid taps are killed by the mask channels
    cl_s = [
        [
            jnp.where(cv_s[b + C_FC] > zero, cv_s[b + c], zero)
            for c in (C_R, C_G, C_B)
        ]
        + [jnp.where(cv_s[b + C_FV] > zero, cv_s[b + C_VAR], zero)]
        for b in (0, N_CVI)
    ]

    # ---- centre (p-side) views
    depth_p = rows(rot(geo_s[C_DEPTH], 0), 0)
    nx_p = rows(rot(geo_s[C_NX], 0), 0)
    ny_p = rows(rot(geo_s[C_NY], 0), 0)
    nz_p = rows(rot(geo_s[C_NZ], 0), 0)
    il_p = [rows(rot(geo_s[C_IL0], 0), 0), rows(rot(geo_s[C_IL1], 0), 0)]
    pen = [rows(rot(geo_s[C_PEN0], 0), 0), rows(rot(geo_s[C_PEN1], 0), 0)]
    gx = rows(rot(geo_s[C_GX], 0), 0)  # pre-scaled by sigma_z
    gy = rows(rot(geo_s[C_GY], 0), 0)
    # sigma_z*|d_dot + eps| == |sigma_z*d_dot + sigma_z*eps| (sigma_z > 0)
    eps1 = jnp.asarray(cfg_eps_z, dt)

    # ---- 3x3 gaussian prefilter on RAW variance (0 outside the image, NaN
    # propagates from invalid interior pixels exactly like the reference's
    # NaN -> all-taps-dead -> fallback path)
    gnum = [jnp.zeros((RT, W), dt), jnp.zeros((RT, W), dt)]
    gden = jnp.zeros((RT, W), dt)  # identical for both instances
    for dj in (-1, 0, 1):
        vr = [rot(cv_s[C_VAR], dj), rot(cv_s[N_CVI + C_VAR], dj)]
        on = rot(geo_s[C_ONE], dj)
        for di in (-1, 0, 1):
            g = jnp.asarray(GAUSS_G[abs(di)] * GAUSS_G[abs(dj)], dt)
            gnum[0] = gnum[0] + g * rows(vr[0], di)
            gnum[1] = gnum[1] + g * rows(vr[1], di)
            gden = gden + g * rows(on, di)
    # per-instance luminance reciprocal, with the centre penalty folded in:
    # arg_i = -(t1 + |dl|*recip2_i + pen_i); pen_i = BIG where p invalid
    recip2 = [1.0 / (sl * jnp.sqrt(gnum[i] / gden) + eps) for i in (0, 1)]

    num_r = [jnp.zeros((RT, W), dt) for _ in (0, 1)]
    num_g = [jnp.zeros((RT, W), dt) for _ in (0, 1)]
    num_b = [jnp.zeros((RT, W), dt) for _ in (0, 1)]
    den_c = [jnp.zeros((RT, W), dt) for _ in (0, 1)]
    num_v = [jnp.zeros((RT, W), dt) for _ in (0, 1)]
    den_v = [jnp.zeros((RT, W), dt) for _ in (0, 1)]

    sn_int = float(cfg_sigma_n).is_integer()

    for tj in (-2, -1, 0, 1, 2):
        dj = tj * stride
        # one rotated view per channel per dj; live range = this tj iteration
        dep_r = rot(geo_s[C_DEPTH], dj)
        nx_r = rot(geo_s[C_NX], dj)
        ny_r = rot(geo_s[C_NY], dj)
        nz_r = rot(geo_s[C_NZ], dj)
        il_r = [rot(geo_s[C_IL0], dj), rot(geo_s[C_IL1], dj)]
        c_r = [[rot(ch, dj) for ch in cl_s[i]] for i in (0, 1)]  # r, g, b, vclean
        fc_r = [rot(cv_s[C_FC], dj), rot(cv_s[N_CVI + C_FC], dj)]
        fv_r = [rot(cv_s[C_FV], dj), rot(cv_s[N_CVI + C_FV], dj)]

        for ti in (-2, -1, 0, 1, 2):
            di = ti * stride
            hval = jnp.asarray(WAVELET_H[abs(ti)] * WAVELET_H[abs(tj)], dt)

            # ---- shared geometry weights (computed ONCE for both instances)
            dd = gx * jnp.asarray(float(di), dt) + gy * jnp.asarray(float(dj), dt)
            t1 = jnp.abs(depth_p - rows(dep_r, di)) / jnp.abs(dd + eps1)
            ndot = (
                nx_p * rows(nx_r, di)
                + ny_p * rows(ny_r, di)
                + nz_p * rows(nz_r, di)
            )
            w_n = (
                _pow_int(jnp.maximum(zero, ndot), int(cfg_sigma_n))
                if sn_int
                else jnp.maximum(zero, ndot) ** jnp.asarray(cfg_sigma_n, dt)
            )
            hvn = hval * w_n

            for i in (0, 1):
                t2 = jnp.abs(il_p[i] - rows(il_r[i], di)) * recip2[i]
                hw = hvn * jnp.exp(-(t1 + t2 + pen[i]))
                hc = hw * rows(fc_r[i], di)
                hv = hw * rows(fv_r[i], di)
                num_r[i] = num_r[i] + hc * rows(c_r[i][0], di)
                num_g[i] = num_g[i] + hc * rows(c_r[i][1], di)
                num_b[i] = num_b[i] + hc * rows(c_r[i][2], di)
                den_c[i] = den_c[i] + hc
                num_v[i] = num_v[i] + hv * hv * rows(c_r[i][3], di)
                den_v[i] = den_v[i] + hv

    # ---- write-out: value_or fallback to the RAW centre
    # (`rt/rtrt/cuda.hpp:1432-1436`); masks updated so downstream iterations
    # see the new validity; all channels written full-width with the
    # in-image indicator folded in so pads are zero for the next DMA
    row_ok = (slab0 + jax.lax.broadcasted_iota(jnp.int32, (RT, 1), 0)) < H
    Wp = out_ref.shape[2]
    col_img = jax.lax.broadcasted_iota(jnp.int32, (1, Wp), 1) - PAD
    inb = row_ok & (col_img >= 0) & (col_img < W)  # (RT, Wp)

    def wide(val):  # (RT, W) -> (RT, Wp), zero outside the image (a select,
        # not a multiply: garbage rows beyond H may hold NaN and NaN*0 = NaN)
        full = jnp.concatenate(
            [jnp.zeros((RT, PAD), dt), val, jnp.zeros((RT, Wp - W - PAD), dt)],
            axis=1,
        )
        return jnp.where(inb, full, zero)

    one_f = jnp.asarray(1.0, dt)
    for i, b in enumerate((0, N_CVI)):
        ctr = [rows(rot(cv_s[b + c], 0), 0) for c in (C_R, C_G, C_B, C_VAR)]
        fc_ctr = rows(rot(cv_s[b + C_FC], 0), 0)
        fv_ctr = rows(rot(cv_s[b + C_FV], 0), 0)
        out_c = [num_r[i] / den_c[i], num_g[i] / den_c[i], num_b[i] / den_c[i]]
        valid_c = (
            jnp.isfinite(out_c[0]) & jnp.isfinite(out_c[1]) & jnp.isfinite(out_c[2])
        )
        out_v = num_v[i] / (den_v[i] * den_v[i])
        valid_v = jnp.isfinite(out_v)
        for c, (val, ctr_v) in enumerate(zip(out_c, ctr[:3])):
            out_ref[b + c, :, :] = wide(jnp.where(valid_c, val, ctr_v))
        out_ref[b + C_VAR, :, :] = wide(jnp.where(valid_v, out_v, ctr[3]))
        out_ref[b + C_FC, :, :] = wide(jnp.where(valid_c, one_f, fc_ctr))
        out_ref[b + C_FV, :, :] = wide(jnp.where(valid_v, one_f, fv_ctr))


def _padded_dims(H, W):
    tiles = -(-H // RT)
    hp = tiles * RT + 2 * PAD
    wp = -(-(W + 2 * PAD) // 128) * 128
    return tiles, hp, wp


def _pad0(chans, H, W, hp, wp):
    return jnp.pad(chans, ((0, 0), (PAD, hp - H - PAD), (PAD, wp - W - PAD)))


def pack_geometry_pair(depth, grad, normal, illum2, cfg: SVGFConfig):
    """Shared geometry + per-instance illuminance/penalty: (N_GEO, hp, wp)
    f32.  Depth is sanitised to BIG (kills the tap via the depth term),
    normal/illum to 0; grad keeps NaN (reference semantics: NaN gradient ->
    NaN arg -> all taps dead -> fallback) and is pre-scaled by sigma_z."""
    H, W = depth.shape
    f32 = jnp.float32
    tiles, hp, wp = _padded_dims(H, W)
    depth = depth.astype(f32)
    normal = normal.astype(f32)
    grad = grad.astype(f32)
    illum2 = illum2.astype(f32)

    fin_d = jnp.isfinite(depth)
    fin_n = jnp.all(jnp.isfinite(normal), axis=-1)
    depth_s = jnp.where(fin_d, depth, BIG)
    n_s = jnp.where(fin_n[..., None], normal, 0.0)
    sz = jnp.asarray(cfg.sigma_z, f32)
    chans = [depth_s, grad[..., 0] * sz, grad[..., 1] * sz,
             n_s[..., 0], n_s[..., 1], n_s[..., 2], jnp.ones((H, W), f32)]
    pens = []
    for i in (0, 1):
        fin_i = jnp.isfinite(illum2[i])
        chans.append(jnp.where(fin_i, illum2[i], 0.0))
        pens.append(jnp.where(fin_d & fin_n & fin_i, 0.0, BIG))
    return _pad0(jnp.stack(chans + pens), H, W, hp, wp)


def geometry_valid2(depth, normal, illum2):
    """Per-instance 'geometry participates' mask (2, H, W) bool — the same
    predicate the penalty channel encodes; used to build the cv masks."""
    fin = jnp.isfinite(depth) & jnp.all(jnp.isfinite(normal), axis=-1)
    return fin[None] & jnp.isfinite(illum2)


def pack_cv_pair(color2, var2, fgeo2):
    """(2, H, W, 3) colour + (2, H, W) variance (both raw, NaN-preserving)
    + (2, H, W) geometry-valid -> (N_CV, hp, wp) f32 with 0/1 mask
    channels.  fc/fv = value-finite & geometry-valid & in-image."""
    H, W = var2.shape[1:]
    f32 = jnp.float32
    tiles, hp, wp = _padded_dims(H, W)
    color2 = color2.astype(f32)
    var2 = var2.astype(f32)

    def one(color, var, fgeo):
        fc = (jnp.all(jnp.isfinite(color), axis=-1) & fgeo).astype(f32)
        fv = (jnp.isfinite(var) & fgeo).astype(f32)
        return [color[..., 0], color[..., 1], color[..., 2], var, fc, fv]

    chans = one(color2[0], var2[0], fgeo2[0]) + one(color2[1], var2[1], fgeo2[1])
    return _pad0(jnp.stack(chans), H, W, hp, wp)


def unpack_cv_pair(cv, H, W):
    """(N_CV, hp, wp) -> (color (2, H, W, 3), var (2, H, W)), both raw
    (NaN semantics carried through the chain unchanged)."""
    tiles, hp, wp = _padded_dims(H, W)
    img = cv[:, PAD : PAD + H, PAD : PAD + W]
    color = jnp.stack(
        [jnp.moveaxis(img[b + C_R : b + C_B + 1], 0, -1) for b in (0, N_CVI)]
    )
    var = jnp.stack([img[b + C_VAR] for b in (0, N_CVI)])
    return color, var


@functools.partial(jax.jit, static_argnames=("stride", "cfg", "H", "W", "interpret"))
def wavelet_iter_pallas(geo, cv, stride: int, cfg: SVGFConfig, H: int, W: int,
                        interpret: bool = False):
    """One fused a-trous iteration over the instance pair.
    geo: (N_GEO, hp, wp); cv: (N_CV, hp, wp) -> next cv, same layout."""
    tiles, hp, wp = _padded_dims(H, W)
    rows_in = RT + 2 * PAD
    kernel = functools.partial(
        _wavelet_kernel,
        stride=stride,
        H=H,
        W=W,
        cfg_sigma_n=cfg.sigma_n,
        cfg_sigma_l=cfg.sigma_l,
        cfg_eps=cfg.eps,
        cfg_eps_z=cfg.sigma_z * cfg.eps,
    )
    return pl.pallas_call(
        kernel,
        # tiles + 2: first/last grid steps zero the out buffer's pad rows
        grid=(tiles + 2,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (N_CV, RT, wp),
            # PAD == RT: block i covers rows [i*RT, (i+1)*RT) — pad tiles at
            # the ends, tile i's CENTER rows in between
            lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((N_CV, hp, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((N_GEO, rows_in, wp), jnp.float32),
            pltpu.VMEM((N_CV, rows_in, wp), jnp.float32),
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
    geo = pack_geometry_pair(depth, grad, normal, illum2, cfg)
    fgeo2 = geometry_valid2(depth, normal, illum2)
    cv = pack_cv_pair(color2, var2, fgeo2)
    history2 = None
    for it, s in enumerate(strides):
        cv = wavelet_iter_pallas(geo, cv, s, cfg, H=H, W=W, interpret=interpret)
        if it == 0:
            history2, _ = unpack_cv_pair(cv, H, W)
    out_color2, _ = unpack_cv_pair(cv, H, W)
    if history2 is None:
        history2 = out_color2
    return out_color2, history2
