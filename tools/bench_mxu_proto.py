"""Micro-prototype: MXU-staged dense-intersection chunk body vs the VPU
row/arow body (tools for the round-3 kernel redesign).

Measures, standalone on the real TPU, a grid of ray tiles each looping over
NCHUNK chunks:
  (a) VPU body: the current 18-madd row()/arow() structure (abridged but
      pass-count-faithful);
  (b) MXU body: two lhs-transposed dot_generals per chunk
      (A32t (8, 6tc) f32 and Aabt (16, 8tc) bf16) + the short VPU tail.

Also verifies numeric agreement of u/v/t between the two bodies.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
TR = 512
TC = int(sys.argv[1]) if len(sys.argv) > 1 else 48
NCHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 1
R = 2_073_600  # 1080p


def vpu_kernel(n_dt_ref, n_f32_ref, e_ref, o_ref, d_ref, t_out, u_out, v_out):
    ox, oy, oz = o_ref[0:1], o_ref[1:2], o_ref[2:3]
    dx, dy, dz = d_ref[0:1], d_ref[1:2], d_ref[2:3]
    t_out[:, :] = jnp.full((1, TR), 1e5, F32)
    u_out[:, :] = jnp.zeros((1, TR), F32)
    v_out[:, :] = jnp.zeros((1, TR), F32)

    def body(c, _):
        sl = pl.ds(c * TC, TC)
        n_dt = n_dt_ref[sl, :].astype(F32)
        n_f = n_f32_ref[sl, :]
        e = e_ref[sl, :]

        def row(nmat, k, e_col):
            o_val = (nmat[:, 3*k:3*k+1] * ox + nmat[:, 3*k+1:3*k+2] * oy
                     + nmat[:, 3*k+2:3*k+3] * oz + e_col)
            d_val = (nmat[:, 3*k:3*k+1] * dx + nmat[:, 3*k+1:3*k+2] * dy
                     + nmat[:, 3*k+2:3*k+3] * dz)
            return o_val, d_val

        Ox, Dx = row(n_dt, 0, e[:, 0:1])
        Oy, Dy = row(n_dt, 1, e[:, 1:2])
        Oz, Dz = row(n_f, 2, e[:, 2:3])
        t = -Oz / Dz
        u = Ox + t * Dx
        v = Oy + t * Dy

        def arow(nmat, k, e_col):
            a = (jnp.abs(nmat[:, 3*k:3*k+1]) * jnp.abs(ox)
                 + jnp.abs(nmat[:, 3*k+1:3*k+2]) * jnp.abs(oy)
                 + jnp.abs(nmat[:, 3*k+2:3*k+3]) * jnp.abs(oz) + jnp.abs(e_col))
            b = (jnp.abs(nmat[:, 3*k:3*k+1]) * jnp.abs(dx)
                 + jnp.abs(nmat[:, 3*k+1:3*k+2]) * jnp.abs(dy)
                 + jnp.abs(nmat[:, 3*k+2:3*k+3]) * jnp.abs(dz))
            return a, b

        s_ox, s_dx = arow(n_dt, 0, e[:, 0:1])
        s_oy, s_dy = arow(n_dt, 1, e[:, 1:2])
        d12 = jnp.float32(2**-7 + 2**-5)
        d1f = jnp.float32(2**-7)
        error_u = (d12*s_ox + t*d12*s_dx + d1f*(jnp.abs(Ox) + 3*jnp.abs(t*Dx))) * 0.2
        error_v = (d12*s_oy + t*d12*s_dy + d1f*(jnp.abs(Oy) + 3*jnp.abs(t*Dy))) * 0.2

        Ox32, Dx32 = row(n_f, 0, e[:, 0:1])
        Oy32, Dy32 = row(n_f, 1, e[:, 1:2])
        u32 = Ox32 + t * Dx32
        v32 = Oy32 + t * Dy32
        ok32 = (u32 > 0) & (v32 > 0) & (u32 + v32 < 1)

        w = 1.0 - u - v
        in_band = lambda x, err: (x >= -err) & (x <= 0)
        ambiguous = in_band(u, error_u) | in_band(v, error_v) | in_band(w, error_u + error_v)
        dtype_accept = (u > -error_u) & (v > -error_v) & (u + v < 1 + error_u + error_v)
        u_sel = jnp.where(ambiguous, u32, u)
        v_sel = jnp.where(ambiguous, v32, v)
        accept = ((ambiguous & ok32) | (~ambiguous & dtype_accept)) & (t > 0) & jnp.isfinite(t)

        t_masked = jnp.where(accept, t, jnp.inf)
        t_min = jnp.min(t_masked, axis=0, keepdims=True)
        at_min = t_masked == t_min
        neg = jnp.float32(-3e38)
        u_win = jnp.max(jnp.where(at_min, u_sel, neg), axis=0, keepdims=True)
        v_win = jnp.max(jnp.where(at_min, v_sel, neg), axis=0, keepdims=True)
        better = jnp.isfinite(t_min) & (t_min < t_out[:, :])
        t_out[:, :] = jnp.where(better, t_min, t_out[:, :])
        u_out[:, :] = jnp.where(better, u_win, u_out[:, :])
        v_out[:, :] = jnp.where(better, v_win, v_out[:, :])
        return 0

    jax.lax.fori_loop(0, NCHUNK, body, 0)


def mxu_kernel(a32_ref, aab_ref, o_ref, d_ref, t_out, u_out, v_out, *, nab: int):
    ox, oy, oz = o_ref[0:1], o_ref[1:2], o_ref[2:3]
    dx, dy, dz = d_ref[0:1], d_ref[1:2], d_ref[2:3]
    one = jnp.ones((1, TR), F32)
    zer = jnp.zeros((1, TR), F32)
    B32 = jnp.concatenate([ox, oy, oz, one, dx, dy, dz, zer], axis=0)  # (8, TR)
    Bab = jnp.concatenate(
        [ox, oy, oz, one, dx, dy, dz, zer,
         jnp.abs(ox), jnp.abs(oy), jnp.abs(oz), one,
         jnp.abs(dx), jnp.abs(dy), jnp.abs(dz), zer],
        axis=0,
    ).astype(jnp.bfloat16)  # (16, TR)
    t_out[:, :] = jnp.full((1, TR), 1e5, F32)
    u_out[:, :] = jnp.zeros((1, TR), F32)
    v_out[:, :] = jnp.zeros((1, TR), F32)
    dn = (((0,), (0,)), ((), ()))

    def body(c, _):
        a32 = a32_ref[c]  # (8, P32)
        aab = aab_ref[c]  # (16, P16)
        m32 = jax.lax.dot_general(a32, B32, dn, preferred_element_type=F32)
        mab = jax.lax.dot_general(aab, Bab, dn, preferred_element_type=F32)
        blk32 = lambda k: m32[k*TC:(k+1)*TC]
        blkab = lambda k: mab[k*TC:(k+1)*TC]
        Oz, Dz = blk32(0), blk32(1)
        Ox32, Oy32, Dx32, Dy32 = blk32(2), blk32(3), blk32(4), blk32(5)
        Ox, Oy, Dx, Dy = blkab(0), blkab(1), blkab(2), blkab(3)
        s_ox, s_oy, s_dx, s_dy = blkab(4), blkab(5), blkab(6), blkab(7)

        t = -Oz / Dz
        u = Ox + t * Dx
        v = Oy + t * Dy
        d12 = jnp.float32(2**-7 + 2**-5)
        d1f = jnp.float32(2**-7)
        error_u = (d12*s_ox + t*d12*s_dx + d1f*(jnp.abs(Ox) + 3*jnp.abs(t*Dx))) * 0.2
        error_v = (d12*s_oy + t*d12*s_dy + d1f*(jnp.abs(Oy) + 3*jnp.abs(t*Dy))) * 0.2
        u32 = Ox32 + t * Dx32
        v32 = Oy32 + t * Dy32
        ok32 = (u32 > 0) & (v32 > 0) & (u32 + v32 < 1)
        w = 1.0 - u - v
        in_band = lambda x, err: (x >= -err) & (x <= 0)
        ambiguous = in_band(u, error_u) | in_band(v, error_v) | in_band(w, error_u + error_v)
        dtype_accept = (u > -error_u) & (v > -error_v) & (u + v < 1 + error_u + error_v)
        u_sel = jnp.where(ambiguous, u32, u)
        v_sel = jnp.where(ambiguous, v32, v)
        accept = ((ambiguous & ok32) | (~ambiguous & dtype_accept)) & (t > 0) & jnp.isfinite(t)

        t_masked = jnp.where(accept, t, jnp.inf)
        t_min = jnp.min(t_masked, axis=0, keepdims=True)
        at_min = t_masked == t_min
        neg = jnp.float32(-3e38)
        u_win = jnp.max(jnp.where(at_min, u_sel, neg), axis=0, keepdims=True)
        v_win = jnp.max(jnp.where(at_min, v_sel, neg), axis=0, keepdims=True)
        better = jnp.isfinite(t_min) & (t_min < t_out[:, :])
        t_out[:, :] = jnp.where(better, t_min, t_out[:, :])
        u_out[:, :] = jnp.where(better, u_win, u_out[:, :])
        v_out[:, :] = jnp.where(better, v_win, v_out[:, :])
        return 0

    jax.lax.fori_loop(0, NCHUNK, body, 0)


def pad128(x):
    return ((x + 127) // 128) * 128


def build_tables(key, nchunk, tc):
    TI = nchunk * tc
    k1, k2 = jax.random.split(key)
    n_f32 = jax.random.normal(k1, (TI, 9), F32)
    e = jax.random.normal(k2, (TI, 3), F32) * 0.1
    n_dt = n_f32.astype(jnp.bfloat16)

    # A32t (NC, 8, P32): blocks [Oz, Dz, Ox32, Oy32, Dx32, Dy32]
    z3 = jnp.zeros((TI, 3), F32)
    z1 = jnp.zeros((TI, 1), F32)
    rows = [
        jnp.concatenate([n_f32[:, 6:9], e[:, 2:3], z3, z1], 1),  # Oz
        jnp.concatenate([z3, z1, n_f32[:, 6:9], z1], 1),          # Dz
        jnp.concatenate([n_f32[:, 0:3], e[:, 0:1], z3, z1], 1),  # Ox32
        jnp.concatenate([n_f32[:, 3:6], e[:, 1:2], z3, z1], 1),  # Oy32
        jnp.concatenate([z3, z1, n_f32[:, 0:3], z1], 1),          # Dx32
        jnp.concatenate([z3, z1, n_f32[:, 3:6], z1], 1),          # Dy32
    ]
    a32 = jnp.stack(rows, 1).reshape(nchunk, tc * 6 if False else -1, 8)
    # want (NC, blocks*tc, 8) with block-major inside chunk:
    a32 = jnp.stack([r.reshape(nchunk, tc, 8) for r in rows], 1).reshape(nchunk, 6 * tc, 8)
    P32 = pad128(6 * tc)
    a32t = jnp.swapaxes(a32, 1, 2)  # (NC, 8, 6tc)
    a32t = jnp.pad(a32t, ((0, 0), (0, 0), (0, P32 - 6 * tc)))

    nf = n_dt.astype(F32)
    ea = jnp.abs(e)
    na = jnp.abs(nf)
    z8 = jnp.zeros((TI, 8), F32)
    rows_ab = [
        jnp.concatenate([nf[:, 0:3], e[:, 0:1], z3, z1, z8], 1),   # Ox
        jnp.concatenate([nf[:, 3:6], e[:, 1:2], z3, z1, z8], 1),   # Oy
        jnp.concatenate([z3, z1, nf[:, 0:3], z1, z8], 1),           # Dx
        jnp.concatenate([z3, z1, nf[:, 3:6], z1, z8], 1),           # Dy
        jnp.concatenate([z8, na[:, 0:3], ea[:, 0:1], z3, z1], 1),  # Sox
        jnp.concatenate([z8, na[:, 3:6], ea[:, 1:2], z3, z1], 1),  # Soy
        jnp.concatenate([z8, z3, z1, na[:, 0:3], z1], 1),           # Sdx
        jnp.concatenate([z8, z3, z1, na[:, 3:6], z1], 1),           # Sdy
    ]
    aab = jnp.stack([r.reshape(nchunk, tc, 16) for r in rows_ab], 1).reshape(nchunk, 8 * tc, 16)
    P16 = pad128(8 * tc)
    aabt = jnp.swapaxes(aab, 1, 2).astype(jnp.bfloat16)
    aabt = jnp.pad(aabt, ((0, 0), (0, 0), (0, P16 - 8 * tc)))
    return n_dt, n_f32, e, a32t, aabt


def main():
    key = jax.random.PRNGKey(0)
    n_dt, n_f32, e, a32t, aabt = build_tables(key, NCHUNK, TC)
    ko, kd = jax.random.split(jax.random.PRNGKey(1))
    o = jax.random.normal(ko, (3, R), F32)
    d = jax.random.normal(kd, (3, R), F32)

    grid = R // TR
    ray_block = lambda rows: pl.BlockSpec((rows, TR), lambda i: (0, i), memory_space=pltpu.VMEM)
    const3 = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    outs = [jax.ShapeDtypeStruct((1, R), F32)] * 3

    vpu = pl.pallas_call(
        vpu_kernel,
        grid=(grid,),
        in_specs=[const3(n_dt.shape), const3(n_f32.shape), const3(e.shape), ray_block(3), ray_block(3)],
        out_specs=[ray_block(1)] * 3,
        out_shape=outs,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )
    mxu = pl.pallas_call(
        functools.partial(mxu_kernel, nab=8),
        grid=(grid,),
        in_specs=[const3(a32t.shape), const3(aabt.shape), ray_block(3), ray_block(3)],
        out_specs=[ray_block(1)] * 3,
        out_shape=outs,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    def run(fn, *args):
        f = jax.jit(lambda *a: fn(*a))
        t0 = time.perf_counter()
        r = f(*args)
        _ = np.asarray(r[0][0, :1])
        compile_and_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            r = f(*args)
        _ = np.asarray(r[0][0, :1])
        dt = (time.perf_counter() - t0) / n
        return r, dt, compile_and_first

    rv, t_vpu, c_vpu = run(vpu, n_dt, n_f32, e, o, d)
    rm, t_mxu, c_mxu = run(mxu, a32t, aabt, o, d)
    print(f"TC={TC} NCHUNK={NCHUNK} R={R}")
    print(f"VPU body: {t_vpu*1e3:8.2f} ms  (compile+first {c_vpu:.1f}s)  {R*NCHUNK/t_vpu/1e6:.0f} Mray-chunks/s")
    print(f"MXU body: {t_mxu*1e3:8.2f} ms  (compile+first {c_mxu:.1f}s)  {R*NCHUNK/t_mxu/1e6:.0f} Mray-chunks/s")
    tv, tm = np.asarray(rv[0]), np.asarray(rm[0])
    hit_v, hit_m = tv < 1e5, tm < 1e5
    agree = (hit_v == hit_m).mean()
    both = hit_v & hit_m
    terr = np.abs(tv[both] - tm[both]).max() if both.any() else 0.0
    print(f"hit agreement {agree:.6f}  max|t| diff {terr:.2e}  hits {hit_v.mean():.3f}/{hit_m.mean():.3f}")


if __name__ == "__main__":
    main()
