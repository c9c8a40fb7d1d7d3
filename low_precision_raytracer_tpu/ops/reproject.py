"""Temporal reprojection (`rt/rtrt/cuda.hpp:2230-2416`).

Reprojects each pixel: world position -> object local (current W2L) ->
last-frame world (stored per-mesh L2W) -> last-frame clip (stored W2C) ->
screen, then builds TWO 2x2 bilinear maps (SURVEY.md 2.18):
- the SVGF map, validated per tap by same-mesh-id with weight
  renormalization and frame-count propagation;
- the TAA map, with stochastically jittered bilinear taps and the
  same-object test only gating the frame count.

A temporal map is a dict of SoA arrays:
  {frame_count (H,W) i32, weights (H,W,4) dtype, px/py (H,W,4) i32}.

Deviation: the reference increments the propagated SVGF frame count once per
*tap loop iteration* (up to +4/frame, `rt/rtrt/cuda.hpp:2330-2333`), which
reads like a typo for the SVGF paper's +1/frame; we increment once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_linear(tmap, arr, default):
    """Weighted 2x2 history gather (`sample_linear`,
    `rt/rtrt/cuda.hpp:1085-1115`).  arr: (H, W) or (H, W, C)."""
    H, W = arr.shape[:2]
    flat = arr.reshape(H * W, -1)
    idx = tmap["py"] * W + tmap["px"]  # (H, W, 4)
    vals = jnp.take(flat, idx.reshape(-1), axis=0, mode="clip").reshape(
        H, W, 4, flat.shape[-1]
    )
    wgt = tmap["weights"].astype(vals.dtype)[..., None]  # (H, W, 4, 1)
    num = jnp.sum(vals * wgt, axis=2)
    den = jnp.sum(wgt, axis=2)
    out = num / den
    valid = tmap["frame_count"] > 0
    res = jnp.where(valid[..., None], out, default.reshape(H, W, -1))
    if arr.ndim == 2:
        return res[..., 0].astype(arr.dtype)
    return res.astype(arr.dtype)


def _bilinear_taps(fx, fy, trunc=True):
    """4 integer taps + bilinear weights; the reference truncates toward
    zero ((int) cast, `rt/rtrt/cuda.hpp:2310-2313`)."""
    lx = jnp.trunc(fx) if trunc else jnp.floor(fx)
    ly = jnp.trunc(fy) if trunc else jnp.floor(fy)
    ux = lx + 1
    uy = ly + 1
    xs = jnp.stack([lx, lx, ux, ux], axis=-1)
    ys = jnp.stack([ly, uy, ly, uy], axis=-1)
    w = jnp.stack(
        [
            (ux - fx) * (uy - fy),
            (ux - fx) * (fy - ly),
            (fx - lx) * (uy - fy),
            (fx - lx) * (fy - ly),
        ],
        axis=-1,
    )
    return xs, ys, w


def generate_temporal_maps(
    g,
    frame,
    state,
    width: int,
    height: int,
    dtype,
    key,
):
    """`generate_temporal_map_step1/2` (`rt/rtrt/cuda.hpp:2265-2416`).

    g: current G-buffer dict with (H, W) leading dims.
    state: FrameState (last_mesh_id, last_l2w, last_w2c, svgf_frame_count).
    -> (svgf_map, taa_map).
    """
    dt = dtype
    H, W = height, width
    valid = g["valid"]

    obj = g["obj"]
    mesh_p = jnp.take(frame.obj_mesh, obj, mode="clip")  # objectid of pixel

    # world -> local -> last world -> last clip.  The reference chains three
    # Mat4<DataT> multiplies per pixel (`rt/rtrt/cuda.hpp:2286-2289`); on TPU
    # we compose ONE 4x4 per object (O tiny) and apply it per pixel via a
    # one-hot matmul gather — no per-pixel matrix gathers.
    O = frame.obj_w2l.shape[0]
    l2w_last_o = jnp.take(state.last_l2w, frame.obj_mesh, axis=0)  # (O, 4, 4)
    comp = (
        state.last_w2c.astype(dt)[None] @ l2w_last_o.astype(dt) @ frame.obj_w2l.astype(dt)
    )  # (O, 4, 4)
    onehot_o = (
        obj.reshape(-1)[:, None] == jnp.arange(O, dtype=jnp.int32)[None, :]
    ).astype(dt)
    comp_px = jnp.dot(
        onehot_o, comp.reshape(O, 16), preferred_element_type=jnp.float32
    ).astype(dt).reshape(H, W, 4, 4)

    pos = g["position"].astype(dt)
    p4 = jnp.concatenate([pos, jnp.ones((H, W, 1), dt)], axis=-1)
    clip = (comp_px @ p4[..., None])[..., 0]
    g_fx = (1 + clip[..., 0] / clip[..., 3]) / 2 * W
    g_fy = (1 + clip[..., 1] / clip[..., 3]) / 2 * H

    last_mesh = state.last_mesh_id  # (H, W) i32, -1 = empty

    def gather_last_mesh(xs, ys):
        inb = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
        xi = jnp.clip(xs.astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(ys.astype(jnp.int32), 0, H - 1)
        lm = jnp.take(last_mesh.reshape(-1), yi * W + xi, mode="clip").reshape(xs.shape)
        return inb, xi, yi, lm

    # ---- SVGF map (strict same-object validation)
    xs, ys, w = _bilinear_taps(g_fx - jnp.asarray(0.5, dt), g_fy - jnp.asarray(0.5, dt))
    inb, xi, yi, lm = gather_last_mesh(xs, ys)
    tap_ok = inb & (lm == mesh_p[..., None]) & valid[..., None]
    w_s = jnp.where(tap_ok, w, 0).astype(dt)
    total = jnp.sum(w_s, axis=-1)
    any_ok = total > 0
    w_s = jnp.where(any_ok[..., None], w_s / jnp.where(any_ok, total, 1)[..., None], 0)
    # frame-count propagation: max over accepted taps, +1, capped at 255
    fc = jnp.take(state.svgf_frame_count.reshape(-1), yi * W + xi, mode="clip").reshape(
        xs.shape
    )
    fc = jnp.max(jnp.where(tap_ok, fc, 0), axis=-1)
    new_count = jnp.where(any_ok & valid, jnp.minimum(fc + 1, 255), 0).astype(jnp.int32)
    svgf_map = dict(frame_count=new_count, weights=w_s, px=xi, py=yi)

    # ---- TAA map (jittered bilinear, loose validation)
    kx, ky = jax.random.split(key)
    jx = jax.random.uniform(kx, (H, W), jnp.float32).astype(dt)
    jy = jax.random.uniform(ky, (H, W), jnp.float32).astype(dt)
    xs2, ys2, w2 = _bilinear_taps(g_fx - jx, g_fy - jy)
    inb2, xi2, yi2, lm2 = gather_last_mesh(xs2, ys2)
    w_t = jnp.where(inb2, w2, 0).astype(dt)
    total2 = jnp.sum(w_t, axis=-1)
    any2 = total2 > 0
    w_t = jnp.where(any2[..., None], w_t / jnp.where(any2, total2, 1)[..., None], 0)
    same_obj = jnp.any(inb2 & (lm2 == mesh_p[..., None]), axis=-1)
    taa_count = jnp.where(same_obj & valid & any2, 1, 0).astype(jnp.int32)
    taa_map = dict(frame_count=taa_count, weights=w_t, px=xi2, py=yi2)

    return svgf_map, taa_map


def backup_temporal_data(g, frame, state, clean_w2c):
    """`copy_last_frame_pixel_id` + `copy_last_frame_transform`
    (`rt/rtrt/cuda.hpp:2230-2263`): store per-pixel mesh id (-1 on empty),
    per-mesh L2W (instances collide last-writer-wins, like the reference's
    `last_frame_L2W[objectid] = L2W`), and the current W2C.

    Returns the updated fields for FrameState."""
    mesh_id = jnp.where(
        g["valid"], jnp.take(frame.obj_mesh, g["obj"], mode="clip"), -1
    ).astype(jnp.int32)
    n_meshes = state.last_l2w.shape[0]
    # scatter obj L2W by mesh id (duplicates: last writer wins, same as ref)
    new_l2w = state.last_l2w.at[frame.obj_mesh].set(frame.obj_l2w.astype(state.last_l2w.dtype))
    return mesh_id, g["tri"].astype(jnp.int32), new_l2w, clean_w2c
