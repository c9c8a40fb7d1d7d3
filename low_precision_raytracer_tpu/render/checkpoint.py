"""Checkpoint / resume (SURVEY.md §5.4).

The reference persists nothing (its temporal state is intra-session only).
Here the carried FrameState pytree + RNG key + frame index serialize to one
.npz so animated sequences resume deterministically."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from low_precision_raytracer_tpu.ops.svgf import SVGFState
from low_precision_raytracer_tpu.render.framestate import FrameState

_FIELDS = [
    "svgf_colored.miu1", "svgf_colored.miu2", "svgf_colored.color_history",
    "svgf_white.miu1", "svgf_white.miu2", "svgf_white.color_history",
    "taa_history", "svgf_frame_count", "last_mesh_id", "last_prim",
    "last_l2w", "last_w2c",
]


def save_checkpoint(path: str, state: FrameState, key, frame_index: int) -> None:
    leaves = {
        "svgf_colored.miu1": state.svgf_colored.miu1,
        "svgf_colored.miu2": state.svgf_colored.miu2,
        "svgf_colored.color_history": state.svgf_colored.color_history,
        "svgf_white.miu1": state.svgf_white.miu1,
        "svgf_white.miu2": state.svgf_white.miu2,
        "svgf_white.color_history": state.svgf_white.color_history,
        "taa_history": state.taa_history,
        "svgf_frame_count": state.svgf_frame_count,
        "last_mesh_id": state.last_mesh_id,
        "last_prim": state.last_prim,
        "last_l2w": state.last_l2w,
        "last_w2c": state.last_w2c,
    }
    arrays = {}
    dtypes = {}
    for k, v in leaves.items():
        a = np.asarray(v)
        dtypes[k] = str(a.dtype)
        # bf16 has no portable npz dtype; store as f32 + original dtype tag
        arrays[k] = a.astype(np.float32) if "bfloat16" in dtypes[k] else a
    np.savez(
        path,
        __key__=np.asarray(jax.random.key_data(key)),
        __frame_index__=np.asarray(frame_index),
        __dtypes__=np.asarray(list(f"{k}|{dtypes[k]}" for k in leaves)),
        **arrays,
    )


def load_checkpoint(path: str):
    """-> (FrameState, key, frame_index)."""
    import ml_dtypes

    z = np.load(path, allow_pickle=False)
    dtypes = dict(s.split("|") for s in z["__dtypes__"].tolist())

    def get(k):
        a = z[k]
        if "bfloat16" in dtypes[k]:
            a = a.astype(ml_dtypes.bfloat16)
        return jnp.asarray(a)

    state = FrameState(
        svgf_colored=SVGFState(
            miu1=get("svgf_colored.miu1"),
            miu2=get("svgf_colored.miu2"),
            color_history=get("svgf_colored.color_history"),
        ),
        svgf_white=SVGFState(
            miu1=get("svgf_white.miu1"),
            miu2=get("svgf_white.miu2"),
            color_history=get("svgf_white.color_history"),
        ),
        taa_history=get("taa_history"),
        svgf_frame_count=get("svgf_frame_count"),
        last_mesh_id=get("last_mesh_id"),
        last_prim=get("last_prim"),
        last_l2w=get("last_l2w"),
        last_w2c=get("last_w2c"),
    )
    key = jax.random.wrap_key_data(jnp.asarray(z["__key__"]))
    return state, key, int(z["__frame_index__"])
