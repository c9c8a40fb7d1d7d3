"""gather2x2 path parity: the shifted-select fast path must agree exactly
with the flat-take path wherever taps matter, and the `lax.cond` dispatch
must fall back for anchors outside the residual window (SURVEY.md 2.18 —
the temporal fetch is the hot stage, so it has two implementations)."""

import jax
import jax.numpy as jnp
import numpy as np

from low_precision_raytracer_tpu.ops.reproject import (
    RES_K,
    _gather2x2_take,
    gather2x2,
)


def _mk(H=33, W=47, C=5, seed=0):
    k = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    arr = jax.random.normal(k1, (H, W, C), jnp.float32)
    # anchors: pixel + global motion + residual in [-K, K], clipped to the
    # padded range like _footprint does
    my, mx = 3, -2
    ry = jax.random.randint(k2, (H, W), -RES_K, RES_K + 1)
    rx = jax.random.randint(k3, (H, W), -RES_K, RES_K + 1)
    row = jnp.arange(H)[:, None]
    col = jnp.arange(W)[None, :]
    by = jnp.clip(row + 1 + my + ry, 0, H)
    bx = jnp.clip(col + 1 + mx + rx, 0, W)
    care = jax.random.bernoulli(k4, 0.9, (H, W))
    return arr, by.astype(jnp.int32), bx.astype(jnp.int32), care


def test_shifted_matches_take_where_care():
    arr, by, bx, care = _mk()
    ref = _gather2x2_take(arr, by, bx)
    out = gather2x2(arr, by, bx, care=care)
    m = np.asarray(care)[..., None, None]
    np.testing.assert_array_equal(
        np.asarray(out) * m, np.asarray(ref) * m
    )


def test_out_of_window_falls_back_exactly():
    arr, by, bx, care = _mk(seed=1)
    # one caring pixel far outside the residual window -> take path for
    # the whole frame, exact everywhere
    by = by.at[5, 5].set(0)
    bx = bx.at[5, 5].set(40)
    care = care.at[5, 5].set(True)
    ref = _gather2x2_take(arr, by, bx)
    out = gather2x2(arr, by, bx, care=care)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_channelless_and_no_care():
    arr, by, bx, _ = _mk(C=1)
    a2 = arr[..., 0]
    ref = _gather2x2_take(arr, by, bx)[..., 0]
    np.testing.assert_array_equal(np.asarray(gather2x2(a2, by, bx)), np.asarray(ref))
