"""Pixel-picker debugging (reference 2.23: `DebugInfo` constant + the
`debug_thread()` predicate for printf debugging, `rt/rtrt/cuda.hpp:25-36`,
`rt/gui/imgui_window.hpp:9-13`).

In JAX a debug pixel is just an index: `debug_pixel` prints any per-pixel
quantity from inside a jitted program via `jax.debug.print`, and
`pick_pixel` extracts a full per-pixel record on the host."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def debug_pixel(label: str, array, x: int, y: int):
    """Print array[y, x] (or flat array[y*W+x] callers pre-index) from inside
    a jitted function.  Usage inside render code:

        debug_pixel("albedo", albedo2d, x=412, y=200)
    """
    jax.debug.print(label + " @({x},{y}) = {v}", x=x, y=y, v=array[y, x])


def pick_pixel(aux: dict, x: int, y: int, height: int, width: int) -> dict:
    """Host-side pixel inspector over the renderer's aux dict.  Only entries
    whose leading dims are the (height, width) pixel grid are indexed —
    non-pixel arrays (transform stacks, per-object tables) whose first two
    dims merely admit [y, x] would otherwise be reported as pixel data."""
    out = {}
    for k, v in aux.items():
        if (
            hasattr(v, "ndim")
            and v.ndim >= 2
            and v.shape[0] == height
            and v.shape[1] == width
        ):
            out[k] = jax.device_get(v[y, x])
    return out
