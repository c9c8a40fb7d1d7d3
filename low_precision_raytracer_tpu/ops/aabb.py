"""Ray-AABB slab tests (`rt/rtrt/cuda.hpp:70-149`).

Two variants with different precision slop, exactly as the reference:
- scene (TLAS) test accepts ``t1max <= t2min + slop_add`` (absolute 0.02,
  `rt/rtrt/cuda.hpp:98`);
- object (BLAS) test accepts ``t1max <= t2min * slop_mul`` (relative
  1.001953, `rt/rtrt/cuda.hpp:139`).

Both skip non-finite axes (division by zero direction components) and fail
when no axis is finite.  All math runs in the ray dtype; the slop constants
compensate low-precision error.  Vectorized over arbitrary leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def _slab(o, d, lo, hi):
    dt = o.dtype
    t1 = (lo - o) / d
    t2 = (hi - o) / d
    a = jnp.minimum(t1, t2)
    b = jnp.maximum(t1, t2)
    finite = jnp.isfinite(a) & jnp.isfinite(b)
    big = jnp.asarray(jnp.finfo(jnp.float32).max, dt)
    t1max = jnp.max(jnp.where(finite, a, -big), axis=-1)
    t2min = jnp.min(jnp.where(finite, b, big), axis=-1)
    updated = jnp.any(finite, axis=-1)
    return t1max, t2min, updated


def ray_aabb_scene(o, d, lo, hi, slop_add):
    """TLAS slab test -> (hit, t1max, t2min)."""
    t1max, t2min, updated = _slab(o, d, lo, hi)
    s = jnp.asarray(slop_add, o.dtype)
    hit = updated & (t1max <= t2min + s) & (0 <= t2min + s)
    return hit, t1max, t2min


def ray_aabb_object(o, d, lo, hi, slop_mul):
    """BLAS slab test -> (hit, t1max, t2min)."""
    t1max, t2min, updated = _slab(o, d, lo, hi)
    s = jnp.asarray(slop_mul, o.dtype)
    hit = updated & (t1max <= t2min * s) & (0 <= t2min)
    return hit, t1max, t2min
