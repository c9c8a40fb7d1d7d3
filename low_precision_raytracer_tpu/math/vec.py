"""jnp device vector helpers over ``(..., 3)`` arrays.

Counterparts of the reference's device Matrix/Vec operators
(`rt/math/matrix.hpp:722-812`) used inside jitted kernels.  All helpers are
dtype-preserving: they compute in whatever dtype the inputs carry, so the
low-precision pipeline stays low-precision unless a caller explicitly widens.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a, b):
    """Batched 3-vector dot product -> (...,)."""
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def normalize(v, eps=None):
    """v / |v| (`Matrix::normalized`, `rt/math/matrix.hpp`).  Like the
    reference, no epsilon guard by default — NaN/Inf are expected in-band
    values that downstream filters launder (SURVEY.md §5.3)."""
    n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    if eps is not None:
        n = jnp.maximum(n, jnp.asarray(eps, v.dtype))
    return v / n


def reflect(v, n):
    """`symmetric_vector` (`rt/math/matrix.hpp:634-641`): mirror of v about
    the normalized normal n: 2 (v.n) n - v.  NOTE this is the reflection of
    the *view* vector convention the reference uses (not GLSL reflect)."""
    return 2.0 * dot(v, n)[..., None] * n - v


def transform_point(m, p):
    """Apply (..., 4, 4) matrix to (..., 3) points with w-divide
    (`Ray::transformed`, `rt/rtrt/cuda.hpp:42-47`)."""
    out = (
        m[..., :3, :3] @ p[..., :, None]
    )[..., 0] + m[..., :3, 3]
    w = dot(m[..., 3, :3], p) + m[..., 3, 3]
    return out / w[..., None]


def transform_dir(m, d):
    """Apply (..., 4, 4) matrix to (..., 3) directions (w = 0)."""
    return (m[..., :3, :3] @ d[..., :, None])[..., 0]


def luminance(rgb):
    """Rec.709 luma as used by SVGF (`rt/rtrt/cuda.hpp:1240-1242`)."""
    w = jnp.asarray([0.2126, 0.7152, 0.0722], rgb.dtype)
    return jnp.sum(rgb * w, axis=-1)


def value_or(x, default):
    """Replace non-finite entries elementwise (`rt/rtrt/cuda.hpp:1168-1177`)."""
    return jnp.where(jnp.isfinite(x), x, default)
