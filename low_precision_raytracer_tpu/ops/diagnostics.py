"""Low-precision diagnostics (SURVEY.md §5.5): metrics the reference cannot
observe but this framework should, chiefly the **fp32-fallback rate** — the
fraction of dtype triangle tests that land inside the rounding-error
ambiguity band and are re-run in fp32.  It quantifies the low-precision
hypothesis per scene/precision."""

from __future__ import annotations

import jax.numpy as jnp

from low_precision_raytracer_tpu.config import Precision

F32 = jnp.float32


def fallback_rate(scene, frame, origins, directions, prec: Precision):
    """-> dict(tested, ambiguous, rate): counts over all (ray, instance-
    triangle) dtype tests for the given ray batch (dense-mode scenes)."""
    assert frame.dense_n is not None, "fallback_rate needs dense coefficients"
    dt = prec.dtype
    c = frame.dense_center
    o = (origins.astype(F32) - c).astype(dt)
    d = directions.astype(dt)

    TI = frame.dense_n.shape[0]
    n_dt = frame.dense_n.reshape(TI, 9)
    e = frame.dense_e
    n0 = n_dt[:, 0:3].T
    n1 = n_dt[:, 3:6].T
    n2f = frame.dense_n_f32.reshape(TI, 9)[:, 6:9].T

    mm = lambda a, b: jnp.dot(a, b, preferred_element_type=F32)
    Ox = mm(o, n0) + e[:, 0]
    Dx = mm(d, n0)
    Oy = mm(o, n1) + e[:, 1]
    Dy = mm(d, n1)
    Oz = mm(o.astype(F32), n2f) + e[:, 2]
    Dz = mm(d.astype(F32), n2f)
    t = -Oz / Dz
    u = Ox + t * Dx
    v = Oy + t * Dy

    # KEEP IN SYNC with the canonical band algebra in ops/triangle.py
    # (:103-115) — this diagnostic re-states it in the dense matmul form
    # (like ops/dense.py) because it must count ALL (ray, tri) tests, not
    # the per-hit scalar path; if the 0.2 scale, the one-sided band, or the
    # delta propagation changes there, change it here or the reported
    # fp32-fallback rate stops measuring what the kernels actually do
    d1 = jnp.asarray(prec.delta1, F32)
    d2 = jnp.asarray(prec.delta2, F32)
    d12 = d1 + d2
    s_ox = mm(jnp.abs(o), jnp.abs(n0)) + jnp.abs(e[:, 0])
    s_dx = mm(jnp.abs(d), jnp.abs(n0))
    s_oy = mm(jnp.abs(o), jnp.abs(n1)) + jnp.abs(e[:, 1])
    s_dy = mm(jnp.abs(d), jnp.abs(n1))
    error_u = (d12 * s_ox + t * d12 * s_dx + d1 * (jnp.abs(Ox) + 3 * jnp.abs(u - Ox))) * 0.2
    error_v = (d12 * s_oy + t * d12 * s_dy + d1 * (jnp.abs(Oy) + 3 * jnp.abs(v - Oy))) * 0.2

    w = 1.0 - u - v
    in_band = lambda x, err: (x >= -err) & (x <= 0)
    # only forward, finite tests count (the reference's outer `if`)
    valid = jnp.isfinite(t) & (t > 0)
    ambiguous = (
        in_band(u, error_u) | in_band(v, error_v) | in_band(w, error_u + error_v)
    ) & valid
    tested = jnp.sum(valid)
    amb = jnp.sum(ambiguous)
    return dict(
        tested=tested,
        ambiguous=amb,
        rate=amb.astype(F32) / jnp.maximum(tested, 1).astype(F32),
    )
