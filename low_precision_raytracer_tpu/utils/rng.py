"""Production RNG keys.

The reference draws its per-pixel randoms from curand XORWOW states seeded
once at startup (`rt/rtrt/cuda.hpp:1901-1916`) — generator choice is a
throughput decision there, not a reproducibility contract.  Same here: on
TPU the default threefry key costs real frame time (measured ~5.6 ms/frame
at 1080p just for the shade stage's gaussian draws; the hardware-backed
'rbg' generator makes the same draws ~free), so production entry points
(Renderer, bench, viewer, CLI) take their keys from :func:`render_key`,
which picks `rbg` on TPU and threefry elsewhere.

Tests keep constructing `jax.random.PRNGKey` directly — threefry is
deterministic across backends, so golden images and cross-backend oracles
stay byte-stable regardless of this switch.
"""

from __future__ import annotations

import jax


def render_key(seed: int = 0):
    """Frame-loop RNG key: hardware `rbg` on TPU, threefry elsewhere."""
    if jax.default_backend() == "tpu":
        return jax.random.key(seed, impl="rbg")
    return jax.random.PRNGKey(seed)
