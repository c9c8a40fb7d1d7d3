"""Production RNG keys.

One helper so every production entry point (Renderer, bench, viewer, CLI)
draws from the same generator — and so the generator choice stays a
measured decision.  Round-3 measurements on TPU v5e, Cornell 1080p bf16,
full frame:

- threefry + gaussian draws: 78.1 ms  (erfinv chains + 1.5x the bits)
- rbg      + gaussian draws: 86.1 ms  (!) — XLA's stateful RngBitGenerator
  did not fuse with the erfinv chains; every draw site materialized buffers
- threefry + uniforms-only (trig hemisphere sampler): 68.2 ms
- rbg      + uniforms-only:                           67.3 ms  <- current

So: the big win was removing `normal()` draws from the shade stage
(ops/sampling.py `uniform_hemisphere_trig`); generator choice is then a
~1 ms edge to hardware rbg.  Re-measure the FULL FRAME before changing
either half — the standalone draw micro-bench points the wrong way.

Tests keep constructing `jax.random.PRNGKey` (threefry) directly —
deterministic across backends, so golden images and cross-backend oracles
are unaffected by this switch.
"""

from __future__ import annotations

import jax


def render_key(seed: int = 0):
    """Frame-loop RNG key: hardware `rbg` on TPU, threefry elsewhere."""
    if jax.default_backend() == "tpu":
        return jax.random.key(seed, impl="rbg")
    return jax.random.PRNGKey(seed)
