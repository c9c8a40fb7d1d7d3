"""Per-stage timing harness (reference §5.1: `Renderer::timing` +
the ImGui statistics tree, `rt/gui/imgui_window.cu:86-91, 492-500`).

Production frames run as one fused jit program; the profiler
(render/profile.py) re-runs the stages with host-transfer sync between
them ONLY in profile mode, producing a timing dict keyed by the
reference's stage names."""

from __future__ import annotations

import jax
import jax.numpy as jnp

# the reference's 12 stage names (`rt/gui/imgui_window.cu:154-328`)
STAGE_NAMES = [
    "Primary Ray",
    "Generate Temporal Map",
    "Pixel Shade #1",
    "Trace DI Ray #1",
    "Accumulate DI #1",
    "Trace GI #1",
    "Shade #2",
    "Trace DI #2",
    "Accumulate DI #2",
    "SVGF",
    "TAA",
    "Backup Temporal Data",
]


def sync(tree):
    """Force completion of EVERY leaf's producing computation.
    `block_until_ready` is not trustworthy on tunneled platforms (axon
    returns early); a host transfer of one element per leaf is.  Each
    transfer is a tunnel ROUND TRIP (~tens of ms here), so use this only
    when the tree's leaves may come from separately dispatched programs;
    for the output of ONE jit call use `sync_one`."""
    import numpy as np

    for leaf in jax.tree.leaves(tree):
        if not (hasattr(leaf, "shape") and leaf.size):
            continue
        if jnp.issubdtype(leaf.dtype, jax.dtypes.extended):
            # typed PRNG keys (key<rbg> on TPU) reject np.asarray; transfer
            # their raw key data instead — same completion event
            leaf = jax.random.key_data(leaf)
        np.asarray(leaf.reshape(-1)[:1])
    return tree


def sync_one(tree):
    """Force completion of a SINGLE jit program's output tree: every leaf
    of one executable shares its completion event, so transferring one
    element of one leaf blocks until the whole program is done.  One
    tunnel round trip instead of one per leaf — per-stage profiling with
    `sync` overstated every stage by leaves x RTT (measured: a warmed
    12 ms primary-ray stage read as ~390 ms through the tunnel)."""
    import numpy as np

    for leaf in jax.tree.leaves(tree):
        if not (hasattr(leaf, "shape") and leaf.size):
            continue
        if jnp.issubdtype(leaf.dtype, jax.dtypes.extended):
            leaf = jax.random.key_data(leaf)
        np.asarray(leaf.reshape(-1)[:1])
        break
    return tree
