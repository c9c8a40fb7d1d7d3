"""Per-stage timing harness (reference §5.1: `Renderer::timing` +
the ImGui statistics tree, `rt/gui/imgui_window.cu:86-91, 492-500`).

Production frames run as one fused jit program; the profiler
(render/profile.py) re-runs the stages with host-transfer sync between
them ONLY in profile mode, producing a timing dict keyed by the
reference's stage names."""

from __future__ import annotations

import time

import jax

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
    returns early); a host transfer of one element per leaf is.  Leaves of
    one jit program share a completion event, so the per-leaf transfers
    are cheap; separately dispatched programs each get synced."""
    import numpy as np

    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "shape"):
            np.asarray(leaf.reshape(-1)[:1]) if leaf.size else None
    return tree


def time_fn(fn, *args, warmup=1, iters=10, **kw):
    """Wall-clock a jitted callable with host-transfer sync."""
    for _ in range(warmup):
        sync(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
        sync(out)
    return (time.perf_counter() - t0) / iters
