"""Per-stage timing harness (reference §5.1: `Renderer::timing` +
the ImGui statistics tree, `rt/gui/imgui_window.cu:86-91, 492-500`).

Production frames run as one fused jit program; the profiler re-runs the
stages with `block_until_ready` between them ONLY in profile mode, producing
a timing dict keyed by the reference's stage names."""

from __future__ import annotations

import time
from contextlib import contextmanager

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


class StageTimer:
    def __init__(self):
        self.stats: dict[str, float] = {}

    @contextmanager
    def stage(self, name: str, *sync_values):
        t0 = time.perf_counter()
        yield
        for v in sync_values:
            jax.block_until_ready(v)
        self.stats[name] = time.perf_counter() - t0

    def record(self, name: str, fn, *args, **kw):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        self.stats[name] = time.perf_counter() - t0
        return out

    def fps(self) -> float:
        total = sum(self.stats.values())
        return 1.0 / total if total > 0 else float("inf")

    def report(self) -> str:
        lines = [f"{k:>24s}: {v * 1e3:8.3f} ms" for k, v in self.stats.items()]
        lines.append(f"{'TOTAL':>24s}: {sum(self.stats.values()) * 1e3:8.3f} ms ({self.fps():.1f} FPS)")
        return "\n".join(lines)


def sync(tree):
    """Force completion.  `block_until_ready` is not trustworthy on tunneled
    platforms (axon returns early); a host transfer of one element is."""
    import numpy as np

    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "shape")]
    for leaf in leaves[:1]:
        np.asarray(leaf.reshape(-1)[:1])
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
