"""Configuration system.

The reference has no config files or CLI flags; its three config tiers are
UI-bound (see SURVEY.md §5.6 / `rt/gui/imgui_window.cu:94-100, 735-752`,
`rt/rtrt/cuda.hpp:2161-2168`).  Here they become frozen dataclasses:

- static (pre-load) fields — precision + resolution — select the compiled
  program, exactly like the reference's template instantiation choice;
- dynamic per-frame fields — mix weights, demo toggles — are traced values;
- compile-time constants — MAX_DIRECT_LIGHT=4, max_bounces=2, SVGF sigmas —
  are defaults of the same dataclasses.

Everything is hashable so a RenderConfig can be a `jax.jit` static argument.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

# Precision discipline: JAX's DEFAULT matmul precision lowers fp32 matmuls to
# single-pass bf16 multiplies on TPU, silently demoting the pipeline's
# intentionally-fp32 math (the always-fp32 z-row of the triangle test, ray
# transforms, reprojection chains).  'highest' restores true fp32 there while
# leaving bf16-input matmuls exactly as fast (bf16 in / fp32 accumulate is
# already the MXU-native mode).  Low precision in this framework is an
# explicit dtype choice, never an implicit compiler demotion.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: TPU compiles of the frame program run
# 60-500 s on this toolchain (docs/TPU_NOTES.md) and every process pays
# them again — bench runs, benchmark tools, the CLI, the viewer.  Cache
# compiled executables on disk, keyed by HLO hash (stale-safe).  Backends
# whose PJRT plugin cannot serialize executables just skip the cache.
import os as _os

_cache_dir = _os.environ.get(
    "LPRT_JAX_CACHE", _os.path.expanduser("~/.cache/lprt_jax")
)
if _cache_dir:  # LPRT_JAX_CACHE= (empty) disables
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


@dataclass(frozen=True)
class Precision:
    """A low-precision rendering policy (the reference's `DataT` template
    parameter, `rt/math/number.hpp:7-130`, promoted to a runtime value).

    delta1/delta2 are the per-operation rounding-error units propagated into
    the ray-triangle error bounds (`rt/rtrt/cuda.hpp:246-248` uses
    2^-10 / 2^-8 for fp16).  bf16 has an 8-bit mantissa (vs fp16's 11), so its
    units are re-derived 8x wider.  fp32 keeps the reference's constants for
    behavioural parity (the reference instantiates the same template with
    the same constants for `float`).
    """

    name: str
    # per-op rounding error units for the dtype triangle test
    delta1: float
    delta2: float
    # ray-AABB precision slop: scene test accepts t1max <= t2min + scene_slop
    # (`rt/rtrt/cuda.hpp:98`), object test accepts t1max <= t2min * object_slop
    # (`rt/rtrt/cuda.hpp:139`)
    scene_aabb_slop: float = 0.02
    object_aabb_slop: float = 1.001953
    # dtype-keyed self-intersection ray origin offset
    # (`rt/rtrt/cuda.hpp:934-942`: 1e-4 fp32 / 1e-1 fp16)
    ray_moveforward_t: float = 1e-4
    # the epsilon for launches whose ORIGINS ride exactly (f32 hit
    # positions through the dense kernel's high+low bf16 split): only the
    # intersection test's own t error (~2^-17 relative) needs clearing,
    # not the dtype position quantization (|p| * 2^-9 ≈ 0.02 scene units
    # in bf16) the 1e-1 offset guards.  A 1e-1 offset from an EXACT
    # origin blinds shadow rays to every occluder within 0.1 units —
    # measured as displaced contact-shadow boundaries vs fp32
    # (ops/trace.py:moveforward_eps picks per launch).
    ray_moveforward_t_exact: float = 1e-4

    @property
    def dtype(self):
        return {"fp32": jnp.float32, "bf16": jnp.bfloat16, "fp16": jnp.float16}[
            self.name
        ]

    @property
    def np_dtype(self):
        import ml_dtypes

        return {
            "fp32": np.float32,
            "bf16": ml_dtypes.bfloat16,
            "fp16": np.float16,
        }[self.name]

    @property
    def is_f32(self) -> bool:
        return self.name == "fp32"


FP32 = Precision("fp32", delta1=2.0**-10, delta2=2.0**-8, ray_moveforward_t=1e-4)
FP16 = Precision("fp16", delta1=2.0**-10, delta2=2.0**-8, ray_moveforward_t=1e-1,
                 ray_moveforward_t_exact=1e-2)
BF16 = Precision("bf16", delta1=2.0**-7, delta2=2.0**-5, ray_moveforward_t=1e-1,
                 ray_moveforward_t_exact=1e-2)

_PRECISIONS = {"fp32": FP32, "fp16": FP16, "bf16": BF16}


def get_precision(name: str | Precision) -> Precision:
    if isinstance(name, Precision):
        return name
    return _PRECISIONS[name]


@dataclass(frozen=True)
class SVGFConfig:
    """SVGF denoiser constants (`rt/rtrt/cuda.hpp:1259-1263, 1268`)."""

    sigma_z: float = 1.0
    sigma_n: float = 128.0
    sigma_l: float = 4.0
    eps: float = 1e-5
    # a-trous wavelet iterations run with these strides, ping-ponging buffers;
    # iteration #1's output doubles as next frame's color history
    # (`rt/rtrt/cuda.hpp:1676-1710`)
    strides: tuple[int, ...] = (1, 2, 4, 8, 16)
    # temporal mix weights (`rt/gui/imgui_window.cu:97-98`)
    color_mix_weight: float = 0.1
    moments_mix_weight: float = 0.1
    # frames below this use the spatial (bilateral) moments estimate
    # (`rt/rtrt/cuda.hpp:1271`)
    spatial_moments_below: int = 4
    # denoiser backend: 'auto' (fully fused Pallas pipeline on TPU — the
    # temporal-accumulation kernel + wavelet chain — XLA elsewhere),
    # 'pallas' (same, explicit), 'pallas_wavelet' (XLA temporal stages +
    # Pallas wavelet chain), 'xla' (stencils), or 'xla_halo' (unrolled-tap
    # stencils for GSPMD halo partitioning under device meshes)
    wavelet_impl: str = "auto"
    # Keep the CARRIED temporal state (color history + moments) and the
    # denoiser arithmetic in fp32 even when the render dtype is bf16/fp16.
    # Deliberate deviation from the reference, which stores history in
    # DataT (`rt/rtrt/cuda.hpp:1234-1243`) and pays for it: with bf16
    # state, every frame requantises the history lerp to an 8-bit
    # mantissa, so the accumulator never converges below the mantissa
    # step — measured 3.2 dB lost against a converged ground truth
    # (BENCH_r04, delta_db_vs_truth).  fp32 state closes that and is
    # ~free on TPU: the fused Pallas kernels already compute in f32
    # internally; only the carried planes (and their temporal fetch)
    # double in HBM, ~0.1 ms at 1080p.  False = reference behaviour
    # (state in the render dtype), kept for the ablation harness.
    state_f32: bool = True


@dataclass(frozen=True)
class DemoSettings:
    """Per-term display toggles (`rt/rtrt/cuda.hpp:2161-2168`)."""

    add_direct_out: bool = True
    add_gi_colored: bool = True
    add_gi_white: bool = True
    demodulate: bool = False
    svgf: bool = True


@dataclass(frozen=True)
class RenderConfig:
    """The full renderer configuration.

    Counterpart of `Renderer<DataT>::Settings` + the compile-time constants
    (`rt/gui/imgui_window.cu:81, 94-100, 356`).
    """

    width: int = 1024
    height: int = 768
    precision: str = "fp32"

    gi_on: bool = True
    # max_bounces=2 hardcoded in the reference's procedure buffer ctor
    # (`rt/gui/imgui_window.cu:356`): a first-round shade plus one GI bounce
    max_bounces: int = 2
    max_direct_lights: int = 4

    svgf: SVGFConfig = SVGFConfig()
    demo: DemoSettings = DemoSettings()
    taa_mix_weight: float = 1.0
    taa_on: bool = True
    # Test hook: run the full TAA path (jittered map build + history blend)
    # even at taa_mix_weight=1, where the renderer normally elides the stage
    # as a bitwise identity.  Lets tests compare elided vs full output.
    taa_force_full: bool = False

    # Shade-stage compute dtype: f32 (default) even in bf16/fp16 modes.
    # Deliberate deviation from the reference's DataT shading: shading
    # error is SYSTEMATIC (the same BRDF/cosine/falloff rounding every
    # frame, which no amount of temporal accumulation washes out) —
    # measured as a converged-mean bias of ~29 dB vs fp32 in bf16 mode,
    # the dominant term of the ground-truth parity gap after the trace
    # geometry fixes (docs/TPU_NOTES.md round-5).  The low-precision
    # claim lives in the INTERSECTION path, which stays bf16: dtype
    # coefficient tables (half the HBM), the M-shift dtype triangle test,
    # dtype AABB culling, dtype sort payloads.  Shade is a small slice of
    # frame time; the f32 VPU cost is ~1 ms at 1080p.  RNG draws stay in
    # the render dtype (sample-sequence compatibility with the dtype
    # shader); False = reference behaviour for the ablation harness.
    shade_f32: bool = True
    # 'both'  : compute dtype + fp32 triangle tests for every lane and select
    #           by the ambiguity band (exact reference semantics; on a vector
    #           machine all lanes pay both paths)
    # 'dtype' : low-precision test only, widened acceptance band (fast path)
    # 'mxu3'  : (dense Pallas kernel, bf16/fp16 only) single bf16x3 MXU test —
    #           the fp32-shadow dot the band re-test needs is already computed
    #           on the MXU and is uniformly ~2^-16-accurate, better than the
    #           dtype test it guards, so band + dtype pass are dropped
    #           entirely.  Conservative deviation from the reference's DataT
    #           kernel: results move toward the fp32 oracle.  Falls back to
    #           'both' for fp32 and for non-dense_pallas backends.
    # 'auto'  : 'mxu3' where it applies, 'both' everywhere else.
    triangle_fallback: str = "auto"
    # traversal implementation:
    #   'auto'        : dense Pallas kernel (TPU) / dense XLA (CPU) for small
    #                   scenes, BVH walk otherwise
    #   'jax'         : batched lax.while_loop two-level BVH walk
    #   'dense'       : force the XLA all-pairs path
    #   'dense_pallas': force the Pallas all-pairs kernel
    #   'pallas'      : Pallas BVH kernel
    traversal_impl: str = "auto"
    # 'auto' picks the XLA dense path when instance-triangles <= this
    dense_max_tris: int = 8192
    # the Pallas dense kernel scales further thanks to tile-granular chunk
    # culling; beyond this (VMEM-resident) cap the coefficient table is
    # HBM-streamed per chunk, up to dense_stream_max_tris
    dense_pallas_max_tris: int = 65536
    dense_stream_max_tris: int = 1 << 20
    # 'auto' switches from the all-pairs dense kernel to the packet BVH
    # traversal (ops/traversal_pallas.py) above this instance-triangle
    # count.  Default = the dense kernel's HBM-streaming ceiling: in-frame
    # A/B measured dense faster at every size below it (5.3k tris: 625 vs
    # 882 ms; 46.5k tris: 2510 vs 2894 ms, tools/bench_large_scene.py), so
    # the packet walk only takes over where dense cannot go
    packet_bvh_min_tris: int = 1 << 20
    # ceiling for the packet BVH traversal under 'auto': its HBM-streamed
    # coefficient table costs 512 B/instance-tri (4M tris = 2 GB); beyond
    # this the lane-parallel XLA walk is the only (slow) option
    packet_bvh_max_tris: int = 4 << 20
    # triangles per BVH leaf (reference uses 1, `rt/trace/object_bvh.hpp:75`;
    # >1 trades traversal steps for vectorized leaf tests — better on TPU)
    bvh_leaf_size: int = 4
    # incoherent-launch coherence recovery (GI bounces, secondary shadows):
    # 'anchor' - sort by EXACT per-ray nearest-chunk entry bound + direction
    #            bits (ops/dense_pallas._anchor_key): tiles get chunk-tight
    #            origin bundles AND narrow cones, so the kernel's candidate
    #            lists and ordered early exit work at per-ray quality — the
    #            collapsed form of the per-ray chunk-list wavefront design
    # 'beam'   - morton sort on interleaved origin+|direction| bits
    # 'origin' - morton sort on origin bits only (the round-2 key)
    # 'none'   - no sort; keep pixel-order screen-block tiles and rely on
    #            the box-distance ordered early exit
    # (tools/bench_incoherent_ab.py measures all four on real scenes)
    # Default from the v5e A/B (2026-08-19, 46.5k-tri real hemisphere
    # bounce): anchor 1406 ms < origin 1741 < beam 2867 ~ unsorted 3061.
    incoherent_sort: str = "anchor"
    # incoherent-launch implementation:
    # 'tile'      - morton-sorted tile path (trace_rays_dense_pallas_sorted)
    # 'wavefront' - per-ray wavefront (ops/wavefront.py): exact per-ray
    #               candidate scheduling + rank-major rounds.  Measured
    #               need: bounce rays want ~4.5 chunk visits/ray but
    #               tile-level unions walk ~100 bodies/tile — a ~28x gap
    #               no sort key closes (tools/analyze_incoherent_walk.py).
    #               bf16/fp16 multi-chunk scenes up to the HBM-streamed
    #               table band (packet_bvh_max_tris, v2 group scheduling);
    #               other launches keep the tile path.
    # Default from the v5e A/Bs (2026-08-19/20): above wavefront_min_tris
    # the wavefront beats every tile sort key on the 46.5k incoherent
    # bounce (oneshot 640 ms vs anchor 1765), and at 2M tris it is the
    # only incoherent path that completes (the tile path's overflow sweep
    # trips the TPU watchdog).  Below the gate, and for launches outside
    # it (fp32, non-mxu3, single-chunk scenes), the anchor-sorted tile
    # path wins outright (1.3k tris: 89 ms vs 272) and is used instead.
    incoherent_impl: str = "wavefront"
    # minimum instance-triangle count for the wavefront to take incoherent
    # launches; below it the anchor-sorted tile path wins outright
    # (v5e 2026-08-20, tools/bench_incoherent_ab.py: 1.3k tris — tile 89 ms
    # vs wavefront 272/632; 46.5k — wavefront wins).  The sponza-class
    # frame (5.3k tris) regressed 625 -> 2382 ms when the round-3 gate
    # (ti > 512) pushed its bounce launches onto the wavefront.
    wavefront_min_tris: int = 16384
    # wavefront scheduling form (ops/wavefront.py):
    # 'rounds'  - rank-major rounds: sort live rays by first untested
    #             candidate, test Q ranks/lane per round
    # 'oneshot' - chunk-major pair expansion: every (ray, candidate) pair
    #             is one kernel lane, one global sort, one launch
    # 'auto'    - the measured winner (see trace_rays_wavefront)
    wavefront_mode: str = "auto"
    # fused in-kernel DI shadow phase (ops/dense_pallas.run_di_phase):
    # single-chunk closest-hit launches compute per-light shadow visibility
    # from their own winner hit inside the same kernel, dropping the
    # separate trace_di launch (frame launch count 1 + rounds + 1 ->
    # 1 + rounds).  'auto' = on wherever ops.trace.di_fusible says the
    # kernel supports it; 'off' forces the separate launch (A/B + fallback).
    di_fuse: str = "auto"
    # dense Pallas kernel chunk epilogue:
    # 'reduce5' - exact winner tracking, 5 cross-sublane reductions/chunk
    # 'pack'    - (bf16/fp16 only) packed winner key: 3 reductions/chunk +
    #             a 2-channel table take outside the kernel; t stays exact,
    #             u/v quantize to 1/16384, sub-truncation-window t ties may
    #             resolve differently (see _finish_chunk_packed)
    # 'auto'    - 'reduce5', set by the v5e A/B (2026-08-19,
    #             tools/bench_epilogue_ab.py): reduce5 12.18/14.57 ms vs
    #             pack 12.61/13.69 on Cornell, and pack LOSES at 46.5k
    #             tris (110 vs 78 ms primary, agreement 0.938)
    dense_epilogue: str = "auto"
    # dense-kernel per-tile chunk-list selection (the schedule phase):
    # 'sort' - full-width stable argsort of the entry-bound key,
    #          O(NC log NC) per tile — fine up to ~100k tris
    # 'topk' - exact nearest-(take+1) via lax.top_k, O(NC log take) — the
    #          schedule lever at 1M+ tris where NC reaches the thousands
    #          (same results up to equal-bound tiebreaks)
    # 'auto' - 'topk', set by the v5e A/B (2026-08-19,
    #          tools/bench_schedule_ab.py): topk >= sort at every size
    #          (46.5k primary 79.9 -> 65.1 ms; 2M 6550 -> 5372 ms) with
    #          tri agreement 1.00000
    dense_schedule_select: str = "auto"
    # device mesh for multi-chip rendering (parallel/tiling.py sets this):
    # when present, the Pallas trace kernels run under shard_map with rays
    # partitioned over the mesh's pixel axis — per-shard by construction,
    # never GSPMD-replicated.  jax.sharding.Mesh is hashable, so the config
    # stays a valid jit-static argument.
    mesh: object = None

    def __post_init__(self):
        assert self.precision in _PRECISIONS
        assert self.triangle_fallback in ("auto", "both", "dtype", "mxu3")
        assert self.traversal_impl in ("auto", "jax", "dense", "dense_pallas", "pallas")
        assert self.incoherent_sort in ("anchor", "beam", "origin", "none")
        assert self.incoherent_impl in ("tile", "wavefront")
        assert self.wavefront_mode in ("auto", "rounds", "oneshot")
        assert self.di_fuse in ("auto", "off")
        assert self.dense_epilogue in ("auto", "reduce5", "pack")
        assert self.dense_schedule_select in ("auto", "sort", "topk")
        assert self.max_bounces >= 1, "max_bounces counts the primary shade round"

    @property
    def prec(self) -> Precision:
        return get_precision(self.precision)

    @property
    def dtype(self):
        return self.prec.dtype

    @property
    def n_pixels(self) -> int:
        return self.width * self.height

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


# Skybox ambient colour used by the NO_GI fake-ambient path
# (`rt/rtrt/cuda.hpp:27` — the reference ships it as all-zero)
SKYBOX_COLOR = (0.0, 0.0, 0.0)

# Default "no hit yet" ray parameter (`rt/rtrt/cuda.hpp:54`: t = 1e5)
T_MAX_DEFAULT = 1e5
