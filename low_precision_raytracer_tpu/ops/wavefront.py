"""Per-ray wavefront traversal for INCOHERENT launches on multi-chunk
scenes — the exact-scheduling successor to the tile-level morton-sorted
walk (`trace_rays_dense_pallas_sorted`).

Why: the tile path's candidate set is the UNION of 512 rays' chunks.
Measured on bounce rays at 46.5k tris (tools/analyze_incoherent_walk.py):
per-ray exact traversal needs ~4.5 chunk visits/ray, but every tile-level
grouping (beam / origin / anchor keys) walks ~100 bodies/tile — a ~28x gap
that no sort key closes, because hemisphere-sampled directions inside one
tile legitimately span most of the scene.  The reference's per-thread
stackless BVH walk (`rt/rtrt/cuda.hpp:415-631`) has per-ray exactness by
construction; this is its TPU-native equivalent: sorts give the coherence,
the kernel stays dense and vectorized.

Structure (docs/TPU_NOTES.md "chunk-major pair expansion", rank-major
form):

1. SCHEDULE (XLA): exact per-ray slab tests against all chunk AABBs give
   each ray its K nearest candidate chunks, ascending by conservative
   entry bound, as packed (entry bits | chunk id) words.  Evaluated in
   ray slabs via lax.map (intermediate stays ~16M elements); candidates
   extracted with K min-extraction passes (no sort along NC).
2. ROUNDS (XLA loop, static count): each round, live rays sort by the
   chunk id of their first untested candidate; the assigned-chunk kernel
   tests every lane against the Q=4 candidate chunks it brought along
   (per-tile distinct-chunk lists ride scalar prefetch; lanes match by
   id).  A ray RETIRES when min(best_t, maxd) <= the entry bound of its
   next untested candidate — the per-ray ordered-traversal invariant.
3. SWEEP: rays still unresolved after the rounds (deferred lanes, > K
   candidates) fall back to the existing tile-path launch with every
   resolved lane masked dead (dead-lane clustering makes it cheap).

The kernel reuses the packed epilogue (`_finish_chunk_packed`): rounds
carry (t, winner row, packed uv) and the decode to (tri, obj, u, v)
happens once at the end.  bf16/fp16 only (the mxu3 triangle test); fp32
callers keep the tile path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from low_precision_raytracer_tpu.config import Precision
from low_precision_raytracer_tpu.ops.traversal import Hit
from low_precision_raytracer_tpu.ops.dense_pallas import (
    TC,
    TR,
    _finish_chunk_packed,
    _mxu_tables,
    ray_aabb_entry,
    scene_exit_cap,
)

F32 = jnp.float32
# Defaults are the measured-best point of the 46.5k-tri bounce sweep
# (tools/bench_wavefront_tune.py, v5e 2026-08-19: K=8 Q=4 r=2 -> 930 ms
# vs 1076-1600 for the other points).  Q=1 with more rounds is NOT
# better: each round pays full-R sorts + an XLA list build regardless of
# how few rays stay live, so fewer/wider rounds win.
K_CAND = 8    # candidate chunks per ray (mean pre-trace count 4.9; the
# lax.cond refill cycle covers the deep tail)
Q_RANKS = 4   # candidate ranks tested per round
N_ROUNDS = 2  # = K/Q rank-depth bound; the round loop also exits early
# when every ray is resolved
CH_CAP = 48   # per-tile distinct-group list cap (SMEM: G * (CH+1) words)
WTR = 512     # rays per kernel tile.  WIDER IS WORSE (measured 2048:
# 1.6x slower overall): a chunk body's dot spans the whole tile width,
# so 4x lanes per tile = 4x cost per body while the distinct-id count
# per tile also grows ~4x — body work scales x4 for the same useful
# lane-tests.
GROUP_WIDTH = 2048   # max schedule sweep width -> s_group = ceil(NC / this)
RESIDENT_BYTES = 48 * 1024 * 1024  # VMEM-resident table ceiling, else HBM
CYCLE2_MIN_GROUPS = 512  # schedule a second candidate-refill cycle above this

# --- one-shot (pair expansion) tuning ---------------------------------------
ONESHOT_SGROUP = 1   # candidate granularity (chunks per group).  Coarser
# groups shrink the pair count but LOOSEN the entry bounds (a group's box
# is the union), measured to leave ~36% of bounce rays unresolved after
# cycle 1 at sg=4 — exact chunks resolve far more per candidate.
ONESHOT_K = 8        # candidate chunks per ray in the full-width cycle
ONESHOT_WTR = 2048   # pair lanes per kernel tile: the global sort leaves
# ~1 distinct group per tile at ANY width (id runs span tens of thousands
# of lanes), so wider tiles just amortize per-tile fixed costs — unlike the
# rounds kernel, where width multiplied the distinct-union body count
ONESHOT_CH_CAP = 8   # per-tile distinct-group list (runs make ~1-2 typical)

import numpy as np

# host-side constant (numpy, not jax.lax — this module may be imported
# inside an active jit trace, where module-level lax ops would be traced)
SENT_BITS = int(np.float32(3e38).view(np.int32))


def _assigned_kernel(active_ref, *refs,
                     tc: int, n32: int, q: int, find_any: bool,
                     s_group: int, stream: bool, ch_cap: int):
    """Test each lane against the Q candidate GROUPS it brought along
    (a group = `s_group` consecutive chunks; s_group == 1 at small scene
    sizes, larger for big scenes so the XLA schedule sweep stays bounded).

    rays_ref rows: [B32 0-7 | skip | mind | maxd | group_0..group_{q-1}]
    (group rows are exact-integer f32 ids; uncovered/invalid lanes carry
    ids above every real group so no list word matches them).
    active_ref: [counts (G,) | words (G, CH_CAP)] — the tile's distinct
    group ids (ascending).  No ordered early exit: every listed group is
    some lane's own scheduled candidate, so all of them run.  Streamed
    mode DMAs each group's (s_group*16, P32) slab from HBM — contiguous
    by construction."""
    if stream:
        a32_ref, rays_ref, outf_ref, ids_ref, scr, sem = refs
    else:
        a32_ref, rays_ref, outf_ref, ids_ref = refs
    tr = rays_ref.shape[1]
    B32 = rays_ref[0:8, :]
    skip = rays_ref[8:9, :]
    mind = rays_ref[9:10, :]
    maxd = rays_ref[10:11, :]
    ch_rows = rays_ref[11 : 11 + q, :]  # (q, TR) f32 group ids

    outf_ref[:, :] = jnp.full((1, tr), 1e5, F32)
    ids_ref[:, :] = jnp.full((2, tr), -1, jnp.int32)

    i = pl.program_id(0)
    g_total = pl.num_programs(0)
    count = active_ref[i]
    base = g_total + i * ch_cap

    # all-resolved tiles (clustered at the grid's end by the round sort's
    # sentinel key) skip the ray-split passes too, not just the loop
    @pl.when(count > 0)
    def _live_tile():
        _assigned_tile_body(
            active_ref, a32_ref, rays_ref, outf_ref, ids_ref,
            refs[4:] if stream else (), base=base, count=count,
            tc=tc, n32=n32, q=q, find_any=find_any, s_group=s_group,
            stream=stream, ch_cap=ch_cap, B32=B32, skip=skip, mind=mind,
            maxd=maxd, ch_rows=ch_rows, tr=tr,
        )


def _assigned_tile_body(active_ref, a32_ref, rays_ref, outf_ref, ids_ref,
                        scr_sem, *, base, count, tc, n32, q, find_any,
                        s_group, stream, ch_cap, B32, skip, mind, maxd,
                        ch_rows, tr):
    if stream:
        scr, sem = scr_sem
    bh = B32.astype(jnp.bfloat16)
    bl = (B32 - bh.astype(F32)).astype(jnp.bfloat16)
    b_cat = jnp.concatenate([bh, bh, bl], axis=0)
    DN = (((0,), (0,)), ((), ()))
    dflt = jax.lax.Precision.DEFAULT

    def body(j):
        g = active_ref[base + jnp.minimum(j, ch_cap - 1)]
        if stream:
            cp = pltpu.make_async_copy(
                a32_ref.at[pl.ds(g * (16 * s_group), 16 * s_group), :],
                scr, sem,
            )
            cp.start()
            cp.wait()
        gf = g.astype(F32)
        assigned = ch_rows[0:1, :] == gf
        for qq in range(1, q):
            assigned = assigned | (ch_rows[qq : qq + 1, :] == gf)
        for s in range(s_group):
            c = g * s_group + s
            if stream:
                a32 = scr[pl.ds(s * 16, 16), :]
            else:
                a32 = a32_ref[pl.ds(c * 16, 16), :]
            ah = a32[0:8, :]
            al = a32[8:16, :]
            a_cat = jnp.concatenate([ah, al, ah], axis=0)
            m32 = jax.lax.dot_general(
                a_cat, b_cat, DN, preferred_element_type=F32, precision=dflt
            )
            b32 = lambda k: m32[k * tc : (k + 1) * tc]
            Oz, Dz = b32(0), b32(1)
            tri = b32(6)
            if n32 == 9:
                tri = tri + 65536.0 * b32(8)
            Ox, Oy, Dx, Dy = b32(2), b32(3), b32(4), b32(5)
            t = -Oz / Dz
            u = Ox + t * Dx
            v = Oy + t * Dy
            accept_geom = (u > 0) & (v > 0) & (u + v < 1) & assigned
            _finish_chunk_packed(
                accept_geom, u, v, t, tri, c, tc,
                mind, maxd, skip, outf_ref, ids_ref, tr,
            )
        return j + 1

    if find_any:
        # stop as soon as every live lane found its blocker
        def cond(j):
            live = (ids_ref[0:1, :] < 0) & (maxd > mind)
            return (j < count) & jnp.any(live)
    else:
        def cond(j):
            return j < count

    jax.lax.while_loop(cond, body, jnp.int32(0))


def _schedule(lo, hi, o_f32, d_f32, maxd, n_chunks: int, id_bits: int, k: int,
              wmin=None):
    """Per-ray K nearest candidate groups: packed (entry bits | group id)
    words ascending by entry, plus the (K+1)-th WORD (retirement bound for
    candidates beyond the list).  `lo`/`hi` are the (NG, 3) group AABBs
    (= chunk AABBs when s_group == 1).  `wmin` (R,) i32 restricts to
    candidates with packed word >= wmin — the refill cursor.  Words are a
    TOTAL order (entry bits tie-broken by id), so a refill from the first
    untested word always makes progress even when many candidates tie at
    the same entry distance (e.g. a bounce origin INSIDE several
    overlapping chunk slabs, where entry == 0 for all of them — an
    entry-distance cursor would re-enumerate those ties forever)."""
    id_mask = (1 << id_bits) - 1
    sent = jnp.int32((SENT_BITS & ~id_mask) | id_mask)
    ids = jnp.arange(n_chunks, dtype=jnp.int32)[None, :]

    R = o_f32.shape[0]
    # (rs, NG, 3) temporaries are the memory budget (3x the sweep itself)
    rs = max(1024, min(R, (1 << 24) // max(3 * n_chunks, 1)))
    r_pad = (-R) % rs
    if wmin is None:
        wmin = jnp.full((R,), jnp.iinfo(jnp.int32).min, jnp.int32)
    if r_pad:
        o_p = jnp.pad(o_f32, ((0, r_pad), (0, 0)))
        d_p = jnp.pad(d_f32, ((0, r_pad), (0, 0)), constant_values=1.0)
        mx_p = jnp.pad(maxd, (0, r_pad))
        wm_p = jnp.pad(wmin, (0, r_pad), constant_values=jnp.iinfo(jnp.int32).max)
    else:
        o_p, d_p, mx_p, wm_p = o_f32, d_f32, maxd, wmin

    def slab(args):
        o, d, mx, wm = args
        entry, ok = ray_aabb_entry(lo, hi, o, d, mx)
        ebits = jax.lax.bitcast_convert_type(entry, jnp.int32)
        words = jnp.where(ok, (ebits & ~id_mask) | ids, sent)
        words = jnp.where(words >= wm[:, None], words, sent)
        outs = []
        for _ in range(k):  # k min-extraction passes, ascending
            m = jnp.min(words, axis=1)
            outs.append(m)
            words = jnp.where(words == m[:, None], sent, words)
        tcut = jnp.min(words, axis=1)  # (k+1)-th nearest WORD (sent if none)
        return jnp.stack(outs, axis=1), tcut

    n_slabs = (R + r_pad) // rs
    cand, tcut = jax.lax.map(
        slab,
        (
            o_p.reshape(n_slabs, rs, 3),
            d_p.reshape(n_slabs, rs, 3),
            mx_p.reshape(n_slabs, rs),
            wm_p.reshape(n_slabs, rs),
        ),
    )
    cand = cand.reshape(-1, k)[:R]
    tcut = tcut.reshape(-1)[:R]
    return cand, tcut


@functools.partial(
    jax.jit,
    static_argnames=("prec", "find_any", "interpret", "mode"),
)
def trace_rays_wavefront(
    scene,
    frame,
    origins,
    directions,
    *,
    prec: Precision,
    skip_tri=None,
    min_dist=0.0,
    max_dist=1e5,
    find_any: bool = False,
    interpret: bool = False,
    mode: str = "auto",  # 'rounds' | 'oneshot' | 'auto' (measured default)
) -> Hit:
    """Per-ray wavefront launch (see module docstring).  Semantics match
    `trace_rays_dense_pallas(fallback='mxu3')` up to cross-chunk exact-t
    tie ordering; bf16/fp16 only.

    `mode='oneshot'`: chunk-major PAIR EXPANSION instead of rank-major
    rounds — every (ray, candidate) pair becomes one kernel lane, ONE
    global sort by chunk id groups pairs so each 512-lane tile holds ~1
    distinct chunk (vs the round kernel's up-to-CH_CAP distinct bodies per
    tile, the measured ~850 ms fixed round cost).  All candidates are
    tested (no ordered early exit — the measured pre-trace candidate count
    4.9 is within 10% of the ideal 4.5 visits, so the exit buys little),
    then a per-ray argmin over the K pair results picks the winner."""
    assert not prec.is_f32, "wavefront launch is mxu3-only (bf16/fp16)"
    assert frame.dense_n is not None and frame.dense_chunk_lo is not None
    if mode == "auto":
        # measured (v5e 2026-08-20, tools/bench_incoherent_ab.py 6 3,
        # 46.5k-tri hemisphere bounce, 2.07M rays): oneshot 640 ms vs
        # rounds 843 vs tile-anchor 1765, agreement 0.9999; at 1.3k tris
        # oneshot 272 vs rounds 632 (the tile path wins below the
        # wavefront_min_tris gate either way)
        mode = "oneshot"
    assert mode in ("rounds", "oneshot")

    R = origins.shape[0]
    if skip_tri is None:
        skip_tri = jnp.full((R,), -1, jnp.int32)
    # a UNIFORM min_dist (the production case: every launch passes the
    # scalar prec.ray_moveforward_t) does not ride the pair sort — the
    # sorted rays rebuild it by broadcast, one payload operand fewer in
    # the dominant sort
    mind_scalar = jnp.asarray(min_dist, F32) if jnp.ndim(min_dist) == 0 else None
    min_dist = jnp.broadcast_to(jnp.asarray(min_dist, F32), (R,))
    max_dist = jnp.broadcast_to(jnp.asarray(max_dist, F32), (R,))
    o_f32 = origins.astype(F32)
    d_f32 = directions.astype(F32)

    # scene-exit reach cap (same as the tile path): no hit can lie beyond
    # the exit of the scene AABB, and uncapped miss lanes never retire
    maxd = scene_exit_cap(frame, o_f32, d_f32, max_dist)

    # ---- coefficient tables (mxu3 layout, VMEM-resident) ----
    TI = frame.dense_n.shape[0]
    tc = TC
    ti_pad = (-TI) % tc
    dt = prec.dtype
    n_dt = frame.dense_n.reshape(TI, 9).astype(dt)
    n_f32 = frame.dense_n_f32.reshape(TI, 9)
    e = frame.dense_e
    if ti_pad:
        n_dt = jnp.pad(n_dt, ((0, ti_pad), (0, 0)))
        n_f32 = jnp.pad(n_f32, ((0, ti_pad), (0, 0)))
        e = jnp.pad(e, ((0, ti_pad), (0, 0)), constant_values=1.0)
    tri_pad = jnp.pad(frame.dense_tri, (0, ti_pad), constant_values=-2)
    obj_pad = jnp.pad(frame.dense_obj, (0, ti_pad), constant_values=-1)
    n_chunks = (TI + ti_pad) // tc
    need_hi = scene.tri_idx.shape[0] > (1 << 16)
    a32t, _, n32 = _mxu_tables(
        n_dt, n_f32, e, tri_pad[:, None], obj_pad[:, None], tc, dt,
        False, need_hi, no_aab=True,
    )

    # candidate GRANULARITY: groups of s_group consecutive chunks, sized so
    # the schedule sweep stays <= ~2048 wide (s_group == 1 below 262k tris).
    # Streamed mode keeps the table in HBM and DMAs one contiguous group
    # slab per body; VMEM-resident up to ~48 MB.
    s_group = max(1, -(-n_chunks // GROUP_WIDTH))
    if mode == "oneshot":
        # coarser candidates: the pair sorts scale with R * K, the kernel
        # amortizes the extra chunks per body on wide coherent tiles
        s_group = max(s_group, ONESHOT_SGROUP)
    g_pad = (-n_chunks) % s_group
    n_groups = (n_chunks + g_pad) // s_group
    clo = frame.dense_chunk_lo
    chi = frame.dense_chunk_hi
    big0 = jnp.float32(3e38)
    if g_pad:
        clo = jnp.pad(clo, ((0, g_pad), (0, 0)), constant_values=big0)
        chi = jnp.pad(chi, ((0, g_pad), (0, 0)), constant_values=-big0)
        # pad the table with degenerate chunk slabs (all-zero coefficients
        # give Dz = 0, Oz = 0 -> t = NaN -> rejected by isfinite)
        a32t = jnp.pad(a32t, ((0, g_pad * 16), (0, 0)))
    if s_group > 1:
        glo = clo.reshape(n_groups, s_group, 3).min(axis=1)
        ghi = chi.reshape(n_groups, s_group, 3).max(axis=1)
    else:
        glo, ghi = clo, chi
    stream = a32t.shape[0] * a32t.shape[1] * 2 > RESIDENT_BYTES

    # one extra bit so the sentinel id (all-ones) exceeds every real id
    id_bits = max(2, n_groups.bit_length())
    id_mask = (1 << id_bits) - 1
    k = min(ONESHOT_K if mode == "oneshot" else K_CAND, n_groups)
    live0 = maxd > min_dist
    q = min(Q_RANKS, k)
    r_pad = (-R) % WTR
    Rp = R + r_pad
    grid = Rp // WTR
    # the SMEM prefetch budget is ~1 MB: G * (ch_cap + 1) i32 words must
    # fit (lane-expanded DI launches reach G ~ 8k tiles at 1080p x 2
    # lights, where CH_CAP = 48 overflows).  Truncated lists only defer
    # lanes to a later round (covered = False), never drop them.
    ch_cap = max(4, min(CH_CAP, (192 * 1024) // grid - 1))
    orig_idx = jnp.arange(R, dtype=jnp.int32)

    best_t = jnp.full((R,), 1e5, F32)
    best_row = jnp.full((R,), -1, jnp.int32)
    best_pk = jnp.full((R,), -1, jnp.int32)

    # a ray is resolved when nothing beyond its tested prefix can improve;
    # entry_at(p) = entry bound of the first untested candidate
    def entry_at(p, cand_entry, tcut_e):
        on_list = jnp.take_along_axis(
            cand_entry, jnp.minimum(p, k - 1)[:, None], axis=1
        )[:, 0]
        return jnp.where(p < k, on_list, tcut_e)

    # big scenes overflow K=16 candidates for ~5% of bounce rays (measured
    # at 328k/2M tris); a second schedule CYCLE refills their lists with
    # the next K candidates (entry >= everything already tested) — one
    # extra (R, NG) sweep instead of dumping 5% of rays on the slow
    # tile-path fallback
    n_cycles = 1 if n_groups <= CYCLE2_MIN_GROUPS else 2

    kernel = functools.partial(
        _assigned_kernel, tc=tc, n32=n32, q=q, find_any=find_any,
        s_group=s_group, stream=stream, ch_cap=ch_cap,
    )
    const = lambda shape: pl.BlockSpec(
        shape, lambda i, *_: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    ray_block = lambda rows: pl.BlockSpec(
        (rows, WTR), lambda i, *_: (0, i), memory_space=pltpu.VMEM
    )

    if stream:
        table_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [
            pltpu.VMEM((16 * s_group, a32t.shape[1]), a32t.dtype),
            pltpu.SemaphoreType.DMA,
        ]
    else:
        table_spec = const(a32t.shape)
        scratch = []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[table_spec, ray_block(11 + q)],
        out_specs=[ray_block(1), ray_block(2)],
        scratch_shapes=scratch,
    )

    def padr(x, cval=0.0):
        return jnp.pad(x, ((0, r_pad),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=cval) if r_pad else x

    def pair_pass(o_f, d_f, skip_a, mind_a, maxd_a, live_a, emin_a, kk, wtr1):
        """Schedule + pair-expand + global chunk-id sort + assigned kernel
        + per-ray combine for ONE ray set (mode='oneshot').
        -> (t_b, row_b, pk_b, e_next): each ray's best result among its kk
        nearest candidates and the entry bound of its first UNTESTED
        candidate (3e38 when none remain).

        Sort-payload packing: the ray components arrive in the render
        dtype (bf16/fp16), so each (x, y) pair packs LOSSLESSLY into one
        i32 word via the dtype bit pattern — 3 packed words replace 6 f32
        payload operands in the dominant pair sort.  Recentering happens
        AFTER unpacking (in f32), identical to the unpacked path."""
        Rn = o_f.shape[0]
        cand, tcut_w = _schedule(
            glo, ghi, o_f, d_f, jnp.where(live_a, maxd_a, 0.0),
            n_groups, id_bits, kk, wmin=emin_a,
        )
        cand_id = cand & id_mask  # (Rn, kk); absent candidates = id_mask

        u16 = lambda x: jax.lax.bitcast_convert_type(
            x.astype(dt), jnp.uint16
        ).astype(jnp.int32)
        pk2 = lambda a, b: (u16(a) << 16) | u16(b)
        w0 = pk2(o_f[:, 0], o_f[:, 1])
        w1 = pk2(o_f[:, 2], d_f[:, 0])
        w2 = pk2(d_f[:, 1], d_f[:, 2])

        P = Rn * kk
        pid = cand_id.reshape(P)
        rrep = lambda x: jnp.repeat(x, kk, axis=0)
        live_p = (pid < id_mask) & rrep(live_a)
        key = jnp.where(live_p, pid, jnp.int32(id_mask))
        pidx = jnp.arange(P, dtype=jnp.int32)
        ops = [key, rrep(w0), rrep(w1), rrep(w2), rrep(skip_a)]
        if mind_scalar is None:
            ops.append(rrep(mind_a))
        ops += [jnp.where(live_p, rrep(maxd_a), 0.0), pidx]
        srt = jax.lax.sort(ops, num_keys=1)
        key_s, pidx_s = srt[0], srt[-1]
        if mind_scalar is None:
            mind_s, maxd_s = srt[5], srt[6]
        else:
            mind_s, maxd_s = None, srt[5]
        p_pad = (-P) % wtr1
        Pp = P + p_pad
        padp = lambda x, cv=0.0: (
            jnp.pad(x, (0, p_pad), constant_values=cv) if p_pad else x
        )
        ids_p = padp(key_s, id_mask)
        grid_p = Pp // wtr1
        ch_cap1 = max(4, min(ONESHOT_CH_CAP, (192 * 1024) // grid_p - 1))
        # per-tile distinct lists: the GLOBAL sort makes each tile's slice
        # already ascending, so distinct ids = values where the neighbor
        # differs, compacted by ch_cap1 min-extraction passes (no sort)
        tile_ids = ids_p.reshape(grid_p, wtr1)
        first = jnp.concatenate(
            [jnp.ones((grid_p, 1), bool), tile_ids[:, 1:] != tile_ids[:, :-1]],
            axis=1,
        )
        is_real = tile_ids < id_mask
        dmask = jnp.where(first & is_real, tile_ids, jnp.int32(id_mask))
        cols = []
        for _ in range(ch_cap1):
            m = jnp.min(dmask, axis=1)
            cols.append(m)
            dmask = jnp.where(dmask == m[:, None], jnp.int32(id_mask), dmask)
        distinct = jnp.stack(cols, axis=1)  # (grid_p, ch_cap1) ascending
        counts = jnp.sum(distinct < id_mask, axis=1, dtype=jnp.int32)
        thresh = distinct[:, ch_cap1 - 1]  # id_mask when the list holds all
        covered = ids_p <= jnp.repeat(thresh, wtr1)  # (Pp,)
        active = jnp.concatenate([counts, distinct.reshape(-1)])

        un16 = lambda wrd, hi: jax.lax.bitcast_convert_type(
            ((wrd >> 16) if hi else (wrd & 0xFFFF)).astype(jnp.uint16), dt
        ).astype(F32)
        w0s, w1s, w2s = padp(srt[1], 0), padp(srt[2], 0), padp(srt[3], 0)
        ox, oy = un16(w0s, True), un16(w0s, False)
        oz, dx = un16(w1s, True), un16(w1s, False)
        dy, dz = un16(w2s, True), un16(w2s, False)
        c = frame.dense_center
        mind_row = (
            jnp.full((1, Pp), mind_scalar, F32)
            if mind_scalar is not None
            else padp(mind_s)[None, :]
        )
        rays = jnp.concatenate(
            [
                (ox - c[0])[None, :], (oy - c[1])[None, :],
                (oz - c[2])[None, :],
                jnp.ones((1, Pp), F32),
                dx[None, :], dy[None, :], dz[None, :],
                jnp.zeros((1, Pp), F32),
                padp(srt[4], -1.0)[None, :].astype(F32),
                mind_row,
                padp(maxd_s)[None, :],
                jnp.where(covered, ids_p, id_mask)[None, :].astype(F32),
            ],
            axis=0,
        )  # (12, Pp)

        kernel1 = functools.partial(
            _assigned_kernel, tc=tc, n32=n32, q=1, find_any=find_any,
            s_group=s_group, stream=stream, ch_cap=ch_cap1,
        )
        ray_block1 = lambda rows: pl.BlockSpec(
            (rows, wtr1), lambda i, *_: (0, i), memory_space=pltpu.VMEM
        )
        grid_spec1 = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid_p,),
            in_specs=[table_spec, ray_block1(12)],
            out_specs=[ray_block1(1), ray_block1(2)],
            scratch_shapes=scratch,
        )
        outf, oids = pl.pallas_call(
            kernel1,
            grid_spec=grid_spec1,
            out_shape=[
                jax.ShapeDtypeStruct((1, Pp), F32),
                jax.ShapeDtypeStruct((2, Pp), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(active, a32t, rays)

        # back to pair order; per-ray argmin over the kk pair results
        back = jax.lax.sort(
            [pidx_s, outf[0, :P], oids[0, :P], oids[1, :P],
             covered[:P].astype(jnp.int32)],
            num_keys=1,
        )
        t_r = back[1].reshape(Rn, kk)
        row_r = back[2].reshape(Rn, kk)
        pk_r = back[3].reshape(Rn, kk)
        cov_r = back[4].reshape(Rn, kk) > 0
        t_m = jnp.where(row_r >= 0, t_r, jnp.inf)
        j = jnp.argmin(t_m, axis=1)
        t_b = jnp.take_along_axis(t_m, j[:, None], axis=1)[:, 0]
        row_b = jnp.take_along_axis(row_r, j[:, None], axis=1)[:, 0]
        pk_b = jnp.take_along_axis(pk_r, j[:, None], axis=1)[:, 0]

        # first UNTESTED candidate per ray, as the PACKED WORD (total
        # order): min over uncovered real candidates, else the (kk+1)-th
        # (tcut).  The word doubles as the refill cursor.
        unc = (~cov_r) & (cand_id < id_mask)
        w_unc = jnp.min(
            jnp.where(unc, cand, jnp.int32(SENT_BITS | id_mask)), axis=1
        )
        w_next = jnp.minimum(w_unc, tcut_w)
        e_next = jax.lax.bitcast_convert_type(w_next & ~id_mask, F32)
        return t_b, row_b, pk_b, e_next, w_next

    def oneshot_merge(carry, t_b, row_b, pk_b, e_next, sel=None):
        """Fold a pair_pass result into the running carry; `sel` indexes
        the subset the pass covered (None = all rays)."""
        best_t, best_row, best_pk, resolved = carry
        if sel is None:
            bt, br, bp = best_t, best_row, best_pk
            mx, lv = maxd, live0
        else:
            take = lambda x: jnp.take(x, sel, axis=0)
            bt, br, bp = take(best_t), take(best_row), take(best_pk)
            mx, lv = take(maxd), take(live0)
        better = (row_b >= 0) & (t_b < bt)
        bt = jnp.where(better, t_b, bt)
        br = jnp.where(better, row_b, br)
        bp = jnp.where(better, pk_b, bp)
        cap = jnp.where(lv, jnp.minimum(bt, mx), -jnp.inf)
        res_n = cap <= e_next
        if find_any:
            res_n = res_n | (br >= 0)
        if sel is None:
            resolved = resolved | res_n
            return (bt, br, bp, resolved)
        resolved = resolved.at[sel].set(
            jnp.take(resolved, sel) | res_n, mode="drop"
        )
        best_t = best_t.at[sel].set(bt, mode="drop")
        best_row = best_row.at[sel].set(br, mode="drop")
        best_pk = best_pk.at[sel].set(bp, mode="drop")
        return (best_t, best_row, best_pk, resolved)

    _W_SENT = jnp.int32(jnp.iinfo(jnp.int32).max)

    def oneshot_cycle(carry, emin):
        """Full-width cycle: every ray, its kk = k nearest candidates."""
        live_ray = live0 & ~carry[3]
        t_b, row_b, pk_b, e_next, w_next = pair_pass(
            o_f32, d_f32, skip_tri, min_dist, maxd, live_ray, emin,
            k, ONESHOT_WTR,
        )
        carry = oneshot_merge(carry, t_b, row_b, pk_b, e_next)
        emin2 = jnp.where(carry[3], _W_SENT, w_next)
        return carry, emin2

    # compacted tail passes: the UNRESOLVED rays sort to the front and the
    # first r_tail slots get a deep candidate list — the heavy per-ray
    # candidate tail (ideal visits mean 4.5 but p95 9, p99 12, max ~54)
    # retires here at a fraction of a full-width refill's cost (the sweep's
    # fixed costs measured ~1.3 s at 46.5k tris even with ~every lane
    # resolved)
    def tail_cycle(carry, emin_arr, r_tail, k_tail):
        resolved = carry[3]
        srt_r = jax.lax.sort(
            [resolved.astype(jnp.int32), jnp.arange(R, dtype=jnp.int32)],
            num_keys=1,
        )
        sel = srt_r[1][:r_tail]  # unresolved first (stable sort)
        take = lambda x: jnp.take(x, sel, axis=0)
        live_t = take(live0) & ~take(resolved)
        t_b, row_b, pk_b, e_next, w_next = pair_pass(
            take(o_f32), take(d_f32), take(skip_tri), take(min_dist),
            take(maxd), live_t, take(emin_arr), k_tail, ONESHOT_WTR,
        )
        carry = oneshot_merge(carry, t_b, row_b, pk_b, e_next, sel=sel)
        emin_arr = emin_arr.at[sel].set(
            jnp.where(jnp.take(carry[3], sel), _W_SENT, w_next),
            mode="drop",
        )
        return carry, emin_arr

    def round_step(best_t, best_row, best_pk, ptr, resolved,
                   cand_id, cand_entry, tcut_e):
        # assignments: ranks ptr..ptr+q-1, clamped; invalid -> sentinel id
        ranks = jnp.minimum(ptr[:, None] + jnp.arange(q)[None, :], k - 1)
        a_ids = jnp.take_along_axis(cand_id, ranks, axis=1)  # (R, q)
        a_valid = (ptr[:, None] + jnp.arange(q)[None, :]) < k
        a_ids = jnp.where(a_valid & ~resolved[:, None], a_ids, id_mask)

        key = jnp.where(resolved, jnp.int32(1 << 29), a_ids[:, 0])
        # resolved lanes ride with maxd = 0 so they are dead in-kernel
        # (no redundant tests; the find_any early exit can fire)
        maxd_rnd = jnp.where(resolved, 0.0, maxd)
        srt = jax.lax.sort(
            [key, o_f32[:, 0], o_f32[:, 1], o_f32[:, 2],
             d_f32[:, 0], d_f32[:, 1], d_f32[:, 2],
             skip_tri, min_dist, maxd_rnd, orig_idx]
            + [a_ids[:, j] for j in range(q)],
            num_keys=1,
        )
        o_s = jnp.stack(srt[1:4], axis=1)
        d_s = jnp.stack(srt[4:7], axis=1)
        skip_s, mind_s, maxd_s, org_s = srt[7], srt[8], srt[9], srt[10]
        ids_s = jnp.stack(srt[11:], axis=1)  # (R, q)

        o_p = padr(o_s)
        d_p = padr(d_s, 1.0)
        skip_p = padr(skip_s, -1)
        mind_p = padr(mind_s)
        maxd_p = padr(maxd_s)
        ids_p = padr(ids_s, id_mask)

        # per-tile distinct chunk lists (ascending); covered = lanes whose
        # id <= the ch_cap-th distinct id (the list holds the SMALLEST ids)
        tile_ids = ids_p.reshape(grid, WTR * q)
        tile_sorted = jnp.sort(tile_ids, axis=1)
        first = jnp.concatenate(
            [jnp.ones((grid, 1), bool),
             tile_sorted[:, 1:] != tile_sorted[:, :-1]], axis=1
        )
        is_real = tile_sorted < id_mask
        distinct = jnp.where(first & is_real, tile_sorted, jnp.int32(id_mask))
        distinct = jnp.sort(distinct, axis=1)[:, :ch_cap]
        counts = jnp.sum(distinct < id_mask, axis=1, dtype=jnp.int32)
        thresh = distinct[:, ch_cap - 1]  # id_mask when list not full
        covered = ids_p <= jnp.repeat(thresh, WTR)[:, None]  # (Rp, q)
        active = jnp.concatenate([counts, distinct.reshape(-1)])

        # rays recenter by dense_center to match the coefficient tables
        # (the schedule phase stays in world space — chunk AABBs are world)
        rays = jnp.concatenate(
            [
                (o_p - frame.dense_center).T,
                jnp.ones((1, Rp), F32),
                d_p.T,
                jnp.zeros((1, Rp), F32),
                skip_p[None, :].astype(F32),
                mind_p[None, :],
                maxd_p[None, :],
                jnp.where(covered, ids_p, id_mask).T.astype(F32),
            ],
            axis=0,
        )  # (11 + q, Rp)

        outf, oids = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((1, Rp), F32),
                jax.ShapeDtypeStruct((2, Rp), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(active, a32t, rays)

        # back to original order; combine with the running best
        back = jax.lax.sort(
            [org_s, outf[0, :R], oids[0, :R], oids[1, :R]]
            + [covered[:R, j].astype(jnp.int32) for j in range(q)],
            num_keys=1,
        )
        t_r, row_r, pk_r = back[1], back[2], back[3]
        cov_r = jnp.stack(back[4:], axis=1) > 0  # (R, q)
        got = row_r >= 0
        better = got & (t_r < best_t)
        best_t = jnp.where(better, t_r, best_t)
        best_row = jnp.where(better, row_r, best_row)
        best_pk = jnp.where(better, pk_r, best_pk)

        # advance ptr to the first untested rank: covered prefix length
        # (a deferred rank re-queues next round)
        pref = jnp.cumprod(cov_r.astype(jnp.int32), axis=1).sum(axis=1)
        ptr = jnp.where(resolved, ptr, jnp.minimum(ptr + pref, k))
        cap = jnp.where(live0, jnp.minimum(best_t, maxd), -jnp.inf)
        if find_any:
            resolved = resolved | (best_row >= 0)
        resolved = resolved | (cap <= entry_at(ptr, cand_entry, tcut_e))
        return best_t, best_row, best_pk, ptr, resolved

    def run_cycle(carry, emin):
        """One schedule + up-to-N_ROUNDS rank rounds.  The round loop is a
        lax.while_loop with an ALL-RESOLVED early exit: typical bounce
        rays retire after ~5 tested candidates (mean pre-trace candidate
        count 4.9), so a deep N_ROUNDS bound costs nothing once the last
        ray retires."""
        best_t, best_row, best_pk, resolved = carry
        cand, tcut_w = _schedule(
            glo, ghi, o_f32, d_f32, maxd, n_groups, id_bits, k, wmin=emin
        )
        tcut_e = jax.lax.bitcast_convert_type(tcut_w & ~id_mask, F32)
        cand_entry = jax.lax.bitcast_convert_type(cand & ~id_mask, F32)
        cand_id = cand & id_mask
        ptr = jnp.zeros((R,), jnp.int32)  # first untested candidate rank
        cap = jnp.where(live0, jnp.minimum(best_t, maxd), -jnp.inf)
        resolved = resolved | (cap <= entry_at(ptr, cand_entry, tcut_e))

        def w_body(st):
            rnd, bt, br, bp, p, res = st
            bt, br, bp, p, res = round_step(
                bt, br, bp, p, res, cand_id, cand_entry, tcut_e
            )
            return rnd + 1, bt, br, bp, p, res

        def w_cond(st):
            return (st[0] < N_ROUNDS) & jnp.any(~st[5])

        st = jax.lax.while_loop(
            w_cond, w_body,
            (jnp.int32(0), best_t, best_row, best_pk, ptr, resolved),
        )
        _, best_t, best_row, best_pk, ptr, resolved = st
        # next cycle refills from the first untested PACKED WORD — a total
        # order, so entry-distance ties (bounce origins inside overlapping
        # slabs) cannot stall the cursor
        w_at = jnp.take_along_axis(
            cand, jnp.minimum(ptr, k - 1)[:, None], axis=1
        )[:, 0]
        w_next = jnp.where(ptr < k, w_at, tcut_w)
        emin2 = jnp.where(
            resolved, jnp.int32(jnp.iinfo(jnp.int32).max), w_next
        )
        return (best_t, best_row, best_pk, resolved), emin2

    carry = (best_t, best_row, best_pk, ~live0)
    if mode == "oneshot":
        # ONE full-width cycle (k nearest candidates per ray), then
        # COMPACTED tail cycles under a while_loop: unresolved rays sort
        # to the front and the first R_TAIL slots get K_TAIL candidates
        # each.  The tail replaces the tile-path sweep as the overflow
        # mechanism — the sweep's fixed costs (full-R morton sorts + its
        # own schedule) measured ~1.3 s at 46.5k tris even with ~every
        # lane resolved, and a full-width refill pays the whole P-pair
        # sort for a percent-level tail.  The terminal cond-sweep below
        # remains as the safety net for rays still unresolved after MAX_C
        # tail cycles (> MAX_C * K_TAIL + k candidates — pathological).
        carry, emin = oneshot_cycle(carry, None)
        rnd = lambda n: max(ONESHOT_WTR, (n // ONESHOT_WTR) * ONESHOT_WTR)
        # Count-sized tail: EXACTLY ONE tier fires — the smallest whose
        # capacity captures every unresolved ray — followed by one
        # count-gated safety pass for stragglers that outlived the tier's
        # candidate budget.  (The previous always-fire cascade paid two
        # full-R compaction sorts + two pair passes for a handful of
        # stragglers — ~half the 46.5k one-shot frame time.)  Deep tiers
        # give each selected ray enough candidates (64/128; measured max
        # need ~54 at chunk granularity) that it exhausts its list.
        tiers = [  # (capacity, candidates) — capacity descending
            (R, min(8, n_groups)),
            (rnd(R // 4), min(16, n_groups)),
            (rnd(R // 16), min(32, n_groups)),
            (rnd(R // 64), min(64, n_groups)),
            (rnd(R // 256), min(128, n_groups)),
        ]
        # drop duplicate capacities (small R: rnd() clamps to one tile)
        tiers = [t for i, t in enumerate(tiers)
                 if i == 0 or t[0] < tiers[i - 1][0]]
        if interpret:
            # CPU tests: static tail passes keep the path covered (two
            # tiers exercise both the compaction and the deep-K shapes)
            for r_tail, k_tail in tiers[1:3]:
                carry, emin = tail_cycle(carry, emin, r_tail, k_tail)
        else:
            def run_ladder(args):
                carry, emin = args
                cnt = jnp.sum((~carry[3]).astype(jnp.int32))
                for j, (r_tail, k_tail) in enumerate(tiers):
                    below = tiers[j + 1][0] if j + 1 < len(tiers) else 0
                    fire = cnt > below
                    if j > 0:
                        fire &= cnt <= r_tail
                    carry, emin = jax.lax.cond(
                        fire,
                        lambda a, rt=r_tail, kt=k_tail: tail_cycle(
                            a[0], a[1], rt, kt
                        ),
                        lambda a: a,
                        (carry, emin),
                    )
                # safety passes: stragglers that outlived the fired tier's
                # candidate budget get a deeper-K list — SMALL widths only
                # (a wide safety at rnd(R//16) x 128 candidates costs as
                # many pair lanes as the whole main pass; measured +250 ms
                # at 46.5k).  Stragglers beyond rnd(R//32) fall to the
                # terminal sweep as before.
                safeties = [
                    (rnd(R // 32), min(64, n_groups)),
                    (rnd(R // 256), min(128, n_groups)),
                ]
                safeties = [t for i, t in enumerate(safeties)
                            if i == 0 or t[0] < safeties[i - 1][0]]
                cnt2 = jnp.sum((~carry[3]).astype(jnp.int32))
                for j, (r_s, k_s) in enumerate(safeties):
                    below = safeties[j + 1][0] if j + 1 < len(safeties) else 0
                    carry, emin = jax.lax.cond(
                        (cnt2 > below) & (cnt2 <= r_s),
                        lambda a, rs=r_s, ks=k_s: tail_cycle(a[0], a[1], rs, ks),
                        lambda a: a,
                        (carry, emin),
                    )
                return carry, emin

            carry, emin = jax.lax.cond(
                jnp.any(~carry[3]), run_ladder, lambda a: a, (carry, emin)
            )
    else:
        carry, emin = run_cycle(carry, None)
        if n_cycles == 2:
            if interpret:
                # keep both cycle paths covered by the CPU tests (running a
                # cycle with every ray resolved is a no-op)
                carry, _ = run_cycle(carry, emin)
            else:
                # the refill cycle pays a full (R, NG) schedule sweep; skip
                # it at runtime when cycle 1 resolved everything (the
                # common case — K covers ~99.5% of rays at 328k tris)
                carry = jax.lax.cond(
                    jnp.any(~carry[3]),
                    lambda args: run_cycle(args[0], args[1])[0],
                    lambda args: args[0],
                    (carry, emin),
                )
    best_t, best_row, best_pk, resolved = carry

    # ---- decode the packed winners ----
    valid = best_row >= 0
    rc = jnp.clip(best_row, 0, tri_pad.shape[0] - 1)
    tri_o = jnp.where(valid, jnp.take(tri_pad, rc), -1)
    obj_o = jnp.where(valid, jnp.take(obj_pad, rc), -1)
    inv_q = jnp.float32(1.0 / 16384.0)
    u_o = jnp.where(valid, (best_pk >> 15).astype(F32) * inv_q - 0.5, 0.0)
    v_o = jnp.where(valid, (best_pk & 0x7FFF).astype(F32) * inv_q - 0.5, 0.0)
    wave = Hit(t=best_t, u=u_o, v=v_o, tri=tri_o, obj=obj_o)

    # ---- sweep: unresolved rays re-trace on the tile path (resolved
    # lanes masked dead -> they cluster into skipped tiles) ----
    from low_precision_raytracer_tpu.ops.dense_pallas import (
        trace_rays_dense_pallas_sorted,
    )

    # unresolved rays re-trace only their remaining interval: any hit at or
    # beyond the wavefront's best_t loses the final combine anyway, and the
    # tighter cap lets the tile kernel's ordered early exit retire at the
    # known bound instead of walking to scene exit.  The whole sweep sits
    # under lax.cond: on most launches EVERY ray resolves in the rounds
    # (measured 0% fallback on the 46.5k test scene), and the tile path's
    # fixed costs (its own schedule sweep + two morton sorts) are not worth
    # paying for an empty lane set.
    def sweep(wave):
        sweep_maxd = jnp.where(resolved, 0.0, jnp.minimum(maxd, best_t))
        fb = trace_rays_dense_pallas_sorted(
            scene, frame, origins, directions, prec=prec, fallback="mxu3",
            skip_tri=skip_tri, min_dist=min_dist, max_dist=sweep_maxd,
            find_any=find_any, interpret=interpret, epilogue="pack",
            # the tile path carries its own (VMEM-resident) table copy:
            # stream it above the tile kernel's resident ceiling or Mosaic
            # overflows
            stream=TI > 65536,
        )
        fb_better = (fb.tri >= 0) & (fb.t < wave.t)
        pick = lambda a, b: jnp.where(fb_better, a, b)
        return Hit(
            t=pick(fb.t, wave.t), u=pick(fb.u, wave.u), v=pick(fb.v, wave.v),
            tri=pick(fb.tri, wave.tri), obj=pick(fb.obj, wave.obj),
        )

    if interpret:
        # lax.cond over pallas_call is TPU-path plumbing; interpret mode
        # (CPU tests) keeps the always-run form so both branches stay
        # covered
        return sweep(wave)
    import os as _os_env

    if _os_env.environ.get("LPRT_WF_NO_SWEEP"):
        # perf-debug escape: skip the fallback sweep entirely (results may
        # be missing overflow-ray hits — NEVER for production)
        return wave
    return jax.lax.cond(jnp.any(~resolved), sweep, lambda w: w, wave)
