"""ABEA band fill — 8 reads per grid step (sublane-packed Pallas kernel).

The single-read kernel (abea_pallas.py) computes each band step on a
(1, 128) vector, wasting 7/8 of every VPU issue.  Here 8 reads advance in
lockstep on the sublanes of (8, 128) tiles: the band-cell arithmetic and
the ±1 score shifts are computed once per 8 reads (the shifts with two
shared rolls + per-sublane selects), while the per-read unaligned slices
of the kmer/event rows remain per read (their rotate amounts differ).

Output contract is IDENTICAL to abea_pallas.abea_fill_pallas: trace
[B, n_bands, 128] i32 with the sideband lanes (ll_event at lane 104,
last-kmer-column score bits at lane 108), consumed by the same unpack +
backtrace.  B must be a multiple of 8 (the caller pads by duplicating
reads).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .abea import PAD, AbeaBatch
from .abea_pallas import BW, CHUNK, FROM_D, FROM_L, FROM_U, LC_LANE, LL_LANE

NEG_INF = np.float32(-np.inf)
LOG_INV_SQRT_2PI = np.float32(-0.918938)
R = 8                      # reads per grid step (sublane count)
GRP = 8                    # band steps unrolled per loop iteration


def _dyn_slice_merge(ref, j, start, lane8, sub8, acc):
    """Merge ref[j, start : start+PAD] (unaligned) into sublane j of acc.

    Mosaic cannot load a single sublane of an (8, W) memref, so the two
    covering aligned blocks are loaded as full (8, PAD) tiles (the other
    sublanes carry other reads' rows at this read's offsets — masked off
    by the sublane select); the stitch uses a dynamic rotate like the
    single-read kernel.
    """
    base = (start // PAD) * PAD
    rem = start - base
    v0 = ref[:, pl.ds(pl.multiple_of(base, PAD), PAD)]
    v1 = ref[:, pl.ds(pl.multiple_of(base + PAD, PAD), PAD)]
    shift = (PAD - rem) % PAD
    r0 = pltpu.roll(v0, shift, 1)
    r1 = pltpu.roll(v1, shift, 1)
    stitched = jnp.where(lane8 < PAD - rem, r0, r1)
    return jnp.where(sub8 == j, stitched, acc)


def _fill_kernel8(n_events_ref, n_kmers_ref, scal_ref,
                  ev_rev_ref, kmean_ref, kstdv_ref, klog_ref,
                  trace_ref, chunk_ref, sems):
    g = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, PAD), 1)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (R, PAD), 1)
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (R, PAD), 0)

    # per-read scalars (Python-unrolled => plain traced scalars)
    n_events = [n_events_ref[g * R + j] for j in range(R)]
    n_kmers = [n_kmers_ref[g * R + j] for j in range(R)]
    scale = [scal_ref[g * R + j, 0] for j in range(R)]
    shift = [scal_ref[g * R + j, 1] for j in range(R)]
    lp_stay = [scal_ref[g * R + j, 2] for j in range(R)]
    lp_step = [scal_ref[g * R + j, 3] for j in range(R)]
    lp_skip = scal_ref[g * R, 4]     # constants, identical for all reads
    lp_trim = scal_ref[g * R, 5]

    n_events_v = _stack_scalars(n_events, sub8)
    n_kmers_v = _stack_scalars(n_kmers, sub8)
    scale_v = _stack_scalars(scale, sub8)
    shift_v = _stack_scalars(shift, sub8)
    lp_stay_v = _stack_scalars(lp_stay, sub8)
    lp_step_v = _stack_scalars(lp_step, sub8)

    n_bands_max = trace_ref.shape[1]
    E2P = ev_rev_ref.shape[1]

    half = BW // 2
    ll_e0 = half - 1
    ll_k0 = -1 - half

    def last_col_rows(rows8, ll_k_list):
        """last-kmer-column score per read: (R,) list of scalars."""
        out = []
        for j in range(R):
            off = (n_kmers[j] - 1) - ll_k_list[j]
            valid = (off >= 0) & (off < BW)
            v = jnp.max(jnp.where((sub8 == j) & (lane8 == off), rows8,
                                  NEG_INF))
            out.append(jnp.where(valid, v, NEG_INF))
        return out

    def pack_rows(frm8, ll_e_list, lc_list):
        """Embed per-read sidebands into the (R, PAD) i32 trace rows."""
        ll_vec = _stack_scalars([x.astype(jnp.int32) for x in ll_e_list],
                                sub8)
        lc_vec = _stack_scalars(lc_list, sub8)
        lc_bits = jax.lax.bitcast_convert_type(lc_vec, jnp.int32)
        out = jnp.where(lane8 == LL_LANE, ll_vec.astype(jnp.int32), frm8)
        out = jnp.where(lane8 == LC_LANE, lc_bits, out)
        return out

    # the 0*sub8 term forces a sublane-tiled (non-replicated) layout:
    # these seed the fori carry, and Mosaic otherwise infers a replicated
    # layout it cannot reconcile with the rolls inside the loop
    detile = jnp.float32(0.0) * sub8.astype(jnp.float32)
    band0 = jnp.where(lane8 == (-1 - ll_k0), jnp.float32(0.0),
                      NEG_INF) + detile
    band1 = jnp.where(lane8 == (ll_e0 + 1), lp_trim, NEG_INF) + detile
    lk0 = [jnp.int32(ll_k0)] * R

    row0 = pack_rows(jnp.zeros((R, PAD), jnp.int32),
                     [jnp.int32(ll_e0)] * R, last_col_rows(band0, lk0))
    trace1 = jnp.where(lane8 == (ll_e0 + 1), jnp.int32(FROM_U),
                       jnp.int32(0))
    row1 = pack_rows(trace1, [jnp.int32(ll_e0 + 1)] * R,
                     last_col_rows(band1, lk0))

    def flush_chunks(chunk_idx):
        # one DMA per read: its CHUNK rows live at chunk_ref[:, j, :]
        # reshaped scratch is (CHUNK, R, PAD); copy per read slice
        for j in range(R):
            sem = sems.at[j]
            cp = pltpu.make_async_copy(
                chunk_ref.at[:, j],
                trace_ref.at[g * R + j, pl.ds(chunk_idx * CHUNK, CHUNK)],
                sem,
            )
            cp.start()
        for j in range(R):
            pltpu.make_async_copy(
                chunk_ref.at[:, j],
                trace_ref.at[g * R + j, pl.ds(chunk_idx * CHUNK, CHUNK)],
                sems.at[j],
            ).wait()

    def step(bi, st):
        prev, prev2, ll_e, ll_k, ll_k_prev = st
        # Suzuki rule per read (scalar)
        right = []
        ll_e_new = []
        ll_k_new = []
        for j in range(R):
            llv = jnp.max(jnp.where((sub8 == j) & (lane8 == 0), prev,
                                    NEG_INF))
            urv = jnp.max(jnp.where((sub8 == j) & (lane8 == BW - 1), prev,
                                    NEG_INF))
            both_ob = jnp.isneginf(llv) & jnp.isneginf(urv)
            r_j = jnp.where(both_ob, bi % 2 == 1, llv < urv)
            right.append(r_j)
            ll_e_new.append(jnp.where(r_j, ll_e[j], ll_e[j] + 1))
            ll_k_new.append(jnp.where(r_j, ll_k[j] + 1, ll_k[j]))

        # per-read unaligned rows merged into (R, PAD) tiles
        zero = jnp.zeros((R, PAD), jnp.float32)
        kmean, kstdv, klog, erow = zero, zero, zero, zero
        for j in range(R):
            kstart = ll_k_new[j] + PAD
            kmean = _dyn_slice_merge(kmean_ref, j, kstart, lane8, sub8,
                                     kmean)
            kstdv = _dyn_slice_merge(kstdv_ref, j, kstart, lane8, sub8,
                                     kstdv)
            klog = _dyn_slice_merge(klog_ref, j, kstart, lane8, sub8, klog)
            estart = (E2P - 2 * PAD - 1 - ll_e_new[j]) + PAD
            erow = _dyn_slice_merge(ev_rev_ref, j, estart, lane8, sub8,
                                    erow)

        a = (erow - (scale_v * kmean + shift_v)) / kstdv
        lp_emission = (LOG_INV_SQRT_2PI - klog
                       + jnp.float32(-0.5) * a * a)

        # shared shifted variants + per-sublane select
        right_v = _stack_scalars(
            [r.astype(jnp.float32) for r in right], sub8) > 0.5
        s_diag_v = _stack_scalars(
            [(ll_k_new[j] - ll_k_prev[j] - 1).astype(jnp.float32)
             for j in range(R)], sub8)
        prev_l = _shift8(prev, 1, lane8)      # row[j+1]
        prev_r = _shift8(prev, -1, lane8)     # row[j-1]
        prev2_l = _shift8(prev2, 1, lane8)
        prev2_r = _shift8(prev2, -1, lane8)
        # s_up = 1 if right else 0 ; s_left = s_up - 1 ; s_diag in {-1,0,1}
        up = jnp.where(right_v, prev_l, prev)
        left = jnp.where(right_v, prev, prev_r)
        diag = jnp.where(s_diag_v == 1.0, prev2_l,
                         jnp.where(s_diag_v == -1.0, prev2_r, prev2))

        score_d = diag + lp_step_v + lp_emission
        score_u = up + lp_stay_v + lp_emission
        score_l = left + lp_skip

        max_s = jnp.maximum(score_d, score_u)
        frm = jnp.where(max_s == score_u, jnp.int32(FROM_U),
                        jnp.int32(FROM_D))
        max_s = jnp.maximum(max_s, score_l)
        frm = jnp.where(max_s == score_l, jnp.int32(FROM_L), frm)

        ll_e_v = _stack_scalars([x.astype(jnp.float32) for x in ll_e_new],
                                sub8)
        ll_k_v = _stack_scalars([x.astype(jnp.float32) for x in ll_k_new],
                                sub8)
        lane_f = lane8.astype(jnp.float32)
        event_idx = ll_e_v - lane_f
        kmer_idx = ll_k_v + lane_f
        valid = ((kmer_idx >= 0) & (kmer_idx < n_kmers_v)
                 & (event_idx >= 0) & (event_idx < n_events_v)
                 & (lane8 < BW))
        row = jnp.where(valid, max_s, NEG_INF)
        frm = jnp.where(valid, frm, jnp.int32(0))

        trim_off = -1.0 - ll_k_v
        trim_event = ll_e_v - trim_off
        trim_ok = ((trim_off >= 0) & (trim_off < BW)
                   & (trim_event >= 0) & (trim_event < n_events_v))
        is_trim = (lane_f == trim_off) & trim_ok
        row = jnp.where(is_trim, lp_trim * (trim_event + 1.0), row)
        frm = jnp.where(is_trim, jnp.int32(FROM_U), frm)

        packed = pack_rows(frm, ll_e_new, last_col_rows(row, ll_k_new))
        return (row, prev, ll_e_new, ll_k_new, ll_k), packed

    # the scratch leading dim is untiled (tiling covers (R, PAD)), so a
    # per-step dynamic store needs no 8-row grouping
    chunk_ref[pl.ds(0, 1), :, :] = row0[None]
    chunk_ref[pl.ds(1, 1), :, :] = row1[None]

    def body(bi, carry):
        st = carry
        st, packed = step(bi, st)
        chunk_ref[pl.ds(bi % CHUNK, 1), :, :] = packed[None]

        @pl.when(bi % CHUNK == CHUNK - 1)
        def _():
            flush_chunks(bi // CHUNK)

        return st

    st = (band1, band0, [jnp.int32(ll_e0 + 1)] * R, lk0, lk0)
    # run to the longest read in the group
    n_bands = jnp.minimum(n_events[0] + n_kmers[0] + 2, n_bands_max)
    for j in range(1, R):
        n_bands = jnp.maximum(
            n_bands, jnp.minimum(n_events[j] + n_kmers[j] + 2, n_bands_max))
    st = jax.lax.fori_loop(2, n_bands, body, st)

    @pl.when(((n_bands - 1) % CHUNK) != CHUNK - 1)
    def _():
        flush_chunks((n_bands - 1) // CHUNK)


def _stack_scalars(vals, sub8):
    """8 traced scalars -> (R, PAD) with value j on sublane j."""
    out = jnp.full(sub8.shape, vals[0], dtype=jnp.result_type(vals[0]))
    for j in range(1, R):
        out = jnp.where(sub8 == j, vals[j], out)
    return out


def _shift8(rows, s: int, lane8):
    """rows'[., j] = rows[., j+s] for constant s in {-1, +1}."""
    if s == 1:
        rolled = pltpu.roll(rows, PAD - 1, 1)
        return jnp.where(lane8 == PAD - 1, NEG_INF, rolled)
    rolled = pltpu.roll(rows, 1, 1)
    return jnp.where(lane8 == 0, NEG_INF, rolled)


@functools.partial(jax.jit, static_argnames=("E", "K", "n_bands",
                                             "max_pairs"))
def abea_align_device(ev_concat, ev_off, ev_len, rank_concat, rk_off,
                      rk_len, level_mean, level_stdv, level_log_stdv,
                      scale, shift, lp_stay, lp_step, lp_skip, lp_trim,
                      E: int, K: int, n_bands: int, max_pairs: int):
    """One-dispatch ABEA: on-device batch expansion -> 8-read Pallas fill
    -> sideband unpack -> packed backtrace.  Fusing the stages into one
    jit saves the per-call round trips that dominate on a tunnelled chip.
    B (= ev_off.shape[0]) must be a multiple of 8."""
    from .abea import abea_backtrace_packed, expand_batch_device
    from .abea_pallas import unpack_sideband

    batch = expand_batch_device(
        ev_concat, ev_off, ev_len, rank_concat, rk_off, rk_len,
        level_mean, level_stdv, level_log_stdv, scale, shift, lp_stay,
        lp_step, lp_skip, lp_trim, E=E, K=K)
    ev_rev = jnp.flip(batch.event_means, axis=1)
    trace = abea_fill_pallas8(batch, ev_rev, n_bands)
    fill_out = (trace,) + tuple(unpack_sideband(trace))
    return abea_backtrace_packed(fill_out, batch, max_pairs)


@functools.partial(jax.jit, static_argnames=("n_bands", "interpret"))
def abea_fill_pallas8(batch: AbeaBatch, ev_rev: jnp.ndarray, n_bands: int,
                      interpret: bool = False):
    """8-read-per-step Pallas fill; same output contract as
    abea_fill_pallas.  B must be a multiple of 8."""
    B = batch.event_means.shape[0]
    assert B % R == 0, "batch must be padded to a multiple of 8 reads"
    assert n_bands % CHUNK == 0
    scal = jnp.stack([
        batch.scale, batch.shift, batch.lp_stay, batch.lp_step,
        batch.lp_skip, batch.lp_trim,
        jnp.zeros_like(batch.scale), jnp.zeros_like(batch.scale),
    ], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B // R,),
        in_specs=[
            pl.BlockSpec((R, batch.event_means.shape[1]),
                         lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, batch.kmer_mean.shape[1]),
                         lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, batch.kmer_stdv.shape[1]),
                         lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, batch.kmer_log_stdv.shape[1]),
                         lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((CHUNK, R, PAD), jnp.int32),
            pltpu.SemaphoreType.DMA((R,)),
        ],
    )

    trace = pl.pallas_call(
        _fill_kernel8,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_bands, PAD), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(batch.n_events, batch.n_kmers, scal,
      ev_rev, batch.kmer_mean, batch.kmer_stdv, batch.kmer_log_stdv)
    return trace
