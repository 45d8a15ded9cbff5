"""ABEA band fill — Pallas TPU kernel.

One read per grid step (the grid is sequential per TensorCore; Megacore
splits it across the two cores).  The DP band is a 128-lane vector row
(100 logical lanes + spare tail), the band recurrence carries two rolling
rows in VMEM — the same 3-row rolling window as the reference GPU kernel
(align.cu:256-487) — and the per-band trace row (u8 direction per lane)
streams to HBM through a VMEM chunk buffer.

Side-band packing: the per-band scalars the backtrace needs — the band's
lower-left event index and the score of the last-kmer column — are packed
into the trace row's spare lanes (100..103 = ll_event bytes, 104..107 =
last-column f32 bits), so the kernel has exactly one output stream and the
backtrace unpacks them with cheap vector ops.

Inputs are the same padded AbeaBatch as the XLA path, plus events reversed
(``ev_rev``) so the kernel's reversed band slice is a contiguous ascending
dynamic slice instead of a lane reversal.

Numerics match ``abea.py`` / ``abea_ref.py``: f32 cells, skip > stay > step
tie preference, Suzuki band rule with the even/odd fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .abea import PAD, AbeaBatch

BW = 100
NEG_INF = np.float32(-np.inf)
LOG_INV_SQRT_2PI = np.float32(-0.918938)
FROM_D, FROM_U, FROM_L = 0, 1, 2
CHUNK = 256              # trace rows buffered in VMEM before the HBM DMA
LL_LANE = 104            # lanes 104..107: ll_event i32 bytes
LC_LANE = 108            # lanes 108..111: last_col f32 bytes


def _dyn_slice(ref3, start, lane):
    """ref3[0, 0, start : start+PAD] for an arbitrary (unaligned) start.

    Mosaic only allows 128-aligned dynamic vector loads, so this loads the
    two covering aligned blocks and stitches them with a dynamic rotate.
    """
    base = (start // PAD) * PAD
    rem = start - base
    v0 = ref3[0, 0, pl.ds(pl.multiple_of(base, PAD), PAD)][None, :]
    v1 = ref3[0, 0, pl.ds(pl.multiple_of(base + PAD, PAD), PAD)][None, :]
    shift = (PAD - rem) % PAD        # out[j] = v[(j + rem) % PAD]
    r0 = pltpu.roll(v0, shift, 1)
    r1 = pltpu.roll(v1, shift, 1)
    return jnp.where(lane < PAD - rem, r0, r1)


def _shift_lanes(row, s, lane):
    """row'[j] = row[j+s] for s in {-1,0,1}; out-of-range lanes -> -inf."""
    rolled_l = pltpu.roll(row, PAD - 1, 1)   # row[(j+1) % PAD]
    rolled_r = pltpu.roll(row, 1, 1)         # row[(j-1) % PAD]
    left = jnp.where(lane == PAD - 1, NEG_INF, rolled_l)
    right = jnp.where(lane == 0, NEG_INF, rolled_r)
    return jnp.where(s == 1, left, jnp.where(s == -1, right, row))


def _pack_sideband(frm_i32, ll_e, lc, lane):
    """Embed ll_event (lane LL_LANE) and last_col f32 bits (lane LC_LANE)
    into the i32 trace row."""
    lc_vec = jnp.full(lane.shape, lc, dtype=jnp.float32)
    lc_bits = jax.lax.bitcast_convert_type(lc_vec, jnp.int32)
    out = jnp.where(lane == LL_LANE, jnp.int32(ll_e), frm_i32)
    out = jnp.where(lane == LC_LANE, lc_bits, out)
    return out


def unpack_sideband(trace):
    """trace [B, n_bands, PAD] i32 -> (ll_event i32, ll_kmer i32,
    last_col f32), each [B, n_bands]."""
    ll_event = trace[..., LL_LANE]
    last_col = jax.lax.bitcast_convert_type(trace[..., LC_LANE],
                                            jnp.float32)
    # each band moves exactly one of (event, kmer): ll_e + ll_k = bi - 2
    bi = jnp.arange(trace.shape[1], dtype=jnp.int32)[None, :]
    ll_kmer = bi - 2 - ll_event
    return ll_event, ll_kmer, last_col


def _fill_kernel(n_events_ref, n_kmers_ref, scal_ref,
                 ev_rev_ref, kmean_ref, kstdv_ref, klog_ref,
                 trace_ref, chunk_ref, sems):
    b = pl.program_id(0)
    n_events = n_events_ref[b]
    n_kmers = n_kmers_ref[b]
    scale = scal_ref[b, 0]
    shift = scal_ref[b, 1]
    lp_stay = scal_ref[b, 2]
    lp_step = scal_ref[b, 3]
    lp_skip = scal_ref[b, 4]
    lp_trim = scal_ref[b, 5]

    n_bands_max = trace_ref.shape[1]
    E2P = ev_rev_ref.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, PAD), 1)

    half = BW // 2
    ll_e0 = half - 1
    ll_k0 = -1 - half

    def last_col_val(row, ll_k):
        off = (n_kmers - 1) - ll_k
        valid = (off >= 0) & (off < BW)
        v = jnp.max(jnp.where(lane == off, row, NEG_INF))
        return jnp.where(valid, v, NEG_INF)

    band0 = jnp.where(lane == (-1 - ll_k0), jnp.float32(0.0), NEG_INF)
    first_trim_off = ll_e0 + 1
    band1 = jnp.where(lane == first_trim_off, lp_trim, NEG_INF)

    row0 = _pack_sideband(jnp.zeros((1, PAD), jnp.int32), ll_e0,
                          last_col_val(band0, ll_k0), lane)
    trace1 = jnp.where(lane == first_trim_off, jnp.int32(FROM_U),
                       jnp.int32(0))
    row1 = _pack_sideband(trace1, ll_e0 + 1,
                          last_col_val(band1, ll_k0), lane)

    GRP = 8  # band steps per unrolled group == one aligned (8, PAD) store

    def flush_chunk(chunk_idx):
        sem = sems.at[0]
        cp = pltpu.make_async_copy(
            chunk_ref,
            trace_ref.at[b, pl.ds(chunk_idx * CHUNK, CHUNK)],
            sem,
        )
        cp.start()
        cp.wait()

    def step(bi, st):
        """One band step; st = (prev, prev2, ll_e_prev, ll_k_prev,
        ll_k_prev2); returns (new_st, packed_row)."""
        prev, prev2, ll_e_prev, ll_k_prev, ll_k_prev2 = st
        ll = jnp.max(jnp.where(lane == 0, prev, NEG_INF))
        ur = jnp.max(jnp.where(lane == BW - 1, prev, NEG_INF))
        both_ob = jnp.isneginf(ll) & jnp.isneginf(ur)
        right = jnp.where(both_ob, bi % 2 == 1, ll < ur)
        ll_e = jnp.where(right, ll_e_prev, ll_e_prev + 1)
        ll_k = jnp.where(right, ll_k_prev + 1, ll_k_prev)

        kstart = ll_k + PAD
        kmean = _dyn_slice(kmean_ref, kstart, lane)
        kstdv = _dyn_slice(kstdv_ref, kstart, lane)
        klog = _dyn_slice(klog_ref, kstart, lane)
        # ev[ll_e - j] = ev_rev[(E-1-ll_e) + j], arrays PAD-shifted
        estart = (E2P - 2 * PAD - 1 - ll_e) + PAD
        erow = _dyn_slice(ev_rev_ref, estart, lane)

        a = (erow - (scale * kmean + shift)) / kstdv
        lp_emission = (LOG_INV_SQRT_2PI - klog
                       + jnp.float32(-0.5) * a * a)

        s_up = jnp.where(right, 1, 0)
        s_diag = (ll_k - ll_k_prev2) - 1
        up = _shift_lanes(prev, s_up, lane)
        left = _shift_lanes(prev, s_up - 1, lane)
        diag = _shift_lanes(prev2, s_diag, lane)

        score_d = diag + lp_step + lp_emission
        score_u = up + lp_stay + lp_emission
        score_l = left + lp_skip

        max_s = jnp.maximum(score_d, score_u)
        frm = jnp.where(max_s == score_u, jnp.int32(FROM_U),
                        jnp.int32(FROM_D))
        max_s = jnp.maximum(max_s, score_l)
        frm = jnp.where(max_s == score_l, jnp.int32(FROM_L), frm)

        event_idx = ll_e - lane
        kmer_idx = ll_k + lane
        valid = ((kmer_idx >= 0) & (kmer_idx < n_kmers)
                 & (event_idx >= 0) & (event_idx < n_events)
                 & (lane < BW))
        row = jnp.where(valid, max_s, NEG_INF)
        frm = jnp.where(valid, frm, jnp.int32(0))

        trim_off = -1 - ll_k
        trim_event = ll_e - trim_off
        trim_ok = ((trim_off >= 0) & (trim_off < BW)
                   & (trim_event >= 0) & (trim_event < n_events))
        is_trim = (lane == trim_off) & trim_ok
        row = jnp.where(is_trim,
                        lp_trim * (trim_event + 1).astype(jnp.float32), row)
        frm = jnp.where(is_trim, jnp.int32(FROM_U), frm)

        packed = _pack_sideband(frm, ll_e, last_col_val(row, ll_k), lane)
        return (row, prev, ll_e, ll_k, ll_k_prev), packed

    def store_group(g, rows):
        tile = jnp.concatenate(rows, axis=0)   # (GRP, PAD)
        grp_in_chunk = (g % (CHUNK // GRP)) * GRP
        chunk_ref[pl.ds(pl.multiple_of(grp_in_chunk, GRP), GRP), :] = tile

        @pl.when(g % (CHUNK // GRP) == (CHUNK // GRP) - 1)
        def _():
            flush_chunk((g * GRP) // CHUNK)

    # group 0 (rows 0..7): rows 0,1 are the preset bands
    st = (band1, band0, jnp.int32(ll_e0 + 1), jnp.int32(ll_k0),
          jnp.int32(ll_k0))
    rows = [row0, row1]
    for j in range(2, GRP):
        st, packed = step(jnp.int32(j), st)
        rows.append(packed)
    store_group(0, rows)

    def group_body(g, carry):
        st = carry
        rows = []
        base = g * GRP
        for j in range(GRP):
            st, packed = step(base + j, st)
            rows.append(packed)
        store_group(g, rows)
        return st

    n_bands = jnp.minimum(n_events + n_kmers + 2, n_bands_max)
    n_groups = (n_bands + GRP - 1) // GRP   # overrun rows are never read
    st = jax.lax.fori_loop(1, n_groups, group_body, st)
    # flush the trailing partial chunk (stale rows beyond n_bands unread)
    last_chunk = (n_groups * GRP - 1) // CHUNK

    @pl.when((n_groups % (CHUNK // GRP)) != 0)
    def _():
        flush_chunk(last_chunk)


@functools.partial(jax.jit, static_argnames=("n_bands", "interpret"))
def abea_fill_pallas(batch: AbeaBatch, ev_rev: jnp.ndarray, n_bands: int,
                     interpret: bool = False):
    """Pallas band fill. Returns packed trace [B, n_bands, PAD] u8; use
    ``unpack_sideband`` for the backtrace scalars."""
    B = batch.event_means.shape[0]
    assert n_bands % CHUNK == 0, "n_bands must be a multiple of CHUNK"
    scal = jnp.stack([
        batch.scale, batch.shift, batch.lp_stay, batch.lp_step,
        batch.lp_skip, batch.lp_trim,
        jnp.zeros_like(batch.scale), jnp.zeros_like(batch.scale),
    ], axis=1)  # [B, 8]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,     # n_events, n_kmers, scal
        grid=(B,),
        in_specs=[
            # leading (1, 1) keeps the last-two-dims tiling constraint happy
            pl.BlockSpec((1, 1, batch.event_means.shape[1]),
                         lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, batch.kmer_mean.shape[1]),
                         lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, batch.kmer_stdv.shape[1]),
                         lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, batch.kmer_log_stdv.shape[1]),
                         lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        # ANY-space outputs must be whole-array; the kernel DMAs into its
        # own read's rows via program_id
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((CHUNK, PAD), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def kernel(n_ev, n_km, scal_r, ev_rev_r, kmean, kstdv, klog,
               trace, chunk, sems):
        _fill_kernel(n_ev, n_km, scal_r, ev_rev_r, kmean, kstdv,
                     klog, trace, chunk, sems)

    trace = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_bands, PAD), jnp.int32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(batch.n_events, batch.n_kmers, scal,
      ev_rev[:, None, :], batch.kmer_mean[:, None, :],
      batch.kmer_stdv[:, None, :], batch.kmer_log_stdv[:, None, :])
    return trace


def make_ev_rev(batch: AbeaBatch) -> jnp.ndarray:
    """Reversed event array so the kernel slices ascending lanes."""
    return jnp.flip(batch.event_means, axis=1)
