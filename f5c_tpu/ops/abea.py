"""ABEA — batched JAX implementation (device path).

Fixed-shape, batched adaptive banded event alignment:

- **fill**: one ``lax.scan`` over band steps, vmapped over the read batch.
  Carry = two previous band rows (padded to 128 lanes) + band lower-left
  coordinates.  Emits a per-step trace row (uint8 direction per lane) and
  the score of the last-kmer column, so the full score matrix never
  materialises (3 rolling rows, like the reference GPU kernel's shared
  memory window, src/align.cu:256-487).
- **backtrace**: vmapped ``lax.while_loop`` walking the trace from the best
  last-kmer event; emits aligned pairs (kmer_idx, event_idx) and the
  emission-sum QC.
- **postalign / recalibrate**: vectorised segment ops over the pairs.

All shapes are static: reads are padded to (E, K) bucket sizes chosen by
the batching layer; masking handles per-read lengths.  The production
Pallas event-ring kernel (``abea_ring.py``) implements the same DP
faster; this module is the XLA baseline, the CPU fallback, and the
cross-check alternate (F5C_TPU_FILL=xla, tests/test_fill_kernels.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    ABEA_EPSILON_SKIP,
    ABEA_LP_TRIM_P,
    ABEA_MAX_GAP_THRESHOLD,
    ABEA_MIN_AVG_LOG_EMISSION,
    ALN_BANDWIDTH,
)

BW = ALN_BANDWIDTH          # 100 logical lanes
PAD = 128                    # padded lane count (VPU lane width)
NEG_INF = jnp.float32(-jnp.inf)
LOG_INV_SQRT_2PI = jnp.float32(-0.918938)

FROM_D, FROM_U, FROM_L = 0, 1, 2
CHUNK = 256   # Pallas trace rows buffered in VMEM before the HBM DMA


class AbeaBatch(NamedTuple):
    """Padded device inputs for one ABEA batch.

    Per-read model levels are pre-gathered (kmer rank lookup happens once,
    outside the hot loop) and padded by PAD on both sides so band-relative
    dynamic slices never go out of bounds.
    """

    event_means: jnp.ndarray      # f32 [B, E + 2*PAD] (PAD-shifted)
    kmer_mean: jnp.ndarray        # f32 [B, K + 2*PAD]
    kmer_stdv: jnp.ndarray        # f32 [B, K + 2*PAD]
    kmer_log_stdv: jnp.ndarray    # f32 [B, K + 2*PAD]
    n_events: jnp.ndarray         # i32 [B]
    n_kmers: jnp.ndarray          # i32 [B]
    scale: jnp.ndarray            # f32 [B]
    shift: jnp.ndarray            # f32 [B]
    lp_stay: jnp.ndarray          # f32 [B]  log(1 - 1/(events_per_kmer+1))
    lp_step: jnp.ndarray          # f32 [B]
    lp_skip: jnp.ndarray          # f32 [B]
    lp_trim: jnp.ndarray          # f32 [B]


def make_batch(event_means_list, kmer_rank_list, model, pad_events=None,
               pad_kmers=None, scalings=None) -> AbeaBatch:
    """Host-side batch assembly from per-read arrays."""
    B = len(event_means_list)
    E = pad_events or max(int(e.shape[0]) for e in event_means_list)
    K = pad_kmers or max(int(k.shape[0]) for k in kmer_rank_list)
    ev = np.zeros((B, E + 2 * PAD), dtype=np.float32)
    km = np.zeros((B, K + 2 * PAD), dtype=np.float32)
    ks = np.ones((B, K + 2 * PAD), dtype=np.float32)
    kl = np.zeros((B, K + 2 * PAD), dtype=np.float32)
    n_ev = np.zeros(B, dtype=np.int32)
    n_km = np.zeros(B, dtype=np.int32)
    sc = np.ones(B, dtype=np.float32)
    sh = np.zeros(B, dtype=np.float32)
    lp_stay = np.zeros(B, dtype=np.float32)
    lp_step = np.zeros(B, dtype=np.float32)
    for i, (e, kr) in enumerate(zip(event_means_list, kmer_rank_list)):
        ne, nk = e.shape[0], kr.shape[0]
        ev[i, PAD : PAD + ne] = e
        km[i, PAD : PAD + nk] = model.level_mean[kr]
        ks[i, PAD : PAD + nk] = model.level_stdv[kr]
        kl[i, PAD : PAD + nk] = model.level_log_stdv[kr]
        n_ev[i] = ne
        n_km[i] = nk
        if scalings is not None:
            sc[i] = scalings[i].scale
            sh[i] = scalings[i].shift
        events_per_kmer = ne / nk
        p_stay = 1.0 - 1.0 / (events_per_kmer + 1.0)
        lp_stay[i] = np.log(p_stay)
        lp_step[i] = np.log(1.0 - ABEA_EPSILON_SKIP - p_stay)
    return AbeaBatch(
        event_means=jnp.asarray(ev),
        kmer_mean=jnp.asarray(km),
        kmer_stdv=jnp.asarray(ks),
        kmer_log_stdv=jnp.asarray(kl),
        n_events=jnp.asarray(n_ev),
        n_kmers=jnp.asarray(n_km),
        scale=jnp.asarray(sc),
        shift=jnp.asarray(sh),
        lp_stay=jnp.asarray(lp_stay),
        lp_step=jnp.asarray(lp_step),
        lp_skip=jnp.full(B, np.log(ABEA_EPSILON_SKIP), dtype=np.float32),
        lp_trim=jnp.full(B, np.log(ABEA_LP_TRIM_P), dtype=np.float32),
    )


def _shift_row(row, s):
    """row'[j] = row[j + s] for s in {-1, 0, +1}, out-of-range -> -inf."""
    left = jnp.concatenate([row[1:], jnp.array([NEG_INF])])      # s=+1
    right = jnp.concatenate([jnp.array([NEG_INF]), row[:-1]])    # s=-1
    return jnp.where(s == 1, left, jnp.where(s == -1, right, row))


def _fill_single(ev, km, ks, kl, n_events, n_kmers, scale, shift,
                 lp_stay, lp_step, lp_skip, lp_trim, n_bands: int):
    """Band fill for one read; returns (trace [n_bands, PAD] u8,
    ll_event [n_bands] i32, ll_kmer [n_bands] i32,
    last_col_score [n_bands] f32)."""
    offsets = jnp.arange(PAD, dtype=jnp.int32)
    half = BW // 2

    ll_event0 = jnp.int32(half - 1)
    ll_kmer0 = jnp.int32(-1 - half)
    ll_event1 = ll_event0 + 1
    ll_kmer1 = ll_kmer0

    band0 = jnp.full(PAD, NEG_INF)
    band0 = band0.at[-1 - ll_kmer0].set(0.0)
    band1 = jnp.full(PAD, NEG_INF)
    first_trim_off = ll_event1
    band1 = band1.at[first_trim_off].set(lp_trim)
    trace1 = jnp.zeros(PAD, dtype=jnp.uint8).at[first_trim_off].set(FROM_U)

    def last_col_at(row, ll_e, ll_k):
        off = (n_kmers - 1) - ll_k
        valid = (off >= 0) & (off < BW)
        v = jnp.where(valid, row[jnp.clip(off, 0, PAD - 1)], NEG_INF)
        return v

    def step(carry, bi):
        prev, prev2, ll_e_prev, ll_k_prev, ll_e_prev2, ll_k_prev2 = carry
        ll = prev[0]
        ur = prev[BW - 1]
        both_ob = (ll == NEG_INF) & (ur == NEG_INF)
        right = jnp.where(both_ob, bi % 2 == 1, ll < ur)
        ll_e = jnp.where(right, ll_e_prev, ll_e_prev + 1)
        ll_k = jnp.where(right, ll_k_prev + 1, ll_k_prev)

        event_idx = ll_e - offsets          # per lane
        kmer_idx = ll_k + offsets

        # slice model levels at kmer_idx (PAD-shifted arrays)
        kstart = ll_k + PAD
        kmean = jax.lax.dynamic_slice(km, (kstart,), (PAD,))
        kstdv = jax.lax.dynamic_slice(ks, (kstart,), (PAD,))
        klog = jax.lax.dynamic_slice(kl, (kstart,), (PAD,))
        # events at ll_e - offset: reversed slice
        estart = ll_e - (PAD - 1) + PAD
        erow = jax.lax.dynamic_slice(ev, (estart,), (PAD,))[::-1]

        lp_emission = (LOG_INV_SQRT_2PI - klog
                       + jnp.float32(-0.5)
                       * jnp.square((erow - (scale * kmean + shift)) / kstdv))

        # shifts of previous rows (see band offset algebra in abea_ref)
        s_up = jnp.where(right, 1, 0).astype(jnp.int32)
        s_left = s_up - 1
        s_diag = (ll_k - ll_k_prev2) - 1    # in {-1, 0, +1}
        up = _shift_row(prev, s_up)
        left = _shift_row(prev, s_left)
        diag = _shift_row(prev2, s_diag)

        score_d = diag + lp_step + lp_emission
        score_u = up + lp_stay + lp_emission
        score_l = left + lp_skip

        max_s = score_d
        frm = jnp.full(PAD, FROM_D, dtype=jnp.uint8)
        max_s = jnp.maximum(max_s, score_u)
        frm = jnp.where(max_s == score_u, jnp.uint8(FROM_U), frm)
        max_s = jnp.maximum(max_s, score_l)
        frm = jnp.where(max_s == score_l, jnp.uint8(FROM_L), frm)

        # in-band mask: 0 <= kmer < n_kmers and 0 <= event < n_events
        valid = ((kmer_idx >= 0) & (kmer_idx < n_kmers)
                 & (event_idx >= 0) & (event_idx < n_events)
                 & (offsets < BW))
        row = jnp.where(valid, max_s, NEG_INF)
        frm = jnp.where(valid, frm, jnp.uint8(0))

        # trim column (kmer == -1)
        trim_off = -1 - ll_k
        trim_event = ll_e - trim_off
        trim_ok = ((trim_off >= 0) & (trim_off < BW)
                   & (trim_event >= 0) & (trim_event < n_events))
        row = jnp.where((offsets == trim_off) & trim_ok,
                        lp_trim * (trim_event + 1).astype(jnp.float32), row)
        frm = jnp.where((offsets == trim_off) & trim_ok, jnp.uint8(FROM_U),
                        frm)

        lc = last_col_at(row, ll_e, ll_k)
        new_carry = (row, prev, ll_e, ll_k, ll_e_prev, ll_k_prev)
        return new_carry, (frm, ll_e, ll_k, lc)

    carry0 = (band1, band0, ll_event1, ll_kmer1, ll_event0, ll_kmer0)
    _, (traces, ll_es, ll_ks, lcs) = jax.lax.scan(
        step, carry0, jnp.arange(2, n_bands, dtype=jnp.int32))

    trace = jnp.concatenate([jnp.zeros((1, PAD), jnp.uint8), trace1[None],
                             traces], axis=0)
    ll_event = jnp.concatenate(
        [jnp.array([ll_event0, ll_event1], jnp.int32), ll_es])
    ll_kmer = jnp.concatenate(
        [jnp.array([ll_kmer0, ll_kmer1], jnp.int32), ll_ks])
    lc0 = last_col_at(band0, ll_event0, ll_kmer0)
    lc1 = last_col_at(band1, ll_event1, ll_kmer1)
    last_col = jnp.concatenate([jnp.array([lc0, lc1]), lcs])
    return trace, ll_event, ll_kmer, last_col


@functools.partial(jax.jit, static_argnames=("n_bands",))
def abea_fill(batch: AbeaBatch, n_bands: int):
    """Vmapped band fill. Returns trace [B, n_bands, PAD] u8,
    ll_event/ll_kmer [B, n_bands] i32, last_col [B, n_bands] f32."""
    f = jax.vmap(lambda *a: _fill_single(*a, n_bands=n_bands))
    return f(batch.event_means, batch.kmer_mean, batch.kmer_stdv,
             batch.kmer_log_stdv, batch.n_events, batch.n_kmers,
             batch.scale, batch.shift, batch.lp_stay, batch.lp_step,
             batch.lp_skip, batch.lp_trim)


def _backtrace_single(trace, ll_event, ll_kmer, last_col, ev, km, ks, kl,
                      n_events, n_kmers, scale, shift, lp_trim,
                      max_pairs: int):
    """Backtrace one read. Returns (pair_kmer, pair_event i32[max_pairs]
    stored in REVERSE path order, n_pairs, sum_emission f32, max_gap)."""
    n_bands = trace.shape[0]
    # best start event: score at last-kmer column + trim penalty for the rest
    band_ids = jnp.arange(n_bands, dtype=jnp.int32)
    off_lc = (n_kmers - 1) - ll_kmer
    event_at_lc = ll_event - off_lc
    s = last_col + (n_events - event_at_lc).astype(jnp.float32) * lp_trim
    s = jnp.where((event_at_lc >= 0) & (event_at_lc < n_events)
                  & (off_lc >= 0) & (off_lc < BW), s, NEG_INF)
    # f5c scans event_idx ascending; band index for (e, K-1) ascends with e,
    # strict > keeps the first best — argmax over ascending bands matches.
    best_band = jnp.argmax(s)
    curr_event = event_at_lc[best_band]
    curr_kmer = n_kmers - 1
    # guard: no valid start -> empty
    any_valid = s[best_band] > NEG_INF

    def emission_at(kmer_idx, event_idx):
        emean = ev[event_idx + PAD]
        gmean = scale * km[kmer_idx + PAD] + shift
        a = (emean - gmean) / ks[kmer_idx + PAD]
        return LOG_INV_SQRT_2PI - kl[kmer_idx + PAD] + jnp.float32(-0.5) * a * a

    def cond(st):
        k, e, n, *_ = st
        return (k >= 0) & (e >= 0) & (n < max_pairs)

    def body(st):
        k, e, n, sum_em, gap, max_gap, pk, pe = st
        pk = pk.at[n].set(k)
        pe = pe.at[n].set(e)
        sum_em = sum_em + emission_at(k, e)
        bi = (e + 1) + (k + 1)
        offset = ll_event[bi] - e
        f = trace[bi, offset]
        is_d = f == FROM_D
        is_u = f == FROM_U
        k = jnp.where(is_u, k, k - 1)
        e = jnp.where(is_d | is_u, e - 1, e)
        gap = jnp.where(is_d | is_u, 0, gap + 1)
        max_gap = jnp.maximum(max_gap, gap)
        return (k, e, n + 1, sum_em, gap, max_gap, pk, pe)

    pk0 = jnp.zeros(max_pairs, dtype=jnp.int32)
    pe0 = jnp.zeros(max_pairs, dtype=jnp.int32)
    init = (jnp.where(any_valid, curr_kmer, -1),
            jnp.where(any_valid, curr_event, -1),
            jnp.int32(0), jnp.float32(0.0), jnp.int32(0), jnp.int32(0),
            pk0, pe0)
    k, e, n, sum_em, gap, max_gap, pk, pe = jax.lax.while_loop(
        cond, body, init)

    avg = sum_em / jnp.maximum(n.astype(jnp.float32), 1.0)
    # spanned: first pair (reverse order: index n-1) kmer == 0,
    # last pair (index 0) kmer == n_kmers-1
    first_k = pk[jnp.maximum(n - 1, 0)]
    spanned = (n > 0) & (first_k == 0) & (pk[0] == n_kmers - 1)
    failed = ((avg < ABEA_MIN_AVG_LOG_EMISSION) | (~spanned)
              | (max_gap > ABEA_MAX_GAP_THRESHOLD) | (n == 0))
    return pk, pe, n, sum_em, max_gap, failed


@functools.partial(jax.jit, static_argnames=("max_pairs",))
def abea_backtrace(fill_out, batch: AbeaBatch, max_pairs: int):
    trace, ll_event, ll_kmer, last_col = fill_out
    f = jax.vmap(lambda *a: _backtrace_single(*a, max_pairs=max_pairs))
    return f(trace, ll_event, ll_kmer, last_col, batch.event_means,
             batch.kmer_mean, batch.kmer_stdv, batch.kmer_log_stdv,
             batch.n_events, batch.n_kmers, batch.scale, batch.shift,
             batch.lp_trim)


def align_batch(batch: AbeaBatch, n_bands: int, max_pairs: int):
    """Fill + backtrace; returns per-read (pairs reverse-ordered, counts,
    QC)."""
    fill_out = abea_fill(batch, n_bands)
    return abea_backtrace(fill_out, batch, max_pairs)


# --- compact-output backtrace --------------------------------------------
#
# The pairs arrays are huge ([B, E+K] i32 x2) and device->host bandwidth is
# the scarce resource; instead of materialising pairs on device, emit the
# walk as 2-bit direction codes packed 4-per-byte plus the start cell.  The
# native postalign (f5c_decode_postalign) reconstructs the pairs while
# computing the base-to-event map, so the full pairs array never crosses
# the device boundary.

def _backtrace_packed_single(trace, ll_event, ll_kmer, last_col, ev,
                             kparams, n_events, n_kmers, scale, shift,
                             lp_trim, max_pairs: int):
    """Backtrace one read, compact output.

    Returns (dirs u8 [max_pairs] with values FROM_*, start_event i32,
    n_pairs i32, sum_emission f32, max_gap i32, failed bool).  The walk
    starts at (n_kmers-1, start_event); pair i (reverse path order) is
    reconstructed by applying dirs[0..i)."""
    n_bands = trace.shape[0]
    off_lc = (n_kmers - 1) - ll_kmer
    event_at_lc = ll_event - off_lc
    s = last_col + (n_events - event_at_lc).astype(jnp.float32) * lp_trim
    s = jnp.where((event_at_lc >= 0) & (event_at_lc < n_events)
                  & (off_lc >= 0) & (off_lc < BW), s, NEG_INF)
    best_band = jnp.argmax(s)
    start_event = event_at_lc[best_band]
    any_valid = s[best_band] > NEG_INF

    def emission_at(kmer_idx, event_idx):
        # one 4-wide slice of the interleaved (mean, stdv, log_stdv, 0)
        # row instead of three separate gathers — the walk is gather-bound
        emean = ev[event_idx + PAD]
        p = jax.lax.dynamic_slice(kparams, (4 * (kmer_idx + PAD),), (4,))
        gmean = scale * p[0] + shift
        a = (emean - gmean) / p[1]
        return LOG_INV_SQRT_2PI - p[2] + jnp.float32(-0.5) * a * a

    n_bands_i = trace.shape[0]

    def cond(st):
        k, e, n, *_ = st
        return (k >= 0) & (e >= 0) & (n < max_pairs)

    def one_step(st):
        """One masked walk step (the walk is a strict serial dependence;
        several steps are unrolled per while iteration to amortise loop
        overhead)."""
        k, e, n, sum_em, gap, max_gap, last_k, dirs = st
        active = (k >= 0) & (e >= 0) & (n < max_pairs)
        ks_ = jnp.clip(k, 0, None)
        es_ = jnp.clip(e, 0, None)
        sum_em = sum_em + jnp.where(active, emission_at(ks_, es_), 0.0)
        last_k = jnp.where(active, k, last_k)
        bi = jnp.clip((es_ + 1) + (ks_ + 1), 0, n_bands_i - 1)
        offset = jnp.clip(ll_event[bi] - es_, 0, PAD - 1)
        f = trace[bi, offset].astype(jnp.uint8)
        # inactive lanes drop their write (OOB index) and freeze state
        dirs = dirs.at[jnp.where(active, n, max_pairs)].set(f, mode="drop")
        is_d = f == FROM_D
        is_u = f == FROM_U
        k = jnp.where(active, jnp.where(is_u, k, k - 1), k)
        e = jnp.where(active, jnp.where(is_d | is_u, e - 1, e), e)
        gap = jnp.where(active, jnp.where(is_d | is_u, 0, gap + 1), gap)
        max_gap = jnp.maximum(max_gap, gap)
        n = jnp.where(active, n + 1, n)
        return (k, e, n, sum_em, gap, max_gap, last_k, dirs)

    def body(st):
        for _ in range(16):
            st = one_step(st)
        return st

    dirs0 = jnp.zeros(max_pairs, dtype=jnp.uint8)
    init = (jnp.where(any_valid, n_kmers - 1, -1),
            jnp.where(any_valid, start_event, -1),
            jnp.int32(0), jnp.float32(0.0), jnp.int32(0), jnp.int32(0),
            jnp.int32(-1), dirs0)
    k, e, n, sum_em, gap, max_gap, last_k, dirs = jax.lax.while_loop(
        cond, body, init)

    avg = sum_em / jnp.maximum(n.astype(jnp.float32), 1.0)
    spanned = (n > 0) & (last_k == 0)
    failed = ((avg < ABEA_MIN_AVG_LOG_EMISSION) | (~spanned)
              | (max_gap > ABEA_MAX_GAP_THRESHOLD) | (n == 0))
    # pack 4 directions per byte (2 bits each, little-endian within byte)
    d4 = dirs.reshape(max_pairs // 4, 4).astype(jnp.int32)
    w = jnp.array([1, 4, 16, 64], dtype=jnp.int32)
    packed = jnp.sum(d4 * w[None, :], axis=1).astype(jnp.uint8)
    return packed, start_event, n, sum_em, max_gap, failed


@functools.partial(jax.jit, static_argnames=("max_pairs",))
def abea_backtrace_packed(fill_out, batch: AbeaBatch, max_pairs: int):
    """Compact backtrace over the batch; max_pairs must be divisible by
    4.  Returns (packed_dirs u8 [B, max_pairs//4], start_event i32 [B],
    n_pairs i32 [B], sum_emission f32 [B], max_gap i32 [B],
    failed bool [B])."""
    trace, ll_event, ll_kmer, last_col = fill_out
    B, KW = batch.kmer_mean.shape
    kparams = jnp.stack(
        [batch.kmer_mean, batch.kmer_stdv, batch.kmer_log_stdv,
         jnp.zeros_like(batch.kmer_mean)], axis=-1).reshape(B, 4 * KW)
    f = jax.vmap(lambda *a: _backtrace_packed_single(*a,
                                                     max_pairs=max_pairs))
    return f(trace, ll_event, ll_kmer, last_col, batch.event_means,
             kparams, batch.n_events, batch.n_kmers, batch.scale,
             batch.shift, batch.lp_trim)


def decode_packed_dirs(packed_row: np.ndarray, n: int, start_event: int,
                       n_kmers: int) -> np.ndarray:
    """NumPy fallback for native.decode_postalign's pair reconstruction:
    packed 2-bit walk -> ascending (kmer, event) pairs [n, 2]."""
    nb = (n + 3) // 4
    b = packed_row[:nb].astype(np.uint8)
    d = np.stack([(b >> 0) & 3, (b >> 2) & 3, (b >> 4) & 3, (b >> 6) & 3],
                 axis=1).reshape(-1)[:n]
    is_u = d == FROM_U
    is_d = d == FROM_D
    dk = np.where(is_u, 0, -1)
    de = np.where(is_u | is_d, -1, 0)
    ks = (n_kmers - 1) + np.concatenate([[0], np.cumsum(dk[:-1])])
    es = start_event + np.concatenate([[0], np.cumsum(de[:-1])])
    return np.stack([ks[::-1], es[::-1]], axis=1).astype(np.int32)


@functools.partial(jax.jit, static_argnames=("E", "K"))
def expand_batch_device(ev_concat, ev_off, ev_len, rank_concat, rk_off,
                        rk_len, level_mean, level_stdv, level_log_stdv,
                        scale, shift, lp_stay, lp_step, lp_skip, lp_trim,
                        E: int, K: int) -> AbeaBatch:
    """Build the padded AbeaBatch on device from flat concatenated
    per-read arrays — the host ships ~E bytes per event instead of the
    fully padded rows (device->host/host->device bandwidth is the scarce
    resource on a tunnelled chip)."""
    B = ev_off.shape[0]
    col_e = jnp.arange(E + 2 * PAD, dtype=jnp.int32)[None, :]
    src_e = ev_off[:, None] + (col_e - PAD)
    mask_e = (col_e >= PAD) & (col_e < PAD + ev_len[:, None])
    ev = jnp.where(mask_e,
                   ev_concat[jnp.clip(src_e, 0, ev_concat.shape[0] - 1)],
                   jnp.float32(0.0))
    col_k = jnp.arange(K + 2 * PAD, dtype=jnp.int32)[None, :]
    src_k = rk_off[:, None] + (col_k - PAD)
    mask_k = (col_k >= PAD) & (col_k < PAD + rk_len[:, None])
    rk = rank_concat[jnp.clip(src_k, 0, rank_concat.shape[0] - 1)].astype(
        jnp.int32)
    km = jnp.where(mask_k, level_mean[rk], jnp.float32(0.0))
    ks = jnp.where(mask_k, level_stdv[rk], jnp.float32(1.0))
    kl = jnp.where(mask_k, level_log_stdv[rk], jnp.float32(0.0))
    return AbeaBatch(
        event_means=ev, kmer_mean=km, kmer_stdv=ks, kmer_log_stdv=kl,
        n_events=ev_len.astype(jnp.int32), n_kmers=rk_len.astype(jnp.int32),
        scale=scale, shift=shift, lp_stay=lp_stay, lp_step=lp_step,
        lp_skip=lp_skip, lp_trim=lp_trim)
