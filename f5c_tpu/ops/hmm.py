"""Profile-HMM forward — batched JAX implementation (device path).

Scores many (sequence window, event window) work items at once: items are
padded to a (max_events, max_kmers) bucket and vmapped; each item is a
``lax.scan`` over event rows carrying the per-kmer M/B/K state vectors.

TPU-specific design:
- the within-row KMER_SKIP chain (K_i depends on K_{i-1} of the same row)
  is a log-semiring linear recurrence; with a constant self-transition it
  reduces to ``K_i = i*lp_kk + logcumsumexp(c_i - i*lp_kk)``, computed with
  an associative scan so the row stays fully vectorised,
- soft-clip flank vectors have closed forms (geometric in row index), so
  nothing row-dependent is precomputed or gathered,
- emission parameters (model Gaussians per kmer) are gathered once per
  item before the scan.

Float32 throughout (the reference uses a 0.001-nat lookup-table logsum;
exact f32 logaddexp is strictly more accurate).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    HMM_BACKGROUND_EMISSION,
    HMM_P_BAD,
    HMM_P_SKIP,
    HMM_P_SKIP_SELF,
    TRANS_CLIP_SELF,
    TRANS_START_TO_CLIP,
)

NEG_INF = jnp.float32(-jnp.inf)
LOG_INV_SQRT_2PI = jnp.float32(-0.918938)

_LP_SC = float(np.log(TRANS_START_TO_CLIP))
_LP_NSC = float(np.log(1 - TRANS_START_TO_CLIP))
_LP_CS = float(np.log(TRANS_CLIP_SELF))
_LP_NCS = float(np.log(1 - TRANS_CLIP_SELF))
_BG = HMM_BACKGROUND_EMISSION
_LP_MK = float(np.log(HMM_P_SKIP))
_LP_MB = float(np.log(HMM_P_BAD))
_LP_KK = float(np.log(HMM_P_SKIP_SELF))
_LP_KM = float(np.log(1 - HMM_P_SKIP_SELF))
_LP_B3 = float(np.log((1.0 - HMM_P_BAD) / 3))  # bk / bm_next / bm_self
_LP_BB = float(np.log(HMM_P_BAD))


class HmmBatch(NamedTuple):
    """Padded device inputs for one HMM scoring batch of N work items."""

    gp_mean: jnp.ndarray       # f32 [N, K] scaled model means per kmer
    gp_inv_stdv: jnp.ndarray   # f32 [N, K] 1/(stdv*var)
    gp_log_stdv: jnp.ndarray   # f32 [N, K] log(stdv)+log(var)
    event_means: jnp.ndarray   # f32 [N, E] window events in ROW ORDER
    n_kmers: jnp.ndarray       # i32 [N]
    n_events: jnp.ndarray      # i32 [N]
    lp_stay: jnp.ndarray       # f32 [N] log(1 - 1/events_per_base)
    lp_step: jnp.ndarray       # f32 [N] log(1 - p_stay - p_skip - p_bad)


def make_hmm_batch(items, event_means_per_item, model, scalings,
                   events_per_base, pad_events: int, pad_kmers: int
                   ) -> HmmBatch:
    """Host-side assembly.

    ``items``: HmmWorkItem list; ``event_means_per_item``: the read's full
    event-mean array per item; events are materialised into row order
    (following event_stride) so the device scan is a plain row walk.
    """
    from .hmm_ref import window_kmer_ranks

    N = len(items)
    gp_mean = np.zeros((N, pad_kmers), dtype=np.float32)
    gp_inv = np.ones((N, pad_kmers), dtype=np.float32)
    gp_log = np.zeros((N, pad_kmers), dtype=np.float32)
    ev = np.zeros((N, pad_events), dtype=np.float32)
    n_km = np.zeros(N, dtype=np.int32)
    n_ev = np.zeros(N, dtype=np.int32)
    lp_stay = np.zeros(N, dtype=np.float32)
    lp_step = np.zeros(N, dtype=np.float32)
    for i, it in enumerate(items):
        ranks = window_kmer_ranks(it.seq, it.rc_seq, it.rc, model)
        nk = ranks.shape[0]
        sc = scalings[i]
        var32 = np.float32(sc.var)
        gp_mean[i, :nk] = (np.float32(sc.scale) * model.level_mean[ranks]
                           + np.float32(sc.shift))
        stdv = model.level_stdv[ranks] * var32
        gp_inv[i, :nk] = 1.0 / stdv
        gp_log[i, :nk] = model.level_log_stdv[ranks] + np.log(var32)
        ne = abs(it.event_stop_idx - it.event_start_idx) + 1
        idx = it.event_start_idx + np.arange(ne) * it.event_stride
        ev[i, :ne] = event_means_per_item[i][idx]
        n_km[i] = nk
        n_ev[i] = ne
        epb = events_per_base[i]
        p_stay = 1 - 1 / epb
        lp_stay[i] = np.log(p_stay)
        lp_step[i] = np.log(1.0 - p_stay - HMM_P_SKIP - HMM_P_BAD)
    return HmmBatch(
        gp_mean=jnp.asarray(gp_mean), gp_inv_stdv=jnp.asarray(gp_inv),
        gp_log_stdv=jnp.asarray(gp_log), event_means=jnp.asarray(ev),
        n_kmers=jnp.asarray(n_km), n_events=jnp.asarray(n_ev),
        lp_stay=jnp.asarray(lp_stay), lp_step=jnp.asarray(lp_step),
    )


def _pre_flank(row_minus_1):
    """pre_flank[i], closed form (hmm_ref.make_flanks)."""
    i = row_minus_1.astype(jnp.float32)
    first = jnp.float32(_LP_NSC)
    rest = (jnp.float32(_LP_SC + _BG + _LP_NCS)
            + (i - 1) * jnp.float32(_LP_CS + _BG))
    return jnp.where(row_minus_1 == 0, first, rest)


def _post_flank(row_minus_1, n_events):
    i = row_minus_1.astype(jnp.float32)
    ne = n_events.astype(jnp.float32)
    last = jnp.float32(_LP_NSC)
    rest = (jnp.float32(_LP_SC + _BG + _LP_NCS)
            + (ne - 2 - i) * jnp.float32(_LP_CS + _BG))
    return jnp.where(row_minus_1 == n_events - 1, last, rest)


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    d = -jnp.abs(a - b)
    out = m + jnp.log1p(jnp.exp(d))
    return jnp.where(jnp.isneginf(m), NEG_INF, out)


def _logcumsumexp_chain(c, lp_kk):
    """K_i = logsum(c_i, K_{i-1} + lp_kk), vectorised.

    With a constant self-transition g the recurrence has the closed form
    K_i = i*g + logcumsumexp(c_j - j*g).  Renormalising by the global max
    keeps everything in f32 range; terms more than ~88 nats below the max
    underflow to zero, which is far below the scorer's numeric noise floor
    (the reference's table logsum truncates at 15.7 nats).
    """
    idx = jnp.arange(c.shape[0], dtype=jnp.float32)
    d = c - idx * lp_kk
    m = jnp.max(d)
    m_safe = jnp.where(jnp.isneginf(m), jnp.float32(0.0), m)
    s = jnp.cumsum(jnp.exp(d - m_safe))
    out = idx * lp_kk + jnp.log(s) + m_safe
    return jnp.where(s > 0, out, NEG_INF)


def _shift_prev(x):
    return jnp.concatenate([jnp.full((1,), NEG_INF), x[:-1]])


def _forward_single(gp_mean, gp_inv, gp_log, ev, n_kmers, n_events,
                    lp_stay, lp_step, allow_pre: bool, allow_post: bool,
                    pad_events: int):
    K_pad = gp_mean.shape[0]
    kidx = jnp.arange(K_pad)
    last_k = n_kmers - 1

    def step(carry, row_minus_1):
        M, B, K, lp_end = carry
        e = ev[row_minus_1]
        a = (e - gp_mean) * gp_inv
        lp_em = LOG_INV_SQRT_2PI - gp_log + jnp.float32(-0.5) * a * a

        Mp = _shift_prev(M)
        Bp = _shift_prev(B)
        Kp = _shift_prev(K)

        m_new = _logaddexp(
            _logaddexp(_logaddexp(lp_stay + M, lp_step + Mp),
                       _logaddexp(_LP_B3 + B, _LP_B3 + Bp)),
            _LP_KM + Kp)
        pre = _pre_flank(row_minus_1)
        soft_ok = allow_pre or (row_minus_1 == 0)
        m_new = jnp.where((kidx == 0) & soft_ok,
                          _logaddexp(m_new, pre), m_new)
        m_new = m_new + lp_em

        b_new = _logaddexp(_LP_MB + M, _LP_BB + B)

        c = _logaddexp(_LP_MK + _shift_prev(m_new),
                       _LP_B3 + _shift_prev(b_new))
        k_new = _logcumsumexp_chain(c, jnp.float32(_LP_KK))

        active = row_minus_1 < n_events
        M = jnp.where(active, m_new, M)
        B = jnp.where(active, b_new, B)
        K = jnp.where(active, k_new, K)

        do_end = active & (allow_post | (row_minus_1 == n_events - 1))
        pf = _post_flank(row_minus_1, n_events)
        end_add = _logaddexp(_logaddexp(M[last_k], B[last_k]), K[last_k]) + pf
        lp_end = jnp.where(do_end, _logaddexp(lp_end, end_add), lp_end)
        return (M, B, K, lp_end), None

    init = (jnp.full(K_pad, NEG_INF), jnp.full(K_pad, NEG_INF),
            jnp.full(K_pad, NEG_INF), NEG_INF)
    (M, B, K, lp_end), _ = jax.lax.scan(
        step, init, jnp.arange(pad_events, dtype=jnp.int32))
    return lp_end


@functools.partial(jax.jit,
                   static_argnames=("allow_pre", "allow_post", "pad_events"))
def hmm_forward_batch(batch: HmmBatch, pad_events: int,
                      allow_pre: bool = True, allow_post: bool = True):
    """Forward scores for every work item: f32 [N]."""
    f = jax.vmap(lambda *a: _forward_single(
        *a, allow_pre=allow_pre, allow_post=allow_post,
        pad_events=pad_events))
    return f(batch.gp_mean, batch.gp_inv_stdv, batch.gp_log_stdv,
             batch.event_means, batch.n_kmers, batch.n_events,
             batch.lp_stay, batch.lp_step)


@functools.partial(jax.jit,
                   static_argnames=("pad_events", "allow_pre", "allow_post"))
def hmm_forward_packed(ranks, n_kmers, ev_concat, ev_start, ev_stride,
                       n_events, scale, shift, var, lp_stay, lp_step,
                       level_mean, level_stdv, level_log_stdv,
                       pad_events: int, allow_pre: bool = True,
                       allow_post: bool = True):
    """Forward scores with device-side input assembly.

    Compact inputs — per-item kmer ranks [N, K] (i16/i32), the batch's flat
    event pool, per-item window start/stride, and per-item calibration
    scalars — are expanded into the padded Gaussian tables and event
    windows on device (table gather + affine), so the host->device
    transfer is ~10x smaller than shipping the assembled f32 arrays.
    """
    r = ranks.astype(jnp.int32)
    gp_mean = scale[:, None] * level_mean[r] + shift[:, None]
    sd = level_stdv[r] * var[:, None]
    gp_inv = jnp.float32(1.0) / sd
    gp_log = level_log_stdv[r] + jnp.log(var)[:, None]
    # mask padding kmers (rank 0 in padding rows would otherwise produce
    # finite emissions; _forward_single masks by n_kmers, but keep the
    # gp rows harmless anyway)
    rows = jnp.arange(pad_events, dtype=jnp.int32)
    idx = ev_start[:, None] + rows[None, :] * ev_stride[:, None]
    idx = jnp.clip(idx, 0, ev_concat.shape[0] - 1)
    ev = ev_concat[idx]
    batch = HmmBatch(gp_mean=gp_mean, gp_inv_stdv=gp_inv, gp_log_stdv=gp_log,
                     event_means=ev, n_kmers=n_kmers, n_events=n_events,
                     lp_stay=lp_stay, lp_step=lp_step)
    return hmm_forward_batch(batch, pad_events, allow_pre=allow_pre,
                             allow_post=allow_post)
