"""ABEA band fill — kmer-anchored Pallas kernel (8 reads per grid step).

The offset-anchored kernels (abea_pallas.py / abea_pallas8.py) pay for
4 per-read unaligned stitched loads and ~10 per-read scalar extraction
chains on EVERY band step, because a band cell's lane is its offset
within the moving band.  Here a cell's lane is its *kmer index* relative
to a per-read anchor ``kbase`` that is re-pinned every ``GRP`` (=16)
band steps.  Consequences (band algebra — each band bi holds the
anti-diagonal event+kmer == bi-2, restricted to kmers
[ll_k, ll_k+BW)):

- ``stay``  (k,   e-1) lives in band bi-1 at the SAME lane;
- ``skip``  (k-1, e  ) lives in band bi-1 at lane-1 (constant shift);
- ``step``  (k-1, e-1) lives in band bi-2 at lane-1 (constant shift);
- the kmer model rows (mean/stdv/log_stdv) are STATIONARY between
  re-anchors — three stitched loads per read per 16 steps instead of
  three per read per step;
- the event row at band bi is ``ev_rev[s + lane]`` with
  ``s = E + PAD + 1 + kbase - bi``: it slides by exactly one lane per
  step, so one 256-lane window load per read per group serves all 16
  steps via static-offset slices;
- all per-read decision state (ll_k, Suzuki edges, QC gates) is (8,1)
  sublane vectors — no Python-unrolled per-read scalar chains in the
  hot loop.

Per-step cost drops from ~50 unaligned-load/extract ops to ~2 constant
rolls + ~30 elementwise (8,128) ops.

Outputs (different contract from abea_pallas8 — see the consumers in
this module):

- ``trace`` i32 [B/R, n_bands, R, PAD]: 2-bit direction per
  kmer-anchored lane; lane ``KB_LANE`` (=120, above the max live cell
  lane d+99 <= 115) carries the band's ``kbase``.
- ``em``   f32 [B/R, n_bands, R, PAD]: the Gaussian log emission of
  every band cell, so the backtrace QC sum gathers instead of
  recomputing (same formula, same float op order as the oracle,
  abea_ref.py:_log_prob_match).
- ``best`` i32 [B, PAD]: lane 0 = backtrace start event (argmax over
  bands of last-kmer-column score + trim tail, first-best tie rule as
  src/align.c:429-445) or -1 when no valid start exists.

Reference for the algorithm: /root/reference/src/align.c:180-559 and
align.cu:256-487 (the band recurrence and Suzuki's adaptive rule); the
layout here has no counterpart there — it exists because TPU lanes are
cheap and unaligned per-lane addressing is not.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .abea import PAD, AbeaBatch, expand_batch_device
from .abea_pallas import BW, CHUNK, FROM_D, FROM_L, FROM_U

NEG_INF = np.float32(-np.inf)
LOG_INV_SQRT_2PI = np.float32(-0.918938)
R = 8                      # reads per grid step (sublane count)
GRP = 16                   # band steps per re-anchor window
KB_LANE = 120              # sideband lane holding kbase (cells stop at 115)
INT_MIN = np.int32(-2**31 + 1)


def _stitch2(ref, j, start, lane8, sub8, acc):
    """Merge ref[j, start : start+PAD] (unaligned) into sublane j of acc."""
    base = (start // PAD) * PAD
    rem = start - base
    v0 = ref[:, pl.ds(pl.multiple_of(base, PAD), PAD)]
    v1 = ref[:, pl.ds(pl.multiple_of(base + PAD, PAD), PAD)]
    shift = (PAD - rem) % PAD
    r0 = pltpu.roll(v0, shift, 1)
    r1 = pltpu.roll(v1, shift, 1)
    stitched = jnp.where(lane8 < PAD - rem, r0, r1)
    return jnp.where(sub8 == j, stitched, acc)


def _stitch3(ref, j, start, lane8, sub8, acc_lo, acc_hi):
    """Merge ref[j, start : start+2*PAD] into sublane j of (acc_lo,
    acc_hi) — the 256-lane event window for one re-anchor group."""
    base = (start // PAD) * PAD
    rem = start - base
    v0 = ref[:, pl.ds(pl.multiple_of(base, PAD), PAD)]
    v1 = ref[:, pl.ds(pl.multiple_of(base + PAD, PAD), PAD)]
    v2 = ref[:, pl.ds(pl.multiple_of(base + 2 * PAD, PAD), PAD)]
    shift = (PAD - rem) % PAD
    r0 = pltpu.roll(v0, shift, 1)
    r1 = pltpu.roll(v1, shift, 1)
    r2 = pltpu.roll(v2, shift, 1)
    sel = lane8 < PAD - rem
    lo = jnp.where(sel, r0, r1)
    hi = jnp.where(sel, r1, r2)
    return (jnp.where(sub8 == j, lo, acc_lo),
            jnp.where(sub8 == j, hi, acc_hi))


def _fill_kernel_kr(n_events_ref, n_kmers_ref, scal_ref,
                    ev_rev_ref, kmean_ref, kstdv_ref, klog_ref,
                    trace_ref, em_ref, best_ref,
                    chunk_tr, chunk_em, sems):
    g = pl.program_id(0)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (R, PAD), 1)
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (R, PAD), 0)
    sub81 = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)

    n_bands_max = trace_ref.shape[1]
    E = ev_rev_ref.shape[1] - 3 * PAD
    K = kmean_ref.shape[1] - 2 * PAD

    def stackv(vals, dtype):
        out = jnp.full((R, 1), vals[0], dtype=dtype)
        for j in range(1, R):
            out = jnp.where(sub81 == j, jnp.asarray(vals[j], dtype), out)
        return out

    n_ev_s = [n_events_ref[g * R + j] for j in range(R)]
    n_km_s = [n_kmers_ref[g * R + j] for j in range(R)]
    n_ev_v = stackv(n_ev_s, jnp.int32)
    n_km_v = stackv(n_km_s, jnp.int32)
    nb_s = [jnp.minimum(n_ev_s[j] + n_km_s[j] + 2, n_bands_max)
            for j in range(R)]
    n_bands_v = stackv(nb_s, jnp.int32)
    nb_grp = nb_s[0]
    for j in range(1, R):
        nb_grp = jnp.maximum(nb_grp, nb_s[j])

    scale_v = stackv([scal_ref[g * R + j, 0] for j in range(R)], jnp.float32)
    shift_v = stackv([scal_ref[g * R + j, 1] for j in range(R)], jnp.float32)
    lp_stay_v = stackv([scal_ref[g * R + j, 2] for j in range(R)],
                       jnp.float32)
    lp_step_v = stackv([scal_ref[g * R + j, 3] for j in range(R)],
                       jnp.float32)
    lp_skip = scal_ref[g * R, 4]     # identical for all reads
    lp_trim = scal_ref[g * R, 5]

    half = BW // 2
    ll_k0 = -1 - half                # -51; bands 0/1 anchor here
    trim_lane0 = -1 - ll_k0          # k == -1 at lane 50 under kbase0

    def extract(v, j):
        return jnp.max(jnp.where(sub81 == j, v, INT_MIN))

    def flush(chunk_idx):
        cp_t = pltpu.make_async_copy(
            chunk_tr, trace_ref.at[g, pl.ds(chunk_idx * CHUNK, CHUNK)],
            sems.at[0])
        cp_e = pltpu.make_async_copy(
            chunk_em, em_ref.at[g, pl.ds(chunk_idx * CHUNK, CHUNK)],
            sems.at[1])
        cp_t.start()
        cp_e.start()
        cp_t.wait()
        cp_e.wait()

    # ---- bands 0 and 1 (preset, src/align.c:244-262 equivalents) ----
    detile = jnp.float32(0.0) * sub8.astype(jnp.float32)
    band0 = jnp.where(lane8 == trim_lane0, jnp.float32(0.0),
                      NEG_INF) + detile
    band1 = jnp.where(lane8 == trim_lane0, lp_trim, NEG_INF) + detile
    kb_row0 = jnp.where(lane8 == KB_LANE, jnp.int32(ll_k0), jnp.int32(0))
    row1 = jnp.where(lane8 == trim_lane0, jnp.int32(FROM_U), jnp.int32(0))
    row1 = jnp.where(lane8 == KB_LANE, jnp.int32(ll_k0), row1)
    zero_em = jnp.float32(0.0) * lane8.astype(jnp.float32)
    chunk_tr[pl.ds(0, 1)] = kb_row0[None]
    chunk_tr[pl.ds(1, 1)] = row1[None]
    chunk_em[pl.ds(0, 1)] = zero_em[None]
    chunk_em[pl.ds(1, 1)] = zero_em[None]

    detile_i = jnp.int32(0) * sub81

    def group_body(grp, carry):
        prev, prev2, ll_k_v, kbase_v, best_s, best_e = carry
        base_bi = 2 + grp * GRP

        # ---- re-anchor: pin kbase to the current band bottom ----
        ll_k_s = [extract(ll_k_v, j) for j in range(R)]
        kb_old_s = [extract(kbase_v, j) for j in range(R)]
        kb_s = [jnp.minimum(ll_k_s[j], jnp.int32(K - 1)) for j in range(R)]
        new_prev, new_prev2 = prev, prev2
        for j in range(R):
            d = kb_s[j] - kb_old_s[j]
            sh = jnp.where(d == 0, 0, PAD - d)
            rp = jnp.where(lane8 >= PAD - d, NEG_INF, pltpu.roll(prev, sh, 1))
            rp2 = jnp.where(lane8 >= PAD - d, NEG_INF,
                            pltpu.roll(prev2, sh, 1))
            new_prev = jnp.where(sub8 == j, rp, new_prev)
            new_prev2 = jnp.where(sub8 == j, rp2, new_prev2)
        prev, prev2 = new_prev, new_prev2
        kbase_v = stackv(kb_s, jnp.int32)

        # stationary per-group tiles: kmer params + event window
        zf = jnp.zeros((R, PAD), jnp.float32)
        kmean_t, kstdv_t, klog_t = zf, jnp.ones((R, PAD), jnp.float32), zf
        ev_lo, ev_hi = zf, zf
        for j in range(R):
            ks = jnp.clip(kb_s[j] + PAD, 0, K + PAD - 1)
            kmean_t = _stitch2(kmean_ref, j, ks, lane8, sub8, kmean_t)
            kstdv_t = _stitch2(kstdv_ref, j, ks, lane8, sub8, kstdv_t)
            klog_t = _stitch2(klog_ref, j, ks, lane8, sub8, klog_t)
            ws = jnp.clip(E + PAD + 2 + kb_s[j] - base_bi - GRP,
                          0, E + PAD - 1)
            ev_lo, ev_hi = _stitch3(ev_rev_ref, j, ws, lane8, sub8,
                                    ev_lo, ev_hi)
        kms = scale_v * kmean_t + shift_v
        k_lane = kbase_v + lane8                       # (R, PAD) i32
        kvalid = (k_lane >= 0) & (k_lane < n_km_v)
        lc_onehot = k_lane == (n_km_v - 1)
        trim_onehot = k_lane == -1
        kb_sideband = jnp.where(lane8 == KB_LANE, kbase_v, jnp.int32(0))

        for j in range(GRP):
            bi = base_bi + j
            # Suzuki's rule from the previous band's edge cells
            d_v = ll_k_v - kbase_v
            ll = jnp.max(jnp.where(lane8 == d_v, prev, NEG_INF),
                         axis=1, keepdims=True)
            ur = jnp.max(jnp.where(lane8 == d_v + (BW - 1), prev, NEG_INF),
                         axis=1, keepdims=True)
            both_ob = jnp.isneginf(ll) & jnp.isneginf(ur)
            # i32-valued select: Mosaic cannot materialise (8,1) i1 operands
            right_i = jnp.where(both_ob,
                                jnp.full((R, 1), bi % 2, jnp.int32),
                                (ll < ur).astype(jnp.int32))
            ll_k_v = ll_k_v + right_i

            # event row: static slice of the group window
            off = GRP - 1 - j
            if off == 0:
                erow = ev_lo
            else:
                rl = pltpu.roll(ev_lo, PAD - off, 1)
                rh = pltpu.roll(ev_hi, PAD - off, 1)
                erow = jnp.where(lane8 < PAD - off, rl, rh)

            a = (erow - kms) / kstdv_t
            em = (LOG_INV_SQRT_2PI - klog_t
                  + jnp.float32(-0.5) * a * a)

            left = jnp.where(lane8 == 0, NEG_INF, pltpu.roll(prev, 1, 1))
            diag = jnp.where(lane8 == 0, NEG_INF, pltpu.roll(prev2, 1, 1))
            score_d = diag + lp_step_v + em
            score_u = prev + lp_stay_v + em
            score_l = left + lp_skip

            max_s = jnp.maximum(score_d, score_u)
            frm = jnp.where(max_s == score_u, jnp.int32(FROM_U),
                            jnp.int32(FROM_D))
            max_s = jnp.maximum(max_s, score_l)
            frm = jnp.where(max_s == score_l, jnp.int32(FROM_L), frm)

            e_row = (bi - 2) - k_lane
            o = k_lane - ll_k_v
            valid = (kvalid & (e_row >= 0) & (e_row < n_ev_v)
                     & (o >= 0) & (o < BW))
            row = jnp.where(valid, max_s, NEG_INF)
            frm = jnp.where(valid, frm, jnp.int32(0))

            # trim column (kmer == -1), src/align.c band trim cell
            is_trim = (trim_onehot & (ll_k_v <= -1)
                       & ((bi - 1) < n_ev_v))
            row = jnp.where(is_trim, lp_trim * bi.astype(jnp.float32), row)
            frm = jnp.where(is_trim, jnp.int32(FROM_U), frm)

            # backtrace start selection: last-kmer-column score + trim
            # tail, first-best over ascending bands (align.c:429-445)
            off_lc = (n_km_v - 1) - ll_k_v
            e_lc = bi - 1 - n_km_v
            lcv = jnp.max(jnp.where(lc_onehot, row, NEG_INF),
                          axis=1, keepdims=True)
            cand = lcv + (n_ev_v - e_lc).astype(jnp.float32) * lp_trim
            okc = ((off_lc >= 0) & (off_lc < BW) & (e_lc >= 0)
                   & (e_lc < n_ev_v) & (bi < n_bands_v))
            cand = jnp.where(okc, cand, NEG_INF)
            upd = cand > best_s
            best_s = jnp.where(upd, cand, best_s)
            best_e = jnp.where(upd, e_lc, best_e)

            packed = jnp.where(lane8 == KB_LANE, kb_sideband, frm)
            slot = bi % CHUNK
            chunk_tr[pl.ds(slot, 1)] = packed[None]
            chunk_em[pl.ds(slot, 1)] = em[None]

            @pl.when(slot == CHUNK - 1)
            def _():
                flush(bi // CHUNK)

            prev2 = prev
            prev = row

        return prev, prev2, ll_k_v, kbase_v, best_s, best_e

    carry0 = (band1, band0,
              jnp.full((R, 1), ll_k0, jnp.int32) + detile_i,
              jnp.full((R, 1), ll_k0, jnp.int32) + detile_i,
              jnp.full((R, 1), NEG_INF, jnp.float32)
              + jnp.float32(0.0) * sub81.astype(jnp.float32),
              jnp.full((R, 1), -1, jnp.int32) + detile_i)
    n_groups = (nb_grp - 2 + GRP - 1) // GRP
    carry = jax.lax.fori_loop(0, n_groups, group_body, carry0)
    best_e = carry[5]

    last_row = 1 + n_groups * GRP

    @pl.when((last_row % CHUNK) != (CHUNK - 1))
    def _():
        flush(last_row // CHUNK)

    best_ref[:, :] = jnp.where(lane8 == 0,
                               jnp.broadcast_to(best_e, (R, PAD)),
                               jnp.int32(-1))


@functools.partial(jax.jit, static_argnames=("n_bands", "interpret"))
def abea_fill_kr(batch: AbeaBatch, ev_rev_x: jnp.ndarray, n_bands: int,
                 interpret: bool = False):
    """Kmer-anchored fill.  ``ev_rev_x`` is flip(event_means) with one
    extra PAD block of zeros appended (the group event window may read
    up to E+3*PAD).  Returns (trace, em, best) — see module docstring.
    """
    B = batch.event_means.shape[0]
    assert B % R == 0, "batch must be padded to a multiple of 8 reads"
    assert n_bands % CHUNK == 0
    E = ev_rev_x.shape[1] - 3 * PAD
    K = batch.kmer_mean.shape[1] - 2 * PAD
    assert E % PAD == 0 and K % PAD == 0, "bucket sizes must be 128-aligned"
    scal = jnp.stack([
        batch.scale, batch.shift, batch.lp_stay, batch.lp_step,
        batch.lp_skip, batch.lp_trim,
        jnp.zeros_like(batch.scale), jnp.zeros_like(batch.scale),
    ], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B // R,),
        in_specs=[
            pl.BlockSpec((R, ev_rev_x.shape[1]),
                         lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, batch.kmer_mean.shape[1]),
                         lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, batch.kmer_stdv.shape[1]),
                         lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, batch.kmer_log_stdv.shape[1]),
                         lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((R, PAD), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((CHUNK, R, PAD), jnp.int32),
            pltpu.VMEM((CHUNK, R, PAD), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    trace, em, best = pl.pallas_call(
        _fill_kernel_kr,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B // R, n_bands, R, PAD), jnp.int32),
            jax.ShapeDtypeStruct((B // R, n_bands, R, PAD), jnp.float32),
            jax.ShapeDtypeStruct((B, PAD), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(batch.n_events, batch.n_kmers, scal,
      ev_rev_x, batch.kmer_mean, batch.kmer_stdv, batch.kmer_log_stdv)
    return trace, em, best


def _backtrace_kr_single(trace4, em4, kb3, g, r, start_e, n_events,
                         n_kmers, lp_trim, max_pairs: int):
    """Walk one read's path through the kmer-anchored trace.

    Same walk/QC semantics as abea._backtrace_packed_single (which
    mirrors src/align.c:429-543); the emission at each pair is gathered
    from the fill's ``em`` stream instead of being recomputed."""
    from .abea import (ABEA_MAX_GAP_THRESHOLD, ABEA_MIN_AVG_LOG_EMISSION)

    nb = trace4.shape[1]
    any_valid = start_e >= 0

    def cond(st):
        k, e, n, *_ = st
        return (k >= 0) & (e >= 0) & (n < max_pairs)

    def one_step(st):
        k, e, n, sum_em, gap, max_gap, last_k, dirs = st
        active = (k >= 0) & (e >= 0) & (n < max_pairs)
        ks_ = jnp.clip(k, 0, None)
        es_ = jnp.clip(e, 0, None)
        bi = jnp.clip((es_ + 1) + (ks_ + 1), 0, nb - 1)
        kb = kb3[g, bi, r]
        lane = jnp.clip(ks_ - kb, 0, PAD - 1)
        f = (trace4[g, bi, r, lane] & 3).astype(jnp.uint8)
        emv = em4[g, bi, r, lane]
        sum_em = sum_em + jnp.where(active, emv, 0.0)
        last_k = jnp.where(active, k, last_k)
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
            jnp.where(any_valid, start_e, -1),
            jnp.int32(0), jnp.float32(0.0), jnp.int32(0), jnp.int32(0),
            jnp.int32(-1), dirs0)
    k, e, n, sum_em, gap, max_gap, last_k, dirs = jax.lax.while_loop(
        cond, body, init)

    avg = sum_em / jnp.maximum(n.astype(jnp.float32), 1.0)
    spanned = (n > 0) & (last_k == 0)
    failed = ((avg < ABEA_MIN_AVG_LOG_EMISSION) | (~spanned)
              | (max_gap > ABEA_MAX_GAP_THRESHOLD) | (n == 0))
    d4 = dirs.reshape(max_pairs // 4, 4).astype(jnp.int32)
    w = jnp.array([1, 4, 16, 64], dtype=jnp.int32)
    packed = jnp.sum(d4 * w[None, :], axis=1).astype(jnp.uint8)
    return packed, start_e, n, sum_em, max_gap, failed


@functools.partial(jax.jit, static_argnames=("max_pairs",))
def abea_backtrace_kr(trace, em, best, batch: AbeaBatch, max_pairs: int):
    """Compact backtrace over the kmer-anchored trace.  Output contract
    identical to abea.abea_backtrace_packed."""
    B = batch.n_events.shape[0]
    kb3 = trace[:, :, :, KB_LANE]
    start_e = best[:, 0]
    g_idx = (jnp.arange(B, dtype=jnp.int32) // R)
    r_idx = (jnp.arange(B, dtype=jnp.int32) % R)
    f = jax.vmap(
        lambda g, r, se, nev, nkm, lpt: _backtrace_kr_single(
            trace, em, kb3, g, r, se, nev, nkm, lpt, max_pairs=max_pairs))
    return f(g_idx, r_idx, start_e, batch.n_events, batch.n_kmers,
             batch.lp_trim)


@functools.partial(jax.jit, static_argnames=("E", "K", "n_bands",
                                             "max_pairs"))
def abea_align_device_kr(ev_concat, ev_off, ev_len, rank_concat, rk_off,
                         rk_len, level_mean, level_stdv, level_log_stdv,
                         scale, shift, lp_stay, lp_step, lp_skip, lp_trim,
                         E: int, K: int, n_bands: int, max_pairs: int):
    """One-dispatch ABEA on the kmer-anchored kernel: on-device batch
    expansion -> fill -> backtrace.  Same signature and output contract
    as abea_pallas8.abea_align_device."""
    batch = expand_batch_device(
        ev_concat, ev_off, ev_len, rank_concat, rk_off, rk_len,
        level_mean, level_stdv, level_log_stdv, scale, shift, lp_stay,
        lp_step, lp_skip, lp_trim, E=E, K=K)
    B = batch.event_means.shape[0]
    ev_rev_x = jnp.concatenate(
        [jnp.flip(batch.event_means, axis=1),
         jnp.zeros((B, PAD), jnp.float32)], axis=1)
    trace, em, best = abea_fill_kr(batch, ev_rev_x, n_bands)
    return abea_backtrace_kr(trace, em, best, batch, max_pairs)
