"""Profile-HMM forward — Pallas TPU kernel (segment-packed).

The XLA scan in hmm.py pays fixed per-step costs (fusion launches,
per-row event gathers) that dwarf the ~40 vector ops of the recurrence;
on the 112-read bench the forward pass costs ~0.65 s for ~6 ms of VPU
arithmetic.  This kernel runs the whole row loop on-core:

- 8 window-rows per grid step; each 128-lane row holds ``SEGS`` windows
  of up to ``SEG`` kmers (SEG=32 for typical CpG groups, SEG=128 for
  wide windows), matching hmm.hmm_forward_packed4's packing;
- the batch's event pool (forward + reversed halves, so reverse-stride
  windows are ascending runs) is copied HBM->VMEM ONCE at grid step 0
  and stays resident; every SEG steps each window's next SEG events are
  extracted from the resident pool with sublane/lane rolls and two
  8x8 row-select matmuls — no per-step gathers, no per-window DMA;
- the per-step (8,128) event broadcast is one masked select + one
  constant block-diagonal MXU matmul; the KMER_SKIP chain's segmented
  cumsum is a constant lower-triangular-block MXU matmul with a
  butterfly segment max for renormalisation;
- the loop bound is the max event count in the grid row, so
  length-sorted inputs waste almost no steps.

The caller must keep the pool under the VMEM budget (the runner chunks
reads so 2*n_events + padding stays <= ~1.5M f32); scores match
hmm.py's logaddexp formulation to f32 tolerance (the segmented cumsum
is reassociated by the MXU) — the meth oracle tolerance is the
reference's 0.1*|x|+0.02 (scripts/test.awk:7-13), orders of magnitude
looser.

Algorithm reference: /root/reference/src/hmm.c:115-335 (states,
transitions, flanks); packing and the resident-pool staging are
TPU-specific.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hmm import (_BG, _LP_B3, _LP_BB, _LP_CS, _LP_KK, _LP_KM, _LP_MB,
                  _LP_MK, _LP_NCS, _LP_NSC, _LP_SC)

NEG_INF = np.float32(-np.inf)
LOG_INV_SQRT_2PI = np.float32(-0.918938)
R = 8                       # pool tile sublanes
RT = 16                     # window-rows per grid step (2 chains of 8
                            # sublanes back-to-back hides VPU/MXU latency)
PAD = 128
TILE = R * PAD              # pool elements per (8,128) tile row


def _hmm_kernel(ev_start_ref, gp_mean_ref, gp_inv_ref, gp_log_ref,
                n_km_ref, n_ev_ref, lp_stay_ref, lp_step_ref, pool_ref,
                out_ref, pool_vmem, sem, *, SEG: int,
                allow_pre: bool, allow_post: bool):
    SEGS = PAD // SEG
    g = pl.program_id(0)
    Lb = pool_vmem.shape[0]
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (RT, PAD), 1)
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (RT, PAD), 0)
    sub8p = jax.lax.broadcasted_iota(jnp.int32, (R, PAD), 0)
    lane8p = jax.lax.broadcasted_iota(jnp.int32, (R, PAD), 1)
    kseg = lane8 % SEG

    # the event pool rides to VMEM once and stays resident
    @pl.when(g == 0)
    def _():
        cp = pltpu.make_async_copy(pool_ref, pool_vmem, sem)
        cp.start()
        cp.wait()

    gp_mean = gp_mean_ref[:]
    gp_inv = gp_inv_ref[:]
    gp_log = gp_log_ref[:]
    n_km_l = n_km_ref[:]
    n_ev_l = n_ev_ref[:]
    lp_stay_l = lp_stay_ref[:]
    lp_step_l = lp_step_ref[:]
    in_window = kseg < n_km_l
    last_k = kseg == (n_km_l - 1)
    nev_grp = jnp.max(jnp.where(in_window, n_ev_l, 0))

    starts = [[ev_start_ref[(g * RT + j) * SEGS + w] for w in range(SEGS)]
              for j in range(RT)]

    # constant matrices: segment broadcast, segmented prefix-sum, and
    # single-sublane row selectors
    row_i = jax.lax.broadcasted_iota(jnp.int32, (PAD, PAD), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (PAD, PAD), 1)
    same_seg = (row_i // SEG) == (col_i // SEG)
    S_bcast = same_seg.astype(jnp.float32)
    L_csum = (same_seg & ((row_i % SEG) <= (col_i % SEG))).astype(
        jnp.float32)
    c8b = jax.lax.broadcasted_iota(jnp.int32, (8, R), 1)
    E0b = (c8b == 0).astype(jnp.float32)   # dot(E0b, T)[j] = T[0]
    E1b = (c8b == 1).astype(jnp.float32)   # dot(E1b, T)[j] = T[1]
    lane8b = jax.lax.broadcasted_iota(jnp.int32, (8, PAD), 1)
    sub8b = jax.lax.broadcasted_iota(jnp.int32, (8, PAD), 0)

    def logaddexp(a, b):
        m = jnp.maximum(a, b)
        d = -jnp.abs(a - b)
        out = m + jnp.log1p(jnp.exp(d))
        return jnp.where(jnp.isneginf(m), NEG_INF, out)

    def seg_max(v):
        """Butterfly max within each SEG-lane segment."""
        s = SEG // 2
        while s >= 1:
            lo = (lane8 & s) == 0
            partner = jnp.where(lo, pltpu.roll(v, PAD - s, 1),
                                pltpu.roll(v, s, 1))
            v = jnp.maximum(v, partner)
            s //= 2
        return v

    def shift_prev(x):
        return jnp.where(kseg == 0, NEG_INF, pltpu.roll(x, 1, 1))

    def body(i, carry):
        M, B, K, lp_end, ring = carry
        i_f = i.astype(jnp.float32)

        # refill the per-window event ring every SEG steps: the SEG-run
        # [pos, pos+SEG) of the resident pool spans <= 2 sublanes of <=
        # 2 consecutive tiles; align it with sublane+lane rolls, then
        # pick between the two candidate sublanes per lane
        def refill():
            # blocked by 8 window-rows: every per-(row, segment) merge
            # runs on a single (8, PAD) vreg instead of the full
            # (RT, PAD) tile — the same linear-in-RT blocking as the
            # fill kernel's ring loads
            blocks = []
            for b0 in range(0, RT, 8):
                nrb = jnp.zeros((8, PAD), jnp.float32)
                for j in range(b0, b0 + 8):
                    for w in range(SEGS):
                        pos = starts[j][w] + i
                        r0 = jnp.clip(pos // TILE, 0, Lb - 2)
                        s0 = (pos % TILE) // PAD
                        pm = pos % PAD
                        T0 = pool_vmem[r0]
                        T1 = pool_vmem[r0 + 1]
                        sh_s = (R - s0) % R
                        Ta = pltpu.roll(T0, sh_s, 0)
                        Tb = pltpu.roll(T1, sh_s, 0)
                        V = jnp.where(sub8p < (R - s0), Ta, Tb)
                        C = pltpu.roll(V, (w * SEG - pm) % PAD, 1)
                        row0 = jnp.dot(E0b, C,
                                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
                        row1 = jnp.dot(E1b, C,
                                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
                        cross = (lane8b - (w * SEG)) >= (PAD - pm)
                        val = jnp.where(cross, row1, row0)
                        sel = ((sub8b == (j - b0))
                               & ((lane8b // SEG) == w))
                        nrb = jnp.where(sel, val, nrb)
                blocks.append(nrb)
            return (blocks[0] if len(blocks) == 1
                    else jnp.concatenate(blocks, axis=0))

        ring = jax.lax.cond(i % SEG == 0, refill, lambda: ring)

        # event broadcast: one select + one MXU matmul
        e_sel = jnp.where(kseg == (i % SEG), ring, jnp.float32(0.0))
        e = jnp.dot(e_sel, S_bcast, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)

        a = (e - gp_mean) * gp_inv
        lp_em = LOG_INV_SQRT_2PI - gp_log + jnp.float32(-0.5) * a * a

        Mp = shift_prev(M)
        Bp = shift_prev(B)
        Kp = shift_prev(K)

        t0 = lp_stay_l + M
        t1 = lp_step_l + Mp
        t2 = jnp.float32(_LP_B3) + B
        t3 = jnp.float32(_LP_B3) + Bp
        t4 = jnp.float32(_LP_KM) + Kp
        mx = jnp.maximum(jnp.maximum(jnp.maximum(t0, t1),
                                     jnp.maximum(t2, t3)), t4)
        mx_s = jnp.where(jnp.isneginf(mx), jnp.float32(0.0), mx)
        ssum = (jnp.exp(t0 - mx_s) + jnp.exp(t1 - mx_s)
                + jnp.exp(t2 - mx_s) + jnp.exp(t3 - mx_s)
                + jnp.exp(t4 - mx_s))
        m_new = jnp.where(jnp.isneginf(mx), NEG_INF, mx_s + jnp.log(ssum))

        # pre-flank soft clip into each window's first kmer
        pre = jnp.where(i == 0, jnp.float32(_LP_NSC),
                        jnp.float32(_LP_SC + _BG + _LP_NCS)
                        + (i_f - 1.0) * jnp.float32(_LP_CS + _BG))
        if allow_pre:
            pre_ok = kseg == 0
        else:
            pre_ok = (kseg == 0) & (i == 0)
        m_new = jnp.where(pre_ok, logaddexp(m_new, pre), m_new)
        m_new = m_new + lp_em

        b_new = logaddexp(jnp.float32(_LP_MB) + M,
                          jnp.float32(_LP_BB) + B)

        # KMER_SKIP chain: segmented log-cumsum-exp
        c = logaddexp(jnp.float32(_LP_MK) + shift_prev(m_new),
                      jnp.float32(_LP_B3) + shift_prev(b_new))
        c = jnp.where(in_window, c, NEG_INF)
        gk = jnp.float32(_LP_KK)
        d = c - kseg.astype(jnp.float32) * gk
        m_seg = seg_max(d)
        m_safe = jnp.where(jnp.isneginf(m_seg), jnp.float32(0.0), m_seg)
        e_seg = jnp.exp(d - m_safe)
        s_seg = jnp.dot(e_seg, L_csum, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
        k_new = jnp.where(s_seg > 0,
                          kseg.astype(jnp.float32) * gk + jnp.log(s_seg)
                          + m_safe, NEG_INF)

        active = i < n_ev_l
        M = jnp.where(active, m_new, M)
        B = jnp.where(active, b_new, B)
        K = jnp.where(active, k_new, K)

        nef = n_ev_l.astype(jnp.float32)
        pf = jnp.where(i == n_ev_l - 1, jnp.float32(_LP_NSC),
                       jnp.float32(_LP_SC + _BG + _LP_NCS)
                       + (nef - 2.0 - i_f) * jnp.float32(_LP_CS + _BG))
        if allow_post:
            do_end = active
        else:
            do_end = active & (i == n_ev_l - 1)
        end_add = logaddexp(logaddexp(M, B), K) + pf
        lp_end = jnp.where(do_end & last_k & in_window,
                           logaddexp(lp_end, end_add), lp_end)
        return M, B, K, lp_end, ring

    detile = jnp.float32(0.0) * lane8.astype(jnp.float32)
    ninf = jnp.full((RT, PAD), NEG_INF) + detile
    carry = (ninf, ninf, ninf, ninf,
             jnp.zeros((RT, PAD), jnp.float32) + detile)
    carry = jax.lax.fori_loop(0, nev_grp, body, carry)
    out_ref[:, :] = carry[3]


@functools.partial(jax.jit, static_argnames=("SEG", "allow_pre",
                                             "allow_post", "interpret"))
def hmm_forward_pallas(ranks, n_km, ev_pool, ev_start_fwd, ev_stride,
                       n_events, scale, shift, var, lp_stay, lp_step,
                       level_mean, level_stdv, level_log_stdv,
                       SEG: int, allow_pre: bool = True,
                       allow_post: bool = True, interpret: bool = False):
    """Forward scores with SEGS=128//SEG windows packed per row.

    ``ranks``: [N, 128] per-row window ranks at lanes SEG*w..; per-window
    arrays are [N, SEGS]: n_km, ev_start_fwd (index into ev_pool of the
    window's FIRST event), ev_stride (+1/-1), n_events, scale, shift,
    var, lp_stay, lp_step.  Returns scores f32 [N, SEGS].

    ``ev_pool`` must be small enough that 2*len+2048 f32 fit VMEM
    alongside the working set (<= ~1.5M events); chunk the batch
    otherwise.
    """
    N = ranks.shape[0]
    SEGS = PAD // SEG

    def rep(x):
        return jnp.repeat(x, SEG, axis=1)

    r = jnp.clip(ranks.astype(jnp.int32), 0, level_mean.shape[0] - 1)
    t3 = jnp.stack([level_mean, level_stdv, level_log_stdv,
                    jnp.zeros_like(level_mean)], axis=1)
    p = t3[r]                                        # (N, 128, 4)
    scale_l = rep(scale)
    shift_l = rep(shift)
    var_l = rep(var)
    gp_mean = scale_l * p[..., 0] + shift_l
    sd = p[..., 1] * var_l
    gp_inv = jnp.float32(1.0) / sd
    gp_log = p[..., 2] + jnp.log(var_l)
    n_km_l = rep(n_km.astype(jnp.int32))
    n_ev_l = rep(n_events.astype(jnp.int32))
    lp_stay_l = rep(lp_stay)
    lp_step_l = rep(lp_step)

    # forward + reversed event pool so every window is an ascending run
    Lp = ev_pool.shape[0]
    pool_cat = jnp.concatenate(
        [ev_pool, ev_pool[::-1], jnp.zeros(2 * TILE, jnp.float32)])
    pool_cat = jnp.pad(pool_cat, (0, (-pool_cat.shape[0]) % TILE))
    pool3 = pool_cat.reshape(-1, R, PAD)
    start_cat = jnp.where(ev_stride >= 0, ev_start_fwd,
                          2 * Lp - 1 - ev_start_fwd)
    start_flat = jnp.clip(start_cat, 0, 2 * Lp - 1).astype(
        jnp.int32).reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // RT,),
        in_specs=[
            pl.BlockSpec((RT, PAD), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(7)
        ] + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((RT, PAD), lambda g, *_: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(( -(-int(pool_cat.shape[0]) // TILE), R, PAD),
                       jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_hmm_kernel, SEG=SEG,
                          allow_pre=allow_pre, allow_post=allow_post),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, PAD), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(start_flat, gp_mean, gp_inv, gp_log, n_km_l, n_ev_l,
      lp_stay_l, lp_step_l, pool3)
    return jnp.max(out.reshape(N, SEGS, SEG), axis=-1)


# (the single-packed-buffer upload variant that once lived here was
# superseded by ops/hmm_meta.py, which rebuilds every scorer input on
# device from 2-bit packed reference + 16 B/window metadata)
