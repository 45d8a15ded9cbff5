"""ABEA band fill + walk — event-ring Pallas kernel (R reads/step).

Third-generation layout.  A band cell (k, e) lives at lane ``e mod 128``
(a cyclic ring over event index).  Why this wins over the kmer-anchored
layout:

- every recurrence shift is a PURE cyclic roll, no edge masking: the
  ``stay`` parent (k, e-1) is lane-1 of band bi-1, the ``skip`` parent
  (k-1, e) is the SAME lane of band bi-1, the ``step`` parent (k-1, e-1)
  is lane-1 of band bi-2.  Wrapped-in lanes automatically carry the
  right cell (or -inf) because lane identity == e mod 128;
- the carried band rows never need re-anchoring (lanes are absolute);
- the event row is a group-stationary ring (one placed load per 16
  steps, zero per-step slicing);
- the kmer model rows become per-step cyclic rolls of group-stationary
  rings (loaded from REVERSED model arrays, since k runs opposite to e
  along a band);
- the backtrace lane is ``e & 127`` — computed from walk state, NO
  per-band sideband gather;
- the trace is stored 2-bit PACKED at fill time: one i32 word at
  (band//4, lane) holds the directions of a 4-band x 4-lane tile
  (bands 4q..4q+3 at lanes l-3..l, cyclic in l).  Packing is nearly
  free in the fill (the shift amount ``8*(band&3)`` is static inside
  the unrolled group loop; the lane neighbourhood is 3 cyclic rolls)
  and shrinks the trace's HBM footprint and flush DMA traffic 4x.
  The walk then resolves THREE steps from TWO independent gathers
  (words (q, lane) and (q-1, lane) cover every cell a 3-step walk can
  touch), cutting the sequential HBM-latency chain ~3x vs one gather
  per step.

Output contract:
- ``trace`` i32 [B/R, n_bands/4, R, 128]: packed direction words
  (0=step/diag, 1=stay/up, 2=skip/left); word (q, l) bit
  ``8*jj + 2*ii`` = direction of band ``4q+jj`` at lane ``(l-ii)%128``.
- ``best`` i32 [B, 128]: lane 0 = backtrace start event or -1
  (first-best over bands, src/align.c:429-445 tie rule).
- backtrace: packed 2-bit walk + pair count; QC happens on the host.

Algorithm reference: /root/reference/src/align.c:180-559 (band
recurrence, Suzuki adaptive rule, trim cells, QC thresholds).  The ring
layout itself has no counterpart in the reference.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .abea import BW, CHUNK, FROM_D, FROM_L, FROM_U, PAD, AbeaBatch

NEG_INF = np.float32(-np.inf)
LOG_INV_SQRT_2PI = np.float32(-0.918938)
# reads per grid step (sublane tile height).  8 = one f32 vreg per
# vector op; 16/32 amortise the band-step loop's fixed cost over more
# reads (the ring reloads stay linear in R via 8-row blocks).  16
# measures ~25% faster end-to-end than 8 on a v5e (the fill+walk chain
# drops fully behind the host work of the wave pipeline).
R = int(os.environ.get("F5C_TPU_RING_R", "16"))
GRP = 16                   # band steps per ring-reload window
INT_MIN = np.int32(-2**31 + 1)


def _fill_kernel_ring(n_events_ref, n_kmers_ref, scal_ref,
                      ev_ref, kmean_rev_ref, kstdv_rev_ref, klog_rev_ref,
                      trace_ref, best_ref, chunk_tr, sems):
    g = pl.program_id(0)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (R, PAD), 1)
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (R, PAD), 0)
    sub81 = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)

    n_bands_max = trace_ref.shape[1] * 4
    CW = CHUNK // 4          # packed words per flush chunk
    E = ev_ref.shape[1] - 2 * PAD
    K = kmean_rev_ref.shape[1] - 2 * PAD

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
    ll_k0 = -1 - half                # -51

    def extract(v, j):
        return jnp.max(jnp.where(sub81 == j, v, INT_MIN))

    def flush(chunk_idx):
        cp = pltpu.make_async_copy(
            chunk_tr, trace_ref.at[g, pl.ds(chunk_idx * CW, CW)],
            sems.at[0])
        cp.start()
        cp.wait()

    # blocked ring load: each read's placed load touches only its own
    # 8-row block, keeping the group-reload cost LINEAR in R (a full
    # (R, PAD) select per read would be quadratic)
    lane8b = jax.lax.broadcasted_iota(jnp.int32, (8, PAD), 1)
    sub8b = jax.lax.broadcasted_iota(jnp.int32, (8, PAD), 0)

    def ring_load(ref, j, start, place, acc8):
        """acc8[j%8, l] = ref[j, start + ((l - place) % PAD)]."""
        b, jb = divmod(j, 8)
        base = (start // PAD) * PAD
        rem = start - base
        v0 = ref[pl.ds(8 * b, 8), pl.ds(pl.multiple_of(base, PAD), PAD)]
        v1 = ref[pl.ds(8 * b, 8),
                 pl.ds(pl.multiple_of(base + PAD, PAD), PAD)]
        sh = (place - rem) % PAD
        r0 = pltpu.roll(v0, sh, 1)
        r1 = pltpu.roll(v1, sh, 1)
        m = ((lane8b - place) % PAD) < (PAD - rem)
        return jnp.where(sub8b == jb, jnp.where(m, r0, r1), acc8)

    def cat_blocks(blocks):
        return blocks[0] if len(blocks) == 1 else jnp.concatenate(
            blocks, axis=0)

    # ---- bands 0 and 1 (presets; cells (k=-1,e=-1) and (k=-1,e=0)) ----
    detile = jnp.float32(0.0) * sub8.astype(jnp.float32)
    band0 = jnp.where(lane8 == PAD - 1, jnp.float32(0.0), NEG_INF) + detile
    band1 = jnp.where(lane8 == 0, lp_trim, NEG_INF) + detile
    # packed word 0, rows jj=0 (all FROM_D) and jj=1 (FROM_U at lane 0):
    # the row-1 direction lands at bit 8*1 + 2*ii for word lanes 0..3
    row1p = jnp.where(lane8 < 4,
                      jnp.int32(FROM_U) << (2 * jnp.minimum(lane8, 3)),
                      jnp.int32(0))
    acc0 = row1p << 8

    detile_i = jnp.int32(0) * sub81

    def make_group_body(with_cand):
      def group_body(grp, carry):
        prev, prev2, ll_k_v, best_s, best_e, acc = carry
        base_bi = 2 + grp * GRP

        # ---- reload the group-stationary rings (8-row blocks) ----
        ll_k_s = [extract(ll_k_v, j) for j in range(R)]
        kb_s = [jnp.minimum(ll_k_s[j], jnp.int32(K - 1)) for j in range(R)]
        zf8 = jnp.zeros((8, PAD), jnp.float32)
        on8 = jnp.ones((8, PAD), jnp.float32)
        nblk = R // 8
        ev_b = [zf8] * nblk
        km_b = [zf8] * nblk
        ks_b = [on8] * nblk
        kl_b = [zf8] * nblk
        w0_s = []
        for j in range(R):
            b = j // 8
            ll_e_prev = (base_bi - 3) - ll_k_s[j]
            w0 = ll_e_prev - (BW - 1)
            w0_s.append(w0)
            s_e = jnp.clip(w0 + PAD, 0, E + PAD - 1)
            pe = w0 % PAD
            ev_b[b] = ring_load(ev_ref, j, s_e, pe, ev_b[b])
            s_k = jnp.clip(K + PAD - 128 - kb_s[j], 0, K + PAD - 1)
            pk = (base_bi - kb_s[j] - 129) % PAD
            km_b[b] = ring_load(kmean_rev_ref, j, s_k, pk, km_b[b])
            ks_b[b] = ring_load(kstdv_rev_ref, j, s_k, pk, ks_b[b])
            kl_b[b] = ring_load(klog_rev_ref, j, s_k, pk, kl_b[b])
        ev_ring = cat_blocks(ev_b)
        kmean_r = cat_blocks(km_b)
        kstdv_r = cat_blocks(ks_b)
        klog_r = cat_blocks(kl_b)
        w0_v = stackv(w0_s, jnp.int32)
        e_lane = w0_v + ((lane8 - w0_v) % PAD)        # group-fixed e map
        evalid = (e_lane >= 0) & (e_lane < n_ev_v)
        kms_r = scale_v * kmean_r + shift_v

        for j in range(GRP):
            bi = base_bi + j
            if j > 0:
                kms_r = pltpu.roll(kms_r, 1, 1)
                kstdv_r = pltpu.roll(kstdv_r, 1, 1)
                klog_r = pltpu.roll(klog_r, 1, 1)

            # Suzuki's rule from the previous band's edge cells
            ll_e_prev = (bi - 3) - ll_k_v
            ll = jnp.max(jnp.where(lane8 == ll_e_prev % PAD, prev, NEG_INF),
                         axis=1, keepdims=True)
            ur = jnp.max(jnp.where(lane8 == (ll_e_prev - (BW - 1)) % PAD,
                                   prev, NEG_INF),
                         axis=1, keepdims=True)
            both_ob = jnp.isneginf(ll) & jnp.isneginf(ur)
            right_i = jnp.where(both_ob,
                                jnp.full((R, 1), bi % 2, jnp.int32),
                                (ll < ur).astype(jnp.int32))
            ll_k_v = ll_k_v + right_i

            a = (ev_ring - kms_r) / kstdv_r
            em = (LOG_INV_SQRT_2PI - klog_r
                  + jnp.float32(-0.5) * a * a)

            up = pltpu.roll(prev, 1, 1)      # (k, e-1): lane-1 of bi-1
            diag = pltpu.roll(prev2, 1, 1)   # (k-1, e-1): lane-1 of bi-2
            score_d = diag + lp_step_v + em
            score_u = up + lp_stay_v + em
            score_l = prev + lp_skip         # (k-1, e): same lane of bi-1

            max_s = jnp.maximum(score_d, score_u)
            frm = jnp.where(max_s == score_u, jnp.int32(FROM_U),
                            jnp.int32(FROM_D))
            max_s = jnp.maximum(max_s, score_l)
            frm = jnp.where(max_s == score_l, jnp.int32(FROM_L), frm)

            k_lane = (bi - 2) - e_lane
            o = k_lane - ll_k_v
            valid = ((k_lane >= 0) & (k_lane < n_km_v) & evalid
                     & (o >= 0) & (o < BW))
            row = jnp.where(valid, max_s, NEG_INF)
            frm = jnp.where(valid, frm, jnp.int32(0))

            # trim column: cell (k=-1, e=bi-1) while the band straddles it
            is_trim = ((lane8 == (bi - 1) % PAD) & (ll_k_v <= -1)
                       & ((bi - 1) < n_ev_v))
            row = jnp.where(is_trim, lp_trim * bi.astype(jnp.float32), row)
            frm = jnp.where(is_trim, jnp.int32(FROM_U), frm)

            if with_cand:
                # backtrace start: last-kmer-column score + trim tail
                e_lc = bi - 1 - n_km_v
                off_lc = (n_km_v - 1) - ll_k_v
                lcv = jnp.max(jnp.where(lane8 == e_lc % PAD, row,
                                        NEG_INF),
                              axis=1, keepdims=True)
                cand = lcv + (n_ev_v - e_lc).astype(jnp.float32) * lp_trim
                okc = ((off_lc >= 0) & (off_lc < BW) & (e_lc >= 0)
                       & (e_lc < n_ev_v) & (bi < n_bands_v))
                cand = jnp.where(okc, cand, NEG_INF)
                upd = cand > best_s
                best_s = jnp.where(upd, cand, best_s)
                best_e = jnp.where(upd, e_lc, best_e)

            # pack: word lane l accumulates dirs of lanes l-3..l (cyclic
            # rolls match the walk's e & 127 wrap) at bit 8*(bi&3)+2*ii;
            # bi & 3 == (2 + j) & 3 is STATIC inside the unrolled loop
            p = (frm | (pltpu.roll(frm, 1, 1) << 2)
                 | (pltpu.roll(frm, 2, 1) << 4)
                 | (pltpu.roll(frm, 3, 1) << 6))
            phase = (2 + j) & 3
            acc = acc | (p << (8 * phase)) if phase else p
            if phase == 3:
                wq = bi >> 2
                chunk_tr[pl.ds(wq % CW, 1)] = acc[None]
                acc = jnp.zeros((R, PAD), jnp.int32)

                @pl.when((wq % CW) == (CW - 1))
                def _():
                    flush(bi // CHUNK)

            prev2 = prev
            prev = row

        return prev, prev2, ll_k_v, best_s, best_e, acc

      return group_body

    carry0 = (band1, band0,
              jnp.full((R, 1), ll_k0, jnp.int32) + detile_i,
              jnp.full((R, 1), NEG_INF, jnp.float32)
              + jnp.float32(0.0) * sub81.astype(jnp.float32),
              jnp.full((R, 1), -1, jnp.int32) + detile_i,
              acc0)
    n_groups = (nb_grp - 2 + GRP - 1) // GRP
    # backtrace candidates need bi >= n_kmers + 1 (e_lc >= 0): groups
    # wholly below the group's smallest n_kmers skip the per-step
    # last-column reduction entirely (~half the bands on this data)
    min_nk = n_km_s[0]
    for j in range(1, R):
        min_nk = jnp.minimum(min_nk, n_km_s[j])
    g_cand = jnp.clip((min_nk - 1) // GRP, 0, n_groups)
    carry = jax.lax.fori_loop(0, g_cand, make_group_body(False), carry0)
    carry = jax.lax.fori_loop(g_cand, n_groups, make_group_body(True),
                              carry)
    best_e = carry[4]
    acc_tail = carry[5]

    # the loop ends mid-word (last bi == 1 + 16*n_groups, phase 1):
    # store the partial word, then flush its chunk
    last_row = 1 + n_groups * GRP
    wq_tail = last_row >> 2
    chunk_tr[pl.ds(wq_tail % CW, 1)] = acc_tail[None]
    flush(last_row // CHUNK)

    best_ref[:, :] = jnp.where(lane8 == 0,
                               jnp.broadcast_to(best_e, (R, PAD)),
                               jnp.int32(-1))


@functools.partial(jax.jit, static_argnames=("n_bands", "interpret"))
def abea_fill_ring(batch: AbeaBatch, kmean_rev, kstdv_rev, klog_rev,
                   n_bands: int, interpret: bool = False):
    """Event-ring fill.  ``k*_rev`` are the PADDED kmer param rows flipped
    on the lane axis.  Returns (trace, best) — see module docstring."""
    B = batch.event_means.shape[0]
    assert B % R == 0, f"batch must be padded to a multiple of R={R} reads"
    assert n_bands % CHUNK == 0
    E = batch.event_means.shape[1] - 2 * PAD
    K = kmean_rev.shape[1] - 2 * PAD
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
            pl.BlockSpec((R, batch.event_means.shape[1]),
                         lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, kmean_rev.shape[1]),
                         lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, kstdv_rev.shape[1]),
                         lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, klog_rev.shape[1]),
                         lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((R, PAD), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((CHUNK // 4, R, PAD), jnp.int32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )

    trace, best = pl.pallas_call(
        _fill_kernel_ring,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B // R, n_bands // 4, R, PAD),
                                 jnp.int32),
            jax.ShapeDtypeStruct((B, PAD), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(batch.n_events, batch.n_kmers, scal,
      batch.event_means, kmean_rev, kstdv_rev, klog_rev)
    return trace, best


UNROLL = 22      # gather-pairs per while-loop iteration
WSTEPS = 3       # walk steps resolved per gather-pair


@functools.partial(jax.jit, static_argnames=("max_pairs",))
def abea_backtrace_ring(trace, best, n_kmers, max_pairs: int):
    """Minimal device walk over the PACKED trace: two independent
    gathers (words (q, lane) and (q-1, lane)) cover every cell a 3-step
    walk can reach — band drops <= 2/step so 3 steps stay >= 4(q-1),
    and the lane drops <= 1/step so 3 steps stay >= lane-2 — cutting
    the sequential HBM-latency chain ~3x vs one gather per step.
    Returns (packed 2-bit dirs [B, max_pairs//4] u8, start_event [B],
    n_pairs [B]).  QC happens on the host (native decode_qc_postalign)."""
    G, nbq, Rr, PADl = trace.shape
    B = G * R
    start_e = best[:, 0]
    g_idx = jnp.arange(B, dtype=jnp.int32) // R
    r_idx = jnp.arange(B, dtype=jnp.int32) % R
    any_valid = start_e >= 0
    k0 = jnp.where(any_valid, n_kmers - 1, -1)
    e0 = jnp.where(any_valid, start_e, -1)
    spi = UNROLL * WSTEPS                    # steps per iteration
    iters = (max_pairs + spi - 1) // spi
    dirs0 = jnp.zeros((iters * spi, B), jnp.uint8)

    def cond(st):
        it, k, e, n, dirs = st
        return (it < iters) & jnp.any((k >= 0) & (e >= 0))

    def body(st):
        it, k, e, n, dirs = st
        fs = []
        for _ in range(UNROLL):
            lane = e & (PAD - 1)
            bq = (k + e + 2) >> 2
            w0 = trace[g_idx, bq, r_idx, lane]
            w1 = trace[g_idx, jnp.maximum(bq - 1, 0), r_idx, lane]
            e_base = e
            for _s in range(WSTEPS):
                active = (k >= 0) & (e >= 0)
                jj = (k + e + 2) - (bq << 2)         # in [-4, 3]
                use0 = jj >= 0
                sh = ((jnp.where(use0, jj, jj + 4) << 3)
                      + ((e_base - e) << 1))
                f = ((jnp.where(use0, w0, w1) >> sh) & 3).astype(
                    jnp.uint8)
                fs.append(f)
                fi = f.astype(jnp.int32)
                k = k - (active & (fi != FROM_U)).astype(jnp.int32)
                e = e - (active & (fi != FROM_L)).astype(jnp.int32)
                n = n + active.astype(jnp.int32)
        slab = jnp.stack(fs, axis=0)
        dirs = jax.lax.dynamic_update_slice(dirs, slab, (it * spi, 0))
        return (it + 1, k, e, n, dirs)

    st0 = (jnp.int32(0), k0, e0, jnp.zeros(B, jnp.int32), dirs0)
    _, k, e, n, dirs = jax.lax.while_loop(cond, body, st0)

    dirs = dirs[:max_pairs].T                      # (B, max_pairs)
    d4 = dirs.reshape(B, max_pairs // 4, 4).astype(jnp.int32)
    w = jnp.array([1, 4, 16, 64], dtype=jnp.int32)
    packed = jnp.sum(d4 * w[None, None, :], axis=2).astype(jnp.uint8)
    return packed, start_e, n


@functools.partial(jax.jit, static_argnames=("cap",))
def compact_dirs(packed, off, cap: int):
    """Ragged-compact the packed dirs: read i's bytes live at
    flat[off[i] : off[i+1]].  ``off`` is the host-computed cumsum of
    per-read byte capacity ceil((n_events+n_kmers)/4); ``cap`` a bucketed
    static total.  Shrinks the D2H transfer ~4x on the tunnelled chip."""
    B, W = packed.shape
    j = jnp.arange(cap, dtype=jnp.int32)
    rid = jnp.clip(jnp.searchsorted(off, j, side="right") - 1, 0, B - 1)
    col = jnp.clip(j - off[rid], 0, W - 1)
    return packed[rid, col]


def _expand_fast(ev_concat, ev_off, ev_len, rank_concat, rk_off, rk_len,
                 level_mean, level_stdv, level_log_stdv, scale, shift,
                 lp_stay, lp_step, lp_skip, lp_trim, E: int, K: int):
    """Row-slice batch expansion: contiguous per-read dynamic slices
    (one row-gather op) + a single interleaved model-table gather,
    ~2x faster than the elementwise-gather expand_batch_device.  Rows
    carry pool garbage beyond each read's length — safe for the ring
    kernel, whose validity masks are index-based (never value-based)."""
    B = ev_off.shape[0]
    pool_e = jnp.concatenate([ev_concat,
                              jnp.zeros(E, ev_concat.dtype)])
    rows = jax.vmap(
        lambda o: jax.lax.dynamic_slice(pool_e, (o,), (E,)))(ev_off)
    ev = jax.lax.dynamic_update_slice(
        jnp.zeros((B, E + 2 * PAD), jnp.float32), rows, (0, PAD))
    pool_r = jnp.concatenate([rank_concat,
                              jnp.zeros(K, rank_concat.dtype)])
    rk = jax.vmap(
        lambda o: jax.lax.dynamic_slice(pool_r, (o,), (K,)))(rk_off)
    rk = jnp.clip(rk.astype(jnp.int32), 0, level_mean.shape[0] - 1)
    t3 = jnp.stack([level_mean, level_stdv, level_log_stdv,
                    jnp.zeros_like(level_mean)], axis=1)
    p = t3[rk]                                   # (B, K, 4) one gather
    km = jax.lax.dynamic_update_slice(
        jnp.zeros((B, K + 2 * PAD), jnp.float32), p[..., 0], (0, PAD))
    ks = jax.lax.dynamic_update_slice(
        jnp.ones((B, K + 2 * PAD), jnp.float32), p[..., 1], (0, PAD))
    kl = jax.lax.dynamic_update_slice(
        jnp.zeros((B, K + 2 * PAD), jnp.float32), p[..., 2], (0, PAD))
    return AbeaBatch(
        event_means=ev, kmer_mean=km, kmer_stdv=ks, kmer_log_stdv=kl,
        n_events=ev_len.astype(jnp.int32), n_kmers=rk_len.astype(jnp.int32),
        scale=scale, shift=shift, lp_stay=lp_stay, lp_step=lp_step,
        lp_skip=lp_skip, lp_trim=lp_trim)


@functools.partial(jax.jit, static_argnames=("E", "K", "n_bands",
                                             "max_pairs", "cap",
                                             "interpret"))
def abea_align_device_ring(ev_concat, ev_off, ev_len, rank_concat, rk_off,
                           rk_len, level_mean, level_stdv, level_log_stdv,
                           scale, shift, lp_stay, lp_step, lp_skip,
                           lp_trim, byte_off,
                           E: int, K: int, n_bands: int, max_pairs: int,
                           cap: int, interpret: bool = False):
    """One-dispatch ABEA on the ring kernel: expansion -> fill ->
    minimal walk -> ragged compaction.  Returns (flat packed dirs [cap]
    u8, start_event [B] i32, n_pairs [B] i32); QC + postalign happen in
    the native host decode."""
    batch = _expand_fast(
        ev_concat, ev_off, ev_len, rank_concat, rk_off, rk_len,
        level_mean, level_stdv, level_log_stdv, scale, shift, lp_stay,
        lp_step, lp_skip, lp_trim, E=E, K=K)
    kmean_rev = jnp.flip(batch.kmer_mean, axis=1)
    kstdv_rev = jnp.flip(batch.kmer_stdv, axis=1)
    klog_rev = jnp.flip(batch.kmer_log_stdv, axis=1)
    trace, best = abea_fill_ring(batch, kmean_rev, kstdv_rev, klog_rev,
                                 n_bands, interpret=interpret)
    packed, start_e, n = abea_backtrace_ring(trace, best, batch.n_kmers,
                                             max_pairs)
    return compact_dirs(packed, byte_off, cap), start_e, n
