"""Ultra-long reads: the ABEA band loop chunked over band windows.

The reference deflects reads over ``--ultra-thresh`` to the CPU or a
deferred BAM (/root/reference/src/f5c.cu:440-452, f5cio.c:573-578); the
TPU answer (SURVEY §5) is to chunk the band-step loop itself, since the
carried state is only two rolling band rows + a few per-read scalars:

- **forward**: the event-ring fill kernel (ops/abea_ring.py) runs one
  WINDOW of band steps per dispatch, taking the carried state
  (prev/prev2 rows, ll_k, best-start tracker) as kernel inputs and
  returning the advanced state; window states are checkpointed (~12 KB
  each) and the window's trace is DISCARDED, so device memory stays at
  one window regardless of read length;
- **backward**: windows are revisited last-to-first, each re-filled
  from its checkpoint to regenerate its trace rows, and the backtrace
  walk crosses the window carrying (k, e, n); the per-window walk
  directions ship to the host (~WIN/4 bytes).

Chunked output is BIT-IDENTICAL to the unchunked kernel: windows are
multiples of the ring-reload group (GRP bands), so every reload point,
Suzuki decision and best-start update replays exactly.

Cost: 2x fill compute + ~2 dispatches per window — linear in read
length with O(window) memory, where the unchunked trace is O(read^2)
against HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .abea import BW, CHUNK, FROM_L, FROM_U, PAD
from .abea_ring import GRP, INT_MIN, NEG_INF, _expand_fast

# the ultra path duplicates ONE read across the sublane tile, so its
# fill cost is proportional to R — pin the smallest tile regardless of
# the ring kernel's batch-throughput default (abea_ring.R)
R = 8

LL_K0 = -1 - BW // 2      # -51


def _fill_kernel_win(n_events_ref, n_kmers_ref, scal_ref, band_base_ref,
                     ev_ref, kmean_rev_ref, kstdv_rev_ref, klog_rev_ref,
                     sf_ref, si_ref,
                     trace_ref, sf_out_ref, si_out_ref, chunk_tr, sems):
    """One window of the event-ring band fill with carried state.

    State layout: sf (2R, PAD) f32 = [prev; prev2]; si (R, PAD) i32 with
    lane 0 = ll_k, lane 1 = best_e, lane 2 = bitcast(best_s).
    Trace rows cover bands [band_base, band_base + WIN); bands 0 and 1
    are presets baked into the initial state and never stored (the walk
    never visits them).
    """
    g = pl.program_id(0)
    WIN = trace_ref.shape[1]
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (R, PAD), 1)
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (R, PAD), 0)
    sub81 = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)

    E_loc = ev_ref.shape[1]          # sliced widths (window + margins)
    K_loc = kmean_rev_ref.shape[1]
    band_base = band_base_ref[0]
    e_lo = band_base_ref[1]          # host slice offsets into the full
    rev_lo = band_base_ref[2]        # padded (and reversed) arrays
    K_full = band_base_ref[3]

    def stackv(vals, dtype):
        out = jnp.full((R, 1), vals[0], dtype=dtype)
        for j in range(1, R):
            out = jnp.where(sub81 == j, jnp.asarray(vals[j], dtype), out)
        return out

    n_ev_s = [n_events_ref[g * R + j] for j in range(R)]
    n_km_s = [n_kmers_ref[g * R + j] for j in range(R)]
    n_ev_v = stackv(n_ev_s, jnp.int32)
    n_km_v = stackv(n_km_s, jnp.int32)
    nb_grp = n_ev_s[0] + n_km_s[0] + 2
    for j in range(1, R):
        nb_grp = jnp.maximum(nb_grp, n_ev_s[j] + n_km_s[j] + 2)
    n_bands_v = n_ev_v + n_km_v + 2

    scale_v = stackv([scal_ref[g * R + j, 0] for j in range(R)], jnp.float32)
    shift_v = stackv([scal_ref[g * R + j, 1] for j in range(R)], jnp.float32)
    lp_stay_v = stackv([scal_ref[g * R + j, 2] for j in range(R)],
                       jnp.float32)
    lp_step_v = stackv([scal_ref[g * R + j, 3] for j in range(R)],
                       jnp.float32)
    lp_skip = scal_ref[g * R, 4]
    lp_trim = scal_ref[g * R, 5]

    def extract(v, j):
        return jnp.max(jnp.where(sub81 == j, v, INT_MIN))

    def flush(chunk_idx):
        cp = pltpu.make_async_copy(
            chunk_tr, trace_ref.at[g, pl.ds(chunk_idx * CHUNK, CHUNK)],
            sems.at[0])
        cp.start()
        cp.wait()

    def ring_load(ref, j, start, place, acc):
        base = (start // PAD) * PAD
        rem = start - base
        v0 = ref[:, pl.ds(pl.multiple_of(base, PAD), PAD)]
        v1 = ref[:, pl.ds(pl.multiple_of(base + PAD, PAD), PAD)]
        sh = (place - rem) % PAD
        r0 = pltpu.roll(v0, sh, 1)
        r1 = pltpu.roll(v1, sh, 1)
        m = ((lane8 - place) % PAD) < (PAD - rem)
        return jnp.where(sub8 == j, jnp.where(m, r0, r1), acc)

    sf = sf_ref[:]
    si = si_ref[:]
    prev0 = sf[0:R]
    prev20 = sf[R:2 * R]
    ll_k0_v = jnp.broadcast_to(si[:, 0:1], (R, 1))
    best_e0 = jnp.broadcast_to(si[:, 1:2], (R, 1))
    best_s0 = jax.lax.bitcast_convert_type(
        jnp.broadcast_to(si[:, 2:3], (R, 1)), jnp.float32)

    def group_body(grp, carry):
        prev, prev2, ll_k_v, best_s, best_e = carry
        base_bi = band_base + grp * GRP

        ll_k_s = [extract(ll_k_v, j) for j in range(R)]
        kb_s = [jnp.minimum(ll_k_s[j], K_full - 1) for j in range(R)]
        zf = jnp.zeros((R, PAD), jnp.float32)
        kmean_r = zf
        kstdv_r = jnp.ones((R, PAD), jnp.float32)
        klog_r, ev_ring = zf, zf
        w0_s = []
        for j in range(R):
            ll_e_prev = (base_bi - 3) - ll_k_s[j]
            w0 = ll_e_prev - (BW - 1)
            w0_s.append(w0)
            s_e = jnp.clip(w0 + PAD - e_lo, 0, E_loc - PAD - 1)
            pe = w0 % PAD
            ev_ring = ring_load(ev_ref, j, s_e, pe, ev_ring)
            s_k = jnp.clip(K_full + PAD - 128 - kb_s[j] - rev_lo,
                           0, K_loc - PAD - 1)
            pk = (base_bi - kb_s[j] - 129) % PAD
            kmean_r = ring_load(kmean_rev_ref, j, s_k, pk, kmean_r)
            kstdv_r = ring_load(kstdv_rev_ref, j, s_k, pk, kstdv_r)
            klog_r = ring_load(klog_rev_ref, j, s_k, pk, klog_r)
        w0_v = stackv(w0_s, jnp.int32)
        e_lane = w0_v + ((lane8 - w0_v) % PAD)
        evalid = (e_lane >= 0) & (e_lane < n_ev_v)
        kms_r = scale_v * kmean_r + shift_v

        for j in range(GRP):
            bi = base_bi + j
            if j > 0:
                kms_r = pltpu.roll(kms_r, 1, 1)
                kstdv_r = pltpu.roll(kstdv_r, 1, 1)
                klog_r = pltpu.roll(klog_r, 1, 1)

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
            em = (jnp.float32(-0.918938) - klog_r
                  + jnp.float32(-0.5) * a * a)

            up = pltpu.roll(prev, 1, 1)
            diag = pltpu.roll(prev2, 1, 1)
            score_d = diag + lp_step_v + em
            score_u = up + lp_stay_v + em
            score_l = prev + lp_skip

            max_s = jnp.maximum(score_d, score_u)
            frm = jnp.where(max_s == score_u, jnp.int32(FROM_U),
                            jnp.int32(0))
            max_s = jnp.maximum(max_s, score_l)
            frm = jnp.where(max_s == score_l, jnp.int32(FROM_L), frm)

            k_lane = (bi - 2) - e_lane
            o = k_lane - ll_k_v
            valid = ((k_lane >= 0) & (k_lane < n_km_v) & evalid
                     & (o >= 0) & (o < BW))
            row = jnp.where(valid, max_s, NEG_INF)
            frm = jnp.where(valid, frm, jnp.int32(0))

            is_trim = ((lane8 == (bi - 1) % PAD) & (ll_k_v <= -1)
                       & ((bi - 1) < n_ev_v))
            row = jnp.where(is_trim, lp_trim * bi.astype(jnp.float32), row)
            frm = jnp.where(is_trim, jnp.int32(FROM_U), frm)

            e_lc = bi - 1 - n_km_v
            off_lc = (n_km_v - 1) - ll_k_v
            lcv = jnp.max(jnp.where(lane8 == e_lc % PAD, row, NEG_INF),
                          axis=1, keepdims=True)
            cand = lcv + (n_ev_v - e_lc).astype(jnp.float32) * lp_trim
            okc = ((off_lc >= 0) & (off_lc < BW) & (e_lc >= 0)
                   & (e_lc < n_ev_v) & (bi < n_bands_v))
            cand = jnp.where(okc, cand, NEG_INF)
            upd = cand > best_s
            best_s = jnp.where(upd, cand, best_s)
            best_e = jnp.where(upd, e_lc, best_e)

            slot = (bi - band_base) % CHUNK
            chunk_tr[pl.ds(slot, 1)] = frm[None]

            @pl.when(slot == CHUNK - 1)
            def _():
                flush((bi - band_base) // CHUNK)

            prev2 = prev
            prev = row

        return prev, prev2, ll_k_v, best_s, best_e

    n_groups = jnp.clip((nb_grp - band_base + GRP - 1) // GRP, 0,
                        WIN // GRP)
    carry = jax.lax.fori_loop(
        0, n_groups, group_body,
        (prev0, prev20, ll_k0_v, best_s0, best_e0))
    prev, prev2, ll_k_v, best_s, best_e = carry

    last_local = n_groups * GRP - 1

    @pl.when((n_groups > 0) & ((last_local % CHUNK) != (CHUNK - 1)))
    def _():
        flush(last_local // CHUNK)

    sf_out_ref[0:R] = prev
    sf_out_ref[R:2 * R] = prev2
    out_i = jnp.where(lane8 == 0, jnp.broadcast_to(ll_k_v, (R, PAD)),
                      jnp.int32(0))
    out_i = jnp.where(lane8 == 1, jnp.broadcast_to(best_e, (R, PAD)),
                      out_i)
    bs_bits = jax.lax.bitcast_convert_type(
        jnp.broadcast_to(best_s, (R, PAD)), jnp.int32)
    out_i = jnp.where(lane8 == 2, bs_bits, out_i)
    si_out_ref[:, :] = out_i


@functools.partial(jax.jit, static_argnames=("WIN", "interpret"))
def fill_window(batch_args, sf, si, meta, WIN: int,
                interpret: bool = False):
    """Run one band window.  batch_args = (n_events, n_kmers, scal, ev,
    kmean_rev, kstdv_rev, klog_rev) with ev/kmer rows SLICED to the
    window's reachable index range; meta = (band_base, e_lo, rev_lo,
    K_full) i32.  Returns (trace, sf', si')."""
    n_events, n_kmers, scal, ev, kmean_rev, kstdv_rev, klog_rev = batch_args
    B = ev.shape[0]
    assert B % R == 0 and WIN % CHUNK == 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B // R,),
        in_specs=[
            pl.BlockSpec((R, ev.shape[1]), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, kmean_rev.shape[1]), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, kstdv_rev.shape[1]), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, klog_rev.shape[1]), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * R, PAD), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, PAD), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2 * R, PAD), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, PAD), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((CHUNK, R, PAD), jnp.int32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    return pl.pallas_call(
        _fill_kernel_win,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B // R, WIN, R, PAD), jnp.int32),
            jax.ShapeDtypeStruct((B // R * 2 * R, PAD), jnp.float32),
            jax.ShapeDtypeStruct((B, PAD), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(n_events, n_kmers, scal, jnp.asarray(meta, jnp.int32),
      ev, kmean_rev, kstdv_rev, klog_rev, sf, si)


@functools.partial(jax.jit, static_argnames=("WIN",))
def walk_window(trace, k, e, n, band_base, WIN: int):
    """Backtrace walk within one regenerated window (read 0 of the
    duplicated group).  Returns (dirs u8 [WIN], steps, k', e', n')."""
    UN = 64
    iters = WIN // UN
    dirs0 = jnp.zeros((iters * UN,), jnp.uint8)

    def cond(st):
        it, k, e, n, steps, dirs = st
        bi = k + e + 2
        return (it < iters) & (k >= 0) & (e >= 0) & (bi >= band_base)

    def body(st):
        it, k, e, n, steps, dirs = st
        fs = []
        for _ in range(UN):
            bi = k + e + 2
            active = (k >= 0) & (e >= 0) & (bi >= band_base)
            local = jnp.clip(bi - band_base, 0, WIN - 1)
            lane = e & (PAD - 1)
            f = trace[0, local, 0, lane]
            fs.append(f.astype(jnp.uint8))
            k = k - (active & (f != FROM_U)).astype(jnp.int32)
            e = e - (active & (f != FROM_L)).astype(jnp.int32)
            n = n + active.astype(jnp.int32)
            steps = steps + active.astype(jnp.int32)
        slab = jnp.stack(fs, axis=0)
        dirs = jax.lax.dynamic_update_slice(dirs, slab, (it * UN,))
        return (it + 1, k, e, n, steps, dirs)

    st = (jnp.int32(0), k, e, n, jnp.int32(0), dirs0)
    it, k, e, n, steps, dirs = jax.lax.while_loop(cond, body, st)
    return dirs, steps, k, e, n


def align_ultra_read(ev_mean: np.ndarray, ranks: np.ndarray, level_mean,
                     level_stdv, level_log_stdv, scale: float,
                     shift: float, lp_stay: float, lp_step: float,
                     lp_skip: float, lp_trim: float,
                     win_bands: int = 1 << 16, interpret: bool = False):
    """Chunked ABEA for one ultra-long read.  Returns (packed dirs u8,
    n_pairs, start_event) — the event-ring contract, decodable by
    native.decode_qc_postalign."""
    import jax.numpy as jnp

    def bucket(n, minimum=256):
        b = minimum
        while b < n:
            b *= 2
        return b

    E = bucket(int(ev_mean.shape[0]))
    K = bucket(int(ranks.shape[0]))
    B = R
    ev_len = np.full(B, ev_mean.shape[0], np.int32)
    rk_len = np.full(B, ranks.shape[0], np.int32)
    batch = _expand_fast(
        jnp.asarray(ev_mean.astype(np.float32)),
        jnp.zeros(B, jnp.int32), jnp.asarray(ev_len),
        jnp.asarray(np.ascontiguousarray(ranks, dtype=np.int32)),
        jnp.zeros(B, jnp.int32), jnp.asarray(rk_len),
        jnp.asarray(level_mean), jnp.asarray(level_stdv),
        jnp.asarray(level_log_stdv),
        jnp.full(B, scale, jnp.float32), jnp.full(B, shift, jnp.float32),
        jnp.full(B, lp_stay, jnp.float32),
        jnp.full(B, lp_step, jnp.float32),
        jnp.full(B, lp_skip, jnp.float32),
        jnp.full(B, lp_trim, jnp.float32), E=E, K=K)
    scal = jnp.stack([
        batch.scale, batch.shift, batch.lp_stay, batch.lp_step,
        batch.lp_skip, batch.lp_trim,
        jnp.zeros_like(batch.scale), jnp.zeros_like(batch.scale)],
        axis=1)
    ev_full = batch.event_means
    kmean_rev = jnp.flip(batch.kmer_mean, axis=1)
    kstdv_rev = jnp.flip(batch.kmer_stdv, axis=1)
    klog_rev = jnp.flip(batch.kmer_log_stdv, axis=1)

    # per-window slices of the big arrays keep the kernel's VMEM inputs
    # O(window) instead of O(read); ranges derive from the checkpointed
    # band-bottom kmer (ll_k and ll_e each advance <= 1 per band)
    def rup(n):
        return ((n + PAD - 1) // PAD) * PAD

    EW = min(rup(win_bands + 6 * PAD), ev_full.shape[1])
    KW = min(rup(win_bands + 6 * PAD), kmean_rev.shape[1])

    def window_args(base, ll_k_w):
        ll_e_w = base - 3 - ll_k_w
        e_lo = max(0, min(((ll_e_w - 100 - PAD) // PAD) * PAD,
                          ev_full.shape[1] - EW))
        k_hi = ll_k_w + win_bands + 2 * PAD
        rev_lo = max(0, min((((K + PAD - 1 - k_hi) - PAD) // PAD) * PAD,
                            kmean_rev.shape[1] - KW))
        ev_sl = jax.lax.dynamic_slice(ev_full, (0, e_lo), (R, EW))
        km_sl = jax.lax.dynamic_slice(kmean_rev, (0, rev_lo), (R, KW))
        ks_sl = jax.lax.dynamic_slice(kstdv_rev, (0, rev_lo), (R, KW))
        kl_sl = jax.lax.dynamic_slice(klog_rev, (0, rev_lo), (R, KW))
        return ((batch.n_events, batch.n_kmers, scal, ev_sl, km_sl,
                 ks_sl, kl_sl), [base, e_lo, rev_lo, K])

    # initial state: bands 0 and 1 presets (abea_ring kernel init)
    lane = np.arange(PAD)
    band0 = np.where(lane == PAD - 1, 0.0, -np.inf).astype(np.float32)
    band1 = np.where(lane == 0, lp_trim, -np.inf).astype(np.float32)
    sf = np.zeros((2 * R, PAD), np.float32)
    sf[0:R] = band1
    sf[R:2 * R] = band0
    si = np.zeros((R, PAD), np.int32)
    si[:, 0] = LL_K0
    si[:, 1] = -1
    si[:, 2] = np.float32(-np.inf).view(np.int32)
    sf = jnp.asarray(sf)
    si = jnp.asarray(si)

    n_bands = int(ev_mean.shape[0] + ranks.shape[0] + 2)
    n_windows = max(1, -(-(n_bands - 2) // win_bands))

    # forward: checkpoint window states, discard traces
    states = [(sf, si)]
    ll_ks = [LL_K0]
    for w in range(n_windows):
        wargs, meta = window_args(2 + w * win_bands, ll_ks[-1])
        _, sf, si = fill_window(wargs, sf, si, meta,
                                WIN=win_bands, interpret=interpret)
        states.append((sf, si))
        ll_ks.append(int(np.asarray(si)[0, 0]))
    si_host = np.asarray(si)
    start_event = int(si_host[0, 1])
    if start_event < 0:
        return np.zeros(0, np.uint8), 0, -1

    # backward: regenerate each window's trace, walk through it
    k = jnp.int32(int(ranks.shape[0]) - 1)
    e = jnp.int32(start_event)
    n = jnp.int32(0)
    dir_chunks = []
    for w in range(n_windows - 1, -1, -1):
        base = 2 + w * win_bands
        sfw, siw = states[w]
        wargs, meta = window_args(base, ll_ks[w])
        trace, _, _ = fill_window(wargs, sfw, siw, meta, WIN=win_bands,
                                  interpret=interpret)
        dirs, steps, k, e, n = walk_window(trace, k, e, n, base,
                                           WIN=win_bands)
        steps_i = int(steps)
        if steps_i:
            dir_chunks.append(np.asarray(dirs[:steps_i]))
        if int(k) < 0 or int(e) < 0:
            break
    all_dirs = (np.concatenate(dir_chunks) if dir_chunks
                else np.zeros(0, np.uint8))
    n_pairs = int(n)
    # pack 4 dirs per byte (abea.py contract)
    pad = (-len(all_dirs)) % 4
    d = np.concatenate([all_dirs, np.zeros(pad, np.uint8)])
    d = d.reshape(-1, 4).astype(np.uint32)
    packed = (d[:, 0] | (d[:, 1] << 2) | (d[:, 2] << 4)
              | (d[:, 3] << 6)).astype(np.uint8)
    return packed, n_pairs, start_event
