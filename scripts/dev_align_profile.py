"""Dev-only: split the align stage into sub-timings on the real dataset.
Run on the chip:  python scripts/dev_align_profile.py
"""
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    sys.path.insert(0, REPO)
    import bench

    import jax
    import jax.numpy as jnp

    from f5c_tpu.pipeline.runner import Options, Pipeline, _bucket
    from f5c_tpu import native
    from f5c_tpu.ops import abea, abea_kr
    from f5c_tpu.ops.abea_pallas import CHUNK

    tmp = tempfile.mkdtemp(prefix="f5c_prof_")
    bam, genome, reads, n_reads, slow5 = bench.setup_dataset(tmp, blow5=True)
    opt = Options(min_mapq=0, meth_out_version=1, slow5_path=slow5)
    pipe = Pipeline(bam, genome, reads, opt)
    batches = list(pipe.batches())
    assert len(batches) == 1
    batch = batches[0]

    todo = [r for r in batch if not r.status and r.event_means is not None]
    todo.sort(key=lambda r: r.n_events)
    ranks = [native.kmer_ranks(r.seq, pipe.model.k) for r in todo]
    E = _bucket(max(r.event_means.shape[0] for r in todo))
    K = _bucket(max(k.shape[0] for k in ranks))
    n_bands = ((E + K + 2 + CHUNK - 1) // CHUNK) * CHUNK
    max_pairs = E + K
    print(f"reads={len(todo)} E={E} K={K} nb={n_bands} "
          f"max_ev={max(r.event_means.shape[0] for r in todo)} "
          f"max_k={max(k.shape[0] for k in ranks)}")

    arrays = pipe._abea_concat_arrays(todo, ranks, pad_to=8)
    lm, ls, ll = pipe._nuc_dev_tables()

    for it in range(3):
        t0 = time.time()
        dev = [jnp.asarray(a) for a in arrays]
        jax.block_until_ready(dev)
        t_h2d = time.time() - t0

        (ev_concat, ev_off, ev_len, rk_concat, rk_off, rk_len, scale,
         shift, lp_stay, lp_step, lp_skip, lp_trim) = dev
        t0 = time.time()
        db = abea.expand_batch_device(
            ev_concat, ev_off, ev_len, rk_concat, rk_off, rk_len,
            lm, ls, ll, scale, shift, lp_stay, lp_step, lp_skip, lp_trim,
            E=E, K=K)
        np.asarray(db.event_means[0, 0])
        t_expand = time.time() - t0

        B = db.event_means.shape[0]
        t0 = time.time()
        ev_rev_x = jnp.concatenate(
            [jnp.flip(db.event_means, axis=1),
             jnp.zeros((B, abea.PAD), jnp.float32)], axis=1)
        trace, em, best = abea_kr.abea_fill_kr(db, ev_rev_x, n_bands)
        np.asarray(best[0, 0])
        t_fill = time.time() - t0

        t0 = time.time()
        out = abea_kr.abea_backtrace_kr(trace, em, best, db, max_pairs)
        np.asarray(out[2][0])
        t_bt = time.time() - t0

        t0 = time.time()
        host = [np.asarray(x) for x in out]
        t_d2h = time.time() - t0
        print(f"iter{it}: h2d={t_h2d*1e3:.0f} expand={t_expand*1e3:.0f} "
              f"fill={t_fill*1e3:.0f} backtrace={t_bt*1e3:.0f} "
              f"d2h={t_d2h*1e3:.0f} ms  (B={B})")


if __name__ == "__main__":
    main()
