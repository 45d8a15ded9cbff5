"""Dev-only: validate the event-ring kernel + host QC decode against the
XLA oracle.  Run:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/dev_ring_check.py
(interpret mode) or plain `python` for the real chip.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from f5c_tpu import native
from f5c_tpu.constants import (ABEA_MAX_GAP_THRESHOLD,
                               ABEA_MIN_AVG_LOG_EMISSION)
from f5c_tpu.models import builtin_model
from f5c_tpu.ops import abea, abea_ring
from f5c_tpu.ops.abea import CHUNK
from f5c_tpu.ops.abea_ref import Scalings


def main():
    interpret = jax.default_backend() == "cpu"
    model = builtin_model("dna_r9_nucleotide")
    rng = np.random.default_rng(int(os.environ.get("SEED", 0)))
    from f5c_tpu.ops.abea_ring import R
    B = R
    evs, krs = [], []
    for b in range(B):
        nk = int(rng.integers(60, 500))
        nev = int(rng.integers(max(nk // 2, 30), 2 * nk))
        kr = rng.integers(0, 4096, nk)
        which = np.clip(
            np.floor(np.linspace(0, nk, nev, endpoint=False)).astype(int),
            0, nk - 1)
        ev = (model.level_mean[kr[which]]
              + rng.normal(0, 2.0, nev)).astype(np.float32)
        evs.append(ev)
        krs.append(kr)
    E, K = 1024, 512
    db = abea.make_batch(evs, krs, model, pad_events=E, pad_kmers=K,
                         scalings=[Scalings()] * B)
    nb_true = E + K + 2
    nb = ((nb_true + CHUNK - 1) // CHUNK) * CHUNK
    max_pairs = E + K

    # oracle
    fill_out = abea.abea_fill(db, nb_true)
    ref = [np.asarray(x)
           for x in abea.abea_backtrace_packed(fill_out, db, max_pairs)]
    rpacked, rstart, rn, rsum, rgap, rfail = ref

    # ring fill + walk
    kmean_rev = jnp.flip(db.kmer_mean, axis=1)
    kstdv_rev = jnp.flip(db.kmer_stdv, axis=1)
    klog_rev = jnp.flip(db.kmer_log_stdv, axis=1)
    trace, best = abea_ring.abea_fill_ring(
        db, kmean_rev, kstdv_rev, klog_rev, nb, interpret=interpret)
    packed, start_e, n = [np.asarray(x) for x in
                          abea_ring.abea_backtrace_ring(
                              trace, best, db.n_kmers, max_pairs)]

    ok = True
    if not np.array_equal(start_e, rstart):
        ok = False
        print("MISMATCH start_e", start_e, rstart)
    if not np.array_equal(n, rn):
        ok = False
        print("MISMATCH n", n, rn)
    def unpack(row, nn):
        b = row[: (nn + 3) // 4]
        return np.stack([(b >> 0) & 3, (b >> 2) & 3, (b >> 4) & 3,
                         (b >> 6) & 3], axis=1).reshape(-1)[:nn]

    for i in range(B):
        # beyond n the ring walk records step-indexed garbage (the
        # oracle zero-fills); only the first n dirs are meaningful
        if not np.array_equal(unpack(packed[i], int(rn[i])),
                              unpack(rpacked[i], int(rn[i]))):
            ok = False
            print(f"MISMATCH packed read {i}")

    # host QC vs oracle QC
    for i in range(B):
        if n[i] == 0 or start_e[i] < 0:
            assert rfail[i], f"read {i}: oracle not failed but ring empty"
            continue
        (failed, okc, pairs, b2s, b2e, epb, sc, sum_em,
         max_gap) = native.decode_qc_postalign(
            packed[i], int(n[i]), int(start_e[i]),
            krs[i].astype(np.int32), evs[i],
            model.level_mean, model.level_stdv, model.level_log_stdv,
            1.0, 0.0, ABEA_MIN_AVG_LOG_EMISSION, ABEA_MAX_GAP_THRESHOLD,
            200)
        if failed != bool(rfail[i]):
            ok = False
            print(f"MISMATCH failed read {i}: host={failed} ref={rfail[i]}"
                  f" sum_em={sum_em} ref_sum={rsum[i]}")
        if max_gap != int(rgap[i]):
            ok = False
            print(f"MISMATCH max_gap read {i}: {max_gap} vs {rgap[i]}")
        # strict-sequential f32 (C++) vs XLA's excess-precision
        # accumulation: agree to ~1 ulp of the running sum
        if not np.isclose(sum_em, rsum[i], rtol=1e-6, atol=1e-3):
            ok = False
            print(f"MISMATCH sum_em read {i}: {sum_em!r} vs "
                  f"{rsum[i]!r} (diff {sum_em - rsum[i]:.3g})")
    print("OK" if ok else "FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
