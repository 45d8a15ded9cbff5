"""Dev-only: validate the kmer-anchored kernel against the XLA oracle
in interpret mode on CPU.  Run:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/dev_kr_check.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from f5c_tpu.models import builtin_model
from f5c_tpu.ops import abea
from f5c_tpu.ops.abea_pallas import CHUNK
from f5c_tpu.ops import abea_kr
from f5c_tpu.ops.abea_ref import Scalings


def main():
    model = builtin_model("dna_r9_nucleotide")
    rng = np.random.default_rng(int(os.environ.get("SEED", 0)))
    B = 8
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

    # oracle: XLA fill + packed backtrace
    fill_out = abea.abea_fill(db, nb_true)
    ref = abea.abea_backtrace_packed(fill_out, db, max_pairs)
    ref = [np.asarray(x) for x in ref]

    # kr kernel in interpret mode
    ev_rev_x = jnp.concatenate(
        [jnp.flip(db.event_means, axis=1),
         jnp.zeros((B, abea.PAD), jnp.float32)], axis=1)
    trace, em, best = abea_kr.abea_fill_kr(db, ev_rev_x, nb,
                                           interpret=True)
    out = abea_kr.abea_backtrace_kr(trace, em, best, db, max_pairs)
    out = [np.asarray(x) for x in out]

    names = ["packed", "start_e", "n", "sum_em", "max_gap", "failed"]
    ok = True
    for nm, a, b in zip(names, out, ref):
        if nm == "packed":
            # compare only the meaningful prefix per read
            for i in range(B):
                npairs = int(ref[2][i])
                nbytes = (npairs + 3) // 4
                if not np.array_equal(a[i, :nbytes], b[i, :nbytes]):
                    ok = False
                    d = np.nonzero(a[i, :nbytes] != b[i, :nbytes])[0]
                    print(f"MISMATCH packed read {i}: first diff byte "
                          f"{d[0]} of {nbytes}")
            continue
        if not np.array_equal(a, b):
            ok = False
            print(f"MISMATCH {nm}: kr={a} ref={b}")
    print("OK" if ok else "FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
